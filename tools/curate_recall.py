#!/usr/bin/env python
"""Recall pin for CurateStore(candidate_mode='minhash') — round-10
VERDICT task #1's "done" bar: a recall-vs-exact measurement (planted +
natural) on a committed corpus, in a committed artifact.

Protocol:

- Corpus = ``corpus_dir``'s documents table PLUS ``n_planted`` planted
  near-dup clones: clone i copies a source doc's text with ONE token
  appended, so its shingle-set jaccard vs the source is n/(n+1) —
  genuinely NEAR (0.8 <= j < 1), never an exact duplicate, and the true
  jaccard is known by construction. Sources are the first docs with
  >= 24 tokens (j >= 22/23 ≈ 0.957 > t).
- Both stores ingest the SAME augmented corpus in ``n_batches`` shards
  (doc_id % n); candidate counting on.
- Reported: per-mode edge counts, candidate totals, walls;
  ``recall_vs_exact`` = |minhash edges| / |exact edges| (minhash edges
  are verified exact-jaccard pairs, so they are a SUBSET of exact
  mode's — asserted, and precision is 1 by construction);
  ``planted_recall`` = fraction of the n_planted (source, clone) pairs
  present in the minhash edge set. Exit 1 if subset violated or
  planted_recall < 1.

Usage:
    python tools/curate_recall.py [corpus_dir] [n_batches] [n_planted] \
        > CURATE_RECALL_r11.json
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import time
import uuid

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from pyspark.sql import functions as F  # noqa: E402

SCRATCH = "/tmp/curaterecall"


def main(corpus_dir: str, n_batches: int, n_planted: int) -> None:
    from minibatch_spark.catalog import load_table
    from minibatch_spark.session import get_spark
    from minibatch_spark.streaming.curate_stream import CurateStore

    shutil.rmtree(SCRATCH, ignore_errors=True)
    os.makedirs(SCRATCH, exist_ok=True)
    spark = get_spark(app_name="curate-recall")
    d = load_table(spark, corpus_dir, "documents").select(
        "doc_id", "text", "source"
    )
    max_id = d.agg(F.max("doc_id")).first()[0]
    # planted near-dups: one appended token -> jaccard n/(n+1), known > t
    srcs = (
        d.filter(F.size(F.split(F.trim("text"), r"\s+")) >= 24)
        .orderBy("doc_id")
        .limit(n_planted)
        .collect()
    )
    planted_rows = [
        (max_id + 1 + i, r.text + " plantedtok", r.source)
        for i, r in enumerate(srcs)
    ]
    planted_pairs = {
        (r.doc_id, max_id + 1 + i) for i, r in enumerate(srcs)
    }
    aug = d.unionByName(
        spark.createDataFrame(
            planted_rows, "doc_id long, text string, source string"
        )
    )
    # write the augmented corpus once so both ingests read identical files
    aug_path = os.path.join(SCRATCH, "aug")
    aug.write.mode("overwrite").parquet(aug_path)
    aug = spark.read.parquet(aug_path)

    out: dict = {
        "corpus_dir": corpus_dir,
        "n_batches": n_batches,
        "n_planted": len(planted_rows),
        "planted_construction": "source text + one appended token "
        "(true shingle jaccard n/(n+1) >= 22/23, always < 1)",
    }
    edges: dict[str, set] = {}
    for mode in ("exact", "minhash"):
        store = CurateStore(
            spark,
            os.path.join(SCRATCH, f"st-{mode}-{uuid.uuid4().hex[:6]}"),
            candidate_mode=mode,
        )
        store.count_candidates = True
        cands, t0 = [], time.monotonic()
        for i in range(n_batches):
            store.process_batch(
                aug.filter(F.col("doc_id") % n_batches == i),
                batch_tag=f"b{i}",
            )
            cands.append(store.last_cand_count)
            if (i + 1) % 8 == 0 and i + 1 < n_batches:
                store.maybe_compact()
        wall = time.monotonic() - t0
        edges[mode] = {
            (r.doc_a, r.doc_b) for r in store.edges().collect()
        }
        out[mode] = {
            "n_edges": len(edges[mode]),
            "cand_total": sum(cands),
            "cand_per_batch": cands,
            "ingest_wall_sec": round(wall, 3),
        }
        print(f"{mode}: {out[mode]}", file=sys.stderr)

    extra = sorted(edges["minhash"] - edges["exact"])
    missed = sorted(edges["exact"] - edges["minhash"])
    planted_found = planted_pairs & edges["minhash"]
    out.update(
        {
            "subset_ok": not extra,
            "n_missed_vs_exact": len(missed),
            "missed_examples": missed[:5],
            "recall_vs_exact": (
                round(len(edges["minhash"]) / len(edges["exact"]), 6)
                if edges["exact"]
                else None
            ),
            "planted_recall": (
                round(len(planted_found) / len(planted_pairs), 6)
                if planted_pairs
                else None
            ),
            "cand_ratio_minhash_over_exact": (
                round(out["minhash"]["cand_total"] / out["exact"]["cand_total"], 4)
                if out["exact"]["cand_total"]
                else None
            ),
        }
    )
    print(json.dumps(out, allow_nan=False))
    shutil.rmtree(SCRATCH, ignore_errors=True)
    if extra or (planted_pairs and len(planted_found) < len(planted_pairs)):
        sys.exit(1)


if __name__ == "__main__":
    main(
        sys.argv[1] if len(sys.argv) > 1 else "/tmp/sparkdata/sf1",
        int(sys.argv[2]) if len(sys.argv) > 2 else 8,
        int(sys.argv[3]) if len(sys.argv) > 3 else 40,
    )
