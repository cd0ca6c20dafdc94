#!/usr/bin/env python
"""Scale audit in the CLUSTERED-embeddings regime (round-7 verdict #1).

The full-registry scale audit (tools/scale_audit.py) runs on the driver's
near-isotropic corpus, where pair enumeration is candidate/output-bound
by construction (the `output_bound` adjudication). This audit re-runs the
ANN family on the PRODUCTION regime — tools/gen_clustered_emb.py corpora
at n and 10n — and records the converse evidence the adjudication was
missing: with a wide banding on a clustered corpus, candidates and wall
grow near-linearly and planted recall holds.

Scenarios (each timed best-of-reps at both sizes):
  - near_dup_wide: banded_near_dup_pairs 6x16 @ threshold 0.95 — the
    pruning regime (plus candidate counts + planted recall at each size)
  - near_dup_topk: emb_near_dup_topk (the bounded alternative, unchanged)
  - cascade_topk: ann_cascade_topk (+ recall vs full-dim brute force)
  - matryoshka: emb_matryoshka_truncate (+ median norm_frac)

Usage: python tools/clustered_audit.py 2000 20000 > SCALE_AUDIT_CLUSTERED_r07.json
"""

from __future__ import annotations

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

WIDE = dict(n_bands=6, band_bits=16, threshold=0.95)


def _vecs(spark, sf_dir):
    from minibatch_spark.catalog import load_table
    from minibatch_spark.operators.similarity import as_double

    return load_table(spark, sf_dir, "embeddings").select(
        "vec_id", as_double("embedding").alias("v")
    )


def _time(fn, reps: int = 2) -> float:
    best = float("inf")
    for _ in range(reps):
        t0 = time.monotonic()
        fn()
        best = min(best, time.monotonic() - t0)
    return round(best, 3)


def run_size(spark, n: int, root: str) -> dict:
    from minibatch_spark.operators.similarity import (
        ann_cascade_topk,
        ann_topk_bruteforce,
        banded_near_dup_pairs,
        emb_matryoshka_truncate,
        emb_near_dup_topk,
    )
    from tools.gen_clustered_emb import write_corpus

    sf_dir = os.path.join(root, f"clust{n}")
    if not os.path.exists(os.path.join(sf_dir, "embeddings.parquet")):
        write_corpus(n, sf_dir)
    with open(os.path.join(sf_dir, "planted_pairs.json")) as f:
        planted = {tuple(sorted(p)) for p in json.load(f)}

    out: dict = {"n": n}
    # candidate count once (evidence), then timed verified enumeration
    cands = banded_near_dup_pairs(
        _vecs(spark, sf_dir), dim=64, threshold=-1.0,
        n_bands=WIDE["n_bands"], band_bits=WIDE["band_bits"],
        stage_name=f"aud-cand-{n}",
    ).count()
    out["candidate_pairs"] = cands
    out["all_pairs"] = n * (n - 1) // 2
    out["candidate_frac"] = round(cands / out["all_pairs"], 5)

    verified = {}

    def near_dup():
        res = banded_near_dup_pairs(
            _vecs(spark, sf_dir), dim=64, stage_name=f"aud-ver-{n}", **WIDE
        ).collect()
        verified["pairs"] = {(r.vec_a, r.vec_b) for r in res}

    out["near_dup_wide_sec"] = _time(near_dup)
    out["verified_pairs"] = len(verified["pairs"])
    out["planted_recall"] = round(
        len(planted & verified["pairs"]) / len(planted), 3
    )

    out["near_dup_topk_sec"] = _time(
        lambda: emb_near_dup_topk(spark, sf_dir).collect()
    )

    casc = {}

    def cascade():
        casc["ids"] = {r.vec_id for r in ann_cascade_topk(spark, sf_dir).collect()}

    out["cascade_topk_sec"] = _time(cascade)
    brute = {r.vec_id for r in ann_topk_bruteforce(spark, sf_dir).collect()}
    out["cascade_recall_vs_bruteforce"] = round(len(casc["ids"] & brute) / 10, 2)

    mrl = {}

    def matry():
        from pyspark.sql import functions as F

        mrl["med"] = (
            emb_matryoshka_truncate(spark, sf_dir)
            .select(F.expr("percentile(norm_frac, 0.5)").alias("m"))
            .first()
            .m
        )

    out["matryoshka_sec"] = _time(matry)
    out["norm_frac_median"] = round(mrl["med"], 3)
    spark.catalog.clearCache()
    return out


def main(n_a: int, n_b: int, root: str) -> None:
    from minibatch_spark.session import get_spark

    spark = get_spark(app_name="clustered-audit")
    a = run_size(spark, n_a, root)
    b = run_size(spark, n_b, root)
    ratio = n_b / n_a
    summary = {
        "regime": "clustered (gen_clustered_emb: mixture-of-Gaussians, "
        "(d+1)^-0.5 spectrum, planted cos-0.99 dups)",
        "banding": WIDE,
        "data_ratio": ratio,
        "a": a,
        "b": b,
        "candidate_growth": round(b["candidate_pairs"] / a["candidate_pairs"], 2),
        "wall_ratios": {
            k.removesuffix("_sec"): round(b[k] / a[k], 2)
            for k in ("near_dup_wide_sec", "near_dup_topk_sec",
                      "cascade_topk_sec", "matryoshka_sec")
            if a[k]
        },
        # the converse evidence for the isotropic `output_bound` label:
        # flag enumeration here if it grows super-linearly DESPITE the
        # clustered corpus + wide banding
        "flagged": [
            k
            for k, v in {
                "near_dup_wide": b["near_dup_wide_sec"] / a["near_dup_wide_sec"],
                "near_dup_topk": b["near_dup_topk_sec"] / a["near_dup_topk_sec"],
            }.items()
            if v > 2 * ratio
        ],
    }
    print(json.dumps(summary))


if __name__ == "__main__":
    n_a = int(sys.argv[1]) if len(sys.argv) > 1 else 2000
    n_b = int(sys.argv[2]) if len(sys.argv) > 2 else 20000
    root = sys.argv[3] if len(sys.argv) > 3 else "/tmp/sparkdata"
    main(n_a, n_b, root)
