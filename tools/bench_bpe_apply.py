#!/usr/bin/env python
"""Micro-bench for the realistic-merge-count BPE path (r8 VERDICT Missing
#1; 32k-merge row added per the r9 VERDICT task #5): train merges
driver-locally (train_bpe_merges) and tokenize the corpus with the Arrow
mapInPandas applier (apply_bpe) — the regime where the oracle-gated
chained-replace operator (text_bpe_apply, BPE_MERGES=6) is structurally
infeasible (a 1500-deep expression tree). The shipped corpus vocabulary
exhausts at ~89 merges, so training runs over a deterministic
open-vocabulary word table (the test_bpe.py recipe) merged with the real
vocab; application runs over the REAL documents table.

The claim under measurement at 32k: per-word apply cost grows with WORD
LENGTH (the per-word merge loop is bounded by len(word)-1 merges no
matter how many the tokenizer trained), not with merge count — the
merges ride in the closure as a dict, so 1500 -> 32000 should move
apply wall marginally while fertility falls (more merges = fewer tokens
per word).

Usage: python tools/bench_bpe_apply.py [sf_dir] [merge_counts_csv] \
           > BENCH_BPE_r10.json
       (default merge_counts 1500,32000)
"""
import json
import random
import sys
import time

import os

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from pyspark.sql import functions as F  # noqa: E402


def _wide_vocab(spark, n_words: int):
    """Deterministic open-vocabulary word table (test_bpe.py recipe),
    sized so the requested merge count is trainable: a 32k-merge run
    needs far more distinct-pair mass than the 31-word corpus vocab."""
    rng = random.Random(99)
    syll = [c + v for c in "bcdfghjklmnpqrstvwz" for v in "aeiouy"]
    wide = sorted(
        {
            "".join(rng.choice(syll) for _ in range(rng.randint(2, 5)))
            for _ in range(n_words)
        }
    )
    return spark.createDataFrame(
        [(w, rng.randint(1, 500)) for w in wide], "word string, freq long"
    )


def main(sf_dir, merge_counts):
    from minibatch_spark.catalog import load_table
    from minibatch_spark.operators.text import (
        apply_bpe,
        bpe_word_vocab,
        train_bpe_merges,
    )
    from minibatch_spark.session import get_spark

    spark = get_spark(app_name="bench-bpe-apply")
    # one wide vocab sized for the LARGEST merge count, shared across
    # runs so the fertility comparison is apples-to-apples
    vocab = (
        bpe_word_vocab(spark, sf_dir)
        .unionByName(_wide_vocab(spark, max(4000, 2 * max(merge_counts))))
        .groupBy("word")
        .agg(F.sum("freq").cast("long").alias("freq"))
    )
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    n_docs = docs.count()
    # a synthetic OPEN-VOCAB corpus from the wide word table: the real
    # corpus's 31-word vocabulary fully merges by ~89 merges, so its
    # fertility is 1.0 at ANY realistic count — the merge-count fertility
    # signal needs words the small tokenizer cannot fully merge
    rng = random.Random(7)
    wide_words = [r.word for r in _wide_vocab(spark, 4000).collect()]
    syn = spark.createDataFrame(
        [
            (i, " ".join(rng.choice(wide_words) for _ in range(50)))
            for i in range(2000)
        ],
        "doc_id long, text string",
    )
    runs = []
    for n_merges in merge_counts:
        t0 = time.monotonic()
        merges = train_bpe_merges(vocab, n_merges)
        train_wall = time.monotonic() - t0
        best = None
        for _ in range(3):
            t0 = time.monotonic()
            apply_bpe(spark, docs, merges).write.format("noop").mode(
                "overwrite"
            ).save()
            w = time.monotonic() - t0
            best = w if best is None or w < best else best

        def _fert(frame):
            r = (
                apply_bpe(spark, frame, merges)
                .agg(
                    (F.sum("n_bpe_tokens") / F.sum("n_words")).alias("f"),
                    F.sum("n_bpe_tokens").alias("t"),
                )
                .first()
            )
            return round(float(r["f"]), 4), int(r["t"])

        fr, tr = _fert(docs)
        fs, ts = _fert(syn)
        runs.append(
            {
                "n_merges_requested": n_merges,
                "n_merges_trained": len(merges),
                "train_sec": round(train_wall, 3),
                "apply_sec_min_of_3": round(best, 3),
                "fertility_real_corpus": fr,
                "total_bpe_tokens_real": tr,
                "fertility_open_vocab": fs,
                "total_bpe_tokens_open_vocab": ts,
            }
        )
    print(
        json.dumps(
            {
                "metric": "bpe_apply_merge_scaling",
                "sf_dir": sf_dir,
                "n_docs": n_docs,
                "unit": "sec",
                "runs": runs,
            }
        )
    )


if __name__ == "__main__":
    sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    counts = (
        [int(x) for x in sys.argv[2].split(",")]
        if len(sys.argv) > 2
        else [1500, 32000]
    )
    main(sf, counts)
