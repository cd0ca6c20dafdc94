#!/usr/bin/env python
"""Micro-bench for the realistic-merge-count BPE path (r8 VERDICT Missing
#1): train 1500 merges driver-locally (train_bpe_merges) and tokenize the
corpus with the Arrow mapInPandas applier (apply_bpe) — the regime where
the oracle-gated chained-replace operator (text_bpe_apply, BPE_MERGES=6)
is structurally infeasible (a 1500-deep expression tree). The shipped
corpus vocabulary exhausts at ~89 merges, so training runs over a
deterministic open-vocabulary word table (the test_bpe.py recipe) merged
with the real vocab; application runs over the REAL documents table.

Usage: python tools/bench_bpe_apply.py [sf_dir] > BENCH_BPE_r09.json
"""
import json
import os
import random
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from pyspark.sql import functions as F  # noqa: E402


def main(sf_dir):
    from minibatch_spark.catalog import load_table
    from minibatch_spark.operators.text import (
        apply_bpe,
        bpe_word_vocab,
        train_bpe_merges,
    )
    from minibatch_spark.session import get_spark

    spark = get_spark(app_name="bench-bpe-apply")
    n_merges = 1500
    rng = random.Random(99)
    syll = [c + v for c in "bcdfghjklmnpqrstvwz" for v in "aeiouy"]
    wide = sorted(
        {
            "".join(rng.choice(syll) for _ in range(rng.randint(2, 5)))
            for _ in range(4000)
        }
    )
    wide_df = spark.createDataFrame(
        [(w, rng.randint(1, 500)) for w in wide], "word string, freq long"
    )
    vocab = (
        bpe_word_vocab(spark, sf_dir)
        .unionByName(wide_df)
        .groupBy("word")
        .agg(F.sum("freq").cast("long").alias("freq"))
    )
    t0 = time.monotonic()
    merges = train_bpe_merges(vocab, n_merges)
    train_wall = time.monotonic() - t0

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    best = None
    for _ in range(3):
        t0 = time.monotonic()
        apply_bpe(spark, docs, merges).write.format("noop").mode(
            "overwrite"
        ).save()
        w = time.monotonic() - t0
        best = w if best is None or w < best else best
    n_docs = docs.count()
    print(
        json.dumps(
            {
                "metric": "bpe_apply_1500_merges",
                "sf_dir": sf_dir,
                "n_merges": len(merges),
                "train_sec": round(train_wall, 3),
                "apply_sec_min_of_3": round(best, 3),
                "n_docs": n_docs,
                "unit": "sec",
            }
        )
    )


if __name__ == "__main__":
    main(sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1")
