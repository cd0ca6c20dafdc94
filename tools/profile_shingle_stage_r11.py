#!/usr/bin/env python
"""Bisect the shared shingle-table staging pass (the dominant sf10 dedup
cost: ~27 s of each of the two ~52 s bench rows) and A/B alternative
shingle constructions — measure before changing (guide §1).

Usage: python tools/profile_shingle_stage_r11.py <sf_dir> [reps]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def noop(df):
    df.write.format("noop").mode("overwrite").save()


def timed(spark, label, df, reps):
    best = float("inf")
    for _ in range(reps):
        spark.sparkContext.setJobDescription(label)
        t0 = time.monotonic()
        noop(df)
        best = min(best, time.monotonic() - t0)
    print(f"{label:52s} {best:8.3f} s", flush=True)
    spark.sparkContext.setJobDescription(None)
    return best


def main() -> None:
    from pyspark.sql import functions as F

    from minibatch_spark.catalog import load_table, spread
    from minibatch_spark.operators import dedup as D
    from minibatch_spark.session import get_spark

    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/tmp/sparkdata/sf10"
    reps = int(sys.argv[2]) if len(sys.argv) > 2 else 2
    spark = get_spark(app_name="profile-shingle-stage-r11")

    # JIT warm on the small sf so stage deltas are not cold-JVM artifacts
    warm = os.path.join(os.path.dirname(sf_dir.rstrip("/")), "sf0.1")
    if not os.path.isdir(warm):
        warm = sf_dir
    noop(D.shingle_table(spark, warm))
    spark.catalog.clearCache()

    d = spread(load_table(spark, sf_dir, "documents"))

    s0 = d.select("doc_id", F.col("text"))
    timed(spark, "s0: scan+spread only", s0, reps)
    s1 = d.select("doc_id", F.md5("text").alias("text_hash"),
                  D.tokens("text").alias("tk"))
    timed(spark, "s1: +md5(text) +split", s1, reps)
    s2 = s1.select(
        "doc_id", "text_hash",
        F.explode(F.array(D.shingles_of(F.col("tk")))).alias("sh"),
    )
    timed(spark, "s2: +shingles (zip_with x2 + distinct)", s2, reps)
    s3 = (
        s2.withColumn("n", F.size("sh"))
        .filter(F.col("n") > 0)
        .withColumn("hs", F.transform(F.col("sh"), lambda s: F.xxhash64(s)))
    )
    timed(spark, "s3: +n filter +xxhash64 transform (full compute)", s3, reps)

    # --- alternative shingle constructions (same output contract) ---
    def sh_seq(tok):
        # single interpreted pass over sequence(3..n), 3 element_at each
        n = F.size(tok)
        grams = F.transform(
            F.sequence(F.lit(3), F.greatest(n, F.lit(2))),
            lambda i: F.concat_ws(
                " ",
                F.element_at(tok, i - 2),
                F.element_at(tok, i - 1),
                F.element_at(tok, i),
            ),
        )
        return F.array_distinct(grams)

    a1 = s1.select(
        "doc_id", "text_hash", F.explode(F.array(sh_seq(F.col("tk")))).alias("sh")
    )
    a1f = (
        a1.withColumn("n", F.size("sh"))
        .filter(F.col("n") > 0)
        .withColumn("hs", F.transform(F.col("sh"), lambda s: F.xxhash64(s)))
    )
    timed(spark, "alt1: sequence+element_at single pass (full)", a1f, reps)

    # equivalence probe: same distinct-shingle multiset per doc?
    cur = s3.select("doc_id", F.array_sort("sh").alias("c"))
    alt = a1f.select("doc_id", F.array_sort("sh").alias("a"))
    bad = cur.join(alt, "doc_id").filter(F.col("c") != F.col("a")).count()
    print(f"alt1 equivalence: mismatched docs = {bad}", flush=True)

    # --- staging (compute + persist + eager count) ---
    from minibatch_spark.catalog import stage

    t0 = time.monotonic()
    st = stage(s3, "profile-shingle-full")
    print(f"{'stage(): persist+count of full compute':52s} {time.monotonic() - t0:8.3f} s", flush=True)
    timed(spark, "staged re-noop", st, reps)
    spark.stop()


if __name__ == "__main__":
    main()
