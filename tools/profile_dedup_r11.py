#!/usr/bin/env python
"""Stage bisection for the sf10-dominant dedup pair queries (round-11
optimization): time each pipeline stage with the noop sink so the next
optimization target is measured, not guessed (guide §1).

Usage: python tools/profile_dedup_r11.py <sf_dir> [reps]
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
    print(f"{label:48s} {best:8.3f} s")
    spark.sparkContext.setJobDescription(None)
    return best


def main() -> None:
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    from minibatch_spark.operators import dedup as D
    from minibatch_spark.session import get_spark

    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/tmp/sparkdata/sf1"
    reps = int(sys.argv[2]) if len(sys.argv) > 2 else 2
    spark = get_spark(app_name="profile-dedup-r11")

    t0 = time.monotonic()
    st = D.shingle_table(spark, sf_dir)
    noop(st)
    print(f"{'shingle_table stage+first-noop':48s} {time.monotonic() - t0:8.3f} s")
    timed(spark, "shingle_table re-noop (cached)", st, reps)

    # --- minhash pipeline stages ---
    reps_df = st.groupBy("text_hash").agg(
        F.min("doc_id").alias("doc_id"), F.min_by("sh", "doc_id").alias("sh")
    )
    timed(spark, "mh1: exact-dup collapse (reps)", reps_df, reps)
    h_df = reps_df.select("doc_id", D.shingle_hashes(F.col("sh")).alias("hs"))
    timed(spark, "mh2: +shingle md5 hashes", h_df, reps)
    sig_plain = h_df.select("doc_id", D.fast_minhash_sig(F.col("hs")).alias("sig"))
    timed(spark, "mh3: +16 permutations (unstaged)", sig_plain, reps)
    full = D.dedup_minhash_pairs(spark, sf_dir)
    timed(spark, "mh4: full dedup_minhash_pairs", full, reps)

    # --- ngram jaccard pipeline stages ---
    sh_arr = st.select("doc_id", F.col("hs").alias("sh"), "n")
    posting = sh_arr.select("doc_id", "n", F.explode("sh").alias("sh1"))
    timed(spark, "ng1: posting explode", posting, reps)
    ranked = posting.withColumn(
        "df", F.count(F.lit(1)).over(Window.partitionBy("sh1"))
    )
    timed(spark, "ng2: +df window", ranked, reps)
    prefix_len = F.col("n") - F.expr("(4 * n + 4) div 5") + F.lit(1)
    w = Window.partitionBy("doc_id").orderBy("df", "sh1")
    pref = (
        ranked.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= prefix_len)
        .select("doc_id", "sh1", "n")
    )
    timed(spark, "ng3: +rank window -> prefix (unstaged)", pref, reps)
    full_ng = D.dedup_ngram_jaccard(spark, sf_dir)
    timed(spark, "ng4: full dedup_ngram_jaccard", full_ng, reps)
    spark.stop()


if __name__ == "__main__":
    main()
