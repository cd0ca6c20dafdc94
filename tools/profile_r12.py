#!/usr/bin/env python
"""Round-12 stage bisection probes for the remaining bench hot spots.

Usage: python tools/profile_r12.py <probe> [sf_dir]
Probes: winnow, bigrams, partitions
Each sub-pipeline is timed into the noop sink, min-of-REPS, one session —
relative numbers within one run are comparable; absolute numbers are not
(co-tenant host).
"""

from __future__ import annotations

import os
import sys
import time
from functools import reduce

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.1"
REPS = int(os.environ.get("REPS", "3"))


def t(label, df):
    spark = df.sparkSession
    spark.sparkContext.setJobDescription(label)
    best = float("inf")
    for _ in range(REPS):
        t0 = time.perf_counter()
        df.write.format("noop").mode("overwrite").save()
        best = min(best, time.perf_counter() - t0)
    print(f"{label:55s} {best:8.3f} s")
    spark.sparkContext.setJobDescription(None)
    return best


def winnow(spark):
    from pyspark.sql import functions as F

    from minibatch_spark.catalog import fanout_repartition, load_table, spread
    from minibatch_spark.operators.text import (
        WINNOW_CHUNK as C,
        WINNOW_K as K,
        WINNOW_MINI as M,
        WINNOW_W as W,
    )

    def build(use_spread=True, fanout_n=None, upto="full"):
        d = load_table(spark, SF_DIR, "documents")
        if use_spread:
            d = spread(d)
        p = (F.length("text") - F.lit(K + W - 2)).alias("p")
        docs = d.filter(F.length("text") >= K + W - 1).select("doc_id", "text", p)
        chunks = (
            docs.select(
                "doc_id",
                "text",
                F.explode(
                    F.sequence(F.lit(0), F.floor((F.col("p") - 1) / C).cast("int"))
                ).alias("c"),
            )
            .select(
                "doc_id",
                "c",
                F.substr(
                    "text", (F.col("c") * C + 1).cast("int"), F.lit(C + K + W - 2)
                ).alias("ctext"),
            )
            .transform(lambda d: fanout_repartition(d, "doc_id", "c", partitions=fanout_n))
        )
        if upto == "chunks":
            return chunks
        nf = (F.length("ctext") - F.lit(K + W - 2)).alias("nf")
        minis = (
            chunks.select("doc_id", "c", "ctext", nf)
            .select(
                "doc_id",
                F.explode(
                    F.sequence(F.lit(0), F.floor((F.col("nf") - 1) / M).cast("int"))
                ).alias("m"),
                "ctext",
            )
            .select(
                "doc_id",
                F.substr(
                    "ctext", (F.col("m") * M + 1).cast("int"), F.lit(M + K + W - 2)
                ).alias("mtext"),
            )
        )
        if upto == "minis":
            return minis
        hs = F.transform(
            F.sequence(F.lit(1), F.length("mtext") - F.lit(K - 1)),
            lambda jj: F.conv(
                F.substring(F.md5(F.substr(F.col("mtext"), jj, F.lit(K))), 1, 15),
                16,
                10,
            ).cast("bigint"),
        )
        with_hs = minis.select(
            "doc_id",
            (F.length("mtext") - F.lit(K + W - 2)).alias("nfm"),
            F.explode(F.array(hs)).alias("hs"),
        )
        if upto == "hs":
            return with_hs
        least2 = lambda x, y: F.least(x, y)  # noqa: E731
        fps = reduce(
            lambda a, b: F.zip_with(a, b, least2),
            [F.slice(F.col("hs"), i + 1, F.col("nfm")) for i in range(W)],
        )
        sel = with_hs.select("doc_id", fps.alias("fps"))
        if upto == "fps":
            return sel
        allfp = F.flatten(F.collect_list("fps"))
        return (
            sel.groupBy("doc_id")
            .agg(allfp.alias("allfp"))
            .select(
                "doc_id",
                F.size(F.array_distinct("allfp")).alias("n_fp"),
                F.array_min("allfp").alias("fp_min"),
                F.array_max("allfp").alias("fp_max"),
            )
        )

    # warm
    build().write.format("noop").mode("overwrite").save()
    t("winnow full (spread, fanout=32)", build())
    t("winnow full (NO spread)", build(use_spread=False))
    t("winnow full (spread, fanout=8)", build(fanout_n=8))
    t("winnow full (NO spread, fanout=8)", build(use_spread=False, fanout_n=8))
    t("winnow upto chunks", build(upto="chunks"))
    t("winnow upto minis", build(upto="minis"))
    t("winnow upto hs", build(upto="hs"))
    t("winnow upto fps", build(upto="fps"))


def bigrams(spark):
    from pyspark.sql import functions as F

    from minibatch_spark.catalog import load_table, spread
    from minibatch_spark.operators.dedup import tokens

    def build(n=None, upto="full"):
        d = load_table(spark, SF_DIR, "documents")
        d = d.repartition(n) if n else spread(d)
        staged = d.select(tokens("text").alias("t"))
        t_ = F.col("t")
        grams = F.filter(
            F.zip_with(
                t_,
                F.slice(t_, 2, F.greatest(F.size(t_) - 1, F.lit(0))),
                lambda a, b: F.concat(a, F.lit(" "), b),
            ),
            lambda g: g.isNotNull(),
        )
        ex = staged.select(F.explode(grams).alias("bigram"))
        if upto == "explode":
            return ex
        return (
            ex.groupBy("bigram")
            .agg(F.count(F.lit(1)).alias("n"))
            .orderBy(F.desc("n"), F.asc("bigram"))
            .limit(20)
        )

    build().write.format("noop").mode("overwrite").save()
    t("bigrams full (spread=32)", build())
    for n in (1, 4, 8, 16):
        t(f"bigrams full (repartition={n})", build(n=n))
    t("bigrams explode only (spread=32)", build(upto="explode"))
    t("bigrams explode only (repartition=8)", build(n=8, upto="explode"))


def main():
    from minibatch_spark.session import get_spark

    spark = get_spark(app_name="profile-r12")
    probe = sys.argv[1]
    if probe == "winnow":
        winnow(spark)
    elif probe == "bigrams":
        bigrams(spark)
    else:
        raise SystemExit(f"unknown probe {probe}")


if __name__ == "__main__":
    main()
