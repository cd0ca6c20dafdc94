"""Skew mitigation operators (SURVEY §4.2 / the 100 TB checklist: "skewed
keys -> salting or AQE skew-join").

AQE's skew-join splitting handles JOIN skew at runtime; aggregation skew
on a dominant key is mitigated STRUCTURALLY here: salt the key so the
partial aggregate spreads over N reducers, then re-aggregate per true key.
For algebraic aggregates (sum/count/min/max) the two-stage form is exact.

At local scale this is demonstrably the same answer (the oracle ignores
the salting entirely); at 1000 executors it is the difference between one
straggler task owning the hot key's entire partition and N tasks each
owning 1/N of it.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from minibatch_spark.catalog import load_table
from minibatch_spark.operators.relational import dmoney
from minibatch_spark.registry import query

N_SALT = 16


def salted_agg(
    df: DataFrame,
    key: str,
    aggs: list[tuple[str, str, str]],
    n_salt: int = N_SALT,
) -> DataFrame:
    """Two-stage exact aggregation for skewed group keys.

    ``aggs`` is [(col, fn, alias)] with fn in {sum, count, min, max}:
    stage 1 groups by (key, salt) — the hot key's rows spread across
    ``n_salt`` reducers with map-side partial agg in front; stage 2
    re-combines the n_salt partials per key (sum of counts/sums, min of
    mins, max of maxes) — a tiny shuffle of |keys| x n_salt rows."""
    recombine = {"sum": F.sum, "count": F.sum, "min": F.min, "max": F.max}
    stage1 = df.withColumn(
        "_salt", (F.rand(seed=42) * n_salt).cast("int")
    ).groupBy(key, "_salt")
    partials = stage1.agg(
        *[
            (F.count(F.lit(1)) if fn == "count" else getattr(F, fn)(c)).alias(a)
            for c, fn, a in aggs
        ]
    )
    return partials.groupBy(key).agg(
        *[recombine[fn](a).alias(a) for _, fn, a in aggs]
    )


@query(
    "agg_salted_events",
    oracle="""
    SELECT event_type,
           COUNT(*) AS n_events,
           CAST(CAST(SUM(CAST(value AS DECIMAL(12,2))) AS DECIMAL(20,6)) AS DOUBLE) AS sum_value,
           MIN(value) AS min_value,
           MAX(value) AS max_value
    FROM events
    GROUP BY event_type
    """,
)
def agg_salted_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Salted aggregation over events.event_type (a handful of hot keys —
    exactly the shape that straggles unsalted at scale). The oracle is the
    plain one-stage GROUP BY: salting must be invisible in the result."""
    e = load_table(spark, sf_dir, "events").withColumn("dval", dmoney("value"))
    out = salted_agg(
        e,
        "event_type",
        [
            ("event_id", "count", "n_events"),
            ("dval", "sum", "sum_value_dec"),
            ("value", "min", "min_value"),
            ("value", "max", "max_value"),
        ],
    )
    # decimal staging for the money sum happens pre-salt so both stages
    # combine exact decimals; surface as double only at the end
    return out.select(
        "event_type",
        F.col("n_events").cast("long").alias("n_events"),
        F.col("sum_value_dec").cast("decimal(20,6)").cast("double").alias("sum_value"),
        "min_value",
        "max_value",
    )
