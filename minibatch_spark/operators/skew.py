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


def salted_join(
    fact: DataFrame,
    dim: DataFrame,
    key: str,
    n_salt: int = N_SALT,
    fact_salt_col: str = "_salt",
) -> DataFrame:
    """Replicate-and-salt equi join for skewed join keys.

    The fact side gets a deterministic salt in [0, n_salt); the dim side
    is exploded into n_salt copies, one per salt value; the join runs on
    (key, salt). A key owning 30% of the fact rows then lands on n_salt
    reducers instead of one straggler. Exact for any join the plain key
    join computes — salting only refines the partitioning, never the
    match set. Cost: the dim side shuffles n_salt-fold, so use this when
    the dim is too big to broadcast but n_salt x |dim| still beats the
    straggler (otherwise broadcast, or let AQE's skew-join splitting
    handle it when the skew is only in partition sizes, not one key).

    The salt is xxhash64-derived from all fact columns' natural row
    identity passed via ``key`` rows — deterministic across retries, no
    rand() in the plan (restartable stages re-compute identical salts)."""
    salted_fact = fact.withColumn(
        fact_salt_col, F.pmod(F.xxhash64(*fact.columns), F.lit(n_salt)).cast("int")
    )
    salted_dim = dim.withColumn(
        fact_salt_col, F.explode(F.sequence(F.lit(0), F.lit(n_salt - 1)))
    )
    return salted_fact.join(salted_dim, [key, fact_salt_col]).drop(fact_salt_col)


@query(
    "join_salted_enrich",
    oracle="""
    SELECT e.event_id, e.event_type,
           CAST(t.n_type AS BIGINT) AS n_type,
           ROUND(e.value - t.avg_value, 6) AS value_dev
    FROM events e
    JOIN (
      SELECT event_type, COUNT(*) AS n_type,
             CAST(CAST(SUM(CAST(value AS DECIMAL(12,2))) AS DECIMAL(20,6))
                  AS DOUBLE) / COUNT(*) AS avg_value
      FROM events GROUP BY event_type
    ) t ON t.event_type = e.event_type
    """,
)
def join_salted_enrich(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Enrich every event with its type's group stats via a SALTED join —
    the scale-out alternative to a window function when the partition key
    is hot (events.event_type has a handful of values: a partitionBy
    window puts ALL rows of a type through one task; the salted join
    spreads them over n_salt reducers).

    The per-type stats are exact decimal math (same dsum discipline as
    everywhere); the salted join must be invisible in the result — the
    oracle is the plain GROUP-BY-subquery join."""
    e = load_table(spark, sf_dir, "events")
    stats = e.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("long").alias("n_type"),
        (
            F.sum(dmoney("value")).cast("decimal(20,6)").cast("double")
            / F.count(F.lit(1))
        ).alias("avg_value"),
    )
    enriched = salted_join(
        e.select("event_id", "event_type", "value"), stats, "event_type"
    )
    return enriched.select(
        "event_id",
        "event_type",
        "n_type",
        F.round(F.col("value") - F.col("avg_value"), 6).alias("value_dev"),
    )
