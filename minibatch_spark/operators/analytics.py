"""Event-sequence and data-quality analytics: funnel conversion, retention
cohorts, and one-pass table profiling.

The reference has no analytics operators at all (reference
README.rst:315-322 lists even count/filter/groupby as future work); its
users run these shapes against MongoDB aggregation pipelines downstream of
the buffer. Here they are first-class distributed queries:

- funnel ≙ the ordered view→click→purchase conversion count every event
  pipeline reports; the distributed shape is per-user conditional minima,
  NOT a self-join chain (a 3-way self-join on a 100 TB event log shuffles
  the log three times; the window form shuffles it once).
- retention cohorts ≙ week-of-first-seen × weeks-since activity matrix.
- table profile ≙ the per-column null/distinct/min/max pass a pipeline
  runs before trusting a new 100 TB drop (schema drift, null floods, and
  cardinality explosions all surface here first).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from minibatch_spark.catalog import load_table, spread
from minibatch_spark.registry import query

FUNNEL_DEADLINE_DAYS = 7  # purchase/click must land within this many days of the view


@query(
    "events_funnel",
    oracle=f"""
    WITH v AS (
      SELECT user_id, MIN(ts) AS t_view
      FROM events WHERE event_type = 'view' AND user_id IS NOT NULL
      GROUP BY user_id
    ), c AS (
      SELECT e.user_id, MIN(e.ts) AS t_click
      FROM events e JOIN v USING (user_id)
      WHERE e.event_type = 'click' AND e.ts > v.t_view
        AND e.ts <= v.t_view + INTERVAL {FUNNEL_DEADLINE_DAYS} DAY
      GROUP BY e.user_id
    ), p AS (
      SELECT e.user_id, MIN(e.ts) AS t_purchase
      FROM events e
      JOIN v USING (user_id) JOIN c USING (user_id)
      WHERE e.event_type = 'purchase' AND e.ts > c.t_click
        AND e.ts <= v.t_view + INTERVAL {FUNNEL_DEADLINE_DAYS} DAY
      GROUP BY e.user_id
    )
    SELECT stage, n_users FROM (
      SELECT 1 AS ord, 'view' AS stage, COUNT(*) AS n_users FROM v
      UNION ALL
      SELECT 2, 'view>click', COUNT(*) FROM c
      UNION ALL
      SELECT 3, 'view>click>purchase', COUNT(*) FROM p
    ) ORDER BY ord
    """,
)
def events_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered funnel: users whose first view is followed by a click and
    then a purchase, each strictly later than the previous stage and all
    within ``FUNNEL_DEADLINE_DAYS`` of the first view.

    Spark shape: ONE shuffle. Three chained per-user conditional minima
    as window functions over the same ``partitionBy(user_id)`` — Spark
    plans one Exchange and runs the three Window operators back-to-back
    on the partitioned data, and the final per-user dedup reuses the same
    partitioning (no second Exchange; the naive 3-way self-join form
    shuffles the full event log three times). The oracle states the same
    stages as join-CTEs — the declarative spec — while this plan is what
    it compiles to at 100 TB.

    NULL contract: rows with NULL user_id are EXCLUDED on both engines —
    Spark's window partitionBy would happily treat NULL as one real user
    (every null row in one partition) while SQL join/group semantics
    drop it, and an unattributable event cannot convert anyway (same
    masking convention as the as-of join's NULL-partition fix)."""
    e = spread(load_table(spark, sf_dir, "events")).filter(
        F.col("user_id").isNotNull()
    )
    w = Window.partitionBy("user_id")
    ts, et = F.col("ts"), F.col("event_type")
    e = e.withColumn("t_view", F.min(F.when(et == "view", ts)).over(w))
    deadline = F.col("t_view") + F.expr(f"INTERVAL {FUNNEL_DEADLINE_DAYS} DAYS")
    e = e.withColumn(
        "t_click",
        F.min(
            F.when((et == "click") & (ts > F.col("t_view")) & (ts <= deadline), ts)
        ).over(w),
    )
    e = e.withColumn(
        "t_purchase",
        F.min(
            F.when((et == "purchase") & (ts > F.col("t_click")) & (ts <= deadline), ts)
        ).over(w),
    )
    per_user = e.groupBy("user_id").agg(
        F.first("t_view").alias("t_view"),
        F.first("t_click").alias("t_click"),
        F.first("t_purchase").alias("t_purchase"),
    )
    counts = per_user.agg(
        F.count("t_view").alias("n_view"),
        F.count("t_click").alias("n_click"),
        F.count("t_purchase").alias("n_purchase"),
    )
    stages = counts.select(
        F.explode(
            F.array(
                F.struct(
                    F.lit(1).alias("ord"),
                    F.lit("view").alias("stage"),
                    F.col("n_view").alias("n_users"),
                ),
                F.struct(
                    F.lit(2).alias("ord"),
                    F.lit("view>click").alias("stage"),
                    F.col("n_click").alias("n_users"),
                ),
                F.struct(
                    F.lit(3).alias("ord"),
                    F.lit("view>click>purchase").alias("stage"),
                    F.col("n_purchase").alias("n_users"),
                ),
            )
        ).alias("s")
    )
    return stages.select("s.stage", "s.n_users").orderBy("s.ord")


@query(
    "events_retention_cohorts",
    oracle="""
    WITH firstseen AS (
      SELECT user_id, CAST(date_trunc('week', MIN(ts)) AS DATE) AS cohort_day
      FROM events WHERE user_id IS NOT NULL GROUP BY user_id
    ), act AS (
      SELECT DISTINCT e.user_id, f.cohort_day,
             (CAST(date_trunc('week', e.ts) AS DATE) - f.cohort_day) // 7
               AS week_offset
      FROM events e JOIN firstseen f USING (user_id)
    )
    SELECT strftime(cohort_day, '%Y-%m-%d') AS cohort_week,
           week_offset, COUNT(*) AS n_users
    FROM act GROUP BY 1, 2
    """,
)
def events_retention_cohorts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Retention matrix: users bucketed by week of FIRST activity
    (cohort), counted once per later week they return. Both week columns
    are Monday-truncated on both engines, so the day difference is an
    exact multiple of 7 and the integer division is engine-portable.

    Spark shape: cohort assignment is a window min over
    ``partitionBy(user_id)`` (one Exchange), the per-(user, week) dedup
    and the cohort count are map-side-combined aggs on the already
    hash-partitioned data. The events table is scanned ONCE — the
    join-on-firstseen form the oracle states would scan and shuffle it
    twice.

    NULL contract: NULL user_id rows are excluded on both engines (same
    rationale as events_funnel — a window partition of NULLs is not a
    cohort)."""
    e = spread(load_table(spark, sf_dir, "events")).filter(
        F.col("user_id").isNotNull()
    )
    w = Window.partitionBy("user_id")
    e = e.select(
        "user_id",
        F.to_date(F.date_trunc("week", F.min("ts").over(w))).alias("cohort_day"),
        F.to_date(F.date_trunc("week", "ts")).alias("act_week"),
    )
    act = e.select(
        "user_id",
        F.date_format("cohort_day", "yyyy-MM-dd").alias("cohort_week"),
        (F.datediff("act_week", "cohort_day") / 7).cast("long").alias("week_offset"),
    ).distinct()
    return act.groupBy("cohort_week", "week_offset").agg(
        F.count(F.lit(1)).alias("n_users")
    )


# (col_name, spark min/max cast) — numeric + temporal profile as DOUBLE
# (timestamps as epoch millis), strings as lexical min/max in their own
# columns; one row per profiled column.
_PROFILE_NUM = ["l_quantity", "l_extendedprice", "l_discount"]
_PROFILE_STR = ["l_returnflag", "l_linestatus"]
_PROFILE_TS = ["l_shipdate"]


def _profile_oracle() -> str:
    rows = []
    for c in _PROFILE_NUM:
        rows.append(
            f"""SELECT '{c}' AS col_name, COUNT(*) AS n_rows,
            COUNT(*) - COUNT({c}) AS n_null,
            COUNT(DISTINCT {c}) AS n_distinct,
            CAST(MIN({c}) AS DOUBLE) AS min_num,
            CAST(MAX({c}) AS DOUBLE) AS max_num,
            CAST(NULL AS VARCHAR) AS min_str, CAST(NULL AS VARCHAR) AS max_str
            FROM lineitem"""
        )
    for c in _PROFILE_TS:
        rows.append(
            f"""SELECT '{c}', COUNT(*), COUNT(*) - COUNT({c}),
            COUNT(DISTINCT {c}),
            CAST(fdiv(epoch_us(MIN({c})), 1000) AS DOUBLE),
            CAST(fdiv(epoch_us(MAX({c})), 1000) AS DOUBLE),
            NULL, NULL FROM lineitem"""
        )
    for c in _PROFILE_STR:
        rows.append(
            f"""SELECT '{c}', COUNT(*), COUNT(*) - COUNT({c}),
            COUNT(DISTINCT {c}), NULL, NULL, MIN({c}), MAX({c}) FROM lineitem"""
        )
    return " UNION ALL ".join(rows)


@query("table_profile", oracle=_profile_oracle())
def table_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-column profile of ``lineitem`` in ONE pass: row count, null
    count, exact distinct count, and min/max (numerics + timestamps as
    DOUBLE — timestamps as floored epoch millis, the cross-engine
    convention from the pre-epoch parity suite; strings lexically).

    Spark shape: a single wide aggregate. The multiple exact
    COUNT(DISTINCT col) compile to one Expand (×6 row fan-out) feeding a
    two-level partial/final agg — one scan, one shuffle whose size is
    O(sum of per-column cardinalities), not O(rows). At 100 TB swap the
    distinct counts for approx_count_distinct (documented here, exact
    kept because the profile IS the gate artifact and the DuckDB oracle
    hash-checks exact values); everything else is plain map-side-combined
    min/max/count. The per-column rows are exploded from the single agg
    row driver-free."""
    li = spread(load_table(spark, sf_dir, "lineitem"))
    aggs = [F.count(F.lit(1)).alias("n_rows")]
    for c in _PROFILE_NUM + _PROFILE_TS + _PROFILE_STR:
        aggs += [
            F.count(F.col(c)).alias(f"{c}__nn"),
            F.count_distinct(F.col(c)).alias(f"{c}__nd"),
        ]
    for c in _PROFILE_NUM:
        aggs += [
            F.min(c).cast("double").alias(f"{c}__min"),
            F.max(c).cast("double").alias(f"{c}__max"),
        ]
    for c in _PROFILE_TS:
        aggs += [
            F.floor(F.unix_micros(F.min(c)) / 1000).cast("double").alias(f"{c}__min"),
            F.floor(F.unix_micros(F.max(c)) / 1000).cast("double").alias(f"{c}__max"),
        ]
    for c in _PROFILE_STR:
        aggs += [F.min(c).alias(f"{c}__min"), F.max(c).alias(f"{c}__max")]
    one = li.agg(*aggs)

    def row(c: str, numeric: bool) -> F.Column:
        return F.struct(
            F.lit(c).alias("col_name"),
            F.col("n_rows").alias("n_rows"),
            (F.col("n_rows") - F.col(f"{c}__nn")).alias("n_null"),
            F.col(f"{c}__nd").alias("n_distinct"),
            (F.col(f"{c}__min") if numeric else F.lit(None).cast("double")).alias(
                "min_num"
            ),
            (F.col(f"{c}__max") if numeric else F.lit(None).cast("double")).alias(
                "max_num"
            ),
            (F.lit(None).cast("string") if numeric else F.col(f"{c}__min")).alias(
                "min_str"
            ),
            (F.lit(None).cast("string") if numeric else F.col(f"{c}__max")).alias(
                "max_str"
            ),
        )
    rows = [row(c, True) for c in _PROFILE_NUM + _PROFILE_TS] + [
        row(c, False) for c in _PROFILE_STR
    ]
    return one.select(F.explode(F.array(*rows)).alias("p")).select("p.*")
