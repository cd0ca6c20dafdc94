"""Batch analogs of the reference's mini-batch windowing strategies
(SURVEY.md §2.10; reference minibatch/window.py:229-327) expressed
relationally, so the driver's DuckDB oracle can verify the *semantics*:

- CountWindow  (window.py:305-327): exactly-size batches in arrival order
  -> row_number over (ts, event_id) div size.
- FixedTimeWindow (window.py:229-278): tumbling event-time windows
  -> date_trunc / epoch-floor bucketing.
- sliding windows (ABSENT in reference — README.rst:318 future work)
  -> each event in len/slide overlapping buckets.
- session windows (ABSENT) -> see relational.sessionize_events and the
  streaming layer's session_window.

The *streaming* implementations live in minibatch_spark/streaming/; these
batch forms pin down the window-membership math shared by both.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from minibatch_spark.catalog import load_table
from minibatch_spark.operators.relational import dmoney, dsum
from minibatch_spark.registry import query


@query(
    "count_window_batches",
    oracle="""
    WITH numbered AS (
      SELECT value, event_id,
             ROW_NUMBER() OVER (ORDER BY ts, event_id) AS rn
      FROM events
    )
    SELECT CAST((rn - 1) // 10 AS BIGINT) AS batch_id,
           COUNT(*) AS batch_size,
           CAST(CAST(SUM(CAST(value AS DECIMAL(12,2))) AS DECIMAL(20,6)) AS DOUBLE) AS sum_value,
           MIN(event_id) AS first_event,
           MAX(event_id) AS last_event
    FROM numbered
    GROUP BY 1
    """,
)
def count_window_batches(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CountWindow(size=10) semantics on a bounded stream: consecutive
    arrival-ordered batches of exactly 10 (last may be partial) — the
    invariant pinned by reference tests/test_minibatch.py:48-87.

    Global row numbering is TWO-PASS, not a single global Window sort
    (which funnels every row through one task): range-repartition on the
    arrival key, number rows per partition in parallel, then add each
    partition's cumulative row offset (a ~#partitions-row driver-side
    prefix sum, broadcast back). Deterministic because (ts, event_id) is a
    strict total order — partition boundaries may vary run to run, the
    global numbering cannot."""
    from pyspark.sql import Window

    from minibatch_spark.catalog import stage

    e = load_table(spark, sf_dir, "events")
    part = e.select("value", "event_id", "ts").repartitionByRange(
        32, "ts", "event_id"
    ).withColumn("pid", F.spark_partition_id())
    wp = Window.partitionBy("pid").orderBy("ts", "event_id")
    # staged: repartitionByRange SAMPLES its boundaries, so two separate
    # actions (the counts collect below and the final agg) would otherwise
    # see different pid assignments — materialize (pid, prn) exactly once
    numbered = stage(part.withColumn("prn", F.row_number().over(wp)), "countwin-rn")
    counts = sorted(
        numbered.groupBy("pid").agg(F.count(F.lit(1)).alias("c")).collect(),
        key=lambda r: r.pid,
    )
    offsets, acc = {}, 0
    for r in counts:
        offsets[r.pid] = acc
        acc += r.c
    # tiny (#partitions entries) — inlined, no join; empty input keeps a
    # placeholder entry (create_map() with zero args is invalid; the
    # frame it decorates has no rows to look up anyway)
    off = F.create_map(
        *([F.lit(x) for kv in offsets.items() for x in kv] or [F.lit(0), F.lit(0)])
    )
    return (
        numbered.withColumn("rn", F.col("prn") + off[F.col("pid")])
        .groupBy(((F.col("rn") - 1) / 10).cast("long").alias("batch_id"))
        .agg(
            F.count(F.lit(1)).alias("batch_size"),
            dsum(dmoney("value")).alias("sum_value"),
            F.min("event_id").alias("first_event"),
            F.max("event_id").alias("last_event"),
        )
    )


@query(
    "tumbling_window_events",
    oracle="""
    SELECT date_trunc('hour', ts) AS window_start,
           event_type,
           COUNT(*) AS n_events,
           CAST(CAST(SUM(CAST(value AS DECIMAL(12,2))) AS DECIMAL(20,6)) AS DOUBLE) AS sum_value
    FROM events
    GROUP BY 1, 2
    """,
)
def tumbling_window_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """FixedTimeWindow(interval=3600) batch analog: tumbling 1-hour windows.
    (The streaming form uses window('ts', '1 hour') + watermark; hour
    date_trunc is the identical bucketing.)"""
    e = load_table(spark, sf_dir, "events")
    return e.groupBy(
        F.date_trunc("hour", "ts").alias("window_start"),
        "event_type",
    ).agg(
        F.count(F.lit(1)).alias("n_events"),
        dsum(dmoney("value")).alias("sum_value"),
    )


@query(
    "sliding_window_events",
    oracle="""
    SELECT epoch_ms((CAST(fdiv(epoch_us(e.ts), 1800000000) AS BIGINT) - off.o) * 1800000)
             AS window_start,
           COUNT(*) AS n_events,
           CAST(CAST(SUM(CAST(e.value AS DECIMAL(12,2))) AS DECIMAL(20,6)) AS DOUBLE) AS sum_value
    FROM events e, (VALUES (CAST(0 AS BIGINT)), (CAST(1 AS BIGINT))) AS off(o)
    GROUP BY 1
    """,
)
def sliding_window_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sliding windows (1 h length, 30 min slide) — ABSENT in the reference
    (README.rst:318 'sliding windows' is future work). Spark's window()
    assigns each event to len/slide = 2 overlapping epoch-aligned buckets;
    the oracle replays the same bucket arithmetic with epoch math."""
    e = load_table(spark, sf_dir, "events")
    return (
        e.groupBy(F.window("ts", "1 hour", "30 minutes").alias("w"))
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            dsum(dmoney("value")).alias("sum_value"),
        )
        .select(
            F.col("w.start").alias("window_start"),
            "n_events",
            "sum_value",
        )
    )


@query(
    "session_window_events",
    oracle="""
    WITH flagged AS (
      SELECT user_id, ts, value,
             CASE WHEN LAG(ts) OVER w IS NULL
                    OR epoch_us(ts) - epoch_us(LAG(ts) OVER w) >= 600000000
                  THEN 1 ELSE 0 END AS is_new
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY ts)
    ), sess AS (
      SELECT user_id, ts, value,
             SUM(is_new) OVER (PARTITION BY user_id ORDER BY ts
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sid
      FROM flagged
    )
    SELECT user_id, MIN(ts) AS session_start, COUNT(*) AS n_events,
           CAST(CAST(SUM(CAST(value AS DECIMAL(12,2))) AS DECIMAL(20,6)) AS DOUBLE) AS sum_value
    FROM sess
    GROUP BY user_id, sid
    """,
)
def session_window_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Session windows (10-min gap) via Spark's native session_window —
    ABSENT in the reference. The oracle derives identical sessions with
    lag + cumulative-flag SQL. Deterministic because (user_id, ts) is
    unique in the corpus."""
    e = load_table(spark, sf_dir, "events")
    return (
        e.groupBy("user_id", F.session_window("ts", "10 minutes").alias("w"))
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            dsum(dmoney("value")).alias("sum_value"),
        )
        .select(
            "user_id",
            F.col("w.start").alias("session_start"),
            "n_events",
            "sum_value",
        )
    )


@query(
    "events_gap_fill",
    oracle="""
    WITH f AS (
      SELECT event_type, date_trunc('day', ts) AS day, value FROM events
      WHERE value > 250
    ), daily AS (
      SELECT event_type, day,
             CAST(COUNT(*) AS BIGINT) AS n,
             CAST(CAST(SUM(CAST(value AS DECIMAL(12,2))) AS DECIMAL(20,6))
                  AS DOUBLE) AS sum_v
      FROM f GROUP BY event_type, day
    ), bounds AS (
      SELECT date_trunc('day', MIN(day)) AS lo, date_trunc('day', MAX(day)) AS hi
      FROM daily
    ), spine AS (
      SELECT t.event_type, d.day
      FROM (SELECT DISTINCT event_type FROM f) t
      CROSS JOIN (
        SELECT unnest(generate_series(lo, hi, INTERVAL 1 DAY)) AS day FROM bounds
      ) d
    ), joined AS (
      SELECT s.event_type, s.day, daily.n, daily.sum_v,
             COUNT(daily.n) OVER (PARTITION BY s.event_type ORDER BY s.day) AS grp
      FROM spine s LEFT JOIN daily
        ON daily.event_type = s.event_type AND daily.day = s.day
    )
    SELECT event_type, day,
           CAST(COALESCE(n, 0) AS BIGINT) AS n_events,
           ROUND(MAX(sum_v / n) OVER (PARTITION BY event_type, grp), 6)
             AS ffill_avg
    FROM joined
    """,
)
def events_gap_fill(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-series resampling with gap fill + forward fill (ABSENT in the
    reference — its windows only group what arrived): sparse daily
    aggregates (rare events, value > 250 — 54 of 150 day-slots filled at
    sf0.01) are re-sampled onto a complete day spine; missing days get
    count 0 and carry the last observed daily average forward.

    The spine is sequence()-generated from a 1-row bounds aggregate
    crossed with the distinct keys — the same spine construction the
    FixedTimeWindow empty-window shim uses (streaming/window.py), here as
    a batch operator. Forward fill is the portable two-window trick:
    a running COUNT of non-null observations partitions each series into
    carry groups, then one MAX per (key, group) — both windows shuffle
    on the SAME key (event_type), so one exchange serves all. Days
    before a series' first observation stay NULL by design (nothing to
    carry). At 100 TB the spine is |keys| x |days| — output-sized, never
    corpus-sized; the corpus is touched once by the daily agg."""
    from pyspark.sql import Window

    f = load_table(spark, sf_dir, "events").filter(F.col("value") > 250)
    f = f.select(
        "event_type", F.date_trunc("day", "ts").alias("day"), "value"
    )
    daily = f.groupBy("event_type", "day").agg(
        F.count(F.lit(1)).alias("n"),
        dsum(dmoney("value")).alias("sum_v"),
    )
    bounds = daily.agg(
        F.min("day").alias("lo"), F.max("day").alias("hi")
    )
    types = f.select("event_type").distinct()
    spine = (
        types.join(F.broadcast(bounds))
        .select(
            "event_type",
            F.explode(
                F.sequence("lo", "hi", F.expr("INTERVAL 1 DAY"))
            ).alias("day"),
        )
    )
    j = spine.join(daily, ["event_type", "day"], "left")
    w_run = Window.partitionBy("event_type").orderBy("day")
    j = j.withColumn("grp", F.count("n").over(w_run))
    w_grp = Window.partitionBy("event_type", "grp")
    return j.select(
        "event_type",
        "day",
        F.coalesce(F.col("n"), F.lit(0)).cast("long").alias("n_events"),
        F.round(
            F.max(F.col("sum_v") / F.col("n")).over(w_grp), 6
        ).alias("ffill_avg"),
    )


@query(
    "events_rollup_merge",
    oracle="""
    SELECT date_trunc('day', ts) AS day,
           event_type,
           COUNT(*) AS n_events,
           CAST(CAST(SUM(CAST(value AS DECIMAL(12,2))) AS DECIMAL(20,6)) AS DOUBLE) AS sum_value,
           MIN(value) AS min_value,
           MAX(value) AS max_value,
           CAST(CAST(SUM(CAST(value AS DECIMAL(12,2))) AS DECIMAL(20,6)) AS DOUBLE)
             / COUNT(*) AS avg_value
    FROM events
    GROUP BY 1, 2
    """,
)
def events_rollup_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Continuous-aggregate pattern (hypertable rollup): answer a DAILY
    query by MERGING a finer HOURLY rollup, never re-reading raw events.

    The hourly rollup keeps only mergeable partial states — count, exact
    decimal sum, min, max — so coarser grains are a second (tiny)
    aggregation over rollup rows: merged count = sum of counts, merged
    sum = sum of sums, min/max = min/max. AVG is NON-mergeable and is
    derived at read time as merged_sum/merged_count — averaging hourly
    averages would weight each hour equally regardless of row count (the
    classic rollup bug). The oracle aggregates the RAW table directly,
    proving the two-level merge is exact, decimal staging included.

    Scale: this is the 100 TB pattern for dashboard/reporting grains —
    the raw corpus is touched once per rollup build (streaming upkeep in
    production); every coarser query costs |hours| rows, ~4 orders of
    magnitude smaller. Both aggs shuffle on prefixes of the same keys,
    and the day agg's input is already near-final size."""
    e = load_table(spark, sf_dir, "events")
    hourly = (
        e.groupBy(
            F.date_trunc("hour", "ts").alias("hour"),
            "event_type",
        ).agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(dmoney("value")).cast("decimal(20,6)").alias("sum_dec"),
            F.min("value").alias("mn"),
            F.max("value").alias("mx"),
        )
    )
    merged = (
        hourly.groupBy(
            F.date_trunc("day", "hour").alias("day"),
            "event_type",
        ).agg(
            F.sum("n").alias("n_events"),
            F.sum("sum_dec").cast("decimal(20,6)").alias("sum_merged"),
            F.min("mn").alias("min_value"),
            F.max("mx").alias("max_value"),
        )
    )
    return merged.select(
        "day",
        "event_type",
        "n_events",
        F.col("sum_merged").cast("double").alias("sum_value"),
        "min_value",
        "max_value",
        (F.col("sum_merged").cast("double") / F.col("n_events")).alias("avg_value"),
    )


@query(
    "events_rollup_hll",
    oracle="""
    SELECT date_trunc('day', ts) AS day,
           event_type,
           COUNT(DISTINCT user_id) AS exact_users,
           CAST(1 AS BOOLEAN) AS hll_within_5pct
    FROM events
    GROUP BY 1, 2
    """,
)
def events_rollup_hll(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Approximate-distinct continuous aggregate: DAILY distinct users
    computed by MERGING hourly HyperLogLog sketches (hll_sketch_agg →
    hll_union_agg → estimate), never re-reading raw events for the
    coarser grain.

    This is the piece exact rollups (events_rollup_merge) cannot give
    you: COUNT(DISTINCT) is NOT mergeable from exact partials, but HLL
    sketches are — fixed-size byte arrays that union associatively, so
    every grain above hourly costs |buckets| sketch unions instead of a
    corpus-wide distinct shuffle. At 1000 executors that turns the
    dashboard-distinct query from a 100 TB re-partition into KB-sized
    state per bucket. Sketch internals are engine-specific, so the
    oracle pins the portable contract: the exact count plus a boolean
    asserting the merged estimate lands within HLL's error bound (lgK=12
    ⇒ rsd≈1.6%; asserted at 5%)."""
    e = load_table(spark, sf_dir, "events")
    hourly = e.groupBy(
        F.date_trunc("hour", "ts").alias("hour"),
        "event_type",
    ).agg(F.hll_sketch_agg("user_id").alias("sk"))
    daily_est = (
        hourly.groupBy(F.date_trunc("day", "hour").alias("day"), "event_type")
        .agg(F.hll_sketch_estimate(F.hll_union_agg("sk")).alias("hll_users"))
    )
    exact = e.groupBy(
        F.date_trunc("day", "ts").alias("day"),
        "event_type",
    ).agg(F.count_distinct("user_id").alias("exact_users"))
    # NULL contract (null-injection sweep): event_type can be NULL and is
    # a legitimate group on both engines — a plain join key drops it
    # (NULL != NULL), so the estimate joins back null-safely; and a group
    # whose users are ALL NULL has exact_users = 0 (COUNT DISTINCT skips
    # nulls), where the error-ratio is undefined — the contract there is
    # "the sketch saw nothing either" (sketches skip nulls too).
    j = exact.alias("x").join(
        daily_est.alias("h"),
        (F.col("x.day") == F.col("h.day"))
        & F.col("x.event_type").eqNullSafe(F.col("h.event_type")),
        "left",
    )
    rel_err = (
        F.abs(F.col("hll_users") - F.col("exact_users")) / F.col("exact_users")
    )
    ok = F.when(
        F.col("exact_users") == 0,
        F.coalesce(F.col("hll_users"), F.lit(0.0)) == 0.0,
    ).otherwise(rel_err <= F.lit(0.05))
    return j.select(
        F.col("x.day").alias("day"),
        F.col("x.event_type").alias("event_type"),
        "exact_users",
        ok.alias("hll_within_5pct"),
    )


# --- Count-Min sketch point-frequency estimates -------------------------
#
# CMS parameters: DEPTH seeded hash rows x WIDTH counters. Error contract:
# est >= exact always (counters only over-count), and est <= exact + eps*N
# with probability 1 - (1/2)^DEPTH, eps = e/WIDTH. Both engines replay the
# sketch EXACTLY (same md5-derived cell coordinates, integer counters), so
# the oracle checks values, not just the bound.
CMS_DEPTH = 4
CMS_WIDTH = 512


def _cms_pos(key, d: int):
    """Counter coordinate of ``key`` under seed row ``d``: the shared
    md5-60-bit hash (dedup.h64) mod WIDTH — non-negative, so ``pmod``
    here and plain ``%`` in DuckDB agree."""
    from minibatch_spark.operators.dedup import h64

    return F.pmod(h64(F.concat(F.lit(f"cms{d}:"), key)), F.lit(CMS_WIDTH))


_CMS_POS_SQL = (
    "CAST(('0x' || substring(md5('cms' || {d} || ':' || {k}), 1, 15)) "
    f"AS BIGINT) % {CMS_WIDTH}"
)


@query(
    "events_cms_heavy_hitters",
    oracle=f"""
    WITH seeds AS (SELECT * FROM (VALUES (0), (1), (2), (3)) s(d)),
    ev AS (
      SELECT CAST(user_id AS VARCHAR) AS k, user_id FROM events
      WHERE user_id IS NOT NULL
    ),
    cells AS (
      SELECT s.d, {_CMS_POS_SQL.format(d="s.d", k="ev.k")} AS pos,
             COUNT(*) AS c
      FROM ev CROSS JOIN seeds s
      GROUP BY 1, 2
    ),
    probes AS (
      SELECT user_id, CAST(user_id AS VARCHAR) AS k, COUNT(*) AS exact_n
      FROM events
      WHERE user_id % 13 = 0
      GROUP BY 1, 2
    ),
    est AS (
      SELECT p.user_id, p.exact_n, MIN(c.c) AS cms_est
      FROM probes p
      CROSS JOIN seeds s
      JOIN cells c
        ON c.d = s.d
       AND c.pos = {_CMS_POS_SQL.format(d="s.d", k="p.k")}
      GROUP BY 1, 2
    )
    SELECT user_id, exact_n, cms_est,
           CASE WHEN cms_est >= exact_n THEN 1 ELSE 0 END AS never_under
    FROM est
    """,
)
def events_cms_heavy_hitters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Count-Min sketch point-frequency estimates: per-key event counts
    answered from DEPTH x WIDTH = 2048 integer counters instead of a
    per-key state table.

    Why this exists next to events_rollup_hll: HLL answers "how many
    DISTINCT keys" — CMS answers "how often THIS key", the other
    fixed-size mergeable sketch a 100 TB monitoring plane needs
    (heavy-hitter detection, per-user rate limits) without a
    billions-of-keys shuffle. The sketch builds in two grains to pin
    MERGEABILITY the way events_rollup_merge does for exact partials:
    per-day partial sketches (map-side combinable — at most
    days x DEPTH x WIDTH cells leave any executor), then cell-wise SUM
    into the global sketch, which is exactly the cross-shard /
    cross-cluster merge operator (counter matrices add associatively).

    Probe set = the deterministic user_id % 13 slice (bounded sample; a
    production heavy-hitter pass probes the keys of the current batch).
    Estimates join the probe rows against the 2048-row sketch — 4
    broadcast joins, no shuffle of the probe side beyond its own
    aggregate. Oracle replays every counter exactly (md5-derived
    coordinates, integer cells): `never_under` pins the one-sided error
    contract, and cms_est's exact value pins the sketch itself.

    Reference has no sketch ops (README.rst:315-322); this is the
    LLM-pipeline/monitoring extension mandated beyond it."""
    e = load_table(spark, sf_dir, "events")
    key = F.col("user_id").cast("string")
    # per-day partial sketches: explode each event into DEPTH (d, pos)
    # coordinates, then count per (day, d, pos) — map-side combine leaves
    # at most |days| x DEPTH x WIDTH rows per task
    coords = e.filter(F.col("user_id").isNotNull()).select(
        F.date_trunc("day", "ts").alias("day"),
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(d).alias("d"), _cms_pos(key, d).alias("pos")
                    )
                    for d in range(CMS_DEPTH)
                ]
            )
        ).alias("c"),
    )
    daily_sketch = coords.groupBy("day", "c.d", "c.pos").agg(
        F.count(F.lit(1)).alias("c")
    )
    # the merge operator: cell-wise sum of partial sketches
    sketch = daily_sketch.groupBy("d", "pos").agg(F.sum("c").alias("c"))
    probes = (
        e.filter(F.pmod("user_id", F.lit(13)) == 0)
        .groupBy("user_id")
        .agg(F.count(F.lit(1)).alias("exact_n"))
        .withColumn("k", F.col("user_id").cast("string"))
    )
    est = probes
    for d in range(CMS_DEPTH):
        sk_d = sketch.filter(F.col("d") == d).select(
            F.col("pos").alias(f"pos{d}"), F.col("c").alias(f"c{d}")
        )
        est = est.join(
            F.broadcast(sk_d),
            _cms_pos(F.col("k"), d) == F.col(f"pos{d}"),
            "inner",
        )
    cms_est = F.least(*[F.col(f"c{d}") for d in range(CMS_DEPTH)])
    return est.select(
        "user_id",
        "exact_n",
        cms_est.alias("cms_est"),
        F.when(cms_est >= F.col("exact_n"), 1).otherwise(0).alias(
            "never_under"
        ),
    )
