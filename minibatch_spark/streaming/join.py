"""Stream-stream joins — ABSENT in the reference (SURVEY §2.10 lists
stream-stream joins among the features the reference lacks entirely; its
only multi-stream story is multiple producers appending to ONE buffer,
README.rst:30). Structured Streaming has them built in; this module wires
two ``Stream`` buffers into a watermarked, time-bounded equi-join.

Scale contract (the part that matters at 100 TB/day):

- BOTH sides carry a watermark and the join predicate carries a time
  bound (``right.created`` within ±``within_seconds`` of
  ``left.created``). Together these let the engine EVICT buffered rows
  once the watermark passes their join horizon — without them an inner
  stream-stream join must buffer both streams forever.
- The join shuffles both sides on the key; state lives in the state
  store partitioned the same way, so matching is executor-local.
- Outer results (``how='left_outer'``) emit only after the watermark
  proves no match can still arrive — same finalize-once discipline as
  the windowed aggregations in streaming/aggregate.py.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from minibatch_spark.streaming.models import SPARK_DDL, Stream


def joined_frame(
    left: Stream,
    right: Stream,
    spark,
    key_path: str = "$.k",
    within_seconds: float = 60.0,
    watermark: str = "10 seconds",
    how: str = "inner",
) -> DataFrame:
    """Join two streams on a JSON payload key, right-side event time
    within ``±within_seconds`` of the left's.

    Returns one row per matched pair: the key, both event times, both
    payloads, and the signed lag (right − left, ms). ``how='left_outer'``
    keeps unmatched left rows (right columns null) once the watermark
    passes their horizon."""
    if how not in ("inner", "left_outer"):
        raise ValueError(f"unsupported stream-stream join type {how!r}")

    def side(s: Stream, tag: str) -> DataFrame:
        return (
            spark.readStream.schema(SPARK_DDL)
            .parquet(s.buffer_dir)
            .withWatermark("created", watermark)
            .select(
                F.get_json_object("data", key_path).alias(f"{tag}_key"),
                F.col("created").alias(f"{tag}_created"),
                F.col("data").alias(f"{tag}_data"),
            )
        )

    l, r = side(left, "l"), side(right, "r")
    bound = F.expr(
        f"r_created BETWEEN l_created - INTERVAL {within_seconds} SECONDS"
        f" AND l_created + INTERVAL {within_seconds} SECONDS"
    )
    joined = l.join(r, (F.col("l_key") == F.col("r_key")) & bound, how)
    return joined.select(
        F.col("l_key").alias("key"),
        "l_created",
        "r_created",
        "l_data",
        "r_data",
        (F.unix_millis("r_created") - F.unix_millis("l_created")).alias("lag_ms"),
    )


def enriched_frame(
    stream: Stream,
    spark,
    dim: DataFrame,
    key_path: str = "$.k",
    dim_key: str = "key",
    how: str = "left",
    broadcast_dim: bool = True,
) -> DataFrame:
    """Stream-static enrichment join: every streaming row picks up the
    matching columns of a batch dimension table — the single most common
    production join shape (events x user table, clicks x campaign dim),
    and unreachable in the reference (no joins at all, SURVEY §2.4).

    The static side needs no watermark and holds NO stream state: Spark
    re-plans the dim per micro-batch (so a refreshed dim parquet is
    picked up on the next trigger — slowly-changing dimensions for
    free). ``broadcast_dim=True`` pins the broadcast the planner would
    pick anyway for any dim that fits — the stream side then never
    shuffles, which is the difference between per-batch latency bound by
    the dim size and by the BATCH size at 100 TB/day."""
    src = (
        spark.readStream.schema(SPARK_DDL)
        .parquet(stream.buffer_dir)
        .select(
            F.get_json_object("data", key_path).alias("key"),
            F.col("created"),
            F.col("data"),
        )
    )
    d = dim.withColumnRenamed(dim_key, "key") if dim_key != "key" else dim
    if broadcast_dim:
        d = F.broadcast(d)
    return src.join(d, "key", how)
