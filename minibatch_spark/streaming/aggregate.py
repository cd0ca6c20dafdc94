"""Watermarked event-time aggregations over a stream's buffer (W11).

The reference's only late-data mechanism is a crude fixed-lateness sleep
("wait interval+0.01 s so all data had a chance to accumulate",
minibatch/window.py:269-278) — late rows beyond that silently fall into
no window. This module provides the real thing on Structured Streaming:
``withWatermark('created', delay)`` + windowed/session aggregation, so

- state is bounded (windows older than the watermark are finalized and
  evicted — the property that keeps a 100 TB stream's state finite);
- in append mode a window is emitted EXACTLY ONCE, when the watermark
  passes its end;
- rows arriving below the watermark are dropped by the engine (the
  disciplined version of the reference's silent late-data loss).

These are aggregation-shaped consumers (counts/sums per event-time
window) — complementary to the record-shaped WindowEmitter strategies in
streaming/window.py, which reproduce the reference's emit-fn protocol.
"""

from __future__ import annotations

import os
from typing import Optional

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from minibatch_spark.streaming.models import SPARK_DDL, Stream


def _source(stream: Stream, spark) -> DataFrame:
    return spark.readStream.schema(SPARK_DDL).parquet(stream.buffer_dir)


def windowed_frame(
    stream: Stream,
    spark,
    interval_seconds: float,
    slide_seconds: Optional[float] = None,
    watermark: str = "10 seconds",
    value_path: str = "$.v",
) -> DataFrame:
    """Tumbling (or sliding, with ``slide_seconds``) watermarked window
    aggregation: per-window row count + sum of a JSON payload field.

    The groupBy shuffles on the window key with map-side partial
    aggregation; watermark state eviction keeps executor state bounded to
    (watermark delay / interval) windows per key."""
    src = _source(stream, spark).withWatermark("created", watermark)
    if slide_seconds:
        win = F.window(
            "created", f"{interval_seconds} seconds", f"{slide_seconds} seconds"
        )
    else:
        win = F.window("created", f"{interval_seconds} seconds")
    val = F.get_json_object("data", value_path).cast("double")
    return (
        src.groupBy(win.alias("w"))
        .agg(F.count(F.lit(1)).alias("n"), F.sum(val).alias("sum_value"))
        .select(
            F.col("w.start").alias("window_start"),
            F.col("w.end").alias("window_end"),
            "n",
            "sum_value",
        )
    )


def session_frame(
    stream: Stream,
    spark,
    gap_seconds: float,
    watermark: str = "10 seconds",
    key_path: str = "$.user",
) -> DataFrame:
    """Watermarked session windows (gap-based) per payload key — the
    streaming counterpart of the batch sessionize/session_window queries."""
    src = _source(stream, spark).withWatermark("created", watermark)
    key = F.get_json_object("data", key_path).alias("key")
    return (
        src.groupBy(
            key, F.session_window("created", f"{gap_seconds} seconds").alias("w")
        )
        .agg(F.count(F.lit(1)).alias("n"))
        .select(
            "key",
            F.col("w.start").alias("session_start"),
            F.col("w.end").alias("session_end"),
            "n",
        )
    )


def run_available_now(
    df: DataFrame,
    checkpoint_dir: str,
    output_mode: str = "append",
    sink_dir: Optional[str] = None,
    query_name: str = "mb-agg",
):
    """Drain everything currently buffered through the aggregation and
    stop. append + file sink finalizes exactly the windows the watermark
    has passed (restartable: state and watermark live in the checkpoint);
    complete + memory sink exposes every open window for inspection."""
    writer = (
        df.writeStream.outputMode(output_mode)
        .queryName(query_name)
        .trigger(availableNow=True)
        .option("checkpointLocation", checkpoint_dir)
    )
    if sink_dir is not None:
        writer = writer.format("parquet").option("path", sink_dir)
    else:
        writer = writer.format("memory")
    q = writer.start()
    q.awaitTermination()
    return q


def read_sink(spark, sink_dir: str) -> DataFrame:
    """Batch view over the file-sink output (empty-safe)."""
    try:
        if not any(f.endswith(".parquet") for f in os.listdir(sink_dir)):
            return spark.createDataFrame(
                [], "window_start timestamp, window_end timestamp, n long, sum_value double"
            )
    except FileNotFoundError:
        pass
    return spark.read.parquet(sink_dir)


def deduped_frame(
    stream: Stream,
    spark,
    key_path: str = "$.id",
    watermark: str = "10 seconds",
) -> DataFrame:
    """Streaming EXACT dedup on a payload key with BOUNDED state:
    ``dropDuplicatesWithinWatermark`` keeps each key's state only until
    the watermark passes it, so at-least-once producers (the reference's
    delivery contract, and this engine's under replay) are collapsed to
    effectively-once WITHOUT the unbounded key set a plain
    dropDuplicates would accumulate — the property that keeps a
    forever-running 100 TB/day ingest's state finite."""
    src = _source(stream, spark).withWatermark("created", watermark)
    return src.withColumn(
        "dedup_key", F.get_json_object("data", key_path)
    ).dropDuplicatesWithinWatermark(["dedup_key"]).drop("dedup_key")
