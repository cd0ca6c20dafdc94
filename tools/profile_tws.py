#!/usr/bin/env python
"""Isolate WHERE the transformWithStateInPandas rows/s gap vs
applyInPandasWithState comes from (BENCH_STREAM r4: 52k vs 112k rows/s
at 1M rows / 1 key). Five scenarios over the same corpus:

  aip_noop     applyInPandasWithState, consume rows, no state, emit nothing
  tws_noop     transformWithStateInPandas, consume rows, NO state access
  tws_state    TWS + the real CountWindow state ops (get/update x2)
  aip_real     the shipped stateful_count_window (baseline)
  aip_rocksdb  aip_real under the RocksDB provider (isolates the provider)

Reading the deltas:
  tws_noop - aip_noop    = TWS framework/data-path overhead (Arrow+proto
                           handshake per chunk, pure-python protobuf)
  tws_state - tws_noop   = per-batch state RPC cost
  aip_rocksdb - aip_real = RocksDB provider cost (commit/snapshot)

Usage: python tools/profile_tws.py [n_rows]
"""
from __future__ import annotations

import os
import sys
import shutil
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import pandas as pd

N_ROWS = int(sys.argv[1]) if len(sys.argv) > 1 else 1_000_000
WINDOW = 1000


def main() -> None:
    from bench_stream import produce, run_sink_query
    from minibatch_spark.compat import ensure_protobuf
    from minibatch_spark.session import get_spark
    from minibatch_spark.streaming.models import SPARK_DDL, Stream
    from minibatch_spark.streaming.stateful import (
        OUTPUT_DDL,
        STATE_DDL,
        rocksdb_state_store,
        stateful_count_window,
        tws_count_window,
    )

    spark = get_spark(app_name="profile-tws")
    base = tempfile.mkdtemp(prefix="profile-tws-")
    results: dict[str, float] = {}

    def corpus(name: str) -> Stream:
        s = Stream(name, base_dir=base)
        produce(s, N_ROWS)
        return s

    def run(name: str, df) -> None:
        wall = run_sink_query(
            spark, df, os.path.join(base, f"ck-{name}"), os.path.join(base, f"sink-{name}")
        )
        results[name] = round(wall, 2)
        print(f"{name}: {wall:.2f}s  ({N_ROWS / wall / 1000:.0f}k rows/s)", flush=True)

    from pyspark.sql.streaming.state import GroupStateTimeout

    # -- aip_noop ---------------------------------------------------------
    def noop_fn(key, pdfs, state):
        n = sum(len(p) for p in pdfs)
        if False:
            yield pd.DataFrame()
        state.update(("", 0))
        return iter(())

    s = corpus("p-aip-noop")
    df = (
        spark.readStream.schema(SPARK_DDL)
        .parquet(s.buffer_dir)
        .groupBy("stream")
        .applyInPandasWithState(
            noop_fn, OUTPUT_DDL, STATE_DDL, "append", GroupStateTimeout.NoTimeout
        )
    )
    run("aip_noop", df)

    # -- aip_real ---------------------------------------------------------
    s = corpus("p-aip-real")
    run("aip_real", stateful_count_window(s, spark, size=WINDOW))

    # -- aip_rocksdb ------------------------------------------------------
    s = corpus("p-aip-rocks")
    with rocksdb_state_store(spark):
        run("aip_rocksdb", stateful_count_window(s, spark, size=WINDOW))

    if not ensure_protobuf():
        print("no protobuf -> skipping TWS scenarios", flush=True)
        return

    from pyspark.sql.streaming.stateful_processor import StatefulProcessor

    class _NoopTWS(StatefulProcessor):
        def init(self, handle) -> None:
            pass

        def handleInputRows(self, key, rows, timerValues):
            n = sum(len(p) for p in rows)
            return iter(())

        def handleExpiredTimer(self, key, timerValues, expiredTimerInfo):
            return iter(())

        def handleInitialState(self, key, initialState, timerValues) -> None:
            pass

        def close(self) -> None:
            pass

    # -- tws_noop ---------------------------------------------------------
    s = corpus("p-tws-noop")
    src = spark.readStream.schema(SPARK_DDL).parquet(s.buffer_dir)
    with rocksdb_state_store(spark):
        run(
            "tws_noop",
            src.groupBy("stream").transformWithStateInPandas(
                statefulProcessor=_NoopTWS(),
                outputStructType=OUTPUT_DDL,
                outputMode="append",
                timeMode="none",
            ),
        )

    # -- tws_state --------------------------------------------------------
    s = corpus("p-tws-state")
    with rocksdb_state_store(spark):
        run("tws_state", tws_count_window(s, spark, size=WINDOW))

    shutil.rmtree(base, ignore_errors=True)
    print(results)


if __name__ == "__main__":
    main()
