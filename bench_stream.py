#!/usr/bin/env python
"""Streaming throughput/latency bench: drives ~1M rows through each
windowing backend under Trigger.AvailableNow and prints ONE JSON line:

  {"metric": "stream_total_wall_sec", "value": N, "unit": "sec",
   "scenarios": {"countwindow_collect": {"rows": n, "wall_sec": s,
                  "rows_per_sec": r, "windows": w, "sec_per_window": l},
                 ...},
   "rows": 1000000, "window_size": 1000}

Scenarios (same 1M-row corpus, same window size, fresh stream + checkpoint
each):

- countwindow_collect   foreachBatch CountWindow, the reference-parity
                        driver-materializing default path (every window is
                        a Python list on the driver) — the path the
                        ``max_collect_rows`` guard protects.
- countwindow_dataframe foreachBatch with ``as_dataframe=True`` — no driver
                        materialization; the emit fn aggregates the batch
                        DataFrame (windows = micro-batches here).
- stateful_count        applyInPandasWithState CountWindow: remainder in
                        the engine state store, output as rows to a parquet
                        sink (fully distributed; no driver loop).
- tws_count             transformWithStateInPandas CountWindow (Spark 4
                        arbitrary state, RocksDB provider) — same contract,
                        new API + state backend.

Timing covers query start -> availableNow termination (+ final carry drain
for the foreachBatch paths). Producer time (writing the 1M-row buffer) is
excluded — production is pyarrow-side and identical across scenarios.
``sec_per_window`` is wall/windows: the average close-to-close pacing, the
micro-batch analog of the reference's <1 s/batch CI bound
(reference tests/test_mongodb.py:35-44).

Env knobs: SPARK_GRAFT_STREAM_ROWS (default 1_000_000),
SPARK_GRAFT_STREAM_WINDOW (default 1000), SPARK_GRAFT_CPUS.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time
from datetime import datetime, timedelta

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

N_ROWS = int(os.environ.get("SPARK_GRAFT_STREAM_ROWS", "1000000"))
WINDOW = int(os.environ.get("SPARK_GRAFT_STREAM_WINDOW", "1000"))
N_FILES = 16  # parallelism of the file source scan

T0 = datetime(2026, 1, 1, 12, 0, 0)


def produce(stream, n: int, n_keys: int = 1, created_us=None) -> None:
    """Bulk-load n envelope rows as N_FILES parquet parts (pyarrow direct —
    the Batcher path would build n dicts one at a time). ``n_keys > 1``
    spreads rows round-robin over that many stream keys: the state-store
    backends partition BY KEY, so single-key runs serialize on one task
    while multi-key runs use every core — the 1000-streams-in-parallel
    contract."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    per = n // N_FILES
    seq = 0
    for f in range(N_FILES):
        count = per if f < N_FILES - 1 else n - per * (N_FILES - 1)
        rows = range(seq, seq + count)
        names = (
            [stream.name] * count
            if n_keys == 1
            else [f"{stream.name}-{i % n_keys}" for i in rows]
        )
        table = pa.table(
            {
                "stream": pa.array(names),
                "created": pa.array(
                    [
                        T0
                        + timedelta(
                            microseconds=created_us(i) if created_us else i
                        )
                        for i in rows
                    ],
                    pa.timestamp("us"),
                ),
                "seq": pa.array(list(rows), pa.int64()),
                "data": pa.array([f'{{"i":{i}}}' for i in rows]),
            }
        )
        pq.write_table(table, os.path.join(stream.buffer_dir, f"part-{f:05d}.parquet"))
        seq += count


def run_sink_query(spark, df, ckpt: str, sink: str) -> float:
    t0 = time.monotonic()
    q = (
        df.writeStream.outputMode("append")
        .option("checkpointLocation", ckpt)
        .format("parquet")
        .option("path", sink)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return time.monotonic() - t0


def main() -> None:
    from minibatch_spark.session import get_spark
    from minibatch_spark.streaming.models import Stream
    from minibatch_spark.streaming.window import CountWindow

    spark = get_spark(app_name="minibatch-spark-bench-stream")
    base = tempfile.mkdtemp(prefix="bench-stream-")
    scenarios: dict[str, dict] = {}

    def record(name: str, wall: float, windows: int, rows: int = N_ROWS) -> None:
        scenarios[name] = {
            "rows": rows,
            "wall_sec": round(wall, 3),
            "rows_per_sec": round(rows / wall),
            "windows": windows,
            "sec_per_window": round(wall / max(windows, 1), 6),
        }

    # -- 1. foreachBatch CountWindow, driver-materializing default path ----
    s = Stream("bs-collect", base_dir=base)
    produce(s, N_ROWS)
    emitted = [0]

    def count_emit(w):
        emitted[0] += len(w.data)

    em = CountWindow(s, emitfn=count_emit, size=WINDOW, clean_source=False,
                     max_collect_rows=N_ROWS)
    t0 = time.monotonic()
    em.run(spark, available_now=True)
    wall = time.monotonic() - t0
    assert emitted[0] == (N_ROWS // WINDOW) * WINDOW, emitted[0]
    record("countwindow_collect", wall, len(em.emitted))

    # -- 2. foreachBatch, as_dataframe=True (no driver materialization) ----
    s = Stream("bs-dataframe", base_dir=base)
    produce(s, N_ROWS)
    agg = {"rows": 0, "batches": 0}

    def df_emit(batch_df, batch_id):
        agg["rows"] += batch_df.count()
        agg["batches"] += 1

    em = CountWindow(s, emitfn=df_emit, size=WINDOW, as_dataframe=True,
                     clean_source=False)
    t0 = time.monotonic()
    em.run(spark, available_now=True)
    wall = time.monotonic() - t0
    assert agg["rows"] == N_ROWS, agg
    record("countwindow_dataframe", wall, agg["batches"])

    # -- 3. applyInPandasWithState --------------------------------------
    from minibatch_spark.streaming.stateful import stateful_count_window

    s = Stream("bs-state", base_dir=base)
    produce(s, N_ROWS)
    sink = os.path.join(base, "sink-state")
    wall = run_sink_query(
        spark,
        stateful_count_window(s, spark, size=WINDOW),
        os.path.join(base, "ck-state"),
        sink,
    )
    windows = spark.read.parquet(sink).count()
    assert windows == N_ROWS // WINDOW, windows
    record("stateful_count", wall, windows)

    # -- 3b. applyInPandasWithState, 16 parallel stream keys --------------
    n_keys = 16
    s = Stream("bs-state16", base_dir=base)
    produce(s, N_ROWS, n_keys=n_keys)
    sink = os.path.join(base, "sink-state16")
    wall = run_sink_query(
        spark,
        stateful_count_window(s, spark, size=WINDOW),
        os.path.join(base, "ck-state16"),
        sink,
    )
    windows = spark.read.parquet(sink).count()
    assert windows == (N_ROWS // n_keys // WINDOW) * n_keys, windows
    record("stateful_count_16keys", wall, windows)

    # -- 4. transformWithStateInPandas (RocksDB) --------------------------
    from minibatch_spark.compat import ensure_protobuf

    if ensure_protobuf():
        from minibatch_spark.streaming.stateful import (
            rocksdb_state_store,
            tws_count_window,
        )

        s = Stream("bs-tws", base_dir=base)
        produce(s, N_ROWS)
        sink = os.path.join(base, "sink-tws")
        with rocksdb_state_store(spark):
            wall = run_sink_query(
                spark,
                tws_count_window(s, spark, size=WINDOW),
                os.path.join(base, "ck-tws"),
                sink,
            )
        windows = spark.read.parquet(sink).count()
        assert windows == N_ROWS // WINDOW, windows
        record("tws_count", wall, windows)

        # -- 4b. TWS, 16 parallel stream keys ----------------------------
        s = Stream("bs-tws16", base_dir=base)
        produce(s, N_ROWS, n_keys=n_keys)
        sink = os.path.join(base, "sink-tws16")
        with rocksdb_state_store(spark):
            wall = run_sink_query(
                spark,
                tws_count_window(s, spark, size=WINDOW),
                os.path.join(base, "ck-tws16"),
                sink,
            )
        windows = spark.read.parquet(sink).count()
        assert windows == (N_ROWS // n_keys // WINDOW) * n_keys, windows
        record("tws_count_16keys", wall, windows)

    # -- 5. SessionWindow (keyless, gap-separated runs) -------------------
    # the round-6 emitters get throughput rows (round-6 verdict #4): a
    # regression in the session partitioner or the carry path shows up
    # here, not only in correctness pins. Timestamps: WINDOW-row runs at
    # 1 ms spacing separated by 60 s jumps (gap=30 closes each run), so
    # the expected session count is exact.
    from minibatch_spark.streaming.window import SessionWindow, SlidingTimeWindow

    s = Stream("bs-session", base_dir=base)
    produce(
        s, N_ROWS,
        created_us=lambda i: (i // WINDOW) * 60_000_000 + (i % WINDOW) * 1_000,
    )
    sess_rows = [0]

    def sess_emit(w):
        sess_rows[0] += len(w.data)

    em = SessionWindow(s, gap=30.0, emitfn=sess_emit, clean_source=False,
                       max_collect_rows=N_ROWS)
    t0 = time.monotonic()
    em.run(spark, available_now=True)
    session_wall = time.monotonic() - t0
    assert sess_rows[0] == N_ROWS, sess_rows
    assert len(em.emitted) == N_ROWS // WINDOW, len(em.emitted)
    record("session_window", session_wall, len(em.emitted))

    # -- 6. SlidingTimeWindow (interval 60 s, slide 30 s: 2x overlap) -----
    # overlap machinery is O(rows x windows-per-batch) on the driver —
    # bench at N_ROWS/10 rows spaced 30 ms (each row in exactly 2
    # windows) so the scenario measures the emitter's intended
    # reference-protocol regime, not a pathological single giant batch.
    slide_rows = N_ROWS // 10
    s = Stream("bs-sliding", base_dir=base)
    produce(s, slide_rows, created_us=lambda i: i * 30_000)
    slid = {"rows": 0}

    def slide_emit(w):
        slid["rows"] += len(w.data)

    em = SlidingTimeWindow(s, interval=60.0, slide=30.0, emitfn=slide_emit,
                           clean_source=False, max_collect_rows=N_ROWS)
    t0 = time.monotonic()
    em.run(spark, available_now=True)
    sliding_wall = time.monotonic() - t0
    # every row lands in exactly interval/slide = 2 windows
    assert slid["rows"] == 2 * slide_rows, slid
    record("sliding_window", sliding_wall, len(em.emitted), rows=slide_rows)
    scenarios["sliding_window"]["emitted_rows"] = slid["rows"]

    # -- 7. Streaming IVF index ingest (foreachBatch + IvfIndexStore) -----
    # per micro-batch: one broadcast-assign pass over the shard + one
    # cell-partitioned parquet write (train on batch 0 only). Measures
    # the ANN-ingest path end-to-end incl. the exactly-once tag layout.
    import numpy as np

    from minibatch_spark.operators.ivf_store import IvfIndexStore
    from minibatch_spark.streaming.ivf_stream import ingest_embedding_stream

    n_vec = N_ROWS // 50  # 20k vectors at the 1M-row default
    dim, n_shards = 64, 4
    rng = np.random.default_rng(7)
    src = os.path.join(base, "ivf-src")
    os.makedirs(src)
    per = n_vec // n_shards
    for sh in range(n_shards):
        vecs = rng.standard_normal((per, dim))
        rows = [
            (sh * per + i, [float(x) for x in vecs[i]]) for i in range(per)
        ]
        p = os.path.join(src, f"p{sh}")
        spark.createDataFrame(rows, "vec_id long, ve array<double>").coalesce(
            1
        ).write.mode("overwrite").parquet(p)
        for root, _d, files in os.walk(p):
            for f in files:
                os.utime(
                    os.path.join(root, f),
                    (1_000_000_000 + sh, 1_000_000_000 + sh),
                )
    stream_v = (
        spark.readStream.schema("vec_id long, ve array<double>")
        .option("maxFilesPerTrigger", 1)
        .parquet(src + "/*")
    )
    store_dir = os.path.join(base, "ivf-store")
    t0 = time.monotonic()
    q = ingest_embedding_stream(
        spark, stream_v, store_dir, os.path.join(base, "ivf-ckpt"),
        cell_target=200,
    )
    q.awaitTermination()
    ivf_wall = time.monotonic() - t0
    n_indexed = IvfIndexStore(spark, store_dir).vectors().count()
    assert n_indexed == per * n_shards, (n_indexed, per * n_shards)
    record("ivf_ingest", ivf_wall, n_shards, rows=n_indexed)

    shutil.rmtree(base, ignore_errors=True)
    total = round(sum(sc["wall_sec"] for sc in scenarios.values()), 3)
    out = {
        "metric": "stream_total_wall_sec",
        "value": total,
        "unit": "sec",
        "scenarios": scenarios,
        "rows": N_ROWS,
        "window_size": WINDOW,
    }
    # TWS-vs-AIP bound, pinned (round-5 verdict #7): tools/profile_tws.py
    # isolates the gap to the TWS framework data path itself — a NO-OP
    # TWS processor (zero state ops, zero user logic) already runs ~30%
    # slower than a no-op applyInPandasWithState (97k vs 126k rows/s at
    # 1M rows), per-chunk protobuf framing this container pays in
    # pure-python protobuf; RocksDB is NOT the cost (the provider
    # measured FASTER than HDFS-backed on the same query), and larger
    # Arrow chunks make both paths slower. So TWS buys timers/TTL, not
    # throughput — applyInPandasWithState is the throughput default.
    # The regressed flag keeps the bound honest: a pyspark upgrade that
    # closes (or blows up) the gap shows up in the artifact, not a
    # silently stale docstring. The JSON is printed FIRST — wall-clock
    # ratios of two streaming runs are variance-prone on a loaded host,
    # and a noisy run must not cost the whole bench artifact — then a
    # non-zero exit signals the regression to any caller that checks.
    regressed = False
    if "tws_count" in scenarios:
        ratio = round(
            scenarios["tws_count"]["wall_sec"]
            / scenarios["stateful_count"]["wall_sec"],
            2,
        )
        out["tws_over_aip_wall_ratio"] = ratio
        regressed = ratio >= 3.0
        out["tws_ratio_regressed"] = regressed
    # Emitter-overhead bounds (round-6 verdict #4): both new emitters ride
    # the SAME driver-materializing foreachBatch path as
    # countwindow_collect, so their cost is that baseline plus the
    # strategy's own machinery (session sort/partition; sliding overlap
    # assignment). The flags bound the overhead as ratios to the baseline
    # measured in the SAME run — robust to shared-host drift. Sliding is
    # normalized per EMITTED row (overlap factor interval/slide = 2):
    # each row is delivered twice, so per-delivered-row cost is the
    # comparable unit.
    sess_ratio = round(
        scenarios["session_window"]["wall_sec"]
        / scenarios["countwindow_collect"]["wall_sec"],
        2,
    )
    out["session_over_count_wall_ratio"] = sess_ratio
    slide_eff = (
        scenarios["sliding_window"]["emitted_rows"]
        / scenarios["sliding_window"]["wall_sec"]
    )
    out["sliding_emitted_rows_per_sec"] = round(slide_eff)
    slide_ratio = round(
        scenarios["countwindow_collect"]["rows_per_sec"] / slide_eff, 2
    )
    out["count_over_sliding_per_row_ratio"] = slide_ratio
    out["emitter_ratio_regressed"] = sess_ratio >= 3.0 or slide_ratio >= 5.0
    regressed = regressed or out["emitter_ratio_regressed"]
    print(json.dumps(out))
    if regressed:
        if out.get("tws_ratio_regressed"):
            print(
                f"WARN: TWS at {out['tws_over_aip_wall_ratio']}x "
                "applyInPandasWithState wall (historical bound ~1.3-2.2x; "
                "see tools/profile_tws.py)",
                file=sys.stderr,
            )
        if out.get("emitter_ratio_regressed"):
            print(
                f"WARN: emitter overhead regressed — session/collect "
                f"{out['session_over_count_wall_ratio']}x (bound 3.0), "
                f"collect/sliding per-row "
                f"{out['count_over_sliding_per_row_ratio']}x (bound 5.0)",
                file=sys.stderr,
            )
        sys.exit(1)


if __name__ == "__main__":
    main()
