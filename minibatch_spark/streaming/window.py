"""Window emitters on Structured Streaming.

Reference protocol (minibatch/window.py:17-73, run loop :175-226):
``window_ready -> query -> process -> timestamp -> emit -> commit/undo ->
forward -> sleep``. Spark mapping (SURVEY.md §2.10):

- the polling loop        -> a StreamingQuery over the buffer file source
- window_ready/query      -> micro-batch delivery via foreachBatch
- process (mark-processed)-> checkpoint offsets (automatic, exactly-once
                             bookkeeping vs the reference's bool flag)
- timestamp               -> Stream.meta last_read advance
- commit                  -> checkpoint commits/ log (automatic); keep=True
                             appends the window to the windows table
- undo                    -> exception propagates -> micro-batch replays
                             from checkpoint on restart (at-least-once for
                             the user fn, reference window.py:119-124)

Strategies:
- CountWindow      (reference :305-327): exact-size batches with carry-over
  remainder persisted next to the checkpoint; invariant "N msgs / size s =>
  exactly N/s windows of s" (tests/test_minibatch.py:48-87).
- RelaxedTimeWindow (reference :281-302): every trigger emits everything
  that arrived — precisely Spark's default micro-batch semantics.
- FixedTimeWindow  (reference :229-278): event-time tumbling buckets,
  emits EMPTY windows for gaps (emit_empty=True forced, :250).

The user emit fn receives a ``Window`` with ``.data`` = list of payload
dicts — reference parity (models.py:116-133). That materialization is the
reference's 16 MB-capped design; for scale work pass ``as_dataframe=True``
and the fn gets the micro-batch DataFrame instead (the idiomatic
foreachBatch path with no driver materialization).
"""

from __future__ import annotations

import json
import os
import threading
import uuid
from dataclasses import dataclass, field
from datetime import datetime
from typing import Callable, Optional

import pyarrow as pa
import pyarrow.parquet as pq

from minibatch_spark.streaming.models import SPARK_DDL, Stream, utcnow


@dataclass
class Window:
    """One emitted mini-batch (reference minibatch/models.py:116-133)."""

    stream: str
    created: datetime
    data: list = field(default_factory=list)
    query: list = field(default_factory=list)

    def __iter__(self):
        return iter(self.data)

    def __len__(self):
        return len(self.data)


class WindowEmitter:
    """Base emitter: consumes the stream's buffer as a file-source
    StreamingQuery and applies the strategy per micro-batch.

    Subclass hook: ``split(rows, final)`` -> (list_of_windows, carry_rows).
    """

    def __init__(
        self,
        stream: Stream,
        emitfn: Optional[Callable] = None,
        forwardfn: Optional[Callable] = None,
        processfn: Optional[Callable] = None,
        emit_empty: bool = False,
        keep: bool = False,
        as_dataframe: bool = False,
        clean_source: bool = True,
        name: Optional[str] = None,
    ):
        self.stream = stream
        self.emitfn = emitfn
        self.forwardfn = forwardfn
        self.processfn = processfn
        self.emit_empty = emit_empty
        self.keep = keep
        self.as_dataframe = as_dataframe
        # reference commit() always deletes consumed buffer docs
        # (window.py:129-136, single-emitter constraint :63-69); the Spark
        # file source's cleanSource=delete reproduces it. Multi-consumer
        # setups pass clean_source=False — each query has its own offsets.
        self.clean_source = clean_source
        self.name = name or f"{type(self).__name__}-{stream.name}"
        self.emitted: list[Window] = []  # window metadata log (small)
        self._query = None
        self._stop_requested = threading.Event()

    # -- carry state (CountWindow remainder etc.), persisted beside the
    #    checkpoint so a restarted emitter resumes with the same remainder.
    @property
    def checkpoint_dir(self) -> str:
        return os.path.join(self.stream.checkpoint_root, self.name)

    @property
    def _carry_path(self) -> str:
        return os.path.join(self.checkpoint_dir, "carry.json")

    def _load_carry(self) -> list[dict]:
        try:
            with open(self._carry_path) as f:
                rows = json.load(f)
            for r in rows:
                r["created"] = datetime.fromisoformat(r["created"])
            return rows
        except FileNotFoundError:
            return []

    def _save_carry(self, rows: list[dict]) -> None:
        os.makedirs(self.checkpoint_dir, exist_ok=True)
        out = [dict(r, created=r["created"].isoformat()) for r in rows]
        tmp = self._carry_path + ".tmp"
        with open(tmp, "w") as f:
            json.dump(out, f)
        os.replace(tmp, self._carry_path)

    # -- strategy hook ----------------------------------------------------
    def split(self, rows: list[dict], final: bool) -> tuple[list[list[dict]], list[dict]]:
        """Default (reference Emitter, emitter/base.py:13-194): every batch
        is one window, nothing carried."""
        if rows or self.emit_empty:
            return [rows], []
        return [], []

    def window_query(self, rows: list[dict]) -> list:
        """The ``query`` metadata recorded on the Window (reference
        window.py:139-141): [lo, hi] bounds of the batch."""
        if not rows:
            return []
        times = [r["created"] for r in rows]
        return [min(times).isoformat(), max(times).isoformat()]

    # -- emission ---------------------------------------------------------
    def _emit_window(self, rows: list[dict]) -> None:
        data = [json.loads(r["data"]) for r in rows]
        win = Window(
            stream=self.stream.name,
            created=utcnow(),
            data=data,
            query=self.window_query(rows),
        )
        result = self.emitfn(win) if self.emitfn else win.data
        # commit: keep=True persists the window (reference window.py:126-136)
        if self.keep:
            self._persist(win)
        self.emitted.append(
            Window(win.stream, win.created, data=[], query=win.query)
        )
        # forward (reference window.py:155-157, emit_done :208-226)
        if self.forwardfn:
            self.forwardfn(result if result is not None else win.data)

    def _persist(self, win: Window) -> None:
        schema = pa.schema(
            [
                pa.field("stream", pa.string()),
                pa.field("created", pa.timestamp("us")),
                pa.field("query", pa.string()),
                pa.field("data", pa.string()),
            ]
        )
        table = pa.Table.from_pylist(
            [
                {
                    "stream": win.stream,
                    "created": win.created,
                    "query": json.dumps(win.query),
                    "data": json.dumps(win.data, default=str),
                }
            ],
            schema=schema,
        )
        fname = f"window-{uuid.uuid4().hex}.parquet"
        pq.write_table(table, os.path.join(self.stream.windows_dir, fname))

    def _advance_last_read(self, rows: list[dict]) -> None:
        if not rows:
            return
        meta = self.stream.meta()
        meta["last_read"] = max(r["created"] for r in rows).isoformat()
        self.stream._write_meta(meta)

    # -- micro-batch handler ----------------------------------------------
    def _on_batch(self, batch_df, batch_id: int) -> None:
        if self.as_dataframe:
            # scale path: no driver materialization; strategy split is
            # bypassed — the user fn owns the batch (idiomatic foreachBatch)
            if self.emitfn and (self.emit_empty or not batch_df.isEmpty()):
                self.emitfn(batch_df, batch_id)
            return
        rows = [r.asDict() for r in batch_df.orderBy("created", "seq").collect()]
        if self.processfn:
            rows = self.processfn(rows)
        carry = self._load_carry()
        windows, new_carry = self.split(carry + rows, final=False)
        for w in windows:
            self._emit_window(w)  # exception -> batch replay (undo parity)
        self._save_carry(new_carry)
        self._advance_last_read(rows)

    # -- run --------------------------------------------------------------
    def run(
        self,
        spark,
        blocking: bool = True,
        available_now: bool = False,
        trigger_seconds: Optional[float] = None,
        timeout: Optional[float] = None,
    ):
        """Start the StreamingQuery over the buffer directory.

        available_now=True drains everything currently buffered and stops
        (test mode — replaces the reference's sleep-based polling tests),
        then flushes remaining carry as final windows.
        """
        self.stream.flush()
        reader = spark.readStream.schema(SPARK_DDL).option("maxFilesPerTrigger", 1000)
        if self.clean_source:
            reader = reader.option("cleanSource", "delete")
        reader = reader.parquet(self.stream.buffer_dir)
        writer = (
            reader.writeStream.foreachBatch(self._on_batch)
            .option("checkpointLocation", os.path.join(self.checkpoint_dir, "spark"))
            .queryName(self.name)
        )
        if available_now:
            writer = writer.trigger(availableNow=True)
        elif trigger_seconds:
            writer = writer.trigger(processingTime=f"{trigger_seconds} seconds")
        self._query = writer.start()
        if available_now:
            self._query.awaitTermination()
            self._drain_final()
            return self
        if blocking:
            self._query.awaitTermination(timeout)
        return self

    def _drain_final(self) -> None:
        carry = self._load_carry()
        if not carry:
            return
        windows, rest = self.split(carry, final=True)
        for w in windows:
            self._emit_window(w)
        self._save_carry(rest)

    def stop(self) -> None:
        self._stop_requested.set()
        if self._query is not None:
            self._query.stop()

    @property
    def status(self) -> dict:
        """StreamingApp-style status (reference contrib/apps/omegaml.py:94-97
        parity -> StreamingQuery.status)."""
        if self._query is None:
            return {"state": "not-started", "emitted": len(self.emitted)}
        return {
            "state": "active" if self._query.isActive else "stopped",
            "emitted": len(self.emitted),
            **(self._query.status or {}),
        }


class CountWindow(WindowEmitter):
    """Exactly-``size`` batches in arrival order (reference window.py:305-327).

    Remainder rows carry across micro-batches (and restarts, via the
    persisted carry file); ``final`` drain does NOT flush a partial window —
    the reference never emits short windows either (count >= size check,
    window.py:314)."""

    def __init__(self, *args, size: int = 1, **kwargs):
        super().__init__(*args, **kwargs)
        self.size = max(1, int(size))

    def split(self, rows, final):
        windows = [
            rows[i : i + self.size]
            for i in range(0, len(rows) - self.size + 1, self.size)
        ]
        consumed = len(windows) * self.size
        return windows, rows[consumed:]


class RelaxedTimeWindow(WindowEmitter):
    """Every ``interval`` seconds emit ALL unprocessed messages (reference
    window.py:281-302) — exactly a processingTime-triggered micro-batch:
    no window-membership guarantee, no data loss."""

    def __init__(self, *args, interval: float = 1.0, **kwargs):
        super().__init__(*args, **kwargs)
        self.interval = interval

    def run(self, spark, **kwargs):
        kwargs.setdefault("trigger_seconds", self.interval)
        return super().run(spark, **kwargs)

    def split(self, rows, final):
        if rows or self.emit_empty:
            return [rows], []
        return [], []


class FixedTimeWindow(WindowEmitter):
    """Event-time tumbling windows of ``interval`` seconds (reference
    window.py:229-278). Emits EMPTY windows for buckets with no data
    (emit_empty forced True, reference :250) — the shim Spark's windowed
    aggregation lacks (SURVEY §7.3 W2).

    Non-final batches hold back the newest (possibly still-filling) bucket;
    the availableNow drain flushes it."""

    def __init__(self, *args, interval: float = 1.0, **kwargs):
        kwargs["emit_empty"] = True
        super().__init__(*args, **kwargs)
        self.interval = float(interval)

    def run(self, spark, **kwargs):
        kwargs.setdefault("trigger_seconds", self.interval)
        return super().run(spark, **kwargs)

    def _bucket(self, dt: datetime) -> int:
        return int(dt.timestamp() // self.interval)

    def split(self, rows, final):
        if not rows:
            return [], []
        by_bucket: dict[int, list[dict]] = {}
        for r in rows:
            by_bucket.setdefault(self._bucket(r["created"]), []).append(r)
        lo, hi = min(by_bucket), max(by_bucket)
        emit_hi = hi if final else hi - 1  # hold the newest bucket open
        windows = [by_bucket.get(b, []) for b in range(lo, emit_hi + 1)]
        carry = [] if final else by_bucket.get(hi, [])
        return windows, carry
