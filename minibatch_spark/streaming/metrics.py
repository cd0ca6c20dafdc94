"""Streaming observability: per-query progress metrics via
``StreamingQueryListener``.

SURVEY §2.10 W11 names "late-data drop metrics via StreamingQueryListener"
as the Spark-native replacement for the reference's silent late-data loss
(reference minibatch/window.py:269-278 sleeps and hopes; nothing records
what was missed). The listener is pushed the engine's own counters after
every micro-batch — input rows, processing rates, batch duration, and the
state-store's ``numRowsDroppedByWatermark`` — so an operator can ALARM on
late-data loss instead of discovering it in an audit.

Listener callbacks run on a background delivery thread, asynchronously
after the batch commits; ``wait_for_progress`` exists because of exactly
that (tests and shutdown paths must not race the delivery thread).
"""

from __future__ import annotations

import json
import threading
import time
from typing import Optional

from pyspark.sql.streaming import StreamingQueryListener


class MetricsListener(StreamingQueryListener):
    """Accumulate per-query streaming metrics from listener events.

    One instance can observe many queries, keyed by RUN id — a query
    restarted from the same checkpoint keeps its query id but gets a
    fresh run id, and metrics must not bleed across restarts. Attach
    once per SparkSession. All counters are monotonic sums over the
    progress events seen so far.
    """

    def __init__(self):
        self._lock = threading.Lock()
        self._by_query: dict[str, dict] = {}

    # -- listener callbacks (engine delivery thread) --------------------
    def onQueryStarted(self, event):
        with self._lock:
            self._by_query.setdefault(
                str(event.runId),
                {"name": event.name, "batches": 0, "input_rows": 0,
                 "dropped_by_watermark": 0, "total_batch_ms": 0,
                 "terminated": False, "exception": None},
            )

    def onQueryProgress(self, event):
        p = json.loads(event.progress.json)
        with self._lock:
            m = self._by_query.setdefault(
                str(p.get("runId")),
                {"name": p.get("name"), "batches": 0, "input_rows": 0,
                 "dropped_by_watermark": 0, "total_batch_ms": 0,
                 "terminated": False, "exception": None},
            )
            m["batches"] += 1
            m["input_rows"] += int(p.get("numInputRows") or 0)
            m["total_batch_ms"] += int(
                (p.get("durationMs") or {}).get("triggerExecution") or 0
            )
            for op in p.get("stateOperators") or []:
                m["dropped_by_watermark"] += int(
                    op.get("numRowsDroppedByWatermark") or 0
                )

    def onQueryIdle(self, event):
        pass

    def onQueryTerminated(self, event):
        with self._lock:
            m = self._by_query.setdefault(str(event.runId), {})
            m["terminated"] = True
            m["exception"] = event.exception

    # -- consumer side --------------------------------------------------
    def summary(self) -> dict[str, dict]:
        with self._lock:
            return {k: dict(v) for k, v in self._by_query.items()}

    def for_query(self, run_id: str) -> Optional[dict]:
        """Look up by StreamingQuery.runId."""
        return self.summary().get(str(run_id))

    def wait_for_progress(
        self, run_id: str, min_batches: int = 1, timeout: float = 30.0
    ) -> dict:
        """Block until ``min_batches`` progress events for ``run_id``
        have been DELIVERED (not just executed) or raise TimeoutError.
        Listener delivery is asynchronous to batch commit."""
        deadline = time.monotonic() + timeout
        while time.monotonic() < deadline:
            m = self.for_query(run_id)
            if m and m.get("batches", 0) >= min_batches:
                return m
            time.sleep(0.05)
        raise TimeoutError(
            f"no {min_batches} progress events for run {run_id} "
            f"within {timeout}s; have: {self.for_query(run_id)}"
        )


def attach(spark) -> MetricsListener:
    """Create and register a MetricsListener on this session's stream
    manager. Caller owns detach()."""
    listener = MetricsListener()
    spark.streams.addListener(listener)
    return listener


def detach(spark, listener: MetricsListener) -> None:
    spark.streams.removeListener(listener)
