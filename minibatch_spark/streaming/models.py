"""Stream / Buffer / Batcher — the reference's data model on parquet files.

Reference mapping (SURVEY.md §1):
- ``Stream``  (minibatch/models.py:157-179): named stream + lifecycle +
  registry. Here: a directory ``{base}/streams/{name}/`` with a JSON
  metadata file; the buffer is an append-only parquet directory that
  Structured Streaming consumes as a file source.
- ``Buffer``  (minibatch/models.py:139-151): one row per message with
  envelope ``{stream, created, seq, data}``. ``processed`` is dropped —
  Spark checkpoint offsets replace the per-record flag (SURVEY §1.1).
- ``Batcher`` (minibatch/models.py:25-81): client-side batched insert.
  Producers write parquet via pyarrow directly — NO JVM on the producer
  path (mirrors the reference where producers only need a Mongo client,
  and matches Spark practice: producers feed storage/Kafka, the cluster
  reads it).

The ``data`` payload is a JSON string column — the faithful mapping of the
reference's schemaless ``DictField(strict=False)`` (models.py:142,146);
typed access goes through ``from_json`` with a per-stream schema.
"""

from __future__ import annotations

import json
import os
import shutil
import threading
import time
import uuid
from datetime import datetime, timezone

import pyarrow as pa
import pyarrow.parquet as pq

DEFAULT_BASE_DIR = os.environ.get(
    "MINIBATCH_SPARK_DIR", os.path.join("/tmp", "minibatch_spark")
)

# Envelope schema shared by producer (pyarrow) and consumer (Spark).
ARROW_SCHEMA = pa.schema(
    [
        pa.field("stream", pa.string()),
        pa.field("created", pa.timestamp("us")),
        pa.field("seq", pa.int64()),
        pa.field("data", pa.string()),
    ]
)

SPARK_DDL = "stream string, created timestamp, seq long, data string"

STATUS_INIT = "initialize"
STATUS_OPEN = "open"
STATUS_CLOSED = "closed"


def utcnow() -> datetime:
    # naive UTC — reference uses datetime.utcnow() everywhere
    # (minibatch/models.py:122,141,165,169)
    return datetime.now(timezone.utc).replace(tzinfo=None)


class Batcher:
    """Client-side append buffer (reference minibatch/models.py:25-81).

    Collects envelope rows and flushes them as ONE parquet file — the
    analog of ``insert_many`` (and of Kafka producer linger batching).
    """

    def __init__(self, batchsize: int = 1):
        self.batchsize = max(1, int(batchsize))
        self.rows: list[dict] = []

    def add(self, row: dict) -> bool:
        self.rows.append(row)
        return len(self.rows) >= self.batchsize

    def clear(self) -> None:
        self.rows = []


class Stream:
    """A named stream of messages (reference minibatch/models.py:157-237).

    Producers call ``append(dict)``; messages land in the buffer directory
    as parquet files that any number of Structured Streaming consumers read
    independently (each with its own checkpoint — strictly better than the
    reference's single-emitter ``processed`` flag, window.py:63-69).
    """

    def __init__(self, name: str, base_dir: str | None = None, batchsize: int = 1,
                 max_age: float | None = None, interval: int = 10):
        self.name = name
        self.base_dir = base_dir or DEFAULT_BASE_DIR
        self.batcher = Batcher(batchsize)
        self.max_age = max_age
        self.interval = interval
        # seq is namespaced by a per-writer random 40-bit id: two producer
        # handles (or a restarted process) can never emit colliding
        # (created, seq) keys, so the emitter's orderBy('created','seq')
        # stays a strict total order across writers and restarts
        self._writer_id = uuid.uuid4().int & ((1 << 40) - 1)
        self._seq = 0
        self._lock = threading.Lock()
        self._source = None
        self._source_thread: threading.Thread | None = None
        self._housekeeping: threading.Thread | None = None
        self._stopped = threading.Event()
        os.makedirs(self.buffer_dir, exist_ok=True)
        os.makedirs(self.windows_dir, exist_ok=True)
        if not os.path.exists(self.meta_path):
            self._write_meta(
                {
                    "name": name,
                    "status": STATUS_OPEN,
                    "created": utcnow().isoformat(),
                    "interval": interval,
                    "last_read": None,
                }
            )
        if max_age:
            self._start_housekeeping()

    # -- paths ------------------------------------------------------------
    @property
    def stream_dir(self) -> str:
        return os.path.join(self.base_dir, "streams", self.name)

    @property
    def buffer_dir(self) -> str:
        return os.path.join(self.stream_dir, "buffer")

    @property
    def windows_dir(self) -> str:
        return os.path.join(self.stream_dir, "windows")

    @property
    def checkpoint_root(self) -> str:
        return os.path.join(self.stream_dir, "checkpoints")

    @property
    def meta_path(self) -> str:
        return os.path.join(self.stream_dir, "stream.json")

    def _write_meta(self, meta: dict) -> None:
        tmp = self.meta_path + ".tmp"
        with open(tmp, "w") as f:
            json.dump(meta, f)
        os.replace(tmp, self.meta_path)

    def meta(self) -> dict:
        with open(self.meta_path) as f:
            return json.load(f)

    # -- registry ---------------------------------------------------------
    @classmethod
    def get_or_create(cls, name: str, base_dir: str | None = None, **kwargs) -> "Stream":
        """Reference Stream.get_or_create (models.py:258-279): directory
        creation is idempotent; the unique-name race of the reference is a
        filesystem mkdir here."""
        return cls(name, base_dir=base_dir, **kwargs)

    # -- producer ---------------------------------------------------------
    def append(self, data: dict, created: datetime | None = None) -> None:
        """Wrap in the envelope and buffer for batched write
        (reference models.py:209-211). ``created`` defaults to utcnow —
        an explicit value supports event-time replay (the reference always
        stamps utcnow; the override is our testable extension)."""
        with self._lock:
            self._seq += 1
            row = {
                "stream": self.name,
                "created": created or utcnow(),
                # 40-bit writer id | 23-bit counter: unique within int64,
                # monotone per writer (counter wraps at 8M appends/handle)
                "seq": (self._writer_id << 23) | (self._seq & 0x7FFFFF),
                "data": json.dumps(data, default=str),
            }
            if self.batcher.add(row):
                self._flush_locked()

    def flush(self) -> None:
        with self._lock:
            self._flush_locked()

    def _flush_locked(self) -> None:
        rows = self.batcher.rows
        if not rows:
            return
        table = pa.Table.from_pylist(rows, schema=ARROW_SCHEMA)
        fname = f"part-{time.time_ns():020d}-{uuid.uuid4().hex[:8]}.parquet"
        tmp = os.path.join(self.stream_dir, f".{fname}.tmp")
        pq.write_table(table, tmp)
        # atomic rename: the Spark file source never sees partial files
        os.replace(tmp, os.path.join(self.buffer_dir, fname))
        self.batcher.clear()

    # -- source attach (reference models.py:219-226, thread :350-356) -----
    def attach(self, source, background: bool = True) -> None:
        self._source = source
        if background:
            t = threading.Thread(
                target=source.stream, args=(self,), daemon=True, name=f"source-{self.name}"
            )
            self._source_thread = t
            t.start()
        else:
            source.stream(self)

    def stop(self) -> None:
        """Reference models.py:228-237: cancel source + close."""
        self._stopped.set()
        if self._source is not None:
            self._source.cancel()
        self.flush()
        meta = self.meta()
        meta["status"] = STATUS_CLOSED
        meta["closed"] = utcnow().isoformat()
        self._write_meta(meta)

    # -- batch views ------------------------------------------------------
    def buffer(self, spark):
        """Batch DataFrame over the current buffer contents."""
        files = self._buffer_files()
        if not files:
            return spark.createDataFrame([], SPARK_DDL)
        return spark.read.schema(SPARK_DDL).parquet(self.buffer_dir)

    def typed_frame(self, spark, schema: str):
        """Batch DataFrame with the payload parsed to a TYPED struct —
        the SURVEY §1.2 'declared StructType per stream' option (the
        reference's ``strict: False`` DictField maps to the JSON-string
        column; this is the schema-on-read path that buys Catalyst
        pruning). ``schema`` is a DDL string, e.g. ``"v double, user
        string"``."""
        from pyspark.sql import functions as F

        return self.buffer(spark).select(
            "stream", "created", "seq", F.from_json("data", schema).alias("data")
        ).select("stream", "created", "seq", "data.*")

    def windows(self, spark):
        """Batch DataFrame over persisted windows (keep=True)."""
        import glob as g

        files = g.glob(os.path.join(self.windows_dir, "*.parquet"))
        if not files:
            return spark.createDataFrame(
                [], "stream string, created timestamp, query string, data string"
            )
        return spark.read.parquet(self.windows_dir)

    def _buffer_files(self) -> list[str]:
        try:
            return [f for f in os.listdir(self.buffer_dir) if f.endswith(".parquet")]
        except FileNotFoundError:
            return []

    def buffer_count(self) -> int:
        """Producer-side row count without a Spark job (parquet footers)."""
        total = 0
        for f in self._buffer_files():
            total += pq.read_metadata(os.path.join(self.buffer_dir, f)).num_rows
        return total

    def clear(self) -> None:
        """Delete all buffered messages (reference models.py:216-217)."""
        with self._lock:
            self.batcher.clear()
            for f in self._buffer_files():
                os.unlink(os.path.join(self.buffer_dir, f))

    # -- TTL housekeeping (reference models.py:309-348) --------------------
    def _start_housekeeping(self) -> None:
        def loop():
            while not self._stopped.wait(self.max_age):
                self.expire()

        t = threading.Thread(target=loop, daemon=True, name=f"ttl-{self.name}")
        self._housekeeping = t
        t.start()

    def expire(self, max_age: float | None = None) -> int:
        """Drop buffer files whose newest row is older than max_age seconds.
        File-level granularity: retention is bounded by 2x max_age, the same
        bound the reference documents (models.py:327-338)."""
        max_age = max_age if max_age is not None else self.max_age
        if not max_age:
            return 0
        cutoff = time.time_ns() - int(max_age * 1e9)
        dropped = 0
        for f in self._buffer_files():
            # file names embed the write ns-timestamp: part-<ns>-<uuid>
            try:
                ts = int(f.split("-")[1])
            except (IndexError, ValueError):
                continue
            if ts < cutoff:
                try:
                    os.unlink(os.path.join(self.buffer_dir, f))
                    dropped += 1
                except FileNotFoundError:
                    pass
        return dropped

    def destroy(self) -> None:
        self._stopped.set()
        shutil.rmtree(self.stream_dir, ignore_errors=True)

    def compact(self, target_rows: int = 1_000_000) -> int:
        """Merge small buffer part-files into ~``target_rows`` files — the
        SMALL-FILES maintenance a file-backed stream needs at scale (one
        part per Batcher flush; a chatty producer makes thousands of tiny
        files, and at 100 TB the file-listing + per-file open cost comes to
        dominate every scan).

        Driver-side pyarrow merge, no Spark job. Crash-safe and reader-safe
        on this engine's consumers: the merged file lands first (atomic
        rename, same name scheme carrying the ORIGINAL oldest write-ns so
        TTL expiry semantics are unchanged), then the source files are
        unlinked. A concurrent BATCH reader sees duplicated rows only in
        the unlinked-halfway window; STREAMING consumers must be attached
        AFTER compaction (file-source checkpoints track file names —
        the same restriction the reference's TTL delete has for its
        processed-flag scans, models.py:309-348). Returns #files removed.
        """
        with self._lock:
            files = sorted(self._buffer_files())
            if len(files) < 2:
                return 0
            groups, cur, cur_rows = [], [], 0
            for f in files:
                path = os.path.join(self.buffer_dir, f)
                n = pq.read_metadata(path).num_rows
                cur.append(f)
                cur_rows += n
                if cur_rows >= target_rows:
                    groups.append(cur)
                    cur, cur_rows = [], 0
            if cur:
                groups.append(cur)
            removed = 0
            for group in groups:
                if len(group) < 2:
                    continue
                tables = [
                    pq.read_table(os.path.join(self.buffer_dir, f), schema=ARROW_SCHEMA)
                    for f in group
                ]
                merged = pa.concat_tables(tables)
                # keep the oldest source ns-stamp: expiry judges file age
                # by name, and the merged data is as old as its oldest row
                oldest_ns = group[0].split("-")[1]
                fname = f"part-{oldest_ns}-{uuid.uuid4().hex[:8]}.parquet"
                tmp = os.path.join(self.stream_dir, f".{fname}.tmp")
                pq.write_table(merged, tmp)
                os.replace(tmp, os.path.join(self.buffer_dir, fname))
                for f in group:
                    os.unlink(os.path.join(self.buffer_dir, f))
                    removed += 1
            return removed
