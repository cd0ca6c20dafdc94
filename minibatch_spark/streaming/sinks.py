"""Sinks (reference SURVEY.md §2.2, K1-K6).

``forward`` parity: after a successful emit the emitter calls
``sink.put(result_or_window_data)`` (reference minibatch/__init__.py:95,
window.py:155-157). Connector-backed sinks (Kafka/MQTT/Mongo) live with
their sources in minibatch_spark/sources/; here are the engine-native ones.
"""

from __future__ import annotations

import json
import os
import uuid

import pyarrow as pa
import pyarrow.parquet as pq


class MemorySink:
    """Collect emitted results in memory (test/debug sink — the analog of
    the reference tests' result lists)."""

    def __init__(self):
        self.messages: list = []

    def put(self, message) -> None:
        self.messages.append(message)


class CallableSink:
    """Adapt any callable to the sink protocol."""

    def __init__(self, fn):
        self.fn = fn

    def put(self, message) -> None:
        self.fn(message)


class ParquetSink:
    """Append emitted results to a parquet directory — the engine-native
    'dataset sink' (reference DatasetSink, contrib/omegaml.py:57-99 ≙
    writeStream.toTable). Each put is one atomic file; readable as a table
    via spark.read.parquet(path)."""

    def __init__(self, path: str):
        self.path = path
        os.makedirs(path, exist_ok=True)
        self._schema = pa.schema([pa.field("data", pa.string())])

    def put(self, message) -> None:
        messages = message if isinstance(message, list) else [message]
        table = pa.Table.from_pylist(
            [{"data": json.dumps(m, default=str)} for m in messages],
            schema=self._schema,
        )
        tmp = os.path.join(self.path, f".{uuid.uuid4().hex}.tmp")
        pq.write_table(table, tmp)
        os.replace(tmp, os.path.join(self.path, f"sink-{uuid.uuid4().hex}.parquet"))


class StreamSink:
    """Chain streams: forward emitted messages into another Stream's buffer
    (reference pattern: sink of one pipeline is the source of the next)."""

    def __init__(self, stream):
        self.stream = stream

    def put(self, message) -> None:
        messages = message if isinstance(message, list) else [message]
        for m in messages:
            self.stream.append(m if isinstance(m, dict) else {"value": m})
        self.stream.flush()


class IdempotentParquetSink(ParquetSink):
    """Exactly-once variant of ParquetSink: emitters hand each window a
    deterministic key (WindowEmitter.window_key — md5 of the stream name
    and the window's (created, seq) bounds) and delivery becomes an
    atomic write to a key-named file. A replayed micro-batch re-derives
    the same keys, so redelivery OVERWRITES the same files instead of
    appending duplicates — Spark's at-least-once foreachBatch replay
    composes with this into effectively-once sink output, the same
    mechanism as Spark's native file-sink transaction log (batch-id-
    deterministic file names).

    Caveat: EMPTY windows are content-free and share one key — a keyed
    sink records at most one empty-window marker, not one per gap bucket.
    Use plain ParquetSink where empty-window cardinality matters."""

    def put_keyed(self, key: str, message) -> None:
        messages = message if isinstance(message, list) else [message]
        table = pa.Table.from_pylist(
            [{"data": json.dumps(m, default=str)} for m in messages],
            schema=self._schema,
        )
        tmp = os.path.join(self.path, f".{key}.tmp")
        pq.write_table(table, tmp)
        os.replace(tmp, os.path.join(self.path, f"sink-{key}.parquet"))
