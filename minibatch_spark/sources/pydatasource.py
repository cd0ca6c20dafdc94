"""PySpark 4 Python DataSource: a JSONL-backed batch + streaming source
with real offset tracking.

SURVEY §7.3 names ``pyspark.sql.datasource.DataSourceStreamReader`` as the
idiomatic home for the reference's custom sources (MQTT S4, Mongo-poll S5,
Celery S8 — reference contrib/mqtt.py:55-77, contrib/mongodb.py:60-75,
contrib/celery.py:54-60). Those bridges pump external messages into an
append-only file; THIS class is the Spark-native consumer of such a feed:
the engine asks it for offsets, plans partitions per micro-batch, and
replays deterministically from the checkpoint — the same contract the
reference hand-rolls with its ``{idcol: {$gt: last_id}}`` cursor loop
(contrib/mongodb.py:63-71), expressed in the engine's own offset protocol.

Offsets are line numbers: monotonic, replayable, and cheap to compare.
``latestOffset`` scans the file's newline count per trigger — O(file) per
poll, correct for a bridge feed; a 100 TB deployment points the SAME
pipeline at Kafka instead (the source abstraction is the point, not the
file). Rows surface as (seq, payload-JSON-string); downstream parses with
``from_json`` so schema stays declarative and Catalyst-visible.
"""

from __future__ import annotations

import json
import os
from collections.abc import Iterator

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    DataSourceStreamReader,
    InputPartition,
)

DEFAULT_SCHEMA = "seq bigint, payload string"


def _count_lines(path: str) -> int:
    if not os.path.exists(path):
        return 0
    with open(path, "rb") as f:
        return sum(1 for _ in f)


def _read_lines(path: str, start: int, end: int) -> Iterator[tuple[int, str]]:
    """Yield (line_number, line) for lines in [start, end)."""
    if not os.path.exists(path):
        return
    with open(path, "r", encoding="utf-8") as f:
        for i, line in enumerate(f):
            if i >= end:
                return
            if i >= start:
                yield i, line.rstrip("\n")


class _LineRange(InputPartition):
    def __init__(self, path: str, start: int, end: int):
        self.path = path
        self.start = start
        self.end = end


def _split(path: str, start: int, end: int, n: int) -> list[_LineRange]:
    """Split [start, end) into up to n contiguous ranges — each range is
    one Spark task, so a large backlog drains in parallel."""
    total = end - start
    if total <= 0:
        return []
    n = max(1, min(n, total))
    step = (total + n - 1) // n
    return [
        _LineRange(path, s, min(s + step, end))
        for s in range(start, end, step)
    ]


class JsonlDataSource(DataSource):
    """``spark.read.format("mb_jsonl")`` / ``spark.readStream.format(...)``
    over an append-only JSONL file.

    Options: ``path`` (required), ``numPartitions`` (default 4).
    Register once per session:
    ``spark.dataSource.register(JsonlDataSource)``.
    """

    @classmethod
    def name(cls) -> str:
        return "mb_jsonl"

    def schema(self) -> str:
        return DEFAULT_SCHEMA

    def reader(self, schema) -> "JsonlBatchReader":
        return JsonlBatchReader(self.options)

    def streamReader(self, schema) -> "JsonlStreamReader":
        return JsonlStreamReader(self.options)


class JsonlBatchReader(DataSourceReader):
    def __init__(self, options):
        self.path = options["path"]
        self.n = int(options.get("numPartitions", 4))

    def partitions(self):
        return _split(self.path, 0, _count_lines(self.path), self.n)

    def read(self, partition: _LineRange):
        for i, line in _read_lines(partition.path, partition.start, partition.end):
            yield (i, line)


class JsonlStreamReader(DataSourceStreamReader):
    """Micro-batch stream over the growing file.

    The engine persists the offsets this reader returns in the
    checkpoint's offset log — restart resumes exactly after the last
    committed line, the property the reference implements by hand with
    its Mongo id cursor (contrib/mongodb.py:63-71)."""

    def __init__(self, options):
        self.path = options["path"]
        self.n = int(options.get("numPartitions", 4))

    def initialOffset(self) -> dict:
        return {"line": 0}

    def latestOffset(self) -> dict:
        return {"line": _count_lines(self.path)}

    def partitions(self, start: dict, end: dict):
        return _split(self.path, start["line"], end["line"], self.n)

    def read(self, partition: _LineRange):
        for i, line in _read_lines(partition.path, partition.start, partition.end):
            yield (i, line)

    def commit(self, end: dict) -> None:
        # the feed file is the bridge's property (TTL/compaction live
        # there, streaming/models.py); nothing to reclaim here
        pass


def append_jsonl(path: str, records: list[dict]) -> None:
    """Producer-side helper (the bridge's write half): append records as
    one JSON line each. os-level append keeps concurrent readers safe —
    a reader sees whole lines or nothing."""
    with open(path, "a", encoding="utf-8") as f:
        for r in records:
            f.write(json.dumps(r, separators=(",", ":")) + "\n")
