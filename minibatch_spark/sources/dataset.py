"""Named-dataset source/sink (reference minibatch/contrib/omegaml.py:4-99).

The reference's ``DatasetSource`` resolves a NAME through omega|ml's
dataset registry to the backing MongoDB collection and delegates to a
polling ``MongoSource`` (contrib/omegaml.py:4-54); ``DatasetSink``
resolves a name and appends emit results (contrib/omegaml.py:57-99). The
Spark analog keeps the same two-level indirection:

- ``DatasetRegistry``: a JSON registry mapping name -> (format, path) —
  the catalog role omega|ml's dataset store plays.
- ``DatasetSource.load(spark)``: the idiomatic engine path —
  ``spark.readStream`` over the resolved location (file-source micro-
  batches ≙ the reference's poll loop); unregistered names fall through
  to ``spark.readStream.table(name)`` for catalog-managed tables.
- ``DatasetSource.stream(stream)``: ``Stream.attach`` bridge parity — a
  background poll loop that appends newly arrived dataset rows to a
  stream, mirroring the reference's cursor poller (contrib/mongodb.py:
  60-75) with file-granularity offsets (new parquet part files).
- ``DatasetSink.put(messages)``: append results as parquet part files via
  pyarrow — the same no-JVM producer write path as ``Stream.append``.
"""

from __future__ import annotations

import json
import os
import time
import uuid

import pyarrow as pa
import pyarrow.parquet as pq

from minibatch_spark.sources.base import Source
from minibatch_spark.streaming.models import DEFAULT_BASE_DIR


class DatasetRegistry:
    """Name -> location registry (one JSON file; atomic rewrite)."""

    def __init__(self, base_dir: str | None = None):
        self.base_dir = base_dir or DEFAULT_BASE_DIR
        os.makedirs(self.base_dir, exist_ok=True)

    @property
    def path(self) -> str:
        return os.path.join(self.base_dir, "datasets.json")

    def _read(self) -> dict:
        try:
            with open(self.path) as f:
                return json.load(f)
        except FileNotFoundError:
            return {}

    def _write(self, obj: dict) -> None:
        tmp = self.path + ".tmp"
        with open(tmp, "w") as f:
            json.dump(obj, f)
        os.replace(tmp, self.path)

    def register(self, name: str, path: str, fmt: str = "parquet",
                 schema: str | None = None) -> None:
        reg = self._read()
        reg[name] = {"path": path, "format": fmt, "schema": schema}
        self._write(reg)

    def resolve(self, name: str) -> dict | None:
        return self._read().get(name)

    def drop(self, name: str) -> None:
        reg = self._read()
        reg.pop(name, None)
        self._write(reg)

    def register_views(self, spark) -> None:
        """Expose every registered dataset as a temp view for spark.sql."""
        for name, entry in self._read().items():
            spark.read.format(entry["format"]).load(entry["path"]).createOrReplaceTempView(name)


class DatasetSource(Source):
    """Named-dataset indirection source (reference S7)."""

    def __init__(self, name: str, registry: DatasetRegistry | None = None,
                 delay: float = 0.1):
        super().__init__()
        self.name = name
        self.registry = registry or DatasetRegistry()
        self.delay = delay
        self._seen: set[str] = set()

    # -- engine path: Structured Streaming over the resolved location ----
    def load(self, spark):
        """readStream DataFrame for the dataset — the idiomatic path.
        Registered name -> file stream on its location; otherwise assume a
        catalog table (``spark.readStream.table``)."""
        entry = self.registry.resolve(self.name)
        if entry is None:
            return spark.readStream.table(self.name)
        reader = spark.readStream.format(entry["format"])
        if entry.get("schema"):
            reader = reader.schema(entry["schema"])
        else:
            # file streams need a declared schema; infer once from a batch read
            batch = spark.read.format(entry["format"]).load(entry["path"])
            reader = reader.schema(batch.schema)
        return reader.load(entry["path"])

    # -- Stream.attach bridge: poll-and-append (reference poll loop) -----
    def stream(self, stream) -> None:
        entry = self.registry.resolve(self.name)
        if entry is None:
            raise KeyError(f"dataset {self.name!r} not registered")
        path = entry["path"]
        while not self.cancelled:
            try:
                files = sorted(
                    f for f in os.listdir(path)
                    if f.endswith(".parquet") and f not in self._seen
                )
            except FileNotFoundError:
                files = []
            for f in files:
                table = pq.read_table(os.path.join(path, f))
                for row in table.to_pylist():
                    stream.append(row)
                self._seen.add(f)
            stream.flush()
            if self.cancelled:
                break
            time.sleep(self.delay)


class DatasetSink:
    """Append emit results to a registered dataset (reference K4)."""

    def __init__(self, name: str, registry: DatasetRegistry | None = None):
        self.name = name
        self.registry = registry or DatasetRegistry()
        entry = self.registry.resolve(name)
        if entry is None:
            # auto-register under the registry's base dir (reference
            # DatasetSink creates the dataset on first put)
            path = os.path.join(self.registry.base_dir, "datasets", name)
            self.registry.register(name, path)
            entry = self.registry.resolve(name)
        self.path = entry["path"]
        os.makedirs(self.path, exist_ok=True)

    def put(self, messages) -> None:
        rows = messages if isinstance(messages, list) else [messages]
        if not rows:
            return
        try:
            table = pa.Table.from_pylist(rows)
        except (pa.ArrowInvalid, pa.ArrowTypeError):
            # heterogeneous payloads: fall back to the schemaless envelope
            table = pa.Table.from_pylist(
                [{"data": json.dumps(r, default=str)} for r in rows]
            )
        fname = f"part-{time.time_ns():020d}-{uuid.uuid4().hex[:8]}.parquet"
        tmp = os.path.join(self.path, f".{fname}.tmp")
        pq.write_table(table, tmp)
        os.replace(tmp, os.path.join(self.path, fname))
