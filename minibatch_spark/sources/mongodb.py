"""MongoDB source/sink (reference minibatch/contrib/mongodb.py:7-120).

- ``MongoSource``: polling CDC — ``find({idcol: {$gt: last}})`` sorted
  ascending, chunked (reference :60-84). The collection is injectable
  (a pymongo Collection or any object with the same find/sort/limit
  surface); pymongo itself is gated.
- ``MongoReplicasetSource``: change-stream (``collection.watch``) variant,
  insert ops only (reference :104-120).
- ``MongoSink``: insert_many of emit results (reference :90-101).

At scale the native path is the mongo-spark-connector
(``spark.readStream.format('mongodb')``); this bridge preserves the
reference's cursor semantics for environments without the connector jar.
"""

from __future__ import annotations

import time

from minibatch_spark.sources.base import Source


class MongoSource(Source):
    def __init__(self, collection, size: int = 1, idcol: str = "_id",
                 delay: float = 0.1):
        super().__init__()
        self.collection = collection
        self.size = size
        self.idcol = idcol
        self.delay = delay
        self.latest_id = None

    def _fetch(self):
        """One poll: documents with id > latest, ascending, limited
        (reference mongodb.py:60-75)."""
        query = {}
        if self.latest_id is not None:
            query[self.idcol] = {"$gt": self.latest_id}
        docs = list(
            self.collection.find(query).sort(self.idcol, 1).limit(self.size)
        )
        if docs:
            self.latest_id = docs[-1][self.idcol]
        return docs

    def stream(self, stream) -> None:
        while not self.cancelled:
            docs = self._fetch()
            for doc in docs:
                doc = dict(doc)
                doc.pop("_id", None)  # ObjectId isn't JSON; cursor kept in latest_id
                stream.append(doc)
            if docs:
                stream.flush()
            else:
                time.sleep(self.delay)


class MongoReplicasetSource(Source):
    """Native change-stream source (reference mongodb.py:104-120)."""

    def __init__(self, collection, chunk: int = 1):
        super().__init__()
        self.collection = collection
        self.chunk = chunk

    def stream(self, stream) -> None:
        with self.collection.watch() as change_stream:
            for change in change_stream:
                if self.cancelled:
                    break
                if change.get("operationType") != "insert":
                    continue
                doc = dict(change.get("fullDocument") or {})
                doc.pop("_id", None)
                stream.append(doc)
                stream.flush()


class MongoSink:
    """insert_many emit results (reference mongodb.py:90-101)."""

    def __init__(self, collection):
        self.collection = collection

    def put(self, message) -> None:
        messages = message if isinstance(message, list) else [message]
        if messages:
            self.collection.insert_many([dict(m) for m in messages])
