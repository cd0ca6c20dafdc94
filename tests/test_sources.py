"""Connector source/sink unit tests with injected client doubles —
the reference's own strategy (tests/test_kafka.py:19-63 MagicMock
consumer/producer, tests/test_mqtt.py:21-43 client double,
tests/test_celery.py:20-100 app double, tests/test_mongodb.py mongomock).

No Spark needed here: the bridge objects pump client messages into a
Stream's parquet buffer (producer path is pyarrow-only by design).
"""

import json
import os
import threading
import time
from unittest.mock import MagicMock

import pyarrow.parquet as pq

from minibatch_spark.sources.base import IterableSource
from minibatch_spark.sources.celery import CeleryEventSource
from minibatch_spark.sources.kafka import KafkaSink, KafkaSource
from minibatch_spark.sources.mongodb import (
    MongoReplicasetSource,
    MongoSink,
    MongoSource,
)
from minibatch_spark.sources.mqtt import MQTTSink, MQTTSource
from minibatch_spark.streaming.models import Stream


def _mk(tmp_path, name="src") -> Stream:
    return Stream(name, base_dir=str(tmp_path))


def _payloads(stream: Stream) -> list[dict]:
    rows = []
    for f in sorted(os.listdir(stream.buffer_dir)):
        rows.extend(pq.read_table(os.path.join(stream.buffer_dir, f)).to_pylist())
    return [json.loads(r["data"]) for r in sorted(rows, key=lambda r: r["seq"])]


# -- Kafka -----------------------------------------------------------------


def test_kafka_source_appends_messages(tmp_path):
    """Reference tests/test_kafka.py:19-40: an injected consumer's
    messages land in the stream, envelope-wrapped."""
    s = _mk(tmp_path)
    msgs = [MagicMock(value={"i": i}) for i in range(3)]
    src = KafkaSource("topic", consumer=iter(msgs))
    src.stream(s)
    assert _payloads(s) == [{"i": 0}, {"i": 1}, {"i": 2}]


def test_kafka_source_wraps_non_dict_values(tmp_path):
    s = _mk(tmp_path)
    src = KafkaSource("topic", consumer=iter([MagicMock(value=42)]))
    src.stream(s)
    assert _payloads(s) == [{"value": 42}]


def test_kafka_sink_sends_and_expands(tmp_path):
    """Reference tests/test_kafka.py:42-63: list results expand to
    individual sends; topic override respected."""
    producer = MagicMock()
    sink = KafkaSink("t1", producer=producer)
    sink.put([{"a": 1}, {"a": 2}])
    sink.put({"a": 3}, topic="t2")
    calls = [c.args for c in producer.send.call_args_list]
    assert calls == [("t1", {"a": 1}), ("t1", {"a": 2}), ("t2", {"a": 3})]


def test_kafka_source_cancel_closes_consumer(tmp_path):
    consumer = MagicMock()
    src = KafkaSource("topic", consumer=consumer)
    src.cancel()
    assert src.cancelled
    consumer.close.assert_called_once()


# -- MQTT ------------------------------------------------------------------


def test_mqtt_source_on_message_envelope(tmp_path):
    """Reference tests/test_mqtt.py:21-43: the paho callback wraps
    (topic, payload, qos, retain) into the envelope."""
    s = _mk(tmp_path)
    src = MQTTSource("mqtt://broker:1883", "sensors", client=MagicMock())
    src._stream = s
    msg = MagicMock(topic="sensors", payload=b'{"temp": 21}', qos=1, retain=False)
    src.on_message(None, None, msg)
    assert _payloads(s) == [
        {"topic": "sensors", "payload": {"temp": 21}, "qos": 1, "retain": False}
    ]


def test_mqtt_source_non_json_payload(tmp_path):
    s = _mk(tmp_path)
    src = MQTTSource("mqtt://broker:1883", "sensors", client=MagicMock())
    src._stream = s
    src.on_message(None, None, MagicMock(topic="sensors", payload=b"\xff", qos=0, retain=False))
    (p,) = _payloads(s)
    assert "raw" in p["payload"]  # undecodable bytes kept via repr fallback


def test_mqtt_sink_connects_starts_loop_publishes():
    """ADVICE fix pin: the sink must start the paho network loop or QoS>0
    publishes never transmit."""
    client = MagicMock()
    sink = MQTTSink("mqtt://broker:1883", "out", client=client)
    sink.put({"x": 1})
    sink.put({"x": 2})
    client.connect.assert_called_once_with("broker", 1883)
    client.loop_start.assert_called_once()
    assert client.publish.call_count == 2
    topic, body = client.publish.call_args.args
    assert topic == "out" and json.loads(body) == {"x": 2}
    sink.close()
    client.loop_stop.assert_called_once()
    client.disconnect.assert_called_once()


# -- MongoDB ---------------------------------------------------------------


class FakeCursor:
    def __init__(self, docs):
        self._docs = docs

    def sort(self, key, direction):
        self._docs = sorted(self._docs, key=lambda d: d[key])
        return self

    def limit(self, n):
        self._docs = self._docs[:n]
        return self

    def __iter__(self):
        return iter(self._docs)


class FakeCollection:
    def __init__(self, docs):
        self.docs = docs

    def find(self, query):
        if query:
            (col, cond), = query.items()
            lo = cond["$gt"]
            return FakeCursor([d for d in self.docs if d[col] > lo])
        return FakeCursor(list(self.docs))


def test_mongo_source_cursor_pagination(tmp_path):
    """Reference contrib/mongodb.py:60-75 cursor semantics: ascending id
    order, strict > cursor, chunked by size; _id dropped from payloads."""
    s = _mk(tmp_path)
    coll = FakeCollection([{"_id": i, "i": i} for i in (3, 1, 2, 5, 4)])
    src = MongoSource(coll, size=2, idcol="_id", delay=0.01)
    for _ in range(3):
        for doc in src._fetch():
            d = dict(doc)
            d.pop("_id", None)
            s.append(d)
    s.flush()
    assert [p["i"] for p in _payloads(s)] == [1, 2, 3, 4, 5]
    assert src.latest_id == 5
    assert src._fetch() == []  # cursor exhausted


def test_mongo_replicaset_source_inserts_only(tmp_path):
    s = _mk(tmp_path)
    changes = [
        {"operationType": "insert", "fullDocument": {"_id": 1, "a": 1}},
        {"operationType": "update", "fullDocument": {"_id": 1, "a": 2}},
        {"operationType": "insert", "fullDocument": {"_id": 2, "a": 3}},
    ]
    stream_cm = MagicMock()
    stream_cm.__enter__.return_value = iter(changes)
    coll = MagicMock()
    coll.watch.return_value = stream_cm
    MongoReplicasetSource(coll).stream(s)
    assert _payloads(s) == [{"a": 1}, {"a": 3}]  # update skipped, _id dropped


def test_mongo_sink_insert_many():
    coll = MagicMock()
    MongoSink(coll).put([{"a": 1}, {"a": 2}])
    coll.insert_many.assert_called_once_with([{"a": 1}, {"a": 2}])
    MongoSink(coll).put({"b": 1})
    assert coll.insert_many.call_args.args[0] == [{"b": 1}]


# -- Celery ----------------------------------------------------------------


def test_celery_event_source_task_info(tmp_path):
    """Reference tests/test_celery.py:20-100: succeeded/failed events
    project to the flat task_info record; other event types are ignored."""
    s = _mk(tmp_path)
    src = CeleryEventSource(MagicMock(), events=("task-succeeded",))
    src._stream = s
    task = MagicMock(name="t")
    task.name = "jobs.add"
    task.uuid = "u1"
    task.state = "SUCCESS"
    task.runtime = 0.5
    task.info = lambda: {"result": "3"}
    src._state = MagicMock()
    src._state.tasks = {"u1": task}
    src.on_event({"type": "task-succeeded", "uuid": "u1"})
    src.on_event({"type": "task-started", "uuid": "u1"})  # filtered out
    (rec,) = _payloads(s)
    assert rec == {
        "task_event": "task-succeeded",
        "task_name": "jobs.add",
        "task_id": "u1",
        "task_info": {"result": "3"},
        "task_state": "SUCCESS",
        "task_runtime": 0.5,
    }


# -- attach / IterableSource ----------------------------------------------


def test_stream_attach_background_pump(tmp_path):
    """Reference Stream.attach (models.py:219-226): the source pumps on a
    background thread until drained/cancelled."""
    s = _mk(tmp_path)
    src = IterableSource([{"i": i} for i in range(5)])
    s.attach(src, background=True)
    deadline = time.monotonic() + 5
    while s.buffer_count() < 5 and time.monotonic() < deadline:
        time.sleep(0.02)
    assert s.buffer_count() == 5
    s.stop()
    assert src.cancelled


def test_iterable_source_cancel_mid_stream(tmp_path):
    s = _mk(tmp_path)

    def gen():
        for i in range(1000):
            yield {"i": i}
            time.sleep(0.005)

    src = IterableSource(gen())
    t = threading.Thread(target=src.stream, args=(s,), daemon=True)
    t.start()
    time.sleep(0.1)
    src.cancel()
    t.join(timeout=2)
    assert not t.is_alive()
    assert 0 < s.buffer_count() < 1000


# ---------------------------------------------------------------------------
# Python DataSource API (PySpark 4) — SURVEY §7.3's idiomatic custom source
# ---------------------------------------------------------------------------


def test_jsonl_datasource_batch_read(spark, tmp_path):
    from minibatch_spark.sources.pydatasource import JsonlDataSource, append_jsonl

    path = str(tmp_path / "feed.jsonl")
    append_jsonl(path, [{"k": i} for i in range(10)])
    spark.dataSource.register(JsonlDataSource)
    df = spark.read.format("mb_jsonl").option("path", path).load()
    rows = df.orderBy("seq").collect()
    assert [r.seq for r in rows] == list(range(10))
    assert rows[3].payload == '{"k":3}'


def test_jsonl_datasource_stream_resumes_from_offset(spark, tmp_path):
    """Offset contract: a restart from the same checkpoint consumes ONLY
    lines appended since the last committed offset — the engine-native
    version of the reference's Mongo id-cursor loop."""
    import json as _json

    from pyspark.sql import functions as F

    from minibatch_spark.sources.pydatasource import JsonlDataSource, append_jsonl

    path = str(tmp_path / "feed.jsonl")
    ckpt = str(tmp_path / "ckpt")
    sink = str(tmp_path / "sink")
    spark.dataSource.register(JsonlDataSource)
    append_jsonl(path, [{"k": i} for i in range(5)])

    def drain():
        q = (
            spark.readStream.format("mb_jsonl")
            .option("path", path)
            .load()
            .writeStream.format("parquet")
            .option("path", sink)
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()

    drain()
    got = spark.read.parquet(sink)
    assert got.count() == 5

    append_jsonl(path, [{"k": i} for i in range(5, 8)])
    drain()
    got = spark.read.parquet(sink).orderBy("seq")
    seqs = [r.seq for r in got.collect()]
    assert seqs == list(range(8))  # no replays, no gaps
    ks = [
        _json.loads(r.payload)["k"]
        for r in got.collect()
    ]
    assert ks == list(range(8))
    # downstream stays declarative: from_json over the payload
    parsed = got.select(
        F.from_json("payload", "k int").alias("d")
    ).select("d.k")
    assert parsed.agg(F.sum("k")).first()[0] == sum(range(8))
