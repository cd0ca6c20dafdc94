"""Live-broker round-trip smoke tests — env-flagged, skipped in sandboxes.

The reference's own suite runs against a real MongoDB
(/root/reference/minibatch/tests/test_minibatch.py:27-30) while mocking
Kafka/MQTT (tests/test_kafka.py:19-63); this container has no brokers at
all, so the standing suites use injected client doubles
(tests/test_sources.py). These tests make closing that ops gap a CONFIG
change, not a code change: point the env var at a broker and the
sink -> broker -> source -> Stream.append round-trip runs for real.

    MINIBATCH_SPARK_KAFKA=host:9092   (needs kafka-python)
    MINIBATCH_SPARK_MQTT=mqtt://host:1883   (needs paho-mqtt)
    MINIBATCH_SPARK_MONGO=mongodb://host:27017   (needs pymongo)
"""

import json
import os
import threading
import time
import uuid

import pytest

KAFKA = os.environ.get("MINIBATCH_SPARK_KAFKA")
MQTT = os.environ.get("MINIBATCH_SPARK_MQTT")
MONGO = os.environ.get("MINIBATCH_SPARK_MONGO")


def _pump_until(source, stream, predicate, timeout=30.0):
    """Run source.stream(stream) in a thread until predicate() or timeout;
    always cancel. Returns predicate()'s final value."""
    t = threading.Thread(target=source.stream, args=(stream,), daemon=True)
    t.start()
    deadline = time.monotonic() + timeout
    try:
        while time.monotonic() < deadline:
            if predicate():
                return True
            time.sleep(0.25)
        return predicate()
    finally:
        source.cancel()
        t.join(timeout=5)


def _buffer_values(spark, stream):
    df = stream.frame(spark) if hasattr(stream, "frame") else None
    if df is None:
        from minibatch_spark.streaming.models import SPARK_DDL

        try:
            df = spark.read.schema(SPARK_DDL).parquet(stream.buffer_dir)
        except Exception:
            return []
    return [json.loads(r.data) for r in df.select("data").collect()]


@pytest.mark.skipif(not KAFKA, reason="MINIBATCH_SPARK_KAFKA not set")
def test_kafka_roundtrip_live(spark, tmp_path):
    pytest.importorskip("kafka")
    from minibatch_spark.sources.kafka import KafkaSink, KafkaSource
    from minibatch_spark.streaming.models import Stream

    topic = f"mbs-smoke-{uuid.uuid4().hex[:8]}"
    sink = KafkaSink(topic, urls=[KAFKA])
    for i in range(5):
        sink.put({"i": i})
    if hasattr(sink.producer, "flush"):
        sink.producer.flush()

    s = Stream("kafka-live", base_dir=str(tmp_path))
    src = KafkaSource(
        topic, urls=[KAFKA], auto_offset_reset="earliest",
        consumer_timeout_ms=1000,
    )
    ok = _pump_until(
        src, s, lambda: len(_buffer_values(spark, s)) >= 5
    )
    got = {v["i"] for v in _buffer_values(spark, s) if "i" in v}
    assert ok and got >= set(range(5))


@pytest.mark.skipif(not MQTT, reason="MINIBATCH_SPARK_MQTT not set")
def test_mqtt_roundtrip_live(spark, tmp_path):
    pytest.importorskip("paho.mqtt")
    from minibatch_spark.sources.mqtt import MQTTSink, MQTTSource
    from minibatch_spark.streaming.models import Stream

    topic = f"mbs/smoke/{uuid.uuid4().hex[:8]}"
    s = Stream("mqtt-live", base_dir=str(tmp_path))
    src = MQTTSource(MQTT, topic)
    t = threading.Thread(target=src.stream, args=(s,), daemon=True)
    t.start()
    time.sleep(2)  # subscription established (QoS0: no retained replay)
    sink = MQTTSink(MQTT, topic)
    try:
        for i in range(5):
            sink.put({"i": i})
        deadline = time.monotonic() + 30
        while time.monotonic() < deadline:
            if len(_buffer_values(spark, s)) >= 5:
                break
            time.sleep(0.25)
        got = {v["i"] for v in _buffer_values(spark, s) if "i" in v}
        assert got >= set(range(5))
    finally:
        src.cancel()
        sink.close()
        t.join(timeout=5)


@pytest.mark.skipif(not MONGO, reason="MINIBATCH_SPARK_MONGO not set")
def test_mongo_roundtrip_live(spark, tmp_path):
    pymongo = pytest.importorskip("pymongo")
    from minibatch_spark.sources.mongodb import MongoSink, MongoSource
    from minibatch_spark.streaming.models import Stream

    client = pymongo.MongoClient(MONGO, serverSelectionTimeoutMS=5000)
    coll = client["mbs_smoke"][f"rt_{uuid.uuid4().hex[:8]}"]
    try:
        sink = MongoSink(coll)
        for i in range(5):
            sink.put({"i": i})
        s = Stream("mongo-live", base_dir=str(tmp_path))
        src = MongoSource(coll, size=2)
        ok = _pump_until(
            src, s, lambda: len(_buffer_values(spark, s)) >= 5
        )
        got = {v["i"] for v in _buffer_values(spark, s) if "i" in v}
        assert ok and got >= set(range(5))
    finally:
        coll.drop()
        client.close()
