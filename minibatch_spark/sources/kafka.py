"""Kafka source/sink (reference minibatch/contrib/kafka.py:6-101).

Two paths:
- ``readstream``/``writestream_kafka``: the NATIVE Structured Streaming
  integration — this is the 100 TB path (per-partition parallel reads,
  offsets in the checkpoint, no double-buffering).
- ``KafkaSource``/``KafkaSink``: reference-parity bridge objects that pump
  a consumer into ``stream.append`` / publish emit results. Clients are
  injectable (the reference tests inject MagicMocks the same way,
  tests/test_kafka.py:19-63); the kafka-python import is gated because the
  container has no broker or client lib.
"""

from __future__ import annotations

import json

from minibatch_spark.sources.base import Source


def readstream(spark, topic: str, bootstrap_servers: str, schema=None,
               starting_offsets: str = "earliest"):
    """Idiomatic Kafka streaming read: value bytes -> string -> (optionally)
    typed struct via from_json — the direct analog of the reference's
    json.loads value deserializer (contrib/kafka.py:26,38)."""
    from pyspark.sql import functions as F

    df = (
        spark.readStream.format("kafka")
        .option("kafka.bootstrap.servers", bootstrap_servers)
        .option("subscribe", topic)
        .option("startingOffsets", starting_offsets)
        .load()
    )
    value = F.col("value").cast("string")
    if schema is not None:
        return df.select(
            F.col("timestamp").alias("created"),
            F.from_json(value, schema).alias("data"),
        )
    return df.select(F.col("timestamp").alias("created"), value.alias("data"))


def writestream_kafka(df, topic: str, bootstrap_servers: str, checkpoint: str):
    """Idiomatic Kafka streaming write: struct(*) -> to_json -> value."""
    from pyspark.sql import functions as F

    return (
        df.selectExpr("to_json(struct(*)) AS value")
        .writeStream.format("kafka")
        .option("kafka.bootstrap.servers", bootstrap_servers)
        .option("topic", topic)
        .option("checkpointLocation", checkpoint)
        .start()
    )


class KafkaSource(Source):
    """Bridge consumer -> stream.append (reference contrib/kafka.py:6-58)."""

    def __init__(self, topic: str, urls=None, consumer=None, **configs):
        super().__init__()
        self.topic = topic
        self.urls = urls or ["localhost:9092"]
        self.configs = configs
        self._consumer = consumer  # injectable for tests / parity

    @property
    def consumer(self):
        if self._consumer is None:
            try:
                from kafka import KafkaConsumer  # gated: not in container
            except ImportError as e:  # pragma: no cover
                raise ImportError(
                    "kafka-python not installed; inject consumer= or use "
                    "minibatch_spark.sources.kafka.readstream (native path)"
                ) from e
            self._consumer = KafkaConsumer(
                self.topic,
                bootstrap_servers=self.urls,
                value_deserializer=lambda m: json.loads(m.decode("utf-8")),
                **self.configs,
            )
        return self._consumer

    def stream(self, stream) -> None:
        for message in self.consumer:
            if self.cancelled:
                break
            value = getattr(message, "value", message)
            stream.append(value if isinstance(value, dict) else {"value": value})
            stream.flush()

    def cancel(self) -> None:
        super().cancel()
        if self._consumer is not None and hasattr(self._consumer, "close"):
            self._consumer.close()


class KafkaSink:
    """JSON-publish emit results (reference contrib/kafka.py:61-101);
    expand=True sends list elements individually, as the reference does."""

    def __init__(self, topic: str, urls=None, producer=None, expand: bool = True,
                 **configs):
        self.topic = topic
        self.urls = urls or ["localhost:9092"]
        self.configs = configs
        self.expand = expand
        self._producer = producer

    @property
    def producer(self):
        if self._producer is None:
            try:
                from kafka import KafkaProducer  # gated
            except ImportError as e:  # pragma: no cover
                raise ImportError(
                    "kafka-python not installed; inject producer="
                ) from e
            self._producer = KafkaProducer(
                bootstrap_servers=self.urls,
                value_serializer=lambda m: json.dumps(m, default=str).encode("utf-8"),
                **self.configs,
            )
        return self._producer

    def put(self, message, topic: str | None = None) -> None:
        topic = topic or self.topic
        messages = message if self.expand and isinstance(message, list) else [message]
        for m in messages:
            self.producer.send(topic, m)
