from minibatch_spark.sources.base import IterableSource, Source  # noqa: F401
from minibatch_spark.sources.celery import CeleryEventSource  # noqa: F401
from minibatch_spark.sources.kafka import KafkaSink, KafkaSource  # noqa: F401
from minibatch_spark.sources.mongodb import (  # noqa: F401
    MongoReplicasetSource,
    MongoSink,
    MongoSource,
)
from minibatch_spark.sources.mqtt import MQTTSink, MQTTSource  # noqa: F401
