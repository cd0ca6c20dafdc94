# Mirrors the reference's Makefile flow (docker compose up -d; pytest —
# /root/reference/Makefile:31-33), restricted to the opt-in live-broker
# round-trips: the default suite injects client doubles and never needs
# a broker (same stance as the reference's own mocked Kafka tests).

.PHONY: test test-live brokers-up brokers-down

test:
	python -m pytest tests/ -q

brokers-up:
	docker compose up -d

brokers-down:
	docker compose down -v

# Live source->stream->sink round-trips against real brokers: the 4
# env-gated skips in tests/test_live_brokers.py become real tests.
# Requires docker + the client libs (kafka-python, paho-mqtt, pymongo).
test-live: brokers-up
	MINIBATCH_SPARK_KAFKA=localhost:9092 \
	MINIBATCH_SPARK_MQTT=mqtt://localhost:1883 \
	MINIBATCH_SPARK_MONGO=mongodb://localhost:27017 \
	python -m pytest tests/test_live_brokers.py -v
