"""MQTT source/sink (reference minibatch/contrib/mqtt.py:10-84).

No native Spark MQTT source exists; the bridge model (callback thread ->
stream.append) is the reference's own architecture. Envelope parity:
``{topic, payload, qos, retain}`` (reference mqtt.py:62-68). The paho
import is gated; clients are injectable for tests.
"""

from __future__ import annotations

import json

from minibatch_spark.sources.base import Source


def _parse_url(url: str) -> tuple[str, int]:
    # mqtt://host:port
    rest = url.split("://", 1)[-1]
    host, _, port = rest.partition(":")
    return host, int(port or 1883)


class MQTTSource(Source):
    def __init__(self, url: str, topic: str, client=None):
        super().__init__()
        self.url = url
        self.topic = topic
        self._client = client  # injectable
        self._stream = None

    @property
    def client(self):
        if self._client is None:
            try:
                import paho.mqtt.client as mqtt  # gated: not in container
            except ImportError as e:  # pragma: no cover
                raise ImportError("paho-mqtt not installed; inject client=") from e
            self._client = mqtt.Client()
        return self._client

    def on_message(self, client, userdata, msg) -> None:
        """paho callback -> envelope append (reference mqtt.py:58-74)."""
        if self._stream is None or self.cancelled:
            return
        try:
            payload = json.loads(msg.payload)
        except (ValueError, TypeError):
            payload = {"raw": repr(msg.payload)}
        self._stream.append(
            {
                "topic": getattr(msg, "topic", self.topic),
                "payload": payload,
                "qos": getattr(msg, "qos", 0),
                "retain": getattr(msg, "retain", False),
            }
        )
        self._stream.flush()

    def stream(self, stream) -> None:
        self._stream = stream
        c = self.client
        c.on_message = self.on_message
        host, port = _parse_url(self.url)
        c.connect(host, port)
        c.subscribe(self.topic)
        c.loop_forever()

    def cancel(self) -> None:
        super().cancel()
        if self._client is not None:
            try:
                self._client.disconnect()
            except Exception:
                pass


class MQTTSink:
    """Publish JSON emit results (reference mqtt.py:80-84)."""

    def __init__(self, url: str, topic: str, client=None):
        self.url = url
        self.topic = topic
        self._client = client
        self._connected = False

    @property
    def client(self):
        if self._client is None:
            try:
                import paho.mqtt.client as mqtt  # gated
            except ImportError as e:  # pragma: no cover
                raise ImportError("paho-mqtt not installed; inject client=") from e
            self._client = mqtt.Client()
        return self._client

    def put(self, message) -> None:
        c = self.client
        if not self._connected:
            host, port = _parse_url(self.url)
            c.connect(host, port)
            # without a running network loop, paho queues publishes and
            # (for QoS>0) never completes the handshake — messages would
            # sit untransmitted forever
            if hasattr(c, "loop_start"):
                c.loop_start()
            self._connected = True
        c.publish(self.topic, json.dumps(message, default=str))

    def close(self) -> None:
        if self._client is not None and self._connected:
            if hasattr(self._client, "loop_stop"):
                self._client.loop_stop()
            try:
                self._client.disconnect()
            except Exception:
                pass
            self._connected = False
