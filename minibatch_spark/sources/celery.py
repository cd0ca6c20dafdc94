"""Celery task-event source (reference minibatch/contrib/celery.py:1-98).

Captures ``task-succeeded`` / ``task-failed`` events from a Celery app's
event receiver and appends a ``task_info`` record per event (record shape:
reference celery.py:72-80). The celery import is implicit — the app object
itself is injected, and tests drive ``on_event`` directly (the reference
tests use an app double the same way, tests/test_celery.py:20-100).
"""

from __future__ import annotations

from minibatch_spark.sources.base import Source

DEFAULT_EVENTS = ("task-succeeded", "task-failed")


class CeleryEventSource(Source):
    def __init__(self, celeryapp, events=None):
        super().__init__()
        self.app = celeryapp
        self.events = tuple(events or DEFAULT_EVENTS)
        self._stream = None
        self._receiver = None
        self._state = None

    def task_info(self, event, task) -> dict:
        """Project event+task to the flat record (reference celery.py:72-80)."""
        return {
            "task_event": event.get("type"),
            "task_name": getattr(task, "name", None),
            "task_id": getattr(task, "uuid", None) or event.get("uuid"),
            "task_info": dict(getattr(task, "info", lambda: {})() or {}),
            "task_state": getattr(task, "state", None),
            "task_runtime": getattr(task, "runtime", None),
        }

    def on_event(self, event) -> None:
        if self._stream is None or self.cancelled:
            return
        if event.get("type") not in self.events:
            return
        task = None
        if self._state is not None:
            self._state.event(event)
            task = self._state.tasks.get(event.get("uuid"))
        self._stream.append(self.task_info(event, task))
        self._stream.flush()

    def stream(self, stream) -> None:
        self._stream = stream
        self._state = self.app.events.State() if hasattr(self.app, "events") else None
        with self.app.connection() as connection:
            self._receiver = self.app.events.Receiver(
                connection, handlers={"*": self.on_event}
            )
            self._receiver.capture(limit=None, timeout=None, wakeup=True)

    def cancel(self) -> None:
        super().cancel()
        if self._receiver is not None and hasattr(self._receiver, "should_stop"):
            self._receiver.should_stop = True
