"""Source protocol (reference SURVEY.md §2.1).

A Source pumps external messages into a Stream's buffer from a background
thread (reference ``Stream.attach``, minibatch/models.py:219-226) — the
bridge-to-buffer mode. Where a native Structured Streaming source exists
(Kafka), the source also exposes ``readstream(spark)`` returning the
idiomatic streaming DataFrame, which skips the buffer double-write
entirely (SURVEY §3.3 'collapse the double-buffering')."""

from __future__ import annotations

import threading


class Source:
    """Pull loop -> stream.append(msg); cancel() stops the loop."""

    def __init__(self):
        self._cancel = threading.Event()

    def stream(self, stream) -> None:  # pragma: no cover - abstract
        raise NotImplementedError

    def cancel(self) -> None:
        self._cancel.set()

    @property
    def cancelled(self) -> bool:
        return self._cancel.is_set()


class IterableSource(Source):
    """Pump any (possibly blocking) iterable of dicts into the stream —
    the engine-native test/replay source."""

    def __init__(self, iterable, flush_every: int = 1):
        super().__init__()
        self.iterable = iterable
        self.flush_every = max(1, flush_every)

    def stream(self, stream) -> None:
        for i, msg in enumerate(self.iterable, 1):
            if self.cancelled:
                break
            stream.append(msg)
            if i % self.flush_every == 0:
                stream.flush()
        stream.flush()
