"""StreamingApp: multi-emitter management harness.

Reference: ``minibatch/contrib/apps/omegaml.py`` (136 LoC) — a small app
wrapper that owns several streaming consumers, exposes a status endpoint
(:94-97) and start/stop control. Spark analog: a registry of
``WindowEmitter``s plus their ``StreamingQuery`` handles; status merges
the emitter-level counters with ``StreamingQuery.status``.
"""

from __future__ import annotations

from typing import Optional

from minibatch_spark.streaming.window import WindowEmitter


class StreamingApp:
    """Own and supervise a set of named emitters.

    >>> app = StreamingApp()
    >>> app.add(make_emitter('sensors', emitfn=fn, size=10))
    >>> app.start_all(spark)
    >>> app.status()          # {'CountWindow-sensors': {...}, ...}
    >>> app.stop_all()
    """

    def __init__(self):
        self.emitters: dict[str, WindowEmitter] = {}

    def add(self, emitter: WindowEmitter, name: Optional[str] = None) -> WindowEmitter:
        self.emitters[name or emitter.name] = emitter
        return emitter

    def start_all(self, spark, **run_kwargs) -> None:
        """Start every emitter non-blocking (each owns a StreamingQuery;
        Spark schedules their micro-batches concurrently)."""
        run_kwargs.setdefault("blocking", False)
        for em in self.emitters.values():
            em.run(spark, **run_kwargs)

    def status(self) -> dict:
        """Reference status endpoint parity (contrib/apps/omegaml.py:94-97):
        one entry per emitter with state + counters."""
        return {name: em.status for name, em in self.emitters.items()}

    def stop_all(self) -> None:
        for em in self.emitters.values():
            em.stop()

    def await_all(self, timeout: Optional[float] = None) -> None:
        for em in self.emitters.values():
            if em._query is not None:
                em._query.awaitTermination(timeout)
