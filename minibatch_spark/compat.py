"""Environment-compatibility shims.

One concern today: ``transformWithStateInPandas`` (Spark 4's arbitrary-state
streaming operator) speaks protobuf between the Python state client and the
JVM state server (``pyspark/sql/streaming/proto/StateMessage_pb2.py``), but
this container ships no ``google.protobuf`` runtime and installs are not
possible. A pure-Python protobuf runtime IS present on disk, vendored inside
the (public) Google Cloud SDK's App Engine tooling with unmodified
``google.protobuf`` imports — so making TWS real here is a sys.path / env
problem, not a missing-code problem.

``ensure_protobuf()`` wires it up:

- appends the vendored runtime to ``sys.path`` (driver side — the native
  import already failed here, so nothing is shadowed);
- for descendant processes (local-mode Python workers import
  ``StateMessage_pb2`` inside ``transformWithStateInPandas`` tasks),
  exports ``minibatch_spark/_pbshim`` on ``PYTHONPATH`` — NOT the vendored
  dir itself. The shim's ``google/__init__.py`` rebuilds the namespace
  with native site-packages portions FIRST and the vendored runtime
  (located via ``MINIBATCH_SPARK_PROTOBUF_VENDORED``) appended LAST, so a
  child environment that has its own ``google.protobuf`` installed keeps
  winning even though PYTHONPATH precedes site-packages;
- sets protobuf's own documented escape hatch
  ``TEMPORARILY_DISABLE_PROTOBUF_VERSION_CHECK`` because the vendored
  runtime (6.32.0-dev) is one minor version behind the gencode pinned in
  pyspark (6.33.0) — a gap the strict checker rejects but the wire format
  is unaffected by.

Call it BEFORE the first ``SparkSession`` so the launched JVM (and thus its
worker processes) inherit the environment; ``session.get_spark`` does this.
A custom location can be supplied via ``MINIBATCH_SPARK_PROTOBUF_PATH``.
"""

from __future__ import annotations

import os
import sys

_VENDORED_PROTOBUF_DIRS = (
    os.environ.get("MINIBATCH_SPARK_PROTOBUF_PATH", ""),
    "/usr/lib/google-cloud-sdk/platform/google_appengine",
)


def ensure_protobuf() -> bool:
    """Make ``google.protobuf`` importable (driver + local workers).

    Returns True when a protobuf runtime is available — natively or via a
    vendored pure-Python runtime found on disk; False otherwise (callers
    should then treat transformWithState as unavailable and fall back to
    ``applyInPandasWithState``, which needs no protobuf)."""
    try:
        import google.protobuf  # noqa: F401

        return True
    except ImportError:
        pass
    for cand in _VENDORED_PROTOBUF_DIRS:
        if cand and os.path.isdir(os.path.join(cand, "google", "protobuf")):
            if cand not in sys.path:
                sys.path.append(cand)
            try:
                import google.protobuf  # noqa: F401
            except ImportError:
                sys.path.remove(cand)
                continue
            # workers are separate processes: they need the path via env.
            # Export the merge-shim (native protobuf wins in children),
            # never the vendored dir directly — see _pbshim/google.
            shim = os.path.join(os.path.dirname(os.path.abspath(__file__)), "_pbshim")
            os.environ["MINIBATCH_SPARK_PROTOBUF_VENDORED"] = cand
            existing = os.environ.get("PYTHONPATH", "")
            if shim not in existing.split(os.pathsep):
                os.environ["PYTHONPATH"] = (
                    f"{existing}{os.pathsep}{shim}" if existing else shim
                )
            os.environ.setdefault(
                "TEMPORARILY_DISABLE_PROTOBUF_VERSION_CHECK", "true"
            )
            return True
    return False
