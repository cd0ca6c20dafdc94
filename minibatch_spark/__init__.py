"""minibatch_spark — a PySpark-native analytics engine with the capabilities
of omegaml/minibatch (reference: /root/reference, v0.6.0), rebuilt Spark-first.

Two layers over one core (SURVEY.md §7.1):

1. Relational core (batch): the full operator surface — scans, filters,
   joins, aggregations, SQL window functions, set ops, scalar functions —
   expressed with the Spark DataFrame API so Catalyst/Tungsten own the
   physical plan (pushdown, pruning, AQE, codegen).
2. Streaming layer (reference parity): ``stream(name)`` / ``append`` /
   ``attach`` / ``@streaming(...)`` mapped onto Structured Streaming
   (reference: minibatch/__init__.py:15-120, minibatch/window.py).
3. Scale extensions: dedup, similarity search, text analysis, multimodal
   column plumbing — engineered for ~100 TB (partition-aware, shuffle-lean).
"""

from minibatch_spark.session import get_spark  # noqa: F401

try:  # streaming layer (reference-parity API); optional at import time
    from minibatch_spark.streaming.api import (  # noqa: F401
        connectdb,
        make_emitter,
        stream,
        streaming,
    )
except ImportError:  # pragma: no cover - during incremental build only
    pass

__version__ = "0.1.0"
