"""Query registry: the single source of truth wiring operator implementations
to the driver contract (__spark_entry__.queries / oracle_sql).

Each registered query is a callable ``(spark, sf_dir) -> DataFrame`` plus an
optional DuckDB-oracle SQL string. Registration happens at import time of the
operator modules; ``all_queries()`` triggers those imports.
"""

from __future__ import annotations

from collections.abc import Callable
from typing import Optional

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]

_QUERIES: dict[str, QueryFn] = {}
_ORACLES: dict[str, str] = {}


def query(name: str, oracle: Optional[str] = None):
    """Decorator: register a query builder and its DuckDB oracle SQL.

    ``oracle=None`` marks a genuinely non-SQL-expressible op — the driver
    then records a weaker rows-only check.
    """

    def deco(fn: QueryFn) -> QueryFn:
        if name in _QUERIES:
            raise ValueError(f"duplicate query name {name!r}")
        _QUERIES[name] = fn
        if oracle is not None:
            _ORACLES[name] = oracle
        return fn

    return deco


def _load_all() -> None:
    # Import for registration side effects.
    from minibatch_spark.operators import (  # noqa: F401
        analytics,
        clustered,
        curation,
        dedup,
        incremental,
        ivf_store,
        multimodal,
        relational,
        similarity,
        skew,
        storage,
        text,
        tpch,
        windows,
    )
    from minibatch_spark.streaming import (  # noqa: F401
        decontam_stream,
    )


def all_queries() -> dict[str, QueryFn]:
    _load_all()
    return dict(_QUERIES)


def all_oracles() -> dict[str, str]:
    _load_all()
    return dict(_ORACLES)
