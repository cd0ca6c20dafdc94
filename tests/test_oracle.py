"""Differential correctness: every registered oracle-backed query must match
DuckDB exactly at sf0.001 (mirrors the driver's CORRECTNESS gate, stricter:
exact values, not hashes). Non-oracle queries are smoke-run for schema
stability and rows >= 0.
"""

import pytest

from tests.conftest import SF_SMOKE


def _oracle_names():
    from minibatch_spark.registry import all_oracles

    return sorted(all_oracles())


def _rows_only_names():
    from minibatch_spark.registry import all_oracles, all_queries

    return sorted(set(all_queries()) - set(all_oracles()))


@pytest.mark.parametrize("name", _oracle_names())
def test_oracle_match(spark, duck, name):
    from tests.oracle_util import run_pair

    from minibatch_spark.registry import all_oracles, all_queries

    n = run_pair(spark, duck, all_queries()[name], all_oracles()[name], SF_SMOKE, name)
    assert n >= 0


@pytest.mark.parametrize("name", _rows_only_names())
def test_rows_only_smoke(spark, name):
    from minibatch_spark.registry import all_queries

    df = all_queries()[name](spark, SF_SMOKE)
    assert df.count() >= 0
    assert len(df.schema.fields) > 0


def test_entry(spark):
    import __spark_entry__ as e

    df = e.entry(spark)
    assert df.count() > 0
    # every query key has either an oracle or is explicitly rows-only
    q, o = e.queries(), e.oracle_sql()
    assert set(o) <= set(q)
