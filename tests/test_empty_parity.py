"""Empty-input parity sweep: EVERY oracle-backed query runs on a fully
empty star schema (same schemas, zero rows) through the exact-value
differential harness.

Two real bug classes were found and fixed here (round 4):
- crashes: `first()` returning None fed dim/query-vector derivation in
  the ANN/LSH family (and create_map() got zero args in
  count_window_batches) — all now return correctly-typed empty frames;
- standard-SQL semantics: ROLLUP/CUBE/GROUPING SETS must emit exactly
  ONE ()-set grand-total row even over an empty table (COUNT(*)=0);
  Spark's Expand yields nothing from nothing, so those operators now
  source the grand-total row from an explicit global aggregate.
"""

import os

import pyarrow.parquet as pq
import pytest

SRC = "/root/testdata/sf0.001"
TABLES = (
    "region nation customer supplier part orders lineitem events "
    "documents embeddings"
).split()


def _names():
    from minibatch_spark.registry import all_oracles, all_queries

    oracles = all_oracles()
    return [n for n in sorted(all_queries()) if n in oracles]


@pytest.fixture(scope="module")
def empty_sf(tmp_path_factory):
    sf = str(tmp_path_factory.mktemp("empty-star"))
    for t in TABLES:
        tab = pq.read_table(os.path.join(SRC, f"{t}.parquet"))
        pq.write_table(tab.slice(0, 0), os.path.join(sf, f"{t}.parquet"))
    return sf


@pytest.fixture(scope="module")
def empty_duck(empty_sf):
    import duckdb

    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM "
            f"read_parquet('{empty_sf}/{t}.parquet')"
        )
    yield con
    con.close()


@pytest.mark.parametrize("name", _names())
def test_empty_parity(spark, empty_sf, empty_duck, name):
    from minibatch_spark.registry import all_oracles, all_queries

    from tests.oracle_util import run_pair

    run_pair(
        spark, empty_duck, all_queries()[name], all_oracles()[name], empty_sf, name
    )
