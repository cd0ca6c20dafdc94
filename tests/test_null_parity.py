"""Cross-engine NULL-semantics parity sweep: the relational/TPC-H/window
query families run on a null-injected copy of the sf0.001 star schema
(5% NULLs in every nullable non-key column) through the same exact-value
differential harness as the sf0.01 gate.

Motivation: the shipped testdata contains no NULLs, so the oracle gate
never exercises three-valued logic — and round 4's differential probe
found six real divergences exactly there (CONCAT-vs-concat_ws null
semantics, NULL as a window-partition value in the as-of join, pivot
dropping null-status rows from COUNT(*), q21's aggregate rewrite of
NOT EXISTS under null dates, null group keys lost by plain join keys in
the HLL rollup, null map keys counted by n_types). All fixed with
explicit NULL contracts in the operators' docstrings; this suite keeps
the whole surface pinned against that class of bug.
"""

import os
import random

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

SRC = "/root/testdata/sf0.001"
NULL_RATE = 0.05
SEED = 77

NULLABLE = {
    "lineitem": ["l_quantity", "l_extendedprice", "l_discount", "l_tax",
                 "l_returnflag", "l_shipdate", "l_suppkey"],
    "orders": ["o_totalprice", "o_orderdate", "o_orderpriority", "o_orderstatus"],
    "customer": ["c_acctbal", "c_mktsegment"],
    "supplier": ["s_acctbal"],
    "part": ["p_size", "p_retailprice", "p_type", "p_brand"],
    "events": ["value", "event_type", "props", "user_id"],
    "documents": [], "embeddings": [], "region": [], "nation": [],
}

# doc/embedding families are covered by test_unicode_parity / the main
# gate and read tables this sweep does not null-inject
SKIP_PREFIXES = ("text_", "dedup_", "docs_", "multimodal_", "emb_", "ann_")


def _names():
    from minibatch_spark.registry import all_oracles, all_queries

    oracles = all_oracles()
    return [
        n
        for n in sorted(all_queries())
        if not n.startswith(SKIP_PREFIXES) and n in oracles
    ]


@pytest.fixture(scope="module")
def null_sf(tmp_path_factory):
    sf = str(tmp_path_factory.mktemp("null-star"))
    rng = random.Random(SEED)
    for t, cols in NULLABLE.items():
        tab = pq.read_table(os.path.join(SRC, f"{t}.parquet"))
        if cols:
            d = tab.to_pydict()
            n = len(d[cols[0]])
            for c in cols:
                for i in range(n):
                    if rng.random() < NULL_RATE:
                        d[c][i] = None
            tab = pa.table(d, schema=tab.schema)
        pq.write_table(tab, os.path.join(sf, f"{t}.parquet"))
    return sf


@pytest.fixture(scope="module")
def null_duck(null_sf):
    import duckdb

    con = duckdb.connect()
    for t in NULLABLE:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM "
            f"read_parquet('{null_sf}/{t}.parquet')"
        )
    yield con
    con.close()


@pytest.mark.parametrize("name", _names())
def test_null_parity(spark, null_sf, null_duck, name):
    from minibatch_spark.registry import all_oracles, all_queries

    from tests.oracle_util import run_pair

    run_pair(
        spark, null_duck, all_queries()[name], all_oracles()[name], null_sf, name
    )
