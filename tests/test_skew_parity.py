"""Cross-engine SKEW parity sweep: the full oracle-backed registry runs on
a same-size skewed corpus — 50% of events on one hot user, hot
customer/supplier/part keys, a dominant document source, and one
~20k-word GIANT document — through the exact-value differential harness.

Motivation: the uniform generators never produce a hot key or a long row,
and round 5's first skewed run caught a latent O(len²) in the shingle
oracles (a non-column expression referenced inside a DuckDB list_transform
lambda is re-evaluated per element — 83 GB RSS on a 100k-word doc; fixed
by dedup._shingle_select's tokenize-once subquery). This suite keeps the
whole surface pinned on that corpus shape: a reintroduced per-element
re-evaluation shows up as an obvious hang, any value divergence as an
exact-match failure.
"""

import os
import sys

import pytest

from tests.conftest import SF_SMOKE

sys.path.insert(0, os.path.join(os.path.dirname(os.path.dirname(__file__)), "tools"))

TABLES = (
    "region nation customer supplier part orders lineitem events "
    "documents embeddings"
).split()


def _names():
    from minibatch_spark.registry import all_oracles, all_queries

    oracles = all_oracles()
    return [n for n in sorted(all_queries()) if n in oracles]


@pytest.fixture(scope="module")
def skew_sf(tmp_path_factory):
    import gen_skewed

    out = str(tmp_path_factory.mktemp("skew-corpus"))
    return gen_skewed.gen(SF_SMOKE, out, giant_words=20_000)


@pytest.fixture(scope="module")
def skew_duck(skew_sf):
    import duckdb

    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM "
            f"read_parquet('{skew_sf}/{t}.parquet')"
        )
    yield con
    con.close()


@pytest.mark.parametrize("name", _names())
def test_skew_parity(spark, skew_sf, skew_duck, name):
    from tests.oracle_util import run_pair

    from minibatch_spark.registry import all_oracles, all_queries

    run_pair(
        spark, skew_duck, all_queries()[name], all_oracles()[name], skew_sf, name
    )
