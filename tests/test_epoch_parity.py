"""Pre-epoch timestamp parity sweep: the relational/window families run
with 20% of timestamps shifted to the 1950s-60s (negative epoch values)
through the exact-value differential harness.

Motivation: the shipped testdata is entirely post-1995, so the gate
never exercised negative-epoch arithmetic — where millisecond floor vs
truncate semantics diverge: Spark's ``unix_millis`` FLOORS while
DuckDB's ``epoch_ms`` (and integer ``//``) TRUNCATE toward zero, an
off-by-1-ms disagreement on every pre-epoch timestamp with sub-ms
precision. Round 4 fixed the five affected oracles to DuckDB's floored
``fdiv(epoch_us(...), 1000)`` (lag gaps, as-of join, sessionize,
session span, sliding-window bucket alignment); this suite keeps the
whole surface pinned.
"""

import os
import random
from datetime import timedelta

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

SRC = "/root/testdata/sf0.001"
SHIFT = {"orders": "o_orderdate", "lineitem": "l_shipdate", "events": "ts"}
TABLES = (
    "region nation customer supplier part orders lineitem events "
    "documents embeddings"
).split()
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
def epoch_sf(tmp_path_factory):
    sf = str(tmp_path_factory.mktemp("epoch-star"))
    rng = random.Random(5)
    for t in TABLES:
        tab = pq.read_table(os.path.join(SRC, f"{t}.parquet"))
        if t in SHIFT:
            col = SHIFT[t]
            d = tab.to_pydict()
            for i in range(len(d[col])):
                if rng.random() < 0.2 and d[col][i] is not None:
                    d[col][i] = d[col][i] - timedelta(days=365 * 60)
            tab = pa.table(d, schema=tab.schema)
        pq.write_table(tab, os.path.join(sf, f"{t}.parquet"))
    return sf


@pytest.fixture(scope="module")
def epoch_duck(epoch_sf):
    import duckdb

    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM "
            f"read_parquet('{epoch_sf}/{t}.parquet')"
        )
    yield con
    con.close()


@pytest.mark.parametrize("name", _names())
def test_epoch_parity(spark, epoch_sf, epoch_duck, name):
    from minibatch_spark.registry import all_oracles, all_queries

    from tests.oracle_util import run_pair

    run_pair(
        spark, epoch_duck, all_queries()[name], all_oracles()[name], epoch_sf, name
    )
