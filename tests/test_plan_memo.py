"""Round-11 optimization pins: catalog/registry plan memos.

The memos hold LAZY PLANS keyed by applicationId — never data — so every
action still computes from the parquet inputs. These tests pin the three
semantic guarantees the optimization relies on:

1. the registered callable returns the SAME plan object on a repeat call
   (the bench's per-rep construction cost collapses);
2. a staged query's memo entry INVALIDATES after clearCache (the staged
   dependency died), the constructor re-runs and re-stages, and the
   results are identical — staged pipelines keep materialize-once;
3. direct imports of the operator functions bypass the memo entirely
   (tests and composed operators see unchanged semantics).
"""

from __future__ import annotations

import pytest

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def queries():
    from minibatch_spark.registry import all_queries

    return all_queries()


def test_stageless_query_memo_hits_and_survives_clearcache(spark, queries):
    import time

    d1 = queries["q1_pricing_summary"](spark, SF)
    t0 = time.perf_counter()
    d2 = queries["q1_pricing_summary"](spark, SF)
    hit_s = time.perf_counter() - t0
    # a hit returns a FRESH view (own QueryExecution — repeat actions must
    # not reuse materialized AQE stages) over the same analyzed plan
    assert d2 is not d1, "hit must hand out a fresh execution"
    assert d2.sameSemantics(d1), "hit must reuse the memoized plan"
    assert hit_s < 0.5, f"memo hit should skip construction, took {hit_s:.3f}s"
    r1 = sorted(map(tuple, d1.collect()))
    spark.catalog.clearCache()
    d3 = queries["q1_pricing_summary"](spark, SF)
    assert d3.sameSemantics(d1), "no staged deps -> clearCache keeps the memo"
    assert sorted(map(tuple, d3.collect())) == r1


def test_repeat_invocations_fully_recompute(spark, queries):
    """Every registry invocation must compute from the parquet inputs:
    two hits must not share a QueryExecution (whose materialized AQE
    stages a repeat action would silently reuse)."""
    a = queries["tumbling_window_events"](spark, SF)
    b = queries["tumbling_window_events"](spark, SF)
    assert a is not b
    a.collect()
    c = queries["tumbling_window_events"](spark, SF)
    assert c is not a and c is not b
    assert c._jdf.queryExecution() is not a._jdf.queryExecution()


def test_staged_query_invalidates_after_clearcache_and_matches(spark, queries):
    from minibatch_spark import registry

    g1 = queries["dedup_ngram_jaccard"](spark, SF)
    g2 = queries["dedup_ngram_jaccard"](spark, SF)
    assert g2.sameSemantics(g1), "staged query should memo-hit while stages live"
    key = (spark.sparkContext.applicationId, SF, "dedup_ngram_jaccard")
    entry_before = registry._PLAN_MEMO[key][0]
    r1 = sorted(map(tuple, g1.collect()))
    spark.catalog.clearCache()
    g3 = queries["dedup_ngram_jaccard"](spark, SF)
    assert registry._PLAN_MEMO[key][0] is not entry_before, (
        "dead staged dep must force a rebuild (fresh memo entry)"
    )
    assert sorted(map(tuple, g3.collect())) == r1, "rebuild changes nothing"


def test_direct_import_bypasses_memo(spark):
    from minibatch_spark.operators.relational import q1_pricing_summary

    a = q1_pricing_summary(spark, SF)
    b = q1_pricing_summary(spark, SF)
    assert a is not b, "raw fn must construct fresh plans"


def test_load_table_memo_same_object_and_spread_memo(spark):
    from minibatch_spark.catalog import load_table, spread

    t1 = load_table(spark, SF, "documents")
    t2 = load_table(spark, SF, "documents")
    assert t1 is t2
    s1 = spread(t1)
    s2 = spread(t2)
    assert s1 is s2, "spread probe should memo on the memoized input"


def test_memo_is_per_sf_dir(spark, queries):
    a = queries["dedup_exact"](spark, SF)
    b = queries["dedup_exact"](spark, "/root/testdata/sf0.01")
    assert a is not b
