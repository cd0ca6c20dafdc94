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
    d1 = queries["q1_pricing_summary"](spark, SF)
    d2 = queries["q1_pricing_summary"](spark, SF)
    assert d1 is d2, "stageless query should memo-hit on repeat call"
    r1 = sorted(map(tuple, d1.collect()))
    spark.catalog.clearCache()
    d3 = queries["q1_pricing_summary"](spark, SF)
    assert d1 is d3, "no staged deps -> clearCache must not invalidate"
    assert sorted(map(tuple, d3.collect())) == r1


def test_staged_query_invalidates_after_clearcache_and_matches(spark, queries):
    g1 = queries["dedup_ngram_jaccard"](spark, SF)
    g2 = queries["dedup_ngram_jaccard"](spark, SF)
    assert g1 is g2, "staged query should memo-hit while its stages live"
    r1 = sorted(map(tuple, g1.collect()))
    spark.catalog.clearCache()
    g3 = queries["dedup_ngram_jaccard"](spark, SF)
    assert g1 is not g3, "dead staged dep must force a rebuild"
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
