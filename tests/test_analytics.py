"""Semantic invariants for the analytics family (events_funnel,
events_retention_cohorts, table_profile) beyond the registry-wide DuckDB
exact-match in test_oracle.py."""

import pytest

from tests.conftest import SF_CORRECT


def test_funnel_monotone_and_nonvacuous(spark):
    from minibatch_spark.registry import all_queries

    rows = {
        r["stage"]: r["n_users"]
        for r in all_queries()["events_funnel"](spark, SF_CORRECT).collect()
    }
    assert set(rows) == {"view", "view>click", "view>click>purchase"}
    # funnel can only narrow, and at sf0.01 every stage must be exercised
    assert rows["view"] >= rows["view>click"] >= rows["view>click>purchase"]
    assert rows["view>click>purchase"] > 0


def test_funnel_single_exchange(spark):
    """The three chained stage-minima share one partitionBy(user_id): the
    whole funnel must plan exactly ONE shuffle of the event log."""
    from minibatch_spark.registry import all_queries

    df = all_queries()["events_funnel"](spark, SF_CORRECT)
    plan = df._jdf.queryExecution().executedPlan().toString()
    # exactly ONE hash repartition of the event log: the three Windows and
    # the per-user dedup agg all reuse hashpartitioning(user_id). The
    # remaining exchanges are spread()'s round-robin (local small-file
    # helper) and the 3-row SinglePartition of the final global count.
    n_hash = sum(
        1 for line in plan.splitlines() if "Exchange hashpartitioning" in line
    )
    assert n_hash == 1, plan
    assert plan.count("Window [") == 3, plan


def test_retention_cohort_week0_total(spark):
    """Every user is active in their own cohort week: the week_offset=0
    diagonal must sum to the number of distinct users."""
    import pyspark.sql.functions as F

    from minibatch_spark.catalog import load_table
    from minibatch_spark.registry import all_queries

    coh = all_queries()["events_retention_cohorts"](spark, SF_CORRECT)
    diag = (
        coh.filter(F.col("week_offset") == 0)
        .agg(F.sum("n_users").alias("s"))
        .collect()[0]["s"]
    )
    n_users = (
        load_table(spark, SF_CORRECT, "events")
        .select("user_id")
        .distinct()
        .count()
    )
    assert diag == n_users
    assert coh.filter(F.col("week_offset") < 0).count() == 0


def test_table_profile_bounds(spark):
    from minibatch_spark.catalog import load_table
    from minibatch_spark.registry import all_queries

    rows = all_queries()["table_profile"](spark, SF_CORRECT).collect()
    n = load_table(spark, SF_CORRECT, "lineitem").count()
    assert len(rows) == 6
    for r in rows:
        assert r["n_rows"] == n
        assert 0 <= r["n_null"] <= n
        assert 1 <= r["n_distinct"] <= n
        if r["min_num"] is not None:
            assert r["min_num"] <= r["max_num"]
        else:
            assert r["min_str"] <= r["max_str"]
