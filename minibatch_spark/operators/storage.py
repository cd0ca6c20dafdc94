"""Physical-layout operators: queries whose POINT is the storage layout
they read from — bucketed (pre-shuffled) tables whose joins need no
exchange.

The reference delegates physical layout to MongoDB collections + B-tree
indexes (reference minibatch/models.py:103-116 — `Batch.meta['indexes']`);
Spark's equivalents are bucketing and hive-partitioning (catalog.py
write_bucketed / write_partitioned, plan-pinned by tests/test_plans.py::
test_bucketed_join_no_shuffle / test_partitioned_scan_prunes). This module
surfaces the bucketed-join strategy as a driver-gated registry query so
the oracle verifies that the exchange-free plan computes the SAME answer
as the shuffled one.
"""

from __future__ import annotations

import hashlib
import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from minibatch_spark.catalog import SCRATCH_DIR, load_table, write_bucketed
from minibatch_spark.operators.relational import dmoney, dsum
from minibatch_spark.registry import query

N_BUCKETS = 16

# (applicationId, sf_dir) -> True once the bucketed pair is written.
# Bucketed tables live in the SESSION catalog (parquet data-source
# tables), so a new SparkSession must re-create them even if the files
# survived in scratch. Keyed on applicationId, not id(sparkContext):
# id() values can be recycled after an old context is GC'd, and a false
# memo hit would skip table creation and fail with table-not-found
# (round-9 ADVICE).
_BUCKETED_READY: dict = {}


def _bucketed_pair(spark: SparkSession, sf_dir: str) -> tuple:
    """Idempotently materialize orders+lineitem bucketed by orderkey for
    ``sf_dir``; returns the two table names. One write per (session,
    sf_dir) — the memo mirrors the production shape, where bucketing is
    a one-time layout decision amortized over every recurring join."""
    key = (spark.sparkContext.applicationId, os.path.abspath(sf_dir))
    tag = hashlib.md5(key[1].encode()).hexdigest()[:8]
    t_orders, t_lineitem = f"bk_orders_{tag}", f"bk_lineitem_{tag}"
    if not _BUCKETED_READY.get(key):
        base = os.path.join(SCRATCH_DIR, f"bucketed-{tag}")
        o = load_table(spark, sf_dir, "orders").select(
            "o_orderkey", "o_orderpriority"
        )
        li = load_table(spark, sf_dir, "lineitem").select(
            "l_orderkey", "l_extendedprice", "l_discount"
        )
        write_bucketed(
            o, t_orders, "o_orderkey", N_BUCKETS, os.path.join(base, "o")
        )
        li = li.withColumnRenamed("l_orderkey", "o_orderkey")
        write_bucketed(
            li, t_lineitem, "o_orderkey", N_BUCKETS, os.path.join(base, "l")
        )
        _BUCKETED_READY[key] = True
    return t_orders, t_lineitem


@query(
    "join_bucketed_colocated",
    oracle="""
    SELECT o.o_orderpriority AS priority,
           COUNT(*) AS n_lines,
           CAST(CAST(SUM(CAST(l.l_extendedprice AS DECIMAL(12,2))
                         * (1 - CAST(l.l_discount AS DECIMAL(7,4))))
                     AS DECIMAL(20,6)) AS DOUBLE) AS revenue
    FROM orders o JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    GROUP BY 1
    """,
)
def join_bucketed_colocated(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fact-fact join WITHOUT a join exchange: orders and lineitem are
    bucketed (and per-bucket sorted) by orderkey, so the SortMergeJoin
    reads matching buckets executor-locally — the layout strategy for
    every RECURRING big join at 100 TB, where re-shuffling both fact
    tables per query is the single dominant cost. The `merge` hint pins
    the SMJ path even where the small test tables would broadcast; at
    scale neither side is broadcastable and the hint is a no-op.

    Plan contract (pinned by tests/test_plans.py::
    test_join_bucketed_colocated_plan): exactly ONE exchange in the whole
    query — the final per-priority aggregate (5 groups) — and none below
    the join. The bucketed write itself costs one shuffle, paid ONCE at
    layout time and amortized over every subsequent join on the key;
    this query reads the layout, it does not re-create it per run
    (session-memoized).

    Oracle: the identical join/aggregate over the UN-bucketed views —
    bucketing must change the plan, never the answer. Exact decimal
    money discipline (relational.dsum) keeps revenue bit-identical."""
    t_orders, t_lineitem = _bucketed_pair(spark, sf_dir)
    o = spark.table(t_orders)
    li = spark.table(t_lineitem)
    rev = dsum(
        dmoney("l_extendedprice")
        * (F.lit(1) - F.col("l_discount").cast("decimal(7,4)"))
    )
    return (
        o.hint("merge")
        .join(li, "o_orderkey")
        .groupBy(F.col("o_orderpriority").alias("priority"))
        .agg(
            F.count(F.lit(1)).alias("n_lines"),
            rev.alias("revenue"),
        )
    )
