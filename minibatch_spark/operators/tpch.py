"""TPC-H analog queries completing the 22-query shape coverage (Q2, Q9,
Q11, Q12, Q16, Q20, Q21 — the rest live in relational.py).

The reference has no relational surface at all ("merge, join" are future
work, reference README.rst:315-322), so like relational.py this module is
pure capability-gap fill, expressed DataFrame-first so Catalyst owns the
physical plan.

The driver corpus (TESTDATA.md) has no ``partsupp`` table and lineitem
carries no commitdate/receiptdate/shipmode, so the four queries that need
them (Q2/Q11/Q16/Q20 -> partsupp, Q12/Q21 -> receipt dates) are adapted to
shape-faithful analogs over the columns that exist: the join topology,
subquery shape, and physical-plan strategy of the original are preserved;
only the filter columns differ.

Determinism contract: same as relational.py — DECIMAL for money sums
(dsum), identical aliases both sides, unique tiebreakers under LIMIT.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from minibatch_spark.catalog import load_table
from minibatch_spark.operators.relational import dmoney, drate, dsum, _ts
from minibatch_spark.registry import query


@query(
    "q2_min_cost_supplier",
    oracle="""
    WITH cost AS (
      SELECT l.l_partkey, l.l_suppkey,
             CAST(CAST(SUM(CAST(l.l_extendedprice AS DECIMAL(12,2)))
                  AS DECIMAL(20,6)) AS DOUBLE)
             / CAST(CAST(SUM(CAST(l.l_quantity AS DECIMAL(12,2)))
                  AS DECIMAL(20,6)) AS DOUBLE) AS unit_cost
      FROM lineitem l
      JOIN supplier s ON s.s_suppkey = l.l_suppkey
      JOIN nation n ON n.n_nationkey = s.s_nationkey
      JOIN region r ON r.r_regionkey = n.n_regionkey
      WHERE r.r_name = 'EUROPE'
      GROUP BY l.l_partkey, l.l_suppkey
    )
    SELECT s.s_acctbal, s.s_name, n.n_name, p.p_partkey, p.p_name,
           c.unit_cost
    FROM part p
    JOIN cost c ON c.l_partkey = p.p_partkey
    JOIN supplier s ON s.s_suppkey = c.l_suppkey
    JOIN nation n ON n.n_nationkey = s.s_nationkey
    WHERE p.p_type = 'STANDARD' AND p.p_size BETWEEN 10 AND 20
      AND c.unit_cost = (
        SELECT MIN(c2.unit_cost) FROM cost c2
        WHERE c2.l_partkey = p.p_partkey
      )
    ORDER BY s.s_acctbal DESC, n.n_name, s.s_name, p.p_partkey
    LIMIT 100
    """,
)
def q2_min_cost_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q2 shape: correlated MIN subquery selecting the cheapest
    regional supplier per part.

    partsupp doesn't exist in this corpus, so supply cost is derived as
    the observed unit price per (part, supplier) from lineitem — the
    derived table plays partsupp's role exactly (same keys, same grain).
    The correlated ``= (SELECT MIN ...)`` decorrelates to a window MIN
    over the partkey partition: ONE shuffle on partkey gives every row
    its group minimum without the agg+self-join double scan. Supplier/
    nation/region dims are broadcast (100/25/5 rows; at 100 TB these dims
    are still ~MBs — always broadcast-able). The unit_cost division is
    double-over-exact-decimal in both engines, so the MIN-equality
    compare is bit-identical. Cites reference absence: README.rst:315-322.
    """
    from pyspark.sql import Window

    li = load_table(spark, sf_dir, "lineitem").select(
        "l_partkey", "l_suppkey", "l_extendedprice", "l_quantity"
    )
    sup = load_table(spark, sf_dir, "supplier")
    nat = load_table(spark, sf_dir, "nation")
    reg = load_table(spark, sf_dir, "region").filter(F.col("r_name") == "EUROPE")
    eu_supp = (
        sup.join(F.broadcast(nat), sup.s_nationkey == nat.n_nationkey)
        .join(F.broadcast(reg), F.col("n_regionkey") == F.col("r_regionkey"))
        .select("s_suppkey", "s_name", "s_acctbal", "n_name")
    )
    cost = (
        li.join(F.broadcast(eu_supp.select("s_suppkey")),
                li.l_suppkey == F.col("s_suppkey"))
        .groupBy("l_partkey", "l_suppkey")
        .agg(
            (dsum(dmoney("l_extendedprice")) / dsum(dmoney("l_quantity")))
            .alias("unit_cost")
        )
    )
    w = Window.partitionBy("l_partkey")
    best = cost.withColumn("min_cost", F.min("unit_cost").over(w)).filter(
        F.col("unit_cost") == F.col("min_cost")
    )
    part = load_table(spark, sf_dir, "part").filter(
        (F.col("p_type") == "STANDARD") & F.col("p_size").between(10, 20)
    )
    return (
        best.join(F.broadcast(part), best.l_partkey == part.p_partkey)
        .join(F.broadcast(eu_supp), best.l_suppkey == eu_supp.s_suppkey)
        .select("s_acctbal", "s_name", "n_name", "p_partkey", "p_name", "unit_cost")
        .orderBy(
            F.desc("s_acctbal"), F.asc("n_name"), F.asc("s_name"), F.asc("p_partkey")
        )
        .limit(100)
    )


@query(
    "q9_product_profit",
    oracle="""
    SELECT n.n_name AS nation,
           EXTRACT(year FROM o.o_orderdate) AS o_year,
           CAST(CAST(SUM(CAST(l.l_extendedprice AS DECIMAL(12,2))
                * (1 - CAST(l.l_discount AS DECIMAL(7,4))))
                AS DECIMAL(20,6)) AS DOUBLE) AS profit
    FROM lineitem l
    JOIN orders o ON o.o_orderkey = l.l_orderkey
    JOIN supplier s ON s.s_suppkey = l.l_suppkey
    JOIN nation n ON n.n_nationkey = s.s_nationkey
    JOIN part p ON p.p_partkey = l.l_partkey
    WHERE p.p_name LIKE '%widget%'
    GROUP BY nation, o_year
    """,
)
def q9_product_profit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q9 shape: 5-table join tree, profit per nation per year.

    The original's amount is extprice*(1-disc) - supplycost*qty; with no
    partsupp the cost leg drops but the join topology (fact ⋈ fact on
    orderkey, two broadcast dims, part name LIKE filter) is the original's.
    The p_name filter is applied to part BEFORE the join so the broadcast
    hash set is small and the lineitem scan is pruned by the join (at
    100 TB a selective broadcast semi-reduction is what makes Q9 viable —
    only ~1/6 of lineitem survives into the orderkey shuffle). Year comes
    from orders, so the fact-fact join shuffles only (orderkey, date).
    """
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_partkey", "l_suppkey", "l_extendedprice", "l_discount"
    )
    o = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_orderdate")
    sup = load_table(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    nat = load_table(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    part = (
        load_table(spark, sf_dir, "part")
        .filter(F.col("p_name").like("%widget%"))
        .select("p_partkey")
    )
    amount = dmoney("l_extendedprice") * (F.lit(1) - drate("l_discount"))
    return (
        li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .join(F.broadcast(sup), li.l_suppkey == sup.s_suppkey)
        .join(F.broadcast(nat), sup.s_nationkey == nat.n_nationkey)
        .join(o, li.l_orderkey == o.o_orderkey)
        .groupBy(
            F.col("n_name").alias("nation"),
            F.year("o_orderdate").cast("long").alias("o_year"),
        )
        .agg(dsum(amount).alias("profit"))
    )


@query(
    "q11_important_parts",
    oracle="""
    WITH filtered AS (
      SELECT l.l_partkey, CAST(l.l_extendedprice AS DECIMAL(12,2)) AS val
      FROM lineitem l
      JOIN supplier s ON s.s_suppkey = l.l_suppkey
      JOIN nation n ON n.n_nationkey = s.s_nationkey
      WHERE n.n_name = 'NATION_7'
    )
    SELECT l_partkey,
           CAST(CAST(SUM(val) AS DECIMAL(20,6)) AS DOUBLE) AS part_value
    FROM filtered
    GROUP BY l_partkey
    HAVING CAST(CAST(SUM(val) AS DECIMAL(20,6)) AS DOUBLE) > 0.001 * (
      SELECT CAST(CAST(SUM(val) AS DECIMAL(20,6)) AS DOUBLE) FROM filtered
    )
    ORDER BY part_value DESC, l_partkey
    """,
)
def q11_important_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q11 shape: HAVING against an uncorrelated scalar aggregate
    (fraction-of-total concentration query).

    partsupp's availqty*supplycost becomes shipped extendedprice value by
    NATION_7-based suppliers. The scalar total is a 1-row aggregate
    broadcast-crossed onto the per-part aggregates — both aggregates are
    computed in exact DECIMAL from the SAME pre-joined frame, so the
    0.001*total threshold compare is order-independent and bit-identical
    across engines. One shuffle on partkey; the nation filter reduces via
    a broadcast of the ~4 qualifying suppliers before any movement.
    """
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_partkey", "l_suppkey", "l_extendedprice"
    )
    sup = load_table(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    nat = load_table(spark, sf_dir, "nation").filter(F.col("n_name") == "NATION_7")
    german = sup.join(
        F.broadcast(nat), sup.s_nationkey == nat.n_nationkey
    ).select("s_suppkey")
    filtered = li.join(F.broadcast(german), li.l_suppkey == F.col("s_suppkey"))
    per_part = filtered.groupBy("l_partkey").agg(
        dsum(dmoney("l_extendedprice")).alias("part_value")
    )
    total = filtered.agg(dsum(dmoney("l_extendedprice")).alias("total_value"))
    return (
        per_part.join(F.broadcast(total))
        .filter(F.col("part_value") > 0.001 * F.col("total_value"))
        .select("l_partkey", "part_value")
        .orderBy(F.desc("part_value"), F.asc("l_partkey"))
    )


@query(
    "q12_late_lines",
    oracle="""
    SELECT l.l_linestatus,
           SUM(CASE WHEN o.o_orderpriority IN ('1-URGENT', '2-HIGH')
               THEN 1 ELSE 0 END) AS high_line_count,
           SUM(CASE WHEN o.o_orderpriority NOT IN ('1-URGENT', '2-HIGH')
               THEN 1 ELSE 0 END) AS low_line_count
    FROM orders o
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    WHERE l.l_shipdate >= o.o_orderdate + INTERVAL 60 DAY
      AND l.l_shipdate >= TIMESTAMP '1997-01-01'
      AND l.l_shipdate <  TIMESTAMP '1998-01-01'
    GROUP BY l.l_linestatus
    """,
)
def q12_late_lines(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q12 shape: fact-fact join + priority-split conditional counts.

    shipmode/commitdate/receiptdate don't exist here, so "late" is
    shipdate ≥ orderdate+60d (same non-equi predicate family as the
    original's receipt-vs-commit) and the original's shipmode grouping
    becomes linestatus. The year filter is pushed into the lineitem scan
    (PushedFilters); the late predicate is evaluated post-join since it
    spans both sides. One orderkey shuffle, map-side partial counts —
    the canonical conditional-aggregation plan at any scale. The
    priority string is folded to a BOOLEAN below the join: the build /
    shuffle side carries (orderkey, orderdate, 1 bit) instead of a
    ~10-byte string per row — ~10% at sf1 and proportionally fewer
    shuffle bytes at 100 TB. NULL priority folds to NULL `high`, and
    both CASE arms test it explicitly, so null rows land in neither
    count on either engine (same as the oracle's IN / NOT IN pair).
    """
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    o = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderdate", high.alias("high")
    )
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= _ts("1997-01-01"))
        & (F.col("l_shipdate") < _ts("1998-01-01"))
    ).select("l_orderkey", "l_shipdate", "l_linestatus")
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .filter(F.col("l_shipdate") >= F.col("o_orderdate") + F.expr("INTERVAL 60 DAYS"))
        .groupBy("l_linestatus")
        .agg(
            F.sum(F.when(F.col("high"), 1).otherwise(0)).alias("high_line_count"),
            F.sum(F.when(~F.col("high"), 1).otherwise(0)).alias("low_line_count"),
        )
    )


@query(
    "q16_supplier_diversity",
    oracle="""
    SELECT p.p_brand, p.p_type, p.p_size,
           COUNT(DISTINCT l.l_suppkey) AS supplier_cnt
    FROM lineitem l
    JOIN part p ON p.p_partkey = l.l_partkey
    WHERE p.p_brand <> 'Brand#5'
      AND p.p_type <> 'PROMO'
      AND p.p_size IN (1, 4, 9, 14, 19, 23, 36, 45)
      AND l.l_suppkey NOT IN (
        SELECT s.s_suppkey FROM supplier s WHERE s.s_acctbal < 0
      )
    GROUP BY p.p_brand, p.p_type, p.p_size
    """,
)
def q16_supplier_diversity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q16 shape: NOT IN anti join + COUNT(DISTINCT) per part class.

    The original counts partsupp suppliers per (brand, type, size)
    excluding complaint suppliers; here the (part, supplier) relation is
    observed shipments and the exclusion list is negative-balance
    suppliers. NOT IN decorrelates to a LEFT ANTI join — safe because
    s_suppkey is non-nullable (NOT IN's three-valued-logic trap needs a
    null-aware anti join; Catalyst would insert one if nullable). The
    distinct count shuffles (brand,type,size,suppkey) once, then
    per-group distinct aggregation — partial aggregation still applies
    to the dedup pass, so the plan holds at 100 TB.
    """
    part = load_table(spark, sf_dir, "part").filter(
        (F.col("p_brand") != "Brand#5")
        & (F.col("p_type") != "PROMO")
        & F.col("p_size").isin(1, 4, 9, 14, 19, 23, 36, 45)
    ).select("p_partkey", "p_brand", "p_type", "p_size")
    bad = load_table(spark, sf_dir, "supplier").filter(
        F.col("s_acctbal") < 0
    ).select("s_suppkey")
    li = load_table(spark, sf_dir, "lineitem").select("l_partkey", "l_suppkey")
    return (
        li.join(F.broadcast(bad), li.l_suppkey == bad.s_suppkey, "left_anti")
        .join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .groupBy("p_brand", "p_type", "p_size")
        .agg(F.count_distinct("l_suppkey").alias("supplier_cnt"))
    )


@query(
    "q20_heavy_shippers",
    oracle="""
    SELECT s.s_suppkey, s.s_name, s.s_acctbal
    FROM supplier s
    WHERE s.s_suppkey IN (
      SELECT l.l_suppkey
      FROM lineitem l
      JOIN part p ON p.p_partkey = l.l_partkey
      WHERE p.p_name LIKE 'red%'
        AND l.l_shipdate >= TIMESTAMP '1997-01-01'
        AND l.l_shipdate <  TIMESTAMP '1998-01-01'
      GROUP BY l.l_suppkey
      HAVING SUM(CAST(l.l_quantity AS DECIMAL(12,2))) > 400
    )
    ORDER BY s.s_name
    """,
)
def q20_heavy_shippers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q20 shape: IN over an aggregated-with-HAVING subquery
    (suppliers who moved serious volume of a part family).

    The original's availqty>half-of-shipped check needs partsupp; the
    analog keeps the nested structure — inner agg with HAVING feeding an
    IN semi join against supplier. The part-name filter broadcasts
    (~300 parts) and semi-reduces lineitem before the suppkey shuffle;
    the HAVING sum is exact DECIMAL so the >400 cut is engine-stable.
    The outer IN becomes LEFT SEMI with the (tiny) qualifying-supplier
    set broadcast — at scale the inner aggregate's output is bounded by
    |suppliers|, always the cheap side.
    """
    part = load_table(spark, sf_dir, "part").filter(
        F.col("p_name").like("red%")
    ).select("p_partkey")
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= _ts("1997-01-01"))
        & (F.col("l_shipdate") < _ts("1998-01-01"))
    ).select("l_partkey", "l_suppkey", "l_quantity")
    heavy = (
        li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .groupBy("l_suppkey")
        .agg(F.sum(dmoney("l_quantity")).alias("qty"))
        .filter(F.col("qty") > 400)
        .select("l_suppkey")
    )
    sup = load_table(spark, sf_dir, "supplier")
    return (
        sup.join(F.broadcast(heavy), sup.s_suppkey == heavy.l_suppkey, "left_semi")
        .select("s_suppkey", "s_name", "s_acctbal")
        .orderBy("s_name")
    )


@query(
    "q21_waiting_suppliers",
    oracle="""
    SELECT s.s_name, COUNT(*) AS numwait
    FROM supplier s
    JOIN lineitem l1 ON l1.l_suppkey = s.s_suppkey
    JOIN orders o ON o.o_orderkey = l1.l_orderkey
    WHERE o.o_orderstatus = 'F'
      AND EXISTS (
        SELECT 1 FROM lineitem l2
        WHERE l2.l_orderkey = l1.l_orderkey
          AND l2.l_suppkey <> l1.l_suppkey
      )
      AND NOT EXISTS (
        SELECT 1 FROM lineitem l3
        WHERE l3.l_orderkey = l1.l_orderkey
          AND l3.l_suppkey <> l1.l_suppkey
          AND l3.l_shipdate > l1.l_shipdate
      )
    GROUP BY s.s_name
    ORDER BY numwait DESC, s.s_name
    LIMIT 10
    """,
)
def q21_waiting_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q21 shape: EXISTS + NOT EXISTS self-joins on the fact table
    (the last supplier to ship in a multi-supplier order).

    The naive decorrelation is two lineitem self-joins; at 100 TB that is
    three fact shuffles and a pair blowup inside big orders. This plan
    replaces both correlated subqueries with LINE-LEVEL WINDOW aggregates
    over the orderkey spine: a line survives NOT EXISTS(later line from
    another supplier) iff its shipdate >= the max shipdate among OTHER
    suppliers' lines, derivable from (per-supplier max `smax`, per-order
    max `m1`, #suppliers attaining it `n_top`, runner-up `m2`) — all five
    are window functions sharing ONE hash exchange on l_orderkey (the
    per-(order,supplier) frames are clustering-satisfied by the orderkey
    partitioning, so Catalyst inserts no second exchange), and EXISTS
    (another supplier) is n_supp > 1 from the same pass. The previous
    groupBy-chain formulation recomputed the un-cached lineitem lineage
    FOUR times (14 FileScans, 10 exchanges at sf1); this is 3 scans /
    2 exchanges and measured 1.61 vs 3.62 s interleaved min-of-3 at sf1
    (2.2×, identical output). Per-order frames are ≤ 7 lines in TPC-H so
    the collect_set distinct-supplier counts are O(1) per row; ties (two
    suppliers sharing the max) correctly qualify both, matching the
    oracle's strict '>' semantics.
    """
    o_f = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderstatus") == "F"
    ).select("o_orderkey")
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_suppkey", "l_shipdate"
    ).join(o_f, F.col("l_orderkey") == F.col("o_orderkey"), "left_semi")

    w_os = Window.partitionBy("l_orderkey", "l_suppkey")
    w_o = Window.partitionBy("l_orderkey")
    # NULL contract (three-valued logic, pinned by the null-injection
    # differential sweep): `l3.l_shipdate > l1.l_shipdate` is never TRUE
    # when either side is NULL, so a null-shipdate l1 line always passes
    # NOT EXISTS, a null-shipdate l3 line never blocks anyone, and a null
    # others_max (no other supplier has a non-null date) blocks nothing.
    # max()-over-window ignores nulls (matching MAX in the subquery) and
    # the explicit null-qualifies filter arms below keep null-smax
    # suppliers alive — a supplier-level smax>=others_max pre-filter
    # would wrongly drop them. NULL-SUPPKEY rows are excluded from every
    # order-level window input (eff below): the oracle's correlated
    # predicates all carry `l2/l3.l_suppkey <> l1.l_suppkey`, which is
    # never TRUE for a null-suppkey row, so such lines can neither block
    # (m1/m2/others_max) nor witness EXISTS (n_supp/n_top) — a
    # late-shipping null-suppkey line raising m1 would wrongly exclude
    # valid supplier lines (the r7 ADVICE latent divergence, now pinned
    # by l_suppkey in the null sweep's NULLABLE set).
    eff = F.when(F.col("l_suppkey").isNotNull(), F.col("l_shipdate"))
    e = (
        li.withColumn("smax", F.max("l_shipdate").over(w_os))
        .withColumn("m1", F.max(eff).over(w_o))
        .withColumn("n_supp", F.size(F.collect_set("l_suppkey").over(w_o)))
        .withColumn(
            "n_top",
            F.size(
                F.collect_set(
                    F.when(F.col("smax") == F.col("m1"), F.col("l_suppkey"))
                ).over(w_o)
            ),
        )
        .withColumn(
            "m2",
            F.max(
                F.when(
                    F.col("l_suppkey").isNotNull()
                    & (F.col("smax") < F.col("m1")),
                    F.col("smax"),
                )
            ).over(w_o),
        )
        .withColumn(
            "others_max",
            F.when(
                (F.col("smax") == F.col("m1")) & (F.col("n_top") == 1),
                F.col("m2"),
            ).otherwise(F.col("m1")),
        )
    )
    # count the LINES (oracle counts l1 rows) whose shipdate survives
    lines = e.filter(F.col("n_supp") > 1).filter(
        F.col("others_max").isNull()
        | F.col("l_shipdate").isNull()
        | (F.col("l_shipdate") >= F.col("others_max"))
    )
    sup = load_table(spark, sf_dir, "supplier").select("s_suppkey", "s_name")
    return (
        lines.join(F.broadcast(sup), lines.l_suppkey == sup.s_suppkey)
        .groupBy("s_name")
        .agg(F.count(F.lit(1)).alias("numwait"))
        .orderBy(F.desc("numwait"), F.asc("s_name"))
        .limit(10)
    )
