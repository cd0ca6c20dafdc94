"""Round-12 optimization pins: size-adaptive repartition counts.

spread()/fanout_repartition() derive their partition count from the
input's on-disk bytes (one task per TASK_TARGET_BYTES, capped at the
deployment's own parallelism) instead of a flat core count — guide
§2.2/§2.5: a 600 KB input must not fan into 32 sliver tasks, and the
rule is the same one a 1000-core cluster needs. These tests pin the
sizing arithmetic and the no-op behaviour at either extreme.
"""

from __future__ import annotations

import os

SF_SMOKE = "/root/testdata/sf0.001"
SF_CORRECT = "/root/testdata/sf0.01"


def test_input_size_bytes_matches_os_stat(spark):
    from minibatch_spark.catalog import input_size_bytes, load_table

    df = load_table(spark, SF_CORRECT, "documents")
    assert input_size_bytes(df) == os.path.getsize(f"{SF_CORRECT}/documents.parquet")


def test_input_size_none_for_fileless_frame(spark):
    from minibatch_spark.catalog import adaptive_partitions, input_size_bytes

    df = spark.range(10)
    assert input_size_bytes(df) is None
    # unknown size -> stay at the deployment's own parallelism (the cap)
    assert adaptive_partitions(df, cap=7) == 7


def test_adaptive_partitions_floor_cap_and_scaling(spark):
    from minibatch_spark.catalog import adaptive_partitions, load_table

    tiny = load_table(spark, SF_SMOKE, "documents")  # ~7 KB
    assert adaptive_partitions(tiny, cap=32, bytes_per_task=64 * 1024) == 1
    big = load_table(spark, SF_CORRECT, "documents")  # ~65 KB
    # more bytes -> more partitions, ceil semantics, never above cap
    n_small_tasks = adaptive_partitions(big, cap=32, bytes_per_task=16 * 1024)
    assert 4 <= n_small_tasks <= 5
    assert adaptive_partitions(big, cap=2, bytes_per_task=1024) == 2


def test_spread_noop_when_input_tiny(spark):
    """A tiny input no longer pays a round-robin exchange at all: the
    adaptive target is 1 and the single-split scan already has it."""
    from minibatch_spark.catalog import load_table, spread

    df = load_table(spark, SF_SMOKE, "documents")
    assert spread(df) is df


def test_fanout_partition_count_is_size_derived(spark):
    from minibatch_spark.catalog import fanout_repartition, load_table

    df = load_table(spark, SF_SMOKE, "documents")
    out = fanout_repartition(df, "doc_id")
    # ~7 KB input -> 1 partition regardless of the session's shuffle
    # partition conf; the exchange itself must still exist (it is what
    # spreads a fan-out at scale)
    assert out.rdd.getNumPartitions() == 1
    assert "repartition" in out._jdf.queryExecution().logical().toString().lower()


def test_query_results_identical_under_adaptive_counts(spark):
    """The repartition count is a physical property: the winnow pipeline
    (spread + fanout consumer) returns identical rows whether the count
    is adaptive or forced to the old core-count behaviour."""
    from minibatch_spark.operators.text import text_winnow_fingerprint

    adaptive = text_winnow_fingerprint(spark, SF_CORRECT).collect()
    assert len(adaptive) > 0
    rows = {r["doc_id"]: (r["n_fp"], r["fp_min"], r["fp_max"]) for r in adaptive}
    import minibatch_spark.catalog as cat

    old = cat.TASK_TARGET_BYTES
    cat.TASK_TARGET_BYTES = 1  # force per-byte fan-out = old full-width path
    try:
        cat._SPREAD_MEMO.clear()
        forced = text_winnow_fingerprint(spark, SF_CORRECT).collect()
    finally:
        cat.TASK_TARGET_BYTES = old
        cat._SPREAD_MEMO.clear()
    assert {r["doc_id"]: (r["n_fp"], r["fp_min"], r["fp_max"]) for r in forced} == rows
