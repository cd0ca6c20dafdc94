"""DecontamStore (streaming/decontam_stream.py): the fourth streaming
store — persisted benchmark k-gram side, per-micro-batch corpus
flagging. Pinned: shard-batched flags == the batch operator
(text_decontaminate_13gram) bit-for-bit; the Structured Streaming driver
end-to-end with exactly-once flag output (replayed batch overwrites its
own partial output); benchmark append rollback; restart durability (a
fresh store object / fresh process path reads the persisted bench side).
"""

import os

from pyspark.sql import functions as F

from tests.conftest import SF_SMOKE


def _docs(spark):
    from minibatch_spark.catalog import load_table

    return load_table(spark, SF_SMOKE, "documents").select("doc_id", "text")


def _batch_flags(spark):
    from minibatch_spark.operators.text import text_decontaminate_13gram

    return sorted(
        (r.doc_id, r.n_grams, r.n_hit, r.contaminated)
        for r in text_decontaminate_13gram(spark, SF_SMOKE).collect()
    )


def test_sharded_store_flags_match_batch_operator(spark, tmp_path):
    from minibatch_spark.streaming.decontam_stream import DecontamStore

    d = _docs(spark)
    is_bench = F.col("doc_id") % 89 == 0
    store = DecontamStore(spark, os.path.join(str(tmp_path), "st"))
    store.add_benchmark(d.filter(is_bench), batch_tag="bench0")
    corp = d.filter(~is_bench)
    got = []
    for i in range(3):
        flags = store.flag_batch(corp.filter(F.col("doc_id") % 3 == i))
        got.extend(
            (r.doc_id, r.n_grams, r.n_hit, r.contaminated)
            for r in flags.collect()
        )
    assert sorted(got) == _batch_flags(spark)


def test_benchmark_rollback_restores_prior_flags(spark, tmp_path):
    from minibatch_spark.streaming.decontam_stream import DecontamStore

    d = _docs(spark)
    store = DecontamStore(spark, os.path.join(str(tmp_path), "rb"))
    store.add_benchmark(d.filter(F.col("doc_id") % 89 == 0), batch_tag="b0")
    probe = d.filter(F.col("doc_id") % 89 != 0).limit(50)
    before = sorted(
        (r.doc_id, r.n_hit) for r in store.flag_batch(probe).collect()
    )
    # a second (bogus) benchmark append changes flags; rollback restores
    store.add_benchmark(probe.limit(5), batch_tag="b1")
    store.rollback("b1")
    after = sorted(
        (r.doc_id, r.n_hit) for r in store.flag_batch(probe).collect()
    )
    assert after == before


def test_fresh_store_object_reads_persisted_bench(spark, tmp_path):
    from minibatch_spark.streaming.decontam_stream import DecontamStore

    d = _docs(spark)
    path = os.path.join(str(tmp_path), "dur")
    DecontamStore(spark, path).add_benchmark(
        d.filter(F.col("doc_id") % 89 == 0)
    )
    # a NEW store object (the restart path: no in-process state carries)
    reopened = DecontamStore(spark, path)
    assert reopened.bench_hashes().count() > 0
    flags = reopened.flag_batch(d.filter(F.col("doc_id") % 89 != 0))
    assert flags.filter(F.col("contaminated") == 1).count() >= 0  # runs


def test_streaming_driver_end_to_end_and_replay_idempotent(
    spark, tmp_path
):
    from minibatch_spark.streaming.decontam_stream import (
        DecontamStore,
        decontam_doc_stream,
    )

    base = str(tmp_path)
    d = _docs(spark)
    is_bench = F.col("doc_id") % 89 == 0
    store_dir = os.path.join(base, "store")
    DecontamStore(spark, store_dir).add_benchmark(d.filter(is_bench))

    src = os.path.join(base, "src")
    os.makedirs(src)
    for i in range(3):
        d.filter(~is_bench).filter(F.col("doc_id") % 3 == i).coalesce(
            1
        ).write.parquet(os.path.join(src, f"p{i}"))
    stream = (
        spark.readStream.schema("doc_id long, text string")
        .option("maxFilesPerTrigger", 1)
        .parquet(src + "/*")
    )
    flags_dir = os.path.join(base, "flags")
    seen = []
    q = decontam_doc_stream(
        spark,
        stream,
        store_dir,
        os.path.join(base, "ckpt"),
        flags_dir,
        on_batch=lambda bid, n: seen.append(bid),
    )
    q.awaitTermination()
    assert len(seen) == 3
    streamed = sorted(
        (r.doc_id, r.n_grams, r.n_hit, r.contaminated)
        for r in spark.read.schema(
            "doc_id long, n_grams long, n_hit long, contaminated int"
        )
        .parquet(os.path.join(flags_dir, "tag=batch-*"))
        .collect()
    )
    assert streamed == _batch_flags(spark)

    # replay: re-running a batch id overwrites its own output (the
    # exactly-once contract) — simulate the foreachBatch crash-replay by
    # re-flagging shard 0 into the same tag dir
    st = DecontamStore(spark, store_dir)
    st.flag_batch(
        d.filter(~is_bench).filter(F.col("doc_id") % 3 == 0)
    ).write.mode("overwrite").parquet(os.path.join(flags_dir, "tag=batch-0"))
    again = sorted(
        (r.doc_id, r.n_grams, r.n_hit, r.contaminated)
        for r in spark.read.schema(
            "doc_id long, n_grams long, n_hit long, contaminated int"
        )
        .parquet(os.path.join(flags_dir, "tag=batch-*"))
        .collect()
    )
    assert again == streamed
