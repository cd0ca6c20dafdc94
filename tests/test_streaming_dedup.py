"""Streaming incremental near-dup dedup (streaming/dedup_stream.py):
micro-batched ingestion against the persisted signature store must equal
the single-pass batch result, and a replayed micro-batch (the foreachBatch
crash-recovery path) must be exactly-once — rollback + reprocess leaves
store and output bit-identical to a crash-free run."""

import os

from pyspark.sql import functions as F

from tests.test_incremental import BASE, NEAR, OTHER, _docs, _store


def _write_part(spark, rows, path, mtime):
    df = _docs(spark, rows)
    df.coalesce(1).write.mode("overwrite").parquet(path)
    # deterministic file-source ordering: the source processes files by
    # modification time (latestFirst=false)
    for root, _dirs, files in os.walk(path):
        for f in files:
            os.utime(os.path.join(root, f), (mtime, mtime))


def test_streaming_matches_single_pass(spark, tmp_path):
    from minibatch_spark.streaming.dedup_stream import dedup_doc_stream, read_kept

    base = str(tmp_path)
    src = os.path.join(base, "src")
    os.makedirs(src)
    shard1 = [(1, BASE), (2, OTHER), (3, BASE)]  # 3 exact-dups 1
    shard2 = [(10, BASE), (11, NEAR), (12, "tiny new doc here ok")]
    _write_part(spark, shard1, os.path.join(src, "p1"), 1_000_000_000)
    _write_part(spark, shard2, os.path.join(src, "p2"), 1_000_000_100)

    stream = (
        spark.readStream.schema("doc_id long, text string")
        .option("maxFilesPerTrigger", 1)
        .parquet(src + "/*")
    )
    seen = []
    q = dedup_doc_stream(
        spark,
        stream,
        os.path.join(base, "store"),
        os.path.join(base, "sink"),
        os.path.join(base, "ckpt"),
        on_batch=lambda bid, n, k: seen.append((bid, n, k)),
    )
    q.awaitTermination()

    kept = sorted(
        r.doc_id for r in read_kept(spark, os.path.join(base, "sink")).collect()
    )
    # single-pass expectation over the SAME corpus through a fresh store
    single = _store(spark, tmp_path, "single")
    expect = sorted(
        r.doc_id
        for r in single.process_batch(_docs(spark, shard1 + shard2)).collect()
        if r.keep == 1
    )
    assert kept == expect == [1, 2, 12]
    assert len(seen) >= 2  # really ran multi-batch (maxFilesPerTrigger=1)
    assert sum(n for _, n, _ in seen) == 6


def test_replay_is_exactly_once(spark, tmp_path):
    """Simulate the crash-replay path foreachBatch gives us: process a
    batch, then roll back its tag and process the SAME batch again (what
    the handler does on restart). Keep decisions, store contents, and a
    subsequent batch's decisions must be identical to a crash-free run."""
    store = _store(spark, tmp_path)
    b1 = [(1, BASE), (2, OTHER)]

    r_first = {
        r.doc_id: r.keep
        for r in store.process_batch(_docs(spark, b1), batch_tag="batch-0").collect()
    }
    n_sigs_first = store.sigs().count()
    n_exact_first = store.exact().count()

    # replay: rollback the tag, reprocess the same docs with the same tag
    store.rollback("batch-0")
    assert store.sigs().count() == 0 and store.exact().count() == 0
    r_replay = {
        r.doc_id: r.keep
        for r in store.process_batch(_docs(spark, b1), batch_tag="batch-0").collect()
    }
    assert r_replay == r_first == {1: 1, 2: 1}
    assert store.sigs().count() == n_sigs_first
    assert store.exact().count() == n_exact_first

    # WITHOUT rollback, a replay would self-duplicate — pin the hazard the
    # tag design exists for
    r_naive = {
        r.doc_id: r.keep
        for r in store.process_batch(_docs(spark, b1), batch_tag="batch-0x").collect()
    }
    assert r_naive == {1: 0, 2: 0}
    store.rollback("batch-0x")

    # downstream batch still correct against the replayed store
    r2 = {
        r.doc_id: r.keep
        for r in store.process_batch(
            _docs(spark, [(10, BASE), (11, NEAR), (12, "tiny new doc here ok")]),
            batch_tag="batch-1",
        ).collect()
    }
    assert r2 == {10: 0, 11: 0, 12: 1}


def test_tagged_and_flat_appends_coexist(spark, tmp_path):
    """Batch-API (flat) and streaming (tagged) appends read back as one
    store snapshot."""
    store = _store(spark, tmp_path)
    store.process_batch(_docs(spark, [(1, BASE)]))  # flat append
    store.process_batch(_docs(spark, [(2, OTHER)]), batch_tag="t")  # tagged
    assert store.exact().count() == 2
    r = store.process_batch(_docs(spark, [(3, BASE), (4, OTHER)]))
    assert {x.doc_id: x.keep for x in r.collect()} == {3: 0, 4: 0}
