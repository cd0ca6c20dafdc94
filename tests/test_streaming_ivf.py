"""Streaming IVF ingest (streaming/ivf_stream.py): micro-batched index
construction must be bit-identical to the batch build+append path, and a
crash-replayed micro-batch must be exactly-once (tag overwrite, no
duplicate vectors, identical final index)."""

import os

import pyspark.sql.functions as F
import pytest

from tests.conftest import SF_SMOKE


def _emb_rows(spark):
    from minibatch_spark.catalog import load_table
    from minibatch_spark.operators.similarity import as_double

    return (
        load_table(spark, SF_SMOKE, "embeddings")
        .select("vec_id", as_double("embedding").alias("ve"))
        .orderBy("vec_id")
        .collect()
    )


def _write_shard(spark, rows, path, mtime):
    df = spark.createDataFrame(
        [(r.vec_id, r.ve) for r in rows], "vec_id long, ve array<double>"
    )
    df.coalesce(1).write.mode("overwrite").parquet(path)
    for root, _dirs, files in os.walk(path):
        for f in files:
            os.utime(os.path.join(root, f), (mtime, mtime))


def _shards_src(spark, base):
    rows = _emb_rows(spark)
    mid = len(rows) // 2
    shard1, shard2 = rows[:mid], rows[mid:]
    src = os.path.join(base, "src")
    os.makedirs(src, exist_ok=True)
    _write_shard(spark, shard1, os.path.join(src, "p1"), 1_000_000_000)
    _write_shard(spark, shard2, os.path.join(src, "p2"), 1_000_000_100)
    return src, shard1, shard2


def _stream(spark, src):
    return (
        spark.readStream.schema("vec_id long, ve array<double>")
        .option("maxFilesPerTrigger", 1)
        .parquet(src + "/*")
    )


def _snap(store):
    return sorted(
        (r.vec_id, r.cell, tuple(r.ve)) for r in store.vectors().collect()
    )


def _batch_reference(spark, tmp_path, shard1, shard2):
    """The single-process batch path over the same shards."""
    from minibatch_spark.operators.ivf_store import IvfIndexStore

    ref = IvfIndexStore(spark, os.path.join(str(tmp_path), "batch-ref"))
    mk = lambda rows: spark.createDataFrame(
        [(r.vec_id, r.ve) for r in rows], "vec_id long, ve array<double>"
    )
    ref.build(mk(shard1))
    ref.append(mk(shard2))
    return ref


def test_streaming_matches_batch_build(spark, tmp_path):
    """maxFilesPerTrigger=1 ingest == build(shard1) + append(shard2):
    the streamed index trains on exactly the first batch and freezes,
    so streaming and batch construction agree bit-for-bit."""
    from minibatch_spark.operators.ivf_store import IvfIndexStore
    from minibatch_spark.streaming.ivf_stream import ingest_embedding_stream

    base = str(tmp_path)
    src, shard1, shard2 = _shards_src(spark, base)
    seen = []
    q = ingest_embedding_stream(
        spark,
        _stream(spark, src),
        os.path.join(base, "store"),
        os.path.join(base, "ckpt"),
        on_batch=lambda bid, n: seen.append((bid, n)),
    )
    q.awaitTermination()
    assert len(seen) == 2 and sum(n for _, n in seen) == len(shard1) + len(
        shard2
    )

    streamed = IvfIndexStore(spark, os.path.join(base, "store"))
    ref = _batch_reference(spark, tmp_path, shard1, shard2)
    assert _snap(streamed) == _snap(ref)
    # centroid tables identical too (train-on-first-shard both ways)
    c_s = sorted((r.cid, tuple(r.cv)) for r in streamed.centroids().collect())
    c_r = sorted((r.cid, tuple(r.cv)) for r in ref.centroids().collect())
    assert c_s == c_r
    # and the streamed index answers queries
    qdf = spark.createDataFrame(
        [(shard1[0].vec_id, shard1[0].ve)], "query_id long, qv array<double>"
    )
    assert streamed.topk(qdf, k=3).count() == 3


def test_crash_replay_exactly_once(spark, tmp_path):
    """Inject a crash AFTER the batch's append commits but BEFORE the
    checkpoint does (the on_batch observer runs post-append): the replay
    must OVERWRITE its own tag — final index bit-identical to a
    crash-free run, no duplicate vec_ids, and the retrained centroids
    identical (deterministic trainer)."""
    from pyspark.errors.exceptions.captured import StreamingQueryException

    from minibatch_spark.operators.ivf_store import IvfIndexStore
    from minibatch_spark.streaming.ivf_stream import ingest_embedding_stream

    base = str(tmp_path)
    src, shard1, shard2 = _shards_src(spark, base)
    calls = []

    def crash_once(batch_id, n):
        calls.append(batch_id)
        if len(calls) == 1:
            raise RuntimeError("injected crash: append committed, checkpoint pending")

    q = ingest_embedding_stream(
        spark,
        _stream(spark, src),
        os.path.join(base, "store"),
        os.path.join(base, "ckpt"),
        on_batch=crash_once,
    )
    with pytest.raises(StreamingQueryException):
        q.awaitTermination()
    # the crashed attempt's tag IS on disk and committed — exactly the
    # state the overwrite-by-tag replay targets
    assert os.path.exists(
        os.path.join(base, "store", "vectors", "tag=batch-0", "_SUCCESS")
    )

    q2 = ingest_embedding_stream(
        spark,
        _stream(spark, src),
        os.path.join(base, "store"),
        os.path.join(base, "ckpt"),
    )
    q2.awaitTermination()

    streamed = IvfIndexStore(spark, os.path.join(base, "store"))
    snap = _snap(streamed)
    ref = _batch_reference(spark, tmp_path, shard1, shard2)
    assert snap == _snap(ref)
    ids = [v for v, _, _ in snap]
    assert len(ids) == len(set(ids)) == len(shard1) + len(shard2)


def test_compact_every_batch_matches_batch_build(spark, tmp_path):
    """ingest_embedding_stream with compact_every=1: the cadence's
    per-batch compaction (excluding the in-flight tag) must leave the
    final index bit-identical to the batch build+append path."""
    from minibatch_spark.operators.ivf_store import IvfIndexStore
    from minibatch_spark.streaming.ivf_stream import ingest_embedding_stream

    base = str(tmp_path)
    src, shard1, shard2 = _shards_src(spark, base)
    q = ingest_embedding_stream(
        spark, _stream(spark, src), os.path.join(base, "store"),
        os.path.join(base, "ckpt"), compact_every=1,
    )
    q.awaitTermination()
    streamed = IvfIndexStore(spark, os.path.join(base, "store"))
    ref = _batch_reference(spark, tmp_path, shard1, shard2)
    assert _snap(streamed) == _snap(ref)
