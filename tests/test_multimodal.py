"""Multimodal decode-pipeline invariants: the mapInPandas plumbing is
real (schema, Arrow batching, partition preservation); the codec is a
deterministic md5-derived stub (documented in operators/multimodal.py).
"""

from tests.conftest import SF_SMOKE


def test_decode_deterministic(spark):
    """Two independent runs produce identical rows — the property a real
    codec swap must preserve for replayable pipelines."""
    from minibatch_spark.registry import all_queries

    fn = all_queries()["multimodal_decode_stub"]
    a = sorted(map(tuple, fn(spark, SF_SMOKE).collect()))
    b = sorted(map(tuple, fn(spark, SF_SMOKE).collect()))
    assert a == b


def test_decode_shape_and_ranges(spark, duck):
    from minibatch_spark.operators.multimodal import FEATURE_DIM
    from minibatch_spark.registry import all_queries

    n_docs = duck.execute("SELECT COUNT(*) FROM documents").fetchone()[0]
    df = all_queries()["multimodal_decode_stub"](spark, SF_SMOKE)
    rows = df.collect()
    assert len(rows) == n_docs * FEATURE_DIM
    assert [f.name for f in df.schema.fields] == [
        "doc_id", "width", "height", "dim", "value",
    ]
    for r in rows:
        assert 32 <= r.width <= 255 and 32 <= r.height <= 255
        assert 0 <= r.dim < FEATURE_DIM
        assert 0.0 <= r.value <= 1.0


def test_decode_features_preserves_partitioning(spark):
    """mapInPandas keeps the upstream partitioning — the property that
    makes repartition-before-decode control decode parallelism at scale."""
    from pyspark.sql import functions as F

    from minibatch_spark.catalog import load_table
    from minibatch_spark.operators.multimodal import decode_features

    d = load_table(spark, SF_SMOKE, "documents").repartition(7)
    blobs = d.select("doc_id", F.col("text").cast("binary").alias("blob"))
    out = decode_features(blobs, "blob", "doc_id")
    assert out.rdd.getNumPartitions() == 7
