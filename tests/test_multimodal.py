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


def test_resize_aspect_ratio_and_bounds(spark):
    """Resized dims: max side == RESIZE_MAX_SIDE, aspect ratio preserved
    within integer truncation, never zero."""
    from minibatch_spark.operators.multimodal import RESIZE_MAX_SIDE
    from minibatch_spark.registry import all_queries

    rows = all_queries()["multimodal_resize_stub"](spark, SF_SMOKE).collect()
    assert rows
    for r in rows:
        # trunc(maxside * (M/maxside)) is M or M-1 (float product can land
        # just below the integer)
        assert RESIZE_MAX_SIDE - 1 <= max(r.out_w, r.out_h) <= RESIZE_MAX_SIDE
        assert r.out_w >= 1 and r.out_h >= 1
        # aspect preservation up to integer truncation: relative error of
        # floor(w*s)/floor(h*s) vs w/h is bounded by ~1/min(out dims)
        ratio, out_ratio = r.width / r.height, r.out_w / r.out_h
        tol = 1.5 / min(r.out_w, r.out_h)
        assert abs(out_ratio - ratio) / ratio <= tol


def test_frame_sample_stride_coverage(spark):
    """Per doc: at most FRAME_SAMPLE_MAX frames, always frame 0, uniform
    stride, all indices < n_frames."""
    import math
    from collections import defaultdict

    from minibatch_spark.operators.multimodal import FRAME_SAMPLE_MAX
    from minibatch_spark.registry import all_queries

    rows = all_queries()["multimodal_frame_sample"](spark, SF_SMOKE).collect()
    per_doc = defaultdict(list)
    for r in rows:
        per_doc[r.doc_id].append(r)
    assert per_doc
    for doc, rs in per_doc.items():
        n = rs[0].n_frames
        idxs = sorted(r.frame_idx for r in rs)
        stride = math.ceil(n / FRAME_SAMPLE_MAX)
        assert idxs == list(range(0, n, stride))
        assert len(idxs) <= FRAME_SAMPLE_MAX


def test_decode_features_custom_codec(spark):
    """decode_features(codec=...) runs the supplied codec inside the Arrow
    batch — proven with a marker codec whose output cannot come from the
    default stub. This pins the pluggable-codec contract without needing
    any image library."""
    from minibatch_spark.catalog import load_table
    from minibatch_spark.operators.multimodal import decode_features

    def marker_codec(blob: bytes):
        return len(blob), 7, [float(len(blob) % 10)] * 3

    d = load_table(spark, SF_SMOKE, "documents").limit(20)
    from pyspark.sql import functions as F

    blobs = d.select("doc_id", F.col("text").cast("binary").alias("blob"))
    rows = decode_features(blobs, "blob", "doc_id", codec=marker_codec).collect()
    assert len(rows) == 20
    for r in rows:
        assert r.height == 7 and r.width > 0
        assert r.features == [float(r.width % 10)] * 3


def test_decode_features_pil_codec(spark):
    """Real-image decode path: only runs where PIL is installed (not this
    container). Generates a tiny PNG in-memory, pushes it through the same
    mapInPandas pipeline with codec=pil_decode, and checks dims + feature
    vector semantics (channel means of a solid-color image)."""
    import pytest

    pytest.importorskip("PIL")
    import io

    from PIL import Image

    from minibatch_spark.operators.multimodal import FEATURE_DIM, pil_decode

    buf = io.BytesIO()
    Image.new("RGB", (10, 6), color=(255, 0, 0)).save(buf, format="PNG")
    png = buf.getvalue()

    rows = (
        spark.createDataFrame([(1, bytearray(png))], "doc_id long, blob binary")
        .transform(
            lambda df: __import__(
                "minibatch_spark.operators.multimodal", fromlist=["decode_features"]
            ).decode_features(df, "blob", "doc_id", codec=pil_decode)
        )
        .collect()
    )
    (r,) = rows
    assert (r.width, r.height) == (10, 6)
    assert len(r.features) == FEATURE_DIM
    assert abs(r.features[0] - 1.0) < 1e-9  # solid red: mean R == 1.0
    assert abs(r.features[1]) < 1e-9 and abs(r.features[2]) < 1e-9
