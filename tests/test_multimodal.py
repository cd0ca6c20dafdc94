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


def _copy_docs_with_dups(duck, tmp_path, n_dups=20, seed=3):
    """Copy sf0.001 documents and append n_dups byte-identical copies of
    existing rows under fresh doc_ids. Returns (sf_dir, planted_pairs)."""
    import os

    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as pq

    rows = duck.execute(
        "SELECT doc_id, text, lang, source, n_chars FROM documents ORDER BY doc_id"
    ).fetchall()
    ids = [r[0] for r in rows]
    rng = np.random.default_rng(seed)
    base = [ids[i] for i in rng.choice(len(ids), n_dups, replace=False)]
    next_id = max(ids) + 1
    out = list(rows)
    pairs = []
    by_id = {r[0]: r for r in rows}
    for k, b in enumerate(base):
        r = by_id[b]
        out.append((next_id + k, r[1], r[2], r[3], r[4]))
        pairs.append((b, next_id + k))
    sf_dir = os.path.join(str(tmp_path), "imgdups")
    os.makedirs(sf_dir, exist_ok=True)
    pq.write_table(
        pa.table(
            {
                "doc_id": pa.array([r[0] for r in out], pa.int64()),
                "text": pa.array([r[1] for r in out]),
                "lang": pa.array([r[2] for r in out]),
                "source": pa.array([r[3] for r in out]),
                "n_chars": pa.array([r[4] for r in out], pa.int64()),
            }
        ),
        os.path.join(sf_dir, "documents.parquet"),
    )
    return sf_dir, pairs


def test_image_near_dup_planted_recall(spark, duck, tmp_path):
    """Planted byte-identical blobs decode to identical features -> cosine
    1.0 -> identical LSH signatures -> every band matches: banded recall
    on planted duplicates must be EXACTLY 1.0, with cos_sim 1.0."""
    from minibatch_spark.operators.multimodal import image_near_dup_pairs

    sf_dir, pairs = _copy_docs_with_dups(duck, tmp_path)
    got = {
        (r.vec_a, r.vec_b): r.cos_sim
        for r in image_near_dup_pairs(spark, sf_dir).collect()
    }
    for p in pairs:
        assert p in got, f"planted duplicate pair {p} missed"
        assert got[p] == 1.0


def test_image_near_dup_matches_numpy_bruteforce(spark, duck):
    """Exactness on the natural corpus: every reported pair is a true
    >= -threshold pair (precision exact — the verify stage is exact
    cosine), and banded recall vs brute force >= 0.9 at the 0.95
    operating threshold (per-plane agreement ~0.9 -> 8x4-bit banding
    ~0.999 predicted)."""
    import hashlib

    import numpy as np

    from minibatch_spark.operators.multimodal import (
        IMAGE_NEAR_DUP_THRESHOLD,
        image_near_dup_pairs,
    )

    rows = duck.execute("SELECT doc_id, text FROM documents ORDER BY doc_id").fetchall()
    ids = [r[0] for r in rows]
    V = np.stack(
        [
            np.array(
                [b / 255.0 for b in hashlib.md5(t.encode()).digest()[2:10]]
            )
            - 0.5
            for _, t in rows
        ]
    )
    Vn = V / np.linalg.norm(V, axis=1, keepdims=True)
    C = np.round(Vn @ Vn.T, 6)
    truth = {
        (ids[i], ids[j])
        for i in range(len(ids))
        for j in range(i + 1, len(ids))
        if C[i, j] >= IMAGE_NEAR_DUP_THRESHOLD
    }
    got = {
        (r.vec_a, r.vec_b)
        for r in image_near_dup_pairs(spark, SF_SMOKE).collect()
    }
    assert got <= truth  # exact precision
    if truth:
        assert len(truth & got) / len(truth) >= 0.9
