"""Empirical skew/scale stress for the dedup family (SCALE.md's claims,
proven by measurement instead of argument):

- a 10x corpus with a DELIBERATELY HOT shingle (one 6-word phrase shared by
  ~2000 documents) and a 1000-copy byte-identical duplicate cluster;
- wall-time must stay ~linear in corpus size (the pipelines are
  O(rows x bands) / prefix-bounded by design — a quadratic term would blow
  straight past the asserted ratio at 10x);
- no single LSH bucket may dominate: the exact-dup collapse must reduce
  the 1000-copy cluster to ONE banding participant, so the largest bucket
  stays near-singleton and no task inherits an O(cluster^2) pair blowup.

Marked slow (registered in pytest.ini); runs in the default suite.
"""

import time

import numpy as np
import pytest

from tests.conftest import SF_SMOKE

HOT_PHRASE = "common boilerplate header shared across documents"
N_VARIANTS = 4000
N_CLUSTER = 1000


def _stress_corpus(tmp_path, duck):
    """10x the sf0.001 documents corpus: 4000 seeded perturbed variants
    (every 3rd token tagged per-variant, so variant families sit right at
    the minhash threshold — realistic near-dup load), half carrying the
    hot phrase, plus a 1000-copy duplicate cluster."""
    import os

    import pyarrow as pa
    import pyarrow.parquet as pq

    rows = duck.execute("SELECT doc_id, text FROM documents ORDER BY doc_id").fetchall()
    base = [r[1] for r in rows]
    ids, texts = [], []
    next_id = 0
    for i in range(N_VARIANTS):
        toks = base[i % len(base)].split()
        # tag every 12th token: a replaced token voids the 3 shingles
        # containing it, leaving ~75% shingle overlap within a variant
        # family (Jaccard ~0.6, straddling the 0.5 minhash threshold)
        toks = [
            f"{t}_{i}" if j % 12 == 0 else t for j, t in enumerate(toks)
        ]
        if i % 2 == 0:
            toks += HOT_PHRASE.split()
        ids.append(next_id)
        texts.append(" ".join(toks))
        next_id += 1
    cluster_text = base[0]
    cluster_ids = []
    for _ in range(N_CLUSTER):
        ids.append(next_id)
        cluster_ids.append(next_id)
        texts.append(cluster_text)
        next_id += 1
    sf_dir = os.path.join(str(tmp_path), "stress10x")
    os.makedirs(sf_dir, exist_ok=True)
    pq.write_table(
        pa.table(
            {
                "doc_id": pa.array(ids, pa.int64()),
                "text": pa.array(texts, pa.string()),
                "n_chars": pa.array([len(t) for t in texts], pa.int32()),
            }
        ),
        os.path.join(sf_dir, "documents.parquet"),
    )
    return sf_dir, set(cluster_ids)


def _cold(spark):
    """Drop every cached stage so both timed runs pay the full pipeline."""
    from minibatch_spark.operators import dedup

    spark.catalog.clearCache()
    dedup._SHINGLE_TABLE_CACHE.clear()


@pytest.mark.slow
def test_minhash_scales_linearly_under_skew(spark, duck, tmp_path):
    from minibatch_spark.registry import all_queries

    q = all_queries()["dedup_minhash_pairs"]
    sf_dir, cluster_ids = _stress_corpus(tmp_path, duck)

    q(spark, SF_SMOKE).collect()  # JIT/codegen warmup, untimed
    _cold(spark)
    t0 = time.perf_counter()
    q(spark, SF_SMOKE).collect()
    t_base = time.perf_counter() - t0

    _cold(spark)
    t0 = time.perf_counter()
    pairs = q(spark, sf_dir).collect()
    t_stress = time.perf_counter() - t0

    # ~linear: 10x the documents (and a pathological cluster) may not cost
    # more than ~15x the 1x wall time (constant overheads inflate the 1x
    # denominator, so a healthy ratio lands WELL below 10)
    assert t_stress < t_base * 15, (t_base, t_stress)

    # the duplicate cluster collapsed before banding: no intra-cluster
    # pair can appear (only the min doc_id represents the cluster)
    intra = [
        r for r in pairs if r.doc_a in cluster_ids and r.doc_b in cluster_ids
    ]
    assert not intra
    # bounded output: variant families produce pairs, never a blowup
    assert 0 < len(pairs) < 200_000


@pytest.mark.slow
def test_no_dominant_lsh_bucket_after_collapse(spark, duck, tmp_path):
    """The skew defense itself: after exact-dup collapse the largest
    (band_id, band_key) bucket must stay tiny — bucket size bounds the
    within-bucket pair work a single task inherits."""
    from pyspark.sql import functions as F

    from minibatch_spark.operators.dedup import (
        N_BANDS,
        fast_minhash_sig,
        shingle_hashes,
        shingle_table,
    )

    sf_dir, _ = _stress_corpus(tmp_path, duck)
    _cold(spark)
    st = shingle_table(spark, sf_dir)
    reps = st.groupBy("text_hash").agg(
        F.min("doc_id").alias("doc_id"), F.min_by("sh", "doc_id").alias("sh")
    )
    sig_df = reps.select(
        "doc_id",
        fast_minhash_sig(shingle_hashes(F.col("sh")).alias("hs")).alias("sig"),
    )
    bands = sig_df.select(
        "doc_id",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(b).alias("band_id"),
                        F.md5(
                            F.concat_ws(
                                ",",
                                *[F.element_at("sig", b * 4 + j + 1) for j in range(4)],
                            )
                        ).alias("band_key"),
                    )
                    for b in range(N_BANDS)
                ]
            )
        ).alias("band"),
    ).select("doc_id", "band.band_id", "band.band_key")
    sizes = (
        bands.groupBy("band_id", "band_key").count().agg(F.max("count")).first()[0]
    )
    # 5000 docs, 1000 of them byte-identical: without collapse the hot
    # bucket holds >= 1000 rows (a ~500k-pair task); with collapse every
    # bucket holds only genuine near-dup family members
    assert sizes <= 64, sizes
