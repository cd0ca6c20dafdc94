"""Pins for the gate-registered clustered-regime queries
(operators/clustered.py): the oracle hash proves cross-engine equality;
these tests prove the GEOMETRY claims — planted-pair recall, banding
pruning, cascade and IVF recall vs brute force — the numbers quoted in
the module docstring."""

import numpy as np
import pytest

from tests.conftest import SF_CORRECT


@pytest.fixture(scope="module")
def cl_rows(spark):
    from minibatch_spark.operators.clustered import clustered_view

    rows = clustered_view(spark, SF_CORRECT).collect()
    ids = np.array([r.vec_id for r in rows])
    labels = np.array([r.label for r in rows])
    V = np.array([r.cv for r in rows], dtype=np.float64)
    order = np.argsort(ids)
    return ids[order], labels[order], V[order]


def _cos_matrix(V):
    n = V / np.linalg.norm(V, axis=1, keepdims=True)
    return n @ n.T


def test_clustered_geometry_and_planted_pairs(cl_rows):
    """The construction delivers the claimed regime: shrunk-shrunk
    same-cluster pairs ~0.996, shrunk-ordinary ~0.915, cross-cluster
    low — and the >= 0.95 pair set is dominated by same-cluster pairs."""
    from minibatch_spark.operators.clustered import CLUST_BUCKET

    ids, labels, V = cl_rows
    C = _cos_matrix(V)
    grp = ids // CLUST_BUCKET
    cluster = labels.astype(np.int64) * 10_000 + grp
    iu = np.triu_indices(len(ids), k=1)
    same = cluster[:, None] == cluster[None, :]
    hi = C[iu] >= 0.95
    assert hi.sum() > 50  # non-vacuous planted set
    # every >= 0.95 pair is same-cluster (cross-cluster never reaches it)
    assert bool(np.all(same[iu][hi]))
    # cross-cluster cosines stay below the threshold with margin (two
    # random centers can align up to ~0.71 on this draw — still 0.24
    # under the 0.95 bar)
    assert C[iu][~same[iu]].max() < 0.85


def test_registered_near_dup_pairs_recall_and_exactness(spark, cl_rows):
    """The registered banded query returns a SUBSET of the true >= 0.95
    pair set (banding can only lose candidates, the verify is exact) at
    recall >= 0.9, with cos_sim matching numpy to 6dp."""
    from minibatch_spark.operators.clustered import (
        emb_clustered_near_dup_pairs,
    )

    ids, labels, V = cl_rows
    C = _cos_matrix(V)
    idx = {v: i for i, v in enumerate(ids)}
    true_pairs = {
        (int(ids[i]), int(ids[j]))
        for i in range(len(ids))
        for j in range(i + 1, len(ids))
        if round(C[i, j], 6) >= 0.95
    }
    got = {
        (r.vec_a, r.vec_b): r.cos_sim
        for r in emb_clustered_near_dup_pairs(spark, SF_CORRECT).collect()
    }
    assert set(got) <= true_pairs  # exact verify: no false positives
    recall = len(got) / len(true_pairs)
    assert recall >= 0.9, recall
    for (a, b), cs in got.items():
        assert abs(cs - C[idx[a], idx[b]]) < 1e-5


def test_banding_prunes_on_clustered_corpus(cl_rows):
    """The candidate fraction of the 8x8 banding on the clustered corpus
    is far below the isotropic corpus's measured ~0.51 — the pruning the
    clustered regime exists to demonstrate, now attached to a GATE
    query's exact configuration."""
    from minibatch_spark.operators.clustered import (
        CLUST_BANDS,
        CLUST_BITS,
    )
    from minibatch_spark.operators.similarity import QUANT, sign_matrix

    ids, labels, V = cl_rows
    signs = sign_matrix(V.shape[1], CLUST_BANDS * CLUST_BITS)
    Q = np.floor(V * QUANT).astype(np.int64)
    bits = (Q @ signs.T) >= 0
    n = len(ids)
    cand = np.zeros((n, n), dtype=bool)
    for b in range(CLUST_BANDS):
        key = bits[:, b * CLUST_BITS : (b + 1) * CLUST_BITS]
        packed = key @ (1 << np.arange(CLUST_BITS))
        cand |= packed[:, None] == packed[None, :]
    iu = np.triu_indices(n, k=1)
    frac = cand[iu].mean()
    assert frac < 0.15, frac  # vs ~0.51 isotropic (emb_near_dup_pairs)


def test_cascade_clustered_equals_brute_force(spark, cl_rows):
    """On the front-loaded clustered corpus the 16-dim coarse pass +
    50-candidate exact rerank recovers the FULL brute-force top-10 —
    the converse of ann_cascade_topk's honest low-recall story on the
    random corpus."""
    from minibatch_spark.operators.clustered import (
        ann_cascade_topk_clustered,
    )

    ids, labels, V = cl_rows
    q = V[0]
    sims = np.round(
        (V @ q) / (np.linalg.norm(V, axis=1) * np.linalg.norm(q)), 6
    )
    rest = [(s, v) for s, v in zip(sims[1:], ids[1:])]
    brute = [v for _s, v in sorted(rest, key=lambda t: (-t[0], t[1]))[:10]]
    got = [
        r.vec_id
        for r in ann_cascade_topk_clustered(spark, SF_CORRECT)
        .orderBy("cos_sim", ascending=False)
        .collect()
    ]
    assert sorted(got) == sorted(brute)


def test_ivf_clustered_recall(spark, cl_rows):
    """nprobe=2 of 10 label cells finds >= 8 of the brute-force top-10:
    the query's own cluster lives inside its label cell, so the probe
    captures its true neighborhood — the measurement the isotropic
    ann_ivf_topk cannot make meaningful."""
    from minibatch_spark.operators.clustered import ann_ivf_topk_clustered

    ids, labels, V = cl_rows
    q = V[0]
    sims = np.round(
        (V @ q) / (np.linalg.norm(V, axis=1) * np.linalg.norm(q)), 6
    )
    rest = [(s, v) for s, v in zip(sims[1:], ids[1:])]
    brute = {v for _s, v in sorted(rest, key=lambda t: (-t[0], t[1]))[:10]}
    got = {
        r.vec_id
        for r in ann_ivf_topk_clustered(spark, SF_CORRECT).collect()
    }
    assert len(got & brute) >= 8, (got, brute)
