#!/usr/bin/env python
"""Clustered embeddings corpus generator — the PRODUCTION regime the
driver's near-isotropic testdata cannot measure (round-6 verdict, missing
item #1).

Real embedding corpora (sentence/image encoders) are clustered with a
decaying per-dimension energy spectrum. The driver-generated embeddings
table is unit-norm isotropic Gaussian noise: pairwise cosine concentrates
at ~N(0, 1/sqrt(dim)), so every random hyperplane bit is an independent
coin flip between any pair and banded LSH provably cannot prune (the
measured 51%-of-all-pairs candidate rate behind the scale audit's
`output_bound` adjudication of emb_near_dup_pairs). This generator
produces the structured regime every recall/pruning claim is about —
from public knowledge only:

- **mixture of k Gaussians**: unit-norm random centers; within-cluster
  noise with total energy sigma^2 << 1, so same-cluster cosine ~
  1/(1+sigma^2) (~0.9 at the default) while cross-cluster cosine stays
  low — the separation LSH banding exploits;
- **decaying spectrum** (Matryoshka-style front-loading, Kusupati et al.
  2022, arXiv:2205.13147): per-dim scale (d+1)^-alpha applied to centers
  AND noise, so the leading dims carry most energy and a 64->16
  truncation keeps norm_frac well above the sqrt(16/64)=0.5 isotropic
  floor;
- **planted near-dup pairs** at an exact target cosine (default 0.99 —
  the semantic-dedup regime): v' = cos*v + sin*u with u a seeded
  orthonormal direction, same construction as the planted-recall tests;
  ground truth persisted as planted_pairs.json beside the parquet;
- **schema parity** with testdata embeddings.parquet: vec_id int64,
  embedding list<float>, label int32 in 0..9 (= cluster id % 10, so the
  label-as-IVF-cell queries keep their cell count).

Deterministic (numpy PCG64). Usage:

    python tools/gen_clustered_emb.py 20000 /tmp/sparkdata/clust20k
"""

from __future__ import annotations

import json
import os
import sys

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

DIM = 64
ALPHA = 0.5  # spectrum decay exponent: scale_d = (d+1)^-ALPHA
SIGMA = 0.3  # total within-cluster noise L2 (fraction of the unit norm)
DUP_COS = 0.99  # planted near-dup target cosine
DUP_FRAC = 0.02  # fraction of rows that are planted near-dups
SEED = 7


def gen_clustered(
    n: int,
    dim: int = DIM,
    k: int | None = None,
    seed: int = SEED,
    alpha: float = ALPHA,
    sigma: float = SIGMA,
    dup_frac: float = DUP_FRAC,
    dup_cos: float = DUP_COS,
):
    """Returns (ids, V unit-norm float32 [n, dim], labels int32,
    planted_pairs [(src_id, dup_id)]). The last ``round(n*dup_frac)``
    ids are the planted near-dups of earlier rows."""
    rng = np.random.default_rng(seed)
    k = k or max(8, n // 200)
    spec = (np.arange(dim) + 1.0) ** -alpha
    centers = rng.standard_normal((k, dim)) * spec
    centers /= np.linalg.norm(centers, axis=1, keepdims=True)

    m = int(round(n * dup_frac))
    n_base = n - m
    assign = rng.integers(0, k, n_base)
    # noise energy sigma^2 total, distributed along the SAME spectrum as
    # the signal (a flat-spectrum noise would wash out the front-loading
    # the generator exists to produce)
    noise = rng.standard_normal((n_base, dim)) * (
        sigma * spec / np.sqrt((spec**2).sum())
    )
    V = centers[assign] + noise
    V /= np.linalg.norm(V, axis=1, keepdims=True)

    labels = (assign % 10).astype(np.int32)
    pairs: list[tuple[int, int]] = []
    dup_vecs = []
    dup_labels = []
    src_idx = rng.choice(n_base, size=m, replace=False) if m else np.array([], int)
    sin = float(np.sqrt(1.0 - dup_cos**2))
    for j, si in enumerate(src_idx):
        v = V[si]
        g = rng.standard_normal(dim)
        u = g - (g @ v) * v
        u /= np.linalg.norm(u)
        dup_vecs.append(dup_cos * v + sin * u)  # exact target cosine, unit norm
        dup_labels.append(labels[si])
        pairs.append((int(si), int(n_base + j)))

    if m:
        V = np.vstack([V, np.array(dup_vecs)])
        labels = np.concatenate([labels, np.array(dup_labels, np.int32)])
    ids = np.arange(n, dtype=np.int64)
    return ids, V.astype(np.float32), labels, pairs


def write_corpus(n: int, out_dir: str, **kw) -> str:
    ids, V, labels, pairs = gen_clustered(n, **kw)
    os.makedirs(out_dir, exist_ok=True)
    pq.write_table(
        pa.table(
            {
                "vec_id": pa.array(ids, pa.int64()),
                "embedding": pa.array(
                    [v.tolist() for v in V], pa.list_(pa.float32())
                ),
                "label": pa.array(labels, pa.int32()),
            }
        ),
        os.path.join(out_dir, "embeddings.parquet"),
    )
    with open(os.path.join(out_dir, "planted_pairs.json"), "w") as f:
        json.dump(pairs, f)
    # stderr: callers (clustered_audit) reserve stdout for one-line JSON
    print(
        f"embeddings: {len(ids)} rows, {len(pairs)} planted pairs -> {out_dir}",
        file=sys.stderr,
    )
    return out_dir


if __name__ == "__main__":
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 20_000
    out = sys.argv[2] if len(sys.argv) > 2 else f"/tmp/sparkdata/clust{n}"
    write_corpus(n, out)
