"""Similarity search over embedding columns (north-star scope; ABSENT in
the reference — it has no vector/array handling at all).

Embeddings are ``array<float>`` columns. Exact scoring (dot/norm/cosine)
runs as JVM higher-order functions (zip_with/aggregate) — no Python in the
scoring loop. Layers:

- brute-force cosine top-k: the exactness baseline. One broadcast of the
  query vector; linear scan, TakeOrdered k. Scales to 100 TB as a single
  pass with no shuffle.
- random-hyperplane LSH signatures: computed by a vectorized pandas UDF
  over a QUANTIZED INTEGER projection — ``floor(v * 2^20) @ signs`` in
  int64, which is exact and associative, so the signature is bit-identical
  across Spark/numpy/DuckDB regardless of summation order, AND the plan
  stays constant-size at any embedding dim (no dim x planes literal
  columns; the sign matrix ships once in the UDF closure).
- banded near-dup pairs: 8 bands x 4 bits of the 32-plane signature;
  candidates join per (band, key) bucket, then an exact cosine verify.
  Candidate cost is O(rows x bands) shuffle + within-bucket pairs — never
  an all-pairs cross join; band width sizes bucket occupancy (BAND_BITS).
"""

from __future__ import annotations

import hashlib

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf

from minibatch_spark.catalog import load_table, spread, stage
from minibatch_spark.registry import query

N_PLANES = 32
QUANT = 1 << 20  # fixed-point scale for exact integer projections
NEAR_DUP_BANDS = 8  # bands over the signature; band width = N_PLANES/bands
BAND_BITS = N_PLANES // NEAR_DUP_BANDS  # 4 bits -> 16 buckets per band.
# Round-4 scale fix: 16 planes / 2-bit bands gave only 4 buckets per
# band, so each band bucket held n/4 of the corpus and candidate pairs
# grew QUADRATICALLY (measured 17x wall for 10x vectors at sf1 — the
# full-registry scale audit caught it). 4-bit bands cut per-band bucket
# occupancy to ~n/16 (16x fewer candidate pairs) while planted-pair
# recall stays >= 0.99 at cosine 0.95 (per-plane agreement p = 1 - θ/π
# ≈ 0.9 -> band match p^4 ≈ 0.66 -> 8 bands 1-(1-0.66)^8 ≈ 0.999).
# At larger corpora scale bands/bits with n (more planes, wider bands);
# both engines replay the banding, so the oracle tracks any setting.
NEAR_DUP_THRESHOLD = 0.4  # the corpus has no planted near-dups; 0.4 is the
#                           top of its natural cosine distribution (~60
#                           pairs at sf0.01), so the verify stage is
#                           non-vacuous at test scale


def as_double(c: str | Column) -> Column:
    c = F.col(c) if isinstance(c, str) else c
    return F.transform(c, lambda x: x.cast("double"))


def dot(a: Column, b: Column) -> Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0), lambda acc, x: acc + x
    )


def l2norm(a: Column) -> Column:
    return F.sqrt(F.aggregate(a, F.lit(0.0), lambda acc, x: acc + x * x))


def cosine(a: Column, b: Column) -> Column:
    return dot(a, b) / (l2norm(a) * l2norm(b))


@query(
    "emb_norms",
    oracle="""
    SELECT vec_id, label,
           CAST(len(embedding) AS INTEGER) AS dim,
           ROUND(sqrt(list_sum(list_transform(
             CAST(embedding AS DOUBLE[]), x -> x * x))), 6) AS l2_norm
    FROM embeddings
    """,
)
def emb_norms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Vector plumbing smoke: per-row dimensionality and L2 norm."""
    e = spread(load_table(spark, sf_dir, "embeddings"))
    v = as_double("embedding")
    return e.select(
        "vec_id",
        "label",
        F.size("embedding").alias("dim"),
        F.round(l2norm(v), 6).alias("l2_norm"),
    )


@query(
    "emb_label_centroids",
    oracle="""
    WITH expanded AS (
      SELECT label,
             unnest(generate_series(1, len(embedding))) AS dim,
             unnest(CAST(embedding AS DOUBLE[])) AS val
      FROM embeddings
    )
    SELECT label, CAST(dim AS INTEGER) AS dim,
           ROUND(SUM(val) / COUNT(*), 6) AS centroid
    FROM expanded
    GROUP BY label, dim
    """,
)
def emb_label_centroids(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-label centroid components: posexplode -> (label, dim) agg.
    The kmeans-style building block; shuffle keyed on (label, dim)."""
    e = spread(load_table(spark, sf_dir, "embeddings"))
    return (
        e.select("label", F.posexplode(as_double("embedding")).alias("pos", "val"))
        .groupBy("label", (F.col("pos") + 1).cast("int").alias("dim"))
        .agg(F.round(F.sum("val") / F.count(F.lit(1)), 6).alias("centroid"))
    )


@query(
    "ann_topk_bruteforce",
    oracle="""
    WITH q AS (
      SELECT CAST(embedding AS DOUBLE[]) AS qv
      FROM embeddings ORDER BY vec_id LIMIT 1
    )
    SELECT e.vec_id, e.label,
           ROUND(list_cosine_similarity(CAST(e.embedding AS DOUBLE[]), q.qv), 6)
             AS cos_sim
    FROM embeddings e, q
    WHERE e.vec_id <> (SELECT MIN(vec_id) FROM embeddings)
    ORDER BY cos_sim DESC, e.vec_id
    LIMIT 10
    """,
)
def ann_topk_bruteforce(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact cosine top-10 for a fixed query vector (lowest vec_id).

    The query vector is collected once (1 row) and inlined as a literal —
    the classic broadcast-the-query pattern; the scan stays a single
    shuffle-free pass ending in TakeOrderedAndProject."""
    e = spread(load_table(spark, sf_dir, "embeddings"))
    qrow = e.orderBy("vec_id").select("vec_id", "embedding").first()
    if qrow is None:  # empty corpus -> empty result, typed (no crash)
        return spark.createDataFrame([], "vec_id long, label int, cos_sim double")
    qv = F.array(*[F.lit(float(x)) for x in qrow.embedding])
    sim = F.round(cosine(as_double("embedding"), qv), 6)
    return (
        e.filter(F.col("vec_id") != qrow.vec_id)
        .select("vec_id", "label", sim.alias("cos_sim"))
        .orderBy(F.desc("cos_sim"), F.asc("vec_id"))
        .limit(10)
    )


# ---------------------------------------------------------------------------
# Random-hyperplane LSH over quantized integer projections
# ---------------------------------------------------------------------------


def sign_matrix(dim: int, n_planes: int = N_PLANES) -> np.ndarray:
    """Pseudo-random Rademacher (+1/-1) plane weights derived from
    md5(plane:dim) — deterministic across runs, engines, and cluster
    topology; no RNG state to ship."""
    return np.array(
        [
            [
                1
                if int(hashlib.md5(f"{p}:{d}".encode()).hexdigest()[:8], 16) % 2 == 0
                else -1
                for d in range(dim)
            ]
            for p in range(n_planes)
        ],
        dtype=np.int64,
    )


def signature_udf(dim: int, n_planes: int = N_PLANES):
    """Vectorized pandas UDF: embedding -> n_planes-char sign bitstring.

    The projection is computed in int64 fixed point: q = floor(v * 2^20),
    proj = q @ signs.T. Integer addition is associative, so the result is
    independent of summation order — the property that lets the DuckDB
    oracle (sequential list_sum) reproduce a numpy matmul bit-for-bit.
    The sign matrix rides in the UDF closure (n_planes x dim int64 —
    0.5 MB even at dim 4096), NOT as per-element plan literals: the plan
    stays constant-size at any embedding dim."""
    signs = sign_matrix(dim, n_planes)

    @pandas_udf("string")
    def sig(emb: pd.Series) -> pd.Series:
        V = np.stack([np.asarray(v, dtype=np.float64) for v in emb])
        Q = np.floor(V * QUANT).astype(np.int64)
        bits = (Q @ signs.T) >= 0
        return pd.Series(["".join("1" if b else "0" for b in row) for row in bits])

    return sig


def _bucket_sql_expr(n_planes: int = N_PLANES, col: str = "embedding") -> str:
    """DuckDB expression reproducing signature_udf from raw md5 arithmetic
    over any array column ``col`` (embeddings or decoded image features)."""
    projs = []
    for p in range(n_planes):
        proj = f"""CAST(list_sum(list_transform(generate_series(1, len({col})),
          d -> CAST(floor(CAST({col}[d] AS DOUBLE) * {QUANT}.0) AS BIGINT)
               * (CASE WHEN CAST(('0x' || substring(md5('{p}:' || CAST(d - 1 AS VARCHAR)), 1, 8)) AS BIGINT) % 2 = 0
                  THEN 1 ELSE -1 END))) AS BIGINT)"""
        projs.append(f"(CASE WHEN {proj} >= 0 THEN '1' ELSE '0' END)")
    return "CONCAT(" + ",\n      ".join(projs) + ")"


@query(
    "ann_lsh_buckets",
    oracle=f"""
    SELECT vec_id, label,
      {_bucket_sql_expr()} AS bucket
    FROM embeddings
    """,
)
def ann_lsh_buckets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Random-hyperplane LSH bucket assignment (N_PLANES -> sign-bit
    signature string). Bucketing the corpus by signature (or bands of it) turns
    kNN into a per-bucket search: candidate generation is a bucket-key
    join, never a cross join. Fully hash-checked against the oracle —
    the quantized integer projection is engine-independent; recall vs
    ann_topk_bruteforce is additionally pinned in tests/test_similarity.py.
    """
    e = spread(load_table(spark, sf_dir, "embeddings"))
    head = e.select("embedding").first()
    if head is None:  # empty corpus -> empty result, typed (no crash)
        return spark.createDataFrame([], "vec_id long, label int, bucket string")
    sig = signature_udf(len(head.embedding))
    return e.select("vec_id", "label", sig("embedding").alias("bucket"))


@query(
    "emb_near_dup_pairs",
    oracle=f"""
    WITH sig AS (
      SELECT vec_id, CAST(embedding AS DOUBLE[]) AS ve,
        {_bucket_sql_expr()} AS bucket
      FROM embeddings
    ), bands AS (
      SELECT vec_id, ve, b.b AS band_id,
             substring(bucket, b.b * {BAND_BITS} + 1, {BAND_BITS}) AS band_key
      FROM sig CROSS JOIN (SELECT unnest(generate_series(0, {NEAR_DUP_BANDS - 1})) AS b) b
    ), cand AS (
      SELECT DISTINCT a.vec_id AS vec_a, b.vec_id AS vec_b
      FROM bands a JOIN bands b
        ON a.band_id = b.band_id AND a.band_key = b.band_key
       AND a.vec_id < b.vec_id
    )
    SELECT c.vec_a, c.vec_b,
           ROUND(list_cosine_similarity(sa.ve, sb.ve), 6) AS cos_sim
    FROM cand c
    JOIN sig sa ON sa.vec_id = c.vec_a
    JOIN sig sb ON sb.vec_id = c.vec_b
    WHERE ROUND(list_cosine_similarity(sa.ve, sb.ve), 6) >= {NEAR_DUP_THRESHOLD}
    """,
)
def emb_near_dup_pairs(
    spark: SparkSession,
    sf_dir: str,
    n_bands: int = NEAR_DUP_BANDS,
    band_bits: int = BAND_BITS,
    threshold: float = NEAR_DUP_THRESHOLD,
) -> DataFrame:
    """Embedding near-dup pairs: banded LSH candidates + exact cosine verify.

    The 32-bit signature splits into ``n_bands`` bands of ``band_bits``
    bits (defaults 8 x 4); a pair is a candidate if ANY band matches
    (multi-probe by banding, vs a single exact-match bucket whose recall
    collapses). Candidates join per (band_id, band_key) bucket; the exact
    cosine verify joins candidates back to the staged signature table on
    vec_id (AQE broadcasts the small side at test scale; at 100 TB both
    joins shuffle on their keys — no cross join anywhere).

    RECALL vs OCCUPANCY is the banding dial, and it is CALLER-VISIBLE:
    the default 4-bit bands target the production near-dup regime —
    planted-pair recall >= 0.9 pinned at cosine 0.95/0.99
    (tests/test_similarity.py) — and give only ~0.6 recall at the
    low-contrast cosine-0.4 regime (the round-4 retune traded that
    recall for a 16x candidate-pair cut; the old 2-bit bands had ~1.0
    recall there and a measured quadratic candidate blowup). Callers
    targeting low-cosine thresholds should pass wider nets explicitly,
    e.g. ``n_bands=16, band_bits=2``. Fully hash-checked at the default
    banding: the oracle replays banding AND verify.

    SCALING LIMIT (measured, honest): pair ENUMERATION is only sub-
    quadratic when the corpus is clustered enough for bands to prune. On
    a near-isotropic corpus (this testdata: pairwise cosine
    ~N(0, 1/sqrt(dim)), near-orthogonal vectors agree with each random
    hyperplane w.p. 1/2) the 8x4 banding emits ~51% of ALL pairs as
    candidates at ANY threshold — measured 0.513 of n(n-1)/2 at both
    n=2000 and n=20000, the round-5 scale-audit 16x flag. That regime is
    inherent to enumeration, not a plan defect; pipelines that need a
    bounded answer on such corpora should use ``emb_near_dup_topk``
    (cell-bounded k best neighbors per vector — linear by construction).

    On a CLUSTERED corpus (the production regime — tools/
    gen_clustered_emb.py) enumeration IS sub-quadratic with a wide
    banding: the signature lengthens to n_bands*band_bits planes, so
    ``n_bands=6, band_bits=16, threshold=0.95`` measures near-linear
    candidate growth at planted recall 0.975 (see
    banded_near_dup_pairs and tests/test_clustered_regime.py).
    """
    e = spread(load_table(spark, sf_dir, "embeddings"))
    head = e.select("embedding").first()
    if head is None:  # empty corpus -> empty result, typed (no crash)
        return spark.createDataFrame([], "vec_a long, vec_b long, cos_sim double")
    return banded_near_dup_pairs(
        e.select("vec_id", as_double("embedding").alias("v")),
        dim=len(head.embedding),
        n_bands=n_bands,
        band_bits=band_bits,
        threshold=threshold,
        stage_name="neardup-sig",
    )


def banded_near_dup_pairs(
    vec_df: DataFrame,
    dim: int,
    n_bands: int = NEAR_DUP_BANDS,
    band_bits: int = BAND_BITS,
    threshold: float = NEAR_DUP_THRESHOLD,
    stage_name: str = "neardup-sig",
) -> DataFrame:
    """The banded-LSH + exact-cosine-verify core shared by
    ``emb_near_dup_pairs`` (embedding corpora) and the multimodal bridge
    (decoded image features): ``vec_df`` is (vec_id, v array<double>);
    returns (vec_a, vec_b, cos_sim) with cos_sim >= threshold. Same plan
    shape as documented on emb_near_dup_pairs — per-(band, key) candidate
    join, verify joins on vec_id, no cross join anywhere.

    The signature is exactly ``n_bands * band_bits`` planes (defaults
    8x4 = the 32-plane registered config, bit-identical to before), so
    WIDE bandings are first-class: high-threshold dedup on a CLUSTERED
    corpus wants long bands (e.g. ``n_bands=6, band_bits=16`` — 96
    planes), where a 16-bit band collides w.p. ~p^16 (p = 1 - angle/pi):
    near-1 for planted dups at cosine 0.99 but ~1e-4 for cross-cluster
    pairs. Measured on the gen_clustered_emb corpus: candidate count
    grows 12.6x for 10x data (near-linear; fraction of all pairs drops
    0.060 -> 0.0076 from n=2k to n=20k) at planted recall 0.975 — the
    pruning regime the near-isotropic testdata cannot exhibit
    (tests/test_clustered_regime.py, SCALE_AUDIT_CLUSTERED artifacts)."""
    sig = signature_udf(dim, n_planes=n_bands * band_bits)
    spark = vec_df.sparkSession
    v_df = stage(
        vec_df.select("vec_id", "v", sig("v").alias("bucket")), stage_name
    )
    bands = v_df.select(
        "vec_id",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(b).alias("band_id"),
                        F.substring("bucket", b * band_bits + 1, band_bits).alias("band_key"),
                    )
                    for b in range(n_bands)
                ]
            )
        ).alias("band"),
    ).select("vec_id", "band.band_id", "band.band_key")
    a, b = bands.alias("a"), bands.alias("b")
    cand = (
        a.join(
            b,
            (F.col("a.band_id") == F.col("b.band_id"))
            & (F.col("a.band_key") == F.col("b.band_key"))
            & (F.col("a.vec_id") < F.col("b.vec_id")),
        )
        .select(F.col("a.vec_id").alias("vec_a"), F.col("b.vec_id").alias("vec_b"))
        .dropDuplicates(["vec_a", "vec_b"])
    )
    va = v_df.select(F.col("vec_id").alias("vec_a"), F.col("v").alias("v_a"))
    vb = v_df.select(F.col("vec_id").alias("vec_b"), F.col("v").alias("v_b"))
    sim = F.round(cosine(F.col("v_a"), F.col("v_b")), 6)
    # cos_sim behind an explode(array(..)) Generate barrier (r11):
    # filter pushdown substitutes the alias and evaluated the full-dim
    # cosine TWICE per candidate row (join condition + output); behind
    # the barrier it runs once and the filter reads the attribute.
    return (
        cand.join(va, "vec_a")
        .join(vb, "vec_b")
        .select("vec_a", "vec_b", F.explode(F.array(sim)).alias("cos_sim"))
        .filter(F.col("cos_sim") >= threshold)
    )


IVF_NPROBE = 3  # coarse cells searched per query


@query(
    "ann_ivf_topk",
    oracle=f"""
    WITH q AS (
      SELECT CAST(embedding AS DOUBLE[]) AS qv
      FROM embeddings ORDER BY vec_id LIMIT 1
    ), cexp AS (
      SELECT label,
             unnest(generate_series(1, len(embedding))) AS dim,
             unnest(CAST(embedding AS DOUBLE[])) AS val
      FROM embeddings
    ), cent AS (
      SELECT label, list(ROUND(avg_val, 6) ORDER BY dim) AS cv
      FROM (SELECT label, dim, SUM(val) / COUNT(*) AS avg_val
            FROM cexp GROUP BY label, dim)
      GROUP BY label
    ), probes AS (
      SELECT label FROM cent, q
      ORDER BY ROUND(list_cosine_similarity(cv, qv), 6) DESC, label
      LIMIT {IVF_NPROBE}
    )
    SELECT e.vec_id, e.label,
           ROUND(list_cosine_similarity(CAST(e.embedding AS DOUBLE[]), q.qv), 6)
             AS cos_sim
    FROM embeddings e, q
    WHERE e.label IN (SELECT label FROM probes)
      AND e.vec_id <> (SELECT MIN(vec_id) FROM embeddings)
    ORDER BY cos_sim DESC, e.vec_id
    LIMIT 10
    """,
)
def ann_ivf_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF (inverted-file) ANN — the coarse-quantizer scale path next to
    the LSH one: label centroids act as the cell centroids, the query
    probes its IVF_NPROBE nearest cells, and only vectors in those cells
    are scored. At 100 TB the corpus is partitioned (bucketed) by cell id,
    so a probe reads nprobe/ncells of the data — partition pruning does
    the candidate cut, no per-row index needed.

    Centroid components are rounded to 6dp on BOTH engines before the
    probe ranking, so cell selection is deterministic cross-engine; the
    within-cell scoring is the same rounded-cosine TakeOrdered as the
    brute-force baseline."""
    import numpy as np

    e = spread(load_table(spark, sf_dir, "embeddings"))
    qrow = e.orderBy("vec_id").select("vec_id", "embedding").first()
    if qrow is None:  # empty corpus -> empty result, typed (no crash)
        return spark.createDataFrame([], "vec_id long, label int, cos_sim double")
    qv_np = np.asarray(qrow.embedding, dtype=np.float64)

    cent_rows = (
        e.select("label", F.posexplode(as_double("embedding")).alias("pos", "val"))
        .groupBy("label", "pos")
        .agg(F.round(F.sum("val") / F.count(F.lit(1)), 6).alias("c"))
        .collect()
    )
    by_label: dict = {}
    for r in cent_rows:
        by_label.setdefault(r.label, {})[r.pos] = r.c
    def cos(c: dict) -> float:
        cv = np.array([c[i] for i in sorted(c)])
        return round(float(cv @ qv_np / (np.linalg.norm(cv) * np.linalg.norm(qv_np))), 6)
    probes = [
        lbl for lbl, _ in sorted(
            ((lbl, cos(c)) for lbl, c in by_label.items()),
            key=lambda t: (-t[1], t[0]),
        )[:IVF_NPROBE]
    ]

    qv = F.array(*[F.lit(float(x)) for x in qrow.embedding])
    sim = F.round(cosine(as_double("embedding"), qv), 6)
    return (
        e.filter(F.col("label").isin(probes) & (F.col("vec_id") != qrow.vec_id))
        .select("vec_id", "label", sim.alias("cos_sim"))
        .orderBy(F.desc("cos_sim"), F.asc("vec_id"))
        .limit(10)
    )


@query(
    "ann_topk_batch",
    oracle="""
    WITH q AS (
      SELECT vec_id AS query_id, CAST(embedding AS DOUBLE[]) AS qv
      FROM embeddings ORDER BY vec_id LIMIT 8
    ), scored AS (
      SELECT q.query_id, e.vec_id,
             ROUND(list_cosine_similarity(CAST(e.embedding AS DOUBLE[]), q.qv), 6)
               AS cos_sim
      FROM embeddings e, q
      WHERE e.vec_id <> q.query_id
    ), ranked AS (
      SELECT query_id, vec_id, cos_sim,
             ROW_NUMBER() OVER (PARTITION BY query_id
                                ORDER BY cos_sim DESC, vec_id) AS rk
      FROM scored
    )
    SELECT query_id, vec_id, cos_sim, CAST(rk AS BIGINT) AS rk
    FROM ranked WHERE rk <= 5
    """,
)
def ann_topk_batch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BATCHED exact top-k: 5 nearest neighbors for EACH of 8 query
    vectors in one corpus pass — the batch-inference shape (N queries
    arrive together; scanning the corpus once per query would be N full
    scans).

    Plan: broadcast the query batch (tiny) against the corpus — a
    BroadcastNestedLoopJoin producing corpus x 8 scored rows map-side, no
    corpus shuffle — then per-query row_number with rk <= 5, which compiles
    to WindowGroupLimit: each partition forwards at most 5 rows per query
    to the single (8 x 5)-row shuffle. At 100 TB the corpus is read ONCE
    and the wire carries only per-partition top-k candidates."""
    from pyspark.sql import Window

    e = spread(load_table(spark, sf_dir, "embeddings"))
    q = (
        e.orderBy("vec_id")
        .limit(8)
        .select(F.col("vec_id").alias("query_id"), F.col("embedding").alias("qe"))
    )
    scored = e.join(
        F.broadcast(q), F.col("vec_id") != F.col("query_id")
    ).select(
        "query_id",
        "vec_id",
        F.round(cosine(as_double("embedding"), as_double("qe")), 6).alias("cos_sim"),
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cos_sim"), F.asc("vec_id"))
    return (
        scored.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= 5)
        .select("query_id", "vec_id", "cos_sim", F.col("rk").cast("long").alias("rk"))
    )


@query(
    "emb_quantize_int8",
    oracle="""
    WITH v AS (
      SELECT vec_id, label, CAST(embedding AS DOUBLE[]) AS e
      FROM embeddings
    ), scaled AS (
      SELECT vec_id, label,
             list_max(list_transform(e, x -> abs(x))) AS qscale,
             e
      FROM v
    )
    SELECT vec_id, label,
           ROUND(qscale, 6) AS qscale,
           CAST(list_sum(list_transform(e, x -> floor(x * 127.0 / qscale + 0.5)))
                AS BIGINT) AS code_sum,
           CAST(list_min(list_transform(e, x -> floor(x * 127.0 / qscale + 0.5)))
                AS BIGINT) AS code_min,
           CAST(list_max(list_transform(e, x -> floor(x * 127.0 / qscale + 0.5)))
                AS BIGINT) AS code_max
    FROM scaled
    WHERE qscale > 0
    """,
)
def emb_quantize_int8(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Symmetric int8 quantization of the embedding column — the 4x
    memory/bandwidth reduction every at-scale ANN index applies before
    building (scale = max|x|, code = floor(x*127/scale + 0.5)).

    Codes are pure per-row column math (no shuffle, no UDF); the output
    surfaces the scale plus code-sum/min/max digests instead of the
    array itself (driver canonicalizer rejects array columns). Exactness
    across engines is integer-hard: x*127/scale and the +0.5 floor are
    the same IEEE doubles in Spark and DuckDB, so every code — and
    their sum — matches bit-for-bit, no rounding contract needed.
    Cites reference scope: the reference has no vector ops at all
    (SURVEY §2.12 — north-star addition)."""
    e = spread(load_table(spark, sf_dir, "embeddings"))
    v = as_double("embedding")
    staged = e.select("vec_id", "label", v.alias("e")).withColumn(
        "qscale", F.array_max(F.transform(F.col("e"), lambda x: F.abs(x)))
    ).filter(F.col("qscale") > 0)
    codes = F.transform(
        F.col("e"), lambda x: F.floor(x * 127.0 / F.col("qscale") + 0.5)
    )
    staged = staged.withColumn("codes", codes)
    return staged.select(
        "vec_id",
        "label",
        F.round("qscale", 6).alias("qscale"),
        F.aggregate(F.col("codes"), F.lit(0).cast("long"), lambda a, x: a + x)
        .alias("code_sum"),
        F.array_min("codes").cast("long").alias("code_min"),
        F.array_max("codes").cast("long").alias("code_max"),
    )


SEM_DEDUP_THRESHOLD = 0.3  # the synthetic corpus has no planted
#                            near-identical pairs; 0.3 sits at the ~99th
#                            percentile of its within-cell cosine
#                            distribution so the drop set is non-vacuous
#                            at test scale. Real corpora use ~0.95+.
PQ_TRAIN_SAMPLE = 512  # codebook/quantizer training sample (driver-side
#                        bound; defined up here because the trained-SemDeDup
#                        oracle builder reads it at import time)
SEM_CELL_TARGET = 50  # target vectors per cell: k = ceil(n / target), so
#                       CELL COUNT SCALES WITH THE CORPUS and the per-cell
#                       quadratic stays O(n * target) = linear total work.
#                       50 keeps cells statistically meaningful at the
#                       sf0.01 gate (200 vectors -> 4 cells); production
#                       SemDeDup uses ~1e3-1e4.


def _d2(a: Column, b: Column) -> Column:
    """Squared L2 distance between two double arrays, summed SEQUENTIALLY
    in index order — the same order DuckDB's list_sum uses, so the result
    is bit-identical cross-engine (no rounding contract needed before the
    final ROUND for argmin stability)."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: (x - y) * (x - y)),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def _assign_cells(e_df: DataFrame, cents_df: DataFrame) -> DataFrame:
    """Nearest-centroid assignment: broadcast the (cid, cv) centroid table
    against the corpus, score ROUND(d2, 6), argmin with ties to the lowest
    cid (min_by on the (d2, cid) struct — lexicographic, deterministic).
    The broadcast replicates centroids map-side, min_by partial-aggregates
    per vec_id before the exchange, so the shuffle carries O(n) rows, not
    O(n x k)."""
    scored = e_df.crossJoin(F.broadcast(cents_df)).select(
        "vec_id", "cid", F.round(_d2(F.col("ve"), F.col("cv")), 6).alias("d2")
    )
    return scored.groupBy("vec_id").agg(
        F.min_by("cid", F.struct(F.col("d2"), F.col("cid"))).alias("cell")
    )


def _probe_cells(e_df: DataFrame, cents_df: DataFrame, nprobe: int) -> DataFrame:
    """Each vector's ``nprobe`` nearest cells — the IVF multi-probe
    assignment (vs _assign_cells' single home cell). Scoring is the same
    broadcast pass; the top-nprobe pick is collect_list + array_sort +
    slice on (d2, cid) structs, which partial-aggregates map-side (the
    broadcast crossJoin co-locates all k scores of a vec_id in one
    partition) — the exchange carries n bounded k-entry states. At
    extreme n (k in the millions) probing goes hierarchical with the
    assignment, per the emb_semantic_dedup docstring. Ties break
    lexicographically on (d2, cid), matching the oracle's
    ROW_NUMBER() ... ORDER BY d2, cid.

    Returns (vec_id, cell, prb) with prb the 1-based probe rank — prb=1
    IS the home cell, so callers needing both home and probe assignments
    score the corpus ONCE."""
    scored = e_df.crossJoin(F.broadcast(cents_df)).select(
        "vec_id", "cid", F.round(_d2(F.col("ve"), F.col("cv")), 6).alias("d2")
    )
    probes = scored.groupBy("vec_id").agg(
        F.slice(
            F.array_sort(F.collect_list(F.struct("d2", "cid"))), 1, nprobe
        ).alias("ps")
    )
    return probes.select("vec_id", F.posexplode("ps").alias("pos", "p")).select(
        "vec_id", F.col("p.cid").alias("cell"), (F.col("pos") + 1).alias("prb")
    )


def _within_cell_dedup(cells: DataFrame, threshold: float) -> DataFrame:
    """The SemDeDup within-cell pass over a staged (vec_id, cell, ve)
    frame: self-join ON THE CELL ID ONLY (one shuffle, no cross-cell
    pairs), drop the larger-id member of any pair with cosine >=
    threshold — the deterministic keep-the-smallest-id greedy transitive
    prune (chains A~B, B~C drop both B and C even when A!~C)."""
    a, b = cells.alias("a"), cells.alias("b")
    drops = (
        a.join(
            b,
            (F.col("a.cell") == F.col("b.cell"))
            & (F.col("a.vec_id") < F.col("b.vec_id")),
        )
        .filter(
            F.round(cosine(F.col("a.ve"), F.col("b.ve")), 6) >= F.lit(threshold)
        )
        .select(F.col("b.vec_id").alias("vec_id"))
        .distinct()
        .withColumn("dropped", F.lit(1))
    )
    return cells.join(drops, "vec_id", "left").select(
        "vec_id",
        F.col("cell").cast("int").alias("cell"),
        F.when(F.col("dropped").isNull(), F.lit(1)).otherwise(F.lit(0)).alias("keep"),
    )


_SEM_D2_SQL = """ROUND(list_sum(list_transform(generate_series(1, len(e.ve)),
           i -> (e.ve[i] - c.cv[i]) * (e.ve[i] - c.cv[i]))), 6)"""


def _sem_cells_sql(cell_target: int = SEM_CELL_TARGET) -> str:
    """The WITH-clause prefix replaying the corpus-scaled coarse-cell
    pipeline (deterministic lowest-vec_id seed + one distributed Lloyd
    refinement) up to ``cells (vec_id, cell, ve)`` — shared by the
    emb_semantic_dedup and emb_near_dup_topk oracles so both hash-check
    the ENTIRE pipeline including the clustering."""
    return f"""e AS (
      SELECT vec_id, CAST(embedding AS DOUBLE[]) AS ve FROM embeddings
    ), kk AS (
      SELECT CAST(ceil(COUNT(*) / {cell_target}.0) AS BIGINT) AS k FROM e
    ), c0 AS (
      SELECT CAST(ROW_NUMBER() OVER (ORDER BY vec_id) - 1 AS INTEGER) AS cid,
             ve AS cv
      FROM e
      QUALIFY ROW_NUMBER() OVER (ORDER BY vec_id) <= (SELECT k FROM kk)
    ), a0 AS (
      SELECT e.vec_id, c.cid, e.ve, {_SEM_D2_SQL} AS d2
      FROM e CROSS JOIN c0 c
    ), cell0 AS (
      SELECT vec_id, cid AS cell, ve FROM a0
      QUALIFY ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY d2, cid) = 1
    ), cexp AS (
      SELECT cell, unnest(generate_series(1, len(ve))) AS dim,
             unnest(ve) AS val
      FROM cell0
    ), c1 AS (
      SELECT cell AS cid, list(ROUND(avg_val, 6) ORDER BY dim) AS cv
      FROM (SELECT cell, dim, SUM(val) / COUNT(*) AS avg_val
            FROM cexp GROUP BY cell, dim)
      GROUP BY cell
    ), a1 AS (
      SELECT e.vec_id, c.cid, e.ve, {_SEM_D2_SQL} AS d2
      FROM e CROSS JOIN c1 c
    ), cells AS (
      SELECT vec_id, cid AS cell, ve FROM a1
      QUALIFY ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY d2, cid) = 1
    )"""


@query(
    "emb_semantic_dedup",
    oracle=f"""
    WITH {_sem_cells_sql()}, drops AS (
      SELECT DISTINCT b.vec_id
      FROM cells a JOIN cells b ON a.cell = b.cell AND a.vec_id < b.vec_id
      WHERE ROUND(list_cosine_similarity(a.ve, b.ve), 6) >= {SEM_DEDUP_THRESHOLD}
    )
    SELECT c.vec_id, CAST(c.cell AS INTEGER) AS cell,
           CASE WHEN d.vec_id IS NULL THEN 1 ELSE 0 END AS keep
    FROM cells c LEFT JOIN drops d ON c.vec_id = d.vec_id
    """,
)
def emb_semantic_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SemDeDup semantic deduplication (Abbas et al. 2023): coarse-quantize
    the corpus into k cells, compare pairs only WITHIN a cell, drop every
    vector that is the larger-id member of any pair with cosine >=
    threshold (keep-the-smallest-id greedy transitive prune).

    CELL COUNT SCALES WITH THE CORPUS — k = ceil(n / SEM_CELL_TARGET) —
    which is the property the whole 100 TB argument rests on (and what
    the round-4 scale audit flagged when cells came from the fixed-k
    ``label`` column): per-cell pair work is O(n x target) = linear, and
    the within-cell join never crosses cells. Cells are built as a
    ONE-STEP Lloyd refinement of a deterministic seed (the k lowest-
    vec_id vectors): assign -> distributed per-dim centroid means
    (rounded 6dp on both engines, the emb_label_centroids contract) ->
    reassign. Every stage is engine-replayable — sequential-order d2
    sums are bit-identical cross-engine, argmin ties go to the lowest
    cell id — so the DuckDB oracle hash-checks the ENTIRE pipeline
    including the clustering. ``emb_semantic_dedup_trained`` swaps the
    refinement for a full seeded k-means (the production path).

    Scale shape: assignment broadcasts the k x dim centroid table and
    shuffles O(n) assignments; the centroid refresh shuffles (cell, dim)
    partial sums; the within-cell self-join shuffles once on cell id.
    At extreme n (k in the millions) assignment goes hierarchical
    (coarse cells, then sub-cells — two bounded broadcasts); documented,
    not needed at any bench scale. Not in the reference (no vector ops —
    SURVEY §2.12 north-star)."""
    cells = _coarse_cells(spark, sf_dir, stage_prefix="semdedup")
    if cells is None:  # empty corpus -> empty result, typed (no crash)
        return spark.createDataFrame([], "vec_id long, cell int, keep int")
    return _within_cell_dedup(cells, SEM_DEDUP_THRESHOLD)


def _coarse_quantizer(
    spark: SparkSession,
    sf_dir: str,
    cell_target: int = SEM_CELL_TARGET,
    stage_prefix: str = "semdedup",
) -> "tuple[DataFrame, DataFrame] | None":
    """The corpus-scaled coarse quantizer shared by emb_semantic_dedup and
    emb_near_dup_topk: k = ceil(n / cell_target) centroids built as a
    ONE-STEP Lloyd refinement of the deterministic lowest-vec_id seed,
    every stage engine-replayable (see emb_semantic_dedup's docstring;
    the matching SQL is _sem_cells_sql). Returns (v_df, centroids) —
    a STAGED (vec_id, ve) frame plus the refined (cid, cv) centroid
    table — or None on an empty corpus."""
    import math

    e = spread(load_table(spark, sf_dir, "embeddings"))
    n = e.count()
    if n == 0:
        return None
    k = max(1, math.ceil(n / cell_target))
    v_df = stage(
        e.select("vec_id", as_double("embedding").alias("ve")),
        f"{stage_prefix}-vec",
    )
    return v_df, train_quantizer(v_df, k)


def train_quantizer(v_df: DataFrame, k: int) -> DataFrame:
    """One-step-Lloyd refined (cid, cv) centroid table from the k
    lowest-vec_id seeds of a (vec_id, ve) frame — every stage engine-
    replayable (the SQL twin is _sem_cells_sql). Pass a STAGED frame:
    the seed pick, assignment, and per-dim means each read it once.
    Shared by _coarse_quantizer (whole-corpus path) and IvfIndexStore
    (trains on the build shard, freezes for appends)."""
    from pyspark.sql import Window

    c0 = (
        v_df.orderBy("vec_id")
        .limit(k)
        .withColumn(
            "cid",
            (F.row_number().over(Window.orderBy("vec_id")) - 1).cast("int"),
        )
        .select("cid", F.col("ve").alias("cv"))
    )
    cell0 = v_df.join(_assign_cells(v_df, c0), "vec_id")
    cexp = cell0.select("cell", F.posexplode("ve").alias("pos", "val"))
    return (
        cexp.groupBy("cell", "pos")
        .agg(F.round(F.sum("val") / F.count(F.lit(1)), 6).alias("c"))
        .groupBy("cell")
        .agg(
            F.transform(
                F.array_sort(F.collect_list(F.struct("pos", "c"))),
                lambda s: s["c"],
            ).alias("cv")
        )
        .select(F.col("cell").alias("cid"), "cv")
    )


def _coarse_cells(
    spark: SparkSession,
    sf_dir: str,
    cell_target: int = SEM_CELL_TARGET,
    stage_prefix: str = "semdedup",
) -> "DataFrame | None":
    """_coarse_quantizer + home-cell assignment: a STAGED
    (vec_id, ve, cell) frame, or None on an empty corpus."""
    got = _coarse_quantizer(spark, sf_dir, cell_target, stage_prefix)
    if got is None:
        return None
    v_df, c1 = got
    return stage(
        v_df.join(_assign_cells(v_df, c1), "vec_id"), f"{stage_prefix}-cells"
    )


NEAR_DUP_TOPK = 3  # neighbors kept per vector — the output bound
NEAR_DUP_NPROBE = 2  # cells probed per anchor vector (boundary recall)


@query(
    "emb_near_dup_topk",
    oracle=f"""
    WITH {_sem_cells_sql()}, probes AS (
      SELECT vec_id, cid AS cell, ve FROM a1
      QUALIFY ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY d2, cid)
              <= {NEAR_DUP_NPROBE}
    ), scored AS (
      SELECT a.vec_id, b.vec_id AS neighbor_id,
             ROUND(list_cosine_similarity(a.ve, b.ve), 6) AS cos_sim
      FROM probes a JOIN cells b
        ON a.cell = b.cell AND a.vec_id <> b.vec_id
    ), ranked AS (
      SELECT vec_id, neighbor_id, cos_sim,
             ROW_NUMBER() OVER (PARTITION BY vec_id
                                ORDER BY cos_sim DESC, neighbor_id) AS rk
      FROM scored
    )
    SELECT vec_id, neighbor_id, cos_sim, CAST(rk AS BIGINT) AS rk
    FROM ranked WHERE rk <= {NEAR_DUP_TOPK}
    """,
)
def emb_near_dup_topk(
    spark: SparkSession,
    sf_dir: str,
    k: int = NEAR_DUP_TOPK,
    nprobe: int = NEAR_DUP_NPROBE,
) -> DataFrame:
    """OUTPUT-BOUNDED near-duplicate detection: each vector's ``k`` most
    similar neighbors within its coarse cell — the shape real pipelines
    join back onto the corpus (per-doc nearest neighbors + a threshold
    applied downstream), with output <= n x k rows BY CONSTRUCTION.

    Why this exists next to emb_near_dup_pairs: pair ENUMERATION cannot
    be sub-quadratic on a corpus whose candidate structure is quadratic —
    and on a near-isotropic corpus (this testdata: pairwise cosine
    ~N(0, 1/sqrt(dim))) banded LSH generates ~51% of ALL pairs as
    candidates at ANY threshold, because near-orthogonal vectors agree
    with each random hyperplane with probability 1/2 (measured: 1.03M of
    2.0M pairs at n=2000, the SAME 0.51 fraction at n=20000 — the
    round-5 scale-audit 16x). This operator replaces open-ended pair
    enumeration with cell-bounded top-k: cells come from the corpus-
    scaled coarse quantizer (k_cells = ceil(n / SEM_CELL_TARGET), the
    emb_semantic_dedup pipeline — oracle-replayed end-to-end including
    the clustering), so scoring work is O(n x nprobe x SEM_CELL_TARGET)
    total at ANY corpus size and the per-vector ranking compiles to
    WindowGroupLimit (each partition forwards at most k rows per vector).

    Boundary recall comes from IVF-style MULTI-PROBE: each ANCHOR vector
    probes its ``nprobe`` nearest cells while neighbors stay indexed by
    their single home cell — a near-identical pair that straddles a cell
    boundary is still found from whichever side probes the other's home
    (single-probe measured 0.875 planted recall at cos 0.95; two-probe
    >= 0.9 pinned in tests/test_similarity.py). A (anchor, neighbor) row
    cannot duplicate: probes are distinct cells and the neighbor's home
    is unique, so no DISTINCT pass is needed.

    Scale shape: one broadcast assignment pass + one probe pass + one
    join shuffled on cell id + a WindowGroupLimit — linear in n with a
    bounded constant."""
    from pyspark.sql import Window

    got = _coarse_quantizer(spark, sf_dir, stage_prefix="neardup-topk")
    if got is None:  # empty corpus -> empty result, typed (no crash)
        return spark.createDataFrame(
            [], "vec_id long, neighbor_id long, cos_sim double, rk long"
        )
    v_df, c1 = got
    # one scoring pass yields BOTH assignments: prb=1 is the home cell
    probes = stage(_probe_cells(v_df, c1, nprobe), "neardup-topk-probes")
    a = probes.join(v_df, "vec_id").alias("a")
    b = probes.filter(F.col("prb") == 1).join(v_df, "vec_id").alias("b")
    scored = a.join(
        b,
        (F.col("a.cell") == F.col("b.cell"))
        & (F.col("a.vec_id") != F.col("b.vec_id")),
    ).select(
        F.col("a.vec_id").alias("vec_id"),
        F.col("b.vec_id").alias("neighbor_id"),
        F.round(cosine(F.col("a.ve"), F.col("b.ve")), 6).alias("cos_sim"),
    )
    w = Window.partitionBy("vec_id").orderBy(F.desc("cos_sim"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= k)
        .select("vec_id", "neighbor_id", "cos_sim", F.col("rk").cast("long").alias("rk"))
    )


TRAIN_LLOYD_ITERS = 3  # fixed Lloyd refinements in the trained quantizer —
#   fixed (not convergence-tested) so the whole training loop unrolls into
#   a finite CTE chain the DuckDB oracle replays iteration by iteration


def _sem_trained_oracle(
    cell_target: int = SEM_CELL_TARGET,
    threshold: float = SEM_DEDUP_THRESHOLD,
    iters: int = TRAIN_LLOYD_ITERS,
) -> str:
    """DuckDB replay of the FULL trained-SemDeDup pipeline: bounded seeded
    sample -> ``iters`` unrolled Lloyd iterations (assign sample, rounded
    per-dim means, empty cell keeps its previous centroid) -> full-corpus
    assignment -> within-cell prune. Every iteration is one
    assignment+means CTE pair, so the oracle hash-checks the TRAINING,
    not just the downstream prune — the recipe _pq_oracle() uses for the
    sampled codebook, extended to the iterative trainer by fixing the
    iteration count."""
    it_ctes = []
    prev = "c0"
    for i in range(1, iters + 1):
        it_ctes.append(f"""a{i} AS (
      SELECT e.vec_id, c.cid, e.ve, {_SEM_D2_SQL} AS d2
      FROM samp e CROSS JOIN {prev} c
    ), s{i} AS (
      SELECT vec_id, cid AS cell, ve FROM a{i}
      QUALIFY ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY d2, cid) = 1
    ), x{i} AS (
      SELECT cell, unnest(generate_series(1, len(ve))) AS dim,
             unnest(ve) AS val
      FROM s{i}
    ), m{i} AS (
      SELECT cell AS cid, list(ROUND(avg_val, 6) ORDER BY dim) AS cv
      FROM (SELECT cell, dim, SUM(val) / COUNT(*) AS avg_val
            FROM x{i} GROUP BY cell, dim)
      GROUP BY cell
    ), c{i} AS (
      SELECT p.cid, COALESCE(m.cv, p.cv) AS cv
      FROM {prev} p LEFT JOIN m{i} m ON m.cid = p.cid
    )""")
        prev = f"c{i}"
    chain = ", ".join(it_ctes)
    return f"""
    WITH e AS (
      SELECT vec_id, CAST(embedding AS DOUBLE[]) AS ve FROM embeddings
    ), nn AS (
      SELECT COUNT(*) AS n FROM e
    ), kk AS (
      SELECT CAST(ceil(n / {cell_target}.0) AS BIGINT) AS k FROM nn
    ), ss AS (
      SELECT LEAST(n, GREATEST({PQ_TRAIN_SAMPLE}, 4 * k)) AS s FROM nn, kk
    ), samp AS (
      SELECT vec_id, ve FROM e
      QUALIFY ROW_NUMBER() OVER (ORDER BY vec_id) <= (SELECT s FROM ss)
    ), c0 AS (
      SELECT CAST(ROW_NUMBER() OVER (ORDER BY vec_id) - 1 AS INTEGER) AS cid,
             ve AS cv
      FROM samp
      QUALIFY ROW_NUMBER() OVER (ORDER BY vec_id) <= (SELECT k FROM kk)
    ), {chain}, af AS (
      SELECT e.vec_id, c.cid, e.ve, {_SEM_D2_SQL} AS d2
      FROM e CROSS JOIN {prev} c
    ), cells AS (
      SELECT vec_id, cid AS cell, ve FROM af
      QUALIFY ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY d2, cid) = 1
    ), drops AS (
      SELECT DISTINCT b.vec_id
      FROM cells a JOIN cells b ON a.cell = b.cell AND a.vec_id < b.vec_id
      WHERE ROUND(list_cosine_similarity(a.ve, b.ve), 6) >= {threshold}
    )
    SELECT c.vec_id, CAST(c.cell AS INTEGER) AS cell,
           CASE WHEN d.vec_id IS NULL THEN 1 ELSE 0 END AS keep
    FROM cells c LEFT JOIN drops d ON c.vec_id = d.vec_id
    """


@query("emb_semantic_dedup_trained", oracle=_sem_trained_oracle())
def emb_semantic_dedup_trained(
    spark: SparkSession,
    sf_dir: str,
    cell_target: int = SEM_CELL_TARGET,
    threshold: float = SEM_DEDUP_THRESHOLD,
    iters: int = TRAIN_LLOYD_ITERS,
) -> DataFrame:
    """``emb_semantic_dedup`` with a FULLY-TRAINED coarse quantizer — and,
    since round 6, fully DuckDB-oracle-backed: the trainer is a FIXED
    number of distributed Lloyd iterations over a bounded seeded sample,
    every step engine-replayable, so the oracle hash-checks sample
    selection, all ``iters`` refinements, the full-corpus assignment AND
    the prune (previously the one rows-only registry entry; the iterative
    numpy ``kmeans_train`` stays as the driver-side trainer for the
    PQ/IVF codebook paths, which sit behind their own recall pins).

    Training contract (deterministic, cross-engine):
    - sample = the min(n, max(PQ_TRAIN_SAMPLE, 4k)) lowest vec_ids
      (>= 4 rows per centroid, capped — training cost independent of
      corpus size);
    - seed = the k lowest-vec_id sample vectors (k = ceil(n/cell_target),
      the corpus-scaled cell count);
    - each iteration: assign the sample by ROUND(d2, 6) with argmin ties
      to the lowest cid (sequential-order d2 sums, bit-identical
      cross-engine), recompute per-dim means rounded 6dp, and an EMPTIED
      cell keeps its previous centroid (COALESCE — SQL-expressible, vs
      kmeans_train's farthest-point reseed);
    - centroids are materialized to the driver between iterations (k x dim
      doubles — the same bounded codebook state as ann_ivf_topk_trained),
      keeping each iteration's plan shallow.

    Why this closes the scale flag: nothing here trusts a caller-supplied
    cell column — the operator itself enforces cells ~ cell_target
    vectors at ANY corpus size, bounding the per-cell quadratic to
    O(n x cell_target) total; at extreme n train/assign go hierarchical,
    per the emb_semantic_dedup docstring."""
    import math

    e = spread(load_table(spark, sf_dir, "embeddings"))
    n = e.count()
    if n == 0:  # empty corpus -> empty result, typed (no crash)
        return spark.createDataFrame([], "vec_id long, cell int, keep int")
    k = max(1, math.ceil(n / cell_target))
    sample_n = min(n, max(PQ_TRAIN_SAMPLE, 4 * k))
    v_df = stage(
        e.select("vec_id", as_double("embedding").alias("ve")), "semtrained-vec"
    )
    samp = stage(v_df.orderBy("vec_id").limit(sample_n), "semtrained-samp")
    from pyspark.sql import Window

    cent_schema = "cid int, cv array<double>"
    c = (
        samp.orderBy("vec_id")
        .limit(k)
        .withColumn(
            "cid",
            (F.row_number().over(Window.orderBy("vec_id")) - 1).cast("int"),
        )
        .select("cid", F.col("ve").alias("cv"))
    )
    for _ in range(iters):
        assigned = samp.join(_assign_cells(samp, c), "vec_id")
        means = (
            assigned.select("cell", F.posexplode("ve").alias("pos", "val"))
            .groupBy("cell", "pos")
            .agg(F.round(F.sum("val") / F.count(F.lit(1)), 6).alias("m"))
            .groupBy("cell")
            .agg(
                F.transform(
                    F.array_sort(F.collect_list(F.struct("pos", "m"))),
                    lambda s: s["m"],
                ).alias("cv")
            )
            .select(F.col("cell").alias("cid"), "cv")
        )
        merged = (
            c.alias("p")
            .join(means.alias("m"), F.col("p.cid") == F.col("m.cid"), "left")
            .select(
                F.col("p.cid").alias("cid"),
                F.coalesce(F.col("m.cv"), F.col("p.cv")).alias("cv"),
            )
        )
        # materialize the k x dim centroids on the driver: bounded state,
        # shallow next-iteration plan, exact double bits preserved
        c = spark.createDataFrame(
            [(r.cid, list(r.cv)) for r in merged.collect()], cent_schema
        )
    cells = stage(
        v_df.join(_assign_cells(v_df, c), "vec_id"), "semtrained-cells"
    )
    return _within_cell_dedup(cells, threshold)


PQ_M = 8  # subquantizers
PQ_DSUB = 8  # dims per subvector (8 x 8 = the 64-dim corpus)
PQ_K = 16  # codewords per subquantizer


def _pq_oracle() -> str:
    """DuckDB replay of the full PQ pipeline: sampled codebook -> nearest-
    codeword assignment per subvector -> query ADC lookup-sum -> top-10."""
    return f"""
    WITH cb AS (
      SELECT ROW_NUMBER() OVER (ORDER BY vec_id) - 1 AS k,
             CAST(embedding AS DOUBLE[]) AS cv
      FROM embeddings ORDER BY vec_id LIMIT {PQ_K}
    ), q AS (
      SELECT vec_id AS qid, CAST(embedding AS DOUBLE[]) AS qv
      FROM embeddings ORDER BY vec_id LIMIT 1
    ), ms AS (SELECT unnest(generate_series(0, {PQ_M - 1})) AS m),
    sub AS (
      SELECT e.vec_id, ms.m, cb.k,
             list_sum(list_transform(generate_series(1, {PQ_DSUB}),
               i -> power(CAST(e.embedding[ms.m * {PQ_DSUB} + i] AS DOUBLE)
                          - cb.cv[ms.m * {PQ_DSUB} + i], 2))) AS d2
      FROM embeddings e CROSS JOIN ms CROSS JOIN cb
    ), codes AS (
      SELECT vec_id, m, k AS code,
             ROW_NUMBER() OVER (PARTITION BY vec_id, m ORDER BY d2, k) AS rk
      FROM sub
    ), adc AS (
      SELECT ms.m, cb.k,
             list_sum(list_transform(generate_series(1, {PQ_DSUB}),
               i -> power(q.qv[ms.m * {PQ_DSUB} + i]
                          - cb.cv[ms.m * {PQ_DSUB} + i], 2))) AS qd2
      FROM q CROSS JOIN ms CROSS JOIN cb
    )
    SELECT c.vec_id, ROUND(SUM(a.qd2), 6) AS adc_dist
    FROM codes c JOIN adc a ON a.m = c.m AND a.k = c.code
    WHERE c.rk = 1 AND c.vec_id <> (SELECT qid FROM q)
    GROUP BY c.vec_id
    ORDER BY adc_dist ASC, c.vec_id
    LIMIT 10
    """


@query("ann_pq_topk", oracle=_pq_oracle())
def ann_pq_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PRODUCT QUANTIZATION ANN (Jegou et al., TPAMI'11) — the
    memory-bounded scale path beside LSH banding and IVF: each vector is
    compressed to PQ_M one-byte codes (nearest codeword per subvector),
    and a query scores the whole corpus from an M x K lookup table of
    precomputed subvector distances (Asymmetric Distance Computation) —
    no original vectors touched at query time.

    Why at 100 TB: the corpus' query-time footprint drops from
    dim x 4 bytes to M bytes per vector (32x here), the code assignment
    is one Arrow-batched pandas UDF pass (n x M x K x dsub numpy
    broadcast per batch), and ADC scoring is a per-row lookup-sum in JVM
    expressions feeding TakeOrderedAndProject — one corpus pass, no
    shuffle before the final top-k. The codebook here is SAMPLED
    deterministically (subvectors of the PQ_K lowest vec_ids) instead of
    k-means-trained, which keeps the ENTIRE pipeline — codebook, code
    assignment, ADC ranking — bit-replayable by the DuckDB oracle;
    k-means training would only change the codebook-build step (a
    bounded-size driver/sample job in either case).

    The driver-side collect is PQ_K vectors (the codebook sample) — the
    same |codebook| x dim bound as IVF's centroid probe, documented
    there."""
    e = spread(load_table(spark, sf_dir, "embeddings"))
    head = e.orderBy("vec_id").select("vec_id", "embedding").limit(PQ_K).collect()
    if not head:  # empty corpus -> empty result, typed (no crash)
        return spark.createDataFrame([], "vec_id long, adc_dist double")
    CB = np.array([r.embedding for r in head], dtype=np.float64)
    cb_sub = CB.reshape(PQ_K, PQ_M, PQ_DSUB).transpose(1, 0, 2)  # M x K x dsub
    qid = head[0].vec_id
    q_np = CB[0]
    return _pq_rank(e, cb_sub, q_np, exclude_id=qid)


def _pq_rank(e: DataFrame, cb_sub: np.ndarray, q_np: np.ndarray,
             exclude_id: int | None = None, k: int = 10) -> DataFrame:
    """The PQ scoring pipeline shared by the sampled (oracle) and trained
    codebook paths: Arrow-batched code assignment, query ADC lookup table
    inlined as a map literal (bounded by the codebook, never the corpus),
    JVM lookup-sum, TakeOrderedAndProject top-k — one corpus pass, no
    shuffle before the final top-k."""
    n_k = cb_sub.shape[1]

    @pandas_udf("array<int>")
    def pq_codes(emb: pd.Series) -> pd.Series:
        V = np.stack([np.asarray(v, dtype=np.float64) for v in emb]).reshape(
            -1, PQ_M, PQ_DSUB
        )
        d = ((V[:, :, None, :] - cb_sub[None, :, :, :]) ** 2).sum(-1)
        codes = d.argmin(-1).astype("int32")  # ties -> lowest k, like the oracle
        return pd.Series([c.tolist() for c in codes])

    qsub = q_np.reshape(PQ_M, PQ_DSUB)
    qd2 = ((qsub[:, None, :] - cb_sub) ** 2).sum(-1)
    entries: list = []
    for m in range(PQ_M):
        for kk in range(n_k):
            entries += [F.lit(m * n_k + kk), F.lit(float(qd2[m, kk]))]
    lut = F.create_map(*entries)

    coded = e.select("vec_id", pq_codes("embedding").alias("codes"))
    if exclude_id is not None:
        coded = coded.filter(F.col("vec_id") != exclude_id)
    adc = F.aggregate(
        F.sequence(F.lit(0), F.lit(PQ_M - 1)),
        F.lit(0.0),
        lambda acc, m: acc
        + F.element_at(lut, (m * n_k + F.element_at("codes", m + 1)).cast("int")),
    )
    return (
        coded.select("vec_id", F.round(adc, 6).alias("adc_dist"))
        .orderBy(F.asc("adc_dist"), F.asc("vec_id"))
        .limit(k)
    )


# ---------------------------------------------------------------------------
# Trained codebooks (k-means) for PQ and IVF
# ---------------------------------------------------------------------------

IVF_TRAIN_CELLS = 8


def _query_vec(e: DataFrame, qid) -> np.ndarray:
    """Fetch one query vector by id, failing loudly (clear ValueError, not
    an AttributeError on None) when the id is absent from the corpus —
    the same explicitness as the empty-corpus guards."""
    row = e.filter(F.col("vec_id") == qid).select("embedding").first()
    if row is None:
        raise ValueError(f"query_id {qid!r} not present in the corpus")
    return np.asarray(row.embedding, dtype=np.float64)


def kmeans_train(X: np.ndarray, k: int, seed: int = 42, iters: int = 25) -> np.ndarray:
    """Deterministic seeded Lloyd k-means on a BOUNDED sample — the
    codebook trainer for PQ subquantizers and IVF coarse cells. Plain
    numpy on the driver: the sample is capped (PQ_TRAIN_SAMPLE rows —
    k-means training cost is independent of corpus size; at 100 TB the
    sample is a seeded pushed-down TABLESAMPLE, same driver bound).

    Determinism contract (same inputs -> bit-identical codebook on any
    host): seeded init (RNG permutation of distinct rows), argmin ties to
    the lowest centroid id, empty clusters re-seeded to the farthest-
    from-assigned-centroid points in descending-distance order — each
    empty cluster gets the NEXT farthest point, so two clusters emptying
    in the same iteration can never receive the same reseed (duplicate
    centroids would stay fused forever: argmin ties go to the lowest id)
    — fixed iteration count with early exit on exact assignment
    fixpoint."""
    n = len(X)
    rng = np.random.default_rng(seed)
    cents = X[rng.permutation(n)[:k]].astype(np.float64).copy()
    prev_assign = None
    for _ in range(iters):
        d2 = ((X[:, None, :] - cents[None, :, :]) ** 2).sum(-1)
        assign = d2.argmin(1)  # ties -> lowest centroid id
        if prev_assign is not None and np.array_equal(assign, prev_assign):
            break
        prev_assign = assign
        # descending own-centroid distance; stable sort keeps tie order
        # deterministic (lowest row index first, like argmax did)
        far_order = np.argsort(-d2[np.arange(n), assign], kind="stable")
        next_far = 0
        for c in range(k):
            members = X[assign == c]
            if len(members):
                cents[c] = members.mean(0)
            else:
                cents[c] = X[far_order[next_far]]
                next_far += 1
    return cents


def pq_train_codebook(sample: np.ndarray, seed: int = 42) -> np.ndarray:
    """Per-subquantizer k-means: M independent codebooks of K x dsub over
    the sample's subvectors (Jegou et al. §III.A). Returns M x K x dsub."""
    sub = sample.reshape(len(sample), PQ_M, PQ_DSUB)
    return np.stack(
        [kmeans_train(sub[:, m, :], PQ_K, seed=seed + m) for m in range(PQ_M)]
    )


def ann_pq_topk_trained(
    spark: SparkSession, sf_dir: str, query_id: int | None = None, k: int = 10
) -> DataFrame:
    """``ann_pq_topk`` with a K-MEANS-TRAINED codebook (train=True path):
    the production variant of the oracle query's deterministic sampled
    codebook — same assignment UDF, same ADC ranking, only the
    codebook-build step differs (a seeded k-means over a bounded sample,
    so the result is still deterministic and the two paths share every
    plan property). Not SQL-replayable (the oracle keeps the sampled
    variant); recall@10 of the true nearest neighbor is pinned >= 0.9 on
    planted-pair corpora in tests/test_similarity.py."""
    e = spread(load_table(spark, sf_dir, "embeddings"))
    sample_rows = (
        e.orderBy("vec_id").select("vec_id", "embedding").limit(PQ_TRAIN_SAMPLE).collect()
    )
    if not sample_rows:  # empty corpus -> empty result, typed (no crash)
        return spark.createDataFrame([], "vec_id long, adc_dist double")
    S = np.array([r.embedding for r in sample_rows], dtype=np.float64)
    cb_sub = pq_train_codebook(S)
    qid = sample_rows[0].vec_id if query_id is None else query_id
    q_np = S[0] if query_id is None else _query_vec(e, qid)
    return _pq_rank(e, cb_sub, q_np, exclude_id=qid, k=k)


def ann_ivf_topk_trained(
    spark: SparkSession,
    sf_dir: str,
    query_id: int | None = None,
    n_cells: int = IVF_TRAIN_CELLS,
    nprobe: int = IVF_NPROBE,
    k: int = 10,
) -> DataFrame:
    """``ann_ivf_topk`` with K-MEANS-TRAINED coarse cells instead of the
    label column: centroids train on a bounded seeded sample, every
    vector is assigned to its nearest cell by an Arrow-batched UDF, the
    query probes its ``nprobe`` nearest cells, and only those cells are
    exact-scored. At 100 TB the assignment is a write-time partitioning
    key (bucketed by cell id) and a probe reads nprobe/n_cells of the
    data — the same partition-pruning shape as the label-cell oracle
    query. Recall pinned in tests/test_similarity.py."""
    e = spread(load_table(spark, sf_dir, "embeddings"))
    sample_rows = (
        e.orderBy("vec_id").select("vec_id", "embedding").limit(PQ_TRAIN_SAMPLE).collect()
    )
    if not sample_rows:  # empty corpus -> empty result, typed (no crash)
        return spark.createDataFrame([], "vec_id long, label int, cos_sim double")
    S = np.array([r.embedding for r in sample_rows], dtype=np.float64)
    cents = kmeans_train(S, n_cells)
    qid = sample_rows[0].vec_id if query_id is None else query_id
    q_np = S[0] if query_id is None else _query_vec(e, qid)

    @pandas_udf("int")
    def cell_of(emb: pd.Series) -> pd.Series:
        V = np.stack([np.asarray(v, dtype=np.float64) for v in emb])
        d2 = ((V[:, None, :] - cents[None, :, :]) ** 2).sum(-1)
        return pd.Series(d2.argmin(1).astype("int32"))

    probe_cells = [
        int(c)
        for c in (((q_np[None, :] - cents) ** 2).sum(-1)).argsort(kind="stable")[:nprobe]
    ]
    qv = F.array(*[F.lit(float(x)) for x in q_np])
    sim = F.round(cosine(as_double("embedding"), qv), 6)
    return (
        e.withColumn("cell", cell_of("embedding"))
        .filter(F.col("cell").isin(probe_cells) & (F.col("vec_id") != qid))
        .select("vec_id", "label", sim.alias("cos_sim"))
        .orderBy(F.desc("cos_sim"), F.asc("vec_id"))
        .limit(k)
    )


MRL_DIM = 16  # Matryoshka head width (of the 64-dim corpus)


@query(
    "emb_matryoshka_truncate",
    oracle=f"""
    WITH v AS (
      SELECT vec_id, label, CAST(embedding AS DOUBLE[]) AS e FROM embeddings
    )
    SELECT vec_id, label,
           CAST({MRL_DIM} AS INTEGER) AS mrl_dim,
           ROUND(sqrt(list_sum(list_transform(e[1:{MRL_DIM}], x -> x * x))), 6)
             AS head_norm,
           ROUND(sqrt(list_sum(list_transform(e[1:{MRL_DIM}], x -> x * x)))
                 / sqrt(list_sum(list_transform(e, x -> x * x))), 6)
             AS norm_frac
    FROM v
    """,
)
def emb_matryoshka_truncate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Matryoshka (MRL-style) truncation diagnostics: per-vector L2 norm
    of the first MRL_DIM dims and its fraction of the full norm — the
    feasibility check before serving truncated embeddings (Kusupati et
    al. 2022: nested representations concentrate information in the
    prefix; a low norm_frac means THIS model's embeddings are not
    front-loaded and truncation would destroy ranking). Pure per-row
    slice + sequential-order sums (bit-identical cross-engine), no
    shuffle — a 4x (here) memory/bandwidth cut for the coarse pass of a
    two-stage retrieval cascade, next to emb_quantize_int8's 4x int8
    cut. See ann_topk_truncated for the cascade's coarse ranking."""
    e = spread(load_table(spark, sf_dir, "embeddings"))
    full = as_double("embedding")
    head = F.slice(full, 1, MRL_DIM)
    return e.select(
        "vec_id",
        "label",
        F.lit(MRL_DIM).alias("mrl_dim"),
        F.round(l2norm(head), 6).alias("head_norm"),
        F.round(l2norm(head) / l2norm(full), 6).alias("norm_frac"),
    )


@query(
    "ann_topk_truncated",
    oracle=f"""
    WITH v AS (
      SELECT vec_id, label,
             (CAST(embedding AS DOUBLE[]))[1:{MRL_DIM}] AS he
      FROM embeddings
    ), q AS (
      SELECT he AS qh FROM v ORDER BY vec_id LIMIT 1
    )
    SELECT v.vec_id, v.label,
           ROUND(list_cosine_similarity(v.he, q.qh), 6) AS cos_sim
    FROM v, q
    WHERE v.vec_id <> (SELECT MIN(vec_id) FROM embeddings)
    ORDER BY cos_sim DESC, v.vec_id
    LIMIT 10
    """,
)
def ann_topk_truncated(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Truncated-dimension cosine top-10 — the COARSE stage of a
    Matryoshka two-stage cascade: rank on the first MRL_DIM dims (4x
    less data movement per vector), then a full-dim rerank of the short
    candidate list downstream (compose with ann_topk_bruteforce /
    ann_topk_batch on the survivors). Same shuffle-free
    scan + TakeOrderedAndProject plan as the full-dim baseline; the
    scan's per-row work and the broadcast query literal shrink by
    dim/MRL_DIM. Overlap with the full-dim top-k is pinned in
    tests/test_similarity.py — the empirical recall figure truncation
    buys on this corpus."""
    e = spread(load_table(spark, sf_dir, "embeddings"))
    qrow = e.orderBy("vec_id").select("vec_id", "embedding").first()
    if qrow is None:  # empty corpus -> empty result, typed (no crash)
        return spark.createDataFrame([], "vec_id long, label int, cos_sim double")
    qh = F.array(*[F.lit(float(x)) for x in qrow.embedding[:MRL_DIM]])
    he = F.slice(as_double("embedding"), 1, MRL_DIM)
    sim = F.round(cosine(he, qh), 6)
    return (
        e.filter(F.col("vec_id") != qrow.vec_id)
        .select("vec_id", "label", sim.alias("cos_sim"))
        .orderBy(F.desc("cos_sim"), F.asc("vec_id"))
        .limit(10)
    )


CASCADE_DEPTH = 50  # coarse-stage candidates fed to the full-dim rerank


@query(
    "ann_cascade_topk",
    oracle=f"""
    WITH v AS (
      SELECT vec_id, label, CAST(embedding AS DOUBLE[]) AS e,
             (CAST(embedding AS DOUBLE[]))[1:{MRL_DIM}] AS he
      FROM embeddings
    ), q AS (
      SELECT e AS qe, he AS qh FROM v ORDER BY vec_id LIMIT 1
    ), coarse AS (
      SELECT v.vec_id FROM v, q
      WHERE v.vec_id <> (SELECT MIN(vec_id) FROM embeddings)
      ORDER BY ROUND(list_cosine_similarity(v.he, q.qh), 6) DESC, v.vec_id
      LIMIT {CASCADE_DEPTH}
    )
    SELECT v.vec_id, v.label,
           ROUND(list_cosine_similarity(v.e, q.qe), 6) AS cos_sim
    FROM v JOIN coarse ON v.vec_id = coarse.vec_id, q
    ORDER BY cos_sim DESC, v.vec_id
    LIMIT 10
    """,
)
def ann_cascade_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The Matryoshka TWO-STAGE CASCADE composed end-to-end: a truncated
    MRL_DIM-dim coarse pass ranks the whole corpus and keeps CASCADE_DEPTH
    candidates; the full-dim exact rerank reads ONLY those candidates
    and returns the top-10. This is the serving shape truncation buys:
    the corpus-wide pass moves MRL_DIM/dim (= 1/4 here) of the bytes,
    and the full vectors are touched for 50 rows, not the corpus.

    Plan: coarse stage is the same shuffle-free scan +
    TakeOrderedAndProject as ann_topk_truncated; its 50-row id list
    broadcasts back onto the corpus scan (BroadcastHashJoin — the corpus
    is re-read, filtered map-side to 50 rows) and the rerank ends in a
    second TakeOrderedAndProject. At 100 TB the second read is pruned by
    the same scan the first pass used (or an id-keyed point-lookup table
    in a real serving stack — the join shape is the same either way).

    Cascade recall vs the full brute force is whatever the coarse stage
    earns — on this random (non-MRL) corpus that is LOW (norm_frac ~0.5,
    see emb_matryoshka_truncate); the operator's contract is faithful
    composition, pinned by the oracle replaying both stages. On a
    front-loaded corpus (tools/gen_clustered_emb.py: decaying spectrum,
    norm_frac ~0.83) the measured cascade recall is 10/10 vs the
    full-dim brute force — pinned in tests/test_clustered_regime.py and
    the SCALE_AUDIT_CLUSTERED artifact, the regime MRL models are
    trained to produce."""
    e = spread(load_table(spark, sf_dir, "embeddings"))
    qrow = e.orderBy("vec_id").select("vec_id", "embedding").first()
    if qrow is None:  # empty corpus -> empty result, typed (no crash)
        return spark.createDataFrame([], "vec_id long, label int, cos_sim double")
    qh = F.array(*[F.lit(float(x)) for x in qrow.embedding[:MRL_DIM]])
    qe = F.array(*[F.lit(float(x)) for x in qrow.embedding])
    he = F.slice(as_double("embedding"), 1, MRL_DIM)
    coarse = (
        e.filter(F.col("vec_id") != qrow.vec_id)
        .select("vec_id", F.round(cosine(he, qh), 6).alias("hsim"))
        .orderBy(F.desc("hsim"), F.asc("vec_id"))
        .limit(CASCADE_DEPTH)
        .select("vec_id")
    )
    sim = F.round(cosine(as_double("embedding"), qe), 6)
    return (
        e.join(F.broadcast(coarse), "vec_id")
        .select("vec_id", "label", sim.alias("cos_sim"))
        .orderBy(F.desc("cos_sim"), F.asc("vec_id"))
        .limit(10)
    )


@query(
    "ann_topk_int8",
    oracle="""
    WITH v AS (
      SELECT vec_id, label, CAST(embedding AS DOUBLE[]) AS e FROM embeddings
    ), sc AS (
      SELECT vec_id, label,
             list_max(list_transform(e, x -> abs(x))) AS qscale, e
      FROM v
    ), c AS (
      SELECT vec_id, label, qscale,
             list_transform(e,
               x -> CAST(floor(x * 127.0 / qscale + 0.5) AS BIGINT)) AS codes
      FROM sc WHERE qscale > 0
    ), q AS (
      SELECT codes AS qc, qscale AS qs, vec_id AS qid
      FROM c ORDER BY vec_id LIMIT 1
    ), scored AS (
      SELECT c.vec_id, c.label, c.qscale, q.qs,
             CAST(list_sum(list_transform(generate_series(1, len(c.codes)),
                  i -> c.codes[i] * q.qc[i])) AS BIGINT) AS dot_codes
      FROM c, q
      WHERE c.vec_id <> q.qid
    )
    SELECT vec_id, label, dot_codes,
           ROUND(dot_codes * qscale * qs / 16129.0, 6) AS score
    FROM scored
    ORDER BY score DESC, vec_id
    LIMIT 10
    """,
)
def ann_topk_int8(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Approximate top-10 by inner product over the INT8-QUANTIZED
    corpus — the memory-bound scoring path emb_quantize_int8's 4x cut
    buys: codes are int8-range integers, the query's codes are inlined
    literals, and the score is an exact INTEGER dot product de-quantized
    by the two scales (dot * qscale_v * qscale_q / 127^2). Integer
    arithmetic is associativity-proof, so dot_codes matches the oracle
    bit-for-bit with no rounding contract; only the final de-quantized
    score needs the usual 6dp round.

    Plan: same shuffle-free scan + TakeOrderedAndProject as
    ann_topk_bruteforce — at 100 TB the scan reads the 4x-smaller code
    column instead of the float vectors (with a columnar store the
    full-precision embedding is simply never read; int8 rescoring +
    exact rerank of the short list is the standard serving recipe, and
    the rerank half is ann_cascade_topk's broadcast-back shape).
    Approximation quality vs the exact path is pinned in
    tests/test_similarity.py (numpy bit-replay of the integer math +
    top-10 overlap with brute force)."""
    e = spread(load_table(spark, sf_dir, "embeddings"))
    v = as_double("embedding")
    st = (
        e.select("vec_id", "label", v.alias("e"))
        .withColumn(
            "qscale", F.array_max(F.transform(F.col("e"), lambda x: F.abs(x)))
        )
        .filter(F.col("qscale") > 0)
        .withColumn(
            "codes",
            F.transform(
                F.col("e"),
                lambda x: F.floor(x * 127.0 / F.col("qscale") + 0.5).cast(
                    "long"
                ),
            ),
        )
    )
    qrow = st.orderBy("vec_id").select("vec_id", "codes", "qscale").first()
    if qrow is None:  # empty corpus -> empty result, typed (no crash)
        return spark.createDataFrame(
            [], "vec_id long, label int, dot_codes long, score double"
        )
    qc = F.array(*[F.lit(int(c)) for c in qrow.codes])
    dot = F.aggregate(
        F.zip_with(F.col("codes"), qc, lambda a, b: a * b),
        F.lit(0).cast("long"),
        lambda acc, x: acc + x,
    )
    score = F.round(
        dot.cast("double")
        * F.col("qscale")
        * F.lit(float(qrow.qscale))
        / F.lit(16129.0),
        6,
    )
    return (
        st.filter(F.col("vec_id") != qrow.vec_id)
        .select(
            "vec_id",
            "label",
            dot.alias("dot_codes"),
            score.alias("score"),
        )
        .orderBy(F.desc("score"), F.asc("vec_id"))
        .limit(10)
    )


RANGE_COS = 0.3  # range-search radius: ~99.2th pct of this corpus's
#                  near-isotropic cosine distribution (std ~ 1/sqrt(64)),
#                  so each query returns a small non-empty neighbor set
#                  at test scale; real corpora use task-derived radii


@query(
    "ann_range_search",
    oracle=f"""
    WITH q AS (
      SELECT vec_id AS query_id, CAST(embedding AS DOUBLE[]) AS qv
      FROM embeddings ORDER BY vec_id LIMIT 8
    )
    SELECT q.query_id, e.vec_id,
           ROUND(list_cosine_similarity(CAST(e.embedding AS DOUBLE[]), q.qv), 6)
             AS cos_sim
    FROM embeddings e, q
    WHERE e.vec_id <> q.query_id
      AND ROUND(list_cosine_similarity(CAST(e.embedding AS DOUBLE[]), q.qv), 6)
          >= {RANGE_COS}
    """,
)
def ann_range_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RANGE search (the FAISS range_search analog next to the top-k
    family): ALL neighbors within cosine >= RANGE_COS for each of 8
    query vectors, in one corpus pass. Top-k answers "the best k";
    range search answers "everything this similar" — the dedup/recall
    primitive when the neighbor COUNT is the unknown (e.g. finding every
    paraphrase of a benchmark question, where k would truncate or pad).

    Plan: strictly LIGHTER than ann_topk_batch — the broadcast query
    batch scores map-side and the radius is a FILTER, so there is no
    window, no rank, and NO SHUFFLE AT ALL: scan -> broadcast join ->
    filter -> output (plan-guarded shuffle-free). At 100 TB that is one
    corpus read with output bounded by the true neighbor count;
    compose with ann_lsh_buckets / the IVF store to prune the scan when
    the radius is tight."""
    e = spread(load_table(spark, sf_dir, "embeddings"))
    q = (
        e.orderBy("vec_id")
        .limit(8)
        .select(
            F.col("vec_id").alias("query_id"), F.col("embedding").alias("qe")
        )
    )
    # cos_sim behind an explode(array(..)) Generate barrier (r11): the
    # radius filter otherwise collapses into the broadcast join's
    # condition while the output recomputes it — the full-dim cosine ran
    # TWICE per (corpus row x query). Behind the barrier it runs once.
    scored = e.join(
        F.broadcast(q), F.col("vec_id") != F.col("query_id")
    ).select(
        "query_id",
        "vec_id",
        F.explode(
            F.array(F.round(cosine(as_double("embedding"), as_double("qe")), 6))
        ).alias("cos_sim"),
    )
    return scored.filter(F.col("cos_sim") >= RANGE_COS)


@query(
    "emb_decontaminate",
    oracle=f"""
    WITH sig AS (
      SELECT vec_id, CAST(embedding AS DOUBLE[]) AS ve,
        (vec_id % 10 = 0) AS is_eval,
        {_bucket_sql_expr()} AS bucket
      FROM embeddings
    ), bands AS (
      SELECT vec_id, is_eval, b.b AS band_id,
             substring(bucket, b.b * {BAND_BITS} + 1, {BAND_BITS}) AS band_key
      FROM sig CROSS JOIN (SELECT unnest(generate_series(0, {NEAR_DUP_BANDS - 1})) AS b) b
    ), cand AS (
      SELECT DISTINCT t.vec_id AS train_id, e.vec_id AS eval_id
      FROM bands t JOIN bands e
        ON t.band_id = e.band_id AND t.band_key = e.band_key
       AND NOT t.is_eval AND e.is_eval
    ), verified AS (
      SELECT c.train_id AS vec_id,
             ROUND(list_cosine_similarity(st.ve, se.ve), 6) AS cos_sim
      FROM cand c
      JOIN sig st ON st.vec_id = c.train_id
      JOIN sig se ON se.vec_id = c.eval_id
      WHERE ROUND(list_cosine_similarity(st.ve, se.ve), 6)
            >= {NEAR_DUP_THRESHOLD}
    )
    SELECT vec_id,
           CAST(COUNT(*) AS BIGINT) AS n_hits,
           ROUND(MAX(cos_sim), 6) AS max_cos
    FROM verified GROUP BY vec_id
    """,
)
def emb_decontaminate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding-level benchmark decontamination: flag every TRAIN vector
    whose cosine to ANY EVAL (benchmark) vector clears the near-dup
    threshold — the semantic counterpart of text_decontaminate's n-gram
    overlap (paraphrased benchmark questions share no 8-gram but sit at
    cosine ~1). Eval set = vec_id % 10 == 0, the held-out tenth; output
    is one row per contaminated train vector with its hit count and
    worst (highest) cosine.

    Plan (the 100 TB shape): the benchmark suite is TINY next to the
    training corpus — a few hundred thousand rows vs billions — so the
    eval side's bands AND vectors broadcast, and the train corpus is
    touched in ONE pass with map-side candidate generation + map-side
    verify: scan -> broadcast band join -> broadcast vector join ->
    filter -> per-train-vec agg. The only shuffle is the final
    aggregation on the (bounded, contaminated-only) hit set. Banding is
    the same {NEAR_DUP_BANDS}x{BAND_BITS} signature the near-dup family
    uses, so recall economics carry over (see emb_near_dup_pairs: wide
    bands for clustered corpora). Threshold {NEAR_DUP_THRESHOLD} is the
    non-vacuous top of this isotropic corpus's cosine distribution;
    production decontamination runs at 0.9+ where banding prunes hard.

    The oracle replays signatures, banding, the cross-set candidate
    join, and the rounded-cosine verify bit-for-bit (integer fixed-point
    projections — see signature_udf)."""
    e = spread(load_table(spark, sf_dir, "embeddings"))
    head = e.select("embedding").first()
    if head is None:  # empty corpus -> empty result, typed (no crash)
        return spark.createDataFrame(
            [], "vec_id long, n_hits long, max_cos double"
        )
    dim = len(head.embedding)
    sig = signature_udf(dim)
    is_eval = F.col("vec_id") % 10 == 0
    v_df = stage(
        e.select(
            "vec_id",
            as_double("embedding").alias("v"),
            is_eval.alias("is_eval"),
            sig("embedding").alias("bucket"),
        ),
        "decontam-sig",
    )
    band_bits = BAND_BITS
    bands = v_df.select(
        "vec_id",
        "is_eval",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(b).alias("band_id"),
                        F.substring(
                            "bucket", b * band_bits + 1, band_bits
                        ).alias("band_key"),
                    )
                    for b in range(NEAR_DUP_BANDS)
                ]
            )
        ).alias("band"),
    ).select("vec_id", "is_eval", "band.band_id", "band.band_key")
    train_bands = bands.filter(~F.col("is_eval")).select(
        F.col("vec_id").alias("train_id"), "band_id", "band_key"
    )
    eval_bands = bands.filter(F.col("is_eval")).select(
        F.col("vec_id").alias("eval_id"), "band_id", "band_key"
    )
    cand = (
        train_bands.join(F.broadcast(eval_bands), ["band_id", "band_key"])
        .select("train_id", "eval_id")
        .dropDuplicates(["train_id", "eval_id"])
    )
    tv = v_df.filter(~F.col("is_eval")).select(
        F.col("vec_id").alias("train_id"), F.col("v").alias("tv")
    )
    ev = v_df.filter(F.col("is_eval")).select(
        F.col("vec_id").alias("eval_id"), F.col("v").alias("evv")
    )
    cos_sim = F.round(cosine(F.col("tv"), F.col("evv")), 6)
    # Generate barrier: without it the threshold filter collapses into
    # the join condition and the full-dim cosine runs twice per
    # candidate row (see banded_near_dup_pairs).
    verified = (
        cand.join(tv, "train_id")
        .join(F.broadcast(ev), "eval_id")
        .select(
            F.col("train_id").alias("vec_id"),
            F.explode(F.array(cos_sim)).alias("cos_sim"),
        )
        .filter(F.col("cos_sim") >= NEAR_DUP_THRESHOLD)
    )
    return verified.groupBy("vec_id").agg(
        F.count(F.lit(1)).alias("n_hits"),
        F.round(F.max("cos_sim"), 6).alias("max_cos"),
    )
