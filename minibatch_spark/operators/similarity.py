"""Similarity search over embedding columns (north-star scope; ABSENT in
the reference — it has no vector/array handling at all).

Embeddings are ``array<float>`` columns; all arithmetic casts to double and
runs as JVM higher-order functions (zip_with/aggregate) — no Python in the
scoring loop. Layers:

- brute-force cosine top-k: the exactness baseline. One broadcast of the
  query vector; linear scan, TakeOrdered k. Scales to 100 TB as a single
  pass with no shuffle.
- LSH-bucketed ANN (random-hyperplane signatures): candidate generation via
  signature-bucket join — the scale path when the query side is itself
  large (batch kNN joins).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from minibatch_spark.catalog import load_table
from minibatch_spark.operators.dedup import h64
from minibatch_spark.registry import query

N_PLANES = 16


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
    e = load_table(spark, sf_dir, "embeddings")
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
    e = load_table(spark, sf_dir, "embeddings")
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
    e = load_table(spark, sf_dir, "embeddings")
    qrow = e.orderBy("vec_id").select("vec_id", "embedding").first()
    qv = F.array(*[F.lit(float(x)) for x in qrow.embedding])
    sim = F.round(cosine(as_double("embedding"), qv), 6)
    return (
        e.filter(F.col("vec_id") != qrow.vec_id)
        .select("vec_id", "label", sim.alias("cos_sim"))
        .orderBy(F.desc("cos_sim"), F.asc("vec_id"))
        .limit(10)
    )


def hyperplane_signature(v: Column, dim: int, n_planes: int = N_PLANES) -> Column:
    """Random-hyperplane LSH signature as an n_planes-char sign bitstring.

    Plane weights are pseudo-random Rademacher (+1/-1) derived from
    md5(plane:dim) — deterministic across runs and engines, no RNG state.
    """
    bits = []
    for p in range(n_planes):
        signs = [
            1.0 if int(__import__("hashlib").md5(f"{p}:{d}".encode()).hexdigest()[:8], 16) % 2 == 0 else -1.0
            for d in range(dim)
        ]
        proj = F.aggregate(
            F.zip_with(
                v,
                F.array(*[F.lit(s) for s in signs]),
                lambda x, w: x * w,
            ),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )
        bits.append(F.when(proj >= 0, F.lit("1")).otherwise(F.lit("0")))
    return F.concat(*bits)


@query("ann_lsh_buckets")  # signature assignment; recall vs brute force in tests
def ann_lsh_buckets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Random-hyperplane LSH bucket assignment (16 planes -> 16-bit sign
    signature). Bucketing the corpus by signature turns kNN into a
    per-bucket (plus neighboring-signature) search: candidate generation is
    a bucket-key join, never a cross join. Rows-only check here; recall vs
    ann_topk_bruteforce is asserted in tests/test_similarity.py."""
    e = load_table(spark, sf_dir, "embeddings")
    dim = len(e.select("embedding").first().embedding)
    # stage the double-cast vector so the 16 plane projections read an
    # attribute, not 16 copies of the cast expression
    v_df = e.select("vec_id", "label", as_double("embedding").alias("v"))
    return v_df.select(
        "vec_id", "label", hyperplane_signature(F.col("v"), dim).alias("bucket")
    )


@query("emb_near_dup_pairs")  # quadratic verify stage; bucketed at scale
def emb_near_dup_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding near-duplicate pairs: cosine >= 0.99 within LSH buckets.
    Bucket first (linear), pair only within buckets — the O(n^2) stays
    inside buckets. Rows-only check; exactness covered by tests comparing
    against the unbucketed small-scale ground truth."""
    e = load_table(spark, sf_dir, "embeddings")
    dim = len(e.select("embedding").first().embedding)
    v_df = e.select("vec_id", as_double("embedding").alias("v"))
    b = v_df.select(
        "vec_id", hyperplane_signature(F.col("v"), dim).alias("bucket"), "v"
    ).localCheckpoint(eager=False)
    a_, b_ = b.alias("a"), b.alias("b")
    sim = cosine(F.col("a.v"), F.col("b.v"))
    return (
        a_.join(
            b_,
            (F.col("a.bucket") == F.col("b.bucket"))
            & (F.col("a.vec_id") < F.col("b.vec_id")),
        )
        .select(
            F.col("a.vec_id").alias("vec_a"),
            F.col("b.vec_id").alias("vec_b"),
            F.round(sim, 6).alias("cos_sim"),
        )
        .filter(F.col("cos_sim") >= 0.99)
    )
