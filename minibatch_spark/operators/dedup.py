"""Deduplication operators for training-data pipelines (north-star scope;
not present in the reference — SURVEY.md §2.12).

Exact, fingerprint, MinHash-LSH, n-gram Jaccard, and SimHash dedup over the
``documents`` table. Scale stance (100 TB):

- exact/fingerprint: one hash-groupBy shuffle on a 16-byte key; map-side
  partial agg collapses duplicates before the wire.
- MinHash-LSH: signatures are computed per-row (no shuffle), candidate
  generation shuffles on (band_id, band_hash) buckets — cost is
  O(rows x bands), never O(rows^2).
- n-gram Jaccard verification joins only within candidate buckets.

All hashing is md5-based so the DuckDB oracle can reproduce signatures
bit-for-bit (md5 is engine-independent; Spark conv(hex,16,10) ==
DuckDB CAST('0x'||hex AS BIGINT) for 15-hex-digit prefixes < 2^60).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from minibatch_spark.catalog import load_table
from minibatch_spark.registry import query

N_MINHASH = 16  # permutations
N_BANDS = 4  # 4 rows per band -> LSH threshold ~ (1/4)^(1/4) ~ 0.71
SHINGLE_K = 3


def tokens(col: str | Column) -> Column:
    """Whitespace tokenization of already-normalized text."""
    c = F.col(col) if isinstance(col, str) else col
    return F.split(F.trim(c), r"\s+")


def shingles(col: str | Column, k: int = SHINGLE_K) -> Column:
    """Distinct k-gram word shingles: set semantics for Jaccard.

    Built with zip_with over sliced copies of the token array — NEVER with
    an outer column reference inside a lambda: Spark re-evaluates captured
    expressions per array element, which turns tokenization into O(n^2)
    per document (measured 8x wall-time blowup on the 5k-doc corpus).
    zip_with pads the shorter (shifted) side with null; F.concat propagates
    the null, and the final filter drops the incomplete tail grams.
    """
    toks = tokens(col)
    grams = toks
    for j in range(1, k):
        shifted = F.slice(
            toks, j + 1, F.greatest(F.size(toks) - j, F.lit(0))
        )
        grams = F.zip_with(grams, shifted, lambda a, b: F.concat(a, F.lit(" "), b))
    return F.array_distinct(F.filter(grams, lambda g: g.isNotNull()))


def h64(c: Column) -> Column:
    """Deterministic 60-bit hash reproducible in DuckDB:
    first 15 hex chars of md5 -> bigint."""
    return F.conv(F.substring(F.md5(c), 1, 15), 16, 10).cast("long")


def _seeded_hash(i: int):
    # closure factory, NOT `lambda s, i=i`: a 2-param lambda would make
    # F.transform pass the array index as the second argument
    return lambda s: h64(F.concat(F.lit(f"{i}:"), s))


def minhash_sig(shingle_col: Column, n: int = N_MINHASH) -> Column:
    """MinHash signature: for seed i, min over shingles of h64(i || s).
    array<long> of length n; rows with no shingles get nulls."""
    return F.array(
        *[
            F.array_min(F.transform(shingle_col, _seeded_hash(i))).alias(f"mh{i}")
            for i in range(n)
        ]
    )


@query(
    "dedup_exact",
    oracle="""
    SELECT md5(text) AS text_hash,
           COUNT(*) AS n_copies,
           MIN(doc_id) AS keep_doc_id
    FROM documents
    GROUP BY md5(text)
    """,
)
def dedup_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact dedup by content hash: keep lowest doc_id per identical text.
    Group on md5(text) (16 bytes) instead of the text itself so the shuffle
    carries fixed-width keys — at 100 TB this is the difference between
    shuffling hashes and shuffling documents."""
    d = load_table(spark, sf_dir, "documents")
    return d.groupBy(F.md5("text").alias("text_hash")).agg(
        F.count(F.lit(1)).alias("n_copies"),
        F.min("doc_id").alias("keep_doc_id"),
    )


@query(
    "dedup_fingerprint",
    oracle="""
    SELECT md5(array_to_string(list_sort(list_distinct(
             regexp_split_to_array(trim(text), '\\s+'))), ' ')) AS fingerprint,
           COUNT(*) AS n_docs,
           MIN(doc_id) AS keep_doc_id
    FROM documents
    GROUP BY 1
    """,
)
def dedup_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bag-of-words document fingerprint: md5 over the sorted distinct token
    set — catches token-order permutations that exact dedup misses."""
    d = load_table(spark, sf_dir, "documents")
    fp = F.md5(F.concat_ws(" ", F.array_sort(F.array_distinct(tokens("text")))))
    return d.groupBy(fp.alias("fingerprint")).agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.min("doc_id").alias("keep_doc_id"),
    )


@query(
    "dedup_minhash_signatures",
    oracle="""
    WITH sh AS (
      SELECT doc_id,
             unnest(list_distinct(list_transform(
               generate_series(1, greatest(len(regexp_split_to_array(trim(text), '\\s+')) - 2, 0)),
               i -> regexp_split_to_array(trim(text), '\\s+')[i] || ' ' ||
                    regexp_split_to_array(trim(text), '\\s+')[i+1] || ' ' ||
                    regexp_split_to_array(trim(text), '\\s+')[i+2]))) AS sh
      FROM documents
      WHERE len(regexp_split_to_array(trim(text), '\\s+')) >= 3
    )
    SELECT doc_id,
      {MINS}
    FROM sh
    GROUP BY doc_id
    """.replace(
        "{MINS}",
        ",\n      ".join(
            "MIN(CAST(('0x' || substring(md5('%d:' || sh), 1, 15)) AS BIGINT)) AS mh%d"
            % (i, i)
            for i in range(N_MINHASH)
        ),
    ),
)
def dedup_minhash_signatures(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MinHash signatures (16 permutations over 3-gram shingles), one row per
    document, columns mh0..mh15. Fully deterministic and engine-independent
    (md5-derived), so the oracle reproduces every signature value."""
    d = load_table(spark, sf_dir, "documents").filter(F.size(tokens("text")) >= 3)
    # staged projections: shingle array materializes once per row, then the
    # 16 per-seed transforms read it as a cheap attribute reference
    sh_df = d.select("doc_id", shingles("text").alias("sh"))
    sig_df = sh_df.select("doc_id", minhash_sig(F.col("sh")).alias("sig"))
    return sig_df.select(
        "doc_id",
        *[F.element_at("sig", i + 1).alias(f"mh{i}") for i in range(N_MINHASH)],
    )


# Universal-hash MinHash permutations over the Mersenne prime 2^31-1:
# h_i = (a_i * h + b_i) mod p with h, a_i, b_i < 2^31, so every product
# stays under 2^62 — no ANSI long-overflow, fully deterministic.
_MINHASH_P = 2147483647  # 2^31 - 1
_PERM_PARAMS = [
    (
        (0x9E3779B9 * (2 * i + 1)) % _MINHASH_P or 1,
        (0xD1B54A33 * (i + 1)) % _MINHASH_P,
    )
    for i in range(N_MINHASH)
]


def _perm(i: int):
    a, b = _PERM_PARAMS[i]
    return lambda h: F.pmod(h * F.lit(a) + F.lit(b), F.lit(_MINHASH_P))


def shingle_hashes(shingle_col: Column) -> Column:
    """One xxhash64 (JVM codegen) per shingle, reduced mod 2^31-1."""
    return F.transform(shingle_col, lambda s: F.pmod(F.xxhash64(s), F.lit(_MINHASH_P)))


def fast_minhash_sig(hash_col: Column, n: int = N_MINHASH) -> Column:
    """Scale-path MinHash over pre-materialized shingle hashes: n multiply-
    add permutations + array_min. hash_col MUST be a materialized column
    (attribute), not an inline expression — each of the n transforms reads
    it, and inline expressions re-evaluate per use."""
    return F.array(*[F.array_min(F.transform(hash_col, _perm(i))) for i in range(n)])


@query("dedup_minhash_pairs")  # LSH banding + verify: not ANSI-SQL friendly -> rows-only
def dedup_minhash_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Near-duplicate candidate pairs via MinHash-LSH banding.

    sig (16 mins) -> 4 bands of 4 -> md5 band key -> self-join per bucket ->
    estimated Jaccard = fraction of matching signature components >= 0.5.
    The bucket join is the scale path: candidate generation cost is
    O(rows x bands) shuffle, pairs only materialize within buckets.
    Verified against exact n-gram Jaccard in tests/test_dedup.py.
    """
    d = load_table(spark, sf_dir, "documents")
    # Staged pipeline (text -> shingles -> hashes -> signature), then a
    # localCheckpoint barrier: both sides of the self-join (and every band
    # struct) read the materialized 1-row-per-doc signature table instead of
    # recomputing from raw text. At 100 TB this is the natural "write
    # signatures, then join" stage split.
    sh_df = d.select("doc_id", shingles("text").alias("sh"))
    h_df = sh_df.select("doc_id", shingle_hashes(F.col("sh")).alias("hs"))
    sig_df = h_df.select(
        "doc_id", fast_minhash_sig(F.col("hs")).alias("sig")
    ).localCheckpoint(eager=False)

    bands = sig_df.select(
        "doc_id",
        "sig",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(b).alias("band_id"),
                        F.md5(
                            F.concat_ws(
                                ",", *[F.element_at("sig", b * 4 + j + 1) for j in range(4)]
                            )
                        ).alias("band_key"),
                    )
                    for b in range(N_BANDS)
                ]
            )
        ).alias("band"),
    ).select("doc_id", "sig", "band.band_id", "band.band_key")

    left = bands.alias("a")
    right = bands.alias("b")
    cand = (
        left.join(
            right,
            (F.col("a.band_id") == F.col("b.band_id"))
            & (F.col("a.band_key") == F.col("b.band_key"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(
            F.col("a.doc_id").alias("doc_a"),
            F.col("b.doc_id").alias("doc_b"),
            F.col("a.sig").alias("sig_a"),
            F.col("b.sig").alias("sig_b"),
        )
        .dropDuplicates(["doc_a", "doc_b"])
    )
    est = (
        F.size(
            F.filter(
                F.zip_with("sig_a", "sig_b", lambda x, y: x == y),
                lambda m: m,
            )
        )
        / F.lit(N_MINHASH)
    )
    return (
        cand.select("doc_a", "doc_b", est.alias("est_jaccard"))
        .filter(F.col("est_jaccard") >= 0.5)
    )


@query(
    "dedup_ngram_jaccard",
    oracle="""
    WITH sh AS (
      SELECT doc_id,
             unnest(list_distinct(list_transform(
               generate_series(1, greatest(len(regexp_split_to_array(trim(text), '\\s+')) - 2, 0)),
               i -> regexp_split_to_array(trim(text), '\\s+')[i] || ' ' ||
                    regexp_split_to_array(trim(text), '\\s+')[i+1] || ' ' ||
                    regexp_split_to_array(trim(text), '\\s+')[i+2]))) AS sh
      FROM documents
    ), sizes AS (
      SELECT doc_id, COUNT(*) AS n FROM sh GROUP BY doc_id
    ), inter AS (
      SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, COUNT(*) AS n_common
      FROM sh a JOIN sh b ON a.sh = b.sh AND a.doc_id < b.doc_id
      GROUP BY a.doc_id, b.doc_id
    )
    SELECT doc_a, doc_b,
           ROUND(CAST(n_common AS DOUBLE) /
                 (sa.n + sb.n - n_common), 6) AS jaccard
    FROM inter
    JOIN sizes sa ON sa.doc_id = doc_a
    JOIN sizes sb ON sb.doc_id = doc_b
    WHERE CAST(n_common AS DOUBLE) / (sa.n + sb.n - n_common) >= 0.8
    """,
)
def dedup_ngram_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact 3-gram Jaccard near-dup pairs (threshold 0.8) via inverted-index
    self-join on shingles: explode -> join on shingle -> count intersections
    -> Jaccard from |A|+|B|-|A∩B|. Pairs only materialize for docs sharing
    >=1 shingle; at scale this is the verify stage downstream of LSH
    blocking (dedup_minhash_pairs), never run unblocked on 100 TB."""
    d = load_table(spark, sf_dir, "documents")
    sh = d.select("doc_id", F.explode(shingles("text")).alias("sh"))
    sizes = sh.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n"))
    a, b = sh.alias("a"), sh.alias("b")
    inter = (
        a.join(b, (F.col("a.sh") == F.col("b.sh")) & (F.col("a.doc_id") < F.col("b.doc_id")))
        .groupBy(F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b"))
        .agg(F.count(F.lit(1)).alias("n_common"))
    )
    sa = sizes.alias("sa")
    sb = sizes.alias("sb")
    jac = F.col("n_common").cast("double") / (
        F.col("sa.n") + F.col("sb.n") - F.col("n_common")
    )
    return (
        inter.join(F.broadcast(sa), F.col("doc_a") == F.col("sa.doc_id"))
        .join(F.broadcast(sb), F.col("doc_b") == F.col("sb.doc_id"))
        .filter(jac >= 0.8)
        .select("doc_a", "doc_b", F.round(jac, 6).alias("jaccard"))
    )


@query("dedup_simhash")  # bit-twiddling UDF-free simhash; python oracle in tests
def dedup_simhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """64-bit SimHash per document, JVM-side only: token -> h64 hash ->
    per-bit +1/-1 vote -> sign vector -> packed bigint. Near-dup candidates
    are docs whose simhash Hamming distance <= 3 (checked in tests; the
    packed value itself is the query output here).

    Deterministic but not ANSI-SQL-expressible (64 per-bit popcount votes);
    verified against a pure-Python oracle in tests/test_dedup.py.
    """
    d = load_table(spark, sf_dir, "documents")
    # explode -> hash once per (doc, token) -> 60 codegen'd SUM aggregates.
    # (The array-fold formulation re-evaluates the hash array per bit — 60x
    # the work in interpreted HOF eval; grouped SUMs stay in whole-stage
    # codegen and get map-side partial aggregation at scale.)
    toks_df = d.select(
        "doc_id", F.explode(F.array_distinct(tokens("text"))).alias("tok")
    )
    h_df = toks_df.select("doc_id", h64(F.col("tok")).alias("h"))
    agg_df = h_df.groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("n"),
        *[
            F.sum(F.shiftright(F.col("h"), i).bitwiseAND(F.lit(1))).alias(f"v{i}")
            for i in range(60)
        ],
    )
    packed = None
    for i in range(60):
        bit = (
            F.when(F.col(f"v{i}") * 2 > F.col("n"), F.lit(1))
            .otherwise(F.lit(0))
            .cast("long")
        )
        term = F.shiftleft(bit, i)
        packed = term if packed is None else packed + term
    return agg_df.select("doc_id", packed.alias("simhash"))
