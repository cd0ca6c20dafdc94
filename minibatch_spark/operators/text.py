"""Text-analysis operators for training-data pipelines (north-star scope;
ABSENT in the reference — its only text handling is JSON codec at connector
edges, minibatch/contrib/kafka.py:26,81).

Everything here is JVM-side Column expressions (split/regexp/array lambdas)
— no Python UDFs in the hot path — so the per-document cost is whole-stage
codegen and the operators scale linearly with document count, shuffle-free
until the final (tiny) aggregate if any.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from minibatch_spark.catalog import load_table, spread
from minibatch_spark.operators.dedup import tokens
from minibatch_spark.registry import query

# Tiny embedded stopword list (deterministic, mirrored in oracle SQL).
STOPWORDS = ("the", "a", "of", "and", "to", "in", "is", "it")
_SW_SQL = "(" + ", ".join(f"'{w}'" for w in STOPWORDS) + ")"


@query(
    "text_token_stats",
    oracle=f"""
    WITH toks AS (
      SELECT doc_id, n_chars,
             regexp_split_to_array(trim(text), '\\s+') AS t
      FROM documents
    )
    SELECT doc_id,
           CAST(len(t) AS BIGINT) AS n_tokens,
           CAST(len(list_distinct(t)) AS BIGINT) AS n_unique,
           ROUND(CAST(list_sum(list_transform(t, x -> length(x))) AS DOUBLE)
                 / len(t), 6) AS avg_token_len,
           ROUND(CAST(len(list_distinct(t)) AS DOUBLE) / len(t), 6)
             AS type_token_ratio
    FROM toks
    """,
)
def text_token_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token counting + lexical-diversity stats per document."""
    d = spread(load_table(spark, sf_dir, "documents"))
    # stage tokens once: HOFs are CodegenFallback (no CSE), so an inline
    # tokens() here would re-run split() ~4x per row
    staged = d.select("doc_id", tokens("text").alias("t"))
    t = F.col("t")
    n = F.size(t).cast("long")
    n_uniq = F.size(F.array_distinct(t)).cast("long")
    total_len = F.aggregate(t, F.lit(0), lambda acc, x: acc + F.length(x))
    return staged.select(
        "doc_id",
        n.alias("n_tokens"),
        n_uniq.alias("n_unique"),
        F.round(total_len.cast("double") / n, 6).alias("avg_token_len"),
        F.round(n_uniq.cast("double") / n, 6).alias("type_token_ratio"),
    )


@query(
    "text_quality_score",
    oracle=f"""
    WITH toks AS (
      SELECT doc_id, lang, n_chars,
             regexp_split_to_array(trim(text), '\\s+') AS t
      FROM documents
    )
    SELECT doc_id,
           ROUND(CAST(len(list_filter(t, x -> x IN {_SW_SQL})) AS DOUBLE)
                 / len(t), 6) AS stopword_ratio,
           CASE WHEN len(t) BETWEEN 5 AND 5000
                 AND CAST(len(list_filter(t, x -> x IN {_SW_SQL})) AS DOUBLE)
                     / len(t) BETWEEN 0.01 AND 0.6
                THEN 1 ELSE 0 END AS quality_ok
    FROM toks
    """,
)
def text_quality_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Heuristic quality gate (Gopher-rules style): doc length bounds +
    stopword-ratio band. Emits the ratio and a 0/1 keep flag."""
    d = spread(load_table(spark, sf_dir, "documents"))
    staged = d.select("doc_id", tokens("text").alias("t"))
    t = F.col("t")
    n = F.size(t)
    n_stop = F.size(F.filter(t, lambda x: x.isin(*STOPWORDS)))
    ratio = F.round(n_stop.cast("double") / n, 6)
    ok = F.when(
        n.between(5, 5000) & (n_stop.cast("double") / n).between(0.01, 0.6),
        1,
    ).otherwise(0)
    return staged.select(
        "doc_id",
        ratio.alias("stopword_ratio"),
        ok.alias("quality_ok"),
    )


@query(
    "text_langid",
    oracle=f"""
    WITH toks AS (
      SELECT doc_id, lang,
             regexp_split_to_array(trim(text), '\\s+') AS t
      FROM documents
    )
    SELECT doc_id, lang AS labeled_lang,
           CASE WHEN CAST(len(list_filter(t, x -> x IN {_SW_SQL})) AS DOUBLE)
                     / len(t) >= 0.05
                THEN 'en' ELSE 'other' END AS predicted_lang
    FROM toks
    """,
)
def text_langid(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Language-ID heuristic: English-stopword density >= 5% -> 'en'.
    (A real n-gram model slots in here as a broadcast lookup table; the
    plumbing — per-doc token profile vs reference profile — is identical.)"""
    d = spread(load_table(spark, sf_dir, "documents"))
    staged = d.select("doc_id", "lang", tokens("text").alias("t"))
    t = F.col("t")
    ratio = F.size(F.filter(t, lambda x: x.isin(*STOPWORDS))).cast("double") / F.size(t)
    return staged.select(
        "doc_id",
        F.col("lang").alias("labeled_lang"),
        F.when(ratio >= 0.05, "en").otherwise("other").alias("predicted_lang"),
    )


@query(
    "text_top_bigrams",
    oracle="""
    WITH toks AS (
      SELECT regexp_split_to_array(trim(text), '\\s+') AS t FROM documents
    ), grams AS (
      SELECT unnest(list_transform(
               generate_series(1, greatest(len(t) - 1, 0)),
               i -> t[i] || ' ' || t[i+1])) AS bigram
      FROM toks
    )
    SELECT bigram, COUNT(*) AS n
    FROM grams
    GROUP BY bigram
    ORDER BY n DESC, bigram
    LIMIT 20
    """,
)
def text_top_bigrams(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus-level top-20 bigrams: per-doc n-gram expansion (flat array
    transform, no shuffle) -> hash agg -> TakeOrdered top-k."""
    d = spread(load_table(spark, sf_dir, "documents"))
    staged = d.select(tokens("text").alias("t"))
    t = F.col("t")
    # zip_with over a shifted slice — no outer column refs inside the lambda
    # (those re-evaluate tokenization per element, O(n^2) per doc)
    grams = F.filter(
        F.zip_with(
            t,
            F.slice(t, 2, F.greatest(F.size(t) - 1, F.lit(0))),
            lambda a, b: F.concat(a, F.lit(" "), b),
        ),
        lambda g: g.isNotNull(),
    )
    return (
        staged.select(F.explode(grams).alias("bigram"))
        .groupBy("bigram")
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy(F.desc("n"), F.asc("bigram"))
        .limit(20)
    )


# GPT-2-style pre-tokenizer pattern, restricted to constructs shared by
# Java regex (Spark) and RE2 (DuckDB): no lookahead/lookbehind.
BPE_PATTERN = " ?[a-z]+| ?[0-9]+| ?[^a-z0-9 ]+"


@query(
    "text_bpe_tokens",
    oracle=f"""
    SELECT doc_id,
           CAST(len(regexp_extract_all(text, '{BPE_PATTERN}')) AS INTEGER)
             AS n_bpe_tokens,
           CAST(len(regexp_split_to_array(trim(text), '\\s+')) AS INTEGER)
             AS n_ws_tokens,
           ROUND(CAST(len(regexp_extract_all(text, '{BPE_PATTERN}')) AS DOUBLE)
                 / greatest(n_chars, 1), 6) AS tokens_per_char
    FROM documents
    """,
)
def text_bpe_tokens(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BPE-ish token counting: a GPT-2-style regex pre-tokenizer (space-
    prefixed word / number / punctuation runs) next to the whitespace
    count — the cost estimator a training pipeline runs before the real
    (vocab-dependent) tokenizer. The pattern avoids lookahead so Java
    regex and RE2 (DuckDB) agree byte-for-byte."""
    d = spread(load_table(spark, sf_dir, "documents"))
    bpe = F.regexp_extract_all("text", F.lit(BPE_PATTERN), 0)
    return d.select(
        "doc_id",
        F.size(bpe).alias("n_bpe_tokens"),
        F.size(tokens("text")).alias("n_ws_tokens"),
        F.round(
            F.size(bpe).cast("double") / F.greatest(F.col("n_chars"), F.lit(1)), 6
        ).alias("tokens_per_char"),
    )


WINNOW_K = 8  # char-gram length
WINNOW_W = 4  # winnowing window (hashes per window)


@query(
    "text_winnow_fingerprint",
    oracle=f"""
    WITH grams AS (
      SELECT doc_id,
             list_transform(
               generate_series(1, greatest(length(text) - {WINNOW_K} + 1, 0)),
               i -> CAST(('0x' || substring(md5(substring(text, i, {WINNOW_K})), 1, 15))
                         AS BIGINT)) AS hs
      FROM documents
    ), fps AS (
      SELECT doc_id,
             list_distinct(list_transform(
               generate_series(1, greatest(len(hs) - {WINNOW_W} + 1, 0)),
               j -> list_min(hs[j : j + {WINNOW_W} - 1]))) AS fp
      FROM grams
    )
    SELECT doc_id,
           CAST(len(fp) AS INTEGER) AS n_fp,
           list_min(fp) AS fp_min,
           list_max(fp) AS fp_max
    FROM fps
    WHERE len(fp) > 0
    """,
)
def text_winnow_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Document fingerprinting by WINNOWING (Schleimer et al., SIGMOD'03):
    rolling char 8-gram hashes -> min per sliding window of 4 -> distinct
    window-minima are the fingerprint set. Guarantees any shared substring
    of length >= k + w - 1 produces a shared fingerprint — the plagiarism/
    near-dup detection primitive. All md5-derived, per-row, shuffle-free;
    the oracle replays it exactly (summary stats per doc keep the output
    scalar-hashable)."""
    d = spread(load_table(spark, sf_dir, "documents"))
    hs = F.expr(
        f"transform(sequence(1, greatest(length(text) - {WINNOW_K} + 1, 0)),"
        f" i -> cast(conv(substring(md5(substring(text, i, {WINNOW_K})), 1, 15), 16, 10) as bigint))"
    )
    staged = d.select("doc_id", hs.alias("hs"))
    fp = F.expr(
        f"array_distinct(transform(sequence(1, greatest(size(hs) - {WINNOW_W} + 1, 0)),"
        f" j -> array_min(slice(hs, j, {WINNOW_W}))))"
    )
    return (
        staged.select("doc_id", fp.alias("fp"))
        .filter(F.size("fp") > 0)
        .select(
            "doc_id",
            F.size("fp").alias("n_fp"),
            F.array_min("fp").alias("fp_min"),
            F.array_max("fp").alias("fp_max"),
        )
    )


@query(
    "docs_filter_pipeline",
    oracle=f"""
    WITH toks AS (
      SELECT doc_id, md5(text) AS th,
             regexp_split_to_array(trim(text), '\\s+') AS t
      FROM documents
    ), flags AS (
      SELECT doc_id,
             CAST(len(list_filter(t, x -> x IN {_SW_SQL})) AS DOUBLE)
               / len(t) AS swr,
             len(t) AS n,
             MIN(doc_id) OVER (PARTITION BY th) AS rep_id
      FROM toks
    )
    SELECT doc_id,
           CASE WHEN n BETWEEN 5 AND 5000 AND swr BETWEEN 0.01 AND 0.6
                THEN 1 ELSE 0 END AS quality_ok,
           CASE WHEN swr >= 0.05 THEN 1 ELSE 0 END AS is_en,
           CASE WHEN doc_id = rep_id THEN 1 ELSE 0 END AS is_canonical,
           CASE WHEN n BETWEEN 5 AND 5000 AND swr BETWEEN 0.01 AND 0.6
                 AND swr >= 0.05 AND doc_id = rep_id
                THEN 1 ELSE 0 END AS keep
    FROM flags
    """,
)
def docs_filter_pipeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    """END-TO-END training-data curation decision, one row per document:
    the composed pipeline (quality gate ∘ language filter ∘ exact-dedup
    canonicalization) every LLM data run applies before tokenization.

    Plan shape: the three stages FUSE — quality and langid are pure
    per-row column math (whole-stage codegen, zero shuffle) layered onto
    the ONE shuffle the dedup step needs (hash-partition by md5(text) for
    the per-group min window). At 100 TB that is a single exchange of
    (16-byte hash, doc_id) pairs; the texts themselves never move. The
    boolean reason columns make the filter auditable — a kept/dropped
    decision can be traced to the gate that made it."""
    from pyspark.sql import Window

    d = spread(load_table(spark, sf_dir, "documents"))
    staged = d.select("doc_id", F.md5("text").alias("th"), tokens("text").alias("t"))
    t = F.col("t")
    n = F.size(t)
    swr = F.size(F.filter(t, lambda x: x.isin(*STOPWORDS))).cast("double") / n
    flags = staged.select(
        "doc_id",
        swr.alias("swr"),
        n.alias("n"),
        F.min("doc_id").over(Window.partitionBy("th")).alias("rep_id"),
    )
    quality = F.col("n").between(5, 5000) & F.col("swr").between(0.01, 0.6)
    is_en = F.col("swr") >= 0.05
    canon = F.col("doc_id") == F.col("rep_id")
    as_int = lambda c: F.when(c, 1).otherwise(0)  # noqa: E731
    return flags.select(
        "doc_id",
        as_int(quality).alias("quality_ok"),
        as_int(is_en).alias("is_en"),
        as_int(canon).alias("is_canonical"),
        as_int(quality & is_en & canon).alias("keep"),
    )
