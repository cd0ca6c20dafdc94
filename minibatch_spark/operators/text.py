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
