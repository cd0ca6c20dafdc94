"""Python UDTF surface (SURVEY §2.11 — ABSENT in the reference; Spark
3.5+ ``@udtf``). One representative table function: explode a document
into (position, token, is_stopword) rows.

This exists to COVER the UDTF extension point, not for the hot path —
the same result is expressible with posexplode over split() (JVM-side,
an order of magnitude cheaper; see operators/text.py). Use a UDTF only
when per-row fan-out needs Python logic built-ins cannot express
(external tokenizers, model-driven span extraction)."""

from __future__ import annotations

from pyspark.sql.functions import udtf

STOPWORDS = ("the", "a", "of", "and", "to", "in", "is", "it")


@udtf(returnType="pos int, token string, is_stopword boolean")
class TokenizeDoc:
    """LATERAL-joinable table function: one row per whitespace token."""

    def eval(self, text: str):
        if text is None:
            return
        for pos, tok in enumerate(text.split()):
            yield pos, tok, tok in STOPWORDS


def register_udtfs(spark) -> None:
    """Register engine UDTFs for SQL use: ``SELECT t.* FROM docs,
    LATERAL tokenize_doc(text) t``."""
    spark.udtf.register("tokenize_doc", TokenizeDoc)
