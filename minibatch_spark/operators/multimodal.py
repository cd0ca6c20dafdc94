"""Multimodal column plumbing (north-star scope; ABSENT in the reference).

Images/audio/video are opaque ``binary`` columns plus typed metadata. The
decode/feature-extract step is a Pandas-UDF ``mapInPandas`` pipeline whose
Spark-side plumbing (schema, Arrow batch shape, partitioning) is real; the
actual codec is STUBBED deterministically because no image/audio libraries
exist in this container — swap `_fake_decode` for PIL/torchaudio in prod.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType,
    DoubleType,
    IntegerType,
    LongType,
    StructField,
    StructType,
)

from minibatch_spark.catalog import load_table, spread
from minibatch_spark.registry import query


@query(
    "multimodal_bytes",
    oracle="""
    SELECT doc_id,
           CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes,
           sha256(text) AS digest
    FROM documents
    """,
)
def multimodal_bytes(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Binary-column plumbing over a real table: utf-8 encode -> byte length
    + sha256 digest, all JVM-side. (documents.text stands in for a blob
    payload; the same expressions apply to a true BinaryType column read
    via spark.read.format('binaryFile').)"""
    d = spread(load_table(spark, sf_dir, "documents"))
    return d.select(
        "doc_id",
        F.octet_length("text").cast("long").alias("n_bytes"),
        F.sha2(F.col("text").cast("binary"), 256).alias("digest"),
    )


FEATURE_DIM = 8

_DECODE_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("width", IntegerType()),
        StructField("height", IntegerType()),
        StructField("features", ArrayType(DoubleType())),
    ]
)


def _fake_decode(blob: bytes) -> tuple[int, int, list[float]]:
    """Deterministic stand-in for an image decoder: md5-derived dimensions
    and an 8-dim feature vector. Replace with a real codec in prod:

        from PIL import Image  # not available in this container
        raise NotImplementedError("real decode requires PIL/libvips")

    Features are byte/255.0 in full double precision (no rounding) so the
    DuckDB oracle reproduces every value bit-for-bit from md5 hex.
    """
    h = hashlib.md5(blob).digest()
    width = 32 + h[0] % 224
    height = 32 + h[1] % 224
    feats = [b / 255.0 for b in h[2 : 2 + FEATURE_DIM]]
    return width, height, feats


def decode_features(df: DataFrame, blob_col: str, id_col: str) -> DataFrame:
    """mapInPandas decode pipeline: binary column -> (dims, feature vector).

    Arrow-batched — each pandas chunk holds many blobs; the UDF cost is
    per-batch Python dispatch + per-blob codec work, never per-row pickling.
    Partition count is preserved, so upstream repartitioning controls
    decode parallelism (at 100 TB: repartition to #cores x executors before
    this stage; blobs never shuffle afterwards).
    """

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            decoded = [_fake_decode(b) for b in pdf[blob_col]]
            yield pd.DataFrame(
                {
                    "doc_id": pdf[id_col].astype("int64"),
                    "width": [d[0] for d in decoded],
                    "height": [d[1] for d in decoded],
                    "features": [d[2] for d in decoded],
                }
            )

    return df.select(id_col, blob_col).mapInPandas(run, schema=_DECODE_SCHEMA)


@query(
    "multimodal_decode_stub",
    oracle="""
    WITH h AS (SELECT doc_id, md5(text) AS hx FROM documents)
    SELECT doc_id,
           CAST(32 + CAST(('0x' || substring(hx, 1, 2)) AS INTEGER) % 224
                AS INTEGER) AS width,
           CAST(32 + CAST(('0x' || substring(hx, 3, 2)) AS INTEGER) % 224
                AS INTEGER) AS height,
           CAST(d.d AS INTEGER) AS dim,
           CAST(('0x' || substring(hx, 5 + 2 * d.d, 2)) AS INTEGER) / 255.0
             AS value
    FROM h CROSS JOIN (SELECT unnest(generate_series(0, 7)) AS d) d
    """,
)
def multimodal_decode_stub(spark: SparkSession, sf_dir: str) -> DataFrame:
    """End-to-end multimodal pipeline on stand-in blobs: encode text ->
    binary -> mapInPandas decode (stubbed, deterministic) -> posexplode to
    scalar (doc_id, width, height, dim, value) rows the correctness harness
    can canonicalize. The md5-derived fake decode is reproduced by the
    DuckDB oracle from the same hex digest, so this is a full hash-checked
    row; decode determinism is additionally pinned in
    tests/test_multimodal.py."""
    d = spread(load_table(spark, sf_dir, "documents"))
    blobs = d.select("doc_id", F.col("text").cast("binary").alias("blob"))
    decoded = decode_features(blobs, "blob", "doc_id")
    return decoded.select(
        "doc_id",
        "width",
        "height",
        F.posexplode("features").alias("dim", "value"),
    ).withColumn("dim", F.col("dim").cast("int"))
