"""Similarity-search walkthrough: the persisted IVF index lifecycle the
way a production pipeline runs it — build on the first corpus drop,
append later arrivals against the frozen quantizer, answer top-k batches
from the partition-pruned store, then the same thing streaming.

Run:  python examples/ann_index_pipeline.py  [SF_DIR=/root/testdata/sf0.001]
"""

import os
import sys
import tempfile

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from pyspark.sql import functions as F  # noqa: E402

from minibatch_spark.catalog import load_table  # noqa: E402
from minibatch_spark.operators.ivf_store import IvfIndexStore  # noqa: E402
from minibatch_spark.operators.similarity import as_double  # noqa: E402
from minibatch_spark.session import get_spark  # noqa: E402
from minibatch_spark.streaming.ivf_stream import (  # noqa: E402
    ingest_embedding_stream,
)


def main() -> None:
    spark = get_spark()
    sf = os.environ.get("SF_DIR", "/root/testdata/sf0.001")
    base = tempfile.mkdtemp(prefix="ann-example-")

    v = load_table(spark, sf, "embeddings").select(
        "vec_id", as_double("embedding").alias("ve")
    )
    lo, hi = v.agg(F.min("vec_id"), F.max("vec_id")).first()
    mid = (int(lo) + int(hi)) // 2

    # -- batch lifecycle: build on the first drop, append the next -------
    store = IvfIndexStore(spark, os.path.join(base, "store"))
    store.build(v.filter(F.col("vec_id") <= mid))       # trains + freezes
    store.append(v.filter(F.col("vec_id") > mid))       # assigns, no retrain
    print(f"indexed {store.vectors().count()} vectors "
          f"into {store.centroids().count()} cells")

    # -- a top-k batch: probes carry literal cell ids -> partition pruning
    q = (
        v.orderBy("vec_id").limit(3)
        .select(F.col("vec_id").alias("query_id"), F.col("ve").alias("qv"))
    )
    store.topk(q, k=3, nprobe=2).show(truncate=False)

    # -- the memory-bounded path: ADC over the persisted 8-byte PQ codes
    # (reads codes, never the vectors — column + partition pruning)
    store.topk_adc(q, k=3, nprobe=2).show(truncate=False)

    # -- the same index built from a stream, exactly once -----------------
    src = os.path.join(base, "src")
    for i, half in enumerate(
        (v.filter(F.col("vec_id") <= mid), v.filter(F.col("vec_id") > mid))
    ):
        half.coalesce(1).write.parquet(os.path.join(src, f"p{i}"))
    stream = (
        spark.readStream.schema("vec_id long, ve array<double>")
        .option("maxFilesPerTrigger", 1)
        .parquet(src + "/*")
    )
    ingest_embedding_stream(
        spark, stream, os.path.join(base, "streamed"),
        os.path.join(base, "ckpt"),
    ).awaitTermination()
    streamed = IvfIndexStore(spark, os.path.join(base, "streamed"))
    print(f"streamed index: {streamed.vectors().count()} vectors "
          f"(bit-identical to the batch store — see tests/test_streaming_ivf.py)")


if __name__ == "__main__":
    main()
