"""Training-data curation walkthrough: the LLM-pipeline operators composed
the way a data run uses them — quality gates, dedup decisions,
benchmark decontamination, stratified sampling — over the test corpus.

Run:  python examples/curation_pipeline.py  [SF_DIR=/root/testdata/sf0.001]
"""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from pyspark.sql import functions as F  # noqa: E402

from minibatch_spark.registry import all_queries  # noqa: E402
from minibatch_spark.session import get_spark  # noqa: E402


def main() -> None:
    spark = get_spark()
    sf = os.environ.get("SF_DIR", "/root/testdata/sf0.001")
    q = all_queries()

    decisions = q["docs_filter_pipeline"](spark, sf)   # quality ∘ langid ∘ dedup
    contam = q["text_decontaminate"](spark, sf)        # benchmark n-gram overlap
    sample = q["docs_sample_stratified"](spark, sf)    # per-source mixing rates

    kept = (
        decisions.filter(F.col("keep") == 1)
        .join(contam.filter(F.col("contaminated") == 0), "doc_id", "left_semi")
    )
    n_docs = decisions.count()
    print(f"corpus: {n_docs} docs")
    print(f"pass quality+lang+dedup: {decisions.filter('keep = 1').count()}")
    print(f"...and not benchmark-contaminated: {kept.count()}")
    print("per-source sampling rates:")
    for r in sample.orderBy("source").collect()[:5]:
        print(f"  {r.source}: kept {r.n_kept}/{r.n_total} ({r.kept_frac})")

    # the whole run as ONE composed, oracle-backed operator: quality gate
    # -> keep-best near-dup collapse -> leakage-safe cluster-hashed split
    # -> realized mixture report
    print("curate_corpus — final mixture per (split, source):")
    for r in q["curate_corpus"](spark, sf).collect():
        print(
            f"  {r.split:>10} {r.source}: {r.n_docs} docs, "
            f"{r.tokens} tokens ({r.token_share:.1%})"
        )

    # the SAME pipeline on the streaming path — shard-by-shard ingest
    # into a persisted curation store, report on demand. Bit-identical to
    # the batch run above (pinned by tests/test_streaming_curate.py);
    # arrival order doesn't matter.
    import tempfile

    from minibatch_spark.catalog import load_table
    from minibatch_spark.streaming.curate_stream import CurateStore

    with tempfile.TemporaryDirectory() as tmp:
        store = CurateStore(spark, os.path.join(tmp, "curate-store"))
        docs = load_table(spark, sf, "documents").select(
            "doc_id", "text", "source"
        )
        for i in range(3):  # three arriving shards
            store.process_batch(
                docs.filter(F.col("doc_id") % 3 == i), batch_tag=f"shard-{i}"
            )
        print("streamed curate report (== batch):")
        for r in store.report().collect():
            print(
                f"  {r.split:>10} {r.source}: {r.n_docs} docs, "
                f"{r.tokens} tokens ({r.token_share:.1%})"
            )


if __name__ == "__main__":
    main()
