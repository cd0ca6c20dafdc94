"""Analytics tour — the relational/curation surface in one runnable file.

The reference has no relational engine (joins/aggregations are future work,
reference README.rst:315-322); this is the capability layer the Spark
engine adds. Three stops:

1. DataFrame-built TPC-H-style query (top customers by nation, ranked);
2. the SAME question as raw portable SQL through Catalog.register_views —
   one ANSI text, no translation;
3. a curation pipeline stop: TF-IDF characteristic terms + the pairwise
   source-overlap contamination matrix.

Run:  python examples/analytics_tour.py  [SF_DIR]
(defaults to /root/testdata/sf0.001)
"""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from minibatch_spark.registry import all_queries
from minibatch_spark.session import get_spark


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    spark = get_spark()
    q = all_queries()

    print("== 1. DataFrame API: TPC-H Q10-style top returned-revenue ==")
    for row in q["q10_returned_items"](spark, sf_dir).take(5):
        print(f"  {row.c_name:<22} {row.n_name:<10} {row.revenue:>12.2f}")

    print("== 2. Same engine, raw ANSI SQL (portable to DuckDB verbatim) ==")
    for row in q["sql_top_customers_portable"](spark, sf_dir).take(5):
        print(f"  {row.n_name:<10} #{row.rn} {row.c_name:<22} {row.revenue:>12.2f}")

    print("== 3. Curation: TF-IDF terms + cross-source overlap ==")
    for row in q["text_tfidf_topterms"](spark, sf_dir).take(3):
        print(f"  doc {row.doc_id}: {row.token!r} score={row.score}")
    overlaps = (
        q["docs_source_overlap"](spark, sf_dir)
        .orderBy("jaccard", ascending=False)
        .take(3)
    )
    for row in overlaps:
        print(f"  {row.src_a} ~ {row.src_b}: jaccard={row.jaccard}")
    print("OK")


if __name__ == "__main__":
    main()
