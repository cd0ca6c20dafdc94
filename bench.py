#!/usr/bin/env python
"""Benchmark harness: runs the headline queries at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints ONE
JSON line:

  {"metric": "total_wall_sec", "value": N, "unit": "sec",
   "queries": {"q1_pricing_summary": sec, ...}, "sf": 0.1}

Timing includes plan construction + execution + result fetch (collect) per
query, after a one-query JVM/session warmup that is NOT counted.
"""

from __future__ import annotations

import json
import os
import re
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

# Headline set: one per operator family, weighted toward the scan/join/agg
# paths that dominate at 100 TB.
HEADLINE = [
    "q1_pricing_summary",
    "q3_shipping_priority",
    "q5_local_supplier_volume",
    "filter_project_lineitem",
    "window_rank_orders",
    "sessionize_events",
    "agg_distinct_users",
    "tumbling_window_events",
    "topk_orders",
    "dedup_exact",
    "dedup_minhash_pairs",
    "dedup_ngram_jaccard",
    "ann_topk_bruteforce",
    "text_token_stats",
    "text_top_bigrams",
]


def main() -> None:
    from minibatch_spark.registry import all_queries
    from minibatch_spark.session import get_spark

    spark = get_spark(app_name="minibatch-spark-bench")
    queries = all_queries()

    # warmup: run the headline plan shapes once at the SMALL sf (sf0.01) so
    # the JVM/codegen/AQE paths are JIT-warm before measurement — the
    # measured sf0.1 data itself is never touched during warmup
    warmup_sf = os.path.join(os.path.dirname(SF_DIR.rstrip("/")), "sf0.01")
    if not os.path.isdir(warmup_sf):
        warmup_sf = SF_DIR
    for w in (
        "q1_pricing_summary",
        "q3_shipping_priority",
        "dedup_minhash_pairs",
        "dedup_ngram_jaccard",
        "text_top_bigrams",
        "sessionize_events",
    ):
        queries[w](spark, warmup_sf).collect()

    per_query: dict[str, float] = {}
    for name in HEADLINE:
        fn = queries[name]
        t0 = time.perf_counter()
        rows = fn(spark, SF_DIR).collect()
        per_query[name] = round(time.perf_counter() - t0, 3)
        assert rows is not None

    m = re.search(r"sf([\d.]+)", SF_DIR)
    sf = float(m.group(1).rstrip(".")) if m else None
    print(
        json.dumps(
            {
                "metric": "total_wall_sec",
                "value": round(sum(per_query.values()), 3),
                "unit": "sec",
                "queries": per_query,
                "sf": sf,
            }
        )
    )


if __name__ == "__main__":
    main()
