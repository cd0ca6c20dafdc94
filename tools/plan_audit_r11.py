#!/usr/bin/env python
"""Plan-shape audit over the full registry (optimization round 11).

For every registry query, captures counters the optimization guide says to
look at (§7.2): Exchange count (shuffle vs broadcast vs reused), join
strategies, SortAggregate fallbacks, Python-boundary nodes, cartesian
products, and whether any parquet scan lost its pushed filters. Emits one
JSON line per query plus a summary of offenders.

Plans are built at sf0.01 (cheap; plan SHAPE is scale-independent here —
same single-file parquet layout) unless SPARK_GRAFT_SF_DIR overrides.
Stage materialization inside query constructors does run (stage() is
eager), so this tool executes staging work but never the query itself.
"""

from __future__ import annotations

import json
import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")

COUNTERS = {
    "shuffle_exchange": r"^\(\d+\) Exchange",
    "broadcast_exchange": r"^\(\d+\) BroadcastExchange",
    "reused_exchange": r"ReusedExchange",
    "sort_merge_join": r"^\(\d+\) SortMergeJoin",
    "shuffled_hash_join": r"^\(\d+\) ShuffledHashJoin",
    "broadcast_hash_join": r"^\(\d+\) BroadcastHashJoin",
    "nested_loop_join": r"BroadcastNestedLoopJoin",
    "cartesian": r"CartesianProduct",
    "sort_aggregate": r"^\(\d+\) SortAggregate",
    "object_hash_agg": r"^\(\d+\) ObjectHashAggregate",
    "batch_eval_python": r"BatchEvalPython",
    "arrow_eval_python": r"ArrowEvalPython",
    "map_in_arrow": r"MapInArrow|MapInPandas|PythonMapInArrow",
    "window": r"^\(\d+\) Window",
    "generate": r"^\(\d+\) Generate",
    "in_memory_scan": r"InMemoryTableScan",
}


def main() -> None:
    from minibatch_spark.plans import explain_str
    from minibatch_spark.registry import all_queries
    from minibatch_spark.session import get_spark

    spark = get_spark(app_name="plan-audit-r11")
    queries = all_queries()
    names = sys.argv[1:] or sorted(queries)
    rows = {}
    for name in names:
        try:
            df = queries[name](spark, SF_DIR)
            plan = explain_str(df, "formatted")
        except Exception as e:  # noqa: BLE001
            rows[name] = {"error": str(e)[:200]}
            print(json.dumps({name: rows[name]}), flush=True)
            continue
        r = {}
        for key, pat in COUNTERS.items():
            n = len(re.findall(pat, plan, re.M))
            if n:
                r[key] = n
        # scans with no pushed filters AND no pruned schema are fine for
        # full-table queries; flag only scans where a Filter sits directly
        # above a scan whose PushedFilters is empty
        unpushed = len(re.findall(r"PushedFilters: \[\]", plan))
        if unpushed:
            r["scans_no_pushdown"] = unpushed
        rows[name] = r
        print(json.dumps({name: r}), flush=True)

    def offenders(key, thresh=1):
        return {
            n: v[key] for n, v in rows.items() if isinstance(v, dict) and v.get(key, 0) >= thresh
        }

    summary = {
        "python_boundary": {
            n: v
            for n, v in rows.items()
            if any(k in v for k in ("batch_eval_python", "arrow_eval_python", "map_in_arrow"))
        },
        "sort_aggregate": offenders("sort_aggregate"),
        "cartesian": offenders("cartesian"),
        "nested_loop": offenders("nested_loop_join"),
        "sort_merge_join": offenders("sort_merge_join"),
        "many_shuffles": {
            n: v["shuffle_exchange"]
            for n, v in rows.items()
            if v.get("shuffle_exchange", 0) >= 4
        },
        "errors": {n: v for n, v in rows.items() if "error" in v},
    }
    print(json.dumps({"SUMMARY": summary}, indent=2))


if __name__ == "__main__":
    main()
