#!/usr/bin/env python
"""Per-query cost breakdown for the bench headline set (guide §1: measure
first). For each query, separates:

  plan_ms   — DataFrame construction + analysis/optimization (driver-side)
  rep1..N   — noop-sink wall per rep (rep1 pays stage materialization;
              later reps are the steady state bench.py reports the min of)

Usage: python tools/profile_bench.py [query ...]   (default: HEADLINE set)
Env:   SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1), PROFILE_REPS (3)
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def main() -> None:
    from bench import HEADLINE

    from minibatch_spark.registry import all_queries
    from minibatch_spark.session import get_spark

    names = sys.argv[1:] or HEADLINE
    reps = int(os.environ.get("PROFILE_REPS", "3"))
    spark = get_spark(app_name="profile-bench")
    queries = all_queries()

    # same warmup shape as bench.py so codegen/JIT is steady-state
    warmup_sf = os.path.join(os.path.dirname(SF_DIR.rstrip("/")), "sf0.01")
    if not os.path.isdir(warmup_sf):
        warmup_sf = SF_DIR
    for w in names:
        queries[w](spark, warmup_sf).collect()
    spark.catalog.clearCache()

    out = {}
    for name in names:
        fn = queries[name]
        spark.sparkContext.setJobDescription(f"profile:{name}")
        t0 = time.perf_counter()
        df = fn(spark, SF_DIR)
        # force analysis + optimization without executing
        df._jdf.queryExecution().executedPlan()
        plan_ms = (time.perf_counter() - t0) * 1000
        walls = []
        for r in range(reps):
            t0 = time.perf_counter()
            fn(spark, SF_DIR).write.format("noop").mode("overwrite").save()
            walls.append(round(time.perf_counter() - t0, 3))
        spark.catalog.clearCache()
        spark.sparkContext.setJobDescription(None)
        out[name] = {"plan_ms": round(plan_ms, 1), "walls": walls}
        print(json.dumps({name: out[name]}), flush=True)
    total_steady = sum(min(v["walls"]) for v in out.values())
    print(json.dumps({"total_min": round(total_steady, 3)}))


if __name__ == "__main__":
    main()
