#!/usr/bin/env python
"""Dedicated TPC-H bench: all 22 query shapes timed min-of-REPS at two
scale factors (round-6 verdict #6 — the headline bench times only
q1/q3/q5 at scale; q9/q18/q21-class plans — multi-join, grouped-HAVING,
anti-join chains — are exactly where scale problems hide, and the
full-registry scale audit's best-of-2 is too coarse to adjudicate them).

One JSON line:
  {"metric": "tpch_total_sec", "value": <sum of sf_b mins>, "unit": "sec",
   "a_dir": ..., "b_dir": ..., "data_ratio": 10.0,
   "queries": {"q1_...": {"a_sec": s, "b_sec": s, "ratio": r, "spread": m}},
   "super_linear": [...], "flagged_2x": [...]}

``spread`` is max/min over the sf_b reps — deltas within a query's own
spread are co-tenant noise, not regressions.

Usage: python tools/bench_tpch.py /root/testdata/sf0.1 /tmp/sparkdata/sf1 \
           > BENCH_tpch_sf1_r07.json
"""

from __future__ import annotations

import json
import os
import re
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

REPS = int(os.environ.get("SPARK_GRAFT_BENCH_REPS", "3"))


def main(a_dir: str, b_dir: str, data_ratio: float) -> None:
    from minibatch_spark.registry import all_queries
    from minibatch_spark.session import get_spark

    spark = get_spark(app_name="bench-tpch")
    tpch = {
        n: fn
        for n, fn in all_queries().items()
        if re.match(r"q\d+_", n)
    }
    assert len(tpch) == 22, sorted(tpch)

    # JIT/codegen warmup at the small sf (same recipe as bench.py)
    for fn in tpch.values():
        fn(spark, a_dir).collect()
    spark.catalog.clearCache()

    rows: dict[str, dict] = {}
    for name in sorted(tpch, key=lambda n: int(re.match(r"q(\d+)_", n).group(1))):
        fn = tpch[name]
        times: dict[str, list[float]] = {"a": [], "b": []}
        for side, sf_dir in (("a", a_dir), ("b", b_dir)):
            for _ in range(REPS):
                t0 = time.perf_counter()
                fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
                times[side].append(time.perf_counter() - t0)
            spark.catalog.clearCache()
        a, b = min(times["a"]), min(times["b"])
        rows[name] = {
            "a_sec": round(a, 3),
            "b_sec": round(b, 3),
            "ratio": round(b / a, 2),
            "spread": round(max(times["b"]) / b, 2),
        }
        print(f"{name}: {rows[name]}", file=sys.stderr)

    sup = [n for n, r in rows.items() if r["ratio"] > data_ratio]
    bad = [n for n, r in rows.items() if r["ratio"] > 2 * data_ratio]
    print(
        json.dumps(
            {
                "metric": "tpch_total_sec",
                "value": round(sum(r["b_sec"] for r in rows.values()), 3),
                "unit": "sec",
                "a_dir": a_dir,
                "b_dir": b_dir,
                "data_ratio": data_ratio,
                "reps": REPS,
                "queries": rows,
                "super_linear": sup,
                "flagged_2x": bad,
            }
        )
    )


if __name__ == "__main__":
    a = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    b = sys.argv[2] if len(sys.argv) > 2 else "/tmp/sparkdata/sf1"
    r = float(sys.argv[3]) if len(sys.argv) > 3 else 10.0
    main(a, b, r)
