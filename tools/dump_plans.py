#!/usr/bin/env python
"""Dump .explain("formatted") for bench headline queries (and optionally any
registry query) into plans/<tag>/<query>_<suffix>.txt — the before/after
evidence files the optimization rounds commit.

Usage:
  python tools/dump_plans.py <tag> <suffix> [query ...]

With no query args, dumps the bench.py HEADLINE set. SPARK_GRAFT_SF_DIR
selects the data directory (default /root/testdata/sf0.1) — plans are
captured against the same sf the bench measures.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def main() -> None:
    from bench import HEADLINE

    from minibatch_spark.plans import explain_str
    from minibatch_spark.registry import all_queries
    from minibatch_spark.session import get_spark

    tag, suffix = sys.argv[1], sys.argv[2]
    names = sys.argv[3:] or HEADLINE
    out_dir = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "plans", tag)
    os.makedirs(out_dir, exist_ok=True)
    spark = get_spark(app_name="plan-dump")
    queries = all_queries()
    for name in names:
        df = queries[name](spark, SF_DIR)
        plan = explain_str(df, "formatted")
        path = os.path.join(out_dir, f"{name}_{suffix}.txt")
        with open(path, "w") as f:
            f.write(plan)
        print(f"wrote {path} ({plan.count('Exchange')} Exchange)")


if __name__ == "__main__":
    main()
