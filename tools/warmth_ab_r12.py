#!/usr/bin/env python
"""r12 warmth experiment: does the size-adaptive spread() change slow the
FIRST timed bench slots (q1/q3/q5, plans byte-identical across sides) by
making the sf0.01 warmup run ~1-partition plans, leaving the JVM less
JIT-warm when measurement starts?

Both sides are HEAD code; the only difference is the env knob
MINIBATCH_SPARK_TASK_TARGET_BYTES: side A default (adaptive counts),
side B = 1 byte/task (adaptive_partitions always hits its cap — the old
full-width behaviour, including during warmup). Interleaved subprocess
JVMs, min over runs x reps, same discipline as tools/ab_bench.py.

Usage: python tools/warmth_ab_r12.py <sf_dir> <runs_per_side> [reps]
"""

from __future__ import annotations

import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _run(sf_dir: str, reps: int, target_bytes: str | None) -> dict:
    env = dict(
        os.environ,
        SPARK_GRAFT_SF_DIR=sf_dir,
        SPARK_GRAFT_BENCH_REPS=str(reps),
    )
    env.pop("MINIBATCH_SPARK_TASK_TARGET_BYTES", None)
    if target_bytes is not None:
        env["MINIBATCH_SPARK_TASK_TARGET_BYTES"] = target_bytes
    out = subprocess.run(
        [sys.executable, "bench.py"],
        cwd=REPO,
        env=env,
        capture_output=True,
        text=True,
        check=True,
    )
    return json.loads(out.stdout.strip().splitlines()[-1])


def main(sf_dir: str, runs: int, reps: int) -> None:
    a_runs, b_runs = [], []
    for i in range(runs):
        order = [("adaptive", None, a_runs), ("fullwidth", "1", b_runs)]
        if i % 2 == 1:
            order.reverse()
        for _side, tb, sink in order:
            sink.append(_run(sf_dir, reps, tb))
    queries = sorted(a_runs[0]["queries"])
    per_query = {}
    for q in queries:
        a = min(r["queries"][q] for r in a_runs)
        b = min(r["queries"][q] for r in b_runs)
        per_query[q] = {"adaptive": a, "fullwidth": b, "ratio": round(a / b, 2)}
    print(
        json.dumps(
            {
                "method": f"{runs} alternating bench.py runs per side, both "
                "HEAD code; B sets MINIBATCH_SPARK_TASK_TARGET_BYTES=1 "
                "(adaptive counts pinned to their caps = pre-r12 behaviour)",
                "sf_dir": sf_dir,
                "adaptive_run_totals": [round(r["value"], 3) for r in a_runs],
                "fullwidth_run_totals": [round(r["value"], 3) for r in b_runs],
                "per_query": per_query,
            },
            indent=1,
        )
    )


if __name__ == "__main__":
    main(
        sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1",
        int(sys.argv[2]) if len(sys.argv) > 2 else 3,
        int(sys.argv[3]) if len(sys.argv) > 3 else 3,
    )
