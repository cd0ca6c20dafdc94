#!/usr/bin/env python
"""Interleaved A/B benchmark: HEAD vs a git ref, alternating FULL
bench.py runs so host drift hits both sides equally — the controlled
comparison that settled round 7's wrong-way headline as environment
(AB_BENCH_r08.json) and the r8 VERDICT's task #3 asks to extend to the
sf1/sf10 scale points. Single-sided round-over-round deltas on this
co-tenant host are ±10% noise; interleaved per-query min-of-N is the
only comparison worth quoting.

Each side runs bench.py in a SUBPROCESS (its own JVM — no cached-plan
bleed between sides); the B side runs from a clean worktree at the ref.
Per-query result = min over (runs x bench.py's internal REPS).

Usage:
    python tools/ab_bench.py <b_ref> <sf_dir> <runs_per_side> \
        [reps_inside] > AB_BENCH_r09_sfX.json
"""

from __future__ import annotations

import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _run_bench(repo_dir: str, sf_dir: str, reps: int) -> dict:
    env = dict(
        os.environ,
        SPARK_GRAFT_SF_DIR=sf_dir,
        SPARK_GRAFT_BENCH_REPS=str(reps),
    )
    out = subprocess.run(
        [sys.executable, "bench.py"],
        cwd=repo_dir,
        env=env,
        capture_output=True,
        text=True,
        check=True,
    )
    return json.loads(out.stdout.strip().splitlines()[-1])


def main(b_ref: str, sf_dir: str, runs: int, reps: int) -> None:
    import shutil

    wt = f"/tmp/abwt-{b_ref[:12]}"
    if not os.path.isdir(wt):
        subprocess.run(
            ["git", "worktree", "add", wt, b_ref],
            cwd=REPO,
            check=True,
            capture_output=True,
        )
    # HARNESS SYMMETRY (round 11): both sides run HEAD's bench.py, so
    # the measurement structure (warmup shape, first-slot warm, rep
    # accounting) is identical and only the CODE under test differs —
    # otherwise a harness improvement on one side masquerades as a
    # code delta (the r10 first-slot artifact: q1 >= 1.1 on
    # byte-identical operator code).
    shutil.copy2(os.path.join(REPO, "bench.py"), os.path.join(wt, "bench.py"))
    a_runs, b_runs = [], []
    for i in range(runs):
        # alternate starting side each round so slow windows are shared
        order = [("a", REPO, a_runs), ("b", wt, b_runs)]
        if i % 2 == 1:
            order.reverse()
        for _side, repo_dir, sink in order:
            sink.append(_run_bench(repo_dir, sf_dir, reps))
    queries = sorted(a_runs[0]["queries"])
    per_query = {}
    for q in queries:
        a = min(r["queries"][q] for r in a_runs)
        b = min(r["queries"].get(q, float("inf")) for r in b_runs)
        per_query[q] = {
            "head": a,
            "ref": None if b == float("inf") else b,
            "ratio": round(a / b, 2) if b and b != float("inf") else None,
        }
    a_tot = sum(v["head"] for v in per_query.values())
    b_tot = sum(v["ref"] for v in per_query.values() if v["ref"] is not None)
    print(
        json.dumps(
            {
                "method": f"{runs} alternating full bench.py runs per side "
                f"(each min-of-{reps} per query internally), subprocess JVMs, "
                "interleaved so host drift hits both sides equally",
                "a_side": "HEAD",
                "b_side": b_ref,
                "sf_dir": sf_dir,
                "head_run_totals": [round(r["value"], 3) for r in a_runs],
                "ref_run_totals": [round(r["value"], 3) for r in b_runs],
                "head_min_total": round(a_tot, 3),
                "ref_min_total": round(b_tot, 3),
                "ratio_head_over_ref": round(a_tot / b_tot, 3) if b_tot else None,
                "per_query": per_query,
            }
        )
    )


if __name__ == "__main__":
    main(
        sys.argv[1],
        sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.1",
        int(sys.argv[3]) if len(sys.argv) > 3 else 4,
        int(sys.argv[4]) if len(sys.argv) > 4 else 3,
    )
