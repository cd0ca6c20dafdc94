#!/usr/bin/env python
"""40-batch streaming-store slope audit at an arbitrary corpus scale
(r10 VERDICT task #5: run the slope protocol one scale up, sf10 — the
regime where the standing-store term dominates fixed job latency
hardest). Reuses skew_stream_audit's scenario drivers, elementwise-min
measurement, and the SHARED slope_verdict; emits ONE JSON line with a
slope row per store (no uniform/skew regimes — those stay in the main
audit at sf0.1/sf1).

Usage:
    python tools/slope_audit_stores.py /tmp/sparkdata/sf10 40 1 \
        > SKEW_STREAM_sf10_r11.json
    # optional trailing args restrict the scenario set:
    python tools/slope_audit_stores.py /tmp/sparkdata/sf10 40 1 curate ivf
"""

from __future__ import annotations

import json
import os
import shutil
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
sys.path.insert(0, os.path.join(REPO, "tools"))

import skew_stream_audit as ssa  # noqa: E402


def main(slope_dir: str, n_batches: int, reps: int, names) -> None:
    from minibatch_spark.session import get_spark

    shutil.rmtree(ssa.SCRATCH, ignore_errors=True)
    spark = get_spark(app_name="slope-audit-stores")
    out: dict = {
        "slope_dir": slope_dir,
        "n_batches": n_batches,
        "reps": reps,
        "compact_every": ssa.COMPACT_EVERY,
        "note": "per_batch_sec = elementwise min over reps; slope = "
        "last-quartile mean / first-quartile mean (batch 0 dropped); "
        "verdict = skew_stream_audit.slope_verdict (shared definition)",
        "scenarios": {},
    }
    flagged = []
    for name in names:
        fn = ssa.SCENARIOS[name]
        m = ssa._measure(spark, fn, slope_dir, n_batches, reps)
        slope = ssa._slope_ratio(m["per_batch_sec"])
        cand = m.get("cand_per_batch")
        cand_slope = (
            ssa._slope_ratio(cand)
            if cand and all(c is not None for c in cand)
            else None
        )
        verdict, spc = ssa.slope_verdict(slope, cand_slope)
        out["scenarios"][name] = {
            **m,
            "slope_lastq_over_firstq": slope,
            "cand_slope_lastq_over_firstq": cand_slope,
            "slope_per_candidate": spc,
            "slope_verdict": verdict,
        }
        print(
            f"{name}: slope={slope} cand_slope={cand_slope} "
            f"verdict={verdict}",
            file=sys.stderr,
        )
        if verdict == "flagged":
            flagged.append(name)
        shutil.rmtree(ssa.SCRATCH, ignore_errors=True)
    out["flagged_slope"] = flagged
    print(json.dumps(out, allow_nan=False))
    if flagged:
        sys.exit(1)


if __name__ == "__main__":
    main(
        sys.argv[1] if len(sys.argv) > 1 else "/tmp/sparkdata/sf10",
        int(sys.argv[2]) if len(sys.argv) > 2 else 40,
        int(sys.argv[3]) if len(sys.argv) > 3 else 1,
        sys.argv[4:] or list(ssa.SCENARIOS),
    )
