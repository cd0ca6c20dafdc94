#!/usr/bin/env python
"""80-batch curate-store slope run at the sf1 regime (r9 VERDICT task
#6): the 2.82 RED slope was measured on a 40-batch horizon; after the
PPJoin positional filter this run confirms the trajectory beyond that
window, with candidate counts in-artifact so the verdict (flat /
candidate_bound / flagged) is decidable from the JSON alone — the same
normalization as skew_stream_audit.py, whose machinery this reuses.

Usage: python tools/curate_slope_80b.py [slope_dir] [n_batches] [reps] \
           [scenario] > SKEW_STREAM_80b_r10.json

scenario is a SCENARIOS key restricted to the curate family ('curate',
the default exact mode, or 'curate_minhash' — round 11's bounded
candidate path), so the 80-batch horizon can be measured for both modes
with the same machinery.
"""
import json
import os
import shutil
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
sys.path.insert(0, os.path.join(REPO, "tools"))

import skew_stream_audit as ssa  # noqa: E402


def main(
    slope_dir: str, n_batches: int, reps: int, scenario: str = "curate"
) -> None:
    from minibatch_spark.session import get_spark

    assert scenario in ("curate", "curate_minhash"), scenario
    shutil.rmtree(ssa.SCRATCH, ignore_errors=True)
    spark = get_spark(app_name=f"{scenario}-slope-80b")
    m = ssa._measure(
        spark, ssa.SCENARIOS[scenario], slope_dir, n_batches, reps
    )
    slope = ssa._slope_ratio(m["per_batch_sec"])
    cand = m.get("cand_per_batch")
    cand_slope = (
        ssa._slope_ratio(cand)
        if cand and all(c is not None for c in cand)
        else None
    )
    # the ONE shared verdict definition (round-10 ADVICE: a drifting
    # local copy would make 40- and 80-batch artifacts incomparable)
    verdict, spc = ssa.slope_verdict(slope, cand_slope)
    print(
        json.dumps(
            {
                "scenario": scenario,
                "slope_dir": slope_dir,
                "reps": reps,
                "compact_every": ssa.COMPACT_EVERY,
                **m,
                "slope_lastq_over_firstq": slope,
                "cand_slope_lastq_over_firstq": cand_slope,
                "slope_per_candidate": spc,
                "slope_verdict": verdict,
            },
            allow_nan=False,
        )
    )
    shutil.rmtree(ssa.SCRATCH, ignore_errors=True)
    if verdict == "flagged":
        sys.exit(1)


if __name__ == "__main__":
    main(
        sys.argv[1] if len(sys.argv) > 1 else "/tmp/sparkdata/sf1",
        int(sys.argv[2]) if len(sys.argv) > 2 else 80,
        int(sys.argv[3]) if len(sys.argv) > 3 else 2,
        sys.argv[4] if len(sys.argv) > 4 else "curate",
    )
