#!/usr/bin/env python
"""Skew-robustness audit: time EVERY registered query on the uniform
corpus and on the same-size SKEWED variant (tools/gen_skewed.py — hot
user/customer/supplier/part/source keys + one ~100k-word document) and
report per-query wall ratios. Same-size data means a ratio far above 1 is
a SKEW cost, not a data-volume cost.

Flag bar: ratio > 2 (flagged), > 4 (hot). Per-key windowing over a hot
key is inherently serial (exact per-user sessionization cannot split a
user), so some cost is semantics, not plan defect — the audit makes each
one visible so it is either mitigated or documented, never silent.

Usage:
    python tools/gen_skewed.py /root/testdata/sf0.1 /tmp/skewdata/sf0.1
    python tools/skew_audit.py /root/testdata/sf0.1 /tmp/skewdata/sf0.1 \
        > SKEW_AUDIT_r05.json
"""

from __future__ import annotations

import json
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from scale_audit import time_all  # noqa: E402  (same timing harness)

SKEW_FLAG_RATIO = 2.0
SKEW_HOT_RATIO = 4.0


def apply_reverify(rows: dict, flagged: list, hot: list, remeasure) -> dict:
    """RE-VERIFY pass (the scale_audit discipline, r9 VERDICT What's-wrong
    #2): a single burst on this co-tenant host can fake a boundary flag
    (r10 caught text_classifier_score at 2.02 where immediate 3-rep
    re-measurement read 0.98). Flagged queries re-measure once
    (``remeasure(name) -> (uniform_sec, skewed_sec)``), both readings land
    in the artifact with a burst/real verdict, and confirmed bursts leave
    the flag lists — a FAILED re-measure (no reading) refutes nothing and
    stays "real". Membership is re-decided per list: a query re-reading
    between 2x and 4x keeps flagged_2x but leaves hot_4x. Mutates
    flagged/hot in place; returns the ``reverified`` artifact dict.
    Unit-pinned by tests/test_audit_reverify.py."""
    reverify: dict[str, dict] = {}
    for n in sorted(flagged):
        ra, rb = remeasure(n)
        rr = round(rb / ra, 2) if ra and rb is not None else None
        verdict = (
            "burst" if rr is not None and rr <= SKEW_FLAG_RATIO else "real"
        )
        reverify[n] = {
            "flag_ratio": rows[n]["ratio"],
            "reverify_uniform_sec": ra,
            "reverify_skewed_sec": rb,
            "reverify_ratio": rr,
            "verdict": verdict,
        }
        if verdict == "burst":
            flagged.remove(n)
            rows[n]["ratio_reverified"] = rr
        if n in hot and rr is not None and rr <= SKEW_HOT_RATIO:
            hot.remove(n)
            rows[n]["ratio_reverified"] = rr
    return reverify


def main(a_dir: str, b_dir: str) -> None:
    from minibatch_spark.registry import all_queries
    from minibatch_spark.session import get_spark

    spark = get_spark(app_name="skew-audit")
    queries = all_queries()
    # best-of-3 (vs scale_audit's 2): the uniform/skewed comparison is
    # mostly sub-second queries on a co-tenant host, where best-of-2
    # produced a phantom 2.25x on ann_lsh_buckets (min-of-5 manual rerun:
    # skewed FASTER than uniform) — same noise class the sf10 bench fixed
    # with min-of-5.
    a = time_all(spark, queries, a_dir, reps=3)
    b = time_all(spark, queries, b_dir, reps=3)
    rows = {}
    for n in sorted(queries):
        ratio = (
            round(b[n] / a[n], 2) if a[n] and b[n] is not None else None
        )
        rows[n] = {"uniform_sec": a[n], "skewed_sec": b[n], "ratio": ratio}
    flagged = [
        n for n, v in rows.items() if v["ratio"] and v["ratio"] > SKEW_FLAG_RATIO
    ]
    hot = [
        n for n, v in rows.items() if v["ratio"] and v["ratio"] > SKEW_HOT_RATIO
    ]
    failed = [n for n, v in rows.items() if v["skewed_sec"] is None]

    def _remeasure(n: str) -> "tuple[float | None, float | None]":
        q = {n: queries[n]}
        return (
            time_all(spark, q, a_dir, reps=3)[n],
            time_all(spark, q, b_dir, reps=3)[n],
        )

    reverify = apply_reverify(rows, flagged, hot, _remeasure)
    print(
        json.dumps(
            {
                "uniform_dir": a_dir,
                "skewed_dir": b_dir,
                "skew": "events.user_id 50%->0, orders.o_custkey 20%->0, "
                "lineitem part/supp 20%->0, documents.source 50%->src0, "
                "doc 0 = 100k words",
                "queries": rows,
                "flagged_2x": flagged,
                "hot_4x": hot,
                "failed": failed,
                "reverified": reverify,
            },
            allow_nan=False,
        )
    )


if __name__ == "__main__":
    sys.path.insert(0, os.path.join(REPO, "tools"))
    main(sys.argv[1], sys.argv[2])
