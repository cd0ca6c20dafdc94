"""Unit tests for the audit RE-VERIFY passes (round-10 VERDICT task #2):
every committed r10 artifact was flagless, so the burst/real honesty
machinery in tools/scale_audit.py and tools/skew_audit.py had NEVER
executed — "consistent-with-working but not evidence-of-working". These
tests force synthetic flags through the exact decision functions main()
wires to the real timers, and pin that BOTH readings + the verdict land
in the artifact dict, that "burst" clears flags while "real" keeps them,
and (round-10 ADVICE) that an OUTPUT_BOUND query's re-verify is held to
its measured-quadratic ceiling, not the raw data_ratio bar.

No Spark involved: the measurement side is injected via ``remeasure``,
which is the seam main() uses — the decision logic under test is
byte-for-byte the code the real audits run.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(
    0,
    os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "tools"),
)

import scale_audit  # noqa: E402
import skew_audit  # noqa: E402
from skew_stream_audit import slope_verdict  # noqa: E402

DR = 10.0
CEIL = scale_audit._output_bound_ceiling(DR)  # 100.0
OB = {"ob_query": {"why": "test", "max_ratio_basis": "test"}}


def _rows(**ratios):
    return {
        n: {"a_sec": 1.0, "b_sec": r, "ratio": r} for n, r in ratios.items()
    }


# ---- classify: the single per-class bar --------------------------------


def test_classify_linear_is_clean():
    assert scale_audit.classify("q", 9.9, DR, CEIL, OB) == (False, False, False)
    assert scale_audit.classify("q", None, DR, CEIL, OB) == (False, False, False)


def test_classify_super_linear_and_2x():
    assert scale_audit.classify("q", 12.0, DR, CEIL, OB) == (True, False, False)
    assert scale_audit.classify("q", 25.0, DR, CEIL, OB) == (True, True, False)


def test_classify_output_bound_within_and_beyond_ceiling():
    # inside the measured-quadratic ceiling: exempt, not flagged
    assert scale_audit.classify("ob_query", 60.0, DR, CEIL, OB) == (
        False,
        False,
        True,
    )
    # beyond even the quadratic candidate growth: a real flag
    assert scale_audit.classify("ob_query", 150.0, DR, CEIL, OB) == (
        True,
        True,
        False,
    )


# ---- scale_audit.apply_reverify -----------------------------------------


def test_scale_reverify_burst_clears_and_commits_both_readings():
    rows = _rows(q_burst=25.0)
    sup, bad, exempt = ["q_burst"], ["q_burst"], []
    calls = []

    def remeasure(n):
        calls.append(n)
        return (1.0, 8.0)  # re-measured ratio 8.0 <= data_ratio

    rv = scale_audit.apply_reverify(
        rows, sup, bad, exempt, DR, CEIL, remeasure, OB
    )
    assert calls == ["q_burst"]
    assert sup == [] and bad == [] and exempt == []
    ent = rv["q_burst"]
    # BOTH readings + the verdict are in the artifact
    assert ent["flag_ratio"] == 25.0
    assert ent["reverify_a_sec"] == 1.0 and ent["reverify_b_sec"] == 8.0
    assert ent["reverify_ratio"] == 8.0
    assert ent["verdict"] == "burst"
    assert rows["q_burst"]["ratio_reverified"] == 8.0


def test_scale_reverify_real_keeps_flags():
    rows = _rows(q_real=30.0)
    sup, bad, exempt = ["q_real"], ["q_real"], []
    rv = scale_audit.apply_reverify(
        rows, sup, bad, exempt, DR, CEIL, lambda n: (1.0, 28.0), OB
    )
    assert sup == ["q_real"] and bad == ["q_real"]
    assert rv["q_real"]["verdict"] == "real"
    assert rv["q_real"]["reverify_ratio"] == 28.0
    assert "ratio_reverified" not in rows["q_real"]


def test_scale_reverify_midband_leaves_2x_but_keeps_super_linear():
    # re-measured between data_ratio and 2x: super_linear stays,
    # flagged_2x membership is re-decided independently (round-10 ADVICE)
    rows = _rows(q_mid=25.0)
    sup, bad, exempt = ["q_mid"], ["q_mid"], []
    rv = scale_audit.apply_reverify(
        rows, sup, bad, exempt, DR, CEIL, lambda n: (1.0, 15.0), OB
    )
    assert sup == ["q_mid"] and bad == []
    assert rv["q_mid"]["verdict"] == "real"


def test_scale_reverify_output_bound_uses_ceiling_not_data_ratio():
    # the round-10 ADVICE case: an OUTPUT_BOUND query flagged at 120x
    # re-measures at 60x — between data_ratio (10) and the ceiling (100).
    # The old bar (rr <= data_ratio) kept it verdict=real; the class bar
    # exempts it exactly as the primary pass would have.
    rows = _rows(ob_query=120.0)
    sup, bad, exempt = ["ob_query"], ["ob_query"], []
    rv = scale_audit.apply_reverify(
        rows, sup, bad, exempt, DR, CEIL, lambda n: (1.0, 60.0), OB
    )
    assert sup == [] and bad == []
    assert exempt == ["ob_query"]
    assert rv["ob_query"]["verdict"] == "output_bound"
    assert rows["ob_query"]["ratio_reverified"] == 60.0


def test_scale_reverify_failed_remeasure_keeps_flags():
    # an unreadable second reading refutes nothing
    rows = _rows(q_fail=25.0)
    sup, bad, exempt = ["q_fail"], ["q_fail"], []
    rv = scale_audit.apply_reverify(
        rows, sup, bad, exempt, DR, CEIL, lambda n: (1.0, None), OB
    )
    assert sup == ["q_fail"] and bad == ["q_fail"]
    assert rv["q_fail"]["verdict"] == "real"
    assert rv["q_fail"]["reverify_ratio"] is None


# ---- skew_audit.apply_reverify -------------------------------------------


def test_skew_reverify_burst_clears_and_commits_both_readings():
    rows = {"q": {"uniform_sec": 1.0, "skewed_sec": 2.5, "ratio": 2.5}}
    flagged, hot = ["q"], []
    rv = skew_audit.apply_reverify(rows, flagged, hot, lambda n: (1.0, 0.98))
    assert flagged == []
    ent = rv["q"]
    assert ent["flag_ratio"] == 2.5
    assert ent["reverify_uniform_sec"] == 1.0
    assert ent["reverify_skewed_sec"] == 0.98
    assert ent["verdict"] == "burst"
    assert rows["q"]["ratio_reverified"] == 0.98


def test_skew_reverify_real_keeps_flag():
    rows = {"q": {"uniform_sec": 1.0, "skewed_sec": 5.0, "ratio": 5.0}}
    flagged, hot = ["q"], ["q"]
    rv = skew_audit.apply_reverify(rows, flagged, hot, lambda n: (1.0, 4.8))
    assert flagged == ["q"] and hot == ["q"]
    assert rv["q"]["verdict"] == "real"


def test_skew_reverify_midband_leaves_hot_keeps_flagged():
    rows = {"q": {"uniform_sec": 1.0, "skewed_sec": 5.0, "ratio": 5.0}}
    flagged, hot = ["q"], ["q"]
    rv = skew_audit.apply_reverify(rows, flagged, hot, lambda n: (1.0, 3.0))
    assert flagged == ["q"] and hot == []
    assert rv["q"]["verdict"] == "real"


def test_skew_reverify_failed_remeasure_keeps_flags():
    rows = {"q": {"uniform_sec": 1.0, "skewed_sec": 5.0, "ratio": 5.0}}
    flagged, hot = ["q"], ["q"]
    rv = skew_audit.apply_reverify(rows, flagged, hot, lambda n: (None, None))
    assert flagged == ["q"] and hot == ["q"]
    assert rv["q"]["verdict"] == "real"


# ---- the shared streaming slope verdict ----------------------------------


def test_slope_verdict_shared_definition():
    assert slope_verdict(None, None) == ("flat", None)
    assert slope_verdict(1.1, None) == ("flat", None)
    assert slope_verdict(2.16, 6.6) == ("candidate_bound", 0.33)
    assert slope_verdict(2.0, None) == ("flagged", None)
    assert slope_verdict(5.0, 1.5) == ("flagged", 3.33)
    # the 80-batch tool resolves to the SAME function object — no copy
    import curate_slope_80b  # noqa: F401
    import skew_stream_audit

    assert curate_slope_80b.ssa.slope_verdict is skew_stream_audit.slope_verdict
