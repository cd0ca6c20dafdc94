"""STATUS.md staleness sentinel (r7 VERDICT What's-wrong #1): the round
status hand-inlines headline figures from the committed artifacts, and
round 7 shipped two stale ones under a header claiming otherwise. These
tests recompute the quoted figures from the LATEST committed artifacts
and require STATUS.md to contain them verbatim — regenerating an
artifact without updating the prose goes red, the same pattern as
test_correctness_full_artifact_not_stale."""

import glob
import json
import os

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _latest(pattern: str) -> str:
    files = sorted(glob.glob(os.path.join(REPO, pattern)))
    assert files, pattern
    return files[-1]


def _status() -> str:
    with open(os.path.join(REPO, "STATUS.md")) as f:
        return f.read()


def test_status_quotes_latest_scale_audit_output_bound_ratios():
    """The output_bound enumeration rows' measured ratios in the latest
    SCALE_AUDIT artifact must appear in STATUS.md exactly (these were
    the two figures round 7 misquoted as 20.4x/69.6x vs the artifact's
    15.27x/71.91x)."""
    sa = json.load(open(_latest("SCALE_AUDIT_r[0-9]*.json")))
    status = _status()
    for q, row in sa["output_bound"].items():
        needle = f"{row['ratio']}×"
        assert needle in status, (
            f"STATUS.md does not quote {q}'s output_bound ratio "
            f"{needle} from {os.path.basename(_latest('SCALE_AUDIT_r[0-9]*.json'))}"
        )


def test_status_quotes_latest_tpch_worst_ratio():
    """The worst sf0.1->sf1 TPC-H ratio (and which query holds it) in
    the latest BENCH_tpch artifact must appear in STATUS.md."""
    tp = json.load(open(_latest("BENCH_tpch_sf1_r[0-9]*.json")))
    worst_q, worst = max(
        tp["queries"].items(), key=lambda kv: kv[1]["ratio"]
    )
    status = _status()
    assert f"{worst['ratio']}×" in status, (worst_q, worst["ratio"])
    assert worst_q.split("_")[0] in status, worst_q
