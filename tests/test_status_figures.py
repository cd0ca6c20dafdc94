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


def test_every_artifact_section_figure_is_in_its_artifact():
    """The figure-staleness class, closed as a CONVENTION (r8 VERDICT
    What's-wrong #2: each round so far hand-fixed one stale figure and
    pinned only that figure's class): in the LATEST 'Round-N artifact
    numbers on HEAD' section, EVERY decimal figure inside a bullet must
    appear verbatim in (one of) the artifact file(s) that bullet names
    in backticks. Prose rules this enforces:

    - a bullet quoting any number names the artifact it came from —
      including PRIOR rounds' numbers (name the prior artifact too);
    - a genuinely non-artifact observation (e.g. a discarded burst run
      described for honesty) prefixes its figures with '~', the explicit
      opt-out marker.

    Substring match against the artifact's raw text: lenient enough for
    rounded quotes ('17.3' in '17.318'), strict enough that a
    regenerated artifact whose figure moved goes red."""
    import re

    status = _status()
    m = re.search(
        r"Round-\d+ artifact numbers on HEAD.*?\n\n(.*?)\n## ", status, re.S
    )
    assert m, "artifact-numbers section not found"
    section = m.group(1)
    bullets = re.split(r"\n(?=- )", section)
    art_re = re.compile(r"`([A-Za-z0-9_]+_r\d+\.json)`")
    num_re = re.compile(r"(?<![\w.~–-])(\d+\.\d+)(?!\d)")
    checked = 0
    for bullet in bullets:
        arts = art_re.findall(bullet)
        if not arts:
            continue
        blob = ""
        for a in arts:
            path = os.path.join(REPO, a)
            assert os.path.exists(path), f"STATUS names missing artifact {a}"
            blob += open(path).read()
        # strip inline opt-outs: '~'-prefixed runs (incl. ranges) are
        # disclosed non-artifact observations
        scrubbed = re.sub(r"~[\d.–+-]+(?:×|%|x)?", "", bullet)
        blob_nums = None
        for tok in num_re.findall(scrubbed):
            checked += 1
            if tok in blob:
                continue
            # rounded quotes ('15.3' for the artifact's 15.292): accept
            # when some artifact number rounds to the quoted figure
            if blob_nums is None:
                blob_nums = [
                    float(x) for x in re.findall(r"\d+\.\d+", blob)
                ]
            places = len(tok.split(".")[1])
            want = float(tok)
            assert any(round(n, places) == want for n in blob_nums), (
                f"figure {tok} in bullet {bullet[:90]!r} not found in "
                f"named artifact(s) {arts}"
            )
    assert checked >= 10, f"sentinel parsed too little ({checked} figures)"
