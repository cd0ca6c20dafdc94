#!/usr/bin/env python
"""Structural plan audit: no query may build a hashed-relation broadcast
whose subtree is a RAW fact-table scan (filter/project only — no
aggregate, window, or limit between the exchange and the scan).

Motivation: the 64 MB autoBroadcastJoinThreshold is sized for dimensions
and pre-aggregated sides, but a narrow PROJECTION of a fact can slip
under it at test scale while being unbroadcastable at 100 TB — and even
locally the hashed-relation build is the slow path (q4's LeftSemi forced
BuildRight over all 6M lineitem rows: 3.2× the inverted plan; fixed in
round 7). Wall-clock audits (scale_audit.py) catch this only when the
ratio trips; this audit catches the SHAPE at any scale, without
executing a single job.

Two severity classes, split by the parent join's type:

- FLAGGED (exit 1): the join type FORCES the fact onto the build side
  (LeftSemi / LeftAnti / LeftOuter with BuildRight, RightOuter with
  BuildLeft, ExistenceJoin). Spark cannot swap sides for these, and at
  scale AQE's only fallback is a shuffle join that still hashes the
  whole fact per partition. The fix is structural: put a shrinker
  (distinct on the join key, or a pre-aggregate) below the build side
  so it is bounded by key cardinality, not fact row count.
- INFO (reported, not failing): inner-join broadcasts of a filtered/
  projected fact. At test SF the optimizer chose broadcast because the
  projection fits; past the threshold AQE re-plans to a shuffle join
  with both sides partitioned — graceful degradation, and forcing a
  distinct here would add a shuffle the optimizer would not need.

A broadcast subtree that CONTAINS an aggregate/window/limit is fine
(per-key aggregates, top-k lists, 1-row scalars stay small by
construction, whatever the input size). Broadcast of dimension tables
(region/nation/customer/supplier/part) is fine — they are the broadcast
design target. `events` appears as both a fact and a self-enrich side;
it is a fact here.

Emits one JSON line:
  {"metric": "broadcast_fact_audit", "queries": N,
   "flagged": [{"query", "table", "join", "subtree_head"}],
   "info": [...same shape...]}

Usage: python tools/broadcast_audit.py /tmp/sparkdata/sf1 > BROADCAST_AUDIT_r{N}.json
"""

from __future__ import annotations

import json
import os
import re
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

FACTS = ("lineitem", "orders", "events", "documents", "embeddings")
# Operators that bound the size of a subtree regardless of its input:
SHRINKERS = re.compile(
    r"HashAggregate|SortAggregate|ObjectHashAggregate|Window|"
    r"TakeOrderedAndProject|GlobalLimit|LocalLimit|Deduplicate"
)
# Join types where the build side is dictated by the join semantics, not
# by the optimizer's size estimate — AQE cannot swap sides to rescue them:
FORCED = re.compile(r"LeftSemi|LeftAnti|LeftOuter|RightOuter|FullOuter|ExistenceJoin")
# Adjudicated forced-build broadcasts, each with the evidence for why the
# structural fix (shrinker below the build side) does not exist or does
# not help. Keyed (query, table); mirrors scale_audit's output_bound style.
ADJUDICATED = {
    ("q21_waiting_suppliers", "orders"): (
        "build key o_orderkey is the orders PK — distinct cannot shrink a "
        "primary key. Past the broadcast threshold the LeftSemi degrades to "
        "SortMergeJoin on l_orderkey, whose exchange is REUSED by q21's "
        "window aggregates (they partition by l_orderkey too), so the "
        "at-scale plan is one fact shuffle either way."
    ),
}


def indent_of(line: str) -> int:
    return len(line) - len(line.lstrip(" :+-*"))


def parent_join(lines, i):
    """The nearest ancestor join node above line i (lower indent)."""
    base = indent_of(lines[i])
    for j in range(i - 1, -1, -1):
        line = lines[j]
        if line.strip() and indent_of(line) < base:
            if "Join" in line:
                return line.strip()[:160]
            base = indent_of(line)
    return ""


def _subtree(lines, i):
    base = indent_of(lines[i])
    out = []
    for nxt in lines[i + 1 :]:
        if nxt.strip() and indent_of(nxt) <= base:
            break
        out.append(nxt)
    return out


def audit_plan(plan: str):
    """Yield (fact, join, head, forced) for every BroadcastExchange whose
    subtree scans a fact with no shrinking operator in between."""
    lines = plan.splitlines()
    for i, line in enumerate(lines):
        if "BroadcastExchange" not in line:
            continue
        subtree = _subtree(lines, i)
        body = "\n".join(subtree)
        if SHRINKERS.search(body):
            continue
        join = parent_join(lines, i)
        forced = bool(FORCED.search(join))
        for fact in FACTS:
            if f"{fact}.parquet" in body:
                head = subtree[0].strip() if subtree else ""
                yield fact, join, head[:120], forced


def audit_single_partition(plan: str):
    """Yield (fact, head) for every `Exchange SinglePartition` whose
    subtree scans a fact with NO shrinker below it — the serialize-
    everything collapse class: a global sort/window/agg placed directly
    over raw fact rows funnels the entire table through one task at any
    scale. A SinglePartition exchange ABOVE an aggregate is the normal
    1-row/|V|-row global-total shape (all 20 current occurrences) and is
    not flagged."""
    lines = plan.splitlines()
    for i, line in enumerate(lines):
        if "Exchange SinglePartition" not in line:
            continue
        subtree = _subtree(lines, i)
        body = "\n".join(subtree)
        if SHRINKERS.search(body):
            continue
        for fact in FACTS:
            if f"{fact}.parquet" in body:
                head = subtree[0].strip() if subtree else ""
                yield fact, head[:120]


def main(sf_dir: str) -> int:
    from minibatch_spark.plans import explain_str
    from minibatch_spark.registry import all_queries
    from minibatch_spark.session import get_spark

    spark = get_spark()
    flagged, info = [], []
    qs = all_queries()
    for name, fn in sorted(qs.items()):
        try:
            plan = explain_str(fn(spark, sf_dir), mode="simple")
        except Exception as e:  # non-plan failures surface loudly
            flagged.append({"query": name, "table": "<build-error>",
                            "join": "", "subtree_head": str(e)[:120]})
            continue
        for fact, join, head, forced in audit_plan(plan):
            row = {"query": name, "table": fact, "join": join,
                   "subtree_head": head}
            if forced and (name, fact) in ADJUDICATED:
                row["adjudicated"] = ADJUDICATED[(name, fact)]
                info.append(row)
            elif forced:
                flagged.append(row)
            else:
                info.append(row)
        for fact, head in audit_single_partition(plan):
            flagged.append({"query": name, "table": fact,
                            "join": "Exchange SinglePartition",
                            "subtree_head": head})
    print(json.dumps({
        "metric": "broadcast_fact_audit",
        "sf_dir": sf_dir,
        "queries": len(qs),
        "flagged": flagged,
        "info": info,
    }))
    return 1 if flagged else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1] if len(sys.argv) > 1 else "/tmp/sparkdata/sf1"))
