#!/usr/bin/env python
"""r12 shuffle-codec experiment (guide §2.3, deferred from r11): lz4
(default) vs zstd for spark.io.compression.codec, measured at a scale
where shuffle bytes are non-trivial (sf10). Interleaved subprocess JVMs,
shuffle-heavy headline queries only, noop sink, min over runs x reps.

Usage: python tools/codec_ab_r12.py <sf_dir> <runs_per_side> [reps]
"""

from __future__ import annotations

import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

# The headline queries whose plans carry real exchanges (the scan-bound
# ones would only add noise): aggregations, windows, joins, dedup fanout.
QUERIES = [
    "q3_shipping_priority",
    "q5_local_supplier_volume",
    "window_rank_orders",
    "sessionize_events",
    "agg_distinct_users",
    "dedup_minhash_pairs",
    "dedup_ngram_jaccard",
    "text_top_bigrams",
]

_CHILD = r"""
import json, os, sys, time
sys.path.insert(0, os.environ["MBS_REPO"])
from minibatch_spark.registry import all_queries
from minibatch_spark.session import get_spark

codec = os.environ["MBS_CODEC"]
sf_dir = os.environ["MBS_SF_DIR"]
reps = int(os.environ["MBS_REPS"])
names = json.loads(os.environ["MBS_QUERIES"])
spark = get_spark(
    app_name=f"codec-ab-{codec}",
    extra_conf={"spark.io.compression.codec": codec},
)
qs = all_queries()
# warm every measured shape once at the measured sf (JIT parity)
for n in names:
    qs[n](spark, sf_dir).write.format("noop").mode("overwrite").save()
spark.catalog.clearCache()
out = {}
for n in names:
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        qs[n](spark, sf_dir).write.format("noop").mode("overwrite").save()
        best = min(best, time.perf_counter() - t0)
    out[n] = round(best, 3)
    spark.catalog.clearCache()
print(json.dumps(out))
"""


def _run(sf_dir: str, reps: int, codec: str) -> dict:
    env = dict(
        os.environ,
        MBS_REPO=REPO,
        MBS_CODEC=codec,
        MBS_SF_DIR=sf_dir,
        MBS_REPS=str(reps),
        MBS_QUERIES=json.dumps(QUERIES),
    )
    out = subprocess.run(
        [sys.executable, "-c", _CHILD],
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
        order = [("lz4", a_runs), ("zstd", b_runs)]
        if i % 2 == 1:
            order.reverse()
        for codec, sink in order:
            sink.append(_run(sf_dir, reps, codec))
    per_query = {}
    for q in QUERIES:
        a = min(r[q] for r in a_runs)
        b = min(r[q] for r in b_runs)
        per_query[q] = {"lz4": a, "zstd": b, "zstd_over_lz4": round(b / a, 2)}
    print(
        json.dumps(
            {
                "method": f"{runs} alternating subprocess JVMs per side, "
                f"min-of-{reps} noop per query, shuffle-heavy subset",
                "sf_dir": sf_dir,
                "per_query": per_query,
                "lz4_total": round(sum(min(r[q] for r in a_runs) for q in QUERIES), 3),
                "zstd_total": round(sum(min(r[q] for r in b_runs) for q in QUERIES), 3),
            },
            indent=1,
        )
    )


if __name__ == "__main__":
    main(
        sys.argv[1] if len(sys.argv) > 1 else "/tmp/sparkdata/sf10",
        int(sys.argv[2]) if len(sys.argv) > 2 else 3,
        int(sys.argv[3]) if len(sys.argv) > 3 else 2,
    )
