#!/usr/bin/env python
"""Streaming-store skew/scale audit (r7 VERDICT Missing #1 / What's-wrong
#3; slope flag + compaction cadence added in round 9): the batch registry
has had skew + scale sweeps since round 5, but the three streaming stores
— curation (curate_stream.CurateStore), near-dup dedup
(incremental.MinhashDedupStore), ANN ingest (ivf_store.IvfIndexStore) —
were correctness-pinned only. This audit times their per-shard processing
on three regimes:

- ``uniform``:  the uniform corpus, N_SHARDS shards — the baseline.
- ``skewed``:   the SAME-SIZE skewed corpus (tools/gen_skewed.py:
  50%-hot documents.source + one ~100k-word giant document), same shard
  count — same-size data means a ratio far above 1 is a SKEW cost, not
  a volume cost. Flag: total wall > 2x uniform (the batch audit's bar).
- ``sharded``: the uniform corpus again at SHARD_MULT x the shard count
  (40 batches; an 80-batch mid-round-9 variant halved the batch size and
  DILUTED the slope signal — fixed per-batch job latency dominated the
  store-tracking term — so the horizon went back to 40, where the r8
  code's growth is visible above noise).
  Each shard is ~SHARD_MULT x smaller, so MEAN PER-BATCH wall must not
  exceed the uniform baseline's (flag > 2x): a per-batch cost pinned to
  |standing store| instead of |batch| + its candidates — the
  incremental-scaling bug class — would hold per-batch wall flat or
  growing while batch size falls. Total wall legitimately grows with
  shard count (fixed per-batch job overhead x SHARD_MULT), so total is
  reported but not flagged on this axis. (The JSON key stays
  ``shards10`` for artifact-diff continuity.)

SLOPE FLAG (round 9, the r8 verdict's finding): a per-batch cost that
grows LINEARLY with store size passes the mean-based flags forever — the
mean grows with the store, so max < 2x mean structurally holds. The audit
compares the LAST quartile's mean per-batch wall to the FIRST quartile's
on the shards10 trajectory (batch 0 dropped — it trains / warms): ratio
> SLOPE_FLAG_RATIO at constant shard size means per-batch cost is
tracking the standing store, not the batch.

The slope regime runs on ``slope_dir`` (sf1 — 10x the standing-store
term), and every number below is a committed measurement, not a hope:

- At sf0.1 no threshold separates sick from healthy: fixed per-batch job
  latency (~1.7 s) drowns the ~0.6 s standing-scan term — the round-8
  full-re-read code measures only 1.20-1.24 (40/80-batch horizons,
  SKEW_STREAM_r8code40b/80b_r09) while the audit's own noise band
  spans ~±0.1 (ivf: 0.88-1.09 across runs).
- At sf1 the round-8 dedup code FIRES and the round-9 epoch-cached dedup
  store is flat (0.9-1.0): SKEW_STREAM_r8codesf1_r09 vs
  SKEW_STREAM_r09.
- The mid-round-9 partitioned-base-only code measured WORSE than round 8
  (slope 1.78/2.44 at sf0.1 with 4096 tiny base files,
  SKEW_STREAM_midround80b_r09) — the measurement that forced the epoch
  cache.
- The curate store's sf1 slope stayed ABOVE threshold on round-9 code
  (2.82, flagged in SKEW_STREAM_r09): candidate-bound All-Pairs growth
  — exact semantics must examine every prefix-colliding pair, and the
  31-word synthetic vocabulary makes prefix collisions ~linear in store
  size. Round 10 (a) prunes candidates with the PPJoin positional
  filter (curate_stream._new_edges) and (b) NORMALIZES the flag: both
  stores opt in to per-batch candidate counts (``count_candidates``),
  ``cand_per_batch`` + its own quartile slope land in the artifact, and
  the flag fires only when wall grows FASTER than candidates
  (``slope_verdict``: flat / candidate_bound / flagged) — the batch
  scale-audit's output_bound discipline. A wall slope that merely
  tracks candidate growth is an exactness cost of the corpus; one that
  exceeds it is an overhead bug.

Noise discipline: per-batch walls are ELEMENTWISE minima across reps
(this host is co-tenant noisy; a single slow run would fake a slope), the
same min-of-N philosophy as bench.py.

COMPACTION CADENCE: the stores are driven the way the streaming drivers
now drive them (dedup_doc_stream/curate_doc_stream/ingest_embedding_stream
``compact_every``) — store.compact() every COMPACT_EVERY batches,
timed SEPARATELY (``compact_sec``): compaction is amortized maintenance,
and folding its O(store) rewrite into one batch's wall would fake a
slope the read path doesn't have.

Stores are driven DIRECTLY (process_batch / train+append+report), the
exact surface the foreachBatch handlers call: the streaming machinery
around them adds only fixed dispatch cost, and the crash/replay path is
pinned separately by tests/test_streaming_{curate,dedup,ivf}.py. The
result frame of the dedup store (keep decisions) is materialized into
the noop sink, matching bench.py's compute-not-collect discipline.

Usage:
    python tools/gen_skewed.py /root/testdata/sf0.1 /tmp/skewdata/sf0.1
    python tools/skew_stream_audit.py /root/testdata/sf0.1 \
        /tmp/skewdata/sf0.1 > SKEW_STREAM_r09.json
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import time
import uuid

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from pyspark.sql import functions as F  # noqa: E402

N_SHARDS = 4
SHARD_MULT = 10  # sharded-regime batch count = N_SHARDS * SHARD_MULT = 40
# The streaming drivers' cadence; SKEW_STREAM_COMPACT_EVERY=0 disables —
# that is how the round-8 system ran (its drivers never compacted), so
# the slope flag's fires-on-r8 evidence uses 0 over the r8 worktree and
# the goes-quiet run uses the default over HEAD.
COMPACT_EVERY = int(os.environ.get("SKEW_STREAM_COMPACT_EVERY", "8"))
SCRATCH = "/tmp/streamaudit"
SLOPE_FLAG_RATIO = 1.3


def _fresh(name: str) -> str:
    d = os.path.join(SCRATCH, f"{name}-{uuid.uuid4().hex[:8]}")
    os.makedirs(d, exist_ok=True)
    return d


def _noop(df) -> None:
    df.write.format("noop").mode("overwrite").save()


def _maybe_compact(store, i: int, n_shards: int, cwalls: list) -> None:
    """The streaming drivers' cadence, between batches (the safe point);
    never after the final batch (nothing would read the result here)."""
    if COMPACT_EVERY and (i + 1) % COMPACT_EVERY == 0 and i + 1 < n_shards:
        # compact() on current stores; compact_bands() on the round-8
        # MinhashDedupStore (the tool must also run against older code so
        # the slope flag's fires-then-quiet evidence is reproducible)
        fn = (
            getattr(store, "maybe_compact", None)
            or getattr(store, "compact", None)
            or store.compact_bands
        )
        t0 = time.monotonic()
        fn()
        cwalls.append(time.monotonic() - t0)


def run_curate(
    spark, sf_dir: str, n_shards: int, candidate_mode: str = "exact"
) -> dict:
    from minibatch_spark.catalog import load_table
    from minibatch_spark.streaming.curate_stream import CurateStore

    store = CurateStore(
        spark, _fresh(f"curate-{candidate_mode}"), candidate_mode=candidate_mode
    )
    # opt in to per-batch candidate counts (off by default so production
    # ingests never pay the extra job): the slope is then readable
    # against CANDIDATE growth — exact All-Pairs verify work is
    # candidate-bound by construction
    store.count_candidates = True
    d = load_table(spark, sf_dir, "documents").select(
        "doc_id", "text", "source"
    )
    walls, cwalls, cands = [], [], []
    for i in range(n_shards):
        sh = d.filter(F.col("doc_id") % n_shards == i)
        t0 = time.monotonic()
        store.process_batch(sh, batch_tag=f"b{i}")
        walls.append(time.monotonic() - t0)
        cands.append(getattr(store, "last_cand_count", None))
        _maybe_compact(store, i, n_shards, cwalls)
    # the report is the read side of the store — include one at the end
    # so a skew cost hiding in the global steps (CC over the edge set)
    # is measured too
    t0 = time.monotonic()
    _noop(store.report())
    out = {
        "batch": walls,
        "extra": {"report_sec": time.monotonic() - t0},
        "compact": cwalls,
    }
    if any(c is not None for c in cands):
        out["cand"] = cands
    return out


def run_dedup(spark, sf_dir: str, n_shards: int) -> dict:
    from minibatch_spark.catalog import load_table
    from minibatch_spark.operators.incremental import MinhashDedupStore

    store = MinhashDedupStore(spark, _fresh("dedup"))
    store.count_candidates = True  # same attribution data as curate
    d = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    walls, cwalls, cands = [], [], []
    for i in range(n_shards):
        sh = d.filter(F.col("doc_id") % n_shards == i)
        t0 = time.monotonic()
        r = store.process_batch(sh, batch_tag=f"b{i}")
        _noop(r)
        walls.append(time.monotonic() - t0)
        cands.append(getattr(store, "last_cand_count", None))
        r.unpersist(blocking=False)  # consumed; keep the JVM cache bounded
        _maybe_compact(store, i, n_shards, cwalls)
    out = {"batch": walls, "extra": {}, "compact": cwalls}
    if any(c is not None for c in cands):
        out["cand"] = cands
    return out


def run_ivf(spark, sf_dir: str, n_shards: int) -> dict:
    from minibatch_spark.catalog import load_table, spread
    from minibatch_spark.operators.ivf_store import IvfIndexStore
    from minibatch_spark.operators.similarity import as_double

    store = IvfIndexStore(spark, _fresh("ivf"))
    # same opt-in attribution as the other stores (r10 VERDICT #7): the
    # ingest-side candidate is the batch's assignment-row count (per-row
    # work is constant in store size — frozen centroids), so the artifact
    # can separate batch-volume effects from store-tracking overhead
    store.count_candidates = True
    v = spread(load_table(spark, sf_dir, "embeddings")).select(
        "vec_id", as_double("embedding").alias("ve")
    )
    walls, cwalls, cands = [], [], []
    for i in range(n_shards):
        sh = v.filter(F.col("vec_id") % n_shards == i)
        t0 = time.monotonic()
        if i == 0:
            store.train(sh, overwrite=True)  # the streaming batch-0 path
        store.append(sh, tag=f"batch-{i}")
        walls.append(time.monotonic() - t0)
        cands.append(getattr(store, "last_cand_count", None))
        _maybe_compact(store, i, n_shards, cwalls)
    # probe the built store once (the read side)
    q = (
        v.orderBy("vec_id")
        .limit(4)
        .select(F.col("vec_id").alias("query_id"), F.col("ve").alias("qv"))
    )
    t0 = time.monotonic()
    _noop(store.topk(q))
    topk_sec = time.monotonic() - t0
    out = {
        "batch": walls,
        "extra": {"topk_sec": topk_sec},
        "compact": cwalls,
    }
    if any(c is not None for c in cands):
        out["cand"] = cands
    pc = getattr(store, "last_probe_cand_count", None)
    if pc is not None:
        # NOT under "extra": extras are SECONDS summed into total_sec
        out["probe_cand"] = pc
    return out


def run_curate_minhash(spark, sf_dir: str, n_shards: int) -> dict:
    """The round-11 bounded-candidate curate mode (banded-minhash
    candidate sourcing, exact verify): its own slope row so the artifact
    shows the production valve's scale shape next to the exact mode's
    candidate_bound one. Recall vs exact is pinned separately by
    tools/curate_recall.py (CURATE_RECALL_r11.json)."""
    return run_curate(spark, sf_dir, n_shards, candidate_mode="minhash")


def run_decontam(spark, sf_dir: str, n_shards: int) -> dict:
    """Round-11 DecontamStore: the no-corpus-state claim MEASURED — the
    only standing state is the benchmark hash set (loaded once, timed
    as bench_load_sec), so per-batch flag cost should be O(|batch|) and
    independent of how many shards have already been flagged. This row
    is the artifact backing that docstring/SCALE.md claim. cand = the
    batch's k-gram volume (the broadcast-semi probe's input rows — the
    work driver), computed OUTSIDE the timed window so the verdict can
    normalize wall drift on a co-tenant host against batch work."""
    from minibatch_spark.catalog import load_table, spread
    from minibatch_spark.streaming.decontam_stream import (
        DecontamStore,
        _kgram_hashes,
    )

    store = DecontamStore(spark, _fresh("decontam"))
    d = spread(load_table(spark, sf_dir, "documents")).select(
        "doc_id", "text"
    )
    is_bench = F.col("doc_id") % 89 == 0
    t0 = time.monotonic()
    store.add_benchmark(d.filter(is_bench))
    bench_sec = time.monotonic() - t0
    corp = d.filter(~is_bench)
    walls, cands = [], []
    for i in range(n_shards):
        sh = corp.filter(F.col("doc_id") % n_shards == i)
        t0 = time.monotonic()
        _noop(store.flag_batch(sh))
        walls.append(time.monotonic() - t0)
        cands.append(
            _kgram_hashes(sh, store.k)
            .select(F.explode("hs"))
            .count()
        )
    return {
        "batch": walls,
        "extra": {"bench_load_sec": round(bench_sec, 3)},
        "compact": [],
        "cand": cands,
    }


SCENARIOS = {
    "curate": run_curate,
    "curate_minhash": run_curate_minhash,
    "dedup": run_dedup,
    "ivf": run_ivf,
    "decontam": run_decontam,
}


def _slope_ratio(batch_walls: list) -> "float | None":
    """Last-quartile mean / first-quartile mean of the per-batch walls,
    batch 0 dropped (train / warm-up). None when too short to quarter."""
    w = batch_walls[1:]
    q = len(w) // 4
    if q < 2:
        return None
    first = sum(w[:q]) / q
    last = sum(w[-q:]) / q
    return round(last / first, 2) if first else None


def slope_verdict(
    slope: "float | None", cand_slope: "float | None"
) -> "tuple[str, float | None]":
    """Candidate-normalized slope verdict — THE single definition shared
    by this audit and tools/curate_slope_80b.py (round-10 ADVICE: two
    drifting copies would make the 40- and 80-batch artifacts silently
    incomparable). Returns (verdict, slope_per_candidate):

    - ``flat``: wall slope absent or within SLOPE_FLAG_RATIO.
    - ``candidate_bound``: wall grew, but no faster than the candidate
      count — an exactness cost of the corpus (the batch scale-audit's
      output_bound discipline), not an overhead bug.
    - ``flagged``: wall grew faster than candidates (or with no candidate
      data to normalize against) — the incremental-scaling bug class.
    """
    spc = (
        round(slope / cand_slope, 2) if slope and cand_slope else None
    )
    if not slope or slope <= SLOPE_FLAG_RATIO:
        return "flat", spc
    if spc is not None and spc <= SLOPE_FLAG_RATIO:
        return "candidate_bound", spc
    return "flagged", spc


def _measure(spark, fn, sf_dir: str, n_shards: int, reps: int) -> dict:
    runs = [fn(spark, sf_dir, n_shards) for _ in range(reps)]
    # elementwise min across reps: per-batch noise on a co-tenant host
    # would otherwise fake (or hide) a slope
    batch = [min(r["batch"][i] for r in runs) for i in range(n_shards)]
    extra = {
        k: round(min(r["extra"][k] for r in runs), 3)
        for k in runs[0]["extra"]
    }
    n_compacts = min(len(r["compact"]) for r in runs)
    compact = [
        round(min(r["compact"][i] for r in runs), 3)
        for i in range(n_compacts)
    ]
    total = sum(batch) + sum(extra.values())
    cand = next((r["cand"] for r in runs if "cand" in r), None)
    probe_cand = next(
        (r["probe_cand"] for r in runs if "probe_cand" in r), None
    )
    return {
        **({"cand_per_batch": cand} if cand is not None else {}),
        **({"topk_probe_cand": probe_cand} if probe_cand is not None else {}),
        "n_batches": n_shards,
        "total_sec": round(total, 3),
        "mean_batch_sec": round(sum(batch) / len(batch), 3),
        "max_batch_sec": round(max(batch), 3),
        "per_batch_sec": [round(w, 3) for w in batch],
        "compact_sec": compact,
        **extra,
    }


def main(
    uniform_dir: str,
    skewed_dir: str,
    slope_dir: "str | None" = None,
    reps: int = 2,
) -> None:
    from minibatch_spark.session import get_spark

    slope_dir = slope_dir or uniform_dir
    shutil.rmtree(SCRATCH, ignore_errors=True)
    spark = get_spark(app_name="skew-stream-audit")
    out: dict = {
        "uniform_dir": uniform_dir,
        "skewed_dir": skewed_dir,
        "slope_dir": slope_dir,
        "n_shards": N_SHARDS,
        "reps": reps,
        "compact_every": COMPACT_EVERY,
        "note": "per_batch_sec = elementwise min over reps; compact_sec "
        "timed separately (amortized maintenance); shards10 runs on "
        "slope_dir (a 10x corpus raises the standing-store term above "
        "fixed job latency — see module docstring) with its own 4-batch "
        "uniform baseline for the mean-ratio flag",
        "skew": "documents.source 50%->src0, doc 0 = 100k words "
        "(embeddings table is shared/unskewed by gen_skewed; the ivf "
        "skew row measures robustness to the doc-table co-tenancy only)",
        "scenarios": {},
    }
    flagged_skew, flagged_shards, flagged_slope = [], [], []
    for name, fn in SCENARIOS.items():
        uni = _measure(spark, fn, uniform_dir, N_SHARDS, reps)
        skw = _measure(spark, fn, skewed_dir, N_SHARDS, reps)
        uni_slope = (
            _measure(spark, fn, slope_dir, N_SHARDS, reps)
            if slope_dir != uniform_dir
            else uni
        )
        sh10 = _measure(spark, fn, slope_dir, N_SHARDS * SHARD_MULT, reps)
        skew_ratio = (
            round(skw["total_sec"] / uni["total_sec"], 2)
            if uni["total_sec"]
            else None
        )
        shard_batch_ratio = (
            round(sh10["mean_batch_sec"] / uni_slope["mean_batch_sec"], 2)
            if uni_slope["mean_batch_sec"]
            else None
        )
        slope = _slope_ratio(sh10["per_batch_sec"])
        # candidate-normalized attribution (round-9 VERDICT Missing #2 /
        # the batch scale-audit's output_bound discipline): exact
        # All-Pairs verify work is candidate-bound by construction, so a
        # wall slope that merely TRACKS candidate growth is an exactness
        # cost of the corpus, not an overhead bug — flag only when wall
        # grows FASTER than candidates (or when no candidate data exists
        # to normalize against). Both readings land in the artifact, so
        # the verdict is decidable from the JSON alone.
        cand_arr = sh10.get("cand_per_batch")
        cand_slope = (
            _slope_ratio(cand_arr)
            if cand_arr and all(c is not None for c in cand_arr)
            else None
        )
        verdict, slope_per_cand = slope_verdict(slope, cand_slope)
        out["scenarios"][name] = {
            "uniform": uni,
            "skewed": {**skw, "total_ratio_vs_uniform": skew_ratio},
            **(
                {"uniform_slope": uni_slope}
                if slope_dir != uniform_dir
                else {}
            ),
            "shards10": {
                **sh10,
                "mean_batch_ratio_vs_uniform": shard_batch_ratio,
                "slope_lastq_over_firstq": slope,
                "cand_slope_lastq_over_firstq": cand_slope,
                "slope_per_candidate": slope_per_cand,
                "slope_verdict": verdict,
            },
        }
        if skew_ratio and skew_ratio > 2:
            flagged_skew.append(name)
        if shard_batch_ratio and shard_batch_ratio > 2:
            flagged_shards.append(name)
        if verdict == "flagged":
            flagged_slope.append(name)
    out["flagged_skew_2x"] = flagged_skew
    out["flagged_shards10_per_batch_2x"] = flagged_shards
    out[f"flagged_shards10_slope_{SLOPE_FLAG_RATIO}x"] = flagged_slope
    print(json.dumps(out, allow_nan=False))
    shutil.rmtree(SCRATCH, ignore_errors=True)
    if flagged_skew or flagged_shards or flagged_slope:
        sys.exit(1)


if __name__ == "__main__":
    # argv[3] changed meaning in round 9 (reps -> slope_dir); validate so
    # an old-style numeric invocation fails here with a clear message
    # instead of deep inside a spark read (round-9 ADVICE)
    if len(sys.argv) > 3 and not os.path.isdir(sys.argv[3]):
        sys.exit(
            f"skew_stream_audit: slope_dir {sys.argv[3]!r} is not a "
            "directory. Usage: skew_stream_audit.py [uniform_dir] "
            "[skewed_dir] [slope_dir] [reps]"
        )
    main(
        sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1",
        sys.argv[2] if len(sys.argv) > 2 else "/tmp/skewdata/sf0.1",
        sys.argv[3] if len(sys.argv) > 3 else None,
        int(sys.argv[4]) if len(sys.argv) > 4 else 2,
    )
