#!/usr/bin/env python
"""Streaming-store skew/scale audit (r7 VERDICT Missing #1 / What's-wrong
#3): the batch registry has had skew + scale sweeps since round 5, but
the three streaming stores — curation (curate_stream.CurateStore),
near-dup dedup (incremental.MinhashDedupStore), ANN ingest
(ivf_store.IvfIndexStore) — were correctness-pinned only. This audit
times their per-shard processing on three regimes:

- ``uniform``:  the uniform corpus, N_SHARDS shards — the baseline.
- ``skewed``:   the SAME-SIZE skewed corpus (tools/gen_skewed.py:
  50%-hot documents.source + one ~100k-word giant document), same shard
  count — same-size data means a ratio far above 1 is a SKEW cost, not
  a volume cost. Flag: total wall > 2x uniform (the batch audit's bar).
- ``shards10``: the uniform corpus again at 10x the shard count. Each
  shard is ~10x smaller, so MEAN PER-BATCH wall must not exceed the
  uniform baseline's (flag > 2x): a per-batch cost pinned to |standing
  store| instead of |batch| + its candidates — the incremental-scaling
  bug class (e.g. re-deriving band keys over the whole store per batch,
  the round-6 minhash fix) — would hold per-batch wall flat or growing
  while batch size falls. Total wall legitimately grows with shard
  count (fixed per-batch job overhead x 10), so total is reported but
  not flagged on this axis.

Stores are driven DIRECTLY (process_batch / train+append+report), the
exact surface the foreachBatch handlers call: the streaming machinery
around them adds only fixed dispatch cost, and the crash/replay path is
pinned separately by tests/test_streaming_{curate,dedup,ivf}.py. The
result frame of the dedup store (keep decisions) is materialized into
the noop sink, matching bench.py's compute-not-collect discipline.

Usage:
    python tools/gen_skewed.py /root/testdata/sf0.1 /tmp/skewdata/sf0.1
    python tools/skew_stream_audit.py /root/testdata/sf0.1 \
        /tmp/skewdata/sf0.1 > SKEW_STREAM_r08.json
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
SCRATCH = "/tmp/streamaudit"


def _fresh(name: str) -> str:
    d = os.path.join(SCRATCH, f"{name}-{uuid.uuid4().hex[:8]}")
    os.makedirs(d, exist_ok=True)
    return d


def _noop(df) -> None:
    df.write.format("noop").mode("overwrite").save()


def run_curate(spark, sf_dir: str, n_shards: int) -> list[float]:
    from minibatch_spark.catalog import load_table
    from minibatch_spark.streaming.curate_stream import CurateStore

    store = CurateStore(spark, _fresh("curate"))
    d = load_table(spark, sf_dir, "documents").select(
        "doc_id", "text", "source"
    )
    walls = []
    for i in range(n_shards):
        sh = d.filter(F.col("doc_id") % n_shards == i)
        t0 = time.monotonic()
        store.process_batch(sh, batch_tag=f"b{i}")
        walls.append(time.monotonic() - t0)
    # the report is the read side of the store — include one at the end
    # so a skew cost hiding in the global steps (CC over the edge set)
    # is measured too
    t0 = time.monotonic()
    _noop(store.report())
    walls.append(time.monotonic() - t0)
    return walls


def run_dedup(spark, sf_dir: str, n_shards: int) -> list[float]:
    from minibatch_spark.catalog import load_table
    from minibatch_spark.operators.incremental import MinhashDedupStore

    store = MinhashDedupStore(spark, _fresh("dedup"))
    d = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    walls = []
    for i in range(n_shards):
        sh = d.filter(F.col("doc_id") % n_shards == i)
        t0 = time.monotonic()
        _noop(store.process_batch(sh, batch_tag=f"b{i}"))
        walls.append(time.monotonic() - t0)
    return walls


def run_ivf(spark, sf_dir: str, n_shards: int) -> list[float]:
    from minibatch_spark.catalog import load_table, spread
    from minibatch_spark.operators.ivf_store import IvfIndexStore
    from minibatch_spark.operators.similarity import as_double

    store = IvfIndexStore(spark, _fresh("ivf"))
    v = spread(load_table(spark, sf_dir, "embeddings")).select(
        "vec_id", as_double("embedding").alias("ve")
    )
    walls = []
    for i in range(n_shards):
        sh = v.filter(F.col("vec_id") % n_shards == i)
        t0 = time.monotonic()
        if i == 0:
            store.train(sh, overwrite=True)  # the streaming batch-0 path
        store.append(sh, tag=f"batch-{i}")
        walls.append(time.monotonic() - t0)
    # probe the built store once (the read side)
    q = (
        v.orderBy("vec_id")
        .limit(4)
        .select(F.col("vec_id").alias("query_id"), F.col("ve").alias("qv"))
    )
    t0 = time.monotonic()
    _noop(store.topk(q))
    walls.append(time.monotonic() - t0)
    return walls


SCENARIOS = {"curate": run_curate, "dedup": run_dedup, "ivf": run_ivf}


def _measure(spark, fn, sf_dir: str, n_shards: int, reps: int) -> dict:
    best = None
    for _ in range(reps):
        walls = fn(spark, sf_dir, n_shards)
        if best is None or sum(walls) < sum(best):
            best = walls
    return {
        "n_batches": n_shards,
        "total_sec": round(sum(best), 3),
        "mean_batch_sec": round(sum(best) / len(best), 3),
        "max_batch_sec": round(max(best), 3),
        "per_batch_sec": [round(w, 3) for w in best],
    }


def main(uniform_dir: str, skewed_dir: str, reps: int = 2) -> None:
    from minibatch_spark.session import get_spark

    shutil.rmtree(SCRATCH, ignore_errors=True)
    spark = get_spark(app_name="skew-stream-audit")
    out: dict = {
        "uniform_dir": uniform_dir,
        "skewed_dir": skewed_dir,
        "n_shards": N_SHARDS,
        "reps": reps,
        "skew": "documents.source 50%->src0, doc 0 = 100k words "
        "(embeddings table is shared/unskewed by gen_skewed; the ivf "
        "skew row measures robustness to the doc-table co-tenancy only)",
        "scenarios": {},
    }
    flagged_skew, flagged_shards = [], []
    for name, fn in SCENARIOS.items():
        uni = _measure(spark, fn, uniform_dir, N_SHARDS, reps)
        skw = _measure(spark, fn, skewed_dir, N_SHARDS, reps)
        sh10 = _measure(spark, fn, uniform_dir, N_SHARDS * 10, reps)
        skew_ratio = (
            round(skw["total_sec"] / uni["total_sec"], 2)
            if uni["total_sec"]
            else None
        )
        shard_batch_ratio = (
            round(sh10["mean_batch_sec"] / uni["mean_batch_sec"], 2)
            if uni["mean_batch_sec"]
            else None
        )
        out["scenarios"][name] = {
            "uniform": uni,
            "skewed": {**skw, "total_ratio_vs_uniform": skew_ratio},
            "shards10": {
                **sh10,
                "mean_batch_ratio_vs_uniform": shard_batch_ratio,
            },
        }
        if skew_ratio and skew_ratio > 2:
            flagged_skew.append(name)
        if shard_batch_ratio and shard_batch_ratio > 2:
            flagged_shards.append(name)
    out["flagged_skew_2x"] = flagged_skew
    out["flagged_shards10_per_batch_2x"] = flagged_shards
    print(json.dumps(out, allow_nan=False))
    shutil.rmtree(SCRATCH, ignore_errors=True)
    if flagged_skew or flagged_shards:
        sys.exit(1)


if __name__ == "__main__":
    main(
        sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1",
        sys.argv[2] if len(sys.argv) > 2 else "/tmp/skewdata/sf0.1",
        int(sys.argv[3]) if len(sys.argv) > 3 else 2,
    )
