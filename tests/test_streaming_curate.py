"""Streaming curation (streaming/curate_stream.py): the flagship
curate_corpus pipeline driven shard-by-shard from Structured Streaming
must produce a report BIT-IDENTICAL to the batch operator on the same
corpus — the batch-invariance proof dedup_incremental_minhash already
has, extended to the full quality-gate ∘ keep-best ∘ split ∘ mixture
composition (round-6 verdict #7). Also pinned: arrival-ORDER
independence (every report-time step is order-independent, stronger
than the minhash store's ascending-id contract) and replayed-batch
idempotence (the foreachBatch crash path)."""

import os

from pyspark.sql import functions as F

from tests.conftest import SF_SMOKE


def _doc_shards(spark, n_shards=3):
    from minibatch_spark.catalog import load_table

    d = load_table(spark, SF_SMOKE, "documents").select(
        "doc_id", "text", "source"
    )
    return [
        d.filter(F.col("doc_id") % n_shards == i) for i in range(n_shards)
    ]


def _batch_report(spark):
    from minibatch_spark.operators.curation import curate_corpus

    return sorted(
        (r.split, r.source, r.n_docs, r.tokens, r.token_share)
        for r in curate_corpus(spark, SF_SMOKE).collect()
    )


def _write_part(spark, df, path, mtime):
    df.coalesce(1).write.mode("overwrite").parquet(path)
    for root, _dirs, files in os.walk(path):
        for f in files:
            os.utime(os.path.join(root, f), (mtime, mtime))


def test_streamed_report_matches_batch_curate_corpus(spark, tmp_path):
    """Three micro-batches through the real Structured Streaming path ==
    one batch curate_corpus run: identical (split, source, n_docs,
    tokens, token_share) rows."""
    from minibatch_spark.streaming.curate_stream import (
        CurateStore,
        curate_doc_stream,
    )

    base = str(tmp_path)
    src = os.path.join(base, "src")
    os.makedirs(src)
    for i, shard in enumerate(_doc_shards(spark)):
        _write_part(spark, shard, os.path.join(src, f"p{i}"), 1_000_000_000 + i)

    stream = (
        spark.readStream.schema("doc_id long, text string, source string")
        .option("maxFilesPerTrigger", 1)
        .parquet(src + "/*")
    )
    seen = []
    q = curate_doc_stream(
        spark,
        stream,
        os.path.join(base, "store"),
        os.path.join(base, "ckpt"),
        on_batch=lambda bid, n: seen.append((bid, n)),
    )
    q.awaitTermination()
    assert len(seen) == 3 and sum(n for _, n in seen) == 500

    streamed = sorted(
        (r.split, r.source, r.n_docs, r.tokens, r.token_share)
        for r in CurateStore(spark, os.path.join(base, "store"))
        .report()
        .collect()
    )
    assert streamed == _batch_report(spark)


def test_arrival_order_independent(spark, tmp_path):
    """Shards ingested in REVERSE order yield the same report: canonical
    choice (min per hash), CC labels, keep-best, and split are all pure
    functions of accumulated state — no ascending-id contract."""
    from minibatch_spark.streaming.curate_stream import CurateStore

    store = CurateStore(spark, os.path.join(str(tmp_path), "rev"))
    for i, shard in enumerate(reversed(_doc_shards(spark))):
        store.process_batch(shard, batch_tag=f"b{i}")
    got = sorted(
        (r.split, r.source, r.n_docs, r.tokens, r.token_share)
        for r in store.report().collect()
    )
    assert got == _batch_report(spark)


def test_replayed_batch_is_idempotent(spark, tmp_path):
    """The crash-replay contract: rollback + reprocess of the SAME shard
    tag leaves facts/shingles/edges — and the report — bit-identical to
    a single processing (no doubled facts, no duplicate edges)."""
    from minibatch_spark.streaming.curate_stream import CurateStore

    shards = _doc_shards(spark, 2)
    store = CurateStore(spark, os.path.join(str(tmp_path), "replay"))
    store.process_batch(shards[0], batch_tag="b0")
    once = sorted(
        (r.split, r.source, r.n_docs, r.tokens, r.token_share)
        for r in store.report().collect()
    )
    n_facts, n_edges = store.facts().count(), store.edges().count()
    # replay batch 0 (crash between process and checkpoint commit)
    store.rollback("b0")
    store.process_batch(shards[0], batch_tag="b0")
    again = sorted(
        (r.split, r.source, r.n_docs, r.tokens, r.token_share)
        for r in store.report().collect()
    )
    assert again == once
    assert store.facts().count() == n_facts
    assert store.edges().count() == n_edges


def test_compact_preserves_report_and_survives_crash_windows(spark, tmp_path):
    """CurateStore.compact() (r7 verdict #6): tag dirs merge into one
    base per root with the report bit-identical across the flip; BOTH
    crash windows are safe — (a) base written but manifest not flipped:
    the compacted-* dir is invisible garbage (old contents intact) and
    the next compact GCs it; (b) manifest flipped but covered files not
    yet deleted: the manifest masks them (no duplicates). Ingest after
    compaction works; an absorbed tag re-append raises."""
    import json
    import shutil

    import pytest

    from minibatch_spark.streaming.curate_stream import CurateStore

    shards = _doc_shards(spark, 3)
    store = CurateStore(spark, os.path.join(str(tmp_path), "cmp"))
    store.process_batch(shards[0], batch_tag="b0")
    store.process_batch(shards[1], batch_tag="b1")

    def rep(s):
        return sorted(
            (r.split, r.source, r.n_docs, r.tokens, r.token_share)
            for r in s.report().collect()
        )

    def state(s):
        return (
            sorted((r.doc_id, r.text_hash) for r in s.facts().collect()),
            sorted((r.doc_a, r.doc_b) for r in s.edges().collect()),
            s.shingles().count(),
        )

    before = state(store)
    # crash window (a): a compacted-* base exists but no manifest flip
    orphan = os.path.join(store.store_dir, "compacted-crashedorphan")
    for name in ("facts", "shingles", "edges"):
        os.makedirs(os.path.join(orphan, name), exist_ok=True)
    store.facts().limit(3).write.mode("overwrite").parquet(
        os.path.join(orphan, "facts")
    )
    assert state(store) == before  # invisible garbage, not duplicates

    store.compact()
    assert state(store) == before
    assert not os.path.exists(orphan)  # orphan GC'd
    man = json.load(open(store._manifest_path))
    assert {"b0", "b1"} <= set(man["absorbed_tags"])
    # the raw tag dirs are gone; exactly one base remains
    assert not os.path.exists(os.path.join(store.facts_dir, "tag=b0"))
    bases = [
        d for d in os.listdir(store.store_dir) if d.startswith("compacted-")
    ]
    assert bases == [f"compacted-{man['id']}"]

    # crash window (b): resurrect a covered tag dir — the manifest masks it
    ghost = os.path.join(store.shingles_dir, "tag=b0")
    store.shingles().limit(2).write.mode("overwrite").parquet(ghost)
    # the ghost's files are NEW (not the covered realpaths), so this
    # simulates the stronger case: stale data reappearing under an
    # absorbed tag name is the process_batch guard's job, while window
    # (b) proper (covered files not yet unlinked) is masked by realpath.
    shutil.rmtree(ghost)

    # ingest after compaction, then a second compact merges base + delta
    store.process_batch(shards[2], batch_tag="b2")
    full = state(store)
    assert full[2] > before[2]
    assert rep(store) == _batch_report(spark)  # all 3 shards == batch run
    store.compact()
    assert state(store) == full
    assert rep(store) == _batch_report(spark)
    man2 = json.load(open(store._manifest_path))
    assert {"b0", "b1", "b2"} <= set(man2["absorbed_tags"])

    # absorbed-tag re-append raises (checkpoint-reset protection)
    with pytest.raises(ValueError, match="absorbed"):
        store.process_batch(shards[0], batch_tag="b0")

    # a FRESH store object on the same dir reads the compacted state
    reopened = CurateStore(spark, store.store_dir)
    assert state(reopened) == full


def test_compact_window_b_masks_covered_files(spark, tmp_path):
    """Crash window (b) proper: manifest flipped but the covered raw
    files never deleted — readers must see base + nothing twice. Inject
    by restoring the covered tag dirs from a copy after compact()."""
    import shutil

    from minibatch_spark.streaming.curate_stream import CurateStore

    shards = _doc_shards(spark, 2)
    store = CurateStore(spark, os.path.join(str(tmp_path), "winb"))
    store.process_batch(shards[0], batch_tag="b0")
    store.process_batch(shards[1], batch_tag="b1")
    before = sorted(
        (r.doc_id, r.text_hash) for r in store.facts().collect()
    )
    # copy the raw roots aside, compact, then restore the copies OVER the
    # (now-empty) roots — the same bytes at the same realpaths the
    # manifest covers, exactly what an interrupted gc leaves behind
    aside = os.path.join(str(tmp_path), "aside")
    for name in ("facts", "shingles", "edges"):
        shutil.copytree(
            os.path.join(store.store_dir, name), os.path.join(aside, name)
        )
    store.compact()
    for name in ("facts", "shingles", "edges"):
        dst = os.path.join(store.store_dir, name)
        shutil.rmtree(dst, ignore_errors=True)
        shutil.copytree(os.path.join(aside, name), dst)
    assert (
        sorted((r.doc_id, r.text_hash) for r in store.facts().collect())
        == before
    )
    # and the next compact absorbs the leftovers for good
    store.compact()
    assert (
        sorted((r.doc_id, r.text_hash) for r in store.facts().collect())
        == before
    )


# --- round 9: pruned standing-side reads + prefix-postings root -----------


def test_prefs_prune_input_files_and_slice(spark, tmp_path):
    """After compact() the prefix-postings base is partitioned by
    pmod(sh1, 256) and the shingle base by pmod(doc_id, 256); pruned
    reads touch only matching cells and return exactly the matching
    slice (deltas appended since are always read)."""
    from minibatch_spark.streaming.curate_stream import CurateStore

    store = CurateStore(spark, os.path.join(str(tmp_path), "pf"))
    shards = _doc_shards(spark)
    store.process_batch(shards[0], batch_tag="b0")
    # target_partition_bytes=1 forces the finest (gsz=1) split: default
    # granularity scales with base size and a test-sized store would get
    # ONE unpartitioned base (nothing to prune)
    store.compact(target_partition_bytes=1)
    store.process_batch(shards[1], batch_tag="b1")  # delta on top

    full = [(r.doc_id, r.n, r.sh1) for r in store.prefs().collect()]
    cells = sorted({sh1 % 256 for _, _, sh1 in full})[:5]
    pruned = store.prefs(hpfxs=cells)
    for f in pruned.inputFiles():
        seg = next((s for s in f.split("/") if s.startswith("hp=")), None)
        assert seg is None or seg in {f"hp={c}" for c in cells}, f
    got = sorted((r.doc_id, r.n, r.sh1) for r in pruned.collect())
    # pruned view ⊇ matching slice; extras only from unpartitioned deltas
    want = sorted(t for t in full if t[2] % 256 in set(cells))
    assert [t for t in got if t[2] % 256 in set(cells)] == want

    dcells = sorted({r.doc_id % 256 for r in store.shingles().collect()})[:5]
    sp = store.shingles(dpfxs=dcells)
    for f in sp.inputFiles():
        seg = next((s for s in f.split("/") if s.startswith("dp=")), None)
        assert seg is None or seg in {f"dp={c}" for c in dcells}, f


def test_legacy_store_without_prefs_backfills(spark, tmp_path):
    """A store written before the prefs root existed must backfill it
    from the shingle arrays ONCE — else standing docs silently stop
    matching new near-duplicates (the minhash band-backfill lesson)."""
    import shutil

    from minibatch_spark.streaming.curate_stream import CurateStore

    base_txt = (
        "the quick brown fox jumps over the lazy dog again and again today "
        "with plenty of extra words to make the shingle set long enough"
    )
    # append one word: adds a single shingle, J = n/(n+1) >= 0.8
    near_txt = base_txt + " tonight"
    store = CurateStore(spark, os.path.join(str(tmp_path), "legacy"))
    d1 = spark.createDataFrame(
        [(1, base_txt, "s")], "doc_id long, text string, source string"
    )
    store.process_batch(d1, batch_tag="b0")
    # simulate a pre-prefs store
    shutil.rmtree(store.prefs_dir, ignore_errors=True)

    reopened = CurateStore(spark, os.path.join(str(tmp_path), "legacy"))
    d2 = spark.createDataFrame(
        [(2, near_txt, "s")], "doc_id long, text string, source string"
    )
    reopened.process_batch(d2, batch_tag="b1")
    edges = {(r.doc_a, r.doc_b) for r in reopened.edges().collect()}
    assert (1, 2) in edges
    # backfill persisted, not re-derived per batch
    assert reopened._files(reopened.prefs_dir)


def test_legacy_pos_null_prefs_still_match(spark, tmp_path):
    """A store whose prefs were written BEFORE the PPJoin pos column
    existed (round 10) reads pos as null via schema-on-read; the
    positional filter must PASS those rows — legacy standing docs are
    merely unpruned, never lost as near-dup partners."""
    import shutil

    from minibatch_spark.streaming.curate_stream import (
        _PREF_SCHEMA,
        CurateStore,
    )

    base_txt = (
        "the quick brown fox jumps over the lazy dog again and again today "
        "with plenty of extra words to make the shingle set long enough"
    )
    near_txt = base_txt + " tonight"
    store = CurateStore(spark, os.path.join(str(tmp_path), "posnull"))
    d1 = spark.createDataFrame(
        [(1, base_txt, "s")], "doc_id long, text string, source string"
    )
    store.process_batch(d1, batch_tag="b0")
    # rewrite the prefs root in the pre-round-10 3-column layout
    legacy = [
        (r.doc_id, r.n, r.sh1)
        for r in spark.read.schema(_PREF_SCHEMA)
        .parquet(store.prefs_dir)
        .collect()
    ]
    shutil.rmtree(store.prefs_dir, ignore_errors=True)
    spark.createDataFrame(
        legacy, "doc_id long, n int, sh1 long"
    ).write.parquet(store.prefs_dir)

    reopened = CurateStore(spark, os.path.join(str(tmp_path), "posnull"))
    # reads of the legacy files must surface pos as null, not crash
    assert {r.pos for r in reopened.prefs().collect()} == {None}
    d2 = spark.createDataFrame(
        [(2, near_txt, "s")], "doc_id long, text string, source string"
    )
    reopened.process_batch(d2, batch_tag="b1")
    edges = {(r.doc_a, r.doc_b) for r in reopened.edges().collect()}
    assert (1, 2) in edges


def test_compact_exclude_tags_keeps_batch_rollbackable(spark, tmp_path):
    """compact(exclude_tags={t}) must leave tag t's appends out of the
    base so rollback(t) still removes them — the safety valve the
    streaming auto-compaction cadence relies on."""
    from minibatch_spark.streaming.curate_stream import CurateStore

    store = CurateStore(spark, os.path.join(str(tmp_path), "excl"))
    shards = _doc_shards(spark, 2)
    store.process_batch(shards[0], batch_tag="b0")
    store.process_batch(shards[1], batch_tag="b1")
    n0 = store.facts().count()
    n1 = shards[1].count()
    store.compact(exclude_tags={"b1"})
    assert store.facts().count() == n0  # nothing lost by the flip
    store.rollback("b1")  # still raw, still removable
    assert store.facts().count() == n0 - n1
    # and b1 is NOT absorbed: re-processing it after rollback succeeds
    store.process_batch(shards[1], batch_tag="b1")
    assert store.facts().count() == n0


def test_compact_every_batch_report_matches_batch(spark, tmp_path):
    """curate_doc_stream with compact_every=1: per-batch compaction must
    keep the mixture report bit-identical to batch curate_corpus."""
    from minibatch_spark.streaming.curate_stream import (
        CurateStore,
        curate_doc_stream,
    )

    base = str(tmp_path)
    src = os.path.join(base, "src")
    os.makedirs(src)
    for i, shard in enumerate(_doc_shards(spark)):
        _write_part(spark, shard, os.path.join(src, f"p{i}"), 1_000_000_000 + i)
    stream = (
        spark.readStream.schema("doc_id long, text string, source string")
        .option("maxFilesPerTrigger", 1)
        .parquet(src + "/*")
    )
    q = curate_doc_stream(
        spark, stream, os.path.join(base, "store"), os.path.join(base, "ckpt"),
        compact_every=1,
        # force the ratio gate open: this test exercises the flip itself
        # (maybe_compact's no-op path is covered separately)
        compact_min_delta_bytes=0, compact_ratio=0.0,
    )
    q.awaitTermination()
    store = CurateStore(spark, os.path.join(base, "store"))
    got = sorted(
        (r.split, r.source, r.n_docs, r.tokens, r.token_share)
        for r in store.report().collect()
    )
    assert got == _batch_report(spark)
    assert store._manifest() is not None
