"""candidate_mode='minhash' for the streaming CurateStore (round-10
VERDICT task #1 — the named 100 TB production valve): banded-minhash
candidate sourcing with the UNCHANGED exact co-occurrence verify.

Contracts pinned here:

- Verified edges are a SUBSET of exact mode's (precision 1 by
  construction — every emitted edge passed the exact jaccard >= t
  verify; only recall can differ), and on the smoke corpus recall is
  1.0, so the report is bit-identical to batch curate_corpus.
- The exact mode's behavior is untouched (its own suite,
  tests/test_streaming_curate.py, pins that); the default stays exact.
- Replay idempotence covers the new cbands root (rollback removes the
  tag's band rows too).
- Compaction absorbs cbands and the report survives the flip.
- Mode-switch migration: a store written in exact mode reopened with
  candidate_mode='minhash' backfills standing band keys ONCE, so
  standing docs keep matching new arrivals (the band-backfill lesson).
"""

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


def _edges(store):
    return sorted((r.doc_a, r.doc_b) for r in store.edges().collect())


def _report(store):
    return sorted(
        (r.split, r.source, r.n_docs, r.tokens, r.token_share)
        for r in store.report().collect()
    )


def _ingest(spark, tmp_path, name, mode, shards=None, compact_at=None):
    from minibatch_spark.streaming.curate_stream import CurateStore

    store = CurateStore(
        spark, os.path.join(str(tmp_path), name), candidate_mode=mode
    )
    for i, shard in enumerate(shards or _doc_shards(spark)):
        store.process_batch(shard, batch_tag=f"b{i}")
        if compact_at is not None and i == compact_at:
            store.compact()
    return store


def test_minhash_edges_subset_of_exact_and_full_recall_on_smoke(
    spark, tmp_path
):
    exact = _ingest(spark, tmp_path, "ex", "exact")
    mh = _ingest(spark, tmp_path, "mh", "minhash")
    e_ex, e_mh = _edges(exact), _edges(mh)
    assert set(e_mh) <= set(e_ex)  # precision 1: verify is exact
    # recall on the smoke corpus: every true pair banded together
    assert e_mh == e_ex
    # and therefore the report is bit-identical to the batch operator
    from minibatch_spark.operators.curation import curate_corpus

    batch = sorted(
        (r.split, r.source, r.n_docs, r.tokens, r.token_share)
        for r in curate_corpus(spark, SF_SMOKE).collect()
    )
    assert _report(mh) == batch


def test_minhash_candidates_fewer_or_equal_exact(spark, tmp_path):
    """The point of the mode: banded candidates never exceed the exact
    prefix-collision candidates on this corpus (full-band agreement is a
    strictly stronger requirement than one shared prefix hash here)."""
    from minibatch_spark.streaming.curate_stream import CurateStore

    shards = _doc_shards(spark)
    counts = {}
    for mode in ("exact", "minhash"):
        store = CurateStore(
            spark,
            os.path.join(str(tmp_path), f"cc-{mode}"),
            candidate_mode=mode,
        )
        store.count_candidates = True
        per = []
        for i, shard in enumerate(shards):
            store.process_batch(shard, batch_tag=f"b{i}")
            per.append(store.last_cand_count)
        counts[mode] = per
    assert sum(counts["minhash"]) <= sum(counts["exact"])


def test_minhash_replay_idempotent_covers_cbands(spark, tmp_path):
    from minibatch_spark.streaming.curate_stream import CurateStore

    shards = _doc_shards(spark, 2)
    store = CurateStore(
        spark, os.path.join(str(tmp_path), "rp"), candidate_mode="minhash"
    )
    store.process_batch(shards[0], batch_tag="b0")
    once = _report(store)
    n_cb = store.cbands().count()
    n_edges = store.edges().count()
    store.rollback("b0")
    assert store.cbands().count() == 0  # the tag's band rows are gone
    store.process_batch(shards[0], batch_tag="b0")
    assert _report(store) == once
    assert store.cbands().count() == n_cb
    assert store.edges().count() == n_edges


def test_minhash_compact_preserves_report_and_edges(spark, tmp_path):
    plain = _ingest(spark, tmp_path, "nc", "minhash")
    compacted = _ingest(spark, tmp_path, "co", "minhash", compact_at=1)
    assert _edges(compacted) == _edges(plain)
    assert _report(compacted) == _report(plain)
    # post-compaction batches still match standing docs via the cbands
    # base (the epoch-cached probe view over the compacted root)
    man = compacted._manifest()
    assert man is not None and "cbands" in man["covered"]


def test_exact_store_reopened_minhash_backfills_cbands(spark, tmp_path):
    """Mode-switch migration: standing docs ingested in exact mode must
    keep matching new arrivals after reopening in minhash mode."""
    from minibatch_spark.streaming.curate_stream import CurateStore

    shards = _doc_shards(spark, 2)
    d = os.path.join(str(tmp_path), "sw")
    ex = CurateStore(spark, d, candidate_mode="exact")
    ex.process_batch(shards[0], batch_tag="b0")
    assert not ex._file_view(ex.cbands_dir)  # exact mode never writes it

    mh = CurateStore(spark, d, candidate_mode="minhash")
    mh.process_batch(shards[1], batch_tag="b1")
    # the backfill materialized standing band keys...
    assert mh.cbands().count() > 0
    # ...and cross-shard near-dup edges (one side standing, one arriving)
    # were found: compare against a fresh all-minhash ingest
    ref = _ingest(spark, tmp_path, "swref", "minhash", shards=shards)
    assert _edges(mh) == _edges(ref)


def test_bad_mode_rejected(spark, tmp_path):
    import pytest

    from minibatch_spark.streaming.curate_stream import CurateStore

    with pytest.raises(ValueError, match="candidate_mode"):
        CurateStore(spark, str(tmp_path), candidate_mode="bands")
