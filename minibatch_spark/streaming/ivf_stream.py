"""Streaming ANN index ingest: an embedding stream indexed into the
persisted IvfIndexStore micro-batch by micro-batch, exactly once.

The batch analog is ``operators/ivf_store.py`` (train-once centroids,
cell-partitioned vectors); this drives it from Structured Streaming so a
continuously-arriving embedding corpus becomes a queryable, partition-
pruned ANN index — the ingestion side of a production similarity-search
pipeline (the reference has no similarity surface; north-star §2.12).

Exactly-once story: the store's tag layout already IS the transaction —
each micro-batch appends under ``tag=batch-<id>/`` with overwrite, so a
replayed batch rewrites its own tag instead of duplicating it, and reads
are _SUCCESS-gated so a crashed partial write is never visible. The one
stateful step outside the tag dirs is TRAINING: the first non-empty
batch trains the quantizer, and a replay RETRAINS it (overwrite) — the
trainer is deterministic (lowest-vec_id seed + one Lloyd step), so the
replayed write is bit-identical; a crash mid-train leaves no _SUCCESS
and the replay's committed-check retrains. First run and any crash-
replay interleaving converge to the same store bits (pinned by
tests/test_streaming_ivf.py both ways: batch-equivalence and injected
crash).
"""

from __future__ import annotations

from typing import TYPE_CHECKING, Callable, Optional

from minibatch_spark.operators.ivf_store import IvfIndexStore
from minibatch_spark.operators.similarity import SEM_CELL_TARGET

if TYPE_CHECKING:  # pragma: no cover
    from pyspark.sql import DataFrame, SparkSession
    from pyspark.sql.streaming import StreamingQuery


def ingest_embedding_stream(
    spark: "SparkSession",
    embs: "DataFrame",
    store_dir: str,
    checkpoint_dir: str,
    available_now: bool = True,
    cell_target: int = SEM_CELL_TARGET,
    on_batch: Optional[Callable[[int, int], None]] = None,
    compact_every: int = 16,
) -> "StreamingQuery":
    """Start the streaming ingest: ``embs`` is a STREAMING DataFrame with
    (vec_id long, ve array<double>) columns. The first non-empty batch
    trains the quantizer (then frozen — FAISS train-once/add semantics,
    identical to the batch store); every batch is assigned and appended
    under its own idempotent tag.

    ``on_batch(batch_id, n_vectors)`` is an optional observer hook,
    called after the batch's append commits.

    ``compact_every=N`` (0 disables): every N batches the handler merges
    the accumulated append tags into one cell-partitioned base
    (store.compact) at the handler-start safe point, EXCLUDING the
    current batch's tag — a prior attempt of this very batch may have a
    committed append that is not yet checkpointed, and absorbing it
    would make the replay's idempotent tag-overwrite raise.

    Scale shape per micro-batch: one broadcast-assign pass (centroids
    are the broadcast side) + a partitioned parquet write — the store is
    never read, shuffled, or rewritten by ingestion; only ``tag=batch-N``
    is touched. A thousand-shard ingest writes each vector exactly once,
    and the resulting index is bit-identical to build(first shard) +
    append(rest) in one process."""
    store = IvfIndexStore(spark, store_dir, cell_target)

    def _handle(batch_df: "DataFrame", batch_id: int) -> None:
        if compact_every and batch_id > 0 and batch_id % compact_every == 0:
            store.compact(exclude_tags={f"batch-{batch_id}"})
        v = batch_df.select("vec_id", "ve")
        if not store.centroids_committed():
            if v.isEmpty():
                return  # nothing to train on; wait for a non-empty batch
            store.train(v, overwrite=True)  # replay retrains identically
        store.append(v, tag=f"batch-{batch_id}")
        if on_batch is not None:
            on_batch(batch_id, v.count())

    writer = embs.writeStream.foreachBatch(_handle).option(
        "checkpointLocation", checkpoint_dir
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
