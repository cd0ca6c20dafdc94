"""Stateful CountWindow on the engine's own state store
(``applyInPandasWithState``) — the fully-distributed alternative to the
foreachBatch carry in streaming/window.py.

The reference's CountWindow keeps its remainder implicitly in MongoDB
(``processed=False`` rows left behind, minibatch/window.py:305-327). The
foreachBatch port keeps it in a driver-side carry file. THIS version puts
the remainder where Structured Streaming puts state: the checkpointed,
per-key, executor-local state store —

- partitioned by stream key, so a thousand streams batch in parallel with
  no driver involvement (the carry design serializes on the driver);
- fault-tolerant by construction: state is versioned with the micro-batch
  in the checkpoint, so a crash replays onto exactly the pre-batch
  remainder — the at-least-once contract with no custom code;
- Arrow-batched both ways (pandas in, pandas out), never per-row Python.

Windows are emitted as ROWS (stream, window_id, n, data_json), which keeps
the operator composable: downstream DataFrame ops, sinks, and the DuckDB
harness all consume a flat schema instead of driver-side Window objects.
"""

from __future__ import annotations

import json
from typing import TYPE_CHECKING, Iterable, Iterator, Tuple

import pandas as pd

from minibatch_spark.streaming.models import SPARK_DDL, Stream

if TYPE_CHECKING:  # pragma: no cover
    from pyspark.sql import DataFrame

OUTPUT_DDL = "stream string, window_id long, n long, data_json string"
# remainder rows + the next window ordinal, all checkpoint-versioned
STATE_DDL = "pending string, next_window long"


def _chunk(
    key: Tuple[str], pdfs: Iterable[pd.DataFrame], state, size: int
) -> Iterator[pd.DataFrame]:
    rows = []
    if state.exists:
        pending, next_window = state.get
        rows = json.loads(pending) if pending else []
    else:
        next_window = 0
    # concat THEN sort: the iterator may deliver a key's micro-batch rows
    # in several Arrow chunks, and (created, seq) order must hold across
    # all of them, not within each
    chunks = [pdf for pdf in pdfs if len(pdf)]
    if chunks:
        batch = pd.concat(chunks).sort_values(["created", "seq"])
        rows.extend(batch["data"].tolist())
    out = []
    while len(rows) >= size:
        window, rows = rows[:size], rows[size:]
        out.append((key[0], next_window, len(window), json.dumps(window)))
        next_window += 1
    state.update((json.dumps(rows), next_window))
    if out:
        yield pd.DataFrame(out, columns=["stream", "window_id", "n", "data_json"])


def stateful_count_window(stream: Stream, spark, size: int) -> "DataFrame":
    """Streaming DataFrame of exactly-``size`` windows per stream key.

    The 10-messages/size-2 ⇒ exactly-5-windows invariant (reference
    tests/test_minibatch.py:48-87) holds across micro-batch boundaries and
    restarts because the remainder lives in the state store, not in any
    single batch."""
    from pyspark.sql.streaming.state import GroupStateTimeout

    src = spark.readStream.schema(SPARK_DDL).parquet(stream.buffer_dir)
    return src.groupBy("stream").applyInPandasWithState(
        lambda key, pdfs, state: _chunk(key, pdfs, state, size),
        outputStructType=OUTPUT_DDL,
        stateStructType=STATE_DDL,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
