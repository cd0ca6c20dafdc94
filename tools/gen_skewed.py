#!/usr/bin/env python
"""Derive a SKEWED variant of an existing scale-factor directory: same
schemas, same row counts, same non-key values — only the join/group/window
key distributions are made pathological, plus one giant document. This is
the negative space the uniform generators never exercise: at 100 TB the
data WILL have a hot user, a dominant source, and a few enormous rows,
and "sub-linear on uniform data" says nothing about those.

Transformations (deterministic, seed 42):
- events.user_id:   50% of rows -> user 0 (one hot entity owns half the log)
- orders.o_custkey: 20% of rows -> customer 0
- lineitem.l_suppkey / l_partkey: 20% of rows -> supplier/part 0
- documents.source: 50% of docs -> 'src0'
- documents.text:   doc 0 becomes a ~100k-word document (vocab draw);
                    everything else untouched
- all other tables copied unchanged

Usage: python tools/gen_skewed.py /root/testdata/sf0.1 /tmp/skewdata/sf0.1
"""

from __future__ import annotations

import os
import shutil
import sys

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

SEED = 42
HOT_EVENT_FRAC = 0.5
HOT_ORDER_FRAC = 0.2
HOT_LINE_FRAC = 0.2
HOT_SOURCE_FRAC = 0.5
GIANT_DOC_WORDS = 100_000


def _remap(table: pa.Table, col: str, frac: float, hot, rng) -> pa.Table:
    """Route `frac` of the rows to the hot key with pyarrow compute —
    NULL-preserving: to_numpy on a nullable int column silently widens to
    float+NaN (clobbering NULLs or failing the int64 cast), and skew
    parity should compose with the NULL-key contract, not erase it."""
    import pyarrow.compute as pc

    n = table.num_rows
    field = table.schema.field(col)
    mask = pa.array(rng.random(n) < frac)
    col_arr = table[col].combine_chunks() if table[col].num_chunks > 1 else table[col]
    remapped = pc.if_else(mask, pa.scalar(hot, field.type), col_arr)
    i = table.schema.get_field_index(col)
    return table.set_column(i, field, remapped)


def gen(src: str, out: str, giant_words: int = GIANT_DOC_WORDS) -> str:
    rng = np.random.default_rng(SEED)
    os.makedirs(out, exist_ok=True)

    for name in ("region", "nation", "customer", "supplier", "part", "embeddings"):
        shutil.copyfile(
            os.path.join(src, f"{name}.parquet"), os.path.join(out, f"{name}.parquet")
        )

    ev = pq.read_table(os.path.join(src, "events.parquet"))
    pq.write_table(
        _remap(ev, "user_id", HOT_EVENT_FRAC, 0, rng),
        os.path.join(out, "events.parquet"),
    )

    od = pq.read_table(os.path.join(src, "orders.parquet"))
    pq.write_table(
        _remap(od, "o_custkey", HOT_ORDER_FRAC, 0, rng),
        os.path.join(out, "orders.parquet"),
    )

    li = pq.read_table(os.path.join(src, "lineitem.parquet"))
    li = _remap(li, "l_suppkey", HOT_LINE_FRAC, 0, rng)
    li = _remap(li, "l_partkey", HOT_LINE_FRAC, 0, rng)
    pq.write_table(li, os.path.join(out, "lineitem.parquet"))

    dc = pq.read_table(os.path.join(src, "documents.parquet"))
    dc = _remap(dc, "source", HOT_SOURCE_FRAC, "src0", rng)
    texts = dc["text"].to_pylist()
    vocab = sorted({w for t in texts[:200] for w in t.split()})
    giant = " ".join(np.array(vocab)[rng.integers(0, len(vocab), giant_words)])
    texts[0] = giant
    n_chars = [len(t) for t in texts]
    ti = dc.schema.get_field_index("text")
    dc = dc.set_column(ti, dc.schema.field(ti), pa.array(texts, pa.string()))
    ci = dc.schema.get_field_index("n_chars")
    dc = dc.set_column(ci, dc.schema.field(ci), pa.array(n_chars, pa.int64()))
    pq.write_table(dc, os.path.join(out, "documents.parquet"))
    return out


if __name__ == "__main__":
    print("wrote", gen(sys.argv[1], sys.argv[2]))
