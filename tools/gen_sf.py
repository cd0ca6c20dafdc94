#!/usr/bin/env python
"""Generate a larger scale-factor dataset with the SAME schema and value
distributions as the driver-generated /root/testdata tables (TESTDATA.md),
for scale-ratio benching beyond sf0.1. NOT byte-identical to the driver's
generator (its code is not shipped) — distribution-matched: identical
schemas, dictionaries, value ranges, child-per-parent ratios, and 10x
cardinality steps, which is what a wall-time scaling measurement needs.

Usage: python tools/gen_sf.py 1.0 /tmp/sparkdata   # -> /tmp/sparkdata/sf1
Deterministic (numpy PCG64 seed 42). ~6M lineitem rows at sf=1.
"""

from __future__ import annotations

import json
import os
import sys

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

SEED = 42

REGIONS = ["AFRICA", "AMERICA", "ASIA", "EUROPE", "MIDDLE EAST"]
SEGMENTS = ["AUTOMOBILE", "BUILDING", "FURNITURE", "HOUSEHOLD", "MACHINERY"]
PRIORITIES = ["1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED", "5-LOW"]
STATUSES = ["O", "F", "P"]
FLAGS = ["A", "N", "R"]
LINESTATUS = ["O", "F"]
TYPES = ["ECONOMY", "LARGE", "MEDIUM", "PROMO", "SMALL", "STANDARD"]
ADJ = ["large", "hot", "blue", "old", "small", "dark", "light", "new", "red", "cold"]
NOUN = ["ring", "bolt", "plate", "box", "wheel", "cap", "tube", "rod", "pin", "gear"]
EVENT_TYPES = ["click", "view", "purchase", "signup", "error"]
LANGS = (["en"] * 8 + ["zh"] * 3 + ["es"] * 3 + ["fr"] * 3 + ["de"] * 3)
VOCAB = [
    "a", "agg", "batch", "big", "column", "customer", "data", "dup", "fast",
    "filter", "group", "hash", "join", "key", "line", "merge", "order",
    "part", "query", "row", "scan", "slow", "small", "sort", "spark",
    "stream", "table", "the", "value", "vector", "window",
]

DAY_US = 86_400_000_000


def _ts(dates_days: np.ndarray, base: str) -> pa.Array:
    base_us = np.datetime64(base, "us").astype("int64")
    return pa.array(base_us + dates_days * DAY_US, pa.timestamp("us"))


def gen(sf: float, out_root: str) -> str:
    rng = np.random.default_rng(SEED)
    tag = f"sf{sf:g}"
    out = os.path.join(out_root, tag)
    os.makedirs(out, exist_ok=True)

    def write(name: str, table: pa.Table) -> None:
        pq.write_table(table, os.path.join(out, f"{name}.parquet"))
        print(f"{name}: {table.num_rows} rows")

    n_cust = int(150_000 * sf)
    n_supp = int(10_000 * sf)
    n_part = int(200_000 * sf)
    n_ord = int(1_500_000 * sf)
    n_line = n_ord * 4
    n_evt = int(1_000_000 * sf)
    n_doc = int(50_000 * sf)
    n_emb = int(20_000 * sf)
    n_users = int(15_000 * sf)

    write("region", pa.table({
        "r_regionkey": pa.array(range(5), pa.int32()),
        "r_name": pa.array(REGIONS),
    }))
    write("nation", pa.table({
        "n_nationkey": pa.array(range(25), pa.int32()),
        "n_name": pa.array([f"NATION_{i}" for i in range(25)]),
        "n_regionkey": pa.array([i % 5 for i in range(25)], pa.int32()),
    }))

    write("customer", pa.table({
        "c_custkey": pa.array(np.arange(n_cust), pa.int64()),
        "c_name": pa.array([f"Customer#{i:09d}" for i in range(n_cust)]),
        "c_nationkey": pa.array(rng.integers(0, 25, n_cust), pa.int32()),
        "c_acctbal": pa.array(np.round(rng.uniform(0, 10_000, n_cust), 2)),
        "c_mktsegment": pa.array(np.array(SEGMENTS)[rng.integers(0, 5, n_cust)]),
    }))
    write("supplier", pa.table({
        "s_suppkey": pa.array(np.arange(n_supp), pa.int64()),
        "s_name": pa.array([f"Supplier#{i:09d}" for i in range(n_supp)]),
        "s_nationkey": pa.array(rng.integers(0, 25, n_supp), pa.int32()),
        "s_acctbal": pa.array(np.round(rng.uniform(0, 10_000, n_supp), 2)),
    }))
    adj = np.array(ADJ)[rng.integers(0, len(ADJ), n_part)]
    noun = np.array(NOUN)[rng.integers(0, len(NOUN), n_part)]
    write("part", pa.table({
        "p_partkey": pa.array(np.arange(n_part), pa.int64()),
        "p_name": pa.array([f"{a} {n}" for a, n in zip(adj, noun)]),
        "p_brand": pa.array([f"Brand#{b}" for b in rng.integers(1, 26, n_part)]),
        "p_type": pa.array(np.array(TYPES)[rng.integers(0, len(TYPES), n_part)]),
        "p_size": pa.array(rng.integers(1, 51, n_part), pa.int32()),
        "p_retailprice": pa.array(np.round(900.0 + 0.1 * np.arange(n_part), 2)),
    }))

    o_dates = rng.integers(0, 2404, n_ord)  # 1995-01-01 .. 2001-08-01
    write("orders", pa.table({
        "o_orderkey": pa.array(np.arange(n_ord), pa.int64()),
        "o_custkey": pa.array(rng.integers(0, n_cust, n_ord), pa.int64()),
        "o_orderstatus": pa.array(np.array(STATUSES)[rng.integers(0, 3, n_ord)]),
        "o_totalprice": pa.array(np.round(rng.uniform(1_000, 400_000, n_ord), 2)),
        "o_orderdate": _ts(o_dates, "1995-01-01"),
        "o_orderpriority": pa.array(np.array(PRIORITIES)[rng.integers(0, 5, n_ord)]),
    }))

    l_ok = np.repeat(np.arange(n_ord), 4)
    write("lineitem", pa.table({
        "l_orderkey": pa.array(l_ok, pa.int64()),
        "l_partkey": pa.array(rng.integers(0, n_part, n_line), pa.int64()),
        "l_suppkey": pa.array(rng.integers(0, n_supp, n_line), pa.int64()),
        "l_linenumber": pa.array(np.tile(np.arange(1, 5), n_ord), pa.int32()),
        "l_quantity": pa.array(rng.integers(1, 51, n_line).astype("float64")),
        "l_extendedprice": pa.array(np.round(rng.uniform(1_000, 100_000, n_line), 2)),
        "l_discount": pa.array(np.round(rng.integers(0, 11, n_line) / 100.0, 2)),
        "l_tax": pa.array(np.round(rng.integers(0, 9, n_line) / 100.0, 2)),
        "l_returnflag": pa.array(np.array(FLAGS)[rng.integers(0, 3, n_line)]),
        "l_linestatus": pa.array(np.array(LINESTATUS)[rng.integers(0, 2, n_line)]),
        "l_shipdate": _ts(rng.integers(1, 2500, n_line), "1995-01-01"),
    }))

    evt_us = np.sort(rng.integers(0, 30 * DAY_US, n_evt))
    base_us = np.datetime64("2024-01-01", "us").astype("int64")
    write("events", pa.table({
        "event_id": pa.array(np.arange(n_evt), pa.int64()),
        "ts": pa.array(base_us + evt_us, pa.timestamp("us")),
        "user_id": pa.array(rng.integers(0, n_users, n_evt), pa.int64()),
        "event_type": pa.array(np.array(EVENT_TYPES)[rng.integers(0, 5, n_evt)]),
        "value": pa.array(np.round(rng.exponential(50.0, n_evt).clip(0.01, 600), 2)),
        "props": pa.array([json.dumps({"k": int(k)}) for k in rng.integers(0, 100, n_evt)]),
    }))

    # documents: Zipf word-soup over an OPEN vocabulary that GROWS with
    # corpus size (~sqrt(n_doc), Heaps'-law-ish), 8-96 words, ~1.5%
    # exact-duplicate rows (the dedup queries need a non-empty dup set).
    # Round-4 verdict #4: the old closed 31-word vocab made 3-gram
    # shingle document-frequency grow LINEARLY with the corpus, so every
    # shingle became "hot" at sf >= 1 and the shingle-join dedup family
    # measured artificially quadratic. With an open vocab the distinct-
    # shingle count scales with the corpus and per-shingle posting lists
    # stay bounded — the regime real text actually has. The base VOCAB
    # words keep the highest Zipf ranks so small-sf text stays alike.
    n_vocab = max(len(VOCAB), int(round(2000 * np.sqrt(n_doc / 50_000))))
    vocab = np.array(
        VOCAB + [f"w{i}" for i in range(n_vocab - len(VOCAB))]
    )
    zipf_w = 1.0 / np.arange(1, n_vocab + 1) ** 1.1
    zipf_cdf = np.cumsum(zipf_w / zipf_w.sum())
    lens = rng.integers(8, 97, n_doc)
    draws = np.searchsorted(zipf_cdf, rng.random(int(lens.sum())))
    offs = np.concatenate(([0], np.cumsum(lens)))
    texts = [
        " ".join(vocab[draws[offs[i] : offs[i + 1]]]) for i in range(n_doc)
    ]
    dup_src = rng.integers(0, n_doc, max(1, n_doc // 70))
    for i, s in enumerate(dup_src):
        texts[(s + 7 * (i + 1)) % n_doc] = texts[s]
    write("documents", pa.table({
        "doc_id": pa.array(np.arange(n_doc), pa.int64()),
        "text": pa.array(texts),
        "lang": pa.array(np.array(LANGS)[rng.integers(0, len(LANGS), n_doc)]),
        "source": pa.array([f"src{s}" for s in rng.integers(0, 20, n_doc)]),
        "n_chars": pa.array([len(t) for t in texts], pa.int64()),
    }))

    V = rng.standard_normal((n_emb, 64))
    V /= np.linalg.norm(V, axis=1, keepdims=True)  # observed: unit L2 norms
    write("embeddings", pa.table({
        "vec_id": pa.array(np.arange(n_emb), pa.int64()),
        "embedding": pa.array([v.astype(np.float32).tolist() for v in V],
                              pa.list_(pa.float32())),
        "label": pa.array(rng.integers(0, 10, n_emb), pa.int32()),
    }))
    return out


if __name__ == "__main__":
    sf = float(sys.argv[1]) if len(sys.argv) > 1 else 1.0
    root = sys.argv[2] if len(sys.argv) > 2 else "/tmp/sparkdata"
    print("wrote", gen(sf, root))
