"""Dedup-operator invariants beyond the DuckDB oracle (which already
hash-checks every registered query — see test_oracle.py):

- simhash vs an independent pure-Python oracle (bit votes + packing);
- MinHash-LSH candidate recall vs exact n-gram Jaccard ground truth;
- prefix-filtered n-gram join == the naive all-pairs inverted-index join
  (the exactness guarantee of the All-Pairs/PPJoin prefix condition).

Everything here is md5-derived and fully deterministic, so the pinned
bounds are exact reproductions, not statistical hopes.
"""

import hashlib

from tests.conftest import SF_SMOKE


def _h64(s: str) -> int:
    return int(hashlib.md5(s.encode()).hexdigest()[:15], 16)


def test_simhash_matches_python_oracle(spark, duck):
    """Recompute all 500 simhashes in pure Python: distinct whitespace
    tokens -> md5-60bit -> per-bit majority votes -> packed bigint."""
    from minibatch_spark.registry import all_queries

    got = {
        r.doc_id: r.simhash
        for r in all_queries()["dedup_simhash"](spark, SF_SMOKE).collect()
    }
    docs = duck.execute("SELECT doc_id, text FROM documents").fetchall()
    assert len(got) == len(docs)
    for doc_id, text in docs:
        toks = list(dict.fromkeys(text.strip().split()))
        hashes = [_h64(t) for t in toks]
        n = len(hashes)
        packed = 0
        for i in range(60):
            votes = sum((h >> i) & 1 for h in hashes)
            if votes * 2 > n:
                packed |= 1 << i
        assert got[doc_id] == packed, doc_id


def test_simhash_identical_texts_collide(spark, duck):
    """Hamming distance 0 for byte-identical documents — the dedup use."""
    from minibatch_spark.registry import all_queries

    sims = {
        r.doc_id: r.simhash
        for r in all_queries()["dedup_simhash"](spark, SF_SMOKE).collect()
    }
    groups = duck.execute(
        "SELECT list(doc_id) FROM documents GROUP BY md5(text) HAVING COUNT(*) > 1"
    ).fetchall()
    for (ids,) in groups:
        assert len({sims[i] for i in ids}) == 1


def test_minhash_lsh_recall_vs_exact_jaccard(spark):
    """Every exact near-dup pair (3-gram Jaccard >= 0.8) must be recovered
    by the MinHash-LSH banding at est >= 0.5 — measured recall is 1.0 on
    this corpus (planted dups sit at jaccard 0.89-0.99; 4 bands of 4 catch
    jaccard 0.9 with p=0.986 per pair). Deterministic: md5 permutations."""
    from minibatch_spark.registry import all_queries

    q = all_queries()
    exact = {(r.doc_a, r.doc_b) for r in q["dedup_ngram_jaccard"](spark, SF_SMOKE).collect()}
    mh = {(r.doc_a, r.doc_b) for r in q["dedup_minhash_pairs"](spark, SF_SMOKE).collect()}
    assert exact, "ground truth must be non-empty"
    recall = len(exact & mh) / len(exact)
    assert recall >= 0.9, f"recall {recall}: missing {sorted(exact - mh)[:5]}"


def test_minhash_estimates_track_exact_jaccard(spark):
    """For recovered pairs the signature-agreement estimate stays within
    MinHash's 16-permutation resolution of the exact Jaccard."""
    from minibatch_spark.registry import all_queries

    q = all_queries()
    exact = {(r.doc_a, r.doc_b): r.jaccard for r in q["dedup_ngram_jaccard"](spark, SF_SMOKE).collect()}
    mh = {(r.doc_a, r.doc_b): r.est_jaccard for r in q["dedup_minhash_pairs"](spark, SF_SMOKE).collect()}
    for pair in set(exact) & set(mh):
        assert abs(exact[pair] - mh[pair]) <= 0.35, (pair, exact[pair], mh[pair])


def test_prefix_filter_equals_naive_all_pairs(spark):
    """The prefix-filtered inverted-index join returns the IDENTICAL pair
    set as the naive unfiltered join — the All-Pairs exactness guarantee
    (any pair with jaccard >= t shares its globally-smallest common
    shingle within both prefixes)."""
    from pyspark.sql import functions as F

    from minibatch_spark.catalog import load_table
    from minibatch_spark.operators.dedup import shingles
    from minibatch_spark.registry import all_queries

    got = {
        (r.doc_a, r.doc_b): r.jaccard
        for r in all_queries()["dedup_ngram_jaccard"](spark, SF_SMOKE).collect()
    }

    # naive reference: explode ALL shingles, join, count intersections
    d = load_table(spark, SF_SMOKE, "documents")
    sh = d.select("doc_id", F.explode(shingles("text")).alias("sh"))
    sizes = sh.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n"))
    a, b = sh.alias("a"), sh.alias("b")
    inter = (
        a.join(b, (F.col("a.sh") == F.col("b.sh")) & (F.col("a.doc_id") < F.col("b.doc_id")))
        .groupBy(F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b"))
        .agg(F.count(F.lit(1)).alias("c"))
    )
    sa, sb = sizes.alias("sa"), sizes.alias("sb")
    jac = F.col("c").cast("double") / (F.col("sa.n") + F.col("sb.n") - F.col("c"))
    naive = {
        (r.doc_a, r.doc_b): r.jaccard
        for r in inter.join(sa, F.col("doc_a") == F.col("sa.doc_id"))
        .join(sb, F.col("doc_b") == F.col("sb.doc_id"))
        .filter(jac >= 0.8)
        .select("doc_a", "doc_b", F.round(jac, 6).alias("jaccard"))
        .collect()
    }
    assert got == naive


def test_minhash_pairs_collapse_exact_dups(spark, duck):
    """Pair endpoints are exact-dup representatives: no doc_id that is a
    non-minimal member of an identical-text group may appear."""
    from minibatch_spark.registry import all_queries

    non_reps = {
        i
        for (ids,) in duck.execute(
            "SELECT list(doc_id) FROM documents GROUP BY md5(text) HAVING COUNT(*) > 1"
        ).fetchall()
        for i in sorted(ids)[1:]
    }
    for r in all_queries()["dedup_minhash_pairs"](spark, SF_SMOKE).collect():
        assert r.doc_a not in non_reps and r.doc_b not in non_reps


def test_normalized_dedup_collapses_case_and_punct_variants(spark, tmp_path):
    """dedup_normalized groups casing/punctuation/whitespace variants that
    byte-exact dedup keeps apart."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from minibatch_spark.registry import all_queries

    docs = [
        (0, "Hello, World!"),
        (1, "hello   world"),
        (2, "HELLO-WORLD"),
        (3, "a different doc"),
    ]
    sf = tmp_path / "normdup"
    sf.mkdir()
    pq.write_table(
        pa.table(
            {
                "doc_id": pa.array([d[0] for d in docs], pa.int64()),
                "text": pa.array([d[1] for d in docs]),
                "lang": pa.array(["en"] * 4),
                "source": pa.array(["s"] * 4),
                "n_chars": pa.array([len(d[1]) for d in docs], pa.int64()),
            }
        ),
        str(sf / "documents.parquet"),
    )
    rows = {
        r.keep_doc_id: r.n_docs
        for r in all_queries()["dedup_normalized"](spark, str(sf)).collect()
    }
    assert rows == {0: 3, 3: 1}  # three variants collapse onto doc 0

    exact = all_queries()["dedup_exact"](spark, str(sf)).collect()
    assert len(exact) == 4  # byte-exact keeps all four apart


def test_normalized_dedup_unicode_parity_spark_vs_duckdb(spark, tmp_path):
    """The REAL normalization-parity contract — Spark (Java regex/lower)
    vs the DuckDB oracle — on a deterministic adversarial corpus beyond
    the ASCII testdata: latin-1 accents, sharp-s, ligatures, combining
    marks, and the U+0130 dotted-I (whose Python str.lower() expansion
    differs from BOTH engines — which is why this pins Spark<->DuckDB
    directly through run_pair, not either engine against Python)."""
    import duckdb
    import pyarrow as pa
    import pyarrow.parquet as pq

    from minibatch_spark.registry import all_oracles, all_queries
    from tests.oracle_util import run_pair

    texts = [
        "Hello, World!",
        "ÅÉÎØÜ àb",
        "ß-Straße 12",
        "İstanbul İİİ",
        "ǅungla ﬁsh",
        "tab\tand\nnewline",
        "ascii only 42",
    ]
    sf = tmp_path / "unidup"
    sf.mkdir()
    pq.write_table(
        pa.table(
            {
                "doc_id": pa.array(range(len(texts)), pa.int64()),
                "text": pa.array(texts),
                "lang": pa.array(["en"] * len(texts)),
                "source": pa.array(["s"] * len(texts)),
                "n_chars": pa.array([len(t) for t in texts], pa.int64()),
            }
        ),
        str(sf / "documents.parquet"),
    )
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM read_parquet('{sf}/documents.parquet')"
    )
    run_pair(
        spark,
        con,
        all_queries()["dedup_normalized"],
        all_oracles()["dedup_normalized"],
        str(sf),
        "dedup_normalized-unicode",
    )


def test_keep_best_one_winner_per_cluster_with_max_quality(spark):
    """dedup_keep_best covers every document, keeps exactly one doc per
    cluster, and the kept doc is the argmax of (n_unique, -doc_id) within
    its cluster; multi-doc clusters exist (the assertion is non-vacuous)."""
    import duckdb

    from minibatch_spark.registry import all_queries

    rows = all_queries()["dedup_keep_best"](spark, SF_SMOKE).collect()
    n_docs = duckdb.sql(
        f"SELECT COUNT(*) FROM read_parquet('{SF_SMOKE}/documents.parquet')"
    ).fetchone()[0]
    assert len(rows) == n_docs  # full per-doc decision table

    by_cluster = {}
    for r in rows:
        by_cluster.setdefault(r.cluster_id, []).append(r)
    assert any(len(v) > 1 for v in by_cluster.values())  # real clusters
    for cid, members in by_cluster.items():
        kept = [m for m in members if m.kept == 1]
        assert len(kept) == 1, f"cluster {cid}: {len(kept)} kept"
        best = min(members, key=lambda m: (-m.n_unique, m.doc_id))
        assert kept[0].doc_id == best.doc_id, f"cluster {cid}"


def test_winnow_chunk_boundary_matches_python_oracle(spark, tmp_path):
    """Chunked winnowing is EXACT at the chunk seams: documents sized
    exactly at / one off / just past the WINNOW_CHUNK position boundary
    (plus a multi-chunk one) reproduce a pure-Python winnow bit-for-bit.
    The corpus parity suites cover typical lengths; this pins the
    overlap arithmetic where an off-by-one would actually live."""
    import hashlib
    import random

    import pyarrow as pa
    import pyarrow.parquet as pq

    from minibatch_spark.operators.text import (
        WINNOW_CHUNK as C,
        WINNOW_K as K,
        WINNOW_W as W,
    )
    from minibatch_spark.registry import all_queries

    rng = random.Random(13)
    alphabet = "abcdefgh "  # repeats force real fingerprint collisions
    docs = {}
    for did, n_pos in enumerate([1, C - 1, C, C + 1, 2 * C, 2 * C + 7]):
        n_chars = n_pos + K + W - 2
        docs[did] = "".join(rng.choice(alphabet) for _ in range(n_chars))

    sf = tmp_path / "sf"
    sf.mkdir()
    pq.write_table(
        pa.table(
            {
                "doc_id": list(docs),
                "text": list(docs.values()),
                "lang": ["en"] * len(docs),
                "source": ["s"] * len(docs),
                "n_chars": [len(t) for t in docs.values()],
            }
        ),
        sf / "documents.parquet",
    )

    def py_winnow(t: str):
        hs = [
            int(hashlib.md5(t[i : i + K].encode()).hexdigest()[:15], 16)
            for i in range(len(t) - K + 1)
        ]
        fps = {min(hs[j : j + W]) for j in range(len(hs) - W + 1)}
        return len(fps), min(fps), max(fps)

    got = {
        r.doc_id: (r.n_fp, r.fp_min, r.fp_max)
        for r in all_queries()["text_winnow_fingerprint"](spark, str(sf)).collect()
    }
    want = {did: py_winnow(t) for did, t in docs.items()}
    assert got == want


def _write_docs(tmp_path, name, docs):
    import pyarrow as pa
    import pyarrow.parquet as pq

    sf = tmp_path / name
    sf.mkdir()
    pq.write_table(
        pa.table(
            {
                "doc_id": pa.array([d[0] for d in docs], pa.int64()),
                "text": pa.array([d[1] for d in docs]),
                "lang": pa.array(["en"] * len(docs)),
                "source": pa.array(["s"] * len(docs)),
                "n_chars": pa.array([len(d[1]) for d in docs], pa.int64()),
            }
        ),
        str(sf / "documents.parquet"),
    )
    return str(sf)


def test_containment_catches_doc_inside_doc_jaccard_misses(spark, tmp_path):
    """The asymmetric contract: a short doc quoted whole inside a much
    larger one has containment ~1 but Jaccard far below the 0.8 bar —
    dedup_containment_pairs must find the pair, dedup_ngram_jaccard must
    not (that asymmetry is the operator's reason to exist)."""
    from minibatch_spark.registry import all_queries

    inner = " ".join(f"w{i}" for i in range(20))
    wrapper = inner + " " + " ".join(f"junk{i} filler{i} pad{i}" for i in range(40))
    other = " ".join(f"z{i}" for i in range(25))
    sf = _write_docs(tmp_path, "contain", [(0, inner), (1, wrapper), (2, other)])

    pairs = {
        (r.doc_a, r.doc_b): (r.contain_a, r.contain_b, r.jaccard)
        for r in all_queries()["dedup_containment_pairs"](spark, sf).collect()
    }
    assert (0, 1) in pairs
    ca, cb, jac = pairs[(0, 1)]
    assert ca == 1.0  # every shingle of the inner doc is in the wrapper
    assert cb < 0.8 and jac < 0.8  # ...while Jaccard/reverse containment miss it
    assert (0, 2) not in pairs and (1, 2) not in pairs

    jac_pairs = {
        (r.doc_a, r.doc_b)
        for r in all_queries()["dedup_ngram_jaccard"](spark, sf).collect()
    }
    assert (0, 1) not in jac_pairs


def test_containment_superset_of_jaccard_pairs(spark):
    """Containment >= J always (|∩|/|A| >= |∩|/|A∪B|), so on the real
    corpus every Jaccard-0.8 pair must re-appear in the containment pair
    set with consistent jaccard values."""
    from minibatch_spark.registry import all_queries

    cont = {
        (r.doc_a, r.doc_b): r.jaccard
        for r in all_queries()["dedup_containment_pairs"](spark, SF_SMOKE).collect()
    }
    jac = {
        (r.doc_a, r.doc_b): r.jaccard
        for r in all_queries()["dedup_ngram_jaccard"](spark, SF_SMOKE).collect()
    }
    for pair, j in jac.items():
        assert pair in cont and cont[pair] == j
