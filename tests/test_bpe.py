"""BPE tokenizer training: the driver-local merge loop
(text.train_bpe_merges) must make the SAME merge decisions as the
oracle-backed distributed operator (text.text_bpe_train_merges) — same
argmax tie-break, same left-to-right non-overlapping re-segmentation —
and scale to realistic merge counts (~1k+) where per-merge Spark jobs
would pay 1k fixed scheduling latencies (the r7 VERDICT #5 item)."""

import os
import time

import pyarrow as pa
import pyarrow.parquet as pq

from tests.conftest import SF_SMOKE


def test_train_bpe_merges_matches_distributed(spark):
    """First BPE_MERGES merges on the real corpus: identical
    (it, pair, merged, cnt) rows from both trainers."""
    from minibatch_spark.operators.text import (
        BPE_MERGES,
        bpe_word_vocab,
        text_bpe_train_merges,
        train_bpe_merges,
    )

    dist = sorted(
        (r.it, r.pair, r.merged, r.cnt)
        for r in text_bpe_train_merges(spark, SF_SMOKE).collect()
    )
    local = sorted(
        (it, pair, merged, cnt)
        for it, pair, merged, cnt in train_bpe_merges(
            bpe_word_vocab(spark, SF_SMOKE), BPE_MERGES
        )
    )
    assert local == dist and len(local) == BPE_MERGES


def test_train_bpe_merges_boundary_chains(spark, tmp_path):
    """Boundary-sharing chains (the 'a b a b a b' shape where one-pass
    literal replacement diverges from left-to-right pairwise merging)
    resolve identically in both trainers — the case the operator's
    two-pass replace exists for."""
    from minibatch_spark.operators.text import (
        bpe_word_vocab,
        text_bpe_train_merges,
        train_bpe_merges,
    )

    texts = [
        "ababab ababab abab",
        "aaaa aaaa aaa",
        "xyxyxy xyxy",
        "ababab aaaa xyxy",
    ] * 3
    sf = str(tmp_path)
    pq.write_table(
        pa.table(
            {
                "doc_id": pa.array(range(len(texts)), pa.int64()),
                "text": pa.array(texts),
                "lang": pa.array(["en"] * len(texts)),
                "source": pa.array(["s0"] * len(texts)),
                "n_chars": pa.array([len(t) for t in texts], pa.int64()),
            }
        ),
        os.path.join(sf, "documents.parquet"),
    )
    dist = sorted(
        (r.it, r.pair, r.merged, r.cnt)
        for r in text_bpe_train_merges(spark, sf).collect()
    )
    local = sorted(
        train_bpe_merges(bpe_word_vocab(spark, sf), 6)
    )
    assert local == dist and dist


def test_train_bpe_merges_exhausts_small_vocab(spark):
    """The shipped documents tables carry a FIXED 31-word vocabulary, so
    BPE exhausts every adjacent pair after 89 merges — the loop must
    stop there (every word one symbol), exactly like the distributed
    operator's empty-argmax break, not error or loop."""
    from minibatch_spark.operators.text import bpe_word_vocab, train_bpe_merges

    merges = train_bpe_merges(bpe_word_vocab(spark, SF_SMOKE), 10_000)
    assert 31 <= len(merges) < 200  # exhaustion, not the requested count
    # final state: all pairs consumed means #merges relates to total
    # symbol count, and every merge is well-formed
    for _it, pair, merged, cnt in merges:
        a, b = pair.split(" ", 1)
        assert merged == a + b and cnt >= 1


def test_train_bpe_merges_realistic_count(spark):
    """>= 1000 merges over an open-vocabulary corpus complete in
    driver-local time (seconds — one vocab collect + a pure-python
    incremental loop, NOT 1000 distributed argmax jobs), the iteration
    ids are contiguous, every merged token concatenates its pair, and
    the first BPE_MERGES prefix equals a short run (the loop is a pure
    extension, not a different algorithm). The wide vocab is generated
    deterministically here because the shipped tables' 31-word
    vocabulary exhausts at 89 merges."""
    import random

    from pyspark.sql import functions as F

    from minibatch_spark.operators.text import BPE_MERGES, train_bpe_merges

    rng = random.Random(99)
    syll = [
        c + v for c in "bcdfghjklmnpqrstvwz" for v in "aeiouy"
    ]  # 114 syllables
    words = sorted(
        {
            "".join(rng.choice(syll) for _ in range(rng.randint(2, 5)))
            for _ in range(4000)
        }
    )
    vocab = spark.createDataFrame(
        [(w, rng.randint(1, 500)) for w in words], "word string, freq long"
    ).select("word", F.col("freq").cast("long"))

    t0 = time.monotonic()
    merges = train_bpe_merges(vocab, 1500)
    wall = time.monotonic() - t0
    assert len(merges) == 1500, len(merges)
    assert [m[0] for m in merges] == list(range(1, 1501))
    for _it, pair, merged, cnt in merges:
        a, b = pair.split(" ", 1)
        assert merged == a + b and cnt >= 1
    short = train_bpe_merges(vocab, BPE_MERGES)
    assert merges[:BPE_MERGES] == short
    # generous bound for a noisy host; the point is seconds, not
    # 1500 x (fixed Spark job latency)
    assert wall < 120, wall


def test_apply_bpe_matches_chained_replace_gate(spark):
    """apply_bpe (Arrow mapInPandas segmentation, the realistic-merge-
    count path) must be BIT-EQUAL to the oracle-gated text_bpe_apply
    (chained two-pass literal replaces) at BPE_MERGES=6 on the real
    corpus — same per-doc word counts, piece counts, and fertility."""
    from minibatch_spark.catalog import load_table
    from minibatch_spark.operators.text import (
        BPE_MERGES,
        apply_bpe,
        bpe_word_vocab,
        text_bpe_apply,
        train_bpe_merges,
    )

    gate = {
        r.doc_id: (r.n_words, r.n_bpe_tokens, r.fertility)
        for r in text_bpe_apply(spark, SF_SMOKE).collect()
    }
    docs = load_table(spark, SF_SMOKE, "documents").select("doc_id", "text")
    merges = train_bpe_merges(bpe_word_vocab(spark, SF_SMOKE), BPE_MERGES)
    got = {
        r.doc_id: (r.n_words, r.n_bpe_tokens, r.fertility)
        for r in apply_bpe(spark, docs, merges).collect()
    }
    assert got == gate


def test_apply_bpe_realistic_merge_count(spark):
    """1500 merges through apply_bpe — the regime where the chained-
    replace plan is a 1500-deep expression tree Catalyst cannot survive
    — completes, conserves word counts, and compresses: fertility
    strictly below the char-level ceiling and >= 1 (pieces never
    outnumber characters or undercut one piece per word)."""
    import random

    from pyspark.sql import functions as F

    from minibatch_spark.operators.text import apply_bpe, train_bpe_merges

    rng = random.Random(7)
    syll = [c + v for c in "bcdfghjklmnpqrstvwz" for v in "aeiouy"]
    words = sorted(
        {
            "".join(rng.choice(syll) for _ in range(rng.randint(2, 5)))
            for _ in range(4000)
        }
    )
    vocab = spark.createDataFrame(
        [(w, rng.randint(1, 500)) for w in words], "word string, freq long"
    ).select("word", F.col("freq").cast("long"))
    merges = train_bpe_merges(vocab, 1500)
    assert len(merges) == 1500

    docs = spark.createDataFrame(
        [
            (i, " ".join(rng.choice(words) for _ in range(30)))
            for i in range(50)
        ],
        "doc_id long, text string",
    )
    rows = apply_bpe(spark, docs, merges).collect()
    assert len(rows) == 50
    for r in rows:
        assert r.n_words == 30
        assert 30 <= r.n_bpe_tokens  # >= one piece per word
        assert r.fertility >= 1.0
    # 1500 merges over a 114-syllable vocab must actually compress:
    # mean fertility well under the char-level piece count (~7 chars/word)
    mean_fert = sum(r.fertility for r in rows) / len(rows)
    assert mean_fert < 4.0, mean_fert
