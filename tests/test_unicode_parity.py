"""Cross-engine unicode parity sweep: every documents-table query runs on
an ADVERSARIAL corpus (accents, sharp-s, ligatures, combining marks, the
U+0130 dotted-I whose case-fold expansion differs between the JVM and
DuckDB, tabs/newlines, and exact duplicates) through the same exact-value
differential harness as the sf0.01 gate.

Motivation: the shipped testdata is pure ASCII, so the oracle gate never
exercises unicode code paths — and round 4's differential probe caught a
real divergence exactly there (lower() before a character-class strip;
fixed in dedup_normalized, see its docstring). This suite keeps the whole
text/dedup/docs/multimodal surface pinned against that class of bug.
"""

import os

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

TEXTS = [
    "Hello, World!",
    "ÅÉÎØÜ àb",
    "ß-Straße 12",
    "İstanbul İİİ",
    "ǅungla ﬁsh",
    "tab\tand\nnewline",
    "ascii only 42",
    "The quick brown fox jumps over the lazy dog",
    "İİ duplicate doc with enough tokens for shingles",
    "İİ duplicate doc with enough tokens for shingles",
]

FAMILIES = ("text_", "dedup_", "docs_", "multimodal_")


def _doc_query_names():
    from minibatch_spark.registry import all_oracles, all_queries

    oracles = all_oracles()
    return [
        n for n in sorted(all_queries()) if n.startswith(FAMILIES) and n in oracles
    ]


@pytest.fixture(scope="module")
def uni_sf(tmp_path_factory):
    sf = str(tmp_path_factory.mktemp("uni-corpus"))
    pq.write_table(
        pa.table(
            {
                "doc_id": pa.array(range(len(TEXTS)), pa.int64()),
                "text": pa.array(TEXTS),
                "lang": pa.array(["en"] * len(TEXTS)),
                "source": pa.array([f"s{i % 3}" for i in range(len(TEXTS))]),
                "n_chars": pa.array([len(t) for t in TEXTS], pa.int64()),
            }
        ),
        os.path.join(sf, "documents.parquet"),
    )
    return sf


@pytest.fixture(scope="module")
def uni_duck(uni_sf):
    import duckdb

    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM "
        f"read_parquet('{uni_sf}/documents.parquet')"
    )
    yield con
    con.close()


@pytest.mark.parametrize("name", _doc_query_names())
def test_unicode_parity(spark, uni_sf, uni_duck, name):
    from minibatch_spark.registry import all_oracles, all_queries

    from tests.oracle_util import run_pair

    run_pair(
        spark, uni_duck, all_queries()[name], all_oracles()[name], uni_sf, name
    )
