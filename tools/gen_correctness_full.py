"""Regenerate the committed CORRECTNESS_FULL_r{N}.json artifact.

Runs the FULL registry (every query in minibatch_spark.registry) against
its DuckDB oracle at sf0.01 with exact value equality (tests/
oracle_util.run_pair — stricter than the driver's value hash) and writes
the artifact the drift guard (tests/test_oracle.py::
test_correctness_full_artifact_not_stale) pins against the registry.

Usage:
    python tools/gen_correctness_full.py 4            # -> CORRECTNESS_FULL_r04.json
    SPARK_GRAFT_ORACLE_SF=/root/testdata/sf0.01 python tools/gen_correctness_full.py 4
"""

from __future__ import annotations

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
sys.path.insert(0, os.path.join(REPO, "tests"))

TABLES = (
    "region nation customer supplier part orders lineitem events "
    "documents embeddings"
).split()


def main(round_no: int, prefix: str = "CORRECTNESS_FULL") -> int:
    import duckdb

    from minibatch_spark.registry import all_oracles, all_queries
    from minibatch_spark.session import get_spark
    from oracle_util import run_pair

    sf_dir = os.environ.get("SPARK_GRAFT_ORACLE_SF", "/root/testdata/sf0.01")
    spark = get_spark(app_name="gen-correctness-full")
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )
    queries, oracles = all_queries(), all_oracles()
    results: dict[str, dict] = {}
    ok = 0
    for name in sorted(queries):
        sql = oracles.get(name)
        t0 = time.monotonic()
        try:
            if sql is None:
                n = len(queries[name](spark, sf_dir).collect())
                results[name] = {"ok": True, "rows": n, "check": "rows-only"}
            else:
                n = run_pair(spark, con, queries[name], sql, sf_dir, name)
                results[name] = {"ok": True, "rows": n}
            results[name]["sec"] = round(time.monotonic() - t0, 2)
            ok += 1
            print(f"ok   {name} ({n} rows, {results[name]['sec']}s)")
        except Exception as e:  # record and continue — the artifact shows all
            results[name] = {"ok": False, "err": str(e)[:500]}
            print(f"FAIL {name}: {e}")
    art = {
        "sf": float(sf_dir.rstrip("/").rsplit("sf", 1)[-1]),
        "total": len(queries),
        "ok": ok,
        "check": (
            "exact value equality (stricter than driver hash), "
            "tests/oracle_util.py run_pair"
        ),
        "results": results,
    }
    out = os.path.join(REPO, f"{prefix}_r{round_no:02d}.json")
    with open(out, "w") as f:
        json.dump(art, f, indent=1, sort_keys=True)
    print(f"\n{ok}/{len(queries)} ok -> {out}")
    return 0 if ok == len(queries) else 1


if __name__ == "__main__":
    # second arg picks the artifact prefix — the once-per-round sf0.1
    # exact-match run (round-6 verdict #3) writes CORRECTNESS_SF01_r{N}:
    #   SPARK_GRAFT_ORACLE_SF=/root/testdata/sf0.1 \
    #     python tools/gen_correctness_full.py 7 CORRECTNESS_SF01
    sys.exit(
        main(
            int(sys.argv[1]) if len(sys.argv) > 1 else 0,
            sys.argv[2] if len(sys.argv) > 2 else "CORRECTNESS_FULL",
        )
    )
