"""Physical-plan inspection helpers.

The reference has no plan IR at all (SURVEY.md §3.2 — its "plan" is a
configured emitter instance); on Spark the physical plan is where the
scale guarantees live. These helpers let tests pin them down so perf
claims in operator docstrings stay true under refactoring
(tests/test_plans.py): broadcast joins stay broadcast, filters stay
pushed into the parquet scan, rank-limits stay WindowGroupLimit.
"""

from __future__ import annotations

import contextlib
import io

from pyspark.sql import DataFrame


def explain_str(df: DataFrame, mode: str = "formatted") -> str:
    """The .explain() output as a string."""
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain(mode=mode)
    return buf.getvalue()


def assert_in_plan(df: DataFrame, *needles: str, mode: str = "formatted") -> str:
    plan = explain_str(df, mode)
    missing = [n for n in needles if n not in plan]
    assert not missing, f"plan missing {missing}\n{plan}"
    return plan


def assert_not_in_plan(df: DataFrame, *needles: str, mode: str = "formatted") -> str:
    plan = explain_str(df, mode)
    present = [n for n in needles if n in plan]
    assert not present, f"plan unexpectedly contains {present}\n{plan}"
    return plan


def broadcast_join_count(df: DataFrame) -> int:
    return explain_str(df).count("BroadcastHashJoin")


def pushed_filters(df: DataFrame) -> str:
    """The PushedFilters lines of every scan in the plan."""
    return "\n".join(
        line.strip()
        for line in explain_str(df).splitlines()
        if "PushedFilters" in line
    )


def read_schema(df: DataFrame) -> str:
    """The ReadSchema lines of every scan in the plan (column pruning)."""
    return "\n".join(
        line.strip()
        for line in explain_str(df).splitlines()
        if "ReadSchema" in line
    )
