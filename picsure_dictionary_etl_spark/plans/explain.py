"""Physical-plan assertions (SURVEY.md §4): the optimizer behaviors the
engine relies on — predicate pushdown into parquet scans, column
pruning, broadcast joins — verified from ``explain`` output so a
regression (e.g. a UDF accidentally blocking pushdown) fails tests
instead of silently costing a full scan at 100 TB.
"""

from __future__ import annotations

import io
from contextlib import redirect_stdout

from pyspark.sql import DataFrame


def formatted_plan(df: DataFrame) -> str:
    buf = io.StringIO()
    with redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


def assert_pushed_filters(df: DataFrame, *fragments: str) -> str:
    """Assert every fragment appears in a PushedFilters: line."""
    plan = formatted_plan(df)
    pushed = [l for l in plan.splitlines() if "PushedFilters" in l]
    joined = " ".join(pushed)
    for frag in fragments:
        assert frag in joined, f"filter {frag!r} not pushed; plan:\n{plan}"
    return plan


def assert_read_schema_only(df: DataFrame, columns: set[str]) -> str:
    """Assert the parquet ReadSchema is pruned to exactly ``columns``."""
    plan = formatted_plan(df)
    import re

    schemas = re.findall(r"ReadSchema: struct<([^>]*)>", plan)
    assert schemas, f"no ReadSchema in plan:\n{plan}"
    read_cols = {c.split(":")[0] for s in schemas for c in s.split(",") if c}
    assert read_cols <= columns, f"scan reads {read_cols - columns} beyond {columns}\n{plan}"
    return plan


def assert_broadcast_join(df: DataFrame) -> str:
    plan = formatted_plan(df)
    assert "BroadcastHashJoin" in plan or "BroadcastNestedLoopJoin" in plan, (
        f"no broadcast join in plan:\n{plan}"
    )
    return plan


def assert_exchange_count(df: DataFrame, expected: int) -> str:
    """Assert the executed plan contains exactly ``expected`` shuffle
    Exchange operators — the single-shuffle batch-plan property the
    CDC merge depends on (an accidental second exchange doubles the
    shuffle volume at 100 TB)."""
    plan = df._jdf.queryExecution().executedPlan().toString()
    got = sum(1 for l in plan.splitlines() if "Exchange" in l and "Reused" not in l)
    assert got == expected, f"expected {expected} exchanges, found {got}:\n{plan}"
    return plan
