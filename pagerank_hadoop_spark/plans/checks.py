"""Physical-plan assertions — the 100 TB posture, checked in CI.

A correct result with a wrong plan (full scan instead of pruned scan,
shuffle join where a broadcast fits, global sort where a top-k heap
suffices) is a bug at scale even when sf0.01 hides it. These helpers
parse ``explain("formatted")`` output so tests can pin the plans.
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


def assert_pushed_filter(df: DataFrame, fragment: str) -> None:
    """The Parquet scan must carry a pushed filter mentioning fragment."""
    plan = formatted_plan(df)
    for line in plan.splitlines():
        if "PushedFilters" in line and fragment in line:
            return
    raise AssertionError(f"no pushed filter containing {fragment!r}:\n{plan}")


def assert_read_schema_only(df: DataFrame, columns: set[str]) -> None:
    """Column pruning: the scan's ReadSchema must not exceed columns."""
    plan = formatted_plan(df)
    import re

    for m in re.finditer(r"ReadSchema: struct<([^>]*)>", plan):
        got = {c.split(":")[0].strip() for c in m.group(1).split(",") if c.strip()}
        extra = got - columns
        if extra:
            raise AssertionError(f"scan reads unpruned columns {extra}:\n{plan}")


def assert_broadcast_join(df: DataFrame) -> None:
    plan = formatted_plan(df)
    if "BroadcastHashJoin" not in plan and "BroadcastNestedLoopJoin" not in plan:
        raise AssertionError(f"expected a broadcast join:\n{plan}")


def assert_no_cartesian(df: DataFrame) -> None:
    plan = formatted_plan(df)
    if "CartesianProduct" in plan:
        raise AssertionError(f"unexpected cartesian product:\n{plan}")


def assert_take_ordered(df: DataFrame) -> None:
    """Top-k must plan TakeOrderedAndProject, not a global Sort."""
    plan = formatted_plan(df)
    if "TakeOrderedAndProject" not in plan:
        raise AssertionError(f"expected TakeOrderedAndProject:\n{plan}")


def count_exchanges(df: DataFrame) -> int:
    plan = formatted_plan(df)
    return sum(1 for line in plan.splitlines() if "Exchange" in line and "Reused" not in line)


def assert_whole_stage_codegen(df: DataFrame) -> None:
    # AQE hides "*(n)" markers until the final plan; the codegen
    # explain mode reports subtrees regardless
    buf = io.StringIO()
    with redirect_stdout(buf):
        df.explain("codegen")
    plan = buf.getvalue()
    if "WholeStageCodegen" not in plan:
        raise AssertionError(f"no whole-stage codegen span:\n{plan}")
