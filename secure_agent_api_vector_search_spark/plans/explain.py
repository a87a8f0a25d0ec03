"""Physical-plan assertions — used by tests to pin the plans we want,
not just the answers (SURVEY.md §4): top-k must be
TakeOrderedAndProject, point lookups must push filters into the scan,
dimension joins must broadcast.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def physical_plan(df: DataFrame) -> str:
    return df._sc._jvm.PythonSQLUtils.explainString(df._jdf.queryExecution(), "formatted")


def assert_in_plan(df: DataFrame, *needles: str) -> None:
    plan = physical_plan(df)
    missing = [n for n in needles if n not in plan]
    if missing:
        raise AssertionError(f"plan is missing {missing}:\n{plan}")


def assert_takeordered(df: DataFrame) -> None:
    """orderBy().limit() fused into a per-partition-heap top-k."""
    assert_in_plan(df, "TakeOrderedAndProject")


def assert_pushed_filter(df: DataFrame, fragment: str) -> None:
    """A predicate reached the parquet scan (row-group skipping)."""
    plan = physical_plan(df)
    if "PushedFilters" not in plan or fragment not in plan:
        raise AssertionError(f"filter {fragment!r} not pushed down:\n{plan}")


def assert_broadcast_join(df: DataFrame) -> None:
    assert_in_plan(df, "BroadcastHashJoin")
