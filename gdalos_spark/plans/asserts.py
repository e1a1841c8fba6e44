"""Physical-plan assertions — the 100-TB design checks made executable.

Every scale claim in an operator docstring ("broadcasts the dim",
"filter reaches the scan", "no cartesian product") is asserted in tests
through these helpers, so a plan regression fails CI instead of
surfacing as a 100x slowdown on a real cluster.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def explain_str(df: DataFrame, mode: str = "formatted") -> str:
    return df._sc._jvm.PythonSQLUtils.explainString(  # type: ignore[attr-defined]
        df._jdf.queryExecution(), mode
    )


def assert_whole_stage_codegen(df: DataFrame) -> str:
    """Assert the plan has WholeStageCodegen subtrees. AQE hides codegen
    until execution, so the caller must build `df` with
    spark.sql.adaptive.enabled=false (see tests/test_plans.py)."""
    plan = explain_str(df, "codegen")
    assert "Found 0 WholeStageCodegen" not in plan, (
        f"no WholeStageCodegen subtrees:\n{explain_str(df, 'simple')}"
    )
    return plan


def assert_in_plan(df: DataFrame, *needles: str) -> str:
    plan = explain_str(df)
    for n in needles:
        assert n in plan, f"expected {n!r} in physical plan:\n{plan}"
    return plan


def assert_not_in_plan(df: DataFrame, *needles: str) -> str:
    plan = explain_str(df)
    for n in needles:
        assert n not in plan, f"unexpected {n!r} in physical plan:\n{plan}"
    return plan


def assert_broadcast_join(df: DataFrame) -> str:
    return assert_in_plan(df, "BroadcastHashJoin")


def assert_no_cartesian(df: DataFrame) -> str:
    return assert_not_in_plan(df, "CartesianProduct")


def assert_pushed_filter(df: DataFrame, fragment: str) -> str:
    """Assert a data filter reached the parquet scan (PushedFilters)."""
    plan = explain_str(df)
    pushed = [ln for ln in plan.splitlines() if "PushedFilters" in ln]
    assert pushed and any(fragment in ln for ln in pushed), (
        f"no PushedFilters line containing {fragment!r}:\n{plan}"
    )
    return plan


def assert_partition_filter(df: DataFrame, fragment: str) -> str:
    """Assert a partition-pruning predicate is applied at the scan."""
    plan = explain_str(df)
    lines = [ln for ln in plan.splitlines() if "PartitionFilters" in ln]
    assert lines and any(fragment in ln for ln in lines), (
        f"no PartitionFilters line containing {fragment!r}:\n{plan}"
    )
    return plan
