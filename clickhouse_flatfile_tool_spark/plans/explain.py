"""Plan-inspection helpers used by tests and perf iteration.

The reference has no planner (SURVEY §4.1) — Catalyst is ours; these helpers
make plan properties assertable so scale regressions (lost pushdown, accidental
cartesian product, missing broadcast) fail tests instead of shipping.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def explain_str(df: DataFrame, mode: str = "formatted") -> str:
    return df._sc._jvm.PythonSQLUtils.explainString(  # noqa: SLF001
        df._jdf.queryExecution(), mode
    )


def assert_no_cartesian(df: DataFrame, allow: bool = False) -> None:
    """Fail when the physical plan contains a CartesianProduct — every join
    in this engine should be equi-join or explicit broadcast nested loop."""
    plan = explain_str(df)
    if not allow and "CartesianProduct" in plan:
        raise AssertionError(f"unexpected CartesianProduct in plan:\n{plan}")


def pushed_filters(df: DataFrame) -> str:
    """Return the PushedFilters section of a formatted plan (empty string if
    none) — lets tests assert that a predicate reached the parquet scan."""
    plan = explain_str(df)
    return "\n".join(line for line in plan.splitlines() if "PushedFilters" in line)
