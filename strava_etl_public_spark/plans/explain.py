"""Physical-plan inspection helpers (scale-discipline assertions).

The 100 TB contract is checked in tests, not hoped for: filters reach
the parquet scan (PushedFilters), projections prune (ReadSchema),
bounded dims broadcast, and whole-stage codegen spans the hot path.
These helpers read `explain("formatted")` output so tests can assert
plan shape, not just results.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def plan_formatted(df: DataFrame) -> str:
    return df._sc._jvm.PythonSQLUtils.explainString(  # type: ignore[attr-defined]
        df._jdf.queryExecution(), "formatted"
    )


def has_pushed_filter(df: DataFrame, fragment: str) -> bool:
    """True if the parquet scan's PushedFilters mentions `fragment`."""
    plan = plan_formatted(df)
    return any(
        fragment in line for line in plan.splitlines() if "PushedFilters" in line
    )


def read_schema_columns(df: DataFrame) -> list[str]:
    """Columns actually read from the (first) parquet scan."""
    plan = plan_formatted(df)
    for line in plan.splitlines():
        if "ReadSchema" in line:
            inner = line.split("struct<", 1)[-1].rsplit(">", 1)[0]
            return [f.split(":")[0] for f in inner.split(",") if f]
    return []


def uses_broadcast_join(df: DataFrame) -> bool:
    return "BroadcastHashJoin" in plan_formatted(df)


def count_exchanges(df: DataFrame) -> int:
    """Number of shuffle exchanges in the physical plan (lower = fewer
    cluster-wide data movements)."""
    plan = plan_formatted(df)
    return sum(1 for line in plan.splitlines() if "Exchange" in line and "Broadcast" not in line)


def codegen_spans(df: DataFrame) -> int:
    plan = plan_formatted(df)
    return plan.count("WholeStageCodegen")
