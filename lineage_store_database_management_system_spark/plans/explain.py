"""Plan-inspection helpers: assert that Catalyst produced the plan we
designed for (filters pushed to the Parquet scan, pruned read schema,
broadcast joins) — used by tests and by bench tuning. The reference
has no plans at all (SURVEY §4.1); at 100 TB the plan IS the product.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def explain_str(df: DataFrame, mode: str = "formatted") -> str:
    return df._sc._jvm.PythonSQLUtils.explainString(  # type: ignore[attr-defined]
        df._jdf.queryExecution(), mode
    )


def has_pushed_filters(df: DataFrame, fragment: str) -> bool:
    """True if the formatted plan shows ``fragment`` inside a
    PushedFilters list on some scan."""
    plan = explain_str(df)
    for line in plan.splitlines():
        if "PushedFilters" in line and fragment in line:
            return True
    return False


def scan_read_schema(df: DataFrame) -> list[str]:
    """ReadSchema column lists of every file scan in the plan —
    verifies column pruning (a scan reading all columns for a
    2-column projection is a bug)."""
    out = []
    for line in explain_str(df).splitlines():
        if "ReadSchema" in line:
            out.append(line.strip())
    return out
