"""Physical-plan inspection helpers.

The reference has no optimizer to inspect (SURVEY.md §4.1 — its plan is the
fixed Map->Reduce shape). In this engine the optimizer IS the performance
story, so these helpers make plan properties assertable: tests pin that
filters reach the parquet scan, dimension joins broadcast, aggregations have
map-side partials, and bucketed joins avoid shuffles — the properties that
keep the same code fast at 100 TB.
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame


def formatted_plan(df: DataFrame) -> str:
    return df._sc._jvm.PythonSQLUtils.explainString(  # type: ignore[attr-defined]
        df._jdf.queryExecution(), "formatted"
    )


def executed_plan(df: DataFrame) -> str:
    # triggers execution so AQE reports the final plan
    df.collect()
    return df._jdf.queryExecution().executedPlan().toString()


def pushed_filters(df: DataFrame) -> list[str]:
    """PushedFilters lists from every parquet scan in the plan."""
    out: list[str] = []
    for m in re.finditer(r"PushedFilters: \[([^\]]*)\]", formatted_plan(df)):
        if m.group(1).strip():
            out.extend(p.strip() for p in m.group(1).split(","))
    return out


def scan_read_schemas(df: DataFrame) -> list[str]:
    """ReadSchema strings of every file scan (column-pruning visibility)."""
    return re.findall(r"ReadSchema: (struct<[^>]*>)", formatted_plan(df))


def count_operator(df: DataFrame, op: str, executed: bool = False) -> int:
    """Count instances of a physical operator.

    Formatted explain lists each node once in the tree and once in the
    details as "(N) OpName"; counting the detail headers counts each
    instance exactly once.
    """
    if executed:
        plan = executed_plan(df)
        return len(re.findall(rf"\b{re.escape(op)}\b", plan))
    plan = formatted_plan(df)
    return len(re.findall(rf"^\(\d+\) {re.escape(op)}\s*$", plan, re.MULTILINE))


def has_partial_aggregation(df: DataFrame) -> bool:
    """True if any aggregate runs in partial+final mode (map-side combine)."""
    plan = formatted_plan(df)
    return bool(
        re.search(r"partial_\w+", plan)
        or re.search(r"HashAggregate.*Functions \[\d*partial", plan)
    )
