"""Physical-plan introspection helpers.

Used by tests/test_plans.py to lock in the plan properties that matter at
100 TB: predicate pushdown into the parquet scan, column pruning, broadcast
joins for dimension tables, whole-stage codegen coverage, and shuffle
counts. A query that silently regresses from broadcast to shuffle join or
starts scanning all columns fails CI here long before it fails at scale.
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame


def physical_plan(df: DataFrame) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def formatted_plan(df: DataFrame) -> str:
    return df._sc._jvm.PythonSQLUtils.explainString(df._jdf.queryExecution(), "formatted")


def pushed_filters(df: DataFrame) -> list[str]:
    """PushedFilters lists from every parquet scan node."""
    out: list[str] = []
    for m in re.finditer(r"PushedFilters:\s*\[([^\]]*)\]", formatted_plan(df)):
        out.extend(p.strip() for p in m.group(1).split(",") if p.strip())
    return out


def read_schemas(df: DataFrame) -> list[str]:
    """ReadSchema struct strings from every parquet scan node."""
    return re.findall(r"ReadSchema:\s*(\S+)", formatted_plan(df))


def scan_columns(df: DataFrame) -> set[str]:
    cols: set[str] = set()
    for schema in read_schemas(df):
        cols.update(re.findall(r"(\w+):", schema))
    return cols


def count_occurrences(df: DataFrame, pattern: str) -> int:
    return len(re.findall(pattern, physical_plan(df)))


def n_shuffles(df: DataFrame) -> int:
    return count_occurrences(df, r"Exchange (?:hash|range|Single)")


def has_broadcast_join(df: DataFrame) -> bool:
    return "BroadcastHashJoin" in physical_plan(df) or "BroadcastNestedLoop" in physical_plan(df)


def has_whole_stage_codegen(df: DataFrame) -> bool:
    # codegen'd stages print as "*(n) Operator" in the simple plan string
    plan = physical_plan(df)
    return "WholeStageCodegen" in plan or "*(" in plan
