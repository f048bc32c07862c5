"""Physical-plan introspection helpers.

Used by tests/test_plans.py to lock in the plan properties that matter at
100 TB: predicate pushdown into the parquet scan, column pruning, broadcast
joins for dimension tables, whole-stage codegen coverage, and shuffle
counts. A query that silently regresses from broadcast to shuffle join or
starts scanning all columns fails CI here long before it fails at scale.

Every helper accepts an optional pre-rendered ``plan`` string so a test
asserting several properties renders the plan once instead of paying one
JVM round-trip per assertion.
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame


def physical_plan(df: DataFrame) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def formatted_plan(df: DataFrame) -> str:
    return df._sc._jvm.PythonSQLUtils.explainString(df._jdf.queryExecution(), "formatted")


def _split_top_level(s: str) -> list[str]:
    """Split a filter list on commas at bracket depth 0 only — a naive
    split fragments In(col, [a,b]) and every binary comparison."""
    parts: list[str] = []
    depth = 0
    cur: list[str] = []
    for ch in s:
        if ch in "([":
            depth += 1
        elif ch in ")]":
            depth -= 1
        if ch == "," and depth == 0:
            parts.append("".join(cur).strip())
            cur = []
        else:
            cur.append(ch)
    if cur:
        parts.append("".join(cur).strip())
    return [p for p in parts if p]


def pushed_filters(df: DataFrame, plan: str | None = None) -> list[str]:
    """PushedFilters lists from every parquet scan node, each filter kept
    WHOLE (bracket-aware parsing: In(col, [a,b]) is one entry, and the
    list's closing bracket is found by depth, not the first ']')."""
    rendered = plan if plan is not None else formatted_plan(df)
    out: list[str] = []
    for m in re.finditer(r"PushedFilters:\s*\[", rendered):
        depth = 1
        i = m.end()
        while i < len(rendered) and depth:
            if rendered[i] == "[":
                depth += 1
            elif rendered[i] == "]":
                depth -= 1
            i += 1
        out.extend(_split_top_level(rendered[m.end() : i - 1]))
    return out


def read_schemas(df: DataFrame, plan: str | None = None) -> list[str]:
    """ReadSchema struct strings from every parquet scan node."""
    rendered = plan if plan is not None else formatted_plan(df)
    return re.findall(r"ReadSchema:\s*(\S+)", rendered)


def scan_columns(df: DataFrame, plan: str | None = None) -> set[str]:
    cols: set[str] = set()
    for schema in read_schemas(df, plan):
        cols.update(re.findall(r"(\w+):", schema))
    return cols


def count_occurrences(df: DataFrame, pattern: str, plan: str | None = None) -> int:
    rendered = plan if plan is not None else physical_plan(df)
    return len(re.findall(pattern, rendered))


def n_shuffles(df: DataFrame, plan: str | None = None) -> int:
    # RoundRobinPartitioning (repartition(n) with no key) IS a shuffle —
    # omitting it let repartition-induced regressions pass the exact
    # shuffle-count gates unnoticed
    return count_occurrences(
        df, r"Exchange (?:hash|range|RoundRobin|Single)", plan
    )


def has_broadcast_join(df: DataFrame, plan: str | None = None) -> bool:
    rendered = plan if plan is not None else physical_plan(df)
    return "BroadcastHashJoin" in rendered or "BroadcastNestedLoop" in rendered


def has_whole_stage_codegen(df: DataFrame, plan: str | None = None) -> bool:
    # codegen'd stages print as "*(n) Operator" in the simple plan string
    rendered = plan if plan is not None else physical_plan(df)
    return "WholeStageCodegen" in rendered or "*(" in rendered
