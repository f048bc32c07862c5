"""Query registry: every engine operator ships as a named query.

Each entry couples a Spark DataFrame builder ``(spark, sf_dir) -> DataFrame``
with (optionally) an ANSI-SQL oracle twin runnable by DuckDB over the same
parquet tables. The driver's correctness gate compares the two at sf=0.01
(row count + schema + order-insensitive value hash), so builders must:

- alias every computed column identically in both forms;
- round any double produced by arithmetic/aggregation (summation order is
  engine-dependent at the last ulp) — raw stored doubles are exact and need
  no rounding;
- stay timezone-pinned to UTC (handled by ``tables.table``).

Queries without an oracle (approximate/streaming-only ops) register with
``oracle=None`` and get the driver's weaker rows-only check.
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession

Builder = Callable[[SparkSession, str], DataFrame]


@dataclass
class Query:
    name: str
    builder: Builder
    oracle: str | None = None
    tags: tuple[str, ...] = ()
    doc: str = ""


QUERIES: dict[str, Query] = {}


def query(
    name: str, oracle: str | None = None, tags: tuple[str, ...] = ()
) -> Callable[[Builder], Builder]:
    """Decorator registering a query builder (and its oracle SQL twin)."""

    def deco(fn: Builder) -> Builder:
        if name in QUERIES:
            raise ValueError(f"duplicate query name {name!r}")
        QUERIES[name] = Query(name, fn, oracle, tags, (fn.__doc__ or "").strip())
        return fn

    return deco


def load_all_modules() -> None:
    """Import every operator module so their @query decorators run.

    Import order is deliberate: it fixes the registry's dict order, which is
    the order external harnesses iterate ``queries()``. A harness that checks
    only a prefix of the registry should see the least-recently-verified
    queries first, so modules are ordered by verification recency:
    windows/udfs/streaming_twins (no external correctness rows yet) and
    similarity (q81 re-keyed this round) lead; joins/scalars (all green in
    round 1, unchanged since) trail.
    """
    from .operators import (  # noqa: F401
        windows,
        udfs,
        streaming_twins,
        similarity,
        llm_dedup,
        llm_text,
        relational,
        aggregates,
        joins,
        scalars,
    )


def all_queries() -> dict[str, Query]:
    load_all_modules()
    return dict(QUERIES)
