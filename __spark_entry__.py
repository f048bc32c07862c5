"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` runs the flagship pricing-summary query at sf0.001;
``queries()`` exposes every implemented operator from SURVEY.md §2 as a
``(spark, sf_dir) -> DataFrame`` builder; ``oracle_sql()`` gives the DuckDB
twin for each oracle-checkable query (genuinely non-reproducible sketches —
MinHash-LSH banding, HLL, GK quantiles — are rows-only by design, each with
a local accuracy gate; deterministic "approximate" ops like the q82 IVF
probe carry full value oracles).

Implementation lives in the ``nsq2kinesis_spark`` package (registry pattern:
each operator module registers its queries + oracle SQL at import time).
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from nsq2kinesis_spark.registry import all_queries  # noqa: E402


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    return all_queries()["q01_pricing_summary"].builder(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    return {name: q.builder for name, q in all_queries().items()}


def oracle_sql() -> dict[str, str]:
    """DuckDB-runnable ANSI SQL twin for each oracle-checkable query."""
    return {name: q.oracle for name, q in all_queries().items() if q.oracle is not None}
