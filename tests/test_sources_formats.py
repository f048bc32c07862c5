"""Source-format breadth: the catalog serves the same table from parquet,
JSON-lines, or CSV, and query results are format-invariant (SURVEY.md §2B
scan row — parquet is primary; text formats prove the operators aren't
coupled to it)."""

from __future__ import annotations

import glob
import os
import shutil

from nsq2kinesis_spark.registry import all_queries
from nsq2kinesis_spark.tables import table

from .conftest import SF_SMOKE


def _rows(df):
    cols = sorted(df.columns)
    return sorted(tuple(str(r[c]) for c in cols) for r in df.collect())


def _export(spark, fmt: str, tmp_path, writer):
    """Copy sf0.001 documents into a fresh sf-dir as a single fmt file."""
    sf_dir = tmp_path / f"sf_{fmt}"
    sf_dir.mkdir()
    out = tmp_path / f"stage_{fmt}"
    writer(table(spark, SF_SMOKE, "documents").coalesce(1), str(out))
    part = glob.glob(str(out / "part-*"))[0]
    shutil.copy(part, sf_dir / f"documents.{fmt}")
    return str(sf_dir)


def test_queries_are_format_invariant(spark, tmp_path):
    """q70 (text stats) and q88 (quality gate) produce identical results
    whether documents arrives as parquet, JSON lines, or CSV."""
    jsonl_dir = _export(spark, "jsonl", tmp_path, lambda df, p: df.write.json(p))
    csv_dir = _export(
        spark,
        "csv",
        tmp_path,
        lambda df, p: df.write.csv(p, header=True, quoteAll=True, escape='"'),
    )
    queries = all_queries()
    for qname in ("q70_text_stats", "q88_quality_gate"):
        builder = queries[qname].builder
        expected = _rows(builder(spark, SF_SMOKE))
        assert _rows(builder(spark, jsonl_dir)) == expected, (qname, "jsonl")
        assert _rows(builder(spark, csv_dir)) == expected, (qname, "csv")


def test_missing_table_keeps_clean_error(spark, tmp_path):
    """A bad sf_dir still raises Spark's PATH_NOT_FOUND (the fallback
    routing must not swallow it into a confusing CSV error)."""
    import pytest
    from pyspark.errors import AnalysisException

    with pytest.raises(AnalysisException, match="PATH_NOT_FOUND"):
        table(spark, str(tmp_path / "nope"), "documents").count()
