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


def test_events_jsonl_normalizes_ts(spark, tmp_path):
    """events served from JSON lines carries ts as an ISO string (Spark's
    JSON inference never yields timestamps) — the loader must normalize it
    to TIMESTAMP so every events consumer works unchanged. q60 (dedup on
    events) must match its parquet result exactly."""
    from nsq2kinesis_spark.tables import table as load

    sf_dir = tmp_path / "sf_events"
    sf_dir.mkdir()
    out = tmp_path / "stage_events"
    # default JSON timestampFormat truncates to milliseconds — export with
    # full microsecond precision so the round trip is lossless
    load(spark, SF_SMOKE, "events").coalesce(1).write.option(
        "timestampFormat", "yyyy-MM-dd'T'HH:mm:ss.SSSSSSXXX"
    ).json(str(out))
    part = glob.glob(str(out / "part-*"))[0]
    shutil.copy(part, sf_dir / "events.jsonl")

    df = load(spark, str(sf_dir), "events")
    assert dict(df.dtypes)["ts"] == "timestamp", df.dtypes
    builder = all_queries()["q60_dedup_exact"].builder
    assert _rows(builder(spark, str(sf_dir))) == _rows(builder(spark, SF_SMOKE))


def test_missing_table_keeps_clean_error(spark, tmp_path):
    """A bad sf_dir still raises Spark's PATH_NOT_FOUND (the fallback
    routing must not swallow it into a confusing CSV error)."""
    import pytest
    from pyspark.errors import AnalysisException

    with pytest.raises(AnalysisException, match="PATH_NOT_FOUND"):
        table(spark, str(tmp_path / "nope"), "documents").count()


def test_orc_serves_events_with_full_timestamp_fidelity(spark, tmp_path):
    """ORC copies serve through the same catalog with native types — the
    events table (the hardest case: timestamp precision) must produce
    byte-identical q60/q63 results vs parquet. Unlike the text formats,
    ORC needs no ts normalization and keeps the parquet-grade
    pushdown/pruning path."""
    from nsq2kinesis_spark.tables import table as load

    sf_dir = tmp_path / "sf_orc"
    sf_dir.mkdir()
    for name in ("events", "documents"):
        out = tmp_path / f"stage_orc_{name}"
        load(spark, SF_SMOKE, name).coalesce(1).write.orc(str(out))
        part = glob.glob(str(out / "part-*"))[0]
        shutil.copy(part, sf_dir / f"{name}.orc")

    df = load(spark, str(sf_dir), "events")
    assert dict(df.dtypes)["ts"] == "timestamp", df.dtypes
    queries = all_queries()
    for qname in ("q60_dedup_exact", "q63_session_window", "q70_text_stats"):
        builder = queries[qname].builder
        assert _rows(builder(spark, str(sf_dir))) == _rows(
            builder(spark, SF_SMOKE)
        ), qname
