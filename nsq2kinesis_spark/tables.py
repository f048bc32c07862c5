"""Test-table catalog: load the driver-generated parquet tables.

Tables (TESTDATA.md): region nation customer supplier part orders lineitem
events documents embeddings — one parquet file per table under
``/root/testdata/sf{0.001,0.01,0.1}/``.

At 100 TB these would be partitioned/bucketed datasets; the loaders here are
plain ``spark.read.parquet`` so Catalyst gets native pushdown/pruning. Query
builders must never cache or collect — plans stay lazy end-to-end.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

from .session import pin_session_conf

TABLE_NAMES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

DEFAULT_SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

# Dimension tables small enough to broadcast at any realistic scale factor
# (region/nation are fixed-size; part/supplier/customer grow with SF but stay
# dimension-sized relative to lineitem/orders facts).
BROADCAST_SAFE = frozenset({"region", "nation", "supplier", "part"})


def table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Load one test table. Pins session TZ to UTC (oracle parity)."""
    if name not in TABLE_NAMES:
        raise KeyError(f"unknown table {name!r}; expected one of {TABLE_NAMES}")
    pin_session_conf(spark)
    parquet_path = os.path.join(sf_dir, f"{name}.parquet")
    orc_path = os.path.join(sf_dir, f"{name}.orc")
    jsonl_path = os.path.join(sf_dir, f"{name}.jsonl")
    csv_path = os.path.join(sf_dir, f"{name}.csv")
    if os.path.exists(parquet_path) or not (
        os.path.exists(orc_path)
        or os.path.exists(jsonl_path)
        or os.path.exists(csv_path)
    ):
        # parquet is the primary format (missing paths still route here so
        # the caller gets Spark's clean PATH_NOT_FOUND)
        df = spark.read.parquet(parquet_path)
    elif os.path.exists(orc_path):
        # ORC carries full types (incl. timestamps) and the same native
        # pushdown/pruning path as parquet — no normalization needed beyond
        # the shared events-ts handling below
        df = spark.read.orc(orc_path)
    elif os.path.exists(jsonl_path):
        # source-format breadth: the same catalog serves JSON-lines copies
        # of a table (schema inferred here; a production deployment pins
        # explicit schemas — inference costs an extra pass and can widen
        # types)
        df = spark.read.json(jsonl_path)
    else:
        df = spark.read.csv(csv_path, header=True, inferSchema=True, multiLine=True, escape='"')
    if name == "events":
        ts_type = dict(df.dtypes).get("ts")
        if ts_type == "bigint":
            # TIMESTAMP(NANOS) read as int64 nanos (see session.pin_session_conf):
            # integer-truncate to microseconds (floor div — ns values overflow
            # double, so never divide in floating point).
            from pyspark.sql import functions as F

            df = df.withColumn(
                "ts", F.expr("timestamp_micros(CAST(ts DIV 1000 AS LONG))")
            )
        elif ts_type == "timestamp_ntz":
            # Parquet logical TIMESTAMP(isAdjustedToUTC=false) loads as
            # TIMESTAMP_NTZ. Batch F.window accepts NTZ but streaming
            # withWatermark raises EVENT_TIME_IS_NOT_ON_TIMESTAMP_TYPE, so
            # normalize to TIMESTAMP here. Session TZ is pinned UTC
            # (session.pin_session_conf), making the cast value-identical —
            # oracle parity is unaffected.
            from pyspark.sql import functions as F

            df = df.withColumn("ts", F.col("ts").cast("timestamp"))
        elif ts_type == "string":
            # JSON/CSV fallback copies carry ts as an ISO-8601 string
            # (Spark's JSON inference does not produce timestamps) — cast
            # so every events consumer sees one timestamp type regardless
            # of the serving format.
            from pyspark.sql import functions as F

            df = df.withColumn("ts", F.col("ts").cast("timestamp"))
    return df


def load_all(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    return {name: table(spark, sf_dir, name) for name in TABLE_NAMES}


def register_views(spark: SparkSession, sf_dir: str) -> None:
    """Register every table as a temp view (for spark.sql-based builders)."""
    for name, df in load_all(spark, sf_dir).items():
        df.createOrReplaceTempView(name)
