"""SparkSession construction tuned for this engine.

Local-mode defaults mirror what we'd set on a real cluster where it matters
(AQE, shuffle partitions sized to parallelism, Arrow for the Python edge);
cluster-only knobs (executor memory/cores, dynamic allocation) are left to
spark-submit so the same code runs unchanged on a 1000-executor cluster.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(
    app_name: str = "nsq2kinesis_spark",
    cpus: int | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or fetch) a SparkSession with engine defaults.

    ``cpus`` defaults to ``$SPARK_GRAFT_CPUS`` (driver contract) else all
    cores. ``shuffle_partitions`` defaults to 2× cpus locally — on a real
    cluster you'd size this to cluster parallelism; AQE coalesces down.
    """
    if cpus is None:
        cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "0")) or os.cpu_count() or 4
    if shuffle_partitions is None:
        shuffle_partitions = max(2 * cpus, 8)

    builder = (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName(app_name)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEMORY", "8g"))
    )
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark


def pin_session_conf(spark: SparkSession) -> None:
    """Runtime-settable configs every query builder relies on.

    Called from the table loader so correctness holds even when the caller
    (e.g. the verification driver) built its own SparkSession: the DuckDB
    oracle reads parquet timestamps as naive-UTC, so the Spark session must
    interpret them in UTC too.
    """
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    spark.conf.set("spark.sql.adaptive.enabled", "true")
    # events.parquet stores TIMESTAMP(NANOS): Spark has no nanosecond
    # timestamp type, so read as raw int64 nanos and truncate to micros in
    # the loader (tables.table). The DuckDB oracles mirror the truncation
    # with CAST(ts AS TIMESTAMP) (ns→µs cast truncates in DuckDB).
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
