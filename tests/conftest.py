from __future__ import annotations

import os
import sys

import duckdb
import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from nsq2kinesis_spark.session import get_spark
from nsq2kinesis_spark.tables import TABLE_NAMES

SF_SMOKE = "/root/testdata/sf0.001"
SF_CORRECTNESS = "/root/testdata/sf0.01"


@pytest.fixture(scope="session")
def spark():
    s = get_spark(app_name="nsq2kinesis_spark_tests", cpus=8, shuffle_partitions=8)
    yield s


@pytest.fixture(scope="session")
def duck():
    """DuckDB connection with the test tables registered as views, mirroring
    the driver's oracle setup."""
    con = duckdb.connect()

    def register(sf_dir: str) -> duckdb.DuckDBPyConnection:
        for t in TABLE_NAMES:
            con.execute(
                f"CREATE OR REPLACE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'"
            )
        return con

    yield register
