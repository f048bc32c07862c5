"""Mini-driver: run every registered query on Spark AND its DuckDB oracle
twin, compare row count, column names, and values (order-insensitive).

This mirrors the verification driver's correctness gate (row-count + schema
+ order-insensitive value hash at sf0.01), so a green run here predicts a
green CORRECTNESS report. Values are compared exactly (==) after sorting —
the engine's exact-decimal aggregation idiom is designed to make that hold;
any tolerance would hide a broken idiom.
"""

from __future__ import annotations

import math

import pytest

from nsq2kinesis_spark.registry import all_queries

from .conftest import SF_CORRECTNESS, SF_SMOKE

QUERIES = all_queries()
ORACLED = sorted(n for n, q in QUERIES.items() if q.oracle is not None)
ROWS_ONLY = sorted(n for n, q in QUERIES.items() if q.oracle is None)


def normalize(rows: list[tuple]) -> list[tuple]:
    """Order-insensitively comparable form: stringify each cell (timestamps
    via isoformat, floats via repr) then sort rows."""

    def cell(v):
        if v is None:
            return "∅"
        if isinstance(v, float):
            if math.isnan(v):
                return "nan"
            return repr(v)
        if hasattr(v, "isoformat"):
            return v.isoformat()
        return str(v)

    return sorted(tuple(cell(v) for v in row) for row in rows)


def _assert_parity(spark, duck, name: str, sf_dir: str) -> None:
    q = QUERIES[name]
    sdf = q.builder(spark, sf_dir)
    spark_cols = sorted(sdf.columns)
    spark_rows = [tuple(r[c] for c in spark_cols) for r in sdf.collect()]

    con = duck(sf_dir)
    res = con.execute(q.oracle)
    duck_cols_raw = [d[0] for d in res.description]
    order = sorted(range(len(duck_cols_raw)), key=lambda i: duck_cols_raw[i])
    duck_cols = [duck_cols_raw[i] for i in order]
    duck_rows = [tuple(row[i] for i in order) for row in res.fetchall()]

    assert spark_cols == duck_cols, f"{name}: column names differ"
    assert len(spark_rows) == len(duck_rows), (
        f"{name}: row count {len(spark_rows)} (spark) != {len(duck_rows)} (duckdb)"
    )
    ns, nd = normalize(spark_rows), normalize(duck_rows)
    mismatches = [(a, b) for a, b in zip(ns, nd) if a != b]
    assert not mismatches, f"{name}: {len(mismatches)} differing rows; first: {mismatches[0]}"


@pytest.mark.parametrize("name", ORACLED)
def test_query_matches_oracle(spark, duck, name):
    _assert_parity(spark, duck, name, SF_CORRECTNESS)


# Scale-dependent defects pass the sf0.01 gate and surface only with more
# (or much less) data — the round-4 example: sf0.1's lineitem contains two
# rows tied on q32's entire window ORDER BY with different quantities,
# making ROWS-frame sums engine-dependent until the ordering was made
# total. The slow lane runs the identical gate at 10x the driver's scale
# and at the degenerate tiny scale (empty blocks/cells, tiny-group edges).


@pytest.mark.slow
@pytest.mark.parametrize("name", ORACLED)
def test_query_matches_oracle_at_sf01(spark, duck, name):
    _assert_parity(spark, duck, name, "/root/testdata/sf0.1")


@pytest.mark.slow
@pytest.mark.parametrize("name", ORACLED)
def test_query_matches_oracle_at_sf0001(spark, duck, name):
    _assert_parity(spark, duck, name, SF_SMOKE)


@pytest.mark.parametrize("name", ROWS_ONLY)
def test_rows_only_queries_run(spark, name):
    """Queries without an oracle still must run and return a stable schema."""
    q = QUERIES[name]
    df = q.builder(spark, SF_CORRECTNESS)
    assert df.columns
    assert df.count() >= 0
