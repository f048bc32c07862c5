"""Salted-join skew mitigation: result equivalence + spread verification."""

from __future__ import annotations

from pyspark.sql import functions as F

from nsq2kinesis_spark.functions.skew import SALT_COL, salted_join, with_salt
from nsq2kinesis_spark.tables import table


def test_salted_inner_join_equals_plain_join(spark):
    li = table(spark, "/root/testdata/sf0.001", "lineitem").select(
        "l_orderkey", "l_partkey", "l_quantity"
    )
    o = table(spark, "/root/testdata/sf0.001", "orders").select(
        "o_orderkey", "o_orderdate"
    ).withColumnRenamed("o_orderkey", "l_orderkey")
    plain = li.join(o, ["l_orderkey"]).groupBy("l_orderkey").agg(
        F.count("*").alias("n"), F.sum("l_quantity").alias("q")
    )
    salted = salted_join(li, o, ["l_orderkey"], n_salts=8).groupBy("l_orderkey").agg(
        F.count("*").alias("n"), F.sum("l_quantity").alias("q")
    )
    assert sorted(map(tuple, plain.collect())) == sorted(map(tuple, salted.collect()))


def test_salted_left_join_preserves_unmatched(spark):
    a = spark.createDataFrame([(1, "x"), (2, "y"), (3, "z")], "k int, v string")
    b = spark.createDataFrame([(1, 10), (1, 11)], "k int, w int")
    out = salted_join(a, b, ["k"], n_salts=4, how="left")
    rows = sorted((r.k, r.v, r.w) for r in out.collect())
    assert rows == [(1, "x", 10), (1, "x", 11), (2, "y", None), (3, "z", None)]


def test_salt_spreads_hot_key(spark):
    # one key, 10k rows: salted partitioning must use >1 distinct salt
    hot = spark.range(10_000).select(F.lit(1).alias("k"), F.col("id"))
    n_distinct = with_salt(hot, 16).select(SALT_COL).distinct().count()
    assert n_distinct > 8  # the hot key now spans most of the 16 sub-keys
