"""Skew-utility correctness: salted results must equal unsalted."""

from __future__ import annotations

import pyspark.sql.functions as F

from g_etl_spark.operators import joins as J


def _skewed_df(spark):
    # one hot key (90%) + long tail
    hot = spark.range(9000).select(F.lit("HOT").alias("k"), F.col("id").alias("v"))
    tail = spark.range(1000).select(
        F.concat(F.lit("k"), (F.col("id") % 100).cast("string")).alias("k"),
        F.col("id").alias("v"),
    )
    return hot.unionByName(tail)


def test_salted_count_matches_plain(spark):
    df = _skewed_df(spark)
    plain = {r.k: r.n for r in df.groupBy("k").agg(F.count(F.lit(1)).alias("n")).collect()}
    salted = {r.k: r.n for r in J.salted_count(df, ["k"]).collect()}
    assert salted == plain
    assert salted["HOT"] == 9000


def test_broadcast_salted_join_matches_plain(spark):
    big = _skewed_df(spark)
    small = spark.createDataFrame(
        [("HOT", "hot-meta"), ("k1", "k1-meta"), ("k55", "k55-meta")], "k string, meta string"
    )
    plain = big.join(small, "k").count()
    salted = J.broadcast_salted_join(big, small, "k").count()
    assert salted == plain
