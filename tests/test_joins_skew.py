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


def test_auto_salt_buckets_sizes_from_hottest_key(spark):
    """Self-tuning salt (r9): the factor must come from the MEASURED
    hottest key — ceil(9000/1000)=9 on the fixture — clamp to
    max_buckets, return 1 on empty input and on no-skew input (so
    callers can skip salting entirely)."""
    df = _skewed_df(spark)
    assert J.auto_salt_buckets(df, ["k"], rows_per_bucket=1000) == 9
    assert J.auto_salt_buckets(df, ["k"], rows_per_bucket=1000, max_buckets=4) == 4
    assert J.auto_salt_buckets(df, ["k"], rows_per_bucket=100_000) == 1
    assert J.auto_salt_buckets(df.limit(0), ["k"], rows_per_bucket=10) == 1


def test_auto_salted_results_match_plain(spark):
    """salt_buckets='auto' end-to-end: identical numbers to the plain
    groupBy/join on the skewed fixture."""
    df = _skewed_df(spark)
    plain = {r.k: r.n for r in df.groupBy("k").agg(F.count(F.lit(1)).alias("n")).collect()}
    assert {r.k: r.n for r in J.salted_count(df, ["k"], salt_buckets="auto").collect()} == plain
    small = spark.createDataFrame([("HOT", "m")], "k string, meta string")
    assert (
        J.broadcast_salted_join(df, small, "k", salt_buckets="auto").count()
        == df.join(small, "k").count()
    )
