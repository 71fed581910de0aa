"""Salted-aggregation/join equivalence tests on a deliberately skewed key."""

from __future__ import annotations

from pyspark.sql import functions as F

from sales_data_etl_pipeline_spark.operators import skew


def _skewed(spark):
    # 90% of rows share key 1
    hot = spark.range(9000).select(F.lit(1).alias("k"), F.col("id").alias("v"))
    cold = spark.range(1000).select(
        (F.col("id") % 50 + 2).alias("k"), F.col("id").alias("v")
    )
    return hot.unionByName(cold)


def test_salted_sum_equals_plain(spark):
    df = _skewed(spark)
    plain = {(r.k, r.s) for r in df.groupBy("k").agg(F.sum("v").alias("s")).collect()}
    salted = {
        (r.k, r.sum_v) for r in skew.salted_sum(df, ["k"], "v", out_col="sum_v").collect()
    }
    assert salted == plain


def test_salted_count_equals_plain(spark):
    df = _skewed(spark)
    plain = {(r.k, r["count"]) for r in df.groupBy("k").count().collect()}
    salted = {(r.k, r.n) for r in skew.salted_count(df, ["k"]).collect()}
    assert salted == plain


def test_salted_join_equals_plain(spark):
    df = _skewed(spark)
    dim = spark.range(60).select(
        (F.col("id") + 1).alias("k"), (F.col("id") * 10).alias("w")
    )
    plain = df.join(dim, "k").groupBy("k").agg(
        F.count(F.lit(1)).alias("n"), F.sum("w").alias("sw")
    )
    salted = skew.salted_join(df, dim, "k").groupBy("k").agg(
        F.count(F.lit(1)).alias("n"), F.sum("w").alias("sw")
    )
    assert {tuple(r) for r in plain.collect()} == {tuple(r) for r in salted.collect()}


def test_top_frequency_keys_flags_hot_key(spark):
    df = _skewed(spark)
    top = skew.top_frequency_keys(df, "k", top=3).collect()
    assert top[0].k == 1 and top[0].share >= 0.85
