"""Distributed global rank vs the single-partition window oracle."""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from sales_data_etl_pipeline_spark.operators import rank
from sales_data_etl_pipeline_spark.sources.tables import load_testdata

SF_DIR = "/root/testdata/sf0.001"


def _totals(spark):
    ev = load_testdata(spark, SF_DIR, ("events",))["events"]
    return ev.groupBy("user_id").agg(
        (F.floor(F.sum("value") * 100 + F.lit(0.5)) / 100).alias("total")
    )


def test_distributed_row_number_equals_window(spark):
    t = _totals(spark)
    order = [F.col("total").desc(), F.col("user_id").asc()]
    got, n = rank.distributed_row_number(t, order, rank_col="rk")
    assert n == t.count()
    w = Window.orderBy(F.col("total").desc(), F.col("user_id").asc())
    want = t.withColumn("rk", F.row_number().over(w))
    assert got.exceptAll(want).count() == 0
    assert want.exceptAll(got).count() == 0


def test_distributed_row_number_no_single_partition_exchange(spark):
    """The whole point: no SinglePartition exchange in the plan."""
    t = _totals(spark)
    got, _ = rank.distributed_row_number(
        t, [F.col("total").desc(), F.col("user_id").asc()]
    )
    plan = got._jdf.queryExecution().executedPlan().toString()
    assert "SinglePartition" not in plan


def test_quantile_bucket_sizes(spark):
    t = _totals(spark)
    out = rank.quantile_bucket(
        t,
        [F.col("total").desc(), F.col("user_id").asc()],
        n_buckets=10,
        bucket_col="decile",
    )
    sizes = {r.decile: r.n for r in out.groupBy("decile").agg(F.count(F.lit(1)).alias("n")).collect()}
    n = t.count()
    assert set(sizes) == set(range(1, 11))
    # div-formulation buckets differ by at most 1 in size
    assert max(sizes.values()) - min(sizes.values()) <= 1
    assert sum(sizes.values()) == n
