"""Bucketed-table co-located join: the shuffle-free join scale path (S5).

Writes lineitem and orders bucketed by the join key, then proves the
bucket join plans WITHOUT an Exchange on either side — at 100 TB this is
the difference between shuffling the fact table per join and reading
pre-co-located buckets.
"""

from __future__ import annotations

import re

import pytest
from pyspark.sql import functions as F

from sales_data_etl_pipeline_spark.sources.parquet import overwrite_table
from sales_data_etl_pipeline_spark.sources.tables import load_testdata

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def bucketed(spark):
    t = load_testdata(spark, SF_DIR, ("lineitem", "orders"))
    overwrite_table(t["lineitem"], "li_bucketed", bucket_by=(8, "l_orderkey"))
    overwrite_table(
        t["orders"].withColumnRenamed("o_orderkey", "l_orderkey"),
        "ord_bucketed",
        bucket_by=(8, "l_orderkey"),
    )
    yield
    spark.sql("DROP TABLE IF EXISTS li_bucketed")
    spark.sql("DROP TABLE IF EXISTS ord_bucketed")


def test_bucket_join_has_no_shuffle(spark, bucketed):
    li = spark.table("li_bucketed")
    orders = spark.table("ord_bucketed")
    # disable broadcast so the join strategy must rely on bucketing
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        joined = li.join(orders, "l_orderkey").groupBy("o_orderstatus").count()
        plan = joined._jdf.queryExecution().executedPlan().toString()
        joins = re.findall(r"SortMergeJoin|ShuffledHashJoin", plan)
        assert joins, "expected a shuffle-strategy join over bucketed tables"
        # no Exchange may feed the join inputs (buckets are co-located);
        # the only allowed Exchange is the one for the final groupBy
        join_section = plan.split("HashAggregate")[-1]
        assert "Exchange hashpartitioning(l_orderkey" not in plan
        n = joined.count()
        assert n > 0
    finally:
        spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
