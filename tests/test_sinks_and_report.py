"""Sinks, catalog, metrics, report tests (S5-S11 surface)."""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from sales_data_etl_pipeline_spark import catalog, report
from sales_data_etl_pipeline_spark.plans import analytics
from sales_data_etl_pipeline_spark.sources.parquet import write_parquet
from sales_data_etl_pipeline_spark.sources.tables import load_testdata

SF_DIR = "/root/testdata/sf0.001"


def test_partitioned_parquet_sink_prunes(spark, tmp_path):
    li = load_testdata(spark, SF_DIR, ("lineitem",))["lineitem"]
    out = str(tmp_path / "li")
    write_parquet(
        li.withColumn("ship_month", F.date_format("l_shipdate", "yyyy-MM")),
        out,
        partition_by=["ship_month"],
    )
    # partition dirs exist
    months = [d for d in os.listdir(out) if d.startswith("ship_month=")]
    assert len(months) > 10
    # a month-filtered scan reads only the matching partition (pruning)
    reread = spark.read.parquet(out).filter(F.col("ship_month") == "1995-06")
    plan = reread._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan or reread.count() > 0


def test_ensure_database_and_save_as_table(spark):
    catalog.ensure_database(spark, "comercial")
    assert spark.catalog.databaseExists("comercial")


def test_observed_counts_ride_the_action(spark):
    li = load_testdata(spark, SF_DIR, ("lineitem",))["lineitem"]
    df, obs = catalog.observed(li.filter(F.col("l_quantity") > 0), "cnt")
    n = df.count()
    assert obs.get["n_rows"] == n > 0


def test_markdown_report(spark, tmp_path):
    t = load_testdata(spark, SF_DIR, ("lineitem", "supplier", "part"))
    results = {
        "sales_by_employee": analytics.td_sales_by_employee(spark, SF_DIR),
        "sales_by_category": analytics.td_sales_by_category(spark, SF_DIR),
    }
    path = report.save_report(results, str(tmp_path / "relatorio-final"))
    text = open(path, encoding="utf-8").read()
    assert "Vendas por Funcionário" in text and "| id_empregado |" in text
