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
    results = {
        "sales_by_employee": analytics.td_sales_by_employee(spark, SF_DIR),
        "sales_by_category": analytics.td_sales_by_category(spark, SF_DIR),
    }
    path = report.save_report(results, str(tmp_path / "relatorio-final.md"))
    text = open(path, encoding="utf-8").read()
    assert "Total de vendas por funcionário" in text
    assert "| id_empregado |" in text


def _report_results(spark):
    return {
        "sales_by_employee": analytics.td_sales_by_employee(spark, SF_DIR),
        "average_ticket_by_product": analytics.td_average_ticket_by_product(
            spark, SF_DIR
        ),
        "sales_by_category": analytics.td_sales_by_category(spark, SF_DIR),
        "top5_employees": analytics.td_top5_employees(spark, SF_DIR),
        "sales_by_period": analytics.td_sales_by_period(spark, SF_DIR),
    }


def test_pdf_report_structure(spark, tmp_path):
    """S9 parity: real PDF with all 5 sections, 3 vector charts, and the
    date-imputation warning (reference save_data_pdf_report.py:480-745)."""
    path = report.save_report(
        _report_results(spark), str(tmp_path / "relatorio-final")
    )
    assert path.endswith(".pdf")
    raw = open(path, "rb").read()
    assert raw.startswith(b"%PDF-1.4")
    assert raw.rstrip().endswith(b"%%EOF")
    # content streams are uncompressed → section headings are greppable
    body = raw.decode("latin-1")
    for heading in [h for _k, h, *_ in report.SECTIONS]:
        assert heading.encode("latin-1").decode("latin-1") in body
    # the reference's layout: leading table pages, then one page opened
    # per charted section (page count grows with table rows)
    assert body.count("/Type /Page ") >= 4
    for chart_title in (
        "Vendas por Categoria de Produto",
        "Top 5 Funcion\xe1rios - Volume de Vendas",
        "Evolu\xe7\xe3o de Vendas por Per\xedodo",
    ):
        assert chart_title in body
    assert "OBSERVA\xc7\xc3O IMPORTANTE" in body
    # vector chart marks exist (filled rects for bars, polyline for the series)
    assert body.count(" re B") > 20  # table grid + bars
    assert " l S" in body  # polyline stroke


def test_pdf_renders_with_empty_and_extra_sections(spark, tmp_path):
    """Sink must not crash on missing sections or unknown extra keys."""
    results = {
        "sales_by_category": analytics.td_sales_by_category(spark, SF_DIR),
        "custom_extra": analytics.td_top5_employees(spark, SF_DIR),
    }
    path = report.save_report(results, str(tmp_path / "partial"))
    raw = open(path, "rb").read()
    assert raw.startswith(b"%PDF-1.4")
    assert b"custom_extra" in raw


def test_compact_parquet_small_files(spark, tmp_path):
    """A fragmented directory (40 tiny files) compacts into the byte-
    budgeted file count with content preserved exactly."""
    from sales_data_etl_pipeline_spark.sources import parquet as pq_sink

    src, dst = str(tmp_path / "frag"), str(tmp_path / "compact")
    base = spark.range(0, 4000).selectExpr(
        "id", "cast(id % 97 as double) AS v"
    )
    base.repartition(40).write.parquet(src)
    stats = pq_sink.compact_parquet(
        spark, src, dst, target_file_bytes=512 * 1024
    )
    assert stats["input_files"] == 40
    assert 1 <= stats["output_files"] < 40
    out = spark.read.parquet(dst)
    assert out.count() == 4000
    assert out.exceptAll(base).count() == 0 and base.exceptAll(out).count() == 0


def test_compact_parquet_splits_skewed_partition(spark, tmp_path):
    """partition_by compaction must honor target_file_bytes WITHIN a
    hot partition value: before the round-6 salt, hashing on the
    partition columns alone wrote exactly one file per value, so a
    skewed value came out as one oversized file."""
    import os

    from sales_data_etl_pipeline_spark.sources import parquet as pq_sink

    src, dst = str(tmp_path / "skew_src"), str(tmp_path / "skew_dst")
    # one hot partition value (p=0: ~49k rows) + two tiny ones
    base = spark.range(0, 50000).selectExpr(
        "id",
        "CASE WHEN id < 49000 THEN 0 ELSE cast(id % 2 + 1 AS bigint) END AS p",
        "repeat(uuid(), 8) AS payload",
    )
    base.repartition(20).write.parquet(src)
    stats = pq_sink.compact_parquet(
        spark, src, dst, target_file_bytes=1 * 1024 * 1024, partition_by=["p"]
    )
    hot_files = [
        f
        for f in os.listdir(os.path.join(dst, "p=0"))
        if f.endswith(".parquet")
    ]
    assert len(hot_files) > 1, "hot partition value must split into several files"
    out = spark.read.parquet(dst)
    assert out.count() == 50000
    assert stats["output_files"] >= len(hot_files) + 2
