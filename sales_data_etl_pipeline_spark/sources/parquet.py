"""Parquet source/sink (reference S8, ``save-data/save_data_parquet.py:97-121``).

The sink supports partitioned layout — the 100 TB design writes facts
partitioned by month so downstream time-range queries get partition
pruning (see plans.analytics monthly query), and optional bucketing so
repeated joins on the bucket key co-locate without a shuffle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def read_parquet(spark: SparkSession, path: str) -> DataFrame:
    return spark.read.parquet(path)


def write_parquet(
    df: DataFrame,
    path: str,
    *,
    mode: str = "overwrite",
    partition_by: list[str] | None = None,
    max_records_per_file: int | None = None,
) -> None:
    """Write a DataFrame as parquet.

    ``partition_by`` gives directory-level partition pruning;
    ``max_records_per_file`` guards against giant files from skewed
    partitions.
    """
    writer = df.write.mode(mode)
    if max_records_per_file:
        writer = writer.option("maxRecordsPerFile", max_records_per_file)
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    writer.parquet(path)


def overwrite_table(df: DataFrame, name: str, *, bucket_by: tuple[int, str] | None = None) -> None:
    """DROP+CREATE semantics (reference S5/S6, ``load-data/l_*.py:71-119``).

    The reference drops + recreates the Postgres table then inserts row by
    row with ON CONFLICT DO NOTHING; since ET already deduped, that is
    exactly ``mode('overwrite').saveAsTable`` (SURVEY.md §7.4 item 8).
    ``bucket_by=(n, key)`` co-locates future joins on ``key``.
    """
    writer = df.write.mode("overwrite").format("parquet")
    if bucket_by:
        n, key = bucket_by
        writer = writer.bucketBy(n, key).sortBy(key)
    writer.saveAsTable(name)
