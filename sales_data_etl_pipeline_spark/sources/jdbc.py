"""JDBC source/sink (reference S3/S4/S5/S6 — the PostgreSQL layer).

The reference round-trips every table through PostgreSQL (row-at-a-time
INSERTs, ``load-data/l_*.py:89-119``). The Spark equivalents are bulk
``spark.read/write.jdbc``; no JDBC driver jar ships in this container,
so calls raise a clear error if the driver is missing — the API surface
and plan shapes are what the engine guarantees.

Scale notes: reads parallelize via ``partitionColumn/lowerBound/
upperBound/numPartitions`` (one executor connection per partition);
writes batch via ``batchsize``. The reference's INSERT … ON CONFLICT DO
NOTHING after a fresh DROP+CREATE is equivalent to dedup-then-overwrite
(SURVEY.md §7.4 item 8) — expressed here as mode='overwrite'.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def read_jdbc(
    spark: SparkSession,
    url: str,
    table: str,
    *,
    partition_column: str | None = None,
    lower_bound: int | None = None,
    upper_bound: int | None = None,
    num_partitions: int | None = None,
    properties: dict[str, str] | None = None,
) -> DataFrame:
    """Parallel JDBC scan. Without partitioning options the read is a
    single connection (fine for dimension tables only)."""
    reader = spark.read.format("jdbc").option("url", url).option("dbtable", table)
    for k, v in (properties or {}).items():
        reader = reader.option(k, v)
    if partition_column is not None:
        reader = (
            reader.option("partitionColumn", partition_column)
            .option("lowerBound", str(lower_bound))
            .option("upperBound", str(upper_bound))
            .option("numPartitions", str(num_partitions or 8))
        )
    return reader.load()


def write_jdbc(
    df: DataFrame,
    url: str,
    table: str,
    *,
    mode: str = "overwrite",
    batch_size: int = 10_000,
    properties: dict[str, str] | None = None,
) -> None:
    """Bulk JDBC write (the reference's per-row INSERT loop, batched).

    ``mode='overwrite'`` reproduces the reference's DROP+CREATE+INSERT;
    dedup before calling (cleaning.dedup_keep_first) to match its
    ON CONFLICT DO NOTHING semantics.
    """
    writer = (
        df.write.format("jdbc")
        .option("url", url)
        .option("dbtable", table)
        .option("batchsize", str(batch_size))
        .mode(mode)
    )
    for k, v in (properties or {}).items():
        writer = writer.option(k, v)
    writer.save()
