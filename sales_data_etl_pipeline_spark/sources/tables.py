"""Testdata catalog: load the driver's parquet star schema.

Equivalent of the reference's RDBMS scans (S3/S4, reference
``save-data/save_data_parquet.py:67-94``, ``extract-transform-data/et_vendas.py:55-78``)
— here the "catalog" is a directory of parquet files registered as temp
views so both the DataFrame API and ``spark.sql`` can reach them.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from sales_data_etl_pipeline_spark.schemas import TESTDATA_TABLES

DEFAULT_SF_DIR = "/root/testdata/sf0.001"


def load_testdata(
    spark: SparkSession,
    sf_dir: str = DEFAULT_SF_DIR,
    tables: tuple[str, ...] = TESTDATA_TABLES,
) -> dict[str, DataFrame]:
    """Load each testdata table as a lazy parquet scan.

    Parquet scans get predicate pushdown + column pruning from Catalyst
    for free; nothing is materialized here.
    """
    # Engine convention: timestamp semantics are UTC everywhere. Pinning at
    # the catalog entry point makes date_format/month-bucketing results
    # independent of whoever built the session (driver, tests, bench).
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    out: dict[str, DataFrame] = {}
    for name in tables:
        path = os.path.join(sf_dir, f"{name}.parquet")
        if not os.path.exists(path):
            continue
        if name == "events":
            # events.ts has shipped in three physical formats across driver
            # versions — TIMESTAMP(NANOS) (rejected by Spark's reader unless
            # nanosAsLong), timestamp[us] (read as TIMESTAMP_NTZ), and plain
            # TIMESTAMP. Normalize ALL of them to one canonical TIMESTAMP
            # under the UTC session zone pinned above, so downstream
            # epoch arithmetic / unix_millis / watermarks see one type.
            spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
            df = spark.read.parquet(path)
            if dict(df.dtypes).get("ts") == "bigint":  # legacy ns-as-long
                df = df.withColumn(
                    "ts", F.timestamp_micros(F.expr("ts div 1000"))
                )
        else:
            df = spark.read.parquet(path)
        # Same insurance for EVERY table and column: any TIMESTAMP_NTZ
        # the driver ships becomes canonical TIMESTAMP at the catalog
        # edge (cast(ntz AS timestamp) pins wall-clock to the UTC zone
        # above; no-op when the format shifts back to plain TIMESTAMP).
        for c, t in df.dtypes:
            if t == "timestamp_ntz":
                df = df.withColumn(c, F.col(c).cast("timestamp"))
        out[name] = df
    return out


def register_views(
    spark: SparkSession, sf_dir: str = DEFAULT_SF_DIR
) -> dict[str, DataFrame]:
    """Register every testdata table as a temp view (SQL entry point)."""
    dfs = load_testdata(spark, sf_dir)
    for name, df in dfs.items():
        df.createOrReplaceTempView(name)
    return dfs
