"""Sources & sinks: csv / parquet / jdbc readers and the testdata catalog."""

from sales_data_etl_pipeline_spark.sources.tables import load_testdata, register_views
from sales_data_etl_pipeline_spark.sources.csv import read_csv_with_ordinal
from sales_data_etl_pipeline_spark.sources.parquet import (
    read_parquet,
    write_parquet,
)

__all__ = [
    "load_testdata",
    "register_views",
    "read_csv_with_ordinal",
    "read_parquet",
    "write_parquet",
]
