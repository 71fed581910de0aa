"""sales_data_etl_pipeline_spark — a PySpark-native analytics engine.

A brand-new, Spark-first engine with the query and data-processing
capabilities of the reference ETL pipeline (``j-90/sales-data-etl-pipeline``,
a pandas + PostgreSQL sales-star-schema pipeline), re-expressed as lazy
DataFrame / Spark SQL plans optimized by Catalyst, plus large-scale
training-data-pipeline extensions (dedup, similarity search, text
analysis, multimodal plumbing, structured streaming).

Layout
------
- ``session``    : tuned SparkSession factory (AQE, shuffle partitions, UTC)
- ``schemas``    : explicit StructTypes for the sales star schema + testdata
- ``sources``    : csv / parquet / jdbc readers & writers, testdata catalog
- ``operators``  : cleaning (dedup/imputation/clamp), dedup (minhash/simhash),
                   similarity (ANN), text analysis, multimodal plumbing
- ``functions``  : scalar column helpers shared across operators
- ``plans``      : the analytics query layer (reference's 5 queries + TPC-H-ish
                   forms over the driver testdata) and the end-to-end pipeline
- ``streaming``  : Structured Streaming surface over the events table
"""

__version__ = "0.1.0"
