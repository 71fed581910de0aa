"""JSONL (newline-delimited JSON) source + sink.

JSONL is the interchange lingua franca of LLM training corpora (one
document object per line, splittable, append-friendly), so the engine
treats it as a first-class format next to parquet. Counterpart of the
reference's file-based loads (``load-data/l_*.py:71-125``) for the
corpus layer.

Scale conventions:

- **Schema-on-read is explicit.** ``read_jsonl`` requires a schema —
  Spark's JSON inference runs a full extra pass over the data and can
  flip types between runs (int vs bigint, missing-field nullability);
  at 100 TB that is both a second scan and a correctness hazard.
- **Corrupt-record quarantine, not job failure.** PERMISSIVE mode with
  a named ``_corrupt_record`` column: a handful of truncated lines in
  a multi-TB crawl drop into the quarantine column for audit instead
  of killing the job (``mode="FAILFAST"`` available for strict loads).
- Writes go through the same ``maxRecordsPerFile`` discipline as the
  parquet sink so downstream readers get bounded, parallel splits.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T

CORRUPT_COL = "_corrupt_record"


def write_jsonl(
    df: DataFrame,
    path: str,
    *,
    partition_by: list[str] | None = None,
    max_records_per_file: int | None = None,
    compression: str | None = None,
) -> None:
    """Write one JSON object per line (spark distributed text write)."""
    w = df.write.mode("overwrite")
    if partition_by:
        w = w.partitionBy(*partition_by)
    if max_records_per_file:
        w = w.option("maxRecordsPerFile", max_records_per_file)
    if compression:
        w = w.option("compression", compression)
    w.json(path)


def read_jsonl(
    spark: SparkSession,
    path: str,
    schema: T.StructType,
    *,
    mode: str = "PERMISSIVE",
) -> DataFrame:
    """Read JSONL with an explicit schema (no inference pass).

    In PERMISSIVE mode unparseable lines land in ``_corrupt_record``
    (added to the schema here) with every data column NULL — callers
    filter/quarantine on it explicitly. Caveat (Spark contract): a
    query whose referenced columns are ONLY the corrupt column is
    rejected on the raw scan — ``.cache()`` the frame first for
    quarantine-only audits.
    """
    full = schema
    if mode == "PERMISSIVE" and CORRUPT_COL not in schema.fieldNames():
        full = T.StructType(
            [*schema.fields, T.StructField(CORRUPT_COL, T.StringType(), True)]
        )
    return (
        spark.read.schema(full)
        .option("mode", mode)
        .option("columnNameOfCorruptRecord", CORRUPT_COL)
        .json(path)
    )
