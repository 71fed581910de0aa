"""CSV source with a stable file-order ordinal.

Re-expresses the reference's CSV scan (S1, reference
``extract-transform-data/et_produtos.py:46-63``: ``pd.read_csv(sep=';')``)
as a schema'd Spark CSV read, plus the engine convention SURVEY.md §7.4
item 1 calls for: a ``_row_ordinal`` column capturing file order so that
order-sensitive operators (keep-first dedup W1, sequential ID backfill W2)
are deterministic under distributed reads.

Scale note: file order only exists per file. For a single input file we
zip an ordinal over a single partition (cheap at dimension-table size —
the only place the reference semantics need it); for many-file/100 TB
inputs order-sensitive cleaning should key on an explicit ordering column
instead, which every operator in ``operators.cleaning`` accepts.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

ROW_ORDINAL = "_row_ordinal"


def read_csv(
    spark: SparkSession,
    path: str,
    schema: T.StructType,
    *,
    sep: str = ";",
    header: bool = True,
    encoding: str = "UTF-8",
) -> DataFrame:
    """Plain schema'd CSV scan (no inference — see schemas module)."""
    return (
        spark.read.option("sep", sep)
        .option("header", header)
        .option("encoding", encoding)
        .schema(schema)
        .csv(path)
    )


def read_csv_with_ordinal(
    spark: SparkSession,
    path: str,
    schema: T.StructType,
    *,
    sep: str = ";",
    header: bool = True,
    encoding: str = "UTF-8",
) -> DataFrame:
    """CSV scan + ``_row_ordinal`` = 0-based position in file order.

    Uses a single-partition read so ``monotonically_increasing_id`` is the
    literal file order (the id is monotonic *within* a partition; one
    partition ⇒ global order). Intended for dimension-scale inputs where
    the reference's keep-first semantics must be reproduced exactly.
    """
    df = read_csv(spark, path, schema, sep=sep, header=header, encoding=encoding)
    return df.coalesce(1).withColumn(ROW_ORDINAL, F.monotonically_increasing_id())


def write_csv_rfc(
    df: DataFrame,
    path: str,
    *,
    max_records_per_file: int | None = None,
) -> None:
    """RFC-4180 CSV sink: header, quoted fields, quotes escaped by
    DOUBLING (escape='"') so embedded newlines/quotes/separators round
    trip losslessly — the interchange dialect every warehouse bulk
    loader accepts. Same ``maxRecordsPerFile`` split discipline as the
    parquet/jsonl sinks."""
    w = (
        df.write.mode("overwrite")
        .option("header", True)
        .option("quoteAll", True)
        .option("escape", '"')
    )
    if max_records_per_file:
        w = w.option("maxRecordsPerFile", max_records_per_file)
    w.csv(path)


CORRUPT_COL = "_corrupt_record"


def read_csv_rfc(
    spark: SparkSession,
    path: str,
    schema: T.StructType,
    *,
    corrupt_col: str | None = None,
) -> DataFrame:
    """Read back :func:`write_csv_rfc` output: explicit schema (no
    inference pass — the jsonl source's rule), doubled-quote escapes,
    and ``multiLine`` so quoted embedded newlines stay one record.

    ``corrupt_col`` opts into the jsonl source's quarantine contract:
    PERMISSIVE mode with a named corrupt-record column, so malformed
    rows (bad casts, wrong arity) land in the quarantine column for
    audit instead of killing a multi-TB load.

    ``multiLine`` makes a single file non-splittable (records can span
    line boundaries, so Spark can't chop at arbitrary offsets); the
    sink's ``maxRecordsPerFile`` is what preserves read parallelism at
    scale — many bounded files, one task each.
    """
    reader = (
        spark.read.option("header", True)
        .option("escape", '"')
        .option("multiLine", True)
        # the sink always writes '\n' row separators, so pin lineSep on
        # the read-back: without it the multiLine parser NORMALIZES
        # \r\n → \n inside quoted fields and a carriage return in field
        # content is silently lost (probe-found, one char per \r).
        # Foreign CRLF-delimited files go through read_csv, not here.
        .option("lineSep", "\n")
    )
    if corrupt_col is not None:
        schema = T.StructType(
            [*schema.fields, T.StructField(corrupt_col, T.StringType(), True)]
        )
        reader = reader.option("mode", "PERMISSIVE").option(
            "columnNameOfCorruptRecord", corrupt_col
        )
    return reader.schema(schema).csv(path)
