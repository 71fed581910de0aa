"""XML source + sink (Spark 4 built-in ``xml`` format).

XML remains the interchange format of large archival corpora
(Wikipedia dumps, PubMed, patent filings, ArXiv metadata — all
first-class LLM training sources), so the engine exposes it next to
parquet/JSONL/ORC/CSV. Counterpart of the reference's file-based loads
(``load-data/l_*.py:71-125``) for document-shaped data.

Scale conventions (same discipline as :mod:`.jsonl`):

- **Schema-on-read is explicit.** ``read_xml`` requires a schema —
  XML inference runs a full extra pass and can flip element types
  between runs; at 100 TB that is a second scan and a correctness
  hazard.
- **Whitespace is data.** The reader pins
  ``ignoreSurroundingSpaces=false`` so leading/trailing spaces inside
  element text survive the round trip byte-for-byte (the default
  trims, silently corrupting whitespace-sensitive documents). The
  empty element ``<text></text>`` reads back as ``''`` and a MISSING
  element as NULL — the distinction is preserved, probe-verified.
- **Corrupt-record quarantine, not job failure.** PERMISSIVE mode
  with a named ``_corrupt_record`` column, identical to the JSONL
  contract.
- Writes go through ``maxRecordsPerFile`` so downstream readers get
  bounded, parallel splits; each output file is a standalone
  well-formed document under ``rootTag``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T

CORRUPT_COL = "_corrupt_record"


def write_xml(
    df: DataFrame,
    path: str,
    *,
    row_tag: str = "row",
    root_tag: str = "rows",
    partition_by: list[str] | None = None,
    max_records_per_file: int | None = None,
    compression: str | None = None,
) -> None:
    """Write one XML element per row (spark distributed write)."""
    w = (
        df.write.mode("overwrite")
        .format("xml")
        .option("rowTag", row_tag)
        .option("rootTag", root_tag)
    )
    if partition_by:
        w = w.partitionBy(*partition_by)
    if max_records_per_file:
        w = w.option("maxRecordsPerFile", max_records_per_file)
    if compression:
        w = w.option("compression", compression)
    w.save(path)


def read_xml(
    spark: SparkSession,
    path: str,
    schema: T.StructType,
    *,
    row_tag: str = "row",
    mode: str = "PERMISSIVE",
) -> DataFrame:
    """Read XML with an explicit schema (no inference pass).

    ``ignoreSurroundingSpaces=false`` keeps element text verbatim. In
    PERMISSIVE mode malformed fragments land in ``_corrupt_record``
    (added to the schema here); callers filter/quarantine on it
    explicitly, same contract as :func:`.jsonl.read_jsonl`.
    """
    full = schema
    if mode == "PERMISSIVE" and CORRUPT_COL not in schema.fieldNames():
        full = T.StructType(
            [*schema.fields, T.StructField(CORRUPT_COL, T.StringType(), True)]
        )
    return (
        spark.read.format("xml")
        .schema(full)
        .option("rowTag", row_tag)
        .option("ignoreSurroundingSpaces", "false")
        .option("mode", mode)
        .option("columnNameOfCorruptRecord", CORRUPT_COL)
        .load(path)
    )
