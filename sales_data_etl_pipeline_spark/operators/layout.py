"""Data-layout optimization: Z-order (Morton) clustering for scan skipping.

The write-side half of predicate pushdown: parquet row-group and file
pruning only pays off when each file's min/max envelope is TIGHT on the
filter columns. Sorting on one column makes its envelopes disjoint but
leaves the second column's envelope full-width in every file; Z-order
interleaves the bits of both columns so each file covers a small
rectangle in (x, y) space and point/range filters on EITHER column
prune most files (Morton 1966; the technique behind Delta/Iceberg
``OPTIMIZE ZORDER BY``).

Engine shape: compute the Morton code as pure integer bit arithmetic
(JVM codegen, no UDF), then range-partition on it — at scale the real
writer is ``repartitionByRange(z).sortWithinPartitions(z)`` followed by
a per-partition file write; the gate surface uses the div-based
:func:`~sales_data_etl_pipeline_spark.operators.rank.quantile_bucket`
(same total order, engine-portable file boundaries) and emits per-file
min/max envelopes so the skipping quality is itself the checked result.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from sales_data_etl_pipeline_spark.operators.rank import quantile_bucket


def zorder_expr(x: str, y: str, *, bits: int = 16, dialect: str = "spark") -> str:
    """The 2-D Morton interleave as a SQL expression string — bit ``i``
    of ``x`` lands at position ``2i``, bit ``i`` of ``y`` at ``2i+1``.

    One generator, two dialects (Spark ``shiftleft/shiftright``
    functions, DuckDB ``<<``/``>>`` operators) so the gate's oracle
    runs the byte-same arithmetic. Inputs are masked to the low
    ``bits`` first (`% 2^bits` — callers pass non-negative keys);
    2·bits ≤ 62 keeps every term inside int64.
    """
    if not 1 <= bits <= 31:
        raise ValueError(f"bits must be in [1, 31], got {bits}")
    mod = 1 << bits
    terms = []
    for i in range(bits):
        if dialect == "spark":
            terms.append(
                f"shiftleft(shiftright({x} % {mod}, {i}) & 1, {2 * i})"
            )
            terms.append(
                f"shiftleft(shiftright({y} % {mod}, {i}) & 1, {2 * i + 1})"
            )
        else:
            # full parens per term: Postgres/DuckDB precedence binds
            # `+` TIGHTER than `<<`, so an unwrapped `a << 2 + b`
            # parses as `a << (2 + b)`
            terms.append(f"(((({x} % {mod}) >> {i}) & 1) << {2 * i})")
            terms.append(f"(((({y} % {mod}) >> {i}) & 1) << {2 * i + 1})")
    return "(" + " + ".join(terms) + ")"


def zorder_file_stats(
    df: DataFrame,
    x_col: str,
    y_col: str,
    tiebreak: list[str],
    *,
    n_files: int = 16,
    bits: int = 16,
) -> DataFrame:
    """Assign rows to ``n_files`` Z-ordered files and emit each file's
    min/max envelope on both layout columns — the min/max stats a
    parquet footer would carry, i.e. the measurable skipping quality.

    Total order = (morton, x, y, *tiebreak) — the tiebreak columns must
    make it a deterministic total order (engine-portable file
    boundaries; ties crossing a file boundary would otherwise make the
    envelopes run-dependent). Assignment is the range-partitioned
    div-NTILE of :func:`quantile_bucket` — no single-partition window
    stage; at 100 TB the same order feeds ``repartitionByRange``
    directly and n_files becomes files-per-partition.
    """
    z = df.withColumn(
        "_z", F.expr(zorder_expr(x_col, y_col, bits=bits)).cast("long")
    )
    order = [F.col("_z"), F.col(x_col), F.col(y_col)] + [
        F.col(c) for c in tiebreak
    ]
    assigned = quantile_bucket(z, order, n_buckets=n_files, bucket_col="file_id")
    return (
        assigned.groupBy("file_id")
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.min(x_col).alias(f"min_{x_col}"),
            F.max(x_col).alias(f"max_{x_col}"),
            F.min(y_col).alias(f"min_{y_col}"),
            F.max(y_col).alias(f"max_{y_col}"),
            F.min("_z").alias("min_z"),
            F.max("_z").alias("max_z"),
        )
        .orderBy("file_id")
    )
