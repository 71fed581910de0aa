"""Temporal join operators Spark lacks natively: as-of join, range join.

Both are composed from built-in DataFrame ops (no Pandas fallback
needed), following the standard distributed formulations:

- **As-of join** (latest right row with ``r.ts <= l.ts`` per key): tag
  and union both sides, ONE window pass ordered by (ts, side) carrying
  the last-seen right row forward, then keep left rows. Cost: a single
  shuffle on the key — the same as a regular join — instead of the
  naive range-join explosion. (pandas ``merge_asof``, backward
  direction, is the single-node equivalent.)
- **Range join** (right rows within ``[l.ts - range, l.ts]`` per key):
  bucketize time into ``range``-sized buckets; each left row joins its
  own and the previous bucket, then filters exactly. Equi-join on
  (key, bucket) keeps Catalyst on hash joins — the unbounded-range
  nested-loop join never appears. At 100 TB both sides shuffle once on
  (key, bucket).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    *,
    on: str,
    left_ts: str = "ts",
    right_ts: str = "ts",
    right_cols: list[str] | None = None,
    suffix: str = "_matched",
) -> DataFrame:
    """Backward as-of join: for each left row, the latest right row of the
    same ``on`` key with ``right.ts <= left.ts`` (ties: right row sorts
    first, so an equal-timestamp right row IS matched).

    Returns all left columns plus ``<right_col><suffix>`` columns
    (NULL when no right row precedes the left row).
    """
    right_cols = right_cols or [c for c in right.columns if c not in (on, right_ts)]
    # the carried right struct (typed NULL on the left side)
    r_struct = F.struct(
        *[F.col(c) for c in right_cols], F.col(right_ts).alias("_rts")
    )
    r_tag = right.select(
        F.col(on).alias("_k"),
        F.col(right_ts).alias("_ts"),
        F.lit(0).alias("_side"),
        F.lit(None).alias("_l"),
        r_struct.alias("_r"),
    )
    l_tag = left.select(
        F.col(on).alias("_k"),
        F.col(left_ts).alias("_ts"),
        F.lit(1).alias("_side"),
        F.struct(*left.columns).alias("_l"),
        F.lit(None).cast(r_tag.schema["_r"].dataType).alias("_r"),
    )
    r_tag = r_tag.withColumn("_l", F.col("_l").cast(l_tag.schema["_l"].dataType))
    unioned = l_tag.unionByName(r_tag.select(*l_tag.columns))
    # right rows (side=0) sort before left rows at equal ts → inclusive <=
    w = (
        Window.partitionBy("_k")
        .orderBy(F.col("_ts").asc(), F.col("_side").asc())
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    carried = unioned.withColumn("_last_r", F.last("_r", ignorenulls=True).over(w))
    out = carried.filter(F.col("_side") == 1).select(
        *[F.col(f"_l.{c}").alias(c) for c in left.columns],
        *[F.col(f"_last_r.{c}").alias(f"{c}{suffix}") for c in right_cols],
    )
    return out


def range_join_count(
    left: DataFrame,
    right: DataFrame,
    *,
    on: str,
    left_ts: str = "ts",
    right_ts: str = "ts",
    range_seconds: int,
    count_col: str = "n_in_range",
    include_equal: bool = False,
) -> DataFrame:
    """Count right rows with ``l.ts - range <= r.ts < l.ts`` per left row
    (strictly before the left timestamp unless ``include_equal``).

    Bucketized equi-join: both sides bucket at ``range_seconds``
    granularity; a left row can only match its own or the previous
    bucket — 2 equi-join probes replace an unbounded theta join.

    Row multiplicity is preserved even for fully-duplicate left rows:
    the count re-groups on a per-row ordinal, not on the left columns
    (two identical left rows each keep their own count instead of
    collapsing into one row with the summed hits).
    """
    bucket = lambda c: F.floor(F.col(c).cast("double") / range_seconds)  # noqa: E731
    r = right.select(
        F.col(on).alias("_k"),
        F.col(right_ts).alias("_rts"),
        bucket(right_ts).alias("_rb"),
    )
    l = (
        left.withColumn("_lrow", F.monotonically_increasing_id())
        .withColumn("_lb", bucket(left_ts))
        .withColumn(
            "_probe", F.explode(F.array(F.col("_lb"), F.col("_lb") - 1))
        )
    )
    cmp_hi = (
        F.col("_rts").cast("double") <= F.col(left_ts).cast("double")
        if include_equal
        else F.col("_rts").cast("double") < F.col(left_ts).cast("double")
    )
    joined = l.join(
        r,
        (F.col(on) == F.col("_k")) & (F.col("_probe") == F.col("_rb")),
        "left",
    ).withColumn(
        "_hit",
        (
            F.col("_rts").isNotNull()
            & cmp_hi
            & (
                F.col("_rts").cast("double")
                >= F.col(left_ts).cast("double") - range_seconds
            )
        ).cast("long"),
    )
    return (
        joined.groupBy("_lrow", *[F.col(c) for c in left.columns])
        .agg(F.sum("_hit").alias(count_col))
        .drop("_lrow")
    )
