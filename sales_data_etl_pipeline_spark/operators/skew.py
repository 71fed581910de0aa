"""Skew-handling utilities: salted aggregation and salted broadcast-join.

AQE's skew-join splitting (enabled in ``session.py``) handles most skew
at runtime; these operators are for the cases AQE can't fix:

- **Salted two-stage aggregation**: a groupBy where one key holds a
  large share of all rows puts that key's whole partition on one task.
  Salting splits each key into ``n_salts`` sub-keys (stage 1 aggregates
  (key, salt) — parallel), then merges sub-aggregates (stage 2 — tiny).
  Works for any algebraic aggregate (sum/count/min/max; avg via
  sum+count).
- **Salted broadcast-replicated join**: when the SMALL side is broadcast
  the skew problem disappears; when both sides are large and one key is
  hot, replicate the non-skewed side ``n_salts`` times with explicit
  salt values and salt the skewed side randomly — every hot-key row
  lands on a different partition.

At 100 TB these are the difference between a 10-minute stage and one
straggler task running for hours.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def salted_sum(
    df: DataFrame,
    keys: list[str],
    value_col: str,
    *,
    n_salts: int = 16,
    out_col: str | None = None,
) -> DataFrame:
    """Two-stage salted SUM grouped by ``keys``.

    Stage 1 shuffles on (keys, salt) — a hot key spreads over
    ``n_salts`` tasks; stage 2 shuffles |keys|·n_salts pre-aggregated
    rows. Result is identical to a plain groupBy-sum.
    """
    out_col = out_col or f"sum_{value_col}"
    salted = df.withColumn(
        "_salt", (F.rand(seed=42) * n_salts).cast("int")
    )
    partial = salted.groupBy(*keys, "_salt").agg(
        F.sum(value_col).alias("_partial")
    )
    return partial.groupBy(*keys).agg(F.sum("_partial").alias(out_col))


def salted_count(
    df: DataFrame, keys: list[str], *, n_salts: int = 16, out_col: str = "n"
) -> DataFrame:
    """Two-stage salted COUNT(*) grouped by ``keys``."""
    salted = df.withColumn("_salt", (F.rand(seed=42) * n_salts).cast("int"))
    partial = salted.groupBy(*keys, "_salt").agg(F.count(F.lit(1)).alias("_partial"))
    return partial.groupBy(*keys).agg(F.sum("_partial").alias(out_col))


def salted_count_sum(
    df: DataFrame,
    keys: list[str],
    value_col: str,
    *,
    n_salts: int = 16,
    count_col: str = "n",
    sum_col: str | None = None,
) -> DataFrame:
    """Two-stage salted COUNT(*) + SUM in ONE pass grouped by ``keys``.

    One salted partial and one final aggregate carry BOTH measures —
    half the shuffles of running :func:`salted_count` and
    :func:`salted_sum` separately, and crucially NO join between them:
    an equi-join on the group key would silently DROP NULL-key groups
    (SQL join semantics), where a plain GROUP BY keeps NULL as a group.
    Result is identical to ``groupBy(keys).agg(count(*), sum(value))``
    including the NULL-key group.
    """
    sum_col = sum_col or f"sum_{value_col}"
    salted = df.withColumn("_salt", (F.rand(seed=42) * n_salts).cast("int"))
    partial = salted.groupBy(*keys, "_salt").agg(
        F.count(F.lit(1)).alias("_pn"), F.sum(value_col).alias("_ps")
    )
    return partial.groupBy(*keys).agg(
        F.sum("_pn").alias(count_col), F.sum("_ps").alias(sum_col)
    )


def salted_join(
    skewed: DataFrame,
    other: DataFrame,
    on: str,
    *,
    n_salts: int = 16,
    how: str = "inner",
) -> DataFrame:
    """Join a skewed fact side against ``other`` by replicating ``other``
    across ``n_salts`` salt values.

    The skewed side gets a random salt per row; ``other`` is exploded
    ×n_salts so every (key, salt) bucket finds its match. Row-multiplicity
    semantics are identical to a plain join for ``inner``/``left``/
    ``left_semi``/``left_anti`` ONLY — right/full outer would surface
    each unmatched replica of ``other`` as n_salts null-extended rows,
    so those modes are rejected (salt the other side instead).
    """
    allowed = {"inner", "left", "left_outer", "leftouter", "left_semi",
               "leftsemi", "left_anti", "leftanti", "semi", "anti", "cross"}
    if how.lower() not in allowed:
        raise ValueError(
            f"salted_join(how={how!r}): only inner/left-flavored joins keep "
            "plain-join multiplicity; unmatched rows of the replicated side "
            "would appear n_salts times under right/full outer."
        )
    skewed_s = skewed.withColumn(
        "_salt", (F.rand(seed=42) * n_salts).cast("int")
    )
    other_r = other.withColumn(
        "_salt", F.explode(F.sequence(F.lit(0), F.lit(n_salts - 1)))
    )
    out = skewed_s.join(other_r, [on, "_salt"], how)
    return out.drop("_salt")


def top_frequency_keys(
    df: DataFrame, key: str, *, top: int = 10
) -> DataFrame:
    """Skew diagnosis: the ``top`` hottest key values and their share.

    Run this before choosing n_salts; a key holding >1/partitions of all
    rows is a straggler in any keyed shuffle.
    """
    total = df.count()
    return (
        df.groupBy(key)
        .agg(F.count(F.lit(1)).alias("n"))
        .withColumn("share", F.round(F.col("n") / F.lit(total), 4))
        .orderBy(F.desc("n"))
        .limit(top)
    )
