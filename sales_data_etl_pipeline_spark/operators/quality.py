"""Data-quality expectation checks (dbt-test / Great-Expectations
shape): declarative rules evaluated in ONE pass over the table,
returning one row per rule with its violation count.

Extends the reference's load-time schema validation
(`/root/reference/load-data/l_vendas.py:55-68` checks only column
presence) to value-level assertions. Two rule kinds:

- predicate rules: a boolean SQL expression that must hold per row
  (violations = rows where it is false OR null — SQL three-valued
  logic would otherwise let null-yielding rows pass silently);
- uniqueness rules: a key tuple that must be unique (violations =
  rows beyond the first per duplicated key).

Predicate rules all fuse into a single aggregate projection (one scan,
map-side combined, no shuffle beyond the final 1-row reduce);
uniqueness needs its own groupBy per key set — the same shuffle an
explicit dedup would pay.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def check(
    df: DataFrame,
    predicates: dict[str, str],
    unique: dict[str, list[str]] | None = None,
) -> DataFrame:
    """Evaluate ``predicates`` (rule name → boolean SQL that must hold)
    and ``unique`` (rule name → key columns) against ``df``; returns
    (rule, n_violations) ordered by rule name."""
    aggs = [
        F.sum(
            F.when(F.expr(pred), F.lit(0)).otherwise(F.lit(1))
        ).alias(name)
        for name, pred in predicates.items()
    ]
    pred_row = df.agg(*aggs)
    names = list(predicates)
    stack = ", ".join(f"'{n}', {n}" for n in names)
    out = pred_row.selectExpr(
        f"stack({len(names)}, {stack}) AS (rule, n_violations)"
    )
    for name, keys in (unique or {}).items():
        dup = (
            df.groupBy(*keys)
            .agg((F.count(F.lit(1)) - 1).alias("_extra"))
            .agg(F.coalesce(F.sum("_extra"), F.lit(0)).alias("n_violations"))
            .select(F.lit(name).alias("rule"), "n_violations")
        )
        out = out.unionByName(dup)
    return out.orderBy("rule")


def check_sql(
    rel: str,
    predicates: dict[str, str],
    unique: dict[str, list[str]] | None = None,
) -> str:
    """DuckDB oracle twin of :func:`check`."""
    parts = [
        f"SELECT '{name}' AS rule,"
        f" CAST(SUM(CASE WHEN ({pred}) THEN 0 ELSE 1 END) AS BIGINT)"
        f" AS n_violations FROM {rel}"
        for name, pred in predicates.items()
    ]
    for name, keys in (unique or {}).items():
        key_list = ", ".join(keys)
        parts.append(
            f"SELECT '{name}' AS rule,"
            f" CAST(COALESCE(SUM(_extra), 0) AS BIGINT) AS n_violations"
            f" FROM (SELECT COUNT(*) - 1 AS _extra FROM {rel}"
            f" GROUP BY {key_list})"
        )
    return " UNION ALL ".join(parts) + " ORDER BY rule"
