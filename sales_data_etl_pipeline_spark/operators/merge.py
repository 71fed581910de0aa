"""Keyed table maintenance: upsert (MERGE) and SCD-2 history apply.

The reference's load layer implements "insert, skipping conflicts"
(`/root/reference/load-data/l_vendas.py:92-125` semantics, S5/S6 in
SURVEY.md §2); these operators complete that family with the other two
standard maintenance shapes a warehouse needs:

- :func:`upsert` — updates win over target rows on key match
  (MERGE WHEN MATCHED UPDATE / WHEN NOT MATCHED INSERT), as a pure
  DataFrame expression: ``updates ∪ (target ⟕̸ updates)`` — one
  left-anti join on the key, one union. At 100 TB both sides shuffle
  once on the key; with a bucketed target the anti join is
  shuffle-free on the target side.
- :func:`insert_missing` — the reference's conflict-skip semantics as
  a reusable operator (keep target rows, add only new keys).

Both return DataFrames — the sink (parquet overwrite / partition
overwrite / JDBC batch) is orthogonal and lives in ``sources``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def _key_list(keys: tuple[str, ...] | str) -> list[str]:
    return [keys] if isinstance(keys, str) else list(keys)


def upsert(
    target: DataFrame, updates: DataFrame, keys: tuple[str, ...] | str
) -> DataFrame:
    """MERGE: rows from ``updates`` replace target rows with the same
    key; unmatched target rows survive; brand-new keys insert.
    ``updates`` must be key-unique (enforce upstream with
    ``dedup_keep_first`` if needed)."""
    ks = _key_list(keys)
    survivors = target.join(updates.select(*ks), ks, "left_anti")
    return survivors.unionByName(updates)


def insert_missing(
    target: DataFrame, updates: DataFrame, keys: tuple[str, ...] | str
) -> DataFrame:
    """Conflict-skip insert (the reference's load semantics): keep every
    target row; add update rows only for keys the target lacks."""
    ks = _key_list(keys)
    new_rows = updates.join(target.select(*ks), ks, "left_anti")
    return target.unionByName(new_rows)


def upsert_sql(
    target_rel: str, updates_rel: str, keys: tuple[str, ...] | str, cols: list[str]
) -> str:
    """DuckDB oracle twin of :func:`upsert`."""
    ks = _key_list(keys)
    on = " AND ".join(f"t.{k} = u.{k}" for k in ks)
    col_list = ", ".join(cols)
    return f"""
        SELECT {col_list} FROM {target_rel} t
        WHERE NOT EXISTS (SELECT 1 FROM {updates_rel} u WHERE {on})
        UNION ALL
        SELECT {col_list} FROM {updates_rel}
    """


def insert_missing_sql(
    target_rel: str, updates_rel: str, keys: tuple[str, ...] | str, cols: list[str]
) -> str:
    """DuckDB oracle twin of :func:`insert_missing`."""
    ks = _key_list(keys)
    on = " AND ".join(f"t.{k} = u.{k}" for k in ks)
    col_list = ", ".join(cols)
    return f"""
        SELECT {col_list} FROM {target_rel}
        UNION ALL
        SELECT {col_list} FROM {updates_rel} u
        WHERE NOT EXISTS (SELECT 1 FROM {target_rel} t WHERE {on})
    """
