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


def scd2_apply(
    current: DataFrame,
    updates: DataFrame,
    keys: tuple[str, ...] | str,
    attrs: list[str],
    *,
    ts_col: str = "ts",
    valid_from: str = "valid_from",
    valid_to: str = "valid_to",
) -> DataFrame:
    """SCD type-2 apply: version a dimension's history under a batch of
    timestamped updates.

    ``current`` carries (keys, attrs, valid_from, valid_to) with open
    versions having ``valid_to IS NULL``; ``updates`` carries
    (keys, attrs, ts). Semantics: per key, order the open version and
    all updates by timestamp; collapse equal-attribute runs to their
    first row (a no-op update never creates a version); each surviving
    version is valid from its timestamp until the next version's
    timestamp (open-ended for the last). Closed history rows pass
    through untouched.

    One shuffle on the key; attribute change detection via an md5
    signature over unit-separator-joined attrs (NULL attrs drop out of
    concat_ws identically in both engines — documented limitation:
    NULL and '' are indistinguishable in the signature). Timestamps
    must be unique per key within a batch for deterministic ordering.
    """
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    ks = _key_list(keys)
    closed = current.filter(F.col(valid_to).isNotNull()).select(
        *ks, *attrs, valid_from, valid_to
    )
    open_cur = current.filter(F.col(valid_to).isNull()).select(
        *ks, *attrs, F.col(valid_from).alias("_ts")
    )
    ups = updates.select(*ks, *attrs, F.col(ts_col).alias("_ts"))
    sig = F.md5(
        F.concat_ws("\x1f", *[F.col(a).cast("string") for a in attrs])
    )
    w = Window.partitionBy(*ks).orderBy("_ts")
    chg = (
        open_cur.unionByName(ups)
        .withColumn("_sig", sig)
        .withColumn("_prev", F.lag("_sig").over(w))
        .filter(F.col("_prev").isNull() | (F.col("_sig") != F.col("_prev")))
    )
    versions = chg.withColumn(valid_to, F.lead("_ts").over(w)).select(
        *ks, *attrs, F.col("_ts").alias(valid_from), valid_to
    )
    return closed.unionByName(versions)


def scd2_apply_sql(
    current_rel: str,
    updates_rel: str,
    keys: tuple[str, ...] | str,
    attrs: list[str],
    *,
    ts_col: str = "ts",
    valid_from: str = "valid_from",
    valid_to: str = "valid_to",
) -> str:
    """DuckDB oracle twin of :func:`scd2_apply`."""
    ks = _key_list(keys)
    key_list = ", ".join(ks)
    attr_list = ", ".join(attrs)
    sig = (
        "md5(concat_ws(chr(31), "
        + ", ".join(f"CAST({a} AS VARCHAR)" for a in attrs)
        + "))"
    )
    return f"""
        WITH open_cur AS (
            SELECT {key_list}, {attr_list}, {valid_from} AS _ts
            FROM {current_rel} WHERE {valid_to} IS NULL),
        ups AS (SELECT {key_list}, {attr_list}, {ts_col} AS _ts
                FROM {updates_rel}),
        allr AS (SELECT * FROM open_cur UNION ALL SELECT * FROM ups),
        sigd AS (SELECT *, {sig} AS _sig FROM allr),
        lagd AS (SELECT *, LAG(_sig) OVER (PARTITION BY {key_list}
                     ORDER BY _ts) AS _prev FROM sigd),
        chg AS (SELECT * FROM lagd WHERE _prev IS NULL OR _sig <> _prev)
        SELECT {key_list}, {attr_list}, {valid_from}, {valid_to}
        FROM {current_rel} WHERE {valid_to} IS NOT NULL
        UNION ALL
        SELECT {key_list}, {attr_list}, _ts AS {valid_from},
               LEAD(_ts) OVER (PARTITION BY {key_list} ORDER BY _ts)
                   AS {valid_to}
        FROM chg
    """


def cdc_apply(
    target: DataFrame,
    changelog: DataFrame,
    keys: tuple[str, ...] | str,
    *,
    op_col: str = "op",
    seq_col: str = "seq",
) -> DataFrame:
    """Apply an ordered CDC changelog (``op`` ∈ I/U/D, ``seq`` strictly
    increasing per key) to a keyed snapshot — the Debezium/binlog replay
    shape. Semantics equal replaying the log in sequence order: the
    highest-seq change per key wins; a final D removes the key, a final
    I/U upserts that change's attributes.

    Computed WITHOUT replay or windows: the winner per key falls out of
    one ``max(struct(seq, …))`` hash aggregation (map-side combinable —
    a key with 10^6 changes costs the same reducer memory as one with
    2), then one anti join drops touched keys from the snapshot and the
    non-delete winners union back in. Two key shuffles total at any
    scale. ``seq`` must be unique per key (binlog positions are).
    """
    from pyspark.sql import functions as F

    ks = _key_list(keys)
    attrs = [c for c in changelog.columns if c not in (*ks, op_col, seq_col)]
    winner = (
        changelog.groupBy(*ks)
        .agg(
            F.max(
                F.struct(
                    F.col(seq_col),
                    F.col(op_col).alias("_op"),
                    *[F.col(a) for a in attrs],
                )
            ).alias("_m")
        )
        .select(
            *ks,
            F.col("_m._op").alias("_op"),
            *[F.col(f"_m.{a}").alias(a) for a in attrs],
        )
    )
    survivors = target.join(winner.select(*ks), ks, "left_anti")
    upserts = winner.filter(F.col("_op") != "D").drop("_op")
    return survivors.unionByName(upserts.select(*survivors.columns))


def cdc_apply_sql(
    target_rel: str,
    changelog_rel: str,
    keys: tuple[str, ...] | str,
    cols: list[str],
    *,
    op_col: str = "op",
    seq_col: str = "seq",
) -> str:
    """DuckDB oracle twin of :func:`cdc_apply` (window formulation)."""
    ks = _key_list(keys)
    key_list = ", ".join(ks)
    on = " AND ".join(f"t.{k} = w.{k}" for k in ks)
    col_list = ", ".join(cols)
    return f"""
        WITH w AS (
            SELECT * FROM (
                SELECT *, ROW_NUMBER() OVER (PARTITION BY {key_list}
                              ORDER BY {seq_col} DESC) AS _rn
                FROM {changelog_rel}
            ) WHERE _rn = 1
        )
        SELECT {col_list} FROM {target_rel} t
        WHERE NOT EXISTS (SELECT 1 FROM w WHERE {on})
        UNION ALL
        SELECT {col_list} FROM w WHERE {op_col} <> 'D'
    """


def snapshot_diff(
    old: DataFrame,
    new: DataFrame,
    keys: tuple[str, ...] | str,
    *,
    compare_cols: list[str] | None = None,
) -> DataFrame:
    """Keyed diff of two table snapshots — the reconciliation complement
    of :func:`cdc_apply`: where cdc_apply REPLAYS a changelog onto a
    snapshot, snapshot_diff DERIVES the changelog between two
    snapshots (migration validation, backfill audits, CDC bootstrap).

    One full outer join on the key — co-partitioned, no window, no
    per-key state; with both snapshots bucketed on the key the shuffle
    disappears entirely. Per key emits change_type ∈ added / removed /
    changed (unchanged keys are NOT emitted — at 100 TB the diff is
    output-bound, not snapshot-bound, after the join) and
    ``changed_cols``: the comma-joined sorted names of compared
    columns whose values differ under NULL-SAFE equality (``<=>`` —
    NULL→value and value→NULL both count as changes; added/removed
    rows carry an empty string).
    """
    from pyspark.sql import functions as F

    ks = _key_list(keys)
    cols = compare_cols or [c for c in old.columns if c not in ks]
    # explicit presence sentinels: a full outer join NULLs the absent
    # side, and testing the DATA columns for null would misread a
    # present row whose compared attributes are all NULL — the lit(True)
    # flag is exact and free
    o = old.select(
        *ks,
        F.lit(True).alias("_o_present"),
        *[F.col(c).alias(f"_o_{c}") for c in cols],
    )
    n = new.select(
        *ks,
        F.lit(True).alias("_n_present"),
        *[F.col(c).alias(f"_n_{c}") for c in cols],
    )
    joined = o.join(n, ks, "full_outer")
    o_present = F.coalesce(F.col("_o_present"), F.lit(False))
    n_present = F.coalesce(F.col("_n_present"), F.lit(False))
    changed_arr = F.array_sort(
        F.filter(
            F.array(
                *[
                    F.when(
                        ~F.col(f"_o_{c}").eqNullSafe(F.col(f"_n_{c}")),
                        F.lit(c),
                    )
                    for c in cols
                ]
            ),
            lambda x: x.isNotNull(),
        )
    )
    return (
        joined.withColumn(
            "change_type",
            F.when(~o_present, F.lit("added"))
            .when(~n_present, F.lit("removed"))
            .otherwise(F.lit("changed")),
        )
        .withColumn(
            "changed_cols",
            F.when(
                F.col("change_type") == "changed",
                F.concat_ws(",", changed_arr),
            ).otherwise(F.lit("")),
        )
        .filter(
            (F.col("change_type") != "changed")
            | (F.col("changed_cols") != "")
        )
        .select(*ks, "change_type", "changed_cols")
    )


def snapshot_changelog(
    old: DataFrame,
    new: DataFrame,
    keys: tuple[str, ...] | str,
    *,
    compare_cols: list[str] | None = None,
) -> DataFrame:
    """Derive an APPLYABLE CDC changelog between two snapshots — the
    exact inverse of :func:`cdc_apply`: ``cdc_apply(old,
    snapshot_changelog(old, new, k), k)`` reconstructs ``new``
    bit-for-bit (property-pinned in tests). Where
    :func:`snapshot_diff` reports WHAT changed (change masks for
    reconciliation), this emits the I/U/D rows WITH the new attribute
    values, ready for a downstream ``cdc_apply`` or a Debezium-shaped
    sink (CDC bootstrap between systems that only exchange
    snapshots).

    Same single full-outer-join shape as snapshot_diff (presence
    sentinels, NULL-safe change test); op = I for added keys, D for
    removed, U for present-both-with-any-column-change; unchanged keys
    emit nothing, so the log is output-bound. ``seq`` is the constant
    1 — a two-snapshot diff has one change per key by construction
    (cdc_apply only needs seq unique PER KEY).
    """
    from pyspark.sql import functions as F

    ks = _key_list(keys)
    cols = compare_cols or [c for c in old.columns if c not in ks]
    o = old.select(
        *ks,
        F.lit(True).alias("_o_present"),
        *[F.col(c).alias(f"_o_{c}") for c in cols],
    )
    n = new.select(
        *ks,
        F.lit(True).alias("_n_present"),
        *[F.col(c).alias(f"_n_{c}") for c in cols],
    )
    joined = o.join(n, ks, "full_outer")
    o_present = F.coalesce(F.col("_o_present"), F.lit(False))
    n_present = F.coalesce(F.col("_n_present"), F.lit(False))
    any_change = None
    for c in cols:
        neq = ~F.col(f"_o_{c}").eqNullSafe(F.col(f"_n_{c}"))
        any_change = neq if any_change is None else (any_change | neq)
    return (
        joined.withColumn(
            "op",
            F.when(~o_present, F.lit("I"))
            .when(~n_present, F.lit("D"))
            .when(any_change, F.lit("U")),
        )
        .filter(F.col("op").isNotNull())
        .select(
            *ks,
            "op",
            F.lit(1).cast("long").alias("seq"),
            *[F.col(f"_n_{c}").alias(c) for c in cols],
        )
    )


def maintain_agg_view(
    view: DataFrame,
    base_old: DataFrame,
    changelog: DataFrame,
    keys: tuple[str, ...] | str,
    *,
    group_col: str = "g",
    value_col: str = "v",
    op_col: str = "op",
) -> DataFrame:
    """Incremental materialized-view maintenance for an additive
    aggregate view ``SELECT g, COUNT(*) AS n_rows, SUM(v) AS sum_v
    GROUP BY g`` — the warehouse feature that keeps a rollup fresh
    from a changelog WITHOUT rescanning the base table. The exactness
    contract (unit- and oracle-pinned): ``maintain_agg_view(view(B),
    B, log) == view(cdc_apply(B, log))``.

    Before-images for U/D come from ONE semi-bounded join of the OLD
    base against the changelog's keys — |changelog| rows of base are
    touched, never the table (this is why the maintainer is cheap: at
    100 TB the base scan is the thing you cannot afford, and count/sum
    views never need it). Deltas: D and U retract the before-image's
    (−1, −v) from its OLD group (updates may move rows across groups);
    I and U add the after-image's (+1, +v) to its NEW group. The view
    merges with the delta via one full-outer group join; groups whose
    row count reaches zero are dropped.

    Requirements: ``value_col`` must be exactly-additive (integers /
    cents — float sums would drift from the recompute), and the
    changelog must hold ≤ 1 change per key (pre-collapse a multi-change
    log with the ``cdc_apply`` winner rule first). MIN/MAX views are
    NOT maintainable this way (retraction needs the full group —
    that's the documented limit of additive IVM, not a missing case).
    """
    from pyspark.sql import functions as F

    ks = _key_list(keys)
    before = base_old.join(
        changelog.select(*ks).distinct(), ks, "semi"
    )
    retract = (
        changelog.filter(F.col(op_col).isin("U", "D"))
        .select(*ks)
        .join(before, ks)
        .select(
            F.col(group_col),
            F.lit(-1).cast("long").alias("_dn"),
            (-F.col(value_col)).alias("_dv"),
        )
    )
    add = changelog.filter(F.col(op_col).isin("I", "U")).select(
        F.col(group_col),
        F.lit(1).cast("long").alias("_dn"),
        F.col(value_col).alias("_dv"),
    )
    delta = (
        retract.unionByName(add)
        .groupBy(group_col)
        .agg(F.sum("_dn").alias("_dn"), F.sum("_dv").alias("_dv"))
    )
    merged = view.join(delta, group_col, "full_outer").select(
        group_col,
        (
            F.coalesce(F.col("n_rows"), F.lit(0))
            + F.coalesce(F.col("_dn"), F.lit(0))
        ).alias("n_rows"),
        (
            F.coalesce(F.col("sum_v"), F.lit(0))
            + F.coalesce(F.col("_dv"), F.lit(0))
        ).alias("sum_v"),
    )
    return merged.filter(F.col("n_rows") > 0)


def maintain_stats_view(
    view: DataFrame,
    base_old: DataFrame,
    changelog: DataFrame,
    keys: tuple[str, ...] | str,
    *,
    group_col: str = "g",
    value_col: str = "v",
    op_col: str = "op",
) -> DataFrame:
    """Incremental maintenance for the MOMENTS view ``(g, n_rows,
    sum_v, sum_sq)`` — the additive triple from which AVG and
    population VARIANCE read without any base rescan::

        avg = sum_v / n_rows
        var = sum_sq / n_rows − (sum_v / n_rows)²

    Same delta/fence mechanics as :func:`maintain_agg_view` (the
    count/sum pair plus the squared sum, which is just as additive);
    same contract: ``maintain_stats_view(view(B), B, log) ==
    view(cdc_apply(B, log))``, integer values so the recompute matches
    bit-for-bit, ≤ 1 change per key. MIN/MAX remain out of scope —
    retraction needs the group's full history, which is the documented
    boundary of additive IVM, not a missing case here.
    """
    from pyspark.sql import functions as F

    ks = _key_list(keys)
    before = base_old.join(changelog.select(*ks).distinct(), ks, "semi")
    retract = (
        changelog.filter(F.col(op_col).isin("U", "D"))
        .select(*ks)
        .join(before, ks)
        .select(
            F.col(group_col),
            F.lit(-1).cast("long").alias("_dn"),
            (-F.col(value_col)).alias("_dv"),
            (-(F.col(value_col) * F.col(value_col))).alias("_dq"),
        )
    )
    add = changelog.filter(F.col(op_col).isin("I", "U")).select(
        F.col(group_col),
        F.lit(1).cast("long").alias("_dn"),
        F.col(value_col).alias("_dv"),
        (F.col(value_col) * F.col(value_col)).alias("_dq"),
    )
    delta = (
        retract.unionByName(add)
        .groupBy(group_col)
        .agg(
            F.sum("_dn").alias("_dn"),
            F.sum("_dv").alias("_dv"),
            F.sum("_dq").alias("_dq"),
        )
    )
    merged = view.join(delta, group_col, "full_outer").select(
        group_col,
        (
            F.coalesce(F.col("n_rows"), F.lit(0))
            + F.coalesce(F.col("_dn"), F.lit(0))
        ).alias("n_rows"),
        (
            F.coalesce(F.col("sum_v"), F.lit(0))
            + F.coalesce(F.col("_dv"), F.lit(0))
        ).alias("sum_v"),
        (
            F.coalesce(F.col("sum_sq"), F.lit(0))
            + F.coalesce(F.col("_dq"), F.lit(0))
        ).alias("sum_sq"),
    )
    return merged.filter(F.col("n_rows") > 0)
