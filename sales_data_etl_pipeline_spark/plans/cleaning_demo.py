"""Cleaning operators exercised on the driver testdata (oracle-checked).

The testdata has no dirt, so each demo injects deterministic dirt
(key-modulus NULLing — same expression in the Spark plan and the DuckDB
oracle) and then cleans it with the corresponding operator from
``operators.cleaning``. This gives every cleaning operator from
SURVEY.md §2.2/2.5 a hash-checked correctness entry.

Each function: ``(spark, sf_dir) -> DataFrame``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from sales_data_etl_pipeline_spark.functions import coerce_numeric
from sales_data_etl_pipeline_spark.operators import cleaning
from sales_data_etl_pipeline_spark.sources.tables import load_testdata


def _lineitem(spark, sf_dir) -> DataFrame:
    return load_testdata(spark, sf_dir, ("lineitem",))["lineitem"]


# --- W1: keep-first dedup ---------------------------------------------------


def clean_dedup_keep_first(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First lineitem of every order, in l_linenumber order (W1)."""
    li = _lineitem(spark, sf_dir).select(
        "l_orderkey", "l_linenumber", "l_partkey", "l_quantity"
    )
    # composite order: l_linenumber alone ties within an order in this
    # dataset; (l_linenumber, l_partkey, l_quantity) is unique per key.
    return cleaning.dedup_keep_first(
        li, ["l_orderkey"], ["l_linenumber", "l_partkey", "l_quantity"]
    )


# --- W3: duplicate-key detection -------------------------------------------


def clean_duplicate_keys(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Orders with more than one lineitem (W3 duplicate-key report)."""
    li = _lineitem(spark, sf_dir)
    return cleaning.duplicate_keys(li, ["l_orderkey"]).orderBy("l_orderkey")


# --- P2: constant fill ------------------------------------------------------


def clean_fill_constant(spark: SparkSession, sf_dir: str) -> DataFrame:
    """NULL-injected o_orderpriority → 'Desconhecida' (P2)."""
    orders = load_testdata(spark, sf_dir, ("orders",))["orders"]
    dirty = orders.select(
        "o_orderkey",
        F.when(F.col("o_orderkey") % 5 == 0, F.lit(None))
        .otherwise(F.col("o_orderpriority"))
        .alias("prioridade"),
    )
    return cleaning.fill_constant(dirty, "prioridade", "Desconhecida")


# --- P3: canonical name rewrite ---------------------------------------------


def clean_canonical_name(spark: SparkSession, sf_dir: str) -> DataFrame:
    """p_name unconditionally rewritten to 'Produto {p_partkey}' (P3)."""
    part = load_testdata(spark, sf_dir, ("part",))["part"]
    return cleaning.canonical_name(
        part.select("p_partkey", "p_name"), "p_name", "Produto", "p_partkey"
    )


# --- P4: missing-name fill --------------------------------------------------


def clean_fill_missing_name(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Blank-injected s_name → 'Funcionário {s_suppkey}' (P4)."""
    sup = load_testdata(spark, sf_dir, ("supplier",))["supplier"]
    dirty = sup.select(
        "s_suppkey",
        F.when(F.col("s_suppkey") % 7 == 0, F.lit("  "))
        .otherwise(F.col("s_name"))
        .alias("nome"),
    )
    return cleaning.fill_missing_name(dirty, "nome", "Funcionário", "s_suppkey")


# --- P5: numeric coercion ---------------------------------------------------


def clean_coerce_numeric(spark: SparkSession, sf_dir: str) -> DataFrame:
    """'N/A'-polluted string column → double with NULL on failure (P5)."""
    cust = load_testdata(spark, sf_dir, ("customer",))["customer"]
    dirty = cust.select(
        "c_custkey",
        F.when(F.col("c_custkey") % 10 == 0, F.lit("N/A"))
        .otherwise(F.col("c_nationkey").cast("string"))
        .alias("raw"),
    )
    return dirty.select("c_custkey", coerce_numeric("raw").alias("valor"))


# --- P6: derived column -----------------------------------------------------


def clean_derived_total(spark: SparkSession, sf_dir: str) -> DataFrame:
    """NULL-injected valor_total re-derived as quantidade × valor_unitario (P6)."""
    li = _lineitem(spark, sf_dir)
    dirty = li.select(
        "l_orderkey",
        "l_linenumber",
        F.col("l_quantity").alias("quantidade"),
        (F.col("l_extendedprice") / F.col("l_quantity")).alias("valor_unitario"),
        F.when(F.col("l_orderkey") % 7 == 0, F.lit(None))
        .otherwise(F.col("l_extendedprice"))
        .alias("valor_total"),
    )
    return cleaning.derive_if_null(
        dirty, "valor_total", F.col("quantidade") * F.col("valor_unitario")
    )


# --- P7: range clamp --------------------------------------------------------


def clean_clamp_range(spark: SparkSession, sf_dir: str) -> DataFrame:
    """c_acctbal clamped to [0, 5000] with adjustment flag (P7)."""
    cust = load_testdata(spark, sf_dir, ("customer",))["customer"]
    return cleaning.clamp_range(
        cust.select("c_custkey", "c_acctbal"),
        "c_acctbal",
        0.0,
        5000.0,
        flag_col="ajustado",
    )


# --- A6/A7/A10: grouped median imputation ----------------------------------


def clean_group_median_impute(spark: SparkSession, sf_dir: str) -> DataFrame:
    """NULL-injected p_retailprice → median per p_type, global fallback,
    with flag + method audit columns (A6/A7/A10)."""
    part = load_testdata(spark, sf_dir, ("part",))["part"]
    dirty = part.select(
        "p_partkey",
        "p_type",
        F.when(F.col("p_partkey") % 10 == 0, F.lit(None))
        .otherwise(F.col("p_retailprice"))
        .alias("preco"),
    )
    return cleaning.fill_group_median(
        dirty,
        "preco",
        "p_type",
        flag_col="preco_imputado",
        method_col="metodo",
        round_digits=2,
    ).select("p_partkey", "p_type", "preco", "preco_imputado", "metodo")


# --- A8/A9/F7: date cascade -------------------------------------------------


def clean_date_cascade(spark: SparkSession, sf_dir: str) -> DataFrame:
    """NULL-injected ship dates → per-supplier median date, global median,
    pinned fallback (A8/A9/F7)."""
    li = _lineitem(spark, sf_dir)
    dirty = li.select(
        "l_orderkey",
        "l_linenumber",
        "l_suppkey",
        F.when(F.col("l_orderkey") % 13 == 0, F.lit(None))
        .otherwise(F.col("l_shipdate").cast("date"))
        .alias("data"),
    )
    return cleaning.fill_date_cascade(
        dirty, "data", "l_suppkey", fallback_date="2000-01-01"
    )


# --- W2: sequential ID backfill ---------------------------------------------


def clean_sequential_ids(spark: SparkSession, sf_dir: str) -> DataFrame:
    """NULL-injected s_suppkey backfilled max+1, max+2… in s_name order (W2)."""
    sup = load_testdata(spark, sf_dir, ("supplier",))["supplier"]
    dirty = sup.select(
        F.when(F.col("s_suppkey") % 9 == 0, F.lit(None))
        .otherwise(F.col("s_suppkey"))
        .alias("id_empregado"),
        F.col("s_name").alias("nome"),
    )
    return cleaning.backfill_sequential_ids(dirty, "id_empregado", "nome")


# --- composed ET chain (the §3.2 shape at testdata scale) -------------------


def clean_et_chain(
    spark: SparkSession, sf_dir: str, *, exact: bool = True
) -> DataFrame:
    """The full vendas-ET composition on testdata: keep-first dedup →
    date cascade → grouped unit-value median via dimension join → total
    derivation. One lazy plan, mirroring ``plans.pipeline.extract_treat_
    vendas`` — the chain the reference runs eagerly stage by stage
    (``et_vendas.py:432-471``).

    ``exact=False`` switches both median imputations to
    ``approx_percentile`` (t-digest): unlike exact ``percentile`` —
    holistic, every value shuffles to its group's reducer — the sketch
    combines map-side, so the aggregate traffic drops from O(rows) to
    O(partitions · sketch) — the 100 TB configuration."""
    t = load_testdata(spark, sf_dir, ("lineitem", "part"))
    li = t["lineitem"].select(
        "l_orderkey",
        "l_linenumber",
        "l_suppkey",
        "l_partkey",
        F.col("l_quantity").alias("quantidade"),
        F.when(F.col("l_orderkey") % 13 == 0, F.lit(None))
        .otherwise(F.col("l_shipdate").cast("date"))
        .alias("data"),
        F.when(F.col("l_orderkey") % 7 == 0, F.lit(None))
        .otherwise(F.col("l_extendedprice") / F.col("l_quantity"))
        .alias("valor_unitario"),
        F.when(F.col("l_orderkey") % 7 == 0, F.lit(None))
        .otherwise(F.col("l_extendedprice"))
        .alias("valor_total"),
    )
    df = cleaning.dedup_keep_first(
        li, ["l_orderkey"], ["l_linenumber", "l_partkey", "quantidade"]
    )
    # lazy pipeline-breaker: every imputation branch downstream (per-group
    # agg, global agg, main branch — 5 consumers total) re-executes its
    # input plan; checkpointing once after the dedup aggregate caps the
    # recomputation at [checkpoint-read + broadcast joins], which is
    # narrow and cheap. A second checkpoint after the date cascade
    # measured strictly slower (2.2s vs 1.5s at sf0.1) — it materializes
    # the wide table again to save only re-running broadcast joins. At
    # cluster scale this is a stage-boundary write to reliable storage.
    df = df.localCheckpoint(eager=False)
    df = cleaning.fill_date_cascade(
        df, "data", "l_suppkey", fallback_date="2000-01-01", exact=exact
    )
    df = df.join(
        F.broadcast(t["part"].select(F.col("p_partkey"), F.col("p_type"))),
        df.l_partkey == F.col("p_partkey"),
        "left",
    ).drop("p_partkey")
    df = cleaning.fill_group_median(
        df, "valor_unitario", "p_type", round_digits=2, exact=exact
    )
    df = df.drop("p_type")
    df = cleaning.derive_if_null(
        df, "valor_total", F.round(F.col("quantidade") * F.col("valor_unitario"), 2)
    )
    return df.select(
        "l_orderkey", "l_linenumber", "l_suppkey", "l_partkey",
        "quantidade", "data", "valor_unitario", "valor_total",
        "data_imputada", "metodo_imputacao",
    )


QUERIES = {
    "clean_et_chain": clean_et_chain,
    "clean_dedup_keep_first": clean_dedup_keep_first,
    "clean_duplicate_keys": clean_duplicate_keys,
    "clean_fill_constant": clean_fill_constant,
    "clean_canonical_name": clean_canonical_name,
    "clean_fill_missing_name": clean_fill_missing_name,
    "clean_coerce_numeric": clean_coerce_numeric,
    "clean_derived_total": clean_derived_total,
    "clean_clamp_range": clean_clamp_range,
    "clean_group_median_impute": clean_group_median_impute,
    "clean_date_cascade": clean_date_cascade,
    "clean_sequential_ids": clean_sequential_ids,
}


ORACLES = {
    "clean_et_chain": """
        WITH dirty AS (
            SELECT l_orderkey, l_linenumber, l_suppkey, l_partkey,
                   l_quantity AS quantidade,
                   CASE WHEN l_orderkey % 13 = 0 THEN NULL
                        ELSE CAST(l_shipdate AS DATE) END AS data,
                   CASE WHEN l_orderkey % 7 = 0 THEN NULL
                        ELSE l_extendedprice / l_quantity END AS valor_unitario,
                   CASE WHEN l_orderkey % 7 = 0 THEN NULL
                        ELSE l_extendedprice END AS valor_total
            FROM lineitem),
        dedup AS (
            SELECT * FROM dirty
            QUALIFY row_number() OVER (PARTITION BY l_orderkey
                ORDER BY l_linenumber, l_partkey, quantidade) = 1),
        dgrp AS (SELECT l_suppkey,
                        median(date_diff('day', DATE '1970-01-01', data)) AS grp_days
                 FROM dedup WHERE data IS NOT NULL GROUP BY 1),
        dglob AS (SELECT median(date_diff('day', DATE '1970-01-01', data)) AS glob_days
                  FROM dedup WHERE data IS NOT NULL),
        dated AS (
            SELECT d.*,
                   CASE WHEN d.data IS NULL THEN
                        COALESCE(DATE '1970-01-01' + CAST(floor(g.grp_days) AS INT),
                                 DATE '1970-01-01' + CAST(floor(gl.glob_days) AS INT),
                                 DATE '2000-01-01')
                   ELSE d.data END AS data_f,
                   (d.data IS NULL) AS data_imputada,
                   CASE WHEN d.data IS NULL THEN
                        CASE WHEN g.grp_days IS NOT NULL THEN 'mediana_empregado'
                             WHEN gl.glob_days IS NOT NULL THEN 'mediana_global'
                             ELSE 'data_atual' END
                   END AS metodo_imputacao
            FROM dedup d LEFT JOIN dgrp g USING (l_suppkey) CROSS JOIN dglob gl),
        joined AS (SELECT dated.*, p.p_type
                   FROM dated LEFT JOIN part p ON dated.l_partkey = p.p_partkey),
        ugrp AS (SELECT p_type, median(valor_unitario) AS grp_med
                 FROM joined GROUP BY 1),
        uglob AS (SELECT median(valor_unitario) AS glob_med FROM joined),
        unitfix AS (
            SELECT j.*,
                   CASE WHEN j.valor_unitario IS NULL
                        THEN ROUND(COALESCE(g.grp_med, gl.glob_med), 2)
                        ELSE j.valor_unitario END AS vu_f
            FROM joined j LEFT JOIN ugrp g USING (p_type) CROSS JOIN uglob gl)
        SELECT l_orderkey, l_linenumber, l_suppkey, l_partkey, quantidade,
               data_f AS data, vu_f AS valor_unitario,
               CASE WHEN valor_total IS NULL THEN ROUND(quantidade * vu_f, 2)
                    ELSE valor_total END AS valor_total,
               data_imputada, metodo_imputacao
        FROM unitfix
    """,
    "clean_dedup_keep_first": """
        SELECT l_orderkey, l_linenumber, l_partkey, l_quantity
        FROM lineitem
        QUALIFY row_number() OVER (
            PARTITION BY l_orderkey
            ORDER BY l_linenumber, l_partkey, l_quantity) = 1
    """,
    "clean_duplicate_keys": """
        SELECT l_orderkey, COUNT(*) AS n_occurrences
        FROM lineitem GROUP BY l_orderkey HAVING COUNT(*) > 1
        ORDER BY l_orderkey
    """,
    "clean_fill_constant": """
        SELECT o_orderkey,
               COALESCE(CASE WHEN o_orderkey % 5 = 0 THEN NULL ELSE o_orderpriority END,
                        'Desconhecida') AS prioridade
        FROM orders
    """,
    "clean_canonical_name": """
        SELECT p_partkey, 'Produto ' || CAST(p_partkey AS VARCHAR) AS p_name
        FROM part
    """,
    "clean_fill_missing_name": """
        SELECT s_suppkey,
               CASE WHEN s_suppkey % 7 = 0
                    THEN 'Funcionário ' || CAST(s_suppkey AS VARCHAR)
                    ELSE s_name END AS nome
        FROM supplier
    """,
    "clean_coerce_numeric": """
        SELECT c_custkey,
               TRY_CAST(CASE WHEN c_custkey % 10 = 0 THEN 'N/A'
                             ELSE CAST(c_nationkey AS VARCHAR) END AS DOUBLE) AS valor
        FROM customer
    """,
    "clean_derived_total": """
        SELECT l_orderkey, l_linenumber,
               l_quantity AS quantidade,
               l_extendedprice / l_quantity AS valor_unitario,
               CASE WHEN l_orderkey % 7 = 0
                    THEN l_quantity * (l_extendedprice / l_quantity)
                    ELSE l_extendedprice END AS valor_total
        FROM lineitem
    """,
    "clean_clamp_range": """
        SELECT c_custkey,
               GREATEST(LEAST(c_acctbal, 5000.0), 0.0) AS c_acctbal,
               (c_acctbal < 0.0 OR c_acctbal > 5000.0) AS ajustado
        FROM customer
    """,
    "clean_group_median_impute": """
        WITH dirty AS (
            SELECT p_partkey, p_type,
                   CASE WHEN p_partkey % 10 = 0 THEN NULL ELSE p_retailprice END AS preco
            FROM part
        ),
        grp AS (SELECT p_type, median(preco) AS grp_med FROM dirty GROUP BY p_type),
        globl AS (SELECT median(preco) AS glob_med FROM dirty)
        SELECT d.p_partkey, d.p_type,
               CASE WHEN d.preco IS NULL
                    THEN ROUND(COALESCE(g.grp_med, gl.glob_med), 2)
                    ELSE d.preco END AS preco,
               (d.preco IS NULL AND COALESCE(g.grp_med, gl.glob_med) IS NOT NULL)
                   AS preco_imputado,
               CASE WHEN d.preco IS NULL THEN
                    CASE WHEN g.grp_med IS NOT NULL THEN 'mediana_grupo'
                         WHEN gl.glob_med IS NOT NULL THEN 'mediana_global' END
               END AS metodo
        FROM dirty d LEFT JOIN grp g USING (p_type) CROSS JOIN globl gl
    """,
    "clean_date_cascade": """
        WITH dirty AS (
            SELECT l_orderkey, l_linenumber, l_suppkey,
                   CASE WHEN l_orderkey % 13 = 0 THEN NULL
                        ELSE CAST(l_shipdate AS DATE) END AS data
            FROM lineitem
        ),
        grp AS (
            SELECT l_suppkey,
                   median(date_diff('day', DATE '1970-01-01', data)) AS grp_days
            FROM dirty WHERE data IS NOT NULL GROUP BY l_suppkey
        ),
        globl AS (
            SELECT median(date_diff('day', DATE '1970-01-01', data)) AS glob_days
            FROM dirty WHERE data IS NOT NULL
        )
        SELECT d.l_orderkey, d.l_linenumber, d.l_suppkey,
               CASE WHEN d.data IS NULL THEN
                    COALESCE(DATE '1970-01-01' + CAST(floor(g.grp_days) AS INT),
                             DATE '1970-01-01' + CAST(floor(gl.glob_days) AS INT),
                             DATE '2000-01-01')
               ELSE d.data END AS data,
               (d.data IS NULL) AS data_imputada,
               CASE WHEN d.data IS NULL THEN
                    CASE WHEN g.grp_days IS NOT NULL THEN 'mediana_empregado'
                         WHEN gl.glob_days IS NOT NULL THEN 'mediana_global'
                         ELSE 'data_atual' END
               END AS metodo_imputacao
        FROM dirty d LEFT JOIN grp g USING (l_suppkey) CROSS JOIN globl gl
    """,
    "clean_sequential_ids": """
        WITH dirty AS (
            SELECT CASE WHEN s_suppkey % 9 = 0 THEN NULL ELSE s_suppkey END
                       AS id_empregado,
                   s_name AS nome
            FROM supplier
        ),
        mx AS (SELECT COALESCE(MAX(id_empregado), 0) AS m FROM dirty)
        SELECT id_empregado, nome FROM dirty WHERE id_empregado IS NOT NULL
        UNION ALL
        SELECT mx.m + row_number() OVER (ORDER BY nome) AS id_empregado, nome
        FROM dirty, mx WHERE id_empregado IS NULL
    """,
}
