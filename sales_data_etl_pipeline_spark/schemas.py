"""Explicit schemas for every table the engine touches.

Two families:

1. The reference sales star schema (``produtos`` / ``vendas`` /
   ``empregados``) — declared types follow the reference's DDL
   (reference ``load-data/l_produtos.py:80-85``, ``l_vendas.py:80-88``,
   ``l_empregados.py:80-85``), with NUMERIC(10,2) mapped to DoubleType +
   round(2) to match the reference's observed float round-trip
   (SURVEY.md §7.4 item 9).
2. The driver testdata star schema (TPC-H-ish) used for correctness and
   bench runs.

Schemas are explicit everywhere — no ``inferSchema`` in the engine: at
100 TB an inference pass is a full extra scan, and inferred types drift
between files.
"""

from __future__ import annotations

from pyspark.sql import types as T

# ---------------------------------------------------------------------------
# Reference sales star schema
# ---------------------------------------------------------------------------

#: Raw CSV-shaped schemas (everything dirty arrives as strings where blanks
#: are possible; numeric coercion happens in the cleaning layer, matching the
#: reference's pd.to_numeric(errors='coerce') semantics).
PRODUTOS_RAW = T.StructType(
    [
        T.StructField("id_produto", T.LongType(), True),
        T.StructField("nome", T.StringType(), True),
        T.StructField("preco", T.StringType(), True),
        T.StructField("categoria", T.StringType(), True),
    ]
)

VENDAS_RAW = T.StructType(
    [
        T.StructField("id_venda", T.LongType(), True),
        T.StructField("data", T.StringType(), True),  # DD/MM/YYYY in flight
        T.StructField("id_produto", T.LongType(), True),
        T.StructField("id_empregado", T.LongType(), True),
        T.StructField("quantidade", T.LongType(), True),
        T.StructField("valor_unitario", T.StringType(), True),
        T.StructField("valor_total", T.StringType(), True),
    ]
)

EMPREGADOS_RAW = T.StructType(
    [
        T.StructField("id_empregado", T.StringType(), True),  # blank-ID path exists
        T.StructField("nome", T.StringType(), True),
        T.StructField("cargo", T.StringType(), True),
        T.StructField("idade", T.StringType(), True),  # "49.0"-style in CSV
    ]
)

#: Clean (post-ET, pre-sink) schemas — the declared DB types.
PRODUTOS = T.StructType(
    [
        T.StructField("id_produto", T.LongType(), False),
        T.StructField("nome", T.StringType(), False),
        T.StructField("preco", T.DoubleType(), True),
        T.StructField("categoria", T.StringType(), True),
    ]
)

VENDAS = T.StructType(
    [
        T.StructField("id_venda", T.LongType(), False),
        # Declared NOT NULL in the reference DDL (l_vendas.py:82), but the
        # analytics layer guards with IS NOT NULL (A5) — keep nullable at
        # the query surface; the cleaning layer guarantees non-null post-ET.
        T.StructField("data", T.DateType(), True),
        T.StructField("id_produto", T.LongType(), False),
        T.StructField("id_empregado", T.LongType(), True),
        T.StructField("quantidade", T.LongType(), False),
        T.StructField("valor_unitario", T.DoubleType(), True),
        T.StructField("valor_total", T.DoubleType(), True),
    ]
)

EMPREGADOS = T.StructType(
    [
        T.StructField("id_empregado", T.LongType(), False),
        T.StructField("nome", T.StringType(), False),
        T.StructField("cargo", T.StringType(), True),
        T.StructField("idade", T.LongType(), True),
    ]
)

#: Audit columns added by the cleaning layer and dropped at sinks
#: (reference keeps these through ET and drops them at load:
#: ``et_vendas.py:217-220``, ``l_vendas.py:109-120``).
AUDIT_COLUMNS = (
    "data_imputada",
    "metodo_imputacao",
    "idade_imputada",
    "metodo_imputacao_idade",
    "idade_ajustada",
)

# ---------------------------------------------------------------------------
# Driver testdata (TPC-H-ish) star schema
# ---------------------------------------------------------------------------

TESTDATA_TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

#: Dimension tables small enough to broadcast at any scale factor the
#: engine targets (region/nation are bounded; part/supplier/customer grow
#: with SF but stay ≪ fact tables — broadcast decisions for those are left
#: to Catalyst's autoBroadcastJoinThreshold + AQE rather than hard-coded).
ALWAYS_BROADCAST = ("region", "nation")
