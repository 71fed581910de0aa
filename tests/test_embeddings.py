from __future__ import annotations

import math

from sales_data_etl_pipeline_spark.operators import embeddings


def _df(spark, rows):
    return spark.createDataFrame(rows, "vec_id long, embedding array<float>")


def test_l2_normalize(spark):
    df = _df(spark, [(1, [3.0, 4.0]), (2, [0.0, 0.0]), (3, [])])
    got = {r["vec_id"]: r.asDict() for r in embeddings.l2_normalize(df).collect()}
    assert got[1]["norm_q6"] == 5_000_000
    assert got[1]["unit_q6"] == "600000,800000"
    # zero vector -> whole-column NULL (same in the DuckDB oracle), no crash
    assert got[2]["norm_q6"] == 0
    assert got[2]["unit_q6"] is None
    # empty vector behaves like the zero vector on BOTH engines: Spark's
    # aggregate fold returns the 0.0 seed, the oracle COALESCEs DuckDB's
    # NULL list_aggregate([], 'sum') to 0.0
    assert got[3]["norm_q6"] == 0
    assert got[3]["unit_q6"] is None


def test_l2_normalize_oracle_matches_on_empty_and_zero_vectors(spark):
    import duckdb

    con = duckdb.connect()
    con.execute(
        "CREATE TABLE embeddings AS "
        "SELECT 1 AS vec_id, []::DOUBLE[] AS embedding "
        "UNION ALL SELECT 2, [0.0, 0.0] UNION ALL SELECT 3, [3.0, 4.0]"
    )
    oracle = {
        r[0]: (r[1], r[2])
        for r in con.execute(embeddings.l2_normalize_sql()).fetchall()
    }
    df = _df(spark, [(1, []), (2, [0.0, 0.0]), (3, [3.0, 4.0])])
    got = {
        r["vec_id"]: (r["norm_q6"], r["unit_q6"])
        for r in embeddings.l2_normalize(df).collect()
    }
    assert got == oracle


def test_quantize_int8_roundtrip_error_bounded(spark):
    vec = [0.9, -0.45, 0.001, -0.9]
    df = _df(spark, [(1, vec)])
    row = embeddings.quantize_int8(df).collect()[0]
    scale = row["scale_q6"] / 1e6
    q = [int(x) for x in row["q_int8"].split(",")]
    assert max(q) == 127 and min(q) == -127
    for orig, qi in zip(vec, q):
        assert abs(qi / scale - orig) <= 0.5 / scale + 1e-6


def test_quantize_scale_formula(spark):
    df = _df(spark, [(1, [0.5, -0.25])])
    row = embeddings.quantize_int8(df).collect()[0]
    assert row["scale_q6"] == math.floor(127.0 / 0.5 * 1e6 + 0.5)
