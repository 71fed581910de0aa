"""JSONL source/sink: explicit-schema read, corrupt-record quarantine."""

from __future__ import annotations

import os

from pyspark.sql import Row
from pyspark.sql import functions as F
from pyspark.sql import types as T

from sales_data_etl_pipeline_spark.sources import jsonl


def test_roundtrip_preserves_rows_and_types(spark, tmp_path):
    df = spark.createDataFrame(
        [Row(doc_id=i, text=f"doc {i} é ünïcode\ttab", score=i / 3.0)
         for i in range(50)]
    )
    path = str(tmp_path / "docs")
    jsonl.write_jsonl(df, path, max_records_per_file=7)
    # Spark disallows querying ONLY _corrupt_record straight off a raw
    # JSON scan — materialize first (the documented pattern)
    back = jsonl.read_jsonl(spark, path, df.schema).cache()
    assert back.filter(F.col(jsonl.CORRUPT_COL).isNotNull()).count() == 0
    got = sorted(
        (r.doc_id, r.text, r.score)
        for r in back.select("doc_id", "text", "score").collect()
    )
    want = sorted((r.doc_id, r.text, r.score) for r in df.collect())
    assert got == want
    # maxRecordsPerFile bound respected → parallel splits
    parts = [f for f in os.listdir(path) if f.startswith("part-")]
    assert len(parts) >= 50 // 7


def test_corrupt_lines_quarantine_not_fail(spark, tmp_path):
    p = tmp_path / "mixed.jsonl"
    p.write_text(
        '{"doc_id": 1, "text": "ok"}\n'
        '{"doc_id": 2, "text": "also ok"}\n'
        "{truncated garbage\n"
        '{"doc_id": "not-an-int", "text": "type clash"}\n'
    )
    schema = T.StructType(
        [
            T.StructField("doc_id", T.LongType(), True),
            T.StructField("text", T.StringType(), True),
        ]
    )
    back = jsonl.read_jsonl(spark, str(p), schema).cache()
    good = back.filter(F.col(jsonl.CORRUPT_COL).isNull())
    bad = back.filter(F.col(jsonl.CORRUPT_COL).isNotNull())
    assert sorted(r.doc_id for r in good.collect()) == [1, 2]
    assert bad.count() == 2  # garbage line + type-clash line
    # quarantined rows carry the raw line for audit
    assert any("truncated" in r[jsonl.CORRUPT_COL] for r in bad.collect())
