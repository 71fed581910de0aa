"""Corpus-management operators: split/sample determinism, shard budget
invariants, distributed-prefix-sum correctness."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from sales_data_etl_pipeline_spark.operators import corpus


@pytest.fixture(scope="module")
def docs(spark):
    rows = [(i, f"lang{i % 3}", (i * 37) % 200 + 1) for i in range(1, 501)]
    return spark.createDataFrame(rows, "doc_id long, lang string, n_tokens long")


def test_hash_split_partitions_everything(docs):
    out = corpus.hash_split(docs, {"train": 0.8, "val": 0.1, "test": 0.1})
    counts = {r["split"]: r["n"] for r in out.groupBy("split").agg(F.count(F.lit(1)).alias("n")).collect()}
    assert sum(counts.values()) == 500
    assert set(counts) <= {"train", "val", "test"}
    # roughly proportional (md5 buckets; 500 ids → generous tolerance)
    assert counts["train"] > 300


def test_hash_split_stable_under_subset(docs):
    """A document's split never depends on what else is in the dataset."""
    full = {
        r["doc_id"]: r["split"]
        for r in corpus.hash_split(docs, {"a": 0.5, "b": 0.5}).collect()
    }
    half = {
        r["doc_id"]: r["split"]
        for r in corpus.hash_split(
            docs.filter(F.col("doc_id") % 2 == 0), {"a": 0.5, "b": 0.5}
        ).collect()
    }
    assert all(full[k] == v for k, v in half.items())


def test_stratified_sample_respects_thresholds(docs):
    out = corpus.stratified_sample(
        docs, {"lang0": 1.0, "lang1": 0.0}, strata_col="lang", default_fraction=0.5
    )
    got = out.groupBy("lang").agg(F.count(F.lit(1)).alias("n")).collect()
    by_lang = {r["lang"]: r["n"] for r in got}
    assert by_lang.get("lang0", 0) == docs.filter("lang = 'lang0'").count()
    assert "lang1" not in by_lang
    n2 = docs.filter("lang = 'lang2'").count()
    assert 0 < by_lang.get("lang2", 0) < n2


def test_shard_by_token_budget_matches_serial_scan(docs):
    budget = 997
    out = corpus.shard_by_token_budget(docs, budget).collect()
    rows = sorted(((r["doc_id"], r["n_tokens"], r["shard_id"]) for r in out))
    acc = 0
    for doc_id, n, shard in rows:
        assert shard == acc // budget, f"doc {doc_id}"
        acc += n
    # shards are contiguous and start at 0
    shards = [s for _, _, s in rows]
    assert shards[0] == 0
    assert all(b - a in (0, 1) for a, b in zip(shards, shards[1:]))
