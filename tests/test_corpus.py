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


def test_pack_sequences_greedy_semantics(spark):
    from sales_data_etl_pipeline_spark.operators.corpus import pack_sequences

    rows = [(i, t) for i, t in enumerate([100, 200, 200, 90, 600, 10, 512])]
    df = spark.createDataFrame(rows, "doc_id long, n_tokens long")
    # one giant shard so everything packs in doc_id order
    got = {
        r["doc_id"]: (r["shard_id"], r["seq_in_shard"], r["offset_in_seq"])
        for r in pack_sequences(df, 512, shard_budget=10**9).collect()
    }
    # cap=512: [100,200,200] fill=500; 90 doesn't fit -> new seq; 600 overflows
    # alone; 10 can't join the overflowing seq (600>512) -> new; 512 exact fit
    # can't join seq with fill=10+? 10+512=522>512 -> new seq
    assert got[0] == (0, 0, 0)
    assert got[1] == (0, 0, 100)
    assert got[2] == (0, 0, 300)
    assert got[3] == (0, 1, 0)
    assert got[4] == (0, 2, 0)   # overflowing doc gets its own sequence
    assert got[5] == (0, 3, 0)
    assert got[6] == (0, 4, 0)   # exact-capacity doc opens a fresh sequence


def test_pack_sequences_respects_shard_boundaries(spark):
    from sales_data_etl_pipeline_spark.operators.corpus import pack_sequences

    df = spark.createDataFrame(
        [(i, 50) for i in range(40)], "doc_id long, n_tokens long"
    )
    out = pack_sequences(df, 100, shard_budget=500).collect()
    # 2000 tokens / 500-budget -> 4 shards of 10 docs; 100-cap -> 2 docs/seq
    shards = {r["shard_id"] for r in out}
    assert shards == {0, 1, 2, 3}
    for r in out:
        assert r["offset_in_seq"] in (0, 50)
        assert 0 <= r["seq_in_shard"] <= 4


def test_mixture_upsample_epochs(spark):
    from sales_data_etl_pipeline_spark.operators.corpus import mixture_upsample

    df = spark.createDataFrame(
        [(i, "hot" if i % 2 == 0 else "cold") for i in range(200)],
        "doc_id long, source string",
    )
    out = mixture_upsample(df, {"hot": 2.5, "cold": 0.0}).collect()
    by_doc = {}
    for r in out:
        by_doc.setdefault(r["doc_id"], []).append(r["copy_idx"])
    # cold docs vanish entirely
    assert all(d % 2 == 0 for d in by_doc)
    # hot docs appear 2 or 3 times with contiguous copy indices
    counts = {len(v) for v in by_doc.values()}
    assert counts <= {2, 3} and 3 in counts and 2 in counts
    for v in by_doc.values():
        assert sorted(v) == list(range(len(v)))
    # fractional part lands near 50% of hot docs (deterministic md5 split)
    n3 = sum(1 for v in by_doc.values() if len(v) == 3)
    assert 25 <= n3 <= 75


def test_mixture_upsample_deterministic(spark):
    from sales_data_etl_pipeline_spark.operators.corpus import mixture_upsample

    df = spark.createDataFrame(
        [(i, "s") for i in range(50)], "doc_id long, source string"
    )
    a = sorted((r["doc_id"], r["copy_idx"]) for r in mixture_upsample(df, {"s": 1.5}).collect())
    b = sorted((r["doc_id"], r["copy_idx"]) for r in mixture_upsample(df, {"s": 1.5}).collect())
    assert a == b


def test_decontaminate_flags_leaks_and_broadcasts(spark):
    from sales_data_etl_pipeline_spark.operators import corpus as corpus_ops
    from sales_data_etl_pipeline_spark.sources.tables import load_testdata
    from pyspark.sql import functions as F

    docs = load_testdata(spark, "/root/testdata/sf0.001", ("documents",))[
        "documents"
    ].select("doc_id", "text")
    evalset = docs.filter(F.col("doc_id") % 31 == 0)
    out = corpus_ops.decontaminate(docs, evalset, n=8)
    flagged = {r.doc_id for r in out.collect()}
    # every leaked eval doc flags itself (verbatim presence in corpus)
    eval_ids = {r.doc_id for r in evalset.select("doc_id").collect()}
    assert eval_ids <= flagged
    # eval side broadcasts: no shuffle on the n-gram join key
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan


def test_bpe_token_stats_sane(spark):
    from sales_data_etl_pipeline_spark.operators import text as text_ops
    from sales_data_etl_pipeline_spark.sources.tables import load_testdata
    from pyspark.sql import functions as F

    docs = load_testdata(spark, "/root/testdata/sf0.001", ("documents",))[
        "documents"
    ]
    out = text_ops.bpe_token_stats(docs)
    bad = out.filter(
        (F.col("n_bpe_tokens") < F.col("n_ws_tokens"))
        | (F.col("n_bpe_tokens") > F.col("n_bytes"))
    ).count()
    # pre-tokenization only splits: ws_words <= bpe_tokens <= bytes
    assert bad == 0


def test_paragraph_dedup_copies_keep_nothing(spark):
    from sales_data_etl_pipeline_spark.operators import text as text_ops
    from sales_data_etl_pipeline_spark.plans.llm_demo import _docs_with_exact_dups
    from pyspark.sql import functions as F

    out = text_ops.paragraph_dedup_stats(
        _docs_with_exact_dups(spark, "/root/testdata/sf0.001")
    )
    copies = out.filter(F.col("doc_id") >= 10000)
    assert copies.count() > 0
    # exact copies lose every paragraph to the original
    assert copies.filter(F.col("n_kept") != 0).count() == 0
    # conservation: survivors across the corpus == distinct paragraph
    # hashes (every distinct paragraph kept exactly once)
    from sales_data_etl_pipeline_spark.operators.text import (
        PARA_TOKENS,
        tokens,
    )

    corpus = _docs_with_exact_dups(spark, "/root/testdata/sf0.001")
    n_distinct = (
        corpus.select(tokens().alias("_t"))
        .select(
            F.explode(
                F.expr(
                    f"transform(sequence(1, (size(_t) + {PARA_TOKENS - 1})"
                    f" div {PARA_TOKENS}), i -> array_join(slice(_t,"
                    f" (i - 1) * {PARA_TOKENS} + 1, {PARA_TOKENS}), ' '))"
                )
            ).alias("p")
        )
        .distinct()
        .count()
    )
    assert out.agg(F.sum("n_kept")).first()[0] == n_distinct


def test_paragraph_dedup_zero_token_doc_yields_no_rows(spark):
    """Spark's sequence(1, 0) is the DESCENDING [1, 0]; before the
    round-6 guard a zero-token doc fabricated two phantom empty
    paragraphs (n_paragraphs = 2) while the DuckDB oracle's
    generate_series(1, 0) produced none. Empty and punctuation-only
    docs must simply be absent from the output."""
    from pyspark.sql import Row
    from pyspark.sql import functions as F

    from sales_data_etl_pipeline_spark.operators import text as text_ops

    df = spark.createDataFrame(
        [
            Row(doc_id=1, text="alpha beta gamma"),
            Row(doc_id=2, text=""),
            Row(doc_id=3, text="   "),
        ]
    )
    out = text_ops.paragraph_dedup_stats(df).collect()
    assert {r.doc_id for r in out} == {1}
    assert all(r.n_paragraphs >= 1 for r in out)
