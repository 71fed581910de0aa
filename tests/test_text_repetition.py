from __future__ import annotations

import pytest

from sales_data_etl_pipeline_spark.operators import text


def _one(spark, s):
    df = spark.createDataFrame([(1, s)], "doc_id long, text string")
    return text.repetition_stats(df).collect()[0].asDict()


def test_repetition_all_same_bigram(spark):
    # "a b a b a b a b" -> bigrams: ab ba ab ba ab ba ab (7 total, 2 distinct)
    r = _one(spark, "a b a b a b a b")
    assert r["n_2grams"] == 7
    assert r["top_2gram_frac"] == pytest.approx(4 / 7, abs=1e-6)
    assert r["dup_2gram_frac"] == pytest.approx(5 / 7, abs=1e-6)


def test_repetition_no_repeats(spark):
    r = _one(spark, "one two three four")
    assert r["n_2grams"] == 3
    assert r["top_2gram_frac"] == pytest.approx(1 / 3, abs=1e-6)
    assert r["dup_2gram_frac"] == 0.0
    assert r["n_3grams"] == 2 and r["dup_3gram_frac"] == 0.0


def test_repetition_short_doc_is_null_not_crash(spark):
    r = _one(spark, "solo")
    assert r["n_2grams"] == 0
    assert r["top_2gram_frac"] is None
    assert r["dup_2gram_frac"] is None


def test_unigram_logprob_uniform_corpus(spark):
    # 4 docs, each one token; vocab {a:2, b:2}, total 4 -> p=0.5 -> 1 bit
    df = spark.createDataFrame(
        [(1, "a"), (2, "a"), (3, "b"), (4, "b")], "doc_id long, text string"
    )
    out = {r["doc_id"]: r.asDict() for r in text.unigram_logprob(df).collect()}
    for d in (1, 2, 3, 4):
        assert out[d]["n_tokens"] == 1
        assert out[d]["logprob_q6"] == 1_000_000  # exactly 1 bit
        assert out[d]["mean_bits_q6"] == 1_000_000


def test_unigram_logprob_rare_token_scores_higher(spark):
    df = spark.createDataFrame(
        [(1, "common common common common"), (2, "rare")],
        "doc_id long, text string",
    )
    out = {r["doc_id"]: r.asDict() for r in text.unigram_logprob(df).collect()}
    assert out[2]["mean_bits_q6"] > out[1]["mean_bits_q6"]
