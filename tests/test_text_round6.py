"""Round-6 text/corpus operators: Gopher rule filter, bigram LM
scoring, deterministic quality resampling."""

from __future__ import annotations

from pyspark.sql import Row
from pyspark.sql import functions as F

from sales_data_etl_pipeline_spark.operators import corpus, text


def test_gopher_rules_fire_individually(spark):
    good = " ".join(
        ["the data and that model have runs with tokens"] * 8
    )  # 72 words, stopwords present, clean
    rows = [
        Row(doc_id=1, text=good),
        Row(doc_id=2, text="short text only"),  # fails word count
        Row(doc_id=3, text="the of " + "###!!! " * 60),  # symbol-heavy
        Row(doc_id=4, text=" ".join(f"w{i}" for i in range(60))),  # no stopwords
        Row(doc_id=5, text=""),  # zero tokens -> absent
    ]
    out = {r.doc_id: r for r in text.gopher_quality(spark.createDataFrame(rows)).collect()}
    assert set(out) == {1, 2, 3, 4}
    assert out[1].passes
    assert not out[2].ok_word_count and not out[2].passes
    assert not out[3].ok_symbol_ratio and not out[3].passes
    assert not out[4].ok_stopwords and not out[4].passes


def test_bigram_logprob_exact_integer_math(spark):
    """Hand-checkable corpus: doc A = 'x y x y' (bigrams xy, yx, xy),
    doc B = 'x z' (bigram xz). C(x,·)=3: P(y|x)=2/3, P(z|x)=1/3;
    C(y,·)=1: P(x|y)=1. Surprisal q6 = floor(-log2(p)*1e6 + 0.5)."""
    import math

    df = spark.createDataFrame(
        [Row(doc_id=1, text="x y x y"), Row(doc_id=2, text="x z")]
    )
    out = {r.doc_id: r for r in text.bigram_logprob(df).collect()}
    q = lambda p: math.floor(-math.log2(p) * 1_000_000 + 0.5)
    assert out[1].n_bigrams == 3
    assert out[1].logprob_q6 == 2 * q(2 / 3) + 1 * q(1.0)
    assert out[2].n_bigrams == 1
    assert out[2].logprob_q6 == q(1 / 3)
    assert out[1].mean_bits_q6 == out[1].logprob_q6 // 3


def test_bigram_logprob_short_docs_drop_out(spark):
    df = spark.createDataFrame(
        [Row(doc_id=1, text="lonely"), Row(doc_id=2, text=""), Row(doc_id=3, text="a b")]
    )
    assert {r.doc_id for r in text.bigram_logprob(df).collect()} == {3}


def test_quality_resample_is_deterministic_and_consistent(spark):
    from sales_data_etl_pipeline_spark.sources.tables import load_testdata

    docs = load_testdata(spark, "/root/testdata/sf0.001", ("documents",))[
        "documents"
    ]
    a = {tuple(r) for r in corpus.quality_resample(docs).collect()}
    b = {tuple(r) for r in corpus.quality_resample(docs).collect()}
    assert a == b and a
    # every accepted row satisfies the acceptance inequality, and the
    # accepted count matches filtering the full quality table directly
    assert all(u < qp for (_d, qp, u) in a)
    full = text.quality_score(docs).withColumn(
        "u",
        F.expr(
            "pmod(cast(conv(substring(md5(cast(doc_id as string)), 1, 15),"
            " 16, 10) as bigint), 1000000L)"
        ),
    )
    n_expected = full.filter(
        F.col("u") < F.expr("cast(floor(quality * 1000000 + 0.5) as bigint)")
    ).count()
    assert len(a) == n_expected


def test_dup_span_exact_copy_is_fully_duplicated(spark):
    """An exact copy → every span duplicated (ppm = 1_000_000); a doc
    shorter than the window has no spans and must be ABSENT (not a
    phantom row from Spark's descending sequence(1, 0))."""
    from pyspark.sql import Row

    from sales_data_etl_pipeline_spark.operators.text import dup_span_stats

    long_text = " ".join(f"w{i}" for i in range(25))  # 6 spans of 20
    docs = spark.createDataFrame(
        [
            Row(doc_id=1, text=long_text),
            Row(doc_id=2, text=long_text),
            Row(doc_id=3, text="too short " * 3),  # 6 tokens → 0 spans
            Row(doc_id=4, text=" ".join(f"u{i}" for i in range(30))),
        ]
    )
    out = {r.doc_id: r for r in dup_span_stats(docs).collect()}
    assert set(out) == {1, 2, 4}
    for d in (1, 2):
        assert out[d].n_spans == 6
        assert out[d].n_dup_spans == 6
        assert out[d].dup_ppm == 1_000_000
    assert out[4].n_spans == 11
    assert out[4].n_dup_spans == 0
    assert out[4].dup_ppm == 0


def test_dup_span_partial_overlap_counts_positions(spark):
    """Positional (stride-1) accounting: a 5-token overlap region in
    otherwise-distinct docs marks NO spans (window=20 exceeds it), so
    sliding-span dedup is insensitive to short shared phrases —
    the property that separates it from shingle Jaccard."""
    from pyspark.sql import Row

    from sales_data_etl_pipeline_spark.operators.text import dup_span_stats

    shared = " ".join(f"s{i}" for i in range(5))
    a = " ".join(f"a{i}" for i in range(20)) + " " + shared
    b = shared + " " + " ".join(f"b{i}" for i in range(20))
    out = {r.doc_id: r for r in dup_span_stats(
        spark.createDataFrame([Row(doc_id=1, text=a), Row(doc_id=2, text=b)])
    ).collect()}
    assert out[1].n_dup_spans == 0 and out[2].n_dup_spans == 0


def test_dup_span_kernel_matches_expression_form(spark):
    """The Arrow rolling-hash kernel must group spans exactly like the
    reference expression form (tokenize → sliding array_join → hash):
    guards Python-vs-JVM tokenization drift and hash-collision regressions
    on realistic corpus text."""
    from pyspark.sql import functions as F

    from sales_data_etl_pipeline_spark.operators.text import (
        TOKENIZE,
        dup_span_stats,
    )
    from sales_data_etl_pipeline_spark.sources.tables import load_testdata

    docs = (
        load_testdata(spark, "/root/testdata/sf0.001", ("documents",))[
            "documents"
        ]
        .select("doc_id", "text")
        .limit(80)
    )
    corpus = docs.unionByName(
        docs.filter(F.col("doc_id") % 10 == 0).select(
            (F.col("doc_id") + 5000).alias("doc_id"),
            F.expr(
                "substring(text, 1, greatest(length(text) - 20, 1))"
            ).alias("text"),
        )
    )
    got = {
        (r.doc_id, r.n_spans, r.n_dup_spans, r.dup_ppm)
        for r in dup_span_stats(corpus).collect()
    }
    # reference: expression form over a materialized token array
    toked = corpus.select(
        "doc_id", F.expr(TOKENIZE.format(col="text")).alias("_t")
    )
    spans = (
        toked.select(
            "doc_id",
            F.expr(
                "CASE WHEN size(_t) >= 20 THEN "
                "transform(sequence(1, size(_t) - 19),"
                " i -> array_join(slice(_t, i, 20), ' ')) "
                "ELSE array() END"
            ).alias("_s"),
        )
        .select("doc_id", F.explode("_s").alias("_span"))
        .select("doc_id", F.md5("_span").alias("_h"))
    )
    dup = (
        spans.groupBy("_h")
        .agg(F.count_distinct("doc_id").alias("_nd"))
        .filter(F.col("_nd") >= 2)
        .select("_h")
    )
    want = {
        (r.doc_id, r.n_spans, r.n_dup_spans, r.dup_ppm)
        for r in spans.join(dup.withColumn("_d", F.lit(1)), "_h", "left")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_spans"),
            F.sum(F.coalesce("_d", F.lit(0))).alias("n_dup_spans"),
        )
        .withColumn("dup_ppm", F.expr("(n_dup_spans * 1000000) div n_spans"))
        .collect()
    }
    assert got == want
