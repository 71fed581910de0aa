"""Cap-drop observability counters (SURVEY §7.14 #4, r13 verdict #4).

The banded operators' hot-group caps (max_shingle_df / max_df /
max_block / max_degree) are the documented bounded-reducer guards, but
the r13 100× soak showed them silently excluding 100 % of groups on a
degenerate corpus. Each cap now rides a ``catalog.observe_cap_drops``
summary sharing the frequency aggregate its filter consumes — lazy,
paying one on-demand job only when queried — and these tests pin
(a) exact counts on corpora where truth is countable by hand,
(b) zero-drop on benign corpora, and (c) the degenerate 100%-dropped
corpora the r13 soak showed going silent.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from sales_data_etl_pipeline_spark import catalog
from sales_data_etl_pipeline_spark.operators import dedup


def _docs(spark, texts):
    return spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )


def test_minhash_shingle_df_cap_counts_hot_shingles(spark):
    # 6 docs share one boilerplate sentence -> every shingle of that
    # sentence has df=6 (> 0.5 * 6 docs); each doc's unique tail keeps
    # its own shingles under the cap.
    boiler = "the quick brown fox jumps over the lazy dog again and again"
    texts = [f"{boiler} unique tail number {i} marker" for i in range(6)]
    out = dedup.minhash_lsh_pairs(
        _docs(spark, texts), max_shingle_df=0.5
    )
    out.count()
    m = catalog.cap_drop_metrics("minhash_lsh:shingle_df")
    # every boilerplate shingle appears in all 6 docs
    assert m["dropped_groups"] > 0
    assert m["dropped_rows"] == 6 * m["dropped_groups"]

    # benign corpus: word-disjoint texts, no shingle crosses a 0.9 cap
    texts2 = [
        "alpha beta gamma delta epsilon zeta",
        "one two three four five six seven",
        "red orange yellow green blue indigo",
        "cat dog bird fish horse goat sheep",
    ]
    dedup.minhash_lsh_pairs(_docs(spark, texts2), max_shingle_df=0.9).count()
    m2 = catalog.cap_drop_metrics("minhash_lsh:shingle_df")
    assert m2 == {"dropped_groups": 0, "dropped_rows": 0}


def test_winnowing_max_df_cap_counts_all_dropped_corpus(spark):
    # identical docs: every winnow fingerprint has df = n_docs, all
    # exceed max_df=2 -> the operator returns 0 pairs (the documented
    # soak behavior) and the summary must say EXACTLY how much was
    # excluded — the silent case the counters exist for.
    n = 4
    texts = [
        "an identical document body repeated verbatim every time with"
        " plenty of extra words so winnowing yields many fingerprints"
    ] * n
    out = dedup.winnow_pairs(_docs(spark, texts), max_df=2)
    assert out.count() == 0
    m = catalog.cap_drop_metrics("winnowing:max_df")
    assert m["dropped_groups"] > 0
    # every fingerprint group holds all n docs' rows
    assert m["dropped_rows"] == n * m["dropped_groups"]

    out2 = dedup.winnow_pairs(_docs(spark, texts), max_df=10)
    assert out2.count() > 0  # caps off: the dup pairs surface
    assert catalog.cap_drop_metrics("winnowing:max_df") == {
        "dropped_groups": 0,
        "dropped_rows": 0,
    }


def test_levenshtein_max_block_cap_counts_exactly(spark):
    # one hot prefix block of 5 docs (> max_block=3) + one small block
    # of 2: exactly 1 dropped group, 5 dropped rows.
    texts = [f"AAAA shared prefix doc {i}" for i in range(5)] + [
        "ZZZZ other block x",
        "ZZZZ other block y",
    ]
    out = dedup.levenshtein_pairs(
        _docs(spark, texts), max_dist=5, prefix_len=4, max_block=3
    )
    n_pairs = out.count()
    m = catalog.cap_drop_metrics("levenshtein:max_block")
    assert m == {"dropped_groups": 1, "dropped_rows": 5}
    assert n_pairs == 1  # only the ZZZZ pair survives


def test_link_prediction_degree_cap_counts_hub(spark):
    # star graph: hub h has degree 4 (> max_degree=3), leaves degree 1.
    # Exactly one dropped group (the hub), dropped_rows = its degree.
    pairs = spark.createDataFrame(
        [("h", f"l{i}") for i in range(4)] + [("l0", "l1")],
        "id_a string, id_b string",
    )
    dedup.link_prediction_jaccard(pairs, max_degree=3).count()
    m = catalog.cap_drop_metrics("link_prediction:max_degree")
    assert m == {"dropped_groups": 1, "dropped_rows": 4}

    dedup.link_prediction_adamic_adar(pairs, max_degree=3).count()
    m2 = catalog.cap_drop_metrics("link_prediction_aa:max_degree")
    assert m2 == {"dropped_groups": 1, "dropped_rows": 4}

    # generous cap: no hub exclusion on either variant
    dedup.link_prediction_jaccard(pairs, max_degree=50).count()
    assert catalog.cap_drop_metrics("link_prediction:max_degree") == {
        "dropped_groups": 0,
        "dropped_rows": 0,
    }


def test_link_prediction_all_hubs_still_reports(spark):
    # K4 clique with max_degree=2: EVERY node is a hub, centers is
    # empty — the exact regime the r13 soak showed going silent.
    # 4 dropped groups, 12 dropped rows (degree 3 each).
    nodes = ["a", "b", "c", "d"]
    pairs = spark.createDataFrame(
        [(x, y) for i, x in enumerate(nodes) for y in nodes[i + 1 :]],
        "id_a string, id_b string",
    )
    assert dedup.link_prediction_jaccard(pairs, max_degree=2).count() == 0
    m = catalog.cap_drop_metrics("link_prediction:max_degree")
    assert m == {"dropped_groups": 4, "dropped_rows": 12}

    assert dedup.link_prediction_adamic_adar(pairs, max_degree=2).count() == 0
    m2 = catalog.cap_drop_metrics("link_prediction_aa:max_degree")
    assert m2 == {"dropped_groups": 4, "dropped_rows": 12}


def test_containment_family_sites_register(spark):
    boiler = "shared boilerplate sentence present in every single doc"
    texts = [f"{boiler} tail {i}" for i in range(5)]
    d = _docs(spark, texts)
    dedup.containment_pairs(d, max_shingle_df=0.5).count()
    assert (
        catalog.cap_drop_metrics("containment:shingle_df")["dropped_groups"]
        > 0
    )
    dedup.minhash_containment_pairs(d, max_shingle_df=0.5).count()
    assert (
        catalog.cap_drop_metrics("minhash_containment:shingle_df")[
            "dropped_groups"
        ]
        > 0
    )
