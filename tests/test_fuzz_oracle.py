"""Randomized cross-engine fuzz of the OLAP analogs.

The driver gate proves each query on ONE dataset (the sf0.01 corpus).
This test re-proves the trickiest analogs on RANDOM star schemas: a
seeded generator writes a miniature lineitem/orders/... directory, the
Spark plan and the DuckDB oracle both run against those same parquet
files, and the results must agree cell-for-cell under the driver's
canonicalization (columns sorted by name, rows sorted, 6-sig floats).

Catches the failure class the fixed dataset can't: predicates that
happen to be vacuous on the driver data (empty groups, all-NULL
branches, tie-breaks that never tie, boundary dates absent).
"""

from __future__ import annotations

import math

import duckdb
import numpy as np
import pandas as pd
import pytest

import __spark_entry__ as entrymod

TABLES = (
    "lineitem orders customer supplier nation region part "
    "events documents embeddings"
).split()

#: queries fuzzed here — every TPC-H analog (the generator covers every
#: literal they reference: nation/region names, brands, types, sizes,
#: date ranges), with the subquery/semi/anti/window shapes the fixed
#: driver dataset could render vacuous
FUZZED = [
    "q1_pricing_summary",
    "q2_min_balance_supplier",
    "q3_unshipped_orders",
    "q4_priority_late_ship",
    "q5_local_supplier_volume",
    "q6_forecast_revenue",
    "q7_volume_shipping",
    "q8_market_share",
    "q9_product_profit",
    "q10_returned_items",
    "q13_customer_distribution",
    "q14_promo_revenue",
    "q15_top_supplier",
    "q16_supplier_part_counts",
    "q17_small_quantity_revenue",
    "q18_large_orders",
    "q19_disjunctive_revenue",
    "q20_excess_shippers",
    "q21_sole_late_shipper",
    "q22_dormant_customers",
    "sales_by_region_nation",
    "customers_above_avg",
    # temporal family — event-time semantics fuzzed on random streams
    "events_top_per_day",
    "events_windowed_agg",
    "events_sliding_agg",
    "events_json_props",
    "events_salted_agg",
    "events_anomaly_iqr",
    "events_range_count",
    "events_sessionization",
    "events_asof_join",
    # round-8: RFM quintiles on random streams
    "events_rfm_segmentation",
    # round-10: journey paths on random streams
    "events_top_paths",
    # round-7 star-schema/events additions
    "q11_important_parts",
    "q12_late_priority_split",
    "stats_correlation",
    "events_hourly_heatmap",
    "events_rolling_active_users",
    "events_user_lifetime_stats",
    # round-8: session-scoped funnel + skew-safe dim join on random streams
    "events_session_funnel",
    "events_salted_join",
    # round-9: first-order Markov transition matrix on random streams
    "events_markov_transitions",
    # round-10: bucketed interval-overlap join + Z-order file stats
    "events_interval_join",
    "table_zorder_layout",
    # round-10 batch 5: count-min-sketch heavy hitters on random streams
    "events_heavy_hitters_cms",
    # round-14 (hold-back landing): grouped approx quantiles — the fuzz
    # events cap at 600 rows, far inside the GK exact regime
    # (2·N/accuracy < 1), so quantile_disc is a deterministic oracle
    "events_value_quantiles_grouped",
    # round-15 (hold-back landing): compressed-regime GK bound gate —
    # the metamorphic all-TRUE oracle holds on ANY data by the GK
    # guarantee (fuzz groups <=600 rows straddle both regimes at
    # accuracy=100; the bound check is regime-independent)
    "events_value_quantiles_grouped_compressed",
]


def _gen(seed: int, outdir: str) -> None:
    rng = np.random.default_rng(seed)
    n_nation, n_supp, n_cust, n_part = 6, 12, 40, 30
    n_orders, n_items = 120, 400
    days = pd.Timestamp("1996-01-01") + pd.to_timedelta(
        rng.integers(0, 1400, n_orders), unit="D"
    )
    nation = pd.DataFrame(
        {
            "n_nationkey": np.arange(n_nation, dtype=np.int32),
            "n_name": [f"NATION_{i}" for i in range(n_nation)],
            "n_regionkey": (np.arange(n_nation) % 3).astype(np.int32),
        }
    )
    region = pd.DataFrame(
        {
            "r_regionkey": np.arange(3, dtype=np.int32),
            "r_name": ["AMERICA", "ASIA", "EUROPE"],
        }
    )
    supplier = pd.DataFrame(
        {
            "s_suppkey": np.arange(1, n_supp + 1),
            "s_name": [f"Supplier#{i}" for i in range(1, n_supp + 1)],
            "s_nationkey": rng.integers(0, n_nation, n_supp).astype(np.int32),
            "s_acctbal": np.round(rng.uniform(-500, 5000, n_supp), 2),
        }
    )
    customer = pd.DataFrame(
        {
            "c_custkey": np.arange(1, n_cust + 1),
            "c_name": [f"Customer#{i}" for i in range(1, n_cust + 1)],
            "c_nationkey": rng.integers(0, n_nation, n_cust).astype(np.int32),
            "c_acctbal": np.round(rng.uniform(-999, 9999, n_cust), 2),
            "c_mktsegment": rng.choice(
                ["AUTOMOBILE", "BUILDING", "MACHINERY"], n_cust
            ),
        }
    )
    part = pd.DataFrame(
        {
            "p_partkey": np.arange(1, n_part + 1),
            "p_name": rng.choice(
                ["red gizmo", "blue bolt", "small gizmo", "hot gear"], n_part
            ),
            "p_brand": rng.choice(
                ["Brand#5", "Brand#12", "Brand#23", "Brand#34"], n_part
            ),
            "p_type": rng.choice(["PROMO", "ECONOMY", "LARGE"], n_part),
            "p_size": rng.choice(
                np.array([1, 9, 14, 15, 19, 23, 36, 45, 49], dtype=np.int32),
                n_part,
            ).astype(np.int32),
            "p_retailprice": np.round(rng.uniform(100, 2000, n_part), 2),
        }
    )
    orders = pd.DataFrame(
        {
            "o_orderkey": np.arange(1, n_orders + 1),
            "o_custkey": rng.integers(1, n_cust + 1, n_orders),
            "o_orderstatus": rng.choice(["O", "F", "P"], n_orders),
            "o_totalprice": np.round(rng.uniform(1000, 300000, n_orders), 2),
            "o_orderdate": days.astype("datetime64[us]"),
            "o_orderpriority": rng.choice(
                ["1-URGENT", "2-HIGH", "3-MEDIUM", "4-LOW"], n_orders
            ),
        }
    )
    ok = rng.integers(1, n_orders + 1, n_items)
    ship_lag = pd.to_timedelta(rng.integers(1, 120, n_items), unit="D")
    odate = orders.set_index("o_orderkey").loc[ok, "o_orderdate"].values
    lineitem = pd.DataFrame(
        {
            "l_orderkey": ok,
            "l_partkey": rng.integers(1, n_part + 1, n_items),
            "l_suppkey": rng.integers(1, n_supp + 1, n_items),
            "l_linenumber": np.arange(n_items, dtype=np.int32) % 7 + 1,
            "l_quantity": rng.integers(1, 51, n_items).astype(float),
            "l_extendedprice": np.round(rng.uniform(100, 90000, n_items), 2),
            "l_discount": np.round(rng.integers(0, 11, n_items) / 100.0, 2),
            "l_tax": np.round(rng.integers(0, 9, n_items) / 100.0, 2),
            "l_returnflag": rng.choice(["A", "N", "R"], n_items),
            "l_linestatus": rng.choice(["O", "F"], n_items),
            "l_shipdate": (pd.Series(odate) + ship_lag).values.astype(
                "datetime64[us]"
            ),
        }
    )
    n_events = 600
    ets = pd.Timestamp("2024-01-01") + pd.to_timedelta(
        rng.integers(0, 20 * 86400, n_events), unit="s"
    )
    events = pd.DataFrame(
        {
            "event_id": np.arange(1, n_events + 1),
            "ts": pd.Series(ets).sort_values().values.astype("datetime64[us]"),
            "user_id": rng.integers(0, 25, n_events),
            "event_type": rng.choice(
                ["view", "click", "purchase", "signup", "error"], n_events
            ),
            "value": np.round(rng.uniform(0.01, 500, n_events), 2),
            "props": [f'{{"k": {int(k)}}}' for k in rng.integers(0, 100, n_events)],
        }
    )
    for name, df in (
        ("nation", nation),
        ("region", region),
        ("supplier", supplier),
        ("customer", customer),
        ("part", part),
        ("orders", orders),
        ("lineitem", lineitem),
        ("events", events),
    ):
        df.to_parquet(f"{outdir}/{name}.parquet", index=False)


def _canon(pdf: pd.DataFrame) -> list[tuple]:
    import datetime

    cols = sorted(pdf.columns)
    rows = []
    for t in pdf[cols].itertuples(index=False):
        row = []
        for v in t:
            if isinstance(v, float):
                row.append("NaN" if math.isnan(v) else float(f"{v:.6g}"))
            elif isinstance(
                v, (datetime.date, datetime.datetime, pd.Timestamp)
            ):
                # driver convention (tools/check_correctness.py): DATE and
                # midnight TIMESTAMP compare equal — Spark DateType →
                # datetime.date while DuckDB DATE → Timestamp via fetchdf
                row.append(str(pd.Timestamp(v)))
            else:
                row.append(v)
        rows.append(tuple(row))
    rows.sort(key=lambda r: tuple((x is None, str(x)) for x in r))
    return rows


@pytest.mark.parametrize("seed", [7, 23, 99, 151, 202])
def test_analogs_agree_with_oracle_on_random_data(spark, tmp_path, seed):
    outdir = str(tmp_path / f"fuzz{seed}")
    import os

    os.makedirs(outdir)
    _gen(seed, outdir)
    qs, oracles = entrymod.queries(), entrymod.oracle_sql()
    con = duckdb.connect()
    for t in TABLES:
        p = f"{outdir}/{t}.parquet"
        if os.path.exists(p):
            con.execute(
                f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')"
            )
    for name in FUZZED:
        got = _canon(qs[name](spark, outdir).toPandas())
        want = _canon(con.execute(oracles[name]).fetchdf())
        assert got == want, f"{name} diverged on seed {seed}"
        # non-vacuity: at least one fuzzed query must return rows
    assert any(
        _canon(qs[n](spark, outdir).toPandas()) for n in FUZZED
    )


def _gen_corpus(seed: int, outdir: str) -> None:
    """documents + embeddings with adversarial edges the driver data
    lacks: empty docs, punctuation-only docs, single-token docs, exact
    duplicate texts, zero-norm and tiny-norm embedding vectors."""
    rng = np.random.default_rng(seed)
    vocab = np.array(
        "the a of to in is it key row scan table value part hash merge "
        "batch spark query line sort window stream fast slow big small "
        "data column agg join order group customer".split()
    )
    n_docs = 120
    texts = []
    for i in range(n_docs):
        if i % 17 == 0:
            texts.append("")  # empty
        elif i % 17 == 1:
            texts.append("!!! ... ---")  # punctuation-only → 0 tokens
        elif i % 17 == 2:
            texts.append("solitary")  # single token
        else:
            m = int(rng.integers(3, 220))
            texts.append(" ".join(rng.choice(vocab, m)))
    # exact duplicates: doc 9 == doc 10 etc.
    for i in range(9, n_docs, 40):
        if i + 1 < n_docs:
            texts[i + 1] = texts[i]
    docs = pd.DataFrame(
        {
            "doc_id": np.arange(n_docs),
            "text": texts,
            "lang": rng.choice(["en", "pt", "de", "fr"], n_docs),
            "source": rng.choice(["web", "books", "news"], n_docs),
            "n_chars": np.array([len(t) for t in texts], dtype=np.int64),
        }
    )
    n_vec, dim = 80, 64
    vecs = rng.normal(0, 1, (n_vec, dim)).astype(np.float32)
    vecs[5] = 0.0  # zero-norm vector
    vecs[11] = 1e-8  # tiny norm
    emb = pd.DataFrame(
        {
            "vec_id": np.arange(n_vec),
            "embedding": [v for v in vecs],
            "label": rng.integers(0, 10, n_vec).astype(np.int32),
        }
    )
    docs.to_parquet(f"{outdir}/documents.parquet", index=False)
    emb.to_parquet(f"{outdir}/embeddings.parquet", index=False)


#: documents/embeddings entries fuzzed on the adversarial corpus. Kept
#: to deterministic, corpus-shaped ops (streaming and iterative plans
#: have their own dedicated tests).
FUZZED_CORPUS = [
    "dedup_exact",
    "dedup_ngram_jaccard",
    "dedup_minhash_lsh",
    "dedup_simhash",
    "dedup_incremental",
    "text_token_stats",
    "text_language_id",
    "text_quality_score",
    "text_fingerprint",
    "text_term_frequencies",
    "text_tfidf_top_terms",
    "text_repetition",
    "text_unigram_logprob",
    "text_bigram_logprob",
    "text_gopher_quality",
    "text_paragraph_dedup",
    "text_dup_span_stats",
    "text_bpe_token_count",
    "text_sentence_stats",
    "text_char_diversity",
    "dedup_containment",
    "corpus_ngram_counts",
    "corpus_domain_mixture",
    "corpus_hash_split",
    "corpus_stratified_sample",
    "corpus_token_shards",
    "corpus_pack_sequences",
    "corpus_mixture_epochs",
    "corpus_quality_resample",
    "corpus_shuffle_deterministic",
    "corpus_decontaminate",
    "corpus_chunk_documents",
    "corpus_temperature_mixture",
    "stats_length_histogram",
    "pii_detect",
    "pii_redact",
    "embedding_normalize",
    "embedding_quantize_int8",
    "embedding_knn_label",
    "similarity_topk",
    "similarity_topk_lsh",
    "dedup_embedding_cosine",
    "dedup_embedding_lsh",
    "source_jsonl_roundtrip",
    # round-8: banded containment + join-verify incremental dedup + PQ
    "dedup_minhash_containment",
    "dedup_incremental_join",
    "embedding_pq_encode",
    "similarity_topk_pq",
    "similarity_topk_ivfpq",
    "dedup_incremental_containment",
    "graph_pagerank",
    # round-9: cross-corpus cosine range join + curriculum order +
    # prepared-base incremental dedup
    "similarity_range_join",
    "corpus_curriculum_order",
    "dedup_incremental_prepared",
    "similarity_topk_ivfpq_residual",
    # round-9: span removal + per-domain cap
    "text_dup_span_removal",
    "corpus_domain_cap",
    # round-10: bounded top-k range join + mutual-kNN graph +
    # bloom-filter decontamination
    "similarity_range_topk",
    "similarity_knn_graph",
    "corpus_bloom_membership",
    "embedding_kmeans_train",
    # round-10: SemDeDup + MOSS winnowing
    "dedup_semantic",
    "text_winnow_fingerprints",
    "dedup_winnowing",
    # round-10: signature-level image near-dup graph + trained-codebook
    # IVF + CCNet perplexity tiers
    "multimodal_phash_pairs",
    "similarity_topk_ivf_trained",
    "text_perplexity_buckets",
    # round-10: LPA communities over the MinHash graph + recall@5 of
    # the trained IVF vs brute force (both nest proven oracle bodies)
    "graph_label_propagation",
    "similarity_recall_eval",
    # round-10: prefix-blocked edit-distance pairs (the identical
    # punctuation-only/single-token doc groups form real cliques),
    # degree-oriented triangles over them, and integer power-iteration
    # PCA (zero-norm / tiny-norm vectors exercise the grid floor)
    "dedup_levenshtein",
    "graph_triangle_count",
    "embedding_pca_power",
    # round-10 batch 5: k-core peeling over the same edit-distance
    # cliques, binary-Hamming ANN (packed sign words), and DSIR
    # hashed-bigram importance weights
    "graph_kcore",
    "similarity_topk_hamming",
    "corpus_dsir_weights",
    # round-10 batch 6: BPE merge training, planted-hole link
    # prediction, stupid-backoff holdout scoring
    "text_bpe_train",
    "graph_link_prediction",
    "text_trigram_backoff",
    # round-10 batch 7: two-tier Hamming shortlist + cosine rerank,
    # Matryoshka truncation tiers
    "similarity_topk_hamming_rerank",
    "embedding_matryoshka",
    # round-10 batch 8: BPE application + Adamic-Adar link prediction
    "text_bpe_apply",
    "graph_link_prediction_aa",
    # round-11: char-fallback BPE application to unseen text (the eval
    # relation plants OOV words) + recall@5 of the binary Hamming tier
    # vs brute force (nests two proven oracle bodies)
    "text_bpe_apply_oov",
    "similarity_recall_hamming",
    "similarity_recall_hamming12",
]


@pytest.mark.parametrize("seed", [11, 42, 77])
def test_corpus_ops_agree_with_oracle_on_adversarial_data(
    spark, tmp_path, seed
):
    import os

    outdir = str(tmp_path / f"cfuzz{seed}")
    os.makedirs(outdir)
    _gen_corpus(seed, outdir)
    qs, oracles = entrymod.queries(), entrymod.oracle_sql()
    con = duckdb.connect()
    for t in ("documents", "embeddings"):
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM "
            f"read_parquet('{outdir}/{t}.parquet')"
        )
    diverged = []
    for name in FUZZED_CORPUS:
        got = _canon(qs[name](spark, outdir).toPandas())
        want = _canon(con.execute(oracles[name]).fetchdf())
        if got != want:
            diverged.append(name)
    assert not diverged, f"seed {seed}: {diverged}"


#: remaining batch families fuzzed on the same random data. Excluded by
#: design: streaming_* (micro-batch harness has dedicated tests),
#: source_synthetic_* (generator-only, no table input),
#: stats_approx_sketches (error-contract vs sketch internals — the
#: contract bound is calibrated to the driver corpus, not arbitrary
#: data).
FUZZED_MORE = [
    "sales_by_employee",
    "sales_by_employee_sql",
    "average_ticket_by_product",
    "sales_by_category",
    "top5_employees",
    "sales_by_period",
    "sales_rollup",
    "sales_pivot",
    "sales_monthly_growth",
    "top_products_per_brand",
    "sales_pareto_share",
    # r12 consolidation: the eleven clean_* micro-gates folded into the
    # clean_normalize_chain / clean_keys_chain / clean_et_chain
    # compositions (operators keep their unit tests in test_cleaning.py)
    "clean_normalize_chain",
    "clean_keys_chain",
    "clean_fuzzy_supplier_match",
    "quality_checks",
    "stats_profile",
    "stats_value_counts",
    "events_asof_join_forward",
    "events_cohort_retention",
    "events_funnel",
    "events_multires_rollup",
    "events_value_quantiles",
    "events_user_value_deciles",
    "events_windowed_distinct_users",
    "table_upsert",
    "table_insert_missing",
    "table_scd2_apply",
    "table_cdc_apply",
    "dedup_clusters",
    "dedup_cluster_representatives",
    "similarity_topk_ivf",
    "multimodal_decode",
    "multimodal_resize",
    "multimodal_frame_sample",
    # compositions — every stage is individually fuzzed above, but the
    # end-to-end chains get their own random-data row too
    "clean_et_chain",
    "corpus_dedup_pipeline",
    "corpus_prep_pipeline",
    # round-7 additions on the mixed-family fuzz
    "embedding_kmeans_assign",
    "source_csv_roundtrip",
    "multimodal_dhash",
    # round-8: integer-DCT perceptual hash + partition-pruned/ORC sources
    "multimodal_phash",
    "source_partitioned_roundtrip",
    "source_orc_roundtrip",
    # round-10: snapshot reconciliation diff + linear attribution +
    # WAV audio decode round-trip
    "table_snapshot_diff",
    "table_snapshot_changelog",
    "events_attribution_linear",
    "multimodal_audio_stats",
    # round-10 batch 5: XML sink→source round trip
    "source_xml_roundtrip",
    # round-10 batch 6: CUBE grouping sets
    "sales_cube",
    # round-10 batch 7: incremental aggregate-view maintenance +
    # analytic-raster scene cuts
    "table_view_maintain",
    "multimodal_scene_cuts",
    # round-10 batch 8: per-shot representative frames
    "multimodal_shot_reps",
]


@pytest.mark.parametrize("seed", [13])
def test_remaining_families_agree_with_oracle_on_random_data(
    spark, tmp_path, seed
):
    import os

    outdir = str(tmp_path / f"mfuzz{seed}")
    os.makedirs(outdir)
    _gen(seed, outdir)
    _gen_corpus(seed + 1, outdir)
    qs, oracles = entrymod.queries(), entrymod.oracle_sql()
    con = duckdb.connect()
    for t in TABLES:
        p = f"{outdir}/{t}.parquet"
        if os.path.exists(p):
            con.execute(
                f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')"
            )
    diverged = []
    for name in FUZZED_MORE:
        try:
            got = _canon(qs[name](spark, outdir).toPandas())
            want = _canon(con.execute(oracles[name]).fetchdf())
        except Exception as e:  # noqa: BLE001 — collect, assert below
            diverged.append((name, f"ERROR {str(e)[:120]}"))
            continue
        if got != want:
            diverged.append((name, f"{len(got)} vs {len(want)} rows"))
    assert not diverged, f"seed {seed}: {diverged}"


def test_every_gated_entry_is_fuzzed_or_excluded():
    """Coverage accounting: each queries() entry must appear in a fuzz
    list or carry a documented exclusion — a new operator can't ship
    with only fixed-dataset coverage unnoticed."""
    EXCLUDED = {
        # streaming micro-batch harness has dedicated tests
        # (tests/test_streaming.py: watermarks, late data, restart)
        "streaming_dedup",
        "streaming_enriched_counts",
        "streaming_session_counts",
        "streaming_session_funnel",
        "streaming_stream_join",
        "streaming_user_totals",
        "streaming_windowed_counts",
        # streaming near-dup: its row-wise signature kernel is pinned
        # bit-identical to the FUZZED batch minhash pipeline
        # (tests/test_round10_ops.py), and the stateful-agg harness is
        # covered by tests/test_streaming.py (append twin: same kernel,
        # same agg — only the emission mode differs, pinned by gate)
        "streaming_dedup_minhash",
        "streaming_dedup_minhash_append",
        # generator-only sources: no table input to randomize
        "source_synthetic_events",
        "source_synthetic_stream",
        # error-contract bound calibrated to the driver corpus
        "stats_approx_sketches",
    }
    fuzzed = set(FUZZED) | set(FUZZED_CORPUS) | set(FUZZED_MORE)
    qs = set(entrymod.queries())
    uncovered = qs - fuzzed - EXCLUDED
    assert not uncovered, sorted(uncovered)
    stale = (EXCLUDED & fuzzed) | (EXCLUDED - qs)
    assert not stale, sorted(stale)


def test_all_fuzzed_entries_agree_on_empty_tables(spark, tmp_path):
    """Empty-partition parity (round-8 probe made permanent): every
    fuzz-covered entry must run — not crash — and agree with its oracle
    when EVERY input table has zero rows. An empty daily partition is
    routine at 100 TB; this pinned three real crash classes (zero-arg
    create_map() in the distributed prefix-sum/rank offsets, (0,)-shaped
    driver matrices in the ANN kernels, schema inference on a zero-file
    partitioned read) and one semantic divergence (Spark emits no
    ROLLUP grand-total row on empty input; DuckDB does)."""
    import os

    import pyarrow.parquet as pq

    outdir = str(tmp_path / "empty")
    os.makedirs(outdir)
    for t in TABLES:
        src = f"/root/testdata/sf0.001/{t}.parquet"
        pq.write_table(pq.read_table(src).slice(0, 0), f"{outdir}/{t}.parquet")
    qs, oracles = entrymod.queries(), entrymod.oracle_sql()
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM "
            f"read_parquet('{outdir}/{t}.parquet')"
        )
    diverged = []
    for name in FUZZED + FUZZED_CORPUS + FUZZED_MORE:
        try:
            got = _canon(qs[name](spark, outdir).toPandas())
            want = _canon(con.execute(oracles[name]).fetchdf())
        except Exception as e:  # noqa: BLE001 — collect, assert below
            diverged.append((name, f"ERROR {str(e)[:100]}"))
            continue
        if got != want:
            diverged.append((name, f"{len(got)} vs {len(want)} rows"))
    assert not diverged, diverged


def test_all_fuzzed_entries_agree_on_identical_rows(spark, tmp_path):
    """Mass-tie parity (round-8 probe made permanent): 50 copies of one
    row per table (keys re-sequenced where the schema has one) stress
    every tie-break, hot-key path, and zero-variance aggregate. Pinned
    a real crash: builtin corr() DIVIDE_BY_ZEROs under ANSI on constant
    columns while DuckDB returns NULL."""
    import os

    import pyarrow.parquet as pq

    keycols = {
        "documents": "doc_id",
        "embeddings": "vec_id",
        "events": "event_id",
        "orders": "o_orderkey",
        "customer": "c_custkey",
        "supplier": "s_suppkey",
        "part": "p_partkey",
    }
    outdir = str(tmp_path / "same")
    os.makedirs(outdir)
    for t in TABLES:
        df = (
            pq.read_table(f"/root/testdata/sf0.001/{t}.parquet")
            .slice(0, 1)
            .to_pandas()
        )
        rep = pd.concat([df] * 50, ignore_index=True)
        kc = keycols.get(t)
        if kc:
            rep[kc] = range(1, 51)
        rep.to_parquet(f"{outdir}/{t}.parquet", index=False)
    qs, oracles = entrymod.queries(), entrymod.oracle_sql()
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM "
            f"read_parquet('{outdir}/{t}.parquet')"
        )
    diverged = []
    for name in FUZZED + FUZZED_CORPUS + FUZZED_MORE:
        try:
            got = _canon(qs[name](spark, outdir).toPandas())
            want = _canon(con.execute(oracles[name]).fetchdf())
        except Exception as e:  # noqa: BLE001 — collect, assert below
            diverged.append((name, f"ERROR {str(e)[:100]}"))
            continue
        if got != want:
            diverged.append((name, f"{len(got)} vs {len(want)} rows"))
    assert not diverged, diverged
