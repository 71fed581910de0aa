"""Property-based tests (hypothesis) for the cleaning operators.

The reference's invariants (README.md:123-146 there; SURVEY.md §5) hold
for ANY input, not just the fixture CSVs — hypothesis generates the
inputs. One shared small Spark session keeps example counts practical.
"""

from __future__ import annotations

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from sales_data_etl_pipeline_spark.operators import cleaning

SET = settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)

rows = st.lists(
    st.tuples(
        st.integers(min_value=1, max_value=20),              # key
        st.one_of(st.none(), st.floats(-1e6, 1e6, allow_nan=False)),  # value
    ),
    min_size=1,
    max_size=60,
)


@given(data=rows)
@SET
def test_dedup_never_loses_keys_and_keeps_one_per_key(spark, data):
    df = spark.createDataFrame(
        [(k, v, i) for i, (k, v) in enumerate(data)], "k long, v double, ord long"
    )
    out = cleaning.dedup_keep_first(df, ["k"], "ord")
    got = out.groupBy("k").count().collect()
    assert all(r["count"] == 1 for r in got)
    assert {r.k for r in got} == {k for k, _ in data}
    # survivor is the first occurrence in ord order
    firsts = {}
    for i, (k, v) in enumerate(data):
        firsts.setdefault(k, (v, i))
    for r in out.collect():
        assert (r.v, r.ord) == firsts[r.k]


@given(data=rows, lo=st.integers(-100, 0), span=st.integers(1, 200))
@SET
def test_clamp_bounds_and_row_preservation(spark, data, lo, span):
    hi = lo + span
    df = spark.createDataFrame(
        [(k, v) for k, v in data], "k long, v double"
    )
    out = cleaning.clamp_range(df, "v", lo, hi, flag_col="adj").collect()
    assert len(out) == len(data)
    for r in out:
        if r.v is not None:
            assert lo <= r.v <= hi


@given(data=rows)
@SET
def test_group_median_fill_leaves_no_nulls_when_any_value_exists(spark, data):
    df = spark.createDataFrame([(k, v) for k, v in data], "k long, v double")
    any_value = any(v is not None for _, v in data)
    out = cleaning.fill_group_median(df, "v", "k", flag_col="imp").collect()
    assert len(out) == len(data)  # zero row loss
    if any_value:
        assert all(r.v is not None for r in out)
    # non-null inputs never change
    originals = [(k, v) for k, v in data if v is not None]
    kept = sorted((r.k, r.v) for r in out if not r.imp and r.v is not None)
    assert sorted(originals) == kept


def test_simhash_banded_matches_all_pairs(spark):
    """Banding is exact (pigeonhole): identical pair set to the O(n²)
    verification form, at several hamming budgets."""
    from pyspark.sql import functions as F

    from sales_data_etl_pipeline_spark.operators import dedup
    from sales_data_etl_pipeline_spark.sources.tables import load_testdata

    docs = (
        load_testdata(spark, "/root/testdata/sf0.001", ("documents",))[
            "documents"
        ]
        .select("doc_id", "text")
        .limit(120)
    )
    for k in (2, 6, 11):
        brute = {
            (r.id_a, r.id_b, r.hamming)
            for r in dedup.simhash_pairs(docs, max_hamming=k).collect()
        }
        banded = {
            (r.id_a, r.id_b, r.hamming)
            for r in dedup.simhash_pairs_banded(docs, max_hamming=k).collect()
        }
        assert banded == brute


def test_minhash_verify_modes_identical(spark):
    """verify='join' (bounded row width) must return exactly the pairs of
    verify='sets', including with an adversarially large document."""
    from pyspark.sql import Row, functions as F

    from sales_data_etl_pipeline_spark.operators import dedup
    from sales_data_etl_pipeline_spark.sources.tables import load_testdata

    base = (
        load_testdata(spark, "/root/testdata/sf0.001", ("documents",))[
            "documents"
        ]
        .select("doc_id", "text")
        .limit(80)
    )
    # near-dups + one ~20k-shingle doc (the row-width hazard for 'sets')
    big = " ".join(f"tok{i % 997} w{i}" for i in range(20000))
    extra = spark.createDataFrame(
        [Row(doc_id=900001, text=big), Row(doc_id=900002, text=big + " tail")]
    )
    docs = base.unionByName(
        base.limit(10).select((F.col("doc_id") + 5000).alias("doc_id"), "text")
    ).unionByName(extra)
    sets_out = {
        (r.id_a, r.id_b, r.jaccard)
        for r in dedup.minhash_lsh_pairs(docs, threshold=0.5).collect()
    }
    join_out = {
        (r.id_a, r.id_b, r.jaccard)
        for r in dedup.minhash_lsh_pairs(
            docs, threshold=0.5, verify="join"
        ).collect()
    }
    assert join_out == sets_out
    assert any(a == 900001 and b == 900002 for a, b, _ in join_out)


def test_cluster_representatives_keep_best(spark):
    from pyspark.sql import functions as F

    from sales_data_etl_pipeline_spark.operators import dedup

    clusters = spark.createDataFrame(
        [(1, 1), (2, 1), (3, 1), (7, 7), (8, 7)],
        "doc_id long, component long",
    )
    scores = spark.createDataFrame(
        [(1, 5), (2, 9), (3, 9), (7, 2), (8, 2)], "doc_id long, score long"
    )
    got = {
        r["component"]: (r["doc_id"], r["score"])
        for r in dedup.select_cluster_representatives(clusters, scores).collect()
    }
    # component 1: score tie 9/9 between docs 2,3 -> smallest id wins
    assert got == {1: (2, 9), 7: (7, 2)}


def test_quality_check_counts_null_as_violation(spark):
    from sales_data_etl_pipeline_spark.operators import quality

    df = spark.createDataFrame(
        [(1, 5.0), (2, None), (3, -1.0), (1, 2.0)], "k long, v double"
    )
    got = {
        r["rule"]: r["n_violations"]
        for r in quality.check(
            df, {"v_positive": "v > 0"}, {"k_unique": ["k"]}
        ).collect()
    }
    # NULL v must count as a violation (three-valued logic trap)
    assert got == {"v_positive": 2, "k_unique": 1}


# --- round-5 operators ------------------------------------------------------

cdc_rows = st.lists(
    st.tuples(
        st.integers(min_value=1, max_value=8),     # key
        st.sampled_from(["I", "U", "D"]),          # op
        st.text(alphabet="abc", min_size=1, max_size=3),  # attr
    ),
    min_size=1,
    max_size=30,
)


@given(log=cdc_rows)
@SET
def test_cdc_apply_equals_sequential_replay(spark, log):
    from sales_data_etl_pipeline_spark.operators import merge

    target_rows = [(1, "t1"), (2, "t2"), (3, "t3")]
    target = spark.createDataFrame(target_rows, "k long, v string")
    changelog = spark.createDataFrame(
        [(k, v, op, seq) for seq, (k, op, v) in enumerate(log)],
        "k long, v string, op string, seq long",
    )
    got = {
        (r.k, r.v) for r in merge.cdc_apply(target, changelog, "k").collect()
    }
    # reference model: replay the log in sequence order
    state = dict(target_rows)
    for k, op, v in log:
        if op == "D":
            state.pop(k, None)
        else:
            state[k] = v
    assert got == set(state.items())


rank_rows = st.lists(
    st.tuples(st.integers(0, 50), st.integers(0, 1_000_000)),
    min_size=1,
    max_size=60,
    unique_by=lambda t: t[1],
)


@given(data=rank_rows)
@SET
def test_distributed_rank_is_a_permutation_in_order(spark, data):
    from pyspark.sql import Window

    from sales_data_etl_pipeline_spark.operators import rank

    df = spark.createDataFrame(data, "v long, uid long")
    order = [F.col("v").desc(), F.col("uid").asc()]
    got, n = rank.distributed_row_number(df, order, rank_col="rk")
    rows_out = got.collect()
    assert n == len(data)
    assert sorted(r.rk for r in rows_out) == list(range(1, len(data) + 1))
    want = {
        (r.v, r.uid): r.rk
        for r in df.withColumn(
            "rk", F.row_number().over(Window.orderBy(*order))
        ).collect()
    }
    assert all(want[(r.v, r.uid)] == r.rk for r in rows_out)


@given(
    n=st.integers(1, 200),
    seq=st.integers(4, 40),
    overlap_frac=st.floats(0.0, 0.9),
)
@SET
def test_chunking_covers_every_token_exactly_stride_apart(spark, n, seq, overlap_frac):
    stride = max(1, int(seq * (1 - overlap_frac)))
    starts = [0]
    while starts[-1] + seq < n:
        starts.append(starts[-1] + stride)
    # the plan-side formula: 1 + max(0, (n - (seq - stride + 1)) div stride)
    k = 1 + max(0, (n - (seq - stride + 1)) // stride)
    assert k == len(starts)
    # chunks tile the doc: first covers 0, last reaches the end
    assert starts[-1] + seq >= n


def test_embedding_lsh_recall_pinned_vs_all_pairs(spark):
    """The gated dedup_embedding_cosine plan is the banded LSH form
    (round-6 swap); the all-pairs cartesian survives only as this
    test's ground truth. Hyperplanes are md5-derived (no RNG), so on
    the fixed testdata the banded pair set is deterministic — pin it
    to the exact all-pairs set at threshold 0.99. The planted
    near-dups (one coordinate +0.05) sit at cosine ≈ 1, where every
    sign bit agrees, so banding recall is 100% here by construction."""
    from sales_data_etl_pipeline_spark.operators import dedup
    from sales_data_etl_pipeline_spark.plans.llm_demo import (
        _emb_with_near_dups,
    )

    emb = _emb_with_near_dups(spark, "/root/testdata/sf0.001")
    brute = {
        (r.id_a, r.id_b, r.cosine)
        for r in dedup.embedding_near_dup_pairs(emb, threshold=0.99).collect()
    }
    banded = {
        (r.id_a, r.id_b, r.cosine)
        for r in dedup.embedding_lsh_pairs(emb, threshold=0.99).collect()
    }
    assert brute, "fixture must plant at least one near-dup pair"
    assert banded == brute


def test_minhash_hot_shingle_cap_preserves_recall(spark):
    """Stop-shingle removal (max_shingle_df) must not change the pair
    set at threshold 0.5 on the planted near-dup fixture — the dup
    pairs sit at jaccard ≈ 1 where dropping corpus-wide boilerplate
    shingles moves nothing across the threshold. Checked at a loose
    and an aggressive cap."""
    from sales_data_etl_pipeline_spark.operators import dedup
    from sales_data_etl_pipeline_spark.plans.llm_demo import (
        _docs_with_near_dups,
    )

    docs = _docs_with_near_dups(spark, "/root/testdata/sf0.001")
    plain = {
        (r.id_a, r.id_b)
        for r in dedup.minhash_lsh_pairs(docs, threshold=0.5).collect()
    }
    assert plain, "fixture must plant near-dup pairs"
    for f in (0.5, 0.1):
        capped = {
            (r.id_a, r.id_b)
            for r in dedup.minhash_lsh_pairs(
                docs, threshold=0.5, max_shingle_df=f
            ).collect()
        }
        assert capped == plain


def test_minhash_hot_shingle_cap_drops_boilerplate_candidates(spark):
    """On a corpus where every doc shares one boilerplate sentence, the
    cap must actually remove the hot shingles (shrinking per-doc
    shingle sets) while still finding the genuinely duplicated pair."""
    from pyspark.sql import Row

    from sales_data_etl_pipeline_spark.operators import dedup

    boiler = "all rights reserved contact us at example dot com for terms"
    rows = [
        Row(doc_id=i, text=f"{boiler} unique content piece {i} alpha "
            f"beta{i} gamma{i} delta{i} epsilon{i} zeta{i}")
        for i in range(40)
    ]
    # one true near-dup pair: 100 and 101 share their non-boilerplate text
    rows += [
        Row(doc_id=100, text=f"{boiler} shared body one two three four five six seven"),
        Row(doc_id=101, text=f"{boiler} shared body one two three four five six seven"),
    ]
    docs = spark.createDataFrame(rows)
    capped = {
        (r.id_a, r.id_b)
        for r in dedup.minhash_lsh_pairs(
            docs, threshold=0.5, max_shingle_df=0.5
        ).collect()
    }
    assert (100, 101) in capped
    # boilerplate-only similarity must not manufacture pairs among the
    # 40 otherwise-distinct docs once the hot shingles are gone
    assert all(a == 100 and b == 101 for a, b in capped)


def test_incremental_minhash_equals_cross_parity_pairs(spark):
    """minhash_lsh_incremental(base, inc) must equal the cross-side
    subset of the full-corpus pair set, reduced to best-match-per-
    incoming-doc — i.e. splitting the corpus never changes which
    (base, incoming) pairs the banding finds."""
    from pyspark.sql import functions as F

    from sales_data_etl_pipeline_spark.operators import dedup
    from sales_data_etl_pipeline_spark.sources.tables import load_testdata

    base = (
        load_testdata(spark, "/root/testdata/sf0.001", ("documents",))[
            "documents"
        ]
        .select("doc_id", "text")
        .limit(60)
    )
    inc = base.filter(F.col("doc_id") % 5 == 0).select(
        (F.col("doc_id") + 5000).alias("doc_id"),
        F.expr("substring(text, 1, greatest(length(text) - 25, 1))").alias(
            "text"
        ),
    )
    got = {
        (r.doc_id, r.base_id, r.jaccard)
        for r in dedup.minhash_lsh_incremental(base, inc).collect()
    }
    full = dedup.minhash_lsh_pairs(
        base.unionByName(inc), threshold=0.5
    ).collect()
    cross = {}
    for r in full:
        lo, hi = (r.id_a, r.id_b) if r.id_a < r.id_b else (r.id_b, r.id_a)
        if lo < 5000 <= hi:  # base ⋈ incoming only
            best = cross.get(hi)
            if best is None or (r.jaccard, -lo) > (best[1], -best[0]):
                cross[hi] = (lo, r.jaccard)
    want = {(hi, lo, j) for hi, (lo, j) in cross.items()}
    assert got == want
    assert got  # non-degenerate: truncation keeps jaccard above 0.5


def test_incremental_minhash_verify_join_matches_sets(spark):
    """verify='join' (bounded-memory candidate-join counting — the
    100 TB mode for unbounded document sizes) must produce the exact
    same best-match set as the default carried-set verification, and
    its plan must carry NO collect_list (that's the point)."""
    from pyspark.sql import functions as F

    from sales_data_etl_pipeline_spark.operators import dedup
    from sales_data_etl_pipeline_spark.sources.tables import load_testdata

    base = (
        load_testdata(spark, "/root/testdata/sf0.001", ("documents",))[
            "documents"
        ]
        .select("doc_id", "text")
        .limit(60)
    )
    inc = base.filter(F.col("doc_id") % 5 == 0).select(
        (F.col("doc_id") + 5000).alias("doc_id"),
        F.expr("substring(text, 1, greatest(length(text) - 25, 1))").alias(
            "text"
        ),
    )
    joined = dedup.minhash_lsh_incremental(base, inc, verify="join")
    plan = joined._jdf.queryExecution().analyzed().toString()
    assert "collect_list" not in plan
    got_join = {(r.doc_id, r.base_id, r.jaccard) for r in joined.collect()}
    got_sets = {
        (r.doc_id, r.base_id, r.jaccard)
        for r in dedup.minhash_lsh_incremental(
            base, inc, verify="sets"
        ).collect()
    }
    assert got_join == got_sets
    assert got_join


# --- banded Levenshtein: threshold form ≡ full DP + filter ------------------

_lev_texts = st.lists(
    st.tuples(
        st.sampled_from(["aaaa", "abab", "bbbb"]),          # shared prefix
        st.text(alphabet="ab", min_size=0, max_size=12),    # suffix
    ),
    min_size=2,
    max_size=10,
)


def _lev_ref(a: str, b: str) -> int:
    """Reference full-DP Levenshtein (no band, no early-out)."""
    prev = list(range(len(b) + 1))
    for i, ca in enumerate(a, 1):
        cur = [i]
        for j, cb in enumerate(b, 1):
            cur.append(
                min(prev[j] + 1, cur[j - 1] + 1, prev[j - 1] + (ca != cb))
            )
        prev = cur
    return prev[-1]


@given(data=_lev_texts, max_dist=st.integers(1, 6))
@SET
def test_levenshtein_pairs_banded_dp_matches_full_dp(spark, data, max_dist):
    """The 3-arg threshold kernel must accept EXACTLY the pairs a full
    DP + ``<= max_dist`` filter accepts, with identical distances and
    trunc-div sim_ppm — the equivalence the banded rewrite claims
    (−1 rejects ≡ the rows the old post-DP filter dropped). Blocking
    (4-char prefix) and the length lower bound are reproduced in the
    reference so only the DP itself is under test."""
    from sales_data_etl_pipeline_spark.operators import dedup

    docs = [(i, p + s) for i, (p, s) in enumerate(data)]
    got = {
        (r.doc_a, r.doc_b): (r.lev_dist, r.sim_ppm)
        for r in dedup.levenshtein_pairs(
            spark.createDataFrame(docs, "doc_id long, text string"),
            prefix_len=4,
            max_dist=max_dist,
            cap=600,
            max_block=50,
        ).collect()
    }
    want = {}
    for ia, ta in docs:
        for ib, tb in docs:
            if ia >= ib or ta[:4] != tb[:4]:
                continue
            if abs(len(ta) - len(tb)) > max_dist:
                continue
            d = _lev_ref(ta, tb)
            if d <= max_dist:
                m = max(len(ta), len(tb))
                want[(ia, ib)] = (d, (m - d) * 1_000_000 // m)
    assert got == want


# --- winnowing: hash-only twin ≡ positional form's hash projection ----------

_winnow_docs = st.lists(
    st.text(alphabet="abcd ", min_size=0, max_size=40),
    min_size=1,
    max_size=8,
)


@given(texts=_winnow_docs, window=st.integers(2, 5))
@SET
def test_winnow_hash_twin_matches_positional_projection(spark, texts, window):
    """``_winnow_fp_hashes`` (the primitive-array winnow_pairs feed)
    must select exactly the hash set of the positional form — the
    position-independence claim the pairs-path optimization rests on:
    the rightmost-min tie rule only picks WHICH position carries an
    equal hash, never which hash value a frame selects. Random texts
    over a tiny alphabet force hash ties and truncated final frames."""
    from sales_data_etl_pipeline_spark.operators import dedup

    docs = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )
    kw = dict(kgram=4, window=window)
    positional = (
        dedup.winnow_fingerprints(docs, **kw)
        .select("doc_id", "fp_hash")
        .distinct()
    )
    twin = dedup._winnow_fp_hashes(docs, **kw)
    assert sorted(map(tuple, twin.collect())) == sorted(
        map(tuple, positional.collect())
    )


# --- triangle counts: degree-ordered orientation ≡ brute force --------------

_edges = st.lists(
    st.tuples(st.integers(0, 9), st.integers(0, 9)).filter(
        lambda e: e[0] != e[1]
    ),
    min_size=1,
    max_size=25,
)


@given(edges=_edges)
@SET
def test_triangle_counts_match_brute_force_on_random_graphs(spark, edges):
    """The degree-ordered wedge-close must count exactly the triangles a
    brute-force node-triple enumeration finds, per node, with explicit
    0 rows for triangle-free nodes that have edges — across random
    multigraph inputs (duplicate and reversed pairs collapse to one
    undirected edge; the operator's contract is a PAIR LIST, which
    near-dup emitters produce deduped but symmetric callers may not)."""
    from pyspark.sql import Row

    from sales_data_etl_pipeline_spark.operators import dedup

    und = {tuple(sorted(e)) for e in edges}
    pairs = spark.createDataFrame(
        [Row(id_a=a, id_b=b) for a, b in sorted(und)]
    )
    got = {
        r.node: r.n_triangles
        for r in dedup.triangle_counts(pairs).collect()
    }
    nodes = sorted({n for e in und for n in e})
    adj = {n: {b for a, b in und if a == n} | {a for a, b in und if b == n}
           for n in nodes}
    want = {
        n: sum(
            1
            for a in adj[n]
            for b in adj[n]
            if a < b and tuple(sorted((a, b))) in und
        )
        for n in nodes
    }
    assert got == want


# --- interval-overlap join: bucket blocking ≡ brute force --------------------

_ivals = st.lists(
    st.tuples(st.integers(0, 500), st.integers(0, 200)),  # (start, span)
    min_size=1,
    max_size=12,
)


@given(lefts=_ivals, rights=_ivals, bucket=st.sampled_from([60, 100, 128]))
@SET
def test_interval_overlap_join_matches_brute_force(spark, lefts, rights, bucket):
    """Bucket blocking must reproduce the exact predicate's result —
    closed left × half-open right, ``l_start < r_end AND l_end >=
    r_start``, overlap = min(ends) − max(starts) — for random interval
    sets and bucket sizes below/above the typical span (multi-bucket
    spans exercise the distinct that collapses double matches; empty
    right intervals are dropped by contract)."""
    from pyspark.sql import Row

    from sales_data_etl_pipeline_spark.operators import temporal

    left = spark.createDataFrame(
        [Row(sid=i, l_start=s, l_end=s + d) for i, (s, d) in enumerate(lefts)]
    )
    right = spark.createDataFrame(
        [Row(wid=i, r_start=s, r_end=s + d) for i, (s, d) in enumerate(rights)]
    )
    got = {
        (r.sid, r.wid): r.overlap_s
        for r in temporal.interval_overlap_join(
            left, right, bucket_seconds=bucket
        ).collect()
    }
    want = {}
    for i, (ls, ld) in enumerate(lefts):
        for j, (rs, rd) in enumerate(rights):
            le, re_ = ls + ld, rs + rd
            if re_ <= rs:  # empty right interval: dropped by contract
                continue
            if ls < re_ and le >= rs:
                want[(i, j)] = min(le, re_) - max(ls, rs)
    assert got == want


# --- as-of join: tagged-union window ≡ reference model -----------------------

_asof_left = st.lists(
    st.tuples(st.integers(1, 3), st.integers(0, 20)),   # (key, ts)
    min_size=1,
    max_size=12,
)
_asof_right = st.lists(
    st.tuples(
        st.integers(1, 3),                               # key
        st.integers(0, 20),                              # ts (dups likely)
        st.text(alphabet="xyz", min_size=1, max_size=2),  # tag
    ),
    min_size=0,
    max_size=12,
)


@given(lefts=_asof_left, rights=_asof_right,
       direction=st.sampled_from(["backward", "forward"]))
@SET
def test_asof_join_matches_reference_with_duplicate_timestamps(
    spark, lefts, rights, direction
):
    """Both directions must match a sequential reference — latest right
    at-or-before (earliest at-or-after), inclusive on equal timestamps,
    and among MULTIPLE right rows at the winning timestamp the
    lexicographically greatest carried struct wins (the documented
    deterministic tie rule; without the struct key in the window order
    the tie group is partition-order dependent). Duplicate right
    timestamps per key are the generator's common case on purpose."""
    from pyspark.sql import Row

    from sales_data_etl_pipeline_spark.operators import temporal

    left = spark.createDataFrame(
        [Row(eid=i, k=k, ts=float(t)) for i, (k, t) in enumerate(lefts)]
    )
    right = spark.createDataFrame(
        [Row(k=k, ts=float(t), tag=g) for k, t, g in rights],
        "k long, ts double, tag string",
    )
    got = {
        r.eid: r.tag_matched
        for r in temporal.asof_join(
            left, right, on="k", right_cols=["tag"], direction=direction
        ).collect()
    }
    want = {}
    for i, (k, t) in enumerate(lefts):
        if direction == "backward":
            cand = [(rt, g) for rk, rt, g in rights if rk == k and rt <= t]
            best_ts = max((rt for rt, _ in cand), default=None)
        else:
            cand = [(rt, g) for rk, rt, g in rights if rk == k and rt >= t]
            best_ts = min((rt for rt, _ in cand), default=None)
        if best_ts is None:
            want[i] = None
        else:
            # struct is (tag, _rts); _rts ties → max tag wins
            want[i] = max(g for rt, g in cand if rt == best_ts)
    assert got == want


# --- k-core: iterative peeling ≡ reference fixed point ------------------------


@given(edges=_edges, k=st.integers(2, 4))
@SET
def test_kcore_matches_reference_peeling(spark, edges, k):
    """The distributed peel must converge to exactly the reference
    k-core (sequential peel-to-fixed-point), with each survivor's
    degree counted INSIDE the core — across random graphs including
    ones whose k-core is empty (every node peeled) and cascades that
    peel one node per round."""
    from pyspark.sql import Row

    from sales_data_etl_pipeline_spark.operators import dedup

    und = {tuple(sorted(e)) for e in edges}
    pairs = spark.createDataFrame(
        [Row(id_a=a, id_b=b) for a, b in sorted(und)]
    )
    got = {
        r.doc_id: r.core_degree
        for r in dedup.kcore_decompose(
            pairs, k=k, max_iterations=30
        ).collect()
    }
    alive = {n for e in und for n in e}
    while True:
        deg = {n: 0 for n in alive}
        for a, b in und:
            if a in alive and b in alive:
                deg[a] += 1
                deg[b] += 1
        drop = {n for n in alive if deg[n] < k}
        if not drop:
            break
        alive -= drop
    assert got == {n: deg[n] for n in alive}


# --- connected components: min-label propagation ≡ union-find reference ------


@given(edges=_edges)
@SET
def test_connected_components_match_union_find(spark, edges):
    """Min-label propagation must assign every node the minimum doc id
    reachable through the pair graph — exactly a union-find reference's
    components — on random graphs (chains, forests, multi-component)."""
    from pyspark.sql import Row

    from sales_data_etl_pipeline_spark.operators import dedup

    und = {tuple(sorted(e)) for e in edges}
    pairs = spark.createDataFrame(
        [Row(id_a=a, id_b=b) for a, b in sorted(und)]
    )
    got = {
        r.doc_id: r.component
        for r in dedup.connected_components(
            pairs, max_iterations=40
        ).collect()
    }
    parent = {}

    def find(x):
        while parent.setdefault(x, x) != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in und:
        parent[find(a)] = find(b)
    roots = {}
    for n in {x for e in und for x in e}:
        roots.setdefault(find(n), []).append(n)
    want = {n: min(mem) for mem in roots.values() for n in mem}
    assert got == want
