"""Round-8 operator tests: banded containment (recall/subset property +
stop-shingle cap), join-verify incremental gate plan, integer-DCT pHash
(independent reference + upscale stability), session-scoped funnel."""

from __future__ import annotations

from pyspark.sql import Row
from pyspark.sql import functions as F


def _docs_fixture(spark, n=60):
    from sales_data_etl_pipeline_spark.sources.tables import load_testdata

    docs = (
        load_testdata(spark, "/root/testdata/sf0.001", ("documents",))[
            "documents"
        ]
        .select("doc_id", "text")
        .limit(n)
    )
    copies = docs.filter(F.col("doc_id") % 5 == 0).select(
        (F.col("doc_id") + 5000).alias("doc_id"),
        F.expr("substring(text, 1, greatest(length(text) - 25, 1))").alias(
            "text"
        ),
    )
    return docs.unionByName(copies)


def test_minhash_containment_subset_of_exact_with_high_jaccard_recall(spark):
    """Every banded pair must appear in the exact primitive's output
    with the IDENTICAL containment value (the re-check is exact — LSH
    only limits which pairs are examined), and every truncated-copy
    pair (high jaccard, the banding S-curve's easy region) must be
    recalled."""
    from sales_data_etl_pipeline_spark.operators import dedup

    d = _docs_fixture(spark)
    exact = {
        (r.doc_id, r.host_id): r.containment
        for r in dedup.containment_pairs(d, threshold=0.6).collect()
    }
    banded = {
        (r.doc_id, r.host_id): r.containment
        for r in dedup.minhash_containment_pairs(d, threshold=0.6).collect()
    }
    assert banded  # non-degenerate
    for k, v in banded.items():
        assert k in exact and exact[k] == v, k
    # truncated copies are near-dups (jaccard ≈ 0.8, the steep part of
    # the 1-(1-j⁴)⁴ S-curve → per-pair candidate probability ≈ 0.88):
    # recall is the banding trade, not a bug — require the majority of
    # copy→original pairs back, all drawn from the exact set
    copy_hits = {k for k in banded if k[0] >= 5000 and k[1] == k[0] - 5000}
    expected = {k for k in exact if k[0] >= 5000 and k[1] == k[0] - 5000}
    assert expected and copy_hits <= expected
    assert len(copy_hits) * 2 >= len(expected)


def test_containment_stop_shingle_cap_drops_boilerplate_pairs(spark):
    """Two docs sharing ONLY a boilerplate shingle (present in every
    doc) pair up without the cap and must NOT pair with it; a genuine
    near-dup pair survives the cap."""
    from sales_data_etl_pipeline_spark.operators import dedup

    boiler = "all rights reserved by the corpus"
    rows = [
        Row(doc_id=1, text=f"alpha beta gamma delta epsilon zeta {boiler}"),
        Row(doc_id=2, text=f"alpha beta gamma delta epsilon zeta eta {boiler}"),
        Row(doc_id=3, text=f"one two three four five six {boiler}"),
        Row(doc_id=4, text=f"seven eight nine ten eleven twelve {boiler}"),
    ]
    df = spark.createDataFrame(rows)
    uncapped = {
        (r.doc_id, r.host_id)
        for r in dedup.containment_pairs(df, threshold=0.3).collect()
    }
    capped = {
        (r.doc_id, r.host_id)
        for r in dedup.containment_pairs(
            df, threshold=0.3, max_shingle_df=0.9
        ).collect()
    }
    # boilerplate-only overlap pairs (3,4)x exist only before the cap
    assert (3, 4) in uncapped and (4, 3) in uncapped
    assert (3, 4) not in capped and (4, 3) not in capped
    # the genuine near-dup pair (1,2) survives the cap
    assert (1, 2) in capped and (2, 1) in capped


def test_dedup_incremental_join_gate_has_no_collect_list(spark):
    """The gated join-verify entry must keep per-row width O(1): no
    collect_list anywhere in its analyzed plan."""
    from sales_data_etl_pipeline_spark.plans import llm_demo

    df = llm_demo.dedup_incremental_join(spark, "/root/testdata/sf0.001")
    plan = df._jdf.queryExecution().analyzed().toString()
    assert "collect_list" not in plan


def _ref_phash(gray):
    """Independent pHash reference: plain-Python double loops over the
    same integer basis (no numpy matmul/argsort shared with the
    kernel)."""
    from sales_data_etl_pipeline_spark.operators.multimodal import phash_basis

    B = phash_basis()
    cx = [
        [sum(B[u][x] * gray[y][x] for x in range(32)) for u in range(8)]
        for y in range(32)
    ]
    coeffs = [
        sum(B[v][y] * cx[y][u] for y in range(32))
        for v in range(8)
        for u in range(8)
    ]
    s = sorted(coeffs)
    t = s[31] + s[32]
    bits = [1 if 2 * c > t else 0 for c in coeffs]
    out = []
    for j in range(8):
        byte = sum(bits[8 * j + k] << (7 - k) for k in range(8))
        out.append(f"{byte:02x}")
    return "".join(out), sum(bits)


def test_phash_matches_independent_reference_on_nonuniform_raster(spark):
    """Hand-built BMP whose rows DIFFER (the gate fixture is constant
    in y, so this pins the vertical DCT + the bottom-up flip): kernel
    output must equal a plain-Python reference computed on the VISUAL
    raster."""
    from sales_data_etl_pipeline_spark.operators import multimodal as mm

    w, h, seed = 20, 24, 5
    base = mm.bmp_bytes(w, h, seed)
    row_len = (w * 3 + 3) & ~3
    # storage rows vary with their index; storage row 0 is the BOTTOM
    # visual row of a positive-height BMP
    raster = b"".join(
        bytes((seed + x + 7 * r) % 256 for x in range(row_len))
        for r in range(h)
    )
    buf = base[:54] + raster
    got = (
        mm.phash_images(
            spark.createDataFrame([Row(media_id=1, payload=bytearray(buf))])
        )
        .collect()[0]
    )
    # reference works on the visual (top-down) pixel grid
    ys = [(i * h) // 32 for i in range(32)]
    xs = [(i * w) // 32 for i in range(32)]
    visual = [raster[(h - 1 - r) * row_len : (h - 1 - r) * row_len + w * 3]
              for r in range(h)]
    gray = [
        [sum(visual[y][3 * x + c] for c in range(3)) // 3 for x in xs]
        for y in ys
    ]
    want_hash, want_bits = _ref_phash(gray)
    assert got.phash == want_hash
    assert got.n_bits_set == want_bits


def test_phash_is_stable_under_2x_upscale(spark):
    """The perceptual property: nearest-neighbor 2× upscale must not
    move the hash (the 32×32 sampling grid composes with the resize
    index map into the identical source pixels)."""
    from sales_data_etl_pipeline_spark.operators import multimodal as mm

    rows = []
    for seed in (0, 3, 7, 11):
        img = mm.bmp_bytes(20, 24, seed)
        rows.append(Row(media_id=seed, payload=bytearray(img)))
        rows.append(
            Row(
                media_id=seed + 1000,
                payload=bytearray(mm.resize_bmp(img, 40, 48)),
            )
        )
    got = {
        r.media_id: r.phash
        for r in mm.phash_images(spark.createDataFrame(rows)).collect()
    }
    for seed in (0, 3, 7, 11):
        assert got[seed] == got[seed + 1000], seed


def test_session_funnel_counts_sessions_not_users(spark):
    """A chain completing inside one 30-min session converts; the same
    chain split across sessions does not. Sessions lacking the entry
    step never count."""
    from sales_data_etl_pipeline_spark.operators import temporal

    rows = [
        # user 1: full chain inside one session
        Row(event_id=1, user_id=1, event_type="view", ts="2024-01-01 10:00:00"),
        Row(event_id=2, user_id=1, event_type="click", ts="2024-01-01 10:05:00"),
        Row(event_id=3, user_id=1, event_type="purchase", ts="2024-01-01 10:10:00"),
        # user 2: purchase lands in a NEW session (gap > 30 min)
        Row(event_id=4, user_id=2, event_type="view", ts="2024-01-01 10:00:00"),
        Row(event_id=5, user_id=2, event_type="click", ts="2024-01-01 10:05:00"),
        Row(event_id=6, user_id=2, event_type="purchase", ts="2024-01-01 12:00:00"),
    ]
    ev = spark.createDataFrame(rows).withColumn("ts", F.to_timestamp("ts"))
    got = {
        r.step_idx: r.n_sessions
        for r in temporal.session_funnel_counts(
            ev, ("view", "click", "purchase")
        ).collect()
    }
    # two sessions reach view and click; only user 1's converts
    assert got == {0: 2, 1: 2, 2: 1}


def test_pq_encode_exact_integer_reference(spark):
    """Tiny hand case: codes and d2_total must equal a plain-Python
    reference over the same global integer grid, non-finite corpus
    vectors are excluded, ties break to the smallest centroid id."""
    import numpy as np

    from sales_data_etl_pipeline_spark.operators import embeddings as E

    dim, nb = 8, 2
    vecs = {
        1: [0.1] * 8,
        2: [1.0] * 4 + [-1.0] * 4,
        3: [float("nan")] * 8,  # excluded
        4: [0.0] * 8,  # zero vector encodes fine (PQ, not cosine)
    }
    cents = {10: [0.0] * 8, 20: [1.0] * 8, 30: [0.0] * 8}  # 30 ties 10
    corpus = spark.createDataFrame(
        [Row(vec_id=k, embedding=v) for k, v in vecs.items()]
    )
    codebook = spark.createDataFrame(
        [Row(centroid_id=k, embedding=v) for k, v in cents.items()]
    )
    got = {
        r.vec_id: (r.codes, r.d2_total)
        for r in E.pq_encode(corpus, codebook, n_blocks=nb).collect()
    }
    assert set(got) == {1, 2, 4}

    def q(v):
        return [
            max(min(int(np.floor(x * 16 + 0.5)), 127), -127) for x in v
        ]

    qc = {k: q(v) for k, v in cents.items()}
    for vid in (1, 2, 4):
        qv = q(vecs[vid])
        codes, d2 = [], 0
        for m in range(nb):
            best = min(
                sorted(qc),  # ascending id → smallest-id tie-break
                key=lambda c: sum(
                    (qv[i] - qc[c][i]) ** 2 for i in range(m * 4, m * 4 + 4)
                ),
            )
            codes.append(best)
            d2 += sum(
                (qv[i] - qc[best][i]) ** 2 for i in range(m * 4, m * 4 + 4)
            )
        assert got[vid] == (",".join(map(str, codes)), d2), vid
    # the zero vector ties centroids 10 and 30 → smallest id 10 wins
    assert got[4][0] == "10,10"


def test_pq_encode_all_dead_codebook_yields_empty(spark):
    """An all-non-finite (or empty) codebook defines no codes: the
    result is the schema-correct EMPTY frame — matching the oracle,
    whose finite-filtered codebook CTE yields zero rows — not an
    exception (empty partitions are routine at scale)."""
    from sales_data_etl_pipeline_spark.operators import embeddings as E

    corpus = spark.createDataFrame([Row(vec_id=1, embedding=[0.5] * 8)])
    codebook = spark.createDataFrame(
        [Row(centroid_id=1, embedding=[float("inf")] * 8)]
    )
    out = E.pq_encode(corpus, codebook, n_blocks=2)
    assert out.columns == ["vec_id", "codes", "d2_total"]
    assert out.collect() == []


def test_partitioned_roundtrip_scan_is_partition_pruned(spark):
    """The gate's read-back plan must carry a PartitionFilters entry on
    event_type — proof the selected-type scan lists only its partition
    directories instead of reading the whole table."""
    from sales_data_etl_pipeline_spark.plans import llm_demo

    df = llm_demo.source_partitioned_roundtrip(
        spark, "/root/testdata/sf0.001"
    )
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan
    import re

    m = re.search(r"PartitionFilters: \[([^\]]*)\]", plan)
    assert m and "event_type" in m.group(1), m


def test_pq_adc_ranks_by_true_grid_distance(spark):
    """ADC with a codebook equal to the corpus itself: every vector's
    code IS itself (d2 quantization error 0), so the ADC distance to a
    query equals the exact grid distance — top-1 must be the query's
    own row at distance == its own-code error (0)."""
    from sales_data_etl_pipeline_spark.operators import similarity as sim

    rows = [
        Row(vec_id=i, embedding=[float(i)] * 4 + [float(-i)] * 4)
        for i in range(1, 6)
    ]
    corpus = spark.createDataFrame(rows)
    got = sim.pq_adc_topk(
        corpus,
        corpus.select(
            F.col("vec_id").alias("centroid_id"), "embedding"
        ),
        corpus.filter(F.col("vec_id") == 3),
        k=3,
        n_blocks=2,
        dim=8,
    ).collect()
    by_rank = {r.rank: (r.neighbor_id, r.d2_adc) for r in got}
    assert by_rank[1] == (3, 0)
    # neighbors 2 and 4 are equidistant on the grid → smallest id first
    assert by_rank[2][0] == 2 and by_rank[3][0] == 4
    assert by_rank[2][1] == by_rank[3][1] > 0


def test_incremental_containment_catches_excerpt_jaccard_misses(spark):
    """The motivating case: a short excerpt of a long base doc has LOW
    jaccard (union swamps it) but HIGH containment — the jaccard
    incremental admit filter passes it, the containment incremental
    flags it."""
    from sales_data_etl_pipeline_spark.operators import dedup

    words = [f"w{i}" for i in range(200)]
    base = spark.createDataFrame(
        [
            Row(doc_id=1, text=" ".join(words)),
            Row(doc_id=2, text=" ".join(f"x{i}" for i in range(50))),
        ]
    )
    # incoming: a 20-word excerpt of base doc 1 (10% of its shingles)
    incoming = spark.createDataFrame(
        [Row(doc_id=100, text=" ".join(words[40:60]))]
    )
    jac = dedup.minhash_lsh_incremental(
        base, incoming, threshold=0.5, verify="join"
    ).collect()
    con = dedup.containment_incremental(
        base, incoming, threshold=0.9
    ).collect()
    assert jac == []  # jaccard ≈ 18/198 ≪ 0.5: admit filter passes it
    assert len(con) == 1 and con[0].doc_id == 100 and con[0].base_id == 1
    assert con[0].containment == 1.0  # every excerpt shingle is in base


def test_pagerank_conservation_and_centrality(spark):
    """Integer PageRank invariants: total mass stays ~10⁹ ppb (integer
    division loses < 1 ppb per edge/node per iteration), and the hub of
    a star graph outranks every leaf."""
    from sales_data_etl_pipeline_spark.operators import dedup

    pairs = spark.createDataFrame(
        [Row(id_a=0, id_b=i) for i in range(1, 9)]  # star: 0 is the hub
        + [Row(id_a=10, id_b=11)]  # plus a detached pair
    )
    got = {r.doc_id: r.rank_ppb for r in dedup.pagerank(pairs).collect()}
    assert set(got) == {0, *range(1, 9), 10, 11}
    total = sum(got.values())
    n, iters, edges = 11, 3, 18  # directed edge count after mirroring
    slack = iters * (edges + 100 * n) + n
    assert 1_000_000_000 - slack <= total <= 1_000_000_000
    hub = got[0]
    assert all(hub > got[i] for i in range(1, 9))
    # symmetric leaves tie exactly (deterministic integer arithmetic)
    assert len({got[i] for i in range(1, 9)}) == 1
    assert got[10] == got[11]


def test_csv_rfc_roundtrip_preserves_carriage_returns(spark, tmp_path):
    """A \\r\\n (or bare \\r) inside a quoted field must survive the
    sink→source round trip byte-for-byte: without lineSep pinned on the
    read-back, the multiLine parser normalizes \\r\\n → \\n and one
    character per carriage return is silently lost (probe-found)."""
    from pyspark.sql import types as T

    from sales_data_etl_pipeline_spark.sources import csv as csv_src

    rows = [
        Row(id=1, text="a\r\nb"),
        Row(id=2, text="c\rd"),
        Row(id=3, text="e\nf"),
        Row(id=4, text='quo"te;and,sep'),
    ]
    df = spark.createDataFrame(rows)
    path = str(tmp_path / "crlf")
    csv_src.write_csv_rfc(df, path)
    schema = T.StructType(
        [
            T.StructField("id", T.LongType()),
            T.StructField("text", T.StringType()),
        ]
    )
    back = {r.id: r.text for r in csv_src.read_csv_rfc(spark, path, schema).collect()}
    assert back == {r.id: r.text for r in rows}


def test_session_funnel_gap_boundary_is_inclusive(spark):
    """An event EXACTLY gap_seconds after its predecessor stays in the
    same session (the split predicate is strictly >); one second more
    opens a new session. Pins the boundary both engines must share."""
    from sales_data_etl_pipeline_spark.operators import temporal

    rows = [
        Row(event_id=1, user_id=1, event_type="view", ts="2024-01-01 10:00:00"),
        # exactly 1800s later: SAME session → converts at click
        Row(event_id=2, user_id=1, event_type="click", ts="2024-01-01 10:30:00"),
        Row(event_id=3, user_id=2, event_type="view", ts="2024-01-01 10:00:00"),
        # 1801s later: NEW session → step-1 never fires for user 2
        Row(event_id=4, user_id=2, event_type="click", ts="2024-01-01 10:30:01"),
    ]
    ev = spark.createDataFrame(rows).withColumn("ts", F.to_timestamp("ts"))
    got = {
        r.step_idx: r.n_sessions
        for r in temporal.session_funnel_counts(ev, ("view", "click")).collect()
    }
    assert got == {0: 2, 1: 1}
