"""Round-9 operator tests: convergence guard, PQ dim derivation,
pagerank lineage bound, plus the round's new operators."""

from __future__ import annotations

import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F

from sales_data_etl_pipeline_spark.operators import dedup


def _chain_pairs(spark, n):
    return spark.createDataFrame(
        [Row(id_a=i, id_b=i + 1) for i in range(n - 1)]
    )


def test_connected_components_raises_on_diameter_over_budget(spark):
    """A 25-node chain has diameter 24 > the default 20-round budget:
    min-label propagation crosses ONE edge per round, so silently
    returning would split the component — the guard must raise."""
    pairs = _chain_pairs(spark, 25)
    with pytest.raises(RuntimeError, match="did not converge"):
        dedup.connected_components(pairs)


def test_connected_components_deep_chain_with_budget(spark):
    """The same chain converges (to one component rooted at 0) once the
    budget covers the diameter."""
    pairs = _chain_pairs(spark, 25)
    got = dedup.connected_components(pairs, max_iterations=30).collect()
    assert len(got) == 25
    assert {r.component for r in got} == {0}


def test_pq_adc_derives_dim_from_codebook(spark):
    """dim is no longer trusted from the caller: omitted → derived from
    the codebook; wrong → ValueError instead of silently-zero block
    distances from out-of-range slices."""
    from sales_data_etl_pipeline_spark.operators import similarity as sim

    rows = [
        Row(vec_id=i, embedding=[float(i)] * 4 + [float(-i)] * 4)
        for i in range(1, 6)
    ]
    corpus = spark.createDataFrame(rows)
    codebook = corpus.select(
        F.col("vec_id").alias("centroid_id"), "embedding"
    )
    # derived dim (8) — identical ranks to the explicit-dim call
    got = sim.pq_adc_topk(
        corpus, codebook, corpus.filter(F.col("vec_id") == 3),
        k=1, n_blocks=2,
    ).collect()
    assert got[0].neighbor_id == 3 and got[0].d2_adc == 0
    # wrong explicit dim: loud, not wrong
    with pytest.raises(ValueError, match="codebook vectors are 8-dim"):
        sim.pq_adc_topk(
            corpus, codebook, corpus.limit(1), k=1, n_blocks=2, dim=16
        )


def test_pq_adc_rejects_wrong_dim_queries(spark):
    """A query vector whose dim differs from the codebook's must error
    at execution (it would otherwise rank everything at distance 0)."""
    from sales_data_etl_pipeline_spark.operators import similarity as sim

    corpus = spark.createDataFrame(
        [Row(vec_id=i, embedding=[float(i)] * 8) for i in range(1, 4)]
    )
    codebook = corpus.select(
        F.col("vec_id").alias("centroid_id"), "embedding"
    )
    bad_queries = spark.createDataFrame(
        [Row(vec_id=99, embedding=[1.0] * 6)]
    )
    with pytest.raises(Exception, match="query vector dim"):
        sim.pq_adc_topk(
            corpus, codebook, bad_queries, k=1, n_blocks=2
        ).collect()


def test_pagerank_deep_iterations_stay_bounded(spark):
    """10 iterations must not double the unresolved plan per round: the
    per-iteration lazy checkpoint keeps lineage flat, so this completes
    in seconds and conserves total mass like the 3-iteration form."""
    pairs = spark.createDataFrame(
        [Row(id_a=a, id_b=b) for a, b in [(1, 2), (2, 3), (3, 1), (3, 4)]]
    )
    got = dedup.pagerank(pairs, iterations=10).collect()
    assert len(got) == 4
    total = sum(r.rank_ppb for r in got)
    # integer-division truncation loses at most a few ppb per node/round
    assert abs(total - 1_000_000_000) < 1000
