"""Deterministic localCheckpoint release (operators/ckpt.py).

Pins the three contract edges: (1) release() actually frees the
persisted blocks (the r11 graph_kcore GC-straggler fix depends on it),
(2) misuse — a derived projection instead of the checkpointed frame —
raises instead of silently unpersisting nothing, and (3) the iterative
graph operators leave no block residue beyond their returned result.
"""

from __future__ import annotations

import time

import pytest
from pyspark.sql import functions as F

from sales_data_etl_pipeline_spark.operators import ckpt, dedup


def _n_persistent(spark) -> int:
    return spark.sparkContext._jsc.sc().getPersistentRDDs().size()


def test_release_frees_blocks(spark):
    base = _n_persistent(spark)
    ck = spark.range(10_000).selectExpr("id", "id * 2 as x").localCheckpoint(
        eager=True
    )
    assert _n_persistent(spark) == base + 1
    # capture THIS checkpoint's RDD id before release so the poll below
    # is scoped to it — requiring a globally empty block store would
    # spin on unrelated session residue (e.g. rank.py's documented
    # retained ranked-slice blocks) or any persisted frame another test
    # left behind
    rdd_id = ck._jdf.queryExecution().analyzed().rdd().id()
    # the poll below filters getRDDStorageInfo() by this id, which is
    # vacuously true if the analyzed().rdd() convention ever stops
    # matching the persisted storage id (e.g. across a Spark upgrade) —
    # so first assert the captured id IS a currently-cached RDD, making
    # a convention drift fail loudly here instead of passing vacuously
    # (r14 ADVICE)
    assert any(
        info.id() == rdd_id and info.numCachedPartitions() > 0
        for info in spark.sparkContext._jsc.sc().getRDDStorageInfo()
    ), f"captured rdd_id {rdd_id} is not a cached RDD - convention drift"
    ckpt.release(ck)
    assert _n_persistent(spark) == base
    # released blocks are gone and lineage is truncated: reading the
    # frame again must FAIL (misuse detected), never silently recompute.
    # release() requests removal NON-blocking, so poll the storage view
    # until the blocks are actually dropped before asserting — a fast
    # re-read racing the async removal could still find them
    deadline = time.monotonic() + 30
    while time.monotonic() < deadline:
        infos = spark.sparkContext._jsc.sc().getRDDStorageInfo()
        if all(
            info.numCachedPartitions() == 0
            for info in infos
            if info.id() == rdd_id
        ):
            break
        time.sleep(0.05)
    else:
        pytest.fail("released blocks never dropped from block storage")
    with pytest.raises(Exception):
        ck.count()


def test_release_rejects_derived_frames(spark):
    ck = spark.range(100).localCheckpoint(eager=True)
    derived = ck.select((F.col("id") + 1).alias("y"))
    with pytest.raises(ValueError, match="LogicalRDD"):
        ckpt.release(derived)
    ckpt.release(ck)


def test_release_skips_none(spark):
    ckpt.release(None)  # loop-carried "previous round" slot starts empty


def test_lineage_silence_is_reentrant(spark):
    """Nested _lineage_warning_silenced contexts must restore the
    PRE-silence logger level on full unwind — a naive nested capture
    would snapshot the demoted ERROR as 'prior' and pin the RDD
    loggers at ERROR permanently (r13 ADVICE)."""
    jvm = spark.sparkContext._jvm
    log_manager = jvm.org.apache.logging.log4j.LogManager
    cls = ckpt._RDD_LOGGER_CLASSES[0]
    before = log_manager.getLogger(cls).getLevel().toString()
    error = jvm.org.apache.logging.log4j.Level.ERROR.toString()
    with ckpt._lineage_warning_silenced(spark):
        assert log_manager.getLogger(cls).getLevel().toString() == error
        with ckpt._lineage_warning_silenced(spark):
            assert log_manager.getLogger(cls).getLevel().toString() == error
        # inner exit must NOT restore early or re-pin ERROR as prior
        assert log_manager.getLogger(cls).getLevel().toString() == error
    assert log_manager.getLogger(cls).getLevel().toString() == before
    assert ckpt._silence_depth == 0


def test_iterative_graph_ops_leave_bounded_residue(spark):
    """kcore / connected_components / pagerank / label_propagation each
    release every superseded round's checkpoint and the edge table; the
    only blocks left behind are the materialized result (≤1 per call).
    """
    pairs = spark.createDataFrame(
        # one 3-clique (survives 2-core) + a chain (peeled away)
        [("a", "b"), ("b", "c"), ("a", "c"), ("c", "d"), ("d", "e")],
        "id_a string, id_b string",
    ).localCheckpoint(eager=True)  # keep the input out of the count
    base = _n_persistent(spark)

    core = dedup.kcore_decompose(pairs, k=2, max_iterations=4)
    assert {r["doc_id"] for r in core.collect()} == {"a", "b", "c"}
    assert _n_persistent(spark) <= base + 1

    base = _n_persistent(spark)
    comp = dedup.connected_components(pairs, max_iterations=6)
    assert comp.count() == 5
    assert _n_persistent(spark) <= base + 2

    base = _n_persistent(spark)
    ranks = dedup.pagerank(pairs, iterations=3)
    assert ranks.count() == 5
    assert _n_persistent(spark) <= base + 3

    base = _n_persistent(spark)
    labels = dedup.label_propagation(pairs, iterations=3)
    assert labels.count() == 5
    assert _n_persistent(spark) <= base + 4
    ckpt.release(pairs)
