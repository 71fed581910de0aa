from __future__ import annotations

from sales_data_etl_pipeline_spark.operators import merge


def _t(spark, rows):
    return spark.createDataFrame(rows, "k long, v string")


def test_upsert_updates_win_and_new_keys_insert(spark):
    target = _t(spark, [(1, "a"), (2, "b"), (3, "c")])
    updates = _t(spark, [(2, "B2"), (9, "new")])
    got = {r["k"]: r["v"] for r in merge.upsert(target, updates, "k").collect()}
    assert got == {1: "a", 2: "B2", 3: "c", 9: "new"}


def test_insert_missing_skips_conflicts(spark):
    target = _t(spark, [(1, "a"), (2, "b")])
    updates = _t(spark, [(2, "SHOULD-NOT-WIN"), (9, "new")])
    got = {r["k"]: r["v"] for r in merge.insert_missing(target, updates, "k").collect()}
    assert got == {1: "a", 2: "b", 9: "new"}


def test_upsert_composite_key(spark):
    target = spark.createDataFrame(
        [(1, "x", "a"), (1, "y", "b")], "k1 long, k2 string, v string"
    )
    updates = spark.createDataFrame(
        [(1, "y", "B")], "k1 long, k2 string, v string"
    )
    got = {
        (r["k1"], r["k2"]): r["v"]
        for r in merge.upsert(target, updates, ("k1", "k2")).collect()
    }
    assert got == {(1, "x"): "a", (1, "y"): "B"}


def test_scd2_apply_versions(spark):
    cur = spark.createDataFrame(
        [
            (1, "a", 0, None),      # open version
            (1, "z", -10, 0),       # closed history: must pass through
            (2, "b", 0, None),
            (3, "c", 0, None),
        ],
        "k long, attr string, valid_from long, valid_to long",
    )
    ups = spark.createDataFrame(
        [
            (1, "a2", 100),  # change -> closes (0,100), opens (100,200)
            (1, "a3", 200),  # second change -> closes at 200
            (2, "b", 100),   # no-op -> no new version
        ],
        "k long, attr string, ts long",
    )
    rows = {
        (r["k"], r["attr"], r["valid_from"], r["valid_to"])
        for r in merge.scd2_apply(cur, ups, "k", ["attr"]).collect()
    }
    assert rows == {
        (1, "z", -10, 0),
        (1, "a", 0, 100),
        (1, "a2", 100, 200),
        (1, "a3", 200, None),
        (2, "b", 0, None),
        (3, "c", 0, None),
    }


def test_cdc_apply_last_wins(spark):
    from sales_data_etl_pipeline_spark.operators import merge

    target = spark.createDataFrame(
        [(1, "a"), (2, "b"), (3, "c")], "k long, v string"
    )
    log = spark.createDataFrame(
        [
            (1, "a2", "U", 10),  # update
            (1, "a3", "U", 11),  # later update wins
            (2, "b", "D", 20),   # delete
            (4, "d", "I", 30),   # insert
            (5, "e", "I", 40),
            (5, "e", "D", 41),   # insert then delete: never appears
        ],
        "k long, v string, op string, seq long",
    )
    got = {
        (r.k, r.v) for r in merge.cdc_apply(target, log, "k").collect()
    }
    assert got == {(1, "a3"), (3, "c"), (4, "d")}
