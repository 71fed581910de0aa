"""As-of / range join unit tests on handcrafted timelines."""

from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F

from sales_data_etl_pipeline_spark.operators.temporal import asof_join, range_join_count


def _ts(minute: int) -> dt.datetime:
    return dt.datetime(2024, 1, 1, 12, minute, 0)


def _frames(spark):
    left = spark.createDataFrame(
        [(1, 1, _ts(10)), (2, 1, _ts(30)), (3, 2, _ts(5)), (4, 3, _ts(50))],
        "event_id long, user_id long, ts timestamp",
    )
    right = spark.createDataFrame(
        [
            (101, 1, _ts(9)),
            (102, 1, _ts(10)),   # equal ts to left #1 → inclusive match
            (103, 1, _ts(29)),
            (104, 2, _ts(6)),    # after left #3 → no match for user 2
        ],
        "rid long, user_id long, ts timestamp",
    )
    return left, right


def test_asof_backward_inclusive(spark):
    left, right = _frames(spark)
    out = {
        r.event_id: r.rid_matched
        for r in asof_join(left, right, on="user_id", right_cols=["rid"]).collect()
    }
    assert out == {1: 102, 2: 103, 3: None, 4: None}


def test_range_count_window(spark):
    left, right = _frames(spark)
    out = {
        r.event_id: r.n
        for r in range_join_count(
            left, right, on="user_id", range_seconds=1200, count_col="n"
        ).collect()
    }
    # left#1 (12:10): views at 12:09 within 20min, 12:10 excluded (strict <)
    # left#2 (12:30): 12:29 within; 12:10 exactly at boundary -20min → included (>=)
    assert out == {1: 1, 2: 2, 3: 0, 4: 0}


def test_range_count_row_preservation(spark):
    left, right = _frames(spark)
    assert range_join_count(
        left, right, on="user_id", range_seconds=60
    ).count() == left.count()


def test_funnel_counts_strict_order(spark):
    from sales_data_etl_pipeline_spark.operators.temporal import funnel_counts

    rows = [
        # user 1: full ordered chain
        (1, "view", 10.0), (1, "click", 20.0), (1, "purchase", 30.0),
        # user 2: clicked BEFORE viewing -> stops at view
        (2, "click", 5.0), (2, "view", 10.0), (2, "purchase", 20.0),
        # wait: purchase after view counts only if a click >= view exists
        # user 3: view+click same ts (equal ts counts), no purchase
        (3, "view", 10.0), (3, "click", 10.0),
        # user 4: never viewed
        (4, "purchase", 1.0),
    ]
    df = spark.createDataFrame(rows, "user_id long, event_type string, ts double")
    got = {r["step"]: r["n_users"] for r in funnel_counts(df, ("view", "click", "purchase")).collect()}
    assert got == {"view": 3, "click": 2, "purchase": 1}


def test_asof_join_forward(spark):
    from sales_data_etl_pipeline_spark.operators.temporal import asof_join

    left = spark.createDataFrame(
        [(1, 10.0), (1, 25.0), (2, 5.0)], "k long, ts double"
    )
    right = spark.createDataFrame(
        [(1, 10.0, "a"), (1, 20.0, "b"), (1, 30.0, "c")],
        "k long, ts double, tag string",
    )
    got = {
        (r["k"], r["ts"]): r["tag_matched"]
        for r in asof_join(
            left, right, on="k", right_cols=["tag"], direction="forward"
        ).collect()
    }
    # equal ts matches; next-at-or-after otherwise; no right rows -> NULL
    assert got == {(1, 10.0): "a", (1, 25.0): "c", (2, 5.0): None}
