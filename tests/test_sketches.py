"""Quantitative bounds for the approximate-aggregation sketches.

The gate entry (``stats_approx_sketches``) now emits error-contract
booleans checked against a DuckDB all-TRUE oracle; this test keeps the
independent quantitative form on the raw sketch outputs: every
approximate value must land within the sketch's *documented* error of
the exact aggregate at sf0.01.

- HyperLogLog++ (``approx_count_distinct``): default relative standard
  deviation 0.05; a 3σ band (±15%) is the loosest credible bound.
- t-digest (``approx_percentile`` with accuracy=10000): rank error is
  at most n/accuracy, so the approximate p-quantile must lie between
  the exact quantiles at p ± 1/accuracy (widened one extra notch for
  interpolation slack).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from sales_data_etl_pipeline_spark.plans.llm_demo import (
    stats_approx_sketches,
    stats_approx_sketches_raw,
)
from sales_data_etl_pipeline_spark.sources.tables import load_testdata

SF_DIR = "/root/testdata/sf0.01"
ACCURACY = 10_000  # must match the plan's approx_percentile accuracy


def test_sketch_gate_booleans_all_true(spark):
    row = stats_approx_sketches(spark, SF_DIR).collect()[0]
    flags = {k: v for k, v in row.asDict().items() if k != "n_rows"}
    assert all(flags.values()), f"sketch outside documented bound: {flags}"


def test_sketches_within_documented_error(spark):
    approx = stats_approx_sketches_raw(spark, SF_DIR).collect()[0]

    li = load_testdata(spark, SF_DIR, ("lineitem",))["lineitem"]
    slack = 2.0 / ACCURACY
    exact = li.agg(
        F.countDistinct("l_orderkey").alias("orders"),
        F.countDistinct("l_partkey").alias("parts"),
        *[
            F.expr(
                f"percentile(l_extendedprice, array({p - slack}D, {p + slack}D))"
            ).alias(f"band_{int(p * 100)}")
            for p in (0.5, 0.95, 0.99)
        ],
    ).collect()[0]

    for a, e in (
        (approx["approx_orders"], exact["orders"]),
        (approx["approx_parts"], exact["parts"]),
    ):
        assert abs(a - e) <= 0.15 * e, f"HLL++ outside 3σ: {a} vs exact {e}"

    for p in (50, 95, 99):
        lo, hi = exact[f"band_{p}"]
        got = approx[f"price_p{p}"]
        assert lo <= got <= hi, f"p{p}: {got} outside exact band [{lo}, {hi}]"
