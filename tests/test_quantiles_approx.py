"""Error contract of the grouped approx-quantile gate
(plans/llm_demo.py::events_value_quantiles_grouped).

Two regimes, matching the operator's docstring:

1. **Exact regime** (group size < accuracy/2): the GK sketch provably
   retains every value, so the result must EQUAL the discrete quantile
   — this is what makes the driver gate hash-matchable against DuckDB
   ``quantile_disc`` at sf0.01.
2. **Compressed regime** (group size >> accuracy): the returned element
   must sit within the GK rank bound — |rank(v) − ⌈q·N⌉| ≤ ε·N with
   ε = 1/accuracy — the contract a 100 TB deployment relies on when a
   hot event_type holds billions of rows and exact percentile's
   O(group) buffering is the thing being avoided.
"""

from __future__ import annotations

import math

import numpy as np
import pandas as pd

from sales_data_etl_pipeline_spark.plans.llm_demo import (
    _gk_bound_ok,
    events_value_quantiles_grouped,
    events_value_quantiles_grouped_compressed,
)

QS = {"p25": 0.25, "p50": 0.5, "p75": 0.75, "p90": 0.9}


def _write_events(tmp_path, values_by_type: dict[str, np.ndarray]) -> str:
    rows = []
    for et, vals in values_by_type.items():
        rows.append(
            pd.DataFrame(
                {
                    "event_id": np.arange(len(vals)),
                    "ts": pd.Timestamp("2024-01-01")
                    + pd.to_timedelta(np.arange(len(vals)) % 86400, unit="s"),
                    "user_id": np.arange(len(vals)) % 97,
                    "event_type": et,
                    "value": vals.astype(float),
                    "props": "{}",
                }
            )
        )
    df = pd.concat(rows, ignore_index=True)
    df["ts"] = df["ts"].astype("datetime64[us]")
    out = str(tmp_path)
    df.to_parquet(f"{out}/events.parquet", index=False)
    return out


def _rank_interval(values: np.ndarray, v: float) -> tuple[int, int]:
    """1-based rank interval the element v occupies in sorted order."""
    lo = int((values < v).sum()) + 1
    hi = int((values <= v).sum())
    return lo, hi


def test_compressed_regime_honors_gk_rank_bound(spark, tmp_path):
    rng = np.random.default_rng(14)
    n, accuracy = 30_000, 100  # n >> accuracy: compression is certain
    vals = rng.lognormal(mean=3.0, sigma=1.2, size=n).round(4)
    sf_dir = _write_events(tmp_path, {"hot": vals})
    row = (
        events_value_quantiles_grouped(spark, sf_dir, accuracy=accuracy)
        .collect()[0]
        .asDict()
    )
    assert row["n_events"] == n
    eps_n = n / accuracy  # = 300 ranks of slack on 30k rows
    for name, q in QS.items():
        v = row[name]
        assert v in vals, f"{name}: approx value must be a column element"
        lo, hi = _rank_interval(vals, v)
        target = math.ceil(q * n)
        dist = 0 if lo <= target <= hi else min(
            abs(lo - target), abs(hi - target)
        )
        assert dist <= eps_n, (
            f"{name}: rank interval [{lo},{hi}] vs target {target} "
            f"exceeds eps*N={eps_n}"
        )


def test_compressed_gate_all_ok_on_forced_compression(spark, tmp_path):
    """The driver-gate form of the bound check: accuracy=100 on a
    30k-row group (compression certain) must emit TRUE for every
    quantile — the exact rows the metamorphic DuckDB oracle pins."""
    rng = np.random.default_rng(14)
    vals = rng.lognormal(mean=3.0, sigma=1.2, size=30_000).round(4)
    sf_dir = _write_events(tmp_path, {"hot": vals, "tiny": vals[:7]})
    rows = {
        r["event_type"]: r.asDict()
        for r in events_value_quantiles_grouped_compressed(
            spark, sf_dir
        ).collect()
    }
    assert rows["hot"]["n_events"] == 30_000
    assert rows["tiny"]["n_events"] == 7  # exact-regime group: also TRUE
    for et, row in rows.items():
        for name in QS:
            assert row[f"{name}_ok"] is True, (et, name, row)


def test_gk_bound_ok_has_teeth(spark):
    """The gate's boolean must flip on fabricated violations: a rank
    interval outside the documented window [⌊(p−ε)N⌋, ⌈(p+ε)N⌉], and an
    empty interval (the checked value not being a column element). Also
    pins the integer window arithmetic on the 0.9·10 float-trap group
    size. p90 at accuracy=100, n=1000 -> window [890, 910]."""
    df = spark.createDataFrame(
        [
            # (case, n_events, _p90_lt, _p90_le)
            ("inside", 1000, 890, 910),     # [891,910] within window
            ("edge_overlap", 1000, 905, 912),  # lo 906 <= 910 -> TRUE
            ("above_window", 1000, 911, 930),  # lo 912 > 910 -> FALSE
            ("below_window", 1000, 850, 889),  # hi 889 < 890 -> FALSE
            ("not_element", 1000, 900, 900),   # hi < lo -> FALSE
            ("float_trap", 10, 8, 9),  # n=10 window [8,10]; [9,9] TRUE
        ],
        "case string, n_events long, _p90_lt long, _p90_le long",
    )
    got = {
        r["case"]: r["p90_ok"]
        for r in df.select(
            "case", _gk_bound_ok("p90", 9, 10, 100)
        ).collect()
    }
    assert got == {
        "inside": True,
        "edge_overlap": True,
        "above_window": False,
        "below_window": False,
        "not_element": False,
        "float_trap": True,
    }


def test_exact_regime_equals_discrete_quantile(spark, tmp_path):
    """Group sizes inside accuracy/2: result equals quantile_disc
    computed independently in pandas — the property the sf0.01 driver
    gate's value-hash relies on (groups ~2,000 vs accuracy 100,000)."""
    rng = np.random.default_rng(41)
    groups = {
        "click": rng.uniform(0.01, 500, 2006).round(2),
        "tied": np.repeat([1.0, 2.0, 3.0], 50),  # heavy ties
        "single": np.array([7.25]),
        "pair": np.array([10.0, 20.0]),
    }
    sf_dir = _write_events(tmp_path, groups)
    got = {
        r["event_type"]: r.asDict()
        for r in events_value_quantiles_grouped(spark, sf_dir).collect()
    }
    for et, vals in groups.items():
        s = np.sort(vals)
        for name, q in QS.items():
            # quantile_disc convention: element at 1-based rank ceil(q*N)
            want = float(s[max(math.ceil(q * len(s)), 1) - 1])
            assert got[et][name] == want, (et, name, got[et][name], want)
