"""Interleaved A/B timing of runtime SQL confs.

The bench box drifts (noise_spread up to 0.23), so sequential
whole-process experiments confound conf effects with contention. This
harness alternates BASE and VARIANT passes per query inside one
session (runtime-settable SQL confs only), taking the min of each arm
— slow drift hits both arms equally.

Usage:
  python tools/ab_conf.py --cycles 3 --conf k=v [--conf k2=v2] [names...]
"""

from __future__ import annotations

import argparse
import gc
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __spark_entry__ as entrymod
from sales_data_etl_pipeline_spark.session import get_spark


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("names", nargs="+")
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.1")
    ap.add_argument("--cycles", type=int, default=3)
    ap.add_argument("--conf", action="append", required=True)
    ap.add_argument("--out", default="/tmp/ab_conf.json")
    args = ap.parse_args()

    variant = {}
    for kv in args.conf:
        k, _, v = kv.partition("=")
        variant[k] = v

    spark = get_spark("ab", extra_conf={"spark.ui.showConsoleProgress": "false"})
    base = {k: spark.conf.get(k, None) for k in variant}
    qs = entrymod.queries()
    spark.range(spark.sparkContext.defaultParallelism).mapInPandas(
        lambda it: it, "id long"
    ).count()

    def set_confs(c):
        for k, v in c.items():
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)

    res = {}
    for name in args.names:
        fn = qs[name]
        # warm both arms once (JIT for both plan shapes)
        for c in (base, variant):
            set_confs(c)
            fn(spark, args.sf_dir).count()
        t = {"base": [], "var": []}
        for _ in range(args.cycles):
            for arm, c in (("base", base), ("var", variant)):
                set_confs(c)
                gc.collect()
                t0 = time.perf_counter()
                fn(spark, args.sf_dir).count()
                t[arm].append(time.perf_counter() - t0)
        set_confs(base)
        res[name] = {
            "base_min": round(min(t["base"]), 4),
            "var_min": round(min(t["var"]), 4),
            "base_all": [round(x, 3) for x in t["base"]],
            "var_all": [round(x, 3) for x in t["var"]],
        }
        r = res[name]
        print(
            f"{r['base_min']:7.3f} -> {r['var_min']:7.3f}  "
            f"({r['var_min'] - r['base_min']:+6.3f})  {name}",
            flush=True,
        )
    tot_b = sum(r["base_min"] for r in res.values())
    tot_v = sum(r["var_min"] for r in res.values())
    print(f"TOTAL base {tot_b:.2f} -> var {tot_v:.2f} ({tot_v - tot_b:+.2f})")
    with open(args.out, "w") as f:
        json.dump(res, f, indent=1, sort_keys=True)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
