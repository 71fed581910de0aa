"""Adjudicate wide per-query variance bands from the driver bench.

The r11 driver bench recorded >2.5x intra-run [min, max] bands for
graph_kcore, events_heavy_hitters_cms and similarity_topk_hamming while
every min matched the optimized expectation (VERDICT r11 "what's wrong"
item 1). This probe settles GC/contention-vs-plan with data: each named
query runs ``--passes`` times ISOLATED (one warm session, nothing else
on the machine), and every pass records

- wall time (same ``.count()`` action as bench.py),
- the JVM GC-time delta across the pass (JMX GarbageCollectorMXBeans),
- per-stage executorRunTime / jvmGcTime / shuffle bytes for stages
  submitted during the pass (Spark UI REST, enabled for this session),

so a straggler pass shows WHERE the time went: a GC spike with flat
executorRunTime is heap/machine contention; a stage whose
executorRunTime itself ballooned is a plan/skew problem; tight bands
that refuse to reproduce mean the driver-run context (148 other
queries + gc.collect churn) was the variance source, not the query.

Usage::

    python tools/variance_probe.py [--passes 6] [--sf-dir DIR] q1 q2 ...

Prints one JSON document; exits 0 always (it measures, it doesn't judge).
"""

from __future__ import annotations

import argparse
import gc
import json
import sys
import time
import urllib.request

sys.path.insert(0, "/root/repo")

import __spark_entry__ as entrymod
from sales_data_etl_pipeline_spark.session import get_spark


def gc_millis(spark) -> int:
    beans = (
        spark.sparkContext._jvm.java.lang.management.ManagementFactory
        .getGarbageCollectorMXBeans()
    )
    return sum(beans.get(i).getCollectionTime() for i in range(beans.size()))


def stages_since(spark, t0_ms: float) -> list[dict]:
    app_id = spark.sparkContext.applicationId
    url = f"http://localhost:4040/api/v1/applications/{app_id}/stages?status=COMPLETE"
    try:
        with urllib.request.urlopen(url, timeout=10) as r:
            stages = json.load(r)
    except Exception as e:  # UI not up (shouldn't happen) — degrade gracefully
        return [{"error": str(e)}]
    out = []
    for s in stages:
        sub = s.get("submissionTime")
        if not sub:
            continue
        # "2026-08-15T23:20:29.123GMT" -> epoch ms
        ts = time.mktime(time.strptime(sub[:19], "%Y-%m-%dT%H:%M:%S")) * 1000
        if ts < t0_ms - 1000:
            continue
        out.append(
            {
                "stage": s["stageId"],
                "name": s["name"].split("\n")[0][:60],
                "tasks": s.get("numCompleteTasks"),
                "executorRunTime_ms": s.get("executorRunTime"),
                "jvmGcTime_ms": s.get("jvmGcTime"),
                "shuffleReadBytes": s.get("shuffleReadBytes"),
                "shuffleWriteBytes": s.get("shuffleWriteBytes"),
            }
        )
    out.sort(key=lambda d: -(d.get("executorRunTime_ms") or 0))
    return out


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("queries", nargs="+")
    ap.add_argument("--passes", type=int, default=6)
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.1")
    ap.add_argument("--top-stages", type=int, default=4)
    args = ap.parse_args()

    spark = get_spark(
        "variance_probe",
        extra_conf={
            "spark.ui.enabled": "true",
            "spark.ui.showConsoleProgress": "false",
        },
    )
    qs = entrymod.queries()
    report: dict[str, dict] = {}
    for name in args.queries:
        fn = qs[name]
        fn(spark, args.sf_dir).count()  # warmup / JIT pass, untimed
        gc.collect()
        passes = []
        for _ in range(args.passes):
            g0 = gc_millis(spark)
            t0 = time.time()
            fn(spark, args.sf_dir).count()
            wall = round(time.time() - t0, 3)
            g1 = gc_millis(spark)
            passes.append(
                {
                    "wall_s": wall,
                    "gc_delta_ms": g1 - g0,
                    "stages": stages_since(spark, t0 * 1000)[: args.top_stages],
                }
            )
            gc.collect()
        walls = [p["wall_s"] for p in passes]
        report[name] = {
            "min": min(walls),
            "max": max(walls),
            "band": round(max(walls) / min(walls), 2),
            "gc_total_ms": sum(p["gc_delta_ms"] for p in passes),
            "passes": passes,
        }
    print(json.dumps(report, indent=1))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
