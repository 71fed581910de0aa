"""Local stand-in for the driver's DuckDB-oracle correctness gate.

Runs every ``queries()`` entry at sf0.01 on Spark AND the matching
``oracle_sql()`` on DuckDB, then compares row count, column names, and
TWO value comparisons:

- **exact** — pandas on both sides (``toPandas`` / ``fetchdf``), columns
  sorted by name, rows sorted, every cell stringified. This emulates the
  driver's exact value-hash, including dtype-repr gaps (DuckDB HUGEINT →
  float64 ``2996.0`` vs Spark bigint ``2996``) and last-ulp float noise.
- **6-sig** — the older tolerance check, reported when exact fails so the
  failure class is obvious (repr gap vs real value gap).

Usage: python tools/check_correctness.py [sf_dir] [query ...]
"""

from __future__ import annotations

import math
import sys
import time

sys.path.insert(0, "/root/repo")

import duckdb

import __spark_entry__ as entrymod
from sales_data_etl_pipeline_spark.schemas import TESTDATA_TABLES
from sales_data_etl_pipeline_spark.session import get_spark


def norm_cell(v):
    if v is None:
        return None
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return float(f"{v:.6g}")
    return v


def norm_rows(cols, rows):
    # sort columns by name (driver does this), then sort rows
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = [tuple(norm_cell(r[i]) for i in order) for r in rows]
    out.sort(key=lambda t: tuple((x is None, str(x)) for x in t))
    return [cols[i] for i in order], out


def canon_pandas(pdf):
    """Driver-style canonicalization: sorted column order, sorted rows,
    every cell as its string repr (so int64 2996 != float64 2996.0)."""
    pdf = pdf[sorted(pdf.columns)]
    import datetime

    import pandas as pd

    def _cell(v):
        if v is None:
            return "<null>"
        if isinstance(v, float) and v != v:  # NaN (guarded: not on arrays)
            return "<null>"
        # date vs timestamp-at-midnight compare equal under the driver's
        # hash (Spark DATE → datetime.date, DuckDB DATE-ish → Timestamp)
        if isinstance(v, (datetime.date, datetime.datetime, pd.Timestamp)):
            return str(pd.Timestamp(v))
        return str(v)

    cells = [
        tuple(_cell(v) for v in row)
        for row in pdf.itertuples(index=False, name=None)
    ]
    cells.sort()
    return cells


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])
    spark = get_spark("correctness-check")

    con = duckdb.connect()
    for t in TESTDATA_TABLES:
        import os

        p = f"{sf_dir}/{t}.parquet"
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")

    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()
    failures = 0
    for name, fn in qs.items():
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            sdf = fn(spark, sf_dir)
            scols = sdf.columns
            spdf = sdf.toPandas()
            srows = [tuple(r) for r in sdf.collect()]
        except Exception as e:  # noqa: BLE001
            print(f"FAIL {name}: spark error: {e}")
            failures += 1
            continue
        if name not in oracles:
            try:
                canon_pandas(spdf)  # the driver's rows-only canon must not blow up
                extra = ""
            except Exception as e:  # noqa: BLE001
                extra = f" [CANON ERROR: {e}]"
                failures += 1
            print(f"OK?  {name}: rows-only check, {len(srows)} rows "
                  f"({time.time()-t0:.1f}s) [no oracle]{extra}")
            continue
        try:
            res = con.execute(oracles[name])
            ocols = [d[0] for d in res.description]
            opdf = res.fetchdf()
            orows = [tuple(r) for r in opdf.itertuples(index=False, name=None)]
        except Exception as e:  # noqa: BLE001
            print(f"FAIL {name}: duckdb error: {e}")
            failures += 1
            continue
        ok = True
        exact = False
        msgs = []
        if len(srows) != len(orows):
            ok = False
            msgs.append(f"rowcount spark={len(srows)} oracle={len(orows)}")
        if sorted(scols) != sorted(ocols):
            ok = False
            msgs.append(f"cols spark={sorted(scols)} oracle={sorted(ocols)}")
        if ok:
            try:
                se, oe = canon_pandas(spdf), canon_pandas(opdf)
                exact = se == oe
            except Exception as e:  # noqa: BLE001
                msgs.append(f"canon error: {e}")
            if not exact:
                _, s = norm_rows(scols, srows)
                _, o = norm_rows(ocols, orows)
                if s != o:
                    ok = False
                    diffs = [
                        (i, a, b) for i, (a, b) in enumerate(zip(s, o)) if a != b
                    ]
                    msgs.append(
                        f"{len(diffs)} mismatched rows; first: {diffs[:3]}"
                    )
                else:
                    ok = False
                    ed = [
                        (i, a, b)
                        for i, (a, b) in enumerate(zip(se, oe))
                        if a != b
                    ]
                    msgs.append(
                        "EXACT-HASH MISMATCH (6-sig passes — repr/dtype gap); "
                        f"first: {ed[:3]}"
                    )
        status = "PASS" if ok else "FAIL"
        if not ok:
            failures += 1
        print(f"{status} {name}: {len(srows)} rows ({time.time()-t0:.1f}s)"
              + ("" if ok else " :: " + "; ".join(msgs)))
    print(f"\n{failures} failures")
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
