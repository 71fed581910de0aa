"""Plan the next round's driver verify window (_VERIFY_FIRST).

The driver checks only the FIRST 50 ``queries()`` entries per round, so
each round the window must rotate: entries whose code changed since
their last driver-green row go first, then the stalest green entries.
This tool computes that ordering from the recorded correctness history
plus ``git diff`` so the rotation is derived, not hand-maintained.

Priority order emitted:

1. **never-green** — entries with no green row in any CORRECTNESS_r*.json
   (new operators): must be in-window or they ship unverified.
2. **changed-since-green** — entries whose implementing file (the plan
   function's source file, or any file passed via ``--changed``) was
   touched by commits after the round of their last green row.
3. **stalest-green** — remaining entries, oldest green round first.

Caveat (documented, deliberate): an entry's "implementing file" is the
file defining its ``queries()`` callable. Edits to deeper operator
modules surface through ``--changed`` (pass ``git diff --name-only
<last-round-tag>`` output); the round-6 workflow is::

    python tools/rotation_planner.py --changed $(git diff --name-only <snap>..HEAD -- 'sales_data_etl_pipeline_spark/')

Usage: python tools/rotation_planner.py [--window 50] [--changed f1 f2 …]
"""

from __future__ import annotations

import argparse
import glob
import json
import sys

sys.path.insert(0, "/root/repo")

import __spark_entry__ as entrymod


def last_green_rounds(repo: str = "/root/repo") -> dict[str, int]:
    """entry -> latest round with a green row (rows+schema+hash)."""
    green: dict[str, int] = {}
    for path in sorted(glob.glob(f"{repo}/CORRECTNESS_r*.json")):
        rnd = int(path.rsplit("_r", 1)[1].split(".")[0])
        with open(path) as f:
            rows = json.load(f)
        for name, v in rows.items():
            if v.get("rows_match") and v.get("hash_match", True):
                green[name] = max(green.get(name, 0), rnd)
    return green


def entry_files() -> dict[str, str]:
    """entry -> file defining its queries() callable."""
    out = {}
    for name, fn in entrymod.queries().items():
        f = getattr(fn, "__code__", None)
        out[name] = f.co_filename if f else "<builtin>"
    return out


def plan(window: int = 50, changed: set[str] | None = None) -> list[tuple]:
    changed = {c.split("/")[-1] for c in (changed or set())}
    green = last_green_rounds()
    files = entry_files()
    rows = []
    for name in entrymod.queries():
        g = green.get(name)
        f = files[name].split("/")[-1]
        if g is None:
            prio, why = 0, "never-green"
        elif f in changed:
            prio, why = 1, f"changed:{f} (green r{g})"
        else:
            prio, why = 2, f"green r{g}"
        rows.append((prio, g if g is not None else -1, name, why))
    rows.sort(key=lambda r: (r[0], r[1], r[2]))
    return [(n, w, i < window) for i, (_, _, n, w) in enumerate(rows)]


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--window", type=int, default=50)
    ap.add_argument("--changed", nargs="*", default=[])
    args = ap.parse_args()
    for name, why, in_window in plan(args.window, set(args.changed)):
        marker = "IN " if in_window else "out"
        print(f"{marker} {name:38s} {why}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
