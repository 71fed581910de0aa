"""Regenerate __spark_entry__._VERIFY_FIRST from tools/verify_window.json.

The round-close workflow (one command each; order matters):

    1. python tools/rotation_planner.py --max-round <N> --emit-window \
           [--force-changed e1 e2 ...] [--changed f1 f2 ...]
    2. python tools/sync_verify_window.py          # rewrites the list
    3. python tools/rotation_planner.py --emit-fingerprints \
           tools/entry_fingerprints_r<N>.json --max-round <N> --no-fingerprints
    4. pytest tests/test_verify_window.py          # equality + replay pins

This script only rewrites the ``_VERIFY_FIRST = [...]`` block (plus its
group comments) in ``__spark_entry__.py`` — nothing else in the file is
touched. It then re-imports the module and asserts the first-``window``
``queries()`` names equal the artifact, so a drifted registry fails HERE
rather than in the driver.
"""

from __future__ import annotations

import importlib
import json
import re
import sys

REPO = "/root/repo"
sys.path.insert(0, REPO)


def group_of(reason: str) -> str:
    if reason == "never-green":
        return "never-green (new entries: must not ship unverified)"
    if reason.startswith("stale-promoted-ahead"):
        return (
            "promoted ahead of the changed tier (judge-directed green "
            "refresh, no changed-code claim)"
        )
    if reason.startswith("forced") or reason.startswith("changed") or (
        reason.startswith("fingerprint")
    ):
        return "changed since last green row"
    return "stalest-green rotation"


def main() -> int:
    with open(f"{REPO}/tools/verify_window.json") as f:
        art = json.load(f)
    names = art["order"][: art["inputs"]["window"]]
    reasons = art["reasons"]
    lines: list[str] = []
    cur = None
    for n in names:
        grp = group_of(reasons[n])
        if grp != cur:
            lines.append(f"    # {grp}")
            cur = grp
        lines.append(f'    "{n}",')
    body = "\n".join(lines)
    path = f"{REPO}/__spark_entry__.py"
    src = open(path).read()
    new_src, n_subs = re.subn(
        r"_VERIFY_FIRST = \[.*?\n\]",
        f"_VERIFY_FIRST = [\n{body}\n]",
        src,
        flags=re.S,
    )
    if n_subs != 1:
        raise SystemExit(f"expected exactly one _VERIFY_FIRST block, found {n_subs}")
    open(path, "w").write(new_src)
    entrymod = importlib.import_module("__spark_entry__")
    importlib.reload(entrymod)
    got = list(entrymod.queries())[: len(names)]
    assert got == names, (
        "queries() ordering does not realize the artifact window; "
        f"first divergence: {next((a, b) for a, b in zip(got, names) if a != b)}"
    )
    print(f"synced _VERIFY_FIRST: {len(names)} names, registry realizes the window")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
