"""Driver verify-window invariants.

The driver checks only the FIRST 50 ``queries()`` entries per round.
Entries past the boundary ride on one of two documented arguments:

1. their latest driver-green row POSTDATES the all-table NTZ
   normalization (they sat in the round-5 window, CORRECTNESS_r05), or
2. their plans scan ONLY timestamp-free tables, so the NTZ cast loop
   at the catalog edge (sources/tables.py) is structurally a no-op and
   their older green rows remain valid.

This test pins argument (2) so a future edit that makes such an entry
read events/lineitem/orders turns it red instead of silently shipping
unverified.
"""

from __future__ import annotations

import re

import pyarrow.parquet as pq

import __spark_entry__ as entrymod

SF_DIR = "/root/testdata/sf0.001"

#: Entries whose Arrow-kernel lineage hides inputFiles(); all are
#: documents/embeddings-only by construction (their loaders are
#: _docs/_emb helpers in plans/llm_demo.py).
LINEAGE_OPAQUE_OK = {
    "corpus_prep_pipeline",
    "corpus_token_shards",
    "corpus_pack_sequences",
    "corpus_mixture_epochs",
    "corpus_hash_split",
    "corpus_stratified_sample",
    "dedup_exact",
    "dedup_ngram_jaccard",
    "dedup_cluster_representatives",
    "table_upsert",
    "table_insert_missing",
    "table_scd2_apply",
    "text_unigram_logprob",
    "text_repetition",
    "embedding_normalize",
    "embedding_quantize_int8",
}


def _ts_tables():
    out = set()
    for t in (
        "region nation customer supplier part orders lineitem events "
        "documents embeddings"
    ).split():
        try:
            s = pq.read_schema(f"{SF_DIR}/{t}.parquet")
        except Exception:
            continue
        if any("timestamp" in str(s.field(n).type) for n in s.names):
            out.add(t)
    return out


def test_every_entry_has_an_oracle():
    qs, os_ = entrymod.queries(), entrymod.oracle_sql()
    assert set(qs) == set(os_)


def test_out_of_window_entries_scan_no_timestamp_tables(spark):
    import json

    qs = entrymod.queries()
    names = list(qs)
    ts_tables = _ts_tables()
    assert ts_tables == {"events", "lineitem", "orders"}
    from tools.rotation_planner import last_green_rounds

    # post-NTZ = any driver-green row in r5 or later (r5 was the first
    # round on the normalized reader)
    post_ntz_green = {
        k for k, rnd in last_green_rounds().items() if rnd >= 5
    }
    # argument (3): entries the committed planner artifact records as
    # held-back. A held-back entry is never-green BY CONSTRUCTION of
    # its placement (it landed mid-freeze without a window slot), and
    # never-green is the planner's TOP priority tier — the next replan
    # without the hold-back forces it into the window head, so it
    # cannot silently stay unverified; the artifact documents the
    # deferral rather than hiding it. Once it gates green it leaves
    # hold_back at the next round's replan and rides argument (1).
    with open("/root/repo/tools/verify_window.json") as f:
        held_back = set(json.load(f)["inputs"].get("hold_back", []))
    # Bound the exemption (r14 ADVICE): the hold-back route is for AT
    # MOST a couple of sanctioned mid-freeze landings per round, and a
    # held-back entry must genuinely sit OUTSIDE the emitted window —
    # if either stops holding, the exemption is being stretched into a
    # standing bypass of this invariant and someone must re-argue it
    # here rather than silently ride it.
    assert len(held_back) <= 2, sorted(held_back)
    assert not held_back & set(entrymod._VERIFY_FIRST), sorted(
        held_back & set(entrymod._VERIFY_FIRST)
    )
    offenders = []
    for name in names[50:]:
        if name in post_ntz_green:  # argument (1): r5-verified post-NTZ
            continue
        if name in held_back:  # argument (3): artifact-recorded deferral
            continue
        df = qs[name](spark, SF_DIR)
        tabs = set()
        for f in df.inputFiles():
            m = re.search(r"/(\w+)\.parquet", f)
            if m:
                tabs.add(m.group(1))
        if not tabs and name not in LINEAGE_OPAQUE_OK:
            offenders.append((name, "opaque lineage, not allowlisted"))
        elif tabs & ts_tables:
            offenders.append((name, sorted(tabs & ts_tables)))
    assert not offenders, offenders


def test_verify_first_is_derived_from_planner_artifact():
    """_VERIFY_FIRST must equal the first `window` names of
    tools/verify_window.json, and replanning from the artifact's
    RECORDED inputs must reproduce its full ordering — so the window
    can never regress to hand-maintenance (round-6 verdict item 8)."""
    import json

    from tools.rotation_planner import plan

    with open("/root/repo/tools/verify_window.json") as f:
        art = json.load(f)
    inp = art["inputs"]
    assert entrymod._VERIFY_FIRST == art["order"][: inp["window"]]
    replayed = plan(
        window=inp["window"],
        changed=set(inp["changed"]),
        force_changed=set(inp["force_changed"]),
        promote_stale=set(inp.get("promote_stale", [])),
        promote_ahead=set(inp.get("promote_ahead", [])),
        hold_back=set(inp.get("hold_back", [])),
        stable_tier=inp.get("stable_tier", False),
        max_round=inp["max_round"],
        use_fingerprints=inp["use_fingerprints"],
        # replay against the RECORDED baseline — a newer fingerprint
        # file committed at round close must not invalidate the artifact
        baseline=inp.get("fingerprint_baseline"),
    )
    assert [n for n, _, _ in replayed] == art["order"]


def test_rotation_planner_green_requires_schema_match():
    """The planner's green predicate must equal the driver's: a
    schema-only failure is classified changed/never-green, not green."""
    from tools.rotation_planner import is_green

    ok = {"rows_match": True, "schema_match": True, "hash_match": True}
    assert is_green(ok)
    for broken in ("rows_match", "schema_match", "hash_match"):
        assert not is_green({**ok, broken: False})
        assert not is_green({k: v for k, v in ok.items() if k != broken})


def test_scale_flag_means_superlinear():
    """The scale-experiment flag must fire on a real quadratic and stay
    silent on sublinear fixed-cost-amortization slopes (which every
    measured query in SCALE_EXPERIMENT.json exhibits)."""
    import json

    from tools.scale_experiment import COPIES, is_superlinear

    # synthetic quadratic: an all-pairs primitive costs ~n², so a
    # COPIES× replica multiplies wall clock by ~COPIES² with flat output
    assert is_superlinear(float(COPIES**2), 1.0)
    assert is_superlinear(float(COPIES**2), None)
    # output-bound is explained: slope 45 with 45× more pairs emitted
    assert not is_superlinear(45.0, 45.0)
    # sublinear growth (amortization ending) is never a flag
    assert not is_superlinear(3.95, 1.0)
    # every currently recorded measurement must be unflagged
    with open("/root/repo/SCALE_EXPERIMENT.json") as f:
        rec = json.load(f)
    refired = [
        n
        for n, t in rec["queries"].items()
        if is_superlinear(t["ratio_10x_rows"], t.get("output_ratio"))
    ]
    assert refired == [], refired


def test_soak_fails_fast_on_unknown_query_names(monkeypatch):
    """soak()'s subset path must reject a typo'd name BEFORE building
    the ~sf10 replica — a KeyError mid-loop would also lose the rows
    already measured for earlier names (the merge into
    SCALE_EXPERIMENT.json happens after the loop). r13 ADVICE."""
    import sys as _sys

    import pytest

    from tools import scale_experiment as se

    def _must_not_run(*a, **k):  # replica build is the expensive step
        raise AssertionError("build_soak_replica ran before validation")

    monkeypatch.setattr(se, "build_soak_replica", _must_not_run)
    monkeypatch.setattr(se, "get_spark", _must_not_run)
    monkeypatch.setattr(
        _sys, "argv", ["scale_experiment.py", "no_such_query_entry"]
    )
    with pytest.raises(SystemExit, match="no_such_query_entry"):
        se.soak()


def test_rotation_planner_priorities():
    """The planner must put never-green entries first, changed files
    second, and stale greens last — and fill exactly the window."""
    from tools.rotation_planner import plan

    rows = plan(window=50, changed={"sales_data_etl_pipeline_spark/plans/analytics.py"})
    names = [n for n, _, _ in rows]
    assert len(names) == len(set(names)) == len(entrymod.queries())
    in_window = [n for n, _, iw in rows if iw]
    assert len(in_window) == 50
    whys = dict((n, w) for n, w, _ in rows)
    # every never-green entry ranks above every changed/stale entry
    first_other = next(
        i for i, (_, w, _) in enumerate(rows) if not w.startswith("never-green")
    )
    assert all(w == "never-green" for _, w, _ in rows[:first_other])
    # a changed-file entry ranks above an unchanged same-round entry
    # (paths are matched repo-relative, never by basename)
    assert whys["sales_by_employee"].startswith(
        "changed:sales_data_etl_pipeline_spark/plans/analytics.py"
    )


def test_rotation_planner_promote_ahead_outranks_changed_tier():
    """--promote-ahead places a named GREEN entry after never-green but
    BEFORE the forced/changed tier — the judge-directed headliner
    refresh a large carry backlog would otherwise displace — and its
    reason string is an honest promotion, not a changed-code claim."""
    from tools.rotation_planner import plan

    rows = plan(
        window=50,
        force_changed={"dedup_exact"},
        promote_ahead={"sales_by_employee"},
    )
    order = [n for n, _, _ in rows]
    whys = {n: w for n, w, _ in rows}
    assert whys["sales_by_employee"].startswith("stale-promoted-ahead")
    assert whys["dedup_exact"].startswith("forced-changed")
    assert order.index("sales_by_employee") < order.index("dedup_exact")
    # ...but never above a never-green entry
    never = [n for n, w, _ in rows if w == "never-green"]
    if never:
        assert order.index(never[-1]) < order.index("sales_by_employee")


def test_rotation_planner_stable_tier_rotates_one_representative():
    """--stable-tier: entries with >=3 consecutive green driver
    appearances and unchanged fingerprints sink below the stale-green
    tier, EXCEPT one round-robin representative (the stalest) lifted to
    the head of the stale tier; forced/changed/drift classification
    always outranks stability."""
    from tools.rotation_planner import consecutive_green_counts, plan

    greens = consecutive_green_counts()
    # history may hold rows for entries the registry no longer carries
    # (the r12 consolidation removed 11 micro-gates) — eligibility is
    # live-registry entries only, matching the planner's own iteration
    eligible = {n for n, c in greens.items() if c >= 3} & set(
        entrymod.queries()
    )
    if not eligible:
        import pytest

        pytest.skip("no entry has 3 green appearances yet")
    rows = plan(window=50, stable_tier=True)
    whys = {n: w for n, w, _ in rows}
    stable = {n for n, w in whys.items() if w.startswith("stable (")}
    reps = [n for n, w in whys.items() if w.startswith("stable-rotation")]
    # at most one representative, drawn from the eligible set
    assert len(reps) <= 1
    assert stable | set(reps) <= eligible
    # every plain stale-green entry outranks every stable entry
    order = [n for n, _, _ in rows]
    plain = [n for n, w in whys.items() if w.startswith("green r")]
    if plain and stable:
        assert max(order.index(n) for n in plain) < min(
            order.index(n) for n in stable
        )
    # a forced entry is NEVER classified stable
    forced_name = sorted(eligible)[0]
    rows_forced = plan(
        window=50,
        stable_tier=True,
        force_changed={forced_name},
    )
    whys_f = {n: w for n, w, _ in rows_forced}
    assert whys_f[forced_name].startswith("forced-changed")


def test_rotation_planner_hold_back_sinks_below_everything():
    """--hold-back places named entries at the absolute END of the
    ordering — even a never-green entry — so a new gate can land
    mid-freeze without displacing a forced/carry window slot. The
    reason string states the never-green status honestly.

    Pinned to ``max_round=12``: the two named entries gated green in
    the driver's round-13 run, so at the live default they classify
    "green r13" the moment CORRECTNESS_r13.json lands (the r13 judge
    reproduced exactly that failure). CORRECTNESS_r01–r12 are committed
    and immutable, and neither entry holds a green row there, so the
    never-green expectation is hermetic at this pin — no future driver
    artifact can flip it."""
    from tools.rotation_planner import plan

    held = {"clean_normalize_chain", "clean_keys_chain"}
    rows = plan(window=50, stable_tier=True, hold_back=held, max_round=12)
    order = [n for n, _, _ in rows]
    whys = {n: w for n, w, _ in rows}
    assert set(order[-len(held):]) == held
    for name in held:
        assert whys[name].startswith("held-back")
    # without hold-back the same entries are never-green — the top tier
    rows_free = plan(window=50, stable_tier=True, max_round=12)
    whys_free = {n: w for n, w, _ in rows_free}
    for name in held:
        assert whys_free[name] == "never-green"
