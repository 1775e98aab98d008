"""Registry robustness: the driver contract must survive partial
failures and expose the full surface from a fresh interpreter."""

from __future__ import annotations

import json
import subprocess
import sys

from mapreduce6240project_spark.plans import DRIVER_ORDER, REGISTRY


def test_registry_is_complete():
    assert len(REGISTRY) >= 395


def test_driver_order_names_all_registered():
    missing = [n for n in DRIVER_ORDER if n not in REGISTRY]
    assert missing == []


def test_driver_order_is_prefix_of_registry():
    names = list(REGISTRY)
    assert names[: len(DRIVER_ORDER)] == list(DRIVER_ORDER)


def test_driver_window_spends_budget_on_unverified():
    """Round-10 rotation: the first 50 are oracle-backed queries with
    no hash-exact external verdict yet -- the four queries added
    this round first (standing same-round policy: wave-109 deletion
    vectors + wave-110 CHECK constraints, generated columns and
    column-mapping rename), then 44 draws from the mirror-only
    backlog (the 35 remaining + the 3 written-exemption queries form
    the round-11 endgame window).
    Guards against an import-order change silently demoting them."""
    first50 = list(REGISTRY)[:50]
    for name in (
        # wave 109, added this round: deletion vectors
        "txlog_dv_delete",
        "txlog_dv_purge",
        "txlog_dv_changes",
        "txlog_constraint_gate",
        "txlog_generated_fill",
        "txlog_rename_era_read",
        # family-backlog spot checks (one per exhausted family)
        "burst_users_10min",
        "active_learning_margin",
        "curriculum_buckets",
        "boilerplate_chunks",
        "weighted_sample_orders",
        "contrastive_negatives",
        "streaming_tws_peaks",
        "bigram_coverage_score",
    ):
        assert name in first50
    # fully disjoint from the 377 queries rounds 2-9 already verified
    for fname in (
        "CORRECTNESS_r02.json",
        "CORRECTNESS_r03.json",
        "CORRECTNESS_r04.json",
        "CORRECTNESS_r05.json",
        "CORRECTNESS_r06.json",
        "CORRECTNESS_r07.json",
        "CORRECTNESS_r08.json",
        "CORRECTNESS_r09.json",
    ):
        seen = set(json.load(open(f"/root/repo/{fname}")))
        assert not (set(first50) & seen)
    # every window query carries a hard oracle (strong signal only)
    assert all(REGISTRY[n].oracle for n in first50)


def test_entry_module_fresh_interpreter():
    """__spark_entry__.queries() and oracle_sql() must be non-empty
    under a fresh interpreter (the driver imports it cold)."""
    code = (
        "import json, __spark_entry__ as E;"
        "q = E.queries(); o = E.oracle_sql();"
        "print(json.dumps({'q': len(q), 'o': len(o), 'first': next(iter(q))}))"
    )
    out = subprocess.run(
        [sys.executable, "-c", code],
        capture_output=True,
        text=True,
        cwd="/root/repo",
        check=True,
    )
    info = json.loads(out.stdout.strip().splitlines()[-1])
    assert info["q"] >= 395
    assert info["o"] >= 300
    assert info["first"] == "txlog_dv_delete"


def test_oracle_micros_sums_match_canonical_helper():
    """Every fixed-point sum in an oracle string must carry the full
    canonical quantization (half-up via +0.5, BIGINT cast, matching
    descale) -- a drifted copy (missing rounding term, wrong scale)
    would silently desynchronize that oracle from the Spark side."""
    import re

    from mapreduce6240project_spark.plans import REGISTRY

    shape = re.compile(
        r"sum\(CAST\(floor\(.{0,400}?\* 1000000 \+ 0\.5\) AS BIGINT\)\)",
        re.DOTALL,
    )
    for spec in REGISTRY.values():
        if not spec.oracle:
            continue
        for mobj in re.finditer(r"sum\(CAST\(floor\(", spec.oracle):
            frag = spec.oracle[mobj.start() : mobj.start() + 500]
            # micros sums must end in the canonical rounding + cast; the
            # cents variants (floor(x * 100 + 0.5)) are likewise half-up
            # scale-1 (already-integral doubles, e.g. quantities) carries
            # no descale factor but still needs half-up + the BIGINT cast
            assert re.match(
                r"sum\(CAST\(floor\(.{0,400}?(\* 10+ )?\+ 0\.5\) AS BIGINT\)\)",
                frag,
                re.DOTALL,
            ), f"{spec.name}: non-canonical quantized sum: {frag[:120]}"


def test_registry_snapshot_names_and_oracles():
    """Round-4 consolidation guard: the wave->domain merge must keep
    every registered name and every oracle byte-identical.  The
    snapshot was taken immediately before the merge; future refactors
    that INTENTIONALLY change an oracle must update it."""
    import hashlib
    import pathlib

    snap = json.loads(
        (pathlib.Path(__file__).parent / "registry_snapshot.json").read_text()
    )
    now = {
        n: hashlib.md5((spec.oracle or "").encode()).hexdigest()
        for n, spec in REGISTRY.items()
    }
    assert set(now) >= set(snap), sorted(set(snap) - set(now))[:5]
    drift = [n for n in snap if snap[n] != now[n]]
    assert drift == []


def test_every_query_has_oracle_or_written_exemption():
    """r8 verdict item 6: 448/448 queries carry either a DuckDB oracle
    or a written exemption in tools/coverage_ledger.ORACLE_EXEMPT that
    names the externally hash-checked companion carrying its verdict."""
    import importlib.util

    spec = importlib.util.spec_from_file_location(
        "coverage_ledger", "/root/repo/tools/coverage_ledger.py"
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    no_oracle = {n for n, s in REGISTRY.items() if not s.oracle}
    assert no_oracle == set(mod.ORACLE_EXEMPT)
    for name, why in mod.ORACLE_EXEMPT.items():
        # each rationale must reference a real, oracle-backed companion
        companions = [
            q for q in REGISTRY
            if q != name and f"`{q}`" in why and REGISTRY[q].oracle
        ]
        assert companions, f"{name}: exemption names no oracle-backed twin"
