"""Plan-drift regression gate (round 9; full-registry since round 10).

Rounds 6-8 each adjudicated a bench delta on the claim "the plan did not
change" — asserted from memory. ``PLANS.json`` (written by
``scripts/plan_snapshot.py``) commits every registry query's structural
plan report; this test regenerates the reports live and fails BY QUERY
NAME on any drift, so the claim is now a checkable artifact. Round 10
extended coverage from the 25 bench queries to all of them: the exact
bug class the gate exists for (de9c923 — four NON-bench queries
rescanning their source, PMI 11x in one action) was found by hand in
the gate's blind spot.

The comparison is the structural ``plan_report`` dict (shuffle count,
join strategies, sorts, window ops, Python eval nodes, cold vs
cache-served scans, per-scan pruned columns + pushed filters) —
invariant to shuffle-partition count and session identity, unlike the
raw plan text whose sha the artifact also records for round-over-round
human diffing at the snapshot config.

An INTENTIONAL plan change is re-snapshotted:
    python scripts/plan_snapshot.py
and the PLANS.json diff documents it in the commit. The snapshot run
itself (and ``test_cold_scan_ceiling`` here) fails on any query whose
COLD scan count exceeds the ceiling without an allowlist entry — the
automatic tripwire that would have caught the PMI rescans at authoring
time instead of in a round-later manual audit.
"""

from __future__ import annotations

import json
import sys
from pathlib import Path

import pytest

REPO = Path(__file__).resolve().parents[1]
sys.path.insert(0, str(REPO / "scripts"))

from ghcn_d_etl_project_spark.plans import all_queries
from ghcn_d_etl_project_spark.utils.plancheck import plan_report
from plan_snapshot import (  # noqa: E402
    BNLJ_ALLOWLIST,
    CARTESIAN_ALLOWLIST,
    CARTESIAN_CEILING,
    COLD_SCAN_ALLOWLIST,
    COLD_SCAN_CEILING,
)
from tests.conftest import SF_DIR

PLANS = REPO / "PLANS.json"


def _committed() -> dict:
    assert PLANS.exists(), "PLANS.json missing — run scripts/plan_snapshot.py"
    return json.loads(PLANS.read_text())["queries"]


def test_snapshot_covers_every_registry_query():
    """A query added without re-snapshotting would silently dodge the
    drift gate — membership is pinned both ways, for the WHOLE registry
    (bench membership additionally implies full plan text)."""
    committed = _committed()
    live = set(all_queries())
    assert set(committed) == live, (
        f"PLANS.json out of date: missing={sorted(live - set(committed))}, "
        f"stale={sorted(set(committed) - live)} — run scripts/plan_snapshot.py"
    )
    with_text = {n for n, e in committed.items() if "plan" in e}
    bench = {q.name for q in all_queries().values() if q.bench}
    assert with_text == bench, (
        f"full-text membership != bench set: missing_text="
        f"{sorted(bench - with_text)}, extra_text={sorted(with_text - bench)}"
    )


def test_no_unexplained_plan_drift(spark):
    """Every registry query's live structural plan must equal the
    committed snapshot. A failure here means the physical plan changed:
    either fix the regression or re-snapshot and explain the diff in
    the commit."""
    committed = _committed()
    registry = all_queries()
    drifted: dict[str, dict] = {}
    for name, entry in committed.items():
        if "error" in entry:
            pytest.fail(f"committed snapshot has an error for {name}: {entry}")
        if name not in registry:
            continue  # membership test reports this with a better message
        live = plan_report(registry[name].fn(spark, SF_DIR)).as_dict()
        spark.catalog.clearCache()
        if live != entry["report"]:
            drifted[name] = {
                k: {"committed": entry["report"].get(k), "live": live[k]}
                for k in live
                if live[k] != entry["report"].get(k)
            }
    assert not drifted, (
        "physical-plan drift vs PLANS.json (re-snapshot if intentional):\n"
        + json.dumps(drifted, indent=1, default=str)
    )


def test_cold_scan_ceiling():
    """No query's COMMITTED plan may exceed the cold-scan ceiling
    without an allowlist entry. cold_scans counts FileScans outside any
    InMemoryRelation subtree — real rescans, not the textual reprints a
    persisted substrate gets per cached reference — so this is the
    automatic form of the audit that found the de9c923 rescans. Runs on
    the committed artifact (the live plans are pinned equal to it by
    test_no_unexplained_plan_drift, so checking the file checks the
    code)."""
    offenders = {}
    for name, entry in _committed().items():
        cold = entry.get("report", {}).get("cold_scans", 0)
        if cold > COLD_SCAN_CEILING and name not in COLD_SCAN_ALLOWLIST:
            offenders[name] = cold
    assert not offenders, (
        f"cold FileScans > {COLD_SCAN_CEILING} (persist the substrate or "
        f"allowlist with a reason in scripts/plan_snapshot.py): {offenders}"
    )


def test_cartesian_and_bnlj_ceilings():
    """No committed plan may contain a CartesianProduct (ceiling 0 — r10
    proved one can sit in the artifact unremarked: copurchase_triangles'
    OR-disjunction close join), and every BroadcastNestedLoopJoin must be
    allowlisted BY NAME with a reason (the legitimate ones are all
    one-row global-aggregate broadcasts — O(n) scalar probes, not pair
    explosions). Runs on the committed artifact; the drift test pins the
    live plans equal to it. The allowlists must also not rot: every
    entry must still name a registry query whose plan still has a BNLJ."""
    committed = _committed()
    cart_offenders, bnlj_offenders = {}, {}
    for name, entry in committed.items():
        rep = entry.get("report", {})
        cart = rep.get("cartesian_products", 0)
        if cart > CARTESIAN_CEILING and name not in CARTESIAN_ALLOWLIST:
            cart_offenders[name] = cart
        if rep.get("nested_loop_joins", 0) > 0 and name not in BNLJ_ALLOWLIST:
            bnlj_offenders[name] = rep["nested_loop_joins"]
    assert not cart_offenders, (
        f"CartesianProduct in committed plan (pair explosion at scale — "
        f"rewrite as equi-joins or allowlist with a reason): {cart_offenders}"
    )
    assert not bnlj_offenders, (
        f"unlisted BroadcastNestedLoopJoin (one-row scalar broadcasts get "
        f"an allowlist entry with a reason; anything else is a rewrite): "
        f"{bnlj_offenders}"
    )
    stale = {
        n
        for n in BNLJ_ALLOWLIST
        if committed.get(n, {}).get("report", {}).get("nested_loop_joins", 0)
        == 0
    }
    assert not stale, f"BNLJ_ALLOWLIST entries with no BNLJ anymore: {stale}"
