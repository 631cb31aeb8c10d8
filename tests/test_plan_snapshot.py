"""Plan-drift regression gate (round 9).

Rounds 6-8 each adjudicated a bench delta on the claim "the plan did not
change" — asserted from memory. ``PLANS.json`` (written by
``scripts/plan_snapshot.py``) commits every bench query's structural
plan report; this test regenerates the reports live and fails BY QUERY
NAME on any drift, so the claim is now a checkable artifact.

The comparison is the structural ``plan_report`` dict (shuffle count,
join strategies, sorts, window ops, Python eval nodes, per-scan pruned
columns + pushed filters) — invariant to shuffle-partition count and
session identity, unlike the raw plan text whose sha the artifact also
records for round-over-round human diffing at the snapshot config.

An INTENTIONAL plan change is re-snapshotted:
    python scripts/plan_snapshot.py
and the PLANS.json diff documents it in the commit.
"""

from __future__ import annotations

import json
from pathlib import Path

import pytest

from ghcn_d_etl_project_spark.plans import all_queries
from ghcn_d_etl_project_spark.utils.plancheck import plan_report
from tests.conftest import SF_DIR

PLANS = Path(__file__).resolve().parents[1] / "PLANS.json"


def _committed() -> dict:
    assert PLANS.exists(), "PLANS.json missing — run scripts/plan_snapshot.py"
    return json.loads(PLANS.read_text())["queries"]


def test_snapshot_covers_every_bench_query():
    """A bench query added without re-snapshotting would silently dodge
    the drift gate — membership is pinned both ways."""
    committed = set(_committed())
    live = {q.name for q in all_queries().values() if q.bench}
    assert committed == live, (
        f"PLANS.json out of date: missing={sorted(live - committed)}, "
        f"stale={sorted(committed - live)} — run scripts/plan_snapshot.py"
    )


def test_no_unexplained_plan_drift(spark):
    """Every bench query's live structural plan must equal the committed
    snapshot. A failure here means the physical plan changed: either fix
    the regression or re-snapshot and explain the diff in the commit."""
    committed = _committed()
    registry = all_queries()
    drifted: dict[str, dict] = {}
    for name, entry in committed.items():
        if "error" in entry:
            pytest.fail(f"committed snapshot has an error for {name}: {entry}")
        live = plan_report(registry[name].fn(spark, SF_DIR)).as_dict()
        spark.catalog.clearCache()
        if live != entry["report"]:
            drifted[name] = {
                k: {"committed": entry["report"][k], "live": live[k]}
                for k in live
                if live[k] != entry["report"].get(k)
            }
    assert not drifted, (
        "physical-plan drift vs PLANS.json (re-snapshot if intentional):\n"
        + json.dumps(drifted, indent=1, default=str)
    )
