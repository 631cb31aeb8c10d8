"""Plan-snapshot artifact: the physical plan of every bench query,
committed per round so "no plan change" is a checkable diff, not memory.

Rounds 6-8 each adjudicated a bench delta on the premise "the plan did
not change" — asserted from session memory, unfalsifiable after the
fact. This script writes ``PLANS.json`` at the repo root: for each
``bench=True`` registry query, the structural ``plan_report`` counts
(shuffles, join strategies, sorts, scans with pruned columns + pushed
filters) plus the NORMALIZED executed-plan text and its sha256.
``tests/test_plan_snapshot.py`` regenerates the reports and fails on
any drift from the committed file, so an unexplained plan change breaks
CI by query name; an intentional one is re-snapshotted here and shows
up in the git diff of PLANS.json.

Normalization strips the volatile parts of Spark's plan text — expression
ids (``name#123``), plan/subquery ids, session-specific file paths and
location lists, statistics — so the sha is stable across processes on
identical logical plans at the same scale factor.

Usage: ``python scripts/plan_snapshot.py [--sf DIR] [--out PATH]``
(defaults: /root/testdata/sf0.001 — the build-check SF, where plan
SHAPE is decided cheaply; structural counts are SF-invariant for these
queries because every size-dependent choice is pinned with explicit
hints in the plans themselves).
"""

from __future__ import annotations

import argparse
import hashlib
import json
import re
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parents[1]
sys.path.insert(0, str(REPO))

from ghcn_d_etl_project_spark.plans import all_queries  # noqa: E402
from ghcn_d_etl_project_spark.session import get_spark  # noqa: E402
from ghcn_d_etl_project_spark.utils.plancheck import (  # noqa: E402
    plan_report,
    plan_string,
)

_NORMALIZERS = (
    (re.compile(r"#\d+[L]?"), "#"),  # expression ids
    (re.compile(r"\b(plan_id|id|subquery)=#?\d+"), r"\1="),
    (re.compile(r"file:[^\s,\]\)]+"), "file:PATH"),
    (re.compile(r"Location: \S+ \[[^\]]*\]"), "Location: NORM"),
    (re.compile(r"Statistics\([^)]*\)"), "Statistics(NORM)"),
    (re.compile(r"\[\d+ paths\]"), "[N paths]"),
    (re.compile(r"cachedrdd-\d+"), "cachedrdd-N"),
    (re.compile(r"InMemoryRelation \[[^\]]*\]"), "InMemoryRelation [NORM]"),
)


def normalize_plan(text: str) -> str:
    for pat, rep in _NORMALIZERS:
        text = pat.sub(rep, text)
    return text


def snapshot(spark, sf_dir: str) -> dict:
    out: dict[str, dict] = {}
    for name, q in all_queries().items():
        if not q.bench:
            continue
        try:
            df = q.fn(spark, sf_dir)
            report = plan_report(df).as_dict()
            norm = normalize_plan(plan_string(df))
            out[name] = {
                "report": report,
                "plan_sha": hashlib.sha256(norm.encode()).hexdigest()[:16],
                "plan": norm,
            }
        except Exception as e:  # noqa: BLE001 — record, keep snapshotting
            out[name] = {"error": f"{type(e).__name__}: {e}"[:300]}
        finally:
            spark.catalog.clearCache()
    return out


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", default="/root/testdata/sf0.001")
    ap.add_argument("--out", default=str(REPO / "PLANS.json"))
    args = ap.parse_args()
    spark = get_spark(app_name="plan-snapshot")
    plans = snapshot(spark, args.sf)
    doc = {"sf_dir": args.sf, "queries": plans}
    Path(args.out).write_text(json.dumps(doc, indent=1, sort_keys=True) + "\n")
    errs = {n: p["error"] for n, p in plans.items() if "error" in p}
    print(f"snapshotted {len(plans)} bench-query plans -> {args.out}")
    if errs:
        print("ERRORS:", json.dumps(errs, indent=1))
        sys.exit(1)


if __name__ == "__main__":
    main()
