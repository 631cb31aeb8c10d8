"""Plan-snapshot artifact: the physical plan of EVERY registry query,
committed per round so "no plan change" is a checkable diff, not memory.

Rounds 6-8 each adjudicated a bench delta on the premise "the plan did
not change" — asserted from session memory, unfalsifiable after the
fact. Round 9 pinned the 25 ``bench=True`` queries; round 10 extends
the gate to the FULL registry after the exact bug class the gate exists
for was found BY HAND in its blind spot (de9c923: four non-bench
queries rescanning their source — PMI 11x — none of them snapshotted).

This script writes ``PLANS.json`` at the repo root: for EVERY registry
query, the structural ``plan_report`` counts (shuffles, join
strategies, sorts, cold scans vs cached references, per-scan pruned
columns + pushed filters) plus the sha256 of the NORMALIZED
executed-plan text; the full normalized text itself is kept only for
the ``bench=True`` set (size: text for all 147 would be ~1.5 MB of
churn per round; the sha still pins it).
``tests/test_plan_snapshot.py`` regenerates the reports and fails on
any drift from the committed file, so an unexplained plan change breaks
CI by query name; an intentional one is re-snapshotted here and shows
up in the git diff of PLANS.json.

COLD-SCAN CEILING: ``plan_report.cold_scans`` counts FileScans NOT
inside an InMemoryRelation subtree — the metric that distinguishes a
real rescan bug (the PMI class: 11 cold scans of one source in one
action) from a persisted substrate textually reprinted per cached
reference (the fixed PMI: cold=0, cached_refs=11). Any query whose
cold_scans exceeds ``COLD_SCAN_CEILING`` fails this script (and the
test) unless listed in ``COLD_SCAN_ALLOWLIST`` with a reason — so the
next PMI-class bug fails the snapshot run itself, before a human has
to notice a number in a diff.

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

# Maximum cold (non-cache-served) FileScans a query's initial plan may
# contain. Census at r10: 124 of 147 queries sit at <= 4; the max is 8
# (star schemas scanning several DISTINCT tables once each, and the
# two-sided drift/association queries). The PMI bug this guards against
# read 11. Raising the ceiling for a genuinely wider query is a
# one-line allowlist entry WITH a reason — the point is that it cannot
# happen silently.
COLD_SCAN_CEILING = 8
COLD_SCAN_ALLOWLIST: dict[str, str] = {
    # name: reason (kept empty at r10 — every query fits the ceiling;
    # entries look like "star_join_wide: scans 9 distinct dims once each")
}

# JOIN-SHAPE CEILINGS (round 11): r10's audit found a real
# CartesianProduct sitting in a committed PLANS.json unremarked
# (copurchase_triangles' OR-disjunction close join — |wedges| x |edges|
# pair tests at scale). The cold-scan ceiling was the only automatic
# plan gate; now the two pair-explosion join strategies are gated too.
#
# CartesianProduct: ceiling ZERO. There is no benign cartesian in this
# engine — every "compare against a scalar" pattern broadcasts a
# one-row aggregate (which plans a BroadcastNestedLoopJoin, below), and
# every all-pairs semantics (skyline, similarity) has a banded/bounded
# rewrite. A new cartesian is a bug or needs a written reason here.
CARTESIAN_CEILING = 0
CARTESIAN_ALLOWLIST: dict[str, str] = {}

# BroadcastNestedLoopJoin: allowlist BY NAME. Every entry below is a
# ONE-ROW build side — a global aggregate (total count, max date, chi2
# denominator, KS statistic...) cross-joined onto the fact, so the
# "nested loop" is a single O(n) probe pass, not a pair explosion.
# Counts > 1 are the same one-row broadcast reprinted through chained
# passes / join-back lineage, not distinct loops. A query NOT listed
# here whose plan grows a BNLJ fails the snapshot run and the test.
_ONE_ROW = "one-row global-aggregate broadcast (scalar cross join)"
BNLJ_ALLOWLIST: dict[str, str] = {
    "bh_fdr_events": _ONE_ROW + " — arm-totals row onto the metric table",
    "bigram_perplexity_docs": _ONE_ROW + " — vocab-size row onto the model",
    "bitmap_prune_join_revenue": _ONE_ROW + " — bitmap build summary",
    "bm25_search_docs": _ONE_ROW + " — corpus N/avgdl row",
    "categorical_association": _ONE_ROW + " — chi2 grand totals, x1 (r13: margin entropies folded into the single cell-level aggregate via sum_cells -(o/n)ln(margin/n), so the totals row attaches once)",
    "charlm_quality_docs": _ONE_ROW + " — corpus char-lm normalizer, x2",
    "ccnet_buckets_docs": _ONE_ROW + " — the charlm normalizer pair "
    "(total + oov floor) inside the persisted score substrate (r13)",
    "column_stats_outliers": _ONE_ROW + " — exact quantile anchor row",
    "cross_perplexity_docs": _ONE_ROW + " — vocab-size row onto the "
    "model/floor/uniform branches (r12)",
    "cuped_adjusted_events": _ONE_ROW + " — theta/means row",
    "embedding_batch_drift": _ONE_ROW + " — the two 1-row per-split "
    "fixed-point aggregates cross-joined into the final readout (r12)",
    "decile_lift_events": _ONE_ROW + " — global base-rate row",
    "dsir_weights_docs": _ONE_ROW + " — (N_target, N_raw) feature-total "
    "row onto the <= 512-row bucket table (r13)",
    "epoch_upsample_docs": _ONE_ROW + " — smoothed-term total onto the "
    "per-domain rate plan (the temperature_mix normalizer pattern)",
    "equidepth_hist_orders": _ONE_ROW + " — total-count row",
    "event_copurchase": _ONE_ROW + " — basket-universe count",
    "expectations_orders": _ONE_ROW + " — suite total row",
    "histogram_bins": _ONE_ROW + " — min/max/width row",
    "iqr_outliers_approx": _ONE_ROW + " — 1-row sketch (q1, q3) output "
    "probed by the exact-rank certificate pass (r12)",
    "js_divergence_docs": _ONE_ROW + " — the two 1-row token-total "
    "rows broadcast onto the vocabulary-union join (r12)",
    "kappa_nearest_centroid": _ONE_ROW + " — (N, agree) row x (pe "
    "numerator) row folded into the kappa readout (r12)",
    "key_containment_orders": _ONE_ROW + " — per-side key counts, x2",
    "ks_drift_orders": _ONE_ROW + " — KS sup-distance row",
    "lorenz_deciles_customers": _ONE_ROW + " — grand-total revenue row",
    "percentile_feature_orders": _ONE_ROW + " — N_total row",
    "pmi_cooccurrence_docs": _ONE_ROW + " — corpus n_docs row onto the scored pairs, x1 (r13: the vocab ceiling became a scalar subquery — a BNLJ there doubles through the pair self-join's lineage reprint)",
    "quantile_normalize_docs": _ONE_ROW + " — pooled total-N row onto the "
    "ranked fact (the per-source sizes and the pooled rank map are both "
    "hash equi-joins)",
    "rfm_segments": _ONE_ROW + " — ONE shared totals row (N_total + max "
    "date) broadcast onto each of the 3 metric value-maps; r12 collapsed "
    "the r11 86-reprint join-back lineage to exactly these 3",
    "skew_report_lineitem": _ONE_ROW + " — table-total row",
    "survival_km_events": _ONE_ROW + " — risk-set base row",
    "temperature_mix_docs": _ONE_ROW + " — domain-rate normalizer row",
    "tfidf_top_terms": _ONE_ROW + " — doc-count row",
    "zipf_fit_docs": _ONE_ROW + " — the 1-row vocab (size, total) "
    "stats joined onto the 1-row OLS moment readout (r13)",
    "zorder_layout_audit": _ONE_ROW + " — layout summary row",
}


def check_cold_scans(name: str, report: dict) -> str | None:
    """Ceiling violation message, or None when the query is fine."""
    cold = report.get("cold_scans", 0)
    if cold <= COLD_SCAN_CEILING or name in COLD_SCAN_ALLOWLIST:
        return None
    return (
        f"{name}: {cold} cold FileScans > ceiling {COLD_SCAN_CEILING} — "
        f"a rescan bug (persist the substrate) or an allowlist entry"
    )


def check_join_shapes(name: str, report: dict) -> list[str]:
    """Cartesian/BNLJ ceiling violations (empty when the query is fine)."""
    msgs = []
    cart = report.get("cartesian_products", 0)
    if cart > CARTESIAN_CEILING and name not in CARTESIAN_ALLOWLIST:
        msgs.append(
            f"{name}: {cart} CartesianProduct(s) — pair explosion at scale; "
            f"rewrite as equi-join(s) (see graphalgo triangle close, r11) "
            f"or allowlist with a reason"
        )
    if report.get("nested_loop_joins", 0) > 0 and name not in BNLJ_ALLOWLIST:
        msgs.append(
            f"{name}: BroadcastNestedLoopJoin not in BNLJ_ALLOWLIST — "
            f"if the build side is a one-row scalar, allowlist it with a "
            f"reason; otherwise rewrite as an equi-join"
        )
    return msgs


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
        try:
            df = q.fn(spark, sf_dir)
            report = plan_report(df).as_dict()
            norm = normalize_plan(plan_string(df))
            out[name] = {
                "report": report,
                "plan_sha": hashlib.sha256(norm.encode()).hexdigest()[:16],
            }
            if q.bench:
                out[name]["plan"] = norm
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
    ceiling = [
        m
        for n, p in plans.items()
        if "report" in p
        for m in [check_cold_scans(n, p["report"])]
        if m
    ]
    for n, p in plans.items():
        if "report" in p:
            ceiling.extend(check_join_shapes(n, p["report"]))
    n_bench = sum(1 for p in plans.values() if "plan" in p)
    print(
        f"snapshotted {len(plans)} query plans ({n_bench} with full text) "
        f"-> {args.out}"
    )
    if ceiling:
        print("PLAN CEILING VIOLATIONS (cold scans / cartesians / BNLJs):")
        for m in ceiling:
            print(" ", m)
    if errs:
        print("ERRORS:", json.dumps(errs, indent=1))
    if errs or ceiling:
        sys.exit(1)


if __name__ == "__main__":
    main()
