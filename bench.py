#!/usr/bin/env python
"""Benchmark harness: run the headline queries at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and print ONE
JSON line:

    {"metric": "...", "value": N, "unit": "sec", "queries": {...}, "sf": ...}

The headline set is every registry query registered with ``bench=True`` —
one representative per operator family (scan+agg, join, window, reshape,
dedup, similarity). Each query is executed to completion with a
``count()`` (materializes every row; no collect-to-driver cost in the
measurement).

Each query runs ``SPARK_GRAFT_BENCH_RUNS`` times (default 3) and reports
the per-query MEDIAN; the headline value is the sum of medians. Single
runs swing +/-25-50% on small queries (JIT, parquet-footer caching, GC),
which made round-over-round deltas unfalsifiable — the median of 3 with
the first (cold) run naturally discarded is the cheapest attributable
number.

Failure posture (round-4 lesson: one broken plan must not silence the
whole bench):
  * BEFORE timing, every registered plan — bench or not — is built once
    at the small build-check SF (``SPARK_GRAFT_BENCH_BUILD_SF_DIR``,
    default the sf0.001 sibling of $SPARK_GRAFT_SF_DIR); analysis errors
    (the round-4 NTZ class) surface there by name, cheaply, even for
    plans whose construction materializes. The gate is informational
    (``build_errors``) — bench queries are still timed, since a small-SF
    failure can be data-dependent rather than analysis-time.
  * a query that throws while timing records an error entry instead of
    crashing the harness; the JSON line is ALWAYS emitted, with every
    breakage named under ``"errors"``.
  * the cache is cleared between query families so a persist leaked by
    one query can't occupy memory during another's measurement (within
    one query's runs the cache is left warm — same semantics as r4).
"""

from __future__ import annotations

import json
import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent))

from ghcn_d_etl_project_spark.plans import all_queries  # noqa: E402
from ghcn_d_etl_project_spark.session import get_spark  # noqa: E402


def _err(e: Exception) -> str:
    return f"{type(e).__name__}: {e}"[:300]


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = float(Path(sf_dir).name.replace("sf", "") or "0.1")
    spark = get_spark(app_name="bench")

    n_runs = int(os.environ.get("SPARK_GRAFT_BENCH_RUNS", "3"))
    registry = all_queries()
    errors: dict[str, str] = {}

    # Registry-wide plan-build gate at the SMALL sf: some plan builders
    # legitimately materialize (connected components' iterative closure,
    # IVF's bounded quantizer fit), so the gate runs where that costs
    # milliseconds, not minutes — analysis-time breakage is sf-invariant.
    build_dir = os.environ.get(
        "SPARK_GRAFT_BENCH_BUILD_SF_DIR", str(Path(sf_dir).parent / "sf0.001")
    )
    if not Path(build_dir).exists():
        build_dir = sf_dir
    build_errors: dict[str, str] = {}
    for name, q in registry.items():
        try:
            q.fn(spark, build_dir)
        except Exception as e:  # noqa: BLE001 — record and keep benching
            build_errors[name] = _err(e)
    spark.catalog.clearCache()

    # The gate is INFORMATIONAL for the bench set: a small-SF failure may
    # be data-dependent (empty table, missing sibling), so every bench
    # query still gets its timing attempt — a real breakage lands in
    # `errors` with the bench SF's own exception.
    queries = {n: q for n, q in registry.items() if q.bench}
    timings: dict[str, float] = {}
    # JVM/codegen warmup on the first query's plan so q1 isn't charged
    # for session startup.
    if queries:
        try:
            next(iter(queries.values())).fn(spark, sf_dir).limit(1).count()
        except Exception:  # noqa: BLE001 — warmup is best-effort
            pass

    for name, q in queries.items():
        runs: list[float] = []
        try:
            for _ in range(n_runs):
                t0 = time.perf_counter()
                q.fn(spark, sf_dir).count()
                runs.append(time.perf_counter() - t0)
            timings[name] = round(sorted(runs)[len(runs) // 2], 3)
        except Exception as e:  # noqa: BLE001 — name it, keep going
            errors[name] = _err(e)
        finally:
            spark.catalog.clearCache()
    total = round(sum(timings.values()), 3)

    out = {
        "metric": "headline_queries_wall",
        "value": total,
        "unit": "sec",
        "queries": timings,
        "sf": sf,
    }
    if errors:
        # the sum covers only surviving queries — flag it so a broken
        # round can never read as a round-over-round speedup
        out["errors"] = errors
        out["value_incomplete"] = True
    if build_errors:
        out["build_errors"] = build_errors
    print(json.dumps(out))


if __name__ == "__main__":
    main()
