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


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = float(Path(sf_dir).name.replace("sf", "") or "0.1")
    spark = get_spark(app_name="bench")

    n_runs = int(os.environ.get("SPARK_GRAFT_BENCH_RUNS", "3"))
    queries = {n: q for n, q in all_queries().items() if q.bench}
    timings: dict[str, float] = {}
    # JVM/codegen warmup on the first query's plan so q1 isn't charged
    # for session startup.
    first = next(iter(queries.values()))
    first.fn(spark, sf_dir).limit(1).count()

    for name, q in queries.items():
        runs: list[float] = []
        for _ in range(n_runs):
            t0 = time.perf_counter()
            q.fn(spark, sf_dir).count()
            runs.append(time.perf_counter() - t0)
        timings[name] = round(sorted(runs)[len(runs) // 2], 3)
    total = round(sum(timings.values()), 3)

    print(
        json.dumps(
            {
                "metric": "headline_queries_wall",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "sf": sf,
            }
        )
    )


if __name__ == "__main__":
    main()
