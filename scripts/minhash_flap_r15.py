"""Round-15 experiment: attribute minhash_lsh_dedup's bimodal steady
state (~3.4 s vs ~6-7 s for a byte-identical plan, flipping run to run).

VERDICT r14 #1 asks for a targeted experiment before any restructuring:
is the flip (a) JIT/codegen flapping on the 64-min-agg generated method
(executor CPU time doubles with wall), (b) memory pressure / aggregation
spill (spill bytes appear in slow runs), or (c) external CPU steal
(wall rises while executor CPU time stays flat)?

Method: ONE JVM, N full-query runs under the bench's own posture
(per-run clearCache + System.gc + settle, count() action). The Spark UI
is enabled and after every run the REST status API attributes that
run's stages: executorRunTime, executorCpuTime, jvmGcTime, spill and
shuffle bytes summed over exactly the stages the run submitted. A
driver-side spin probe brackets each run so host steal is visible
independently of Spark.

Usage: python scripts/minhash_flap_r15.py [n_runs] — run on an idle box.
"""

from __future__ import annotations

import json
import os
import sys
import time
import urllib.request
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

os.environ.setdefault("SPARK_GRAFT_UI", "true")
for var in (
    "OMP_NUM_THREADS",
    "OPENBLAS_NUM_THREADS",
    "MKL_NUM_THREADS",
    "VECLIB_MAXIMUM_THREADS",
    "NUMEXPR_NUM_THREADS",
):
    os.environ.setdefault(var, "1")

from ghcn_d_etl_project_spark.plans import all_queries  # noqa: E402
from ghcn_d_etl_project_spark.session import get_spark  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def _spin(dur: float = 0.1) -> float:
    n = 0
    t0 = time.perf_counter()
    while time.perf_counter() - t0 < dur:
        n += 1
    return n / dur / 1e6  # M it/s


def _api(path: str):
    with urllib.request.urlopen(f"http://localhost:4040/api/v1/{path}") as r:
        return json.load(r)


def _app_id() -> str:
    return _api("applications")[0]["id"]


def _stages(app: str) -> list[dict]:
    return _api(f"applications/{app}/stages?status=complete")


def main() -> None:
    n_runs = int(sys.argv[1]) if len(sys.argv) > 1 else 12
    spark = get_spark(app_name="minhash_flap_r15")
    q = all_queries()["minhash_lsh_dedup"]
    app = _app_id()
    jvm = spark.sparkContext._jvm

    # session warm-up (bench shape: one untimed throwaway)
    q.fn(spark, SF_DIR).count()
    spark.catalog.clearCache()
    jvm.System.gc()
    time.sleep(0.4)

    seen = {s["stageId"] for s in _stages(app)}
    rows = []
    for i in range(n_runs):
        spin_before = _spin()
        t0 = time.perf_counter()
        q.fn(spark, SF_DIR).count()
        wall = time.perf_counter() - t0
        spin_after = _spin()
        stages = [s for s in _stages(app) if s["stageId"] not in seen]
        seen.update(s["stageId"] for s in stages)
        agg = {
            "wall": round(wall, 3),
            "spin_mps": [round(spin_before, 1), round(spin_after, 1)],
            "run_ms": sum(s["executorRunTime"] for s in stages),
            "cpu_ms": sum(s["executorCpuTime"] for s in stages) // 1_000_000,
            "gc_ms": sum(s["jvmGcTime"] for s in stages),
            "spill_mb": round(
                sum(
                    s["memoryBytesSpilled"] + s["diskBytesSpilled"]
                    for s in stages
                )
                / 1e6,
                1,
            ),
            "shuf_w_mb": round(
                sum(s["shuffleWriteBytes"] for s in stages) / 1e6, 1
            ),
            "n_stages": len(stages),
        }
        # top-3 stages by executorRunTime with their cpu share, so a
        # slow run names WHICH stage absorbed the extra wall
        top = sorted(stages, key=lambda s: -s["executorRunTime"])[:3]
        agg["top_stages"] = [
            {
                "id": s["stageId"],
                "run_ms": s["executorRunTime"],
                "cpu_ms": s["executorCpuTime"] // 1_000_000,
                "name": s["name"].split("\n")[0][:40],
            }
            for s in top
        ]
        rows.append(agg)
        print(json.dumps({"run": i, **agg}), flush=True)
        spark.catalog.clearCache()
        jvm.System.gc()
        time.sleep(0.4)

    walls = sorted(r["wall"] for r in rows)
    print(
        json.dumps(
            {
                "summary": {
                    "min": walls[0],
                    "med": walls[len(walls) // 2],
                    "max": walls[-1],
                }
            }
        )
    )


if __name__ == "__main__":
    main()
