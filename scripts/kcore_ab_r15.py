"""Round-15 experiment (VERDICT r14 #8): kcore wedge derivation A/B.

A: the committed shape — ``kcore`` checkpoints the CANONICAL edge set
   (u < v) and derives the doubled list + degree aggregate per round.
B: checkpoint the DOUBLED edge list once and feed both the degree
   aggregate and the peel's induced-subgraph join from it, so each
   round's degree pass skips the union and each induced subgraph is one
   join on the doubled table (halving per-round derivations at the cost
   of a 2x-sized checkpoint).

Interleaved same-JVM A/B at sf0.1 (bench posture: clearCache + gc
between runs), N reps each, full kcore_parts registered query for A and
an inline variant for B. Outputs are asserted EQUAL on every rep.

Usage: python scripts/kcore_ab_r15.py [reps]
"""

from __future__ import annotations

import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from pyspark.sql import functions as F  # noqa: E402

from ghcn_d_etl_project_spark.plans import all_queries  # noqa: E402
from ghcn_d_etl_project_spark.session import get_spark  # noqa: E402
from ghcn_d_etl_project_spark.plans._util import t  # noqa: E402
from ghcn_d_etl_project_spark.operators.graphalgo import _undirected  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def _edges(spark):
    li = t(spark, SF_DIR, "lineitem")
    b = li.select(
        F.col("l_orderkey").alias("k"), F.col("l_partkey").alias("p")
    ).distinct()
    a, c = b.alias("a"), b.alias("c")
    return (
        a.join(c, (F.col("a.k") == F.col("c.k")) & (F.col("a.p") < F.col("c.p")))
        .groupBy(F.col("a.p").alias("u"), F.col("c.p").alias("v"))
        .agg(F.count(F.lit(1)).alias("w"))
        .filter(F.col("w") >= 2)
    )


def kcore_b(edges, k: int, max_iters: int = 100):
    """Variant B: checkpoint the DOUBLED edge list per round."""
    und = _undirected(edges, "u", "v")
    d = und.unionByName(
        und.select(F.col("v").alias("u"), F.col("u").alias("v"))
    ).localCheckpoint(eager=True)
    prev_n = None
    for _ in range(max_iters):
        deg = d.groupBy(F.col("u").alias("node")).agg(
            F.count(F.lit(1)).cast("long").alias("degree")
        )
        keep = deg.filter(F.col("degree") >= k).persist()
        n = keep.count()
        if n == 0 or (prev_n is not None and n == prev_n):
            d.unpersist()
            return keep
        prev_n = n
        d2 = (
            d.join(keep.select(F.col("node").alias("u")), "u")
            .join(keep.select(F.col("node").alias("v")), "v")
            .select("u", "v")
            .localCheckpoint(eager=True)
        )
        d.unpersist()
        keep.unpersist()
        d = d2
    raise RuntimeError("no converge")


def main() -> None:
    reps = int(sys.argv[1]) if len(sys.argv) > 1 else 5
    spark = get_spark(app_name="kcore_ab_r15")
    jvm = spark.sparkContext._jvm
    qa = all_queries()["kcore_parts"]

    def clear():
        spark.catalog.clearCache()
        jvm.System.gc()
        time.sleep(0.4)

    # throwaway each
    ref = sorted(map(tuple, qa.fn(spark, SF_DIR).collect()))
    clear()
    got = sorted(map(tuple, kcore_b(_edges(spark), k=3).collect()))
    assert got == ref, f"variant B output differs: {len(got)} vs {len(ref)}"
    clear()

    ta, tb = [], []
    for i in range(reps):
        t0 = time.perf_counter()
        qa.fn(spark, SF_DIR).count()
        ta.append(round(time.perf_counter() - t0, 3))
        clear()
        t0 = time.perf_counter()
        kcore_b(_edges(spark), k=3).count()
        tb.append(round(time.perf_counter() - t0, 3))
        clear()
        print(f"rep {i}: A={ta[-1]} B={tb[-1]}", flush=True)
    print(f"A runs: {ta}  median={sorted(ta)[reps // 2]}")
    print(f"B runs: {tb}  median={sorted(tb)[reps // 2]}")


if __name__ == "__main__":
    main()
