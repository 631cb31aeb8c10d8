"""Round-15 output-equivalence harness: every operator touched this
round is A/B'd against its pre-change implementation (fetched from git
HEAD into importable shadow modules) with a full collect + exact
compare, at the SFs given on the command line.

Usage:
    git show HEAD:ghcn_d_etl_project_spark/operators/similarity.py > /tmp/oldmods/old_similarity.py
    git show HEAD:ghcn_d_etl_project_spark/operators/clustering.py > /tmp/oldmods/old_clustering.py
    git show HEAD:ghcn_d_etl_project_spark/pipelines/ghcn.py       > /tmp/oldmods/old_ghcn.py
    python scripts/equiv_r15.py sf0.001 sf0.01 sf0.1
"""

from __future__ import annotations

import importlib.util
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from pyspark.sql import functions as F  # noqa: E402

from ghcn_d_etl_project_spark.plans._util import t  # noqa: E402
from ghcn_d_etl_project_spark.session import get_spark  # noqa: E402

OLD = Path("/tmp/oldmods")


def _load(name: str):
    spec = importlib.util.spec_from_file_location(name, OLD / f"{name}.py")
    mod = importlib.util.module_from_spec(spec)
    sys.modules[name] = mod
    spec.loader.exec_module(mod)
    return mod


def _rows(df):
    return sorted(map(tuple, df.collect()))


def check(spark, sf_dir: str) -> None:
    import ghcn_d_etl_project_spark.operators.clustering as new_cl
    import ghcn_d_etl_project_spark.operators.similarity as new_sim

    old_sim = _load("old_similarity")
    old_cl = _load("old_clustering")

    emb = t(spark, sf_dir, "embeddings")

    a = _rows(new_sim.ann_lsh_topk(
        emb, "vec_id", "embedding", dim=64, k=5, n_planes=4, n_tables=16))
    spark.catalog.clearCache()
    b = _rows(old_sim.ann_lsh_topk(
        emb, "vec_id", "embedding", dim=64, k=5, n_planes=4, n_tables=16))
    spark.catalog.clearCache()
    assert a == b, f"ann_lsh_topk differs at {sf_dir}: {len(a)} vs {len(b)}"
    print(f"  ann_lsh_topk EQUAL ({len(a)} rows)", flush=True)

    a = _rows(new_cl.kmeans_lloyd(emb, "vec_id", "embedding", k=8, iters=3))
    spark.catalog.clearCache()
    b = _rows(old_cl.kmeans_lloyd(emb, "vec_id", "embedding", k=8, iters=3))
    spark.catalog.clearCache()
    assert a == b, f"kmeans_lloyd differs at {sf_dir}: {len(a)} vs {len(b)}"
    print(f"  kmeans_lloyd EQUAL ({len(a)} rows)", flush=True)


def check_bronze(spark) -> None:
    """Old vs new bronze over the committed .dly fixtures (plus the
    bench corpus when present)."""
    import ghcn_d_etl_project_spark.pipelines.ghcn as new_gh

    old_gh = _load("old_ghcn")
    fixture_dirs = [
        Path(__file__).resolve().parents[1] / "tests" / "fixtures",
        Path(__file__).resolve().parents[1] / ".tmp" / "ghcn_bench" / "dly",
    ]
    paths: list[str] = []
    for d in fixture_dirs:
        if d.exists():
            paths += [str(p) for p in sorted(d.rglob("*.dly"))]
    assert paths, "no .dly fixtures found"
    a = _rows(new_gh.bronze_from_dly(spark, paths))
    b = _rows(old_gh.bronze_from_dly(spark, paths))
    assert a == b, f"bronze differs: {len(a)} vs {len(b)}"
    print(f"  bronze_from_dly EQUAL ({len(a)} rows over {len(paths)} files)", flush=True)


def main() -> None:
    sfs = sys.argv[1:] or ["sf0.001", "sf0.01"]
    spark = get_spark(app_name="equiv_r15")
    for sf in sfs:
        print(f"== {sf} ==", flush=True)
        check(spark, f"/root/testdata/{sf}")
    check_bronze(spark)
    print("ALL EQUAL")


if __name__ == "__main__":
    main()
