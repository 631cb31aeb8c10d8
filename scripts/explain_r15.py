"""Capture .explain('formatted') for named registry queries into
plans/r15/<query>_<suffix>.txt (committed; the optimization round's
plan-claim evidence).

Usage: python scripts/explain_r15.py SUFFIX name [name ...]
"""

from __future__ import annotations

import os
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parents[1]
sys.path.insert(0, str(REPO))

from ghcn_d_etl_project_spark.plans import all_queries  # noqa: E402
from ghcn_d_etl_project_spark.session import get_spark  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.001")


def main() -> None:
    suffix = sys.argv[1]
    names = sys.argv[2:]
    out_dir = REPO / "plans" / "r15"
    out_dir.mkdir(parents=True, exist_ok=True)
    spark = get_spark(app_name="explain_r15")
    reg = all_queries()
    for name in names:
        df = reg[name].fn(spark, SF_DIR)
        txt = df._sc._jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "formatted"
        )
        (out_dir / f"{name}_{suffix}.txt").write_text(txt)
        print(f"wrote {name}_{suffix}.txt ({len(txt)} chars)", flush=True)
        spark.catalog.clearCache()


if __name__ == "__main__":
    main()
