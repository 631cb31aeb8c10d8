"""Check one or more registry queries against their DuckDB oracles.

Usage: python scripts/check_query.py [--sf SF_DIR] name [name ...]

Same compare as scripts/driver_sim.py (row count + sorted-column schema +
order-insensitive value hash) but scoped to the named queries — the
fast inner loop while authoring a new oracle query, vs the full-registry
sim which takes minutes.
"""

import hashlib
import math
import sys

import duckdb

sys.path.insert(0, "/root/repo")

TABLES = (
    "region nation customer supplier part orders lineitem events "
    "documents embeddings".split()
)


def norm(v):
    if v is None:
        return "NULL"
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return repr(round(v, 6))
    return str(v)


def value_hash(pdf):
    cols = sorted(pdf.columns)
    rows = sorted(
        tuple(norm(v) for v in r)
        for r in pdf[cols].itertuples(index=False, name=None)
    )
    h = hashlib.sha256()
    for r in rows:
        h.update(("\x1f".join(r) + "\x1e").encode())
    return h.hexdigest()


def main() -> int:
    args = sys.argv[1:]
    sf = "/root/testdata/sf0.01"
    if args and args[0] == "--sf":
        sf = args[1]
        args = args[2:]
    if not args:
        print(__doc__)
        return 2

    from pyspark.sql import SparkSession

    from ghcn_d_etl_project_spark.plans import all_queries

    spark = (
        SparkSession.builder.appName("check-query")
        .master("local[8]")
        .config("spark.sql.shuffle.partitions", "8")
        .getOrCreate()
    )
    con = duckdb.connect()
    for tname in TABLES:
        con.execute(
            f"CREATE VIEW {tname} AS SELECT * FROM '{sf}/{tname}.parquet'"
        )
    qs = all_queries()
    fail = 0
    for name in args:
        q = qs[name]
        spdf = q.fn(spark, sf).toPandas()
        if q.oracle is None:
            print(f"{name}: rows-only({len(spdf)})")
            continue
        opdf = con.execute(q.oracle).df()
        ok_rows = len(spdf) == len(opdf)
        ok_schema = sorted(spdf.columns) == sorted(opdf.columns)
        ok_hash = value_hash(spdf) == value_hash(opdf)
        status = "MATCH" if (ok_rows and ok_schema and ok_hash) else "MISMATCH"
        print(f"{name}: {status} [{len(spdf)} spark / {len(opdf)} duck rows]")
        if status == "MISMATCH":
            fail += 1
            print(f"  spark cols: {sorted(spdf.columns)}")
            print(f"  duck  cols: {sorted(opdf.columns)}")
            if ok_schema and ok_rows:
                cols = sorted(spdf.columns)
                s = sorted(
                    tuple(norm(v) for v in r)
                    for r in spdf[cols].itertuples(index=False, name=None)
                )
                o = sorted(
                    tuple(norm(v) for v in r)
                    for r in opdf[cols].itertuples(index=False, name=None)
                )
                shown = 0
                for a, b in zip(s, o):
                    if a != b:
                        print(f"  spark: {a}\n  duck : {b}")
                        shown += 1
                        if shown >= 5:
                            break
    return 1 if fail else 0


if __name__ == "__main__":
    sys.exit(main())
