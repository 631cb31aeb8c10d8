"""Driver simulation: exercises __spark_entry__ exactly as the round driver does.

Fresh-process import of /root/repo/__spark_entry__.py -> entry() smoke at
sf0.001, then every queries() entry at sf0.01 compared against oracle_sql()
via DuckDB (row count + sorted-column schema + order-insensitive value hash).

Pass ``--out PATH`` to also write the end-of-run results as a JSON file
(one entry per query: status, seconds, rows) — the committable artifact
covering the FULL registry, including the late-slot queries outside the
round driver's 50-entry CORRECTNESS window (round-7 verdict: their MATCH
status lived only in session stdout, unauditable after the fact).
"""

import hashlib
import importlib.util
import json
import math
import sys
import time

import duckdb

SF001 = "/root/testdata/sf0.001"
SF01 = "/root/testdata/sf0.01"
TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()

spec = importlib.util.spec_from_file_location("__spark_entry__", "/root/repo/__spark_entry__.py")
mod = importlib.util.module_from_spec(spec)
spec.loader.exec_module(mod)

# Deliberately a VANILLA session (NOT ghcn_d_etl_project_spark.session.get_spark):
# the real round driver builds its own SparkSession with none of the engine's
# confs, so any query that silently depends on a session conf must fail HERE
# too (round-1 lesson: nanosAsLong).
from pyspark.sql import SparkSession  # noqa: E402

spark = (
    SparkSession.builder.appName("driver-sim")
    .master("local[8]")
    .config("spark.sql.shuffle.partitions", "8")
    .getOrCreate()
)

# --- smoke: entry() ---
t0 = time.time()
edf = mod.entry(spark)
rows = edf.collect()
print(f"entry(): {len(rows)} rows, schema={[f.name for f in edf.schema.fields]}, {time.time()-t0:.1f}s")
assert len(rows) >= 0

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

con = duckdb.connect()
for t in TABLES:
    con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{SF01}/{t}.parquet'")

qs = mod.queries()
oracles = mod.oracle_sql()
print(f"{len(qs)} queries, {len(oracles)} oracles")
assert set(oracles) <= set(qs), "oracle keys must be subset of query keys"

results = {}
detail = {}
fail = 0
# Registry order (NOT sorted): the real driver walks queries() in dict order
# under a bounded budget, so order here mirrors what it would evaluate first.
for name, fn in qs.items():
    t0 = time.time()
    spdf = fn(spark, SF01).toPandas()
    dt = time.time() - t0
    if name in oracles:
        opdf = con.execute(oracles[name]).df()
        ok = (
            len(spdf) == len(opdf)
            and sorted(spdf.columns) == sorted(opdf.columns)
            and value_hash(spdf) == value_hash(opdf)
        )
        status = "MATCH" if ok else "MISMATCH"
        if not ok:
            fail += 1
            print(f"  spark: {len(spdf)} rows {sorted(spdf.columns)}")
            print(f"  duck : {len(opdf)} rows {sorted(opdf.columns)}")
    else:
        status = f"rows-only({len(spdf)})"
    results[name] = status
    detail[name] = {"status": status, "sec": round(dt, 1), "rows": len(spdf)}
    print(f"{name}: {status} [{dt:.1f}s, {len(spdf)} rows]")

print(json.dumps(results, indent=0))
if "--out" in sys.argv:
    out_path = sys.argv[sys.argv.index("--out") + 1]
    n_match = sum(1 for d in detail.values() if d["status"] == "MATCH")
    n_rows_only = sum(
        1 for d in detail.values() if d["status"].startswith("rows-only")
    )
    with open(out_path, "w") as f:
        json.dump(
            {
                "sf_dir": SF01,
                "n_queries": len(detail),
                "n_oracle_match": n_match,
                "n_oracle_mismatch": fail,
                "n_rows_only": n_rows_only,
                "queries": detail,
            },
            f,
            indent=1,
        )
    print(f"wrote {out_path}")
sys.exit(1 if fail else 0)
