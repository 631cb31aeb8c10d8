"""Round-15 experiment: numpy (Arrow-batched) MinHash signature stage.

The flap experiment (scripts/minhash_flap_r15.py) refuted the codegen
hypothesis — executor CPU is FLAT across fast/slow runs — but showed the
substrate stage (shingle hashing + the 64-min-agg signature build)
carries ~2/3 of the query's total task CPU (~24.5s of ~37s). This
prototype computes the IDENTICAL signature values (min over shingles of
``xxhash64(h, i)`` for i in 0..63, Spark seed 42, signed-long min) with
one vectorized numpy pass per Arrow batch:

  hashLong(h, 42) once per shingle, then per function index i the
  hashInt tail over an (n_shingles x 64) matrix, signed-view min via
  ``np.minimum.reduceat`` over doc offsets.

Checks full bit-equality against the JVM aggregate at the bench SF, then
interleaved same-JVM A/B of (a) the signature stage alone (noop sink)
and (b) the full registered minhash_lsh_dedup query.

Usage: python scripts/minhash_np_ab_r15.py [reps]
"""

from __future__ import annotations

import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

for var in (
    "OMP_NUM_THREADS",
    "OPENBLAS_NUM_THREADS",
    "MKL_NUM_THREADS",
    "VECLIB_MAXIMUM_THREADS",
    "NUMEXPR_NUM_THREADS",
):
    os.environ.setdefault(var, "1")

import numpy as np  # noqa: E402

from pyspark.sql import functions as F  # noqa: E402

from ghcn_d_etl_project_spark.operators.dedup import (  # noqa: E402
    hashed_shingle_sets,
    minhash_lsh_dedup,
    minhash_signatures,
)
from ghcn_d_etl_project_spark.plans import all_queries  # noqa: E402
from ghcn_d_etl_project_spark.plans._util import t  # noqa: E402
from ghcn_d_etl_project_spark.session import get_spark  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

# XXH64 primes (public algorithm; same constants as Spark's XXH64)
_P1 = np.uint64(0x9E3779B185EBCA87)
_P2 = np.uint64(0xC2B2AE3D27D4EB4F)
_P3 = np.uint64(0x165667B19E3779F9)
_P4 = np.uint64(0x85EBCA77C2B2AE63)
_P5 = np.uint64(0x27D4EB2F165667C5)


def _rotl(x: np.ndarray, r: int) -> np.ndarray:
    return (x << np.uint64(r)) | (x >> np.uint64(64 - r))


def _fmix(h: np.ndarray) -> np.ndarray:
    h = h ^ (h >> np.uint64(33))
    h = h * _P2
    h = h ^ (h >> np.uint64(29))
    h = h * _P3
    h = h ^ (h >> np.uint64(32))
    return h


def _hash_long(l: np.ndarray, seed: np.uint64) -> np.ndarray:
    h = seed + _P5 + np.uint64(8)
    h = h ^ (_rotl(l * _P2, 31) * _P1)
    h = _rotl(h, 27) * _P1 + _P4
    return _fmix(h)


def _hash_int_tail(seeds: np.ndarray, ivals: np.ndarray) -> np.ndarray:
    """hashInt(i, seed) vectorized over a (n_seeds x n_i) grid."""
    h = (seeds + _P5 + np.uint64(4))[:, None] ^ (
        (ivals & np.uint64(0xFFFFFFFF)) * _P1
    )[None, :]
    h = _rotl(h, 23) * _P2 + _P3
    return _fmix(h)


def minhash_signatures_np(sets, n_hashes: int = 64):
    """(doc, sig) with sig[i] = min over shingles of xxhash64(h, i) —
    bit-identical to the JVM 64-min-agg form, one Arrow crossing."""
    ivals = np.arange(n_hashes, dtype=np.uint64)

    def run(batches):
        import pandas as pd

        np.seterr(over="ignore")
        for pdf in batches:
            if not len(pdf):
                continue
            lens = pdf["sh"].map(len).to_numpy()
            keep = lens > 0  # explode drops shingle-less docs
            if not keep.any():
                continue
            docs = pdf["doc"].to_numpy()[keep]
            lens = lens[keep]
            flat = np.concatenate(
                [np.asarray(v, dtype=np.int64) for v in pdf["sh"][keep]]
            ).view(np.uint64)
            hl = _hash_long(flat, np.uint64(42))
            grid = _hash_int_tail(hl, ivals).view(np.int64)
            offsets = np.zeros(len(lens), dtype=np.int64)
            np.cumsum(lens[:-1], out=offsets[1:])
            mins = np.minimum.reduceat(grid, offsets, axis=0)
            yield pd.DataFrame({"doc": docs, "sig": list(mins)})

    doc_t = sets.schema["doc"].dataType.simpleString()
    return sets.mapInPandas(run, f"doc {doc_t}, sig array<long>")


def main() -> None:
    reps = int(sys.argv[1]) if len(sys.argv) > 1 else 5
    spark = get_spark(app_name="minhash_np_ab_r15")
    jvm = spark.sparkContext._jvm

    def clear():
        spark.catalog.clearCache()
        jvm.System.gc()
        time.sleep(0.4)

    docs = t(spark, SF_DIR, "documents")
    sets = hashed_shingle_sets(docs, "doc_id", "text", n=4, unit="char").persist()
    sets.count()

    # --- exactness: full collect equality at the bench SF ---
    jv = {
        r["doc"]: tuple(r["sig"])
        for r in minhash_signatures(docs, "doc_id", "text", shingles=sets).collect()
    }
    npv = {
        r["doc"]: tuple(r["sig"]) for r in minhash_signatures_np(sets).collect()
    }
    assert set(jv) == set(npv), (len(jv), len(npv))
    bad = [d for d in jv if jv[d] != npv[d]]
    assert not bad, f"{len(bad)} docs differ, e.g. {bad[:3]}"
    print(f"EXACT: {len(jv)} signatures bit-identical", flush=True)

    # --- stage A/B (noop sink, same JVM, interleaved) ---
    def noop(df):
        t0 = time.perf_counter()
        df.write.format("noop").mode("overwrite").save()
        return round(time.perf_counter() - t0, 3)

    ja, nb = [], []
    for _ in range(reps):
        ja.append(noop(minhash_signatures(docs, "doc_id", "text", shingles=sets)))
        nb.append(noop(minhash_signatures_np(sets)))
    print(f"stage jvm:   {ja}")
    print(f"stage numpy: {nb}", flush=True)
    sets.unpersist()
    clear()

    # --- full-query A/B: registered query vs numpy-signature variant ---
    q = all_queries()["minhash_lsh_dedup"]

    def full_np():
        import ghcn_d_etl_project_spark.operators.dedup as dd

        orig = dd.minhash_signatures

        def patched(df, id_col, text_col, n_hashes=64, n=4, shingles=None, unit="char"):
            assert shingles is not None
            return minhash_signatures_np(shingles, n_hashes=n_hashes)

        dd.minhash_signatures = patched
        try:
            return minhash_lsh_dedup(
                t(spark, SF_DIR, "documents"), "doc_id", "text",
                n_hashes=64, bands=16, n=4, threshold=0.5,
            )
        finally:
            dd.minhash_signatures = orig

    # output equality of the full query
    a = sorted(map(tuple, q.fn(spark, SF_DIR).collect()))
    clear()
    b = sorted(map(tuple, full_np().collect()))
    clear()
    assert a == b, f"full-query outputs differ: {len(a)} vs {len(b)}"
    print(f"FULL-QUERY EXACT: {len(a)} pairs identical", flush=True)

    ta, tb = [], []
    for i in range(reps):
        t0 = time.perf_counter()
        q.fn(spark, SF_DIR).count()
        ta.append(round(time.perf_counter() - t0, 3))
        clear()
        t0 = time.perf_counter()
        full_np().count()
        tb.append(round(time.perf_counter() - t0, 3))
        clear()
        print(f"rep {i}: jvm={ta[-1]} numpy={tb[-1]}", flush=True)
    print(f"full jvm:   {ta}  med={sorted(ta)[reps // 2]}")
    print(f"full numpy: {tb}  med={sorted(tb)[reps // 2]}")


if __name__ == "__main__":
    main()
