"""Round-14 optimization profiler: per-stage wall times for the expensive
bench queries, measured with the noop sink (guide §1.4) so the timing is
the computation, not the sink or a count's column pruning.

Usage: python scripts/profile_r14.py [target ...]
Targets default to the full expensive set. Run on an idle box.
"""

from __future__ import annotations

import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from pyspark.sql import functions as F  # noqa: E402

from ghcn_d_etl_project_spark.session import get_spark  # noqa: E402
from ghcn_d_etl_project_spark.plans._util import t  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def noop(df) -> float:
    t0 = time.perf_counter()
    df.write.format("noop").mode("overwrite").save()
    return time.perf_counter() - t0


def timed(label: str, df, spark, reps: int = 3) -> None:
    spark.sparkContext.setJobDescription(label)
    runs = sorted(noop(df) for _ in range(reps))
    med = runs[len(runs) // 2]
    print(f"    {label:44s} min={runs[0]:6.3f} med={med:6.3f}", flush=True)
    spark.sparkContext.setJobDescription(None)


def profile_minhash(spark) -> None:
    from ghcn_d_etl_project_spark.operators.dedup import (
        band_buckets,
        hashed_shingle_sets,
        minhash_lsh_candidates,
        minhash_lsh_dedup,
        minhash_signatures,
    )

    docs = t(spark, SF_DIR, "documents")
    print("  minhash_lsh_dedup stages (char shingles, the registered q):")
    sets = hashed_shingle_sets(docs, "doc_id", "text", n=4, unit="char")
    timed("shingle_sets", sets, spark)
    sets = sets.persist()
    sets.count()
    sigs = minhash_signatures(docs, "doc_id", "text", shingles=sets)
    timed("signatures(from cached sets)", sigs, spark)
    sigs = sigs.persist()
    sigs.count()
    timed("band_buckets(from cached sigs)", band_buckets(sigs), spark)
    cands = minhash_lsh_candidates(sigs)
    timed("candidates(join+distinct)", cands, spark)
    sg1 = sigs.select(F.col("doc").alias("doc1"), F.col("sig").alias("sig1"))
    sg2 = sigs.select(F.col("doc").alias("doc2"), F.col("sig").alias("sig2"))
    est = (
        cands.join(sg1, "doc1")
        .join(sg2, "doc2")
        .withColumn(
            "est_matches",
            F.aggregate(
                F.zip_with("sig1", "sig2", lambda a, b: (a == b).cast("int")),
                F.lit(0),
                lambda acc, v: acc + v,
            ),
        )
        .filter(F.col("est_matches") >= 22)
        .select("doc1", "doc2")
    )
    timed("estimate_filter(cands+sigs)", est, spark)
    sets.unpersist()
    sigs.unpersist()
    spark.catalog.clearCache()
    full = minhash_lsh_dedup(docs, "doc_id", "text", n_hashes=64, bands=16,
                             n=4, threshold=0.5)
    timed("FULL minhash_lsh_dedup", full, spark)
    spark.catalog.clearCache()


def profile_simhash(spark) -> None:
    from ghcn_d_etl_project_spark.operators.dedup import (
        simhash_pairs,
        simhash_signatures,
    )
    from ghcn_d_etl_project_spark.operators.textops import tokens
    from ghcn_d_etl_project_spark.operators.common import ensure_parallelism

    docs = t(spark, SF_DIR, "documents")
    print("  simhash stages:")
    toked = ensure_parallelism(docs).select(
        F.col("doc_id").alias("doc"),
        F.explode_outer(tokens("text")).alias("w"),
    )
    hashed = toked.select(
        "doc",
        F.when(F.col("w").isNull(), None)
        .otherwise(F.xxhash64(F.col("w")))
        .alias("h"),
    )
    timed("explode+hash tokens", hashed, spark)
    sigs = simhash_signatures(docs, "doc_id", "text")
    timed("signatures(64 sums)", sigs, spark)
    sigs = sigs.persist()
    sigs.count()
    # pairs stage re-derives internally; time the full op too
    full = simhash_pairs(docs, "doc_id", "text", max_hamming=7)
    timed("FULL simhash_pairs", full, spark)
    sigs.unpersist()
    spark.catalog.clearCache()


def profile_kmeans(spark) -> None:
    from ghcn_d_etl_project_spark.operators.clustering import kmeans_lloyd

    emb = t(spark, SF_DIR, "embeddings")
    print("  kmeans_embeddings (registered query = kmeans_lloyd k=8 iters=4):")
    held: list = []
    t0 = time.perf_counter()
    out = kmeans_lloyd(emb, "vec_id", "embedding", k=8, iters=4,
                       release_into=held)
    out.write.format("noop").mode("overwrite").save()
    print(f"    FULL kmeans_lloyd                            wall={time.perf_counter()-t0:6.3f}",
          flush=True)
    for h in held:
        h.unpersist()
    spark.catalog.clearCache()


def profile_ivf(spark) -> None:
    from ghcn_d_etl_project_spark.operators.ivf import (
        ivf_topk,
        kmeans_fit,
        _cell_ranking,
    )
    from ghcn_d_etl_project_spark.operators.similarity import _as_double, norm
    from ghcn_d_etl_project_spark.operators.common import ensure_parallelism

    emb = t(spark, SF_DIR, "embeddings")
    print("  ann_ivf_topk stages:")
    t0 = time.perf_counter()
    cents = kmeans_fit(emb, "vec_id", "embedding", k=16)
    print(f"    kmeans_fit(driver)                           wall={time.perf_counter()-t0:6.3f}",
          flush=True)
    base = (
        ensure_parallelism(emb)
        .select(F.col("vec_id").alias("id"), _as_double("embedding").alias("vec"))
        .withColumn("nrm", norm(F.col("vec")))
    )
    assigned = base.withColumn(
        "cells", F.slice(_cell_ranking(cents, "vec"), 1, 4)
    )
    timed("assignment(_cell_ranking)", assigned, spark)
    assigned = assigned.persist()
    assigned.count()
    from ghcn_d_etl_project_spark.operators.similarity import dot
    from pyspark.sql import Window

    members = assigned.select(
        F.col("id").alias("nid"), F.col("vec").alias("nvec"),
        F.col("nrm").alias("nnorm"),
        F.col("cells")[0]["cluster"].alias("cluster"),
    )
    queries = assigned.select(
        F.col("id").alias("qid"), F.col("vec").alias("qvec"),
        F.col("nrm").alias("qnorm"), F.explode("cells").alias("cell"),
    ).select("qid", "qvec", "qnorm", F.col("cell.cluster").alias("cluster"))
    scored = (
        queries.join(F.broadcast(members), "cluster")
        .filter(F.col("qid") != F.col("nid"))
        .select(
            "qid", "nid",
            F.round(dot(F.col("qvec"), F.col("nvec"))
                    / (F.col("qnorm") * F.col("nnorm")), 6).alias("cos_sim"),
        )
    )
    timed("score(join+fold-dot)", scored, spark)
    w = Window.partitionBy("qid").orderBy(F.col("cos_sim").desc(), F.col("nid"))
    ranked = scored.withColumn(
        "rank", F.row_number().over(w).cast("long")
    ).filter(F.col("rank") <= 5)
    timed("score+window", ranked, spark)
    assigned.unpersist()
    spark.catalog.clearCache()
    held: list = []
    t0 = time.perf_counter()
    ivf_topk(emb, "vec_id", "embedding", k=5, n_centroids=16, n_probe=4,
             release_into=held).write.format("noop").mode("overwrite").save()
    print(f"    FULL ivf_topk                                wall={time.perf_counter()-t0:6.3f}",
          flush=True)
    for h in held:
        h.unpersist()
    spark.catalog.clearCache()


def profile_ann_lsh(spark) -> None:
    from ghcn_d_etl_project_spark.operators.similarity import (
        _lsh_signatures_matmul,
        _as_double,
        ann_lsh_topk,
        dot,
        norm,
    )
    from ghcn_d_etl_project_spark.operators.common import ensure_parallelism

    emb = t(spark, SF_DIR, "embeddings")
    print("  ann_lsh_topk stages:")
    vecd = (
        ensure_parallelism(emb)
        .select(F.col("vec_id").alias("qid"), _as_double("embedding").alias("qvec"))
        .withColumn("qnorm", norm(F.col("qvec")))
        .persist()
    )
    vecd.count()
    wide = _lsh_signatures_matmul(vecd.select("qid", "qvec"), 64, 4, 16, True)
    timed("signatures_matmul", wide, spark)
    band_structs = F.array(
        *[
            F.struct(F.lit(t_).alias("tbl"), F.col(f"b_{t_}").alias("bucket"))
            for t_ in range(16)
        ]
    )
    carry = ["qid", "sig"]
    hashed = wide.select(*carry, F.explode(band_structs).alias("h")).select(
        *carry, F.col("h.tbl").alias("tbl"), F.col("h.bucket").alias("bucket")
    )
    other = hashed.select(
        F.col("qid").alias("nid"), F.col("sig").alias("nsig"), "tbl", "bucket"
    )
    cands = hashed.join(other, ["tbl", "bucket"]).filter(
        F.col("qid") != F.col("nid")
    ).filter(
        F.bit_count(F.col("sig").bitwiseXOR(F.col("nsig"))) <= int(0.47 * 64)
    )
    pairs = cands.select("qid", "nid").distinct()
    timed("candidates+distinct", pairs, spark)
    pairs = pairs.persist()
    pairs.count()
    paired = pairs.join(vecd, "qid").join(
        vecd.select(
            F.col("qid").alias("nid"),
            F.col("qvec").alias("nvec"),
            F.col("qnorm").alias("nnorm"),
        ),
        "nid",
    )
    timed("refetch join", paired, spark)
    scored = paired.select(
        "qid", "nid",
        F.round(
            dot(F.col("qvec"), F.col("nvec"))
            / (F.col("qnorm") * F.col("nnorm")), 6,
        ).alias("cos_sim"),
    )
    timed("refetch+fold score", scored, spark)
    from pyspark.sql import Window

    w = Window.partitionBy("qid").orderBy(F.col("cos_sim").desc(), F.col("nid"))
    ranked = scored.withColumn(
        "rank", F.row_number().over(w).cast("long")
    ).filter(F.col("rank") <= 5)
    timed("score+window", ranked, spark)
    pairs.unpersist()
    vecd.unpersist()
    spark.catalog.clearCache()
    held: list = []
    t0 = time.perf_counter()
    ann_lsh_topk(emb, "vec_id", "embedding", dim=64, k=5, n_planes=4,
                 n_tables=16, release_into=held).write.format("noop").mode(
        "overwrite"
    ).save()
    print(f"    FULL ann_lsh_topk                            wall={time.perf_counter()-t0:6.3f}",
          flush=True)
    for h in held:
        h.unpersist()
    spark.catalog.clearCache()


def profile_graph(spark) -> None:
    from ghcn_d_etl_project_spark.plans import all_queries

    reg = all_queries()
    for name in ("bfs_hops_parts", "kcore_parts"):
        q = reg[name]
        for rep in range(3):
            t0 = time.perf_counter()
            q.fn(spark, SF_DIR).count()
            print(f"    FULL {name:28s} run{rep}  wall={time.perf_counter()-t0:6.3f}",
                  flush=True)
            spark.catalog.clearCache()


def profile_corpus(spark) -> None:
    from ghcn_d_etl_project_spark.pipelines.corpus import corpus_prep_staged

    print("  corpus_prep_chunks staged:")
    for rep in range(2):
        res = corpus_prep_staged(spark, SF_DIR)
        print(f"    run{rep}: {res['timings']}  counts={res['counts']}",
              flush=True)
        spark.catalog.clearCache()


PROFILES = {
    "minhash": profile_minhash,
    "simhash": profile_simhash,
    "kmeans": profile_kmeans,
    "ivf": profile_ivf,
    "ann_lsh": profile_ann_lsh,
    "graph": profile_graph,
    "corpus": profile_corpus,
}


def main() -> None:
    targets = sys.argv[1:] or list(PROFILES)
    for var in ("OMP_NUM_THREADS", "OPENBLAS_NUM_THREADS", "MKL_NUM_THREADS",
                "VECLIB_MAXIMUM_THREADS", "NUMEXPR_NUM_THREADS"):
        os.environ.setdefault(var, "1")
    spark = get_spark(app_name="profile_r14")
    # session + codegen warm-up so the first profile isn't charged setup
    t(spark, SF_DIR, "documents").limit(10).count()
    for name in targets:
        print(f"== {name} ==", flush=True)
        PROFILES[name](spark)


if __name__ == "__main__":
    main()
