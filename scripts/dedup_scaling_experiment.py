"""Scaling-curve evidence for the banded incremental-dedup arm.

The 100 TB posture of ``operators/dedup.py:dedup_against_reference``
(banded) is argued from plan shape: the reference corpus contributes
|ref| x bands equi-join bucket keys (never a shingle posting list), so
per-batch judgment work scales with the BATCH, not the corpus. This
script turns that argument into measured numbers (VERDICT r12
next-round #3), the same adjudication style as
``scripts/ivf_drift_experiment.py``:

Arm A — reference scaling at FIXED batch: blow the sf0.1 ``documents``
reference side (the ``doc_id % 10 != 7`` split, 4500 docs) up 1x / 10x /
100x with deterministic mutations — copy #1 of each source doc is a
light suffix edit (a true near-dup at Jaccard >> 0.5, so every source
doc owns ONE bounded near-dup cluster — growth adds novel content, the
realistic corpus shape), every other copy is a reversed-text +
hash-salted rewrite (distinct content and vocabulary). The fixed
500-doc batch (``doc_id % 10 == 7``) is judged against each scale
through a prebuilt in-memory reference index. Reported per scale:
index build seconds (the amortized once-per-publish cost), per-batch
judge seconds (median of reps) through the full index and through the
index WITHOUT the fingerprint substrate (the exact arm then re-hashes
the corpus per batch — the O(corpus) contrast term), and the banded
candidate-pair count. CLAIM: judge seconds and candidate pairs stay
~flat from 10x to 100x reference growth (the 1x -> 10x step adds each
source doc's one near-dup twin, which legitimately adds candidates
once). A first cut of this experiment mutated ~10% of EVERY copy into
a near-dup — candidate pairs then grew ~linearly with the corpus, which
is the CORRECT behavior for that data (more genuinely-similar docs IS
more verification work; LSH banding only removes the dissimilar
cross-product), but it measures near-dup density, not a corpus-size
term. The capped-cluster design isolates the corpus-size term, which
is the claim under test.

Arm B — batch scaling at FIXED reference (10x): batches of 125 / 250 /
500 docs against the same index. CLAIM: judge seconds and candidate
pairs grow ~linearly with batch size.

Arm C (r14) — reference scaling on a DE-TEMPLATED corpus: the sf0.1
synthetic documents are template-generated, so ~82% of batch x ref
pairs genuinely share a band bucket (SCALE.md) — arm A therefore
measures the worst-case candidate density, not banding selectivity.
Arm C rewrites every token to ``hex(xxhash64(token, salt))`` with a
per-document-family salt: documents from different families share no
vocabulary, so char-4-gram overlap collapses to the incidental
hex-alphabet floor and band-bucket collision drops from ~82% to <5%
(the realistic-density regime). 50 planted positives (batch docs
carrying a reference family's salt + one suffix token) pin recall:
banding must still surface every planted near-dup while the
cross-product collision is ~absent. Reported per scale: judge seconds,
candidate pairs, the batch x ref collision fraction, and
found-planted count. CLAIM: collision fraction < 0.05 at every scale,
planted recall 50/50, judge seconds flat 10x -> 100x.

Mutation determinism: all synthetic ids/texts derive from seeded
xxhash64 of (doc_id, copy#), so re-runs are byte-identical; the blow-up
is materialized to parquet and read back so the index build pays real
scan I/O.

Usage: python scripts/dedup_scaling_experiment.py [--sf DIR]
       [--scales 1,10,100] [--batch-sizes 125,250,500] [--reps 3]
Writes one JSON line to stdout and the full record to
``.tmp/dedup_scaling.json``.
"""

from __future__ import annotations

import argparse
import json
import os
import shutil
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parents[1]
sys.path.insert(0, str(REPO))

for _v in (
    "OMP_NUM_THREADS",
    "OPENBLAS_NUM_THREADS",
    "MKL_NUM_THREADS",
    "VECLIB_MAXIMUM_THREADS",
    "NUMEXPR_NUM_THREADS",
):  # same worker-thread pinning as bench.py, same reproducibility reason
    os.environ.setdefault(_v, "1")

from pyspark.sql import functions as F  # noqa: E402

from ghcn_d_etl_project_spark.operators.dedup import (  # noqa: E402
    _banded_cross_scores,
    dedup_against_reference,
    reference_dedup_index,
    reference_fingerprints,
)
from ghcn_d_etl_project_spark.session import get_spark  # noqa: E402
from ghcn_d_etl_project_spark.sources.readers import load_table  # noqa: E402


def _median(xs: list[float]) -> float:
    s = sorted(xs)
    return s[len(s) // 2]


def blow_up(ref_base, scale: int):
    """scale-1 deterministic synthetic copies per reference doc, plus
    the originals. Copy #1 is a near-dup (light suffix — one bounded
    near-dup cluster per source doc, scale-invariant); every other copy
    is a distinct rewrite (reversed text + two hash salts — char-4-gram
    overlap with the source is incidental-only), so growth past 10x
    adds only novel content."""
    if scale <= 1:
        return ref_base.select("doc_id", "text")
    exp = ref_base.select(
        "doc_id",
        "text",
        F.explode(F.sequence(F.lit(0), F.lit(scale - 1))).alias("__i"),
    )
    h = F.abs(F.xxhash64("doc_id", "__i", F.lit(42)))
    return exp.select(
        (
            F.col("doc_id").cast("long")
            + F.col("__i").cast("long") * F.lit(100_000_000).cast("long")
        ).alias("doc_id"),
        F.when(F.col("__i") == 0, F.col("text"))
        .when(
            F.col("__i") == 1,
            F.concat(F.col("text"), F.lit(" extrasuffix")),
        )
        .otherwise(
            F.concat(
                F.pmod(h, F.lit(1_000_000_007)).cast("string"),
                F.lit(" "),
                F.reverse(F.col("text")),
                F.lit(" "),
                F.pmod(h, F.lit(999_999_937)).cast("string"),
            )
        )
        .alias("text"),
    )


def _detok(text_col, salt_col):
    """Token-wise vocabulary rewrite: every whitespace token becomes
    the hex of its salted xxhash64. Same salt => same rewrite (so
    same-family docs stay near-dups); different salts => disjoint
    vocabularies (cross-family char-4-gram overlap collapses to the
    hex-alphabet floor)."""
    return F.array_join(
        F.transform(
            F.split(F.lower(text_col), " "),
            lambda t: F.hex(F.xxhash64(t, salt_col)),
        ),
        " ",
    )


def detemplated_ref(ref_base, scale: int):
    """Arm C reference at ``scale``: per source doc, copy #0 is the
    de-templated original, copy #1 a same-salt near-dup (one suffix
    token), every further copy a fresh-salt distinct doc. Family salt =
    xxhash64(doc_id, 0, 777)."""
    exp = ref_base.select(
        "doc_id",
        "text",
        F.explode(F.sequence(F.lit(0), F.lit(scale - 1))).alias("__i"),
    )
    fam = F.xxhash64("doc_id", F.lit(0), F.lit(777))
    own = F.xxhash64("doc_id", "__i", F.lit(777))
    salt = F.when(F.col("__i") <= 1, fam).otherwise(own)
    body = _detok(F.col("text"), salt)
    # text FIRST, id relabel in a second select: a lateral alias named
    # like an input column ("doc_id") is what outer references INSIDE
    # the _detok transform() lambda resolve to, so computing both in
    # one select would salt with the shifted id (Spark 4 lateral-alias
    # + higher-order-function resolution quirk, found r14)
    return exp.select(
        "doc_id",
        "__i",
        F.when(
            F.col("__i") == 1, F.concat(body, F.lit(" plantedsuffix"))
        )
        .otherwise(body)
        .alias("text"),
    ).select(
        (
            F.col("doc_id").cast("long")
            + F.col("__i").cast("long") * F.lit(100_000_000).cast("long")
        ).alias("doc_id"),
        "text",
    )


def detemplated_batch(batch_all, ref_base, n_planted: int = 50):
    """Arm C batch: every real batch doc de-templated under its OWN
    salt (no family overlap with the reference), plus ``n_planted``
    planted positives — the lowest-id reference sources re-rendered
    under THEIR family salt with one extra token, living at
    doc_id + 5e8. Each planted doc is a true near-dup of its reference
    family; everything else should band-collide only incidentally."""
    own = _detok(F.col("text"), F.xxhash64("doc_id", F.lit(999)))
    clean = batch_all.select("doc_id", own.alias("text"))
    fam = F.xxhash64("doc_id", F.lit(0), F.lit(777))
    # text before the id relabel — see the lateral-alias note in
    # detemplated_ref
    planted = (
        ref_base.orderBy("doc_id")
        .limit(n_planted)
        .select(
            "doc_id",
            F.concat(
                _detok(F.col("text"), fam), F.lit(" batchplanted")
            ).alias("text"),
        )
        .select(
            (F.col("doc_id").cast("long") + F.lit(500_000_000)).alias(
                "doc_id"
            ),
            "text",
        )
    )
    return clean.unionAll(planted)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", default="/root/testdata/sf0.1")
    ap.add_argument("--scales", default="1,10,100")
    ap.add_argument("--batch-sizes", default="125,250,500")
    ap.add_argument("--reps", type=int, default=3)
    ap.add_argument("--arms", default="a,b,c")
    args = ap.parse_args()
    arms = set(args.arms.split(","))
    scales = [int(s) for s in args.scales.split(",")]
    batch_sizes = [int(s) for s in args.batch_sizes.split(",")]

    spark = get_spark(app_name="dedup-scaling")
    docs = load_table(spark, args.sf, "documents").select("doc_id", "text")
    batch_all = docs.filter(F.col("doc_id") % 10 == 7).persist()
    batch_n = batch_all.count()
    ref_base = docs.filter(F.col("doc_id") % 10 != 7)

    work = REPO / ".tmp" / "dedup_scaling"
    shutil.rmtree(work, ignore_errors=True)
    out: dict = {
        "sf": args.sf,
        "batch_rows": batch_n,
        "arm_a": [],
        "arm_b": [],
        "arm_c": [],
    }

    def judge(batch, ref_df, idx, fps=None) -> tuple[float, int]:
        """(median judge seconds over reps, verdict rows). ``fps=None``
        deliberately re-hashes the corpus for the exact arm per run —
        the contrast column that motivates the fingerprint substrate."""
        runs, nrows = [], 0
        for _ in range(args.reps):
            held: list = []
            t0 = time.perf_counter()
            nrows = dedup_against_reference(
                batch, ref_df, "doc_id", "text",
                ref_index=idx, ref_fingerprints=fps, release_into=held,
            ).count()
            runs.append(time.perf_counter() - t0)
            for f in held:
                f.unpersist()
        return round(_median(runs), 3), nrows

    def cand_count(batch, ref_df, idx) -> int:
        held: list = []
        newb = batch.select(
            F.col("doc_id").alias("doc"), F.col("text").alias("__txt")
        )
        n = (
            _banded_cross_scores(
                newb, ref_df, "doc_id", "text",
                n=4, n_hashes=64, bands=32,
                ref_index=idx, release_into=held, round_digits=6,
            )
            .count()
        )
        for f in held:
            f.unpersist()
        return n

    # ---- Arm A: reference grows, batch fixed -------------------------
    ref_at_10x = None
    for scale in scales if "a" in arms else []:
        p = work / f"ref_{scale}x"
        blow_up(ref_base, scale).write.mode("overwrite").parquet(str(p))
        ref = spark.read.parquet(str(p))
        ref_rows = ref.count()
        held: list = []
        t0 = time.perf_counter()
        idx = reference_dedup_index(
            ref, "doc_id", "text", release_into=held
        )
        fps = reference_fingerprints(ref, "doc_id", "text", release_into=held)
        # materialize all index frames (the once-per-publish cost)
        idx[0].count(), idx[1].count(), fps.count()
        build_sec = round(time.perf_counter() - t0, 3)
        judge_sec, verdicts = judge(batch_all, ref, idx, fps)
        # contrast: exact arm re-hashing the corpus per batch (no
        # fingerprint substrate) — the O(corpus) term the r13 index
        # extension removes
        judge_inline_sec, _ = judge(batch_all, ref, idx, None)
        cands = cand_count(batch_all, ref, idx)
        out["arm_a"].append(
            {
                "ref_scale": scale,
                "ref_rows": ref_rows,
                "index_build_sec": build_sec,
                "judge_sec": judge_sec,
                "judge_inline_exact_sec": judge_inline_sec,
                "candidate_pairs": cands,
                "verdict_rows": verdicts,
            }
        )
        print(
            f"arm_a scale={scale}x ref={ref_rows} build={build_sec}s "
            f"judge={judge_sec}s inline_exact={judge_inline_sec}s "
            f"cands={cands}",
            file=sys.stderr,
        )
        if scale == 10:
            ref_at_10x = (ref, idx, fps, held)
        else:
            for f in held:
                f.unpersist()
        spark.sparkContext._jvm.System.gc()

    # ---- Arm B: batch grows, reference fixed at 10x -------------------
    if "b" in arms and ref_at_10x is None:
        p = work / "ref_10x"
        blow_up(ref_base, 10).write.mode("overwrite").parquet(str(p))
        ref = spark.read.parquet(str(p))
        held = []
        idx = reference_dedup_index(ref, "doc_id", "text", release_into=held)
        fps = reference_fingerprints(ref, "doc_id", "text", release_into=held)
        idx[0].count(), idx[1].count(), fps.count()
        ref_at_10x = (ref, idx, fps, held)
    if "b" in arms:
        ref, idx, fps, held = ref_at_10x
        for bs in batch_sizes:
            # deterministic prefix of the batch by id order
            ids = [
                r[0]
                for r in batch_all.orderBy("doc_id")
                .limit(bs)
                .select("doc_id")
                .collect()
            ]
            sub = batch_all.filter(F.col("doc_id") <= max(ids))
            judge_sec, _ = judge(sub, ref, idx, fps)
            cands = cand_count(sub, ref, idx)
            out["arm_b"].append(
                {
                    "batch_rows": bs,
                    "judge_sec": judge_sec,
                    "candidate_pairs": cands,
                }
            )
            print(
                f"arm_b batch={bs} judge={judge_sec}s cands={cands}",
                file=sys.stderr,
            )
        for f in held:
            f.unpersist()

    # ---- Arm C: de-templated corpus — realistic candidate density ----
    if "c" in arms:
        n_planted = 50
        batch_c = detemplated_batch(batch_all, ref_base, n_planted).persist()
        batch_c_n = batch_c.count()
        for scale in scales:
            p = work / f"refc_{scale}x"
            detemplated_ref(ref_base, scale).write.mode(
                "overwrite"
            ).parquet(str(p))
            ref = spark.read.parquet(str(p))
            ref_rows = ref.count()
            held = []
            t0 = time.perf_counter()
            idx = reference_dedup_index(
                ref, "doc_id", "text", release_into=held
            )
            fps = reference_fingerprints(
                ref, "doc_id", "text", release_into=held
            )
            idx[0].count(), idx[1].count(), fps.count()
            build_sec = round(time.perf_counter() - t0, 3)
            judge_sec, verdicts = judge(batch_c, ref, idx, fps)
            # planted recall: every planted doc (>= 5e8 id space) must
            # come back non-clean
            held2: list = []
            vdf = dedup_against_reference(
                batch_c, ref, "doc_id", "text",
                ref_index=idx, ref_fingerprints=fps, release_into=held2,
            )
            found_planted = vdf.filter(
                (F.col("doc_id") >= 500_000_000)
                & (F.col("verdict") != "clean")
            ).count()
            false_nondups = vdf.filter(
                (F.col("doc_id") < 500_000_000)
                & (F.col("verdict") != "clean")
            ).count()
            for f in held2:
                f.unpersist()
            cands = cand_count(batch_c, ref, idx)
            collision = round(cands / (batch_c_n * ref_rows), 6)
            out["arm_c"].append(
                {
                    "ref_scale": scale,
                    "ref_rows": ref_rows,
                    "index_build_sec": build_sec,
                    "judge_sec": judge_sec,
                    "candidate_pairs": cands,
                    "collision_frac": collision,
                    "planted": n_planted,
                    "found_planted": found_planted,
                    "nonplanted_dup_verdicts": false_nondups,
                }
            )
            print(
                f"arm_c scale={scale}x ref={ref_rows} judge={judge_sec}s "
                f"cands={cands} collision={collision} "
                f"planted={found_planted}/{n_planted} "
                f"nonplanted_dups={false_nondups}",
                file=sys.stderr,
            )
            for f in held:
                f.unpersist()
            spark.sparkContext._jvm.System.gc()
        batch_c.unpersist()
    batch_all.unpersist()
    shutil.rmtree(work, ignore_errors=True)

    (REPO / ".tmp").mkdir(exist_ok=True)
    (REPO / ".tmp" / "dedup_scaling.json").write_text(json.dumps(out, indent=1))
    print(json.dumps(out))


if __name__ == "__main__":
    main()
