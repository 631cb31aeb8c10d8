"""Statistical contracts for the rows-only sampling/sketch queries."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from ghcn_d_etl_project_spark.plans import all_queries
from ghcn_d_etl_project_spark.plans.sampling import STRATA_FRACTIONS
from ghcn_d_etl_project_spark.plans._util import t
from tests.conftest import SF_DIR


def test_stratified_sample_deterministic_and_proportional(spark):
    """The portable md5-threshold stratified sample (merged into the
    dataset_split query in round 3) is re-run- AND partitioning-stable,
    and hits each stratum's fraction within tolerance."""
    q = all_queries()["dataset_split"]
    rows = q.fn(spark, SF_DIR).collect()
    a = sorted(r.doc_id for r in rows if r.sampled)
    b = sorted(r.doc_id for r in q.fn(spark, SF_DIR).collect() if r.sampled)
    assert a == b, "hash-threshold sample must be exactly reproducible"
    totals: dict[str, int] = {}
    kept: dict[str, int] = {}
    for r in rows:
        totals[r.lang] = totals.get(r.lang, 0) + 1
        kept[r.lang] = kept.get(r.lang, 0) + int(r.sampled)
    for lang, n in totals.items():
        frac = kept.get(lang, 0) / n
        want = STRATA_FRACTIONS.get(lang, 0.0)
        # Size-aware bound: 4 binomial sigmas plus the 1/100 bucket
        # granularity. A flat tolerance fails deterministically on tiny
        # strata (sf0.001's ~41-doc 'fr' stratum sits 2 sigma off its
        # 50% target FOREVER, because md5 is fixed) — the md5-threshold
        # sample is one draw, not a random variable per run.
        tol = 4.0 * math.sqrt(want * (1.0 - want) / n) + 0.01
        assert abs(frac - want) < tol, (lang, frac, want, n, tol)


def test_approx_distinct_error_bound(spark):
    rows = all_queries()["approx_distinct"].fn(spark, SF_DIR).collect()
    assert rows
    for r in rows:
        rel_err = abs(r.approx_users - r.exact_users) / max(r.exact_users, 1)
        assert rel_err <= 0.05, (r.event_type, r.approx_users, r.exact_users)


def test_dataset_split_stable_disjoint_proportional(spark):
    """Hash split: every id gets exactly one label, re-running (and
    reshuffling) never moves a row, and proportions land near 80/10/10."""
    from ghcn_d_etl_project_spark.operators.common import dataset_split

    d = t(spark, SF_DIR, "documents")
    a = {r.doc_id: r.s for r in d.select("doc_id", dataset_split("doc_id").alias("s")).collect()}
    b = {
        r.doc_id: r.s
        for r in d.repartition(7)
        .select("doc_id", dataset_split("doc_id").alias("s"))
        .collect()
    }
    assert a == b  # partitioning-independent
    n = len(a)
    from collections import Counter

    c = Counter(a.values())
    assert set(c) <= {"train", "val", "test"}
    assert sum(c.values()) == n
    assert 0.7 * n <= c["train"] <= 0.9 * n
    assert c["val"] + c["test"] <= 0.3 * n


def test_weighted_sample_favors_heavy_and_is_stable(spark):
    """Efraimidis-Spirakis top-k: with a 100:1 weight ratio the heavy
    class dominates the sample; the selection is identical under
    repartitioning (pure projection key + TakeOrdered)."""
    from pyspark.sql import functions as F

    from ghcn_d_etl_project_spark.operators.common import weighted_top_k

    rows = [(i, 100.0 if i < 250 else 1.0) for i in range(500)]
    df = spark.createDataFrame(rows, "id long, w double")
    picked = weighted_top_k(df, "id", "w", k=50)
    ids = {r.id for r in picked.collect()}
    assert len(ids) == 50
    heavy = sum(1 for i in ids if i < 250)
    assert heavy >= 45, f"heavy class underrepresented: {heavy}/50"
    ids2 = {r.id for r in weighted_top_k(df.repartition(13), "id", "w", k=50).collect()}
    assert ids == ids2


def test_weighted_sample_plans_take_ordered(spark):
    """orderBy+limit must plan TakeOrderedAndProject (per-task top-k, no
    global sort shuffle) — the property that makes the draw scale."""
    from ghcn_d_etl_project_spark.plans import all_queries
    from tests.conftest import SF_DIR

    df = all_queries()["weighted_sample"].fn(spark, SF_DIR)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "TakeOrderedAndProject" in plan, plan


def test_weighted_sample_key_null_id_and_weight_monotonicity(spark):
    """NULL ids hash as '' (never a NULL key); for a fixed id, a larger
    weight strictly increases the key (ln(u) < 0 shrinks toward 0)."""
    from pyspark.sql import functions as F

    from ghcn_d_etl_project_spark.operators.common import weighted_sample_key

    df = spark.createDataFrame(
        [(None, 5.0), ("a", 1.0), ("a", 10.0)], "id string, w double"
    )
    out = df.select("id", "w", weighted_sample_key("id", "w").alias("k")).collect()
    by = {(r.id, r.w): r.k for r in out}
    assert all(k is not None for k in by.values())
    assert by[("a", 10.0)] > by[("a", 1.0)]


def test_weighted_sample_key_rejects_nonpositive_weights(spark):
    """w <= 0 or NULL must fail LOUDLY at execution (round-7 advice: the
    silent path produced NULL/absurd keys that weighted_top_k quietly
    ranked first or dropped — a skewed sample with no error)."""
    import pytest
    from py4j.protocol import Py4JJavaError
    from pyspark.errors import SparkRuntimeException

    from ghcn_d_etl_project_spark.operators.common import (
        weighted_sample_key,
        weighted_top_k,
    )

    for bad_w in (0.0, -3.0, None):
        df = spark.createDataFrame([("a", 1.0), ("b", bad_w)], "id string, w double")
        with pytest.raises((SparkRuntimeException, Py4JJavaError)) as ei:
            df.select(weighted_sample_key("id", "w").alias("k")).collect()
        assert "weighted_sample_key" in str(ei.value)
        with pytest.raises((SparkRuntimeException, Py4JJavaError)):
            weighted_top_k(df, "id", "w", k=1).collect()
    # positive weights still flow through untouched
    ok = spark.createDataFrame([("a", 1.0), ("b", 2.0)], "id string, w double")
    assert ok.select(weighted_sample_key("id", "w")).count() == 2


def test_leakage_safe_split_never_straddles_planted_dups(spark):
    """Plant duplicate groups (exact copies + formatting-only variants)
    across 120 distinct contents: the content-keyed split must put every
    group wholly on one side, while the id-keyed split demonstrably
    straddles at least one group on the same fixture — the bug this
    operator exists to prevent."""
    from ghcn_d_etl_project_spark.operators.common import dataset_split
    from ghcn_d_etl_project_spark.operators.textops import fingerprint
    import pyspark.sql.functions as F

    rows = []
    did = 0
    for g in range(120):
        body = f"document number {g} with shared content"
        variants = [body, body, body.upper() + "!!", "  " + body + "  "]
        for v in variants:
            rows.append((did, v))
            did += 1
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = df.select(
        "doc_id",
        fingerprint("text").alias("fp"),
        dataset_split(fingerprint("text")).alias("split_by_content"),
        dataset_split("doc_id").alias("split_by_id"),
    ).collect()

    by_fp: dict[str, set] = {}
    by_fp_id: dict[str, set] = {}
    for r in out:
        by_fp.setdefault(r.fp, set()).add(r.split_by_content)
        by_fp_id.setdefault(r.fp, set()).add(r.split_by_id)
    assert len(by_fp) == 120  # formatting variants collapse per group
    assert all(len(s) == 1 for s in by_fp.values()), "content split straddled"
    n_straddled = sum(1 for s in by_fp_id.values() if len(s) > 1)
    assert n_straddled > 0, "fixture too small to show the id-split bug"


def test_leakage_safe_split_query_contract(spark):
    """Registered query: splits disjoint+exhaustive, n_dups counts the
    fingerprint group, and the assignment is a pure function of fp
    (same fp -> same split across the whole output)."""
    q = all_queries()["leakage_safe_split"]
    rows = q.fn(spark, SF_DIR).collect()
    assert rows and all(r.split in ("train", "val", "test") for r in rows)
    fp_split: dict[str, str] = {}
    fp_n: dict[str, int] = {}
    for r in rows:
        assert fp_split.setdefault(r.fp, r.split) == r.split
        fp_n[r.fp] = fp_n.get(r.fp, 0) + 1
    assert all(r.n_dups == fp_n[r.fp] for r in rows)


# ---------------------------------------------------------------------------
# stratified_fixed_n
# ---------------------------------------------------------------------------


def test_stratified_n_exact_counts_and_small_strata(spark):
    from ghcn_d_etl_project_spark.operators.common import stratified_fixed_n

    rows = [(i, "big") for i in range(50)] + [(100 + i, "tiny") for i in range(3)]
    df = spark.createDataFrame(rows, "id long, grp string")
    out = stratified_fixed_n(df, "grp", "id", n=5).collect()
    by_grp = {}
    for r in out:
        by_grp.setdefault(r["grp"], []).append(r["id"])
    assert len(by_grp["big"]) == 5
    assert sorted(by_grp["tiny"]) == [100, 101, 102]  # whole stratum kept


def test_stratified_n_deterministic_across_partitionings(spark):
    from ghcn_d_etl_project_spark.operators.common import stratified_fixed_n

    rows = [(i, f"g{i % 3}") for i in range(90)]
    df1 = spark.createDataFrame(rows, "id long, grp string").repartition(2)
    df2 = spark.createDataFrame(rows, "id long, grp string").repartition(13, "grp")
    pick = lambda df: sorted(
        (r["grp"], r["id"])
        for r in stratified_fixed_n(df, "grp", "id", n=4).collect()
    )
    assert pick(df1) == pick(df2)


def test_stratified_n_salt_decorrelates(spark):
    from ghcn_d_etl_project_spark.operators.common import stratified_fixed_n

    rows = [(i, "g") for i in range(200)]
    df = spark.createDataFrame(rows, "id long, grp string")
    a = {r["id"] for r in stratified_fixed_n(df, "grp", "id", 20, salt="s1").collect()}
    b = {r["id"] for r in stratified_fixed_n(df, "grp", "id", 20, salt="s2").collect()}
    assert a != b and len(a) == len(b) == 20


def test_stratified_n_validation(spark):
    import pytest

    from ghcn_d_etl_project_spark.operators.common import stratified_fixed_n

    df = spark.createDataFrame([(1, "g")], "id long, grp string")
    with pytest.raises(ValueError, match="n >= 1"):
        stratified_fixed_n(df, "grp", "id", 0)


# ---------------------------------------------------------------------------
# poisson_bootstrap_ci (r10)
# ---------------------------------------------------------------------------


def _py_bootstrap(rows, replicates=24, alpha=0.05):
    """Full pure-Python replay of the operator's md5 recipe."""
    import hashlib

    from ghcn_d_etl_project_spark.operators.common import POISSON1_CDF

    def weight(rid, b):
        h = hashlib.md5(f"{rid}:boot:{b}".encode()).hexdigest()[:8]
        u = int(h, 16) / 4294967296.0
        return sum(1 for f in POISSON1_CDF if u >= f)

    n = len(rows)
    point = sum(v for _, v in rows) / n
    means = []
    for b in range(replicates):
        ws = [(weight(rid, b), v) for rid, v in rows]
        tw = sum(w for w, _ in ws)
        if tw == 0:
            return n, point, None, None
        means.append(sum(w * v for w, v in ws) / tw)
    means.sort()

    def interp(p):
        i = p * (replicates - 1)
        lo, frac = int(i), i - int(i)
        if lo + 1 >= replicates:
            return means[lo]
        return means[lo] + (means[lo + 1] - means[lo]) * frac

    return n, point, interp(alpha / 2), interp(1 - alpha / 2)


def test_bootstrap_matches_python_replay(spark):
    from ghcn_d_etl_project_spark.operators.common import poisson_bootstrap_ci

    rows = [(i, float(10 + (i * 37) % 100)) for i in range(1, 301)]
    df = spark.createDataFrame(rows, "id long, v double")
    r = poisson_bootstrap_ci(df, "v", "id").collect()[0]
    n, point, lo, hi = _py_bootstrap(rows)
    assert r["n"] == n
    assert r["point_est"] == round(point, 6)
    assert r["ci_lo"] == pytest.approx(lo, abs=1e-6)
    assert r["ci_hi"] == pytest.approx(hi, abs=1e-6)
    assert r["ci_lo"] < r["point_est"] < r["ci_hi"]


def test_bootstrap_width_shrinks_with_n(spark):
    """Deterministic draws -> the sqrt(n) width contraction is an exact
    assertable fact, not a statistical tendency."""
    from ghcn_d_etl_project_spark.operators.common import poisson_bootstrap_ci

    def width(n):
        rows = [(i, float(50 + (i * 13) % 40)) for i in range(1, n + 1)]
        df = spark.createDataFrame(rows, "id long, v double")
        r = poisson_bootstrap_ci(df, "v", "id").collect()[0]
        return r["ci_hi"] - r["ci_lo"]

    assert width(2000) < width(200) / 2.0


def test_bootstrap_partitioning_invariance_and_groups(spark):
    from ghcn_d_etl_project_spark.operators.common import poisson_bootstrap_ci

    rows = [(i, "g%d" % (i % 3), float(i % 25)) for i in range(1, 601)]
    outs = []
    for parts in (1, 8):
        df = spark.createDataFrame(rows, "id long, g string, v double").repartition(parts)
        out = poisson_bootstrap_ci(df, "v", "id", group_cols=["g"])
        outs.append(sorted(map(tuple, out.collect())))
    assert outs[0] == outs[1]
    assert len(outs[0]) == 3


def test_bootstrap_tiny_group_null_bounds_and_null_rows(spark):
    from ghcn_d_etl_project_spark.operators.common import poisson_bootstrap_ci

    # a single-row group: some replicate draws weight 0 with
    # overwhelming (and deterministic) certainty -> NULL bounds
    rows = [(1, "solo", 5.0), (2, "big", 1.0), (3, "big", 2.0),
            (None, "big", 9.0), (4, "big", None)]
    df = spark.createDataFrame(rows, "id long, g string, v double")
    got = {r["g"]: r for r in
           poisson_bootstrap_ci(df, "v", "id", group_cols=["g"]).collect()}
    assert got["solo"]["ci_lo"] is None and got["solo"]["ci_hi"] is None
    assert got["solo"]["point_est"] == 5.0
    assert got["big"]["n"] == 2  # NULL id and NULL value both excluded


def test_bootstrap_validation(spark):
    from ghcn_d_etl_project_spark.operators.common import poisson_bootstrap_ci

    df = spark.createDataFrame([(1, 1.0)], "id long, v double")
    with pytest.raises(ValueError, match="replicates"):
        poisson_bootstrap_ci(df, "v", "id", replicates=1)
    with pytest.raises(ValueError, match="alpha"):
        poisson_bootstrap_ci(df, "v", "id", alpha=1.5)


def test_poisson_weight_distribution_sanity(spark):
    """Mean weight ~ 1 and P(w=0) ~ e^-1 over many ids — the inverse
    CDF is wired right (a constants bug would shift both)."""
    from ghcn_d_etl_project_spark.operators.common import (
        bootstrap_uniform,
        poisson_weight,
    )

    df = spark.range(1, 20001).select(
        poisson_weight(bootstrap_uniform("id", "t")).alias("w")
    )
    r = df.agg(
        F.avg("w").alias("m"),
        F.avg((F.col("w") == 0).cast("int")).alias("p0"),
        F.max("w").alias("mx"),
    ).collect()[0]
    assert abs(r["m"] - 1.0) < 0.03
    assert abs(r["p0"] - 0.3679) < 0.02
    assert r["mx"] <= 9


# ---------------------------------------------------------------------------
# poisson_bootstrap_diff_ci (r10)
# ---------------------------------------------------------------------------


def _py_bootstrap_diff(rows_a, rows_b, replicates=24, alpha=0.05):
    """Pure-Python replay: joint-replicate diff of arm means."""
    import hashlib

    from ghcn_d_etl_project_spark.operators.common import POISSON1_CDF

    def weight(rid, b):
        h = hashlib.md5(f"{rid}:boot:{b}".encode()).hexdigest()[:8]
        return sum(1 for f in POISSON1_CDF if int(h, 16) / 4294967296.0 >= f)

    diffs = []
    for b in range(replicates):
        wa = [(weight(rid, b), v) for rid, v in rows_a]
        wb = [(weight(rid, b), v) for rid, v in rows_b]
        ta, tb = sum(w for w, _ in wa), sum(w for w, _ in wb)
        if ta == 0 or tb == 0:
            return None, None
        diffs.append(
            sum(w * v for w, v in wa) / ta - sum(w * v for w, v in wb) / tb
        )
    diffs.sort()

    def interp(p):
        i = p * (replicates - 1)
        lo, frac = int(i), i - int(i)
        if lo + 1 >= replicates:
            return diffs[lo]
        return diffs[lo] + (diffs[lo + 1] - diffs[lo]) * frac

    return interp(alpha / 2), interp(1 - alpha / 2)


def _diff_df(spark, rows_a, rows_b):
    rows = [(i, 0, float(v)) for i, v in rows_a] + [
        (i, 1, float(v)) for i, v in rows_b
    ]
    return spark.createDataFrame(rows, "id long, arm int, v double")


def test_bootstrap_diff_matches_python_replay(spark):
    from ghcn_d_etl_project_spark.operators.common import (
        poisson_bootstrap_diff_ci,
    )

    rows_a = [(i, 20 + (i * 7) % 30) for i in range(1, 201)]
    rows_b = [(i, 10 + (i * 11) % 30) for i in range(1001, 1201)]
    df = _diff_df(spark, rows_a, rows_b)
    r = poisson_bootstrap_diff_ci(df, "v", "id", "arm", 0, 1).collect()[0]
    lo, hi = _py_bootstrap_diff(rows_a, rows_b)
    assert r["ci_lo"] == pytest.approx(lo, abs=1e-6)
    assert r["ci_hi"] == pytest.approx(hi, abs=1e-6)
    assert r["n_a"] == 200 and r["n_b"] == 200
    assert r["diff"] == pytest.approx(r["mean_a"] - r["mean_b"], abs=2e-6)
    # planted ~+10 uplift: the CI must exclude 0 (deterministic draws
    # make this an exact assertion, not a probabilistic one)
    assert r["ci_lo"] > 0


def test_bootstrap_diff_null_uplift_straddles_zero(spark):
    from ghcn_d_etl_project_spark.operators.common import (
        poisson_bootstrap_diff_ci,
    )

    # identical value-generating process in both arms
    rows_a = [(i, (i * 13) % 50) for i in range(1, 401)]
    rows_b = [(i, (i * 13) % 50) for i in range(2001, 2401)]
    r = poisson_bootstrap_diff_ci(
        _diff_df(spark, rows_a, rows_b), "v", "id", "arm", 0, 1
    ).collect()[0]
    assert r["ci_lo"] < 0 < r["ci_hi"]


def test_bootstrap_diff_empty_arm_and_validation(spark):
    from ghcn_d_etl_project_spark.operators.common import (
        poisson_bootstrap_diff_ci,
    )

    df = _diff_df(spark, [(1, 5), (2, 6)], [])
    r = poisson_bootstrap_diff_ci(df, "v", "id", "arm", 0, 1).collect()[0]
    assert r["n_b"] == 0
    assert r["ci_lo"] is None and r["ci_hi"] is None
    with pytest.raises(ValueError, match="replicates"):
        poisson_bootstrap_diff_ci(df, "v", "id", "arm", 0, 1, replicates=1)


def test_bootstrap_diff_partitioning_invariance(spark):
    from ghcn_d_etl_project_spark.operators.common import (
        poisson_bootstrap_diff_ci,
    )

    rows_a = [(i, (i * 3) % 20) for i in range(1, 151)]
    rows_b = [(i, (i * 5) % 20) for i in range(501, 651)]
    outs = []
    for parts in (1, 9):
        df = _diff_df(spark, rows_a, rows_b).repartition(parts)
        outs.append(
            tuple(poisson_bootstrap_diff_ci(df, "v", "id", "arm", 0, 1).collect()[0])
        )
    assert outs[0] == outs[1]


# ---------------------------------------------------------------------------
# temperature_mix (r10)
# ---------------------------------------------------------------------------


def _mix_df(spark, spec):
    """spec: {domain: [(id, weight), ...]}"""
    rows = [(i, d, w) for d, pairs in spec.items() for i, w in pairs]
    return spark.createDataFrame(rows, "id long, dom string, w long")


def test_mix_t1_uniform_rate(spark):
    """T=1 keeps natural proportions: every domain gets the SAME rate
    total_target / total_weight."""
    from ghcn_d_etl_project_spark.operators.common import temperature_mix

    spec = {
        "big": [(i, 10) for i in range(1, 101)],     # 1000
        "small": [(i, 10) for i in range(201, 221)],  # 200
    }
    out = temperature_mix(
        _mix_df(spark, spec), "dom", "w", "id",
        target_total=600, temperature=1.0,
    )
    rates = dict(out.select("domain", "rate").distinct().collect())
    assert rates["big"] == rates["small"] == round(600 / 1200, 6)


def test_mix_t0_equalizes_and_caps(spark):
    """T=0 gives every domain an equal share; a tail domain whose
    target exceeds its size caps at rate 1 (never duplicates)."""
    from ghcn_d_etl_project_spark.operators.common import temperature_mix

    spec = {
        "big": [(i, 100) for i in range(1, 101)],   # 10000
        "tiny": [(i, 10) for i in range(501, 511)],  # 100
    }
    out = temperature_mix(
        _mix_df(spark, spec), "dom", "w", "id",
        target_total=1000, temperature=0.0,
    )
    got = {r["domain"]: r for r in out.select(
        "domain", "mix_share", "rate").distinct().collect()}
    assert got["big"]["mix_share"] == got["tiny"]["mix_share"] == 0.5
    # tiny's target (500) > its size (100) -> capped at 1.0
    assert got["tiny"]["rate"] == 1.0
    assert got["big"]["rate"] == round(500 / 10000, 6)


def test_mix_lower_temperature_upsamples_tail(spark):
    from ghcn_d_etl_project_spark.operators.common import temperature_mix

    spec = {
        "head": [(i, 50) for i in range(1, 201)],
        "tail": [(i, 50) for i in range(1001, 1021)],
    }
    df = _mix_df(spark, spec)

    def tail_share(temp):
        out = temperature_mix(df, "dom", "w", "id",
                              target_total=2000, temperature=temp)
        return dict(out.select("domain", "mix_share").distinct().collect())[
            "tail"
        ]

    assert tail_share(0.3) > tail_share(0.7) > tail_share(1.0)


def test_mix_matches_python_replay(spark):
    """Full md5 replay: keep decisions, kept counts, shares, rates."""
    import hashlib

    from ghcn_d_etl_project_spark.operators.common import temperature_mix

    spec = {
        "a": [(i, 5 + i % 20) for i in range(1, 301)],
        "b": [(i, 3 + i % 9) for i in range(1001, 1101)],
        "c": [(i, 40) for i in range(2001, 2011)],
    }
    df = _mix_df(spark, spec)
    out = temperature_mix(df, "dom", "w", "id",
                          target_total=1500, temperature=0.5).collect()

    from decimal import Decimal
    c = {d: sum(w for _, w in pairs) for d, pairs in spec.items()}
    terms = {d: Decimal(repr(v ** 0.5)).quantize(Decimal("1e-12"))
             for d, v in c.items()}
    tt = sum(terms.values())
    share = {d: float(terms[d]) / float(tt) for d in c}
    rate = {d: min(1.0, share[d] * 1500.0 / c[d]) for d in c}

    def keep(rid, d):
        h = hashlib.md5(f"{rid}:mix".encode()).hexdigest()[:8]
        return int(int(h, 16) % 10000 < int(rate[d] * 10000))

    expect = {(i, d): keep(i, d) for d, pairs in spec.items()
              for i, _ in pairs}
    assert len(out) == sum(len(p) for p in spec.values())
    for r in out:
        assert r["keep"] == expect[(r["id"], r["domain"])], r
        assert r["rate"] == round(rate[r["domain"]], 6)
        assert r["mix_share"] == round(share[r["domain"]], 6)


def test_mix_null_exclusion_and_validation(spark):
    from ghcn_d_etl_project_spark.operators.common import temperature_mix

    rows = [(1, "a", 10), (2, None, 5), (None, "a", 5), (3, "a", None)]
    df = spark.createDataFrame(rows, "id long, dom string, w long")
    out = temperature_mix(df, "dom", "w", "id", target_total=100)
    assert [r["id"] for r in out.collect()] == [1]
    with pytest.raises(ValueError, match="target_total"):
        temperature_mix(df, "dom", "w", "id", target_total=0)
    with pytest.raises(ValueError, match="temperature"):
        temperature_mix(df, "dom", "w", "id", target_total=10,
                        temperature=-1)


def test_epoch_upsample_md5_replay(spark):
    """Copy counts replay exactly in python: floor(rate) copies plus
    one iff md5-bucket(id:epoch) < floor(frac*10000)."""
    import hashlib

    from ghcn_d_etl_project_spark.operators.common import epoch_upsample

    rows = [(i, 2.3) for i in range(1, 41)] + [(100 + i, 0.4) for i in range(20)]
    df = spark.createDataFrame(rows, "id long, rate double")
    got = {}
    for r in epoch_upsample(df, "id", "rate").collect():
        got[r.id] = r.n_copies
        assert 1 <= r.copy_idx <= r.n_copies
    for i, rate in rows:
        bucket = int(hashlib.md5(f"{i}:epoch".encode()).hexdigest()[:8], 16) % 10000
        import math

        n_full = math.floor(rate)
        thr = math.floor((rate - n_full) * 10000)
        expect = n_full + (1 if bucket < thr else 0)
        if expect == 0:
            assert i not in got, i
        else:
            assert got[i] == expect, (i, got.get(i), expect)


def test_epoch_upsample_copy_grain_and_downsample(spark):
    """Output has exactly n_copies rows per kept id (copy_idx 1..n);
    rate < 1 degrades to 0-or-1 copies — pure downsampling."""
    from ghcn_d_etl_project_spark.operators.common import epoch_upsample

    df = spark.createDataFrame(
        [(i, 0.5) for i in range(200)], "id long, rate double"
    )
    out = epoch_upsample(df, "id", "rate").collect()
    per_id: dict[int, list[int]] = {}
    for r in out:
        per_id.setdefault(r.id, []).append(r.copy_idx)
    for i, idxs in per_id.items():
        assert sorted(idxs) == list(range(1, len(idxs) + 1))
        assert len(idxs) == 1  # rate<1 -> at most one copy, kept ids have 1
    # roughly half kept at rate 0.5 (md5-uniform; generous band)
    assert 60 <= len(per_id) <= 140


def test_epoch_upsample_zero_shuffle(spark):
    """The expansion itself is a pure projection + explode — no
    Exchange in the operator's plan."""
    from ghcn_d_etl_project_spark.operators.common import epoch_upsample
    from ghcn_d_etl_project_spark.utils.plancheck import plan_report

    df = spark.createDataFrame([(1, 1.5), (2, 2.0)], "id long, rate double")
    rep = plan_report(epoch_upsample(df, "id", "rate"))
    assert rep.as_dict()["shuffles"] == 0


def test_epoch_upsample_negative_rate_raises(spark):
    import pytest as _p

    from ghcn_d_etl_project_spark.operators.common import epoch_upsample

    df = spark.createDataFrame([(1, -0.5)], "id long, rate double")
    with _p.raises(Exception, match="negative rate"):
        epoch_upsample(df, "id", "rate").collect()
