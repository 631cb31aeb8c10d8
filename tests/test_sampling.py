"""Statistical contracts for the rows-only sampling/sketch queries."""

from __future__ import annotations

from ghcn_d_etl_project_spark.plans import all_queries
from ghcn_d_etl_project_spark.plans.sampling import STRATA_FRACTIONS
from ghcn_d_etl_project_spark.plans._util import t
from tests.conftest import SF_DIR


def test_stratified_sample_deterministic_and_proportional(spark):
    q = all_queries()["stratified_sample"]
    a = sorted(r.doc_id for r in q.fn(spark, SF_DIR).collect())
    b = sorted(r.doc_id for r in q.fn(spark, SF_DIR).collect())
    assert a == b, "same seed must give the same sample"
    totals = {
        r.lang: r.n
        for r in t(spark, SF_DIR, "documents").groupBy("lang").count()
        .withColumnRenamed("count", "n").collect()
    }
    sampled = q.fn(spark, SF_DIR).groupBy("lang").count().collect()
    for r in sampled:
        frac = r["count"] / totals[r.lang]
        want = STRATA_FRACTIONS[r.lang]
        assert abs(frac - want) < 0.15, (r.lang, frac, want)


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
