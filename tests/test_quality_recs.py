"""Q7 threshold-driven recommendations (reference
notebooks/05_data_validation.py:246-265): each threshold crossing emits
its warning; a fully-clean report emits exactly the all-clear line."""

from __future__ import annotations

from ghcn_d_etl_project_spark.operators.quality import completeness, recommendations


def test_all_clear():
    recs = recommendations(
        {
            "temp_anomalies": 0,
            "temp_inconsistent": 0,
            "completeness": {"TMAX": 95.0, "TMIN": 99.0},
            "partitions": 8,
        }
    )
    assert recs == ["All validation checks passed - data quality is good"]


def test_each_rule_fires():
    recs = recommendations(
        {
            "temp_anomalies": 101,
            "temp_inconsistent": 1,
            "completeness": {"TMAX": 79.9},
            "partitions": 201,
        }
    )
    assert len(recs) == 4
    assert any("temperature anomalies" in r for r in recs)
    assert any("inconsistencies" in r for r in recs)
    assert any("completeness" in r for r in recs)
    assert any("partitions" in r for r in recs)


def test_thresholds_are_exclusive():
    """Rules fire strictly ABOVE the limit (reference uses >) and strictly
    BELOW the completeness floor (reference uses <)."""
    recs = recommendations(
        {
            "temp_anomalies": 100,  # == limit -> no warning
            "completeness": {"TMAX": 80.0},  # == floor -> no warning
            "partitions": 200,  # == limit -> no warning
        }
    )
    assert recs == ["All validation checks passed - data quality is good"]


def test_report_from_completeness_pass(spark):
    """End-to-end: the distributed single-pass completeness agg feeds the
    driver-side ladder."""
    df = spark.createDataFrame(
        [(1.0, None), (2.0, None), (3.0, 1.0), (None, None)],
        "TMAX double, TMIN double",
    )
    row = completeness(df, ["TMAX", "TMIN"]).collect()[0]
    comp = {c: getattr(row, f"{c}_pct") for c in ("TMAX", "TMIN")}
    recs = recommendations({"completeness": comp})
    assert any("completeness" in r for r in recs)  # TMIN at 25% < 80%


def test_pipelines_never_call_exact_percentile():
    """The exact-percentile operators (column_stats_with_outliers,
    iqr_bounds) buffer EVERY value of a column in one aggregation
    buffer — fine as sf0.01 oracle anchors, OOM at 100 TB. This is the
    grep-able guarantee that no pipeline module reaches them: the
    sketch-based approx_quantile_bounds is the only production path."""
    from pathlib import Path

    import ghcn_d_etl_project_spark

    pkg = Path(ghcn_d_etl_project_spark.__file__).parent
    banned = ("column_stats_with_outliers", "iqr_bounds", "percentile(")
    for mod in sorted((pkg / "pipelines").glob("*.py")):
        src = mod.read_text()
        for name in banned:
            assert name not in src, (mod.name, name)
