"""Time-series densification operators (operators/timeseries.py):
date spines, join-free gap fill + forward fill, linear interpolation.
The gap_fill_events oracle query cross-checks the lead-explode
construction against DuckDB's spine-join formulation; these tests pin
the operator semantics and the one-shuffle/no-join plan shape."""

from __future__ import annotations

import datetime as dt
import random

import pytest
from pyspark.sql import functions as F

from ghcn_d_etl_project_spark.operators.timeseries import (
    date_spine,
    gap_fill_ffill,
    interpolate_linear,
)

D = dt.date


def _series(spark):
    # key "a": observations on day 1, 4, 5 (gap of 2 days after day 1)
    # key "b": single observation (no gaps, span of 1)
    return spark.createDataFrame(
        [
            ("a", D(2024, 1, 1), 10.0),
            ("a", D(2024, 1, 4), 40.0),
            ("a", D(2024, 1, 5), 50.0),
            ("b", D(2024, 3, 1), 7.0),
        ],
        "k string, day date, v double",
    )


# ---------------------------------------------------------------------------
# date_spine
# ---------------------------------------------------------------------------


def test_date_spine_spans_each_key_min_max(spark):
    out = date_spine(_series(spark), ["k"], "day").collect()
    by_key: dict[str, list[dt.date]] = {}
    for r in out:
        by_key.setdefault(r.k, []).append(r.day)
    assert sorted(by_key["a"]) == [D(2024, 1, d) for d in range(1, 6)]
    assert by_key["b"] == [D(2024, 3, 1)]


def test_date_spine_empty_keys_raises(spark):
    with pytest.raises(ValueError, match="key_cols"):
        date_spine(_series(spark), [], "day")


# ---------------------------------------------------------------------------
# gap_fill_ffill
# ---------------------------------------------------------------------------


def test_gap_fill_exact_rows(spark):
    rows = {
        (r.k, r.day): r
        for r in gap_fill_ffill(_series(spark), ["k"], "day", ["v"]).collect()
    }
    assert len(rows) == 6  # 5 days for a + 1 for b

    # observed rows: value kept, gap 0, staleness 0
    for key, day, v in [
        ("a", D(2024, 1, 1), 10.0),
        ("a", D(2024, 1, 4), 40.0),
        ("a", D(2024, 1, 5), 50.0),
        ("b", D(2024, 3, 1), 7.0),
    ]:
        r = rows[(key, day)]
        assert (r.v, r.v_ffill, r.is_gap, r.days_since_obs) == (v, v, 0, 0)

    # synthesized rows: NULL value, carried ffill, staleness counts up
    r2 = rows[("a", D(2024, 1, 2))]
    assert (r2.v, r2.v_ffill, r2.is_gap, r2.days_since_obs) == (None, 10.0, 1, 1)
    r3 = rows[("a", D(2024, 1, 3))]
    assert (r3.v, r3.v_ffill, r3.is_gap, r3.days_since_obs) == (None, 10.0, 1, 2)


def test_gap_fill_multiple_value_cols(spark):
    df = spark.createDataFrame(
        [("a", D(2024, 1, 1), 1.0, 100.0), ("a", D(2024, 1, 3), 3.0, 300.0)],
        "k string, day date, x double, y double",
    )
    mid = {
        r.day: r
        for r in gap_fill_ffill(df, ["k"], "day", ["x", "y"]).collect()
    }[D(2024, 1, 2)]
    assert (mid.x, mid.x_ffill, mid.y, mid.y_ffill) == (None, 1.0, None, 100.0)


def test_gap_fill_max_gap_cap(spark):
    """A 9-day gap capped at 2: fill stops 2 days past the observation,
    the series resumes at the next real row — no unbounded fan-out."""
    df = spark.createDataFrame(
        [("a", D(2024, 1, 1), 1.0), ("a", D(2024, 1, 11), 2.0)],
        "k string, day date, v double",
    )
    days = sorted(
        r.day
        for r in gap_fill_ffill(df, ["k"], "day", ["v"], max_gap_days=2).collect()
    )
    assert days == [D(2024, 1, 1), D(2024, 1, 2), D(2024, 1, 3), D(2024, 1, 11)]


def test_gap_fill_reserved_name_collision_raises(spark):
    df = _series(spark).withColumn("__day", F.lit(1))
    with pytest.raises(ValueError, match="reserved"):
        gap_fill_ffill(df, ["k"], "day", ["v"])


def test_gap_fill_grid_size_law_random(spark):
    """Output size == sum over keys of (max-min span + 1), for arbitrary
    observation patterns."""
    rng = random.Random(7)
    rows, expected = [], 0
    for ki in range(8):
        days = sorted(rng.sample(range(60), rng.randint(1, 12)))
        expected += days[-1] - days[0] + 1
        rows += [
            (f"k{ki}", D(2024, 1, 1) + dt.timedelta(days=d), float(d))
            for d in days
        ]
    df = spark.createDataFrame(rows, "k string, day date, v double")
    out = gap_fill_ffill(df, ["k"], "day", ["v"])
    assert out.count() == expected
    # ffill is total on the densified grid: never NULL
    assert out.filter(F.col("v_ffill").isNull()).count() == 0


# ---------------------------------------------------------------------------
# interpolate_linear
# ---------------------------------------------------------------------------


def test_interpolate_linear_exact(spark):
    df = spark.createDataFrame(
        [("a", D(2024, 1, 1), 10.0), ("a", D(2024, 1, 4), 40.0)],
        "k string, day date, v double",
    )
    got = {
        r.day: (r.v_interp, r.is_gap)
        for r in interpolate_linear(df, ["k"], "day", "v").collect()
    }
    assert got == {
        D(2024, 1, 1): (10.0, 0),
        D(2024, 1, 2): (20.0, 1),
        D(2024, 1, 3): (30.0, 1),
        D(2024, 1, 4): (40.0, 0),  # observed endpoint: exact, not derived
    }


def test_interpolate_trailing_rows_not_synthesized(spark):
    """After the last observation there is no next value to interpolate
    toward — the operator must not invent rows there."""
    df = spark.createDataFrame(
        [("a", D(2024, 1, 1), 1.0)], "k string, day date, v double"
    )
    out = interpolate_linear(df, ["k"], "day", "v").collect()
    assert len(out) == 1 and out[0].v_interp == 1.0


# ---------------------------------------------------------------------------
# plan shape: the join-free claim, pinned
# ---------------------------------------------------------------------------


def test_gap_fill_events_plan_is_join_free_two_shuffles(spark):
    """The registered query = daily aggregate + gap fill. The fill itself
    adds exactly ONE exchange (the lead window's per-key partition); the
    aggregate adds the other. No join operator of any kind — that is the
    point of the lead-explode construction vs the textbook spine join."""
    from ghcn_d_etl_project_spark.plans import all_queries

    df = all_queries()["gap_fill_events"].fn(spark, "/root/testdata/sf0.001")
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "Join" not in plan, plan[:1500]
    n = plan.count("Exchange hashpartitioning")
    assert n == 2, f"expected 2 shuffles (agg + window), saw {n}:\n{plan[:1500]}"
    assert "Generate explode(sequence" in plan


def test_gap_fill_validate_unique_raises_on_duplicates(spark):
    df = spark.createDataFrame(
        [("a", D(2024, 1, 1), 1.0), ("a", D(2024, 1, 1), 2.0)],
        "k string, day date, v double",
    )
    with pytest.raises(ValueError, match="duplicate"):
        gap_fill_ffill(df, ["k"], "day", ["v"], validate_unique=True)
    with pytest.raises(ValueError, match="duplicate"):
        interpolate_linear(df, ["k"], "day", "v", validate_unique=True)
    # default path stays cheap: no validation aggregate, no raise
    assert gap_fill_ffill(df, ["k"], "day", ["v"]).count() >= 2


# ---------------------------------------------------------------------------
# CUSUM
# ---------------------------------------------------------------------------


def _cusum_reference(xs, target, slack=0.0):
    """Textbook recursive two-sided CUSUM (the definition the closed
    form in operators/timeseries.cusum must reproduce)."""
    sp = sn = 0.0
    out = []
    for x in xs:
        sp = max(0.0, sp + (x - target - slack))
        sn = max(0.0, sn + (target - x - slack))
        out.append((sp, sn))
    return out


def test_cusum_matches_recursive_definition(spark):
    from ghcn_d_etl_project_spark.operators.timeseries import cusum

    xs = [10.0, 12.0, 9.0, 30.0, 31.0, 29.5, 8.0, 10.5, 11.0, 50.0]
    df = spark.createDataFrame(
        [(i, x) for i, x in enumerate(xs)], "i int, v double"
    )
    got = {
        r.i: (r.cusum_pos, r.cusum_neg)
        for r in cusum(df, "i", "v", target=15.0, slack=2.0).collect()
    }
    want = _cusum_reference(xs, 15.0, 2.0)
    for i, (sp, sn) in enumerate(want):
        assert abs(got[i][0] - sp) < 1e-9, (i, got[i], sp)
        assert abs(got[i][1] - sn) < 1e-9, (i, got[i], sn)


def test_cusum_default_target_is_mean(spark):
    from ghcn_d_etl_project_spark.operators.timeseries import cusum

    xs = [1.0, 2.0, 3.0, 10.0]
    df = spark.createDataFrame(
        [(i, x) for i, x in enumerate(xs)], "i int, v double"
    )
    got = {r.i: (r.cusum_pos, r.cusum_neg, r.dev) for r in cusum(df, "i", "v").collect()}
    want = _cusum_reference(xs, sum(xs) / len(xs))
    for i, (sp, sn) in enumerate(want):
        assert abs(got[i][0] - sp) < 1e-9
        assert abs(got[i][1] - sn) < 1e-9
    assert abs(got[0][2] - (1.0 - 4.0)) < 1e-9


def test_cusum_long_series_stays_integer(spark):
    """Integer-typed input with integer target must come back as exact
    longs — the float-promotion guard the oracle recipe relies on."""
    from ghcn_d_etl_project_spark.operators.timeseries import cusum

    rows = [(i, (2 ** 54) + i) for i in range(4)]
    df = spark.createDataFrame(rows, "i int, v long")
    out = cusum(df, "i", "v", target=2 ** 54)
    assert dict(out.dtypes)["cusum_pos"] == "bigint", out.dtypes
    got = {r.i: r.cusum_pos for r in out.collect()}
    # dev_i = i exactly (would be lossy in double at 2^54 granularity 2)
    assert got == {0: 0, 1: 1, 2: 3, 3: 6}


def test_peak_concurrency_half_open(spark):
    """An interval ending exactly when another starts is NOT concurrent
    with it (half-open [s, e)): the end's -1 cancels the start's +1 in
    the same per-timestamp net row. Earliest attaining ts wins ties."""
    from ghcn_d_etl_project_spark.operators.timeseries import peak_concurrency

    TS = dt.datetime
    rows = [
        (TS(2024, 1, 1, 0, 0), TS(2024, 1, 1, 1, 0)),   # a: [0:00, 1:00)
        (TS(2024, 1, 1, 0, 30), TS(2024, 1, 1, 2, 0)),  # b: overlaps a
        (TS(2024, 1, 1, 1, 0), TS(2024, 1, 1, 3, 0)),   # c: starts AT a's end
        (TS(2024, 1, 1, 5, 0), TS(2024, 1, 1, 6, 0)),   # d: lone
    ]
    df = spark.createDataFrame(rows, "s timestamp, e timestamp")
    out = peak_concurrency(df, "s", "e").collect()
    assert len(out) == 1
    # peak is 2 (a+b at 0:30; then b+c at 1:00 — never 3, half-open)
    assert out[0].peak_concurrency == 2
    assert out[0].ts == TS(2024, 1, 1, 0, 30)


# ---------------------------------------------------------------------------
# autocorrelation
# ---------------------------------------------------------------------------


def test_autocorrelation_matches_numpy_pairwise(spark):
    """ACF at each lag equals the numpy Pearson corr of the series with
    its k-shifted self over the overlapping support (the pairwise
    estimator the operator documents)."""
    import numpy as np

    from ghcn_d_etl_project_spark.operators.timeseries import autocorrelation

    rng = random.Random(7)
    vals = [round(rng.uniform(-50, 50), 2) for _ in range(40)]
    rows = [("g", D(2024, 1, 1) + dt.timedelta(days=i), v) for i, v in enumerate(vals)]
    df = spark.createDataFrame(rows, "k string, day date, v double")
    out = {
        r["lag"]: (r["n"], r["acf"])
        for r in autocorrelation(df, ["k"], "day", "v", lags=(1, 2, 5)).collect()
    }
    a = np.array(vals)
    for k in (1, 2, 5):
        x, y = a[k:], a[:-k]
        expected = float(np.corrcoef(x, y)[0, 1])
        n, acf = out[k]
        assert n == len(vals) - k
        assert acf == pytest.approx(expected, abs=2e-6)


def test_autocorrelation_perfect_and_alternating(spark):
    """A linear ramp has ACF ~ 1 at every lag; a +1/-1 alternation has
    ACF -1 at odd lags and +1 at even lags."""
    from ghcn_d_etl_project_spark.operators.timeseries import autocorrelation

    ramp = [("r", D(2024, 1, 1) + dt.timedelta(days=i), float(i)) for i in range(30)]
    alt = [
        ("a", D(2024, 1, 1) + dt.timedelta(days=i), 1.0 if i % 2 == 0 else -1.0)
        for i in range(30)
    ]
    df = spark.createDataFrame(ramp + alt, "k string, day date, v double")
    out = {
        (r["k"], r["lag"]): r["acf"]
        for r in autocorrelation(df, ["k"], "day", "v", lags=(1, 2)).collect()
    }
    assert out[("r", 1)] == pytest.approx(1.0, abs=1e-6)
    assert out[("a", 1)] == pytest.approx(-1.0, abs=1e-6)
    assert out[("a", 2)] == pytest.approx(1.0, abs=1e-6)


def test_autocorrelation_constant_series_is_null(spark):
    """Zero variance -> NULL acf (not NaN, not a crash)."""
    from ghcn_d_etl_project_spark.operators.timeseries import autocorrelation

    rows = [("c", D(2024, 1, 1) + dt.timedelta(days=i), 5.0) for i in range(10)]
    df = spark.createDataFrame(rows, "k string, day date, v double")
    out = autocorrelation(df, ["k"], "day", "v", lags=(1,)).collect()
    assert len(out) == 1 and out[0]["acf"] is None


def test_autocorrelation_rejects_bad_lags(spark):
    from ghcn_d_etl_project_spark.operators.timeseries import autocorrelation

    df = spark.createDataFrame([("a", D(2024, 1, 1), 1.0)], "k string, day date, v double")
    with pytest.raises(ValueError):
        autocorrelation(df, ["k"], "day", "v", lags=())
    with pytest.raises(ValueError):
        autocorrelation(df, ["k"], "day", "v", lags=(0,))


# ---------------------------------------------------------------------------
# seasonal_profile
# ---------------------------------------------------------------------------


def test_seasonal_profile_weekday_arithmetic_and_index(spark):
    """2024-01-01 was a Monday -> dow 1; a series that is 20.0 on Mondays
    and 10.0 otherwise over exactly 4 weeks gets mean 20/10 and index
    against overall mean (6*10+20)/7."""
    from ghcn_d_etl_project_spark.operators.timeseries import seasonal_profile

    rows = []
    for i in range(28):
        day = D(2024, 1, 1) + dt.timedelta(days=i)
        rows.append(("g", day, 20.0 if i % 7 == 0 else 10.0))
    df = spark.createDataFrame(rows, "k string, day date, v double")
    out = {r["dow"]: r for r in seasonal_profile(df, ["k"], "day", "v").collect()}
    assert set(out) == set(range(1, 8))
    overall = (6 * 10.0 + 20.0) / 7
    assert out[1]["mean_value"] == pytest.approx(20.0)
    assert out[1]["n_days"] == 4
    assert out[1]["seasonal_index"] == pytest.approx(20.0 / overall, abs=1e-6)
    assert out[2]["seasonal_index"] == pytest.approx(10.0 / overall, abs=1e-6)


def test_seasonal_profile_zero_mean_index_null(spark):
    from ghcn_d_etl_project_spark.operators.timeseries import seasonal_profile

    rows = [("z", D(2024, 1, 1) + dt.timedelta(days=i), 0.0) for i in range(14)]
    df = spark.createDataFrame(rows, "k string, day date, v double")
    for r in seasonal_profile(df, ["k"], "day", "v").collect():
        assert r["seasonal_index"] is None
        assert r["mean_value"] == 0.0


# ---------------------------------------------------------------------------
# business-day arithmetic (r9)
# ---------------------------------------------------------------------------


def test_business_days_matches_python_reference(spark):
    """Closed form == brute-force weekday count over random date pairs,
    including negative (reversed) ranges."""
    from ghcn_d_etl_project_spark.operators.timeseries import (
        business_days_between,
    )

    rng = random.Random(23)
    pairs = []
    for i in range(60):
        a = D(2023, 1, 1) + dt.timedelta(days=rng.randrange(0, 700))
        b = D(2023, 1, 1) + dt.timedelta(days=rng.randrange(0, 700))
        pairs.append((i, a, b))
    df = spark.createDataFrame(pairs, "i long, d1 date, d2 date")
    got = {
        r["i"]: r["bd"]
        for r in df.select(
            "i", business_days_between("d1", "d2").alias("bd")
        ).collect()
    }

    def brute(a, b):
        if b < a:
            return -brute(b, a)
        n, d = 0, a
        while d < b:
            if d.weekday() < 5:
                n += 1
            d += dt.timedelta(days=1)
        return n

    for i, a, b in pairs:
        assert got[i] == brute(a, b), (a, b)


def test_business_days_weekend_edges(spark):
    """[d1, d2) convention: Sat->Mon is 0 (no weekday in between);
    Fri->Mon is 1 (Friday itself); same-day is 0."""
    from ghcn_d_etl_project_spark.operators.timeseries import (
        business_days_between,
    )

    rows = [
        (1, D(2024, 1, 6), D(2024, 1, 8)),  # Sat -> Mon
        (2, D(2024, 1, 5), D(2024, 1, 8)),  # Fri -> Mon
        (3, D(2024, 1, 8), D(2024, 1, 8)),  # same Monday
        (4, D(2024, 1, 8), D(2024, 1, 15)),  # full week Mon -> Mon
    ]
    df = spark.createDataFrame(rows, "i long, d1 date, d2 date")
    got = {
        r["i"]: r["bd"]
        for r in df.select(
            "i", business_days_between("d1", "d2").alias("bd")
        ).collect()
    }
    assert got == {1: 0, 2: 1, 3: 0, 4: 5}


def test_business_days_pre_anchor_dates(spark):
    """Dates BEFORE the 1969-12-29 Monday anchor: the decomposition
    must pair floored division with the positive modulus (pmod) — the
    signed `%` remainder read 1969-12-26 -> 1969-12-29 as 8 business
    days instead of 1, and Sun -> Mon as 6 instead of 0."""
    from ghcn_d_etl_project_spark.operators.timeseries import (
        business_days_between,
    )

    rows = [
        (1, D(1969, 12, 26), D(1969, 12, 29)),  # Fri -> Mon = 1
        (2, D(1969, 12, 28), D(1969, 12, 29)),  # Sun -> Mon = 0
        (3, D(1969, 12, 22), D(1969, 12, 29)),  # Mon -> Mon = 5
        (4, D(1969, 12, 29), D(1969, 12, 26)),  # reversed = -1
        (5, D(1960, 2, 29), D(1970, 1, 5)),  # deep pre-anchor span
        (6, D(1969, 12, 27), D(1969, 12, 29)),  # Sat -> Mon = 0
    ]
    df = spark.createDataFrame(rows, "i long, d1 date, d2 date")
    got = {
        r["i"]: r["bd"]
        for r in df.select(
            "i", business_days_between("d1", "d2").alias("bd")
        ).collect()
    }

    def brute(a, b):
        if b < a:
            return -brute(b, a)
        n, d = 0, a
        while d < b:
            if d.weekday() < 5:
                n += 1
            d += dt.timedelta(days=1)
        return n

    assert got == {i: brute(a, b) for i, a, b in rows}


def test_seasonal_profile_pre_1970_dow_in_range(spark):
    """pmod keeps the ISO weekday in 1..7 for pre-epoch dates (the
    signed remainder read 1969-12-25 as dow -3)."""
    from ghcn_d_etl_project_spark.operators.timeseries import seasonal_profile

    rows = [
        ("k", D(1969, 12, 25), 1.0),  # Thursday -> dow 4
        ("k", D(1969, 12, 28), 2.0),  # Sunday -> dow 7
        ("k", D(1969, 12, 29), 3.0),  # Monday -> dow 1
        ("k", D(1970, 1, 1), 4.0),  # Thursday -> dow 4
    ]
    df = spark.createDataFrame(rows, "k string, day date, v double")
    out = {r["dow"]: r for r in seasonal_profile(df, ["k"], "day", "v").collect()}
    assert set(out) == {1, 4, 7}
    assert all(1 <= d <= 7 for d in out)
    assert out[4]["n_days"] == 2 and out[4]["mean_value"] == 2.5
    assert out[7]["n_days"] == 1 and out[1]["n_days"] == 1


# ---------------------------------------------------------------------------
# kaplan_meier (r9)
# ---------------------------------------------------------------------------


def _py_km(subjects):
    """Reference KM: subjects = [(t, event)], returns {t: survival}."""
    from collections import Counter

    d = Counter(t for t, e in subjects if e)
    c = Counter(t for t, e in subjects if not e)
    times = sorted(set(d) | set(c))
    n = len(subjects)
    s = 1.0
    out = {}
    for t in times:
        if d[t] and d[t] < n:
            s *= 1.0 - d[t] / n
        elif d[t] == n:
            s = 0.0
        out[t] = (n, d[t], c[t], round(s, 6))
        n -= d[t] + c[t]
    return out


def test_km_textbook_case(spark):
    """Classic worked example: events at 1,2 censor at 3, event at 4."""
    from ghcn_d_etl_project_spark.operators.timeseries import kaplan_meier

    subjects = [(1, 1), (2, 1), (3, 0), (4, 1), (5, 0)]
    df = spark.createDataFrame(subjects, "t long, e long")
    got = {
        r["t"]: (r["n_at_risk"], r["d_events"], r["c_censored"], r["survival"])
        for r in kaplan_meier(df, "t", "e").collect()
    }
    # by hand: S(1)=4/5=0.8; S(2)=0.8*3/4=0.6; S(3)=0.6 (censor only);
    # S(4): n=2, d=1 -> 0.3; S(5)=0.3 (censor only)
    assert got[1] == (5, 1, 0, 0.8)
    assert got[2] == (4, 1, 0, 0.6)
    assert got[3] == (3, 0, 1, 0.6)
    assert got[4] == (2, 1, 0, 0.3)
    assert got[5] == (1, 0, 1, 0.3)


def test_km_matches_python_reference_random(spark):
    from ghcn_d_etl_project_spark.operators.timeseries import kaplan_meier

    rng = random.Random(41)
    subjects = [(rng.randint(0, 20), rng.randint(0, 1)) for _ in range(300)]
    df = spark.createDataFrame(subjects, "t long, e long")
    got = {
        r["t"]: (r["n_at_risk"], r["d_events"], r["c_censored"], r["survival"])
        for r in kaplan_meier(df, "t", "e").collect()
    }
    want = _py_km(subjects)
    assert set(got) == set(want)
    for t in want:
        assert got[t][:3] == want[t][:3], t
        assert abs(got[t][3] - want[t][3]) <= 1e-6, t


def test_km_monotone_and_extinction(spark):
    """Survival never increases; all-events-at-once pins S to exactly 0
    (no -inf artifacts)."""
    from ghcn_d_etl_project_spark.operators.timeseries import kaplan_meier

    rng = random.Random(43)
    subjects = [(rng.randint(0, 10), rng.randint(0, 1)) for _ in range(100)]
    df = spark.createDataFrame(subjects, "t long, e long")
    curve = [
        r["survival"]
        for r in kaplan_meier(df, "t", "e").orderBy("t").collect()
    ]
    assert all(b <= a + 1e-12 for a, b in zip(curve, curve[1:]))

    allout = spark.createDataFrame([(5, 1), (5, 1)], "t long, e long")
    got = kaplan_meier(allout, "t", "e").collect()
    assert got[0]["survival"] == 0.0
