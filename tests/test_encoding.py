"""Leave-one-out target encoding: edge semantics + the no-fact-shuffle
plan shape (operators/encoding.py)."""

from __future__ import annotations

from ghcn_d_etl_project_spark.operators.encoding import target_encode_loo


def test_loo_basic_and_edges(spark):
    rows = [
        (1, "a", 10.0),
        (2, "a", 20.0),
        (3, "a", 30.0),
        (4, "b", 5.0),        # singleton -> NULL
        (5, "c", 7.0),
        (6, "c", None),       # NULL target -> plain mean of others
        (7, None, 9.0),       # NULL category -> NULL
    ]
    df = spark.createDataFrame(rows, "id int, cat string, y double")
    got = {r.id: r.te_loo for r in target_encode_loo(df, "cat", "y").collect()}
    assert got[1] == 25.0 and got[2] == 20.0 and got[3] == 15.0
    assert got[4] is None
    assert got[5] is None    # c has one non-NULL y -> no leakage-free est
    assert got[6] == 7.0     # NULL target: plain mean over others
    assert got[7] is None
    assert len(got) == 7     # left join preserves every row


def test_loo_plan_one_shuffle_broadcast_back(spark):
    """ONE hash Exchange (the category aggregate); the join back to the
    fact must be a BroadcastHashJoin — the fact table never shuffles.
    This is the operator's reason to exist vs the window formulation."""
    from ghcn_d_etl_project_spark.plans._util import t

    out = target_encode_loo(
        t(spark, "/root/testdata/sf0.001", "orders"),
        "o_orderpriority", "o_totalprice",
    )
    out.count()
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan, plan[:1200]
    assert "SortMergeJoin" not in plan
    n = plan.count("Exchange hashpartitioning")
    assert n <= 1, f"fact side shuffled: {n} hash exchanges\n{plan[:1500]}"


def test_percentile_features_match_window_semantics(spark):
    """Counting formulation == PERCENT_RANK/CUME_DIST window semantics,
    including ties and NULLs (NULL -> NULL features, excluded from N)."""
    from ghcn_d_etl_project_spark.operators.encoding import percentile_features

    rows = [(1, 10.0), (2, 20.0), (3, 20.0), (4, 30.0), (5, None)]
    df = spark.createDataFrame(rows, "id int, v double")
    got = {r.id: (r.pct_rank, r.cume_dist)
           for r in percentile_features(df, "v").collect()}
    assert got[1] == (0.0, 0.25)
    # ties share below=1 -> pct (1/3), cume inclusive 3/4
    assert got[2] == (round(1 / 3, 6), 0.75)
    assert got[3] == got[2]
    assert got[4] == (1.0, 1.0)
    assert got[5] == (None, None)
    assert len(got) == 5


def test_percentile_features_exact_tile_column(spark):
    """tile_col = exact BIGINT ceil(n_tiles*cum/N): ties share a tile,
    NULLs get NULL, and the arithmetic never routes through the rounded
    cume double (a boundary value within 5e-7 of a tile edge must land
    on the exact side)."""
    from ghcn_d_etl_project_spark.operators.encoding import percentile_features

    rows = [(1, 10.0), (2, 20.0), (3, 20.0), (4, 30.0), (5, None)]
    df = spark.createDataFrame(rows, "id int, v double")
    got = {
        r.id: r.tile
        for r in percentile_features(
            df, "v", tile_col="tile", n_tiles=4
        ).collect()
    }
    # cum/N: 1/4 -> tile 1; ties cum 3/4 -> tile 3; 4/4 -> tile 4
    assert got == {1: 1, 2: 3, 3: 3, 4: 4, 5: None}

    # boundary stress: N rows where one value sits exactly at a decile
    # edge and another a hair past it — the rounded-cume formulation
    # (ceil(round(cum/N, 6) * 10)) misbuckets the hair-past row when
    # round() pulls it back onto the edge; the integer form cannot
    n = 2_000_003  # cum/N within 5e-7 of 0.1 for cum near n/10
    cum_edge = n // 10  # 200000 -> cum/N just below 0.1 -> tile 1
    cum_past = cum_edge + 1  # just past -> tile 2 (rounds to 0.1!)
    assert round(cum_past / n, 6) == 0.1  # the trap ADVICE described
    import math

    for cum, want in [(cum_edge, 1), (cum_past, 2), (n, 10)]:
        exact = (10 * cum + n - 1) // n
        assert exact == want
        assert exact == math.ceil(10 * cum / n)


def test_percentile_features_no_single_partition_sort(spark):
    """The operator's reason to exist: the executed plan must not
    contain the window formulation's Exchange SinglePartition over the
    data (the broadcast of the one-row total is fine)."""
    from ghcn_d_etl_project_spark.operators.encoding import percentile_features
    from ghcn_d_etl_project_spark.plans._util import t

    out = percentile_features(
        t(spark, "/root/testdata/sf0.001", "orders"), "o_totalprice"
    )
    out.count()
    plan = out._jdf.queryExecution().executedPlan().toString()
    # two BOUNDED SinglePartition exchanges are allowed — global_cumsum's
    # bucket-summary window (#buckets rows) and the one-row total — but
    # never a third (which would be the data-sized sort), and never the
    # window formulation's rangepartitioning
    assert plan.count("Exchange SinglePartition") <= 2, plan[:1500]
    assert "rangepartitioning" not in plan.lower(), plan[:1500]


def test_standardize_hand_case_and_edges(spark):
    import math

    from ghcn_d_etl_project_spark.operators.encoding import standardize

    rows = [
        (1, "a", 10.0), (2, "a", 20.0), (3, "a", 30.0),
        (4, "b", 7.0),                  # singleton -> NULL z
        (5, "c", 4.0), (6, "c", 4.0),   # zero variance -> NULL z
        (7, "a", None),                 # NULL x -> NULL z
        (8, None, 9.0),                 # NULL group -> NULL z
    ]
    df = spark.createDataFrame(rows, "id int, g string, v double")
    got = {r.id: r.v_z for r in standardize(df, ["v"], ["g"]).collect()}
    # group a: mean 20, sample std 10
    assert got[1] == -1.0 and got[2] == 0.0 and got[3] == 1.0
    assert got[4] is None and got[5] is None and got[6] is None
    assert got[7] is None and got[8] is None
    # population denominator: std = sqrt(200/3)
    gp = {r.id: r.v_z
          for r in standardize(df, ["v"], ["g"], sample=False).collect()}
    assert abs(gp[1] - (-10.0 / math.sqrt(200.0 / 3.0))) < 1e-6


def test_standardize_plan_no_fact_shuffle(spark):
    from ghcn_d_etl_project_spark.operators.encoding import standardize
    from ghcn_d_etl_project_spark.plans._util import t

    out = standardize(
        t(spark, "/root/testdata/sf0.001", "lineitem"),
        ["l_quantity", "l_extendedprice"],
        group_cols=["l_returnflag"],
    )
    out.count()
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan
    assert plan.count("Exchange hashpartitioning") <= 1, plan[:1500]


# ---------------------------------------------------------------------------
# feature_hash (r9)
# ---------------------------------------------------------------------------


def _py_feature_hash(rows, cols, n_buckets, salt="fh"):
    """Reference implementation of the documented md5 recipe."""
    import hashlib

    out = []
    for row in rows:
        vec = [0.0] * n_buckets
        for c in cols:
            v = row.get(c)
            if v is None:
                continue
            h = hashlib.md5(f"{c}={v}:{salt}".encode()).hexdigest()
            b = int(h[:4], 16) % n_buckets
            s = 1.0 if int(h[4], 16) % 2 == 0 else -1.0
            vec[b] += s
        out.append(vec)
    return out


def test_feature_hash_matches_reference(spark):
    from ghcn_d_etl_project_spark.operators.encoding import feature_hash

    rows = [
        {"id": 0, "a": "x", "b": "y"},
        {"id": 1, "a": "zzz", "b": None},
        {"id": 2, "a": None, "b": None},
    ]
    df = spark.createDataFrame(
        [(r["id"], r["a"], r["b"]) for r in rows], "id long, a string, b string"
    )
    got = {
        r["id"]: list(r["features"])
        for r in feature_hash(df, "id", ["a", "b"], n_buckets=8).collect()
    }
    want = _py_feature_hash(rows, ["a", "b"], 8)
    for r, w in zip(rows, want):
        assert got[r["id"]] == w
    assert got[2] == [0.0] * 8  # all-NULL row: zero vector, not dropped


def test_feature_hash_collisions_sum(spark):
    """Two columns with the SAME col=value token land in the same bucket
    with the same sign — the vector entry is ±2 (the hashing-trick
    collision semantics, not overwrite)."""
    from ghcn_d_etl_project_spark.operators.encoding import feature_hash

    df = spark.createDataFrame([(0, "x", "x")], "id long, a string, a2 string")
    # craft a collision deterministically: hash the same value through
    # two column names and find a bucket count where they collide
    import hashlib

    for nb in range(2, 64):
        ha = int(hashlib.md5(b"a=x:fh").hexdigest()[:4], 16) % nb
        hb = int(hashlib.md5(b"a2=x:fh").hexdigest()[:4], 16) % nb
        if ha == hb:
            sa = 1 if int(hashlib.md5(b"a=x:fh").hexdigest()[4], 16) % 2 == 0 else -1
            sb = 1 if int(hashlib.md5(b"a2=x:fh").hexdigest()[4], 16) % 2 == 0 else -1
            got = feature_hash(df, "id", ["a", "a2"], n_buckets=nb).collect()[0]
            assert got["features"][ha] == float(sa + sb)
            return
    raise AssertionError("no colliding bucket count found below 64")


def test_feature_hash_plan_is_shuffle_free(spark):
    from ghcn_d_etl_project_spark.operators.encoding import feature_hash
    from ghcn_d_etl_project_spark.plans._util import t
    from ghcn_d_etl_project_spark.utils.plancheck import assert_max_shuffles

    out = feature_hash(
        t(spark, "/root/testdata/sf0.001", "orders"),
        "o_orderkey",
        ["o_orderstatus", "o_orderpriority"],
        n_buckets=16,
    )
    out.count()
    assert_max_shuffles(out, 0)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_feature_hash_validation(spark):
    import pytest

    from ghcn_d_etl_project_spark.operators.encoding import feature_hash

    df = spark.createDataFrame([(0, "x")], "id long, a string")
    with pytest.raises(ValueError):
        feature_hash(df, "id", [])
    with pytest.raises(ValueError):
        feature_hash(df, "id", ["a"], n_buckets=0)


# ---------------------------------------------------------------------------
# isotonic_fit (r9)
# ---------------------------------------------------------------------------


def test_pava_hand_case_pools_violators(spark):
    """y = [1, 3, 2, 4]: the (3, 2) violation pools to 2.5; result
    monotone [1, 2.5, 2.5, 4]."""
    from ghcn_d_etl_project_spark.operators.encoding import isotonic_fit

    rows = [("g", 0.0, 1.0), ("g", 1.0, 3.0), ("g", 2.0, 2.0), ("g", 3.0, 4.0)]
    df = spark.createDataFrame(rows, "g string, x double, y double")
    out = {
        r["x"]: r["y_iso"]
        for r in isotonic_fit(df, ["g"], "x", "y").collect()
    }
    assert out == {0.0: 1.0, 1.0: 2.5, 2.0: 2.5, 3.0: 4.0}


def test_pava_monotone_and_mean_preserving_random(spark):
    """Output is monotone non-decreasing and preserves the weighted
    mean (PAVA's defining invariants); already-monotone input is a
    fixed point."""
    import random

    from ghcn_d_etl_project_spark.operators.encoding import isotonic_fit

    rng = random.Random(3)
    rows = [
        ("g", float(i), rng.uniform(0, 10), float(rng.randint(1, 5)))
        for i in range(40)
    ]
    df = spark.createDataFrame(rows, "g string, x double, y double, w double")
    out = sorted(
        (r["x"], r["y_iso"], r["x_weight"])
        for r in isotonic_fit(df, ["g"], "x", "y", weight_col="w").collect()
    )
    ys = [y for _, y, _ in out]
    assert all(b >= a - 1e-12 for a, b in zip(ys, ys[1:]))
    want_mean = sum(y * w for _, _, y, w in rows) / sum(w for *_, w in rows)
    got_mean = sum(y * w for _, y, w in out) / sum(w for _, _, w in out)
    assert abs(got_mean - want_mean) < 1e-6

    mono = [("m", float(i), float(i) * 2.0) for i in range(10)]
    dfm = spark.createDataFrame(mono, "g string, x double, y double")
    fixed = {
        r["x"]: r["y_iso"] for r in isotonic_fit(dfm, ["g"], "x", "y").collect()
    }
    assert fixed == {float(i): float(i) * 2.0 for i in range(10)}


def test_pava_duplicate_x_prepooled_and_partition_invariant(spark):
    import pytest

    from ghcn_d_etl_project_spark.operators.encoding import isotonic_fit

    rows = [("g", 1.0, 0.0), ("g", 1.0, 10.0), ("g", 2.0, 4.0)]
    df = spark.createDataFrame(rows, "g string, x double, y double")
    a = sorted(
        (r["x"], r["y_iso"])
        for r in isotonic_fit(df.coalesce(1), ["g"], "x", "y").collect()
    )
    b = sorted(
        (r["x"], r["y_iso"])
        for r in isotonic_fit(df.repartition(8), ["g"], "x", "y").collect()
    )
    # x=1 pre-pools to mean 5; (5, 4) violates -> pools to 4.666667ish
    # weighted (2*5 + 1*4)/3
    assert a == b
    assert a[0][1] == a[1][1] == pytest.approx(14 / 3, abs=1e-6)


def test_pava_validation(spark):
    import pytest as _p

    from ghcn_d_etl_project_spark.operators.encoding import isotonic_fit

    df = spark.createDataFrame([("g", 1.0, 1.0)], "g string, x double, y double")
    with _p.raises(ValueError):
        isotonic_fit(df, [], "x", "y")


def test_pava_counts_matches_general_form(spark):
    """The exact-integer counts PAVA must agree with the general
    float/weight form on the same rate data (same rationals, different
    arithmetic paths) to well past the 6-digit rounding grain."""
    from ghcn_d_etl_project_spark.operators.encoding import (
        isotonic_fit,
        isotonic_fit_counts,
    )

    rows = [
        ("g", float(x), c, n)
        for x, (c, n) in enumerate(
            [(2, 10), (1, 8), (5, 9), (3, 12), (9, 10), (6, 7), (7, 7)]
        )
    ]
    counts_df = spark.createDataFrame(
        rows, "g string, x double, c long, n long"
    )
    general_df = counts_df.selectExpr(
        "g", "x", "CAST(c AS DOUBLE)/n AS y", "CAST(n AS DOUBLE) AS w"
    )
    a = {
        r["x"]: r["y_iso"]
        for r in isotonic_fit_counts(
            counts_df, ["g"], "x", "c", "n"
        ).collect()
    }
    b = {
        r["x"]: r["y_iso"]
        for r in isotonic_fit(
            general_df, ["g"], "x", "y", weight_col="w"
        ).collect()
    }
    assert set(a) == set(b)
    for x in a:
        assert abs(a[x] - b[x]) < 1e-9, (x, a[x], b[x])


def test_pava_counts_minimax_parity(spark):
    """Counts PAVA equals the min-max theorem's non-sequential form
    computed with exact Fractions — the identity the SQL oracle rides."""
    from fractions import Fraction

    from ghcn_d_etl_project_spark.operators.encoding import isotonic_fit_counts

    cs = [3, 1, 4, 1, 5, 9, 2, 6, 5, 3]
    ns = [7, 5, 8, 6, 9, 11, 5, 8, 7, 6]
    df = spark.createDataFrame(
        [("g", float(i), c, n) for i, (c, n) in enumerate(zip(cs, ns))],
        "g string, x double, c long, n long",
    )
    got = {
        int(r["x"]): r["y_iso"]
        for r in isotonic_fit_counts(df, ["g"], "x", "c", "n").collect()
    }
    m = len(cs)
    pc = [0] * (m + 1)
    pn = [0] * (m + 1)
    for i in range(m):
        pc[i + 1] = pc[i] + cs[i]
        pn[i + 1] = pn[i] + ns[i]
    for i in range(m):
        mm = max(
            min(
                Fraction(pc[t + 1] - pc[s], pn[t + 1] - pn[s])
                for t in range(i, m)
            )
            for s in range(i + 1)
        )
        assert got[i] == round(mm.numerator / mm.denominator, 6)


def test_pava_counts_monotone_and_mean_preserving(spark):
    """Output is monotone non-decreasing in x and preserves the total
    success mass: sum(y_iso * den) == sum(num) exactly in rationals."""
    from ghcn_d_etl_project_spark.operators.encoding import isotonic_fit_counts

    cs = [9, 2, 8, 1, 7, 0, 5]
    ns = [10, 9, 10, 8, 9, 7, 8]
    df = spark.createDataFrame(
        [("g", float(i), c, n) for i, (c, n) in enumerate(zip(cs, ns))],
        "g string, x double, c long, n long",
    )
    rows = sorted(
        isotonic_fit_counts(df, ["g"], "x", "c", "n", round_digits=12).collect(),
        key=lambda r: r["x"],
    )
    ys = [r["y_iso"] for r in rows]
    assert ys == sorted(ys)
    mass = sum(r["y_iso"] * r["x_weight"] for r in rows)
    assert abs(mass - sum(cs)) < 1e-6


def test_pava_counts_validation(spark):
    import pytest as _p

    from ghcn_d_etl_project_spark.operators.encoding import isotonic_fit_counts

    df = spark.createDataFrame([("g", 1.0, 1, 2)], "g string, x double, c long, n long")
    with _p.raises(ValueError):
        isotonic_fit_counts(df, [], "x", "c", "n")
