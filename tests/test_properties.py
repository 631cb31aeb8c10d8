"""Property-based tests (hypothesis) for the text operators: invariants
that must hold on ARBITRARY input, not just the synthetic corpus.

One Spark job per property (the whole example batch evaluates in a
single createDataFrame+collect) so hypothesis's many examples don't
multiply Spark job latency.
"""

from __future__ import annotations

import re

from hypothesis import given, settings, strategies as st
from pyspark.sql import functions as F

from ghcn_d_etl_project_spark.operators.contamination import word_ngrams
from ghcn_d_etl_project_spark.operators.textops import PII_PATTERNS, pii_redact, tokens

TEXT = st.text(
    alphabet=st.characters(codec="ascii", exclude_categories=("Cs", "Cc")),
    max_size=120,
)


def _eval_batch(spark, texts: list[str], col):
    df = spark.createDataFrame([(i, s) for i, s in enumerate(texts)], "i long, s string")
    return [r.v for r in df.select(col.alias("v")).orderBy("i").collect()]


@settings(max_examples=30, deadline=None)
@given(st.lists(TEXT, min_size=1, max_size=8))
def test_pii_redact_idempotent_and_clean(spark, texts):
    """Redaction is idempotent (tokens never re-match) and output never
    contains a raw PII shape."""
    once = _eval_batch(spark, texts, pii_redact("s"))
    twice = _eval_batch(spark, once, pii_redact("s"))
    assert once == twice
    pats = [re.compile(p) for p, _ in PII_PATTERNS]
    for s in once:
        for pat in pats:
            assert not pat.search(s)


@settings(max_examples=30, deadline=None)
@given(st.lists(TEXT, min_size=1, max_size=8), st.integers(min_value=2, max_value=5))
def test_word_ngrams_counts(spark, texts, n):
    """Non-distinct n-gram count is exactly max(tokens - n + 1, 0), and
    every n-gram has exactly n tokens."""
    grams = _eval_batch(spark, texts, word_ngrams("s", n, distinct=False))
    toks = _eval_batch(spark, texts, tokens("s"))
    for g, t in zip(grams, toks):
        assert len(g) == max(len(t) - n + 1, 0)
        for gram in g:
            assert len(gram.split(" ")) == n


@settings(max_examples=30, deadline=None)
@given(st.lists(TEXT, min_size=1, max_size=8))
def test_token_reconstruction(spark, texts):
    """tokens() splits on whitespace with no empty tokens — joining back
    equals Python's canonical split."""
    toks = _eval_batch(spark, texts, tokens("s"))
    for spark_toks, s in zip(toks, texts):
        assert spark_toks == s.split()


@settings(max_examples=30, deadline=None)
@given(st.lists(TEXT, min_size=1, max_size=8), st.integers(min_value=2, max_value=5))
def test_shingles_short_text_empty(spark, texts, n):
    """Shingle families return EMPTY (never crash, never emit truncated
    shingles) below the window size, and every shingle has exactly the
    window size."""
    from ghcn_d_etl_project_spark.operators.textops import char_shingles, word_shingles

    chars = _eval_batch(spark, texts, char_shingles("s", n=n))
    toks = _eval_batch(spark, texts, tokens("s"))
    words = _eval_batch(spark, texts, word_shingles("s", k=n))
    for sh, s in zip(chars, texts):
        if len(s.lower()) < n:
            assert sh == []
        for g in sh:
            assert len(g) == n
    for sh, t in zip(words, toks):
        if len(t) < n:
            assert sh == []
        for g in sh:
            assert len(g.split(" ")) == n


@settings(max_examples=20, deadline=None)
@given(
    st.lists(
        st.tuples(st.integers(0, 30), st.floats(-100, 100, allow_nan=False)),
        max_size=12,
        unique_by=lambda t: t[0],
    ),
    st.lists(
        st.tuples(
            st.integers(0, 30),
            st.floats(-100, 100, allow_nan=False),
            st.booleans(),
        ),
        max_size=12,
        unique_by=lambda t: t[0],
    ),
)
def test_merge_upsert_conservation(spark, target_rows, source_rows):
    """MERGE row-count law on arbitrary keyed inputs: |out| = |target|
    - matched_deletes + unmatched_nondelete_inserts; updated rows take
    the source value, carried rows keep the target's."""
    from ghcn_d_etl_project_spark.operators.cdc import merge_upsert

    t_df = spark.createDataFrame(target_rows or [(999, 0.0)], "k long, v double")
    s_df = spark.createDataFrame(
        source_rows or [(998, 0.0, False)], "k long, nv double, del boolean"
    )
    t_keys = {r[0] for r in (target_rows or [(999, 0.0)])}
    src = {r[0]: (r[1], r[2]) for r in (source_rows or [(998, 0.0, False)])}
    out = merge_upsert(
        t_df, s_df, key="k", set_cols={"v": "nv"}, delete_col="del"
    ).collect()
    expected_n = (
        len(t_keys)
        - sum(1 for k, (_, d) in src.items() if d and k in t_keys)
        + sum(1 for k, (_, d) in src.items() if not d and k not in t_keys)
    )
    assert len(out) == expected_n
    got = {r.k: r.v for r in out}
    for k, (nv, d) in src.items():
        if d:
            assert k not in got
        else:
            assert got[k] == nv
    for r in target_rows or [(999, 0.0)]:
        if r[0] not in src:
            assert got[r[0]] == r[1]


@settings(max_examples=15, deadline=None)
@given(
    st.lists(
        st.tuples(
            st.integers(1, 3),                      # user
            st.integers(0, 10_000),                 # offset seconds
        ),
        min_size=1,
        max_size=25,
    ),
    st.integers(60, 3600),                          # gap seconds
)
def test_sessionize_invariants(spark, events, gap):
    """Sessionization laws on arbitrary event streams: session numbers
    per user are 1..k contiguous; within a session every consecutive
    gap is <= threshold; across a session boundary the gap is >
    threshold; event order within a user is preserved."""
    import datetime as dt

    from ghcn_d_etl_project_spark.operators.sessions import sessionize

    base = dt.datetime(2024, 1, 1)
    rows = [
        (u, base + dt.timedelta(seconds=off), i)
        for i, (u, off) in enumerate(events)
    ]
    df = spark.createDataFrame(rows, "user_id long, ts timestamp, event_id long")
    out = sessionize(df, "user_id", "ts", gap_seconds=gap, order_cols=("event_id",))
    by_user: dict[int, list] = {}
    for r in out.collect():
        by_user.setdefault(r.user_id, []).append(r)
    for u, rs in by_user.items():
        rs.sort(key=lambda r: (r.ts, r.event_id))
        seqs = [r.session_seq for r in rs]
        assert seqs[0] == 1
        assert all(b - a in (0, 1) for a, b in zip(seqs, seqs[1:]))  # contiguous
        for a, b in zip(rs, rs[1:]):
            delta = (b.ts - a.ts).total_seconds()
            if b.session_seq == a.session_seq:
                assert delta <= gap, (u, a.event_id, b.event_id, delta, gap)
            else:
                assert delta > gap, (u, a.event_id, b.event_id, delta, gap)


@settings(max_examples=15, deadline=None)
@given(
    st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=30),                 # key
            st.one_of(st.none(), st.sampled_from(["a", "b", "c"])),  # name
            st.one_of(
                st.none(),
                st.floats(min_value=-100, max_value=100,
                          allow_nan=False, allow_infinity=False),
            ),                                                       # bal
        ),
        max_size=40,
        unique_by=lambda r: r[0],
    ),
    st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=30),
            st.one_of(st.none(), st.sampled_from(["a", "b", "c"])),
            st.one_of(
                st.none(),
                st.floats(min_value=-100, max_value=100,
                          allow_nan=False, allow_infinity=False),
            ),
        ),
        max_size=40,
        unique_by=lambda r: r[0],
    ),
)
def test_snapshot_diff_round_trip_law(spark, old_rows, new_rows):
    """merge_upsert(old, snapshot_diff(old, new)) == new, for ARBITRARY
    snapshot pairs (overlapping/disjoint keys, NULL attributes, empty
    sides) — the law that makes diff the true inverse of merge."""
    from ghcn_d_etl_project_spark.operators.cdc import merge_upsert, snapshot_diff

    schema = "k long, name string, bal double"
    old = spark.createDataFrame(old_rows, schema)
    new = spark.createDataFrame(new_rows, schema)
    diff = snapshot_diff(old, new, "k").withColumn(
        "is_delete", F.col("op") == "D"
    )
    applied = merge_upsert(
        old, diff, key="k",
        set_cols={"name": "name", "bal": "bal"},
        delete_col="is_delete",
    )
    key = lambda r: (r.k, repr(r.name), repr(r.bal))
    assert sorted(map(key, applied.collect())) == sorted(
        map(key, new.collect())
    )


@settings(max_examples=15, deadline=None)
@given(
    st.lists(
        st.tuples(
            st.sampled_from(["g1", "g2"]),
            st.floats(min_value=-50, max_value=150,  # incl. out-of-domain
                      allow_nan=False, allow_infinity=False),
        ),
        min_size=1,
        max_size=60,
    ),
    st.integers(min_value=2, max_value=4),  # number of batches
)
def test_quantile_partials_merge_law(spark, rows, n_batches):
    """Histogram-sketch partials: splitting ARBITRARY data (including
    out-of-domain values that clamp into edge bins) into any number of
    batches and merging must be bit-identical to one-shot sketching."""
    from ghcn_d_etl_project_spark.operators.incremental import (
        finalize_quantiles,
        merge_quantile_partials,
        quantile_partial,
    )

    df = spark.createDataFrame(
        [(g, v, i) for i, (g, v) in enumerate(rows)],
        "g string, v double, i long",
    )
    args = (["g"], "v", 0.0, 100.0, 10)
    batches = [df.filter(F.col("i") % n_batches == b) for b in range(n_batches)]
    one = finalize_quantiles(
        merge_quantile_partials([quantile_partial(df, *args)], ["g"]),
        ["g"], 0.0, 100.0, 10, qs=(0.5, 0.9),
    )
    many = finalize_quantiles(
        merge_quantile_partials(
            [quantile_partial(b, *args) for b in batches], ["g"]
        ),
        ["g"], 0.0, 100.0, 10, qs=(0.5, 0.9),
    )
    key = lambda r: (r.g, r.q, repr(r.est))
    assert sorted(map(key, one.collect())) == sorted(map(key, many.collect()))


@settings(max_examples=12, deadline=None)
@given(
    st.lists(  # history: (key, attr, closed?) — one current row per key
        st.tuples(
            st.integers(min_value=0, max_value=12),
            st.one_of(st.none(), st.sampled_from(["x", "y"])),
            st.booleans(),
        ),
        max_size=20,
        unique_by=lambda r: r[0],
    ),
    st.lists(  # changes: (key, new_attr) — one change per key
        st.tuples(
            st.integers(min_value=0, max_value=12),
            st.one_of(st.none(), st.sampled_from(["x", "y", "z"])),
        ),
        max_size=15,
        unique_by=lambda r: r[0],
    ),
    st.sampled_from(["shuffle", "broadcast"]),
)
def test_scd2_invariants(spark, hist_rows, change_rows, strategy):
    """SCD2 laws on arbitrary inputs, both physical strategies: (1) at
    most one current row per key, and exactly one for every key that was
    current or changed; (2) pre-existing closed rows pass through
    untouched; (3) every newly-closed row's valid_to equals the change's
    eff_ts; (4) row count grows by exactly the number of real changes."""
    import datetime as dt

    from ghcn_d_etl_project_spark.operators.cdc import scd2_apply

    t0, t_closed, t_eff = (
        dt.datetime(2024, 1, 1),
        dt.datetime(2024, 1, 5),
        dt.datetime(2024, 2, 1),
    )
    hist = spark.createDataFrame(
        [
            (k, a, t0, t_closed if closed else None)
            for k, a, closed in hist_rows
        ],
        "k long, attr string, valid_from timestamp, valid_to timestamp",
    )
    changes = spark.createDataFrame(
        [(k, a, t_eff) for k, a in change_rows],
        "k long, attr string, eff_ts timestamp",
    )
    out = scd2_apply(
        hist, changes, key="k", attrs=["attr"], strategy=strategy
    ).collect()

    current = {}
    for r in out:
        if r.valid_to is None:
            assert r.k not in current, f"two current rows for key {r.k}"
            current[r.k] = r.attr

    prev_current = {k: a for k, a, closed in hist_rows if not closed}
    changed = dict(change_rows)
    # (1) exactly the expected keys are current, with the latest value
    expect_current = dict(prev_current)
    expect_current.update(changed)
    assert current == expect_current

    # (2) pre-existing closed rows untouched
    closed_in = sorted(
        (k, a) for k, a, closed in hist_rows if closed
    )
    closed_out = sorted(
        (r.k, r.attr) for r in out if r.valid_to == t_closed
    )
    assert closed_in == closed_out

    # (3)+(4): each REAL change (differs null-safely, or new key) closes
    # at eff and adds exactly one row
    real = {
        k for k, a in changed.items()
        if k not in prev_current or prev_current[k] != a
    }
    newly_closed = {r.k for r in out if r.valid_to == t_eff}
    assert newly_closed == {k for k in real if k in prev_current}
    assert len(out) == len(hist_rows) + len(real)


@settings(max_examples=25, deadline=None)
@given(
    st.dictionaries(
        st.integers(0, 3),  # key
        st.dictionaries(
            st.integers(0, 40),  # day offset
            st.floats(-1e6, 1e6, allow_nan=False, width=32),
            min_size=1,
            max_size=10,
        ),
        min_size=1,
        max_size=4,
    )
)
def test_gap_fill_laws(spark, series):
    """Gap-fill laws on arbitrary per-key daily series:
    (1) grid size == sum over keys of (span + 1);
    (2) filtering is_gap == 0 round-trips to exactly the input rows
        (densification is lossless — the inverse law);
    (3) v_ffill equals the value at the most recent observed day <= the
        grid day (the forward-fill definition, checked independently);
    (4) days_since_obs counts the distance to that observation."""
    import datetime as dt

    from ghcn_d_etl_project_spark.operators.timeseries import gap_fill_ffill

    base = dt.date(2024, 1, 1)
    rows = [
        (k, base + dt.timedelta(days=d), v)
        for k, obs in series.items()
        for d, v in obs.items()
    ]
    df = spark.createDataFrame(rows, "k long, day date, v double")
    out = gap_fill_ffill(df, ["k"], "day", ["v"]).collect()

    spans = {
        k: (min(obs), max(obs)) for k, obs in series.items()
    }
    assert len(out) == sum(d1 - d0 + 1 for d0, d1 in spans.values())

    observed = {(r.k, r.day): r.v for r in out if r.is_gap == 0}
    assert observed == {(k, d): v for (k, d, v) in rows}

    for r in out:
        obs_days = sorted(series[r.k])
        day_off = (r.day - base).days
        prev = max(d for d in obs_days if d <= day_off)
        assert r.v_ffill == series[r.k][prev]
        assert r.days_since_obs == day_off - prev
        assert (r.v is None) == (r.is_gap == 1)


@settings(max_examples=25, deadline=None)
@given(
    st.dictionaries(
        st.integers(0, 30),
        st.floats(-1e3, 1e3, allow_nan=False, width=16),
        min_size=1,
        max_size=8,
    )
)
def test_interpolate_linear_laws(spark, obs):
    """Linear interpolation laws: observed days exact; synthesized days
    lie on the segment between their neighbors (checked against a
    python reference); the final observation has no synthetic tail."""
    import datetime as dt

    from ghcn_d_etl_project_spark.operators.timeseries import (
        interpolate_linear,
    )

    base = dt.date(2024, 1, 1)
    rows = [(1, base + dt.timedelta(days=d), v) for d, v in obs.items()]
    df = spark.createDataFrame(rows, "k long, day date, v double")
    out = {(r.day - base).days: r for r in interpolate_linear(df, ["k"], "day", "v").collect()}

    days = sorted(obs)
    assert max(out) == days[-1]  # nothing synthesized past the last obs
    for d, r in out.items():
        if r.is_gap == 0:
            assert d in obs and r.v_interp == obs[d]
        else:
            d0 = max(x for x in days if x < d)
            d1 = min(x for x in days if x > d)
            expect = obs[d0] + (obs[d1] - obs[d0]) * (d - d0) / (d1 - d0)
            assert abs(r.v_interp - expect) < 1e-9


# ---------------------------------------------------------------------------
# Interval-union laws (operators/timeseries.py:merge_intervals)
# ---------------------------------------------------------------------------


@settings(max_examples=15, deadline=None)
@given(
    st.lists(
        st.tuples(
            st.integers(1, 3),        # key
            st.integers(0, 500),      # start offset (seconds)
            st.integers(0, 120),      # duration (seconds, 0 = point)
        ),
        min_size=1,
        max_size=25,
    )
)
def test_merge_intervals_laws(spark, intervals):
    """Interval-union laws on arbitrary interval sets: output islands
    per key are pairwise disjoint AND non-touching (else they'd have
    merged); every input interval is contained in exactly one island;
    n_source sums to the input count; the union of covered time is
    preserved exactly (an island's span equals the union of its source
    intervals, so total covered seconds match a brute-force sweep)."""
    import datetime as dt

    from ghcn_d_etl_project_spark.operators.timeseries import merge_intervals

    base = dt.datetime(2024, 1, 1)
    rows = [
        (k, base + dt.timedelta(seconds=s), base + dt.timedelta(seconds=s + d))
        for (k, s, d) in intervals
    ]
    df = spark.createDataFrame(rows, "k long, s timestamp, e timestamp")
    out = merge_intervals(df, ["k"], "s", "e").collect()

    by_key: dict[int, list] = {}
    for r in out:
        by_key.setdefault(r.k, []).append(r)
    total_source = 0
    for k, islands in by_key.items():
        islands.sort(key=lambda r: r.s)
        # disjoint and non-touching
        for a, b in zip(islands, islands[1:]):
            assert a.e < b.s, (k, a, b)
        # containment: every input interval inside exactly one island
        inputs = [
            (base + dt.timedelta(seconds=s), base + dt.timedelta(seconds=s + d))
            for (kk, s, d) in intervals
            if kk == k
        ]
        for s, e in inputs:
            homes = [i for i in islands if i.s <= s and e <= i.e]
            assert len(homes) == 1, (k, s, e, islands)
        total_source += sum(i.n_source for i in islands)
        # exact coverage: brute-force union sweep per key
        pts = sorted(set(inputs))
        covered = 0.0
        cur_s, cur_e = None, None
        for s, e in pts:
            if cur_e is None or s > cur_e:
                if cur_e is not None:
                    covered += (cur_e - cur_s).total_seconds()
                cur_s, cur_e = s, e
            else:
                cur_e = max(cur_e, e)
        if cur_e is not None:
            covered += (cur_e - cur_s).total_seconds()
        got = sum((i.e - i.s).total_seconds() for i in islands)
        assert abs(got - covered) < 1e-9, (k, got, covered)
    assert total_source == len(intervals)


# ---------------------------------------------------------------------------
# Funnel laws (operators/funnel.py)
# ---------------------------------------------------------------------------


@settings(max_examples=15, deadline=None)
@given(
    st.lists(
        st.tuples(
            st.integers(1, 4),        # user
            st.integers(0, 1000),     # ts offset seconds
            st.sampled_from(["a", "b", "c", "x"]),  # event type
        ),
        min_size=1,
        max_size=30,
    )
)
def test_funnel_laws(spark, events):
    """Funnel laws on arbitrary event streams: step counts are monotone
    non-increasing; per-user completion times are strictly increasing
    where present; a NULL at step i forces NULL at every later step;
    and each user's counted times exist as real events of the right
    type (greedy-earliest: t1 is the user's true earliest step-1
    event)."""
    import datetime as dt

    from ghcn_d_etl_project_spark.operators.funnel import funnel_steps

    base = dt.datetime(2024, 1, 1)
    rows = [
        (u, base + dt.timedelta(seconds=off), typ)
        for (u, off, typ) in events
    ]
    df = spark.createDataFrame(rows, "user_id long, ts timestamp, event_type string")
    steps = ["a", "b", "c"]
    out = funnel_steps(df, steps).collect()

    counts = [sum(1 for r in out if r[f"t{i}"] is not None) for i in (1, 2, 3)]
    assert counts[0] >= counts[1] >= counts[2]
    per_user_events: dict[int, list] = {}
    for (u, off, typ) in events:
        per_user_events.setdefault(u, []).append(
            (base + dt.timedelta(seconds=off), typ)
        )
    for r in out:
        ts_chain = [r.t1, r.t2, r.t3]
        # NULL prefix law + strict increase
        seen_null = False
        prev = None
        for v in ts_chain:
            if v is None:
                seen_null = True
            else:
                assert not seen_null, r  # no value after a NULL
                if prev is not None:
                    assert v > prev, r
                prev = v
        # t1 is the true earliest step-1 event for the user
        firsts = [t for (t, typ) in per_user_events[r.user_id] if typ == "a"]
        if firsts:
            assert r.t1 == min(firsts), r
        else:
            assert r.t1 is None
        # counted times are real events of the right type
        for v, typ in zip(ts_chain, steps):
            if v is not None:
                assert (v, typ) in per_user_events[r.user_id], r


# ---------------------------------------------------------------------------
# CUSUM closed form == textbook recursion (the identity the operator
# rests on: S+_i = P_i - min(0, min_{j<=i} P_j), and symmetrically S-)
# ---------------------------------------------------------------------------


@settings(max_examples=25, deadline=None)
@given(
    st.lists(
        st.integers(min_value=-1000, max_value=1000), min_size=1, max_size=40
    ),
    st.integers(min_value=-100, max_value=100),
    st.integers(min_value=0, max_value=50),
)
def test_cusum_closed_form_law(spark, xs, target, slack):
    """On arbitrary integer series the window closed form must equal the
    sequential recursion exactly (integer arithmetic — no tolerance)."""
    from ghcn_d_etl_project_spark.operators.timeseries import cusum

    df = spark.createDataFrame(
        [(i, x) for i, x in enumerate(xs)], "i int, v long"
    )
    got = {
        r.i: (r.cusum_pos, r.cusum_neg)
        for r in cusum(df, "i", "v", target=target, slack=slack).collect()
    }
    sp = sn = 0
    for i, x in enumerate(xs):
        sp = max(0, sp + (x - target - slack))
        sn = max(0, sn + (target - x - slack))
        assert got[i] == (sp, sn), (i, got[i], (sp, sn))


# ---------------------------------------------------------------------------
# weighted_median laws (r9)
# ---------------------------------------------------------------------------


@settings(max_examples=15, deadline=None)
@given(
    st.lists(
        st.tuples(
            st.floats(min_value=-1000, max_value=1000, allow_nan=False).map(
                lambda x: round(x, 2)
            ),
            st.integers(min_value=1, max_value=20),
        ),
        min_size=1,
        max_size=30,
    )
)
def test_weighted_median_laws(spark, pairs):
    """(1) matches the python crossing-point reference; (2) weight
    SCALING invariance (all weights x3 leaves the median unchanged);
    (3) the median is always an observed value."""
    from ghcn_d_etl_project_spark.operators.quality import weighted_median

    rows = [("g", v, float(w)) for v, w in pairs]
    df = spark.createDataFrame(rows, "g string, v double, w double")
    got = weighted_median(df, ["g"], "v", "w").collect()[0]["weighted_median"]

    agg: dict[float, float] = {}
    for _, v, w in rows:
        agg[v] = agg.get(v, 0.0) + w
    tot = sum(agg.values())
    cw = 0.0
    want = None
    for v in sorted(agg):
        cw += agg[v]
        if 2 * cw >= tot:
            want = v
            break
    assert got == want
    assert got in {v for _, v, _ in rows}

    scaled = spark.createDataFrame(
        [("g", v, w * 3.0) for _, v, w in rows], "g string, v double, w double"
    )
    got3 = weighted_median(scaled, ["g"], "v", "w").collect()[0]["weighted_median"]
    assert got3 == got


# ---------------------------------------------------------------------------
# running_count_distinct laws (r9)
# ---------------------------------------------------------------------------


@settings(max_examples=15, deadline=None)
@given(
    st.lists(
        st.sampled_from(["a", "b", "c", "d", None]), min_size=1, max_size=25
    )
)
def test_running_count_distinct_laws(spark, values):
    """Monotone non-decreasing per key; final value == exact distinct
    count of non-NULL values; each step increases by at most 1."""
    from ghcn_d_etl_project_spark.operators.windows import (
        running_count_distinct,
    )

    rows = [("k", i, v) for i, v in enumerate(values)]
    df = spark.createDataFrame(rows, "k string, seq int, v string")
    out = sorted(
        (r["seq"], r["n_distinct_so_far"])
        for r in running_count_distinct(df, ["k"], ["seq"], "v").collect()
    )
    seq = [n for _, n in out]
    assert all(b - a in (0, 1) for a, b in zip(seq, seq[1:]))
    assert seq[-1] == len({v for v in values if v is not None})


# ---------------------------------------------------------------------------
# cms laws (r9)
# ---------------------------------------------------------------------------


@settings(max_examples=15, deadline=None)
@given(
    st.lists(st.sampled_from("abcdef"), min_size=1, max_size=40),
    st.integers(min_value=2, max_value=16),
)
def test_cms_one_sided_error_law(spark, values, width):
    """CMS estimates NEVER undercount, at any width."""
    from collections import Counter

    from ghcn_d_etl_project_spark.operators.incremental import (
        cms_estimate,
        cms_sketch,
    )

    df = spark.createDataFrame([(v,) for v in values], "v string")
    cand = df.distinct()
    exact = Counter(values)
    est = cms_estimate(
        cms_sketch(df, "v", width=width, depth=2), cand, "v",
        width=width, depth=2,
    )
    for r in est.collect():
        assert r["est"] >= exact[r["v"]]


@settings(max_examples=15, deadline=None)
@given(
    groups=st.dictionaries(
        st.sampled_from(["a", "b", "c"]),
        st.lists(st.integers(min_value=-1000, max_value=1000),
                 min_size=1, max_size=12),
        min_size=1,
        max_size=3,
    )
)
def test_quantile_normalize_law(spark, groups):
    """For ARBITRARY grouped integer data: each row's qnorm equals the
    pooled order statistic at index ceil(r*N/ng) — computed by an
    independent python reference — and within-group order is
    preserved."""
    from ghcn_d_etl_project_spark.operators.encoding import quantile_normalize

    rows = []
    rid = 0
    for g, vals in groups.items():
        for v in vals:
            rows.append((rid, v, g))
            rid += 1
    df = spark.createDataFrame(rows, "id long, v long, g string")
    got = {r.id: r.qnorm for r in quantile_normalize(df, "id", "v", "g").collect()}

    pooled = sorted(v for _, v, _ in rows)
    n = len(pooled)
    for g in groups:
        sub = sorted(((v, i) for i, v, gg in rows if gg == g))
        ng = len(sub)
        for r0, (v, i) in enumerate(sub, start=1):
            idx = -(-r0 * n // ng)  # ceil
            assert got[i] == pooled[idx - 1], (g, i, v, got[i], pooled[idx - 1])


@settings(max_examples=15, deadline=None)
@given(
    sizes=st.lists(st.integers(min_value=1, max_value=25), min_size=1, max_size=3),
    k=st.integers(min_value=1, max_value=8),
)
def test_curriculum_bucket_law(spark, sizes, k):
    """For arbitrary group sizes and bucket counts: buckets lie in
    [0, k), are monotone in within-group rank, and per-group depths
    differ by at most 1 whenever k <= group size."""
    from ghcn_d_etl_project_spark.operators.encoding import curriculum_buckets

    rows = []
    rid = 0
    for gi, ngroup in enumerate(sizes):
        for j in range(ngroup):
            rows.append((rid, (rid * 7919) % 503, f"g{gi}"))
            rid += 1
    df = spark.createDataFrame(rows, "id long, d long, g string")
    out = curriculum_buckets(df, "id", "d", "g", n_buckets=k).collect()
    per_group: dict[str, list] = {}
    for r in out:
        assert 0 <= r.bucket < k
        per_group.setdefault(r.group, []).append((r.within_rank, r.bucket))
    for g, pairs in per_group.items():
        pairs.sort()
        buckets = [b for _, b in pairs]
        assert buckets == sorted(buckets)
        if k <= len(pairs):
            depth: dict[int, int] = {}
            for b in buckets:
                depth[b] = depth.get(b, 0) + 1
            assert max(depth.values()) - min(depth.values()) <= 1


@settings(max_examples=10, deadline=None)
@given(
    st.lists(
        st.lists(st.sampled_from(["a", "b", "c", "d"]), min_size=2, max_size=8),
        min_size=1,
        max_size=5,
    )
)
def test_cross_surprisal_self_training_law(spark, docs):
    """Scoring the training corpus under ITSELF degenerates the
    cross-corpus scorer to the self-trained one: every scored bigram
    exists in the model, so both OOV counters are zero and
    (n_bigrams, avg_logp, ppl) equal word_bigram_surprisal's on every
    document — the backoff ladder must be a pure extension, never a
    perturbation of the in-model branch."""
    from ghcn_d_etl_project_spark.operators.textops import (
        word_bigram_cross_surprisal,
        word_bigram_surprisal,
    )

    rows = [(i, " ".join(words)) for i, words in enumerate(docs)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    cross = {
        r.doc_id: r
        for r in word_bigram_cross_surprisal(df, df).collect()
    }
    self_t = {r.doc_id: r for r in word_bigram_surprisal(df).collect()}
    assert set(cross) == set(self_t)
    for k, c in cross.items():
        s = self_t[k]
        assert (c.n_oov_pairs, c.n_oov_contexts) == (0, 0)
        assert (c.n_bigrams, c.avg_logp, c.ppl) == (
            s.n_bigrams,
            s.avg_logp,
            s.ppl,
        )


@settings(max_examples=10, deadline=None)
@given(
    st.lists(
        st.tuples(
            st.booleans(),
            st.lists(
                st.floats(
                    min_value=-4, max_value=4,
                    allow_nan=False, allow_infinity=False,
                ),
                min_size=4,
                max_size=4,
            ),
        ),
        min_size=2,
        max_size=8,
    ).filter(
        lambda rows: any(s for s, _ in rows)
        and any(not s for s, _ in rows)
        and any(any(v != 0 for v in vec) for s, vec in rows if s)
        and any(any(v != 0 for v in vec) for s, vec in rows if not s)
    )
)
def test_embedding_split_drift_laws(spark, rows):
    """Two exact-arithmetic laws of the drift readout: (1) duplicating
    every row leaves all five outputs BIT-identical (integer sums scale
    by exactly 2, the power-of-two factors cancel in IEEE division);
    (2) swapping which side is 'new' swaps the counts and sqnorms and
    leaves centroid_cos bit-identical (the dot is symmetric)."""
    from pyspark.sql import functions as F

    from ghcn_d_etl_project_spark.operators.clustering import (
        embedding_split_drift,
    )

    data = [(i, 7 if s else 0, vec) for i, (s, vec) in enumerate(rows)]
    df = spark.createDataFrame(
        data, "rid long, tag long, v array<double>"
    )
    base = embedding_split_drift(
        df, F.col("tag") == 7, "v", dim=4
    ).first()
    doubled = df.unionByName(
        df.withColumn("rid", F.col("rid") + 1000)
    )
    dbl = embedding_split_drift(
        doubled, F.col("tag") == 7, "v", dim=4
    ).first()
    def eq(a, b):
        # a degenerate split (quantized sums cancel to the zero
        # vector) yields NULL/NaN cos in BOTH runs — still law-equal
        if a is None or b is None:
            return a is None and b is None
        return a == b or (a != a and b != b)

    assert (dbl.n_ref, dbl.n_new) == (2 * base.n_ref, 2 * base.n_new)
    assert eq(dbl.centroid_cos, base.centroid_cos)
    assert dbl.mean_sqnorm_ref == base.mean_sqnorm_ref
    assert dbl.mean_sqnorm_new == base.mean_sqnorm_new
    swapped = embedding_split_drift(
        df, F.col("tag") != 7, "v", dim=4
    ).first()
    assert (swapped.n_ref, swapped.n_new) == (base.n_new, base.n_ref)
    assert swapped.mean_sqnorm_ref == base.mean_sqnorm_new
    assert swapped.mean_sqnorm_new == base.mean_sqnorm_ref
    assert eq(swapped.centroid_cos, base.centroid_cos)


@settings(max_examples=8, deadline=None)
@given(
    st.lists(
        st.lists(st.sampled_from(list("abcdef")), min_size=6, max_size=14)
        .map(lambda cs: "".join(cs)),
        min_size=3,
        max_size=8,
        unique=True,
    )
)
def test_banded_incremental_dedup_soundness_law(spark, texts):
    """Soundness of the banded near arm on ARBITRARY corpora: banding
    only shrinks the candidate pair set, and the exact verify runs on
    identical hashed shingle sets — so for every new doc, (1) an
    exact_dup verdict is identical between arms, (2) a banded near_dup
    implies the exact arm also says near_dup with jaccard >= the
    banded one (argmax over a superset), (3) a banded clean is never
    an exact exact_dup (the fingerprint arm is shared verbatim).
    Recall misses (banded clean where exact found a near pair) are
    ALLOWED — that's the documented (1-j^2)^32 bound, deterministic
    per text under seeded hashing."""
    from ghcn_d_etl_project_spark.operators.dedup import (
        dedup_against_reference,
    )

    n = len(texts)
    ref = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts[: max(n // 2, 1)])],
        "id long, txt string",
    )
    new = spark.createDataFrame(
        [(100 + i, t) for i, t in enumerate(texts[n // 3:])],
        "id long, txt string",
    )
    rel: list = []
    banded = {
        r.doc_id: r
        for r in dedup_against_reference(
            new, ref, "id", "txt", banded=True, release_into=rel
        ).collect()
    }
    exact = {
        r.doc_id: r
        for r in dedup_against_reference(
            new, ref, "id", "txt", banded=False
        ).collect()
    }
    for f in rel:
        f.unpersist()
    assert set(banded) == set(exact)
    for k, b in banded.items():
        e = exact[k]
        if b.verdict == "exact_dup" or e.verdict == "exact_dup":
            assert (b.verdict, b.dup_of) == (e.verdict, e.dup_of)
        elif b.verdict == "near_dup":
            assert e.verdict == "near_dup"
            assert e.jaccard >= b.jaccard


@settings(max_examples=10, deadline=None)
@given(
    st.lists(
        st.lists(
            st.integers(min_value=0, max_value=30).map(lambda i: f"t{i}"),
            min_size=0,
            max_size=25,
        ).map(" ".join),
        min_size=1,
        max_size=6,
    ),
    st.integers(min_value=1, max_value=3),  # k
    st.integers(min_value=1, max_value=4),  # w
)
def test_winnowing_selection_laws(spark, texts, k, w):
    """Winnowing laws on ARBITRARY token streams (Schleimer et al. §2):
    (1) soundness — every selected fingerprint is the hash of one of
    the doc's own k-grams; (2) coverage/guarantee — every window of w
    consecutive grams contains a gram whose hash is in the selected
    set (this is what makes any >= w+k-1 token overlap detectable);
    (3) density — between 1 and n_windows fingerprints whenever a full
    window exists, and none otherwise."""
    import hashlib

    from ghcn_d_etl_project_spark.operators.dedup import winnow_fingerprints

    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )
    got: dict[int, set] = {i: set() for i in range(len(texts))}
    for r in winnow_fingerprints(df, "doc_id", "text", k=k, w=w).collect():
        got[r["doc"]].add(r["fp"])
    for i, t in enumerate(texts):
        toks = t.lower().split()
        grams = [
            " ".join(toks[j : j + k]) for j in range(len(toks) - k + 1)
        ]
        hs = [
            int(hashlib.md5(g.encode()).hexdigest()[:8], 16) for g in grams
        ]
        n_windows = max(len(hs) - w + 1, 0)
        if n_windows == 0:
            assert got[i] == set()
            continue
        # soundness
        assert got[i] <= set(hs)
        # guarantee: every full window's min is selected
        wants = {min(hs[j : j + w]) for j in range(n_windows)}
        assert got[i] == wants
        assert 1 <= len(got[i]) <= n_windows


@settings(max_examples=10, deadline=None)
@given(
    st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=10_000),  # doc id
            st.integers(min_value=1, max_value=400),  # n_tokens
            st.integers(min_value=0, max_value=1_000_000),  # quality e6
        ),
        min_size=1,
        max_size=12,
        unique_by=lambda t: t[0],
    ),
    st.integers(min_value=1, max_value=2000),
)
def test_budget_fill_prefix_closure_law(spark, rows, budget):
    """Greedy budget fill on ARBITRARY (quality, size) corpora: the
    selected set equals the exact python replay of take-in-(quality
    DESC, id)-order-while-cum<=budget — prefix-closed, budget-
    respecting, and independent of partitioning (global_cumsum's
    bucketed prefix is exact, not approximate)."""
    from ghcn_d_etl_project_spark.operators.prefix import global_cumsum

    df = spark.createDataFrame(
        rows, "doc_id long, n_tokens long, q_e6 long"
    ).repartition(5)
    keyed = df.select(
        "doc_id",
        "n_tokens",
        (
            -F.col("q_e6") * F.lit(100_000).cast("long") + F.col("doc_id")
        ).alias("k"),
    )
    cum = global_cumsum(
        keyed, "k", "n_tokens", out_col="cum", bucket_width=1e9
    )
    got = {
        r["doc_id"]
        for r in cum.filter(F.col("cum") <= budget).collect()
    }
    want = set()
    tot = 0
    for did, n, _q in sorted(rows, key=lambda t: (-t[2], t[0])):
        tot += n
        if tot <= budget:
            want.add(did)
        else:
            break
    assert got == want
