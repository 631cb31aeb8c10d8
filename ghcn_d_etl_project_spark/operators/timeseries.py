"""Time-series densification: date spines, gap fill, interpolation.

The reference's daily climate series carry implicit gaps — station-days
with no observation simply do not exist as rows, and its rolling ROWS
frames silently treat a 7-row window as "7 days" regardless of missing
dates (``src/transform/gold_processor.py:195-199``; SURVEY.md §2.6 notes
the RANGE-frame correction this engine already ships). Densification is
the other half of that correction: materialize the missing grid rows so
downstream ROWS frames, lag features, and ML feature matrices see a
complete calendar. The same operator family is what a training-data
pipeline uses to regularize event series before windowed feature
extraction.

Scale design — the join-free construction:

The textbook gap fill is spine -> left join -> IGNORE NULLS window
(three shuffles: span aggregate, (key, date) join, key window). This
module instead uses lead-explode: one window gives each observed row its
successor's date, then ``sequence()`` + ``explode`` emits the row itself
plus every missing day until that successor — each emitted gap row
natively CARRYING the forward-filled value, no join and no second pass.

  * one shuffle total for fill (the window's hash partition on keys);
  * output size = exactly the densified grid (sum of per-key day spans),
    identical to the spine approach;
  * the per-row explode fan-out is bounded by the longest observation
    gap, not by the series length — no skew amplification beyond what
    the data's gaps already imply. A pathological years-long gap in one
    key emits a long array from one task; callers with such data should
    cap ``max_gap_days``.

The DuckDB oracle for ``gap_fill_events`` (plans/windows.py) deliberately
uses the OTHER construction (generate_series spine + LEFT JOIN +
last_value IGNORE NULLS) so the two formulations cross-check each other.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

__all__ = [
    "autocorrelation",
    "business_days_between",
    "business_days_to_date",
    "cusum",
    "date_spine",
    "ewma",
    "gap_fill_ffill",
    "interpolate_linear",
    "kaplan_meier",
    "merge_intervals",
    "peak_concurrency",
    "seasonal_profile",
]


def date_spine(
    df: DataFrame,
    key_cols: Sequence[str],
    date_col: str,
    out_col: str = "day",
) -> DataFrame:
    """Per-key daily calendar spine spanning each key's own observed
    [min, max] date range: one row per (key, day).

    One shuffle (the span aggregate, map-side partial) + one explode.
    Useful standalone when the dense grid is the product (calendar-
    complete fact tables, coverage audits); ``gap_fill_ffill`` below does
    NOT build it — see the module docstring.
    """
    if not key_cols:
        raise ValueError("key_cols must be non-empty")
    span = df.groupBy(*key_cols).agg(
        F.min(F.col(date_col).cast("date")).alias("__d0"),
        F.max(F.col(date_col).cast("date")).alias("__d1"),
    )
    return span.select(
        *key_cols,
        F.explode(F.sequence("__d0", "__d1")).alias(out_col),
    )


def _check_reserved(df: DataFrame, names: Sequence[str]) -> None:
    clash = [c for c in df.columns if c in set(names)]
    if clash:
        raise ValueError(f"input carries reserved internal column(s): {clash}")


def _assert_unique_grain(
    df: DataFrame, key_cols: Sequence[str], date_col: str
) -> None:
    dup = (
        df.groupBy(*key_cols, date_col)
        .count()
        .where(F.col("count") > 1)
        .limit(1)
        .count()
    )
    if dup:
        raise ValueError(
            f"input has duplicate ({list(key_cols)}, {date_col}) rows — "
            "pre-aggregate to one row per key-date before densifying"
        )


def gap_fill_ffill(
    df: DataFrame,
    key_cols: Sequence[str],
    date_col: str,
    value_cols: Sequence[str],
    max_gap_days: int | None = None,
    validate_unique: bool = False,
) -> DataFrame:
    """Densify a per-key daily series and forward-fill its values.

    Input: at most one row per (key, date) — pre-aggregate first.
    Duplicate dates make ``lead`` emit overlapping day sequences
    (duplicated grid rows downstream); pass ``validate_unique=True`` to
    pay one extra aggregate that raises on duplicates instead — off by
    default because the check is a full shuffle at scale and most
    callers feed a groupBy output that is unique by construction.
    Output: one row per (key, day) for every day in the key's
    [min, max] observed range, with

      * ``<v>``        — the observed value, NULL on gap rows;
      * ``<v>_ffill``  — last observation carried forward (never NULL);
      * ``is_gap``     — 1 on synthesized rows, else 0 (BIGINT);
      * ``days_since_obs`` — staleness of the carried value (BIGINT, 0
        on observed rows).

    Join-free lead-explode construction: ONE shuffle (see module
    docstring). ``max_gap_days`` truncates the fill horizon: gaps longer
    than it are left un-synthesized beyond the cap (the series resumes at
    the next observation), bounding worst-case fan-out for pathological
    keys.
    """
    if not key_cols or not value_cols:
        raise ValueError("key_cols and value_cols must be non-empty")
    _check_reserved(df, ["__day", "__obs_day", "__next_day"])
    if validate_unique:
        _assert_unique_grain(df, key_cols, date_col)
    d = F.col(date_col).cast("date")
    w = Window.partitionBy(*key_cols).orderBy(d)

    # the window result must be materialized BEFORE the generator — Spark
    # rejects window expressions inside explode()'s argument
    with_next = df.withColumn("__obs_day", d).withColumn(
        "__next_day", F.lead(d).over(w)
    )
    # horizon = day before the next observation (or the row's own day at
    # the series end), optionally capped at max_gap_days past the row
    horizon = F.coalesce(F.date_add("__next_day", -1), F.col("__obs_day"))
    if max_gap_days is not None:
        horizon = F.least(
            horizon, F.date_add("__obs_day", int(max_gap_days))
        )
    exploded = with_next.withColumn(
        "__day", F.explode(F.sequence("__obs_day", horizon))
    )
    grid, obs = F.col("__day"), F.col("__obs_day")
    is_obs = grid == obs
    out_cols: list[Column] = [F.col(k) for k in key_cols] + [
        grid.alias(date_col)
    ]
    for v in value_cols:
        out_cols.append(F.when(is_obs, F.col(v)).alias(v))
        out_cols.append(F.col(v).alias(f"{v}_ffill"))
    out_cols.append((~is_obs).cast("long").alias("is_gap"))
    out_cols.append(F.datediff(grid, obs).cast("long").alias("days_since_obs"))
    return exploded.select(*out_cols)


def interpolate_linear(
    df: DataFrame,
    key_cols: Sequence[str],
    date_col: str,
    value_col: str,
    validate_unique: bool = False,
) -> DataFrame:
    """Densify and LINEARLY interpolate between consecutive observations.

    Same join-free lead-explode construction as ``gap_fill_ffill`` — the
    next observation's (date, value) ride along via the same single
    window, so each synthesized row computes

        v_prev + (v_next - v_prev) * gap_position / gap_length

    in one expression. Trailing rows (no next observation) are not
    synthesized; observed rows keep their exact value (the formula is
    bypassed, not trusted, at position 0). Adds ``is_gap`` like the
    ffill twin. One shuffle.
    """
    if not key_cols:
        raise ValueError("key_cols must be non-empty")
    _check_reserved(df, ["__day", "__obs_day", "__next_day", "__next_val"])
    if validate_unique:
        _assert_unique_grain(df, key_cols, date_col)
    d = F.col(date_col).cast("date")
    w = Window.partitionBy(*key_cols).orderBy(d)
    # windows materialized before the generator (see gap_fill_ffill)
    exploded = (
        df.withColumn("__obs_day", d)
        .withColumn("__next_day", F.lead(d).over(w))
        .withColumn("__next_val", F.lead(value_col).over(w))
        .withColumn(
            "__day",
            F.explode(
                F.sequence(
                    "__obs_day",
                    F.coalesce(
                        F.date_add("__next_day", -1), F.col("__obs_day")
                    ),
                )
            ),
        )
    )
    grid, obs = F.col("__day"), F.col("__obs_day")
    pos = F.datediff(grid, obs).cast("double")
    length = F.datediff("__next_day", obs).cast("double")
    v0, v1 = F.col(value_col), F.col("__next_val")
    interp = F.when(grid == obs, v0).otherwise(v0 + (v1 - v0) * pos / length)
    return exploded.select(
        *[F.col(k) for k in key_cols],
        grid.alias(date_col),
        interp.alias(f"{value_col}_interp"),
        (grid != obs).cast("long").alias("is_gap"),
    )


def merge_intervals(
    df: DataFrame,
    key_cols: Sequence[str],
    start_col: str,
    end_col: str,
) -> DataFrame:
    """Coalesce overlapping or touching [start, end] intervals per key
    into maximal disjoint islands — the classic interval-union operator
    (downtime stitching, availability coverage, contiguous-activity
    spans) that SQL engines make users hand-roll every time.

    Returns one row per merged island: the key columns, the island's
    ``start_col`` (min) / ``end_col`` (max) and ``n_source`` (how many
    input intervals it absorbed). Two intervals merge when the later
    one's start is <= the running maximum of earlier ends (touching
    endpoints merge; change semantics by pre-shrinking ends if open
    intervals are wanted). Rows with NULL start or end are rejected —
    a NULL boundary has no defensible island assignment.

    Scale shape: the running-max-of-ends / flag / running-sum chain uses
    TWO window expressions over the SAME (key, order by start, end)
    spec, so the plan is one hash Exchange + one Sort feeding a single
    Window operator; the island collapse reuses the key partitioning
    (hash on keys satisfies the clustered distribution of
    ``groupBy(keys, island)``). One shuffle + one sort total, no join,
    no driver collection. Per-key work is linear in that key's interval
    count; a whale key serializes within its partition exactly like
    sessionization (inherent to per-key ordering).
    """
    if not key_cols:
        raise ValueError("merge_intervals needs at least one key column")
    _check_reserved(df, ["__pmax", "__new", "__island"])

    keys = [F.col(k) for k in key_cols]
    s, e = F.col(start_col), F.col(end_col)
    bad = df.where(s.isNull() | e.isNull() | (e < s)).limit(1).count()
    if bad:
        raise ValueError(
            f"invalid interval row (NULL bound or {end_col} < {start_col})"
        )
    w = Window.partitionBy(*keys).orderBy(s.asc(), e.asc())
    flagged = (
        df.withColumn(
            "__pmax",
            F.max(e).over(w.rowsBetween(Window.unboundedPreceding, -1)),
        )
        .withColumn(
            "__new",
            F.when(F.col("__pmax").isNull() | (s > F.col("__pmax")), 1)
            .otherwise(0),
        )
        .withColumn(
            "__island",
            F.sum("__new").over(
                w.rowsBetween(Window.unboundedPreceding, 0)
            ),
        )
    )
    return (
        flagged.groupBy(*keys, F.col("__island"))
        .agg(
            F.min(s).alias(start_col),
            F.max(e).alias(end_col),
            F.count("*").alias("n_source"),
        )
        .drop("__island")
    )


def cusum(
    df: DataFrame,
    order_col: str,
    value_col: str,
    target: Column | float | None = None,
    slack: float = 0.0,
    round_digits: int = 6,
) -> DataFrame:
    """Two-sided CUSUM change detection over an ordered series.

    The textbook statistic is recursive — ``S+_i = max(0, S+_{i-1} +
    (x_i - target - slack))`` — which looks sequential, but has the
    closed form ``S+_i = P_i - min(0, min_{j<=i} P_j)`` with ``P`` the
    prefix sum of deviations (and symmetrically ``S-_i = max(0,
    max_{j<=i} P'_j) - P'_i`` on the ``+slack`` prefix). That turns an
    "inherently serial" detector into two running-window reductions —
    the same prefix-trick family as ``operators/prefix.global_cumsum``.

    INTENDED INPUT IS AN AGGREGATED SERIES (one row per grain point):
    callers reduce the raw data first (e.g. daily totals — bounded by
    the calendar, not the data volume), so the single-partition ordered
    window here runs over a BOUNDED summary exactly like
    ``global_cumsum``'s bucket-offset window. Feeding raw event-grain
    data through this is a scale bug in the caller, not here.

    ``target`` defaults to the series mean, computed as exact-order
    ``sum/count`` over the full frame (NOT ``avg`` — engines disagree
    on compensated summation for avg, sum/count is reproducible
    cross-engine for series whose values are exact in double).

    Output: input columns + ``dev``/``cusum_pos``/``cusum_neg`` (rounded
    to ``round_digits``).
    """
    w_all = Window.orderBy(order_col).rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    w_pre = Window.orderBy(order_col).rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    v = F.col(value_col)
    if target is None:
        tgt = F.sum(v).over(w_all) / F.count(F.lit(1)).over(w_all)
    elif isinstance(target, (int, float)):
        # int targets stay integral literals (see the slack note below —
        # float literals would demote exact LONG series to double)
        tgt = F.lit(target if isinstance(target, int) else float(target))
    else:
        tgt = target
    # windows can't nest: target first, then deviation prefix sums, then
    # running min/max OVER those — all on the same ordering, so Catalyst
    # plans ONE sort with stacked Window nodes, no second shuffle.
    # Slack/zero literals are INT literals (or skipped when slack == 0)
    # so integer-typed series stay in exact LONG arithmetic end-to-end —
    # a float literal would silently promote the prefix sums to double
    # and lose exactness past 2^53.
    dev = v - F.col("__tgt")
    d_pos = dev if slack == 0 else dev - F.lit(slack)
    d_neg = dev if slack == 0 else dev + F.lit(slack)
    staged = df.select("*", tgt.alias("__tgt")).select(
        "*",
        dev.alias("__dev"),
        F.sum(d_pos).over(w_pre).alias("__ppos"),
        F.sum(d_neg).over(w_pre).alias("__pneg"),
    )
    s_pos = F.col("__ppos") - F.least(F.lit(0), F.min("__ppos").over(w_pre))
    s_neg = (
        F.greatest(F.lit(0), F.max("__pneg").over(w_pre)) - F.col("__pneg")
    )
    return staged.select(
        *df.columns,
        F.round(F.col("__dev"), round_digits).alias("dev"),
        F.round(s_pos, round_digits).alias("cusum_pos"),
        F.round(s_neg, round_digits).alias("cusum_neg"),
    )


def ewma(
    df: DataFrame,
    key_cols: Sequence[str],
    ts_col: str,
    value_cols: Sequence[str],
    *,
    alpha: float | None = None,
    halflife_rows: float | None = None,
    order_cols: Sequence[str] = (),
    suffix: str = "_ewma",
) -> DataFrame:
    """Per-key exponentially weighted moving average of ``value_cols``
    ordered by ``ts_col`` (ties broken by ``order_cols`` — pass a unique
    tiebreaker for deterministic output, same contract as
    sessionization): ``y_i = (1 - a) * y_{i-1} + a * x_i`` (the
    ``adjust=False`` recurrence; NULLs carry the previous smoothed value
    forward). Exactly one of ``alpha`` (in (0, 1]) or ``halflife_rows``
    must be given.

    Why not a window function: the recurrence's closed form needs
    ``(1-a)^{-j}`` prefix factors that overflow doubles after a few
    hundred rows, so no overflow-safe pure-SQL formulation exists for
    unbounded series. The honest Spark shape is per-key
    ``applyInPandas``: one shuffle on the keys, Arrow-batched transfer,
    and pandas' C-vectorized ``Series.ewm`` doing the numerically exact
    recurrence. Per-key memory is that key's row count — the same
    whale-key serialization caveat as every per-key-ordered operator
    here; the plan is Exchange -> FlatMapGroupsInPandas, nothing else.
    """
    if (alpha is None) == (halflife_rows is None):
        raise ValueError("pass exactly one of alpha / halflife_rows")
    if alpha is not None and not (0.0 < alpha <= 1.0):
        raise ValueError(f"alpha must be in (0, 1], got {alpha}")
    if halflife_rows is not None and halflife_rows <= 0:
        raise ValueError(f"halflife_rows must be positive, got {halflife_rows}")
    if not key_cols:
        raise ValueError("ewma needs at least one key column")
    out_names = [f"{c}{suffix}" for c in value_cols]
    _check_reserved(df, out_names)
    # a NULL timestamp has no position in the recurrence — pandas would
    # silently sort it last and let it consume a smoothing step; refuse
    # loudly instead (same posture as merge_intervals)
    if df.where(F.col(ts_col).isNull()).limit(1).count():
        raise ValueError(f"ewma: NULL {ts_col!r} row has no defined order")

    from pyspark.sql.types import DoubleType, StructField, StructType

    schema = StructType(
        list(df.schema.fields)
        + [StructField(n, DoubleType(), True) for n in out_names]
    )
    sort_cols = [ts_col, *order_cols]
    ew_kw = (
        {"alpha": float(alpha)}
        if alpha is not None
        else {"halflife": float(halflife_rows)}
    )
    vals = list(value_cols)

    def smooth(pdf):  # pragma: no cover — executes on workers
        pdf = pdf.sort_values(sort_cols, kind="mergesort")
        for c, n in zip(vals, out_names):
            pdf[n] = pdf[c].ewm(adjust=False, ignore_na=True, **ew_kw).mean()
        return pdf

    return df.groupBy(*[F.col(k) for k in key_cols]).applyInPandas(
        smooth, schema=schema
    )


def peak_concurrency(
    df: DataFrame,
    s_col: str,
    e_col: str,
    order_micros: bool = True,
) -> DataFrame:
    """Distributed sweep-line: the maximum number of simultaneously
    open half-open intervals ``[s, e)``, with the earliest timestamp
    attaining it.

    Endpoints become +1/-1 deltas; a per-timestamp aggregate collapses
    them MAP-SIDE to |distinct ts| net rows — an end cancels a start at
    the same instant, which IS the half-open convention and makes the
    running value order-independent within a timestamp. The running
    count is one :func:`ghcn_d_etl_project_spark.operators.prefix.
    global_cumsum` pass (bucketed two-phase prefix, no single-partition
    data-sized sort) and the answer is a TakeOrderedAndProject top-1.
    Integer arithmetic throughout.

    ``order_micros``: order the prefix on ``unix_micros(ts)`` — a raw
    TIMESTAMP order key trips an analyzer bind error inside the
    bucketed-prefix construction on Spark 4.1
    ([INTERNAL_ERROR_ATTRIBUTE_NOT_FOUND]); the long key is also what
    the bucket math wants.

    Output: one row ``(ts timestamp, peak_concurrency long)``.
    """
    from ghcn_d_etl_project_spark.operators.prefix import global_cumsum

    iv = df.filter(F.col(s_col).isNotNull() & F.col(e_col).isNotNull())
    deltas = iv.select(F.col(s_col).alias("ts"), F.lit(1).alias("d")).unionByName(
        iv.select(F.col(e_col).alias("ts"), F.lit(-1).alias("d"))
    )
    net = deltas.groupBy("ts").agg(F.sum("d").cast("long").alias("net"))
    if order_micros:
        net = net.withColumn("__tsu", F.unix_micros("ts"))
        conc = global_cumsum(net, "__tsu", "net", out_col="conc")
    else:
        conc = global_cumsum(net, "ts", "net", out_col="conc")
    return (
        conc.orderBy(F.col("conc").desc(), F.col("ts").asc())
        .limit(1)
        .select("ts", F.col("conc").cast("long").alias("peak_concurrency"))
    )


def autocorrelation(
    series: DataFrame,
    key_cols: Sequence[str],
    order_col: str,
    value_col: str,
    lags: Sequence[int] = (1, 2, 3),
    round_digits: int = 6,
) -> DataFrame:
    """Per-key sample autocorrelation of an (already aggregated) series
    at the given lags, deterministic enough to value-hash cross-engine.

    ACF(k) here is the Pearson correlation between the series and its
    k-step lag over the overlapping support (the "pairwise" estimator —
    each lag uses its own means, the formulation a SQL oracle can state
    directly), not the fixed-mean textbook estimator.

    Scale design: the input is a SERIES (one row per key-step, i.e. the
    output of a first partial-agg pass over the raw facts), so every
    window partition is one key's series — small by construction; the
    raw fact table never reaches this operator. All lags are computed in
    ONE window pass (k ``lag`` expressions over the same WindowSpec share
    one sort) and ONE moment aggregate: the (x, y) pairs for every lag
    are stacked long and grouped by (key, lag) with the exact-DECIMAL
    co-moment recipe of :func:`ghcn_d_etl_project_spark.operators.
    quality.corr_pairs` — per-row double products are bit-identical
    across engines, quantized sums are associative, and the final
    correlation is one double expression over identical sums, so the
    result is reproducible under any partitioning (Spark's streaming
    ``F.corr`` accumulator is order-dependent and could never hash-match
    an oracle).

    Output: one row per (key, lag) with ``n`` overlapping pairs and
    ``acf`` (NULL when the window variance is zero).
    """
    if not lags or any(k <= 0 for k in lags):
        raise ValueError(f"lags must be positive ints, got {lags!r}")
    keys = list(key_cols)
    w = Window.partitionBy(*keys).orderBy(order_col)
    lagged = series.select(
        *keys,
        F.col(value_col).cast("double").alias("__x"),
        *[
            F.lag(F.col(value_col).cast("double"), k).over(w).alias(f"__l{k}")
            for k in lags
        ],
    )
    pairs = ", ".join(f"{k}L, `__x`, `__l{k}`" for k in lags)
    long = lagged.select(
        *keys,
        F.expr(f"stack({len(lags)}, {pairs}) as (lag, x, y)"),
    ).filter(F.col("y").isNotNull() & F.col("x").isNotNull())
    x, y = F.col("x"), F.col("y")
    agg = long.groupBy(*keys, "lag").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(x.cast("decimal(28,4)")).cast("double").alias("sx"),
        F.sum(y.cast("decimal(28,4)")).cast("double").alias("sy"),
        F.sum((x * x).cast("decimal(30,6)")).cast("double").alias("sxx"),
        F.sum((y * y).cast("decimal(30,6)")).cast("double").alias("syy"),
        F.sum((x * y).cast("decimal(30,6)")).cast("double").alias("sxy"),
    )
    n = F.col("n").cast("double")
    sx, sy = F.col("sx"), F.col("sy")
    denom = F.sqrt(
        (n * F.col("sxx") - sx * sx) * (n * F.col("syy") - sy * sy)
    )
    return agg.select(
        *keys,
        F.col("lag").cast("long").alias("lag"),
        F.col("n").cast("long").alias("n"),
        F.when(
            denom > 0,
            F.round((n * F.col("sxy") - sx * sy) / denom, round_digits),
        ).alias("acf"),
    )


def seasonal_profile(
    series: DataFrame,
    key_cols: Sequence[str],
    date_col: str,
    value_col: str,
    round_digits: int = 6,
    release_into: list[DataFrame] | None = None,
) -> DataFrame:
    """Day-of-week seasonal decomposition of a daily series: per-key
    per-weekday mean level and the multiplicative seasonal index
    (weekday mean / overall mean), the "seasonal means" estimator.

    Weekday is computed as pure integer arithmetic on days-since-epoch
    (``((days + 3) % 7) + 1``, Monday=1 — 1970-01-01 was a Thursday),
    NOT a locale/engine-dependent ``dayofweek()`` whose week origin
    differs between Spark (Sunday=1) and DuckDB (Sunday=0).

    Scale design: like :func:`autocorrelation`, the input is the
    already-aggregated daily series, so this is two map-side-combining
    aggregates over key×365-ish rows plus a broadcast join of the per-key
    totals back onto the per-(key, dow) means — the raw fact table never
    appears. Means are exact-DECIMAL sums divided by BIGINT counts; the
    index is one double division — all bit-stable cross-engine.

    Output: (keys…, dow iso-weekday long, n_days, mean_value,
    seasonal_index), index NULL when the key's overall mean is zero.
    """
    keys = list(key_cols)
    base = series.select(
        *keys,
        # pmod, not `%`: the signed remainder goes non-positive for
        # pre-1970 dates (1969-12-25 read dow -3); pmod keeps the ISO
        # weekday in 1..7 over the full date domain.
        (
            F.pmod(
                F.datediff(
                    F.col(date_col).cast("date"), F.lit("1970-01-01")
                )
                + 3,
                F.lit(7),
            )
            + 1
        )
        .cast("long")
        .alias("dow"),
        F.col(value_col).cast("double").alias("__v"),
    )
    # exact decimal sums are associative, so the per-key overall rolls
    # up from the per-(key, dow) partials — the base series is scanned
    # ONCE (a second base aggregate would re-derive the whole upstream
    # series construction; plan_report showed 2 source scans)
    agg0 = base.groupBy(*keys, "dow").agg(
        F.count(F.lit(1)).alias("n_days"),
        F.sum(F.col("__v").cast("decimal(28,4)")).alias("__sdec"),
    ).persist()  # feeds the rollup AND the final projection
    if release_into is not None:
        # caller-owned lifetime (the minhash_lsh_dedup contract):
        # repeated invocations in one session otherwise accumulate
        # one cached per-(key, dow) aggregate per call
        release_into.append(agg0)
    overall = agg0.groupBy(*keys).agg(
        F.sum("n_days").alias("__tn"),
        F.sum("__sdec").cast("double").alias("__ts"),
    )
    by_dow = agg0.withColumn("__s", F.col("__sdec").cast("double"))
    mean = F.col("__s") / F.col("n_days")
    omean = F.col("__ts") / F.col("__tn")
    return (
        by_dow.join(F.broadcast(overall), keys)
        .select(
            *keys,
            "dow",
            F.col("n_days").cast("long").alias("n_days"),
            F.round(mean, round_digits).alias("mean_value"),
            F.when(omean != 0, F.round(mean / omean, round_digits)).alias(
                "seasonal_index"
            ),
        )
    )


def business_days_to_date(col: Column | str) -> Column:
    """Business days (Mon-Fri) in ``['1969-12-29', d)`` — the closed-form
    prefix count business-day arithmetic is built from. 1969-12-29 is
    the Monday anchor; pure integer arithmetic on days-since-anchor
    (``5 * weeks + least(rem, 5)``), identical on any engine.
    """
    c = F.col(col) if isinstance(col, str) else col
    days = F.datediff(c.cast("date"), F.lit("1969-12-29"))
    # floored division MUST pair with the floored (positive) modulus:
    # Spark's `%` is a signed remainder, so `floor(days/7)` + `days % 7`
    # disagree for pre-anchor dates (days < 0) and the weekday count came
    # out wrong (1969-12-26 -> 1969-12-29 read 8 business days, not 1).
    return (
        F.floor(days / 7) * 5 + F.least(F.pmod(days, F.lit(7)), F.lit(5))
    ).cast("long")


def business_days_between(d1: Column | str, d2: Column | str) -> Column:
    """Business days (Mon-Fri) in ``[d1, d2)`` — the working-duration
    arithmetic Spark's calendar ``datediff`` doesn't provide (SLA
    clocks, fulfillment latency, settlement T+n). Negative when
    ``d2 < d1`` (anti-symmetric by construction); weekend endpoints
    contribute nothing, so e.g. Saturday -> Monday is 0.

    Prefix-difference closed form over :func:`business_days_to_date` —
    one integer expression per row, no calendar table join, no
    generate-and-filter explode; holiday calendars compose on top by
    subtracting a (broadcast) holiday-count range lookup.
    """
    return (business_days_to_date(d2) - business_days_to_date(d1)).cast(
        "long"
    )


def kaplan_meier(
    df: DataFrame,
    duration_col: str,
    event_col: str,
    round_digits: int = 6,
) -> DataFrame:
    """Kaplan-Meier survival estimator over right-censored durations:
    one row per distinct duration with the at-risk count, events,
    censorings, and S(t) — the time-to-event curve (churn, time-to-
    conversion, failure analysis) no Spark built-in provides.

    Input: one row per subject — ``duration_col`` (non-negative
    integer-ish time) and ``event_col`` (1 = event observed,
    0 = right-censored at that time). S(t) = prod over event times
    t_i <= t of (1 - d_i / n_i).

    Cross-engine determinism for a PRODUCT: the factors move to log
    space and each term ``ln(1 - d/n)`` — a double identical on both
    engines — is quantized to DECIMAL(28,12) BEFORE the running sum,
    so the cumulative is exact and associative (window-aggregate
    implementations are free to sum in segment-tree order, which would
    otherwise move the last bit); S(t) = exp(double(cumsum)), rounded.

    Scale shape: subjects collapse to one row per distinct duration
    (map-side combined — the only data-sized pass); the at-risk
    arithmetic and the log-space product are two frames over ONE
    unpartitioned window on that collapsed table (bounded
    SinglePartition: |distinct durations| rows). Add a cohort column
    upstream and partition the windows to compare curves.
    """
    d = F.col(duration_col)
    ev = F.col(event_col)
    base = df.filter(d.isNotNull() & ev.isNotNull()).select(
        d.cast("long").alias("t"), ev.cast("long").alias("e")
    )
    per_t = base.groupBy("t").agg(
        F.sum("e").cast("long").alias("d_events"),
        F.sum(F.lit(1) - F.col("e")).cast("long").alias("c_censored"),
    )
    w_order = Window.orderBy("t")
    prior = F.coalesce(
        F.sum(F.col("d_events") + F.col("c_censored")).over(
            w_order.rowsBetween(Window.unboundedPreceding, -1)
        ),
        F.lit(0),
    )
    total = F.sum(F.col("d_events") + F.col("c_censored")).over(
        Window.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    )
    marked = per_t.select(
        "t",
        "d_events",
        "c_censored",
        (total - prior).cast("long").alias("n_at_risk"),
    )
    # d == n (everyone at risk dies) sends ln(1 - d/n) to -inf; carry
    # an explicit extinction flag instead and pin S = 0 from there on
    term = F.when(
        (F.col("d_events") > 0) & (F.col("d_events") < F.col("n_at_risk")),
        F.log(
            F.lit(1.0)
            - F.col("d_events").cast("double")
            / F.col("n_at_risk").cast("double")
        ),
    ).otherwise(F.lit(0.0))
    running = w_order.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    cum = F.sum(term.cast("decimal(28,12)")).over(running)
    extinct = F.max(
        (F.col("d_events") == F.col("n_at_risk")).cast("int")
    ).over(running)
    survival = F.when(extinct == 1, F.lit(0.0)).otherwise(
        F.round(F.exp(cum.cast("double")), round_digits)
    )
    return marked.select(
        "t",
        "n_at_risk",
        "d_events",
        "c_censored",
        survival.alias("survival"),
    )
