"""Categorical feature encoding for training-data pipelines.

The reference stops at raw feature extraction (its gold ML-features
mart, ``src/transform/gold_processor.py``); the next step every tabular
training pipeline takes is turning high-cardinality categoricals into
model-consumable numerics. Target (mean) encoding is the workhorse —
and its naive form leaks the label: a row's own target contributes to
its own encoding. The standard fix is LEAVE-ONE-OUT: encode row *i* of
category *c* as ``(sum_c - y_i) / (n_c - 1)``.

Scale design: one hash aggregate to category grain (map-side partials
collapse each partition to <= |categories| rows before the shuffle),
then the tiny stats frame joins BACK to the fact — broadcast under a
bounded O(threshold) probe, so the fact table itself never shuffles.
That is the whole plan: the naive per-row window formulation
(``SUM OVER (PARTITION BY cat)``) would instead shuffle and sort the
ENTIRE fact table on a low-cardinality, typically skewed key — the
exact shape that falls over at 100 TB. The join form is also where the
LOO arithmetic stays exact: the category sum is an order-independent
DECIMAL accumulation (``plans/_util.dsum`` convention), so the
subtraction of one exact double from another is engine-reproducible.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = [
    "curriculum_buckets",
    "feature_hash",
    "isotonic_fit",
    "isotonic_fit_counts",
    "percentile_features",
    "quantile_normalize",
    "standardize",
    "target_encode_loo",
]


def target_encode_loo(
    df: DataFrame,
    cat_col: str,
    target_col: str,
    out_col: str = "te_loo",
    scale: int = 2,
    round_digits: int = 6,
    broadcast_threshold_rows: int = 1_000_000,
) -> DataFrame:
    """Leave-one-out target encoding: append ``out_col`` = mean of
    ``target_col`` over the row's ``cat_col`` group EXCLUDING the row
    itself.

    Semantics at the edges (all deliberate, all tested):
      * singleton category (n_c == 1): NULL — there is no leakage-free
        estimate from zero other rows; downstream imputes (e.g. global
        prior), it is not this operator's call.
      * NULL target: the row contributes nothing to the sum/count, so
        its encoding is the PLAIN category mean over the non-NULL rows.
      * NULL category: NULL encoding (a NULL key matches nothing; kept
        via left join, never dropped).

    ``scale``: DECIMAL quantization scale for the exact category sum
    (2 for money-like targets).
    """
    tgt = F.col(target_col)
    stats = df.groupBy(cat_col).agg(
        F.sum(tgt.cast(f"decimal(24,{scale})")).cast("double").alias("__sum"),
        F.count(tgt).alias("__cnt"),
    )
    n_cats = stats.limit(broadcast_threshold_rows + 1).count()
    if n_cats <= broadcast_threshold_rows:
        stats = F.broadcast(stats)
    enc = (
        F.when(tgt.isNull(), F.col("__sum") / F.col("__cnt"))
        .when(
            F.col("__cnt") > 1,
            (F.col("__sum") - tgt) / (F.col("__cnt") - 1),
        )
    )
    return (
        df.join(stats, on=cat_col, how="left")
        .withColumn(out_col, F.round(enc, round_digits))
        .drop("__sum", "__cnt")
    )


def percentile_features(
    df: DataFrame,
    value_col: str,
    rank_col: str = "pct_rank",
    cume_col: str = "cume_dist",
    bucket_width: float | None = None,
    round_digits: int = 6,
    tile_col: str | None = None,
    n_tiles: int = 10,
) -> DataFrame:
    """Append the GLOBAL ``percent_rank`` and ``cume_dist`` of
    ``value_col`` to every row — the quantile-normalization feature —
    without the global sort the window formulation implies.

    ``PERCENT_RANK() OVER (ORDER BY v)`` plans an
    ``Exchange SinglePartition`` + full-data sort: the one-machine
    death-mode at 100 TB. This operator computes the identical numbers
    as COUNTING, not ordering: collapse to per-DISTINCT-VALUE counts
    (map-side partials), run ONE bucketed
    ``operators/prefix.global_cumsum`` pass for the inclusive running
    count, broadcast the total, and equi-join the tiny
    ``(value, below, cum)`` table back onto the rows. Then

        percent_rank = below / (N - 1)        (0.0 when N == 1)
        cume_dist    = cum / N

    — pure integer ratios, so the doubles are bit-identical to any
    engine's window implementation. NULL values get NULL features and
    don't count toward N (window semantics differ on NULL ordering;
    refusing to rank NULLs is the portable contract).

    Join-back note: the join key is the value itself — exact-equality
    on the very doubles both sides carry, and heavy duplication of a
    value is exactly what SHRINKS the distinct-value table.

    ``tile_col`` appends the tie-stable value n-tile
    ``ceil(n_tiles * cum / N)`` as EXACT BIGINT arithmetic
    (``(n_tiles*cum + N - 1) div N`` — never the rounded ``cume_col``
    double): deriving the tile from a 6-digit-rounded cume can flip a
    bucket when cum/N lands within 5e-7 of a tile boundary, which at
    >~2e5 distinct rows is a real event. Equal values always share a
    tile (unlike row-ordered NTILE); NULL values get a NULL tile.
    """
    vals = percentile_value_map(
        df,
        value_col,
        rank_col=rank_col,
        cume_col=cume_col,
        bucket_width=bucket_width,
        round_digits=round_digits,
        tile_col=tile_col,
        n_tiles=n_tiles,
    )
    return df.join(
        vals, on=df[value_col] == vals["__v"], how="left"
    ).drop("__v")


def percentile_value_map(
    df: DataFrame,
    value_col: str,
    rank_col: str = "pct_rank",
    cume_col: str = "cume_dist",
    bucket_width: float | None = None,
    round_digits: int = 6,
    tile_col: str | None = None,
    n_tiles: int = 10,
) -> DataFrame:
    """The DISTINCT-VALUE-grain feature map behind
    :func:`percentile_features`: ``(__v, rank_col, cume_col[, tile])``
    with one row per distinct non-NULL value. Callers scoring SEVERAL
    metrics of one table (``rfm_segments``) build each metric's map
    independently from the (persisted) base and equi-join the maps on —
    chaining full ``percentile_features`` passes instead re-prints the
    whole upstream lineage through every pass's three-way self-reference
    (the r11 rfm plan carried 86 textual reprints of its one-row
    broadcast); map-then-join keeps it at one scalar broadcast per
    metric. Same counting recipe, same numbers."""
    from ghcn_d_etl_project_spark.operators.prefix import global_cumsum

    nn = df.filter(F.col(value_col).isNotNull())
    per_val = nn.groupBy(F.col(value_col).alias("__v")).agg(
        F.count(F.lit(1)).alias("__n")
    )
    cums = global_cumsum(
        per_val, "__v", "__n", out_col="__cum", bucket_width=bucket_width
    )
    # the total rides in under a FRESH alias: cums and totals share the
    # scan lineage, and the crossJoin would otherwise surface the same
    # __N exprId twice (AMBIGUOUS_REFERENCE on Spark 4.1)
    totals = nn.agg(F.count(F.lit(1)).alias("__N")).select(
        F.col("__N").alias("__N_total")
    )
    big_n = F.col("__N_total")
    out_cols = [
        F.round(
            F.when(big_n > 1,
                   (F.col("__cum") - F.col("__n")).cast("double")
                   / (big_n - 1).cast("double"))
            .otherwise(F.lit(0.0)),
            round_digits,
        ).alias(rank_col),
        F.round(
            F.col("__cum").cast("double") / big_n.cast("double"),
            round_digits,
        ).alias(cume_col),
    ]
    if tile_col is not None:
        # exact ceil(n_tiles * cum / N) in BIGINT — true integer `div`,
        # not floor(double / double): Spark's `/` on longs is DOUBLE
        # division, whose quotient rounds at ~1e15-row numerators and
        # could then floor to the wrong tile (the DuckDB oracle uses
        # integer `//`). `div` keeps the whole boundary in BIGINT.
        out_cols.append(
            F.expr(
                f"(CAST({int(n_tiles)} AS BIGINT) * __cum + __N_total - 1)"
                " div __N_total"
            )
            .cast("long")
            .alias(tile_col)
        )
    return cums.crossJoin(F.broadcast(totals)).select("__v", *out_cols)


def standardize(
    df: DataFrame,
    value_cols: list[str],
    group_cols: list[str] | None = None,
    sample: bool = True,
    scale: int = 4,
    round_digits: int = 6,
    broadcast_threshold_rows: int = 1_000_000,
) -> DataFrame:
    """Append ``<col>_z`` = (x - mean) / stddev per group for every
    value column — the standard-scaler feature, multi-column in ONE
    aggregate pass.

    Same physical shape as :func:`target_encode_loo`: one group-grain
    hash aggregate collecting exact DECIMAL moments (sum, sum-of-
    squares, count per column — all in one pass), broadcast back under
    a bounded probe, per-row arithmetic on the fact side. The fact
    never shuffles; the window formulation would sort it on the group
    key. Exact moments make mean and stddev order-independent, so the
    doubles reproduce on any engine (the corr_matrix convention).

    ``sample=True`` uses the n-1 denominator (matches SQL ``STDDEV`` /
    ``STDDEV_SAMP``). Degenerate cases: stddev == 0 or n < 2 yield
    NULL z (a constant group has no scale); NULL x yields NULL z; NULL
    group keys get NULL z via the left join.
    """
    groups = list(group_cols or [])
    aggs = []
    for c in value_cols:
        v = F.col(c)
        aggs.append(
            F.sum(v.cast(f"decimal(24,{scale})")).cast("double").alias(f"__sx_{c}")
        )
        aggs.append(
            F.sum((v * v).cast(f"decimal(30,{scale})")).cast("double")
            .alias(f"__sxx_{c}")
        )
        aggs.append(F.count(v).alias(f"__n_{c}"))
    stats = df.groupBy(*groups).agg(*aggs)
    n_rows = stats.limit(broadcast_threshold_rows + 1).count()
    if n_rows <= broadcast_threshold_rows:
        stats = F.broadcast(stats)
    out = (
        df.join(stats, on=groups, how="left") if groups
        else df.crossJoin(stats)
    )
    keep = list(df.columns)
    drop = []
    for c in value_cols:
        sx, sxx, n = (
            F.col(f"__sx_{c}"),
            F.col(f"__sxx_{c}"),
            F.col(f"__n_{c}").cast("double"),
        )
        denom = (n - 1) if sample else n
        var = (sxx - sx * sx / n) / denom
        mean = sx / n
        z = (F.col(c) - mean) / F.sqrt(var)
        out = out.withColumn(
            f"{c}_z",
            F.when(
                (F.col(f"__n_{c}") >= 2) & (var > 0), F.round(z, round_digits)
            ),
        )
        keep.append(f"{c}_z")
        drop.extend([f"__sx_{c}", f"__sxx_{c}", f"__n_{c}"])
    return out.select(*keep)


def feature_hash(
    df: DataFrame,
    id_col: str,
    cols: list[str],
    n_buckets: int = 64,
    salt: str = "fh",
) -> DataFrame:
    """The hashing trick (Weinberger et al. 2009): fixed-width sparse
    features from unbounded categorical vocabularies — ``col=value`` is
    hashed to a bucket with a ±1 sign, collisions sum, and no
    vocabulary/fit pass ever exists (the property that makes it the
    streaming-safe, schema-stable encoder for training pipelines).

    Engine-portable hashes (the house md5 recipe shared with
    ``operators/common.py``): bucket = first 4 md5 hex chars of
    ``col=value:salt`` mod ``n_buckets``; sign = parity of the 5th hex
    char — so the SAME row produces the SAME features on any engine or
    partitioning, and a SQL oracle can restate the whole construction.

    Scale design — ZERO shuffles: the per-row feature vector is built
    entirely with higher-order functions (an array of (bucket, sign)
    structs per row, folded into the dense ``n_buckets`` vector by a
    transform+aggregate), so this is a pure projection; at 100 TB it
    pipelines inside whatever stage reads the rows. NULL values emit no
    feature (standard skip semantics — nullness can be hashed
    explicitly by coalescing upstream if wanted). Cost per row is
    O(n_buckets x |cols|) plan-side arithmetic: fine at 64 x a few,
    size buckets accordingly.

    Output: ``(id_col, features array<double> of n_buckets)``.
    """
    if not cols:
        raise ValueError("cols must be non-empty")
    if n_buckets < 1:
        raise ValueError(f"n_buckets must be >= 1, got {n_buckets}")

    def tok(c: str):
        return F.concat(
            F.lit(c + "="), F.col(c).cast("string"), F.lit(":" + salt)
        )

    def bucket(c: str):
        return (
            F.conv(F.substring(F.md5(tok(c)), 1, 4), 16, 10).cast("long")
            % n_buckets
        )

    def sign(c: str):
        par = F.conv(F.substring(F.md5(tok(c)), 5, 1), 16, 10).cast("long") % 2
        return F.when(par == 0, F.lit(1.0)).otherwise(F.lit(-1.0))

    pairs = F.filter(
        F.array(
            *[
                F.when(
                    F.col(c).isNotNull(),
                    F.struct(bucket(c).alias("b"), sign(c).alias("s")),
                )
                for c in cols
            ]
        ),
        lambda x: x.isNotNull(),
    )
    features = F.transform(
        F.sequence(F.lit(0), F.lit(n_buckets - 1)),
        lambda j: F.aggregate(
            pairs,
            F.lit(0.0),
            lambda acc, x: acc
            + F.when(x["b"] == j.cast("long"), x["s"]).otherwise(F.lit(0.0)),
        ),
    )
    return df.select(F.col(id_col), features.alias("features"))


def isotonic_fit(
    df: DataFrame,
    group_cols: list[str],
    x_col: str,
    y_col: str,
    weight_col: str | None = None,
    round_digits: int = 6,
) -> DataFrame:
    """Per-group isotonic regression via Pool-Adjacent-Violators (PAVA):
    the monotone-nondecreasing step function minimizing weighted squared
    error — the standard model-calibration fit (Zadrozny & Elkan 2002)
    and monotone-constraint smoother.

    PAVA is inherently SEQUENTIAL in x order (each pool decision depends
    on every earlier pool), so this is an honest ``applyInPandas``: one
    shuffle on the group keys, then a numpy stack-based PAVA per group.
    The scale contract mirrors ``mmr_rerank``: feed PRE-AGGREGATED
    (x, y, w) points per group (distinct x values — e.g. score buckets
    with observed rates), not raw events; state per group is the
    distinct-x table. Duplicate x within a group are pre-pooled by
    weighted mean (standard), which also makes the fit independent of
    input order — deterministic under any partitioning.

    Output: ``(group_cols..., x, y_iso double, x_weight double)`` —
    one row per distinct x (``x_weight`` = that x's pooled input
    weight), y_iso monotone non-decreasing in x and preserving the
    weighted mean of y.
    """
    import numpy as np
    import pandas as pd

    if not group_cols:
        raise ValueError("group_cols must be non-empty")
    cols = [F.col(c) for c in group_cols]
    w = (
        F.col(weight_col).cast("double")
        if weight_col
        else F.lit(1.0)
    )
    base = df.filter(
        F.col(x_col).isNotNull() & F.col(y_col).isNotNull()
    ).select(
        *cols,
        F.col(x_col).cast("double").alias("__x"),
        F.col(y_col).cast("double").alias("__y"),
        w.alias("__w"),
    )
    out_schema = ", ".join(
        [f"{c} {base.schema[c].dataType.simpleString()}" for c in group_cols]
        + ["x double", "y_iso double", "x_weight double"]
    )

    def pava(pdf: pd.DataFrame) -> pd.DataFrame:
        # pre-pool duplicate x by weighted mean, then sort by x
        g = (
            pdf.assign(wy=pdf["__y"] * pdf["__w"])
            .groupby("__x", as_index=False)
            .agg(w=("__w", "sum"), wy=("wy", "sum"))
            .sort_values("__x")
            .reset_index(drop=True)
        )
        xs = g["__x"].to_numpy()
        ws = g["w"].to_numpy(dtype=np.float64)
        ys = (g["wy"] / g["w"]).to_numpy(dtype=np.float64)
        # stack of (mean, weight, count) pools
        means: list[float] = []
        wts: list[float] = []
        cnts: list[int] = []
        for i in range(len(xs)):
            means.append(float(ys[i]))
            wts.append(float(ws[i]))
            cnts.append(1)
            while len(means) > 1 and means[-2] > means[-1]:
                m2, w2, c2 = means.pop(), wts.pop(), cnts.pop()
                m1, w1, c1 = means.pop(), wts.pop(), cnts.pop()
                means.append((m1 * w1 + m2 * w2) / (w1 + w2))
                wts.append(w1 + w2)
                cnts.append(c1 + c2)
        y_iso = np.concatenate(
            [np.full(c, m) for m, c in zip(means, cnts)]
        )
        res = pd.DataFrame(
            {
                "x": xs,
                "y_iso": np.round(y_iso, round_digits),
                "x_weight": ws,
            }
        )
        for c in group_cols:
            res.insert(0, c, pdf[c].iloc[0])
        return res[group_cols + ["x", "y_iso", "x_weight"]]

    return base.groupBy(*group_cols).applyInPandas(pava, schema=out_schema)


def quantile_normalize(
    df: DataFrame,
    id_col: str,
    value_col: str,
    group_col: str,
    bucket_width: float | None = None,
) -> DataFrame:
    """Quantile normalization across groups (batch-effect correction,
    Bolstad et al. 2003): map each row's value onto the POOLED empirical
    distribution at the row's within-group quantile position, so every
    group ends up with the same marginal distribution. The corpus use:
    quality/length scores from different sources are not comparable
    (one crawler's "score 0.7" is another's "0.3"); normalizing to the
    pooled distribution makes one global threshold meaningful across
    sources.

    Exact integer recipe (hash-stable cross-engine, no float quantile):
    within-group rank ``r`` of ``n_g`` rows maps to pooled order
    statistic index ``ceil(r * N / n_g)`` (BIGINT ``div`` arithmetic),
    and the normalized value is the pooled ``idx``-th smallest value.

    Scale design — no global row_number over the fact table anywhere:

      * within-group rank: window PARTITIONed by group (per-group
        parallel sort; salt/range-partition a pathologically hot group
        before calling, same caveat as every per-key window here);
      * per-group sizes and the total N: bounded aggregates joined
        back by broadcast (N is a one-row broadcast — the benign
        scalar-BNLJ pattern in the plan-gate allowlist);
      * pooled order statistics WITHOUT a single-partition sort: group
        by VALUE (map-side combined), distributed prefix-sum of the
        counts via ``prefix.global_cumsum``, then each value's rank
        range [cum-cnt+1, cum] explodes to one (idx, value) row per
        pooled rank — corpus-sized but perfectly parallel — and the
        final mapping is a plain EQUI-join on idx.

    Output: (id, group, value, qnorm) — qnorm has ``value_col``'s type.
    """
    from ghcn_d_etl_project_spark.operators.prefix import global_cumsum

    base = df.filter(
        F.col(id_col).isNotNull()
        & F.col(value_col).isNotNull()
        & F.col(group_col).isNotNull()
    ).select(
        F.col(id_col).alias("id"),
        F.col(group_col).alias("group"),
        F.col(value_col).alias("value"),
    )
    sizes = base.groupBy("group").agg(F.count(F.lit(1)).alias("__ng"))
    total = base.agg(F.count(F.lit(1)).alias("__n"))

    from pyspark.sql import Window

    w = Window.partitionBy("group").orderBy("value", "id")
    ranked = (
        base.withColumn("__r", F.row_number().over(w).cast("long"))
        .join(F.broadcast(sizes), "group")
        .crossJoin(F.broadcast(total))
        .withColumn(
            # cast BEFORE multiplying: r*N in BIGINT wraps silently in
            # non-ANSI mode past r*N ~ 2^63 (N = 1e10 rows puts the
            # product there at r ~ 1e9); DECIMAL(38,0) holds it exactly
            # and `div` returns the BIGINT quotient (<= N, never wide)
            "__idx",
            F.expr(
                "(CAST(__r AS DECIMAL(38,0)) * __n + __ng - 1) div __ng"
            ),
        )
    )
    vc = base.groupBy("value").agg(F.count(F.lit(1)).alias("__cnt"))
    pooled = (
        global_cumsum(
            vc, "value", "__cnt", out_col="__cum", bucket_width=bucket_width
        )
        .select(
            F.col("value").alias("qnorm"),
            F.explode(
                F.sequence(
                    F.col("__cum") - F.col("__cnt") + 1, F.col("__cum")
                )
            ).alias("__idx"),
        )
    )
    return ranked.join(pooled, "__idx").select("id", "group", "value", "qnorm")


def curriculum_buckets(
    df: DataFrame,
    id_col: str,
    difficulty_col: str,
    group_col: str,
    n_buckets: int = 10,
) -> DataFrame:
    """Curriculum bucketing for training-data ordering (Bengio et al.
    2009): rank every row within its group by a difficulty proxy, then
    cut each group's ranking into ``n_buckets`` equal-depth buckets —
    bucket b holds the b-th difficulty slice of EVERY group, so
    training in bucket order is an easy-to-hard curriculum that stays
    group-balanced throughout (no "all of source A first" degeneracy).

    The bucket id is the whole curriculum coordinate: a total training
    order needs NO global sort at any scale — write bucket-partitioned
    shards (``sources/writers.write_partitioned``) and read buckets in
    order; within a bucket, order is deliberately unspecified (shuffle
    freely). ``bucket = (n_buckets * (r - 1)) div n_g`` in exact BIGINT
    arithmetic; per-group ranks come from a group-PARTITIONed window
    (parallel per-group sorts), group sizes broadcast back.

    Output: (id, group, difficulty, within_rank, bucket) — all ranks
    and buckets BIGINT, hash-exact cross-engine.
    """
    if n_buckets < 1:
        raise ValueError(f"n_buckets must be >= 1, got {n_buckets}")
    from pyspark.sql import Window

    base = df.filter(
        F.col(id_col).isNotNull()
        & F.col(difficulty_col).isNotNull()
        & F.col(group_col).isNotNull()
    ).select(
        F.col(id_col).alias("id"),
        F.col(group_col).alias("group"),
        F.col(difficulty_col).alias("difficulty"),
    )
    sizes = base.groupBy("group").agg(F.count(F.lit(1)).alias("__ng"))
    w = Window.partitionBy("group").orderBy("difficulty", "id")
    return (
        base.withColumn("__r", F.row_number().over(w).cast("long"))
        .join(F.broadcast(sizes), "group")
        .select(
            "id",
            "group",
            "difficulty",
            F.col("__r").alias("within_rank"),
            F.expr(f"(CAST({int(n_buckets)} AS BIGINT) * (__r - 1)) div __ng")
            .alias("bucket"),
        )
    )


def isotonic_fit_counts(
    df: DataFrame,
    group_cols: list[str],
    x_col: str,
    num_col: str,
    den_col: str,
    round_digits: int = 6,
) -> DataFrame:
    """:func:`isotonic_fit` specialized to COUNT-RATIO targets
    (y = successes/trials per x — the calibration-curve case), in EXACT
    integer arithmetic end to end: pools carry (numerator, denominator)
    BIGINT sums, the PAVA violation test compares pool means by integer
    cross-multiplication (``n1*d2 > n2*d1`` — Python ints, no overflow,
    no float ever enters a pool decision), and each output value is ONE
    double division of two exact integers.

    Why this exists alongside the general float/weight form: exact
    integer pools make the fit's VALUES engine-reproducible, which is
    what lets a sequential algorithm carry a full value-hash SQL oracle
    — the min-max theorem (Barlow et al. 1972) restates PAVA's output
    non-sequentially as ``ŷ_i = max_{s<=i} min_{t>=i} avg(y[s..t])``,
    each range average the same single division of exact prefix-sum
    integers, and IEEE rounding is monotone so double min/max equals
    the rounded rational min/max. The general form can't promise this:
    its pool means are iterated float combines whose low bits depend on
    merge order.

    Same scale contract as the general form: feed PRE-AGGREGATED per-x
    counts (one shuffle on the group keys, per-group state = distinct-x
    table). Output: ``(group_cols..., x, y_iso double, x_weight
    double)`` with ``y_iso = pooled_num / pooled_den`` and ``x_weight``
    = that x's input denominator.
    """
    import pandas as pd

    if not group_cols:
        raise ValueError("group_cols must be non-empty")
    base = df.filter(
        F.col(x_col).isNotNull()
        & F.col(num_col).isNotNull()
        & F.col(den_col).isNotNull()
    ).select(
        *[F.col(c) for c in group_cols],
        F.col(x_col).cast("double").alias("__x"),
        F.col(num_col).cast("long").alias("__num"),
        F.col(den_col).cast("long").alias("__den"),
    )
    out_schema = ", ".join(
        [f"{c} {base.schema[c].dataType.simpleString()}" for c in group_cols]
        + ["x double", "y_iso double", "x_weight double"]
    )

    def pava_counts(pdf: pd.DataFrame) -> pd.DataFrame:
        g = (
            pdf.groupby("__x", as_index=False)
            .agg(num=("__num", "sum"), den=("__den", "sum"))
            .sort_values("__x")
            .reset_index(drop=True)
        )
        xs = g["__x"].tolist()
        nums = [int(v) for v in g["num"]]
        dens = [int(v) for v in g["den"]]
        pn: list[int] = []  # pool numerators
        pdn: list[int] = []  # pool denominators
        cnts: list[int] = []
        for i in range(len(xs)):
            pn.append(nums[i])
            pdn.append(dens[i])
            cnts.append(1)
            # violation test in exact integers: mean_prev > mean_last
            while len(pn) > 1 and pn[-2] * pdn[-1] > pn[-1] * pdn[-2]:
                n2, d2, c2 = pn.pop(), pdn.pop(), cnts.pop()
                pn[-1] += n2
                pdn[-1] += d2
                cnts[-1] += c2
        y_iso: list[float] = []
        for n, d, c in zip(pn, pdn, cnts):
            y_iso.extend([round(n / d, round_digits)] * c)
        res = pd.DataFrame(
            {"x": xs, "y_iso": y_iso, "x_weight": [float(d) for d in dens]}
        )
        for c in group_cols:
            res.insert(0, c, pdf[c].iloc[0])
        return res[group_cols + ["x", "y_iso", "x_weight"]]

    return base.groupBy(*group_cols).applyInPandas(
        pava_counts, schema=out_schema
    )
