"""Spatial operators: haversine distance and grid-bucketed radius joins.

The reference carries station coordinates (LATITUDE/LONGITUDE in the
fixed-width stations file, ``src/ingest/data_downloader.py`` scope) but
only ever filters by state; nearest-neighbor and within-radius lookups
are the natural spatial extension (fill a station's gaps from its
neighbors, QA a reading against nearby stations, join events to the
closest facility).

Scale design — the grid-bucket construction (same family as the
temporal range join's gap-width bucketing, ``operators/joins.py``):
a naive within-radius join is an all-pairs cross product. Instead each
point is assigned to a square grid cell sized >= the search radius;
every candidate pair within ``radius_km`` then lives in the SAME or an
ADJACENT cell, so duplicating the LEFT side into its 3x3 cell
neighborhood (a 9x explode, plan literal) turns the spatial predicate
into an EQUI-join on cell id that Spark hash-partitions like any other
join. Exact haversine then filters the candidates. Cost: 9x left rows
shuffled, zero false negatives; skewed cells (dense cities) are
ordinary hot keys — AQE skew-join or ``operators/skew.py`` salting
applies unchanged.
"""

from __future__ import annotations

import math

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

EARTH_RADIUS_KM = 6371.0088  # IUGG mean Earth radius

__all__ = ["haversine_km", "grid_cell", "radius_join", "EARTH_RADIUS_KM"]


def haversine_km(
    lat1: Column | str,
    lon1: Column | str,
    lat2: Column | str,
    lon2: Column | str,
) -> Column:
    """Great-circle distance in km (haversine), pure Column arithmetic —
    JVM-side, codegen-friendly, no UDF. Accurate to ~0.5% (spherical
    model), the standard choice for radius filtering."""
    c = lambda v: F.col(v) if isinstance(v, str) else v  # noqa: E731
    rlat1, rlat2 = F.radians(c(lat1)), F.radians(c(lat2))
    dlat = F.radians(c(lat2) - c(lat1))
    dlon = F.radians(c(lon2) - c(lon1))
    a = (
        F.sin(dlat / 2) * F.sin(dlat / 2)
        + F.cos(rlat1) * F.cos(rlat2) * F.sin(dlon / 2) * F.sin(dlon / 2)
    )
    return F.lit(2.0 * EARTH_RADIUS_KM) * F.asin(F.sqrt(a))


def grid_cell(
    lat: Column | str, lon: Column | str, cell_deg: float
) -> tuple[Column, Column]:
    """(row, col) index of the square lat/lon grid cell containing the
    point. ``cell_deg`` must make a cell at least as wide as the search
    radius EVERYWHERE the data lives — see ``radius_join``."""
    la = F.col(lat) if isinstance(lat, str) else lat
    lo = F.col(lon) if isinstance(lon, str) else lon
    return (
        F.floor(la / F.lit(cell_deg)).cast("long"),
        F.floor(lo / F.lit(cell_deg)).cast("long"),
    )


def radius_join(
    left: DataFrame,
    right: DataFrame,
    radius_km: float,
    left_coords: tuple[str, str] = ("lat", "lon"),
    right_coords: tuple[str, str] = ("lat", "lon"),
    max_abs_lat: float = 66.0,
    distance_col: str = "distance_km",
) -> DataFrame:
    """All (left, right) pairs within ``radius_km``, as an equi-join.

    Cell size is radius_km converted to degrees at the WORST-CASE
    latitude of the data (longitude degrees shrink by cos(lat); the
    caller asserts data stays within ``max_abs_lat``): one degree of
    latitude is ~111.2 km (spherical model), one degree of longitude is
    ~111.2*cos(lat) km — the conversion constant is deliberately a LOW
    110.0 km/deg so the computed cell is strictly LARGER than the
    radius (an overestimate would shrink cells below the radius and
    silently drop boundary pairs). With cells >= the radius in both axes, every
    qualifying pair is in the same or an adjacent cell — the left side
    explodes into its 3x3 neighborhood (plan-literal array, 9x rows),
    the join is a plain hash equi-join on (cell_r, cell_c), and exact
    ``haversine_km`` filters candidates. Polar data (|lat| >
    ``max_abs_lat``) is refused rather than silently missed: longitude
    cells degenerate there, a different tiling (or a cross join per
    polar cap) is needed.

    Columns from both sides are kept (collisions suffixed ``_r``), plus
    ``distance_col``.
    """
    if radius_km <= 0:
        raise ValueError("radius_km must be positive")
    cos_worst = math.cos(math.radians(max_abs_lat))
    cell_deg = radius_km / (110.0 * cos_worst)  # 110.0 < true km/deg: safe

    l_lat, l_lon = left_coords
    r_lat, r_lon = right_coords
    for df, (la, lo) in ((left, left_coords), (right, right_coords)):
        if la not in df.columns or lo not in df.columns:
            raise ValueError(f"missing coordinate column {la!r}/{lo!r}")

    # refuse data the tiling can't serve (cheap aggregate, fails loudly)
    bad = (
        left.select(F.max(F.abs(F.col(l_lat))).alias("m"))
        .unionByName(right.select(F.max(F.abs(F.col(r_lat))).alias("m")))
        .agg(F.max("m").alias("m"))
        .collect()[0]["m"]
    )
    if bad is not None and bad > max_abs_lat:
        raise ValueError(
            f"latitudes reach {bad:.2f} > max_abs_lat={max_abs_lat}; "
            "longitude grid cells degenerate toward the poles"
        )

    for df, side in ((left, "left"), (right, "right")):
        clash = {"__cr", "__cc", distance_col} & set(df.columns)
        if clash:
            raise ValueError(f"{side} side carries reserved column(s): {sorted(clash)}")

    rr, rc = grid_cell(r_lat, r_lon, cell_deg)
    r = right.withColumn("__cr", rr).withColumn("__cc", rc)
    # collision-suffix right columns; refuse a left column that already
    # uses a suffixed name (the rename would silently duplicate it)
    overlap = set(left.columns) & set(right.columns)
    taken = {f"{c}_r" for c in overlap} & set(left.columns)
    if taken:
        raise ValueError(
            f"left side already has suffixed column(s) {sorted(taken)}; "
            "rename before joining"
        )
    for c_ in overlap:
        r = r.withColumnRenamed(c_, f"{c_}_r")
    r_lat2 = f"{r_lat}_r" if r_lat in overlap else r_lat
    r_lon2 = f"{r_lon}_r" if r_lon in overlap else r_lon

    lr, lc = grid_cell(l_lat, l_lon, cell_deg)
    offsets = F.expr(
        "array(-1L, 0L, 1L)"
    )
    l = (
        left.withColumn("__r0", lr)
        .withColumn("__c0", lc)
        .withColumn("__dr", F.explode(offsets))
        .withColumn("__dc", F.explode(offsets))
        .withColumn("__cr", F.col("__r0") + F.col("__dr"))
        .withColumn("__cc", F.col("__c0") + F.col("__dc"))
        .drop("__r0", "__c0", "__dr", "__dc")
    )
    d = haversine_km(l_lat, l_lon, r_lat2, r_lon2)
    return (
        l.join(r, on=["__cr", "__cc"])
        .where(d <= F.lit(float(radius_km)))
        .drop("__cr", "__cc")
        .withColumn(distance_col, d)
    )
