"""Spatial operators (operators/geo.py): haversine math and the
grid-bucketed radius join (no-false-negative candidate generation +
equi-join plan shape)."""

from __future__ import annotations

import math
import random

import pytest
from pyspark.sql import functions as F

from ghcn_d_etl_project_spark.operators.geo import (
    EARTH_RADIUS_KM,
    haversine_km,
    radius_join,
)


def _hav_ref(lat1, lon1, lat2, lon2):
    p1, p2 = math.radians(lat1), math.radians(lat2)
    dp, dl = math.radians(lat2 - lat1), math.radians(lon2 - lon1)
    a = math.sin(dp / 2) ** 2 + math.cos(p1) * math.cos(p2) * math.sin(dl / 2) ** 2
    return 2 * EARTH_RADIUS_KM * math.asin(math.sqrt(a))


def test_haversine_known_distances(spark):
    # Atlanta -> Athens GA ~96km; Atlanta -> itself 0; equator degree ~111.32km
    pts = [
        (33.749, -84.388, 33.957, -83.376),
        (33.749, -84.388, 33.749, -84.388),
        (0.0, 0.0, 0.0, 1.0),
    ]
    df = spark.createDataFrame(pts, "lat1 double, lon1 double, lat2 double, lon2 double")
    got = [
        r.d
        for r in df.select(
            haversine_km("lat1", "lon1", "lat2", "lon2").alias("d")
        ).collect()
    ]
    for g, p in zip(got, pts):
        assert g == pytest.approx(_hav_ref(*p), abs=1e-9)
    assert got[1] == 0.0
    # one equatorial degree under the spherical model: 2*pi*R/360
    assert got[2] == pytest.approx(2 * math.pi * EARTH_RADIUS_KM / 360, abs=1e-9)


def test_radius_join_matches_brute_force(spark):
    """Seeded random cloud over north Georgia: the grid join's pair set
    must equal the all-pairs brute force — including pairs that straddle
    grid-cell boundaries (the reason for the 3x3 neighbor explode)."""
    rng = random.Random(42)
    pts = [
        (i, 33.0 + rng.random() * 2.0, -85.0 + rng.random() * 2.0)
        for i in range(120)
    ]
    radius = 20.0
    want = {
        (a[0], b[0])
        for a in pts
        for b in pts
        if _hav_ref(a[1], a[2], b[1], b[2]) <= radius
    }
    df = spark.createDataFrame(pts, "pid long, lat double, lon double")
    out = radius_join(df, df, radius_km=radius)
    got = {(r.pid, r.pid_r) for r in out.collect()}
    assert got == want
    # distances reported are the exact haversine
    for r in out.limit(20).collect():
        la, lo = next((p[1], p[2]) for p in pts if p[0] == r.pid)
        lb, lb2 = next((p[1], p[2]) for p in pts if p[0] == r.pid_r)
        assert r.distance_km == pytest.approx(_hav_ref(la, lo, lb, lb2), abs=1e-9)


def test_radius_join_is_equi_join_not_cartesian(spark):
    pts = [(i, 33.0 + i * 0.01, -84.0) for i in range(30)]
    df = spark.createDataFrame(pts, "pid long, lat double, lon double")
    plan = (
        radius_join(df, df, radius_km=5.0)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "CartesianProduct" not in plan, plan[:1200]
    assert "BroadcastNestedLoopJoin" not in plan, plan[:1200]


def test_radius_join_refuses_polar_data(spark):
    df = spark.createDataFrame(
        [(1, 80.0, 10.0), (2, 80.1, 10.0)], "pid long, lat double, lon double"
    )
    with pytest.raises(ValueError, match="max_abs_lat"):
        radius_join(df, df, radius_km=10.0)


def test_radius_join_validates_inputs(spark):
    df = spark.createDataFrame([(1, 0.0, 0.0)], "pid long, lat double, lon double")
    with pytest.raises(ValueError, match="radius_km"):
        radius_join(df, df, radius_km=0.0)
    with pytest.raises(ValueError, match="coordinate"):
        radius_join(df, df.select("pid"), radius_km=1.0)


def test_radius_join_refuses_suffix_and_reserved_collisions(spark):
    df = spark.createDataFrame([(1, 0.0, 0.0)], "pid long, lat double, lon double")
    with_suffixed = df.withColumn("lat_r", F.lit(0.0))
    with pytest.raises(ValueError, match="suffixed"):
        radius_join(with_suffixed, df, radius_km=1.0)
    with_reserved = df.withColumn("distance_km", F.lit(0.0))
    with pytest.raises(ValueError, match="reserved"):
        radius_join(df, with_reserved, radius_km=1.0)
