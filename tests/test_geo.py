"""Semantic tests for the geospatial grid operators (operators/geo.py).
The DuckDB all-pairs oracle already proves recall 1.0 on the fixture
points; these pin the harder structural claims — the ±180 longitude
seam, exact-boundary behavior, and brute-force equality on synthetic
configurations the fixtures may never hit."""

from __future__ import annotations

import math

from .conftest import SF_CORRECT


def _haversine(lat1, lon1, lat2, lon2):
    dphi = math.radians((lat2 - lat1) / 2)
    dlam = math.radians((lon2 - lon1) / 2)
    h = (
        math.sin(dphi) ** 2
        + math.cos(math.radians(lat1))
        * math.cos(math.radians(lat2))
        * math.sin(dlam) ** 2
    )
    return 2 * 6371.0 * math.asin(math.sqrt(h))


def test_radius_join_equals_brute_force_on_fixture(spark):
    from spring_and_kafka_spark.operators.geo import (
        _GEO_RADIUS_KM,
        geo_points,
        q_geo_radius_join,
    )

    pts = {
        r["id"]: (r["lat"], r["lon"])
        for r in geo_points(spark, SF_CORRECT).collect()
    }
    ids = sorted(pts)
    expected = set()
    for i, a in enumerate(ids):
        for b in ids[i + 1 :]:
            if _haversine(*pts[a], *pts[b]) <= _GEO_RADIUS_KM:
                expected.add((a, b))
    got = {
        (r["a_id"], r["b_id"])
        for r in q_geo_radius_join(spark, SF_CORRECT).collect()
    }
    assert got == expected and len(got) > 0


def test_radius_join_finds_pairs_across_the_antimeridian(spark):
    """Two points straddling lon=±180 are ~55 km apart on the sphere but
    in the first and last longitude grid cells — only the wraparound
    neighbor arithmetic can pair them."""
    from spring_and_kafka_spark.operators.geo import radius_join

    points = spark.createDataFrame(
        [
            (1, 10.0, 179.75),
            (2, 10.0, -179.75),  # ≈ 0.5° of longitude from point 1
            (3, 10.0, 170.0),  # far from both
            # lon = 180.0 exactly: bins past the last cell unless the
            # BUILD side wraps too (probe-only wrap missed this pair)
            (4, 10.0, 180.0),
        ],
        "id long, lat double, lon double",
    )
    got = {
        (r["a_id"], r["b_id"]): r["dist_km"]
        for r in radius_join(points, 100.0).collect()
    }
    assert set(got) == {(1, 2), (1, 4), (2, 4)}
    assert abs(got[(1, 2)] - _haversine(10.0, 179.75, 10.0, -179.75)) < 0.01


def test_radius_join_boundary_is_inclusive_and_no_self_pairs(spark):
    from spring_and_kafka_spark.operators.geo import radius_join

    # 1° of latitude ≈ 111.19 km: inside a 112 km radius, outside 111
    points = spark.createDataFrame(
        [(1, 0.0, 0.0), (2, 1.0, 0.0)],
        "id long, lat double, lon double",
    )
    d = _haversine(0.0, 0.0, 1.0, 0.0)
    inside = radius_join(points, d + 0.5).collect()
    outside = radius_join(points, d - 0.5).collect()
    assert [(r["a_id"], r["b_id"]) for r in inside] == [(1, 2)]
    assert outside == []


def test_grid_density_counts_match_point_total(spark):
    from spring_and_kafka_spark.operators.geo import (
        geo_points,
        q_geo_grid_density,
    )

    rows = q_geo_grid_density(spark, SF_CORRECT).collect()
    n_points = geo_points(spark, SF_CORRECT).count()
    # cells with ≥2 points can't hold more than all points; every listed
    # cell is inside the fabricated coordinate envelope
    assert 0 < sum(r["n_points"] for r in rows) <= n_points
    for r in rows:
        assert 15 <= r["cell_lat"] <= 75  # lat ∈ [-60, 60) → cells 15..74
        assert 0 <= r["cell_lon"] < 180


def test_nearest_within_crosses_the_antimeridian_and_breaks_ties(spark):
    """The per-point argmin must see candidates generated across the
    ±180 seam, pick the true closest among several in-radius neighbors,
    and break exact-distance ties on the lower neighbor id."""
    from spring_and_kafka_spark.operators.geo import nearest_within

    points = spark.createDataFrame(
        [
            (1, 10.0, 179.75),
            (2, 10.0, -179.75),  # ≈55 km from 1 across the seam
            (3, 10.0, 179.30),  # ≈49 km from 1 on the same side — closer
            (4, 0.0, 0.0),  # isolated: no neighbor within 100 km
            # 6 and 7 are equidistant from 5 (symmetric ±0.3°): tie →
            # lower id wins
            (5, 20.0, 10.0),
            (6, 20.0, 10.3),
            (7, 20.0, 9.7),
        ],
        "id long, lat double, lon double",
    )
    got = {
        r["id"]: (r["nn_id"], r["dist_km"])
        for r in nearest_within(points, 100.0).collect()
    }
    assert 4 not in got  # isolated points produce no row
    assert got[1][0] == 3  # same-side neighbor beats the seam pair
    assert got[2][0] == 1  # seam crossing is 2's only in-radius option
    assert got[3][0] == 1
    assert got[5][0] == 6  # tie with 7 broken on lower id
    assert got[6][0] == 5 and got[7][0] == 5
    assert abs(got[2][1] - 55.0) < 2.0
