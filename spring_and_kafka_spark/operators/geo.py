"""Geospatial operators: grid-bucketed radius join and grid density
(SURVEY.md §2 north-star mandate — the spatial arm of event/entity
analytics; reference README.md:329's "count, filter, enrich or
transform" pipeline grown to location-aware enrichment).

Coordinates are fabricated deterministically from customer keys via md5
(the q_pii_scan / q_sample_temperature precedent — the fixtures carry no
geo columns), capped to |lat| ≤ 60 so a fixed 2° grid cell is ≥ 111 km
wide everywhere and therefore always covers the 100 km search radius.

The radius join is the spatial instance of this engine's one
candidate-generation law (DESIGN.md #4): never go quadratic — bucket
into grid cells, probe each point against its 3×3 neighborhood (with
longitude wraparound at ±180), verify the exact haversine distance on
candidates only. The DuckDB oracle computes the ALL-PAIRS ground truth,
so the driver hash match proves the grid's candidate recall is exactly
1.0, the same verification pattern as the LSH dedup family.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window as W

from spring_and_kafka_spark.registry import register
from spring_and_kafka_spark.sources.tables import load_table

_GEO_MAX_KEY = 1000  # point subset: customers with c_custkey <= this
_GEO_CELL_DEG = 2  # grid cell size (degrees); 2° lon at lat 60 ≈ 111 km
_GEO_RADIUS_KM = 100.0  # search radius; < min cell width
_GEO_LON_CELLS = 360 // _GEO_CELL_DEG
# 6 hex digits scaled by 2^24 (NOT 0xFFFFFF): the exclusive divisor
# keeps u/_U24 strictly in [0, 1) — with 0xFFFFFF a key hashing to
# 'ffffff' would fabricate lon = 180.0 / lat = 60.0 exactly, landing in
# a grid cell past the wrap seam (llm/pipeline.py uses the same 2^24
# convention for its acceptance uniforms)
_U24 = float(1 << 24)

# Shared point-fabrication SQL (DuckDB): lat in [-60, 60), lon in
# [-180, 180), both from the first 6 md5 hex digits of a salted key.
_GEO_POINTS_SQL = f"""points AS (
      SELECT c_custkey AS id,
             CAST('0x' || substr(md5(CAST(c_custkey AS VARCHAR) || '-lat'),
                                 1, 6) AS BIGINT) / {_U24} * 120 - 60
               AS lat,
             CAST('0x' || substr(md5(CAST(c_custkey AS VARCHAR) || '-lon'),
                                 1, 6) AS BIGINT) / {_U24} * 360 - 180
               AS lon
      FROM customer WHERE c_custkey <= {_GEO_MAX_KEY}
    )"""

_HAVERSINE_SQL = """2 * 6371.0 * asin(sqrt(
      sin(radians(({lat2} - {lat1}) / 2)) * sin(radians(({lat2} - {lat1}) / 2))
      + cos(radians({lat1})) * cos(radians({lat2}))
        * sin(radians(({lon2} - {lon1}) / 2))
        * sin(radians(({lon2} - {lon1}) / 2))))"""


def geo_points(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(id, lat, lon): deterministic per-customer coordinates — the
    Spark twin of _GEO_POINTS_SQL, bit-identical doubles (md5 hex → int
    → the same IEEE divide/scale in both engines)."""
    c = load_table(spark, sf_dir, "customer").filter(
        F.col("c_custkey") <= _GEO_MAX_KEY
    )

    def coord(salt: str, span: int, lo: int) -> F.Column:
        u = F.conv(
            F.substring(
                F.md5(F.concat(F.col("c_custkey").cast("string"), F.lit(salt))),
                1,
                6,
            ),
            16,
            10,
        ).cast("long")
        return u / F.lit(_U24) * span + lo

    return c.select(
        F.col("c_custkey").alias("id"),
        coord("-lat", 120, -60).alias("lat"),
        coord("-lon", 360, -180).alias("lon"),
    )


def _haversine(lat1, lon1, lat2, lon2) -> F.Column:
    dphi = F.radians((lat2 - lat1) / 2)
    dlam = F.radians((lon2 - lon1) / 2)
    h = F.sin(dphi) * F.sin(dphi) + F.cos(F.radians(lat1)) * F.cos(
        F.radians(lat2)
    ) * F.sin(dlam) * F.sin(dlam)
    return 2 * 6371.0 * F.asin(F.sqrt(h))


@register(
    "q_geo_grid_density",
    oracle=f"""
    WITH {_GEO_POINTS_SQL},
    cells AS (
      SELECT CAST(floor((lat + 90) / {_GEO_CELL_DEG}) AS BIGINT) AS cell_lat,
             CAST(floor((lon + 180) / {_GEO_CELL_DEG}) AS BIGINT) AS cell_lon,
             count(*) AS n_points
      FROM points GROUP BY 1, 2
    )
    SELECT cell_lat, cell_lon, CAST(n_points AS BIGINT) AS n_points
    FROM cells WHERE n_points >= 2
    ORDER BY cell_lat, cell_lon
    """,
)
def q_geo_grid_density(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Spatial density rollup: points binned to the fixed 2° grid, cells
    with ≥ 2 points reported — the heat-map / hot-cell readout that also
    decides whether the radius join below needs per-cell capping (a city
    cell at 100 TB is the spatial analog of an LSH hot bucket). One
    map-side-combined aggregation; the cell id is row-local math."""
    pts = geo_points(spark, sf_dir)
    return (
        pts.groupBy(
            F.floor((F.col("lat") + 90) / _GEO_CELL_DEG)
            .cast("long")
            .alias("cell_lat"),
            F.floor((F.col("lon") + 180) / _GEO_CELL_DEG)
            .cast("long")
            .alias("cell_lon"),
        )
        .agg(F.count("*").alias("n_points"))
        .filter(F.col("n_points") >= 2)
        .orderBy("cell_lat", "cell_lon")
    )


@register(
    "q_geo_radius_join",
    oracle=f"""
    WITH {_GEO_POINTS_SQL}
    SELECT a.id AS a_id, b.id AS b_id,
           round({_HAVERSINE_SQL.format(lat1="a.lat", lon1="a.lon",
                                        lat2="b.lat", lon2="b.lon")}, 3)
             AS dist_km
    FROM points a JOIN points b ON a.id < b.id
    WHERE {_HAVERSINE_SQL.format(lat1="a.lat", lon1="a.lon",
                                 lat2="b.lat", lon2="b.lon")}
          <= {_GEO_RADIUS_KM}
    ORDER BY a_id, b_id
    """,
)
def q_geo_radius_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Radius self-join: all point pairs within 100 km, by grid-cell
    candidate generation + exact haversine verify. Each point is
    replicated to its 3×3 neighbor cells (longitude wrapping at ±180) as
    the probe side and joins the build side's home cell, so a pair of
    neighbors meets exactly once per orientation and the a<b filter
    keeps one; candidates then pass the exact distance check. The oracle
    is the quadratic all-pairs ground truth — the hash match proves the
    2° cell (≥ 111 km wide at |lat| ≤ 60) misses no ≤ 100 km pair.

    Scale shape: shuffle O(points × 9) probe rows joined on cell id —
    the spatial equivalent of LSH banding; the quadratic form never
    runs on the cluster. Skewed cells (cities) are visible in
    q_geo_grid_density and would get the same cap/salt treatment as hot
    LSH buckets."""
    return radius_join(geo_points(spark, sf_dir), _GEO_RADIUS_KM)


def _radius_pairs(points: DataFrame, radius_km: float) -> DataFrame:
    """Unordered grid-blocked radius pairs (a_id < b_id, dist_km) —
    the shared candidate-generation core of q_geo_radius_join (which
    adds the presentation sort) and q_geo_nearest (which argmins per
    point and must NOT pay a global sort first)."""
    pts = points.select(
        "id",
        "lat",
        "lon",
        F.floor((F.col("lat") + 90) / _GEO_CELL_DEG)
        .cast("long")
        .alias("cell_lat"),
        F.floor((F.col("lon") + 180) / _GEO_CELL_DEG)
        .cast("long")
        .alias("cell_lon"),
    )
    offsets = F.array(*[F.lit(i) for i in (-1, 0, 1)])
    probe = (
        pts.select(
            "id",
            "lat",
            "lon",
            "cell_lat",
            "cell_lon",
            F.explode(offsets).alias("dlat"),
        )
        .select(
            "id",
            "lat",
            "lon",
            (F.col("cell_lat") + F.col("dlat")).alias("pcell_lat"),
            "cell_lon",
            F.explode(offsets).alias("dlon"),
        )
        .select(
            F.col("id").alias("a_id"),
            F.col("lat").alias("a_lat"),
            F.col("lon").alias("a_lon"),
            "pcell_lat",
            # wraparound: the cell left of lon-cell 0 is the last cell
            (
                (F.col("cell_lon") + F.col("dlon") + _GEO_LON_CELLS)
                % _GEO_LON_CELLS
            ).alias("pcell_lon"),
        )
    )
    build = pts.select(
        F.col("id").alias("b_id"),
        F.col("lat").alias("b_lat"),
        F.col("lon").alias("b_lon"),
        "cell_lat",
        # same wrap as the probe side: a caller-supplied lon of exactly
        # 180.0 bins past the seam into cell _GEO_LON_CELLS, which no
        # probe cell could reach un-normalized
        (F.col("cell_lon") % _GEO_LON_CELLS).alias("cell_lon"),
    )
    cand = probe.join(
        build,
        (F.col("pcell_lat") == F.col("cell_lat"))
        & (F.col("pcell_lon") == F.col("cell_lon"))
        & (F.col("a_id") < F.col("b_id")),
    )
    dist = _haversine(
        F.col("a_lat"), F.col("a_lon"), F.col("b_lat"), F.col("b_lon")
    )
    return (
        cand.select(
            "a_id", "b_id", F.round(dist, 3).alias("dist_km"), dist.alias("_d")
        )
        .filter(F.col("_d") <= radius_km)
        .drop("_d")
    )


def radius_join(points: DataFrame, radius_km: float) -> DataFrame:
    """Grid candidate generation + exact haversine verify over a
    (id, lat, lon) frame — see q_geo_radius_join. Factored out so tests
    can drive it with synthetic points (the ±180 longitude seam, exact
    radius boundaries). radius_km must not exceed the minimum cell
    width (111 km at |lat| = 60 with the 2° grid) or the 3×3
    neighborhood stops covering the search disc."""
    return _radius_pairs(points, radius_km).orderBy("a_id", "b_id")


@register(
    "q_geo_nearest",
    oracle=f"""
    WITH {_GEO_POINTS_SQL},
    pairs AS (
      SELECT a.id AS id, b.id AS nn_id,
             round({_HAVERSINE_SQL.format(lat1="a.lat", lon1="a.lon",
                                          lat2="b.lat", lon2="b.lon")}, 3)
               AS dist_km
      FROM points a JOIN points b ON a.id <> b.id
      WHERE {_HAVERSINE_SQL.format(lat1="a.lat", lon1="a.lon",
                                   lat2="b.lat", lon2="b.lon")}
            <= {_GEO_RADIUS_KM}
    ),
    ranked AS (
      SELECT id, nn_id, dist_km,
             row_number() OVER (PARTITION BY id
                                ORDER BY dist_km, nn_id) AS rn
      FROM pairs
    )
    SELECT id, nn_id, dist_km FROM ranked WHERE rn = 1 ORDER BY id
    """,
)
def q_geo_nearest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Nearest-neighbor-within-radius: for every point that has at least
    one neighbor inside 100 km, its closest such neighbor and the
    distance — the spatial enrichment ("closest store / nearest depot")
    that follows the radius join in any location pipeline.

    Built on the SAME grid-blocked candidate pairs as q_geo_radius_join
    (each undirected pair symmetrized into both directions), then a
    per-id row_number argmin — so the only new cost over the radius join
    is one shuffle on id whose per-key group is bounded by the points in
    a 100 km disc, never the whole dataset. Argmin orders on the 3-dp
    ROUNDED distance with an nn_id tiebreak in both engines: ranking on
    the raw double would let 1-ulp trig divergence between JVM and
    DuckDB libm flip near-equal neighbors. The oracle is the quadratic
    all-pairs ground truth, so the hash match re-proves grid recall 1.0
    on the argmin path too."""
    return nearest_within(geo_points(spark, sf_dir), _GEO_RADIUS_KM)


def nearest_within(points: DataFrame, radius_km: float) -> DataFrame:
    """Per-point nearest neighbor inside ``radius_km`` over an
    (id, lat, lon) frame — see q_geo_nearest. Factored out (the
    radius_join precedent) so tests can drive it with synthetic points:
    the ±180 seam and tie handling are structural claims the fixture's
    random points never exercise.

    Symmetrization is a per-row explode of the two orientations, NOT a
    self-union of the pair plan: union branches are planned as
    independent subplans, so the 9×-replicated cell join + haversine
    verify would execute twice — explode runs the candidate generation
    once and merely doubles the (tiny) verified pair rows."""
    rj = _radius_pairs(points, radius_km)
    sym = rj.select(
        F.explode(
            F.array(
                F.struct(
                    F.col("a_id").alias("id"),
                    F.col("b_id").alias("nn_id"),
                    F.col("dist_km"),
                ),
                F.struct(
                    F.col("b_id").alias("id"),
                    F.col("a_id").alias("nn_id"),
                    F.col("dist_km"),
                ),
            )
        ).alias("e")
    ).select("e.id", "e.nn_id", "e.dist_km")
    w = W.partitionBy("id").orderBy("dist_km", "nn_id")
    return (
        sym.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("id", "nn_id", "dist_km")
        .orderBy("id")
    )
