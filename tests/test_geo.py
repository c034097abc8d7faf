"""Geo: haversine constant and the bbox prefilter's superset guarantee."""

from __future__ import annotations

from pyspark.sql import functions as F

from egraphdb_spark.functions.geo import SPHERE_RADIUS_M, bbox_prefilter, haversine_m


def test_haversine_known_distance(spark):
    # Delhi → Mumbai ≈ 1,150 km on MySQL's sphere
    row = spark.range(1).select(
        haversine_m(F.lit(77.2090), F.lit(28.6139), F.lit(72.8777), F.lit(19.0760)).alias("d")
    ).collect()[0]
    assert 1_130_000 < row["d"] < 1_170_000


def test_bbox_is_superset_of_disk(spark):
    """Every point inside the haversine disk must survive the bbox
    prefilter — at equator, mid-latitude, high latitude, near dateline."""
    import itertools

    centers = [(0.0, 0.0), (10.0, 48.0), (20.0, 75.0), (179.5, 30.0), (-179.5, -40.0)]
    dist = 300_000.0
    # ring of probe points around each center, just inside the disk radius
    rows = []
    for cx, cy in centers:
        for ang in range(0, 360, 15):
            import math

            r = dist / SPHERE_RADIUS_M  # radians
            lat = math.degrees(
                math.asin(
                    math.sin(math.radians(cy)) * math.cos(r * 0.95)
                    + math.cos(math.radians(cy)) * math.sin(r * 0.95) * math.cos(math.radians(ang))
                )
            )
            lon = cx + math.degrees(
                math.atan2(
                    math.sin(math.radians(ang)) * math.sin(r * 0.95) * math.cos(math.radians(cy)),
                    math.cos(r * 0.95) - math.sin(math.radians(cy)) * math.sin(math.radians(lat)),
                )
            )
            if lon > 180:
                lon -= 360
            if lon < -180:
                lon += 360
            rows.append((cx, cy, lon, lat))
    df = spark.createDataFrame(rows, "cx double, cy double, lon double, lat double")
    checked = df.select(
        "*",
        (haversine_m(F.col("lon"), F.col("lat"), F.col("cx"), F.col("cy")) <= dist).alias(
            "in_disk"
        ),
    )
    # evaluate the bbox per center (bbox_prefilter takes Python-literal centers)
    misses = 0
    for cx, cy in centers:
        sub = checked.where((F.col("cx") == cx) & (F.col("cy") == cy))
        bad = sub.where(
            F.col("in_disk")
            & ~bbox_prefilter(F.col("lon"), F.col("lat"), cx, cy, dist)
        ).count()
        misses += bad
    assert misses == 0  # bbox never drops a true disk member


def test_geo_knearest_hand_computed(spark):
    """k-nearest on a hand-laid grid: nearest-by-haversine order, id
    tie-break, and the radius_m prefilter returning the same set when
    the bound covers the k-th distance."""
    from egraphdb_spark.operators.search import geo_knearest

    pts = [
        (1, 0.0, 0.0), (2, 1.0, 0.0), (3, 0.0, 2.0),
        (4, 5.0, 5.0), (5, -1.0, 0.0),
    ]
    idx = spark.createDataFrame(
        [
            (i, "geo_idx", {"type": "Point", "coordinates": [lon, lat]})
            for i, lon, lat in pts
        ]
        + [(9, "other_idx", {"type": "Point", "coordinates": [0.0, 0.0]})],
        "id long, index_name string,"
        " v_geo struct<type: string, coordinates: array<double>>",
    )
    got = geo_knearest(idx, "geo_idx", 0.0, 0.0, 3).collect()
    # id 1 at 0 m; ids 2 and 5 tie at 1 degree — id ascending breaks it
    assert [r.id for r in got] == [1, 2, 5]
    assert got[0].dist_m == 0.0
    assert abs(got[1].dist_m - got[2].dist_m) < 1e-6
    # other_idx never leaks in even at distance 0
    assert 9 not in {r.id for r in got}
    # radius bound covering the 3rd distance: identical set
    bounded = geo_knearest(idx, "geo_idx", 0.0, 0.0, 3, radius_m=200_000.0)
    assert [r.id for r in bounded.collect()] == [1, 2, 5]
    # too-tight bound: honestly fewer rows, never wrong ones
    tight = geo_knearest(idx, "geo_idx", 0.0, 0.0, 3, radius_m=10_000.0)
    assert [r.id for r in tight.collect()] == [1]
