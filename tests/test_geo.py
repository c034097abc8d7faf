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
