"""Reference example-corpus semantics (FIXTURES.md §2).

Reconstructs the documented three-country corpus (shape and semantics from
the reference's examples/ and README query tour — not copied files) and
asserts the golden outcome: the flagship union+filters+projection query
returns exactly the India row (usa/japan match `any` but fail the AND
filters), lowercase indexes match case-insensitively, and geo distance
search finds near capitals.
"""

import json

import pytest
from pyspark.sql import functions as F

from egraphdb_spark.ingest import build_indexes, make_vertices, upsert_nodes
from egraphdb_spark.operators.search import search, search_ids

INDIA = {
    "name": "India",
    "capital": "New Delhi",
    "capital_geolocation": {"type": "Point", "coordinates": [77.20, 28.61]},
    "religions": ["Hinduism", "Islam", "Christianity", "Sikhism", "Buddhism", "Jainism", "Others"],
    "dominion": "1947-08-15",
    "geography": {"total_area_sq_km": 3287263, "water_percent": 9.6},
    "population": {"density_sq_km": 398.11},
    "currency": "INR",
    "currency_full": "Indian Rupee",
}
USA = {
    "name": "United States",
    "capital": "Washington, D.C.",
    "capital_geolocation": {"type": "Point", "coordinates": [-77.03, 38.90]},
    "religions": ["Christianity", "Others"],
    "declaration": "1776-07-04",
    "geography": {"total_area_sq_km": 9833520, "water_percent": 6.97},
    "population": {"density_sq_km": 33.6},
    "currency": "USD",
    "currency_full": "United States Dollar",
}
JAPAN = {
    "name": "Japan",
    "capital": "Tokyo",
    "capital_geolocation": {"type": "Point", "coordinates": [139.69, 35.68]},
    "religions": ["Shinto", "Buddhism"],
    "meji_constitution": "1890-11-29",
    "geography": {"total_area_sq_km": 377975, "water_percent": 1.4},
    "population": {"density_sq_km": 334.0},
    "currency": "JPY",
    "currency_full": "Japanese Yen",
}

GENERIC_PATHS = [
    ["currency"],
    ["capital_geolocation"],
    ["geography", "total_area_sq_km"],
    ["geography", "water_percent"],
    ["population", "density_sq_km"],
]
DATE_PATHS = {"India": ["dominion"], "United States": ["declaration"], "Japan": ["meji_constitution"]}
LC_PATHS = [["capital"], ["currency_full"]]


@pytest.fixture(scope="module")
def corpus(spark):
    rows = []
    for key, doc in (("india", INDIA), ("usa", USA), ("japan", JAPAN)):
        paths = GENERIC_PATHS + [DATE_PATHS[doc["name"]]]
        rows.append((key, json.dumps(doc), paths, LC_PATHS))
    nodes = spark.createDataFrame(
        rows,
        "key string, details string, index_paths array<array<string>>, "
        "lowercase_index_paths array<array<string>>",
    )
    vertices = make_vertices(nodes)
    return vertices, build_indexes(vertices)


def test_flagship_query_returns_india_only(corpus):
    vertices, indexes = corpus
    query = {
        "type": "index",
        "conditions": {
            "any": [
                {"key": "INR", "key_type": "text", "index_name": "currency"},
                {"key": "tokyo", "key_type": "text", "index_name": "capital_lc__"},
                {"key": [1.0, 50.0], "key_type": "double", "index_name": "water_percent"},
            ]
        },
        "filters": [
            {"key": "India", "key_type": "text", "index_json_path": ["name"]},
            {"key": 9.6, "key_type": "double", "index_json_path": ["geography", "water_percent"]},
            {"key": [0.6, 10.2], "key_type": "double", "index_json_path": ["geography", "water_percent"]},
        ],
        "selected_paths": {
            "name": ["name"],
            "religions": ["religions"],
            "water_percent": ["geography", "water_percent"],
        },
    }
    rows = search(vertices, indexes, query).collect()
    assert len(rows) == 1
    row = rows[0]
    assert row["name"] == "India"
    assert json.loads(row["religions"]) == INDIA["religions"]
    assert float(row["water_percent"]) == 9.6


def test_any_union_matches_all_three(corpus):
    vertices, indexes = corpus
    ids = search_ids(
        indexes,
        [
            {"key": "INR", "key_type": "text", "index_name": "currency"},
            {"key": "tokyo", "key_type": "text", "index_name": "capital_lc__"},
            {"key": [1.0, 50.0], "key_type": "double", "index_name": "water_percent"},
        ],
    )
    assert ids.count() == 3  # india by currency+range, japan by lc+range, usa by range


def test_index_type_inference(corpus):
    _, indexes = corpus
    types = {
        (r["index_name"], r["key_type"])
        for r in indexes.select("index_name", "key_type").distinct().collect()
    }
    assert ("currency", "text") in types
    assert ("capital_geolocation", "geo") in types
    assert ("total_area_sq_km", "int") in types
    assert ("water_percent", "double") in types
    assert ("dominion", "date") in types
    assert ("capital_lc__", "text") in types
    # exactly one v_* non-null per row
    bad = indexes.where(
        (
            F.col("v_int").isNotNull().cast("int")
            + F.col("v_double").isNotNull().cast("int")
            + F.col("v_text").isNotNull().cast("int")
            + F.col("v_date").isNotNull().cast("int")
            + F.col("v_ts").isNotNull().cast("int")
            + F.col("v_geo").isNotNull().cast("int")
        )
        != 1
    ).count()
    assert bad == 0


def test_lowercase_family_lowercases_values(corpus):
    _, indexes = corpus
    lc = {
        r["v_text"]
        for r in indexes.where(F.col("index_name") == "capital_lc__").collect()
    }
    assert lc == {"new delhi", "washington, d.c.", "tokyo"}


def test_geo_distance_search(corpus):
    vertices, indexes = corpus
    # Within 1000 km of Kanpur (80.35E, 26.46N) → only New Delhi's point.
    ids = search_ids(
        indexes,
        [
            {
                "key": {"type": "Point", "coordinates": [80.35, 26.46]},
                "key_type": "geo",
                "index_name": "capital_geolocation",
                "distance_sphere": 1_000_000.0,
            }
        ],
    )
    keys = [r["key"] for r in vertices.join(ids, "id", "left_semi").select("key").collect()]
    assert keys == ["india"]


def test_upsert_version_semantics(spark, corpus):
    vertices, _ = corpus
    changed = json.dumps({**INDIA, "population": {"density_sq_km": 400.0}})
    incoming = spark.createDataFrame(
        [("india", changed), ("germany", json.dumps({"name": "Germany"}))],
        "key string, details string",
    ).select(
        "key",
        "details",
        F.array(F.array(F.lit("name"))).alias("index_paths"),
        F.array().cast("array<array<string>>").alias("lowercase_index_paths"),
    )
    merged = upsert_nodes(vertices, make_vertices(incoming))
    got = {r["key"]: r["version"] for r in merged.select("key", "version").collect()}
    assert got["india"] == 1  # changed payload bumps
    assert got["germany"] == 0  # new key starts at 0
    assert got["usa"] == 0  # untouched
    # idempotent re-upsert of identical payload keeps version
    again = upsert_nodes(merged, make_vertices(incoming))
    got2 = {r["key"]: r["version"] for r in again.select("key", "version").collect()}
    assert got2["india"] == 1
