"""Typed index extraction edge cases (SURVEY.md §7 risk 1 — typed-compare
semantics must match the reference's infer-then-convert exactly)."""

from __future__ import annotations

from pyspark.sql import functions as F

from egraphdb_spark.ingest import build_indexes, make_vertices


def _vertices(spark, details: str, paths: list[list[str]]):
    df = spark.createDataFrame(
        [("k1", details)], "key string, details string"
    ).select(
        "key",
        "details",
        F.array(*[F.array(*[F.lit(p) for p in pp]) for pp in paths]).alias("index_paths")
        if paths
        else F.array().cast("array<array<string>>").alias("index_paths"),
        F.array().cast("array<array<string>>").alias("lowercase_index_paths"),
    )
    return make_vertices(df)


def _one_index(spark, value_json: str):
    v = _vertices(spark, '{"f": %s}' % value_json, [["f"]])
    rows = build_indexes(v).collect()
    assert len(rows) == 1
    return rows[0]


def test_int_inference(spark):
    r = _one_index(spark, "42")
    assert r["key_type"] == "int" and r["v_int"] == 42


def test_double_inference(spark):
    r = _one_index(spark, "9.6")
    assert r["key_type"] == "double" and r["v_double"] == 9.6


def test_valid_date(spark):
    r = _one_index(spark, '"2024-02-29"')  # leap day parses
    assert r["key_type"] == "date" and str(r["v_date"]) == "2024-02-29"


def test_invalid_date_shape_falls_back_to_text(spark):
    # matches the YYYY-MM-DD regex but does not parse — reference stores text
    r = _one_index(spark, '"2024-02-30"')
    assert r["key_type"] == "text" and r["v_text"] == "2024-02-30"


def test_datetime_inference(spark):
    r = _one_index(spark, '"2024-03-01 10:20:30"')
    assert r["key_type"] == "datetime" and str(r["v_ts"]) == "2024-03-01 10:20:30"


def test_invalid_datetime_falls_back_to_text(spark):
    r = _one_index(spark, '"2024-03-01 25:00:00"')
    assert r["key_type"] == "text"


def test_geo_point(spark):
    r = _one_index(spark, '{"type": "Point", "coordinates": [77.2, 28.6]}')
    assert r["key_type"] == "geo"
    assert list(r["v_geo"]["coordinates"]) == [77.2, 28.6]


def test_unicode_and_empty_text(spark):
    assert _one_index(spark, '"नमस्ते"')["v_text"] == "नमस्ते"
    r = _one_index(spark, '""')
    assert r["key_type"] == "text" and r["v_text"] == ""


def test_negative_and_exponent_numbers(spark):
    assert _one_index(spark, "-7")["key_type"] == "int"
    r = _one_index(spark, "1.5e3")
    assert r["key_type"] == "double" and r["v_double"] == 1500.0


def test_missing_path_produces_no_row(spark):
    v = _vertices(spark, '{"other": 1}', [["f"]])
    # nested:get on an absent path → no index row for that path
    rows = build_indexes(v).where(F.col("v_text").isNotNull()).collect()
    assert rows == []


def test_nested_path_and_name_is_leaf(spark):
    v = _vertices(spark, '{"a": {"b": {"c": 5}}}', [["a", "b", "c"]])
    rows = build_indexes(v).collect()
    assert len(rows) == 1
    assert rows[0]["index_name"] == "c" and rows[0]["v_int"] == 5


def test_search_roundtrip_on_ingested_value(spark):
    """Ingest → index → search returns exactly the declaring node."""
    from egraphdb_spark.operators.search import search

    rows = [
        ("n1", '{"city": "Delhi", "pop": 32}', [["city"], ["pop"]]),
        ("n2", '{"city": "Tokyo", "pop": 37}', [["city"], ["pop"]]),
        ("n3", '{"city": "Delhi"}', []),  # has the value but declares NO index
    ]
    df = spark.createDataFrame(rows, "key string, details string, p array<array<string>>")
    df = df.select(
        "key",
        "details",
        F.col("p").alias("index_paths"),
        F.array().cast("array<array<string>>").alias("lowercase_index_paths"),
    )
    v = make_vertices(df)
    idx = build_indexes(v)
    got = search(
        v,
        idx,
        {
            "type": "index",
            "conditions": {
                "any": [{"key": "Delhi", "key_type": "text", "index_name": "city"}]
            },
            "selected_paths": {"k": ["__missing__"], "city": ["city"]},
        },
    ).collect()
    # n3 never declared the index → must NOT match (SURVEY §7 risk 2)
    assert len(got) == 1 and got[0]["city"] == "Delhi" and got[0]["k"] is None
