"""Canonical DataFrame schemas for the engine's core tables.

The reference stores nodes/edges in 2048 hash-sharded MySQL tables and one
lookup table per (type, index-name) pair (reference:
sql/egraph_table_creation.sql:162-192, 55-153).  Spark-first, that collapses
to three partitioned DataFrames:

  vertices — one row per node, JSON details, declared index paths
  edges    — directed adjacency (bidirectional link = two rows,
             reference sql/egraph_table_creation.sql:181-182)
  indexes  — ONE long/narrow typed index table replacing the 6×N dynamic
             lookup tables; exactly one v_* column non-null per row

Scale notes (100 TB): vertices/edges are stored hash-bucketed by id/src so
point lookups prune to one bucket and adjacency joins co-locate without a
shuffle; `indexes` is partitioned by index_name (partition pruning replaces
the reference's manual table-per-index routing, shard_util.erl:57-58).
"""

from __future__ import annotations

from pyspark.sql import types as T

# The six index value types of the reference (README.md:86-94; inference in
# src/egraph_shard_util.erl:79-104) mapped to Spark types.
KEY_TYPES = ("int", "double", "text", "date", "datetime", "geo")

# Lowercase index family suffix (reference include/egraph_constants.hrl:147).
LC_SUFFIX = "_lc__"

GEO_TYPE = T.StructType(
    [
        T.StructField("type", T.StringType()),
        T.StructField("coordinates", T.ArrayType(T.DoubleType())),
    ]
)

VERTICES_SCHEMA = T.StructType(
    [
        T.StructField("id", T.LongType(), False),  # xxhash64(key)
        T.StructField("kind", T.StringType()),  # entity family (engine extension)
        T.StructField("key", T.StringType(), False),  # user key_data
        T.StructField("details", T.StringType()),  # JSON document
        T.StructField("details_hash", T.LongType()),
        T.StructField("version", T.IntegerType()),
        T.StructField("updated_at", T.TimestampType()),
        T.StructField("index_paths", T.ArrayType(T.ArrayType(T.StringType()))),
        T.StructField(
            "lowercase_index_paths", T.ArrayType(T.ArrayType(T.StringType()))
        ),
    ]
)

EDGES_SCHEMA = T.StructType(
    [
        T.StructField("src", T.LongType(), False),
        T.StructField("dst", T.LongType(), False),
        T.StructField("src_key", T.StringType()),
        T.StructField("dst_key", T.StringType()),
        T.StructField("details", T.StringType()),
        T.StructField("details_hash", T.LongType()),
        T.StructField("version", T.IntegerType()),
    ]
)

INDEXES_SCHEMA = T.StructType(
    [
        T.StructField("index_name", T.StringType(), False),
        T.StructField("key_type", T.StringType(), False),
        T.StructField("v_int", T.LongType()),
        T.StructField("v_double", T.DoubleType()),
        T.StructField("v_text", T.StringType()),
        T.StructField("v_date", T.DateType()),
        T.StructField("v_ts", T.TimestampType()),
        T.StructField("v_geo", GEO_TYPE),
        T.StructField("id", T.LongType(), False),
    ]
)

FUNCTIONS_SCHEMA = T.StructType(
    [
        T.StructField("name", T.StringType(), False),
        T.StructField("arity", T.IntegerType(), False),
        T.StructField("lang", T.StringType()),
        T.StructField("body", T.StringType()),
        T.StructField("test_vectors", T.StringType()),  # JSON array of arg lists
        T.StructField("test_validator", T.StringType()),
        T.StructField("version", T.IntegerType()),
        T.StructField("updated_at", T.TimestampType()),
    ]
)
