"""Sources & sinks (SURVEY.md §2.1 S12–S17).

The reference streams results as chunked JSON arrays / CSV / length-framed
Erlang binary (src/egraph_api.erl:223-325) and ingests JSON or
x-erlang-binary bodies (handlers/egraph_generic_handler.erl:184-303).
Spark-native equivalents: JSON lines / CSV with header / Parquet+Arrow
(the columnar successor of the framed-binary encoding), each a distributed
reader/writer rather than a single HTTP socket.

All writers repartition-free: they inherit the upstream partitioning, so a
100 TB result streams out of every executor in parallel.  `single_file=True`
coalesces to 1 only for tiny driver-facing exports.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession, functions as F
from pyspark.sql.types import StructType


def write_json(df: DataFrame, path: str, single_file: bool = False) -> None:
    """S12: JSON-lines sink (one JSON object per row, as the reference's
    streaming JSON array emits one object per row)."""
    (df.coalesce(1) if single_file else df).write.mode("overwrite").json(path)


def read_json(spark: SparkSession, path: str, schema: StructType | str | None = None) -> DataFrame:
    reader = spark.read
    if schema is not None:
        reader = reader.schema(schema)
    return reader.json(path)


def write_csv(df: DataFrame, path: str, single_file: bool = False) -> None:
    """S13: CSV sink with header row (reference: header from selected_paths
    names, src/egraph_api.erl:150-185; quoting handled by the writer the way
    egraph_util.erl:1110-1120 hand-escaped)."""
    (df.coalesce(1) if single_file else df).write.mode("overwrite").option(
        "header", True
    ).csv(path)


def read_csv(spark: SparkSession, path: str, schema: StructType | str | None = None) -> DataFrame:
    reader = spark.read.option("header", True)
    if schema is None:
        reader = reader.option("inferSchema", True)
    else:
        reader = reader.schema(schema)
    return reader.csv(path)


def write_parquet(df: DataFrame, path: str, partition_by: list[str] | None = None) -> None:
    """S14/S17: columnar binary sink — the scale-correct replacement for the
    reference's length-framed term_to_binary stream (src/egraph_api.erl:
    276-325): typed, splittable, compressed, predicate-pushdown-capable."""
    w = df.write.mode("overwrite")
    if partition_by:
        w = w.partitionBy(*partition_by)
    w.parquet(path)


def read_parquet(spark: SparkSession, path: str) -> DataFrame:
    return spark.read.parquet(path)


def write_orc(df: DataFrame, path: str, partition_by: list[str] | None = None) -> None:
    """ORC sink — the second columnar interchange format (Hive/Trino
    ecosystems); same splittable/compressed/pushdown properties as the
    parquet sink, so warehouses standardized on ORC can consume engine
    output without a transcode step."""
    w = df.write.mode("overwrite")
    if partition_by:
        w = w.partitionBy(*partition_by)
    w.orc(path)


def read_orc(spark: SparkSession, path: str) -> DataFrame:
    return spark.read.orc(path)


def write_bucketed_table(
    df: DataFrame,
    table: str,
    bucket_col: str,
    n_buckets: int = 32,
    sort_col: str | None = None,
    path: str | None = None,
    one_file_per_bucket: bool = False,
) -> None:
    """Persist hash-bucketed (the engine's answer to the reference's 2048
    id-sharded tables, sql/egraph_table_creation.sql:156-160).

    Two tables bucketed the same way co-locate their join — zero Exchange
    in the plan (asserted in tests/test_plans.py).  At 100 TB this is what
    makes point lookups bucket-pruned and vertex⋈edge traversal shuffle-free.

    ``path`` makes the table EXTERNAL (data outside the warehouse dir);
    ``one_file_per_bucket`` repartitions on the bucket column first so each
    bucket is a single file (fewer files to list/open at read time).  Note
    Spark 3+ does NOT propagate ``sort_col`` order to the read side unless
    ``spark.sql.legacy.bucketedTableScan.outputOrdering`` is set — sortBy
    still pays off through parquet min/max stats, but sort-merge joins
    re-sort per query.
    """
    if one_file_per_bucket:
        df = df.repartition(n_buckets, F.col(bucket_col))
    w = df.write.mode("overwrite").bucketBy(n_buckets, bucket_col)
    if sort_col:
        w = w.sortBy(sort_col)
    if path:
        w = w.option("path", path)
    w.format("parquet").saveAsTable(table)


def to_json_rows(df: DataFrame, col_name: str = "json") -> DataFrame:
    """Row → JSON-string column (driver-side streaming export, S12's shape:
    iterate with toLocalIterator to stream without materializing)."""
    return df.select(F.to_json(F.struct(*df.columns)).alias(col_name))


def ingest_json_nodes(spark: SparkSession, path_or_df, schema: str | None = None) -> DataFrame:
    """S15: node ingest from JSON lines with the reference's body shape
    {key_data, details, indexes:{indexes, lowercase_indexes}}
    (models/egraph_detail_model.erl:161-189) → canonical vertices."""
    from ..ingest import make_vertices

    src = (
        path_or_df
        if isinstance(path_or_df, DataFrame)
        else read_json(
            spark,
            path_or_df,
            schema
            or "key_data string, details string, "
            "indexes struct<indexes: array<array<string>>, lowercase_indexes: array<array<string>>>",
        )
    )
    shaped = src.select(
        F.col("key_data").alias("key"),
        F.col("details"),
        F.coalesce(F.col("indexes.indexes"), F.array().cast("array<array<string>>")).alias(
            "index_paths"
        ),
        F.coalesce(
            F.col("indexes.lowercase_indexes"), F.array().cast("array<array<string>>")
        ).alias("lowercase_index_paths"),
    )
    return make_vertices(shaped)


def write_index_store(indexes: DataFrame, path: str) -> None:
    """Persist the typed index table partitioned by ``index_name`` — the
    engine's analogue of the reference's table-per-(type, index-name)
    layout (models/egraph_index_model.erl:205-241) with zero routing code:
    a search on one index becomes Catalyst partition pruning (the scan
    touches one directory), and per-file min/max stats give value-range
    skipping within it.  See tests/test_plans.py for the pruning proof.
    """
    indexes.write.mode("overwrite").partitionBy("index_name").parquet(path)


def read_index_store(spark, path: str) -> DataFrame:
    return spark.read.parquet(path)


def write_binary_files(
    df: DataFrame, id_col: str, payload_col: str, path: str
) -> None:
    """One file per row (``<id>.bin``) from a binary payload column —
    the export half of a multimodal corpus round-trip (shipping decoded
    assets to a tool that wants loose files).

    Executor-parallel ``foreachPartition``: every partition writes its
    own rows, nothing is collected to the driver.  On a real cluster
    ``path`` must be a shared filesystem (NFS/Fuse mount); for
    HDFS/object stores swap the ``open`` for the Hadoop FileSystem API —
    the partition-parallel structure is unchanged.
    """
    import shutil

    shutil.rmtree(path, ignore_errors=True)  # no stale files on rewrite
    os.makedirs(path, exist_ok=True)

    def _write(rows):
        for r in rows:
            with open(os.path.join(path, f"{r[id_col]}.bin"), "wb") as f:
                f.write(r[payload_col])

    df.select(id_col, payload_col).foreachPartition(_write)


def read_binary_dir(spark: SparkSession, path: str, glob: str | None = None):
    """Opaque-asset ingestion via Spark's ``binaryFile`` source: one row
    per file with (path, modificationTime, length, content).  This is
    the 100-TB-corpus entry point for images/audio/video — the source
    parallelizes over files, prunes to metadata-only reads when
    ``content`` is not referenced, and ``pathGlobFilter`` skips non-asset
    files at listing time (never read, never decoded).

    Contract note (pinned by tests/test_io_quarantine.py): Spark's file
    split planning produces no partition for ZERO-length files, so empty
    assets are silently absent from the result — reconcile counts
    against the manifest and route zero-byte files through the
    quarantine path if they matter.
    """
    r = spark.read.format("binaryFile")
    if glob:
        r = r.option("pathGlobFilter", glob)
    return r.load(path)


def read_csv_quarantine(
    spark: SparkSession, path: str, schema: str
) -> DataFrame:
    """PERMISSIVE CSV read with a corrupt-record quarantine column — the
    ingestion posture for untrusted feeds: malformed rows are captured
    in ``_bad`` (raw line) instead of failing the job or silently
    nulling, so the pipeline can count/inspect/quarantine them.

    ``schema`` is the CLEAN schema; the quarantine column is appended
    here.  Spark marks a row corrupt on type-parse failure or token
    overflow; clean rows carry ``_bad IS NULL``.

    Parses via ``spark.read.text`` + ``from_csv`` materializing the FULL
    struct rather than ``spark.read.csv``: the CSV file source applies
    Catalyst column pruning to the *parser* (only referenced clean
    columns are parsed), so a downstream query touching a subset of
    columns would miss corruption in the unreferenced ones — the
    quarantine verdict would change with the projection.  ``from_csv``
    with ``columnNameOfCorruptRecord`` in the schema is exempt from the
    optimizer's CSV-schema pruning, so every field is always parsed and
    the verdict is projection-independent (pinned by
    tests/test_io_quarantine.py, including a corrupt-column-only
    aggregate that the file source outright disallows).

    Blank / whitespace-only lines are dropped (the CSV file source skips
    them; the raw ``text`` read would surface them as all-null NON-corrupt
    rows, silently inflating clean counts — same guard as the JSONL twin).
    """
    full = schema + ", _bad string"
    opts = {"mode": "PERMISSIVE", "columnNameOfCorruptRecord": "_bad"}
    return (
        spark.read.text(path)
        .where(F.trim(F.col("value")) != "")
        .select(F.from_csv(F.col("value"), full, opts).alias("r"))
        .select("r.*")
    )


def jsonl_quarantine_frame(lines: DataFrame, schema: str) -> DataFrame:
    """The parse core shared by the batch and STREAMING JSONL quarantine
    paths: blank-line filter + PERMISSIVE full-struct ``from_json`` over
    a one-column (``value``) frame.  Keeping it in one place means a
    future change to the corruption semantics cannot leave batch and
    streaming verdicts inconsistent."""
    full = schema + ", _bad string"
    opts = {"mode": "PERMISSIVE", "columnNameOfCorruptRecord": "_bad"}
    return (
        lines.where(F.trim(F.col("value")) != "")
        .select(F.from_json(F.col("value"), full, opts).alias("r"))
        .select("r.*")
    )


def read_jsonl_quarantine(
    spark: SparkSession, path: str, schema: str
) -> DataFrame:
    """PERMISSIVE JSON-lines read with a corrupt-record quarantine column
    — the JSONL twin of :func:`read_csv_quarantine`, same
    projection-independence contract: parse via ``spark.read.text`` +
    ``from_json`` materializing the FULL struct, so the corrupt verdict
    never changes with the downstream column selection (the JSON file
    source prunes the parser schema exactly like the CSV one).

    Corruption semantics (pinned empirically by
    tests/test_io_quarantine.py against a DuckDB ``json_type`` mirror):

    - invalid / truncated JSON text → corrupt;
    - a ``bigint``-declared field holding a JSON string (even a numeric
      one), float, boolean, array, or an integer past int64 → corrupt;
    - a ``string``-declared field NEVER corrupts — every JSON type
      coerces to its text form (``9`` → ``"9"``, objects/arrays to their
      compact JSON);
    - missing fields and explicit ``null`` are clean nulls;
    - blank / whitespace-only lines are dropped here (the JSON file
      source skips them; a raw ``text`` read surfaces them as all-null
      NON-corrupt rows, which would silently inflate clean counts).
    """
    return jsonl_quarantine_frame(spark.read.text(path), schema)
