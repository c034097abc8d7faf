"""Log-structured keyed table on plain parquet — persistent upsert/delete.

The reference mutates rows in place under optimistic CC
(models/egraph_detail_model.erl:574-588 upsert, :260-277 delete).  Spark's
storage story for that is Delta/Iceberg MERGE, but neither runtime is in
this container — so this module provides the same semantics with nothing
but parquet + directory layout, the way Hudi's MOR/Delta's log work
underneath:

  table/
    seg=00000000/   base segment (creation)
    seg=00000001/   delta segment: upserts and/or tombstones
    seg=00000002/   ...

Every segment carries the user schema plus ``_op`` ('u' upsert | 'd'
delete-tombstone).  The segment number is a parquet partition column
(``seg=N`` directories), so:

  * appends are O(delta) — never rewrite existing data
  * `read_latest` is merge-on-read: ONE window shuffle keyed on the table
    key picks the row with the highest segment per key, then drops
    tombstones.  At 100 TB the layout adds hash-bucket subdirs per segment
    so the merge window is per-bucket co-located instead of a global
    shuffle; the logical plan below is unchanged.
  * `read_latest(as_of=N)` is snapshot isolation for free: partition
    pruning on ``seg <= N`` (the filter lands on the directory listing,
    not the data).
  * `compact` folds the log back into a single base segment, bounding
    read amplification; readers before/after see identical rows.

Single-writer-at-a-time is assumed (the reference serializes writes per
shard the same way); a real deployment puts the segment counter behind a
metastore/transaction log.  ``_seq`` in `read_latest` output is the
winning segment per key — the reference's etag analogue (if-match
concurrency checks compare it).
"""

from __future__ import annotations

import os
import re

from pyspark.sql import DataFrame, SparkSession, Window, functions as F

_SEG_RE = re.compile(r"^seg=(\d{8})$")


def _segments(path: str) -> list[int]:
    if not os.path.isdir(path):
        return []
    out = []
    for name in os.listdir(path):
        m = _SEG_RE.match(name)
        if m and os.path.isdir(os.path.join(path, name)):
            out.append(int(m.group(1)))
    return sorted(out)


def _seg_dir(path: str, n: int) -> str:
    return os.path.join(path, f"seg={n:08d}")


def _write_segment(df: DataFrame, path: str, n: int) -> None:
    df.write.mode("overwrite").parquet(_seg_dir(path, n))


def create(df: DataFrame, path: str, key_cols: list[str]) -> None:
    """Write segment 0 (the base).  ``key_cols`` define row identity for
    every later upsert/delete; they are recorded in a _keys marker file."""
    if _segments(path):
        raise ValueError(f"log table already exists at {path}")
    os.makedirs(path, exist_ok=True)
    with open(os.path.join(path, "_keys"), "w") as f:
        f.write(",".join(key_cols))
    _write_segment(df.withColumn("_op", F.lit("u")), path, 0)


def key_cols(path: str) -> list[str]:
    with open(os.path.join(path, "_keys")) as f:
        return f.read().strip().split(",")


def _align(df: DataFrame, path: str) -> DataFrame:
    """Conform a delta to the table schema: same columns, same types.

    Spark silently widens types through arithmetic (decimal(18,2)+x →
    decimal(19,2)); a segment written with the widened type breaks the
    unified log scan with PARQUET_COLUMN_DATA_TYPE_MISMATCH.  Casting at
    the append boundary keeps every segment bit-compatible.
    """
    spark = df.sparkSession
    base = spark.read.parquet(_seg_dir(path, _segments(path)[0])).drop("_op")
    missing = [c for c in base.columns if c not in df.columns]
    if missing:
        raise ValueError(f"delta is missing table columns {missing}")
    return df.select(
        *[F.col(c).cast(t) for c, t in base.dtypes]
    )


def append_upsert(df: DataFrame, path: str) -> int:
    """Append a delta segment of upserts (last writer wins per key).
    Returns the new segment number."""
    n = _segments(path)[-1] + 1
    _write_segment(_align(df, path).withColumn("_op", F.lit("u")), path, n)
    return n


def append_delete(keys_df: DataFrame, path: str) -> int:
    """Append tombstones for every key in ``keys_df`` (key columns only;
    non-key columns are filled with NULLs to keep one segment schema)."""
    spark = keys_df.sparkSession
    base = spark.read.parquet(_seg_dir(path, _segments(path)[0]))
    kc = key_cols(path)
    tomb = keys_df.select(*kc)
    for c in base.columns:
        if c not in kc and c != "_op":
            tomb = tomb.withColumn(c, F.lit(None).cast(dict(base.dtypes)[c]))
    n = _segments(path)[-1] + 1
    _write_segment(tomb.withColumn("_op", F.lit("d")), path, n)
    return n


def read_log(spark: SparkSession, path: str) -> DataFrame:
    """The raw log: every segment's rows with the ``seg`` partition column."""
    return spark.read.option("basePath", path).parquet(
        *[_seg_dir(path, n) for n in _segments(path)]
    )


def read_latest(
    spark: SparkSession, path: str, as_of: int | None = None
) -> DataFrame:
    """Merge-on-read current state: per key, the row from the highest
    segment wins; tombstones ('d') erase the key.  ``as_of`` reads the
    snapshot as of that segment (inclusive) via partition pruning.

    Output = user columns + ``_seq`` (winning segment — the etag).
    """
    kc = key_cols(path)
    log = read_log(spark, path)
    if as_of is not None:
        log = log.where(F.col("seg") <= as_of)
    w = Window.partitionBy(*kc).orderBy(F.col("seg").desc())
    return (
        log.withColumn("_rn", F.row_number().over(w))
        .where((F.col("_rn") == 1) & (F.col("_op") == "u"))
        .drop("_rn", "_op")
        .withColumnRenamed("seg", "_seq")
    )


def compact(spark: SparkSession, path: str) -> None:
    """Fold the whole log into a fresh base segment at the next segment
    number, then drop the old segments.  Readers see identical rows before
    and after; read amplification returns to 1 segment.

    The rewrite goes through a temp directory because the merged plan
    reads the segments being replaced.
    """
    import shutil

    segs = _segments(path)
    merged = read_latest(spark, path).drop("_seq").withColumn("_op", F.lit("u"))
    tmp = os.path.join(path, "_compact_tmp")
    merged.write.mode("overwrite").parquet(tmp)
    for n in segs:
        shutil.rmtree(_seg_dir(path, n))
    os.rename(tmp, _seg_dir(path, segs[-1] + 1))


def snapshot_diff(
    spark: SparkSession, path: str, from_seg: int, to_seg: int | None = None
) -> DataFrame:
    """Row-level changes between two snapshots: (keys…, change, _seq).

    ``change`` ∈ {'insert', 'update', 'delete'} classifying each key
    touched in segments (from_seg, to_seg] against the as-of-``from_seg``
    snapshot; keys whose net effect is nil (tombstone for a key that never
    existed) are dropped.  This is the CDC read every downstream
    incremental consumer wants from a mutable table.

    Scale shape: the winner-per-key pass reads ONLY the delta segments
    (partition pruning on seg), and the before-snapshot merge is
    semi-join-pruned to the affected keys before the existence join — work
    is bounded by the delta size plus the lookup of affected keys, never a
    full-table diff.
    """
    kc = key_cols(path)
    segs = _segments(path)
    if to_seg is None:
        to_seg = segs[-1]
    log = read_log(spark, path)
    delta = log.where((F.col("seg") > from_seg) & (F.col("seg") <= to_seg))
    w = Window.partitionBy(*kc).orderBy(F.col("seg").desc())
    winner = (
        delta.withColumn("_rn", F.row_number().over(w))
        .where(F.col("_rn") == 1)
        .drop("_rn")
    )
    before_keys = (
        read_latest(spark, path, as_of=from_seg)
        .select(*kc)
        .join(winner.select(*kc), kc, "left_semi")
        .withColumn("_existed", F.lit(1))
    )
    out = winner.join(before_keys, kc, "left")
    change = (
        F.when((F.col("_op") == "d") & F.col("_existed").isNotNull(), "delete")
        .when((F.col("_op") == "u") & F.col("_existed").isNotNull(), "update")
        .when((F.col("_op") == "u") & F.col("_existed").isNull(), "insert")
    )
    return (
        out.withColumn("change", change)
        .where(F.col("change").isNotNull())
        .drop("_op", "_existed")
        .withColumnRenamed("seg", "_seq")
    )
