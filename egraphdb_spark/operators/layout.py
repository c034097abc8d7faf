"""Data-layout operators: space-filling-curve clustering for multi-dim skip.

At 100 TB, the cheapest query is the one that never reads the file: range
partitioning + parquet min/max page stats give 1-D skipping for free, but a
table queried by TWO dimensions (time AND user, size AND price) needs its
sort order to preserve locality in both.  Z-ordering (bit-interleaving the
dimensions into one sort key) is the standard answer — Delta/Iceberg expose
it as OPTIMIZE ZORDER; here it is a plain column expression + range
repartition, so it works on any parquet table.

Everything is integer bit arithmetic (no UDFs, no libm): the z-value is a
sum of shifted bit tests, identical in any engine, so the DuckDB oracle
re-derives it bit-for-bit (`zvalue_sql` builds the same expression text).

Scale shape: computing z is map-side; `repartitionByRange(z)` samples the
key space (one pass) and writes size-balanced, z-contiguous files.  A 2-D
box predicate then touches only the few range buckets whose [min_z, max_z]
intersect the box's z-intervals — the `zorder_layout` gate measures exactly
that concentration (rows-in-box per bucket).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F


def zvalue(col_a: Column | str, col_b: Column | str, bits: int = 16) -> Column:
    """Interleave the low ``bits`` of two non-negative ints: a→even bit
    positions, b→odd.  Values are clamped into [0, 2^bits) by masking —
    callers quantize real domains (dates→days, money→cents-buckets) first.
    """
    a = F.col(col_a) if isinstance(col_a, str) else col_a
    b = F.col(col_b) if isinstance(col_b, str) else col_b
    z = F.lit(0).cast("long")
    for i in range(bits):
        z = (
            z
            + (F.shiftright(a.cast("long"), i).bitwiseAND(F.lit(1)) * F.lit(1 << (2 * i)))
            + (F.shiftright(b.cast("long"), i).bitwiseAND(F.lit(1)) * F.lit(1 << (2 * i + 1)))
        )
    return z


def zvalue_sql(col_a: str, col_b: str, bits: int = 16) -> str:
    """The identical interleave as ANSI SQL text (for oracles/other engines)."""
    terms = []
    for i in range(bits):
        terms.append(
            f"(((CAST({col_a} AS BIGINT) >> {i}) & 1) * {1 << (2 * i)})"
        )
        terms.append(
            f"(((CAST({col_b} AS BIGINT) >> {i}) & 1) * {1 << (2 * i + 1)})"
        )
    return "(" + " + ".join(terms) + ")"


def zorder_layout(df: DataFrame, col_a: str, col_b: str, n_buckets: int,
                  bits: int = 16) -> DataFrame:
    """Cluster ``df`` for 2-D skipping: add the z key, range-repartition on
    it, sort within partitions.  Writing the result yields files whose
    parquet min/max stats prune on BOTH dimensions.
    """
    with_z = df.withColumn("_z", zvalue(col_a, col_b, bits))
    return with_z.repartitionByRange(n_buckets, "_z").sortWithinPartitions("_z")


def zorder_prune_stats(
    df: DataFrame,
    col_a: str,
    col_b: str,
    box_a: tuple[int, int],
    box_b: tuple[int, int],
    n_buckets: int,
    bits: int = 16,
    tiebreak: str | None = None,
) -> DataFrame:
    """Per-range-bucket skipping evidence for a 2-D box predicate.

    Buckets are ntile(n) over the z order (deterministic: ties broken on
    ``tiebreak``); output = (bucket, n_rows, n_box_rows, z_min, z_max),
    ordered.  A good layout concentrates the box's rows in few buckets —
    exactly the fraction of files a z-aware scan would read.
    """
    from pyspark.sql import Window as W

    z = zvalue(col_a, col_b, bits)
    order = [F.col("_z")] + ([F.col(tiebreak)] if tiebreak else [])
    a = F.col(col_a)
    b = F.col(col_b)
    in_box = (
        a.between(box_a[0], box_a[1]) & b.between(box_b[0], box_b[1])
    ).cast("long")
    extra = [F.col(tiebreak)] if tiebreak else []
    return (
        df.select(a, b, *extra, z.alias("_z"), in_box.alias("_in_box"))
        .withColumn("bucket", F.ntile(n_buckets).over(W.orderBy(*order)))
        .groupBy("bucket")
        .agg(
            F.count("*").alias("n_rows"),
            F.sum("_in_box").alias("n_box_rows"),
            F.min("_z").alias("z_min"),
            F.max("_z").alias("z_max"),
        )
        .orderBy("bucket")
    )

