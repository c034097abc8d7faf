"""As-of and range joins — operators Spark's join family lacks natively.

As-of join (`left` row ⇝ most recent `right` row with right_ts ≤ left_ts,
per key): the naive formulation is a theta-join + argmax — quadratic per
key.  The scalable formulation used here is the classic union-merge:

  1. tag both inputs and union them into one stream
  2. window PARTITION BY key ORDER BY (ts, tag) with last(..., ignoreNulls)
     carrying the most recent right-row values forward
  3. keep left rows; their carried columns are the as-of match

One shuffle (the window partition), no join at all — the same shape Flink's
temporal join and kdb's aj take.  Right-side columns arrive null when no
prior right row exists (left-outer semantics).

Range join (value ∈ [lo, hi] intervals): equi-join on a coarse bucket both
sides, then the exact residual predicate.  Buckets turn the cross product
into a co-partitioned join; `bucket_width` trades bucket fanout
(intervals spanning k buckets emit k rows) against join selectivity.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    left_ts: str,
    right_ts: str,
    right_cols: list[str] | None = None,
    tolerance_seconds: int | None = None,
    direction: str = "backward",
) -> DataFrame:
    """For each left row: columns of the latest right row with
    right[right_ts] <= left[left_ts] and equal ``on`` key (nulls if none).

    Tie at the exact same timestamp: the right row counts as visible
    (<=, matching DuckDB's ASOF JOIN ... ON l.ts >= r.ts semantics).
    Multiple right rows at one timestamp: the last by a deterministic
    tie-break (all right_cols, descending-last) wins on both engines only
    if the (key, ts) pair is unique on the right — callers dedupe first
    for exact cross-engine parity.

    ``tolerance_seconds`` (pandas merge_asof-style): a carried match older
    than the tolerance at the left row's timestamp reverts to null —
    "most recent state, but only if fresh enough".  Same single-window
    plan; the age check is a row-local column expression.

    ``direction`` (pandas merge_asof semantics):
      * ``"backward"`` (default): latest right row with right_ts ≤ left_ts
      * ``"forward"``: earliest right row with right_ts ≥ left_ts (the
        "next scheduled event" join)
      * ``"nearest"``: whichever of the two is closer in time; exact ties
        prefer backward.  Both carries run over the SAME partition
        exchange (two sort orders, one shuffle); the choice is a
        row-local comparison of the two carried match timestamps.
    """
    if direction not in ("backward", "forward", "nearest"):
        raise ValueError(f"direction must be backward|forward|nearest, got {direction!r}")
    right_cols = right_cols or [
        c for c in right.columns if c not in (on, right_ts)
    ]
    clash = sorted(set(right_cols) & set(left.columns))
    if clash:
        raise ValueError(
            f"asof_join: right columns {clash} collide with left columns; "
            "rename or pass right_cols explicitly"
        )
    need_b = direction in ("backward", "nearest")
    need_f = direction in ("forward", "nearest")
    need_ts = tolerance_seconds is not None or direction == "nearest"
    lt = left.withColumn("__tag", F.lit(1)).withColumn("__ts", F.col(left_ts))
    rt = right.select(
        F.col(on),
        F.col(right_ts).alias("__ts"),
        F.lit(0).alias("__tag"),
        *[F.col(c).alias(f"__r_{c}") for c in right_cols],
    )
    for c in [f"__r_{c}" for c in right_cols]:
        lt = lt.withColumn(c, F.lit(None).cast(dict(rt.dtypes)[c]))
    for c in lt.columns:
        if c not in rt.columns:
            rt = rt.withColumn(c, F.lit(None).cast(dict(lt.dtypes)[c]))
    unioned = lt.unionByName(rt.select(*lt.columns))
    carry_cols = list(right_cols)
    if need_ts:
        # carry the matched right timestamp too, to age-check per left row
        unioned = unioned.withColumn(
            "__r___mts", F.when(F.col("__tag") == 0, F.col("__ts"))
        )
        carry_cols = carry_cols + ["__mts"]
    # backward: right rows (__tag 0) sort BEFORE left rows at equal ts →
    # visible to them (≤ semantics); forward mirrors with tag desc so
    # equal-ts right rows fall inside the following frame (≥ semantics)
    w_b = (
        Window.partitionBy(on)
        .orderBy(F.col("__ts"), F.col("__tag"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    w_f = (
        Window.partitionBy(on)
        .orderBy(F.col("__ts"), F.col("__tag").desc())
        .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    )
    sel = [c for c in unioned.columns if not c.startswith("__r_")]
    if need_b:
        sel += [
            F.last(F.col(f"__r_{c}"), ignorenulls=True).over(w_b).alias(f"__b_{c}")
            for c in carry_cols
        ]
    if need_f:
        sel += [
            F.first(F.col(f"__r_{c}"), ignorenulls=True).over(w_f).alias(f"__f_{c}")
            for c in carry_cols
        ]
    out = unioned.select(*sel).where(F.col("__tag") == 1)

    # ntz casts to long only via timestamp; value-preserving under the
    # UTC sessions this engine and the driver run
    def _secs(c):
        return F.col(c).cast("timestamp").cast("long")

    if direction == "nearest":
        b_age = _secs("__ts") - _secs("__b___mts")
        f_age = _secs("__f___mts") - _secs("__ts")
        b_ok = F.col("__b___mts").isNotNull()
        f_ok = F.col("__f___mts").isNotNull()
        if tolerance_seconds is not None:
            b_ok = b_ok & (b_age <= tolerance_seconds)
            f_ok = f_ok & (f_age <= tolerance_seconds)
        use_b = b_ok & (~f_ok | (b_age <= f_age))
        for c in right_cols:
            out = out.withColumn(
                f"__o_{c}",
                F.when(use_b, F.col(f"__b_{c}")).when(f_ok, F.col(f"__f_{c}")),
            )
    else:
        side = "b" if direction == "backward" else "f"
        for c in right_cols:
            val = F.col(f"__{side}_{c}")
            if tolerance_seconds is not None:
                age = (
                    _secs("__ts") - _secs("__b___mts")
                    if side == "b"
                    else _secs("__f___mts") - _secs("__ts")
                )
                val = F.when(age <= tolerance_seconds, val)
            out = out.withColumn(f"__o_{c}", val)
    keep = [c for c in out.columns if not c.startswith(("__b_", "__f_", "__o_"))]
    out = out.select(
        *[c for c in keep if c not in ("__tag", "__ts")],
        *[F.col(f"__o_{c}").alias(c) for c in right_cols],
    )
    return out


def range_join(
    left: DataFrame,
    left_val: str,
    right: DataFrame,
    lo: str,
    hi: str,
    bucket_width: float,
    small_side: str | None = "right",
) -> DataFrame:
    """left ⋈ right ON left[left_val] ∈ [right[lo], right[hi]) via bucketed
    equi-join + residual filter.  Intervals explode to one row per covered
    bucket; points map to exactly one bucket — the join is then
    hash-partitioned on the bucket instead of a nested-loop theta join.

    ``small_side`` ('right' | 'left' | None) marks the broadcastable side.
    This matters: an interval dim built via createDataFrame has UNKNOWN
    stats, so without the hint Spark may broadcast the big fact side
    (observed: BuildLeft on the parquet side because it alone had a size
    estimate).  None = let AQE decide (both sides have real stats).
    """
    lb = left.withColumn(
        "__bucket", F.floor(F.col(left_val) / F.lit(bucket_width)).cast("long")
    )
    rb = right.withColumn(
        "__bucket",
        F.explode(
            F.sequence(
                F.floor(F.col(lo) / F.lit(bucket_width)).cast("long"),
                # hi is exclusive: a boundary-aligned hi doesn't reach its bucket
                F.floor(
                    (F.col(hi) - F.lit(1e-9)) / F.lit(bucket_width)
                ).cast("long"),
            )
        ),
    )
    if small_side == "right":
        rb = F.broadcast(rb)
    elif small_side == "left":
        lb = F.broadcast(lb)
    return (
        lb.join(rb, "__bucket")
        .where((F.col(left_val) >= F.col(lo)) & (F.col(left_val) < F.col(hi)))
        .drop("__bucket")
    )


def interval_overlap_join(
    left: DataFrame,
    l_start: str,
    l_end: str,
    right: DataFrame,
    r_start: str,
    r_end: str,
    bucket_seconds: int = 3600,
) -> DataFrame:
    """Interval × interval overlap join (closed intervals:
    ``l_start <= r_end AND r_start <= l_end``) as a bucketed equi-join —
    the interval twin of :func:`range_join` (which joins points to
    intervals).

    Each side explodes its [start, end] TIMESTAMP interval into the
    epoch-second buckets it covers; a qualifying pair shares the bucket
    where the LATER interval begins (``greatest`` of the two start
    buckets — the standard identity max(ls,rs) ≤ min(le,re) holds exactly
    when closed intervals overlap), and the join keeps ONLY that bucket's
    emission, so each pair appears exactly once with NO distinct/dedup
    pass.  Bucket ids come from second-truncated timestamps (consistent
    on both sides — truncating a start downward only widens coverage);
    the overlap residual compares the ORIGINAL timestamps, so results are
    exact at full precision.

    Scale: the theta join becomes a hash join on the bucket key; shuffle
    volume is Σ interval-width/bucket rows per side, tunable via
    ``bucket_seconds`` (match it to typical interval width).  Dense
    hot-hour buckets are ordinary skewed join keys — AQE skew-join
    handles them; no nested-loop fallback anywhere.
    """
    b = int(bucket_seconds)
    lb = left.withColumn(
        "__lb0", F.expr(f"unix_timestamp({l_start}) div {b}")
    ).withColumn(
        "__b",
        F.explode(
            F.sequence(F.col("__lb0"), F.expr(f"unix_timestamp({l_end}) div {b}"))
        ),
    )
    rb = right.withColumn(
        "__rb0", F.expr(f"unix_timestamp({r_start}) div {b}")
    ).withColumn(
        "__b",
        F.explode(
            F.sequence(F.col("__rb0"), F.expr(f"unix_timestamp({r_end}) div {b}"))
        ),
    )
    return (
        lb.join(rb, "__b")
        .where(
            (F.col(l_start) <= F.col(r_end))
            & (F.col(r_start) <= F.col(l_end))
            & (F.col("__b") == F.greatest("__lb0", "__rb0"))
        )
        .drop("__b", "__lb0", "__rb0")
    )
