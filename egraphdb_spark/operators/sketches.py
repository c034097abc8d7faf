"""Probabilistic sketches, engineered to be *deterministic* and
engine-portable (the DuckDB oracle reproduces them bit-for-bit).

Why sketches at 100 TB: exact COUNT(DISTINCT) is a full shuffle of every
distinct key; HLL is a 2^p-counter partial-agg (map-side combinable, a few
KB per task).  Exact per-key counts for heavy-hitter detection shuffle the
whole key space; count-min is a fixed (depth x width) integer grid.

Portability recipe (cross-engine determinism, so the oracle is exact):
  * hash = 60-bit int from md5 hex (identical in every engine; Spark
    xxhash64 would be faster but has no cross-engine twin — swap it in
    for production, keep md5 in the gate),
  * rho (HLL register) = trailing-zero count via length(bin(w & -w)) —
    pure integer/string ops, no log2 (libm log differs in last ulp),
  * register sums scaled to BIGINT (2^(K-Mj)) — order-independent,
    exact; ONE int->double conversion at the end (IEEE, deterministic),
  * the only float ops are literal*literal*2^K/S and a final round —
    reproducible anywhere.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def _h60(col) -> "F.Column":
    """60-bit non-negative hash: first 15 md5 hex digits as an integer."""
    return F.conv(F.substring(F.md5(col.cast("string")), 1, 15), 16, 10).cast(
        "long"
    )


def hll_distinct(df: DataFrame, col: str, p: int = 8) -> DataFrame:
    """HyperLogLog distinct-count estimate -> 1 row (estimate, buckets_used).

    m = 2^p registers; bucket = h & (m-1); w = h >> p (60-p bits);
    rho(w) = trailing zeros + 1 (same geometric law as leading zeros),
    capped at K = 61-p for w = 0.  Z is accumulated as sum(2^(K - Mj)) in
    BIGINT — exact and order-free — then the raw estimate
    alpha_m * m^2 * 2^K / (Z + empty*2^K) is one double expression.

    Standard error ~ 1.04/sqrt(m) (~6.5% at p=8).  The small-range linear
    counting correction is deliberately omitted: it needs ln(), whose last
    ulp differs across libm builds — apply it downstream if needed.
    At scale: partial-agg (max per bucket) combines map-side; the shuffle
    is at most m rows per partition regardless of input size.
    """
    m = 1 << p
    cap = 61 - p  # rho of w=0; max real rho is (60-p-1) trailing zeros + 1
    alpha = 0.7213 / (1.0 + 1.079 / m)
    h = _h60(F.col(col))
    w = F.shiftright(h, p)
    rho = F.when(w == 0, F.lit(cap)).otherwise(
        F.length(F.bin(w.bitwiseAND(-w)))
    )
    regs = (
        df.select(
            h.bitwiseAND(F.lit(m - 1)).alias("bucket"), rho.alias("rho")
        )
        .groupBy("bucket")
        .agg(F.max("rho").alias("mj"))
    )
    scaled = F.expr(f"shiftleft(1L, {cap} - mj)")  # F.shiftleft wants a literal
    agg = regs.agg(
        F.count("*").alias("present"), F.sum(scaled).alias("z")
    )
    s = F.col("z") + (F.lit(m) - F.col("present")) * F.lit(1 << cap).cast("long")
    est = F.lit(alpha * m * m * float(1 << cap)) / s.cast("double")
    return agg.select(
        F.round(est, 4).alias("estimate"),
        F.col("present").cast("long").alias("buckets_used"),
    )


def hll_oracle_sql(table: str, col: str, p: int = 8) -> str:
    """DuckDB SQL computing the identical HLL estimate."""
    m = 1 << p
    cap = 61 - p
    alpha = 0.7213 / (1.0 + 1.079 / m)
    num = repr(alpha * m * m * float(1 << cap))
    return f"""
WITH h AS (
  SELECT CAST('0x' || substr(md5(CAST({col} AS VARCHAR)), 1, 15) AS BIGINT) AS h
  FROM {table}
), r AS (
  SELECT h & {m - 1} AS bucket,
         max(CASE WHEN h >> {p} = 0 THEN {cap}
                  ELSE length(bin((h >> {p}) & -(h >> {p}))) END) AS mj
  FROM h GROUP BY bucket
), s AS (
  SELECT count(*) AS present,
         CAST(sum(1::BIGINT << ({cap} - mj)) AS BIGINT) AS z
  FROM r
)
SELECT round({num} / CAST(z + ({m} - present) * (1::BIGINT << {cap}) AS DOUBLE), 4)
         AS estimate,
       CAST(present AS BIGINT) AS buckets_used
FROM s
"""


def hll_sliding_distinct(
    df: DataFrame, key_col: str, ts_col: str, p: int = 8, window_days: int = 7
) -> DataFrame:
    """Sliding-window distinct estimate per day via MERGED HLL registers —
    the scale path for rolling WAU/MAU when the exact contribution
    explode (7·|user-day pairs|) outgrows the shuffle.

    Registers are mergeable by max, so the plan is: per-(day, bucket)
    partial registers (≤ m rows per day, however many events or users);
    each day's registers contribute to the ``window_days`` report days
    they serve (explode over days×m rows TOTAL — independent of user
    count); max-merge per report day; one estimate row per day.  Same
    register/estimate math as :func:`hll_distinct`, so the DuckDB oracle
    replicates it bit-for-bit (estimate rounded to 4 dp).

    Exact-vs-sketch contract: `evt_active_users_7d` is the exact
    operator; this one trades ~1.04/sqrt(m) error (~6.5% at p=8) for a
    shuffle bounded by days×m rows.
    """
    bucket, rho = hll_register_cols(key_col, p)
    day = F.date_trunc("day", F.col(ts_col))
    regs = (
        df.select(day.alias("day"), bucket, rho)
        .groupBy("day", "bucket")
        .agg(F.max("rho").alias("mj"))
    )
    days = regs.select(F.col("day").alias("report_day")).distinct()
    contrib = regs.select(
        F.explode(
            F.expr(
                f"sequence(day, day + interval {window_days - 1} days,"
                " interval 1 day)"
            )
        ).alias("report_day"),
        "bucket",
        "mj",
    )
    merged = (
        contrib.join(F.broadcast(days), "report_day", "left_semi")
        .groupBy("report_day", "bucket")
        .agg(F.max("mj").alias("mj"))
    )
    return hll_estimate_registers(merged, ["report_day"], p=p).orderBy(
        "report_day"
    )


def hll_estimate_registers(
    regs: DataFrame, group_cols: list[str], p: int = 8
) -> DataFrame:
    """Estimate per group from (group_cols…, bucket, mj) register rows —
    the merge-side half of every windowed/partitioned HLL: registers are
    built wherever the data is (batch window, streaming sliding window,
    per-shard partials), max-merged upstream, and this turns each group's
    surviving registers into one (estimate, buckets_used) row.

    Applies the small-range linear-counting branch: a per-window active
    set can hold far fewer keys than m registers, where the raw estimate
    floors at ~alpha·m.  Unlike hll_distinct (which documents omitting
    it), windowed counts come in every size — ln() is already in the
    cross-engine trust base (BM25, unigram-NLL, A-ES sampling), and the
    SQL mirrors apply the identical branch.
    """
    m = 1 << p
    cap = 61 - p
    alpha = 0.7213 / (1.0 + 1.079 / m)
    scaled = F.expr(f"shiftleft(1L, {cap} - mj)")
    agg = regs.groupBy(*group_cols).agg(
        F.count("*").alias("present"), F.sum(scaled).alias("z")
    )
    s = F.col("z") + (F.lit(m) - F.col("present")) * F.lit(1 << cap).cast("long")
    raw = F.lit(alpha * m * m * float(1 << cap)) / s.cast("double")
    empty = F.lit(m) - F.col("present")
    est = F.when(
        (raw <= F.lit(2.5 * m)) & (empty > 0),
        F.lit(float(m)) * F.log(F.lit(float(m)) / empty.cast("double")),
    ).otherwise(raw)
    return agg.select(
        *group_cols,
        F.round(est, 4).alias("estimate"),
        F.col("present").cast("long").alias("buckets_used"),
    )


def hll_register_cols(key_col: str, p: int = 8) -> tuple["F.Column", "F.Column"]:
    """(bucket, rho) expressions for one key — the build-side half of a
    windowed HLL (pair with :func:`hll_estimate_registers`)."""
    m = 1 << p
    cap = 61 - p
    h = _h60(F.col(key_col))
    w = F.shiftright(h, p)
    rho = F.when(w == 0, F.lit(cap)).otherwise(F.length(F.bin(w.bitwiseAND(-w))))
    return h.bitwiseAND(F.lit(m - 1)).alias("bucket"), rho.alias("rho")


def hll_sliding_oracle_sql(
    table: str, key_col: str, ts_col: str, p: int = 8, window_days: int = 7
) -> str:
    """DuckDB mirror of :func:`hll_sliding_distinct`."""
    m = 1 << p
    cap = 61 - p
    alpha = 0.7213 / (1.0 + 1.079 / m)
    num = repr(alpha * m * m * float(1 << cap))
    return f"""
WITH h AS (
  SELECT date_trunc('day', {ts_col}) AS day,
         CAST('0x' || substr(md5(CAST({key_col} AS VARCHAR)), 1, 15) AS BIGINT) AS h
  FROM {table}
), r AS (
  SELECT day, h & {m - 1} AS bucket,
         max(CASE WHEN h >> {p} = 0 THEN {cap}
                  ELSE length(bin((h >> {p}) & -(h >> {p}))) END) AS mj
  FROM h GROUP BY day, bucket
), days AS (SELECT DISTINCT day AS report_day FROM r),
contrib AS (
  SELECT day + to_days(CAST(t.d AS INT)) AS report_day, bucket, mj
  FROM r, unnest(range(0, {window_days})) AS t(d)
),
merged AS (
  SELECT report_day, bucket, max(mj) AS mj
  FROM contrib SEMI JOIN days USING (report_day)
  GROUP BY report_day, bucket
),
s AS (
  SELECT report_day, count(*) AS present,
         CAST(sum(1::BIGINT << ({cap} - mj)) AS BIGINT) AS z
  FROM merged GROUP BY report_day
),
e AS (
  SELECT report_day, present,
         {num} / CAST(z + ({m} - present) * (1::BIGINT << {cap}) AS DOUBLE) AS raw
  FROM s
)
SELECT report_day,
       round(CASE WHEN raw <= {2.5 * m!r} AND present < {m}
                  THEN {float(m)!r} * ln({float(m)!r} / CAST({m} - present AS DOUBLE))
                  ELSE raw END, 4) AS estimate,
       CAST(present AS BIGINT) AS buckets_used
FROM e ORDER BY report_day
"""


def histogram_quantiles(
    df: DataFrame, col: str, width: float, qs: list[float]
) -> DataFrame:
    """Approximate quantiles from an equi-width histogram -> (q, est).

    est(q) = lower bound of the bucket holding the ceil(q*n)-th value —
    error bounded by ``width``, and deterministic: bucketing is
    floor(val/width), ranks are integer cumulative counts, and the only
    float ops (q*n, bucket*width) are single IEEE multiplies identical in
    any engine.  The histogram is mergeable (bucket counts add), so at
    100 TB this is one map-side-combined groupBy producing a tiny state —
    unlike exact percentile_disc, which needs a full sort.  The cumulative
    window runs over the *histogram* (≤ range/width rows), not the data,
    so its single-partition window is fine at any input scale.
    """
    from pyspark.sql import Window as W

    if not qs:
        raise ValueError("qs must be non-empty")
    hist = (
        df.select(F.floor(F.col(col) / F.lit(width)).alias("bucket"))
        .groupBy("bucket")
        .agg(F.count("*").alias("cnt"))
    )
    w = W.orderBy("bucket").rowsBetween(W.unboundedPreceding, W.currentRow)
    cum = hist.select(
        "bucket",
        F.sum("cnt").over(w).alias("cum"),
        F.sum("cnt").over(W.partitionBy()).alias("n"),
    )
    qdf = df.sparkSession.createDataFrame([(float(q),) for q in qs], "q double")
    return (
        cum.crossJoin(F.broadcast(qdf))
        .where(F.col("cum") >= F.ceil(F.col("q") * F.col("n")))
        .groupBy("q")
        .agg((F.min("bucket") * F.lit(width)).alias("est"))
        .orderBy("q")
    )


def histogram_quantiles_oracle_sql(
    table: str, col: str, width: float, qs: list[float]
) -> str:
    """DuckDB SQL computing the identical histogram-quantile estimates."""
    # CAST keeps the q column DOUBLE — a bare VALUES (0.5) is DECIMAL in
    # DuckDB, which pandas surfaces as Decimal and the driver hash rejects
    qvals = ", ".join(f"(CAST({float(q)} AS DOUBLE))" for q in qs)
    return f"""
WITH hist AS (
  SELECT floor({col} / {width}) AS bucket, count(*) AS cnt
  FROM {table} GROUP BY bucket
), cum AS (
  SELECT bucket,
         sum(cnt) OVER (ORDER BY bucket
                        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum,
         sum(cnt) OVER () AS n
  FROM hist
), qs(q) AS (VALUES {qvals})
SELECT q, min(bucket) * {width} AS est
FROM cum CROSS JOIN qs
WHERE cum >= ceil(q * n)
GROUP BY q ORDER BY q
"""


# Count-min sketch: depth rows of width counters; per-row hash = a slice
# of the md5 digest, so rows are independent and engine-portable.
CM_DEPTH = 3
CM_WIDTH = 64


def cm_counters(df: DataFrame, col: str) -> DataFrame:
    """The count-min grid: (row, bucket, cnt) — depth*width cells max.

    Each input row increments one cell per sketch row; cell counts are a
    single groupBy (map-side combinable).  At 100 TB the grid is still
    CM_DEPTH*CM_WIDTH cells — a broadcastable summary of any key column.
    """
    key = F.col(col).cast("string")
    rows = []
    for d in range(CM_DEPTH):
        # independent 24-bit hash per sketch row: md5 hex digits [1+6d, 6+6d]
        hd = F.conv(F.substring(F.md5(key), 1 + 6 * d, 6), 16, 10).cast("long")
        rows.append(
            df.select(
                F.lit(d).alias("row"),
                (hd % CM_WIDTH).cast("int").alias("bucket"),
            )
        )
    u = rows[0]
    for r in rows[1:]:
        u = u.unionByName(r)
    return u.groupBy("row", "bucket").agg(F.count("*").alias("cnt"))


def cm_estimate(df: DataFrame, col: str, candidates: DataFrame) -> DataFrame:
    """Point-estimate counts for ``candidates`` (a small 1-column DF of
    keys): est = min over sketch rows of the key's cell.  Overestimates
    only (collisions add).  The grid and the candidate probe are both
    broadcast-size; nothing large shuffles.
    """
    from .checkpoint import cut_lineage

    grid = cm_counters(df, col)
    key = F.col(col).cast("string")
    probes = []
    # cut_lineage: the candidate list is referenced once per sketch row
    # (CM_DEPTH times) — when callers derive it from the data (the usual
    # distinct-keys probe) each reference re-scanned the source; the
    # candidate table is small by contract
    candidates = cut_lineage(candidates)
    cname = candidates.columns[0]
    for d in range(CM_DEPTH):
        hd = F.conv(
            F.substring(F.md5(F.col(cname).cast("string")), 1 + 6 * d, 6), 16, 10
        ).cast("long")
        probes.append(
            candidates.select(
                F.col(cname).alias("key"),
                F.lit(d).alias("row"),
                (hd % CM_WIDTH).cast("int").alias("bucket"),
            )
        )
    p = probes[0]
    for r in probes[1:]:
        p = p.unionByName(r)
    return (
        p.join(F.broadcast(grid), ["row", "bucket"])
        .groupBy("key")
        .agg(F.min("cnt").alias("est"))
    )


# ---------------------------------------------------------------------------
# Bloom filter (deterministic, sparse, mergeable)
# ---------------------------------------------------------------------------

BLOOM_K = 4
BLOOM_BITS = 1 << 16  # 65536 bits = 1024 64-bit words (8 KB dense ceiling)


def _bloom_pos(key) -> list["F.Column"]:
    """k=4 16-bit bit positions from ONE md5: hex nibble slices [1:5),
    [5:9), [9:13), [13:17) — 4 hex digits are exactly 16 bits, so no
    modulo (and no modulo-bias) is needed."""
    md = F.md5(key.cast("string"))
    return [
        F.conv(F.substring(md, 1 + 4 * j, 4), 16, 10).cast("long")
        for j in range(BLOOM_K)
    ]


def bloom_build(df: DataFrame, col: str) -> DataFrame:
    """Build a sparse Bloom filter over ``col`` → (word, bits) rows.

    Word w holds bits [64w, 64w+64); rows with no set bits are absent.
    Everything is map-side expression work plus ONE groupBy(word) shuffle
    bounded by 1024 rows regardless of input size; `bit_or` partials are
    map-side combined, and two filters (daily corpus increments, say)
    merge by unioning rows and re-`bit_or`-ing — the same mergeability
    contract as the HLL/count-min sketches above.  The dense form is ≤8 KB:
    always broadcastable, so the intended 100 TB use is "build once on the
    small/authoritative side, broadcast, and pre-filter the probe side of a
    join before its shuffle" (Spark's own runtime row filter, but
    persistent, engine-portable, and exact to re-derive).  md5 keeps the
    DuckDB oracle bit-identical; swap xxhash64 for production throughput.
    """
    pos = _bloom_pos(F.col(col))
    return (
        df.select(F.explode(F.array(*pos)).alias("pos"))
        .select(
            F.expr("pos div 64").alias("word"),
            F.expr("cast(pos % 64 as int)").alias("bit"),
        )
        .groupBy("word")
        .agg(F.bit_or(F.expr("shiftleft(1L, bit)")).alias("bits"))
    )


def bloom_hits(sketch: DataFrame, probe: DataFrame, probe_col: str) -> DataFrame:
    """Per-key Bloom verdict: (key, bloom_hit ∈ {0,1}) for every distinct
    probe key — the reusable membership core of :func:`bloom_probe_summary`
    and the join-prefilter path (broadcast the ≤1024-row sketch, test all
    k bits map-side, no shuffle beyond the per-key combine)."""
    pos = _bloom_pos(F.col("key"))
    exploded = probe.select(F.col(probe_col).alias("key")).distinct().select(
        "key", F.explode(F.array(*pos)).alias("pos")
    ).select(
        "key",
        F.expr("pos div 64").alias("word"),
        F.expr("cast(pos % 64 as int)").alias("bit"),
    )
    return (
        exploded.join(F.broadcast(sketch), "word", "left")
        .select(
            "key",
            F.when(
                F.col("bits").isNotNull()
                & (F.expr("bits & shiftleft(1L, bit)") != 0),
                1,
            )
            .otherwise(0)
            .alias("hit"),
        )
        .groupBy("key")
        .agg((F.sum("hit") == BLOOM_K).cast("int").alias("bloom_hit"))
    )


def bloom_probe_summary(
    sketch: DataFrame, probe: DataFrame, probe_col: str, truth: DataFrame
) -> DataFrame:
    """Probe every ``probe`` key against the filter; summarize accuracy.

    ``truth`` is a 1-column DataFrame of the keys actually inserted.
    Returns ONE row (n_probe, n_true, n_bloom_hits, n_false_pos); the
    no-false-negative law (hits ⊇ truth) makes n_bloom_hits − n_false_pos
    = n_true an invariant the gate checks for free.

    Shape: 4 position rows per probe key joined against the ≤1024-row
    sketch — Catalyst broadcasts the sketch side; the per-key verdict
    (all k bits set) is a map-side combinable groupBy(key).
    """
    hits = bloom_hits(sketch, probe, probe_col)
    tname = truth.columns[0]
    marked = hits.join(
        F.broadcast(truth.select(F.col(tname).alias("key")).distinct().withColumn("is_true", F.lit(1))),
        "key",
        "left",
    ).fillna({"is_true": 0})
    return marked.agg(
        F.count("*").alias("n_probe"),
        F.sum("is_true").alias("n_true"),
        F.sum("bloom_hit").alias("n_bloom_hits"),
        F.sum(F.expr("bloom_hit * (1 - is_true)")).alias("n_false_pos"),
    )


def hll_stream_oracle_sql(
    table: str, key_col: str, ts_col: str, p: int = 8, window_days: int = 7
) -> str:
    """DuckDB mirror of the streaming sliding-register sketch
    (streaming.sliding_hll_registers → hll_estimate_registers): Spark's
    epoch-aligned sliding windows mean an event on day D belongs to the
    windows ENDING on D+1 … D+window_days, each day-aligned."""
    m = 1 << p
    cap = 61 - p
    alpha = 0.7213 / (1.0 + 1.079 / m)
    num = repr(alpha * m * m * float(1 << cap))
    return f"""
WITH h AS (
  SELECT date_trunc('day', {ts_col}) AS day,
         CAST('0x' || substr(md5(CAST({key_col} AS VARCHAR)), 1, 15) AS BIGINT) AS h
  FROM {table}
), r AS (
  SELECT day + to_days(CAST({window_days} - t.d AS INT)) AS window_end,
         h & {m - 1} AS bucket,
         max(CASE WHEN h >> {p} = 0 THEN {cap}
                  ELSE length(bin((h >> {p}) & -(h >> {p}))) END) AS mj
  FROM h, unnest(range(0, {window_days})) AS t(d)
  GROUP BY 1, 2
),
s AS (
  SELECT window_end, count(*) AS present,
         CAST(sum(1::BIGINT << ({cap} - mj)) AS BIGINT) AS z
  FROM r GROUP BY window_end
),
e AS (
  SELECT window_end, present,
         {num} / CAST(z + ({m} - present) * (1::BIGINT << {cap}) AS DOUBLE) AS raw
  FROM s
)
SELECT window_end,
       round(CASE WHEN raw <= {2.5 * m!r} AND present < {m}
                  THEN {float(m)!r} * ln({float(m)!r} / CAST({m} - present AS DOUBLE))
                  ELSE raw END, 4) AS estimate,
       CAST(present AS BIGINT) AS buckets_used
FROM e ORDER BY window_end
"""


def hll_overlap(
    df: DataFrame,
    key_col: str,
    set_col: str,
    set_a: str,
    set_b: str,
    p: int = 8,
) -> DataFrame:
    """Sketch set algebra: distinct-key overlap of two tagged sets in one
    pass — |A|, |B|, |A∪B| from HLL registers, |A∩B| by inclusion-
    exclusion.  One row out: (set_a, set_b, est_a, est_b, est_union,
    est_intersect).

    Registers are mergeable by max, which is what makes the union free:
    the same per-(tag, bucket) partials that estimate each set are
    max-merged across tags for the union — no second scan, no exact
    distinct.  Intersection is est_a + est_b − est_union, clamped at 0
    (inclusion-exclusion error can dip negative for tiny overlaps).

    Shuffle is ≤ 2m register rows regardless of input size; the estimate
    math (with the small-range linear-counting branch) is exactly
    :func:`hll_estimate_registers`, so the DuckDB oracle replicates the
    result bit-for-bit.  Relative error on the intersection compounds to
    ~1.04/sqrt(m) · (|A|+|B|+|A∪B|)/|A∩B| — fine for overlap triage
    (contamination-rate dashboards, cross-source audience overlap),
    wrong tool below ~10% overlap (use the exact semi-join then).
    """
    bucket, rho = hll_register_cols(key_col, p)
    regs = (
        df.where(F.col(set_col).isin(set_a, set_b))
        .select(F.col(set_col).alias("tag"), bucket, rho)
        .groupBy("tag", "bucket")
        .agg(F.max("rho").alias("mj"))
    )
    union_regs = (
        regs.groupBy("bucket")
        .agg(F.max("mj").alias("mj"))
        .select(F.lit("__union__").alias("tag"), "bucket", "mj")
    )
    est = hll_estimate_registers(regs.unionByName(union_regs), ["tag"], p=p)

    def pick(tag: str):
        return F.max(F.when(F.col("tag") == tag, F.col("estimate")))

    out = est.agg(
        pick(set_a).alias("est_a"),
        pick(set_b).alias("est_b"),
        pick("__union__").alias("est_union"),
    )
    inter = F.greatest(
        F.lit(0.0), F.col("est_a") + F.col("est_b") - F.col("est_union")
    )
    return out.select(
        F.lit(set_a).alias("set_a"),
        F.lit(set_b).alias("set_b"),
        "est_a",
        "est_b",
        "est_union",
        F.round(inter, 4).alias("est_intersect"),
    )


def hll_overlap_oracle_sql(
    src_cte: str, set_a: str, set_b: str, p: int = 8
) -> str:
    """DuckDB mirror of :func:`hll_overlap`.  ``src_cte`` must be a CTE
    body yielding (tag, key) rows already filtered to the two tags."""
    m = 1 << p
    cap = 61 - p
    alpha = 0.7213 / (1.0 + 1.079 / m)
    num = repr(alpha * m * m * float(1 << cap))
    return f"""
WITH src AS ({src_cte}),
h AS (
  SELECT tag,
         CAST('0x' || substr(md5(CAST(key AS VARCHAR)), 1, 15) AS BIGINT) AS h
  FROM src
), r AS (
  SELECT tag, h & {m - 1} AS bucket,
         max(CASE WHEN h >> {p} = 0 THEN {cap}
                  ELSE length(bin((h >> {p}) & -(h >> {p}))) END) AS mj
  FROM h GROUP BY tag, bucket
), ru AS (
  SELECT tag, bucket, mj FROM r
  UNION ALL
  SELECT '__union__' AS tag, bucket, max(mj) AS mj FROM r GROUP BY bucket
), s AS (
  SELECT tag, count(*) AS present,
         CAST(sum(1::BIGINT << ({cap} - mj)) AS BIGINT) AS z
  FROM ru GROUP BY tag
), e AS (
  SELECT tag, present,
         {num} / CAST(z + ({m} - present) * (1::BIGINT << {cap}) AS DOUBLE) AS raw
  FROM s
), est AS (
  SELECT tag,
         round(CASE WHEN raw <= {2.5 * m!r} AND present < {m}
                    THEN {float(m)!r} * ln({float(m)!r} / CAST({m} - present AS DOUBLE))
                    ELSE raw END, 4) AS estimate
  FROM e
), piv AS (
  SELECT max(CASE WHEN tag = '{set_a}' THEN estimate END) AS est_a,
         max(CASE WHEN tag = '{set_b}' THEN estimate END) AS est_b,
         max(CASE WHEN tag = '__union__' THEN estimate END) AS est_union
  FROM est
)
SELECT '{set_a}' AS set_a, '{set_b}' AS set_b, est_a, est_b, est_union,
       round(greatest(0.0, est_a + est_b - est_union), 4) AS est_intersect
FROM piv
"""


def cm_estimate_registers(
    grid: DataFrame, candidates: DataFrame, group_col: str = "window_end"
) -> DataFrame:
    """Finish a per-window count-min grid (``group_col``, row, bucket,
    cnt) into per-(window, key) point estimates for ``candidates``.

    est = min over sketch rows of the key's cell, with an ABSENT cell
    counting 0 (a key that never hashed into a window estimates 0, not
    the collision floor).  The candidate probe is |keys|·CM_DEPTH rows —
    broadcast; the grid is windows×depth×width cells.  Overestimates
    only, same guarantee as the batch `cm_estimate`.
    """
    cname = candidates.columns[0]
    probes = []
    for d in range(CM_DEPTH):
        hd = F.conv(
            F.substring(F.md5(F.col(cname).cast("string")), 1 + 6 * d, 6), 16, 10
        ).cast("long")
        probes.append(
            candidates.select(
                F.col(cname).cast("string").alias("key"),
                F.lit(d).alias("row"),
                (hd % CM_WIDTH).cast("int").alias("bucket"),
            )
        )
    p = probes[0]
    for r in probes[1:]:
        p = p.unionByName(r)
    # wins derives from grid, so the probe side would carry the SAME
    # attribute ids as the grid side of the join (a memory-sink view
    # defeats Spark's self-join dedup); project the grid through renamed
    # columns so the right side gets fresh attributes
    wins = grid.select(group_col).distinct()
    cells = wins.join(F.broadcast(p))
    g = grid.select(
        F.col(group_col).alias("__gw"),
        F.col("row").alias("__grow"),
        F.col("bucket").alias("__gbucket"),
        F.col("cnt").alias("__gcnt"),
    )
    on = (
        (F.col(group_col) == F.col("__gw"))
        & (F.col("row") == F.col("__grow"))
        & (F.col("bucket") == F.col("__gbucket"))
    )
    return (
        cells.join(g, on, "left")
        .groupBy(group_col, "key")
        .agg(F.min(F.coalesce(F.col("__gcnt"), F.lit(0))).cast("long").alias("est"))
    )


def kmv_distinct(
    df: DataFrame, group_col: str, col: str, k: int = 64
) -> DataFrame:
    """KMV (k-minimum-values / bottom-k) distinct estimate per group —
    the ORDER-STATISTICS member of the sketch family (Bar-Yossef et al.
    '02): keep the k smallest 60-bit hashes of the value set; if the
    k-th smallest is h_k, the set behaves like (k−1)·2⁶⁰/h_k uniform
    draws.  Unlike HLL it needs no registers or bias table, supports
    exact set operations on the kept hashes (union = merge+re-cut,
    intersection via the Jaccard of bottom-k), and degrades to EXACT
    counting below k (< k hashes seen ⇒ the estimate IS the count).

    Output: ``(group, k, n_hashes, est_distinct)``.

    Scale: the rank filter compiles to Spark's WindowGroupLimit — every
    map task keeps at most k rows per group BEFORE the exchange (plan
    test), so the shuffle carries ≤ k·partitions rows per group however
    large the input; the estimate itself is one fixed double expression
    over two integers (63·2⁶⁰ has 6 significant bits — exact in double;
    IEEE division is correctly rounded in every engine).
    """
    from pyspark.sql import Window

    h = _h60(F.col(col))
    hashes = df.select(F.col(group_col).alias("g"), h.alias("h")).distinct()
    w = Window.partitionBy("g").orderBy("h")
    kept = hashes.withColumn("rn", F.row_number().over(w)).where(
        F.col("rn") <= int(k)
    )
    per = kept.groupBy("g").agg(
        F.count("*").cast("long").alias("n_hashes"),
        F.max("h").alias("hk"),
    )
    num = F.lit(float(int(k) - 1) * float(1 << 60))
    est = F.when(F.col("n_hashes") < int(k), F.col("n_hashes")).otherwise(
        F.floor(num / F.col("hk").cast("double")).cast("long")
    )
    return per.select(
        F.col("g").alias(group_col),
        F.lit(int(k)).cast("long").alias("k"),
        "n_hashes",
        est.alias("est_distinct"),
    ).orderBy(group_col)


def kmv_oracle_sql(table: str, group_col: str, col: str, k: int = 64) -> str:
    """DuckDB mirror of :func:`kmv_distinct` — same hash, same rank cut,
    same closing double expression."""
    num = float(int(k) - 1) * float(1 << 60)
    return f"""
WITH hs AS (
  SELECT DISTINCT {group_col} AS g,
         CAST('0x' || substr(md5(CAST({col} AS VARCHAR)), 1, 15) AS BIGINT)
           AS h
  FROM {table}
),
rk AS (
  SELECT g, h, row_number() OVER (PARTITION BY g ORDER BY h) AS rn FROM hs
),
per AS (
  SELECT g, CAST(count(*) AS BIGINT) AS n_hashes, max(h) AS hk
  FROM rk WHERE rn <= {int(k)} GROUP BY g
)
SELECT g AS {group_col}, CAST({int(k)} AS BIGINT) AS k, n_hashes,
       CASE WHEN n_hashes < {int(k)} THEN n_hashes
            ELSE CAST(floor({num!r} / CAST(hk AS DOUBLE)) AS BIGINT)
       END AS est_distinct
FROM per ORDER BY {group_col}
"""


def kmv_overlap(
    df: DataFrame,
    key_col: str,
    set_col: str,
    set_a: str,
    set_b: str,
    k: int = 64,
) -> DataFrame:
    """KMV set algebra — the bottom-k twin of :func:`hll_overlap`: |A|,
    |B| from each tag's k smallest hashes, |A∪B| from the MERGED hash
    sets re-cut to k (bottom-k of a union is the union of bottom-ks
    re-cut — the mergeability property), |A∩B| by inclusion-exclusion
    clamped at 0.  One row: (set_a, set_b, est_a, est_b, est_union,
    est_intersect).

    Same WindowGroupLimit scale shape as :func:`kmv_distinct`; the union
    estimate never rescans the input — it re-ranks the ≤ 2k kept hashes.
    """
    from pyspark.sql import Window

    h = _h60(F.col(key_col))
    hashes = (
        df.where(F.col(set_col).isin(set_a, set_b))
        .select(F.col(set_col).alias("tag"), h.alias("h"))
        .distinct()
    )
    w = Window.partitionBy("tag").orderBy("h")
    kept = hashes.withColumn("rn", F.row_number().over(w)).where(
        F.col("rn") <= int(k)
    )
    num = F.lit(float(int(k) - 1) * float(1 << 60))
    est = F.when(F.col("n_h") < int(k), F.col("n_h")).otherwise(
        F.floor(num / F.col("hk").cast("double")).cast("long")
    )
    per = (
        kept.groupBy("tag")
        .agg(F.count("*").cast("long").alias("n_h"), F.max("h").alias("hk"))
        .select("tag", est.alias("e"))
    )
    uw = Window.orderBy("h")
    ukept = (
        kept.select("h").distinct()
        .withColumn("rn", F.row_number().over(uw))
        .where(F.col("rn") <= int(k))
    )
    uni = ukept.agg(
        F.count("*").cast("long").alias("n_h"), F.max("h").alias("hk")
    ).select(est.alias("est_union"))
    # an absent tag is an EMPTY set: estimate 0, never a missing row
    # (single aggregate instead of filter+crossJoin, which would emit
    # zero rows when one side has no members)
    ab = per.agg(
        F.coalesce(
            F.max(F.when(F.col("tag") == set_a, F.col("e"))), F.lit(0)
        ).cast("long").alias("est_a"),
        F.coalesce(
            F.max(F.when(F.col("tag") == set_b, F.col("e"))), F.lit(0)
        ).cast("long").alias("est_b"),
    )
    return (
        ab.crossJoin(uni)
        .select(
            F.lit(set_a).alias("set_a"), F.lit(set_b).alias("set_b"),
            "est_a", "est_b", "est_union",
            F.greatest(
                F.lit(0).cast("long"),
                F.col("est_a") + F.col("est_b") - F.col("est_union"),
            ).alias("est_intersect"),
        )
    )


def kmv_overlap_oracle_sql(
    table: str, key_expr: str, set_col: str, set_a: str, set_b: str,
    k: int = 64,
) -> str:
    """DuckDB mirror of :func:`kmv_overlap`."""
    num = float(int(k) - 1) * float(1 << 60)
    est = (
        f"CASE WHEN n_h < {int(k)} THEN n_h"
        f" ELSE CAST(floor({num!r} / CAST(hk AS DOUBLE)) AS BIGINT) END"
    )
    return f"""
WITH hs AS MATERIALIZED (
  SELECT DISTINCT {set_col} AS tag,
         CAST('0x' || substr(md5(CAST({key_expr} AS VARCHAR)), 1, 15)
              AS BIGINT) AS h
  FROM {table} WHERE {set_col} IN ('{set_a}', '{set_b}')
),
kept AS MATERIALIZED (
  SELECT tag, h FROM (
    SELECT tag, h, row_number() OVER (PARTITION BY tag ORDER BY h) AS rn
    FROM hs) WHERE rn <= {int(k)}
),
per AS (
  SELECT tag, {est} AS e FROM (
    SELECT tag, CAST(count(*) AS BIGINT) AS n_h, max(h) AS hk
    FROM kept GROUP BY tag)
),
uni AS (
  SELECT {est} AS est_union FROM (
    SELECT CAST(count(*) AS BIGINT) AS n_h, max(h) AS hk FROM (
      SELECT DISTINCT h FROM kept
      ORDER BY h LIMIT {int(k)}))
)
SELECT '{set_a}' AS set_a, '{set_b}' AS set_b,
       CAST(COALESCE((SELECT e FROM per WHERE tag = '{set_a}'), 0)
            AS BIGINT) AS est_a,
       CAST(COALESCE((SELECT e FROM per WHERE tag = '{set_b}'), 0)
            AS BIGINT) AS est_b,
       est_union,
       greatest(CAST(0 AS BIGINT),
                CAST(COALESCE((SELECT e FROM per WHERE tag = '{set_a}'), 0)
                     AS BIGINT)
                + CAST(COALESCE((SELECT e FROM per WHERE tag = '{set_b}'), 0)
                       AS BIGINT)
                - est_union) AS est_intersect
FROM uni
"""


def ams_f2(df: DataFrame, col: str, k: int = 16, salt: str = "ams") -> DataFrame:
    """AMS "tug-of-war" second-moment sketch (Alon, Matias & Szegedy '96):
    F₂ = Σ_x f_x² — the self-join-size / skew statistic behind join-size
    estimation and heavy-hitter prescreens.  Each of ``k`` estimators
    draws a 4-wise-ish sign s_i(x) ∈ {±1} from md5(salt:i:x) and keeps
    one counter  S_i = Σ_x s_i(x)·f_x ;  E[S_i²] = F₂, and averaging the
    k estimators tightens variance (median-of-means at larger k).

    Everything is exact integer arithmetic: signs from the hash's low
    bit, S_i an exact BIGINT, squares and the error ratio computed in
    128-bit (DECIMAL(38,0) / DuckDB HUGEINT, truncating division on
    non-negative operands — the t-closeness recipe) and reported as
    BIGINT.  The report carries the EXACT F₂ beside the estimate (this
    is the accuracy gate for the sketch, same pattern as
    sketch_hll_distinct / dedup_lsh_recall); a production rollup keeps
    only the k counters, which merge by addition across partitions.

    Output, one row per estimator: ``(estimator, s_i, est)`` plus the
    carried ``(f2_est_mean, f2_exact, rel_err_micro)``.

    Scale: one hash-aggregate to (value, f_x) — the only shuffle that
    sees data-derived keys — then a k-way broadcast explode over the
    bounded value table and a k-row aggregate.  BIGINT bounds: |S_i| ≤ N
    and the squares live in 128-bit; outputs stay < 2⁶³ while F₂ < 2⁶³
    (≈3·10⁹ rows of a single value), past which the report columns
    themselves would need the decimal surface.
    """
    freq = (
        df.select(F.col(col).cast("string").alias("v"))
        .groupBy("v")
        .agg(F.count("*").cast("long").alias("f"))
    )
    est_ids = F.explode(F.array(*[F.lit(i) for i in range(k)])).alias("i")
    signed = freq.select("v", "f", est_ids).withColumn(
        "s",
        F.lit(1)
        - F.lit(2)
        * (
            F.conv(
                F.substring(
                    F.md5(F.concat_ws(":", F.lit(salt), F.col("i"), F.col("v"))),
                    1,
                    15,
                ),
                16,
                10,
            ).cast("long")
            % 2
        ),
    )
    per_est = signed.groupBy("i").agg(
        F.sum(F.col("s") * F.col("f")).cast("long").alias("s_i")
    )
    sq = per_est.withColumn(
        "est_d",
        F.expr("cast(s_i as decimal(38,0)) * cast(s_i as decimal(38,0))"),
    )
    exact = freq.agg(
        F.sum(F.expr("cast(f as decimal(38,0)) * cast(f as decimal(38,0))"))
        .alias("f2_d")
    )
    rep = (
        sq.crossJoin(F.broadcast(exact))
        .withColumn(
            "mean_d", F.expr(f"(sum(est_d) over ()) div {k}")
        )
        .select(
            F.col("i").cast("long").alias("estimator"),
            "s_i",
            F.col("est_d").cast("long").alias("est"),
            F.col("mean_d").cast("long").alias("f2_est_mean"),
            F.col("f2_d").cast("long").alias("f2_exact"),
            F.expr(
                "cast((abs(mean_d - f2_d) * 1000000) div f2_d as bigint)"
            ).alias("rel_err_micro"),
        )
        .orderBy("estimator")
    )
    return rep


def moments_chebyshev(
    df: DataFrame,
    value: str,
    deviations: list[int] = (25, 50, 100, 200),
) -> DataFrame:
    """Moments sketch + Chebyshev tail certification over an integer
    column: maintain only the power sums (n, S₁ = Σx, S₂ = Σx²) — the
    moments-sketch idea (Gan et al. VLDB'18) reduced to its exact
    first two moments — and read out, for each deviation radius ``a``,
    the Chebyshev bound  P(|X − μ| ≥ a) ≤ σ²/a²  next to the EXACT
    empirical exceed fraction, certifying the bound holds on real data.

    Everything is exact integer arithmetic:

      σ²/a² = (n·S₂ − S₁²) / (n²·a²)       (both sides integers)
      |x − μ| ≥ a  ⇔  |x·n − S₁| ≥ a·n     (cross-multiplied, no division)

    so bound_micro = min(10⁶, (n·S₂ − S₁²)·10⁶ div (n²·a²)) and
    actual_micro = (#exceed·10⁶) div n are hash-exact in 128-bit
    (DECIMAL(38,0) / HUGEINT).

    Why it earns a row in the sketch family: (n, S₁, S₂) is the
    archetypal MERGEABLE summary — partial aggregates add; at 100 TB the
    sketch is one map-side-combined aggregate (three longs per partition)
    and the exceed counts are a second map-only pass against broadcast
    scalars.  HLL covers F₀, CM point frequency, KMV overlap, AMS F₂ —
    this adds the moment/tail-bound readout.

    Output, one row per radius: ``(a, n, s1, s2, mean_milli,
    bound_micro, actual_micro)`` with mean_milli = S₁·1000 div n.
    """
    from .checkpoint import cut_lineage

    x = F.col(value).cast("long")
    base = df.select(x.alias("x")).where(F.col("x").isNotNull())
    # cut_lineage: the 1-row moments frame feeds BOTH the exceeds pass
    # and the final readout — without it Spark re-derives it (a third
    # full scan); materializing one 3-number row is free
    mom = base.agg(
        F.count("*").cast("long").alias("n"),
        F.sum("x").cast("long").alias("s1"),
        F.sum(F.expr("cast(x as decimal(38,0)) * x")).alias("s2d"),
    ).transform(cut_lineage)
    devs = [int(a) for a in deviations]
    if any(a < 1 for a in devs):
        raise ValueError(f"moments_chebyshev: deviations {devs} must be >= 1")
    # all radii in ONE conditional-sum pass (2 scans total: moments, exceeds)
    exc = base.crossJoin(F.broadcast(mom)).agg(
        *[
            F.sum(
                F.expr(
                    f"cast(abs(cast(x as decimal(38,0)) * n - s1)"
                    f" >= cast({a} as decimal(38,0)) * n as long)"
                )
            )
            .cast("long")
            .alias(f"e_{a}")
            for a in devs
        ]
    )
    exceeds = exc.select(
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(a).cast("long").alias("a"),
                        F.col(f"e_{a}").alias("n_exceed"),
                    )
                    for a in devs
                ]
            )
        ).alias("r")
    ).select("r.a", "r.n_exceed")
    return (
        exceeds.crossJoin(F.broadcast(mom))
        .select(
            "a",
            "n",
            "s1",
            F.col("s2d").cast("long").alias("s2"),
            # sign·(|s1| div n): Spark decimal `div` truncates toward zero
            # while DuckDB `//` floors, so a negative-sum column would break
            # hash parity without the recipe (r8 ADVICE low; windowed_moments
            # already used it)
            F.expr(
                "cast((case when s1 < 0 then -1 else 1 end)"
                " * ((abs(cast(s1 as decimal(38,0))) * 1000) div n) as bigint)"
            ).alias("mean_milli"),
            F.expr(
                "cast(least(cast(1000000 as decimal(38,0)),"
                " ((cast(n as decimal(38,0)) * s2d - cast(s1 as decimal(38,0)) * s1)"
                "  * 1000000)"
                " div (cast(n as decimal(38,0)) * n * a * a)) as bigint)"
            ).alias("bound_micro"),
            F.expr("cast((cast(n_exceed as decimal(38,0)) * 1000000) div n as bigint)").alias(
                "actual_micro"
            ),
        )
        .orderBy("a")
    )


def sampled_quantiles(
    df: DataFrame,
    group_col: str,
    value_col: str,
    key_col: str,
    level: int = 3,
    qs_permille: tuple[int, ...] = (250, 500, 750, 900, 990),
    salt: str = "sq",
) -> DataFrame:
    """Per-group quantile ESTIMATES from a deterministic hash sample —
    the mergeable quantile sketch completing the family's quantile story
    beyond :func:`histogram_quantiles`' equi-width buckets (whose error
    is bounded by bucket width, bad for skewed tails): sample at rate
    2^-level keyed on md5(salt:key), then take exact type-1 quantiles OF
    THE SAMPLE, whose rank error is O(sqrt(ln(1/δ)/n_sample)) by
    Dvoretzky-Kiefer-Wolfowitz — the estimator KLL/t-digest refine.
    Chosen over a KLL port deliberately: KLL's compactor schedule is
    sequential (order-dependent coin flips — not reproducible across
    partitionings, so no exact oracle can exist), while a keyed-hash
    Bernoulli sample is partition-order-FREE, trivially mergeable
    (sample(A ∪ B) = sample(A) ∪ sample(B) under one hash), incremental
    (a stored sample absorbs new batches with no recompute), and
    engine-exact.

    Estimate: k-th smallest sampled value (milli/cent-quantized integers;
    ties broken by key for full determinism), k = max(1,
    ceil(q·n_sample/1000)) — the type-1 rank recipe every quantile gate
    here uses, never interpolation.

    Output: ``(grp, q_permille, n_sample, est)`` — n_sample carried so
    consumers can apply the DKW band themselves.  Groups with an empty
    sample are (honestly) absent.

    Scale: the corpus pass is one hash-filter (map-only, pushed to the
    scan); everything after runs on the 2^-level sample — the per-group
    rank window sorts n_g/2^level rows, so ``level`` is the knob that
    trades error for window size (level ≈ log2(n_g/10⁵) keeps windows
    flat at any corpus size).  The rank targets are a groupBy(grp) count
    crossJoined with the |qs| literal quantile list (broadcast).
    """
    if not 0 <= int(level) <= 59:
        raise ValueError(f"sampled_quantiles: level={level} outside [0, 59]")
    if not qs_permille or any(not 1 <= int(q) <= 1000 for q in qs_permille):
        raise ValueError(
            f"sampled_quantiles: qs_permille must be within [1, 1000], got "
            f"{qs_permille!r}"
        )
    from pyspark.sql import Window

    from ..operators.sampling import _u60
    from .checkpoint import cut_lineage

    mod = 1 << int(level)
    s = cut_lineage(
        df.select(
            F.col(group_col).alias("grp"),
            F.col(value_col).alias("v"),
            F.col(key_col).alias("id"),
        )
        .where(F.col("v").isNotNull())
        .where(
            _u60(F.concat(F.lit(f"{salt}:"), F.col("id").cast("string")))
            % F.lit(mod)
            == 0
        )
    )
    ranked = s.withColumn(
        "rn", F.row_number().over(Window.partitionBy("grp").orderBy("v", "id"))
    )
    counts = s.groupBy("grp").agg(F.count("*").cast("long").alias("n_sample"))
    qs_lit = F.explode(
        F.array(*[F.lit(int(q)) for q in qs_permille])
    ).alias("q_permille")
    targets = counts.select("grp", "n_sample", qs_lit).withColumn(
        "k",
        F.expr("greatest(cast(1 as bigint), (q_permille * n_sample + 999)"
               " div 1000)"),
    )
    return (
        targets.join(
            ranked,
            (targets.grp == ranked.grp) & (targets.k == ranked.rn),
        )
        .select(
            targets.grp.alias("grp"),
            F.col("q_permille").cast("long").alias("q_permille"),
            "n_sample",
            F.col("v").alias("est"),
        )
        .orderBy("grp", "q_permille")
    )
