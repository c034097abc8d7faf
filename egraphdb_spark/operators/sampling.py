"""Deterministic sampling and dataset splitting.

Training-data pipelines need samples and train/eval splits that are
*stable*: the same document must land in the same split on every run, on
every engine, and after the corpus grows (else eval contaminates train).
``rand()``-based sampling has none of these properties.

Recipe: u = first 15 md5 hex digits of the key as a 60-bit integer;
``u < floor(fraction * 2^60)`` is an exact integer comparison — no float
threshold ambiguity, reproducible in any engine with md5 (the DuckDB
oracle runs the same predicate).  It's a pure narrow filter: no shuffle,
pushes below wide operators, scales to any corpus size.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

_SCALE = 1 << 60


def _u60(key: Column) -> Column:
    """60-bit uniform hash of a key column (salt via concat upstream)."""
    return F.conv(F.substring(F.md5(key.cast("string")), 1, 15), 16, 10).cast(
        "long"
    )


def _threshold(fraction: float) -> int:
    if not 0.0 <= fraction <= 1.0:
        raise ValueError(f"fraction must be in [0, 1], got {fraction}")
    return int(fraction * _SCALE)


def hash_sample(df: DataFrame, key_col: str, fraction: float) -> DataFrame:
    """Deterministic Bernoulli(fraction) sample keyed on ``key_col``.

    Membership depends only on the key — rows sharing a key are kept or
    dropped together, and the sample is a superset of any smaller-fraction
    sample of the same key (nested samples for free).
    """
    return df.where(_u60(F.col(key_col)) < F.lit(_threshold(fraction)))


def train_test_split(
    df: DataFrame, key_col: str, test_fraction: float, salt: str = "split"
) -> DataFrame:
    """Add a ``split`` column ('test' | 'train'), stable per key.

    ``salt`` decorrelates the split from any ``hash_sample`` taken on the
    same key (different hash input → independent uniforms).
    """
    u = _u60(F.concat(F.lit(salt + ":"), F.col(key_col).cast("string")))
    return df.withColumn(
        "split",
        F.when(u < F.lit(_threshold(test_fraction)), F.lit("test")).otherwise(
            F.lit("train")
        ),
    )


def group_split(
    df: DataFrame, group_col: str, test_fraction: float, salt: str = "gsplit"
) -> DataFrame:
    """Leakage-safe train/test split: hash the GROUP key, not the row key.

    Near-duplicate documents cluster within a source/domain/dedup-cluster;
    a per-row split (``train_test_split``) puts some of each cluster in
    train and some in eval, leaking training text into the benchmark.  The
    group-aware split assigns the WHOLE group to one side — the standard
    leakage control for pretraining eval sets (split by domain / by
    near-dup cluster), and the grouped analogue of scikit-learn's
    GroupShuffleSplit.

    Membership is a pure function of the group value (stable under corpus
    growth: new rows of an existing group inherit its side; new groups
    draw fresh uniforms).  Still a narrow projection — the hash is
    computed per row from the group column already present, so there is
    NO join against a group table and no shuffle; Catalyst evaluates the
    CASE inside the scan stage.
    """
    u = _u60(F.concat(F.lit(salt + ":"), F.col(group_col).cast("string")))
    return df.withColumn(
        "split",
        F.when(u < F.lit(_threshold(test_fraction)), F.lit("test")).otherwise(
            F.lit("train")
        ),
    )


def stratified_hash_sample(
    df: DataFrame, key_col: str, strata_col: str, fractions: dict[str, float]
) -> DataFrame:
    """Per-stratum deterministic sampling: ``fractions`` maps a stratum
    value to its keep-rate; unlisted strata are dropped.  The predicate is
    a single CASE — still a narrow, pushdown-friendly filter (Catalyst
    evaluates it inside the scan stage; no shuffle, no sort)."""
    u = _u60(F.col(key_col))
    thr = F.lit(None).cast("long")
    for value, frac in sorted(fractions.items()):
        thr = F.when(F.col(strata_col) == value, F.lit(_threshold(frac))).otherwise(
            thr
        )
    return df.where(u < thr)


def sample_oracle_pred(key_expr: str, fraction: float) -> str:
    """DuckDB predicate matching :func:`hash_sample`'s membership test."""
    return (
        f"CAST('0x' || substr(md5(CAST({key_expr} AS VARCHAR)), 1, 15) AS BIGINT)"
        f" < {_threshold(fraction)}"
    )


def quota_by_group(
    df: DataFrame, key_col: str, group_col: str, quota: int, salt: str = "quota"
) -> DataFrame:
    """Keep at most ``quota`` rows per group, hash-ranked — corpus balancing.

    The per-source cap every mixture pipeline applies before weighting: a
    dominant crawl may not contribute more than N documents.  Selection is
    by the keyed 60-bit hash (deterministic, stable under corpus growth —
    adding documents to OTHER groups never changes a group's survivors),
    with the raw key as the final tie-break.

    Adds ``qrank`` (1-based position within the group).  Scale: one hash
    partition by group + per-group top-N — Spark runs rank-then-filter
    with partial top-N pushed into the sort (no full group materialization
    per reducer beyond the window buffer); skew in a hot group is bounded
    by that group's row count, and the guarded variant at extreme skew is
    skew.salted_topn (same result, two-phase).
    """
    from pyspark.sql import Window

    u = _u60(F.concat(F.lit(salt + ":"), F.col(key_col).cast("string")))
    w = Window.partitionBy(group_col).orderBy(u, F.col(key_col))
    return (
        df.withColumn("qrank", F.row_number().over(w).cast("long"))
        .where(F.col("qrank") <= quota)
    )


def quota_oracle_sql(
    table: str, key_col: str, group_col: str, quota: int, salt: str = "quota"
) -> str:
    """DuckDB mirror of :func:`quota_by_group`."""
    u = (
        f"CAST('0x' || substr(md5('{salt}:' || CAST({key_col} AS VARCHAR)), 1, 15)"
        " AS BIGINT)"
    )
    return f"""
SELECT * FROM (
  SELECT {table}.*,
         CAST(row_number() OVER (PARTITION BY {group_col}
                                 ORDER BY {u}, {key_col}) AS BIGINT) AS qrank
  FROM {table}
)
WHERE qrank <= {quota}
"""


def token_budget_sample(
    df: DataFrame,
    key_col: str,
    group_col: str,
    tokens_col,
    budget: int,
    salt: str = "budget",
) -> DataFrame:
    """Keep a hash-ordered prefix of each group whose cumulative token
    count stays within ``budget`` — corpus construction under a per-source
    token allowance (the budgeted generalization of quota_by_group).

    A document is kept iff the running token sum UP TO AND INCLUDING it
    (in keyed-hash order, key as tie-break) is ≤ budget; all arithmetic is
    integer, so the survivor set is engine-exact.  Adds ``cum_tokens``.
    Scale: one hash partition by group + per-group running sum (window
    prefix sum); groups are independent, skew bounded by the largest
    group's rows.
    """
    from pyspark.sql import Window

    tok = tokens_col if not isinstance(tokens_col, str) else F.col(tokens_col)
    u = _u60(F.concat(F.lit(salt + ":"), F.col(key_col).cast("string")))
    w = (
        Window.partitionBy(group_col)
        .orderBy(u, F.col(key_col))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        df.withColumn("cum_tokens", F.sum(tok.cast("long")).over(w))
        .where(F.col("cum_tokens") <= budget)
    )


def weighted_priority_sample(
    df: DataFrame,
    key_col: str,
    weight_col: str,
    k: int,
    salt: str = "wsample",
) -> DataFrame:
    """Weighted sampling without replacement (Efraimidis–Spirakis A-ES).

    Each row draws a deterministic uniform u ∈ (0, 1] from its keyed
    60-bit md5 hash and gets priority key −ln(u)/w (the exponential-race
    form of u^(1/w)); the k smallest keys are the sample.  Inclusion
    probability is proportional to weight, the draw is reproducible on any
    engine with md5, and — unlike rand()-weighted reservoirs — re-running
    on a grown corpus re-evaluates only the new rows' priorities.

    The priority is quantized to integer micro-units (floor(key·1e6)) with
    the raw key as tie-break, so cross-engine ranking compares integers;
    ln and IEEE division on the same inputs are bit-identical (same trust
    base as the BM25/unigram-NLL gates).  Rows with weight <= 0 are
    excluded (zero weight ⇒ zero inclusion mass).

    Scale: narrow projection + global ORDER BY LIMIT k — Spark's
    TakeOrdered keeps k rows per partition and merges k·P on the driver;
    no full sort, no wide shuffle.
    """
    u = (_u60(F.concat(F.lit(salt + ":"), F.col(key_col).cast("string"))) + 1) / F.lit(
        float(_SCALE)
    )
    w = F.col(weight_col).cast("double")
    key_q = F.floor(-F.log(u) / w * F.lit(1_000_000.0)).cast("long")
    return (
        df.where(w > 0)
        .withColumn("priority_q", key_q)
        .orderBy("priority_q", key_col)
        .limit(k)
    )


def weighted_priority_oracle_sql(
    table: str,
    key_col: str,
    weight_expr: str,
    k: int,
    salt: str = "wsample",
    select_cols: str = "*",
) -> str:
    """DuckDB mirror of :func:`weighted_priority_sample`."""
    u = (
        f"(CAST('0x' || substr(md5('{salt}:' || CAST({key_col} AS VARCHAR)), 1, 15)"
        f" AS BIGINT) + 1) / {float(_SCALE)!r}"
    )
    return f"""
SELECT {select_cols},
       CAST(floor(-ln({u}) / w * 1000000.0) AS BIGINT) AS priority_q
FROM (SELECT {table}.*, CAST({weight_expr} AS DOUBLE) AS w FROM {table})
WHERE w > 0
ORDER BY priority_q, {key_col}
LIMIT {k}
"""


def class_balance(
    df: DataFrame, key_col: str, label_col: str, salt: str = "balance"
) -> DataFrame:
    """Balanced-class downsample: every label keeps exactly min-class-count
    rows (the ML-prep step before training a classifier on skewed labels —
    fine-tune mixes, quality-classifier training sets).

    Selection within each label is the deterministic keyed-hash order the
    sampling family uses (re-running on a grown corpus keeps prior picks
    unless new rows hash earlier — no rand()).  Summary output per label:
    (label, n_orig, n_kept, sum_kept_ids) — n_kept is constant by
    construction and sum_kept_ids pins the exact membership.

    Scale: one count aggregate, a 1-row min broadcast, one per-label
    window (parallel across labels; if one label dominates the corpus its
    partition sort is the cost — pre-filter with a hash band when
    min-count ≪ label size).
    """
    from pyspark.sql import Window

    counts = df.groupBy(label_col).agg(F.count("*").alias("n_orig"))
    m = counts.agg(F.min("n_orig").alias("m"))
    u = _u60(F.concat(F.lit(salt + ":"), F.col(key_col).cast("string")))
    w = Window.partitionBy(label_col).orderBy(u, F.col(key_col))
    kept = (
        df.select(F.col(label_col), F.col(key_col))
        .withColumn("rn", F.row_number().over(w))
        .crossJoin(F.broadcast(m))
        .where(F.col("rn") <= F.col("m"))
    )
    return (
        kept.groupBy(label_col)
        .agg(
            F.count("*").alias("n_kept"),
            F.sum(key_col).alias("sum_kept_ids"),
        )
        .join(counts, label_col)
        .select(label_col, "n_orig", "n_kept", "sum_kept_ids")
    )


def class_balance_oracle_sql(
    table: str, key_col: str, label_col: str, salt: str = "balance"
) -> str:
    """DuckDB mirror of :func:`class_balance`."""
    u = (
        f"CAST(('0x' || substr(md5('{salt}:' || CAST({key_col} AS VARCHAR)), 1, 15))"
        f" AS BIGINT)"
    )
    return f"""
WITH counts AS (SELECT {label_col}, count(*) AS n_orig FROM {table} GROUP BY {label_col}),
m AS (SELECT min(n_orig) AS m FROM counts),
ranked AS (
  SELECT {label_col}, {key_col},
         row_number() OVER (PARTITION BY {label_col}
                            ORDER BY {u}, {key_col}) AS rn
  FROM {table}
),
kept AS (SELECT {label_col}, {key_col} FROM ranked, m WHERE rn <= m.m)
SELECT kept.{label_col}, n_orig, count(*) AS n_kept,
       CAST(sum({key_col}) AS BIGINT) AS sum_kept_ids
FROM kept JOIN counts ON counts.{label_col} = kept.{label_col}
GROUP BY kept.{label_col}, n_orig
"""


def reservoir_per_group(
    df: DataFrame, group_col: str, key_col: str, k: int
) -> DataFrame:
    """Exactly min(k, |group|) rows per group, deterministically — the
    "show me k examples from every source" sample (eyeballing, per-domain
    eval slices, stratified debugging).  A true reservoir is stateful and
    order-dependent; the distributed equivalent is bottom-k by a keyed
    hash priority: rank rows within each group by (u60(key), key) and
    keep rank ≤ k.  Same-key rows rank identically on every engine, every
    run, and the sample only changes where the group itself changed.

    Scale: rank ≤ k over a window is planned as WindowGroupLimit on
    Spark 3.5+/4.x — each map task keeps only its local top-k per group
    BEFORE the shuffle, so the exchange carries O(k · groups ·
    partitions) rows, not the corpus (plan-asserted in
    tests/test_plans.py).  No global sort anywhere.
    """
    from pyspark.sql import Window as W

    u = _u60(F.concat(F.lit("rsv:"), F.col(key_col).cast("string")))
    w = W.partitionBy(group_col).orderBy(u.asc(), F.col(key_col).asc())
    return (
        df.withColumn("_rn", F.row_number().over(w))
        .where(F.col("_rn") <= k)
        .drop("_rn")
    )


def neyman_allocation_sample(
    df: DataFrame,
    stratum_col: str,
    value_col: str,
    id_col: str,
    budget: int,
) -> DataFrame:
    """Neyman-optimal stratified sampling (Neyman '34): the sample
    budget is allocated ∝ N_h·σ_h — high-variance strata get more rows
    than proportional allocation would give, minimizing the estimator's
    variance at fixed cost.  Output per stratum: ``(stratum, n_rows,
    weight_milli, alloc, n_sampled, sum_sampled_ids)`` — the id sum pins
    EXACT membership, not just counts.

    Determinism: σ_h derives from exact integer moments (Σx, Σx² over an
    integer value column), closed in one fixed double expression ending
    in the correctly-rounded sqrt; the weight quantizes to integer milli
    BEFORE the allocating division ``alloc = budget·w div Σw`` (capped at
    N_h).  Membership = the alloc smallest portable-hash ids per stratum
    — the same WindowGroupLimit shape as the KMV sketch, so map tasks
    emit at most alloc rows per stratum.
    """
    from pyspark.sql import Window

    v = F.col(value_col).cast("long")
    stats = df.groupBy(F.col(stratum_col).alias("g")).agg(
        F.count("*").cast("long").alias("n_rows"),
        F.sum(v).alias("sx"),
        F.sum(v * v).alias("sxx"),
    )
    w_milli = F.expr(
        "cast(floor(cast(n_rows as double) * sqrt("
        "  greatest(0.0, (cast(n_rows as double) * cast(sxx as double)"
        "   - cast(sx as double) * cast(sx as double))"
        "  / (cast(n_rows as double) * cast(n_rows as double)))"
        ") * 1000) as bigint)"
    )
    from .checkpoint import cut_lineage

    # cut_lineage on the |strata|-row tables: weighted feeds the wsum
    # scalar AND the allocation; alloc feeds the membership join AND the
    # final readout — uncut, each reference re-derived the full-data
    # moments aggregate (5 source scans measured)
    weighted = stats.select(
        "g", "n_rows", w_milli.alias("weight_milli")
    ).transform(cut_lineage)
    tot = weighted.agg(F.sum("weight_milli").alias("wsum"))
    alloc = weighted.crossJoin(F.broadcast(tot)).select(
        "g", "n_rows", "weight_milli",
        F.least(
            F.col("n_rows"),
            F.expr(f"({int(budget)} * weight_milli) div nullif(wsum, 0)"),
        ).alias("alloc"),
    ).transform(cut_lineage)
    ranked = df.select(
        F.col(stratum_col).alias("g"),
        F.col(id_col).alias("id"),
        _u60(F.concat(F.lit("neyman:"), F.col(id_col).cast("string"))).alias(
            "h"
        ),
    ).withColumn(
        "rn",
        F.row_number().over(Window.partitionBy("g").orderBy("h", "id")),
    )
    sampled = ranked.join(F.broadcast(alloc.select("g", "alloc")), "g").where(
        F.col("rn") <= F.col("alloc")
    )
    picks = sampled.groupBy("g").agg(
        F.count("*").cast("long").alias("n_sampled"),
        F.sum("id").cast("long").alias("sum_sampled_ids"),
    )
    return (
        alloc.join(picks, "g", "left")
        .select(
            F.col("g").alias(stratum_col), "n_rows", "weight_milli",
            F.coalesce(F.col("alloc"), F.lit(0)).cast("long").alias("alloc"),
            F.coalesce(F.col("n_sampled"), F.lit(0)).alias("n_sampled"),
            "sum_sampled_ids",
        )
        .orderBy(stratum_col)
    )


def epoch_shuffle(
    df: DataFrame,
    key_col: str,
    epochs: int = 2,
    n_shards: int = 8,
    salt: str = "epoch",
) -> DataFrame:
    """Reproducible training-epoch shuffle: every epoch is a fresh
    pseudo-random permutation of the corpus that is a PURE FUNCTION of
    (salt, epoch, key) — re-running epoch 3 after a crash replays the
    exact same order, and no two epochs share an order (the epoch number
    is folded into the hash input).

    Distributed shape (how epoch shuffling actually runs at 100 TB): a
    global rank would be a total sort, so instead each row hashes to one
    of ``n_shards`` shards and carries a 60-bit order key; readers stream
    shards in ``order_key`` order.  Both the shard assignment and the
    within-shard order are deterministic, so the output is engine-exact.

    Adds ``(epoch, shard, order_key)`` — one output row per (input row,
    epoch).  Narrow except the epoch explode (rows × epochs); no shuffle
    is introduced here — downstream writers partition by (epoch, shard).
    """
    if epochs < 1 or n_shards < 1:
        raise ValueError("epochs and n_shards must be >= 1")
    # the three output columns are reserved: withColumn would silently
    # clobber a same-named input (and a pre-existing `epoch` would be
    # overwritten before _u60 reads it, changing every order key)
    clash = {"epoch", "order_key", "shard"} & set(df.columns)
    if clash:
        raise ValueError(
            f"epoch_shuffle reserves output columns {sorted(clash)}; "
            "rename them on the input DataFrame first"
        )
    u = _u60(
        F.concat(
            F.lit(salt + ":"),
            F.col("epoch").cast("string"),
            F.lit(":"),
            F.col(key_col).cast("string"),
        )
    )
    return (
        df.withColumn(
            "epoch", F.explode(F.sequence(F.lit(1), F.lit(int(epochs))))
        )
        .withColumn("epoch", F.col("epoch").cast("long"))
        .withColumn("order_key", u)
        .withColumn(
            "shard", (F.col("order_key") % F.lit(int(n_shards))).cast("long")
        )
    )


def bucketed_cumsum(
    df: DataFrame, id_col: str, val_col: str, bucket_width: int = 1024
) -> DataFrame:
    """Scale-safe cumulative sum of ``val_col`` in ``id_col`` order —
    NEVER a single-partition global window: rows bucket by
    ``id div bucket_width``; each bucket's local cumsum is a
    bucket-partitioned window (parallel), and bucket offsets come from a
    window over the BUCKET TOTALS table (rows = n/bucket_width) joined
    back.  Returns the input columns plus ``cum`` (inclusive prefix sum).

    The shared cumulative-line primitive under PPS systematic sampling
    and the Heaps-law checkpoints; a SQL oracle may use a plain ordered
    cumsum — identical VALUES, different plan.
    """
    from pyspark.sql import Window

    bkt = F.expr(f"{id_col} div {int(bucket_width)}")
    local_w = (
        Window.partitionBy("__bucket")
        .orderBy(id_col)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    local = df.withColumn("__bucket", bkt).withColumn(
        "__local_cum", F.sum(val_col).over(local_w).cast("long")
    )
    totals = local.groupBy("__bucket").agg(
        F.sum(val_col).cast("long").alias("__bw")
    )
    off_w = (
        Window.partitionBy(F.lit(1))
        .orderBy("__bucket")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    offsets = totals.withColumn(
        "__offset", F.coalesce(F.sum("__bw").over(off_w), F.lit(0)).cast("long")
    ).select("__bucket", "__offset")
    return (
        local.join(offsets, "__bucket")
        .withColumn("cum", (F.col("__offset") + F.col("__local_cum")).cast("long"))
        .drop("__bucket", "__local_cum", "__offset")
    )


def pps_systematic(
    df: DataFrame,
    id_col: str,
    weight_col: str | Column,
    k: int,
    salt: str = "pps",
    bucket_width: int = 1024,
) -> DataFrame:
    """Probability-proportional-to-size SYSTEMATIC sampling (Madow '49)
    — the fixed-size weighted design production samplers use when
    per-row Bernoulli draws can't guarantee the budget: lay the units
    along the cumulative-weight line, drop exactly ``k`` equally-spaced
    selection points, and take every unit an interval lands in.  Exactly
    k selections always; a unit with w > W/k is drawn multiple times
    (its multiplicity is reported, the standard PPS-with-replacement
    readout).

    All arithmetic is exact integers: with cumulative weights C_i, total
    W, and a seeded anchor U = md5₆₀(salt) mod W,

        hits_i = (C_i·k + U) div W − ((C_i − w_i)·k + U) div W

    — every operand non-negative, so Spark ``div`` ≡ DuckDB ``//`` ≡
    floor, and the whole draw is a pure function of (salt, data).

    The cumulative sum is built SCALE-SAFELY — never a single-partition
    global window: units bucket by ``id div bucket_width``; each
    bucket's local cumsum is a bucket-partitioned window (parallel), and
    the bucket offsets come from a window over the BUCKET TOTALS table
    (rows = n/bucket_width, e.g. 100 M buckets for 100 G rows at the
    default width — still driver-safe as a shuffle, tiny at any
    realistic width) joined back.  A SQL oracle can use a plain ordered
    cumsum; the VALUES agree, only the plan differs.

    Rows with NULL or non-positive weight are excluded (a zero-weight
    unit has selection probability zero by definition; negative weights
    are a caller bug surfaced by exclusion, mirrored in oracles).

    Output, ordered by id: ``(id, w, cum_w, n_hits)`` for selected units
    (n_hits ≥ 1); sum(n_hits) == k by construction.
    """
    if k < 1:
        raise ValueError(f"pps_systematic: k={k} must be >= 1")
    w = F.col(weight_col) if isinstance(weight_col, str) else weight_col
    base = df.select(
        F.col(id_col).cast("long").alias("id"), w.cast("long").alias("w")
    ).where(F.col("w").isNotNull() & (F.col("w") > 0) & F.col("id").isNotNull())

    cum = bucketed_cumsum(base, "id", "w", bucket_width).withColumnRenamed(
        "cum", "cum_w"
    )
    # tot_w/anchor_u, not W/U: Spark resolution is case-insensitive, so a
    # total named "W" collides with the per-row weight "w"
    anchor = (
        base.agg(F.sum("w").cast("long").alias("tot_w"))
        .withColumn(
            "anchor_u",
            F.expr(
                f"cast(conv(substring(md5('{salt}'), 1, 15), 16, 10)"
                f" as bigint) % tot_w"
            ).cast("long"),
        )
    )
    return (
        cum.crossJoin(F.broadcast(anchor))
        .withColumn(
            "n_hits",
            F.expr(
                f"cast((cast(cum_w as decimal(38,0)) * {k} + anchor_u)"
                f" div tot_w"
                f" - (cast(cum_w - w as decimal(38,0)) * {k} + anchor_u)"
                f" div tot_w"
                " as bigint)"
            ),
        )
        .where(F.col("n_hits") >= 1)
        .select("id", "w", "cum_w", "n_hits")
        .orderBy("id")
    )
