"""Privacy auditing for training corpora — k-anonymity over
quasi-identifiers.

`txt_pii_scrub` (operators/text.py) removes direct identifiers; what
remains re-identifiable is the COMBINATION of innocuous columns (source
× language × length band can isolate one document).  The standard audit
is k-anonymity (Sweeney '02): every row must share its quasi-identifier
tuple with at least k−1 others.  Two operators:

  * :func:`k_anonymity_report` — one summary row per k threshold:
    how many equivalence classes exist, how many rows sit in classes
    smaller than k (the at-risk rows), and the minimum class size
    (the dataset's actual k).
  * :func:`k_suppress` — the enforcement step: drop every row whose
    equivalence class is smaller than k (suppression, the conservative
    baseline; generalization hierarchies are domain-specific and belong
    to the caller's bucketing expressions).

Scale: both are one hash-aggregate over the quasi-identifier columns
(map-side combined; the shuffle carries one row per equivalence class,
not per input row), and suppression is a broadcast-or-shuffle semi-join
of the input against the ≥k classes — linear, no driver state.  The
quasi-identifier list is columns/expressions, so callers band continuous
attributes (e.g. ``F.floor(F.col("n_chars") / 100)``) before auditing —
banding IS generalization, expressed declaratively.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window, functions as F


def _classes(df: DataFrame, quasi: list[Column | str]) -> DataFrame:
    cols = [F.col(c) if isinstance(c, str) else c for c in quasi]
    named = [c.alias(f"q{i}") for i, c in enumerate(cols)]
    return (
        df.select(*named)
        .groupBy(*[f"q{i}" for i in range(len(named))])
        .agg(F.count("*").alias("class_size"))
    )


def k_anonymity_report(
    df: DataFrame, quasi: list[Column | str], ks: list[int] = (2, 5, 10)
) -> DataFrame:
    """(k, n_classes, n_rows, n_rows_below_k, n_classes_below_k,
    min_class_size) — one row per requested threshold, ascending k.

    ``min_class_size`` is the dataset's achieved k-anonymity (the same
    value in every row; carried per-row so the frame is self-contained).
    """
    cls = _classes(df, quasi)
    agg = cls.agg(
        F.count("*").cast("long").alias("n_classes"),
        F.sum("class_size").cast("long").alias("n_rows"),
        F.min("class_size").cast("long").alias("min_class_size"),
        *[
            x
            for k in ks
            for x in (
                F.sum(
                    F.when(F.col("class_size") < k, F.col("class_size")).otherwise(0)
                ).cast("long").alias(f"rb_{k}"),
                F.sum(
                    (F.col("class_size") < k).cast("long")
                ).cast("long").alias(f"cb_{k}"),
            )
        ],
    )
    rows = [
        F.struct(
            F.lit(int(k)).cast("long").alias("k"),
            F.col("n_classes"),
            F.col("n_rows"),
            F.col(f"rb_{k}").alias("n_rows_below_k"),
            F.col(f"cb_{k}").alias("n_classes_below_k"),
            F.col("min_class_size"),
        )
        for k in ks
    ]
    return (
        agg.select(F.explode(F.array(*rows)).alias("r"))
        .select("r.*")
        .orderBy("k")
    )


def k_suppress(df: DataFrame, quasi: list[Column | str], k: int) -> DataFrame:
    """Rows of ``df`` whose quasi-identifier equivalence class has at
    least ``k`` members — at-risk rows suppressed, schema unchanged.

    Left-semi join against the ≥k classes: the class table is one row
    per equivalence class (usually tiny → broadcast; AQE decides), and
    the fact side never shuffles when it broadcasts.
    """
    import functools
    import operator

    cols = [F.col(c) if isinstance(c, str) else c for c in quasi]
    tagged = df.withColumns(
        {f"__q{i}": c for i, c in enumerate(cols)}
    )
    qnames = [f"__q{i}" for i in range(len(cols))]
    keep = (
        tagged.groupBy(*qnames)
        .agg(F.count("*").alias("class_size"))
        .where(F.col("class_size") >= int(k))
        .select(*[F.col(q).alias(f"__k{i}") for i, q in enumerate(qnames)])
    )
    # null-safe equality: a NULL quasi value is a class like any other —
    # a plain equi-join would silently suppress every NULL-keyed row
    # regardless of its class size
    cond = functools.reduce(
        operator.and_,
        [tagged[q].eqNullSafe(keep[f"__k{i}"]) for i, q in enumerate(qnames)],
    )
    return tagged.join(keep, cond, "left_semi").drop(*qnames)


def l_diversity_report(
    df: DataFrame,
    quasi: list[Column | str],
    sensitive: Column | str,
    ls: list[int] = (2, 3),
) -> DataFrame:
    """Distinct l-diversity audit (Machanavajjhala et al. '07): k-anonymity
    is not enough when every member of an equivalence class shares the
    same SENSITIVE value — the class is large, yet the attribute is
    disclosed.  One row per threshold l: ``(l, n_classes, n_rows,
    n_rows_below_l, n_classes_below_l, min_distinct_sensitive)`` where a
    class counts "below l" when it holds fewer than l distinct sensitive
    values.

    NULL sensitive values follow SQL ``count(DISTINCT …)`` semantics
    (ignored) — an all-NULL class has diversity 0 and fails every l.

    Scale: one hash-aggregate over (quasi…, sensitive) to distinct, then
    one over quasi — both map-side combined; the shuffles carry one row
    per (class, sensitive value) and one per class.  No expansion of the
    fact table, no window.
    """
    sens = F.col(sensitive) if isinstance(sensitive, str) else sensitive
    cols = [F.col(c) if isinstance(c, str) else c for c in quasi]
    named = [c.alias(f"q{i}") for i, c in enumerate(cols)]
    qnames = [f"q{i}" for i in range(len(named))]
    cls = (
        df.select(*named, sens.alias("s"))
        .groupBy(*qnames)
        .agg(
            F.count("*").alias("class_size"),
            F.count_distinct(F.col("s")).alias("n_distinct"),
        )
    )
    agg = cls.agg(
        F.count("*").cast("long").alias("n_classes"),
        F.sum("class_size").cast("long").alias("n_rows"),
        F.min("n_distinct").cast("long").alias("min_distinct_sensitive"),
        *[
            x
            for l in ls
            for x in (
                F.sum(
                    F.when(F.col("n_distinct") < l, F.col("class_size")).otherwise(0)
                ).cast("long").alias(f"rb_{l}"),
                F.sum(
                    (F.col("n_distinct") < l).cast("long")
                ).cast("long").alias(f"cb_{l}"),
            )
        ],
    )
    rows = [
        F.struct(
            F.lit(int(l)).cast("long").alias("l"),
            F.col("n_classes"),
            F.col("n_rows"),
            F.col(f"rb_{l}").alias("n_rows_below_l"),
            F.col(f"cb_{l}").alias("n_classes_below_l"),
            F.col("min_distinct_sensitive"),
        )
        for l in ls
    ]
    return (
        agg.select(F.explode(F.array(*rows)).alias("r"))
        .select("r.*")
        .orderBy("l")
    )


def t_closeness_report(
    df: DataFrame,
    quasi: list[Column | str],
    sensitive: Column | str,
    ts_scaled: list[int] = (200_000, 350_000, 500_000),
    scale: int = 1_000_000,
) -> DataFrame:
    """t-closeness audit (Li, Li & Venkatasubramanian '07): l-diversity is
    not enough when a class's sensitive-value DISTRIBUTION diverges from
    the table's — 2 distinct values split 99/1 still disclose.  For
    categorical sensitive attributes the distance is total variation:

        TVD(c) = 1/2 · Σ_v | cnt_cv/sz_c − cnt_v/N |

    kept EXACT as the integer rational num/den with
    num = Σ_{v∈c} |cnt_cv·N − cnt_v·sz_c| + sz_c·(N − Σ_{v∈c} cnt_v)
    (the second term folds in every sensitive value absent from the
    class) and den = 2·sz_c·N; thresholds compare by cross-multiplication
    (num·scale > t_scaled·den), so the gate is hash-exact — no float
    division anywhere.  One row per threshold: ``(t_scaled, n_classes,
    n_rows, n_rows_above_t, n_classes_above_t, max_tvd_scaled)`` with
    ``max_tvd_scaled = max_c (num·scale div den)``.

    Scale: one hash-aggregate to (class, value) counts, a broadcast join
    against the value-marginal (bounded by the sensitive domain), one
    window + groupBy sharing the class partitioning — shuffles carry one
    row per (class, value), never per input row.  The num/den rationals
    stay int64-exact while 2·sz·N < 2^63 (N ≤ ~2.1e9 even when one class
    spans the table); the ·scale products are computed in 128-bit
    (Spark DECIMAL(38,0) / DuckDB HUGEINT — Spark's `div` and DuckDB's
    `//` both truncate, and all operands are non-negative, so the
    quotients agree bit-exactly), so scaling num by 1e6 never narrows
    that bound.  Beyond ~2.1e9-row classes the same plan runs with
    num/den themselves built in DECIMAL(38,0)/HUGEINT.
    """
    sens = F.col(sensitive) if isinstance(sensitive, str) else sensitive
    cols = [F.col(c) if isinstance(c, str) else c for c in quasi]
    named = [c.alias(f"q{i}") for i, c in enumerate(cols)]
    qnames = [f"q{i}" for i in range(len(named))]
    base = df.select(*named, sens.alias("s"))

    cv = base.groupBy(*qnames, "s").agg(F.count("*").alias("cnt_cv"))
    gv = base.groupBy("s").agg(F.count("*").alias("cnt_v"))
    nrow = base.agg(F.count("*").cast("long").alias("n_total"))

    w = Window.partitionBy(*qnames)
    jw = (
        cv.join(F.broadcast(gv), "s")
        .crossJoin(F.broadcast(nrow))
        .withColumn("sz", F.sum("cnt_cv").over(w))
    )
    cls = (
        jw.groupBy(*qnames)
        .agg(
            F.max("sz").cast("long").alias("sz"),
            F.max("n_total").cast("long").alias("n_total"),
            F.sum("cnt_v").cast("long").alias("present_gv"),
            F.sum(
                F.abs(F.col("cnt_cv") * F.col("n_total") - F.col("cnt_v") * F.col("sz"))
            ).cast("long").alias("num_present"),
        )
        .withColumn(
            "num",
            F.col("num_present")
            + F.col("sz") * (F.col("n_total") - F.col("present_gv")),
        )
        .withColumn("den", F.lit(2) * F.col("sz") * F.col("n_total"))
        # 128-bit for the ·scale products: num ≤ 2·sz·N can already sit
        # near 2^63, so num·scale must not run in int64 (it would wrap
        # silently under non-ANSI Spark while DuckDB errors — divergence,
        # not failure).  decimal(38,0) `div` truncates like DuckDB's
        # HUGEINT `//`; operands non-negative, so the engines agree.
        .withColumn("num_d", F.col("num").cast("decimal(38,0)"))
        .withColumn("den_d", F.col("den").cast("decimal(38,0)"))
        .withColumn(
            "tvd_scaled",
            F.expr(f"(num_d * {int(scale)}) div den_d").cast("long"),
        )
    )
    agg = cls.agg(
        F.count("*").cast("long").alias("n_classes"),
        F.sum("sz").cast("long").alias("n_rows"),
        F.max("tvd_scaled").cast("long").alias("max_tvd_scaled"),
        *[
            x
            for t in ts_scaled
            for x in (
                F.sum(
                    F.when(
                        F.col("num_d") * int(scale)
                        > F.lit(int(t)) * F.col("den_d"),
                        F.col("sz"),
                    ).otherwise(0)
                ).cast("long").alias(f"ra_{t}"),
                F.sum(
                    (
                        F.col("num_d") * int(scale)
                        > F.lit(int(t)) * F.col("den_d")
                    ).cast("long")
                ).cast("long").alias(f"ca_{t}"),
            )
        ],
    )
    rows = [
        F.struct(
            F.lit(int(t)).cast("long").alias("t_scaled"),
            F.col("n_classes"),
            F.col("n_rows"),
            F.col(f"ra_{t}").alias("n_rows_above_t"),
            F.col(f"ca_{t}").alias("n_classes_above_t"),
            F.col("max_tvd_scaled"),
        )
        for t in ts_scaled
    ]
    return (
        agg.select(F.explode(F.array(*rows)).alias("r"))
        .select("r.*")
        .orderBy("t_scaled")
    )


def _seed_component(c: Column) -> Column:
    """NULL-safe, collision-free encoding of one noise-seed key component:
    NULL → ``n``; a value → ``v<charlen>:<value>`` (length-prefixed so
    distinct group tuples can never concatenate to the same key — e.g.
    ('a:b',) vs ('a','b')).  Identical CASE/length expressions exist in
    the SQL oracles; both engines count CHARACTERS."""
    s = c.cast("string")
    return F.when(s.isNull(), F.lit("n")).otherwise(
        F.concat(F.lit("v"), F.length(s).cast("string"), F.lit(":"), s)
    )


def _seed_key(parts: list[str], comps: list[Column]) -> Column:
    """``part1:part2:enc(c1):enc(c2)…`` — fixed literal prefix parts, then
    one length-prefixed component per group column."""
    pieces: list[Column] = [F.lit(p) for p in parts]
    for c in comps:
        pieces.append(_seed_component(c))
    out = pieces[0]
    for p in pieces[1:]:
        out = F.concat(out, F.lit(":"), p)
    return out


def dp_group_counts(
    df: DataFrame,
    group: list[Column | str],
    epsilon_micro: int = 1_000_000,
    salt: str = "dp",
) -> DataFrame:
    """Laplace-mechanism group counts (Dwork et al. '06): count queries
    have sensitivity 1, so adding Laplace(1/ε) noise to each group's
    count is the textbook ε-DP histogram release.

    **What this implementation is — and is not.**  The noise here is
    SEEDED: u = md5₆₀(salt:group)/2⁶⁰ ∈ [0,1) feeds the Laplace inverse
    CDF  noise = −(1/ε)·sign(u−½)·ln(1−2|u−½|), so the output is a pure
    function of (salt, group).  That makes it a REPRODUCIBLE SIMULATION
    of the mechanism — distributionally a correct Laplace draw, built
    for engine-parity testing (the DuckDB oracle replays it bit-exactly)
    and for auditing the release pipeline's shape.  It is NOT a private
    release under the default public salt: anyone who knows the salt
    recomputes the noise and recovers the exact counts.  A production
    ε-DP release MUST pass a caller-supplied secret, single-use salt per
    release (and even then, determinism-given-the-secret means the salt
    must never be reused across releases of the same data).

    Determinism recipe: the hash and the ln argument (a dyadic rational
    over 2⁶⁰) are exact; one fixed double expression ends in
    floor(x·10⁶ + 0.5) micro-quantization (the PSI recipe), so the gate
    is hash-exact.  Seed-key components are NULL-coalesced and
    length-prefixed (:func:`_seed_component`) so NULL groups draw real
    noise and distinct group tuples can never share a key.

    Output per group: ``(…group…, n, noise_micro, noisy_count_micro)``.
    ``n`` (the true count) is emitted for AUDIT/test parity only — a
    real DP release publishes noisy_count_micro alone; callers drop the
    audit columns at the release boundary.

    Scale: one map-side-combined count aggregate plus a narrow
    projection — noise is computed per GROUP row, never per input row.
    """
    cols = [F.col(c) if isinstance(c, str) else c for c in group]
    named = [c.alias(f"g{i}") for i, c in enumerate(cols)]
    gnames = [f"g{i}" for i in range(len(named))]
    agg = df.select(*named).groupBy(*gnames).agg(
        F.count("*").cast("long").alias("n")
    )
    key = _seed_key([salt], [F.col(g) for g in gnames])
    h = F.conv(F.substring(F.md5(key), 1, 15), 16, 10).cast("long")
    two60 = 1 << 60
    hashed = agg.withColumn("_h", h)
    # v2 = 2^60·|2u−1| as an exact integer; ln argument (2^60−v2)/2^60 is
    # a dyadic rational — greatest(…,1) guards the measure-zero h=0 draw
    # that would be ln(0).
    noise = F.expr(
        f"cast(floor(("
        f"  -(1000000.0 / {epsilon_micro})"
        f"  * sign(2 * _h - {two60})"
        f"  * ln(cast(greatest({two60} - abs(2 * _h - {two60}), 1) as double)"
        f"       / {float(two60)})"
        f") * 1000000.0 + 0.5) as bigint)"
    )
    return (
        hashed.withColumn("noise_micro", noise)
        .select(
            *gnames,
            "n",
            "noise_micro",
            (F.col("n") * F.lit(1_000_000) + F.col("noise_micro"))
            .cast("long")
            .alias("noisy_count_micro"),
        )
        .orderBy(*gnames)
    )


def dp_group_mean(
    df: DataFrame,
    group: list[Column | str],
    value: Column | str,
    lo: float,
    hi: float,
    epsilon_micro: int = 1_000_000,
    salt: str = "dpm",
) -> DataFrame:
    """Laplace clipped-mean release shape (Dwork & Roth '14 §3.4):
    values are clipped to [lo, hi] (bounding each row's influence), then
    the privacy budget is split ε/2 on the clipped SUM (sensitivity
    hi−lo) and ε/2 on the COUNT (sensitivity 1); the released mean is
    their ratio.  Noise draws are seeded from md5₆₀(salt:kind:group)
    exactly like :func:`dp_group_counts` — the same caveat applies
    verbatim: with the default public salt this is a REPRODUCIBLE
    SIMULATION of the mechanism for engine-parity testing, NOT a private
    release (the noise is recomputable by anyone who knows the salt); a
    production ε-DP release requires a caller-supplied secret,
    single-use salt.  Hash-exact under the floor(x·10⁶ + 0.5) recipe;
    key components NULL-coalesced + length-prefixed via
    :func:`_seed_component`.

    Output per group: ``(…group…, n, sum_clipped_cents,
    noise_sum_micro, noise_cnt_micro, dp_mean_milli)`` with
    dp_mean_milli = (noisy_sum·1000) div noisy_count in 128-bit
    (NULL when the noisy count ≤ 0 — honest small-group failure, not a
    fabricated value).  The true n / clipped sum are AUDIT columns; a
    real release keeps only dp_mean_milli.

    Scale: one map-side-combined aggregate + a group-row-only
    projection, same as dp_group_counts.
    """
    cols = [F.col(c) if isinstance(c, str) else c for c in group]
    named = [c.alias(f"g{i}") for i, c in enumerate(cols)]
    gnames = [f"g{i}" for i in range(len(named))]
    v = F.col(value) if isinstance(value, str) else value
    clipped = F.least(F.greatest(v.cast("double"), F.lit(lo)), F.lit(hi))
    agg = (
        df.select(*named, clipped.alias("v"))
        .groupBy(*gnames)
        .agg(
            F.count("*").cast("long").alias("n"),
            F.sum(F.expr("cast(round(100 * v) as bigint)")).alias(
                "sum_clipped_cents"
            ),
        )
    )
    two60 = 1 << 60
    sens_cents = int(round(100 * (hi - lo)))

    def lap(kind: str, b_micro_expr: str) -> Column:
        key = _seed_key([salt, kind], [F.col(g) for g in gnames])
        h = F.conv(F.substring(F.md5(key), 1, 15), 16, 10).cast("long")
        return F.expr(
            f"cast(floor(("
            f"  -({b_micro_expr})"
            f"  * sign(2 * {'_h_' + kind} - {two60})"
            f"  * ln(cast(greatest({two60} - abs(2 * {'_h_' + kind} - {two60}), 1) as double)"
            f"       / {float(two60)})"
            f") * 1000000.0 + 0.5) as bigint)"
        ), h

    # ε/2 each: b_sum = (hi−lo)/(ε/2) in cents·micro, b_cnt = 1/(ε/2)
    noise_sum_expr, h_sum = lap("sum", f"{2 * sens_cents * 1000000.0} / {epsilon_micro}")
    noise_cnt_expr, h_cnt = lap("cnt", f"{2 * 1000000.0} / {epsilon_micro}")
    out = (
        agg.withColumn("_h_sum", h_sum)
        .withColumn("_h_cnt", h_cnt)
        .withColumn("noise_sum_micro", noise_sum_expr)
        .withColumn("noise_cnt_micro", noise_cnt_expr)
    )
    # noisy sum in cents·micro = sum_cents·1e6 + noise_sum_micro·?? — the
    # sum noise is drawn in CENTS·micro units (b includes the ·100 cents
    # scale), the count noise in row·micro units; the 128-bit ratio
    # yields milli-units of the ORIGINAL value scale.
    # the noisy sum is clamped at 0 (valid DP post-processing): a negative
    # numerator would hit the one truncate-vs-floor divergence between
    # Spark's `div` and DuckDB's `//`; with both operands non-negative the
    # engines agree bit-exactly (t-closeness recipe)
    mean_milli = F.expr(
        "case when (n * 1000000 + noise_cnt_micro) <= 0 then null"
        " else cast(greatest("
        "   cast(sum_clipped_cents as decimal(38,0)) * 1000000"
        "   + cast(noise_sum_micro as decimal(38,0)),"
        "   cast(0 as decimal(38,0))) * 10"
        " div (cast(n as decimal(38,0)) * 1000000"
        "      + cast(noise_cnt_micro as decimal(38,0))) as bigint) end"
    )
    return out.select(
        *gnames,
        "n",
        "sum_clipped_cents",
        "noise_sum_micro",
        "noise_cnt_micro",
        mean_milli.alias("dp_mean_milli"),
    ).orderBy(*gnames)


def dp_topk_exponential(
    df: DataFrame,
    group: list[Column | str],
    k: int = 5,
    epsilon_micro: int = 1_000_000,
    salt: str = "dpx",
) -> DataFrame:
    """Exponential-mechanism top-k selection (McSherry & Talwar '07) via
    the report-noisy-max / Gumbel-max equivalence (Durfee & Rogers '19):
    selecting argmax(ε·u/(2Δu) + Gumbel(0,1)) over candidates with
    utility u IS the exponential mechanism — here u = group count
    (Δu = 1), the "which categories may we publish?" selection step that
    complements the numeric releases (:func:`dp_group_counts` histogram,
    :func:`dp_group_mean`).  Composing k picks without replacement is
    equivalent to taking the top-k scores at once (Gumbel-max property).

    SAME CAVEAT as the other two mechanisms, verbatim: the Gumbel draws
    are SEEDED — u₆₀ = md5₆₀(salt:group) via :func:`_seed_key`, g =
    −ln(−ln(u₆₀/2⁶⁰)) — so with the default public salt this is a
    REPRODUCIBLE SIMULATION of the mechanism for engine-parity testing,
    NOT a private release; production requires a caller-supplied secret,
    single-use salt.

    Determinism: both ln calls are the cross-engine trust base composed
    in one fixed expression; the score is quantized floor(x·10⁶ + 0.5)
    ONCE, ties break on the group key.  Output, rank ascending:
    ``(rank, …group…, n, score_micro)`` — ``n`` is an AUDIT column (a
    real release publishes the selected identities, and rank order,
    only).

    Scale: one map-side-combined count aggregate, per-GROUP-row noise,
    one TakeOrdered top-k — never row-scaled beyond the count.
    """
    cols = [F.col(c) if isinstance(c, str) else c for c in group]
    named = [c.alias(f"g{i}") for i, c in enumerate(cols)]
    gnames = [f"g{i}" for i in range(len(named))]
    agg = df.select(*named).groupBy(*gnames).agg(
        F.count("*").cast("long").alias("n")
    )
    key = _seed_key([salt], [F.col(g) for g in gnames])
    h = F.conv(F.substring(F.md5(key), 1, 15), 16, 10).cast("long")
    two60 = 1 << 60
    scored = agg.withColumn("_h", h).withColumn(
        "score_micro",
        F.expr(
            f"cast(floor(("
            f"  ({epsilon_micro} / 1000000.0) * n / 2.0"
            f"  - ln(-ln(cast(greatest(_h, 1) as double) / {float(two60)}))"
            f") * 1000000.0 + 0.5) as bigint)"
        ),
    )
    from pyspark.sql import Window

    w = Window.partitionBy(F.lit(1)).orderBy(
        F.col("score_micro").desc(), *[F.col(g) for g in gnames]
    )
    return (
        scored.orderBy(F.col("score_micro").desc(), *gnames)
        .limit(k)
        .withColumn("rank", F.row_number().over(w).cast("long"))
        .select("rank", *gnames, "n", "score_micro")
        .orderBy("rank")
    )
