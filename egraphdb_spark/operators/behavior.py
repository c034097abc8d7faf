"""Behavioral / product-analytics operators: ordered funnels with step timing,
and cohort LTV triangles.

The reference serves the raw event-scan surface (S4 time-range scans over
time-partitioned tables, src/egraph_kv_util.erl) but has no behavioral
layer; these are the queries every product-analytics store
(Amplitude/Mixpanel-class) front-ends that raw surface with.  Both
are expressed as declarative DataFrame plans so Catalyst handles pushdown
and AQE handles skew.

Determinism contract (matches the rest of the suite):
- monetary values quantize to integer cents (round half-up ×100, the
  timeseries.py convention) BEFORE any aggregation;
- every ordering that feeds a lag/first selection uses the total order
  (ts, event_id) — unique because event_id is unique;
- ratios surface as integer permille via BIGINT ``div``.

Scale notes:
- ``funnel_steps``: one filtered aggregate per step, each keyed on the
  user column, so every stage join is co-partitioned with the previous
  aggregate's shuffle (Spark reuses the hash partitioning — no extra
  exchange per step beyond the first).  The per-step frames carry one row
  per surviving user, shrinking monotonically down the funnel; the final
  counts are single-row aggregates.  Event-type predicates push into the
  parquet scan.
- ``cohort_ltv``: per-user first-activity week (map-side-combined min),
  per-(user, week) cents sums, then a |cohorts|×|weeks|-bounded triangle;
  the running cumulative window partitions by cohort over ≤ |weeks| rows.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F


def funnel_steps(
    events: DataFrame,
    user_col: str,
    ts_col: str,
    type_col: str,
    steps: list[str],
    horizon_days: int = 7,
) -> DataFrame:
    """Ordered-funnel conversion: for each step i, count users whose first
    step-i event occurs AFTER their first step-(i-1) event and within
    ``horizon_days`` of their first step-0 event.

    Output: (step_idx INT, step STRING, n_users BIGINT,
    conv_permille BIGINT, avg_secs_from_first BIGINT) — conversion
    relative to step 0 and the mean seconds from the user's first step-0
    event to this step's first event (exact integer: Σ sec-diffs div n;
    0 for step 0), one row per step, ordered by step_idx.  "First
    matching event" per stage makes the funnel strictly ordered (a click
    before the first view does not count), the standard
    product-analytics semantics; the timing column is what the depth
    histogram (q_evt_funnel) cannot express.
    """
    if len(steps) < 2:
        raise ValueError("funnel needs at least 2 steps")
    from .checkpoint import cut_lineage

    u, ts, ty = F.col(user_col), F.col(ts_col), F.col(type_col)
    ev = events.select(u.alias("u"), ts.alias("ts"), ty.alias("ty"))
    # cut_lineage per stage: each stage frame is referenced twice (its
    # count aggregate + the next stage's join, and stage 0 a third time
    # as the conversion base) — uncut, stage i re-derives the whole
    # event-scan chain per reference (7 source scans measured); each
    # checkpointed stage is one |users|-row frame
    stage = (
        ev.where(F.col("ty") == steps[0])
        .groupBy("u")
        .agg(F.min("ts").alias("t"))
        .withColumn("t0", F.col("t"))
        .withColumn("deadline", F.expr(f"t + INTERVAL {int(horizon_days)} DAY"))
        .transform(cut_lineage)
    )
    lag_secs = F.expr("unix_timestamp(t) - unix_timestamp(t0)")
    counts = [
        stage.agg(
            F.count("*").alias("n"), F.sum(lag_secs).cast("long").alias("lag_sum")
        )
    ]
    for s in steps[1:]:
        nxt = ev.where(F.col("ty") == s).withColumnRenamed("ts", "ts_s")
        stage = (
            nxt.join(stage, "u")
            .where((F.col("ts_s") > F.col("t")) & (F.col("ts_s") <= F.col("deadline")))
            .groupBy("u", "t0", "deadline")
            .agg(F.min("ts_s").alias("t"))
            .select("u", "t", "t0", "deadline")
            .transform(cut_lineage)
        )
        counts.append(
            stage.agg(
                F.count("*").alias("n"),
                F.sum(lag_secs).cast("long").alias("lag_sum"),
            )
        )
    rows = None
    for i, (s, c) in enumerate(zip(steps, counts)):
        r = c.select(
            F.lit(i).alias("step_idx"),
            F.lit(s).alias("step"),
            F.col("n").cast("long").alias("n_users"),
            F.col("lag_sum"),
        )
        rows = r if rows is None else rows.unionByName(r)
    first = counts[0].select(F.col("n").alias("n0"))
    return (
        rows.crossJoin(F.broadcast(first))
        .select(
            "step_idx",
            "step",
            "n_users",
            F.expr("coalesce(n_users * 1000 div nullif(n0, 0), 0)").alias(
                "conv_permille"
            ),
            F.expr("coalesce(lag_sum div nullif(n_users, 0), 0)").alias(
                "avg_secs_from_first"
            ),
        )
        .orderBy("step_idx")
    )


def cohort_ltv(
    events: DataFrame,
    user_col: str,
    ts_col: str,
    type_col: str,
    value_col: str,
    revenue_type: str,
) -> DataFrame:
    """Cohort LTV triangle: users cohorted by first-activity week, revenue
    (events of ``revenue_type``, integer cents) accumulated per cohort by
    week offset.

    Output per (cohort_week TIMESTAMP, week_offset BIGINT):
    cohort_users, rev_cents, cum_rev_cents (running sum over offsets),
    cum_per_user_cents (cum div cohort size) — the revenue twin of the
    retention count matrix (q_evt_retention counts actives; this prices
    them).  Cohort keys stay TIMESTAMP (the evt_retention dtype lesson).
    """
    u, ts = F.col(user_col), F.col(ts_col)
    first = events.groupBy(u.alias("u")).agg(
        F.date_trunc("week", F.min(ts)).alias("cohort_week")
    )
    cents = F.round(F.col(value_col) * 100).cast("long")
    rev = (
        events.where(F.col(type_col) == revenue_type)
        .select(
            u.alias("u"),
            F.date_trunc("week", ts).alias("week"),
            cents.alias("cents"),
        )
        .groupBy("u", "week")
        .agg(F.sum("cents").alias("cents"))
    )
    size = first.groupBy("cohort_week").agg(F.count("*").alias("cohort_users"))
    tri = (
        rev.join(first, "u")
        .groupBy(
            "cohort_week",
            F.expr("datediff(week, cohort_week) div 7").alias("week_offset"),
        )
        .agg(F.sum("cents").alias("rev_cents"))
    )
    w = (
        Window.partitionBy("cohort_week")
        .orderBy("week_offset")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        tri.withColumn("cum_rev_cents", F.sum("rev_cents").over(w))
        .join(F.broadcast(size), "cohort_week")
        .select(
            "cohort_week",
            "week_offset",
            "cohort_users",
            "rev_cents",
            "cum_rev_cents",
            F.expr("cum_rev_cents div cohort_users").alias("cum_per_user_cents"),
        )
        .orderBy("cohort_week", "week_offset")
    )


def attribution_last_touch(
    events: DataFrame,
    user_col: str,
    ts_col: str,
    id_col: str,
    type_col: str,
    value_col: str,
    conversion_type: str = "purchase",
    touch_types: tuple = ("click", "view"),
    window_hours: int = 72,
) -> DataFrame:
    """Last-touch attribution: each conversion's revenue is credited to
    the user's most recent touch event within ``window_hours`` (or
    'direct' if none) — the marketing-analytics twin of the funnel.

    One pass, no self-join: touches and conversions interleave in a
    per-user window ordered by the TOTAL order (ts, is_conversion,
    event_id) — a touch at the conversion's exact timestamp sorts first
    and is attributable, and tied timestamps cannot flip runs or engines
    (the hostile-events fuzzer generates exactly those ties).  The
    carried touch is ``last(..., ignorenulls)`` over the preceding
    frame; the window test then applies the recency cutoff row-locally.

    Revenue is integer cents (round half-up ·100 before the sum).
    Scale: one hash exchange on the user key; the window is
    partition-parallel; output is |channels| rows.
    """
    from pyspark.sql import Window as W

    base = events.where(
        F.col(type_col).isin([conversion_type, *touch_types])
    ).select(
        F.col(user_col).alias("u"),
        F.col(ts_col).alias("ts"),
        F.col(id_col).alias("eid"),
        F.col(type_col).alias("t"),
        F.when(
            F.col(type_col) == conversion_type,
            F.round(F.col(value_col) * 100).cast("long"),
        ).alias("cents"),
        (F.col(type_col) == conversion_type).cast("int").alias("is_conv"),
    )
    w = (
        W.partitionBy("u")
        .orderBy("ts", "is_conv", "eid")
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    touch_t = F.last(
        F.when(F.col("is_conv") == 0, F.col("t")), ignorenulls=True
    ).over(w)
    touch_ts = F.last(
        F.when(F.col("is_conv") == 0, F.col("ts")), ignorenulls=True
    ).over(w)
    attributed = (
        base.select("*", touch_t.alias("tt"), touch_ts.alias("tts"))
        .where(F.col("is_conv") == 1)
        .select(
            F.when(
                F.col("tts")
                >= F.col("ts") - F.expr(f"INTERVAL {int(window_hours)} HOURS"),
                F.col("tt"),
            )
            .otherwise(F.lit("direct"))
            .alias("channel"),
            "cents",
        )
    )
    return (
        attributed.groupBy("channel")
        .agg(
            F.count("*").cast("long").alias("n_conversions"),
            F.sum("cents").cast("long").alias("cents"),
        )
        .orderBy("channel")
    )


def kaplan_meier(
    events: DataFrame,
    user_col: str,
    ts_col: str,
    churn_gap_days: int = 7,
) -> DataFrame:
    """Kaplan-Meier survival curve of user lifetime (product-limit
    estimator, Kaplan & Meier '58) — churn analytics with CENSORING done
    right: a user whose last event is within ``churn_gap_days`` of the
    corpus end may still be active, so they leave the risk set without
    counting as a death (naive churn rates over-count exactly these).

    Per user: lifetime t = days from first to last event; churned iff
    the last event predates corpus-end − gap.  For each distinct t with
    churn events: ``(t_days, n_at_risk, n_events, surv_micro)`` where
    n_at_risk counts users with lifetime ≥ t and the survival product
    S_i = S_{i−1} · (n_i − d_i) div n_i runs in integer micro-units —
    the recurrence no window expresses, folded over the (bounded:
    ≤ distinct-lifetime-count) risk table; the oracle replays it with a
    recursive CTE, bit-exact.

    Scale: one per-user aggregate (map-side combined), one tiny
    per-lifetime aggregate, one cumulative window over ≤ span-days rows,
    one single-group fold of that bounded array.  Nothing corpus-sized
    past the first aggregate.
    """
    from pyspark.sql import Window

    day = F.date_trunc("day", F.col(ts_col))
    per_user = (
        events.groupBy(F.col(user_col).alias("u"))
        .agg(F.min(day).alias("d0"), F.max(day).alias("d1"))
        .crossJoin(
            F.broadcast(events.agg(F.max(day).alias("dmax")))
        )
        .select(
            F.datediff("d1", "d0").cast("long").alias("t"),
            (
                F.datediff("dmax", "d1") > F.lit(int(churn_gap_days))
            ).cast("long").alias("churned"),
        )
    )
    per_t = per_user.groupBy("t").agg(
        F.count("*").cast("long").alias("n_here"),
        F.sum("churned").cast("long").alias("d"),
    )
    w = Window.orderBy("t").rowsBetween(Window.unboundedPreceding, -1)
    risk = per_t.select(
        "t", "d",
        (
            F.lit(0).cast("long")
            + F.sum("n_here").over(
                Window.orderBy(F.lit(1)).rowsBetween(
                    Window.unboundedPreceding, Window.unboundedFollowing
                )
            )
            - F.coalesce(F.sum("n_here").over(w), F.lit(0))
        ).alias("n"),
    ).where(F.col("d") > 0)
    folded = risk.groupBy(F.lit(1).alias("g")).agg(
        F.expr(
            """
            aggregate(
              sort_array(collect_list(struct(t, d, n))),
              cast(array() as
                   array<struct<t:bigint,d:bigint,n:bigint,s:bigint>>),
              (acc, x) -> acc || array(named_struct(
                't', x.t, 'd', x.d, 'n', x.n,
                's', if(size(acc) = 0,
                        (1000000L * (x.n - x.d)) div x.n,
                        (element_at(acc, -1).s * (x.n - x.d)) div x.n)))
            )
            """
        ).alias("series")
    )
    return (
        folded.select(F.explode("series").alias("e"))
        .select(
            F.col("e.t").alias("t_days"),
            F.col("e.n").alias("n_at_risk"),
            F.col("e.d").alias("n_events"),
            F.col("e.s").alias("surv_micro"),
        )
        .orderBy("t_days")
    )


def markov_stationary(
    events: DataFrame,
    user_col: str,
    ts_col: str,
    order_col: str,
    state_col: str,
    iters: int = 4,
    scale: int = 10**12,
) -> DataFrame:
    """Stationary distribution of the per-user state-transition chain —
    "where does a user session settle": π·P by integer power iteration,
    π in fixed-point parts-per-10¹² (the pagerank discipline: float
    chains are summation-order-dependent and never hash-match across
    engines).

    Transition counts come from one lead() window per user (the
    evt_transitions shape); each round is
    ``π'(j) = Σ_i (π(i)·c(i,j)) div r(i)`` — div truncation leaks a few
    units of mass per round (deterministically, identically in both
    engines); states with no OUTGOING transitions drop their mass, the
    documented dangling-state deviation.  The state space is
    vocabulary-sized, so each round's join touches |states|² rows at
    most.
    """
    from pyspark.sql import Window

    from .checkpoint import cut_lineage

    w = Window.partitionBy(user_col).orderBy(ts_col, order_col)
    # cut_lineage: trans is referenced by its own row-sum self-join, BOTH
    # sides of the states union, every power-iteration round, and the
    # final join — without the cut each reference re-derives the per-user
    # lead() window + count aggregate from the raw events (measured: 16
    # source scans in the physical plan; at 100 TB that is 16 corpus
    # passes for a |states|²-row table)
    trans = (
        events.select(
            F.col(user_col), F.col(ts_col), F.col(order_col),
            F.col(state_col).alias("s"),
        )
        .withColumn("s2", F.lead("s").over(w))
        .where(F.col("s2").isNotNull())
        .groupBy("s", "s2")
        .agg(F.count("*").alias("c"))
        .transform(cut_lineage)
    )
    trans = trans.join(
        trans.groupBy("s").agg(F.sum("c").alias("r")), "s"
    )
    states = (
        trans.select(F.col("s").alias("state"))
        .unionByName(trans.select(F.col("s2").alias("state")))
        .distinct()
    )
    k = states.count()
    pi = states.select(
        "state", F.lit(int(scale) // max(k, 1)).cast("long").alias("pi")
    )
    for _ in range(int(iters)):
        pi = (
            trans.join(pi, trans.s == pi.state)
            .select(
                F.col("s2").alias("state"),
                F.expr("(pi * c) div r").alias("m"),
            )
            .groupBy("state")
            .agg(F.sum("m").cast("long").alias("pi"))
        )
    return (
        states.join(pi, "state", "left")
        .select(
            "state",
            F.coalesce(F.col("pi"), F.lit(0)).cast("long").alias("pi_e12"),
        )
        .orderBy("state")
    )


def diff_in_diff(
    df: DataFrame,
    cohort: Column | str,
    period: Column | str,
    value: Column | str,
) -> DataFrame:
    """Difference-in-differences effect estimate — the 2×2 causal
    primitive behind every launch/rollout readout (Card & Krueger '94
    canonical form): with a treated and a control cohort observed before
    and after an intervention,

        DiD = (ȳ_T,post − ȳ_T,pre) − (ȳ_C,post − ȳ_C,pre)

    cancels both the fixed cohort gap and the common time trend, leaving
    the treatment effect under the parallel-trends assumption.
    Complements evt_ab_test (randomized same-period comparison) with the
    observational pre/post design.

    ``cohort`` must evaluate to 'treat'/'control' and ``period`` to
    'pre'/'post' (strings keep the output self-describing).  All
    arithmetic is exact: values quantize to integer cents (the module's
    money convention) before aggregation, cell means surface as
    ``mean_milli = (sum_cents·10) div n`` (one integer floor per cell,
    composition documented), and the effect is integer subtraction of
    the four cell means — hash-exact on any engine.

    Output: the four cells ``(period, cohort, n, sum_cents, mean_milli)``
    ascending, with ``did_milli`` carried on every row (self-contained
    frame, the psi_drift convention).  A missing cell (no rows) makes
    the estimate undefined — did_milli is NULL on all rows rather than a
    fabricated zero.

    Scale: one map-side-combined 4-group aggregate + a broadcast of the
    4-row cell table onto itself; input rows shuffle once, keyed by
    (period, cohort).
    """
    c = F.col(cohort) if isinstance(cohort, str) else cohort
    p = F.col(period) if isinstance(period, str) else period
    v = F.col(value) if isinstance(value, str) else value
    cells = df.withColumn("_v_", v).select(
        p.alias("period"),
        c.alias("cohort"),
        F.expr("cast(round(100 * _v_) as bigint)").alias("cents"),
    )
    agg = cells.groupBy("period", "cohort").agg(
        F.count("*").cast("long").alias("n"),
        F.sum("cents").cast("long").alias("sum_cents"),
    ).withColumn(
        "mean_milli", F.expr("(sum_cents * 10) div n")
    )
    def cell(pd: str, ch: str):
        return F.max(
            F.when(
                (F.col("period") == pd) & (F.col("cohort") == ch),
                F.col("mean_milli"),
            )
        )

    eff = agg.agg(
        (
            (cell("post", "treat") - cell("pre", "treat"))
            - (cell("post", "control") - cell("pre", "control"))
        )
        .cast("long")
        .alias("did_milli")
    )
    return (
        agg.crossJoin(F.broadcast(eff))
        .select("period", "cohort", "n", "sum_cents", "mean_milli", "did_milli")
        .orderBy("period", "cohort")
    )


# Poisson(1) inverse-CDF thresholds at 2^60 scale (P(X<=j) for j=0..4),
# computed once with 60-digit Decimal arithmetic and frozen as integers —
# both engines compare the same 60-bit uniform against the same constants,
# so the multiplicity draw is bit-exact.  Mass beyond 4 (~0.366%) maps to
# m=5 (a truncated-at-5 Poisson; the truncation is part of the operator's
# definition, documented, and identical on both engines).
_POISSON1_T60 = (
    424136118829305329,    # P(0)
    848272237658610659,    # P(<=1)
    1060340297073263324,   # P(<=2)
    1131029650211480879,   # P(<=3)
    1148701988496035267,   # P(<=4)
)


def poisson_bootstrap_ci(
    df: DataFrame,
    group: str,
    id_col: str,
    value: str,
    n_boot: int = 32,
    salt: str = "bs",
) -> DataFrame:
    """Poisson bootstrap confidence interval for the per-group mean —
    THE bootstrap that works on distributed data (Chamandy et al.,
    Google '12; Kleiner et al.'s BLB is its heavyweight cousin): instead
    of resampling n rows with replacement (which needs global
    coordination), each row enters resample b with multiplicity
    m ~ Poisson(1), independent per (row, b) — a pure MAP over the data.

    Here the Poisson draw is SEEDED — u = md5₆₀(salt:b:id)/2⁶⁰ against
    frozen inverse-CDF thresholds (:data:`_POISSON1_T60`, truncated at
    m=5) — so every resample is a deterministic function of (salt, data)
    and the SQL oracle replays all ``n_boot`` resamples bit-for-bit.

    Readout per group: the exact point mean plus the [5%, 95%] interval
    of the resample means by ORDER STATISTICS (ranks
    lo = (nv·50) div 1000 + 1 and hi = (nv·950 + 999) div 1000 over the
    nv valid resamples — for nv=32 the 2nd and 31st), all integer
    arithmetic in milli-units of the value.  Resamples whose total
    multiplicity is 0 are invalid and excluded (counted in
    n_boot_valid).

    Output per group: ``(group, n_events, mean_milli, n_boot_valid,
    boot_lo_milli, boot_hi_milli)``.

    Scale: the n_boot× blowup is COMPUTE inside the map stage — the
    shuffle carries only (group, b) partial sums (map-side combine), and
    the order-statistics window runs over n_boot rows per group, never
    data-sized rows.
    """
    from pyspark.sql import Window

    cents = F.expr(f"cast(round(100 * {value}) as bigint)")
    from ..graph import spread_low_parallelism

    # n_boot× compute blowup (explode + one md5 per (row, resample))
    # follows — spread the narrow base projection first so the blowup
    # runs at full width instead of on the scan's file splits (guide
    # §2.5; no-op when the input is already wide).  Measured 3.5 → 1.4 s
    # on the sf0.1 gate, whose events table is one single-split file.
    base = spread_low_parallelism(
        df.select(
            F.col(group).alias("grp"),
            F.col(id_col).cast("string").alias("rid"),
            cents.alias("cents"),
        )
    )
    # sign·(|sum| div n): Spark div truncates toward zero, DuckDB //
    # floors — identical only when the numerator is non-negative
    point = base.groupBy("grp").agg(
        F.count("*").cast("long").alias("n_events"),
        F.expr(
            "cast((case when sum(cents) < 0 then -1 else 1 end)"
            " * ((abs(sum(cents)) * 10) div count(*)) as bigint)"
        ).alias("mean_milli"),
    )
    t = _POISSON1_T60
    m_expr = (
        f"case when _u < {t[0]} then 0 when _u < {t[1]} then 1"
        f" when _u < {t[2]} then 2 when _u < {t[3]} then 3"
        f" when _u < {t[4]} then 4 else 5 end"
    )
    rep = (
        base.withColumn("b", F.explode(F.sequence(F.lit(0), F.lit(n_boot - 1))))
        .withColumn(
            "_u",
            F.expr(
                f"cast(conv(substring(md5('{salt}:' || cast(b as string)"
                f" || ':' || coalesce(rid, chr(0))), 1, 15), 16, 10) as bigint)"
            ),
        )
        .withColumn("m", F.expr(m_expr).cast("long"))
    )
    boots = rep.groupBy("grp", "b").agg(
        F.sum(F.col("m") * F.col("cents")).cast("long").alias("sum_mc"),
        F.sum("m").cast("long").alias("sum_m"),
    ).where(F.col("sum_m") > 0).withColumn(
        "bmean_milli",
        F.expr(
            "cast((case when sum_mc < 0 then -1 else 1 end)"
            " * ((abs(sum_mc) * 10) div sum_m) as bigint)"
        ),
    )
    w = Window.partitionBy("grp").orderBy("bmean_milli", "b")
    ranked = boots.withColumn("rk", F.row_number().over(w)).withColumn(
        "nv", F.count("*").over(Window.partitionBy("grp")).cast("long")
    )
    ci = (
        ranked.where(
            (F.col("rk") == F.expr("(nv * 50) div 1000 + 1"))
            | (F.col("rk") == F.expr("(nv * 950 + 999) div 1000"))
        )
        .groupBy("grp")
        .agg(
            F.max("nv").alias("n_boot_valid"),
            F.min("bmean_milli").cast("long").alias("boot_lo_milli"),
            F.max("bmean_milli").cast("long").alias("boot_hi_milli"),
        )
    )
    return point.join(ci, "grp", "left").select(
        "grp", "n_events", "mean_milli",
        F.coalesce("n_boot_valid", F.lit(0)).cast("long").alias("n_boot_valid"),
        "boot_lo_milli", "boot_hi_milli",
    ).orderBy("grp")


def cuped_adjust(
    per_user: DataFrame,
    arm_col: str = "arm",
    x_col: str = "x_cents",
    y_col: str = "y_cents",
) -> DataFrame:
    """CUPED variance-reduced A/B comparison (Deng, Xu, Kohavi & Walker,
    WSDM'13 — the pre-experiment-covariate adjustment every large
    experimentation platform runs): per experimental unit, adjust the
    metric Y by its pre-period covariate X,

        Y_adj = Y − θ·(X − X̄),    θ = cov(X, Y) / var(X),

    which shrinks metric variance by the factor (1 − ρ²) without biasing
    the arm difference.  Complements diff_in_diff (observational
    pre/post) and evt_ab_test (unadjusted randomized comparison).

    EXACT integer plan: from one map-side-combined pass the global
    moments (n, ΣX, ΣY, ΣX², ΣXY, ΣY²) in DECIMAL(38,0), so

        cov_n = n·ΣXY − ΣX·ΣY        var_n = n·ΣX² − (ΣX)²

    and per arm a the adjusted mean is one exact fraction

        adj_a = ΣY_a/n_a − cov_n·(ΣX_a·n − ΣX·n_a) / (var_n·n_a·n)
              = [ΣY_a·var_n·n − cov_n·(ΣX_a·n − ΣX·n_a)] / (var_n·n_a·n)

    milli-quantized with the sign·(|num|·1000 div den) recipe (den > 0
    whenever var(X) > 0).  All products stay < 10³⁰ for cent-scale
    inputs at 10⁵ users — inside both DECIMAL(38,0) and HUGEINT — and
    the bound is ENFORCED: a double-precision magnitude estimate of the
    largest products raises a clear rescale-your-inputs error at 10³⁶
    instead of letting ANSI decimal overflow fail opaquely mid-query.
    A constant covariate (var_n = 0) yields NULL θ/adjusted means —
    honest, not a fabricated fallback to the raw mean.

    Input: one row per unit ``(arm, x_cents, y_cents)`` (integer cents;
    NULL x or y rows are excluded — CUPED needs the covariate).
    Output: one row per arm, global diagnostics carried on each row:
    ``(arm, n_units, mean_y_milli, adj_mean_milli, theta_milli,
    rho2_micro)`` — rho2_micro = cov²·10⁶ div (var_n·vary_n) is the
    variance-reduction fraction.

    Scale: ONE aggregate over units for the moments (broadcast 1-row),
    one groupBy(arm) — both map-side combined; nothing else touches the
    data.
    """
    base = per_user.select(
        F.col(arm_col).alias("arm"),
        F.col(x_col).cast("long").alias("x"),
        F.col(y_col).cast("long").alias("y"),
    ).where(F.col("x").isNotNull() & F.col("y").isNotNull())
    g = base.agg(
        F.count("*").cast("decimal(38,0)").alias("n"),
        F.sum("x").cast("decimal(38,0)").alias("sx"),
        F.sum("y").cast("decimal(38,0)").alias("sy"),
        F.sum(F.expr("cast(x as decimal(38,0)) * x")).alias("sxx"),
        F.sum(F.expr("cast(x as decimal(38,0)) * y")).alias("sxy"),
        F.sum(F.expr("cast(y as decimal(38,0)) * y")).alias("syy"),
    )
    arms = base.groupBy("arm").agg(
        F.count("*").cast("decimal(38,0)").alias("na"),
        F.sum("x").cast("decimal(38,0)").alias("sxa"),
        F.sum("y").cast("decimal(38,0)").alias("sya"),
    )
    j = arms.crossJoin(F.broadcast(g))
    covn = "(n * sxy - sx * sy)"
    varn = "(n * sxx - sx * sx)"
    varyn = "(n * syy - sy * sy)"
    num = f"(sya * {varn} * n - {covn} * (sxa * n - sx * na))"
    den = f"({varn} * na * n)"
    # DECIMAL(38,0) domain guard (r9 ADVICE): the adjusted-mean fraction's
    # largest products are |num|*1000 ~ n^3*x^2*y*1000 and den = varn*na*n
    # ~ n^4*x^2 -- both CAN exceed 38 digits for plausible large inputs
    # (~10^7 units at dollar-scale cents), which would surface as an opaque
    # ANSI decimal-overflow failure mid-query.  Estimate the magnitudes in
    # double (a guard needs no exactness; |num| <= 2*max(term1, term2)) and
    # raise loudly with a rescale hint at 1e36 -- ~50x of safety before the
    # true 1e38 bound.  winnow_fingerprints' packed-key n_grams filter is
    # the sibling guarded-domain discipline.
    guard = (
        "(greatest("
        f" abs(cast(sya as double) * cast({varn} as double)"
        "      * cast(n as double)),"
        f" abs(cast({covn} as double))"
        "   * (abs(cast(sxa as double)) * cast(n as double)"
        "      + abs(cast(sx as double)) * cast(na as double)),"
        f" cast({varn} as double) * cast(na as double) * cast(n as double)"
        ") * 1000.0)"
    )
    return j.select(
        "arm",
        F.col("na").cast("long").alias("n_units"),
        F.expr(
            "cast((case when sya < 0 then -1 else 1 end)"
            " * ((abs(sya) * 1000) div na) as bigint)"
        ).alias("mean_y_milli"),
        F.expr(
            f"case when {guard} >= 1e36 then"
            " cast(raise_error('cuped_adjust: moment magnitudes approach"
            " the DECIMAL(38,0) bound; rescale the inputs (e.g. dollars"
            " instead of cents) and re-run') as bigint)"
            f" when {varn} = 0 then cast(null as bigint) else"
            f" cast((case when {num} < 0 then -1 else 1 end)"
            f" * ((abs({num}) * 1000) div {den}) as bigint) end"
        ).alias("adj_mean_milli"),
        F.expr(
            f"case when {varn} = 0 then cast(null as bigint) else"
            f" cast((case when {covn} < 0 then -1 else 1 end)"
            f" * ((abs({covn}) * 1000) div {varn}) as bigint) end"
        ).alias("theta_milli"),
        # rho² = cov²/(varX·varY) ∈ [0,1] by Cauchy-Schwarz, but cov²·10⁶
        # can overflow 38 digits at cent-scale inputs — so quantize as the
        # PRODUCT of two bounded milli quotients (each ≤ ~10³ by C-S):
        # rho2_micro = (|cov|·10³ div varX)·(|cov|·10³ div varY).  The
        # double floor is the documented quantization, identical on both
        # engines.
        F.expr(
            f"case when {varn} = 0 or {varyn} = 0 then cast(null as bigint)"
            f" else cast(((abs({covn}) * 1000) div {varn})"
            f" * ((abs({covn}) * 1000) div {varyn}) as bigint) end"
        ).alias("rho2_micro"),
    ).orderBy("arm")


def conformal_interval(
    df: DataFrame,
    group_col: str,
    id_col: str,
    value_col: str,
    alpha_milli: int = 100,
) -> DataFrame:
    """Split-conformal prediction intervals per group, with their
    empirical coverage measured on a held-out half — the
    distribution-FREE uncertainty wrapper (Vovk et al. '05; Lei et al.
    JASA'18) every model-eval pipeline wants around a point predictor:
    no matter how wrong the predictor is, the interval
    ŷ ± q covers ≥ 1−α of fresh points (marginally, in expectation over
    splits).

    Construction, all exact integers:
      * split units by the portable 60-bit hash of id (even →
        CALIBRATION, odd → TEST) — deterministic, engine-identical;
      * predictor: the calibration mean per group, milli-quantized with
        the sign·(|Σ| div n) recipe (leakage-free: test rows never touch
        it);
      * nonconformity: absolute residual |y − ŷ| in milli;
      * conformal quantile q = the k-th smallest calibration residual,
        k = ceil((1−α)·(n_cal+1)) — the finite-sample-corrected TYPE-1
        rank (row_number over (residual, id), never interpolation: the
        repo's integer-quantile discipline);
      * if k > n_cal the interval is infinite: q_milli is NULL and every
        test point counts covered (the honest small-sample answer).

    Output per group: ``(grp, n_cal, n_test, yhat_milli, q_milli,
    n_covered, coverage_micro)`` ordered by group.  A group whose rows
    ALL hash to the test half (no calibration rows) is OMITTED from the
    output — with zero calibration points there is no predictor and no
    quantile to report, and fabricating one would be dishonest; callers
    needing every group present should anchor on
    ``df.select(group_col).distinct()`` and left-join this result.

    Scale: one groupBy for the calibration means (map-side combined,
    broadcast back), ONE group-partitioned window over calibration
    residuals for the rank (the win_rank shape — partitioned by group,
    never SinglePartition), one broadcast join + aggregate for test
    coverage.  Groups are independent; skewed groups ride AQE.
    """
    if not 0 < alpha_milli < 1000:
        raise ValueError(
            f"conformal_interval: alpha_milli={alpha_milli} outside (0, 1000)"
        )
    from pyspark.sql import Window

    from ..operators.sampling import _u60
    from .checkpoint import cut_lineage

    base = df.select(
        F.col(group_col).alias("grp"),
        F.col(id_col).alias("id"),
        (F.col(value_col).cast("long") * 1000).alias("y_milli"),
    ).where(F.col("y_milli").isNotNull())
    base = base.withColumn(
        "is_cal", _u60(F.concat(F.lit("conf:"), F.col("id"))) % 2 == 0
    )
    cal = base.where("is_cal")
    # leakage-free predictor: calibration mean only; referenced by both
    # the residual rank and the test coverage join -> lineage-cut
    pred = cut_lineage(
        cal.groupBy("grp").agg(
            F.count("*").cast("long").alias("n_cal"),
            F.expr(
                "cast((case when sum(y_milli) < 0 then -1 else 1 end)"
                " * (abs(sum(y_milli)) div count(*)) as bigint)"
            ).alias("yhat_milli"),
        )
    )
    w = Window.partitionBy("grp").orderBy("r", "id")
    ranked = (
        cal.join(F.broadcast(pred), "grp")
        .select(
            "grp",
            "id",
            "n_cal",
            F.abs(F.col("y_milli") - F.col("yhat_milli")).alias("r"),
        )
        .withColumn("rn", F.row_number().over(w))
    )
    # k = ceil((1000 - alpha)*(n_cal + 1) / 1000) in pure integers
    k = F.expr(
        f"cast(((1000 - {int(alpha_milli)}) * (n_cal + 1) + 999)"
        " div 1000 as bigint)"
    )
    q = cut_lineage(
        ranked.where(F.col("rn") == k).select(
            "grp", F.col("r").alias("q_milli")
        )
    )
    test = base.where(~F.col("is_cal"))
    cov = (
        test.join(F.broadcast(pred), "grp")
        .join(F.broadcast(q), "grp", "left")
        .groupBy("grp")
        .agg(
            F.count("*").cast("long").alias("n_test"),
            F.sum(
                F.when(
                    F.col("q_milli").isNull()
                    | (
                        F.abs(F.col("y_milli") - F.col("yhat_milli"))
                        <= F.col("q_milli")
                    ),
                    1,
                ).otherwise(0)
            )
            .cast("long")
            .alias("n_covered"),
        )
    )
    return (
        pred.join(q, "grp", "left")
        .join(cov, "grp", "left")
        .select(
            "grp",
            "n_cal",
            F.coalesce(F.col("n_test"), F.lit(0)).cast("long").alias("n_test"),
            "yhat_milli",
            F.col("q_milli").cast("long").alias("q_milli"),
            F.coalesce(F.col("n_covered"), F.lit(0))
            .cast("long")
            .alias("n_covered"),
            F.expr(
                "case when coalesce(n_test, 0) > 0 then"
                " (coalesce(n_covered, 0) * 1000000) div n_test end"
            )
            .cast("long")
            .alias("coverage_micro"),
        )
        .orderBy("grp")
    )
