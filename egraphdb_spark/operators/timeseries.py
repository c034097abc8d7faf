"""Hypertable-style time-series rollups: OHLC bucketing and gap-filling.

The reference stores timestamped rows and serves time-range scans
(src/egraph_kv_util.erl time-partitioned tables; the S4 time-range surface),
but has no continuous-aggregate layer.  These operators add the two
rollups every time-series store front-ends with: per-bucket OHLC candles
(TimescaleDB ``time_bucket`` + continuous aggregates, InfluxDB windowed
``first/last/max/min``) and dense-grid gap filling with
last-observation-carried-forward (``time_bucket_gapfill`` + ``locf``).

Determinism contract: all monetary values are quantized to integer cents
(``round(value·100)`` — half-up in both engines) BEFORE any aggregation,
so sums are order-exact integers; open/close are selected by the total
order (ts, tiebreak_col) — unique because the tiebreaker is a unique id —
via ``min_by``/``max_by`` over a struct key, which is a map-side-combinable
aggregate (each partition keeps one candidate; merges compare the struct),
NOT a window: one shuffle on the (key, bucket) grouping.

Scale notes:
- ``ohlc_rollup``: one PARTIAL aggregate (struct order keys make the
  planner pick SortAggregate over HashAggregate — the map-side sort is on
  (key, bucket), nearly free on time-clustered event data); the shuffle
  carries one candle candidate per (key, bucket) per map partition, never
  the raw events.  At 100 TB with hourly buckets the output is
  |keys|·|hours| — trivially small next to the input; AQE coalesces the
  post-shuffle partitions.  Plan asserted in tests/test_plans.py.
- ``gapfill_locf``: the dense grid is |keys|·|days in span| rows (built by
  a per-key ``sequence`` explode — no driver-side calendar), and the LOCF
  window partitions by key, so the carry-forward sort is per-key and
  parallel.  Grids start at each key's OWN first observation, so the
  carry-forward is always defined (no leading NULL epoch).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F


def ohlc_rollup(
    events: DataFrame,
    key_col: str,
    ts_col: str,
    value_col: str,
    tiebreak_col: str,
    bucket: str = "hour",
) -> DataFrame:
    """Per (key, time-bucket) OHLC candle over integer cents.

    Output: (key, bucket_ts, open_cents, high_cents, low_cents,
    close_cents, n_events, vol_cents) — all value columns BIGINT.  Open and
    close follow the (ts, tiebreak) total order; high/low/volume are plain
    min/max/sum over the quantized cents.
    """
    ordk = F.struct(F.col(ts_col), F.col(tiebreak_col))
    cents = F.round(F.col(value_col) * 100).cast("long")
    return (
        events.select(
            F.col(key_col),
            F.date_trunc(bucket, F.col(ts_col)).alias("bucket_ts"),
            cents.alias("cents"),
            ordk.alias("ordk"),
        )
        .groupBy(key_col, "bucket_ts")
        .agg(
            F.min_by("cents", "ordk").alias("open_cents"),
            F.max("cents").alias("high_cents"),
            F.min("cents").alias("low_cents"),
            F.max_by("cents", "ordk").alias("close_cents"),
            F.count("*").alias("n_events"),
            F.sum("cents").alias("vol_cents"),
        )
    )


def gapfill_locf(
    events: DataFrame,
    key_col: str,
    ts_col: str,
    value_col: str,
) -> DataFrame:
    """Dense daily grid per key with last-observation-carried-forward.

    Daily cents totals per key; each key's calendar spans its own
    [first, last] observed day (``sequence`` explode — the grid never
    routes through the driver); days with no observation carry the most
    recent daily total forward and are flagged ``is_gap = 1``.

    Output: (key, day, cents NULL-on-gap, filled_cents, is_gap) — BIGINT
    values, TIMESTAMP day.
    """
    cents = F.round(F.col(value_col) * 100).cast("long")
    daily = (
        events.select(
            F.col(key_col),
            F.date_trunc("day", F.col(ts_col)).alias("day"),
            cents.alias("c"),
        )
        .groupBy(key_col, "day")
        .agg(F.sum("c").alias("cents"))
    )
    grid = (
        daily.groupBy(key_col)
        .agg(F.min("day").alias("d0"), F.max("day").alias("d1"))
        .select(
            F.col(key_col),
            F.explode(
                F.expr("sequence(d0, d1, interval 1 day)")
            ).alias("day"),
        )
    )
    w = (
        Window.partitionBy(key_col)
        .orderBy("day")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return grid.join(daily, [key_col, "day"], "left").select(
        F.col(key_col),
        F.col("day"),
        F.col("cents"),
        F.last("cents", ignorenulls=True).over(w).alias("filled_cents"),
        F.when(F.col("cents").isNull(), F.lit(1))
        .otherwise(F.lit(0))
        .cast("long")
        .alias("is_gap"),
    )


def ewma_daily(
    events: DataFrame,
    key_col: str,
    ts_col: str,
    alpha_den: int = 8,
) -> DataFrame:
    """Exponentially-weighted moving average of the daily count series,
    α = 1/alpha_den, in exact integer milli-units:

        s₁ = n₁·1000;   sₜ = sₜ₋₁ + (nₜ·1000 − sₜ₋₁) div alpha_den

    Exponential decay is a true recurrence — no window frame expresses it
    — so this uses the bounded-series fold pattern: the daily series is
    collected per key (sort_array over structs; bounded — a decade of
    days is ~3 650 elements, independent of event volume) and folded with
    ``aggregate`` into the running smoothed array, then re-exploded.
    The integer ``div`` recurrence (truncation toward zero, verified
    identical to DuckDB ``//``) keeps every engine bit-exact; the oracle
    replays the same recurrence with a recursive CTE.

    Scale: the heavy reduction (events → daily counts) is a plain hash
    aggregate; the fold touches one array per key, partition-parallel —
    the same shape as any per-key sketch finalization.

    Output: (key, day, n, ewma_milli).
    """
    daily = events.groupBy(
        F.col(key_col), F.date_trunc("day", F.col(ts_col)).alias("day")
    ).agg(F.count("*").alias("n"))
    folded = daily.groupBy(key_col).agg(
        F.expr(
            f"""
            aggregate(
              sort_array(collect_list(struct(day, n))),
              cast(array() as array<struct<day:timestamp,n:bigint,s:bigint>>),
              (acc, x) -> acc || array(named_struct(
                'day', x.day, 'n', cast(x.n as bigint),
                's', if(size(acc) = 0, x.n * 1000L,
                        element_at(acc, -1).s
                        + (x.n * 1000L - element_at(acc, -1).s) div {alpha_den})))
            )
            """
        ).alias("series")
    )
    return folded.select(
        F.col(key_col), F.explode("series").alias("e")
    ).select(
        key_col,
        F.col("e.day").alias("day"),
        F.col("e.n").alias("n"),
        F.col("e.s").alias("ewma_milli"),
    )


def holt_daily(
    events: DataFrame,
    key_col: str,
    ts_col: str,
    alpha_den: int = 8,
    beta_den: int = 4,
    forecast_days: int = 1,
) -> DataFrame:
    """Holt double-exponential smoothing (level + trend) of the daily
    count series, α = 1/alpha_den, β = 1/beta_den, exact integer
    milli-units — the trend-aware extension of :func:`ewma_daily` (EWMA
    lags any trending series by design; Holt tracks it):

        l₁ = n₁·1000;  b₁ = 0
        lₜ = (lₜ₋₁ + bₜ₋₁) + (nₜ·1000 − (lₜ₋₁ + bₜ₋₁)) div alpha_den
        bₜ = bₜ₋₁ + ((lₜ − lₜ₋₁) − bₜ₋₁) div beta_den

    plus the h-step-ahead forecast fₜ = lₜ + h·bₜ (h = forecast_days),
    the value a capacity planner actually reads.  Same bounded-series
    fold as ewma_daily (arrays bounded by day count, never event
    volume); the integer ``div`` recurrence is truncation-identical to
    DuckDB ``//``, so the recursive-CTE oracle replays it bit-exactly.

    Output: (key, day, n, level_milli, trend_milli, forecast_milli).
    """
    daily = events.groupBy(
        F.col(key_col), F.date_trunc("day", F.col(ts_col)).alias("day")
    ).agg(F.count("*").alias("n"))
    folded = daily.groupBy(key_col).agg(
        F.expr(
            f"""
            aggregate(
              sort_array(collect_list(struct(day, n))),
              cast(array() as
                   array<struct<day:timestamp,n:bigint,l:bigint,b:bigint>>),
              (acc, x) -> acc || array(if(size(acc) = 0,
                named_struct('day', x.day, 'n', cast(x.n as bigint),
                             'l', x.n * 1000L, 'b', 0L),
                named_struct('day', x.day, 'n', cast(x.n as bigint),
                  'l', (element_at(acc, -1).l + element_at(acc, -1).b)
                       + (x.n * 1000L - (element_at(acc, -1).l
                                         + element_at(acc, -1).b))
                         div {alpha_den},
                  'b', element_at(acc, -1).b
                       + (((element_at(acc, -1).l + element_at(acc, -1).b)
                           + (x.n * 1000L - (element_at(acc, -1).l
                                             + element_at(acc, -1).b))
                             div {alpha_den}
                           - element_at(acc, -1).l)
                          - element_at(acc, -1).b) div {beta_den})))
            )
            """
        ).alias("series")
    )
    return folded.select(
        F.col(key_col), F.explode("series").alias("e")
    ).select(
        key_col,
        F.col("e.day").alias("day"),
        F.col("e.n").alias("n"),
        F.col("e.l").alias("level_milli"),
        F.col("e.b").alias("trend_milli"),
        (F.col("e.l") + F.lit(int(forecast_days)) * F.col("e.b")).alias(
            "forecast_milli"
        ),
    )


def seasonal_dow(
    events: DataFrame,
    key_col: str,
    ts_col: str,
) -> DataFrame:
    """Day-of-week seasonal index per key — the decomposition step the
    smoothing operators (`ewma_daily`, `holt_daily`) deliberately skip:
    how much of a series' variation is weekly periodicity.

    For each (key, dow): the mean daily event count on that weekday
    relative to the key's overall daily mean, as an exact integer
    permille: ``index_permille = (s_dow·c_all·1000) div (c_dow·s_all)``
    — ONE integer division composed from order-exact integer sums, so
    both engines agree bit-for-bit (the naive mean-of-means divides
    twice in floats).

    ``dow`` is engine-portable arithmetic, not a locale builtin:
    ``datediff(day, 1970-01-01) % 7`` (0 = Thursday) — Spark's
    ``dayofweek`` is 1=Sunday while DuckDB's is 0=Sunday, a classic
    cross-engine trap.

    Scale: daily rollup (one shuffle on (key, day)), then a ~7-rows-per-
    key aggregate; the per-key totals window runs over ≤7 rows per
    partition.  Output is |keys|·7 rows regardless of input volume.
    BIGINT bound: s_dow·c_all·1000 ≤ total_events·days·1000 — at 10¹²
    events over 10⁴ days this needs s_dow ≤ 9·10⁵ per key·dow short of
    overflow; callers at that scale pre-divide the day count.
    """
    from pyspark.sql import Window

    daily = (
        events.select(
            F.col(key_col),
            F.date_trunc("day", F.col(ts_col)).alias("day"),
        )
        .groupBy(key_col, "day")
        .agg(F.count("*").alias("n"))
    )
    bydow = (
        daily.select(
            key_col,
            (
                F.datediff(F.to_date("day"), F.lit("1970-01-01").cast("date"))
                % 7
            ).cast("long").alias("dow"),
            "n",
        )
        .groupBy(key_col, "dow")
        .agg(
            F.count("*").cast("long").alias("n_days"),
            F.sum("n").cast("long").alias("n_events"),
        )
    )
    w = Window.partitionBy(key_col)
    return (
        bydow.select(
            key_col,
            "dow",
            "n_days",
            "n_events",
            F.sum("n_days").over(w).alias("c_all"),
            F.sum("n_events").over(w).alias("s_all"),
        )
        .select(
            key_col,
            "dow",
            "n_days",
            "n_events",
            F.expr(
                "(n_events * c_all * 1000) div nullif(n_days * s_all, 0)"
            ).alias("index_permille"),
        )
        .orderBy(key_col, "dow")
    )


def lag_corr_daily(
    events: DataFrame,
    ts_col: str,
    type_col: str,
    type_x: str,
    type_y: str,
    max_lag: int = 3,
) -> DataFrame:
    """Lagged cross-correlation of two daily event-count series — "does
    X lead Y?" (clicks → purchases).  For each lag l in [-max_lag,
    max_lag]: Pearson r between x(day) and y(day + l) over the days both
    exist.

    Determinism: the five correlation components (Σx, Σy, Σxy, Σx², Σy²)
    are exact integer sums; r is then composed from them with ONE double
    expression written identically in both engines (the
    `agg_corr_regr` discipline — sqrt is correctly rounded per IEEE 754,
    so identical inputs give identical doubles).  Zero variance ⇒ NULL.

    Scale: the daily series are |days| rows per type; the lag expansion
    is a 2·max_lag+1 explode of the x side followed by ONE equi-join on
    the shifted day — no range join, no cross join.  Output is
    2·max_lag+1 rows.
    """
    daily = (
        events.where(F.col(type_col).isin([type_x, type_y]))
        .select(
            F.col(type_col).alias("t"),
            F.to_date(F.date_trunc("day", F.col(ts_col))).alias("day"),
        )
        .groupBy("t", "day")
        .agg(F.count("*").alias("n"))
    )
    x = daily.where(F.col("t") == type_x).select(
        "day", F.col("n").alias("x")
    )
    y = daily.where(F.col("t") == type_y).select(
        F.col("day").alias("yday"), F.col("n").alias("y")
    )
    lagged = (
        x.select(
            "day",
            "x",
            F.explode(
                F.sequence(F.lit(-max_lag), F.lit(max_lag))
            ).alias("lag"),
        )
        .select(
            "lag",
            "x",
            F.expr("date_add(day, lag)").alias("yday"),
        )
        .join(y, "yday")
    )
    return (
        lagged.groupBy("lag")
        .agg(
            F.count("*").cast("long").alias("n_days"),
            F.sum("x").cast("long").alias("sx"),
            F.sum("y").cast("long").alias("sy"),
            F.sum(F.col("x") * F.col("y")).cast("long").alias("sxy"),
            F.sum(F.col("x") * F.col("x")).cast("long").alias("sxx"),
            F.sum(F.col("y") * F.col("y")).cast("long").alias("syy"),
        )
        .select(
            F.col("lag").cast("long").alias("lag"),
            "n_days",
            "sx",
            "sy",
            "sxy",
            "sxx",
            "syy",
            F.expr(
                "(cast(n_days * sxy - sx * sy as double))"
                " / nullif(sqrt(cast(n_days * sxx - sx * sx as double))"
                " * sqrt(cast(n_days * syy - sy * sy as double)), 0.0d)"
            ).alias("corr"),
        )
        .orderBy("lag")
    )


def holt_winters_daily(
    events: DataFrame,
    key_col: str,
    ts_col: str,
    alpha_den: int = 8,
    beta_den: int = 4,
    gamma_den: int = 4,
    period: int = 7,
) -> DataFrame:
    """Additive Holt-Winters (level + trend + weekly season) of the daily
    count series, α=1/alpha_den, β=1/beta_den, γ=1/gamma_den, exact
    integer milli-units — the seasonal member of the smoothing ladder
    (EWMA → Holt → here).  Seasonal slots initialize at 0 and learn:

        l₁ = n₁·1000;  b₁ = 0;  s₁ = 0
        lₜ = (lₜ₋₁+bₜ₋₁) + (nₜ·1000 − sₜ₋₇ − (lₜ₋₁+bₜ₋₁)) div α_den
        bₜ = bₜ₋₁ + ((lₜ − lₜ₋₁) − bₜ₋₁) div β_den
        sₜ = sₜ₋₇ + (nₜ·1000 − lₜ − sₜ₋₇) div γ_den      (sₜ₋₇ = 0, t ≤ 7)
        fₜ = lₜ + bₜ + sₜ₋₆                     (tomorrow's forecast)

    The series is DENSIFIED first (per-key calendar from min to max day,
    missing days count 0): season slots are positional, so a gap day
    would silently rotate every later weekday alignment.  Same
    bounded-series fold as ewma/holt (arrays ∝ days, never events);
    ``element_at(acc, -7)`` reaches the season slot directly in the
    accumulated struct array.  The recursive-CTE oracle carries the same
    seven seasonal values as a rolling list — identical integer ``div``
    arithmetic, bit-exact.

    Output: (key, day, n, level_milli, trend_milli, season_milli,
    forecast_milli).
    """
    if period != 7:
        raise ValueError("season carry is written for period=7")
    a, b_, g = int(alpha_den), int(beta_den), int(gamma_den)
    daily = events.groupBy(
        F.col(key_col), F.date_trunc("day", F.col(ts_col)).alias("day")
    ).agg(F.count("*").alias("n"))
    span = daily.groupBy(key_col).agg(
        F.min("day").alias("d0"), F.max("day").alias("d1")
    )
    grid = span.select(
        F.col(key_col),
        F.explode(F.expr("sequence(d0, d1, interval 1 day)")).alias("day"),
    )
    dense = grid.join(daily, [key_col, "day"], "left").select(
        F.col(key_col), F.col("day"),
        F.coalesce(F.col("n"), F.lit(0)).cast("long").alias("n"),
    )
    pl = "element_at(acc, -1).l"
    pb = "element_at(acc, -1).b"
    s7 = "if(size(acc) >= 7, element_at(acc, -7).s, 0L)"
    s6 = "if(size(acc) >= 6, element_at(acc, -6).s, 0L)"
    lexpr = f"(({pl} + {pb}) + (x.n * 1000L - {s7} - ({pl} + {pb})) div {a})"
    bexpr = f"({pb} + (({lexpr} - {pl}) - {pb}) div {b_})"
    sexpr = f"({s7} + (x.n * 1000L - {lexpr} - {s7}) div {g})"
    fexpr = f"({lexpr} + {bexpr} + {s6})"
    folded = dense.groupBy(key_col).agg(
        F.expr(
            f"""
            aggregate(
              sort_array(collect_list(struct(day, n))),
              cast(array() as array<struct<
                day:timestamp,n:bigint,l:bigint,b:bigint,s:bigint,f:bigint>>),
              (acc, x) -> acc || array(if(size(acc) = 0,
                named_struct('day', x.day, 'n', x.n,
                             'l', x.n * 1000L, 'b', 0L, 's', 0L,
                             'f', x.n * 1000L),
                named_struct('day', x.day, 'n', x.n,
                             'l', {lexpr}, 'b', {bexpr}, 's', {sexpr},
                             'f', {fexpr})))
            )
            """
        ).alias("series")
    )
    return folded.select(F.col(key_col), F.explode("series").alias("e")).select(
        key_col,
        F.col("e.day").alias("day"),
        F.col("e.n").alias("n"),
        F.col("e.l").alias("level_milli"),
        F.col("e.b").alias("trend_milli"),
        F.col("e.s").alias("season_milli"),
        F.col("e.f").alias("forecast_milli"),
    )
