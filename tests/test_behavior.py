"""Unit tests for operators/behavior.py against pure-Python references."""

from datetime import datetime, timedelta

import pytest

from egraphdb_spark.operators.behavior import cohort_ltv, funnel_steps


def _ts(day, h=0, m=0):
    return datetime(2024, 1, day, h, m)


@pytest.fixture(scope="module")
def ev(spark):
    rows = [
        # u1 completes the whole funnel in order
        (1, _ts(1, 9), 101, "view", 10.0),
        (2, _ts(1, 10), 101, "click", 0.0),
        (3, _ts(2, 10), 101, "purchase", 55.5),
        # u2 clicks BEFORE the first view — strict order rejects the click
        (4, _ts(1, 8), 102, "click", 0.0),
        (5, _ts(1, 9), 102, "view", 0.0),
        (6, _ts(1, 12), 102, "purchase", 20.0),
        # u3 views only; purchase outside the 7-day horizon
        (7, _ts(1, 0), 103, "view", 0.0),
        (8, _ts(20, 0), 103, "purchase", 99.99),
        # u4 never views; purchases anyway (not in funnel at all)
        (9, _ts(3, 0), 104, "purchase", 10.01),
        # u5: view then click at the SAME timestamp (strict > rejects it)
        (10, _ts(5, 0), 105, "view", 0.0),
        (11, _ts(5, 0), 105, "click", 0.0),
        # u6: full funnel, purchase exactly at the horizon boundary (kept)
        (12, _ts(2, 0), 106, "view", 0.0),
        (13, _ts(2, 1), 106, "click", 0.0),
        (14, _ts(9, 0), 106, "purchase", 30.0),
    ]
    return spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, event_type string, value double"
    )


def test_funnel_counts_and_order(ev):
    out = funnel_steps(
        ev, "user_id", "ts", "event_type", ["view", "click", "purchase"], 7
    ).collect()
    assert [r.step for r in out] == ["view", "click", "purchase"]
    # views: u1,u2,u3,u5,u6; clicks after view in horizon: u1,u6
    # (u2's click predates the view, u5's click ties the view — strict >)
    # purchases after click in horizon: u1, u6 (u6 exactly at boundary)
    assert [r.n_users for r in out] == [5, 2, 2]
    assert [r.conv_permille for r in out] == [1000, 400, 400]


def test_funnel_timing_exact(ev):
    out = {r.step: r for r in funnel_steps(
        ev, "user_id", "ts", "event_type", ["view", "click", "purchase"], 7
    ).collect()}
    assert out["view"].avg_secs_from_first == 0
    # u1: click 1h after view; u6: click 1h after view → avg 3600
    assert out["click"].avg_secs_from_first == 3600
    # u1: purchase at day2 10:00, view day1 9:00 → 25h; u6: 7d exactly
    exp = (25 * 3600 + 7 * 86400) // 2
    assert out["purchase"].avg_secs_from_first == exp


def test_funnel_requires_two_steps(ev):
    with pytest.raises(ValueError):
        funnel_steps(ev, "user_id", "ts", "event_type", ["view"], 7)


def test_funnel_empty_tail_is_zero(ev):
    out = funnel_steps(
        ev, "user_id", "ts", "event_type", ["view", "error", "purchase"], 7
    ).collect()
    assert [r.n_users for r in out] == [5, 0, 0]
    assert [r.avg_secs_from_first for r in out] == [0, 0, 0]


def test_cohort_ltv_reference(ev):
    out = cohort_ltv(ev, "user_id", "ts", "event_type", "value", "purchase").collect()
    # python reference
    rows = ev.collect()
    first = {}
    for r in rows:
        wk = r.ts - timedelta(
            days=(r.ts.weekday()),
            hours=r.ts.hour,
            minutes=r.ts.minute,
            seconds=r.ts.second,
        )
        first[r.user_id] = min(first.get(r.user_id, wk), wk)
    from collections import defaultdict

    tri = defaultdict(int)
    for r in rows:
        if r.event_type != "purchase":
            continue
        wk = r.ts - timedelta(
            days=(r.ts.weekday()),
            hours=r.ts.hour,
            minutes=r.ts.minute,
            seconds=r.ts.second,
        )
        off = (wk - first[r.user_id]).days // 7
        tri[(first[r.user_id], off)] += round(r.value * 100)
    sizes = defaultdict(int)
    for u, wk in first.items():
        sizes[wk] += 1
    got = {(r.cohort_week, r.week_offset): r for r in out}
    assert set(got) == set(tri)
    for k, cents in tri.items():
        assert got[k].rev_cents == cents
        assert got[k].cohort_users == sizes[k[0]]
    # cumulative is a prefix sum over offsets within each cohort
    for (wk, off), r in got.items():
        cum = sum(v for (w2, o2), v in tri.items() if w2 == wk and o2 <= off)
        assert r.cum_rev_cents == cum
        assert r.cum_per_user_cents == cum // sizes[wk]


def test_kaplan_meier_hand_computed(spark):
    """4 users: lifetimes 0,1,1,3; corpus end day 10; gap 7 → users
    ending early churn, the day-3..10 user (gap 7) is censored."""
    import datetime as dt

    from egraphdb_spark.operators.behavior import kaplan_meier

    base = dt.datetime(2024, 1, 1)

    def ev(eid, u, d):
        return (eid, u, base + dt.timedelta(days=d))

    rows = [
        ev(1, 1, 0),                 # u1: t=0, last day 0, churned
        ev(2, 2, 0), ev(3, 2, 1),    # u2: t=1, churned
        ev(4, 3, 1), ev(5, 3, 2),    # u3: t=1, churned
        ev(6, 4, 0), ev(7, 4, 3),    # u4: t=3, last day 3, gap=7 ⇒ NOT churned
        ev(8, 5, 10),                # u5: t=0 but last day 10 ⇒ censored
    ]
    df = spark.createDataFrame(rows, "event_id long, user_id long, ts timestamp")
    got = {r.t_days: r for r in kaplan_meier(df, "user_id", "ts", 7).collect()}
    # risk sets: t=0 → all 5 at risk, 1 death (u1; u5 censored);
    # t=1 → users with t>=1: u2,u3,u4 → 3 at risk, 2 deaths
    assert set(got) == {0, 1}
    assert (got[0].n_at_risk, got[0].n_events) == (5, 1)
    assert got[0].surv_micro == 1_000_000 * 4 // 5
    assert (got[1].n_at_risk, got[1].n_events) == (3, 2)
    assert got[1].surv_micro == (800_000 * 1) // 3


def test_markov_stationary_two_state_chain(spark):
    """Deterministic 2-state chain a→b, b→a (period 2): uniform start is
    already stationary — pi stays (0.5, 0.5) scaled, minus div leakage."""
    import datetime as dt

    from egraphdb_spark.operators.behavior import markov_stationary

    base = dt.datetime(2024, 1, 1)
    rows = []
    for i in range(20):
        rows.append((i, 1, base + dt.timedelta(minutes=i), "a" if i % 2 == 0 else "b"))
    df = spark.createDataFrame(rows, "event_id long, user_id long, ts timestamp, event_type string")
    got = {r.state: r.pi_e12 for r in markov_stationary(
        df, "user_id", "ts", "event_id", "event_type", iters=4).collect()}
    assert set(got) == {"a", "b"}
    for v in got.values():
        assert abs(v - 500_000_000_000) <= 4  # div leakage ≤ 1/round
    # absorbing-ish chain: most transitions flow into 'b'
    rows2 = [(i, 1, base + dt.timedelta(minutes=i), t)
             for i, t in enumerate(["a", "b", "b", "b", "b", "a", "b", "b", "b", "b"])]
    df2 = spark.createDataFrame(rows2, "event_id long, user_id long, ts timestamp, event_type string")
    got2 = {r.state: r.pi_e12 for r in markov_stationary(
        df2, "user_id", "ts", "event_id", "event_type", iters=4).collect()}
    assert got2["b"] > got2["a"]


def test_wilson_interval_properties(spark):
    """Wilson bounds bracket the rate, stay inside [0, 1], and match a
    scipy-free closed-form replay at known (n, k)."""
    from egraphdb_spark.queries import REGISTRY

    fn, _ = REGISTRY["evt_rate_wilson"]
    rows = fn(spark, "/root/testdata/sf0.001").collect()
    assert rows
    for r in rows:
        assert 0 <= r.lo_micro <= r.rate_micro <= r.hi_micro <= 1_000_000
        # closed-form replay
        p, n = r.k / r.n, r.n
        z, z2 = 1.96, 3.8416
        c = p + z2 / (2 * n)
        h = z * (p * (1 - p) / n + z2 / (4 * n * n)) ** 0.5
        d = 1 + z2 / n
        import math

        assert r.lo_micro == math.floor((c - h) / d * 1e6)
        assert r.hi_micro == math.floor((c + h) / d * 1e6)
