"""As-of and range join operator semantics on constructed data."""

from __future__ import annotations

from pyspark.sql import functions as F

from egraphdb_spark.operators.asof import asof_join, range_join


def test_asof_basic_and_no_prior(spark):
    left = spark.createDataFrame(
        [(1, "k", 10), (2, "k", 25), (3, "k", 5), (4, "other", 10)],
        "lid long, k string, ts long",
    )
    right = spark.createDataFrame(
        [("k", 10, "at10"), ("k", 20, "at20")], "k string, rts long, payload string"
    )
    got = {
        r["lid"]: r["payload"]
        for r in asof_join(left, right, on="k", left_ts="ts", right_ts="rts").collect()
    }
    assert got[1] == "at10"   # equal timestamp counts as visible (<=)
    assert got[2] == "at20"   # latest prior wins
    assert got[3] is None     # nothing at/before ts=5
    assert got[4] is None     # key never seen on the right


def test_asof_does_not_look_forward(spark):
    left = spark.createDataFrame([(1, "k", 15)], "lid long, k string, ts long")
    right = spark.createDataFrame(
        [("k", 10, 100.0), ("k", 16, 999.0)], "k string, rts long, v double"
    )
    row = asof_join(left, right, "k", "ts", "rts").collect()[0]
    assert row["v"] == 100.0  # rts=16 is in the future, must not leak


def test_range_join_boundaries(spark):
    left = spark.createDataFrame(
        [(1, 0.0), (2, 999.99), (3, 1000.0), (4, 2999.0), (5, 3000.0)],
        "id long, v double",
    )
    right = spark.createDataFrame(
        [("a", 0.0, 1000.0), ("b", 1000.0, 3000.0)], "band string, lo double, hi double"
    )
    got = {r["id"]: r["band"] for r in range_join(left, "v", right, "lo", "hi", 250.0).collect()}
    # lo inclusive / hi exclusive; 3000.0 falls outside every band
    assert got == {1: "a", 2: "a", 3: "b", 4: "b"}


def test_range_join_overlapping_intervals(spark):
    left = spark.createDataFrame([(1, 50.0)], "id long, v double")
    right = spark.createDataFrame(
        [("x", 0.0, 100.0), ("y", 25.0, 75.0)], "band string, lo double, hi double"
    )
    bands = {r["band"] for r in range_join(left, "v", right, "lo", "hi", 10.0).collect()}
    assert bands == {"x", "y"}  # overlapping intervals both match, no dup rows


def test_asof_forward_and_nearest_directions(spark):
    from egraphdb_spark.operators.asof import asof_join

    left = spark.createDataFrame(
        [(1, "k", 100), (2, "k", 205), (3, "k", 320), (4, "x", 50)],
        "id long, k string, ts long",
    ).withColumn("ts", F.col("ts").cast("timestamp"))
    right = spark.createDataFrame(
        [("k", 100, "a"), ("k", 210, "b"), ("k", 300, "c")],
        "k string, rts long, val string",
    ).withColumn("rts", F.col("rts").cast("timestamp"))

    def run(**kw):
        return {
            r["id"]: r["val"]
            for r in asof_join(
                left, right, on="k", left_ts="ts", right_ts="rts",
                right_cols=["val"], **kw
            ).collect()
        }

    # backward: latest rts <= ts (equal counts)
    assert run() == {1: "a", 2: "a", 3: "c", 4: None}
    # forward: earliest rts >= ts (equal counts)
    assert run(direction="forward") == {1: "a", 2: "b", 3: None, 4: None}
    # nearest: id2 at 205 → backward 'a' is 105s away, forward 'b' is 5s → b;
    # id3 at 320 → only backward exists
    assert run(direction="nearest") == {1: "a", 2: "b", 3: "c", 4: None}
    # nearest + tolerance 10s: id2 keeps b (5s), id1 keeps a (0s), id3 drops
    assert run(direction="nearest", tolerance_seconds=10) == {
        1: "a", 2: "b", 3: None, 4: None,
    }


def test_asof_nearest_exact_tie_prefers_backward(spark):
    from egraphdb_spark.operators.asof import asof_join

    left = spark.createDataFrame([(1, "k", 200)], "id long, k string, ts long") \
        .withColumn("ts", F.col("ts").cast("timestamp"))
    right = spark.createDataFrame(
        [("k", 150, "past"), ("k", 250, "future")],
        "k string, rts long, val string",
    ).withColumn("rts", F.col("rts").cast("timestamp"))
    got = asof_join(
        left, right, on="k", left_ts="ts", right_ts="rts",
        right_cols=["val"], direction="nearest",
    ).collect()
    assert got[0]["val"] == "past"


def test_interval_overlap_join_exactly_once(spark):
    """Pairs overlapping across MANY shared buckets are emitted exactly
    once; results match a brute-force theta join; no nested-loop join in
    the plan."""
    from datetime import datetime

    from egraphdb_spark.operators.asof import interval_overlap_join

    def t(h, m=0):
        return datetime(2024, 1, 1, h, m)

    left = spark.createDataFrame(
        [  # id, start, end
            (1, t(0), t(10)),      # long interval spanning many buckets
            (2, t(5), t(5, 30)),   # inside bucket 5
            (3, t(20), t(21)),     # overlaps nothing
        ],
        "lid long, ls timestamp, le timestamp",
    )
    right = spark.createDataFrame(
        [
            (10, t(4), t(12)),     # overlaps 1 (shares buckets 4..10) and 2
            (11, t(5, 15), t(5, 20)),  # inside 1 and 2
            (12, t(9, 59), t(10)), # touches 1's right edge (closed)
            (13, t(22), t(23)),    # overlaps nothing
        ],
        "rid long, rs timestamp, re timestamp",
    )
    out = interval_overlap_join(
        left, "ls", "le", right, "rs", "re", bucket_seconds=3600
    )
    got = sorted((r.lid, r.rid) for r in out.collect())
    lrows, rrows = left.collect(), right.collect()
    want = sorted(
        (l.lid, r.rid)
        for l in lrows
        for r in rrows
        if l.ls <= r.re and r.rs <= l.le
    )
    assert got == want == [(1, 10), (1, 11), (1, 12), (2, 10), (2, 11)]
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "NestedLoop" not in plan and "Cartesian" not in plan
