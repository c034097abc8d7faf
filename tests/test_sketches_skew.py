"""Sketches (HLL, count-min), skew utilities, and k-means anchors.

Parity with the DuckDB oracles is the gate's job; these tests check the
properties parity can't: estimator accuracy, salting invisibility under
adversarial partitioning, overestimate-only guarantees, and Lloyd-update
behavior (movement + empty-cluster handling).
"""

import pytest
from pyspark.sql import functions as F

from egraphdb_spark.operators import sketches, similarity
from egraphdb_spark.operators.skew import salted_join, salted_topn

from conftest import SF_SMOKE


def test_hll_accuracy_various_cardinalities(spark):
    # n=5000 distinct keys, p=8 -> sigma ~6.5%; 4 sigma is a safe bound
    df = spark.range(5000).select(F.col("id").alias("k"))
    est = sketches.hll_distinct(df, "k", p=8).collect()[0]
    assert abs(est["estimate"] / 5000.0 - 1) < 0.26
    assert 0 < est["buckets_used"] <= 256
    # duplicates must not move the estimate (it's a distinct-counter)
    dup = df.unionByName(df).unionByName(df)
    est2 = sketches.hll_distinct(dup, "k", p=8).collect()[0]
    assert est2["estimate"] == est["estimate"]


def test_hll_register_math_is_integer_exact(spark):
    # a single key: exactly one register set, estimate far below m
    one = spark.range(1).select(F.lit("x").alias("k"))
    r = sketches.hll_distinct(one, "k", p=8).collect()[0]
    assert r["buckets_used"] == 1


def test_cm_overestimates_only(spark):
    df = spark.range(2000).select((F.col("id") % 7).cast("string").alias("k"))
    cand = df.select("k").distinct()
    got = {r["key"]: r["est"] for r in sketches.cm_estimate(df, "k", cand).collect()}
    true = {
        r["k"]: r["c"]
        for r in df.groupBy("k").agg(F.count("*").alias("c")).collect()
    }
    for k, t in true.items():
        assert got[k] >= t  # count-min never undercounts
        assert got[k] <= t + 2000  # and is bounded by total mass


def test_salted_topn_matches_plain_window(spark):
    ev = spark.read.parquet(f"{SF_SMOKE}/events.parquet")
    base = ev.select("event_id", "event_type", "value")
    # adversarial partitioning: everything in ONE input partition means
    # every row gets the same salt — must still be correct
    for df in (base, base.coalesce(1), base.repartition(64)):
        got = salted_topn(
            df, ["event_type"], [F.col("value").desc(), F.col("event_id")], 3, 4
        )
        from pyspark.sql import Window as W

        w = W.partitionBy("event_type").orderBy(
            F.col("value").desc(), F.col("event_id")
        )
        want = (
            base.withColumn("rn", F.row_number().over(w))
            .where(F.col("rn") <= 3)
        )
        assert sorted(map(tuple, got.collect())) == sorted(map(tuple, want.collect()))


def test_salted_join_matches_plain_join(spark):
    ev = spark.read.parquet(f"{SF_SMOKE}/events.parquet").select(
        "event_id", "event_type"
    )
    dim = ev.select("event_type").distinct().withColumn(
        "cls", F.substring("event_type", 1, 2)
    )
    for how in ("inner", "left", "left_semi"):
        got = salted_join(ev, dim, ["event_type"], n_salt=4, how=how)
        want = ev.join(dim, ["event_type"], how)
        assert sorted(map(tuple, got.collect())) == sorted(map(tuple, want.collect()))
    with pytest.raises(ValueError):
        salted_join(ev, dim, ["event_type"], how="right")


def test_kmeans_anchors_move_and_keep_count(spark):
    emb = spark.read.parquet(f"{SF_SMOKE}/embeddings.parquet")
    init = similarity.prefix_anchors(emb, "vec_id", "embedding", 4)
    fitted = similarity.kmeans_anchors(emb, "vec_id", "embedding", 4, iters=2)
    assert fitted.count() == 4
    i0 = {r["anchor_id"]: [float(x) for x in r["vec"]] for r in init.collect()}
    f0 = {r["anchor_id"]: list(r["vec"]) for r in fitted.collect()}
    assert set(f0) == set(i0)
    # Lloyd updates must move at least one centroid off its seed vector
    assert any(i0[a] != f0[a] for a in i0)


def test_kmeans_iter_zero_is_prefix_anchors(spark):
    emb = spark.read.parquet(f"{SF_SMOKE}/embeddings.parquet")
    a = similarity.kmeans_anchors(emb, "vec_id", "embedding", 3, iters=0).collect()
    b = similarity.prefix_anchors(emb, "vec_id", "embedding", 3).collect()
    assert {r["anchor_id"]: [round(float(x), 6) for x in r["vec"]] for r in a} == {
        r["anchor_id"]: [round(float(x), 6) for x in r["vec"]] for r in b
    }


def test_hash_sample_nested_and_stable(spark):
    from egraphdb_spark.operators import sampling

    docs = spark.read.parquet(f"{SF_SMOKE}/documents.parquet")
    s10 = set(r["doc_id"] for r in sampling.hash_sample(docs, "doc_id", 0.10).collect())
    s30 = set(r["doc_id"] for r in sampling.hash_sample(docs, "doc_id", 0.30).collect())
    assert s10 <= s30  # nested: smaller fraction is a subset
    again = set(r["doc_id"] for r in sampling.hash_sample(docs, "doc_id", 0.10).collect())
    assert s10 == again  # stable across runs
    # growth-stability: membership decided per key, so a corpus subset
    # yields exactly the intersection
    half = docs.where(F.col("doc_id") % 2 == 0)
    sh = set(r["doc_id"] for r in sampling.hash_sample(half, "doc_id", 0.30).collect())
    assert sh == {d for d in s30 if d % 2 == 0}


def test_train_test_split_partitions_and_decorrelates(spark):
    from egraphdb_spark.operators import sampling

    docs = spark.read.parquet(f"{SF_SMOKE}/documents.parquet")
    sp = sampling.train_test_split(docs, "doc_id", 0.2)
    counts = dict(
        (r["split"], r["n"])
        for r in sp.groupBy("split").agg(F.count("*").alias("n")).collect()
    )
    assert counts["test"] + counts["train"] == docs.count()
    assert 0 < counts["test"] < counts["train"]
    with pytest.raises(ValueError):
        sampling.hash_sample(docs, "doc_id", 1.5)


def test_stratified_sample_rates(spark):
    from egraphdb_spark.operators import sampling

    docs = spark.read.parquet(f"{SF_SMOKE}/documents.parquet")
    out = sampling.stratified_hash_sample(docs, "doc_id", "lang", {"en": 1.0})
    # keep-all stratum intact, unlisted strata dropped entirely
    assert out.where(F.col("lang") != "en").count() == 0
    assert out.count() == docs.where(F.col("lang") == "en").count()


def test_histogram_quantiles_error_bound(spark):
    from egraphdb_spark.operators import sketches

    li = spark.read.parquet(f"{SF_SMOKE}/lineitem.parquet")
    qs = [0.25, 0.5, 0.75, 0.95]
    got = {r["q"]: r["est"] for r in
           sketches.histogram_quantiles(li, "l_extendedprice", 50.0, qs).collect()}
    exact = li.selectExpr(
        *[f"percentile_disc({q}) WITHIN GROUP (ORDER BY l_extendedprice) AS p{i}"
          for i, q in enumerate(qs)]
    ).collect()[0]
    for i, q in enumerate(qs):
        assert abs(got[q] - exact[f"p{i}"]) <= 50.0  # error bounded by width
    assert sorted(got) == qs
    with pytest.raises(ValueError):
        sketches.histogram_quantiles(li, "l_extendedprice", 50.0, [])


def test_bloom_no_false_negatives_and_merge(spark):
    members = spark.range(500).select((F.col("id") * 7 + 3).alias("k"))
    sk = sketches.bloom_build(members, "k")
    # dense size bound: at most 1024 words
    assert sk.count() <= 1024
    probe = spark.range(2000).select(F.col("id").alias("k"))
    row = sketches.bloom_probe_summary(sk, probe, "k", members.withColumnRenamed("k", "m")).collect()[0]
    # membership law: every true member hits (no false negatives)
    assert row["n_probe"] == 2000
    assert row["n_bloom_hits"] - row["n_false_pos"] == row["n_true"]
    # mergeability: build over two halves, bit_or-merge == single build
    h1 = sketches.bloom_build(members.where(F.col("k") % 2 == 0), "k")
    h2 = sketches.bloom_build(members.where(F.col("k") % 2 == 1), "k")
    merged = (
        h1.unionByName(h2).groupBy("word").agg(F.bit_or("bits").alias("bits"))
    )
    full = {(r["word"], r["bits"]) for r in sk.collect()}
    assert {(r["word"], r["bits"]) for r in merged.collect()} == full


def test_zvalue_bit_interleave_laws(spark):
    from egraphdb_spark.operators.layout import zvalue

    df = spark.range(1).select(
        zvalue(F.lit(0b1111), F.lit(0)).alias("a_only"),
        zvalue(F.lit(0), F.lit(0b1111)).alias("b_only"),
        zvalue(F.lit(0b1111), F.lit(0b1111)).alias("both"),
        zvalue(F.lit(1), F.lit(2)).alias("mixed"),
    ).collect()[0]
    assert df["a_only"] == 0b01010101  # a lands on even bit positions
    assert df["b_only"] == 0b10101010  # b on odd
    assert df["both"] == 0b11111111
    # a=1 -> bit0; b=2 -> bit of (b's bit1) = position 3
    assert df["mixed"] == 0b1001


def test_bloom_prefilter_join_equals_plain_join(spark):
    from egraphdb_spark.operators.skew import bloom_prefilter_join

    probe = spark.createDataFrame(
        [(i, f"row{i}") for i in range(200)], "k long, payload string"
    )
    build = spark.createDataFrame([(i * 7,) for i in range(20)], "bk long")
    got = sorted(
        (r["k"], r["bk"]) for r in bloom_prefilter_join(probe, "k", build, "bk").collect()
    )
    want = sorted(
        (r["k"], r["bk"])
        for r in probe.join(build, probe["k"] == build["bk"]).collect()
    )
    assert got == want and len(got) > 0
    # empty build side: empty result, no crash (empty literal map)
    empty = spark.createDataFrame([], "bk long")
    assert bloom_prefilter_join(probe, "k", empty, "bk").count() == 0


def test_bloom_prefilter_actually_prunes(spark):
    """The pre-shuffle filter must reject (nearly) every non-member —
    the point of the runtime filter is shuffle volume, so measure it."""
    from egraphdb_spark.operators.skew import bloom_prefilter_join
    from egraphdb_spark.operators.sketches import bloom_build, _bloom_pos
    from pyspark.sql import functions as F

    probe = spark.createDataFrame([(i,) for i in range(5000)], "k long")
    build = spark.createDataFrame([(i,) for i in range(50)], "bk long")
    words = {r["word"]: r["bits"] for r in bloom_build(build, "bk").collect()}
    import hashlib

    def member(v: int) -> bool:
        md = hashlib.md5(str(v).encode()).hexdigest()
        for j in range(4):
            pos = int(md[4 * j : 4 * j + 4], 16)
            if not (words.get(pos // 64, 0) >> (pos % 64)) & 1:
                return False
        return True

    survivors = sum(member(i) for i in range(5000))
    # 50 true members + false positives; k=4/16-bit positions over 64Kbit
    # with 200 set bits keeps fp-rate tiny — require < 1% leakage
    assert 50 <= survivors < 100


def test_hill_alpha_recovers_pareto_exponent(spark):
    """On an exact Pareto(α=2) sample the estimator lands near 2.0; the
    integer plumbing matches a pure-Python reference bit-for-bit."""
    import math

    from egraphdb_spark.operators.profiling import hill_alpha

    # deterministic Pareto via inverse CDF on a fixed uniform grid:
    # survival exponent (tail index) 1 → pdf exponent α = 1 + 1/E[ln·] = 2,
    # the parameterization the Hill estimator returns (CSN 2009 eq. 3.1)
    xmin = 4
    xs = [xmin / ((i + 0.5) / 400) for i in range(400)]
    df = spark.createDataFrame([(x,) for x in xs], "n double")
    row = hill_alpha(df, "n", xmin=xmin).collect()[0]

    s = sum(math.floor(math.log(x / float(xmin)) * 1e6) for x in xs if x >= xmin)
    n_tail = sum(1 for x in xs if x >= xmin)
    assert row.n_rows == 400 and row.n_tail == n_tail and row.s_micro == s
    assert row.tail_permille == n_tail * 1000 // 400
    exp_alpha = math.floor((n_tail * 1e6) / (s / 1e6)) + 10**6
    assert row.alpha_micro == exp_alpha
    assert 1_800_000 < row.alpha_micro < 2_300_000  # recovers α ≈ 2


def test_hill_alpha_degenerate_tail_is_null(spark):
    from egraphdb_spark.operators.profiling import hill_alpha

    df = spark.createDataFrame([(4,), (4,), (2,)], "n long")
    row = hill_alpha(df, "n", xmin=4).collect()[0]
    assert row.s_micro == 0 and row.alpha_micro is None
    assert row.n_tail == 2 and row.tail_permille == 666


def test_benford_uniform_digits(spark):
    """A digit-balanced input yields equal counts and the exact Benford
    micro-probabilities (spot-checked against log10(1+1/d))."""
    import math

    from pyspark.sql import functions as F

    from egraphdb_spark.operators.profiling import benford_digits

    rows = [(d * 1000 + i,) for d in range(1, 10) for i in range(5)]
    df = spark.createDataFrame(rows, "cents long")
    out = benford_digits(df, F.col("cents")).collect()
    assert [r.digit for r in out] == list(range(1, 10))
    assert all(r.n == 5 for r in out)
    assert all(r.permille == 5000 // 45 for r in out)
    for r in out:
        assert r.benford_micro == math.floor(
            1_000_000 * math.log(1 + 1 / r.digit) / math.log(10)
        )
    assert out[0].benford_micro == 301029  # log10(2)


def test_benford_leading_digit_extraction(spark):
    """Leading digit comes from the exact integer rendering — 999 vs
    1000 vs 100000 land on 9, 1, 1."""
    from pyspark.sql import functions as F

    from egraphdb_spark.operators.profiling import benford_digits

    df = spark.createDataFrame(
        [(999,), (1000,), (100000,), (7,)], "cents long"
    )
    out = {r.digit: r.n for r in benford_digits(df, F.col("cents")).collect()}
    assert out == {9: 1, 1: 2, 7: 1}


def test_expectations_report_counts_planted_violations(spark):
    """One planted violation per rule, plus an orphan order key."""
    from datetime import datetime

    from egraphdb_spark.operators.profiling import expectations_report

    ok = dict(
        l_orderkey=1, l_quantity=10.0, l_extendedprice=100.0,
        l_discount=0.05, l_tax=0.04,
        l_shipdate=datetime(1995, 6, 1),
    )
    bad = [
        dict(ok, l_quantity=99.0),
        dict(ok, l_extendedprice=0.0),
        dict(ok, l_discount=0.5),
        dict(ok, l_tax=0.2),
        dict(ok, l_shipdate=datetime(2005, 1, 1)),
        dict(ok, l_orderkey=777),  # orphan
    ]
    rows = [ok] * 4 + bad
    li = spark.createDataFrame(
        [tuple(r.values()) for r in rows],
        "l_orderkey long, l_quantity double, l_extendedprice double,"
        " l_discount double, l_tax double, l_shipdate timestamp",
    )
    orders = spark.createDataFrame([(1,)], "o_orderkey long")
    out = {r.rule: r for r in expectations_report(li, orders).collect()}
    assert set(out) == {
        "fk_orderkey_exists", "l_discount_in_0_0.10",
        "l_extendedprice_positive", "l_quantity_in_1_50",
        "l_shipdate_in_1992_1998", "l_tax_in_0_0.08",
    }
    assert all(r.n_rows == 10 for r in out.values())
    assert all(r.n_violations == 1 for r in out.values())
    assert all(r.violation_permille == 100 for r in out.values())


def test_quantile_norm_map_hand_computed(spark):
    """Group A = 1..10 (uniform), group B = ten 5s (degenerate): A's
    decile d boundary is d, B's is always 5, and the global type-1
    boundaries follow the combined cumulative by hand."""
    from egraphdb_spark.operators.profiling import quantile_norm_map

    rows = [("A", v) for v in range(1, 11)] + [("B", 5)] * 10
    df = spark.createDataFrame(rows, "source string, n_chars long")
    out = quantile_norm_map(df, "source", "n_chars", n_q=10).collect()
    a = {r.decile: r for r in out if r.source == "A"}
    b = {r.decile: r for r in out if r.source == "B"}
    assert {d: r.src_hi for d, r in a.items()} == {
        d: d for d in range(1, 11)
    }
    assert all(r.src_hi == 5 for r in b.values())
    glob = {d: a[d].glob_hi for d in a}
    assert glob == {
        1: 2, 2: 4, 3: 5, 4: 5, 5: 5, 6: 5, 7: 5, 8: 6, 9: 8, 10: 10
    }
    assert all(r.n_rows == 10 for r in out)


def test_expectations_report_empty_table_null_permille(spark):
    """An empty fact table yields 0-count rules with NULL permille
    instead of DIVIDE_BY_ZERO under ANSI."""
    from egraphdb_spark.operators.profiling import expectations_report

    li = spark.createDataFrame(
        [],
        "l_orderkey long, l_quantity double, l_extendedprice double,"
        " l_discount double, l_tax double, l_shipdate timestamp",
    )
    orders = spark.createDataFrame([(1,)], "o_orderkey long")
    out = {r.rule: r for r in expectations_report(li, orders).collect()}
    assert len(out) == 6
    assert all(r.n_rows == 0 for r in out.values())
    assert all(r.n_violations == 0 for r in out.values())
    assert all(r.violation_permille is None for r in out.values())


def test_kmv_exact_below_k(spark):
    """Fewer than k distinct values ⇒ the estimate IS the exact count."""
    from egraphdb_spark.operators.sketches import kmv_distinct

    rows = [(i % 10, "t") for i in range(100)]
    df = spark.createDataFrame(rows, "u long, g string")
    got = kmv_distinct(df, "g", "u", k=64).collect()[0]
    assert got.n_hashes == 10 and got.est_distinct == 10


def test_kmv_accuracy_vs_exact(spark):
    """KMV standard error is ~1/sqrt(k−2); assert the estimate lands
    within 5 sigma of truth for a set well above k."""
    from egraphdb_spark.operators.sketches import kmv_distinct

    n, k = 5000, 64
    df = spark.createDataFrame([(i, "t") for i in range(n)], "u long, g string")
    est = kmv_distinct(df, "g", "u", k=k).collect()[0].est_distinct
    rel = 5.0 / (k - 2) ** 0.5
    assert abs(est - n) / n < rel, est


def test_kmv_plan_window_group_limit(spark):
    """The rank cut must compile to WindowGroupLimit — map tasks keep at
    most k rows per group before the exchange."""
    from egraphdb_spark.queries import REGISTRY

    fn, _ = REGISTRY["sketch_kmv_distinct"]
    df = fn(spark, "/root/testdata/sf0.001")
    import io as _io
    from contextlib import redirect_stdout

    buf = _io.StringIO()
    with redirect_stdout(buf):
        df.explain("formatted")
    assert "WindowGroupLimit" in buf.getvalue()


def test_kmv_overlap_identical_sets(spark):
    """A ≡ B ⇒ est_union == est_a == est_b and intersect == union."""
    from egraphdb_spark.operators.sketches import kmv_overlap

    rows = [(u, t) for u in range(500) for t in ("x", "y")]
    df = spark.createDataFrame(rows, "u long, tag string")
    got = kmv_overlap(df, "u", "tag", "x", "y", k=64).collect()[0]
    assert got.est_a == got.est_b == got.est_union == got.est_intersect


def test_kmv_overlap_tracks_exact(spark):
    """Planted 50% overlap: inclusion-exclusion estimate within the
    compounded bottom-k error budget (~3·(1/sqrt(k-2))·3 sets)."""
    from egraphdb_spark.operators.sketches import kmv_overlap

    a = [(u, "x") for u in range(1000)]
    b = [(u, "y") for u in range(500, 1500)]
    df = spark.createDataFrame(a + b, "u long, tag string")
    got = kmv_overlap(df, "u", "tag", "x", "y", k=64).collect()[0]
    rel = 3 * 3.0 / (64 - 2) ** 0.5
    assert abs(got.est_intersect - 500) < 1500 * rel, got
