"""Round-6 operators: t-closeness, epoch shuffle, PSI drift, NFC
normalization, content-defined chunking, MMR re-rank — hand-computed
cases plus each operator's defining invariant (shift resistance for CDC,
diversification for MMR, reproducibility for the epoch shuffle)."""

from __future__ import annotations

from pyspark.sql import functions as F


# ---------------------------------------------------------------- t-closeness


def test_t_closeness_hand_computed(spark):
    from egraphdb_spark.operators.privacy import t_closeness_report

    # one quasi column, sensitive s; global: x→3, y→1 (N=4)
    # class A = {x,x} → TVD = 1/2(|2/2-3/4| + |0/2-1/4|) = 1/4
    # class B = {x,y} → TVD = 1/2(|1/2-3/4| + |1/2-1/4|) = 1/4
    rows = [(1, "A", "x"), (2, "A", "x"), (3, "B", "x"), (4, "B", "y")]
    df = spark.createDataFrame(rows, "id long, g string, s string")
    out = {
        r.t_scaled: r
        for r in t_closeness_report(
            df, ["g"], "s", ts_scaled=(200_000, 250_000, 300_000)
        ).collect()
    }
    for r in out.values():
        assert r.n_classes == 2
        assert r.n_rows == 4
        assert r.max_tvd_scaled == 250_000  # exactly 1/4
    # TVD = 0.25: above 0.2 → both classes; above 0.25 (strict) → none
    assert (out[200_000].n_rows_above_t, out[200_000].n_classes_above_t) == (4, 2)
    assert (out[250_000].n_rows_above_t, out[250_000].n_classes_above_t) == (0, 0)
    assert (out[300_000].n_rows_above_t, out[300_000].n_classes_above_t) == (0, 0)


def test_t_closeness_uniform_class_is_zero(spark):
    from egraphdb_spark.operators.privacy import t_closeness_report

    # every class mirrors the global distribution exactly → TVD 0
    rows = [(1, "A", "x"), (2, "A", "y"), (3, "B", "x"), (4, "B", "y")]
    df = spark.createDataFrame(rows, "id long, g string, s string")
    r = t_closeness_report(df, ["g"], "s", ts_scaled=(1,)).collect()[0]
    assert r.max_tvd_scaled == 0
    assert r.n_classes_above_t == 0


# ---------------------------------------------------------------- epoch shuffle


def test_epoch_shuffle_reproducible_and_distinct(spark):
    from egraphdb_spark.operators.sampling import epoch_shuffle

    df = spark.createDataFrame([(i,) for i in range(200)], "doc_id long")
    a = epoch_shuffle(df, "doc_id", epochs=2, n_shards=4)
    b = epoch_shuffle(df, "doc_id", epochs=2, n_shards=4)
    ra = sorted(map(tuple, a.collect()))
    rb = sorted(map(tuple, b.collect()))
    assert ra == rb  # pure function of (salt, epoch, key)
    assert len(ra) == 400  # one row per (row, epoch)
    # epochs are DIFFERENT permutations: order keys differ per doc
    keys = {(r[1], r[0]): r[2] for r in ra}  # (epoch, doc) -> order_key
    diffs = sum(1 for i in range(200) if keys[(1, i)] != keys[(2, i)])
    assert diffs == 200
    shards = {r[3] for r in ra}
    assert shards <= set(range(4))


def test_epoch_shuffle_rejects_bad_args(spark):
    import pytest

    from egraphdb_spark.operators.sampling import epoch_shuffle

    df = spark.createDataFrame([(1,)], "doc_id long")
    with pytest.raises(ValueError):
        epoch_shuffle(df, "doc_id", epochs=0)
    with pytest.raises(ValueError):
        epoch_shuffle(df, "doc_id", n_shards=0)


# ---------------------------------------------------------------- PSI drift


def test_psi_identical_distributions_near_zero(spark):
    from egraphdb_spark.operators.profiling import psi_drift

    ref = spark.createDataFrame([(i % 5,) for i in range(500)], "b long")
    cur = spark.createDataFrame([(i % 5,) for i in range(500)], "b long")
    rows = psi_drift(ref, cur, "b").collect()
    assert len(rows) == 5
    assert all(r.psi_contrib_micro == 0 for r in rows)
    assert rows[0].psi_total_micro == 0


def test_psi_shifted_distribution_detected(spark):
    from egraphdb_spark.operators.profiling import psi_drift

    ref = spark.createDataFrame([(0,)] * 450 + [(1,)] * 50, "b long")
    cur = spark.createDataFrame([(0,)] * 50 + [(1,)] * 450, "b long")
    rows = psi_drift(ref, cur, "b").collect()
    # a mass swap of this size is far past the 0.25 "shifted" bar
    assert rows[0].psi_total_micro > 250_000
    assert all(r.psi_contrib_micro >= 0 for r in rows)


def test_psi_one_sided_bucket_stays_finite(spark):
    from egraphdb_spark.operators.profiling import psi_drift

    ref = spark.createDataFrame([(0,)] * 10, "b long")
    cur = spark.createDataFrame([(0,)] * 9 + [(7,)], "b long")
    rows = {r.bucket: r for r in psi_drift(ref, cur, "b").collect()}
    assert set(rows) == {0, 7}
    assert rows[7].n_ref == 0 and rows[7].n_cur == 1
    assert rows[7].psi_contrib_micro >= 0  # smoothing keeps ln finite


# ---------------------------------------------------------------- NFC normalize


def test_nfc_composes_combining_marks(spark):
    from egraphdb_spark.operators.text import nfc_normalize

    rows = [(1, "café"), (2, "plain"), (3, None)]
    df = spark.createDataFrame(rows, "id long, t string")
    out = {r.id: r.n for r in df.select("id", nfc_normalize(F.col("t")).alias("n")).collect()}
    assert out[1] == "café"
    assert out[2] == "plain"
    assert out[3] is None


# ---------------------------------------------------------------- CDC chunks


def _chunks(spark, texts):
    from egraphdb_spark.operators.dedup import cdc_chunks

    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )
    return cdc_chunks(df, "doc_id", "text")


def test_cdc_chunks_partition_the_document(spark):
    text = " ".join(f"tok{i}" for i in range(300))
    rows = _chunks(spark, [text]).collect()
    assert sum(r.n_tokens for r in rows) == 300
    # chunk indexes are dense from 0
    idx = sorted(r.chunk_idx for r in rows)
    assert idx == list(range(len(rows)))
    assert len(rows) > 1  # at least one cut fired in 300 tokens


def test_cdc_chunks_shift_resistant(spark):
    base = " ".join(f"tok{i}" for i in range(300))
    shifted = "inserted preamble sentence " + base
    rows = _chunks(spark, [base, shifted]).collect()
    h0 = {r.chunk_hash for r in rows if r.id == 0}
    h1 = {r.chunk_hash for r in rows if r.id == 1}
    # insertion at the head only perturbs chunks before the first
    # re-sync cut: the overwhelming majority of chunk hashes survive
    shared = len(h0 & h1)
    assert shared >= len(h0) - 2
    # while a FIXED-width non-overlapping chunking would share ~nothing
    # (every boundary shifts by 3 tokens) — the invariant CDC exists for


def test_cdc_chunks_identical_docs_identical_hashes(spark):
    text = " ".join(f"w{i % 17}x{i % 5}" for i in range(100))
    rows = _chunks(spark, [text, text]).collect()
    h0 = sorted(r.chunk_hash for r in rows if r.id == 0)
    h1 = sorted(r.chunk_hash for r in rows if r.id == 1)
    assert h0 == h1


# ---------------------------------------------------------------- MMR


def test_mmr_diversifies_near_duplicates(spark):
    import math

    from egraphdb_spark.operators.ranking import mmr_rerank

    # Geometry matters: if the top pick IS the query, every candidate's
    # sim-to-picked equals its relevance and MMR cannot reorder anything.
    # So: a at 10° from q; b at 20° IN THE SAME PLANE (sim(b,a) = cos10°
    # > rel(b)); c at 20° in an ORTHOGONAL plane (sim(c,a) = cos10°·cos20°
    # < sim(b,a)).  Plain top-3 = [a, b, c] (b before c by id tie on
    # equal rel); MMR rank 2 must take the diverse c over the same-plane b:
    #   score(b) = 7·cos20° − 3·cos10°        = 0.36235
    #   score(c) = 7·cos20° − 3·cos10°·cos20° = 0.38017
    c10, s10 = math.cos(math.radians(10)), math.sin(math.radians(10))
    c20, s20 = math.cos(math.radians(20)), math.sin(math.radians(20))
    rows = [
        (1, [c10, s10, 0.0, 0.0]),
        (2, [c20, s20, 0.0, 0.0]),
        (3, [c20, 0.0, s20, 0.0]),
        (4, [0.0, 1.0, 0.0, 0.0]),
    ]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    out = mmr_rerank(df, "vec_id", "embedding", [1.0, 0.0, 0.0, 0.0], 4, 3)
    picks = [r.id for r in out.collect()]
    assert picks == [1, 3, 2]  # diversification beats the same-plane near-dup


def test_mmr_k_capped_by_candidates(spark):
    from egraphdb_spark.operators.ranking import mmr_rerank

    rows = [(1, [1.0, 0.0]), (2, [0.0, 1.0])]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    out = mmr_rerank(df, "vec_id", "embedding", [1.0, 0.0], 10, 5).collect()
    assert [r.rank for r in out] == [1, 2]


def test_mmr_empty_candidates_returns_empty(spark):
    from egraphdb_spark.operators.ranking import mmr_rerank

    df = spark.createDataFrame([], "vec_id long, embedding array<double>")
    out = mmr_rerank(df, "vec_id", "embedding", [1.0, 0.0], 5, 3)
    assert out.count() == 0
    assert out.columns == ["rank", "id", "rel_micro"]


def test_t_closeness_single_class_is_zero(spark):
    from egraphdb_spark.operators.privacy import t_closeness_report

    # one equivalence class == the whole table: its distribution IS the
    # marginal, TVD must be exactly 0
    rows = [(1, "A", "x"), (2, "A", "y"), (3, "A", "x")]
    df = spark.createDataFrame(rows, "id long, g string, s string")
    r = t_closeness_report(df, ["g"], "s", ts_scaled=(1,)).collect()[0]
    assert r.n_classes == 1
    assert r.max_tvd_scaled == 0
    assert r.n_rows_above_t == 0


# ------------------------------------------------- round-6 advice regressions


def test_epoch_shuffle_rejects_reserved_columns(spark):
    import pytest

    from egraphdb_spark.operators.sampling import epoch_shuffle

    # a pre-existing `epoch` would be clobbered by the explode BEFORE the
    # order-key hash reads it, silently changing every order key — the
    # operator must refuse instead (same for order_key / shard)
    for col in ("epoch", "order_key", "shard"):
        df = spark.createDataFrame([(1, 9)], f"doc_id long, {col} long")
        with pytest.raises(ValueError, match=col):
            epoch_shuffle(df, "doc_id")


def test_mmr_rerank_string_ids(spark):
    from egraphdb_spark.operators.ranking import mmr_rerank

    # output schema derives the id type from the input: string ids must
    # round-trip (previously hardcoded `id long` would fail at runtime)
    rows = [("alpha", [1.0, 0.0]), ("beta", [0.0, 1.0])]
    df = spark.createDataFrame(rows, "vec_id string, embedding array<double>")
    out = mmr_rerank(df, "vec_id", "embedding", [1.0, 0.0], 5, 2).collect()
    assert [r.id for r in out] == ["alpha", "beta"]
    assert out[0].rel_micro == 1_000_000
    # ascending-id tiebreak applies lexicographically for string ids
    tie = spark.createDataFrame(
        [("b", [1.0, 0.0]), ("a", [1.0, 0.0])],
        "vec_id string, embedding array<double>",
    )
    first = mmr_rerank(tie, "vec_id", "embedding", [1.0, 0.0], 5, 1).collect()
    assert first[0].id == "a"


def test_t_closeness_scale_products_are_128bit(spark):
    from pyspark.sql import functions as F

    from egraphdb_spark.operators.privacy import t_closeness_report

    # num*scale must not run in int64: with sz*N large enough the old
    # bigint product wrapped silently (non-ANSI Spark) while DuckDB
    # errored.  Unit-scale repro of the arithmetic path: the plan's
    # tvd_scaled/threshold expressions must reference the decimal(38,0)
    # operands, and a skewed 3k-row single-class table must produce the
    # exact hand-derivable rational.
    n = 3000
    rows = [(i, "A", "x" if i < n - 1 else "y") for i in range(n)]
    df = spark.createDataFrame(rows, "id long, g string, s string")
    r = t_closeness_report(df, ["g"], "s", ts_scaled=(1,)).collect()[0]
    # single class == whole table → TVD exactly 0 regardless of skew
    assert r.max_tvd_scaled == 0
    # two classes, one holding all the rare value: hand value
    # N=3000, class B={y}, sz=1: num = |1*3000-1*1| + 1*(3000-1) = 5998,
    # den = 2*1*3000 → TVD = 5998/6000 → floor(·1e6) = 999666
    rows2 = [(i, "A", "x") for i in range(n - 1)] + [(n, "B", "y")]
    df2 = spark.createDataFrame(rows2, "id long, g string, s string")
    r2 = t_closeness_report(df2, ["g"], "s", ts_scaled=(999_000,)).collect()[0]
    assert r2.max_tvd_scaled == 999_666
    assert r2.n_classes_above_t == 1 and r2.n_rows_above_t == 1
