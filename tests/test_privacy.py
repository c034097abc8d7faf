"""k-anonymity audit + suppression: hand-computed classes, threshold
edges, and the schema-preservation contract of k_suppress."""

from __future__ import annotations

from pyspark.sql import functions as F

from egraphdb_spark.operators.privacy import k_anonymity_report, k_suppress


def _corpus(spark):
    # classes by (g1, g2): A/x → 3 rows, A/y → 2, B/x → 1
    rows = [
        (1, "A", "x"), (2, "A", "x"), (3, "A", "x"),
        (4, "A", "y"), (5, "A", "y"),
        (6, "B", "x"),
    ]
    return spark.createDataFrame(rows, "id long, g1 string, g2 string")


def test_k_anonymity_report_hand_computed(spark):
    out = {
        r.k: r
        for r in k_anonymity_report(
            _corpus(spark), ["g1", "g2"], ks=(2, 3, 4)
        ).collect()
    }
    assert set(out) == {2, 3, 4}
    for r in out.values():
        assert r.n_classes == 3
        assert r.n_rows == 6
        assert r.min_class_size == 1
    assert (out[2].n_rows_below_k, out[2].n_classes_below_k) == (1, 1)
    assert (out[3].n_rows_below_k, out[3].n_classes_below_k) == (3, 2)
    assert (out[4].n_rows_below_k, out[4].n_classes_below_k) == (6, 3)


def test_k_suppress_drops_small_classes_only(spark):
    df = _corpus(spark)
    kept2 = k_suppress(df, ["g1", "g2"], 2)
    assert sorted(r.id for r in kept2.collect()) == [1, 2, 3, 4, 5]
    kept3 = k_suppress(df, ["g1", "g2"], 3)
    assert sorted(r.id for r in kept3.collect()) == [1, 2, 3]
    # k=1 keeps everything; schema unchanged (no helper columns leak)
    kept1 = k_suppress(df, ["g1", "g2"], 1)
    assert kept1.count() == 6
    assert kept1.columns == df.columns


def test_k_suppress_expression_quasi_identifiers(spark):
    """Banding expressions as quasi-identifiers (generalization)."""
    rows = [(i, float(v)) for i, v in enumerate([101, 102, 199, 205, 350])]
    df = spark.createDataFrame(rows, "id long, v double")
    band = F.floor(F.col("v") / 100).cast("long")
    # bands: 1 → 3 rows, 2 → 1 row, 3 → 1 row
    kept = k_suppress(df, [band], 2)
    assert sorted(r.id for r in kept.collect()) == [0, 1, 2]
    rep = k_anonymity_report(df, [band], ks=(2,)).collect()[0]
    assert rep.n_classes == 3
    assert rep.n_rows_below_k == 2
    assert rep.min_class_size == 1


def test_null_quasi_values_form_their_own_class(spark):
    """NULL is a groupBy key like any other — rows with NULL quasi
    values form one equivalence class, not silently dropped."""
    rows = [(1, None), (2, None), (3, "A")]
    df = spark.createDataFrame(rows, "id long, g string")
    rep = k_anonymity_report(df, ["g"], ks=(2,)).collect()[0]
    assert rep.n_classes == 2
    assert rep.n_rows == 3
    assert rep.n_rows_below_k == 1
    kept = k_suppress(df, ["g"], 2)
    assert sorted(r.id for r in kept.collect()) == [1, 2]


def test_l_diversity_hand_computed(spark):
    """Two classes: A holds 3 rows / 1 distinct sensitive value (fails
    l=2 despite being 3-anonymous — the k-anonymity blind spot), B holds
    3 rows / 3 distinct (passes l<=3)."""
    from egraphdb_spark.operators.privacy import l_diversity_report

    rows = [
        (1, "A", "s1"), (2, "A", "s1"), (3, "A", "s1"),
        (4, "B", "x"), (5, "B", "y"), (6, "B", "z"),
    ]
    df = spark.createDataFrame(rows, "id long, g string, s string")
    rep = {r.l: r for r in l_diversity_report(df, ["g"], "s", ls=(2, 3, 4)).collect()}
    assert rep[2].n_classes == 2 and rep[2].n_rows == 6
    assert rep[2].n_rows_below_l == 3 and rep[2].n_classes_below_l == 1
    assert rep[3].n_rows_below_l == 3   # A still fails, B has exactly 3
    assert rep[4].n_rows_below_l == 6   # both fail l=4
    assert rep[2].min_distinct_sensitive == 1


def test_l_diversity_null_sensitive_ignored(spark):
    """count(DISTINCT) semantics: NULL sensitive values don't add
    diversity — an all-NULL class has diversity 0."""
    from egraphdb_spark.operators.privacy import l_diversity_report

    rows = [(1, "A", None), (2, "A", None), (3, "B", "v"), (4, "B", None)]
    df = spark.createDataFrame(rows, "id long, g string, s string")
    rep = l_diversity_report(df, ["g"], "s", ls=(2,)).collect()[0]
    assert rep.min_distinct_sensitive == 0
    assert rep.n_rows_below_l == 4      # A diversity 0, B diversity 1
    assert rep.n_classes_below_l == 2
