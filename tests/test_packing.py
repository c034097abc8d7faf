"""Sequence packing + mixture upsampling: laws and plan shape."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from conftest import SF_SMOKE

from egraphdb_spark.operators import packing, text
from test_plans import plan_of


def _doc_tokens(spark):
    from egraphdb_spark.graph import load_tables

    docs = load_tables(spark, SF_SMOKE)["documents"]
    return docs.select("doc_id", text.token_count("text").alias("n_tok")).where(
        F.col("n_tok") > 0
    )


def test_pack_offsets_are_exact_prefix_sums(spark):
    d = _doc_tokens(spark)
    rows = (
        packing.pack_offsets(d, "doc_id", "n_tok", seq_len=512, bucket_width=7)
        .orderBy("doc_id")
        .collect()
    )
    assert rows, "fixture has no non-empty documents"
    expect = 0
    for r in rows:
        # offsets are the exclusive prefix sum in doc_id order — the packed
        # corpus has no holes and no overlaps, regardless of bucketing
        assert r["offset"] == expect
        expect += r["n_tokens"]
        assert r["first_seq"] == r["offset"] // 512
        assert r["last_seq"] == (r["offset"] + r["n_tokens"] - 1) // 512
        assert r["n_seqs"] == r["last_seq"] - r["first_seq"] + 1


def test_pack_bucket_width_invariance(spark):
    d = _doc_tokens(spark)
    a = packing.pack_offsets(d, "doc_id", "n_tok", 512, bucket_width=3).orderBy("doc_id")
    b = packing.pack_offsets(d, "doc_id", "n_tok", 512, bucket_width=10_000).orderBy(
        "doc_id"
    )
    assert [tuple(r) for r in a.collect()] == [tuple(r) for r in b.collect()]


def test_pack_plan_has_no_global_window(spark):
    """The corpus-sized window must partition by bucket; only the one-row-
    per-bucket summary may use a partitionless (single-reducer) window."""
    d = _doc_tokens(spark)
    p = plan_of(packing.pack_offsets(d, "doc_id", "n_tok", 512, bucket_width=64))
    # the intra-bucket running sum keys its window exchange on the bucket
    # column — corpus rows never funnel through one partition ...
    assert "hashpartitioning(__bucket" in p
    # ... and exactly ONE SinglePartition exchange exists: the one-row-per-
    # bucket summary window (a corpus-sized global sort would add another)
    assert p.count("SinglePartition") == 1, p


def test_mixture_epoch_law(spark):
    docs = _doc_tokens(spark).select("doc_id")
    from egraphdb_spark.graph import load_tables

    src = load_tables(spark, SF_SMOKE)["documents"].select("doc_id", "lang")
    out = packing.mixture_weights(src, "doc_id", "lang", {"en": 2.5, "fr": 0.0, "zh": 1.0})
    per_doc = out.groupBy("doc_id", "lang").agg(
        F.count("*").alias("n"), F.max("copy").alias("max_copy")
    )
    rows = per_doc.collect()
    assert rows
    for r in rows:
        if r["lang"] == "en":
            assert r["n"] in (2, 3)  # 2 whole epochs + Bernoulli(0.5) third
        elif r["lang"] == "zh":
            assert r["n"] == 1
        else:
            pytest.fail(f"lang {r['lang']} should have been dropped")
        assert r["max_copy"] == r["n"] - 1  # copies are 0..n-1, dense
    # fr (weight 0.0) and unlisted langs are absent entirely
    langs = {r["lang"] for r in rows}
    assert langs <= {"en", "zh"}
    # the fractional epoch is a real sample: some en docs got 3, some 2
    en_counts = {r["n"] for r in rows if r["lang"] == "en"}
    assert en_counts == {2, 3}


def test_mixture_rejects_negative_weight(spark):
    src = _doc_tokens(spark).withColumn("lang", F.lit("en"))
    with pytest.raises(ValueError):
        packing.mixture_weights(src, "doc_id", "lang", {"en": -1.0})


# --------------------------------------------------------------------------
# chunk_documents
# --------------------------------------------------------------------------


def test_chunking_covers_every_token(spark):
    from egraphdb_spark.graph import load_tables

    docs = load_tables(spark, SF_SMOKE)["documents"]
    out = packing.chunk_documents(docs, "doc_id", "text", window=64, overlap=16)
    toks = docs.select(
        "doc_id", F.size(F.split(F.trim("text"), r"\s+")).alias("n")
    )
    per_doc = out.groupBy(F.col("id").alias("doc_id")).agg(
        F.count("*").alias("n_chunks"),
        F.max("chunk_idx").alias("max_idx"),
        F.sum("n_tokens").alias("tok_rows"),
        F.max("n_tokens").alias("max_ck"),
    )
    j = toks.join(per_doc, "doc_id").collect()
    assert j
    stride = 64 - 16
    for r in j:
        expected = 1 + max(r["n"] - 64, 0 + stride - 1) // stride if r["n"] > 64 else 1
        expected = 1 + (max(r["n"] - 64, 0) + stride - 1) // stride
        assert r["n_chunks"] == expected, (r["n"], r["n_chunks"], expected)
        assert r["max_idx"] == r["n_chunks"] - 1  # dense 0..k-1
        assert r["max_ck"] <= 64
        # total coverage: every position covered once plus `overlap` extra
        # per chunk boundary
        assert r["tok_rows"] == r["n"] + (r["n_chunks"] - 1) * 16


def test_chunking_rejects_bad_overlap(spark):
    from egraphdb_spark.graph import load_tables

    docs = load_tables(spark, SF_SMOKE)["documents"]
    with pytest.raises(ValueError):
        packing.chunk_documents(docs, "doc_id", "text", window=32, overlap=32)


# --------------------------------------------------------------------------
# quota_by_group / rrf_fuse
# --------------------------------------------------------------------------


def test_quota_caps_and_stability(spark):
    from egraphdb_spark.graph import load_tables
    from egraphdb_spark.operators import sampling

    docs = load_tables(spark, SF_SMOKE)["documents"]
    out = sampling.quota_by_group(docs, "doc_id", "source", quota=10)
    per = out.groupBy("source").agg(F.count("*").alias("n")).collect()
    assert per and all(r["n"] <= 10 for r in per)
    # stability: survivors of quota 5 ⊆ survivors of quota 10
    small = sampling.quota_by_group(docs, "doc_id", "source", quota=5)
    assert small.join(out, "doc_id", "left_anti").count() == 0


def test_rrf_fuse_integer_scores(spark):
    from egraphdb_spark.operators import ranking

    a = spark.createDataFrame([(1, 1), (2, 2), (3, 3)], "id long, rnk int")
    b = spark.createDataFrame([(2, 1), (3, 2), (4, 3)], "id long, rnk int")
    rows = {r["id"]: r for r in ranking.rrf_fuse([a, b], k=10).collect()}
    S, C = ranking.RRF_SCALE, ranking.RRF_C
    assert rows[2]["rrf_scaled"] == S // (C + 2) + S // (C + 1)
    assert rows[2]["n_lists"] == 2
    assert rows[1]["rrf_scaled"] == S // (C + 1) and rows[1]["n_lists"] == 1
    # doc in both lists outranks the single-list rank-1 docs
    order = [r["id"] for r in sorted(rows.values(), key=lambda r: -r["rrf_scaled"])]
    assert order[0] == 2


def test_fim_split_reassembles_and_degrades(spark):
    """Spans are in-bounds, lengths sum to L, PSM digest matches a
    Python replay of the same arithmetic; empty/tiny docs degrade to
    all-prefix."""
    import hashlib

    from egraphdb_spark.operators.packing import fim_split

    rows = [(1, "abcdefghij" * 4), (2, "xy"), (3, ""), (4, "abcde")]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r.id: r for r in fim_split(df, "doc_id", "text").collect()}
    for i, t in rows:
        L = len(t)
        m = L // 5
        h = int(hashlib.md5(str(i).encode()).hexdigest()[:15], 16)
        p = 1 + h % (L - m + 1)
        pre, mid, suf = t[: p - 1], t[p - 1 : p - 1 + m], t[p - 1 + m :]
        r = got[i]
        assert (r.n_prefix, r.n_middle, r.n_suffix) == (len(pre), m, len(suf))
        assert r.n_prefix + r.n_middle + r.n_suffix == L
        want = hashlib.md5(
            ("\x1f".join([pre, suf, mid])).encode()
        ).hexdigest()
        assert r.psm_md5 == want, (i, t)
    assert got[3].n_middle == 0 and got[2].n_middle == 0
