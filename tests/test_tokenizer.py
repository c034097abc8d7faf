"""BPE trainer: pure-Python reference parity, early stop, determinism."""

from __future__ import annotations

import re
from collections import Counter

import pytest
from hypothesis import HealthCheck, given, settings, strategies as st

from egraphdb_spark.operators.tokenizer import SEP, bpe_train
from egraphdb_spark.operators.text import BPE_PATTERN


def _ref_bpe(texts: list[str], n_merges: int):
    """Pure-Python reference with the SAME double-pass-replace merge
    semantics as the distributed trainer (see tokenizer.py docstring)."""
    words = Counter(
        w for t in texts for w in re.findall(BPE_PATTERN, t.lower())
    )
    vocab = {SEP + SEP.join(w) + SEP: c for w, c in words.items()}
    rules = []
    for rnd in range(1, n_merges + 1):
        pairs: Counter = Counter()
        for s, c in vocab.items():
            syms = [x for x in s.split(SEP) if x]
            for a, b in zip(syms, syms[1:]):
                pairs[(a, b)] += c
        if not pairs:
            break
        # max count, lexicographic tie-break on (lhs, rhs)
        (a, b), n = min(pairs.items(), key=lambda kv: (-kv[1], kv[0]))
        rules.append((rnd, a, b, a + b, n))
        pat, rep = SEP + a + SEP + b + SEP, SEP + a + b + SEP
        new_vocab: dict[str, int] = {}
        for s, c in vocab.items():
            s2 = s.replace(pat, rep).replace(pat, rep)
            new_vocab[s2] = new_vocab.get(s2, 0) + c
        vocab = new_vocab
    return rules


def _spark_bpe(spark, texts, n_merges):
    docs = spark.createDataFrame([(t,) for t in texts], "text string")
    return [
        (r.merge_round, r.lhs, r.rhs, r.merged, r.n)
        for r in bpe_train(docs, "text", n_merges)
        .orderBy("merge_round")
        .collect()
    ]


def test_bpe_hand_corpus(spark):
    texts = ["the cat sat on the mat", "the cat", "banana bandana"]
    got = _spark_bpe(spark, texts, 5)
    assert got == _ref_bpe(texts, 5)
    # 't'+'he' -> 'the' must be learned from this corpus
    assert ("the" in [g[3] for g in got])


def test_bpe_early_stop_single_chars(spark):
    # corpus of 1-char words: no adjacent pairs, zero rules
    assert _spark_bpe(spark, ["a b c", "d e"], 4) == []


def test_bpe_repeated_symbol_runs(spark):
    # the (x, x) overlap corner: counts and rule order must still match
    texts = ["aaaaa aaa aa", "aaaa"]
    assert _spark_bpe(spark, texts, 4) == _ref_bpe(texts, 4)


@given(
    texts=st.lists(
        st.text(alphabet="ab c\td.e2f\ng", min_size=0, max_size=40),
        min_size=1,
        max_size=6,
    )
)
@settings(
    max_examples=5,
    deadline=None,
    suppress_health_check=[
        HealthCheck.function_scoped_fixture,
        HealthCheck.too_slow,
    ],
)
def test_bpe_property_vs_reference(spark, texts):
    assert _spark_bpe(spark, texts, 3) == _ref_bpe(texts, 3)


def test_bpe_token_frequencies_matches_reference_encoding(spark):
    from egraphdb_spark.operators.tokenizer import bpe_token_frequencies

    texts = ["the cat sat on the mat", "the cat", "banana bandana"]
    got = {
        (r.token, r.n)
        for r in bpe_token_frequencies(spark.createDataFrame(
            [(t,) for t in texts], "text string"
        ), "text", n_merges=4, top_n=50).collect()
    }
    # reference: run _ref_bpe's vocab forward
    rules = _ref_bpe(texts, 4)
    words = Counter(
        w for t in texts for w in re.findall(BPE_PATTERN, t.lower())
    )
    freq: Counter = Counter()
    for w, c in words.items():
        s = SEP + SEP.join(w) + SEP
        for _, a, b, _, _ in rules:
            pat, rep = SEP + a + SEP + b + SEP, SEP + a + b + SEP
            s = s.replace(pat, rep).replace(pat, rep)
        for tok in [x for x in s.split(SEP) if x]:
            freq[tok] += c
    assert got == {(t, n) for t, n in freq.items()}


def test_bpe_token_frequencies_early_stop_keeps_vocab(spark):
    from egraphdb_spark.operators.tokenizer import bpe_token_frequencies

    out = bpe_token_frequencies(
        spark.createDataFrame([("a b c", ), ("a .",)], "text string"),
        "text", n_merges=4, top_n=10,
    ).collect()
    assert {(r.token, r.n) for r in out} == {("a", 2), ("b", 1), ("c", 1), (".", 1)}


def test_fertility_hand_computed(spark):
    """Two languages, hand-checkable: with 0 merges every word
    tokenizes to its characters, so fertility = chars per word."""
    from egraphdb_spark.operators.tokenizer import bpe_fertility

    rows = [
        (1, "aa bb", "xx"),     # 2 words, 4 chars
        (2, "aa", "xx"),        # 1 word, 2 chars
        (3, "ccc", "yy"),       # 1 word, 3 chars
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string, lang string")
    got = {r.lang: r for r in bpe_fertility(df, "text", "lang", n_merges=0).collect()}
    assert got["xx"].n_words == 3 and got["xx"].n_tokens == 6
    assert got["xx"].fertility_permille == 2000
    assert got["xx"].bytes_per_token_permille == 1000
    assert got["yy"].n_words == 1 and got["yy"].n_tokens == 3
    assert got["yy"].fertility_permille == 3000


def test_fertility_merges_reduce_tokens(spark):
    """Learned merges can only reduce (or keep) token counts; a corpus
    dominated by one bigram must show fertility below char-level for the
    language containing it."""
    from egraphdb_spark.operators.tokenizer import bpe_fertility

    rows = [(i, "ab ab ab abab", "zz") for i in range(5)]
    rows += [(100 + i, "qr st", "ww") for i in range(2)]
    df = spark.createDataFrame(rows, "doc_id long, text string, lang string")
    base = {r.lang: r.n_tokens for r in bpe_fertility(df, "text", "lang", 0).collect()}
    merged = {r.lang: r.n_tokens for r in bpe_fertility(df, "text", "lang", 2).collect()}
    assert merged["zz"] < base["zz"]
    assert merged["ww"] <= base["ww"]
    # merge 1 is (a,b) → "ab" 1 token / "abab" 2; merge 2 is (ab,ab)
    # (count 5 beats qr/st at 2) → "abab" 1 token
    assert merged["zz"] == 5 * (3 * 1 + 1)


def test_oracle_generators_match_spark_at_zero_merges(spark):
    """n_merges=0 is a supported parameterization (character-level
    tokenization); the generated oracles must parse and agree — this was
    a ValueError/parse-error divergence before the fix."""
    import duckdb

    from egraphdb_spark.operators.tokenizer import (
        bpe_fertility,
        bpe_fertility_oracle_sql,
        bpe_train,
        bpe_train_oracle_sql,
    )

    sf = "/root/testdata/sf0.001"
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM '{sf}/documents.parquet'"
    )
    docs = spark.read.parquet(f"{sf}/documents.parquet")

    assert bpe_train(docs, "text", 0).count() == 0
    assert con.execute(bpe_train_oracle_sql("documents", 0)).fetchall() == []

    got = {
        r.lang: (r.n_words, r.n_tokens, r.fertility_permille)
        for r in bpe_fertility(docs, "text", "lang", 0).collect()
    }
    want = {
        r[0]: (r[1], r[2], r[4])
        for r in con.execute(
            bpe_fertility_oracle_sql("documents", "lang", 0)
        ).fetchall()
    }
    assert got == want
