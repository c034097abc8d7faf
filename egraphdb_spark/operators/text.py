"""Text-analysis operators for large-scale training-data pipelines.

These extend the reference surface (which has no text analytics — its scalar
string helpers stop at case conversion and hex codecs, src/egraph_util.erl:
944-955, 222-261) with the document-pipeline operations a 100 TB corpus
needs: token counting, quality scoring, language identification, and
document fingerprinting.

Every operator is a pure column-expression composition (JVM-side, inside
whole-stage codegen — no Python UDFs in the hot path), so they scale
embarrassingly: one narrow projection over the documents table, no shuffle,
predicate/column pruning reach the parquet scan untouched.

Determinism contract: each formula is reproducible in ANSI SQL (the DuckDB
oracles in queries_pipeline.py re-derive the same values bit-for-bit).
"""

from __future__ import annotations

from pyspark.sql import Column, functions as F

# Language-ID stopword profiles.  Tiny on purpose: at scale these live in a
# broadcast map; the operator stays a CASE/array_contains expression.  Order
# is the deterministic tie-break (first profile wins ties).
LANG_PROFILES: list[tuple[str, tuple[str, ...]]] = [
    ("en", ("the", "a", "of", "and", "is", "to", "in")),
    ("de", ("der", "die", "das", "und", "ist", "zu")),
    ("fr", ("le", "la", "et", "les", "est", "des")),
    ("es", ("el", "los", "y", "es", "de", "que")),
    ("zh", ("的", "是", "了", "在")),
]

# Stopwords used by the quality score (English-ish; the score is a signal,
# not a truth — what matters is that it is deterministic and cheap).
QUALITY_STOPWORDS: tuple[str, ...] = ("the", "a", "of", "and", "is", "to", "in")


def tokens(text: str | Column) -> Column:
    """Whitespace tokenization → array<string> (empty array for blank text)."""
    c = F.col(text) if isinstance(text, str) else text
    return F.split(F.trim(c), r"\s+")


def token_count(text: str | Column) -> Column:
    t = tokens(text)
    return F.when(F.length(F.trim(F.col(text) if isinstance(text, str) else text)) == 0, F.lit(0)).otherwise(F.size(t)).cast("long")


def char_count(text: str | Column) -> Column:
    c = F.col(text) if isinstance(text, str) else text
    return F.length(c).cast("long")


def stopword_ratio(text: str | Column, stopwords: tuple[str, ...] = QUALITY_STOPWORDS) -> Column:
    """Fraction of tokens that are stopwords (0.0 for empty docs)."""
    t = tokens(text)
    sw = F.array(*[F.lit(s) for s in stopwords])
    hits = F.size(F.filter(t, lambda w: F.array_contains(sw, w)))
    return (hits / F.greatest(F.size(t), F.lit(1))).cast("double")


def mean_token_len(text: str | Column) -> Column:
    t = tokens(text)
    total = F.aggregate(t, F.lit(0).cast("long"), lambda acc, w: acc + F.length(w))
    return (total / F.greatest(F.size(t), F.lit(1))).cast("double")


def quality_millionths(text: str | Column) -> Column:
    """Deterministic quality signal scaled to millionths, as exact BIGINT.

    score = 0.4·min(n_tokens/100, 1) + 0.3·min(mean_len/8, 1) + 0.3·min(sw_ratio/0.4, 1)

    Length rewards substance, mean token length penalizes fragment soup,
    stopword presence approximates natural-language-ness (pure keyword
    lists score low).  Computed entirely in integer arithmetic (token
    counts, total token chars, stopword hits are exact ints; each term is
    an integer floor-division) so ANY engine reproduces it bit-for-bit —
    no float rounding-boundary hazards.
    """
    t = tokens(text)
    n = token_count(text)  # long
    s = F.greatest(F.size(t).cast("long"), F.lit(1).cast("long"))
    total = F.aggregate(t, F.lit(0).cast("long"), lambda acc, w: acc + F.length(w))
    sw = F.array(*[F.lit(x) for x in QUALITY_STOPWORDS])
    hits = F.size(F.filter(t, lambda w: F.array_contains(sw, w))).cast("long")
    am = F.lit(4000).cast("long") * F.least(n, F.lit(100).cast("long"))
    # Floor division via (x - x%d)/d: the numerator is exactly divisible, so
    # the double division is exact (no float-floor misrounding hazard).
    bm = (F.lit(300000).cast("long") * F.least(total, F.lit(8).cast("long") * s)).cast("long")
    bm = F.try_divide(bm - (bm % (F.lit(8).cast("long") * s)), F.lit(8).cast("long") * s).cast("long")
    cm = F.lit(300000).cast("long") * F.least(F.lit(5).cast("long") * hits, F.lit(2).cast("long") * s)
    cm = F.try_divide(cm - (cm % (F.lit(2).cast("long") * s)), F.lit(2).cast("long") * s).cast("long")
    return (am + bm + cm).alias("quality_millionths")


def quality_score(text: str | Column) -> Column:
    """quality_millionths / 1e6 as DOUBLE (same integer → same double on
    every engine: one exact int division by 1,000,000)."""
    return (quality_millionths(text) / F.lit(1000000.0)).cast("double")


def lang_scores(text: str | Column) -> list[tuple[str, Column]]:
    """Per-language stopword hit-ratio columns."""
    t = tokens(text)
    n = F.greatest(F.size(t), F.lit(1))
    out = []
    for lang, words in LANG_PROFILES:
        sw = F.array(*[F.lit(s) for s in words])
        hits = F.size(F.filter(t, lambda w: F.array_contains(sw, w)))
        out.append((lang, (hits / n).cast("double")))
    return out


def lang_id(text: str | Column) -> Column:
    """argmax over LANG_PROFILES; ties break to the earlier profile.

    'und' (undetermined) when no profile scores > 0.
    """
    scores = lang_scores(text)
    # Forward walk with strict > : earlier profiles win ties.
    best_lang = F.lit("und")
    best_score = F.lit(0.0)
    for lang, s in scores:
        take = s > best_score
        best_lang = F.when(take, F.lit(lang)).otherwise(best_lang)
        best_score = F.when(take, s).otherwise(best_score)
    return best_lang


# BPE-ish pre-tokenization pattern (GPT-2 style, ASCII-conservative so any
# regex engine agrees): letter runs, digit runs, single punctuation marks.
BPE_PATTERN = r"[a-z]+|[0-9]+|[^a-z0-9\s]"


def bpe_token_count(text: str | Column) -> Column:
    """Sub-word-ish token count: whitespace splitting undercounts for BPE
    vocab budgeting; this counts letter runs / digit runs / punctuation
    separately (the GPT-2 pre-tokenizer shape, minus unicode classes)."""
    c = F.col(text) if isinstance(text, str) else text
    return F.size(F.regexp_extract_all(F.lower(c), F.lit(BPE_PATTERN), 0)).cast("long")


def rolling_hash64(text: str | Column, base: int = 31, mod: int = 1_000_000_007) -> Column:
    """Polynomial rolling hash of the normalized text: h = Σ c·B^i mod p.

    Left fold over character codes — the classic Rabin-Karp document
    fingerprint.  One expression, no UDF; `tests/test_pipeline.py` checks
    it against a pure-Python reference.  (The md5-based fingerprint64
    stays the cross-engine dedup key; the rolling form exists for
    windowed/streaming fingerprinting where incremental update matters.)
    """
    c = F.col(text) if isinstance(text, str) else text
    norm = F.regexp_replace(F.lower(F.trim(c)), r"\s+", " ")
    return F.aggregate(
        F.transform(F.split(norm, ""), lambda ch: F.ascii(ch)),
        F.lit(0).cast("long"),
        lambda acc, x: (acc * F.lit(base) + x) % F.lit(mod),
    )


def fingerprint64(text: str | Column) -> Column:
    """Deterministic 60-bit content fingerprint.

    md5 of the whitespace-normalized, lowercased text, first 15 hex digits
    as a BIGINT — portable to any engine with md5 (the DuckDB oracle uses
    the identical construction).  Collision odds at 2^60 are fine for
    dedup blocking; exact dedup still compares full text within a block.
    """
    c = F.col(text) if isinstance(text, str) else text
    norm = F.regexp_replace(F.lower(F.trim(c)), r"\s+", " ")
    return F.conv(F.substring(F.md5(norm), 1, 15), 16, 10).cast("long")
