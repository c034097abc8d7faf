"""Distributed BPE tokenizer training — the iterative merge-learning loop.

``text.bpe_pair_counts`` is ONE round of this (character-pair counting);
this module runs the full trainer: repeatedly find the corpus's most
frequent adjacent symbol pair and merge it, producing the ordered merge
table a tokenizer ships with (Sennrich '16's algorithm, the map-reduce
formulation).

The scalable shape (same discipline as the one-round operator): the
corpus is scanned ONCE into a word-frequency table (vocabulary-sized,
≪ corpus, map-side combined); every merge round then runs over the
vocabulary only — one pair-count aggregate (shuffle carries one row per
distinct pair) plus one column-wise merge rewrite.  The only driver
artifact per round is the single argmax pair (the k-means-centroid
bound).  At 100 TB the corpus cost is the one initial scan; 1000 merge
rounds touch just the vocab table.

Merge application uses the delimiter-string double-replace: a word's
symbol sequence lives as ``␟sym␟sym␟…␟`` (US, ``\\x1f``) and merging
pair (a, b) is ``replace(s, '␟a␟b␟', '␟ab␟')`` applied TWICE — a single
left-to-right non-overlapping pass misses every occurrence that starts
at the separator the previous match consumed (hit-miss-hit-…), and
since misses are never adjacent, a second pass catches exactly the
remainder.  For pairs (a, b) with a ≠ b this is exactly greedy
left-to-right BPE merging; inside a run of one repeated symbol
(pair (x, x) over "x x x x x…") it performs the same NUMBER of merges
(⌊run/2⌋ — occurrences only overlap when a = b) but may place them at
different positions than the strict fold — the corner where published
BPE implementations themselves disagree.  What the primitive buys is
that it is IDENTICAL in Spark and DuckDB, so the oracle matches by
construction (property-tested against a pure-Python reference of the
same double-pass semantics in tests/test_tokenizer.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from .checkpoint import cut_lineage
from .text import BPE_PATTERN

SEP = "\x1f"  # unit separator: outside every pre-token alphabet


def _word_symbols(docs: DataFrame, text_col: str) -> DataFrame:
    """(s, wc): delimiter-string of initial (character) symbols per
    distinct pre-token, weighted by corpus frequency."""
    return (
        docs.select(
            F.explode(
                F.regexp_extract_all(
                    F.lower(F.col(text_col)), F.lit(BPE_PATTERN), 0
                )
            ).alias("w")
        )
        .groupBy("w")
        .agg(F.count("*").alias("wc"))
        .select(
            F.concat(
                F.lit(SEP), F.regexp_replace("w", "(.)", "$1" + SEP)
            ).alias("s"),
            "wc",
        )
    )


def _train(docs: DataFrame, text_col: str, n_merges: int):
    """Shared training loop → (rules list, final merged vocab frame)."""
    vocab = _word_symbols(docs, text_col).transform(cut_lineage)
    rules = []
    for rnd in range(1, int(n_merges) + 1):
        pairs = (
            vocab.select(
                "wc",
                F.filter(
                    F.split("s", SEP), lambda x: x != F.lit("")
                ).alias("arr"),
            )
            .where(F.size("arr") >= 2)
            .select(
                "wc",
                F.explode(
                    F.expr(
                        "transform(sequence(1, size(arr) - 1),"
                        " i -> struct(element_at(arr, i) AS lhs,"
                        "             element_at(arr, i + 1) AS rhs))"
                    )
                ).alias("p"),
            )
        )
        top = (
            pairs.groupBy(
                F.col("p.lhs").alias("lhs"), F.col("p.rhs").alias("rhs")
            )
            .agg(F.sum("wc").cast("long").alias("n"))
            .orderBy(F.desc("n"), "lhs", "rhs")
            .limit(1)
            .collect()
        )
        if not top:
            break
        l, r, n = top[0]["lhs"], top[0]["rhs"], top[0]["n"]
        rules.append((rnd, l, r, l + r, n))
        pat, rep = F.lit(SEP + l + SEP + r + SEP), F.lit(SEP + l + r + SEP)
        vocab = vocab.select(
            F.replace(F.replace(F.col("s"), pat, rep), pat, rep).alias("s"),
            "wc",
        ).transform(cut_lineage)
    return rules, vocab


def bpe_train(
    docs: DataFrame, text_col: str, n_merges: int = 8
) -> DataFrame:
    """(merge_round, lhs, rhs, merged, n) — the first ``n_merges``
    learned BPE merge rules, in learning order.

    ``n`` is the pair's corpus frequency at the time it was chosen; ties
    break lexicographically on (lhs, rhs) so the merge table is
    deterministic across engines and partitionings.  Training stops
    early (fewer rows) when no adjacent pair remains.
    """
    rules, _ = _train(docs, text_col, int(n_merges))
    return docs.sparkSession.createDataFrame(
        rules,
        "merge_round long, lhs string, rhs string, merged string, n long",
    )


def bpe_token_frequencies(
    docs: DataFrame, text_col: str, n_merges: int = 8, top_n: int = 20
) -> DataFrame:
    """(token, n) — the corpus's subword-token frequency table after
    ENCODING with the ``n_merges`` learned rules: train, apply the merge
    table to the vocabulary, explode tokens weighted by word frequency,
    top ``top_n`` by count (token tie-break).

    This is the apply half of the tokenizer lifecycle — the table a
    sampling or packing stage consumes ("how long is this corpus in
    learned subwords") — and it never touches the corpus again: encoding
    happens on the vocabulary frame the trainer already holds.
    """
    _, vocab = _train(docs, text_col, int(n_merges))
    return (
        vocab.select(
            "wc",
            F.explode(
                F.filter(F.split("s", SEP), lambda x: x != F.lit(""))
            ).alias("token"),
        )
        .groupBy("token")
        .agg(F.sum("wc").cast("long").alias("n"))
        .orderBy(F.desc("n"), "token")
        .limit(int(top_n))
    )


def bpe_train_oracle_sql(table: str, n_merges: int = 8) -> str:
    """DuckDB mirror of :func:`bpe_train` — the same word table, pair
    argmax, and double-replace merge, one WITH layer per round.

    Every round CTE is MATERIALIZED: each ``s{k}`` is referenced three
    times (pair count, merge branch, early-stop branch), and DuckDB's
    default inlining re-evaluates the whole upstream chain per reference
    — O(3^rounds) recomputation, measured 348 s at sf0.01 for the
    6-round encode oracle vs ~3 s materialized."""
    sep = SEP
    parts = [
        f"""w0 AS MATERIALIZED (
  SELECT w, CAST(count(*) AS BIGINT) AS wc FROM (
    SELECT unnest(regexp_extract_all(lower(text), '{BPE_PATTERN}')) AS w
    FROM {table}) GROUP BY w
),
s0 AS MATERIALIZED (
  SELECT '{sep}' || regexp_replace(w, '(.)', '\\1{sep}', 'g') AS s, wc
  FROM w0
)"""
    ]
    for k in range(1, int(n_merges) + 1):
        prev = f"s{k - 1}"
        parts.append(
            f"""p{k} AS (
  SELECT z[1] AS l, z[2] AS r, CAST(sum(wc) AS BIGINT) AS n
  FROM (
    SELECT wc,
           unnest(list_zip(arr[1:len(arr) - 1], arr[2:len(arr)])) AS z
    FROM (
      SELECT wc,
             list_filter(string_split(s, '{sep}'), x -> x <> '') AS arr
      FROM {prev}) q
    WHERE len(arr) >= 2) zz
  GROUP BY 1, 2
),
t{k} AS MATERIALIZED (SELECT l, r, n FROM p{k} ORDER BY n DESC, l, r LIMIT 1),
s{k} AS MATERIALIZED (
  SELECT replace(replace(s, '{sep}' || l || '{sep}' || r || '{sep}',
                         '{sep}' || l || r || '{sep}'),
                 '{sep}' || l || '{sep}' || r || '{sep}',
                 '{sep}' || l || r || '{sep}') AS s, wc
  FROM {prev}, t{k}
  UNION ALL
  -- early stop: no pair left this round — carry the vocab unchanged
  -- (the Spark trainer breaks its loop at the same point)
  SELECT s, wc FROM {prev} WHERE NOT EXISTS (SELECT 1 FROM t{k})
)"""
        )
    if int(n_merges) == 0:
        # zero rounds: the merge table is empty but the SQL must parse —
        # mirror the Spark trainer, which returns an empty frame
        return (
            "WITH " + ",\n".join(parts)
            + "\nSELECT CAST(NULL AS BIGINT) AS merge_round,"
            " CAST(NULL AS VARCHAR) AS lhs, CAST(NULL AS VARCHAR) AS rhs,"
            " CAST(NULL AS VARCHAR) AS merged, CAST(NULL AS BIGINT) AS n"
            " FROM s0 WHERE FALSE"
        )
    selects = "\nUNION ALL ".join(
        f"SELECT CAST({k} AS BIGINT) AS merge_round, l AS lhs, r AS rhs,"
        f" l || r AS merged, n FROM t{k}"
        for k in range(1, int(n_merges) + 1)
    )
    return (
        "WITH " + ",\n".join(parts) + "\n" + selects + "\nORDER BY merge_round"
    )


def bpe_token_frequencies_oracle_sql(
    table: str, n_merges: int = 8, top_n: int = 20
) -> str:
    """DuckDB mirror of :func:`bpe_token_frequencies`: the same training
    WITH-chain, then token explosion of the final vocabulary."""
    sep = SEP
    train = bpe_train_oracle_sql(table, n_merges)
    with_block = train[: train.rindex("\nSELECT ")]
    return f"""{with_block}
SELECT token, CAST(sum(wc) AS BIGINT) AS n FROM (
  SELECT wc, unnest(list_filter(string_split(s, '{sep}'), x -> x <> ''))
         AS token
  FROM s{int(n_merges)})
GROUP BY token ORDER BY n DESC, token LIMIT {int(top_n)}
"""


def bpe_fertility(
    docs: DataFrame, text_col: str, lang_col: str, n_merges: int = 6
) -> DataFrame:
    """Per-language tokenizer fertility off the learned merge table:
    ``(lang, n_words, n_tokens, fertility_permille,
    bytes_per_token_permille)`` — tokens-per-word and bytes-per-token,
    THE standard tokenizer-equity diagnosis (languages the vocabulary
    underserves tokenize at higher fertility, inflating their training
    and serving cost per byte of content).

    Composition: train on the whole corpus, reconstruct each distinct
    word from its merged symbol string (``replace(s, SEP, '')``), join
    the per-(lang, word) frequency table against that encoded
    vocabulary, aggregate in exact integers.  The corpus is scanned
    twice (trainer's word table + per-lang frequencies); encoding itself
    never rescans it.
    """
    _, vocab = _train(docs, text_col, int(n_merges))
    enc = vocab.select(
        F.replace(F.col("s"), F.lit(SEP), F.lit("")).alias("w"),
        F.size(
            F.filter(F.split("s", SEP), lambda x: x != F.lit(""))
        ).alias("n_tok"),
    )
    lw = (
        docs.select(
            F.col(lang_col).alias("lang"),
            F.explode(
                F.regexp_extract_all(
                    F.lower(F.col(text_col)), F.lit(BPE_PATTERN), 0
                )
            ).alias("w"),
        )
        .groupBy("lang", "w")
        .agg(F.count("*").alias("wc"))
    )
    return (
        lw.join(enc, "w")
        .groupBy("lang")
        .agg(
            F.sum("wc").cast("long").alias("n_words"),
            F.sum(F.col("wc") * F.col("n_tok")).cast("long").alias("n_tokens"),
            F.sum(F.col("wc") * F.octet_length("w")).cast("long").alias("n_bytes"),
        )
        .select(
            "lang", "n_words", "n_tokens", "n_bytes",
            F.expr("(1000 * n_tokens) div n_words").alias("fertility_permille"),
            F.expr("(1000 * n_bytes) div n_tokens").alias(
                "bytes_per_token_permille"
            ),
        )
        .orderBy("lang")
    )


def bpe_fertility_oracle_sql(
    table: str, lang_col: str, n_merges: int = 6
) -> str:
    """DuckDB mirror of :func:`bpe_fertility` (reuses the materialized
    training chain)."""
    sep = SEP
    train = bpe_train_oracle_sql(table, n_merges)
    with_block = train[: train.rindex("\nSELECT ")]
    return f"""{with_block},
enc AS MATERIALIZED (
  SELECT replace(s, '{sep}', '') AS w,
         len(list_filter(string_split(s, '{sep}'), x -> x <> '')) AS n_tok
  FROM s{int(n_merges)}
),
lw AS (
  SELECT {lang_col} AS lang, w, CAST(count(*) AS BIGINT) AS wc FROM (
    SELECT {lang_col},
           unnest(regexp_extract_all(lower(text), '{BPE_PATTERN}')) AS w
    FROM {table}) GROUP BY 1, 2
)
SELECT lang, CAST(sum(wc) AS BIGINT) AS n_words,
       CAST(sum(wc * n_tok) AS BIGINT) AS n_tokens,
       CAST(sum(wc * octet_length(encode(w))) AS BIGINT) AS n_bytes,
       (1000 * CAST(sum(wc * n_tok) AS BIGINT)) // CAST(sum(wc) AS BIGINT)
         AS fertility_permille,
       (1000 * CAST(sum(wc * octet_length(encode(w))) AS BIGINT))
         // CAST(sum(wc * n_tok) AS BIGINT) AS bytes_per_token_permille
FROM lw JOIN enc USING (w) GROUP BY lang ORDER BY lang
"""
