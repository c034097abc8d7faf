"""BM25 ranked retrieval over the document corpus.

The reference's search surface returns membership (which documents match an
index predicate, egraph_index_model.erl); a training-data/analytics corpus
additionally needs *ranked* retrieval — "the k most relevant documents for
these terms" — for eval-set curation, nearest-neighbor text lookup, and
relevance-weighted sampling.  This is Okapi BM25 expressed as three hash
aggregates, no UDFs:

1. per-document length (narrow, from the token array);
2. term frequencies: explode tokens, filter to the query terms *before*
   the shuffle (the posting list is |terms|-bounded, not corpus-bounded);
3. document frequencies per term: |terms| rows, broadcast back.

Scale: the exploded token stream is filtered to the query vocabulary
inside the scan stage, so shuffle volume is (matched term, doc) pairs —
the size of the posting lists, exactly what an inverted index would read.
The df/N/avgdl side inputs are tiny scalar aggregates, broadcast.
Top-k is a TakeOrdered, never a global sort.

Determinism: tf / df / doclen are exact integers; idf and the saturation
term are IEEE-double expressions evaluated in an identical algebraic shape
on both engines (one `ln`, correctly-rounded * and /), and the score is
rounded to 6 dp with doc_id as the final tie-break — the same recipe the
vector-math gates use.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F, types as T

from .text import tokens

K1 = 1.2
B = 0.75


def bm25_topk(
    docs: DataFrame,
    id_col: str,
    text_col: str,
    terms: list[str],
    k: int = 15,
) -> DataFrame:
    """Top-k documents by BM25 score for a bag of query ``terms``.

    Uses the Lucene idf form ``ln(1 + (N - df + 0.5)/(df + 0.5))`` (always
    positive, so common terms demote rather than flip sign).  Returns
    ``(id_col, score, n_terms_hit)`` ordered by score desc, id asc.
    """
    if not terms:
        raise ValueError("terms must be non-empty")
    tl = [t.lower() for t in terms]

    base = docs.select(
        F.col(id_col).alias("__id"),
        tokens(F.lower(F.col(text_col))).alias("__toks"),
    ).withColumn("__dl", F.size("__toks").cast("long"))

    corpus = base.agg(
        F.count("*").alias("__n_docs"),
        F.sum("__dl").alias("__total_tokens"),
    )

    tf = (
        base.select("__id", "__dl", F.explode("__toks").alias("__term"))
        .where(F.col("__term").isin(tl))
        .groupBy("__id", "__dl", "__term")
        .agg(F.count("*").alias("__tf"))
    )
    df_ = tf.groupBy("__term").agg(F.countDistinct("__id").alias("__df"))

    # identical algebraic shape in the DuckDB oracle (bm25_oracle_sql):
    # every * and / is IEEE-correctly-rounded, ln is the one libm call
    idf = F.expr("ln(1 + (__n_docs - __df + 0.5) / (__df + 0.5))")
    avgdl = F.expr("__total_tokens / __n_docs")
    sat = F.expr(f"(__tf * {K1 + 1.0}) / (__tf + {K1} * (1 - {B} + {B} * __dl / (__total_tokens / __n_docs)))")
    _ = avgdl  # documented inline in `sat` to keep one expression shape

    return (
        tf.join(F.broadcast(df_), "__term")
        .join(F.broadcast(corpus))
        .withColumn("__s", idf * sat)
        .groupBy(F.col("__id").alias(id_col))
        .agg(
            F.round(F.sum("__s"), 6).alias("score"),
            F.count("*").alias("n_terms_hit"),
        )
        .orderBy(F.desc("score"), id_col)
        .limit(k)
    )


def bm25_oracle_sql(
    table: str, id_col: str, text_col: str, terms: list[str], k: int = 15
) -> str:
    """DuckDB oracle with the identical expression shape."""
    tl = ", ".join(f"'{t.lower()}'" for t in terms)
    return f"""
WITH base AS (
  SELECT {id_col} AS id,
         list_filter(string_split_regex(lower({text_col}), '\\s+'), t -> t <> '') AS toks
  FROM {table}
), lens AS (
  SELECT id, CAST(len(toks) AS BIGINT) AS dl, toks FROM base
), corpus AS (
  SELECT count(*) AS n_docs, sum(dl) AS total_tokens FROM lens
), tf AS (
  SELECT id, dl, term, count(*) AS tf
  FROM (SELECT id, dl, unnest(toks) AS term FROM lens)
  WHERE term IN ({tl})
  GROUP BY id, dl, term
), dfreq AS (
  SELECT term, count(DISTINCT id) AS df FROM tf GROUP BY term
)
SELECT id AS {id_col},
       round(sum(
         ln(1 + (n_docs - df + 0.5) / (df + 0.5))
         * (tf * {K1 + 1.0}) / (tf + {K1} * (1 - {B} + {B} * dl / (total_tokens / n_docs)))
       ), 6) AS score,
       count(*) AS n_terms_hit
FROM tf JOIN dfreq USING (term), corpus
GROUP BY id
ORDER BY score DESC, id LIMIT {k}
"""


# --------------------------------------------------------------------------
# Reciprocal-rank fusion — hybrid lexical + semantic retrieval
# --------------------------------------------------------------------------

RRF_C = 60          # the standard RRF constant (Cormack et al. 2009)
RRF_SCALE = 10**12  # integer fixed-point: score_i = SCALE div (C + rank_i)


def with_rank(ranked: DataFrame, id_col: str, *order_cols) -> DataFrame:
    """(id, rnk) from an already-top-k result under a total order.

    The input is k rows (a top-k), so the single-partition window is a
    k-row sort on one core — never a corpus-wide exchange.
    """
    from pyspark.sql import Window

    w = Window.orderBy(*order_cols)
    return ranked.select(
        F.col(id_col).alias("id"), F.row_number().over(w).alias("rnk")
    )


def rrf_fuse(rankings: list[DataFrame], k: int = 15) -> DataFrame:
    """Fuse (id, rnk) lists by reciprocal-rank: Σ SCALE div (C + rnk).

    Integer division makes the fused score bit-identical across engines
    (1/(60+r) never terminates in binary; SCALE div (60+r) is exact).
    Returns (id, rrf_scaled, n_lists) ordered by score desc, id asc.

    Scale: each input is a top-k (tiny); the union + groupBy runs on k·m
    rows.  The expensive parts — BM25 posting lists, ANN probes — stay in
    their own operators; fusion itself is O(k·m).
    """
    u = None
    for r in rankings:
        u = r if u is None else u.unionByName(r)
    return (
        u.select(
            "id",
            F.expr(f"cast({RRF_SCALE} div ({RRF_C} + rnk) as bigint)").alias("part"),
        )
        .groupBy("id")
        .agg(F.sum("part").alias("rrf_scaled"), F.count("*").alias("n_lists"))
        .orderBy(F.desc("rrf_scaled"), "id")
        .limit(k)
    )


def tfidf_keywords(
    docs: DataFrame,
    id_col: str,
    text_col: str,
    top_n: int = 3,
) -> DataFrame:
    """Per-document top-N keywords by TF-IDF: (id, term, score, kw_rank).

    The keyword-extraction / auto-labeling primitive.  idf uses the same
    Lucene form as `bm25_topk` — the one `ln` call both engines evaluate
    identically (proven by the BM25 gate) — and the score rounds to 6 dp
    with the term string as the final tie-break.

    Scale: explode → groupBy(id, term) with map-side combine; the df table
    shuffles once on term and joins back (at corpus scale the df side is
    the heavy one — it stays distributed, never collected); top-N per doc
    is a WindowGroupLimit (partial top-N below the exchange).
    """
    base = docs.select(
        F.col(id_col).alias("id"),
        F.explode(tokens(F.lower(F.col(text_col)))).alias("term"),
    )
    tf = base.groupBy("id", "term").agg(F.count("*").alias("tf"))
    n_docs = docs.select(F.count("*").alias("n_docs"))
    df_ = tf.groupBy("term").agg(F.count("*").alias("df"))
    idf = F.expr("ln(1 + (n_docs - df + 0.5) / (df + 0.5))")
    scored = (
        tf.join(df_, "term")
        .crossJoin(F.broadcast(n_docs))
        .withColumn("score", F.round(F.col("tf") * idf, 6))
    )
    from pyspark.sql import Window as W

    w = W.partitionBy("id").orderBy(F.desc("score"), F.col("term"))
    return (
        scored.withColumn("kw_rank", F.row_number().over(w).cast("long"))
        .where(F.col("kw_rank") <= top_n)
        .select("id", "term", "score", "kw_rank")
    )


def tfidf_oracle_sql(table: str, id_col: str, text_col: str, top_n: int = 3) -> str:
    """DuckDB mirror of :func:`tfidf_keywords`."""
    return f"""
WITH base AS (
  SELECT {id_col} AS id, unnest(list_filter(string_split_regex(lower({text_col}), '\\s+'), t -> t <> '')) AS term
  FROM {table}
),
tf AS (SELECT id, term, count(*) AS tf FROM base GROUP BY id, term),
n AS (SELECT count(*) AS n_docs FROM {table}),
dfq AS (SELECT term, count(*) AS df FROM tf GROUP BY term),
scored AS (
  SELECT id, term,
         round(tf * ln(1 + (n_docs - df + 0.5) / (df + 0.5)), 6) AS score
  FROM tf JOIN dfq USING (term), n
),
ranked AS (
  SELECT *, CAST(row_number() OVER (PARTITION BY id ORDER BY score DESC, term)
                 AS BIGINT) AS kw_rank
  FROM scored
)
SELECT id, term, score, kw_rank FROM ranked WHERE kw_rank <= {top_n}
"""


# Quantization for sparse TF-IDF weights: floor(tf·idf·1e4).  Integer
# weights make every downstream sum (dot products, squared norms)
# order-independent and engine-exact — a double dot product over an
# unordered term set would differ in the last ULP between engines and
# flip 6dp rounding.  1e4 keeps the worst-case Σ(w²) far inside int64:
# w ≤ tf·idf·1e4 ≈ 2e7 even on pathological repeated-token docs, so a
# 1e3-term doc's norm is ≤ 4e17 < 2^63.
TFIDF_Q = 10_000


def tfidf_sim_pairs(
    docs: DataFrame,
    id_col: str,
    text_col: str,
    threshold: float,
    max_df: int,
) -> DataFrame:
    """Sparse TF-IDF cosine document pairs via an inverted-index self-join.

    The lexical near-dup / related-document finder for text that has no
    embeddings: documents sharing weighted vocabulary score cosine over
    their tf-idf vectors.  The naive form is an n² comparison; the
    inverted-index form joins documents ONLY through shared terms, and
    terms with df > ``max_df`` are pruned first — the classic stop-term
    cut that bounds every posting list, so candidate work is
    Σ_kept df² ≤ max_df · Σ df (linear in the corpus for a fixed cap;
    high-df terms carry near-zero idf weight, so the cut costs almost no
    signal).  The same guard discipline as the LSH bucket cap.

    Arithmetic: weights are integer-quantized (see ``TFIDF_Q``); the pair
    dot product and both norms are integer sums, the single
    sqrt/divide/round per surviving pair is engine-exact.  Zero-norm
    documents (every kept weight quantized to 0) get cosine 0.0 by the
    same convention as ``similarity.cosine``.

    Shuffles: tf groupBy (doc, term) with map-side combine; df groupBy
    term; the self-join shuffles posting lists by term (bounded by
    max_df); the pair aggregation shuffles (id_a, id_b) partial sums.
    Output: (id_a, id_b, cosine) with cosine ≥ threshold, 6 dp.
    """
    from .checkpoint import cut_lineage

    base = docs.select(
        F.col(id_col).alias("id"),
        F.explode(tokens(F.lower(F.col(text_col)))).alias("term"),
    )
    # cut_lineage at each multiply-referenced derived table: tf feeds the
    # df aggregate AND the index join; index feeds norms AND both join
    # sides; norms feeds na AND nb.  Without the cuts every reference
    # re-derives from the raw corpus (measured 12 source scans in the
    # physical plan — 12 corpus passes at 100 TB).  Materializing the
    # posting list IS the inverted-index build; each later stage then
    # reads it once.
    tf = (
        base.groupBy("id", "term")
        .agg(F.count("*").alias("tf"))
        .transform(cut_lineage)
    )
    n_docs = docs.select(F.count("*").alias("n_docs"))
    df_ = (
        tf.groupBy("term")
        .agg(F.count("*").alias("df"))
        .where(F.col("df") <= max_df)
    )
    idf = F.expr("ln(1 + (n_docs - df + 0.5) / (df + 0.5))")
    index = (
        tf.join(df_, "term")
        .crossJoin(F.broadcast(n_docs))
        .select(
            "term",
            "id",
            F.floor(F.col("tf") * idf * F.lit(TFIDF_Q)).cast("long").alias("wq"),
        )
        .transform(cut_lineage)
    )
    norms = (
        index.groupBy("id")
        .agg(F.sum(F.col("wq") * F.col("wq")).alias("nq"))
        .transform(cut_lineage)
    )
    a = index.select(F.col("term"), F.col("id").alias("id_a"), F.col("wq").alias("wa"))
    b = index.select(F.col("term"), F.col("id").alias("id_b"), F.col("wq").alias("wb"))
    dots = (
        a.join(b, "term")
        .where(F.col("id_a") < F.col("id_b"))
        .groupBy("id_a", "id_b")
        .agg(F.sum(F.col("wa") * F.col("wb")).alias("dot_q"))
    )
    na = norms.select(F.col("id").alias("id_a"), F.col("nq").alias("na"))
    nb = norms.select(F.col("id").alias("id_b"), F.col("nq").alias("nb"))
    den = F.sqrt(F.col("na").cast("double")) * F.sqrt(F.col("nb").cast("double"))
    cosine = F.round(
        F.when(den == F.lit(0.0), F.lit(0.0)).otherwise(
            F.col("dot_q").cast("double") / den
        ),
        6,
    )
    return (
        dots.join(na, "id_a")
        .join(nb, "id_b")
        .select("id_a", "id_b", cosine.alias("cosine"))
        .where(F.col("cosine") >= F.lit(threshold))
        .orderBy("id_a", "id_b")
    )


def tfidf_sim_oracle_sql(
    table: str, id_col: str, text_col: str, threshold: float, max_df_expr: str
) -> str:
    """DuckDB mirror of :func:`tfidf_sim_pairs` (same quantized integers)."""
    return f"""
WITH base AS (
  SELECT {id_col} AS id,
         unnest(list_filter(string_split_regex(lower({text_col}), '\\s+'),
                t -> t <> '')) AS term
  FROM {table}
),
tf AS (SELECT id, term, count(*) AS tf FROM base GROUP BY id, term),
n AS (SELECT count(*) AS n_docs FROM {table}),
dfq AS (
  SELECT term, count(*) AS df FROM tf GROUP BY term
  HAVING count(*) <= ({max_df_expr})
),
idx AS (
  SELECT term, id,
         CAST(floor(tf * ln(1 + (n_docs - df + 0.5) / (df + 0.5)) * {TFIDF_Q})
              AS BIGINT) AS wq
  FROM tf JOIN dfq USING (term), n
),
norms AS (SELECT id, sum(wq * wq) AS nq FROM idx GROUP BY id),
dots AS (
  SELECT a.id AS id_a, b.id AS id_b, sum(a.wq * b.wq) AS dot_q
  FROM idx a JOIN idx b ON a.term = b.term AND a.id < b.id
  GROUP BY a.id, b.id
)
SELECT id_a, id_b, cosine FROM (
  SELECT id_a, id_b,
         round(CASE WHEN sqrt(CAST(na.nq AS DOUBLE)) * sqrt(CAST(nb.nq AS DOUBLE)) = 0
                    THEN 0.0
                    ELSE CAST(dot_q AS DOUBLE)
                         / (sqrt(CAST(na.nq AS DOUBLE)) * sqrt(CAST(nb.nq AS DOUBLE)))
               END, 6) AS cosine
  FROM dots
  JOIN norms na ON dots.id_a = na.id
  JOIN norms nb ON dots.id_b = nb.id
)
WHERE cosine >= {threshold}
ORDER BY id_a, id_b
"""


def mmr_rerank(
    emb: DataFrame,
    id_col: str,
    vec_col: str,
    query_vec: list[float],
    n_candidates: int = 20,
    k: int = 8,
) -> DataFrame:
    """Maximal Marginal Relevance re-ranking (Carbonell & Goldstein '98):
    the second-stage RAG step after retrieval — greedily pick the result
    that maximizes λ·relevance − (1−λ)·max-similarity-to-already-picked,
    so the context window holds k DIVERSE passages instead of k copies of
    the same one.  λ = 0.7, folded into exact integers: every cosine is
    quantized to micro-units (floor(c·1e6 + 0.5)) and the objective is
    7·rel − 3·maxsim — argmax ties break on ascending id, so the greedy
    trace is engine-exact.

    Distributed shape: stage 1 is the brute-force/ANN top-``n_candidates``
    retrieval (TakeOrderedAndProject over the full corpus — the scalable
    part); the greedy itself is inherently sequential in k but runs over
    a BOUNDED candidate set (n_candidates rows), so it executes as ONE
    applyInPandas group on an executor — no driver collect, no iteration
    over unbounded data.  Similarities inside the group are computed as
    sequential left-fold sums (the same fold order as Spark's
    F.aggregate and DuckDB's list_sum), keeping the micro quantization
    bit-identical to the SQL oracle.

    Output: (rank, id, rel_micro) for the k picks, rank ascending.
    """
    import math

    import pandas as pd

    from .similarity import _as_double, cosine

    q = F.array(*[F.lit(float(x)) for x in query_vec]).cast("array<double>")
    rel = F.round(cosine(_as_double(vec_col), q), 6)
    cand = (
        emb.select(
            F.col(id_col).alias("id"),
            _as_double(vec_col).alias("vec"),
            rel.alias("rel6"),
        )
        .orderBy(F.col("rel6").desc(), F.col("id"))
        .limit(int(n_candidates))
        .withColumn(
            "rel_micro",
            F.expr("cast(floor(rel6 * 1000000 + 0.5) as bigint)"),
        )
    )

    kk = int(k)

    def _greedy(pdf: pd.DataFrame) -> pd.DataFrame:
        ids = pdf["id"].tolist()
        rels = dict(zip(pdf["id"], pdf["rel_micro"]))
        vecs = {i: list(map(float, v)) for i, v in zip(pdf["id"], pdf["vec"])}

        def cos_micro(a, b):
            dot = 0.0
            na = 0.0
            nb = 0.0
            for x, y in zip(vecs[a], vecs[b]):
                dot += x * y
            for x in vecs[a]:
                na += x * x
            for y in vecs[b]:
                nb += y * y
            na, nb = math.sqrt(na), math.sqrt(nb)
            c = 0.0 if na * nb == 0.0 else dot / (na * nb)
            return math.floor(c * 1000000.0 + 0.5)

        sims = {
            (a, b): cos_micro(a, b) for a in ids for b in ids if a != b
        }
        chosen: list = []  # id values, whatever type id_col carries
        out = []
        for rnk in range(1, min(kk, len(ids)) + 1):
            best = None
            for i in ids:
                if i in chosen:
                    continue
                if not chosen:
                    score = 7 * int(rels[i])
                else:
                    score = 7 * int(rels[i]) - 3 * max(
                        sims[(i, c)] for c in chosen
                    )
                # argmax with ascending-id tiebreak
                if best is None or score > best[0] or (
                    score == best[0] and i < best[1]
                ):
                    best = (score, i)
            chosen.append(best[1])
            out.append((rnk, best[1], int(rels[best[1]])))
        return pd.DataFrame(out, columns=["rank", "id", "rel_micro"])

    # output schema derives the id field's type from the input so a
    # string/decimal id_col round-trips instead of being silently coerced
    # to long by a hardcoded schema
    id_type = emb.schema[id_col].dataType
    out_schema = T.StructType(
        [
            T.StructField("rank", T.LongType()),
            T.StructField("id", id_type),
            T.StructField("rel_micro", T.LongType()),
        ]
    )
    return (
        cand.groupBy(F.lit(1).alias("g"))
        .applyInPandas(_greedy, out_schema)
        .orderBy("rank")
    )


def _log2_literals(k: int) -> list[float]:
    """log2(i+1) for ranks i = 1..k as Python doubles.  Injected as
    LITERALS into both engines' expressions (repr round-trips the exact
    double), so neither engine's log2 implementation is on the parity
    path — the one historical source of last-ulp drift."""
    import math

    return [math.log2(i + 1) for i in range(1, k + 1)]


def ndcg_at_k(
    ranked: DataFrame,
    group_col: str,
    rank_col: str,
    rel_col: str,
    k: int = 10,
) -> DataFrame:
    """NDCG@k — the standard graded-relevance retrieval metric
    (Järvelin & Kekäläinen '02), the eval readout for every ranked
    retriever in this family (BM25, cosine/IVF/PQ top-k, RRF, MMR):

        DCG@k  = Σ_{i=1..k} (2^rel_i − 1) / log2(i + 1)
        NDCG@k = DCG@k / IDCG@k     (IDCG = DCG of the rel-sorted ideal)

    Determinism: each term is a pure function of (rel, i) — gain
    2^rel − 1 is an exact integer (shiftleft), log2(i+1) is a PRECOMPUTED
    double literal shared verbatim with the SQL oracle, and every term is
    quantized floor(x·10⁶ + 0.5) BEFORE the integer sum, so no
    float-accumulation order exists.  ndcg_micro = dcg·10⁶ div idcg
    (NULL when every gain is zero — honest, not a fabricated 0).

    Input: one row per (group, rank) with an integer relevance grade;
    rows with rank > k are ignored.  The ideal ordering re-ranks the SAME
    top-k items by (rel desc, rank asc) — NDCG's standard local-ideal
    form for judging a fixed result list.

    Output per group: ``(group, k, dcg_micro, idcg_micro, ndcg_micro)``.

    Scale: one filter + two windowed passes over k-bounded rows per
    group (k rows per group, never corpus-sized) and a map-side-combined
    sum — group-parallel at any scale.
    """
    from pyspark.sql import Window

    logs = _log2_literals(k)
    g = F.col(group_col).alias("grp")
    base = ranked.select(
        g,
        F.col(rank_col).cast("long").alias("rank"),
        F.col(rel_col).cast("long").alias("rel"),
    ).where(F.col("rank") <= k)

    def term(rank_expr: str) -> F.Column:
        c = F.lit(None).cast("long")
        for i, L in enumerate(logs, start=1):
            c = F.when(
                F.expr(rank_expr) == i,
                F.expr(
                    f"cast(floor((cast(shiftleft(1, cast(rel as int)) - 1"
                    f" as double)) * 1000000.0 / {L!r} + 0.5) as bigint)"
                ),
            ).otherwise(c)
        return c

    ideal_w = Window.partitionBy("grp").orderBy(
        F.col("rel").desc(), F.col("rank").asc()
    )
    scored = base.withColumn("irank", F.row_number().over(ideal_w)).select(
        "grp",
        term("rank").alias("term_micro"),
        term("irank").alias("iterm_micro"),
    )
    return (
        scored.groupBy("grp")
        .agg(
            F.sum("term_micro").cast("long").alias("dcg_micro"),
            F.sum("iterm_micro").cast("long").alias("idcg_micro"),
        )
        .select(
            "grp",
            F.lit(k).cast("long").alias("k"),
            "dcg_micro",
            "idcg_micro",
            F.expr(
                "case when idcg_micro = 0 then null"
                " else cast((cast(dcg_micro as decimal(38,0)) * 1000000)"
                " div idcg_micro as bigint) end"
            ).alias("ndcg_micro"),
        )
        .orderBy("grp")
    )


def weighted_fusion(
    rankings: list[tuple[DataFrame, int]],
    k: int = 15,
    mnz: bool = True,
) -> DataFrame:
    """Fuse (id, score_micro) top lists by WEIGHTED NORMALIZED SCORE —
    CombSUM/CombMNZ (Fox & Shaw, TREC-2; Shaw & Fox '94), the score-based
    complement to :func:`rrf_fuse`'s rank-based fusion: RRF discards score
    magnitudes (a 10× BM25 gap and a 1.001× gap fuse identically); Comb*
    keeps them, which is what a BM25+vector hybrid wants when one
    retriever is confidently right.

    Each input is ``(df, weight_milli)`` where df has (id, score_micro)
    integer scores.  Per list, scores are min-max normalized to
    [0, 10⁶] in integer arithmetic — norm = ((s − min)·10⁶) div
    (max − min), a constant list (max == min) normalizing to 10⁶ — then
    fused = Σ weight_milli · norm, and with ``mnz`` the sum is multiplied
    by the number of lists the id appears in (CombMNZ's hit-count boost,
    the TREC-proven default).  All integer: bit-identical across engines.

    Output: (id, fused_scaled, n_lists) ordered desc / id asc, limit k.

    Scale: inputs are top-k lists (k·m rows total); each min/max is a
    1-row broadcast aggregate attached by crossJoin (the scalar-attach
    pattern — no shuffle of the list itself); the fuse is one tiny
    groupBy.  The corpus-sized work lives in the upstream retrievers.
    """
    from .checkpoint import cut_lineage

    if not rankings:
        raise ValueError("weighted_fusion: rankings must be non-empty")
    parts = None
    for df, w in rankings:
        # cut_lineage: each top list is referenced twice (its min/max
        # aggregate + the normalize projection) — without the cut the
        # upstream retriever (BM25 posting scan, cosine scan) runs twice;
        # materializing a k-row list is free
        df = cut_lineage(df.select("id", "score_micro"))
        mm = df.agg(
            F.min("score_micro").alias("_mn"), F.max("score_micro").alias("_mx")
        )
        norm = df.crossJoin(F.broadcast(mm)).select(
            "id",
            F.expr(
                "cast(case when _mx = _mn then 1000000 else"
                " ((score_micro - _mn) * 1000000) div (_mx - _mn) end"
                " as bigint)"
            ).alias("norm"),
        ).select(
            "id", (F.col("norm") * F.lit(int(w))).alias("part")
        )
        parts = norm if parts is None else parts.unionByName(norm)
    fused = parts.groupBy("id").agg(
        F.sum("part").alias("wsum"), F.count("*").cast("long").alias("n_lists")
    )
    score = (
        (F.col("wsum") * F.col("n_lists")) if mnz else F.col("wsum")
    ).alias("fused_scaled")
    return (
        fused.select("id", score, "n_lists")
        .orderBy(F.desc("fused_scaled"), "id")
        .limit(k)
    )


def calibrate_isotonic(
    df: DataFrame,
    score_col: str,
    label_col: str,
    n_bins: int = 20,
) -> DataFrame:
    """Isotonic (monotone non-decreasing) calibration of a score against
    a non-negative outcome — the standard post-hoc calibrator for
    retrieval/quality/classifier scores (Zadrozny & Elkan KDD'02; what
    sklearn's IsotonicRegression fits), here as an exact integer plan.

    Scores are binned into ``n_bins`` equal-width integer bins (bounds
    from one broadcast min/max aggregate); per occupied bin the empirical
    rate is sum(label)/count.  The isotonic fit uses the min-max identity
    (Robertson-Wright-Dykstra '88 §1.2, the closed form PAVA converges
    to):

        fit_b = max_{i ≤ b} min_{j ≥ b} avg(bin i..j)

    with every candidate average floor-quantized to micro BEFORE the
    min/max (floor is monotone, so the fitted sequence stays
    non-decreasing and both engines agree bit-for-bit).

    Labels must be non-negative (0/1 for probability calibration);
    NULL scores/labels are excluded.

    Output per occupied bin: ``(bin, n, pos, rate_micro, fit_micro)``
    ordered by bin; fit_micro is non-decreasing in bin.

    Scale: ONE full-data pass (the binned aggregate, map-side combined,
    ≤ n_bins rows out) + min/max scalar attach; everything after —
    prefix sums, the (i, j) average table, the min-max reduction — runs
    on ≤ n_bins·(n_bins+1)/2 rows (n_bins ≤ 64 enforced), a broadcast-
    sized lattice regardless of corpus size.
    """
    from pyspark.sql import Window

    if not 2 <= n_bins <= 64:
        raise ValueError(
            f"calibrate_isotonic: n_bins={n_bins} outside [2, 64] — the "
            "min-max lattice is O(n_bins³); bin the score coarser"
        )
    base = df.select(
        F.col(score_col).cast("long").alias("s"),
        F.col(label_col).cast("long").alias("y"),
    ).where(
        F.col("s").isNotNull() & F.col("y").isNotNull() & (F.col("y") >= 0)
    )
    mm = base.agg(F.min("s").alias("_lo"), F.max("s").alias("_hi"))
    binned = base.crossJoin(F.broadcast(mm)).select(
        F.expr(
            f"cast(least({n_bins - 1},"
            f" ((s - _lo) * {n_bins}) div (_hi - _lo + 1)) as bigint)"
        ).alias("bin"),
        "y",
    )
    from .checkpoint import cut_lineage

    # cut_lineage: the ≤ n_bins-row bin table feeds SEVEN downstream
    # frames (prefix sums, i, j, the (i,j) lattice, the min-max
    # reduction, and the final join) — without the cut Spark re-derives
    # the corpus-sized aggregate for each reference (measured: 8 logical
    # scans of the source in the physical plan); materializing ≤ 64
    # rows is free
    bins = binned.groupBy("bin").agg(
        F.count("*").cast("long").alias("n"),
        F.sum("y").cast("long").alias("pos"),
    ).transform(cut_lineage)
    # prefix sums over the ≤ n_bins aggregated rows — bounded-domain
    # window (the gini/ccnet precedent), never over raw data
    w = Window.orderBy("bin").rowsBetween(Window.unboundedPreceding, 0)
    pre = bins.select(
        "bin",
        "n",
        "pos",
        F.sum("n").over(w).alias("cn"),
        F.sum("pos").over(w).alias("cs"),
    )
    i = pre.select(
        F.col("bin").alias("i"),
        (F.col("cn") - F.col("n")).alias("cn0"),
        (F.col("cs") - F.col("pos")).alias("cs0"),
    )
    j = pre.select(
        F.col("bin").alias("j"), F.col("cn").alias("cnj"), F.col("cs").alias("csj")
    )
    avg_ij = (
        i.join(j, F.col("i") <= F.col("j"))
        .select(
            "i",
            "j",
            F.expr("((csj - cs0) * 1000000) div (cnj - cn0)").alias("q"),
        )
    )
    b = pre.select(F.col("bin").alias("b"))
    fit = (
        avg_ij.join(b, (F.col("i") <= F.col("b")) & (F.col("j") >= F.col("b")))
        .groupBy("b", "i")
        .agg(F.min("q").alias("m"))
        .groupBy("b")
        .agg(F.max("m").alias("fit_micro"))
    )
    return (
        bins.join(fit, bins.bin == fit.b)
        .select(
            "bin",
            "n",
            "pos",
            F.expr("(pos * 1000000) div n").alias("rate_micro"),
            F.col("fit_micro").cast("long").alias("fit_micro"),
        )
        .orderBy("bin")
    )


def feature_rerank(
    lex: DataFrame,
    sem: DataFrame,
    weights_milli: tuple[int, int, int, int, int] = (500, 300, 100, 100, 200),
    k: int = 15,
) -> DataFrame:
    """CROSS-ENCODER-STYLE feature rerank over the union of two retriever
    top lists — the third rung of the retrieval ladder after rank fusion
    (:func:`rrf_fuse`) and score fusion (:func:`weighted_fusion`):
    assemble an explicit per-candidate FEATURE VECTOR and score it with a
    model.  Production rerankers (Nogueira & Cho '19 monoBERT and every
    learning-to-rank stack before them) swap the scorer; the Spark-side
    contribution — candidate union, per-list normalization, missing-list
    imputation, feature assembly — is this operator, and the scorer here
    is a fixed INTEGER linear model so the gate is engine-reproducible
    (a deployment replaces the one ``score_scaled`` expression with a
    model UDF over the same feature columns).

    Inputs: two top lists ``(id, score_micro)`` (lexical, semantic).
    Features per candidate id (FULL OUTER join of the lists — a
    candidate found by one retriever still reranks, with the other
    list's features imputed to 0):

      f_lex_norm, f_sem_norm   min-max normalized scores in [0, 10⁶]
                               (constant list → 10⁶, the weighted_fusion
                               convention); 0 when absent
      f_lex_rrf,  f_sem_rrf    10⁶ div (60 + rank) reciprocal-rank
                               features (rank over (score_micro desc,
                               id) — integer-deterministic); 0 absent
      n_lists                  1 or 2 (the CombMNZ evidence count)

    score_scaled = w₀·f_lex_norm + w₁·f_sem_norm + w₂·f_lex_rrf
                 + w₃·f_sem_rrf + w₄·1000·n_lists  (weights in milli).

    Output: (id, f_lex_norm, f_sem_norm, f_lex_rrf, f_sem_rrf, n_lists,
    score_scaled) ordered desc/id asc, limit k — feature columns kept in
    the output so reranks are AUDITABLE (which signal won).

    Scale: inputs are top-k lists; min/max are 1-row broadcast
    aggregates (scalar-attach), the rank windows sort k rows on one core
    (the with_rank shape), the outer join is k-vs-k.  Corpus-sized work
    lives in the upstream retrievers.
    """
    from pyspark.sql import Window

    from .checkpoint import cut_lineage

    if len(weights_milli) != 5:
        raise ValueError(
            f"feature_rerank: need 5 weights, got {len(weights_milli)}"
        )

    def featurize(df: DataFrame, prefix: str) -> DataFrame:
        # each list is referenced by its min/max aggregate, the rank
        # window and the join — cut so the retriever runs once
        df = cut_lineage(df.select("id", "score_micro"))
        mm = df.agg(
            F.min("score_micro").alias("_mn"),
            F.max("score_micro").alias("_mx"),
        )
        w = Window.orderBy(F.desc("score_micro"), "id")
        return (
            df.withColumn("_rnk", F.row_number().over(w))
            .crossJoin(F.broadcast(mm))
            .select(
                "id",
                F.expr(
                    "cast(case when _mx = _mn then 1000000 else"
                    " ((score_micro - _mn) * 1000000) div (_mx - _mn) end"
                    " as bigint)"
                ).alias(f"f_{prefix}_norm"),
                F.expr("cast(1000000 div (60 + _rnk) as bigint)").alias(
                    f"f_{prefix}_rrf"
                ),
            )
        )

    lf, sf_ = featurize(lex, "lex"), featurize(sem, "sem")
    j = lf.join(sf_, "id", "full_outer")
    w0, w1, w2, w3, w4 = (int(w) for w in weights_milli)
    feats = j.select(
        "id",
        F.coalesce("f_lex_norm", F.lit(0)).alias("f_lex_norm"),
        F.coalesce("f_sem_norm", F.lit(0)).alias("f_sem_norm"),
        F.coalesce("f_lex_rrf", F.lit(0)).alias("f_lex_rrf"),
        F.coalesce("f_sem_rrf", F.lit(0)).alias("f_sem_rrf"),
        (
            F.when(F.col("f_lex_norm").isNotNull(), 1).otherwise(0)
            + F.when(F.col("f_sem_norm").isNotNull(), 1).otherwise(0)
        )
        .cast("long")
        .alias("n_lists"),
    )
    return (
        feats.withColumn(
            "score_scaled",
            F.expr(
                f"{w0} * f_lex_norm + {w1} * f_sem_norm"
                f" + {w2} * f_lex_rrf + {w3} * f_sem_rrf"
                f" + {w4} * 1000 * n_lists"
            ).cast("long"),
        )
        .orderBy(F.desc("score_scaled"), "id")
        .limit(k)
    )
