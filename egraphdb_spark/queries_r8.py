"""Round-8 gate additions — six operators, each with the full contract
(Spark implementation in its topical operator module, hand-written DuckDB
oracle here, pytest parity in tests/test_r8_gates.py, fuzz enrollment for
the documents-only gates, 10× scale probe before merge).

Unlike round 7 there is no registry freeze, so these register LIVE;
tools/next_window.py fronts them in the round-9 driver window as the only
never-checked gates.

Conventions are queries_staged.py's: identical column aliases on both
engines, exact integer arithmetic (micro units; DECIMAL(38,0)/HUGEINT
where products can wrap), floor(x·1e6 + 0.5) quantization for the few
float-bearing terms, and any float constant injected as ONE literal shared
by both engines (the NDCG log2 table).
"""

from __future__ import annotations

from pyspark.sql import functions as F


def _t(spark, sf_dir, name):
    from .graph import load_tables

    return load_tables(spark, sf_dir)[name]


R8_REGISTRY: dict[str, tuple] = {}


# --------------------------------------------------------------------------
# txt_winnow_fingerprints — Schleimer/Wilkerson/Aiken winnowing (MOSS)
# --------------------------------------------------------------------------


def q_txt_winnow_fingerprints(spark, sf_dir):
    """Winnowing fingerprint summary per document (k=8-char grams,
    w=4 windows; operators/text.py winnow_fingerprints): count, min/max/
    sum of the selected 32-bit fingerprints and the selection density —
    the positional near-dup primitive (guaranteed shared fingerprint for
    any shared substring ≥ k+w−1 chars) that complements the whole-doc
    sketches (MinHash/SimHash) and global mod-p sampling
    (txt_fingerprint)."""
    from .operators.text import winnow_fingerprints
    from .queries_pipeline import _docs_spread

    # measured winner for the spread (md5-per-gram compute, per-doc
    # output): fingerprints gate 2.83 vs 3.35 s in the r11 basket A/B
    docs = _docs_spread(spark, sf_dir)
    fps = winnow_fingerprints(docs, "doc_id", "text", k=8, w=4)
    z = F.regexp_replace(F.lower(F.col("text")), r"\s+", "")
    grams = docs.select(
        F.col("doc_id").alias("id"),
        (F.length(z) - F.lit(7)).cast("long").alias("n_grams"),
    ).where(F.col("n_grams") >= 1)
    return (
        fps.groupBy("id")
        .agg(
            F.count("*").cast("long").alias("n_fps"),
            F.min("fp").cast("long").alias("fp_min"),
            F.max("fp").cast("long").alias("fp_max"),
            F.sum("fp").cast("long").alias("fp_sum"),
        )
        .join(grams, "id")
        .select(
            F.col("id").alias("doc_id"),
            "n_grams",
            "n_fps",
            "fp_min",
            "fp_max",
            "fp_sum",
            F.expr("(n_fps * 1000000) div n_grams").cast("long").alias(
                "density_micro"
            ),
        )
        .orderBy("doc_id")
    )


_WB = 1 << 31  # text.py _WINNOW_POS_BASE (widened from 2^21, r8 ADVICE low)

O_TXT_WINNOW = f"""
WITH s AS (
  SELECT doc_id, regexp_replace(lower(text), '\\s+', '', 'g') AS z
  FROM documents
),
b AS (
  -- n_grams < 2^31 mirrors winnow_fingerprints' packed-key domain guard
  SELECT doc_id, z, CAST(length(z) - 7 AS BIGINT) AS n_grams
  FROM s WHERE length(z) >= 8 AND length(z) - 7 < {_WB}
),
g AS (
  SELECT doc_id, n_grams,
         CAST(unnest(range(1, n_grams + 1)) AS BIGINT) AS pos, z
  FROM b
),
h AS (
  SELECT doc_id, n_grams, pos,
         CAST(('0x' || substr(md5(substr(z, CAST(pos AS INT), 8)), 1, 8))
              AS BIGINT) AS hh
  FROM g
),
k AS (
  SELECT doc_id, n_grams, pos,
         hh * {_WB} + ({_WB - 1} - pos) AS key
  FROM h
),
w AS (
  SELECT doc_id, n_grams, pos,
         min(key) OVER (PARTITION BY doc_id ORDER BY pos
                        ROWS BETWEEN CURRENT ROW AND 3 FOLLOWING) AS wkey
  FROM k
),
sel AS (
  -- DISTINCT over (pos, fp) PAIRS, not fp alone: winnowing's output is
  -- positional — the same hash selected at two positions is two
  -- fingerprints (mirrors winnow_fingerprints' distinct)
  SELECT DISTINCT doc_id, n_grams,
         wkey // {_WB} AS fp,
         {_WB - 1} - (wkey % {_WB}) AS fpos
  FROM w WHERE pos <= greatest(n_grams - 3, 1)
)
SELECT doc_id, n_grams,
       CAST(count(*) AS BIGINT) AS n_fps,
       CAST(min(fp) AS BIGINT) AS fp_min,
       CAST(max(fp) AS BIGINT) AS fp_max,
       CAST(sum(fp) AS BIGINT) AS fp_sum,
       CAST((count(*) * 1000000) // n_grams AS BIGINT) AS density_micro
FROM sel GROUP BY doc_id, n_grams ORDER BY doc_id
"""

R8_REGISTRY["txt_winnow_fingerprints"] = (q_txt_winnow_fingerprints, O_TXT_WINNOW)


# --------------------------------------------------------------------------
# txt_kneser_ney — interpolated KN bigram smoothing
# --------------------------------------------------------------------------


def q_txt_kneser_ney(spark, sf_dir):
    """Interpolated Kneser–Ney probabilities for the corpus' top-50
    bigrams with d = 3/4 — one exact fraction per bigram, 128-bit
    quantized (operators/text.py kneser_ney_bigrams).  Complements
    txt_bigram_nll (unigram-interpolated MLE) with the continuation-
    count smoothing real n-gram perplexity filters use."""
    from .operators.text import kneser_ney_bigrams

    docs = _t(spark, sf_dir, "documents")
    return kneser_ney_bigrams(docs, "doc_id", "text", top_n=50)


O_TXT_KNESER_NEY = r"""
WITH base AS (
  SELECT list_filter(string_split_regex(lower(text), '\s+'), t -> t <> '') AS t
  FROM documents
),
idx AS (
  SELECT t, CAST(unnest(range(1, CAST(len(t) AS BIGINT))) AS INT) AS i
  FROM base WHERE len(t) >= 2
),
pairs AS (SELECT t[i] AS w1, t[i + 1] AS w2 FROM idx),
bg AS (SELECT w1, w2, count(*) AS c FROM pairs GROUP BY 1, 2),
fwd AS (SELECT w1, sum(c) AS c_w1, count(*) AS n1p_fwd FROM bg GROUP BY 1),
cont AS (SELECT w2, count(*) AS n1p_cont FROM bg GROUP BY 1),
ty AS (SELECT count(*) AS n_bigram_types FROM bg)
SELECT w1, w2, CAST(c AS BIGINT) AS c, CAST(c_w1 AS BIGINT) AS c_w1,
       CAST(n1p_fwd AS BIGINT) AS n1p_fwd,
       CAST(n1p_cont AS BIGINT) AS n1p_cont,
       CAST(n_bigram_types AS BIGINT) AS n_bigram_types,
       CAST(((CAST(4 * c - 3 AS HUGEINT) * n_bigram_types
              + CAST(3 AS HUGEINT) * n1p_fwd * n1p_cont) * 1000000)
            // (CAST(4 AS HUGEINT) * c_w1 * n_bigram_types) AS BIGINT)
         AS kn_prob_micro
FROM bg JOIN fwd USING (w1) JOIN cont USING (w2), ty
ORDER BY c DESC, w1, w2 LIMIT 50
"""

R8_REGISTRY["txt_kneser_ney"] = (q_txt_kneser_ney, O_TXT_KNESER_NEY)


# --------------------------------------------------------------------------
# sketch_moments_chebyshev — mergeable moments + tail-bound certification
# --------------------------------------------------------------------------


def q_sketch_moments_chebyshev(spark, sf_dir):
    """Moments sketch (n, ΣX, ΣX²) over document lengths with the
    Chebyshev tail bound P(|X−μ| ≥ a) ≤ σ²/a² read out next to the exact
    empirical exceed fraction for a ∈ {25,50,100,200} chars — all
    cross-multiplied exact integers (operators/sketches.py
    moments_chebyshev).  Adds the moment/tail readout to the sketch
    family (HLL F₀, CM frequency, KMV overlap, AMS F₂)."""
    from .operators.sketches import moments_chebyshev

    docs = _t(spark, sf_dir, "documents")
    return moments_chebyshev(docs, "n_chars", deviations=[25, 50, 100, 200])


O_SKETCH_MOMENTS = """
WITH m AS (
  SELECT count(*) AS n, sum(n_chars) AS s1,
         sum(CAST(n_chars AS HUGEINT) * n_chars) AS s2d
  FROM documents WHERE n_chars IS NOT NULL
),
e AS (
  SELECT CAST(a AS BIGINT) AS a,
         (SELECT count(*) FROM documents d, m
          WHERE d.n_chars IS NOT NULL
            AND abs(CAST(d.n_chars AS HUGEINT) * m.n - m.s1)
                >= CAST(a AS HUGEINT) * m.n) AS n_exceed
  FROM (SELECT unnest([25, 50, 100, 200]) AS a)
)
SELECT a, CAST(n AS BIGINT) AS n, CAST(s1 AS BIGINT) AS s1,
       CAST(s2d AS BIGINT) AS s2,
       CAST((CASE WHEN s1 < 0 THEN -1 ELSE 1 END)
            * ((abs(CAST(s1 AS HUGEINT)) * 1000) // n) AS BIGINT)
         AS mean_milli,
       CAST(least(CAST(1000000 AS HUGEINT),
                  ((CAST(n AS HUGEINT) * s2d - CAST(s1 AS HUGEINT) * s1)
                   * 1000000)
                  // (CAST(n AS HUGEINT) * n * a * a)) AS BIGINT)
         AS bound_micro,
       CAST((CAST(n_exceed AS HUGEINT) * 1000000) // n AS BIGINT)
         AS actual_micro
FROM e, m ORDER BY a
"""

R8_REGISTRY["sketch_moments_chebyshev"] = (
    q_sketch_moments_chebyshev,
    O_SKETCH_MOMENTS,
)


# --------------------------------------------------------------------------
# rag_ndcg — graded-relevance retrieval eval
# --------------------------------------------------------------------------


def _log2_lits(k: int) -> list[float]:
    import math

    return [math.log2(i + 1) for i in range(1, k + 1)]


def q_rag_ndcg(spark, sf_dir):
    """NDCG@10 per language for a deterministic ranking (docs by n_chars
    desc, doc_id tie-break) against deterministic graded labels
    rel = 3 − doc_id % 4 (operators/ranking.py ndcg_at_k) — the eval
    readout the retrieval family (BM25/cosine/IVF/RRF/MMR) reports
    against; complements sim_recall_at_k's binary hit-rate with graded
    gain.  log2 discounts are shared double literals; every term is
    micro-quantized before the integer sum, so the gate is hash-exact."""
    from pyspark.sql import Window

    from .operators.ranking import ndcg_at_k

    docs = _t(spark, sf_dir, "documents")
    w = Window.partitionBy("lang").orderBy(F.col("n_chars").desc(), "doc_id")
    ranked = (
        docs.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= 10)
        .withColumn("rel", F.expr("3 - doc_id % 4"))
    )
    return ndcg_at_k(ranked, "lang", "rank", "rel", k=10).withColumnRenamed(
        "grp", "lang"
    )


def _ndcg_oracle(k: int = 10) -> str:
    logs = _log2_lits(k)

    def case(rank_col: str) -> str:
        whens = " ".join(
            f"WHEN {i} THEN CAST(floor(CAST((1 << rel) - 1 AS DOUBLE)"
            f" * 1000000.0 / {L!r} + 0.5) AS BIGINT)"
            for i, L in enumerate(logs, start=1)
        )
        return f"CASE {rank_col} {whens} END"

    return f"""
WITH ranked AS (
  SELECT lang, doc_id, 3 - doc_id % 4 AS rel,
         row_number() OVER (PARTITION BY lang
                            ORDER BY n_chars DESC, doc_id) AS rank
  FROM documents
),
topk AS (SELECT * FROM ranked WHERE rank <= {k}),
ideal AS (
  SELECT *, row_number() OVER (PARTITION BY lang
                               ORDER BY rel DESC, rank) AS irank
  FROM topk
),
terms AS (
  SELECT lang, {case('rank')} AS term_micro, {case('irank')} AS iterm_micro
  FROM ideal
),
agg AS (
  SELECT lang, CAST(sum(term_micro) AS BIGINT) AS dcg_micro,
         CAST(sum(iterm_micro) AS BIGINT) AS idcg_micro
  FROM terms GROUP BY lang
)
SELECT lang, CAST({k} AS BIGINT) AS k, dcg_micro, idcg_micro,
       CASE WHEN idcg_micro = 0 THEN NULL
       ELSE CAST((CAST(dcg_micro AS HUGEINT) * 1000000) // idcg_micro
                 AS BIGINT) END AS ndcg_micro
FROM agg ORDER BY lang
"""


O_RAG_NDCG = _ndcg_oracle()

R8_REGISTRY["rag_ndcg"] = (q_rag_ndcg, O_RAG_NDCG)


# --------------------------------------------------------------------------
# sample_pps_systematic — fixed-size weighted sampling
# --------------------------------------------------------------------------


def q_sample_pps_systematic(spark, sf_dir):
    """PPS systematic sample of exactly k=40 documents weighted by
    n_chars, seeded anchor (operators/sampling.py pps_systematic) —
    the fixed-budget weighted design next to the family's Bernoulli
    (sample_hash_docs), stratified, Neyman and reservoir draws; reports
    multiplicity for over-weight units.  The Spark plan builds the
    cumulative-weight line with the two-level bucket cumsum (never a
    single-partition global window); the oracle uses a plain ordered
    cumsum — identical values, different plan."""
    from .operators.sampling import pps_systematic

    docs = _t(spark, sf_dir, "documents")
    return pps_systematic(docs, "doc_id", "n_chars", k=40, salt="pps")


O_SAMPLE_PPS = """
WITH b AS (
  SELECT doc_id AS id, CAST(n_chars AS BIGINT) AS w
  FROM documents
  WHERE n_chars IS NOT NULL AND n_chars > 0 AND doc_id IS NOT NULL
),
c AS (
  SELECT id, w,
         CAST(sum(w) OVER (ORDER BY id ROWS UNBOUNDED PRECEDING) AS BIGINT)
           AS cum_w
  FROM b
),
t AS (SELECT CAST(sum(w) AS BIGINT) AS tot_w FROM b),
a AS (
  SELECT tot_w,
         CAST(('0x' || substr(md5('pps'), 1, 15)) AS BIGINT) % tot_w
           AS anchor_u
  FROM t
),
hits AS (
  SELECT id, w, cum_w,
         CAST((CAST(cum_w AS HUGEINT) * 40 + anchor_u) // tot_w
              - (CAST(cum_w - w AS HUGEINT) * 40 + anchor_u) // tot_w
              AS BIGINT)
           AS n_hits
  FROM c, a
)
SELECT id, w, cum_w, n_hits FROM hits WHERE n_hits >= 1 ORDER BY id
"""

R8_REGISTRY["sample_pps_systematic"] = (q_sample_pps_systematic, O_SAMPLE_PPS)


# --------------------------------------------------------------------------
# clean_dates_normalize — messy-date parsing without engine date parsers
# --------------------------------------------------------------------------


def q_clean_dates_normalize(spark, sf_dir):
    """Multi-format date-string normalization over six deterministic
    messy variants synthesized from events.ts (ISO datetime, ISO date,
    unpadded US M/D/YYYY, epoch seconds, 'D Mon YYYY', and junk) —
    regex + integer civil→epoch math on BOTH engines, never an engine
    date parser (operators/text.py normalize_datestrings).  Output: per
    format tag, row count, parse count and exact epoch aggregates; the
    junk variant must land in 'unknown' with NULL epochs."""
    from .graph import spread_low_parallelism
    from .operators.text import normalize_datestrings

    # ~20 regex matches + integer civil-date math per row follow on the
    # synthesized variants — spread a single-split events scan first so
    # the parse runs at full width (guide §2.5; no-op on wide inputs;
    # measured 3.2 → 0.8 s on the sf0.1 single-file events table)
    ev = spread_low_parallelism(_t(spark, sf_dir, "events"))
    mon = (
        "case month(ts) when 1 then 'Jan' when 2 then 'Feb' when 3 then 'Mar'"
        " when 4 then 'Apr' when 5 then 'May' when 6 then 'Jun'"
        " when 7 then 'Jul' when 8 then 'Aug' when 9 then 'Sep'"
        " when 10 then 'Oct' when 11 then 'Nov' else 'Dec' end"
    )
    raw = ev.withColumn(
        "raw",
        F.expr(
            "case cast(event_id % 6 as int)"
            " when 0 then date_format(ts, 'yyyy-MM-dd') || 'T' ||"
            "   date_format(ts, 'HH:mm:ss')"
            " when 1 then date_format(ts, 'yyyy-MM-dd')"
            " when 2 then cast(month(ts) as string) || '/' ||"
            "   cast(day(ts) as string) || '/' || cast(year(ts) as string)"
            " when 3 then cast(unix_seconds(date_trunc('second', ts)) as string)"
            f" when 4 then cast(day(ts) as string) || ' ' || {mon} || ' ' ||"
            "   cast(year(ts) as string)"
            " else 'not-a-date-' || cast(event_id as string) end"
        ),
    )
    out = normalize_datestrings(raw, "raw")
    return (
        out.groupBy("fmt")
        .agg(
            F.count("*").cast("long").alias("n"),
            F.count("epoch_sec").cast("long").alias("n_parsed"),
            F.min("epoch_sec").cast("long").alias("min_epoch"),
            F.max("epoch_sec").cast("long").alias("max_epoch"),
            F.sum("epoch_sec").cast("long").alias("sum_epoch"),
        )
        .orderBy("fmt")
    )


def _dates_oracle() -> str:
    from .operators.text import _date_norm_exprs

    fmt, epoch = _date_norm_exprs("raw", "duckdb")
    mon = (
        "CASE month(ts) WHEN 1 THEN 'Jan' WHEN 2 THEN 'Feb' WHEN 3 THEN 'Mar'"
        " WHEN 4 THEN 'Apr' WHEN 5 THEN 'May' WHEN 6 THEN 'Jun'"
        " WHEN 7 THEN 'Jul' WHEN 8 THEN 'Aug' WHEN 9 THEN 'Sep'"
        " WHEN 10 THEN 'Oct' WHEN 11 THEN 'Nov' ELSE 'Dec' END"
    )
    return f"""
WITH raw AS (
  SELECT CASE CAST(event_id % 6 AS INT)
    WHEN 0 THEN strftime(ts, '%Y-%m-%d') || 'T' || strftime(ts, '%H:%M:%S')
    WHEN 1 THEN strftime(ts, '%Y-%m-%d')
    WHEN 2 THEN CAST(month(ts) AS VARCHAR) || '/' ||
      CAST(day(ts) AS VARCHAR) || '/' || CAST(year(ts) AS VARCHAR)
    WHEN 3 THEN CAST(CAST(epoch(date_trunc('second', ts)) AS BIGINT)
                     AS VARCHAR)
    WHEN 4 THEN CAST(day(ts) AS VARCHAR) || ' ' || {mon} || ' ' ||
      CAST(year(ts) AS VARCHAR)
    ELSE 'not-a-date-' || CAST(event_id AS VARCHAR) END AS raw
  FROM events
),
norm AS (
  SELECT CASE WHEN raw IS NULL THEN 'unknown' ELSE {fmt} END AS fmt,
         CASE WHEN raw IS NULL THEN CAST(NULL AS BIGINT)
              ELSE {epoch} END AS epoch_sec
  FROM raw
)
SELECT fmt, CAST(count(*) AS BIGINT) AS n,
       CAST(count(epoch_sec) AS BIGINT) AS n_parsed,
       CAST(min(epoch_sec) AS BIGINT) AS min_epoch,
       CAST(max(epoch_sec) AS BIGINT) AS max_epoch,
       CAST(sum(epoch_sec) AS BIGINT) AS sum_epoch
FROM norm GROUP BY fmt ORDER BY fmt
"""


O_CLEAN_DATES = _dates_oracle()

R8_REGISTRY["clean_dates_normalize"] = (q_clean_dates_normalize, O_CLEAN_DATES)


# --------------------------------------------------------------------------
# evt_bootstrap_ci — seeded Poisson bootstrap CI
# --------------------------------------------------------------------------


def q_evt_bootstrap_ci(spark, sf_dir):
    """Poisson-bootstrap 90% CI for the mean event value per event_type
    (32 seeded resamples; operators/behavior.py poisson_bootstrap_ci) —
    the distributed bootstrap (per-row Poisson(1) multiplicities, a pure
    map) that gives pipeline metrics error bars without global
    resampling; completes the inference family next to evt_ab_test /
    evt_rate_wilson / evt_diff_in_diff."""
    from .operators.behavior import poisson_bootstrap_ci

    ev = _t(spark, sf_dir, "events")
    return poisson_bootstrap_ci(ev, "event_type", "event_id", "value", n_boot=32)


_P1 = (
    424136118829305329,
    848272237658610659,
    1060340297073263324,
    1131029650211480879,
    1148701988496035267,
)

O_EVT_BOOTSTRAP = f"""
WITH base AS (
  SELECT event_type AS grp, CAST(event_id AS VARCHAR) AS rid,
         CAST(round(100 * value) AS BIGINT) AS cents
  FROM events
),
point AS (
  SELECT grp, CAST(count(*) AS BIGINT) AS n_events,
         CAST((CASE WHEN sum(cents) < 0 THEN -1 ELSE 1 END)
              * ((abs(sum(cents)) * 10) // count(*)) AS BIGINT) AS mean_milli
  FROM base GROUP BY grp
),
rep AS (
  SELECT grp, rid, cents, CAST(unnest(range(0, 32)) AS BIGINT) AS b
  FROM base
),
draws AS (
  SELECT grp, b, cents,
         CAST(('0x' || substr(md5('bs:' || CAST(b AS VARCHAR) || ':'
                                  || coalesce(rid, chr(0))), 1, 15))
              AS BIGINT) AS u
  FROM rep
),
mult AS (
  SELECT grp, b, cents,
         CASE WHEN u < {_P1[0]} THEN 0 WHEN u < {_P1[1]} THEN 1
              WHEN u < {_P1[2]} THEN 2 WHEN u < {_P1[3]} THEN 3
              WHEN u < {_P1[4]} THEN 4 ELSE 5 END AS m
  FROM draws
),
boots AS (
  SELECT grp, b, sum(m * cents) AS sum_mc, sum(m) AS sum_m
  FROM mult GROUP BY grp, b HAVING sum(m) > 0
),
bm AS (
  SELECT grp, b,
         CAST((CASE WHEN sum_mc < 0 THEN -1 ELSE 1 END)
              * ((abs(sum_mc) * 10) // sum_m) AS BIGINT) AS bmean_milli
  FROM boots
),
ranked AS (
  SELECT grp, bmean_milli,
         row_number() OVER (PARTITION BY grp ORDER BY bmean_milli, b) AS rk,
         CAST(count(*) OVER (PARTITION BY grp) AS BIGINT) AS nv
  FROM bm
),
ci AS (
  SELECT grp, max(nv) AS n_boot_valid,
         CAST(min(bmean_milli) AS BIGINT) AS boot_lo_milli,
         CAST(max(bmean_milli) AS BIGINT) AS boot_hi_milli
  FROM ranked
  WHERE rk = (nv * 50) // 1000 + 1 OR rk = (nv * 950 + 999) // 1000
  GROUP BY grp
)
SELECT point.grp, n_events, mean_milli,
       CAST(coalesce(n_boot_valid, 0) AS BIGINT) AS n_boot_valid,
       boot_lo_milli, boot_hi_milli
FROM point LEFT JOIN ci ON point.grp = ci.grp
ORDER BY point.grp
"""

R8_REGISTRY["evt_bootstrap_ci"] = (q_evt_bootstrap_ci, O_EVT_BOOTSTRAP)


# --------------------------------------------------------------------------
# profile_gini — Lorenz/Gini concentration
# --------------------------------------------------------------------------


def q_profile_gini(spark, sf_dir):
    """Gini coefficient of document length per language
    (operators/profiling.py gini_concentration) — the corpus-
    concentration alarm: G → 0 when sources contribute evenly, → 1 when
    one document class hoards the characters.  Exact grouped-rank
    integer arithmetic over the bounded length domain; rows are counted
    once and never sorted."""
    from .operators.profiling import gini_concentration

    docs = _t(spark, sf_dir, "documents")
    return gini_concentration(docs, "lang", "n_chars")


O_PROFILE_GINI = """
WITH counts AS (
  SELECT lang AS grp, CAST(n_chars AS BIGINT) AS v, count(*) AS c
  FROM documents WHERE n_chars IS NOT NULL AND n_chars >= 0
  GROUP BY 1, 2
),
ranked AS (
  SELECT grp, v, c,
         CAST(coalesce(sum(c) OVER (PARTITION BY grp ORDER BY v
                                    ROWS BETWEEN UNBOUNDED PRECEDING
                                    AND 1 PRECEDING), 0) AS BIGINT) AS cb
  FROM counts
),
agg AS (
  SELECT grp, CAST(sum(c) AS BIGINT) AS n,
         sum(CAST(v AS HUGEINT) * c) AS sx_d,
         sum(CAST(v AS HUGEINT)
             * (c * CAST(cb AS HUGEINT) + (c * (c + 1)) // 2)) AS six_d
  FROM ranked GROUP BY grp
)
SELECT grp, n, CAST(sx_d AS BIGINT) AS sum_x,
       CASE WHEN n = 0 OR sx_d = 0 THEN NULL
       ELSE CAST(((2 * six_d - (n + 1) * sx_d) * 1000000)
                 // (CAST(n AS HUGEINT) * sx_d) AS BIGINT) END AS gini_micro
FROM agg ORDER BY grp
"""

R8_REGISTRY["profile_gini"] = (q_profile_gini, O_PROFILE_GINI)


# --------------------------------------------------------------------------
# txt_zipf_fit — rank-frequency slope
# --------------------------------------------------------------------------


def q_txt_zipf_fit(spark, sf_dir):
    """Zipf rank-frequency regression over the corpus' top-100 unigrams
    (operators/text.py zipf_fit): micro-quantized ln coordinates →
    exact 128-bit least squares; slope_milli ≈ −1000 is the natural-text
    signature, the corpus-level alarm next to the per-doc Gopher
    battery."""
    from .operators.text import zipf_fit

    docs = _t(spark, sf_dir, "documents")
    return zipf_fit(docs, top_r=100)


O_TXT_ZIPF = r"""
WITH toks AS (
  SELECT unnest(list_filter(string_split_regex(lower(text), '\s+'),
                            t -> t <> '')) AS term
  FROM documents
),
uni AS (SELECT term, CAST(count(*) AS BIGINT) AS freq FROM toks GROUP BY term),
corpus AS (
  SELECT CAST(count(*) AS BIGINT) AS n_types,
         CAST(sum(freq) AS BIGINT) AS n_tokens
  FROM uni
),
top AS (
  SELECT freq,
         CAST(row_number() OVER (ORDER BY freq DESC, term) AS BIGINT) AS rank
  FROM uni ORDER BY freq DESC, term LIMIT 100
),
xy AS (
  SELECT rank, freq,
         CAST(floor(ln(CAST(rank AS DOUBLE)) * 1000000.0 + 0.5) AS BIGINT) AS x,
         CAST(floor(ln(CAST(freq AS DOUBLE)) * 1000000.0 + 0.5) AS BIGINT) AS y
  FROM top
),
reg AS (
  SELECT CAST(count(*) AS BIGINT) AS r_eff,
         CAST(max(CASE WHEN rank = 1 THEN freq END) AS BIGINT) AS top_freq,
         sum(CAST(x AS HUGEINT)) AS sx, sum(CAST(y AS HUGEINT)) AS sy,
         sum(CAST(x AS HUGEINT) * y) AS sxy,
         sum(CAST(x AS HUGEINT) * x) AS sxx
  FROM xy
)
SELECT r_eff, n_types, n_tokens, top_freq,
       CASE WHEN r_eff < 2 OR (r_eff * sxx - sx * sx) = 0 THEN NULL
       ELSE CAST((CASE WHEN (r_eff * sxy - sx * sy) < 0 THEN -1 ELSE 1 END)
                 * ((abs(r_eff * sxy - sx * sy) * 1000)
                    // (r_eff * sxx - sx * sx)) AS BIGINT) END AS slope_milli,
       CASE WHEN r_eff < 2 OR (r_eff * sxx - sx * sx) = 0 THEN NULL
       ELSE CAST((sy // r_eff)
                 - (CASE WHEN (r_eff * sxy - sx * sy) < 0 THEN -1 ELSE 1 END)
                   * ((abs(CAST(
                        (CASE WHEN (r_eff * sxy - sx * sy) < 0 THEN -1 ELSE 1 END)
                        * ((abs(r_eff * sxy - sx * sy) * 1000)
                           // (r_eff * sxx - sx * sx)) AS HUGEINT))
                      * (sx // r_eff)) // 1000) AS BIGINT) END
         AS intercept_micro
FROM reg, corpus
"""

R8_REGISTRY["txt_zipf_fit"] = (q_txt_zipf_fit, O_TXT_ZIPF)


# --------------------------------------------------------------------------
# stream_moments — the moments sketch as a streaming aggregate
# --------------------------------------------------------------------------


def q_stream_moments(spark, sf_dir):
    """REAL streaming moments: readStream → watermark → 1-hour tumbling
    windows → (n, Σcents, Σcents²) power sums + exact integer mean →
    availableNow → memory sink (streaming/stream.py windowed_moments).
    The mergeable-by-addition property that makes moments_chebyshev a
    sketch is exactly what makes it stream-legal: state per window is
    one 3-number row regardless of event volume."""
    from .streaming.stream import read_events_stream, run_to_memory, windowed_moments

    ev = read_events_stream(spark, sf_dir)
    out = run_to_memory(windowed_moments(ev, "1 hour"), "stream_moments_tbl")
    return out.orderBy("window_start")


O_STREAM_MOMENTS = """
WITH w AS (
  SELECT time_bucket(INTERVAL 1 HOUR, ts) AS window_start,
         CAST(round(100 * value) AS BIGINT) AS cents
  FROM events
)
SELECT window_start, CAST(count(*) AS BIGINT) AS n,
       CAST(sum(cents) AS BIGINT) AS s1_cents,
       CAST(sum(CAST(cents AS HUGEINT) * cents) AS BIGINT) AS s2_cents2,
       CAST((CASE WHEN sum(cents) < 0 THEN -1 ELSE 1 END)
            * ((abs(sum(cents)) * 10) // count(*)) AS BIGINT) AS mean_milli
FROM w GROUP BY 1 ORDER BY 1
"""

R8_REGISTRY["stream_moments"] = (q_stream_moments, O_STREAM_MOMENTS)


# --------------------------------------------------------------------------
# txt_gopher_lines — the line-level Gopher rules
# --------------------------------------------------------------------------


def q_txt_gopher_lines(spark, sf_dir):
    """Line-level Gopher rules (bullet-start > 90%, ellipsis-end > 30%)
    over four deterministic multi-line variants synthesized per document
    (all-bullet list, ellipsis-preview stack, normal two-liner, mixed) —
    the half of Rae et al.'s battery that txt_gopher_quality's per-doc
    word statistics can't express (operators/text.py gopher_line_rules).
    Variants 0 and 1 must fail bits 1 and 2 respectively; 2 and 3 must
    pass — variant 2's lines are wrapped in fixed non-bullet /
    non-ellipsis literals ('x ' prefix, ' y' suffix) so the pass
    contract holds for ANY corpus, not just one whose text happens to
    avoid leading bullets and trailing '...' (r8 ADVICE low)."""
    from .operators.text import gopher_line_rules

    docs = _t(spark, sf_dir, "documents")
    synth = docs.withColumn(
        "mtext",
        F.expr(
            "case cast(doc_id % 4 as int)"
            " when 0 then '- alpha ' || source || chr(10) || '- beta item'"
            "   || chr(10) || '- gamma item'"
            " when 1 then 'intro ' || source || chr(10) || 'preview one...'"
            "   || chr(10) || 'preview two...' || chr(10) || 'preview three...'"
            " when 2 then 'x ' || substring(text, 1, 40) || ' y' || chr(10)"
            "   || 'x ' || substring(text, 41, 40) || ' y'"
            " else '• ' || lang || ' item' || chr(10) || 'plain tail line' end"
        ),
    )
    return gopher_line_rules(synth, "doc_id", "mtext").orderBy("id")


O_TXT_GOPHER_LINES = """
WITH synth AS (
  SELECT doc_id, CASE CAST(doc_id % 4 AS INT)
    WHEN 0 THEN '- alpha ' || source || chr(10) || '- beta item'
      || chr(10) || '- gamma item'
    WHEN 1 THEN 'intro ' || source || chr(10) || 'preview one...'
      || chr(10) || 'preview two...' || chr(10) || 'preview three...'
    WHEN 2 THEN 'x ' || substr(text, 1, 40) || ' y' || chr(10)
      || 'x ' || substr(text, 41, 40) || ' y'
    ELSE '• ' || lang || ' item' || chr(10) || 'plain tail line' END AS mtext
  FROM documents
),
lines AS (
  SELECT doc_id AS id, trim(unnest(string_split(mtext, chr(10)))) AS l
  FROM synth
),
nz AS (SELECT id, l FROM lines WHERE l <> ''),
agg AS (
  SELECT id, CAST(count(*) AS BIGINT) AS n_lines,
         CAST(sum(CASE WHEN starts_with(l, '-') OR starts_with(l, '•')
                        OR starts_with(l, '*') THEN 1 ELSE 0 END) AS BIGINT)
           AS n_bullet,
         CAST(sum(CASE WHEN l LIKE '%...' OR l LIKE '%…' THEN 1 ELSE 0 END)
              AS BIGINT) AS n_ellipsis
  FROM nz GROUP BY id
)
SELECT id, n_lines, n_bullet, n_ellipsis,
       CAST((n_bullet * 1000000) // n_lines AS BIGINT) AS bullet_frac_micro,
       CAST((n_ellipsis * 1000000) // n_lines AS BIGINT) AS ellipsis_frac_micro,
       CAST((CASE WHEN (n_bullet * 1000000) // n_lines > 900000
                  THEN 1 ELSE 0 END)
            + (CASE WHEN (n_ellipsis * 1000000) // n_lines > 300000
                    THEN 2 ELSE 0 END) AS BIGINT) AS fail_mask,
       ((CASE WHEN (n_bullet * 1000000) // n_lines > 900000 THEN 1 ELSE 0 END)
        + (CASE WHEN (n_ellipsis * 1000000) // n_lines > 300000
                THEN 2 ELSE 0 END)) = 0 AS keep
FROM agg ORDER BY id
"""

R8_REGISTRY["txt_gopher_lines"] = (q_txt_gopher_lines, O_TXT_GOPHER_LINES)


# --------------------------------------------------------------------------
# dedup_winnow_pairs — MOSS pair mining over winnowing fingerprints
# --------------------------------------------------------------------------


def q_dedup_winnow_pairs(spark, sf_dir):
    """Near-dup candidate pairs sharing ≥ 2 winnowing fingerprints after
    the MOSS document-frequency cap (df ≤ 10 — boilerplate fingerprints
    are dropped before the band join, so fan-out per fingerprint is
    bounded; operators/dedup.py winnow_pairs).  The positional
    complement to dedup_minhash_lsh_pairs' whole-document banding."""
    from .operators.dedup import winnow_pairs

    docs = _t(spark, sf_dir, "documents")
    return winnow_pairs(docs, "doc_id", "text", k=8, w=4, max_df=10, min_shared=2)


O_DEDUP_WINNOW_PAIRS = f"""
WITH s AS (
  SELECT doc_id, regexp_replace(lower(text), '\\s+', '', 'g') AS z
  FROM documents
),
b AS (
  -- n_grams < 2^31 mirrors winnow_fingerprints' packed-key domain guard
  SELECT doc_id, z, CAST(length(z) - 7 AS BIGINT) AS n_grams
  FROM s WHERE length(z) >= 8 AND length(z) - 7 < {_WB}
),
g AS (
  SELECT doc_id, n_grams,
         CAST(unnest(range(1, n_grams + 1)) AS BIGINT) AS pos, z
  FROM b
),
h AS (
  SELECT doc_id, n_grams, pos,
         CAST(('0x' || substr(md5(substr(z, CAST(pos AS INT), 8)), 1, 8))
              AS BIGINT) AS hh
  FROM g
),
k AS (
  SELECT doc_id, n_grams, pos, hh * {_WB} + ({_WB - 1} - pos) AS key FROM h
),
w AS (
  SELECT doc_id, n_grams, pos,
         min(key) OVER (PARTITION BY doc_id ORDER BY pos
                        ROWS BETWEEN CURRENT ROW AND 3 FOLLOWING) AS wkey
  FROM k
),
fps AS (
  SELECT DISTINCT doc_id AS id, wkey // {_WB} AS fp
  FROM w WHERE pos <= greatest(n_grams - 3, 1)
),
dfc AS (SELECT fp FROM fps GROUP BY fp HAVING count(*) <= 10),
kept AS (SELECT fps.id, fps.fp FROM fps JOIN dfc USING (fp)),
pairs AS (
  SELECT a.id AS id_a, b2.id AS id_b, count(*) AS n_shared
  FROM kept a JOIN kept b2 ON a.fp = b2.fp AND a.id < b2.id
  GROUP BY 1, 2 HAVING count(*) >= 2
)
SELECT id_a, id_b, CAST(n_shared AS BIGINT) AS n_shared
FROM pairs ORDER BY id_a, id_b
"""

R8_REGISTRY["dedup_winnow_pairs"] = (q_dedup_winnow_pairs, O_DEDUP_WINNOW_PAIRS)


# --------------------------------------------------------------------------
# clean_html_strip — crawl HTML cleaning
# --------------------------------------------------------------------------


def q_clean_html_strip(spark, sf_dir):
    """HTML tag stripping + entity decode + whitespace collapse over
    three deterministic markup variants per document (full page, inline
    div with &nbsp;, plain passthrough) — the first cleaning step of
    every crawl pipeline (operators/text.py strip_html; the DuckDB side
    is emitted by strip_html_sql from the same entity table, so decode
    ORDER — &amp; last — is pinned identically)."""
    from .operators.text import strip_html

    docs = _t(spark, sf_dir, "documents")
    raw = docs.withColumn(
        "html",
        F.expr(
            "case cast(doc_id % 3 as int)"
            " when 0 then '<html><body><h1>' || source || '</h1><p>'"
            "   || substring(text, 1, 60) || ' &amp; more &lt;tags&gt;</p></body></html>'"
            " when 1 then '<div class=\"x\">' || substring(text, 1, 40)"
            "   || '</div>&nbsp;<span>tail &#39;q&#39;</span>'"
            " else text end"
        ),
    )
    return raw.select(
        "doc_id",
        strip_html("html").alias("clean_text"),
    ).withColumn("n_chars_clean", F.length("clean_text").cast("long")).orderBy(
        "doc_id"
    )


def _html_oracle() -> str:
    from .operators.text import strip_html_sql

    return f"""
WITH raw AS (
  SELECT doc_id, CASE CAST(doc_id % 3 AS INT)
    WHEN 0 THEN '<html><body><h1>' || source || '</h1><p>'
      || substr(text, 1, 60) || ' &amp; more &lt;tags&gt;</p></body></html>'
    WHEN 1 THEN '<div class="x">' || substr(text, 1, 40)
      || '</div>&nbsp;<span>tail &#39;q&#39;</span>'
    ELSE text END AS html
  FROM documents
)
SELECT doc_id, {strip_html_sql('html')} AS clean_text,
       CAST(length({strip_html_sql('html')}) AS BIGINT) AS n_chars_clean
FROM raw ORDER BY doc_id
"""


O_CLEAN_HTML = _html_oracle()

R8_REGISTRY["clean_html_strip"] = (q_clean_html_strip, O_CLEAN_HTML)


# --------------------------------------------------------------------------
# privacy_dp_topk — exponential mechanism (selection), Gumbel-max form
# --------------------------------------------------------------------------


def q_privacy_dp_topk(spark, sf_dir):
    """ε=1 exponential-mechanism top-5 (lang, source) selection via
    seeded Gumbel-max (operators/privacy.py dp_topk_exponential) —
    completes the DP-mechanism trio: Laplace histogram (numeric),
    Laplace clipped mean (numeric), exponential mechanism (selection).
    Default-public-salt caveat as documented on the operator: this is a
    reproducible simulation of the mechanism for engine parity, not a
    private release.  True counts ride as audit columns."""
    from .operators.privacy import dp_topk_exponential

    docs = _t(spark, sf_dir, "documents")
    return dp_topk_exponential(docs, ["lang", "source"], k=5)


def _dp_topk_oracle() -> str:
    from .queries_staged import _TWO60, _sql_enc

    return f"""
WITH a AS (
  SELECT lang AS g0, source AS g1, CAST(count(*) AS BIGINT) AS n
  FROM documents GROUP BY 1, 2
),
h AS (
  SELECT g0, g1, n,
         CAST(('0x' || substr(md5('dpx:' || {_sql_enc('g0')} || ':'
                                  || {_sql_enc('g1')}), 1, 15))
              AS BIGINT) AS hh
  FROM a
),
s AS (
  SELECT g0, g1, n,
         CAST(floor((
           (1000000 / 1000000.0) * n / 2.0
           - ln(-ln(CAST(greatest(hh, 1) AS DOUBLE) / {float(_TWO60)}))
         ) * 1000000.0 + 0.5) AS BIGINT) AS score_micro
  FROM h
),
top AS (
  SELECT * FROM s ORDER BY score_micro DESC, g0, g1 LIMIT 5
)
SELECT CAST(row_number() OVER (ORDER BY score_micro DESC, g0, g1) AS BIGINT)
         AS rank,
       g0, g1, n, score_micro
FROM top ORDER BY rank
"""


O_PRIVACY_DP_TOPK = _dp_topk_oracle()

R8_REGISTRY["privacy_dp_topk"] = (q_privacy_dp_topk, O_PRIVACY_DP_TOPK)


# --------------------------------------------------------------------------
# txt_heaps_fit — Heaps'-law vocabulary growth
# --------------------------------------------------------------------------


def q_txt_heaps_fit(spark, sf_dir):
    """Heaps'-law V(N) ≈ K·N^β fit over the corpus in doc-id order,
    checkpoints every 50 docs (operators/text.py heaps_fit) — Zipf's
    companion corpus-health number: the first-occurrence trick
    (min doc id per term) makes vocabulary growth one vocabulary-sized
    aggregate plus scale-safe bucketed cumsums, no prefix-distinct
    machinery.  Same micro-quantized integer least squares and
    sign·(|num| div den) recipe as txt_zipf_fit."""
    from .operators.text import heaps_fit

    docs = _t(spark, sf_dir, "documents")
    return heaps_fit(docs, checkpoint_every=50)


O_TXT_HEAPS = r"""
WITH base AS (
  SELECT doc_id AS id,
         list_filter(string_split_regex(lower(text), '\s+'), t -> t <> '') AS t
  FROM documents WHERE doc_id IS NOT NULL
),
toks AS (SELECT id, unnest(t) AS term FROM base),
first AS (SELECT term, min(id) AS fid FROM toks GROUP BY term),
newt AS (SELECT fid AS id, CAST(count(*) AS BIGINT) AS f FROM first GROUP BY fid),
per_doc AS (
  SELECT base.id, CAST(len(t) AS BIGINT) AS ntok,
         CAST(coalesce(f, 0) AS BIGINT) AS f
  FROM base LEFT JOIN newt ON base.id = newt.id
),
cum AS (
  SELECT id, ntok, f,
         CAST(sum(f) OVER (ORDER BY id ROWS UNBOUNDED PRECEDING) AS BIGINT) AS v,
         CAST(sum(ntok) OVER (ORDER BY id ROWS UNBOUNDED PRECEDING) AS BIGINT)
           AS n_tok,
         CAST(row_number() OVER (ORDER BY id) AS BIGINT) AS rank
  FROM per_doc
),
pts AS (
  SELECT rank, v, n_tok,
         CAST(floor(ln(CAST(n_tok AS DOUBLE)) * 1000000.0 + 0.5) AS BIGINT) AS x,
         CAST(floor(ln(CAST(v AS DOUBLE)) * 1000000.0 + 0.5) AS BIGINT) AS y
  FROM cum WHERE rank % 50 = 0 AND v >= 1 AND n_tok >= 1
),
finals AS (
  SELECT v AS vocab_final, n_tok AS tokens_final FROM cum
  ORDER BY id DESC LIMIT 1
),
nd AS (SELECT CAST(count(*) AS BIGINT) AS n_docs FROM per_doc),
reg AS (
  SELECT CAST(count(*) AS BIGINT) AS n_checkpoints,
         sum(CAST(x AS HUGEINT)) AS sx, sum(CAST(y AS HUGEINT)) AS sy,
         sum(CAST(x AS HUGEINT) * y) AS sxy,
         sum(CAST(x AS HUGEINT) * x) AS sxx
  FROM pts
)
SELECT n_checkpoints, n_docs, vocab_final, tokens_final,
       CASE WHEN n_checkpoints < 2
            OR (n_checkpoints * sxx - sx * sx) = 0 THEN NULL
       ELSE CAST((CASE WHEN (n_checkpoints * sxy - sx * sy) < 0
                       THEN -1 ELSE 1 END)
                 * ((abs(n_checkpoints * sxy - sx * sy) * 1000)
                    // (n_checkpoints * sxx - sx * sx)) AS BIGINT) END
         AS slope_milli,
       CASE WHEN n_checkpoints < 2
            OR (n_checkpoints * sxx - sx * sx) = 0 THEN NULL
       ELSE CAST((sy // n_checkpoints)
                 - (CASE WHEN (n_checkpoints * sxy - sx * sy) < 0
                         THEN -1 ELSE 1 END)
                   * ((abs(CAST(
                        (CASE WHEN (n_checkpoints * sxy - sx * sy) < 0
                              THEN -1 ELSE 1 END)
                        * ((abs(n_checkpoints * sxy - sx * sy) * 1000)
                           // (n_checkpoints * sxx - sx * sx)) AS HUGEINT))
                      * (sx // n_checkpoints)) // 1000) AS BIGINT) END
         AS intercept_micro
FROM reg, nd, finals
"""

R8_REGISTRY["txt_heaps_fit"] = (q_txt_heaps_fit, O_TXT_HEAPS)
