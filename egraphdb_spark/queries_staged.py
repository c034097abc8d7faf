"""Round-8 staging area for new registry gates.

Round 7 froze the driver-facing registry at 269 gates (round-6 verdict
item 2) so cumulative driver coverage could reach 269/269 before the
board moves again.  New operators built during round 7 therefore land
HERE, with the full gate contract — Spark implementation, hand-written
DuckDB oracle, pytest parity enrollment (tests/test_staged_gates.py) —
and are merged into the live registry (queries.py) at the top of round
8 by appending ``STAGED_REGISTRY`` to the update chain.

Everything in this file follows the conventions of queries_pipeline.py:
identical column aliases on both sides, exact integer arithmetic (micro
units, 128-bit via DECIMAL(38,0)/HUGEINT where products can wrap), and
the floor(x·1e6 + 0.5) quantization recipe for the ln()-based gates
(the seeded-Laplace DP pair).
"""

from __future__ import annotations

from pyspark.sql import functions as F


def _t(spark, sf_dir, name):
    # local twin of queries._t — queries.py imports this module at its
    # end (the round-8 registry merge), so a top-level import back into
    # queries would be circular when queries_staged loads first
    from .graph import load_tables

    return load_tables(spark, sf_dir)[name]

_TOKS = r"list_filter(string_split_regex(text, '\s+'), t -> t <> '')"


# --------------------------------------------------------------------------
# txt_gopher_quality — Gopher rule battery (Rae et al. '21 §A1.1)
# --------------------------------------------------------------------------


def q_txt_gopher_quality(spark, sf_dir):
    """Gopher quality-rule battery over the corpus: per-document rule
    measurements + failure bitmask + keep flag (operators/text.py
    gopher_quality).  Thresholds are tuned to the fixture's word-soup
    profile (min_words=20 / mean-len ≥ 4.0 / ≥ 1 stopword instead of
    the paper's 50 / 3.0 / 2) so bits 1, 4 and 64 all split the corpus
    and BOTH the keep and the drop path carry driver data; the rule set
    and bit layout are the paper's."""
    from .operators.text import gopher_quality

    docs = _t(spark, sf_dir, "documents")
    # no orderBy: the driver's value-hash is order-insensitive and a
    # global sort is the only shuffle a pure row-map would otherwise pay
    # (the id-sorted probe read 14.1x at 10x data; map-only is ~10x)
    return gopher_quality(
        docs,
        "doc_id",
        "text",
        min_words=20,
        min_mean_word_len_micro=4_000_000,
        min_stop_hits=1,
    )


O_TXT_GOPHER_QUALITY = f"""
WITH toks AS (
  SELECT doc_id, text, {_TOKS} AS tk FROM documents
), m AS (
  SELECT doc_id,
         len(tk) AS n_words,
         greatest(len(tk), 1) AS s,
         COALESCE(list_sum(list_transform(tk, w -> len(w))), 0) AS total,
         len(text) - len(replace(text, '#', '')) AS hash_chars,
         (len(text) - len(replace(text, '...', ''))) // 3 AS ell,
         len(list_filter(tk, w -> regexp_matches(w, '[a-zA-Z]'))) AS alpha,
         (CASE WHEN list_contains(tk, 'the')  THEN 1 ELSE 0 END
        + CASE WHEN list_contains(tk, 'be')   THEN 1 ELSE 0 END
        + CASE WHEN list_contains(tk, 'to')   THEN 1 ELSE 0 END
        + CASE WHEN list_contains(tk, 'of')   THEN 1 ELSE 0 END
        + CASE WHEN list_contains(tk, 'and')  THEN 1 ELSE 0 END
        + CASE WHEN list_contains(tk, 'that') THEN 1 ELSE 0 END
        + CASE WHEN list_contains(tk, 'have') THEN 1 ELSE 0 END
        + CASE WHEN list_contains(tk, 'with') THEN 1 ELSE 0 END) AS stop_hits
  FROM toks
), r AS (
  SELECT doc_id, n_words,
         (total * 1000000) // s AS mean_word_len_micro,
         ((hash_chars + ell) * 1000000) // s AS symbol_ratio_micro,
         (alpha * 1000000) // s AS alpha_word_frac_micro,
         stop_hits
  FROM m
), k AS (
  SELECT *,
         (CASE WHEN n_words < 20 THEN 1 ELSE 0 END
        + CASE WHEN n_words > 100000 THEN 2 ELSE 0 END
        + CASE WHEN mean_word_len_micro < 4000000 THEN 4 ELSE 0 END
        + CASE WHEN mean_word_len_micro > 10000000 THEN 8 ELSE 0 END
        + CASE WHEN symbol_ratio_micro > 100000 THEN 16 ELSE 0 END
        + CASE WHEN alpha_word_frac_micro < 800000 THEN 32 ELSE 0 END
        + CASE WHEN stop_hits < 1 THEN 64 ELSE 0 END) AS fail_mask
  FROM r
)
SELECT CAST(doc_id AS BIGINT) AS doc_id,
       CAST(n_words AS BIGINT) AS n_words,
       CAST(mean_word_len_micro AS BIGINT) AS mean_word_len_micro,
       CAST(symbol_ratio_micro AS BIGINT) AS symbol_ratio_micro,
       CAST(alpha_word_frac_micro AS BIGINT) AS alpha_word_frac_micro,
       CAST(stop_hits AS BIGINT) AS stop_hits,
       CAST(fail_mask AS BIGINT) AS fail_mask,
       fail_mask = 0 AS keep
FROM k ORDER BY doc_id
"""


# --------------------------------------------------------------------------
# profile_drift_ks — two-sample KS statistic, exact integers
# --------------------------------------------------------------------------


def q_profile_drift_ks(spark, sf_dir):
    """Two-sample KS drift statistic on the same snapshot split as the
    PSI gate (reference = even doc_ids at true length band, current =
    odd doc_ids with simulated +25% growth): where profile_drift_psi
    weights all buckets, KS pins the single worst CDF gap — exact
    integer cross-multiplication, no smoothing, no ln
    (operators/profiling.py ks_drift)."""
    from .operators.profiling import ks_drift

    docs = _t(spark, sf_dir, "documents")
    ref = docs.where(F.col("doc_id") % 2 == 0).select(
        F.expr("n_chars div 200").alias("band")
    )
    cur = docs.where(F.col("doc_id") % 2 == 1).select(
        F.expr("(n_chars * 5) div 800").alias("band")
    )
    return ks_drift(ref, cur, "band")


O_PROFILE_DRIFT_KS = """
WITH r AS (
  -- n_chars IS NOT NULL mirrors ks_drift's NULL-bucket exclusion
  SELECT n_chars // 200 AS bucket, count(*) AS n_ref
  FROM documents WHERE doc_id % 2 = 0 AND n_chars IS NOT NULL GROUP BY 1
),
c AS (
  SELECT (n_chars * 5) // 800 AS bucket, count(*) AS n_cur
  FROM documents WHERE doc_id % 2 = 1 AND n_chars IS NOT NULL GROUP BY 1
),
j AS (
  SELECT COALESCE(r.bucket, c.bucket) AS bucket,
         COALESCE(n_ref, 0) AS n_ref, COALESCE(n_cur, 0) AS n_cur
  FROM r FULL OUTER JOIN c ON r.bucket = c.bucket
),
t AS (
  SELECT *,
         sum(n_ref) OVER () AS tref, sum(n_cur) OVER () AS tcur,
         sum(n_ref) OVER (ORDER BY bucket ROWS UNBOUNDED PRECEDING) AS cref,
         sum(n_cur) OVER (ORDER BY bucket ROWS UNBOUNDED PRECEDING) AS ccur
  FROM j
),
p AS (
  SELECT bucket, n_ref, n_cur,
         CASE WHEN tref = 0 OR tcur = 0 THEN CAST(1000000 AS BIGINT)
         ELSE CAST((abs(CAST(cref AS HUGEINT) * CAST(tcur AS HUGEINT)
                 - CAST(ccur AS HUGEINT) * CAST(tref AS HUGEINT)) * 1000000)
              // (CAST(tref AS HUGEINT) * CAST(tcur AS HUGEINT))
              AS BIGINT) END AS ks_contrib_micro
  FROM t
)
SELECT CAST(bucket AS BIGINT) AS bucket,
       CAST(n_ref AS BIGINT) AS n_ref, CAST(n_cur AS BIGINT) AS n_cur,
       ks_contrib_micro,
       CAST(max(ks_contrib_micro) OVER () AS BIGINT) AS ks_stat_micro
FROM p ORDER BY bucket
"""


# --------------------------------------------------------------------------
# privacy_dp_counts — seeded Laplace mechanism
# --------------------------------------------------------------------------


def q_privacy_dp_counts(spark, sf_dir):
    """ε=1 differentially-private (lang, source) histogram of the corpus
    via the seeded Laplace mechanism (operators/privacy.py
    dp_group_counts) — completes the privacy family (k-anon /
    suppression / l-diversity / t-closeness audit the RELEASE SHAPE;
    this gate exercises the noising step).  The default public salt
    makes this a reproducible SIMULATION of the mechanism for
    engine-parity testing, not a private release — see the operator
    docstring.  True counts ride along as audit columns for the parity
    check."""
    from .operators.privacy import dp_group_counts

    docs = _t(spark, sf_dir, "documents")
    return dp_group_counts(docs, ["lang", "source"])


_TWO60 = 1 << 60


def _sql_enc(col: str) -> str:
    """Mirror of privacy._seed_component: NULL → 'n', value →
    'v<charlen>:<value>' — NULL-safe ('' || NULL would poison the key)
    and collision-free across distinct group tuples."""
    return (
        f"CASE WHEN {col} IS NULL THEN 'n'"
        f" ELSE 'v' || length(CAST({col} AS VARCHAR)) || ':'"
        f" || CAST({col} AS VARCHAR) END"
    )


O_PRIVACY_DP_COUNTS = f"""
WITH a AS (
  SELECT lang AS g0, source AS g1, count(*) AS n
  FROM documents GROUP BY 1, 2
),
h AS (
  SELECT g0, g1, n,
         CAST(('0x' || substr(md5('dp:' || {_sql_enc('g0')} || ':'
                                  || {_sql_enc('g1')}), 1, 15))
              AS BIGINT) AS hh
  FROM a
),
p AS (
  SELECT g0, g1, n,
         CAST(floor((
           -(1000000.0 / 1000000)
           * sign(2 * hh - {_TWO60})
           * ln(CAST(greatest({_TWO60} - abs(2 * hh - {_TWO60}), 1) AS DOUBLE)
                / CAST({_TWO60} AS DOUBLE))
         ) * 1000000.0 + 0.5) AS BIGINT) AS noise_micro
  FROM h
)
SELECT g0, g1, CAST(n AS BIGINT) AS n, noise_micro,
       CAST(n * 1000000 + noise_micro AS BIGINT) AS noisy_count_micro
FROM p ORDER BY g0, g1
"""


# --------------------------------------------------------------------------
# sketch_ams_f2 — AMS tug-of-war second moment
# --------------------------------------------------------------------------


def q_sketch_ams_f2(spark, sf_dir):
    """AMS F₂ sketch over the corpus token-frequency vector (k=16
    estimators, seeded signs) with the exact F₂ and relative error
    carried — the self-join-size estimator, completing the sketch
    family (HLL=F₀, CM=point frequency, KMV=distinct/overlap, AMS=F₂)
    (operators/sketches.py ams_f2)."""
    from .operators.sketches import ams_f2

    docs = _t(spark, sf_dir, "documents")
    tok = docs.select(
        F.explode(
            F.filter(F.split("text", r"\s+"), lambda t: t != F.lit(""))
        ).alias("tok")
    )
    return ams_f2(tok, "tok", k=16)


O_SKETCH_AMS_F2 = f"""
WITH tok AS (
  SELECT unnest({_TOKS}) AS v FROM documents
),
freq AS (SELECT v, count(*) AS f FROM tok GROUP BY v),
sgn AS (
  SELECT i, v, f,
         1 - 2 * (CAST(('0x' || substr(md5('ams:' || i || ':' || v), 1, 15))
                       AS BIGINT) % 2) AS s
  FROM freq, (SELECT unnest(range(0, 16)) AS i)
),
per AS (SELECT i, CAST(sum(s * f) AS BIGINT) AS s_i FROM sgn GROUP BY i),
sq AS (
  SELECT i, s_i, CAST(s_i AS HUGEINT) * CAST(s_i AS HUGEINT) AS est_d
  FROM per
),
ex AS (
  SELECT sum(CAST(f AS HUGEINT) * CAST(f AS HUGEINT)) AS f2_d FROM freq
),
m AS (
  SELECT sq.*, f2_d, (sum(est_d) OVER ()) // 16 AS mean_d FROM sq, ex
)
SELECT CAST(i AS BIGINT) AS estimator, s_i,
       CAST(est_d AS BIGINT) AS est,
       CAST(mean_d AS BIGINT) AS f2_est_mean,
       CAST(f2_d AS BIGINT) AS f2_exact,
       CAST((abs(mean_d - f2_d) * 1000000) // f2_d AS BIGINT) AS rel_err_micro
FROM m ORDER BY estimator
"""


STAGED_REGISTRY: dict[str, tuple] = {
    "txt_gopher_quality": (q_txt_gopher_quality, O_TXT_GOPHER_QUALITY),
    "profile_drift_ks": (q_profile_drift_ks, O_PROFILE_DRIFT_KS),
    "privacy_dp_counts": (q_privacy_dp_counts, O_PRIVACY_DP_COUNTS),
    "sketch_ams_f2": (q_sketch_ams_f2, O_SKETCH_AMS_F2),
}


# --------------------------------------------------------------------------
# graph_ktruss — triangle-support peeling
# --------------------------------------------------------------------------


def q_graph_ktruss(spark, sf_dir):
    """3-truss of the fixture graph augmented with customer/supplier →
    region shortcuts (the same graph as graph_triangles: the base layered
    DAG has zero triangles; each shortcut closes one through its nation
    and region).  Every surviving edge must sit in ≥ 1 triangle, so the
    peel removes the whole part↔supplier / customer→part supply
    machinery in round 1 and keeps exactly the membership triangles,
    with the (nation, region) edges' support = nation population —
    varied, data-derived values, not a constant (operators/
    graph_algos.py ktruss_peel; oracle unrolls identical rounds).
    Completes the cohesion ladder: degree (k-core) → triangle support
    (k-truss); the multi-round CASCADE path is pinned by the pytest
    triangle-chain case (tests/test_staged_gates.py).  rounds=1 because
    k=3 reaches its fixpoint in ONE peel by construction — every edge of
    a triangle is kept alive by that same triangle, so survivors'
    supports cannot drop; deeper k (pytest) is where extra rounds do
    work."""
    from .operators.graph_algos import ktruss_peel

    from .queries import fixture

    g = fixture(spark, sf_dir)
    rel = F.get_json_object("details", "$.rel")
    e = g.edges.select("src_key", "dst_key")
    to_nation = g.edges.where(rel == "in_nation").select(
        F.col("src_key").alias("x"), F.col("dst_key").alias("n")
    )
    to_region = g.edges.where(rel == "in_region").select(
        F.col("src_key").alias("n"), F.col("dst_key").alias("r")
    )
    shortcuts = to_nation.join(F.broadcast(to_region), "n").select(
        F.col("x").alias("src_key"), F.col("r").alias("dst_key")
    )
    aug = e.unionByName(shortcuts).select(
        F.col("src_key").alias("a"), F.col("dst_key").alias("b")
    )
    return ktruss_peel(aug, k=3, rounds=1)


def _ktruss_oracle(k: int = 3, rounds: int = 1) -> str:
    # every CTE is MATERIALIZED: DuckDB inlines plain CTEs, and the
    # round-over-round references here would expand u0 exponentially
    # (~4^rounds parquet rescans — it exhausted the fd limit in testing)
    sql = """
WITH e AS MATERIALIZED (
  SELECT 'customer:' || c_custkey AS s, 'nation:' || c_nationkey AS d FROM customer
  UNION ALL SELECT 'supplier:' || s_suppkey, 'nation:' || s_nationkey FROM supplier
  UNION ALL SELECT 'nation:' || n_nationkey, 'region:' || n_regionkey FROM nation
  UNION ALL SELECT DISTINCT 'customer:' || o_custkey, 'part:' || l_partkey
            FROM orders JOIN lineitem ON o_orderkey = l_orderkey
  UNION ALL SELECT DISTINCT 'part:' || l_partkey, 'supplier:' || l_suppkey FROM lineitem
  UNION ALL SELECT 'customer:' || c_custkey, 'region:' || n_regionkey
            FROM customer JOIN nation ON c_nationkey = n_nationkey
  UNION ALL SELECT 'supplier:' || s_suppkey, 'region:' || n_regionkey
            FROM supplier JOIN nation ON s_nationkey = n_nationkey
),
u0 AS MATERIALIZED (
  SELECT DISTINCT least(s, d) AS a, greatest(s, d) AS b FROM e WHERE s <> d
)"""
    prev = "u0"
    for r in list(range(1, rounds + 1)) + ["f"]:
        cur = f"u{r}" if r != "f" else None
        sql += f""",
t{r} AS MATERIALIZED (SELECT e1.a AS x, e1.b AS y, e2.b AS z
         FROM {prev} e1 JOIN {prev} e2 ON e2.a = e1.b
              JOIN {prev} e3 ON e3.a = e1.a AND e3.b = e2.b),
s{r} AS MATERIALIZED (SELECT a, b, count(*) AS sup FROM (
           SELECT x AS a, y AS b FROM t{r}
           UNION ALL SELECT y, z FROM t{r}
           UNION ALL SELECT x, z FROM t{r}) GROUP BY a, b)"""
        if cur:
            sql += f""",
{cur} AS MATERIALIZED (SELECT {prev}.a, {prev}.b FROM {prev}
          LEFT JOIN s{r} ON s{r}.a = {prev}.a AND s{r}.b = {prev}.b
          WHERE COALESCE(sup, 0) >= {k - 2})"""
            prev = cur
    sql += f"""
SELECT {prev}.a, {prev}.b, CAST(COALESCE(sup, 0) AS BIGINT) AS support
FROM {prev} LEFT JOIN sf ON sf.a = {prev}.a AND sf.b = {prev}.b
ORDER BY {prev}.a, {prev}.b"""
    return sql


O_GRAPH_KTRUSS = _ktruss_oracle()

STAGED_REGISTRY["graph_ktruss"] = (q_graph_ktruss, O_GRAPH_KTRUSS)


# --------------------------------------------------------------------------
# sample_kcenter_coreset — greedy farthest-point diversity selection
# --------------------------------------------------------------------------


def q_sample_kcenter_coreset(spark, sf_dir):
    """Greedy k-center coreset (k=8) over the embeddings table — the
    diversity-maximizing subset selection used for annotation batches
    and eval coresets (operators/similarity.py kcenter_coreset; Gonzalez
    '85 / Sener & Savarese '18).  The oracle unrolls the identical 8
    selection rounds with MATERIALIZED CTEs and replays the argmax
    (dmin desc, id asc) bit-for-bit via the family's sequential-fold +
    round-6dp recipe."""
    from .operators.similarity import kcenter_coreset

    emb = _t(spark, sf_dir, "embeddings")
    return kcenter_coreset(emb, "vec_id", "embedding", k=8)


def _kcenter_oracle(k: int = 8) -> str:
    def rawcos(a: str, b: str) -> str:
        na = f"sqrt(list_sum(list_transform({a}, x -> x * x)))"
        nb = f"sqrt(list_sum(list_transform({b}, x -> x * x)))"
        dot = (
            f"list_sum(list_transform(range(1, len({a}) + 1),"
            f" i -> {a}[CAST(i AS INT)] * {b}[CAST(i AS INT)]))"
        )
        return (
            f"CASE WHEN {na} * {nb} = 0 THEN 0.0"
            f" ELSE {dot} / ({na} * {nb}) END"
        )

    def dist(a: str, b: str) -> str:
        return f"round(1.0 - ({rawcos(a, b)}), 6)"

    sql = f"""
WITH v AS MATERIALIZED (
  SELECT CAST(vec_id AS BIGINT) AS id,
         list_transform(embedding, x -> CAST(x AS DOUBLE)) AS vec
  FROM embeddings
),
c0 AS MATERIALIZED (SELECT id, vec FROM v ORDER BY id LIMIT 1),
d0 AS MATERIALIZED (
  SELECT v.id, v.vec, {dist('v.vec', 'c0.vec')} AS dmin FROM v, c0
)"""
    for r in range(1, k):
        excl = " UNION ALL ".join(f"SELECT id FROM c{i}" for i in range(r))
        sql += f""",
c{r} AS MATERIALIZED (
  SELECT id, vec, dmin FROM d{r - 1}
  WHERE id NOT IN ({excl})
  ORDER BY dmin DESC, id LIMIT 1
)"""
        if r < k - 1:
            sql += f""",
d{r} AS MATERIALIZED (
  SELECT d{r - 1}.id, d{r - 1}.vec,
         least(d{r - 1}.dmin, {dist(f'd{r - 1}.vec', f'c{r}.vec')}) AS dmin
  FROM d{r - 1}, c{r}
)"""
    parts = ["SELECT CAST(0 AS BIGINT) AS rank, id, CAST(NULL AS DOUBLE) AS dist FROM c0"]
    parts += [
        f"SELECT CAST({r} AS BIGINT), id, dmin FROM c{r}" for r in range(1, k)
    ]
    sql += "\n" + "\nUNION ALL ".join(parts) + "\nORDER BY rank"
    return sql


O_SAMPLE_KCENTER = _kcenter_oracle()

STAGED_REGISTRY["sample_kcenter_coreset"] = (
    q_sample_kcenter_coreset,
    O_SAMPLE_KCENTER,
)


# --------------------------------------------------------------------------
# privacy_dp_mean — seeded Laplace clipped-mean release
# --------------------------------------------------------------------------


def q_privacy_dp_mean(spark, sf_dir):
    """ε=1 differentially-private mean document length per source —
    clipped to [0, 400] chars, budget split ε/2 sum + ε/2 count
    (operators/privacy.py dp_group_mean).  Extends privacy_dp_counts
    from histogram release to the clipped-mean mechanism (Dwork & Roth
    §3.4); true n / clipped sum ride as audit columns."""
    from .operators.privacy import dp_group_mean

    docs = _t(spark, sf_dir, "documents")
    return dp_group_mean(docs, ["source"], "n_chars", lo=0.0, hi=400.0)


O_PRIVACY_DP_MEAN = f"""
WITH a AS (
  SELECT source AS g0, count(*) AS n,
         CAST(sum(CAST(round(100 * least(greatest(CAST(n_chars AS DOUBLE), 0.0),
                                         400.0)) AS BIGINT)) AS BIGINT)
           AS sum_clipped_cents
  FROM documents GROUP BY 1
),
h AS (
  SELECT g0, n, sum_clipped_cents,
         CAST(('0x' || substr(md5('dpm:sum:' || {_sql_enc('g0')}), 1, 15))
              AS BIGINT) AS hs,
         CAST(('0x' || substr(md5('dpm:cnt:' || {_sql_enc('g0')}), 1, 15))
              AS BIGINT) AS hc
  FROM a
),
p AS (
  SELECT g0, n, sum_clipped_cents,
         CAST(floor((
           -(80000.0)
           * sign(2 * hs - {_TWO60})
           * ln(CAST(greatest({_TWO60} - abs(2 * hs - {_TWO60}), 1) AS DOUBLE)
                / CAST({_TWO60} AS DOUBLE))
         ) * 1000000.0 + 0.5) AS BIGINT) AS noise_sum_micro,
         CAST(floor((
           -(2.0)
           * sign(2 * hc - {_TWO60})
           * ln(CAST(greatest({_TWO60} - abs(2 * hc - {_TWO60}), 1) AS DOUBLE)
                / CAST({_TWO60} AS DOUBLE))
         ) * 1000000.0 + 0.5) AS BIGINT) AS noise_cnt_micro
  FROM h
)
SELECT g0, CAST(n AS BIGINT) AS n, sum_clipped_cents,
       noise_sum_micro, noise_cnt_micro,
       CASE WHEN (n * 1000000 + noise_cnt_micro) <= 0 THEN NULL
       ELSE CAST(greatest(CAST(sum_clipped_cents AS HUGEINT) * 1000000
                          + CAST(noise_sum_micro AS HUGEINT),
                          CAST(0 AS HUGEINT)) * 10
            // (CAST(n AS HUGEINT) * 1000000
                + CAST(noise_cnt_micro AS HUGEINT)) AS BIGINT) END
         AS dp_mean_milli
FROM p ORDER BY g0
"""

STAGED_REGISTRY["privacy_dp_mean"] = (q_privacy_dp_mean, O_PRIVACY_DP_MEAN)


# --------------------------------------------------------------------------
# clean_url_canon — URL canonicalization for crawl dedup
# --------------------------------------------------------------------------


def q_clean_url_canon(spark, sf_dir):
    """URL canonicalization → dedup counts: five deterministic messy-URL
    variants per document (case/port/fragment/tracking/param-order noise
    synthesized from doc_id/source/lang — both engines build identical
    strings) collapse to their canonical forms
    (operators/text.py url_canonicalize); variant pairs 0≡1 and 2≡3 must
    merge, the ftp variant must pass through untouched.  The crawl-dedup
    primitive the corpus tables can't otherwise exercise (no URL
    column)."""
    from .operators.text import url_canonicalize

    docs = _t(spark, sf_dir, "documents")
    u = docs.withColumn(
        "url",
        F.expr(
            "case cast(doc_id % 5 as int)"
            " when 0 then 'HTTPS://Example.COM:443/s/' || source ||"
            "   '?utm_source=feed&b=2&a=1#frag'"
            " when 1 then 'https://example.com/s/' || source || '?a=1&b=2'"
            " when 2 then 'HTTP://Example.com:80/l/' || lang"
            " when 3 then 'http://example.com/l/' || lang || '#x'"
            " else 'ftp://archive.example/' || source end"
        ),
    )
    return (
        u.select(url_canonicalize("url").alias("canon_url"))
        .groupBy("canon_url")
        .agg(F.count("*").cast("long").alias("n_docs"))
        .orderBy("canon_url")
    )


_URL_RE_SQL = r"^(?i)(https?)://([^/?#]+)([^?#]*)(?:\?([^#]*))?(?:#.*)?$"

O_CLEAN_URL_CANON = f"""
WITH u AS (
  SELECT CASE CAST(doc_id % 5 AS INT)
    WHEN 0 THEN 'HTTPS://Example.COM:443/s/' || source ||
      '?utm_source=feed&b=2&a=1#frag'
    WHEN 1 THEN 'https://example.com/s/' || source || '?a=1&b=2'
    WHEN 2 THEN 'HTTP://Example.com:80/l/' || lang
    WHEN 3 THEN 'http://example.com/l/' || lang || '#x'
    ELSE 'ftp://archive.example/' || source END AS url
  FROM documents
),
p AS (
  SELECT url,
         lower(regexp_extract(url, '{_URL_RE_SQL}', 1)) AS scheme,
         lower(regexp_extract(url, '{_URL_RE_SQL}', 2)) AS host0,
         regexp_extract(url, '{_URL_RE_SQL}', 3) AS path0,
         -- COALESCE: DuckDB's array_to_string([]) is NULL where Spark's
         -- array_join([]) is '' — the no-query path must not poison concat
         COALESCE(array_to_string(list_sort(list_filter(
           string_split(regexp_extract(url, '{_URL_RE_SQL}', 4), '&'),
           q -> q <> '' AND NOT starts_with(split_part(q, '=', 1), 'utm_')
                AND split_part(q, '=', 1)
                    NOT IN ('fbclid', 'gclid', 'msclkid', 'ref'))), '&'), '')
           AS qs
  FROM u
),
c AS (
  SELECT CASE WHEN regexp_matches(url, '^(?i)https?://') THEN
           scheme || '://' ||
           CASE scheme
             WHEN 'http'  THEN regexp_replace(host0, ':80$', '')
             WHEN 'https' THEN regexp_replace(host0, ':443$', '')
             ELSE host0 END ||
           CASE WHEN path0 = '' THEN '/' ELSE path0 END ||
           CASE WHEN qs = '' THEN '' ELSE '?' || qs END
         ELSE url END AS canon_url
  FROM p
)
SELECT canon_url, CAST(count(*) AS BIGINT) AS n_docs
FROM c GROUP BY 1 ORDER BY 1
"""

STAGED_REGISTRY["clean_url_canon"] = (q_clean_url_canon, O_CLEAN_URL_CANON)


# --------------------------------------------------------------------------
# evt_diff_in_diff — 2×2 causal effect estimate
# --------------------------------------------------------------------------


def q_evt_diff_in_diff(spark, sf_dir):
    """Difference-in-differences over the event stream: treated cohort =
    odd user_ids, intervention at 2024-01-16 (the series midpoint),
    outcome = event value in exact cents (operators/behavior.py
    diff_in_diff).  Complements evt_ab_test's randomized same-period
    comparison with the observational pre/post design; four cell rows +
    the carried did_milli effect."""
    from .operators.behavior import diff_in_diff

    ev = _t(spark, sf_dir, "events")
    return diff_in_diff(
        ev,
        F.when(F.col("user_id") % 2 == 1, F.lit("treat")).otherwise("control"),
        F.when(F.col("ts") < F.lit("2024-01-16").cast("timestamp"), F.lit("pre")).otherwise("post"),
        "value",
    )


O_EVT_DIFF_IN_DIFF = """
WITH cells AS (
  SELECT CASE WHEN ts < TIMESTAMP '2024-01-16' THEN 'pre' ELSE 'post' END AS period,
         CASE WHEN user_id % 2 = 1 THEN 'treat' ELSE 'control' END AS cohort,
         CAST(round(100 * value) AS BIGINT) AS cents
  FROM events
),
agg AS (
  SELECT period, cohort, CAST(count(*) AS BIGINT) AS n,
         CAST(sum(cents) AS BIGINT) AS sum_cents
  FROM cells GROUP BY 1, 2
),
m AS (SELECT *, (sum_cents * 10) // n AS mean_milli FROM agg),
eff AS (
  SELECT CAST(
    (max(CASE WHEN period = 'post' AND cohort = 'treat' THEN mean_milli END)
     - max(CASE WHEN period = 'pre' AND cohort = 'treat' THEN mean_milli END))
    - (max(CASE WHEN period = 'post' AND cohort = 'control' THEN mean_milli END)
       - max(CASE WHEN period = 'pre' AND cohort = 'control' THEN mean_milli END))
    AS BIGINT) AS did_milli
  FROM m
)
SELECT period, cohort, n, sum_cents,
       CAST(mean_milli AS BIGINT) AS mean_milli, did_milli
FROM m, eff ORDER BY period, cohort
"""

STAGED_REGISTRY["evt_diff_in_diff"] = (q_evt_diff_in_diff, O_EVT_DIFF_IN_DIFF)
