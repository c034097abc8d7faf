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
    # pre_deduped=True was TRIED and measured SLOWER in order-alternating
    # same-session A/B at sf0.1 (old 7.1/8.0/8.2 s vs new 9.7/12.5 s,
    # quiet host): the aug pair set is provably duplicate-free (the
    # harmonic/betweenness structural proof), but the distinct's shuffle
    # also re-partitions the 67-small-partition cached-edge projection
    # into 16 compact AQE-coalesced partitions, and the wedge self-join
    # downstream is worth more than the dedup costs.  Keep the distinct.
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


# ===========================================================================
# Round-9 staging (merge at round 10): STAGED_R9_REGISTRY
#
# Per the round-8 verdict (item 5): new operators land HERE with the full
# gate contract — Spark implementation, hand-written DuckDB oracle, pytest
# enrollment (tests/test_staged_gates.py), 10× scale probe BEFORE staging —
# and are NOT merged into the live registry this round (tools/
# verify_sweep.py --staged proves them in the same fresh-process session).
# ===========================================================================

STAGED_R9_REGISTRY: dict[str, tuple] = {}


# --------------------------------------------------------------------------
# dedup_hamming64_pairs — 64-bit simhash + multi-index Hamming-radius join
# --------------------------------------------------------------------------


def q_dedup_hamming64_pairs(spark, sf_dir):
    """Hamming-radius-≤3 pairs over 64-BIT simhash codes via the
    Manku-Jain-Das Sarma multi-index trick (4×16-bit bands as exact join
    keys; pigeonhole makes radius ≤ 3 exact) — operators/dedup.py
    simhash64 + hamming64_pairs.  The corpus is documents ∪ two planted
    families: near-copies (' qq' appended, doc_id%25==0, +1000000) and
    exact copies (doc_id%25==13, +2000000), so the gate exercises
    hamming 0 and small-positive distances on any corpus.  Band hot
    buckets are df-capped at 20 (mirrored)."""
    from .operators.dedup import hamming64_pairs, shingle_table, simhash64
    from .queries_pipeline import doc_shingles

    docs = _t(spark, sf_dir, "documents")
    # Assemble the union's shingle table from the SHARED cached corpus
    # shingle table instead of re-normalizing + re-exploding + re-hashing
    # the whole tripled corpus (guide §2.4 — don't recompute a derived
    # table the session already materialized): the base family IS
    # doc_shingles; the exact-copy family (+2000000, text unchanged) has
    # the identical shingle rows under the shifted id; only the
    # near-copies (4 % of docs, text actually modified) are re-shingled.
    # The shingle multiset per id is unchanged, so simhash64 — and the
    # declared result — are bit-identical.
    base_sh = doc_shingles(spark, sf_dir)
    near_sh = shingle_table(
        docs.where("doc_id % 25 = 0").selectExpr(
            "doc_id + 1000000 as id", "text || ' qq' as text"
        ),
        "id",
        "text",
    )
    shingles = base_sh.unionByName(
        base_sh.where("id % 25 = 13").selectExpr(
            "id + 2000000 as id", "shingle", "h"
        )
    ).unionByName(near_sh)
    sh = simhash64(docs.selectExpr("doc_id as id", "text"), "id", "text",
                   shingles=shingles)
    return hamming64_pairs(sh, radius=3, max_band_df=20).orderBy(
        "id_a", "id_b"
    )


def _hamming64_oracle() -> str:
    from .operators.dedup import SHINGLE_LEN

    n = SHINGLE_LEN
    sums = ",\n         ".join(
        f"sum((h{half} >> {i}) & 1) AS {half}b{i}"
        for half in ("h", "l")
        for i in range(32)
    )
    fp = {
        half: " + ".join(
            f"(CASE WHEN {half}b{i} * 2 > n THEN CAST({1 << i} AS BIGINT)"
            f" ELSE 0 END)"
            for i in range(32)
        )
        for half in ("h", "l")
    }
    return f"""
WITH uni AS (
  SELECT doc_id AS id, text FROM documents
  UNION ALL
  SELECT doc_id + 1000000, text || ' qq' FROM documents WHERE doc_id % 25 = 0
  UNION ALL
  SELECT doc_id + 2000000, text FROM documents WHERE doc_id % 25 = 13
),
norm AS (
  SELECT id, trim(regexp_replace(lower(text), '\\s+', ' ', 'g')) AS t
  FROM uni
),
sh AS (
  SELECT id, unnest(list_distinct(list_transform(
           range(1, greatest(len(t) - {n - 1}, 0) + 1),
           i -> substr(t, CAST(i AS INT), {n})))) AS shingle
  FROM norm
),
hashed AS (
  SELECT id, CAST(('0x' || substr(md5(shingle), 1, 8)) AS BIGINT) AS hh,
         CAST(('0x' || substr(md5(shingle), 9, 8)) AS BIGINT) AS hl
  FROM sh
),
sums AS (
  SELECT id,
         {sums},
         count(*) AS n
  FROM hashed GROUP BY id
),
simh AS (SELECT id, {fp['h']} AS sh_hi, {fp['l']} AS sh_lo FROM sums),
blk AS (
  SELECT id, sh_hi, sh_lo, t.b AS blk,
         CASE t.b WHEN 0 THEN (sh_hi >> 16) & 65535
                  WHEN 1 THEN sh_hi & 65535
                  WHEN 2 THEN (sh_lo >> 16) & 65535
                  ELSE sh_lo & 65535 END AS val
  FROM simh, (SELECT unnest(range(0, 4)) AS b) t
),
cap AS (SELECT blk, val FROM blk GROUP BY blk, val HAVING count(*) <= 20),
kept AS (SELECT blk.* FROM blk JOIN cap USING (blk, val))
SELECT DISTINCT a.id AS id_a, b.id AS id_b,
       CAST(bit_count(xor(a.sh_hi, b.sh_hi))
            + bit_count(xor(a.sh_lo, b.sh_lo)) AS INT) AS hamming
FROM kept a JOIN kept b ON a.blk = b.blk AND a.val = b.val AND a.id < b.id
WHERE bit_count(xor(a.sh_hi, b.sh_hi)) + bit_count(xor(a.sh_lo, b.sh_lo)) <= 3
ORDER BY id_a, id_b
"""


STAGED_R9_REGISTRY["dedup_hamming64_pairs"] = (
    q_dedup_hamming64_pairs,
    _hamming64_oracle(),
)


# --------------------------------------------------------------------------
# rag_fusion_weighted — CombMNZ score fusion of BM25 + cosine top lists
# --------------------------------------------------------------------------


def q_rag_fusion_weighted(spark, sf_dir):
    """Weighted CombMNZ score fusion of BM25 top-50 (lexical) and cosine
    top-50 (semantic) into one top-15 (operators/ranking.py
    weighted_fusion) — the score-preserving complement to
    rag_hybrid_rrf's rank-only fusion: min-max-normalized integer scores,
    weights 700/300 milli, hit-count (MNZ) boost.  Same retriever pair
    and fixtures as rag_hybrid_rrf, so the two gates are directly
    comparable."""
    from .operators import ranking, similarity
    from .queries_pipeline import QUERY_VEC, _BM25_TERMS

    docs = _t(spark, sf_dir, "documents")
    emb = _t(spark, sf_dir, "embeddings")
    lex = ranking.bm25_topk(docs, "doc_id", "text", _BM25_TERMS, k=50).select(
        F.col("doc_id").alias("id"),
        F.expr("cast(round(score * 1000000) as bigint)").alias("score_micro"),
    )
    sem = similarity.cosine_topk(emb, "vec_id", "embedding", QUERY_VEC, k=50).select(
        "id",
        F.expr("cast(round(cosine * 1000000) as bigint)").alias("score_micro"),
    )
    return ranking.weighted_fusion([(lex, 700), (sem, 300)], k=15, mnz=True)


def _fusion_oracle() -> str:
    from .operators import ranking
    from .queries_pipeline import _BM25_TERMS, _QV_SQL

    bm25 = ranking.bm25_oracle_sql("documents", "doc_id", "text", _BM25_TERMS, k=50)
    return f"""
WITH lex AS ({bm25}),
lex0 AS (SELECT doc_id AS id, CAST(round(score * 1000000) AS BIGINT) AS s
         FROM lex),
lexmm AS (SELECT min(s) AS mn, max(s) AS mx FROM lex0),
lexn AS (
  SELECT id, CAST(CASE WHEN mx = mn THEN 1000000
                       ELSE ((s - mn) * 1000000) // (mx - mn) END
                  AS BIGINT) * 700 AS part
  FROM lex0, lexmm
),
v AS (
  SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS vec
  FROM embeddings
), q AS (SELECT {_QV_SQL} AS qv),
sem AS (
  SELECT vec_id AS id,
         round(CASE WHEN sqrt(list_sum(list_transform(vec, x -> x * x))) * sqrt(list_sum(list_transform(qv, x -> x * x))) = 0 THEN 0.0 ELSE list_sum(list_transform(range(1, len(vec) + 1), i -> vec[CAST(i AS INT)] * qv[CAST(i AS INT)])) / (sqrt(list_sum(list_transform(vec, x -> x * x))) * sqrt(list_sum(list_transform(qv, x -> x * x)))) END, 6) AS cosine
  FROM v, q ORDER BY cosine DESC, vec_id LIMIT 50
),
sem0 AS (SELECT id, CAST(round(cosine * 1000000) AS BIGINT) AS s FROM sem),
semmm AS (SELECT min(s) AS mn, max(s) AS mx FROM sem0),
semn AS (
  SELECT id, CAST(CASE WHEN mx = mn THEN 1000000
                       ELSE ((s - mn) * 1000000) // (mx - mn) END
                  AS BIGINT) * 300 AS part
  FROM sem0, semmm
),
parts AS (SELECT * FROM lexn UNION ALL SELECT * FROM semn),
f AS (SELECT id, sum(part) AS wsum, CAST(count(*) AS BIGINT) AS n_lists
      FROM parts GROUP BY id)
SELECT id, CAST(wsum * n_lists AS BIGINT) AS fused_scaled, n_lists
FROM f ORDER BY fused_scaled DESC, id LIMIT 15
"""


STAGED_R9_REGISTRY["rag_fusion_weighted"] = (
    q_rag_fusion_weighted,
    _fusion_oracle(),
)


# --------------------------------------------------------------------------
# clean_isotonic_calibrate — monotone score calibration (min-max identity)
# --------------------------------------------------------------------------


def q_clean_isotonic_calibrate(spark, sf_dir):
    """Isotonic calibration of the event value (cents) against a
    deterministic noisy-monotone 0/1 label — operators/ranking.py
    calibrate_isotonic: 12 equal-width bins, exact min-max/PAVA fit in
    floor-quantized micro units.  The label rule abs(cents)%97 <
    20 + least(60, abs(cents) div 100) rises with the score (base rate
    ~20% climbing to ~80%), so the fit is a non-trivial increasing step
    function; abs() keeps %-and-div identical across engines on any sign."""
    from .operators.ranking import calibrate_isotonic

    ev = _t(spark, sf_dir, "events")
    scored = ev.select(
        F.expr("cast(round(100 * value) as bigint)").alias("s"),
    ).select(
        "s",
        F.expr(
            "case when (abs(s) % 97) < (20 + least(60, abs(s) div 100))"
            " then 1 else 0 end"
        ).alias("y"),
    )
    return calibrate_isotonic(scored, "s", "y", n_bins=12)


O_CLEAN_ISOTONIC = """
WITH base AS (
  SELECT s, CASE WHEN (abs(s) % 97) < (20 + least(60, abs(s) // 100))
                 THEN 1 ELSE 0 END AS y
  FROM (SELECT CAST(round(100 * value) AS BIGINT) AS s
        FROM events WHERE value IS NOT NULL)
  WHERE s IS NOT NULL
),
mm AS (SELECT min(s) AS lo, max(s) AS hi FROM base),
binned AS (
  SELECT CAST(least(11, ((s - lo) * 12) // (hi - lo + 1)) AS BIGINT) AS bin, y
  FROM base, mm
),
bins AS (
  SELECT bin, CAST(count(*) AS BIGINT) AS n, CAST(sum(y) AS BIGINT) AS pos
  FROM binned GROUP BY bin
),
pre AS (
  SELECT bin, n, pos,
         sum(n) OVER (ORDER BY bin) AS cn,
         sum(pos) OVER (ORDER BY bin) AS cs
  FROM bins
),
ij AS (
  SELECT i.bin AS i, j.bin AS j,
         ((j.cs - (i.cs - i.pos)) * 1000000) // (j.cn - (i.cn - i.n)) AS q
  FROM pre i JOIN pre j ON i.bin <= j.bin
),
mi AS (
  SELECT p.bin AS b, ij.i, min(ij.q) AS m
  FROM ij JOIN pre p ON ij.i <= p.bin AND ij.j >= p.bin
  GROUP BY p.bin, ij.i
),
fit AS (SELECT b, max(m) AS fm FROM mi GROUP BY b)
SELECT bins.bin, bins.n, bins.pos,
       CAST((bins.pos * 1000000) // bins.n AS BIGINT) AS rate_micro,
       CAST(fit.fm AS BIGINT) AS fit_micro
FROM bins JOIN fit ON bins.bin = fit.b
ORDER BY bin
"""

STAGED_R9_REGISTRY["clean_isotonic_calibrate"] = (
    q_clean_isotonic_calibrate,
    O_CLEAN_ISOTONIC,
)


# --------------------------------------------------------------------------
# txt_dup_structure — duplicate line/paragraph fractions (Gopher repetition)
# --------------------------------------------------------------------------


def q_txt_dup_structure(spark, sf_dir):
    """Duplicate-line / duplicate-paragraph fractions over four
    deterministic multi-line variants per document (repeated-line doc,
    repeated-paragraph doc, clean two-liner with fixed distinct
    prefixes, clean source/lang pair) — operators/text.py
    dup_structure_stats, the remaining half of Gopher §A1.1's repetition
    battery (repetition_stats holds the top-n-gram half).  Variants 0
    and 1 must fail (dup-line 50%, dup-para 33%); 2 and 3 must pass for
    ANY corpus (fixed distinct literals bracket the text slices)."""
    from .operators.text import dup_structure_stats

    docs = _t(spark, sf_dir, "documents")
    synth = docs.withColumn(
        "mtext",
        F.expr(
            "case cast(doc_id % 4 as int)"
            " when 0 then 'dup line' || chr(10) || 'dup line' || chr(10)"
            "   || 'dup line' || chr(10) || 'uniq ' || source"
            " when 1 then 'para one ' || lang || chr(10) || chr(10)"
            "   || 'same para' || chr(10) || chr(10) || 'same para'"
            " when 2 then 'x ' || substring(text, 1, 30) || ' y' || chr(10)"
            "   || 'z ' || substring(text, 31, 30) || ' w'"
            " else 'a ' || source || chr(10) || 'b ' || lang end"
        ),
    )
    return dup_structure_stats(synth, "doc_id", "mtext").orderBy("id")


O_TXT_DUP_STRUCTURE = r"""
WITH synth AS (
  SELECT doc_id AS id, CASE CAST(doc_id % 4 AS INT)
    WHEN 0 THEN 'dup line' || chr(10) || 'dup line' || chr(10)
      || 'dup line' || chr(10) || 'uniq ' || source
    WHEN 1 THEN 'para one ' || lang || chr(10) || chr(10)
      || 'same para' || chr(10) || chr(10) || 'same para'
    WHEN 2 THEN 'x ' || substr(text, 1, 30) || ' y' || chr(10)
      || 'z ' || substr(text, 31, 30) || ' w'
    ELSE 'a ' || source || chr(10) || 'b ' || lang END AS mtext
  FROM documents
),
lu AS (
  SELECT id, trim(regexp_replace(u, '\s+', ' ', 'g')) AS unit
  FROM (SELECT id, unnest(string_split_regex(mtext, '\n')) AS u FROM synth)
),
lf AS (
  SELECT id, unit, count(*) AS c, min(length(unit)) AS ln
  FROM lu WHERE unit <> '' GROUP BY id, unit
),
la AS (
  SELECT id, CAST(sum(c) AS BIGINT) AS n_lines,
         CAST(sum(c - 1) AS BIGINT) AS d,
         CAST(sum(c * ln) AS BIGINT) AS ch,
         CAST(sum((c - 1) * ln) AS BIGINT) AS dch
  FROM lf GROUP BY id
),
pu AS (
  SELECT id, trim(regexp_replace(u, '\s+', ' ', 'g')) AS unit
  FROM (SELECT id, unnest(string_split_regex(mtext, '\n{2,}')) AS u
        FROM synth)
),
pf AS (
  SELECT id, unit, count(*) AS c, min(length(unit)) AS ln
  FROM pu WHERE unit <> '' GROUP BY id, unit
),
pa AS (
  SELECT id, CAST(sum(c) AS BIGINT) AS n_paras,
         CAST(sum(c - 1) AS BIGINT) AS d,
         CAST(sum(c * ln) AS BIGINT) AS ch,
         CAST(sum((c - 1) * ln) AS BIGINT) AS dch
  FROM pf GROUP BY id
),
ids AS (SELECT DISTINCT id FROM synth)
SELECT ids.id,
       COALESCE(la.n_lines, 0) AS n_lines,
       CASE WHEN la.n_lines > 0
            THEN CAST((la.d * 1000000) // la.n_lines AS BIGINT) END
         AS dup_line_frac_micro,
       CASE WHEN la.ch > 0
            THEN CAST((la.dch * 1000000) // la.ch AS BIGINT) END
         AS dup_line_char_frac_micro,
       COALESCE(pa.n_paras, 0) AS n_paras,
       CASE WHEN pa.n_paras > 0
            THEN CAST((pa.d * 1000000) // pa.n_paras AS BIGINT) END
         AS dup_para_frac_micro,
       CASE WHEN pa.ch > 0
            THEN CAST((pa.dch * 1000000) // pa.ch AS BIGINT) END
         AS dup_para_char_frac_micro,
       COALESCE(
         (la.d * 1000000) // la.n_lines <= 300000
         AND (la.dch * 1000000) // la.ch <= 200000
         AND (pa.d * 1000000) // pa.n_paras <= 300000
         AND (pa.dch * 1000000) // pa.ch <= 200000,
         FALSE) AS keep
FROM ids
LEFT JOIN la ON ids.id = la.id
LEFT JOIN pa ON ids.id = pa.id
ORDER BY ids.id
"""

STAGED_R9_REGISTRY["txt_dup_structure"] = (
    q_txt_dup_structure,
    O_TXT_DUP_STRUCTURE,
)


# --------------------------------------------------------------------------
# evt_cuped — variance-reduced A/B comparison (CUPED)
# --------------------------------------------------------------------------


def q_evt_cuped(spark, sf_dir):
    """CUPED-adjusted arm comparison over the event stream
    (operators/behavior.py cuped_adjust): units = users active in BOTH
    halves of the series (split at 2024-01-16, the evt_diff_in_diff
    midpoint), covariate X = pre-period spend (cents), metric Y =
    post-period spend, arms = user_id parity.  Output: per arm the raw
    and adjusted means plus the carried θ and ρ² diagnostics — the
    randomized-experiment complement to evt_diff_in_diff."""
    from .operators.behavior import cuped_adjust

    ev = _t(spark, sf_dir, "events")
    per_user = (
        ev.select(
            "user_id",
            F.expr(
                "case when ts < timestamp '2024-01-16' then"
                " cast(round(100 * value) as bigint) end"
            ).alias("pre_c"),
            F.expr(
                "case when ts >= timestamp '2024-01-16' then"
                " cast(round(100 * value) as bigint) end"
            ).alias("post_c"),
        )
        .groupBy("user_id")
        .agg(
            F.sum("pre_c").alias("x_cents"),
            F.sum("post_c").alias("y_cents"),
        )
        .where(F.col("x_cents").isNotNull() & F.col("y_cents").isNotNull())
        .select(
            F.expr(
                "case when user_id % 2 = 1 then 'treat' else 'control' end"
            ).alias("arm"),
            "x_cents",
            "y_cents",
        )
    )
    return cuped_adjust(per_user)


O_EVT_CUPED = """
WITH pu AS (
  SELECT user_id,
         sum(CASE WHEN ts < TIMESTAMP '2024-01-16'
                  THEN CAST(round(100 * value) AS BIGINT) END) AS x,
         sum(CASE WHEN ts >= TIMESTAMP '2024-01-16'
                  THEN CAST(round(100 * value) AS BIGINT) END) AS y
  FROM events GROUP BY user_id
),
base AS (
  SELECT CASE WHEN user_id % 2 = 1 THEN 'treat' ELSE 'control' END AS arm,
         CAST(x AS HUGEINT) AS x, CAST(y AS HUGEINT) AS y
  FROM pu WHERE x IS NOT NULL AND y IS NOT NULL
),
g AS (
  SELECT CAST(count(*) AS HUGEINT) AS n, sum(x) AS sx, sum(y) AS sy,
         sum(x * x) AS sxx, sum(x * y) AS sxy, sum(y * y) AS syy
  FROM base
),
a AS (
  SELECT arm, CAST(count(*) AS HUGEINT) AS na, sum(x) AS sxa, sum(y) AS sya
  FROM base GROUP BY arm
)
SELECT arm, CAST(na AS BIGINT) AS n_units,
       CAST((CASE WHEN sya < 0 THEN -1 ELSE 1 END)
            * ((abs(sya) * 1000) // na) AS BIGINT) AS mean_y_milli,
       CASE WHEN (n * sxx - sx * sx) = 0 THEN CAST(NULL AS BIGINT) ELSE
         CAST((CASE WHEN (sya * (n * sxx - sx * sx) * n
                          - (n * sxy - sx * sy) * (sxa * n - sx * na)) < 0
                    THEN -1 ELSE 1 END)
              * ((abs(sya * (n * sxx - sx * sx) * n
                      - (n * sxy - sx * sy) * (sxa * n - sx * na)) * 1000)
                 // ((n * sxx - sx * sx) * na * n)) AS BIGINT) END
         AS adj_mean_milli,
       CASE WHEN (n * sxx - sx * sx) = 0 THEN CAST(NULL AS BIGINT) ELSE
         CAST((CASE WHEN (n * sxy - sx * sy) < 0 THEN -1 ELSE 1 END)
              * ((abs(n * sxy - sx * sy) * 1000)
                 // (n * sxx - sx * sx)) AS BIGINT) END AS theta_milli,
       CASE WHEN (n * sxx - sx * sx) = 0 OR (n * syy - sy * sy) = 0
            THEN CAST(NULL AS BIGINT) ELSE
         CAST(((abs(n * sxy - sx * sy) * 1000) // (n * sxx - sx * sx))
              * ((abs(n * sxy - sx * sy) * 1000) // (n * syy - sy * sy))
              AS BIGINT) END AS rho2_micro
FROM a, g ORDER BY arm
"""

STAGED_R9_REGISTRY["evt_cuped"] = (q_evt_cuped, O_EVT_CUPED)


# --------------------------------------------------------------------------
# evt_conformal — split-conformal intervals + empirical coverage
# --------------------------------------------------------------------------


def q_evt_conformal(spark, sf_dir):
    """Split-conformal prediction interval per event_type over the event
    value (cents), with held-out coverage (operators/behavior.py
    conformal_interval): hash-even units calibrate a group-mean
    predictor and the finite-sample-corrected type-1 residual quantile
    (α = 10%); hash-odd units measure coverage.  The distribution-free
    uncertainty readout that completes the experiment family
    (evt_ab_test / diff_in_diff / cuped / bootstrap_ci)."""
    from .operators.behavior import conformal_interval

    ev = _t(spark, sf_dir, "events")
    scored = ev.select(
        "event_type",
        "event_id",
        F.expr("cast(round(100 * value) as bigint)").alias("cents"),
    )
    return conformal_interval(
        scored, "event_type", "event_id", "cents", alpha_milli=100
    )


O_EVT_CONFORMAL = """
WITH base AS (
  SELECT event_type AS grp, event_id AS id,
         CAST(round(100 * value) AS BIGINT) * 1000 AS y
  FROM events WHERE value IS NOT NULL
),
split AS (
  SELECT grp, id, y,
         (CAST(('0x' || substr(md5('conf:' || CAST(id AS VARCHAR)), 1, 15))
               AS BIGINT) % 2 = 0) AS is_cal
  FROM base
),
pred AS (
  SELECT grp, CAST(count(*) AS BIGINT) AS n_cal,
         CAST((CASE WHEN sum(y) < 0 THEN -1 ELSE 1 END)
              * (abs(sum(y)) // count(*)) AS BIGINT) AS yhat_milli
  FROM split WHERE is_cal GROUP BY grp
),
ranked AS (
  SELECT s.grp, abs(s.y - p.yhat_milli) AS r, p.n_cal,
         row_number() OVER (PARTITION BY s.grp
                            ORDER BY abs(s.y - p.yhat_milli), s.id) AS rn
  FROM split s JOIN pred p USING (grp) WHERE s.is_cal
),
qv AS (
  SELECT grp AS qgrp, CAST(r AS BIGINT) AS q_milli FROM ranked
  WHERE rn = (900 * (n_cal + 1) + 999) // 1000
),
cov AS (
  SELECT s.grp AS cgrp, CAST(count(*) AS BIGINT) AS n_test,
         CAST(sum(CASE WHEN qv.q_milli IS NULL
                        OR abs(s.y - p.yhat_milli) <= qv.q_milli
                       THEN 1 ELSE 0 END) AS BIGINT) AS n_covered
  FROM split s JOIN pred p USING (grp)
  LEFT JOIN qv ON qv.qgrp = s.grp
  WHERE NOT s.is_cal GROUP BY s.grp
)
SELECT p.grp, p.n_cal,
       COALESCE(c.n_test, 0) AS n_test,
       p.yhat_milli, qv.q_milli,
       COALESCE(c.n_covered, 0) AS n_covered,
       CASE WHEN COALESCE(c.n_test, 0) > 0 THEN
         CAST((COALESCE(c.n_covered, 0) * 1000000) // c.n_test AS BIGINT) END
         AS coverage_micro
FROM pred p
LEFT JOIN qv ON qv.qgrp = p.grp
LEFT JOIN cov c ON c.cgrp = p.grp
ORDER BY p.grp
"""

STAGED_R9_REGISTRY["evt_conformal"] = (q_evt_conformal, O_EVT_CONFORMAL)


# ===========================================================================
# Round-10 staging (merge at round 11): STAGED_R10_REGISTRY
#
# Same contract as the round-9 batch (round-9 verdict item 5): Spark
# implementation + hand-written DuckDB oracle + pytest enrollment
# (tests/test_r10_staged.py) + 10x scale probe BEFORE staging; NOT merged
# into the live registry this round (tools/verify_sweep.py --staged proves
# them in the same fresh-process session).
# ===========================================================================

STAGED_R10_REGISTRY: dict[str, tuple] = {}


# --------------------------------------------------------------------------
# dedup_span_coverage — exact-substring span dedup (Lee et al. ExactSubstr)
# --------------------------------------------------------------------------


def q_dedup_span_coverage(spark, sf_dir):
    """Per-document exact-substring duplication cover at span granularity
    (operators/dedup.py duplicated_span_coverage — the Lee et al. 2021
    ExactSubstr pass re-expressed as an L-gram interval union; the
    generalization of dedup_repeated_spans' fixed-8-token scan the
    round-9 verdict named).  The corpus is documents ∪ two planted
    families: self-concatenated docs (text ‖ ' ' ‖ text, doc_id%20==0,
    +1000000 — WITHIN-doc repeats, which ExactSubstr counts) and exact
    copies (doc_id%20==7, +2000000 — cross-doc repeats covering both the
    copy and its source), so span starts, interval merges and the
    zero-coverage path all carry driver data on any corpus."""
    from .operators.dedup import duplicated_span_coverage

    docs = _t(spark, sf_dir, "documents")
    uni = (
        docs.selectExpr("doc_id as id", "text")
        .unionByName(
            docs.where("doc_id % 20 = 0").selectExpr(
                "doc_id + 1000000 as id", "concat(text, ' ', text) as text"
            )
        )
        .unionByName(
            docs.where("doc_id % 20 = 7").selectExpr(
                "doc_id + 2000000 as id", "text"
            )
        )
    )
    return duplicated_span_coverage(uni, "id", "text", n_tokens=8).orderBy(
        "id"
    )


O_SPAN_COVERAGE = r"""
WITH uni AS (
  SELECT doc_id AS id, text FROM documents
  UNION ALL
  SELECT doc_id + 1000000, text || ' ' || text FROM documents
  WHERE doc_id % 20 = 0
  UNION ALL
  SELECT doc_id + 2000000, text FROM documents WHERE doc_id % 20 = 7
),
norm AS (
  SELECT id, trim(regexp_replace(lower(text), '\s+', ' ', 'g')) AS t
  FROM uni
),
lens AS (
  SELECT id, CAST(len(toks) AS BIGINT) AS n_toks, toks
  FROM (SELECT id, string_split(t, ' ') AS toks FROM norm)
),
starts AS (
  SELECT id, CAST(i AS BIGINT) AS pos,
         CAST(('0x' || substr(md5(array_to_string(
           toks[CAST(i AS INT):CAST(i + 7 AS INT)], ' ')), 1, 15))
           AS BIGINT) AS g
  FROM lens, unnest(range(1, greatest(n_toks - 7, 0) + 1)) AS t(i)
),
dupg AS (SELECT g FROM starts GROUP BY g HAVING count(*) >= 2),
dup AS (SELECT id, pos FROM starts JOIN dupg USING (g)),
brk AS (
  SELECT id, pos,
         CASE WHEN pos - lag(pos) OVER (PARTITION BY id ORDER BY pos) > 8
              THEN 1 ELSE 0 END AS b
  FROM dup
),
isl AS (
  SELECT id, pos,
         sum(b) OVER (PARTITION BY id ORDER BY pos
                      ROWS UNBOUNDED PRECEDING) AS island
  FROM brk
),
sp AS (
  SELECT id, island, max(pos) - min(pos) + 8 AS cov
  FROM isl GROUP BY id, island
),
agg AS (
  SELECT id, CAST(count(*) AS BIGINT) AS n_spans,
         CAST(sum(cov) AS BIGINT) AS dup_tokens,
         CAST(max(cov) AS BIGINT) AS max_span_tokens
  FROM sp GROUP BY id
)
SELECT lens.id AS id, n_toks,
       COALESCE(n_spans, 0) AS n_spans,
       COALESCE(dup_tokens, 0) AS dup_tokens,
       COALESCE(max_span_tokens, 0) AS max_span_tokens,
       COALESCE(dup_tokens, 0) * 1000 // greatest(n_toks, 1) AS dup_permille
FROM lens LEFT JOIN agg USING (id) ORDER BY id
"""

STAGED_R10_REGISTRY["dedup_span_coverage"] = (
    q_dedup_span_coverage,
    O_SPAN_COVERAGE,
)


# --------------------------------------------------------------------------
# mm_phash_pairs — perceptual (DCT) hash near-dup pairs over media payloads
# --------------------------------------------------------------------------


def q_mm_phash_pairs(spark, sf_dir):
    """Perceptual-hash near-duplicate media pairs: 64-bit DCT pHash per
    payload (operators/multimodal.py phash64 — stripe-fold "decode",
    integer 2-D DCT-II, AC-median threshold) paired through the SAME
    Manku-Jain-Das Sarma 4×16-bit multi-index join as
    dedup_hamming64_pairs (the round-9 verdict's named slot: the
    DCT-shaped twin of mm_simhash_pairs, sharing its banding).  Corpus =
    synth media over documents ∪ planted families: ' qq'-appended
    payloads (doc_id%25==0, +1000000 — mostly perturbing only the last
    byte stripe, the robustness pHash exists for) and exact copies
    (doc_id%25==13, +2000000 — Hamming 0)."""
    from .operators.dedup import hamming64_pairs
    from .operators.multimodal import phash64

    docs = _t(spark, sf_dir, "documents")
    uni = (
        docs.selectExpr("doc_id as id", "encode(text, 'UTF-8') as payload")
        .unionByName(
            docs.where("doc_id % 25 = 0").selectExpr(
                "doc_id + 1000000 as id",
                "encode(concat(text, ' qq'), 'UTF-8') as payload",
            )
        )
        .unionByName(
            docs.where("doc_id % 25 = 13").selectExpr(
                "doc_id + 2000000 as id", "encode(text, 'UTF-8') as payload"
            )
        )
    )
    return hamming64_pairs(phash64(uni), radius=3, max_band_df=20).orderBy(
        "id_a", "id_b"
    )


def _phash_oracle() -> str:
    from .operators.multimodal import PHASH_DCT_MILLI

    cmat = ", ".join(
        f"({u}, {x}, {b})"
        for u, row in enumerate(PHASH_DCT_MILLI)
        for x, b in enumerate(row)
    )
    return f"""
WITH uni AS (
  SELECT doc_id AS id, encode(text) AS payload FROM documents
  UNION ALL
  SELECT doc_id + 1000000, encode(text || ' qq') FROM documents
  WHERE doc_id % 25 = 0
  UNION ALL
  SELECT doc_id + 2000000, encode(text) FROM documents WHERE doc_id % 25 = 13
),
cmat(u, x, b) AS (VALUES {cmat}),
med AS (
  SELECT id, hex(payload) AS hx, CAST(octet_length(payload) AS BIGINT) AS nb
  FROM uni WHERE octet_length(payload) >= 64
),
byt AS (
  SELECT id, nb,
         list_transform(range(1, CAST(nb AS INT) + 1), j ->
           CAST(('0x' || substr(hx, CAST(2 * j - 1 AS INT), 2)) AS BIGINT)
         ) AS bytes
  FROM med
),
cells AS (
  SELECT id, CAST(k AS INT) AS idx,
         CAST(list_sum(bytes[
           CAST(k * (nb // 64) + 1 AS INT):
           CAST(CASE WHEN k = 63 THEN nb
                     ELSE (k + 1) * (nb // 64) END AS INT)])
           AS BIGINT) AS val
  FROM byt, unnest(range(0, 64)) AS t(k)
),
rc AS (SELECT id, idx % 8 AS c, idx // 8 AS r, val FROM cells),
t1 AS (
  SELECT id, u, c, CAST(sum(val * b) AS BIGINT) AS v1
  FROM rc JOIN cmat ON rc.r = cmat.x GROUP BY id, u, c
),
t2 AS (
  SELECT id, t1.u AS u, c2.u AS v, CAST(sum(v1 * c2.b) AS BIGINT) AS coeff
  FROM t1 JOIN cmat c2 ON t1.c = c2.x GROUP BY id, t1.u, c2.u
),
ac AS (SELECT * FROM t2 WHERE NOT (u = 0 AND v = 0)),
medn AS (
  SELECT id, coeff AS med FROM (
    SELECT id, coeff,
           row_number() OVER (PARTITION BY id ORDER BY coeff, u, v) AS rn
    FROM ac)
  WHERE rn = 32
),
bits AS (
  SELECT ac.id, u * 8 + v AS pos,
         CASE WHEN coeff > med THEN 1 ELSE 0 END AS bit
  FROM ac JOIN medn USING (id)
),
sh AS (
  SELECT id,
         CAST(sum(CASE WHEN bit = 1 AND pos < 32
                       THEN CAST(1 AS BIGINT) << pos ELSE 0 END)
              AS BIGINT) AS sh_hi,
         CAST(sum(CASE WHEN bit = 1 AND pos >= 32
                       THEN CAST(1 AS BIGINT) << (pos - 32) ELSE 0 END)
              AS BIGINT) AS sh_lo
  FROM bits GROUP BY id
),
blk AS (
  SELECT id, sh_hi, sh_lo, t.b AS blk,
         CASE t.b WHEN 0 THEN (sh_hi >> 16) & 65535
                  WHEN 1 THEN sh_hi & 65535
                  WHEN 2 THEN (sh_lo >> 16) & 65535
                  ELSE sh_lo & 65535 END AS val
  FROM sh, (SELECT unnest(range(0, 4)) AS b) t
),
cap AS (SELECT blk, val FROM blk GROUP BY blk, val HAVING count(*) <= 20),
kept AS (SELECT blk.* FROM blk JOIN cap USING (blk, val))
SELECT DISTINCT a.id AS id_a, b.id AS id_b,
       CAST(bit_count(xor(a.sh_hi, b.sh_hi))
            + bit_count(xor(a.sh_lo, b.sh_lo)) AS INT) AS hamming
FROM kept a JOIN kept b ON a.blk = b.blk AND a.val = b.val AND a.id < b.id
WHERE bit_count(xor(a.sh_hi, b.sh_hi)) + bit_count(xor(a.sh_lo, b.sh_lo)) <= 3
ORDER BY id_a, id_b
"""


STAGED_R10_REGISTRY["mm_phash_pairs"] = (q_mm_phash_pairs, _phash_oracle())


# --------------------------------------------------------------------------
# rag_feature_rerank — feature-vector rerank over BM25 + cosine candidates
# --------------------------------------------------------------------------


def q_rag_feature_rerank(spark, sf_dir):
    """Feature rerank of the BM25 top-50 ∪ cosine top-50 candidate union
    (operators/ranking.py feature_rerank — the r8 verdict's cross-
    encoder-style slot): per candidate a 5-feature vector (min-max score
    norms, reciprocal-rank features, list-hit count; absent-list
    features imputed 0 through the full-outer join) scored by a fixed
    integer linear model, features kept in the output for audit.  Same
    retriever pair as rag_hybrid_rrf / rag_fusion_weighted, so all three
    rungs of the fusion ladder are directly comparable."""
    from .operators import ranking, similarity
    from .queries_pipeline import QUERY_VEC, _BM25_TERMS

    docs = _t(spark, sf_dir, "documents")
    emb = _t(spark, sf_dir, "embeddings")
    lex = ranking.bm25_topk(docs, "doc_id", "text", _BM25_TERMS, k=50).select(
        F.col("doc_id").alias("id"),
        F.expr("cast(round(score * 1000000) as bigint)").alias("score_micro"),
    )
    sem = similarity.cosine_topk(
        emb, "vec_id", "embedding", QUERY_VEC, k=50
    ).select(
        "id",
        F.expr("cast(round(cosine * 1000000) as bigint)").alias("score_micro"),
    )
    return ranking.feature_rerank(lex, sem, k=15)


def _feature_rerank_oracle() -> str:
    from .operators import ranking
    from .queries_pipeline import _BM25_TERMS, _QV_SQL

    bm25 = ranking.bm25_oracle_sql("documents", "doc_id", "text", _BM25_TERMS, k=50)
    return f"""
WITH lex AS ({bm25}),
lex0 AS (
  SELECT doc_id AS id, CAST(round(score * 1000000) AS BIGINT) AS s FROM lex
),
lexr AS (
  SELECT id, s, row_number() OVER (ORDER BY s DESC, id) AS rnk FROM lex0
),
lexmm AS (SELECT min(s) AS mn, max(s) AS mx FROM lex0),
lexf AS (
  SELECT id,
         CAST(CASE WHEN mx = mn THEN 1000000
                   ELSE ((s - mn) * 1000000) // (mx - mn) END AS BIGINT)
           AS f_lex_norm,
         CAST(1000000 // (60 + rnk) AS BIGINT) AS f_lex_rrf
  FROM lexr, lexmm
),
v AS (
  SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS vec
  FROM embeddings
), q AS (SELECT {_QV_SQL} AS qv),
sem AS (
  SELECT vec_id AS id,
         round(CASE WHEN sqrt(list_sum(list_transform(vec, x -> x * x))) * sqrt(list_sum(list_transform(qv, x -> x * x))) = 0 THEN 0.0 ELSE list_sum(list_transform(range(1, len(vec) + 1), i -> vec[CAST(i AS INT)] * qv[CAST(i AS INT)])) / (sqrt(list_sum(list_transform(vec, x -> x * x))) * sqrt(list_sum(list_transform(qv, x -> x * x)))) END, 6) AS cosine
  FROM v, q ORDER BY cosine DESC, vec_id LIMIT 50
),
sem0 AS (SELECT id, CAST(round(cosine * 1000000) AS BIGINT) AS s FROM sem),
semr AS (
  SELECT id, s, row_number() OVER (ORDER BY s DESC, id) AS rnk FROM sem0
),
semmm AS (SELECT min(s) AS mn, max(s) AS mx FROM sem0),
semf AS (
  SELECT id,
         CAST(CASE WHEN mx = mn THEN 1000000
                   ELSE ((s - mn) * 1000000) // (mx - mn) END AS BIGINT)
           AS f_sem_norm,
         CAST(1000000 // (60 + rnk) AS BIGINT) AS f_sem_rrf
  FROM semr, semmm
),
j AS (
  SELECT COALESCE(l.id, s.id) AS id,
         COALESCE(l.f_lex_norm, 0) AS f_lex_norm,
         COALESCE(s.f_sem_norm, 0) AS f_sem_norm,
         COALESCE(l.f_lex_rrf, 0) AS f_lex_rrf,
         COALESCE(s.f_sem_rrf, 0) AS f_sem_rrf,
         CAST((CASE WHEN l.id IS NOT NULL THEN 1 ELSE 0 END
             + CASE WHEN s.id IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT)
           AS n_lists
  FROM lexf l FULL OUTER JOIN semf s ON l.id = s.id
)
SELECT id, f_lex_norm, f_sem_norm, f_lex_rrf, f_sem_rrf, n_lists,
       CAST(500 * f_lex_norm + 300 * f_sem_norm + 100 * f_lex_rrf
            + 100 * f_sem_rrf + 200 * 1000 * n_lists AS BIGINT)
         AS score_scaled
FROM j ORDER BY score_scaled DESC, id LIMIT 15
"""


STAGED_R10_REGISTRY["rag_feature_rerank"] = (
    q_rag_feature_rerank,
    _feature_rerank_oracle(),
)


# --------------------------------------------------------------------------
# sketch_sampled_quantiles — mergeable hash-sample quantile estimator
# --------------------------------------------------------------------------


def q_sketch_sampled_quantiles(spark, sf_dir):
    """Per-event-type quantile estimates of the cent-quantized event
    value from a deterministic 1/8 hash sample (operators/sketches.py
    sampled_quantiles — the sketch family's equi-DEPTH quantile story
    next to sketch_hist_quantiles' equi-width buckets): type-1 sample
    quantiles at p25/p50/p75/p90/p99 with the sample size carried for
    DKW error bands."""
    from .operators.sketches import sampled_quantiles

    ev = _t(spark, sf_dir, "events").select(
        "event_type",
        F.expr("cast(round(value * 100) as bigint)").alias("cents"),
        "event_id",
    )
    return sampled_quantiles(
        ev, "event_type", "cents", "event_id", level=3
    ).select(
        F.col("grp").alias("event_type"),
        "q_permille",
        "n_sample",
        F.col("est").alias("est_cents"),
    )


O_SAMPLED_QUANTILES = """
WITH s AS (
  SELECT event_type AS grp,
         CAST(round(value * 100) AS BIGINT) AS v,
         event_id AS id
  FROM events
  WHERE value IS NOT NULL
    AND CAST(('0x' || substr(md5('sq:' || CAST(event_id AS VARCHAR)), 1, 15))
             AS BIGINT) % 8 = 0
),
r AS (
  SELECT grp, v, row_number() OVER (PARTITION BY grp ORDER BY v, id) AS rn
  FROM s
),
c AS (SELECT grp, CAST(count(*) AS BIGINT) AS n_sample FROM s GROUP BY grp),
t AS (
  SELECT grp, n_sample, CAST(q AS BIGINT) AS q_permille,
         greatest(CAST(1 AS BIGINT), (q * n_sample + 999) // 1000) AS k
  FROM c, (SELECT unnest([250, 500, 750, 900, 990]) AS q)
)
SELECT t.grp AS event_type, q_permille, n_sample, r.v AS est_cents
FROM t JOIN r ON r.grp = t.grp AND r.rn = t.k
ORDER BY event_type, q_permille
"""

STAGED_R10_REGISTRY["sketch_sampled_quantiles"] = (
    q_sketch_sampled_quantiles,
    O_SAMPLED_QUANTILES,
)


# --------------------------------------------------------------------------
# pipe_despan_rewrite — ExactSubstr deletion: rebuild the de-spanned corpus
# --------------------------------------------------------------------------


def q_pipe_despan_rewrite(spark, sf_dir):
    """The deletion half of the ExactSubstr pair (operators/dedup.py
    despan_rewrite): duplicated spans are REMOVED and the cleaned corpus
    rebuilt in token order, emitting (id, n_toks, n_kept, clean_md5) —
    the md5 proves byte-exact reconstruction against the oracle's
    ORDER BY rebuild.  Same planted corpus as dedup_span_coverage
    (self-concatenated docs + exact copies) so measure and delete are
    directly comparable per document."""
    from .operators.dedup import despan_rewrite

    docs = _t(spark, sf_dir, "documents")
    uni = (
        docs.selectExpr("doc_id as id", "text")
        .unionByName(
            docs.where("doc_id % 20 = 0").selectExpr(
                "doc_id + 1000000 as id", "concat(text, ' ', text) as text"
            )
        )
        .unionByName(
            docs.where("doc_id % 20 = 7").selectExpr(
                "doc_id + 2000000 as id", "text"
            )
        )
    )
    return despan_rewrite(uni, "id", "text", n_tokens=8).orderBy("id")


O_DESPAN_REWRITE = r"""
WITH uni AS (
  SELECT doc_id AS id, text FROM documents
  UNION ALL
  SELECT doc_id + 1000000, text || ' ' || text FROM documents
  WHERE doc_id % 20 = 0
  UNION ALL
  SELECT doc_id + 2000000, text FROM documents WHERE doc_id % 20 = 7
),
norm AS (
  SELECT id, trim(regexp_replace(lower(text), '\s+', ' ', 'g')) AS t
  FROM uni
),
lens AS (
  SELECT id, CAST(len(toks) AS BIGINT) AS n_toks, toks
  FROM (SELECT id, string_split(t, ' ') AS toks FROM norm)
),
starts AS (
  SELECT id, CAST(i AS BIGINT) AS pos,
         CAST(('0x' || substr(md5(array_to_string(
           toks[CAST(i AS INT):CAST(i + 7 AS INT)], ' ')), 1, 15))
           AS BIGINT) AS g
  FROM lens, unnest(range(1, greatest(n_toks - 7, 0) + 1)) AS t(i)
),
dupg AS (SELECT g FROM starts GROUP BY g HAVING count(*) >= 2),
dup AS (SELECT id, pos FROM starts JOIN dupg USING (g)),
brk AS (
  SELECT id, pos,
         CASE WHEN pos - lag(pos) OVER (PARTITION BY id ORDER BY pos) > 8
              THEN 1 ELSE 0 END AS b
  FROM dup
),
isl AS (
  SELECT id, pos,
         sum(b) OVER (PARTITION BY id ORDER BY pos
                      ROWS UNBOUNDED PRECEDING) AS island
  FROM brk
),
sp AS (
  SELECT id, island, min(pos) AS s, max(pos) - min(pos) + 8 AS cov
  FROM isl GROUP BY id, island
),
covered AS (SELECT id, CAST(p AS BIGINT) AS pos FROM sp, unnest(range(s, s + cov)) AS t(p)),
tokp AS (
  SELECT id, CAST(i AS BIGINT) AS pos, toks[CAST(i AS INT)] AS tok
  FROM lens, unnest(range(1, CAST(n_toks AS INT) + 1)) AS t(i)
),
kept AS (SELECT tokp.* FROM tokp ANTI JOIN covered USING (id, pos)),
reb AS (
  SELECT id, CAST(count(*) AS BIGINT) AS n_kept,
         string_agg(tok, ' ' ORDER BY pos) AS clean
  FROM kept GROUP BY id
)
SELECT lens.id AS id, n_toks,
       COALESCE(n_kept, 0) AS n_kept,
       md5(COALESCE(clean, '')) AS clean_md5
FROM lens LEFT JOIN reb USING (id) ORDER BY id
"""

STAGED_R10_REGISTRY["pipe_despan_rewrite"] = (
    q_pipe_despan_rewrite,
    O_DESPAN_REWRITE,
)


# --------------------------------------------------------------------------
# dedup_contam_spans — span-level benchmark decontamination (13-gram rule)
# --------------------------------------------------------------------------


def q_dedup_contam_spans(spark, sf_dir):
    """Span-level eval-set decontamination (operators/dedup.py
    contamination_spans — the GPT-3 appendix-C 13-gram overlap rule at
    span granularity): the 'benchmark' is the 120-char prefix of every
    50th document, so its sources show partial prefix contamination and
    all other docs exercise the clean-zero path.  Complements the
    doc-level dedup_contamination gate: this one measures HOW MUCH of
    each document is benchmark text."""
    from .operators.dedup import contamination_spans

    docs = _t(spark, sf_dir, "documents")
    corpus = docs.selectExpr("doc_id as id", "text")
    bench = docs.where("doc_id % 50 = 3").selectExpr(
        "doc_id as id", "substring(text, 1, 120) as btext"
    )
    return contamination_spans(
        corpus, bench, "id", "text", "btext", n_tokens=13
    ).orderBy("id")


O_CONTAM_SPANS = r"""
WITH corpus AS (SELECT doc_id AS id, text FROM documents),
bench AS (
  SELECT doc_id AS id, substr(text, 1, 120) AS btext FROM documents
  WHERE doc_id % 50 = 3
),
cnorm AS (
  SELECT id, trim(regexp_replace(lower(text), '\s+', ' ', 'g')) AS t
  FROM corpus
),
clens AS (
  SELECT id, CAST(len(toks) AS BIGINT) AS n_toks, toks
  FROM (SELECT id, string_split(t, ' ') AS toks FROM cnorm)
),
cstarts AS (
  SELECT id, CAST(i AS BIGINT) AS pos,
         CAST(('0x' || substr(md5(array_to_string(
           toks[CAST(i AS INT):CAST(i + 12 AS INT)], ' ')), 1, 15))
           AS BIGINT) AS g
  FROM clens, unnest(range(1, greatest(n_toks - 12, 0) + 1)) AS t(i)
),
bnorm AS (
  SELECT id, trim(regexp_replace(lower(btext), '\s+', ' ', 'g')) AS t
  FROM bench
),
blens AS (
  SELECT id, CAST(len(toks) AS BIGINT) AS n_toks, toks
  FROM (SELECT id, string_split(t, ' ') AS toks FROM bnorm)
),
bg AS (
  SELECT DISTINCT
         CAST(('0x' || substr(md5(array_to_string(
           toks[CAST(i AS INT):CAST(i + 12 AS INT)], ' ')), 1, 15))
           AS BIGINT) AS g
  FROM blens, unnest(range(1, greatest(n_toks - 12, 0) + 1)) AS t(i)
),
hit AS (SELECT id, pos FROM cstarts SEMI JOIN bg USING (g)),
brk AS (
  SELECT id, pos,
         CASE WHEN pos - lag(pos) OVER (PARTITION BY id ORDER BY pos) > 13
              THEN 1 ELSE 0 END AS b
  FROM hit
),
isl AS (
  SELECT id, pos,
         sum(b) OVER (PARTITION BY id ORDER BY pos
                      ROWS UNBOUNDED PRECEDING) AS island
  FROM brk
),
sp AS (
  SELECT id, island, max(pos) - min(pos) + 13 AS cov
  FROM isl GROUP BY id, island
),
agg AS (
  SELECT id, CAST(count(*) AS BIGINT) AS n_spans,
         CAST(sum(cov) AS BIGINT) AS contam_tokens,
         CAST(max(cov) AS BIGINT) AS max_span_tokens
  FROM sp GROUP BY id
)
SELECT clens.id AS id, n_toks,
       COALESCE(n_spans, 0) AS n_spans,
       COALESCE(contam_tokens, 0) AS contam_tokens,
       COALESCE(max_span_tokens, 0) AS max_span_tokens,
       COALESCE(contam_tokens, 0) * 1000 // greatest(n_toks, 1)
         AS contam_permille
FROM clens LEFT JOIN agg USING (id) ORDER BY id
"""

STAGED_R10_REGISTRY["dedup_contam_spans"] = (
    q_dedup_contam_spans,
    O_CONTAM_SPANS,
)
