"""Sequence packing — map documents onto fixed-length training windows.

GPT-style pretraining concatenates the tokenized corpus in a deterministic
document order and slices it into fixed ``seq_len`` windows; what the data
pipeline must produce is each document's *global token offset*, from which
every (document ↔ training-sequence) incidence follows arithmetically:
``first_seq = offset div L``, ``last_seq = (offset + n_tokens - 1) div L``.

The naive plan — ``sum(tokens) OVER (ORDER BY doc_id)`` with no partition —
is a single-reducer global sort: the whole corpus funnels through one task.
This operator computes the identical result with the classic two-level
prefix sum instead:

1. range-bucket documents by ``id div bucket_width`` (order-preserving,
   no count() needed — ids are the order);
2. per-bucket token totals → running prefix via a window over the *bucket
   summary* (one row per bucket — thousands of rows at 100 TB, so the
   single-partition window there is free), broadcast-joined back;
3. intra-bucket running sum partitioned by bucket — every partition works
   independently.

Wall-clock at scale is therefore two narrow shuffles (the bucket summary
and the per-bucket window) instead of one global sort; no driver collect.

All arithmetic is integer (token counts, offsets, ``div``), so the DuckDB
oracle — the naive global-window formulation — matches bit-for-bit.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F


def pack_offsets(
    df: DataFrame,
    id_col: str,
    token_col: str,
    seq_len: int,
    bucket_width: int = 65536,
) -> DataFrame:
    """Global token offsets + sequence-window incidence for each document.

    ``df`` must carry an integral ``id_col`` defining the pack order and an
    integral ``token_col`` (> 0; filter empties upstream).  Returns the
    input ids plus ``offset``, ``first_seq``, ``last_seq``, ``n_seqs``.

    ``bucket_width`` trades parallelism against bucket-summary size; with
    dense ids, ~65k docs per bucket keeps the summary tiny (one row per
    bucket) while leaving thousands of independent partitions at corpus
    scale.
    """
    if seq_len <= 0:
        raise ValueError(f"seq_len must be positive, got {seq_len}")
    d = df.select(
        F.col(id_col).cast("long").alias("__id"),
        F.col(token_col).cast("long").alias("__tok"),
    ).withColumn("__bucket", F.expr(f"__id div {int(bucket_width)}"))

    # Per-bucket totals; the running prefix over the summary is a window
    # with no partitionBy — intentional: the summary has one row per
    # bucket, so this "global sort" is over thousands of rows, not the
    # corpus.  exclusive prefix = cumulative - own.
    per_bucket = d.groupBy("__bucket").agg(F.sum("__tok").alias("__bucket_tok"))
    w_buckets = Window.orderBy("__bucket").rowsBetween(Window.unboundedPreceding, 0)
    bases = per_bucket.select(
        "__bucket",
        (F.sum("__bucket_tok").over(w_buckets) - F.col("__bucket_tok")).alias("__base"),
    )

    w_intra = (
        Window.partitionBy("__bucket")
        .orderBy("__id")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    L = int(seq_len)
    return (
        d.join(F.broadcast(bases), "__bucket")
        .withColumn(
            "offset", F.col("__base") + F.sum("__tok").over(w_intra) - F.col("__tok")
        )
        .select(
            F.col("__id").alias(id_col),
            F.col("__tok").alias("n_tokens"),
            "offset",
            F.expr(f"offset div {L}").alias("first_seq"),
            F.expr(f"(offset + __tok - 1) div {L}").alias("last_seq"),
        )
        .withColumn("n_seqs", F.col("last_seq") - F.col("first_seq") + F.lit(1))
    )


def pack_oracle_sql(
    source_cte: str, id_col: str, token_col: str, seq_len: int
) -> str:
    """DuckDB oracle: the naive single-window formulation of the same math.

    ``source_cte`` must be a complete CTE body exposing ``{id_col}`` and
    ``{token_col}`` under the name ``src``.
    """
    L = int(seq_len)
    return f"""
WITH {source_cte},
packed AS (
  SELECT {id_col}, CAST({token_col} AS BIGINT) AS n_tokens,
         CAST(sum({token_col}) OVER (ORDER BY {id_col}
              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
              - {token_col} AS BIGINT) AS "offset"
  FROM src
)
SELECT {id_col}, n_tokens, "offset",
       "offset" // {L} AS first_seq,
       ("offset" + n_tokens - 1) // {L} AS last_seq,
       ("offset" + n_tokens - 1) // {L} - "offset" // {L} + 1 AS n_seqs
FROM packed
"""


def mixture_weights(
    df: DataFrame,
    id_col: str,
    domain_col: str,
    weights: dict[str, float],
    salt: str = "mix",
) -> DataFrame:
    """Epoch-weighted domain mixture — the "repeat CC twice, Wikipedia 3.4
    epochs" step of assembling a pretraining mix.

    A weight ``w = k + f`` (integer part ``k``, fraction ``f``) means every
    document of that domain appears ``k`` times plus one more with
    probability ``f``, decided by the same deterministic 60-bit md5
    threshold the sampling operators use — per (document, copy) so the
    fractional epoch is an unbiased hash-sample of the domain.  Unlisted
    domains get weight 0 (dropped).

    Implemented as a broadcast-joined per-domain copy count + a lateral
    ``sequence`` explode: narrow, shuffle-free, and linear in *output*
    rows, which is how an upsampling join must behave at 100 TB (the
    explode happens after any pushed-down filters).  Output: the input
    columns plus ``copy`` (0-based repeat ordinal).
    """
    from .sampling import _SCALE  # 1 << 60

    whole = F.lit(None).cast("int")
    frac_thr = F.lit(None).cast("long")
    for dom, w in sorted(weights.items()):
        if w < 0:
            raise ValueError(f"negative weight for {dom!r}")
        k = int(w)
        f_ = w - k
        whole = F.when(F.col(domain_col) == dom, F.lit(k)).otherwise(whole)
        frac_thr = F.when(
            F.col(domain_col) == dom, F.lit(int(f_ * _SCALE))
        ).otherwise(frac_thr)

    u = F.conv(
        F.substring(
            F.md5(F.concat_ws(":", F.lit(salt), F.col(id_col).cast("string"))), 1, 15
        ),
        16,
        10,
    ).cast("long")
    n_copies = F.col("__whole") + F.when(u < F.col("__frac_thr"), 1).otherwise(0)
    return (
        df.withColumn("__whole", whole)
        .withColumn("__frac_thr", frac_thr)
        .where(F.col("__whole").isNotNull())
        .withColumn("__n", n_copies)
        .where(F.col("__n") > 0)
        .withColumn("copy", F.explode(F.expr("sequence(0, __n - 1)")))
        .drop("__whole", "__frac_thr", "__n")
    )


def mixture_oracle_sql(
    source_cte: str, id_col: str, domain_col: str, weights: dict[str, float], salt: str = "mix"
) -> str:
    """DuckDB oracle for :func:`mixture_weights` over CTE ``src``."""
    scale = 1 << 60
    whole = "CASE " + " ".join(
        f"WHEN {domain_col} = '{d}' THEN {int(w)}" for d, w in sorted(weights.items())
    ) + " END"
    frac = "CASE " + " ".join(
        f"WHEN {domain_col} = '{d}' THEN {int((w - int(w)) * scale)}"
        for d, w in sorted(weights.items())
    ) + " END"
    return f"""
WITH {source_cte},
marked AS (
  SELECT *, {whole} AS __whole,
         CASE WHEN CAST(('0x' || substr(md5('{salt}' || ':' || CAST({id_col} AS VARCHAR)), 1, 15))
                   AS BIGINT) < {frac} THEN 1 ELSE 0 END AS __extra
  FROM src WHERE {whole} IS NOT NULL
),
counted AS (SELECT *, __whole + __extra AS __n FROM marked WHERE __whole + __extra > 0)
SELECT counted.* EXCLUDE (__whole, __extra, __n), CAST(t.copy AS BIGINT) AS copy
FROM counted, LATERAL (SELECT unnest(range(0, __n)) AS copy) t
"""


def temperature_mixture(
    df: DataFrame,
    domain_col: str,
    token_count: "F.Column",
    budget_tokens: int,
) -> DataFrame:
    """Temperature-scaled source sampling weights (α = 0.5) — the
    multilingual/multi-domain rebalancing step (mBERT/XLM-R style
    ``p_s ∝ n_s^α``): raw proportional sampling starves small sources,
    uniform sampling over-repeats them; a fractional power interpolates.

    α is fixed at 0.5 so the power is ``sqrt`` — the ONE libm power
    function IEEE 754 requires to be correctly rounded, hence bit-identical
    across engines (general ``pow`` carries no such guarantee and would be
    a cross-engine hazard).  Each source's score is quantized to integer
    micro-units (``floor(sqrt(n_tokens)·10⁶)``) BEFORE the normalizing
    sum, so weights, token allocations, and epoch counts are pure integer
    arithmetic downstream.

    Output per source: ``n_docs``, ``n_tokens``, ``weight_ppm`` (sampling
    weight, parts-per-million), ``alloc_tokens`` (share of
    ``budget_tokens``), ``epochs_permille`` (alloc/n_tokens — >1000 means
    the source repeats).  Scale: one map-side-combined aggregate to
    |sources| rows, one broadcast of a 1-row total — the corpus is
    scanned once, nothing wide.
    """
    per = df.groupBy(domain_col).agg(
        F.count("*").alias("n_docs"),
        F.sum(token_count).alias("n_tokens"),
    )
    per = per.withColumn(
        "score_q",
        F.floor(F.sqrt(F.col("n_tokens").cast("double")) * F.lit(1_000_000.0)).cast(
            "long"
        ),
    )
    tot = per.agg(F.sum("score_q").alias("score_tot"))
    b = F.lit(int(budget_tokens)).cast("long")
    # nullif guards: a zero-token source (whitespace-only docs) or an
    # all-empty corpus must yield NULL, not a DIVIDE_BY_ZERO throw under
    # Spark 4's ANSI `div` (DuckDB's `// 0` errors identically).
    # alloc derives from weight_ppm (not budget·score_q directly): the
    # direct product overflows BIGINT once a source holds ~10¹² tokens,
    # while budget·weight_ppm is bounded by budget·10⁶ at any corpus size.
    return (
        per.crossJoin(F.broadcast(tot))
        .withColumn("budget", b)
        .withColumn(
            "weight_ppm", F.expr("score_q * 1000000 div nullif(score_tot, 0)")
        )
        .withColumn("alloc_tokens", F.expr("budget * weight_ppm div 1000000"))
        .select(
            F.col(domain_col),
            "n_docs",
            "n_tokens",
            "weight_ppm",
            "alloc_tokens",
            F.expr("alloc_tokens * 1000 div nullif(n_tokens, 0)").alias(
                "epochs_permille"
            ),
        )
    )


def temperature_mixture_oracle_sql(
    table: str, domain_col: str, token_expr: str, budget_tokens: int
) -> str:
    """DuckDB mirror of :func:`temperature_mixture` (same quantize-then-
    normalize integer pipeline; sqrt is correctly rounded in both engines)."""
    return f"""
WITH per AS (
  SELECT {domain_col}, count(*) AS n_docs,
         CAST(sum({token_expr}) AS BIGINT) AS n_tokens
  FROM {table} GROUP BY {domain_col}
),
scored AS (
  SELECT *, CAST(floor(sqrt(CAST(n_tokens AS DOUBLE)) * 1000000.0) AS BIGINT) AS score_q
  FROM per
),
tot AS (SELECT CAST(sum(score_q) AS BIGINT) AS score_tot FROM scored)
SELECT {domain_col}, n_docs, n_tokens, weight_ppm,
       CAST({int(budget_tokens)} * weight_ppm // 1000000 AS BIGINT) AS alloc_tokens,
       CAST(({int(budget_tokens)} * weight_ppm // 1000000) * 1000
            // nullif(n_tokens, 0) AS BIGINT) AS epochs_permille
FROM (
  SELECT *, CAST(score_q * 1000000 // nullif(score_tot, 0) AS BIGINT) AS weight_ppm
  FROM scored, tot
)
"""


def curriculum_interleave(
    df: DataFrame, id_col: str, domain_col: str, k: int
) -> DataFrame:
    """Deterministic round-robin source interleave — the shard-write order
    that keeps every training batch source-diverse (a source-sorted corpus
    gives the optimizer hour-long single-domain streaks; random shuffles
    aren't reproducible across engines).

    Each document gets a per-source ordinal (``epoch_rn``); the global
    order is (epoch_rn, source, id) — i.e. one document from every source,
    then the next from every source, ….  Returns the first ``k`` rows with
    their global ``position``.

    Scale: the per-source ``row_number`` partitions by source (parallel
    windows); the global ordering is ORDER BY + LIMIT — Spark's
    TakeOrdered, k rows per partition merged on the driver, no full sort.
    The position stamp runs over the already-limited k-row set, so its
    single-partition window is bounded by k, not the corpus.
    """
    w = Window.partitionBy(domain_col).orderBy(id_col)
    ranked = df.select(
        F.col(id_col), F.col(domain_col), F.row_number().over(w).alias("epoch_rn")
    )
    top = ranked.orderBy("epoch_rn", domain_col, id_col).limit(k)
    pos_w = Window.orderBy("epoch_rn", domain_col, id_col)
    return top.select(
        F.row_number().over(pos_w).cast("long").alias("position"),
        F.col(id_col),
        F.col(domain_col),
        F.col("epoch_rn").cast("long").alias("epoch_rn"),
    )


def curriculum_interleave_oracle_sql(
    table: str, id_col: str, domain_col: str, k: int
) -> str:
    """DuckDB mirror of :func:`curriculum_interleave`."""
    return f"""
WITH ranked AS (
  SELECT {id_col}, {domain_col},
         row_number() OVER (PARTITION BY {domain_col} ORDER BY {id_col}) AS epoch_rn
  FROM {table}
),
top AS (
  SELECT * FROM ranked ORDER BY epoch_rn, {domain_col}, {id_col} LIMIT {int(k)}
)
SELECT CAST(row_number() OVER (ORDER BY epoch_rn, {domain_col}, {id_col}) AS BIGINT)
         AS position,
       {id_col}, {domain_col}, CAST(epoch_rn AS BIGINT) AS epoch_rn
FROM top
"""


def pack_pairs(
    df: DataFrame, id_col: str, token_count_col: str, seq_len: int
) -> DataFrame:
    """Rank-pairing sequence packer: sort documents by length descending and
    pair rank i with rank n+1−i (longest with shortest) — the classic
    deterministic approximation of best-fit packing that cuts padding
    versus naive concatenation, without bin-packing's sequential state.

    The global length rank is computed WITHOUT a global sort via the same
    two-level trick as :func:`pack_offsets`, but keyed on the length
    HISTOGRAM: per-length counts (a tiny table — lengths are small
    integers) take a single-partition window to yield "docs longer than
    L", and each doc adds its within-length ``row_number`` (partitioned by
    length — parallel).  rank = n_longer + within-length ordinal, a total
    order by (length desc, id).

    Output one row per pair (pair_id = the long side's rank): ids and
    token counts of both members, ``pair_tokens``, and ``fits`` =
    pair_tokens ≤ seq_len.  Odd corpus: the median doc pairs with nobody
    (short columns NULL).

    Scale: one scan + a histogram-sized window + one shuffle on rank for
    the pairing self-join.  Nothing global touches more rows than the
    length histogram.
    """
    base = df.select(
        F.col(id_col).alias("id"), F.col(token_count_col).cast("long").alias("nt")
    )
    hist = base.groupBy("nt").agg(F.count("*").alias("cnt"))
    hw = (
        Window.orderBy(F.desc("nt"))
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    hist = hist.withColumn("n_longer", F.coalesce(F.sum("cnt").over(hw), F.lit(0)))
    iw = Window.partitionBy("nt").orderBy("id")
    ranked = base.join(F.broadcast(hist.select("nt", "n_longer")), "nt").select(
        "id", "nt", (F.col("n_longer") + F.row_number().over(iw)).alias("rank")
    )
    tot = ranked.agg(F.count("*").alias("n"))
    left = ranked.crossJoin(F.broadcast(tot)).where(
        F.col("rank") * 2 <= F.col("n") + 1
    )
    right = ranked.select(
        F.col("id").alias("short_id"),
        F.col("nt").alias("short_tokens"),
        F.col("rank").alias("short_rank"),
    )
    # short_rank = n+1-rank ≥ rank for every kept left row, so the join
    # always matches; "left" is belt-and-braces for the empty frame.
    paired = left.join(
        right,
        left["n"] + 1 - left["rank"] == right["short_rank"],
        "left",
    )
    return paired.select(
        F.col("rank").alias("pair_id"),
        F.col("id").alias("long_id"),
        F.col("nt").alias("long_tokens"),
        # untyped NULL: the id column may be any type (string uuids etc.)
        F.when(F.col("short_rank") == F.col("rank"), F.lit(None))
        .otherwise(F.col("short_id"))
        .alias("short_id"),
        F.when(F.col("short_rank") == F.col("rank"), F.lit(None).cast("long"))
        .otherwise(F.col("short_tokens"))
        .alias("short_tokens"),
        (
            F.col("nt")
            + F.when(
                F.col("short_rank") == F.col("rank"), F.lit(0).cast("long")
            ).otherwise(F.coalesce(F.col("short_tokens"), F.lit(0).cast("long")))
        ).alias("pair_tokens"),
    ).withColumn("fits", (F.col("pair_tokens") <= F.lit(int(seq_len))).cast("boolean"))


def pack_pairs_oracle_sql(
    table: str, id_col: str, token_expr: str, seq_len: int
) -> str:
    """DuckDB mirror of :func:`pack_pairs` (direct global row_number — the
    naive formulation the two-level rank must equal)."""
    return f"""
WITH base AS (
  SELECT {id_col} AS id, CAST({token_expr} AS BIGINT) AS nt FROM {table}
),
ranked AS (
  SELECT id, nt, row_number() OVER (ORDER BY nt DESC, id) AS rank FROM base
),
tot AS (SELECT count(*) AS n FROM ranked)
SELECT l.rank AS pair_id, l.id AS long_id, l.nt AS long_tokens,
       CASE WHEN r.rank = l.rank THEN NULL ELSE r.id END AS short_id,
       CASE WHEN r.rank = l.rank THEN NULL ELSE r.nt END AS short_tokens,
       CAST(l.nt + CASE WHEN r.rank = l.rank THEN 0 ELSE coalesce(r.nt, 0) END
            AS BIGINT) AS pair_tokens,
       (l.nt + CASE WHEN r.rank = l.rank THEN 0 ELSE coalesce(r.nt, 0) END)
         <= {int(seq_len)} AS fits
FROM ranked l
CROSS JOIN tot
LEFT JOIN ranked r ON r.rank = tot.n + 1 - l.rank
WHERE l.rank * 2 <= tot.n + 1
"""


# --------------------------------------------------------------------------
# Sliding-window document chunking — context-window preparation
# --------------------------------------------------------------------------


def chunk_documents(
    docs: DataFrame,
    id_col: str,
    text_col: str,
    window: int = 64,
    overlap: int = 16,
) -> DataFrame:
    """Split each document's token stream into overlapping fixed windows.

    The RAG-ingestion / long-context-training primitive: chunk ``i`` covers
    tokens [i·stride, i·stride + window) with stride = window − overlap; a
    document shorter than ``window`` yields exactly one chunk.  Output is
    (id, chunk_idx, n_tokens, chunk_text) where chunk_text re-joins the
    token slice with single spaces (whitespace-normalized by construction).

    All chunk arithmetic is integer: n_chunks = 1 + ceil(max(n−window, 0) /
    stride) via (x + stride − 1) div stride.  Scale: pure per-row explode —
    no shuffle at all; the fan-out is bounded by n_tokens/stride per doc,
    and Parquet writers downstream see chunk rows already partitioned
    however the corpus was.
    """
    if overlap >= window:
        raise ValueError(f"overlap ({overlap}) must be < window ({window})")
    stride = window - overlap
    from .text import tokens

    t = docs.select(
        F.col(id_col).alias("id"), tokens(F.col(text_col)).alias("toks")
    ).withColumn("n", F.size("toks").cast("long"))
    n_chunks = F.expr(f"1 + (greatest(n - {window}, 0) + {stride - 1}) div {stride}")
    return (
        t.withColumn("chunk_idx", F.explode(F.sequence(F.lit(0), n_chunks - 1)))
        .select(
            "id",
            F.col("chunk_idx").cast("long").alias("chunk_idx"),
            F.expr(f"slice(toks, chunk_idx * {stride} + 1, {window})").alias("ck"),
        )
        .select(
            "id",
            "chunk_idx",
            F.size("ck").cast("long").alias("n_tokens"),
            F.array_join("ck", " ").alias("chunk_text"),
        )
    )


def chunk_oracle_sql(
    table: str, id_col: str, text_col: str, window: int = 64, overlap: int = 16
) -> str:
    """DuckDB mirror of :func:`chunk_documents` (identical integer math)."""
    stride = window - overlap
    return f"""
WITH t AS (
  SELECT {id_col} AS id,
         list_filter(string_split_regex({text_col}, '\\s+'), t -> t <> '') AS toks
  FROM {table}
), n AS (
  SELECT id, toks, CAST(len(toks) AS BIGINT) AS n FROM t
), idx AS (
  SELECT id, toks, unnest(range(0, 1 + (greatest(n - {window}, 0) + {stride - 1}) // {stride})) AS chunk_idx
  FROM n
)
SELECT id, CAST(chunk_idx AS BIGINT) AS chunk_idx,
       CAST(len(toks[chunk_idx * {stride} + 1 : chunk_idx * {stride} + {window}]) AS BIGINT) AS n_tokens,
       COALESCE(array_to_string(toks[chunk_idx * {stride} + 1 : chunk_idx * {stride} + {window}], ' '), '') AS chunk_text
FROM idx
"""


def shard_manifest(
    df: DataFrame,
    id_col: str,
    token_col: str,
    n_shards: int,
    salt: str = "shard",
) -> DataFrame:
    """Deterministic output-shard assignment + per-shard manifest — the
    last step before writing training shards (webdataset/parquet "shard
    files"): every document lands in shard = hash(id) mod n_shards, and
    the manifest reports each shard's document count, token total, and id
    range (what a loader needs to plan epochs without opening shards).

    The hash is the engine's salted 60-bit md5 uniform (same recipe as
    the sampling family), so shard membership is reproducible in any
    engine and decorrelated from any sample/split taken on the same ids.
    Hash sharding also balances token totals across shards regardless of
    id clustering — the property that matters when 1000 loader workers
    each stream one shard.  Scale: one map-side-combined aggregate;
    output is n_shards rows.
    """
    from .sampling import _u60

    u = _u60(F.concat(F.lit(salt + ":"), F.col(id_col).cast("string")))
    return (
        df.select(
            F.pmod(u, F.lit(n_shards)).alias("shard_id"),
            F.col(id_col).alias("__id"),
            F.col(token_col).cast("long").alias("__tok"),
        )
        .groupBy("shard_id")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum("__tok").alias("n_tokens"),
            F.min("__id").alias("min_id"),
            F.max("__id").alias("max_id"),
        )
        .orderBy("shard_id")
    )


DEFAULT_LENGTH_BUCKETS: tuple[int, ...] = (16, 32, 64, 128, 256, 512, 1024, 2048, 4096)


def length_buckets(
    df: DataFrame,
    token_col: str,
    buckets: tuple[int, ...] = DEFAULT_LENGTH_BUCKETS,
) -> DataFrame:
    """Padding-waste analysis for length-grouped batching.

    Dynamic-padding training batches pad every sequence in a batch to the
    batch max; grouping sequences into power-of-two length buckets bounds
    that waste.  This reports, per bucket (the smallest bucket length
    >= n_tokens; longer docs are clamped to the largest bucket, i.e.
    truncated by the batch builder): document count, kept tokens, padding
    tokens, and waste in integer permille — the numbers that decide the
    bucket ladder before a training run.

    Bucket choice is a pure integer array lookup (no log2 floats — libm
    rounding must never decide a bucket boundary), so the DuckDB oracle
    matches exactly.  Scale: one narrow projection + an aggregate over
    len(buckets) groups; map-side combine leaves ~9 rows per partition.
    """
    barr = F.array(*[F.lit(b) for b in buckets])
    n = F.col(token_col).cast("long")
    bucket = F.coalesce(
        F.array_min(F.filter(barr, lambda b: b >= n)), F.lit(buckets[-1])
    ).cast("long")
    kept = F.least(n, bucket)
    return (
        df.select(
            bucket.alias("bucket_len"),
            kept.alias("__kept"),
            (bucket - kept).alias("__pad"),
        )
        .groupBy("bucket_len")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum("__kept").alias("kept_tokens"),
            F.sum("__pad").alias("pad_tokens"),
        )
        .withColumn(
            "waste_permille",
            F.expr("(pad_tokens * 1000) div (bucket_len * n_docs)").cast("long"),
        )
        .orderBy("bucket_len")
    )


def length_buckets_oracle_sql(
    table: str,
    tokens_expr: str,
    buckets: tuple[int, ...] = DEFAULT_LENGTH_BUCKETS,
) -> str:
    """DuckDB mirror of :func:`length_buckets` (tokens_expr = SQL for the
    per-row token count)."""
    blist = "[" + ", ".join(str(b) for b in buckets) + "]"
    return f"""
WITH n AS (
  SELECT CAST({tokens_expr} AS BIGINT) AS nt FROM {table}
), b AS (
  SELECT coalesce(list_min(list_filter({blist}, x -> x >= nt)), {buckets[-1]}) AS bucket_len,
         least(nt, {buckets[-1]}) AS kept
  FROM n
), g AS (
  SELECT CAST(bucket_len AS BIGINT) AS bucket_len, count(*) AS n_docs,
         CAST(sum(least(kept, bucket_len)) AS BIGINT) AS kept_tokens,
         CAST(sum(bucket_len - least(kept, bucket_len)) AS BIGINT) AS pad_tokens
  FROM b GROUP BY bucket_len
)
SELECT bucket_len, n_docs, kept_tokens, pad_tokens,
       CAST((pad_tokens * 1000) // (bucket_len * n_docs) AS BIGINT) AS waste_permille
FROM g
"""


def fim_split(docs: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Fill-in-the-middle span split (Bavarian et al. '22): cut a
    deterministic middle span out of each document and reorder to
    prefix-suffix-middle — the preprocessing step behind infilling-
    capable code/text models.  Output per document: ``(id, n_prefix,
    n_middle, n_suffix, psm_md5)`` where the digest pins the exact PSM
    reassembly (so the transform is value-checked, not just counted).

    Span selection is pure integer arithmetic off the portable 60-bit
    md5 hash of the id — no randomness, identical in any engine:
    ``m = L div 5``, ``start = 1 + h60(id) % (L − m + 1)``.  Empty and
    tiny documents degrade gracefully (m = 0 → the whole text is the
    prefix, middle/suffix empty).  One narrow projection; no shuffle at
    all until a consumer aggregates.
    """
    h = F.conv(
        F.substring(F.md5(F.col(id_col).cast("string")), 1, 15), 16, 10
    ).cast("long")
    L = F.length(F.col(text_col))
    m = F.expr(f"length({text_col}) div 5")
    start = F.lit(1) + h % (L - m + F.lit(1))
    # one select binds m/start once; substrings then reference the columns
    sel = docs.select(
        F.col(id_col).alias("id"),
        F.col(text_col).alias("t"),
        m.alias("m"),
        start.cast("int").alias("p"),
    )
    return sel.select(
        "id",
        (F.col("p") - 1).cast("long").alias("n_prefix"),
        F.col("m").cast("long").alias("n_middle"),
        (F.length("t") - F.col("m") - (F.col("p") - 1)).cast("long").alias(
            "n_suffix"
        ),
        F.md5(
            F.concat_ws(
                "\x1f",
                F.expr("substring(t, 1, p - 1)"),
                F.expr("substring(t, cast(p + m as int), length(t))"),
                F.expr("substring(t, p, cast(m as int))"),
            )
        ).alias("psm_md5"),
    ).orderBy("id")
