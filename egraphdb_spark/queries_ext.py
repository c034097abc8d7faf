"""Registry entries: traversal path search, streaming, UDF registry,
scalar-function surface, IO sinks, and mutation (upsert/delete).

Same (spark_fn, oracle_sql) contract as queries.py.
"""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from .functions import scalars
from .operators.checkpoint import cut_lineage


def _t(spark, sf_dir: str, name: str):
    from .graph import load_tables

    return load_tables(spark, sf_dir)[name]


def _fixture(spark, sf_dir: str):
    from .queries import fixture

    return fixture(spark, sf_dir)


# --------------------------------------------------------------------------
# G2 — path search (reference DFS; contract = a valid src→dst path)
# --------------------------------------------------------------------------


def q_g2_dfs_path(spark, sf_dir):
    """Path customer:7 → the region of its nation.

    The reference DFS returns *some* valid path (dfs_algo.erl:63-66); our
    level-synchronous BFS returns the 2-hop one, which is unique here
    (customer→nation is the only level-1 edge into nations, nation→region
    the only region edge), so the oracle can assert it exactly.
    """
    from .operators.traversal import bfs_path

    g = _fixture(spark, sf_dir)
    hop = (
        _t(spark, sf_dir, "customer")
        .where(F.col("c_custkey") == 7)
        .join(_t(spark, sf_dir, "nation"), F.col("c_nationkey") == F.col("n_nationkey"))
        .select("n_regionkey")
        .head()
    )
    dst = f"region:{hop['n_regionkey']}"
    path = bfs_path(g.edges, "customer:7", dst, max_depth=4)
    return spark.createDataFrame(
        [(i, k) for i, k in enumerate(path or [])], "step int, key string"
    )


O_G2 = """
SELECT CAST(0 AS INT) AS step, 'customer:7' AS key
UNION ALL
SELECT CAST(1 AS INT), 'nation:' || c_nationkey FROM customer WHERE c_custkey = 7
UNION ALL
SELECT CAST(2 AS INT), 'region:' || n_regionkey FROM nation
WHERE n_nationkey = (SELECT c_nationkey FROM customer WHERE c_custkey = 7)
"""


# --------------------------------------------------------------------------
# Structured Streaming
# --------------------------------------------------------------------------


def q_stream_window_counts(spark, sf_dir):
    """REAL streaming execution: readStream → watermark → tumbling window →
    availableNow trigger → memory sink.  Batch-equivalent semantics, so the
    plain-SQL oracle checks the whole streaming path end-to-end."""
    from .streaming.stream import read_events_stream, run_to_memory, windowed_counts

    ev = read_events_stream(spark, sf_dir)
    out = run_to_memory(windowed_counts(ev, "30 minutes"), "stream_window_counts_tbl")
    return out


O_STREAM_WINDOW = """
SELECT time_bucket(INTERVAL 30 MINUTE, ts) AS window_start, event_type,
       count(*) AS n
FROM events GROUP BY 1, 2
"""


def q_stream_dedup(spark, sf_dir):
    """Streaming deduplication: the source unioned with itself (every event
    arrives twice) → dropDuplicatesWithinWatermark on event_id → append sink.
    The oracle is the per-type count over the ORIGINAL table: a correct
    streaming dedup makes the doubled stream indistinguishable from it.
    State is bounded by the watermark horizon, not stream length."""
    from .streaming.stream import dedup_within_watermark, read_events_stream, run_to_memory

    ev = read_events_stream(spark, sf_dir)
    deduped = run_to_memory(
        dedup_within_watermark(ev.union(ev)), "stream_dedup_tbl", output_mode="append"
    )
    return (
        deduped.groupBy("event_type")
        .agg(F.count("*").alias("n"), F.count_distinct("event_id").alias("n_ids"))
        .orderBy("event_type")
    )


O_STREAM_DEDUP = """
SELECT event_type, count(*) AS n, count(DISTINCT event_id) AS n_ids
FROM events GROUP BY event_type ORDER BY event_type
"""


def q_evt_session_window(spark, sf_dir):
    """Session windows (30-min gap) per user over the events table."""
    ev = _t(spark, sf_dir, "events")
    return (
        ev.groupBy(F.session_window("ts", "30 minutes").alias("w"), "user_id")
        .agg(F.count("*").alias("n"))
        .select(
            "user_id",
            F.col("w.start").alias("session_start"),
            F.col("w.end").alias("session_end"),
            "n",
        )
    )


# Gaps-and-islands reconstruction of Spark's session_window semantics:
# a new session starts when the gap to the previous event is >= 30 min;
# session_end = last event + gap.
O_SESSION_WINDOW = """
WITH lagged AS (
  SELECT user_id, ts, event_id,
         CASE WHEN lag(ts) OVER w IS NULL
                OR ts - lag(ts) OVER w >= INTERVAL 30 MINUTE
              THEN 1 ELSE 0 END AS new_s
  FROM events WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
), sess AS (
  SELECT user_id, ts,
         sum(new_s) OVER (PARTITION BY user_id ORDER BY ts, event_id
                          ROWS UNBOUNDED PRECEDING) AS sid
  FROM lagged
)
SELECT user_id, min(ts) AS session_start,
       max(ts) + INTERVAL 30 MINUTE AS session_end, count(*) AS n
FROM sess GROUP BY user_id, sid
"""


def q_stream_session_window(spark, sf_dir):
    """REAL streaming session windows: readStream → watermark →
    session_window(30 min) per user → availableNow → memory sink.  Same
    gaps-and-islands oracle as the batch gate — a correct streaming
    sessionizer is indistinguishable from the batch one once the stream
    drains."""
    from .streaming.stream import read_events_stream, run_to_memory, sessionized

    ev = read_events_stream(spark, sf_dir)
    return run_to_memory(sessionized(ev, "30 minutes"), "stream_session_tbl")


O_STREAM_SESSION = O_SESSION_WINDOW


# --------------------------------------------------------------------------
# UDF registry (U1/U2) — register with test vectors, then use in a query
# --------------------------------------------------------------------------


def q_fn_registry_udf(spark, sf_dir):
    import pandas as pd

    from .functions.registry import FunctionRegistry

    reg = FunctionRegistry(spark)

    def net_price(price, discount) -> "pd.Series":  # noqa: F821
        return price * (1.0 - discount)

    net_price.__annotations__ = {"price": pd.Series, "discount": pd.Series, "return": pd.Series}

    reg.register(
        "net_price",
        net_price,
        "double",
        test_vectors=[(100.0, 0.1), (50.0, 0.0), (0.0, 0.5)],
        validator=lambda args, r: abs(r - args[0] * (1 - args[1])) < 1e-9,
        vectorized=True,
    )
    li = _t(spark, sf_dir, "lineitem")
    return li.select(
        "l_orderkey",
        "l_linenumber",
        F.expr("net_price(l_extendedprice, l_discount)").alias("net"),
    )


O_FN_REGISTRY = """
SELECT l_orderkey, l_linenumber, l_extendedprice * (1.0 - l_discount) AS net
FROM lineitem
"""


# --------------------------------------------------------------------------
# Scalar-function surface (F1–F11 tour with engine-portable semantics)
# --------------------------------------------------------------------------


def q_fn_scalar_surface(spark, sf_dir):
    cust = _t(spark, sf_dir, "customer")
    ts = F.expr(
        "timestamp'2024-01-01 00:00:00'"
        " + make_interval(0, 0, 0, cast(c_custkey % 365 as int))"
    )
    d = ts.cast("date")
    return cust.select(
        F.col("c_custkey").alias("custkey"),
        scalars.lower_text("c_name").alias("name_lower"),
        scalars.first_char_lower("c_mktsegment").alias("seg_fcl"),
        scalars.to_hex("c_custkey").alias("hexkey"),
        scalars.from_hex(scalars.to_hex("c_custkey")).alias("unhexed"),
        scalars.format_ts(ts).alias("ts_fmt"),
        scalars.to_epoch(ts).alias("epoch_s"),
        scalars.to_epoch(scalars.minus_hours(ts, 3)).alias("epoch_minus3h"),
        scalars.minus_months(d, -2).alias("d_plus2m"),
        scalars.days_between(F.lit("2024-01-01").cast("date"), d).alias("days_since"),
        F.size(scalars.day_series(F.lit("2024-01-01").cast("date"), d)).cast("long").alias("n_days"),
        scalars.json_get(scalars.json_encode("c_custkey", "c_name"), ["c_name"]).alias(
            "json_roundtrip_name"
        ),
        scalars.is_blank("c_name").alias("blank"),
        scalars.to_long(F.lit("42")).alias("cast_long"),
        scalars.to_double(F.lit("9.25")).alias("cast_double"),
        # F14 — custom UUID / id mint + parse round-trip (egraph_util.erl:470-562)
        scalars.custom_uuid(*_uuid_inputs()).alias("uuid_hex"),
        scalars.uuid_tsmicro(scalars.custom_uuid(*_uuid_inputs())).alias(
            "uuid_ts_back"
        ),
        scalars.custom_id(_uuid_inputs()[0], _uuid_inputs()[2]).alias("custom_id"),
        scalars.id_tsmicro(
            scalars.custom_id(_uuid_inputs()[0], _uuid_inputs()[2])
        ).alias("id_ts_back"),
    )


def _uuid_inputs():
    """Deterministic F14 inputs derived from the row key (mirrored in the
    oracle's CTE).  Built lazily — column construction needs a live session."""
    ts = F.lit(1700000000000000).cast("long") + F.col("c_custkey") * F.lit(1000003)
    crc = (F.col("c_custkey") * F.lit(2654435761)) % F.lit(4294967296)
    sched = F.col("c_custkey") % F.lit(32)
    data = F.col("c_custkey") % F.lit(16777216)
    return ts, crc, sched, data


def q_fn_password_hash(spark, sf_dir):
    """F16 — password hashing (egraph_util.erl:273-310): PBKDF2-HMAC-SHA256
    (128 iterations, 32-byte key) and the fast HMAC-SHA1 variant, as
    Arrow-batched pandas UDFs over deterministic per-key credentials.

    The oracle is a known-answer VALUES table computed by the independent
    CPython hashlib/hmac implementations, semi-joined to ``customer`` so the
    comparison still depends on the fixture data.
    """
    from .functions import crypto
    from .graph import load_tables

    c = load_tables(spark, sf_dir)["customer"]
    base = c.filter(F.col("c_custkey") <= 40).select(
        F.col("c_custkey").alias("custkey"),
        F.concat(F.lit("pw_"), F.col("c_custkey")).alias("pw"),
        F.concat(F.lit("salt_"), F.col("c_custkey")).alias("salt"),
    )
    return base.select(
        "custkey",
        crypto.hash_password("pw", "salt").alias("pbkdf2_hex"),
        crypto.hash_password_hmac(F.lit("engine_key"), "pw", "salt").alias(
            "hmac_hex"
        ),
    ).orderBy("custkey")


def _o_fn_password_hash() -> str:
    from .functions.crypto import reference_vectors

    rows = ",\n  ".join(
        f"({k}, '{p}', '{m}')" for k, p, m in reference_vectors(range(0, 41))
    )
    return f"""
WITH kat(custkey, pbkdf2_hex, hmac_hex) AS (VALUES
  {rows}
)
SELECT CAST(custkey AS BIGINT) AS custkey, pbkdf2_hex, hmac_hex
FROM kat
WHERE custkey IN (SELECT c_custkey FROM customer)
ORDER BY custkey
"""


O_FN_PASSWORD = _o_fn_password_hash()


O_FN_SCALARS = """
WITH c0 AS (
  SELECT *, TIMESTAMP '2024-01-01' + (c_custkey % 365) * INTERVAL 1 DAY AS ts
  FROM customer
), c AS (
  SELECT *,
         1700000000000000 + c_custkey * 1000003 AS uts,
         (c_custkey * 2654435761) % 4294967296 AS ucrc,
         c_custkey % 32 AS usched,
         c_custkey % 16777216 AS udata
  FROM c0
)
SELECT c_custkey AS custkey,
       lower(c_name) AS name_lower,
       lower(substr(c_mktsegment, 1, 1)) || substr(c_mktsegment, 2) AS seg_fcl,
       printf('%x', c_custkey) AS hexkey,
       CAST(('0x' || printf('%x', c_custkey)) AS BIGINT) AS unhexed,
       strftime(ts, '%Y-%m-%d %H:%M:%S') AS ts_fmt,
       CAST(epoch(ts) AS BIGINT) AS epoch_s,
       CAST(epoch(ts - INTERVAL 3 HOUR) AS BIGINT) AS epoch_minus3h,
       CAST(CAST(ts AS DATE) + INTERVAL 2 MONTH AS DATE) AS d_plus2m,
       CAST(date_diff('day', DATE '2024-01-01', CAST(ts AS DATE)) AS BIGINT) AS days_since,
       CAST(date_diff('day', DATE '2024-01-01', CAST(ts AS DATE)) + 1 AS BIGINT) AS n_days,
       c_name AS json_roundtrip_name,
       false AS blank,
       CAST(42 AS BIGINT) AS cast_long,
       CAST(9.25 AS DOUBLE) AS cast_double,
       printf('%08x', uts & 4294967295)
         || printf('%04x', (uts >> 32) & 65535)
         || printf('%04x', ((uts >> 48) & 4095) + 61440)
         || printf('%02x', ucrc & 255)
         || printf('%02x', (ucrc >> 8) & 255)
         || printf('%02x', (ucrc >> 16) & 255)
         || printf('%02x', (ucrc >> 24) & 255)
         || printf('%02x', usched & 255)
         || printf('%02x', udata & 255)
         || printf('%02x', (udata >> 8) & 255)
         || printf('%02x', (udata >> 16) & 255) AS uuid_hex,
       CAST(uts AS BIGINT) AS uuid_ts_back,
       CAST((uts << 3) | (usched & 7) AS BIGINT) AS custom_id,
       CAST(uts AS BIGINT) AS id_ts_back
FROM c
"""


# --------------------------------------------------------------------------
# IO sinks: write → read back → digest (proves S12/S13/S14 end-to-end)
# --------------------------------------------------------------------------

_IO_ROOT = os.environ.get("SPARK_GRAFT_IO_DIR", "/tmp/egraphdb_spark_io")

_IO_DIGEST_ORACLE = """
SELECT c_mktsegment AS mktsegment, count(*) AS n,
       cast(sum(cast(c_acctbal as decimal(18,2))) as double) AS sum_acctbal
FROM customer GROUP BY c_mktsegment
"""


def _customer_slice(spark, sf_dir):
    return _t(spark, sf_dir, "customer").select("c_custkey", "c_mktsegment", "c_acctbal")


def _digest(df):
    return df.groupBy(F.col("c_mktsegment").alias("mktsegment")).agg(
        F.count("*").alias("n"),
        F.expr("cast(sum(cast(c_acctbal as decimal(18,2))) as double)").alias(
            "sum_acctbal"
        ),
    )


def q_io_csv_roundtrip(spark, sf_dir):
    from .sources import io

    path = f"{_IO_ROOT}/csv-{os.path.basename(sf_dir.rstrip('/'))}"
    io.write_csv(_customer_slice(spark, sf_dir), path)
    back = io.read_csv(
        spark, path, "c_custkey bigint, c_mktsegment string, c_acctbal double"
    )
    return _digest(back)


def q_io_json_roundtrip(spark, sf_dir):
    from .sources import io

    path = f"{_IO_ROOT}/json-{os.path.basename(sf_dir.rstrip('/'))}"
    io.write_json(_customer_slice(spark, sf_dir), path)
    back = io.read_json(
        spark, path, "c_custkey bigint, c_mktsegment string, c_acctbal double"
    )
    return _digest(back)


def q_io_orc_roundtrip(spark, sf_dir):
    """ORC write → read → digest: the Hive/Trino-ecosystem columnar
    format alongside the parquet sink (same splittable/pushdown
    properties; Spark's ORC reader is vectorized like parquet's)."""
    from .sources import io

    path = f"{_IO_ROOT}/orc-{os.path.basename(sf_dir.rstrip('/'))}"
    io.write_orc(_customer_slice(spark, sf_dir), path)
    return _digest(io.read_orc(spark, path))


def q_io_framedbin_roundtrip(spark, sf_dir):
    """S14/S17 — the reference's length-framed binary stream
    (src/egraph_api.erl:276-325, handlers/egraph_generic_handler.erl:184-213)
    as a registered Python DataSource: write customer frames, read them back
    through the planner (with Python-side filter pushdown enabled), digest."""
    from .sources import framedbin

    framedbin.register(spark)
    path = f"{_IO_ROOT}/framedbin-{os.path.basename(sf_dir.rstrip('/'))}"
    try:
        _customer_slice(spark, sf_dir).write.format("framedbin").mode(
            "overwrite"
        ).save(path)
    except Exception:
        # Python-source worker startup is occasionally starved on a loaded
        # host (observed once in 3 full sweeps: init fails before any user
        # code runs).  One retry; a real defect fails both times.
        import time

        time.sleep(2)
        _customer_slice(spark, sf_dir).write.format("framedbin").mode(
            "overwrite"
        ).save(path)
    back = (
        spark.read.format("framedbin")
        .schema("c_custkey bigint, c_mktsegment string, c_acctbal double")
        .load(path)
    )
    return _digest(back)


def q_io_parquet_roundtrip(spark, sf_dir):
    from .sources import io

    path = f"{_IO_ROOT}/parquet-{os.path.basename(sf_dir.rstrip('/'))}"
    io.write_parquet(_customer_slice(spark, sf_dir), path, partition_by=["c_mktsegment"])
    back = io.read_parquet(spark, path).select("c_custkey", "c_mktsegment", "c_acctbal")
    return _digest(back)


# --------------------------------------------------------------------------
# Mutation: S15 upsert / S18 delete
# --------------------------------------------------------------------------


def q_s15_upsert_version(spark, sf_dir):
    """Upsert modified details for customers 1..5 + one brand-new node;
    output (key, version) for the touched keys.  Changed payload → version
    bump to 1; new key → version 0 (egraph_detail_model.erl:574-588)."""
    from .graph import _paths, _ts
    from .ingest import make_vertices, upsert_nodes

    g = _fixture(spark, sf_dir)
    touched = (
        _t(spark, sf_dir, "customer")
        .where(F.col("c_custkey").between(1, 5))
        .select(
            F.concat(F.lit("customer:"), F.col("c_custkey")).alias("key"),
            F.to_json(
                F.struct("c_custkey", F.upper(F.col("c_name")).alias("c_name"))
            ).alias("details"),
            _paths(["c_name"]).alias("index_paths"),
            _paths().alias("lowercase_index_paths"),
            F.lit("customer").alias("_kind"),
            _ts("c_custkey").alias("_updated_at"),
        )
    )
    fresh = spark.createDataFrame(
        [("brandnew:1", '{"hello": "world"}')], "key string, details string"
    ).select(
        "key",
        "details",
        _paths().alias("index_paths"),
        _paths().alias("lowercase_index_paths"),
        F.lit("new").alias("_kind"),
        F.lit("2024-06-01 00:00:00").cast("timestamp").alias("_updated_at"),
    )
    incoming = make_vertices(
        touched.unionByName(fresh), kind=F.col("_kind"), updated_at=F.col("_updated_at")
    ).drop("_kind", "_updated_at")
    merged = upsert_nodes(g.vertices, incoming)
    keys = [f"customer:{i}" for i in range(1, 6)] + ["brandnew:1"]
    return (
        merged.where(F.col("key").isin(keys))
        .select("key", F.col("version").cast("int").alias("version"))
    )


O_S15_UPSERT = """
SELECT 'customer:' || c_custkey AS key, CAST(1 AS INT) AS version
FROM customer WHERE c_custkey BETWEEN 1 AND 5
UNION ALL
SELECT 'brandnew:1', CAST(0 AS INT)
"""


def q_s18_delete_nodes(spark, sf_dir):
    """Delete three nodes, return per-kind counts of what remains."""
    from .ingest import delete_nodes

    g = _fixture(spark, sf_dir)
    remaining = delete_nodes(g.vertices, ["customer:1", "part:10", "region:0"])
    return remaining.groupBy("kind").agg(F.count("*").alias("n"))


O_S18_DELETE = """
SELECT 'region' AS kind, count(*) AS n FROM region WHERE r_regionkey <> 0
UNION ALL SELECT 'nation', count(*) FROM nation
UNION ALL SELECT 'customer', count(*) FROM customer WHERE c_custkey <> 1
UNION ALL SELECT 'supplier', count(*) FROM supplier
UNION ALL SELECT 'part', count(*) FROM part WHERE p_partkey <> 10
"""


def q_reindex_status(spark, sf_dir):
    """Per-shard reindex watermarks over the graph fixture (16 shards) —
    Engine.reindex_status(), the reference's egraph_reindex_status table
    surface (sql/egraph_table_creation.sql:214-222).  The gate checks the
    deterministic columns (shard assignment, node counts, version
    watermark); index-row counts and timestamps are pytest-covered."""
    from .engine import Engine

    g = _fixture(spark, sf_dir)
    eng = Engine(spark, g.vertices, g.edges, g.indexes)
    return eng.reindex_status(n_shards=16).select(
        "shard_id", "n_nodes", "max_version", "is_reindexing"
    )


O_REINDEX_STATUS = """
WITH keys AS (
  SELECT 'region:' || r_regionkey AS key FROM region
  UNION ALL SELECT 'nation:' || n_nationkey FROM nation
  UNION ALL SELECT 'customer:' || c_custkey FROM customer
  UNION ALL SELECT 'supplier:' || s_suppkey FROM supplier
  UNION ALL SELECT 'part:' || p_partkey FROM part
)
SELECT CAST(CAST(('0x' || substr(md5(key), 1, 15)) AS BIGINT) % 16 AS BIGINT)
         AS shard_id,
       count(*) AS n_nodes,
       CAST(0 AS BIGINT) AS max_version,
       CAST(0 AS INT) AS is_reindexing
FROM keys GROUP BY 1 ORDER BY 1
"""


def q_s15_logtable_persisted(spark, sf_dir):
    """PERSISTENT mutation (S15 upsert + S18 delete on storage, not just on
    DataFrames): build a log-structured parquet table from customers, apply
    an upsert delta and a tombstone delta, then merge-on-read and aggregate.

    base    = customers with c_custkey % 3 != 0
    upsert  = customers with c_custkey % 5 == 0, acctbal + 100.50
              (updates rows in base, inserts the %3==0 ones not in base)
    delete  = customers with c_custkey % 7 == 0
    output  = per-segment counts/balances + the etag (_seq) evidence

    Exercises sources/logtable.py end-to-end: segment layout, tombstones,
    window merge, snapshot ``_seq``.  The reference's versioned in-place
    mutations are egraph_detail_model.erl:574-588 / 260-277.
    """
    import shutil

    from .sources import logtable as lt

    path = f"{_IO_ROOT}/logtable-{os.path.basename(sf_dir.rstrip('/'))}"
    shutil.rmtree(path, ignore_errors=True)
    cust = _t(spark, sf_dir, "customer").select(
        "c_custkey",
        "c_mktsegment",
        F.col("c_acctbal").cast("decimal(18,2)").alias("bal"),
    )
    lt.create(cust.where(F.col("c_custkey") % 3 != 0), path, ["c_custkey"])
    lt.append_upsert(
        cust.where(F.col("c_custkey") % 5 == 0).withColumn(
            "bal", F.col("bal") + F.lit("100.50").cast("decimal(18,2)")
        ),
        path,
    )
    lt.append_delete(
        cust.where(F.col("c_custkey") % 7 == 0).select("c_custkey"), path
    )
    latest = lt.read_latest(spark, path)
    return latest.groupBy("c_mktsegment").agg(
        F.count("*").alias("n"),
        F.sum("bal").cast("double").alias("sum_bal"),
        F.max(F.col("_seq").cast("long")).alias("max_seq"),
    )


O_S15_LOGTABLE = """
SELECT c_mktsegment, count(*) AS n,
       cast(sum(bal) as double) AS sum_bal,
       CAST(max(CASE WHEN c_custkey % 5 = 0 THEN 1 ELSE 0 END) AS BIGINT) AS max_seq
FROM (
  SELECT c_custkey, c_mktsegment,
         CASE WHEN c_custkey % 5 = 0
              THEN cast(c_acctbal as decimal(18,2)) + 100.50
              ELSE cast(c_acctbal as decimal(18,2)) END AS bal
  FROM customer
  WHERE (c_custkey % 3 <> 0 OR c_custkey % 5 = 0) AND c_custkey % 7 <> 0
)
GROUP BY c_mktsegment
"""


def q_s15_logtable_asof(spark, sf_dir):
    """Time-travel read over the persistent logtable: the ``as_of=1``
    snapshot (post-upsert, pre-delete) of the same base/upsert/tombstone
    log as `s15_logtable_persisted` — the delete segment exists on disk
    but is excluded by partition pruning on `seg`, so the aggregate must
    reproduce the pre-delete state exactly.  Snapshot isolation is the
    reference's versioned-read surface (egraph_detail_model.erl:574-588)
    generalized to any historical _seq."""
    import shutil

    from .sources import logtable as lt

    path = f"{_IO_ROOT}/logtable-asof-{os.path.basename(sf_dir.rstrip('/'))}"
    shutil.rmtree(path, ignore_errors=True)
    cust = _t(spark, sf_dir, "customer").select(
        "c_custkey",
        "c_mktsegment",
        F.col("c_acctbal").cast("decimal(18,2)").alias("bal"),
    )
    lt.create(cust.where(F.col("c_custkey") % 3 != 0), path, ["c_custkey"])
    lt.append_upsert(
        cust.where(F.col("c_custkey") % 5 == 0).withColumn(
            "bal", F.col("bal") + F.lit("100.50").cast("decimal(18,2)")
        ),
        path,
    )
    lt.append_delete(
        cust.where(F.col("c_custkey") % 7 == 0).select("c_custkey"), path
    )
    snap = lt.read_latest(spark, path, as_of=1)
    return snap.groupBy("c_mktsegment").agg(
        F.count("*").alias("n"),
        F.sum("bal").cast("double").alias("sum_bal"),
        F.max(F.col("_seq").cast("long")).alias("max_seq"),
    )


O_S15_LOGTABLE_ASOF = """
SELECT c_mktsegment, count(*) AS n,
       cast(sum(bal) as double) AS sum_bal,
       CAST(max(CASE WHEN c_custkey % 5 = 0 THEN 1 ELSE 0 END) AS BIGINT) AS max_seq
FROM (
  SELECT c_custkey, c_mktsegment,
         CASE WHEN c_custkey % 5 = 0
              THEN cast(c_acctbal as decimal(18,2)) + 100.50
              ELSE cast(c_acctbal as decimal(18,2)) END AS bal
  FROM customer
  WHERE c_custkey % 3 <> 0 OR c_custkey % 5 = 0
)
GROUP BY c_mktsegment
"""


def q_s15_logtable_compact(spark, sf_dir):
    """Compaction invariance, oracle-asserted: fold the base/upsert/
    tombstone log into one fresh segment (read amplification back to 1 —
    the maintenance op merge-on-read tables live or die by), then prove
    readers see the identical merged state by aggregating the compacted
    table against the same arithmetic oracle as the uncompacted read.
    `n_segments` pins the physical evidence (exactly one segment left)."""
    import shutil

    from .sources import logtable as lt

    path = f"{_IO_ROOT}/logtable-compact-{os.path.basename(sf_dir.rstrip('/'))}"
    shutil.rmtree(path, ignore_errors=True)
    cust = _t(spark, sf_dir, "customer").select(
        "c_custkey",
        "c_mktsegment",
        F.col("c_acctbal").cast("decimal(18,2)").alias("bal"),
    )
    lt.create(cust.where(F.col("c_custkey") % 3 != 0), path, ["c_custkey"])
    lt.append_upsert(
        cust.where(F.col("c_custkey") % 5 == 0).withColumn(
            "bal", F.col("bal") + F.lit("100.50").cast("decimal(18,2)")
        ),
        path,
    )
    lt.append_delete(
        cust.where(F.col("c_custkey") % 7 == 0).select("c_custkey"), path
    )
    lt.compact(spark, path)
    n_segments = len(lt._segments(path))
    return (
        lt.read_latest(spark, path)
        .groupBy("c_mktsegment")
        .agg(
            F.count("*").alias("n"),
            F.sum("bal").cast("double").alias("sum_bal"),
        )
        .withColumn("n_segments", F.lit(n_segments).cast("long"))
    )


O_S15_LOGTABLE_COMPACT = """
SELECT c_mktsegment, count(*) AS n,
       cast(sum(bal) as double) AS sum_bal,
       CAST(1 AS BIGINT) AS n_segments
FROM (
  SELECT c_custkey, c_mktsegment,
         CASE WHEN c_custkey % 5 = 0
              THEN cast(c_acctbal as decimal(18,2)) + 100.50
              ELSE cast(c_acctbal as decimal(18,2)) END AS bal
  FROM customer
  WHERE (c_custkey % 3 <> 0 OR c_custkey % 5 = 0) AND c_custkey % 7 <> 0
)
GROUP BY c_mktsegment
"""


def q_s15_logtable_diff(spark, sf_dir):
    """CDC snapshot diff over the same base/upsert/tombstone log as
    `s15_logtable_persisted`: every key touched after the base segment,
    classified insert/update/delete against the base snapshot.  The
    winner-per-key pass reads only the delta segments (seg pruning); the
    before-snapshot is semi-join-pruned to affected keys."""
    import shutil

    from .sources import logtable as lt

    path = f"{_IO_ROOT}/logtable-diff-{os.path.basename(sf_dir.rstrip('/'))}"
    shutil.rmtree(path, ignore_errors=True)
    cust = _t(spark, sf_dir, "customer").select(
        "c_custkey",
        "c_mktsegment",
        F.col("c_acctbal").cast("decimal(18,2)").alias("bal"),
    )
    lt.create(cust.where(F.col("c_custkey") % 3 != 0), path, ["c_custkey"])
    lt.append_upsert(
        cust.where(F.col("c_custkey") % 5 == 0).withColumn(
            "bal", F.col("bal") + F.lit("100.50").cast("decimal(18,2)")
        ),
        path,
    )
    lt.append_delete(
        cust.where(F.col("c_custkey") % 7 == 0).select("c_custkey"), path
    )
    return lt.snapshot_diff(spark, path, from_seg=0).select(
        "c_custkey", "change", F.col("_seq").cast("long").alias("_seq")
    )


# Relational reconstruction: base = %3!=0; seg1 upserts %5==0; seg2
# tombstones %7==0.  Winner per key = seg2 if %7==0 else seg1; classify
# against base membership; tombstones of never-existed keys drop out.
O_S15_LOGTABLE_DIFF = """
WITH touched AS (
  SELECT c_custkey,
         CASE WHEN c_custkey % 7 = 0 THEN 'd' ELSE 'u' END AS op,
         CASE WHEN c_custkey % 7 = 0 THEN 2 ELSE 1 END AS seg,
         (c_custkey % 3 <> 0) AS existed
  FROM customer
  WHERE c_custkey % 5 = 0 OR c_custkey % 7 = 0
)
SELECT c_custkey,
       CASE WHEN op = 'd' AND existed THEN 'delete'
            WHEN op = 'u' AND existed THEN 'update'
            WHEN op = 'u' AND NOT existed THEN 'insert' END AS change,
       CAST(seg AS BIGINT) AS _seq
FROM touched
WHERE NOT (op = 'd' AND NOT existed)
"""


# --------------------------------------------------------------------------
# Remaining reference-surface rows: S9, J2, W5, P5
# --------------------------------------------------------------------------


def q_s9_geo_exact(spark, sf_dir):
    """Geo-exact index match (egraph_index_model.erl:319-321): nation whose
    capital is exactly (-180.0, -80.0) — nation 0's fixture point (exact in
    binary, so equality is engine-portable)."""
    from .operators import search

    g = _fixture(spark, sf_dir)
    ids = search.index_condition_ids(
        g.indexes,
        {
            "key": {"type": "Point", "coordinates": [-180.0, -80.0]},
            "key_type": "geo",
            "index_name": "capital_geolocation",
        },
    )
    return g.vertices.join(ids, "id", "left_semi").select("key")


O_S9 = "SELECT 'nation:' || n_nationkey AS key FROM nation WHERE n_nationkey = 0"


def q_j2_adjacency_details(spark, sf_dir):
    """J2: one-hop adjacency annotated with destination node details
    (src/egraph_api.erl:187-213 embeds `__node_details` per link)."""
    g = _fixture(spark, sf_dir)
    from .ingest import node_id

    out_edges = g.edges.where(F.col("src") == node_id(F.lit("customer:7"))).alias("e")
    v = g.vertices.alias("v")
    return (
        out_edges.join(v, F.col("e.dst") == F.col("v.id"))
        .select(
            F.col("e.dst_key").alias("dst_key"),
            F.coalesce(
                F.get_json_object(F.col("v.details"), "$.n_name"),
                F.get_json_object(F.col("v.details"), "$.p_name"),
            ).alias("dst_name"),
        )
    )


O_J2 = """
SELECT 'nation:' || c_nationkey AS dst_key, n_name AS dst_name
FROM customer JOIN nation ON c_nationkey = n_nationkey WHERE c_custkey = 7
UNION ALL
SELECT 'part:' || p_partkey, p_name FROM part
WHERE p_partkey IN (
  SELECT l_partkey FROM orders JOIN lineitem ON o_orderkey = l_orderkey
  WHERE o_custkey = 7)
"""


def q_w5_time_probe(spark, sf_dir):
    """W5: bounded time-window probe — top-k earliest rows, then min/max
    bounds (models/egraph_detail_model.erl:693-718's LIMIT pre-query)."""
    g = _fixture(spark, sf_dir)
    first_k = (
        g.vertices.where(F.col("kind") == "customer")
        .orderBy("updated_at", "key")
        .limit(100)
    )
    return first_k.agg(
        F.min("updated_at").alias("lo"),
        F.max("updated_at").alias("hi"),
        F.count("*").alias("n"),
    )


O_W5 = """
SELECT min(updated_at) AS lo, max(updated_at) AS hi, count(*) AS n FROM (
  SELECT TIMESTAMP '2024-01-01' + (c_custkey % 365) * INTERVAL 1 DAY AS updated_at,
         'customer:' || c_custkey AS key
  FROM customer ORDER BY updated_at, key LIMIT 100
)
"""


def q_p5_keytype_rawhex(spark, sf_dir):
    """P5: keytype normalization — client passes the node id as raw hex;
    the engine parses it back to the signed 64-bit id and point-reads
    (models/egraph_detail_model.erl:108-118 rawhex branch)."""
    g = _fixture(spark, sf_dir)

    # The rawhex round-trip stays entirely inside the plan (no driver-side
    # head() during query construction): format the id to 16-digit hex — the
    # client's wire form — then parse it back and point-read via a broadcast
    # semi-join on the recovered id.
    hexed = (
        g.vertices.where(F.col("key") == "customer:7")
        .select(F.format_string("%016x", "id").alias("h"))
    )
    # hex → unsigned conv → wrap to signed long (two's complement)
    parsed = F.conv(F.col("h"), 16, 10).cast("decimal(20,0)")
    signed = F.when(
        parsed > F.lit(str(2**63 - 1)).cast("decimal(20,0)"),
        (parsed - F.lit(str(2**64)).cast("decimal(21,0)")).cast("long"),
    ).otherwise(parsed.cast("long"))
    wanted = hexed.select(signed.alias("id"))
    return g.vertices.join(F.broadcast(wanted), "id", "left_semi").select("key")


O_P5 = "SELECT 'customer:7' AS key"


# --------------------------------------------------------------------------
# Additional Spark-native analytics (aggregates / windows / SQL API)
# --------------------------------------------------------------------------

_Q6_REV = (
    "cast(l_extendedprice as decimal(18,2)) * cast(l_discount as decimal(18,2))"
)


def q_agg_q6_forecast_revenue(spark, sf_dir):
    li = _t(spark, sf_dir, "lineitem")
    return (
        li.where(
            F.expr("l_shipdate >= timestamp'1995-01-01 00:00:00'")
            & F.expr("l_shipdate < timestamp'1996-01-01 00:00:00'")
            & F.col("l_discount").between(0.05, 0.07)
            & (F.col("l_quantity") < 24)
        )
        .agg(F.expr(f"cast(sum({_Q6_REV}) as double)").alias("revenue"))
    )


O_AGG_Q6 = f"""
SELECT cast(sum({_Q6_REV}) as double) AS revenue
FROM lineitem
WHERE l_shipdate >= TIMESTAMP '1995-01-01' AND l_shipdate < TIMESTAMP '1996-01-01'
  AND l_discount BETWEEN 0.05 AND 0.07 AND l_quantity < 24
"""


def q_agg_cube(spark, sf_dir):
    li = _t(spark, sf_dir, "lineitem")
    return li.cube("l_returnflag", "l_linestatus").agg(F.count("*").alias("n"))


O_AGG_CUBE = """
SELECT l_returnflag, l_linestatus, count(*) AS n
FROM lineitem GROUP BY CUBE (l_returnflag, l_linestatus)
"""


_PIVOT_PRI = ["1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED", "5-LOW"]


def q_agg_pivot(spark, sf_dir):
    """Order counts per month PIVOTED by priority (wide columns).  The
    pivot values are EXPLICIT — no extra distinct-collect job, a stable
    output schema, and the plan stays one partial-aggregated groupBy
    (each priority becomes a conditional count — the same physical shape
    as the oracle's FILTER aggregates)."""
    o = _t(spark, sf_dir, "orders")
    wide = (
        o.groupBy(
            F.date_trunc("month", F.col("o_orderdate")).alias("month")
        )
        .pivot("o_orderpriority", _PIVOT_PRI)
        .agg(F.count(F.lit(1)))
    )
    return wide.select(
        "month",
        *[
            F.coalesce(F.col(f"`{p}`"), F.lit(0)).cast("long").alias(f"n_{p[0]}")
            for p in _PIVOT_PRI
        ],
    ).orderBy("month")


O_AGG_PIVOT = """
SELECT CAST(date_trunc('month', o_orderdate) AS TIMESTAMP) AS month,
       count(*) FILTER (WHERE o_orderpriority = '1-URGENT') AS n_1,
       count(*) FILTER (WHERE o_orderpriority = '2-HIGH') AS n_2,
       count(*) FILTER (WHERE o_orderpriority = '3-MEDIUM') AS n_3,
       count(*) FILTER (WHERE o_orderpriority = '4-NOT SPECIFIED') AS n_4,
       count(*) FILTER (WHERE o_orderpriority = '5-LOW') AS n_5
FROM orders GROUP BY 1 ORDER BY month
"""


def q_win_ntile(spark, sf_dir):
    """Quartile assignment of customers by account balance within each
    market segment (ntile(4), custkey tie-break) — the bucketing step of
    quantile-stratified analyses."""
    from pyspark.sql import Window as W

    c = _t(spark, sf_dir, "customer")
    w = W.partitionBy("c_mktsegment").orderBy(
        F.col("c_acctbal"), F.col("c_custkey")
    )
    return c.select(
        "c_custkey",
        "c_mktsegment",
        F.ntile(4).over(w).cast("long").alias("quartile"),
    )


O_WIN_NTILE = """
SELECT c_custkey, c_mktsegment,
       CAST(ntile(4) OVER (PARTITION BY c_mktsegment
                           ORDER BY c_acctbal, c_custkey) AS BIGINT) AS quartile
FROM customer
"""


def q_agg_count_distinct(spark, sf_dir):
    cust = _t(spark, sf_dir, "customer")
    return cust.groupBy("c_mktsegment").agg(
        F.count_distinct("c_nationkey").alias("n_nations"),
        F.count("*").alias("n"),
    )


O_AGG_CNTD = """
SELECT c_mktsegment, count(DISTINCT c_nationkey) AS n_nations, count(*) AS n
FROM customer GROUP BY c_mktsegment
"""


def q_win_running_sum(spark, sf_dir):
    from pyspark.sql import Window as W

    orders = _t(spark, sf_dir, "orders")
    w = (
        W.partitionBy("o_custkey")
        .orderBy("o_orderdate", "o_orderkey")
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    return orders.select(
        "o_custkey",
        "o_orderkey",
        F.sum(F.col("o_totalprice").cast("decimal(18,2)"))
        .over(w)
        .cast("double")
        .alias("running_total"),
    )


O_WIN_RUNNING = """
SELECT o_custkey, o_orderkey,
       cast(sum(cast(o_totalprice as decimal(18,2)))
            OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
                  ROWS UNBOUNDED PRECEDING) as double) AS running_total
FROM orders
"""


def q_sql_grouping_sets(spark, sf_dir):
    """Exercises the spark.sql() API surface over a registered temp view."""
    _t(spark, sf_dir, "events").createOrReplaceTempView("events_v")
    return spark.sql(
        """
        SELECT event_type, cast(user_id % 10 as bigint) AS user_bucket,
               count(*) AS n
        FROM events_v
        GROUP BY GROUPING SETS ((event_type), (user_id % 10), ())
        """
    )


O_SQL_GSETS = """
SELECT event_type, user_id % 10 AS user_bucket, count(*) AS n
FROM events GROUP BY GROUPING SETS ((event_type), (user_id % 10), ())
"""


# --------------------------------------------------------------------------
# Pregel-style graph algorithms (north-star GraphX/Pregel approach)
# --------------------------------------------------------------------------


def q_graph_cc(spark, sf_dir):
    """Connected components of the nation↔region membership subgraph:
    one component per region (region node + its member nations), labeled by
    the lexicographically smallest member key."""
    from .operators.graph_algos import connected_components

    g = _fixture(spark, sf_dir)
    membership = g.edges.where(
        F.get_json_object("details", "$.rel") == "in_region"
    )
    return connected_components(membership, undirected=True)


O_GRAPH_CC = """
WITH comp AS (
  SELECT n_regionkey, min('nation:' || n_nationkey) AS component
  FROM nation GROUP BY n_regionkey
)
SELECT 'nation:' || n_nationkey AS key, c.component
FROM nation n JOIN comp c ON n.n_regionkey = c.n_regionkey
UNION ALL
SELECT 'region:' || r_regionkey, c.component
FROM region r JOIN comp c ON r.r_regionkey = c.n_regionkey
"""


def q_graph_bfs_levels(spark, sf_dir):
    """Min-hop distance from customer:7 to every node within 3 hops."""
    from .operators.graph_algos import bfs_levels

    g = _fixture(spark, sf_dir)
    return bfs_levels(g.edges, "customer:7", max_depth=3)


# The fixture graph is a DAG (customer→{nation,part}→{region,supplier}→
# nation→region), so the recursive walk terminates without a cycle guard.
O_GRAPH_BFS = """
WITH RECURSIVE e AS (
  SELECT 'customer:' || c_custkey AS src_key, 'nation:' || c_nationkey AS dst_key FROM customer
  UNION ALL SELECT 'supplier:' || s_suppkey, 'nation:' || s_nationkey FROM supplier
  UNION ALL SELECT 'nation:' || n_nationkey, 'region:' || n_regionkey FROM nation
  UNION ALL SELECT DISTINCT 'customer:' || o_custkey, 'part:' || l_partkey
            FROM orders JOIN lineitem ON o_orderkey = l_orderkey
  UNION ALL SELECT DISTINCT 'part:' || l_partkey, 'supplier:' || l_suppkey FROM lineitem
),
walk(key, lvl) AS (
  SELECT 'customer:7', 0
  UNION ALL
  SELECT e.dst_key, w.lvl + 1 FROM walk w JOIN e ON e.src_key = w.key
  WHERE w.lvl < 3
)
SELECT key, CAST(min(lvl) AS INT) AS level FROM walk GROUP BY key
"""


def q_graph_harmonic(spark, sf_dir):
    """Landmark harmonic centrality over the UNDIRECTED fixture graph:
    nation nodes as the (bounded, 25-row) seed set, depth 3 — multi-source
    BFS carrying (seed, key) pairs, exact integer 10⁶/d contributions.
    The oracle replays the walk with a set-semantics recursive CTE.

    Cost knobs (the scale controls — cost is linear in BOTH):
      * |seeds|: shuffle volume per BFS round is |frontier| x |seeds|
        (seed,key) pairs; halving the landmark set halves every round.
      * max_depth: rounds of join-against-edges; each round's frontier is
        bounded by |V| x |seeds|.
    At 100 TB you tune accuracy vs cost HERE (fewer landmarks / shallower
    walk), never by changing the operator.  Measured: 10x data -> 3.4x,
    32x -> see SCALE_PROBE.md (round-6 block)."""
    from .operators.graph_algos import harmonic_centrality

    g = _fixture(spark, sf_dir)
    seeds = _t(spark, sf_dir, "nation").select(
        F.concat(F.lit("nation:"), F.col("n_nationkey")).alias("seed")
    )
    # the operator symmetrizes and dedups INTERNALLY on the 8-byte id
    # pairs — the old gate-side string-pair distinct materialized the
    # largest table in the query only to be re-hashed immediately
    # pre_deduped: the fixture's five edge families are each distinct and
    # their ordered (src-prefix, dst-prefix) pairs are disjoint with no
    # family's reverse being a family (graph.py edge derivation), so the
    # symmetrized union cannot repeat a pair — the operator's defensive
    # edge-sized dedup shuffle is a no-op and is skipped
    # keymap = the cached vertices table: key is its primary key and
    # every edge endpoint references it (checked: endpoints ≡ vertex
    # keys at every SF), so the operator skips the edge-sized string
    # distinct it would otherwise run just to recover key strings
    return harmonic_centrality(
        g.edges.select("src_key", "dst_key"), seeds, max_depth=3,
        symmetrize=True, pre_deduped=True, keymap=g.vertices.select("key"),
    )


O_GRAPH_HARMONIC = """
WITH RECURSIVE e0 AS (
  SELECT 'customer:' || c_custkey AS src_key, 'nation:' || c_nationkey AS dst_key FROM customer
  UNION ALL SELECT 'supplier:' || s_suppkey, 'nation:' || s_nationkey FROM supplier
  UNION ALL SELECT 'nation:' || n_nationkey, 'region:' || n_regionkey FROM nation
  UNION ALL SELECT DISTINCT 'customer:' || o_custkey, 'part:' || l_partkey
            FROM orders JOIN lineitem ON o_orderkey = l_orderkey
  UNION ALL SELECT DISTINCT 'part:' || l_partkey, 'supplier:' || l_suppkey FROM lineitem
),
und AS (SELECT src_key AS a, dst_key AS b FROM e0 UNION SELECT dst_key, src_key FROM e0),
seeds AS (SELECT 'nation:' || n_nationkey AS seed FROM nation),
walk(seed, key, lvl) AS (
  SELECT seed, seed, 0 FROM seeds
  UNION
  SELECT w.seed, und.b, w.lvl + 1
  FROM walk w JOIN und ON und.a = w.key WHERE w.lvl < 3
),
md AS (SELECT seed, key, CAST(min(lvl) AS BIGINT) AS d FROM walk GROUP BY 1, 2)
SELECT key, count(*) AS n_sources,
       CAST(sum(1000000 // d) AS BIGINT) AS harmonic_micro
FROM md WHERE d > 0 GROUP BY key ORDER BY key
"""


def q_graph_kcore(spark, sf_dir):
    """4-round 2-core peel of the part↔supplier bipartite subgraph —
    iterative degeneracy pruning (the graph-cleaning step before dense-
    subgraph mining).  The oracle unrolls the identical 4 rounds, so
    parity holds round-for-round whether or not the peel has converged."""
    from .operators.graph_algos import kcore_peel

    g = _fixture(spark, sf_dir)
    # one JSON-parse pass, materialized: kcore_peel scans its input four
    # times (keymap union ×2 + symmetrizing union ×2) — uncut, every
    # scan re-parses `details` over the full cached edge table
    supplied = cut_lineage(
        g.edges.where(
            F.get_json_object("details", "$.rel") == "supplied_by"
        ).select("src", "dst", "src_key", "dst_key")
    )
    # keymap = vertices (node_id ≡ xxhash64(key); survivors anchor the
    # inner mapback, so the superset is harmless) — spares the operator's
    # two-sided (id, key) union + distinct over the edge table
    return kcore_peel(supplied, k=2, rounds=4, keymap=g.vertices.select("key"))


def _kcore_oracle(k: int = 2, rounds: int = 4) -> str:
    sql = """
WITH e0 AS (
  SELECT a, b FROM (
    SELECT DISTINCT 'part:' || l_partkey AS a, 'supplier:' || l_suppkey AS b
    FROM lineitem)
  UNION
  SELECT b, a FROM (
    SELECT DISTINCT 'part:' || l_partkey AS a, 'supplier:' || l_suppkey AS b
    FROM lineitem)
)"""
    prev = "e0"
    for r in range(1, rounds + 1):
        sql += f""",
n{r} AS (SELECT a FROM {prev} GROUP BY a HAVING count(*) >= {k}),
e{r} AS (
  SELECT {prev}.a, {prev}.b FROM {prev}
  SEMI JOIN n{r} ON {prev}.a = n{r}.a
  SEMI JOIN n{r} AS m{r} ON {prev}.b = m{r}.a
)"""
        prev = f"e{r}"
    sql += f"\nSELECT a AS key, count(*) AS degree FROM {prev} GROUP BY a"
    return sql


O_GRAPH_KCORE = _kcore_oracle()


def q_graph_degree_stats(spark, sf_dir):
    """Log2-bucketed degree distribution of the whole fixture graph — the
    skew-profiling scan run before choosing a partitioning strategy."""
    from .operators.graph_algos import degree_stats

    g = _fixture(spark, sf_dir)
    return degree_stats(g.edges)


O_GRAPH_DEGREE = """
WITH e0 AS (
  SELECT 'customer:' || c_custkey AS a, 'nation:' || c_nationkey AS b FROM customer
  UNION ALL SELECT 'supplier:' || s_suppkey, 'nation:' || s_nationkey FROM supplier
  UNION ALL SELECT 'nation:' || n_nationkey, 'region:' || n_regionkey FROM nation
  UNION ALL SELECT DISTINCT 'customer:' || o_custkey, 'part:' || l_partkey
            FROM orders JOIN lineitem ON o_orderkey = l_orderkey
  UNION ALL SELECT DISTINCT 'part:' || l_partkey, 'supplier:' || l_suppkey FROM lineitem
),
und AS (SELECT a, b FROM e0 UNION SELECT b, a FROM e0),
deg AS (SELECT a, count(*) AS deg FROM und GROUP BY a)
SELECT CAST(length(bin(deg)) - 1 AS BIGINT) AS bucket,
       count(*) AS n_vertices, min(deg) AS min_deg, max(deg) AS max_deg
FROM deg GROUP BY 1 ORDER BY 1
"""


def q_graph_betweenness(spark, sf_dir):
    """Seed-sampled depth-3 betweenness (Brandes landmark form) over the
    undirected fixture graph, nation seeds — σ path counts forward,
    integer-micro dependency accumulation backward; the oracle unrolls
    both passes level by level.

    Cost knobs (the scale controls — cost is linear in BOTH):
      * |seeds|: both passes carry (seed, node) state; work and shuffle
        are proportional to the number of sampled sources (Brandes is
        exact at |seeds| = |V|; sampling is the standard approximation,
        Riondato-Kornaropoulos bounds apply).
      * max_depth: forward rounds + the same number of backward rounds;
        bounds reached pairs per seed.
    At 100 TB you tune accuracy vs cost HERE (sample fewer seeds /
    shallower DAG), never by changing the operator.  Measured: 10x data
    -> 4.9x, 32x -> see SCALE_PROBE.md (round-6 block)."""
    from .operators.graph_algos import betweenness_k

    g = _fixture(spark, sf_dir)
    seeds = _t(spark, sf_dir, "nation").select(
        F.concat(F.lit("nation:"), F.col("n_nationkey")).alias("seed")
    )
    # the operator symmetrizes and dedups INTERNALLY on the 8-byte id
    # pairs — the old gate-side string-pair distinct materialized the
    # largest table in the query only to be re-hashed immediately
    # pre_deduped: same structural proof as q_graph_harmonic — per-family
    # distinct + disjoint ordered prefix pairs + no family's reverse is a
    # family ⇒ the symmetrized union is duplicate-free, so σ is safe and
    # the operator's defensive dedup shuffle is skipped
    # keymap = vertices, same contract as q_graph_harmonic (seeds are
    # nation vertices, so the output key set is covered)
    return betweenness_k(
        g.edges.select("src_key", "dst_key"), seeds, max_depth=3,
        symmetrize=True, pre_deduped=True, keymap=g.vertices.select("key"),
    )


_BC_EDGES = """
e0 AS (
  SELECT 'customer:' || c_custkey AS a, 'nation:' || c_nationkey AS b FROM customer
  UNION ALL SELECT 'supplier:' || s_suppkey, 'nation:' || s_nationkey FROM supplier
  UNION ALL SELECT 'nation:' || n_nationkey, 'region:' || n_regionkey FROM nation
  UNION ALL SELECT DISTINCT 'customer:' || o_custkey, 'part:' || l_partkey
            FROM orders JOIN lineitem ON o_orderkey = l_orderkey
  UNION ALL SELECT DISTINCT 'part:' || l_partkey, 'supplier:' || l_suppkey FROM lineitem
),
e AS MATERIALIZED (SELECT a AS src_key, b AS dst_key FROM e0
                   UNION SELECT b, a FROM e0)
"""


def _bc_forward(k: int) -> str:
    prev = f"l{k - 1}" if k > 1 else "s0"
    anti = "\n    AND ".join(
        f"NOT EXISTS (SELECT 1 FROM {t} x{i} WHERE x{i}.seed = {prev}.seed"
        f" AND x{i}.key = e.dst_key)"
        for i, t in enumerate(["s0"] + [f"l{j}" for j in range(1, k)])
    )
    return f"""l{k} AS MATERIALIZED (
  SELECT {prev}.seed, e.dst_key AS key, CAST(sum({prev}.sigma) AS BIGINT) AS sigma
  FROM e JOIN {prev} ON e.src_key = {prev}.key
  WHERE {anti}
  GROUP BY 1, 2
)"""


def _bc_backward(lv: int) -> str:
    # contributions from d{lv+1} into l{lv}
    return f"""c{lv} AS (
  SELECT d{lv + 1}.seed, e.src_key AS key,
         CAST(sum(l{lv}.sigma * (1000000 + d{lv + 1}.delta) // d{lv + 1}.sigma)
              AS BIGINT) AS delta
  FROM e JOIN d{lv + 1} ON e.dst_key = d{lv + 1}.key
       JOIN l{lv} ON l{lv}.seed = d{lv + 1}.seed AND l{lv}.key = e.src_key
  GROUP BY 1, 2
),
d{lv} AS MATERIALIZED (
  SELECT l{lv}.seed, l{lv}.key, l{lv}.sigma,
         CAST(COALESCE(c{lv}.delta, 0) AS BIGINT) AS delta
  FROM l{lv} LEFT JOIN c{lv}
    ON c{lv}.seed = l{lv}.seed AND c{lv}.key = l{lv}.key
)"""


def _bc_oracle(depth: int = 3) -> str:
    parts = [_BC_EDGES.strip()]
    parts.append(
        "s0 AS MATERIALIZED (SELECT 'nation:' || n_nationkey AS seed,"
        " 'nation:' || n_nationkey AS key, CAST(1 AS BIGINT) AS sigma"
        " FROM nation)"
    )
    for k in range(1, depth + 1):
        parts.append(_bc_forward(k))
    parts.append(
        f"d{depth} AS MATERIALIZED (SELECT seed, key, sigma,"
        f" CAST(0 AS BIGINT) AS delta FROM l{depth})"
    )
    for lv in range(depth - 1, 0, -1):
        parts.append(_bc_backward(lv))
    union = "\n  UNION ALL ".join(
        f"SELECT key, delta FROM d{lv}" for lv in range(1, depth + 1)
    )
    return (
        "WITH " + ",\n".join(parts)
        + f"\nSELECT key, CAST(sum(delta) AS BIGINT) AS bc_micro FROM (\n  {union}\n) GROUP BY key ORDER BY key"
    )


O_GRAPH_BETWEENNESS = _bc_oracle(3)


def q_evt_props_json(spark, sf_dir):
    """Schemaless JSON props extraction + aggregation (the reference's
    nested-path read, P1, applied to the event stream)."""
    ev = _t(spark, sf_dir, "events")
    return (
        ev.select(
            "event_type",
            F.get_json_object("props", "$.k").try_cast("long").alias("k"),
        )
        .groupBy("event_type")
        .agg(
            F.count("k").alias("n_with_k"),
            F.sum("k").alias("sum_k"),
            F.max("k").alias("max_k"),
        )
    )


O_EVT_PROPS = """
SELECT event_type,
       count(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS n_with_k,
       CAST(sum(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT) AS sum_k,
       max(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS max_k
FROM events GROUP BY event_type
"""


# --------------------------------------------------------------------------
# As-of / range joins (custom operators Spark lacks natively)
# --------------------------------------------------------------------------


def q_join_asof(spark, sf_dir):
    """Each event joined to the customer's most recent order at event time.

    Right side deduped to one row per (custkey, orderdate) for exact
    cross-engine tie semantics (see operators/asof.py docstring)."""
    from pyspark.sql import Window as W

    from .operators.asof import asof_join

    ev = _t(spark, sf_dir, "events").select("event_id", "user_id", "ts")
    orders = _t(spark, sf_dir, "orders")
    rn = F.row_number().over(
        W.partitionBy("o_custkey", "o_orderdate").orderBy(F.col("o_orderkey").desc())
    )
    r1 = (
        orders.withColumn("rn", rn)
        .where(F.col("rn") == 1)
        .select("o_custkey", "o_orderdate", "o_orderkey", "o_totalprice")
    )
    return asof_join(
        ev.withColumnRenamed("user_id", "o_custkey"),
        r1,
        on="o_custkey",
        left_ts="ts",
        right_ts="o_orderdate",
        right_cols=["o_orderkey", "o_totalprice"],
    ).select(
        "event_id",
        F.col("o_custkey").alias("user_id"),
        "o_orderkey",
        "o_totalprice",
    )


O_JOIN_ASOF = """
WITH r AS (
  SELECT o_custkey, o_orderdate, o_orderkey, o_totalprice,
         row_number() OVER (PARTITION BY o_custkey, o_orderdate
                            ORDER BY o_orderkey DESC) AS rn
  FROM orders
), r1 AS (SELECT o_custkey, o_orderdate, o_orderkey, o_totalprice FROM r WHERE rn = 1)
SELECT e.event_id, e.user_id, r1.o_orderkey, r1.o_totalprice
FROM events e ASOF LEFT JOIN r1
  ON e.user_id = r1.o_custkey AND e.ts >= r1.o_orderdate
"""

def q_join_asof_tolerance(spark, sf_dir):
    """As-of join with a freshness tolerance (pandas merge_asof-style):
    each event joined to the SAME USER's most recent purchase event, but
    only if it happened within the preceding 2 hours — attribution with a
    staleness cutoff.  The purchase side is deduped to one row per
    (user, ts) for exact cross-engine tie semantics."""
    from pyspark.sql import Window as W

    from .operators.asof import asof_join

    ev = _t(spark, sf_dir, "events").select("event_id", "user_id", "ts")
    purchases = _t(spark, sf_dir, "events").where(
        F.col("event_type") == "purchase"
    )
    rn = F.row_number().over(
        W.partitionBy("user_id", "ts").orderBy(F.col("event_id").desc())
    )
    r1 = (
        purchases.withColumn("rn", rn)
        .where(F.col("rn") == 1)
        .select(
            "user_id",
            F.col("ts").alias("p_ts"),
            F.col("event_id").alias("purchase_id"),
            F.col("value").alias("purchase_value"),
        )
    )
    return asof_join(
        ev,
        r1,
        on="user_id",
        left_ts="ts",
        right_ts="p_ts",
        right_cols=["purchase_id", "purchase_value"],
        tolerance_seconds=2 * 3600,
    ).select("event_id", "user_id", "purchase_id", "purchase_value")


O_JOIN_ASOF_TOL = """
WITH p AS (
  SELECT user_id, ts AS p_ts, event_id AS purchase_id, value AS purchase_value,
         row_number() OVER (PARTITION BY user_id, ts
                            ORDER BY event_id DESC) AS rn
  FROM events WHERE event_type = 'purchase'
), r1 AS (SELECT user_id, p_ts, purchase_id, purchase_value FROM p WHERE rn = 1)
SELECT e.event_id, e.user_id,
       CASE WHEN e.ts - r1.p_ts <= INTERVAL 2 HOUR
            THEN r1.purchase_id END AS purchase_id,
       CASE WHEN e.ts - r1.p_ts <= INTERVAL 2 HOUR
            THEN r1.purchase_value END AS purchase_value
FROM events e ASOF LEFT JOIN r1
  ON e.user_id = r1.user_id AND e.ts >= r1.p_ts
"""


def q_join_interval_overlap(spark, sf_dir):
    """Interval × interval overlap join via the bucketed equi-join (no
    theta/nested-loop anywhere): per-(user, day) activity spans × ±15-min
    windows around error events, hourly buckets, each qualifying pair
    emitted exactly once by the greatest-start-bucket rule.  Output: users
    with ≥1 overlapping error window and their pair counts."""
    from .operators.asof import interval_overlap_join

    ev = _t(spark, sf_dir, "events")
    act = ev.groupBy(
        "user_id", F.date_trunc("day", F.col("ts")).alias("day")
    ).agg(F.min("ts").alias("a_start"), F.max("ts").alias("a_end"))
    ew = ev.where(F.col("event_type") == "error").select(
        F.col("event_id").alias("err_id"),
        F.expr("ts - INTERVAL 15 MINUTE").alias("w_start"),
        F.expr("ts + INTERVAL 15 MINUTE").alias("w_end"),
    )
    pairs = interval_overlap_join(
        act, "a_start", "a_end", ew, "w_start", "w_end", bucket_seconds=3600
    )
    return (
        pairs.groupBy("user_id")
        .agg(F.count("*").alias("n_overlaps"))
        .orderBy("user_id")
    )


O_JOIN_INTERVAL_OVERLAP = """
WITH act AS (
  SELECT user_id, date_trunc('day', ts) AS day,
         min(ts) AS a_start, max(ts) AS a_end
  FROM events GROUP BY 1, 2
),
ew AS (
  SELECT event_id, ts - INTERVAL 15 MINUTE AS w_start,
         ts + INTERVAL 15 MINUTE AS w_end
  FROM events WHERE event_type = 'error'
)
SELECT a.user_id, count(*) AS n_overlaps
FROM act a JOIN ew w ON a.a_start <= w.w_end AND w.w_start <= a.a_end
GROUP BY 1 ORDER BY 1
"""


def q_join_asof_nearest(spark, sf_dir):
    """Nearest-direction as-of join (pandas merge_asof direction='nearest'):
    each event attributed to the same user's CLOSEST purchase within ±2 h,
    past or future, exact ties preferring the past one — both carries run
    over one partition exchange."""
    from pyspark.sql import Window as W

    from .operators.asof import asof_join

    ev = _t(spark, sf_dir, "events").select("event_id", "user_id", "ts")
    purchases = _t(spark, sf_dir, "events").where(
        F.col("event_type") == "purchase"
    )
    rn = F.row_number().over(
        W.partitionBy("user_id", "ts").orderBy(F.col("event_id").desc())
    )
    r1 = (
        purchases.withColumn("rn", rn)
        .where(F.col("rn") == 1)
        .select(
            "user_id",
            F.col("ts").alias("p_ts"),
            F.col("event_id").alias("purchase_id"),
            F.col("value").alias("purchase_value"),
        )
    )
    return asof_join(
        ev,
        r1,
        on="user_id",
        left_ts="ts",
        right_ts="p_ts",
        right_cols=["purchase_id", "purchase_value"],
        tolerance_seconds=2 * 3600,
        direction="nearest",
    ).select("event_id", "user_id", "purchase_id", "purchase_value")


O_JOIN_ASOF_NEAREST = """
WITH p AS (
  SELECT user_id, ts AS p_ts, event_id AS purchase_id, value AS purchase_value,
         row_number() OVER (PARTITION BY user_id, ts
                            ORDER BY event_id DESC) AS rn
  FROM events WHERE event_type = 'purchase'
), r1 AS (SELECT user_id, p_ts, purchase_id, purchase_value FROM p WHERE rn = 1),
cand AS (
  SELECT e.event_id, e.user_id, r1.purchase_id, r1.purchase_value,
         row_number() OVER (
           PARTITION BY e.event_id
           ORDER BY abs(CAST(epoch(e.ts) AS BIGINT) - CAST(epoch(r1.p_ts) AS BIGINT)),
                    CASE WHEN r1.p_ts <= e.ts THEN 0 ELSE 1 END
         ) AS rn
  FROM events e LEFT JOIN r1
    ON r1.user_id = e.user_id
   AND abs(CAST(epoch(e.ts) AS BIGINT) - CAST(epoch(r1.p_ts) AS BIGINT)) <= 7200
)
SELECT event_id, user_id, purchase_id, purchase_value FROM cand WHERE rn = 1
"""


_PRICE_BANDS = [(0, "cheap", 900.0, 950.0), (1, "mid", 950.0, 980.0), (2, "high", 980.0, 1000.0)]


def q_join_range_bands(spark, sf_dir):
    """Parts binned into price-interval bands via the bucketed range join."""
    from .operators.asof import range_join

    part = _t(spark, sf_dir, "part").select("p_partkey", "p_retailprice")
    bands = spark.createDataFrame(
        _PRICE_BANDS, "band_id long, band string, lo double, hi double"
    )
    joined = range_join(part, "p_retailprice", bands, "lo", "hi", bucket_width=250.0)
    return joined.groupBy("band_id", "band").agg(
        F.count("*").alias("n"),
        F.expr("cast(sum(cast(p_retailprice as decimal(18,2))) as double)").alias(
            "sum_price"
        ),
    )


O_JOIN_RANGE = """
WITH bands(band_id, band, lo, hi) AS (
  VALUES (CAST(0 AS BIGINT), 'cheap', 900.0, 950.0),
         (CAST(1 AS BIGINT), 'mid', 950.0, 980.0),
         (CAST(2 AS BIGINT), 'high', 980.0, 1000.0)
)
SELECT band_id, band, count(*) AS n,
       cast(sum(cast(p_retailprice as decimal(18,2))) as double) AS sum_price
FROM part JOIN bands ON p_retailprice >= lo AND p_retailprice < hi
GROUP BY band_id, band
"""


def q_stream_stateful_counts(spark, sf_dir):
    """Custom stateful operator (applyInPandasWithState) run as a REAL
    stream; the final per-user totals hash-match plain SQL.  Robust to the
    source splitting into several micro-batches: the last update per user
    (max n — monotone) is the final state."""
    from .streaming.stream import (
        read_events_stream,
        run_to_memory,
        stateful_user_counts,
    )

    ev = read_events_stream(spark, sf_dir)
    tbl = run_to_memory(
        stateful_user_counts(ev), "stream_stateful_tbl", output_mode="update"
    )
    final = tbl.groupBy("user_id").agg(F.max(F.struct("n", "total")).alias("s"))
    return final.select("user_id", F.col("s.n").alias("n"), F.col("s.total").alias("total"))


O_STREAM_STATEFUL = """
SELECT user_id, count(*) AS n,
       sum(CAST(round(value * 100) AS BIGINT)) / 100.0 AS total
FROM events GROUP BY user_id
"""


def q_stream_user_profile(spark, sf_dir):
    """Custom stateful streaming operator with MAP-shaped per-key state
    (per-user event_type → (n, cents)), run as a real stream; emits the
    running profile (n_events, n_types, deterministic top_type, exact
    total).  The forward implementation is Spark 4 transformWithState
    (stream.user_type_profile, env-gated on protobuf); this gate runs the
    applyInPandasWithState build of the same operator.  Multi-batch robust:
    the last update per user (max n_events — monotone) is the final state."""
    from .streaming.stream import (
        read_events_stream,
        run_to_memory,
        user_type_profile_compat,
    )

    ev = read_events_stream(spark, sf_dir)
    tbl = run_to_memory(
        user_type_profile_compat(ev), "stream_user_profile_tbl", output_mode="update"
    )
    final = tbl.groupBy("user_id").agg(
        F.max(F.struct("n_events", "n_types", "top_type", "total")).alias("s")
    )
    return final.select(
        "user_id",
        F.col("s.n_events").alias("n_events"),
        F.col("s.n_types").alias("n_types"),
        F.col("s.top_type").alias("top_type"),
        F.col("s.total").alias("total"),
    )


O_STREAM_PROFILE = """
WITH t AS (
  SELECT user_id, event_type, count(*) AS n,
         sum(CAST(round(value * 100) AS BIGINT)) AS cents
  FROM events GROUP BY user_id, event_type
), r AS (
  SELECT *, max(n) OVER (PARTITION BY user_id) AS mx FROM t
)
SELECT user_id,
       CAST(sum(n) AS BIGINT) AS n_events,
       count(*) AS n_types,
       min(CASE WHEN n = mx THEN event_type END) AS top_type,
       sum(cents) / 100.0 AS total
FROM r GROUP BY user_id
"""


def q_agg_above_segment_avg(spark, sf_dir):
    """Correlated-subquery shape: orders whose total exceeds their
    customer segment's average (decorrelates to a join against the
    segment aggregate; Catalyst plans exactly that)."""
    orders = _t(spark, sf_dir, "orders")
    cust = _t(spark, sf_dir, "customer")
    seg_avg = (
        orders.join(F.broadcast(cust), F.col("o_custkey") == F.col("c_custkey"))
        .groupBy("c_mktsegment")
        .agg(
            (
                F.expr("cast(sum(cast(o_totalprice as decimal(18,2))) as double)")
                / F.count("*")
            ).alias("seg_avg")
        )
    )
    return (
        orders.join(F.broadcast(cust), F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(seg_avg), "c_mktsegment")
        .where(F.col("o_totalprice") > F.col("seg_avg"))
        .groupBy("c_mktsegment")
        .agg(F.count("*").alias("n_above"))
    )


O_ABOVE_SEG_AVG = """
WITH j AS (
  SELECT o_totalprice, c_mktsegment
  FROM orders JOIN customer ON o_custkey = c_custkey
), s AS (
  SELECT c_mktsegment,
         cast(sum(cast(o_totalprice as decimal(18,2))) as double) / count(*) AS seg_avg
  FROM j GROUP BY c_mktsegment
)
SELECT j.c_mktsegment, count(*) AS n_above
FROM j JOIN s ON j.c_mktsegment = s.c_mktsegment
WHERE j.o_totalprice > s.seg_avg
GROUP BY j.c_mktsegment
"""


def q_evt_rollup_cascade(spark, sf_dir):
    """Hypertable-style cascading rollup: minute-grain partial aggregates
    re-aggregated to hour grain.  The point at scale: the hourly (and
    daily, weekly…) materializations are computed from the next-finer
    rollup, never from raw events — decimal-exact sums compose, so the
    cascade is lossless (oracle aggregates straight from raw)."""
    ev = _t(spark, sf_dir, "events")
    minute = (
        ev.groupBy(
            F.date_trunc("minute", "ts").alias("m"), "event_type"
        ).agg(
            F.count("*").alias("n"),
            F.sum(F.col("value").cast("decimal(18,2)")).alias("sum_dec"),
        )
    )
    hour = (
        minute.groupBy(F.date_trunc("hour", "m").alias("window_start"), "event_type")
        .agg(
            F.sum("n").alias("n"),
            F.sum("sum_dec").cast("double").alias("sum_value"),
        )
    )
    return hour


O_EVT_ROLLUP = """
SELECT date_trunc('hour', ts) AS window_start, event_type,
       count(*) AS n,
       cast(sum(cast(value as decimal(18,2))) as double) AS sum_value
FROM events GROUP BY 1, 2
"""


_DISC_X = "cast(l_extendedprice as decimal(18,2)) * (cast(1 as decimal(18,2)) - cast(l_discount as decimal(18,2)))"


def q_agg_q10_returned_revenue(spark, sf_dir):
    """TPC-H Q10 shape: revenue lost to returned items per customer, top 20."""
    li = _t(spark, sf_dir, "lineitem")
    orders = _t(spark, sf_dir, "orders")
    cust = _t(spark, sf_dir, "customer")
    nation = _t(spark, sf_dir, "nation")
    return (
        li.where(F.col("l_returnflag") == "R")
        .join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(F.broadcast(cust), F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(nation), F.col("c_nationkey") == F.col("n_nationkey"))
        .groupBy("c_custkey", "c_name", "n_name")
        .agg(F.expr(f"cast(sum({_DISC_X}) as double)").alias("revenue"))
        .orderBy(F.col("revenue").desc(), F.col("c_custkey"))
        .limit(20)
    )


O_AGG_Q10 = f"""
SELECT c_custkey, c_name, n_name, cast(sum({_DISC_X}) as double) AS revenue
FROM lineitem
JOIN orders ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
JOIN nation ON c_nationkey = n_nationkey
WHERE l_returnflag = 'R'
GROUP BY c_custkey, c_name, n_name
ORDER BY revenue DESC, c_custkey LIMIT 20
"""


def q_agg_q12_priority_flags(spark, sf_dir):
    """TPC-H Q12 shape: urgent/non-urgent order counts per return flag —
    conditional aggregation (CASE inside SUM) over a fact⋈fact join."""
    li = _t(spark, sf_dir, "lineitem")
    orders = _t(spark, sf_dir, "orders")
    return (
        li.join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .groupBy("l_returnflag")
        .agg(
            F.sum(
                F.when(
                    F.col("o_orderpriority").isin("1-URGENT", "2-HIGH"), 1
                ).otherwise(0)
            ).alias("high_line_count"),
            F.sum(
                F.when(
                    ~F.col("o_orderpriority").isin("1-URGENT", "2-HIGH"), 1
                ).otherwise(0)
            ).alias("low_line_count"),
        )
    )


O_AGG_Q12 = """
SELECT l_returnflag,
       CAST(sum(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH') THEN 1 ELSE 0 END)
            AS BIGINT) AS high_line_count,
       CAST(sum(CASE WHEN o_orderpriority NOT IN ('1-URGENT', '2-HIGH') THEN 1 ELSE 0 END)
            AS BIGINT) AS low_line_count
FROM lineitem JOIN orders ON l_orderkey = o_orderkey
GROUP BY l_returnflag
"""


def q_stream_static_join(spark, sf_dir):
    """Stream-static enrichment: the event stream broadcast-joins the
    customer dimension per micro-batch, then aggregates per segment —
    the canonical streaming-ETL shape (dim lookup needs no state)."""
    from .streaming.stream import read_events_stream, run_to_memory

    ev = read_events_stream(spark, sf_dir)
    cust = _t(spark, sf_dir, "customer").select(
        F.col("c_custkey").alias("user_id"), "c_mktsegment"
    )
    enriched = ev.join(F.broadcast(cust), "user_id")
    agg = enriched.groupBy("c_mktsegment").agg(
        F.count("*").alias("n"),
        F.sum(F.expr("CAST(round(value * 100) AS BIGINT)")).alias("cents"),
    )
    out = run_to_memory(agg, "stream_static_join_tbl")
    return out.select(
        "c_mktsegment", "n", (F.col("cents") / 100.0).alias("sum_value")
    )


O_STREAM_STATIC = """
SELECT c_mktsegment, count(*) AS n,
       sum(CAST(round(value * 100) AS BIGINT)) / 100.0 AS sum_value
FROM events JOIN customer ON user_id = c_custkey
GROUP BY c_mktsegment
"""


def q_stream_stream_join(spark, sf_dir):
    """Watermarked stream-stream inner join: each error event matched to
    click events by the same user in the preceding 30 minutes.  State on
    both sides is watermark-bounded; with availableNow the full history
    is processed, so the result equals the batch interval join."""
    from .streaming.stream import read_events_stream, run_to_memory

    clicks = (
        read_events_stream(spark, sf_dir)
        .where(F.col("event_type") == "click")
        .select(
            F.col("user_id").alias("c_user"),
            F.col("ts").alias("c_ts"),
            F.col("event_id").alias("click_id"),
        )
        .withWatermark("c_ts", "1 hour")
    )
    errors = (
        read_events_stream(spark, sf_dir)
        .where(F.col("event_type") == "error")
        .select(
            F.col("user_id").alias("e_user"),
            F.col("ts").alias("e_ts"),
            F.col("event_id").alias("error_id"),
        )
        .withWatermark("e_ts", "1 hour")
    )
    joined = clicks.join(
        errors,
        F.expr(
            "c_user = e_user AND e_ts >= c_ts AND e_ts <= c_ts + INTERVAL 30 MINUTES"
        ),
    )
    out = run_to_memory(
        joined.select("click_id", "error_id"), "stream_stream_join_tbl",
        output_mode="append",
    )
    return out


O_STREAM_STREAM = """
SELECT c.event_id AS click_id, e.event_id AS error_id
FROM events c JOIN events e
  ON c.user_id = e.user_id AND c.event_type = 'click' AND e.event_type = 'error'
 AND e.ts >= c.ts AND e.ts <= c.ts + INTERVAL 30 MINUTE
"""


def q_agg_distinct_2phase(spark, sf_dir):
    """Skew-safe exact count-distinct: phase 1 dedupes (key, value) pairs
    (the shuffle spreads a hot key's values across partitions), phase 2
    counts per key.  Identical result to count(DISTINCT) with no single
    reducer holding a hot key's whole value set — the pattern that keeps
    working when one segment has 100× the traffic."""
    orders = _t(spark, sf_dir, "orders")
    cust = _t(spark, sf_dir, "customer")
    pairs = (
        orders.join(F.broadcast(cust), F.col("o_custkey") == F.col("c_custkey"))
        .select("c_mktsegment", "o_custkey")
        .distinct()
    )
    return pairs.groupBy("c_mktsegment").agg(F.count("*").alias("n_active_customers"))


O_DISTINCT_2PHASE = """
SELECT c_mktsegment, count(DISTINCT o_custkey) AS n_active_customers
FROM orders JOIN customer ON o_custkey = c_custkey
GROUP BY c_mktsegment
"""


def q_s15_latest_versions(spark, sf_dir):
    """Append-log compaction (SURVEY §1.4 'append + window-dedup by
    max(version)'): three stacked upsert generations of the same keys →
    exactly the newest version per key survives."""
    from pyspark.sql import Window as W

    base = (
        _t(spark, sf_dir, "customer")
        .where(F.col("c_custkey").between(1, 50))
        .select(
            F.concat(F.lit("customer:"), F.col("c_custkey")).alias("key"),
            F.col("c_custkey").alias("ck"),
        )
    )
    log = None
    for version in range(3):
        gen = base.select(
            "key",
            F.lit(version).alias("version"),
            (F.col("ck") * 1000 + version).alias("payload"),
        )
        log = gen if log is None else log.unionByName(gen)
    w = W.partitionBy("key").orderBy(F.col("version").desc())
    latest = (
        log.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") == 1)
        .select("key", "version", "payload")
    )
    return latest


O_LATEST_VERSIONS = """
SELECT 'customer:' || c_custkey AS key, CAST(2 AS INT) AS version,
       c_custkey * 1000 + 2 AS payload
FROM customer WHERE c_custkey BETWEEN 1 AND 50
"""


def q_graph_sssp_weighted(spark, sf_dir):
    """Single-source shortest paths with edge weights = length(dst_key)
    (engine-portable weight function), from customer:7, ≤4 relaxation
    rounds.  Bellman-Ford via join + groupBy-min per round."""
    from .operators.graph_algos import shortest_paths_weighted

    g = _fixture(spark, sf_dir)
    return shortest_paths_weighted(
        g.edges, "customer:7", F.length("dst_key").cast("double"), max_iter=4
    )


# Path enumeration on the DAG (≤4 hops), then min path weight per node.
O_GRAPH_SSSP = """
WITH RECURSIVE e AS (
  SELECT 'customer:' || c_custkey AS src_key, 'nation:' || c_nationkey AS dst_key FROM customer
  UNION ALL SELECT 'supplier:' || s_suppkey, 'nation:' || s_nationkey FROM supplier
  UNION ALL SELECT 'nation:' || n_nationkey, 'region:' || n_regionkey FROM nation
  UNION ALL SELECT DISTINCT 'customer:' || o_custkey, 'part:' || l_partkey
            FROM orders JOIN lineitem ON o_orderkey = l_orderkey
  UNION ALL SELECT DISTINCT 'part:' || l_partkey, 'supplier:' || l_suppkey FROM lineitem
),
walk(key, d, hops) AS (
  SELECT 'customer:7', CAST(0 AS DOUBLE), 0
  UNION ALL
  SELECT e.dst_key, w.d + len(e.dst_key), w.hops + 1
  FROM walk w JOIN e ON e.src_key = w.key
  WHERE w.hops < 4
)
SELECT key, min(d) AS dist FROM walk GROUP BY key
"""


def q_graph_pagerank(spark, sf_dir):
    """Integer-scaled PageRank (3 iterations) on the nation→region
    membership subgraph."""
    from .operators.graph_algos import pagerank_scaled

    g = _fixture(spark, sf_dir)
    membership = g.edges.where(F.get_json_object("details", "$.rel") == "in_region")
    return pagerank_scaled(membership, iters=3)


def _pagerank_oracle(iters: int = 3, scale: int = 10**12) -> str:
    """Unrolled fixed-point PageRank over the same membership subgraph."""
    prev = "pr0"
    cte = [
        "e AS (SELECT 'nation:' || n_nationkey AS src_key,"
        " 'region:' || n_regionkey AS dst_key FROM nation)",
        "nodes AS (SELECT src_key AS key FROM e UNION SELECT dst_key FROM e)",
        "nn AS (SELECT count(*) AS c FROM nodes)",
        "deg AS (SELECT src_key, count(*) AS d FROM e GROUP BY src_key)",
        f"pr0 AS (SELECT key, {scale} // c AS pr FROM nodes CROSS JOIN nn)",
    ]
    for i in range(1, iters + 1):
        cte.append(
            f"g{i} AS (SELECT e.dst_key AS key, sum({prev}.pr // deg.d) AS s"
            f" FROM e JOIN {prev} ON e.src_key = {prev}.key"
            f" JOIN deg ON deg.src_key = e.src_key GROUP BY e.dst_key)"
        )
        cte.append(
            f"pr{i} AS (SELECT nodes.key,"
            f" (15 * {scale}) // (100 * nn.c) + (85 * COALESCE(g{i}.s, 0)) // 100 AS pr"
            f" FROM nodes CROSS JOIN nn LEFT JOIN g{i} ON g{i}.key = nodes.key)"
        )
        prev = f"pr{i}"
    return (
        "WITH " + ",\n".join(cte)
        + f"\nSELECT key, CAST(pr AS BIGINT) AS pr FROM {prev}"
    )


O_GRAPH_PAGERANK = _pagerank_oracle()


def q_graph_lpa(spark, sf_dir):
    """3-round deterministic mode-label propagation (community detection)
    on the part↔supplier bipartite subgraph; the oracle unrolls the
    identical synchronized rounds."""
    from .operators.graph_algos import label_propagation

    g = _fixture(spark, sf_dir)
    # one JSON-parse pass, materialized: label_propagation scans its
    # input twice (the symmetrizing union) — uncut, each scan re-parses
    # `details` over the full cached edge table
    supplied = cut_lineage(
        g.edges.where(
            F.get_json_object("details", "$.rel") == "supplied_by"
        ).select("src_key", "dst_key")
    )
    # keymap = vertices (labels anchor the inner mapback; superset
    # harmless) — spares the pair-table (id, key) distinct
    return label_propagation(
        supplied, rounds=3, keymap=g.vertices.select("key")
    )


def _lpa_oracle(rounds: int = 3) -> str:
    """Unrolled synchronous LPA over the same subgraph: per round, every
    node adopts its neighbors' modal label (ties → lexicographically
    smallest label string — labels are keys end-to-end)."""
    cte = [
        "e0 AS (SELECT DISTINCT 'part:' || l_partkey AS src_key,"
        " 'supplier:' || l_suppkey AS dst_key FROM lineitem)",
        "e AS (SELECT src_key, dst_key FROM e0"
        " UNION SELECT dst_key, src_key FROM e0)",
        "l0 AS (SELECT DISTINCT src_key AS key, src_key AS lbl FROM e)",
    ]
    prev = "l0"
    for i in range(1, rounds + 1):
        cte.append(
            f"c{i} AS (SELECT e.dst_key AS key, l.lbl, count(*) AS c"
            f" FROM e JOIN {prev} l ON e.src_key = l.key GROUP BY e.dst_key, l.lbl)"
        )
        cte.append(
            f"b{i} AS (SELECT key, lbl AS new_lbl FROM ("
            f"SELECT key, lbl, row_number() OVER"
            f" (PARTITION BY key ORDER BY c DESC, lbl) AS rn FROM c{i}) WHERE rn = 1)"
        )
        cte.append(
            f"l{i} AS (SELECT p.key, COALESCE(b{i}.new_lbl, p.lbl) AS lbl"
            f" FROM {prev} p LEFT JOIN b{i} ON b{i}.key = p.key)"
        )
        prev = f"l{i}"
    return (
        "WITH "
        + ",\n".join(cte)
        + f"\nSELECT key, lbl AS community FROM {prev}"
    )


O_GRAPH_LPA = _lpa_oracle()


def q_graph_modularity(spark, sf_dir):
    """Newman modularity of the nation↔region membership components —
    the quality score that makes community output judgeable — in exact
    integer micro-units (graph_algos.modularity_micro).  This fixture
    is the one whose community structure is real AND non-degenerate:
    LPA on the bipartite supply graphs oscillates 2-colorings (zero
    within-community edges, Q = −½) and their components collapse to
    one giant (Q = 0); the membership graph has 5 clean star
    communities (Q = 0.8 exactly, every arithmetic path exercised)."""
    from .operators.graph_algos import connected_components, modularity_micro

    g = _fixture(spark, sf_dir)
    # one JSON-parse pass, materialized: connected_components and the
    # symmetrized edge set below otherwise each re-parse `details`
    # over the full cached edge table
    membership = cut_lineage(
        g.edges.where(
            F.get_json_object("details", "$.rel") == "in_region"
        ).select("src_key", "dst_key")
    )
    comm = connected_components(membership, undirected=True).select(
        "key", F.col("component").alias("community")
    )
    e = membership.select("src_key", "dst_key")
    sym = e.unionByName(
        e.select(
            F.col("dst_key").alias("src_key"), F.col("src_key").alias("dst_key")
        )
    ).distinct()
    return modularity_micro(sym, comm)


O_GRAPH_MODULARITY = """
WITH comp AS (
  SELECT n_regionkey, min('nation:' || n_nationkey) AS community
  FROM nation GROUP BY n_regionkey
),
comm AS (
  SELECT 'nation:' || n_nationkey AS key, c.community
  FROM nation n JOIN comp c ON n.n_regionkey = c.n_regionkey
  UNION ALL
  SELECT 'region:' || r_regionkey, c.community
  FROM region r JOIN comp c ON r.r_regionkey = c.n_regionkey
),
e0 AS (
  SELECT DISTINCT 'nation:' || n_nationkey AS src_key,
         'region:' || n_regionkey AS dst_key
  FROM nation
),
e AS (SELECT src_key, dst_key FROM e0 UNION SELECT dst_key, src_key FROM e0),
deg AS (SELECT src_key AS key, count(*) AS d FROM e GROUP BY 1),
dstat AS (SELECT community, CAST(sum(d) AS BIGINT) AS D
          FROM deg JOIN comm USING (key) GROUP BY 1),
within AS (
  SELECT ca.community, count(*) AS S
  FROM e JOIN comm ca ON ca.key = e.src_key
         JOIN comm cb ON cb.key = e.dst_key AND cb.community = ca.community
  GROUP BY 1),
per_c AS (SELECT dstat.community, COALESCE(within.S, 0) AS S, dstat.D
          FROM dstat LEFT JOIN within ON within.community = dstat.community),
tot AS (SELECT count(*) AS n_communities, CAST(sum(S) AS BIGINT) AS SS,
               CAST(sum(D * D) AS BIGINT) AS DD FROM per_c),
mm AS (SELECT count(*) // 2 AS m FROM e)
SELECT m, n_communities, SS AS sym_within,
       (1000000 * (2 * m * SS - DD)) // (4 * m * m) AS q_micro
FROM tot, mm
"""


def q_graph_neighbor_jaccard(spark, sf_dir):
    """Node-similarity pairs: Jaccard of neighbor sets ≥ 0.75 (structural
    equivalence / link prediction) over the SIGNIFICANT-supply subgraph
    (bulk line items, quantity ≥ 48 — the tiny dimension tables make the
    full bipartite graph degenerate-dense); hub neighbors (degree > 100)
    excluded from the pair generator and the counts identically on both
    engines."""
    from .operators.graph_algos import neighbor_jaccard_pairs

    li = _t(spark, sf_dir, "lineitem").where(F.col("l_quantity") >= 48)
    bulk = li.select(
        F.concat(F.lit("part:"), F.col("l_partkey")).alias("src_key"),
        F.concat(F.lit("supplier:"), F.col("l_suppkey")).alias("dst_key"),
    ).distinct()
    return neighbor_jaccard_pairs(bulk, threshold=0.75, max_degree=100)


O_GRAPH_NBR_JACCARD = """
WITH e0 AS (
  SELECT DISTINCT 'part:' || l_partkey AS src_key,
         'supplier:' || l_suppkey AS dst_key
  FROM lineitem WHERE l_quantity >= 48
),
e AS (SELECT src_key, dst_key FROM e0 UNION SELECT dst_key, src_key FROM e0),
adj AS (SELECT DISTINCT src_key AS node, dst_key AS nbr FROM e),
small AS (SELECT nbr FROM adj GROUP BY nbr HAVING count(*) <= 100),
adj2 AS (SELECT node, nbr FROM adj SEMI JOIN small USING (nbr)),
deg AS (SELECT node, count(*) AS deg FROM adj2 GROUP BY node),
common AS (
  SELECT a.node AS na, b.node AS nb, count(*) AS common
  FROM adj2 a JOIN adj2 b ON a.nbr = b.nbr AND a.node < b.node
  GROUP BY a.node, b.node
)
SELECT na AS node_a, nb AS node_b,
       round(CAST(common AS DOUBLE) / (da.deg + db.deg - common), 6) AS jaccard
FROM common
JOIN deg da ON da.node = na
JOIN deg db ON db.node = nb
WHERE CAST(common AS DOUBLE) / (da.deg + db.deg - common) >= 0.75
"""


# --------------------------------------------------------------------------
# Skew utilities — salted results must equal the plain-operator oracle
# --------------------------------------------------------------------------


def q_skew_salted_topn(spark, sf_dir):
    """Top-5 events per event_type (hot keys: ~20% of the table each) via
    two-phase salted ranking — the window never sees a whole hot key."""
    from .operators.skew import salted_topn

    ev = _t(spark, sf_dir, "events")
    return salted_topn(
        ev.select("event_id", "event_type", "value"),
        ["event_type"],
        [F.col("value").desc(), F.col("event_id")],
        n=5,
        n_salt=8,
    )


O_SKEW_TOPN = """
SELECT event_id, event_type, value, rn FROM (
  SELECT event_id, event_type, value,
         CAST(row_number() OVER (
           PARTITION BY event_type ORDER BY value DESC, event_id
         ) AS INT) AS rn
  FROM events
) WHERE rn <= 5
"""


def q_skew_salted_join(spark, sf_dir):
    """Events (hot event_type keys) joined to a per-type dim with the
    small side replicated 8x and the fact side salted; aggregate in
    floor-cents so the sum is order-independent and engine-exact."""
    from .operators.skew import salted_join

    ev = _t(spark, sf_dir, "events")
    dim = (
        ev.select("event_type")
        .distinct()
        .withColumn("type_class", F.substring("event_type", 1, 1))
    )
    joined = salted_join(
        ev.select("event_type", "value"), dim, ["event_type"], n_salt=8
    )
    return (
        joined.groupBy("type_class")
        .agg(
            F.count("*").alias("n"),
            F.sum(F.floor(F.col("value") * 100).cast("long")).alias("cents"),
        )
        .orderBy("type_class")
    )


O_SKEW_JOIN = """
WITH dim AS (
  SELECT DISTINCT event_type, substr(event_type, 1, 1) AS type_class FROM events
)
SELECT d.type_class, count(*) AS n,
       CAST(sum(CAST(floor(e.value * 100) AS BIGINT)) AS BIGINT) AS cents
FROM events e JOIN dim d USING (event_type)
GROUP BY d.type_class ORDER BY d.type_class
"""




def q_graph_triangles(spark, sf_dir):
    """Exact triangle census (degree-oriented wedge join — Suri &
    Vassilvitskii WWW'11) over the fixture graph augmented with
    customer/supplier→region shortcut edges (the base graph is a layered
    DAG with zero triangles; the shortcuts close exactly one triangle per
    customer and per supplier through its nation and region)."""
    from .operators.graph_algos import triangle_stats

    g = _fixture(spark, sf_dir)
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
    return triangle_stats(e.unionByName(shortcuts))


O_GRAPH_TRIANGLES = """
WITH e AS (
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
), und AS (
  SELECT DISTINCT least(s, d) AS a, greatest(s, d) AS b FROM e WHERE s <> d
), deg AS (
  SELECT key, count(*) AS deg
  FROM (SELECT a AS key FROM und UNION ALL SELECT b FROM und) GROUP BY key
), dagg AS (
  SELECT count(*) AS n_vertices, CAST(sum(deg * (deg - 1)) AS BIGINT) AS w2 FROM deg
), ecnt AS (
  SELECT count(*) AS n_edges FROM und
), tri AS (
  SELECT count(*) AS n_triangles
  FROM und e1 JOIN und e2 ON e1.b = e2.a
       JOIN und e3 ON e3.a = e1.a AND e3.b = e2.b
)
SELECT n_vertices, n_edges, w2 // 2 AS n_wedges, n_triangles,
       CAST(CASE WHEN w2 > 0 THEN (n_triangles * 6000000) // w2 ELSE 0 END AS BIGINT)
         AS clustering_millionths
FROM dagg, ecnt, tri
"""




def q_win_frames(spark, sf_dir):
    """Window-frame breadth in one pass: sliding ROWS frame (centered 3-row
    decimal avg), RANGE frame (peers-inclusive running count by date),
    ntile(4) and exact percent_rank — the analytic-window family the
    reference lacks entirely (SURVEY §2.5)."""
    from pyspark.sql import Window as W

    orders = _t(spark, sf_dir, "orders")
    wo = W.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    rows3 = wo.rowsBetween(-1, 1)
    # RANGE frame needs a numeric/date order key alone; count peers ≤ date
    wrange = (
        W.partitionBy("o_custkey")
        .orderBy("o_orderdate")
        .rangeBetween(W.unboundedPreceding, W.currentRow)
    )
    price_dec = F.col("o_totalprice").cast("decimal(18,2)")
    return orders.select(
        "o_custkey",
        "o_orderkey",
        (F.sum(price_dec).over(rows3) / F.count("*").over(rows3))
        .cast("decimal(22,6)")
        .cast("double")
        .alias("avg3"),
        F.count("*").over(wrange).alias("n_upto_date"),
        F.ntile(4).over(wo).alias("quartile"),
        # percent_rank as exact integer millionths: (rank-1)*1e6 div (n-1)
        F.expr(
            "cast(CASE WHEN count(*) OVER (PARTITION BY o_custkey) = 1 THEN 0 "
            "ELSE ((rank() OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey) - 1) * 1000000) "
            "div (count(*) OVER (PARTITION BY o_custkey) - 1) END as bigint)"
        ).alias("pr_millionths"),
    )


O_WIN_FRAMES = """
SELECT o_custkey, o_orderkey,
       CAST(CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) OVER rows3
                 / count(*) OVER rows3 AS DECIMAL(22,6)) AS DOUBLE) AS avg3,
       count(*) OVER (PARTITION BY o_custkey ORDER BY o_orderdate
                      RANGE BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
         AS n_upto_date,
       CAST(ntile(4) OVER wo AS INTEGER) AS quartile,
       CAST(CASE WHEN count(*) OVER (PARTITION BY o_custkey) = 1 THEN 0
            ELSE ((rank() OVER wo - 1) * 1000000)
                 // (count(*) OVER (PARTITION BY o_custkey) - 1) END AS BIGINT)
         AS pr_millionths
FROM orders
WINDOW wo AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey),
       rows3 AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
                 ROWS BETWEEN 1 PRECEDING AND 1 FOLLOWING)
"""


def q_agg_q4_order_priority(spark, sf_dir):
    """TPC-H Q4 shape: orders with ≥1 slow lineitem (shipped ≥75 days after
    order date), counted by priority — the EXISTS semi-join aggregate with a
    non-equi component."""
    orders = _t(spark, sf_dir, "orders")
    li = _t(spark, sf_dir, "lineitem").select("l_orderkey", "l_shipdate")
    slow = (
        orders.o_orderkey == li.l_orderkey
    ) & (li.l_shipdate >= F.date_add(orders.o_orderdate, 75))
    return (
        orders.join(li, slow, "left_semi")
        .groupBy("o_orderpriority")
        .agg(F.count("*").alias("order_count"))
    )


O_AGG_Q4 = """
SELECT o_orderpriority, count(*) AS order_count
FROM orders
WHERE EXISTS (
  SELECT 1 FROM lineitem
  WHERE l_orderkey = o_orderkey
    AND l_shipdate >= o_orderdate + INTERVAL 75 DAY
)
GROUP BY o_orderpriority
"""


def q_agg_q14_promo_share(spark, sf_dir):
    """TPC-H Q14 shape: promo revenue share — conditional aggregation over a
    join, in exact DECIMAL then millionths."""
    li = _t(spark, sf_dir, "lineitem")
    part = _t(spark, sf_dir, "part")
    # fully integer revenue unit (cent × percent): both factors go through
    # the identical double→round path on both engines, so sums are exact and
    # no final decimal rounding (with its engine-specific tie rule) occurs
    rev = F.expr(
        "cast(round(l_extendedprice * 100) as decimal(18,0))"
        " * cast(round((1 - l_discount) * 100) as decimal(18,0))"
    )
    j = li.join(F.broadcast(part), F.col("l_partkey") == F.col("p_partkey"))
    return j.agg(
        F.sum(F.when(F.col("p_type").startswith("PROMO"), rev).otherwise(F.lit(0)))
        .cast("decimal(38,0)")
        .alias("promo_dec"),
        F.sum(rev).cast("decimal(38,0)").alias("total_dec"),
    ).select(
        F.col("promo_dec").cast("bigint").alias("promo_cents100"),
        F.col("total_dec").cast("bigint").alias("total_cents100"),
        F.expr("cast((promo_dec * 1000000) div total_dec as bigint)").alias(
            "promo_millionths"
        ),
    )


O_AGG_Q14 = """
WITH j AS (
  SELECT CAST(round(l_extendedprice * 100) AS DECIMAL(18,0))
           * CAST(round((1 - l_discount) * 100) AS DECIMAL(18,0)) AS rev,
         p_type
  FROM lineitem JOIN part ON l_partkey = p_partkey
)
SELECT CAST(sum(CASE WHEN p_type LIKE 'PROMO%' THEN rev ELSE 0 END) AS BIGINT)
         AS promo_cents100,
       CAST(sum(rev) AS BIGINT) AS total_cents100,
       CAST((CAST(sum(CASE WHEN p_type LIKE 'PROMO%' THEN rev ELSE 0 END) AS HUGEINT)
             * 1000000) // CAST(sum(rev) AS HUGEINT) AS BIGINT) AS promo_millionths
FROM j
"""




def q_stream_logtable_cdc(spark, sf_dir):
    """Streaming → persistent storage integration: the events stream CDCs
    into the log-structured table (one upsert segment per micro-batch via
    foreachBatch), then the merged snapshot is digested.  Idempotent under
    replay: event_id is the table key, so duplicate deliveries collapse in
    the merge-on-read window exactly like Delta MERGE."""
    import shutil

    from .sources import logtable as lt
    from .streaming.stream import read_events_stream, stream_into_logtable

    path = f"{_IO_ROOT}/logtable-cdc-{os.path.basename(sf_dir.rstrip('/'))}"
    shutil.rmtree(path, ignore_errors=True)
    base = _t(spark, sf_dir, "events").limit(0).select(
        "event_id", "event_type", "value"
    )
    lt.create(base, path, key_cols=["event_id"])
    q = stream_into_logtable(
        read_events_stream(spark, sf_dir).select("event_id", "event_type", "value"),
        path,
    )
    q.awaitTermination()
    merged = lt.read_latest(spark, path)
    return merged.groupBy("event_type").agg(
        F.count("*").alias("n"),
        (F.sum(F.expr("cast(round(value * 100) as bigint)")) / 100.0).alias("total"),
    )


O_STREAM_LOGTABLE = """
SELECT event_type, count(*) AS n,
       sum(CAST(round(value * 100) AS BIGINT)) / 100.0 AS total
FROM events GROUP BY event_type
"""




def q_evt_transitions(spark, sf_dir):
    """Per-user event-sequence transition matrix (Markov-chain prep): one
    lead() window over (user_id, event-time) → pair counts + distinct-user
    support per transition.  One Exchange on user_id for the window; the
    tiny (type, next_type) aggregation reuses map-side combine.  At scale
    the events table is already bucketed by user_id, making the window
    shuffle-free."""
    from pyspark.sql import Window as W

    ev = _t(spark, sf_dir, "events")
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    nxt = F.lead("event_type").over(w)
    return (
        ev.select("user_id", "ts", "event_id", "event_type")
        .withColumn("next_type", nxt)
        .where(F.col("next_type").isNotNull())
        .groupBy("event_type", "next_type")
        .agg(
            F.count("*").alias("n"),
            F.count_distinct("user_id").alias("n_users"),
        )
        .orderBy("event_type", "next_type")
    )


O_EVT_TRANSITIONS = """
WITH seq AS (
  SELECT user_id, event_type,
         lead(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id)
           AS next_type
  FROM events
)
SELECT event_type, next_type, CAST(count(*) AS BIGINT) AS n,
       CAST(count(DISTINCT user_id) AS BIGINT) AS n_users
FROM seq WHERE next_type IS NOT NULL
GROUP BY 1, 2 ORDER BY 1, 2
"""


def q_evt_retention(spark, sf_dir):
    """Cohort retention matrix: users grouped by first-activity week,
    distinct-user counts at each later week offset — the standard
    product-analytics triangle.  All derivation is integer/date arithmetic
    (datediff div 7), so the matrix is engine-exact.  Scale: one
    per-user min (map-side combined), one distinct-count per cell."""
    ev = _t(spark, sf_dir, "events")
    # cohort keys stay TIMESTAMP on both engines: Spark DateType surfaces
    # as datetime.date objects in pandas while DuckDB DATE surfaces as
    # datetime64 — a driver-hash mismatch even for identical days
    first = ev.groupBy("user_id").agg(
        F.date_trunc("week", F.min("ts")).alias("cohort_week")
    )
    act = ev.select(
        "user_id", F.date_trunc("week", F.col("ts")).alias("week")
    ).distinct()
    return (
        act.join(first, "user_id")
        .groupBy(
            "cohort_week",
            F.expr("datediff(week, cohort_week) div 7").alias("week_offset"),
        )
        .agg(F.count_distinct("user_id").alias("n_users"))
        .orderBy("cohort_week", "week_offset")
    )


O_EVT_RETENTION = """
WITH first AS (
  SELECT user_id, date_trunc('week', min(ts)) AS cohort_week
  FROM events GROUP BY user_id
),
act AS (
  SELECT DISTINCT user_id, date_trunc('week', ts) AS week FROM events
)
SELECT cohort_week,
       CAST(datediff('day', cohort_week, week) // 7 AS BIGINT) AS week_offset,
       count(DISTINCT user_id) AS n_users
FROM act JOIN first USING (user_id)
GROUP BY 1, 2 ORDER BY 1, 2
"""


def q_evt_spikes(spark, sf_dir):
    """Hourly spike detection per event type: hours whose count more than
    doubles the mean of the trailing 24 OBSERVED hours (ROWS window on
    both engines, so gap hours shift rather than shrink the baseline),
    with a full trailing window required.
    The comparison is cross-multiplied (24·count > 2·trailing_sum) so no
    engine divides — integer-exact anomaly flags.  Scale: one hourly
    aggregate, one bounded window per event type."""
    from pyspark.sql import Window

    ev = _t(spark, sf_dir, "events")
    hourly = ev.groupBy(
        "event_type", F.date_trunc("hour", F.col("ts")).alias("hour")
    ).agg(F.count("*").alias("n"))
    w = Window.partitionBy("event_type").orderBy("hour").rowsBetween(-24, -1)
    flagged = hourly.select(
        "event_type",
        "hour",
        "n",
        F.sum("n").over(w).alias("trail_sum"),
        F.count("n").over(w).alias("trail_n"),
    )
    return (
        flagged.where(
            (F.col("trail_n") == 24) & (F.col("n") * 24 > F.col("trail_sum") * 2)
        )
        .select("event_type", "hour", "n", "trail_sum")
        .orderBy("event_type", "hour")
    )


O_EVT_SPIKES = """
WITH hourly AS (
  SELECT event_type, date_trunc('hour', ts) AS hour, count(*) AS n
  FROM events GROUP BY 1, 2
),
flagged AS (
  SELECT event_type, hour, n,
         CAST(sum(n) OVER w AS BIGINT) AS trail_sum, count(n) OVER w AS trail_n
  FROM hourly
  WINDOW w AS (PARTITION BY event_type ORDER BY hour
               ROWS BETWEEN 24 PRECEDING AND 1 PRECEDING)
)
SELECT event_type, hour, n, trail_sum
FROM flagged WHERE trail_n = 24 AND n * 24 > trail_sum * 2
ORDER BY event_type, hour
"""


def q_evt_active_users_7d(spark, sf_dir):
    """Trailing-7-day distinct active users per day (rolling WAU).

    Spark windows cannot COUNT(DISTINCT) over a frame; the distributed
    rewrite is the contribution explode: each distinct (user, day) pair
    contributes to the 7 report days [day, day+6], then one
    count(DISTINCT) per observed report day.  O(7·|pairs|) rows through
    the shuffle — linear in activity, no per-day rescans, no range join;
    the observed-day filter is a broadcast semi-join (|days| is tiny)."""
    ev = _t(spark, sf_dir, "events")
    pairs = ev.select(
        "user_id", F.date_trunc("day", F.col("ts")).alias("day")
    ).distinct()
    days = pairs.select(F.col("day").alias("report_day")).distinct()
    cand = pairs.select(
        "user_id",
        F.explode(
            F.expr("sequence(day, day + interval 6 days, interval 1 day)")
        ).alias("report_day"),
    )
    return (
        cand.join(F.broadcast(days), "report_day", "left_semi")
        .groupBy("report_day")
        .agg(F.countDistinct("user_id").alias("active_users"))
        .orderBy("report_day")
    )


O_EVT_ACTIVE_USERS = """
WITH pairs AS (
  SELECT DISTINCT user_id, date_trunc('day', ts) AS day FROM events
),
days AS (SELECT DISTINCT day AS report_day FROM pairs),
cand AS (
  SELECT user_id, day + to_days(CAST(t.d AS INT)) AS report_day
  FROM pairs, unnest(range(0, 7)) AS t(d)
)
SELECT report_day, count(DISTINCT user_id) AS active_users
FROM cand SEMI JOIN days USING (report_day)
GROUP BY report_day ORDER BY report_day
"""


def q_evt_stickiness(spark, sf_dir):
    """DAU/MAU stickiness per day — the engagement ratio product
    analytics tracks.  Same distributed rewrite as the rolling WAU (no
    COUNT(DISTINCT) window frame exists): each distinct (user, day) pair
    contributes to the 28 report days [day, day+27] for MAU and to its
    own day for DAU; one count(DISTINCT) aggregate each, inner-joined on
    the observed days.  O(28·|pairs|) shuffle rows, linear in activity;
    stickiness in exact integer permille (MAU ≥ DAU ≥ 1 on observed
    days, so the division is total)."""
    ev = _t(spark, sf_dir, "events")
    pairs = ev.select(
        "user_id", F.date_trunc("day", F.col("ts")).alias("day")
    ).distinct()
    days = pairs.select(F.col("day").alias("report_day")).distinct()
    dau = (
        pairs.groupBy(F.col("day").alias("report_day"))
        .agg(F.countDistinct("user_id").alias("dau"))
    )
    mau = (
        pairs.select(
            "user_id",
            F.explode(
                F.expr("sequence(day, day + interval 27 days, interval 1 day)")
            ).alias("report_day"),
        )
        .join(F.broadcast(days), "report_day", "left_semi")
        .groupBy("report_day")
        .agg(F.countDistinct("user_id").alias("mau"))
    )
    return (
        dau.join(mau, "report_day")
        .select(
            "report_day", "dau", "mau",
            F.expr("(1000 * dau) div mau").alias("stickiness_permille"),
        )
        .orderBy("report_day")
    )


O_EVT_STICKINESS = """
WITH pairs AS (
  SELECT DISTINCT user_id, date_trunc('day', ts) AS day FROM events
),
days AS (SELECT DISTINCT day AS report_day FROM pairs),
dau AS (
  SELECT day AS report_day, count(DISTINCT user_id) AS dau
  FROM pairs GROUP BY 1
),
cand AS (
  SELECT user_id, day + to_days(CAST(t.d AS INT)) AS report_day
  FROM pairs, unnest(range(0, 28)) AS t(d)
),
mau AS (
  SELECT report_day, count(DISTINCT user_id) AS mau
  FROM cand SEMI JOIN days USING (report_day)
  GROUP BY report_day
)
SELECT report_day, dau, mau, (1000 * dau) // mau AS stickiness_permille
FROM dau JOIN mau USING (report_day) ORDER BY report_day
"""


def q_evt_wau_hll(spark, sf_dir):
    """Sliding 7-day actives per day via merged HLL registers — the
    sketch twin of `evt_active_users_7d`: per-day registers max-merge
    across the window, so shuffle volume is days×256 rows regardless of
    user count (the exact explode carries 7·|user-day pairs|)."""
    from .operators import sketches

    ev = _t(spark, sf_dir, "events")
    return sketches.hll_sliding_distinct(ev, "user_id", "ts", p=8, window_days=7)


def _wau_hll_oracle():
    from .operators.sketches import hll_sliding_oracle_sql

    return hll_sliding_oracle_sql("events", "user_id", "ts", p=8, window_days=7)


O_EVT_WAU_HLL = _wau_hll_oracle()


def q_evt_ohlc(spark, sf_dir):
    """Hourly OHLC candles per event type — the hypertable continuous-
    aggregate rollup over the events stream (TimescaleDB time_bucket /
    InfluxDB windowed first-last analogue).  Values quantized to integer
    cents before aggregation; open/close picked by the (ts, event_id)
    total order via min_by/max_by struct keys — one map-side-combinable
    hash aggregate, no window, no per-bucket sort."""
    from .operators.timeseries import ohlc_rollup

    ev = _t(spark, sf_dir, "events")
    return ohlc_rollup(
        ev, "event_type", "ts", "value", "event_id", bucket="hour"
    ).orderBy("event_type", "bucket_ts")


O_EVT_OHLC = """
WITH b AS (
  SELECT event_type, date_trunc('hour', ts) AS bucket_ts,
         CAST(round(value * 100) AS BIGINT) AS cents, ts, event_id
  FROM events
), w AS (
  SELECT event_type, bucket_ts, cents,
         first_value(cents) OVER win AS o,
         last_value(cents)  OVER win AS c
  FROM b
  WINDOW win AS (PARTITION BY event_type, bucket_ts ORDER BY ts, event_id
                 ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
)
SELECT event_type, bucket_ts,
       min(o) AS open_cents,
       max(cents) AS high_cents,
       min(cents) AS low_cents,
       min(c) AS close_cents,
       count(*) AS n_events,
       CAST(sum(cents) AS BIGINT) AS vol_cents
FROM w GROUP BY event_type, bucket_ts
ORDER BY event_type, bucket_ts
"""


def q_evt_gapfill_locf(spark, sf_dir):
    """Daily per-user spend on a DENSE calendar with last-observation-
    carried-forward (time_bucket_gapfill + locf): each user's grid spans
    their own [first, last] observed day via a sequence explode (no
    driver calendar), gap days carry the latest daily total and are
    flagged.  Per-user series are genuinely sparse at every SF (~12% gap
    days on this corpus) so the carry-forward path is exercised; the
    LOCF window partitions by user — per-key parallel at any scale.
    The user_id % 7 probe subset keeps the gate fast; the operator is
    linear in users either way."""
    from .operators.timeseries import gapfill_locf

    ev = _t(spark, sf_dir, "events").where(F.col("user_id") % 7 == 0)
    return gapfill_locf(ev, "user_id", "ts", "value").orderBy(
        "user_id", "day"
    )


O_EVT_GAPFILL = """
WITH daily AS (
  SELECT user_id, date_trunc('day', ts) AS day,
         CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS cents
  FROM events WHERE user_id % 7 = 0 GROUP BY 1, 2
),
span AS (
  SELECT user_id, min(day) AS d0, max(day) AS d1 FROM daily GROUP BY 1
),
grid AS (
  SELECT user_id, CAST(t.d AS TIMESTAMP) AS day
  FROM span, unnest(generate_series(d0, d1, INTERVAL 1 DAY)) AS t(d)
),
j AS (
  SELECT g.user_id, g.day, daily.cents
  FROM grid g LEFT JOIN daily
    ON daily.user_id = g.user_id AND daily.day = g.day
)
SELECT user_id, day, cents,
       last_value(cents IGNORE NULLS) OVER (
         PARTITION BY user_id ORDER BY day
         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS filled_cents,
       CAST(CASE WHEN cents IS NULL THEN 1 ELSE 0 END AS BIGINT) AS is_gap
FROM j ORDER BY user_id, day
"""


def q_evt_ab_test(spark, sf_dir):
    """Two-proportion A/B z-test on heavy-purchaser conversion
    (>= 12 purchase events — every user buys at least once on this
    corpus, so plain any-purchase is degenerate at p = 1), arms by
    user_id parity: per-user conversion flags (exact integers), pooled
    standard error, z rounded to 6 places (round half-up agrees across
    engines; the double chain is written with IDENTICAL operation order
    on both sides, each IEEE step correctly rounded).  Degenerate arms
    (empty, or pooled p ∈ {0,1} ⇒ se = 0) yield NULL z via nullif on
    both engines.  One events scan, two tiny aggregates."""
    ev = _t(spark, sf_dir, "events")
    per_user = ev.groupBy("user_id").agg(
        F.when(
            F.count(F.when(F.col("event_type") == "purchase", 1)) >= 12, 1
        )
        .otherwise(0)
        .alias("conv")
    )
    arms = per_user.groupBy((F.col("user_id") % 2).alias("arm")).agg(
        F.count("*").alias("n"), F.sum("conv").cast("long").alias("c")
    )
    wide = arms.agg(
        F.sum(F.when(F.col("arm") == 0, F.col("n"))).cast("long").alias("n_a"),
        F.sum(F.when(F.col("arm") == 0, F.col("c"))).cast("long").alias("conv_a"),
        F.sum(F.when(F.col("arm") == 1, F.col("n"))).cast("long").alias("n_b"),
        F.sum(F.when(F.col("arm") == 1, F.col("c"))).cast("long").alias("conv_b"),
    )
    return wide.select(
        "n_a",
        "conv_a",
        "n_b",
        "conv_b",
        F.expr("conv_a * 1000 div n_a").alias("cr_a_permille"),
        F.expr("conv_b * 1000 div n_b").alias("cr_b_permille"),
        F.expr(
            "round((conv_a / cast(n_a as double) - conv_b / cast(n_b as double))"
            " / nullif(sqrt(((conv_a + conv_b) / cast(n_a + n_b as double))"
            " * (1.0 - (conv_a + conv_b) / cast(n_a + n_b as double))"
            " * (1.0 / n_a + 1.0 / n_b)), 0.0), 6)"
        ).alias("z6"),
    )


O_EVT_AB_TEST = """
WITH per_user AS (
  SELECT user_id,
         CASE WHEN count(CASE WHEN event_type = 'purchase' THEN 1 END) >= 12
              THEN 1 ELSE 0 END AS conv
  FROM events GROUP BY user_id
),
arms AS (
  SELECT user_id % 2 AS arm, count(*) AS n, CAST(sum(conv) AS BIGINT) AS c
  FROM per_user GROUP BY 1
),
wide AS (
  SELECT CAST(sum(CASE WHEN arm = 0 THEN n END) AS BIGINT) AS n_a,
         CAST(sum(CASE WHEN arm = 0 THEN c END) AS BIGINT) AS conv_a,
         CAST(sum(CASE WHEN arm = 1 THEN n END) AS BIGINT) AS n_b,
         CAST(sum(CASE WHEN arm = 1 THEN c END) AS BIGINT) AS conv_b
  FROM arms
)
SELECT n_a, conv_a, n_b, conv_b,
       conv_a * 1000 // n_a AS cr_a_permille,
       conv_b * 1000 // n_b AS cr_b_permille,
       round((conv_a / CAST(n_a AS DOUBLE) - conv_b / CAST(n_b AS DOUBLE))
             / nullif(sqrt(((conv_a + conv_b) / CAST(n_a + n_b AS DOUBLE))
             * (1.0 - (conv_a + conv_b) / CAST(n_a + n_b AS DOUBLE))
             * (1.0 / n_a + 1.0 / n_b)), 0.0), 6) AS z6
FROM wide
"""


def q_evt_ewma(spark, sf_dir):
    """EWMA (α = 1/8) of the daily count series per event type — the
    smoothing recurrence no window frame expresses, via the bounded-
    series fold pattern (collect-sort-fold per key, integer div
    arithmetic); the oracle replays the identical recurrence with a
    recursive CTE."""
    from .operators.timeseries import ewma_daily

    ev = _t(spark, sf_dir, "events")
    return ewma_daily(ev, "event_type", "ts", alpha_den=8).orderBy(
        "event_type", "day"
    )


O_EVT_EWMA = """
WITH RECURSIVE daily AS (
  SELECT event_type, date_trunc('day', ts) AS day, count(*) AS n
  FROM events GROUP BY 1, 2
),
idx AS (
  SELECT event_type, day, CAST(n AS BIGINT) AS n,
         row_number() OVER (PARTITION BY event_type ORDER BY day) AS i
  FROM daily
),
r AS (
  SELECT event_type, day, n, i, n * 1000 AS s FROM idx WHERE i = 1
  UNION ALL
  SELECT idx.event_type, idx.day, idx.n, idx.i,
         r.s + (idx.n * 1000 - r.s) // 8
  FROM r JOIN idx ON idx.event_type = r.event_type AND idx.i = r.i + 1
)
SELECT event_type, day, n, CAST(s AS BIGINT) AS ewma_milli
FROM r ORDER BY event_type, day
"""


def q_evt_holt(spark, sf_dir):
    """Holt double-exponential smoothing (α = 1/8, β = 1/4) of the daily
    count series per event type, with the 1-day-ahead forecast — the
    trend-aware extension of evt_ewma, same bounded-series fold, same
    integer div recurrence; the oracle replays level AND trend with a
    recursive CTE."""
    from .operators.timeseries import holt_daily

    ev = _t(spark, sf_dir, "events")
    return holt_daily(
        ev, "event_type", "ts", alpha_den=8, beta_den=4, forecast_days=1
    ).orderBy("event_type", "day")


O_EVT_HOLT = """
WITH RECURSIVE daily AS (
  SELECT event_type, date_trunc('day', ts) AS day, count(*) AS n
  FROM events GROUP BY 1, 2
),
idx AS (
  SELECT event_type, day, CAST(n AS BIGINT) AS n,
         row_number() OVER (PARTITION BY event_type ORDER BY day) AS i
  FROM daily
),
r AS (
  SELECT event_type, day, n, i, n * 1000 AS l, CAST(0 AS BIGINT) AS b
  FROM idx WHERE i = 1
  UNION ALL
  SELECT idx.event_type, idx.day, idx.n, idx.i,
         (r.l + r.b) + (idx.n * 1000 - (r.l + r.b)) // 8,
         r.b + ((((r.l + r.b) + (idx.n * 1000 - (r.l + r.b)) // 8) - r.l)
                - r.b) // 4
  FROM r JOIN idx ON idx.event_type = r.event_type AND idx.i = r.i + 1
)
SELECT event_type, day, n, CAST(l AS BIGINT) AS level_milli,
       CAST(b AS BIGINT) AS trend_milli,
       CAST(l + 1 * b AS BIGINT) AS forecast_milli
FROM r ORDER BY event_type, day
"""


def q_evt_holt_winters(spark, sf_dir):
    """Additive Holt-Winters (α=1/8, β=1/4, γ=1/4, weekly season) of the
    per-type daily count series over the DENSIFIED calendar — the
    seasonal member of the smoothing ladder; the oracle replays level,
    trend AND the seven season slots (a rolling list in the recursive
    CTE) with identical integer div arithmetic."""
    from .operators.timeseries import holt_winters_daily

    ev = _t(spark, sf_dir, "events")
    return holt_winters_daily(
        ev, "event_type", "ts", alpha_den=8, beta_den=4, gamma_den=4
    ).orderBy("event_type", "day")


O_EVT_HOLT_WINTERS = """
WITH RECURSIVE daily AS (
  SELECT event_type, date_trunc('day', ts) AS day, CAST(count(*) AS BIGINT) AS n
  FROM events GROUP BY 1, 2
),
span AS (
  SELECT event_type, min(day) AS d0, max(day) AS d1 FROM daily GROUP BY 1
),
grid AS (
  SELECT event_type, unnest(generate_series(d0, d1, INTERVAL 1 DAY)) AS day
  FROM span
),
dense AS (
  SELECT g.event_type, g.day, COALESCE(d.n, 0) AS n
  FROM grid g LEFT JOIN daily d
    ON g.event_type = d.event_type AND g.day = d.day
),
idx AS (
  SELECT event_type, day, n,
         row_number() OVER (PARTITION BY event_type ORDER BY day) AS i
  FROM dense
),
r AS (
  SELECT event_type, day, n, i,
         n * 1000 AS l, CAST(0 AS BIGINT) AS b, CAST(0 AS BIGINT) AS s,
         n * 1000 AS f,
         CAST([0, 0, 0, 0, 0, 0, 0] AS BIGINT[]) AS sl
  FROM idx WHERE i = 1
  UNION ALL
  SELECT idx.event_type, idx.day, idx.n, idx.i,
         (r.l + r.b) + (idx.n * 1000 - r.sl[1] - (r.l + r.b)) // 8
           AS l2,
         r.b + ((((r.l + r.b) + (idx.n * 1000 - r.sl[1] - (r.l + r.b)) // 8)
                 - r.l) - r.b) // 4,
         r.sl[1] + (idx.n * 1000
                    - ((r.l + r.b)
                       + (idx.n * 1000 - r.sl[1] - (r.l + r.b)) // 8)
                    - r.sl[1]) // 4,
         ((r.l + r.b) + (idx.n * 1000 - r.sl[1] - (r.l + r.b)) // 8)
           + (r.b + ((((r.l + r.b)
                       + (idx.n * 1000 - r.sl[1] - (r.l + r.b)) // 8)
                      - r.l) - r.b) // 4)
           + r.sl[2],
         r.sl[2:7] || [r.sl[1] + (idx.n * 1000
                    - ((r.l + r.b)
                       + (idx.n * 1000 - r.sl[1] - (r.l + r.b)) // 8)
                    - r.sl[1]) // 4]
  FROM r JOIN idx ON idx.event_type = r.event_type AND idx.i = r.i + 1
)
SELECT event_type, day, n, CAST(l AS BIGINT) AS level_milli,
       CAST(b AS BIGINT) AS trend_milli, CAST(s AS BIGINT) AS season_milli,
       CAST(f AS BIGINT) AS forecast_milli
FROM r ORDER BY event_type, day
"""


def q_evt_forecast_mae(spark, sf_dir):
    """Rolling-origin backtest of the Holt 1-day-ahead forecast: each
    day's forecast meets the NEXT day's actual (per-type lag window over
    the daily grid), scored as MAE and bias in exact integer milli —
    the accuracy ledger that decides whether the smoother is usable for
    capacity planning.  Composes holt_daily; one extra window + one
    aggregate over the (types × days)-sized frame."""
    from pyspark.sql import Window

    from .operators.timeseries import holt_daily

    ev = _t(spark, sf_dir, "events")
    h = holt_daily(ev, "event_type", "ts", alpha_den=8, beta_den=4,
                   forecast_days=1)
    w = Window.partitionBy("event_type").orderBy("day")
    scored = h.select(
        "event_type", "day", "n",
        F.lag("forecast_milli").over(w).alias("f_prev"),
    ).where(F.col("f_prev").isNotNull())
    return (
        scored.groupBy("event_type")
        .agg(
            F.count("*").cast("long").alias("n_days"),
            F.sum(F.abs(F.col("n") * 1000 - F.col("f_prev")))
            .cast("long").alias("abs_err_milli"),
            F.sum(F.col("n") * 1000 - F.col("f_prev"))
            .cast("long").alias("bias_milli"),
        )
        .select(
            "event_type", "n_days",
            F.expr("abs_err_milli div n_days").alias("mae_milli"),
            F.expr("bias_milli div n_days").alias("mean_bias_milli"),
        )
        .orderBy("event_type")
    )


def _forecast_mae_oracle() -> str:
    holt_core = O_EVT_HOLT[O_EVT_HOLT.index("WITH RECURSIVE"):
                           O_EVT_HOLT.rindex("SELECT event_type")]
    return f"""{holt_core},
scored AS (
  SELECT event_type, n,
         lag(l + 1 * b) OVER (PARTITION BY event_type ORDER BY day) AS f_prev
  FROM r
)
SELECT event_type, CAST(count(*) AS BIGINT) AS n_days,
       CAST(sum(abs(n * 1000 - f_prev)) AS BIGINT) // count(*) AS mae_milli,
       CAST(sum(n * 1000 - f_prev) AS BIGINT) // count(*)
         AS mean_bias_milli
FROM scored WHERE f_prev IS NOT NULL
GROUP BY event_type ORDER BY event_type
"""


O_EVT_FORECAST_MAE = _forecast_mae_oracle()


def q_evt_survival_km(spark, sf_dir):
    """Kaplan-Meier user-lifetime survival with 7-day censoring — churn
    analytics that does NOT count still-active users as deaths; integer
    micro product-limit recurrence, recursive-CTE oracle."""
    from .operators.behavior import kaplan_meier

    ev = _t(spark, sf_dir, "events")
    return kaplan_meier(ev, "user_id", "ts", churn_gap_days=7)


O_EVT_SURVIVAL_KM = """
WITH RECURSIVE pu AS (
  SELECT user_id, date_trunc('day', min(ts)) AS d0,
         date_trunc('day', max(ts)) AS d1
  FROM events GROUP BY user_id
),
mx AS (SELECT max(date_trunc('day', ts)) AS dmax FROM events),
u AS (
  SELECT CAST(date_diff('day', d0, d1) AS BIGINT) AS t,
         CASE WHEN date_diff('day', d1, dmax) > 7 THEN 1 ELSE 0 END
           AS churned
  FROM pu, mx
),
per_t AS (
  SELECT t, CAST(count(*) AS BIGINT) AS n_here,
         CAST(sum(churned) AS BIGINT) AS d
  FROM u GROUP BY t
),
risk AS (
  SELECT t, d,
         (SELECT sum(n_here) FROM per_t)
         - COALESCE(sum(n_here) OVER (ORDER BY t
             ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS n
  FROM per_t
),
idx AS (
  SELECT t, d, CAST(n AS BIGINT) AS n,
         row_number() OVER (ORDER BY t) AS i
  FROM risk WHERE d > 0
),
r AS (
  SELECT t, d, n, i, (1000000 * (n - d)) // n AS s FROM idx WHERE i = 1
  UNION ALL
  SELECT idx.t, idx.d, idx.n, idx.i, (r.s * (idx.n - idx.d)) // idx.n
  FROM r JOIN idx ON idx.i = r.i + 1
)
SELECT t AS t_days, n AS n_at_risk, d AS n_events,
       CAST(s AS BIGINT) AS surv_micro
FROM r ORDER BY t_days
"""


def q_evt_markov_stationary(spark, sf_dir):
    """Stationary distribution of the event-type Markov chain (4 integer
    power-iteration rounds at parts-per-10¹²) — where user behavior
    settles; the oracle unrolls the identical rounds."""
    from .operators.behavior import markov_stationary

    ev = _t(spark, sf_dir, "events")
    return markov_stationary(
        ev, "user_id", "ts", "event_id", "event_type", iters=4
    )


def _markov_oracle(iters: int = 4) -> str:
    rounds = []
    for i in range(1, iters + 1):
        prev = f"p{i - 1}"
        rounds.append(
            f"""p{i} AS MATERIALIZED (
  SELECT s2 AS state, CAST(sum((pi * c) // r) AS BIGINT) AS pi
  FROM tr JOIN {prev} ON tr.s = {prev}.state GROUP BY s2
)"""
        )
    body = ",\n".join(rounds)
    return f"""
WITH seq AS (
  SELECT event_type AS s,
         lead(event_type) OVER (
           PARTITION BY user_id ORDER BY ts, event_id) AS s2
  FROM events
),
trans AS MATERIALIZED (
  SELECT s, s2, CAST(count(*) AS BIGINT) AS c
  FROM seq WHERE s2 IS NOT NULL GROUP BY s, s2
),
tr AS MATERIALIZED (
  SELECT trans.s, trans.s2, trans.c, rr.r
  FROM trans JOIN (
    SELECT s, CAST(sum(c) AS BIGINT) AS r FROM trans GROUP BY s) rr
  ON trans.s = rr.s
),
states AS MATERIALIZED (
  SELECT DISTINCT state FROM (
    SELECT s AS state FROM trans UNION ALL SELECT s2 FROM trans)
),
p0 AS (
  SELECT state,
         CAST(1000000000000 // (SELECT count(*) FROM states) AS BIGINT)
           AS pi
  FROM states
),
{body}
SELECT states.state, CAST(COALESCE(p{iters}.pi, 0) AS BIGINT) AS pi_e12
FROM states LEFT JOIN p{iters} USING (state) ORDER BY state
"""


O_EVT_MARKOV = _markov_oracle(4)


def q_evt_rate_wilson(spark, sf_dir):
    """Per-type high-value-event rate with a Wilson 95% interval — the
    CI that stays inside [0,1] and behaves at small n where the normal
    approximation fails.  Exact integer (n, k) through one fixed double
    expression ending in the correctly-rounded sqrt, floor-quantized to
    micro — identical text both engines."""
    ev = _t(spark, sf_dir, "events")
    agg = ev.groupBy("event_type").agg(
        F.count("*").cast("long").alias("n"),
        F.sum((F.col("value") >= 450.0).cast("long")).alias("k"),
    )
    z2 = "3.8416"  # 1.96^2, literal parsed identically everywhere
    p = "(cast(k as double) / cast(n as double))"
    center = f"({p} + {z2} / (2.0 * cast(n as double)))"
    half = (
        f"(1.96 * sqrt({p} * (1.0 - {p}) / cast(n as double)"
        f" + {z2} / (4.0 * cast(n as double) * cast(n as double))))"
    )
    denom = f"(1.0 + {z2} / cast(n as double))"
    return agg.select(
        "event_type", "n", "k",
        F.expr(f"cast(floor({p} * 1000000) as bigint)").alias("rate_micro"),
        F.expr(
            f"cast(floor(({center} - {half}) / {denom} * 1000000) as bigint)"
        ).alias("lo_micro"),
        F.expr(
            f"cast(floor(({center} + {half}) / {denom} * 1000000) as bigint)"
        ).alias("hi_micro"),
    ).orderBy("event_type")


def _wilson_oracle() -> str:
    z2 = "3.8416"
    p = "(CAST(k AS DOUBLE) / CAST(n AS DOUBLE))"
    center = f"({p} + {z2} / (2.0 * CAST(n AS DOUBLE)))"
    half = (
        f"(1.96 * sqrt({p} * (1.0 - {p}) / CAST(n AS DOUBLE)"
        f" + {z2} / (4.0 * CAST(n AS DOUBLE) * CAST(n AS DOUBLE))))"
    )
    denom = f"(1.0 + {z2} / CAST(n AS DOUBLE))"
    return f"""
WITH agg AS (
  SELECT event_type, CAST(count(*) AS BIGINT) AS n,
         CAST(sum(CASE WHEN value >= 450.0 THEN 1 ELSE 0 END) AS BIGINT)
           AS k
  FROM events GROUP BY event_type
)
SELECT event_type, n, k,
       CAST(floor({p} * 1000000) AS BIGINT) AS rate_micro,
       CAST(floor(({center} - {half}) / {denom} * 1000000) AS BIGINT)
         AS lo_micro,
       CAST(floor(({center} + {half}) / {denom} * 1000000) AS BIGINT)
         AS hi_micro
FROM agg ORDER BY event_type
"""


O_EVT_RATE_WILSON = _wilson_oracle()


def q_evt_hill_alpha(spark, sf_dir):
    """Hill power-law tail exponent of per-(user, day) activity counts
    (xmin = 4) — the skew-profiling scalar that decides salting strategy.
    Integer micro-nat tail contributions, one composed IEEE division at
    the end (identical textual order both engines)."""
    from .operators.profiling import hill_alpha

    ev = _t(spark, sf_dir, "events")
    c = ev.groupBy(
        "user_id", F.date_trunc("day", F.col("ts")).alias("d")
    ).agg(F.count("*").alias("n"))
    return hill_alpha(c, "n", xmin=4)


O_EVT_HILL = """
WITH c AS (
  SELECT user_id, date_trunc('day', ts) AS d, count(*) AS n
  FROM events GROUP BY 1, 2
),
agg AS (
  SELECT CAST(count(*) AS BIGINT) AS n_rows,
         CAST(sum(CASE WHEN n >= 4 THEN 1 ELSE 0 END) AS BIGINT) AS n_tail,
         CAST(sum(CASE WHEN n >= 4 THEN
                CAST(floor(ln(n / CAST(4 AS DOUBLE)) * 1000000) AS BIGINT)
              ELSE 0 END) AS BIGINT) AS s_micro
  FROM c
)
SELECT n_rows, n_tail,
       n_tail * 1000 // nullif(n_rows, 0) AS tail_permille, s_micro,
       CAST(floor((CAST(n_tail AS DOUBLE) * 1000000.0)
            / (nullif(s_micro, 0) / 1000000.0)) AS BIGINT) + 1000000
         AS alpha_micro
FROM agg
"""


def q_stream_ohlc(spark, sf_dir):
    """REAL streaming OHLC: readStream → watermark → tumbling hourly
    candles (min_by/max_by struct-key aggregates under watermark) →
    availableNow → memory sink.  The oracle recomputes the candles in
    batch SQL — epoch-aligned tumbling windows make stream ≡ batch."""
    from .streaming.stream import read_events_stream, run_to_memory, windowed_ohlc

    ev = read_events_stream(spark, sf_dir)
    return run_to_memory(windowed_ohlc(ev, "1 hour"), "stream_ohlc_tbl").orderBy(
        "event_type", "window_start"
    )


O_STREAM_OHLC = """
WITH b AS (
  SELECT event_type, time_bucket(INTERVAL 1 HOUR, ts) AS window_start,
         CAST(round(value * 100) AS BIGINT) AS cents, ts, event_id
  FROM events
), w AS (
  SELECT event_type, window_start, cents,
         first_value(cents) OVER win AS o,
         last_value(cents)  OVER win AS c
  FROM b
  WINDOW win AS (PARTITION BY event_type, window_start ORDER BY ts, event_id
                 ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
)
SELECT window_start, event_type,
       min(o) AS open_cents,
       max(cents) AS high_cents,
       min(cents) AS low_cents,
       min(c) AS close_cents,
       count(*) AS n_events,
       CAST(sum(cents) AS BIGINT) AS vol_cents
FROM w GROUP BY event_type, window_start
ORDER BY event_type, window_start
"""


def _walk_hash_sql(t: int) -> str:
    return (
        "CAST(('0x' || substr(md5(walk_id || ':" + str(t) + ":' || cur), 1, 15)) "
        "AS BIGINT)"
    )


def q_graph_walks(spark, sf_dir):
    """Deterministic uniform random walks (4 steps) from every node of the
    significant-supply bipartite graph — reproducible node2vec/DeepWalk
    sampling; next hop = sorted-neighbor[h60(start:step:node) mod deg]."""
    from .operators.graph_algos import deterministic_walks

    li = _t(spark, sf_dir, "lineitem").where(F.col("l_quantity") >= 48)
    bulk = li.select(
        F.concat(F.lit("part:"), F.col("l_partkey")).alias("src_key"),
        F.concat(F.lit("supplier:"), F.col("l_suppkey")).alias("dst_key"),
    ).distinct()
    return deterministic_walks(bulk, steps=4).orderBy("walk_id", "step")


def _graph_walks_oracle() -> str:
    steps = []
    for t in range(1, 5):
        prev = f"s{t - 1}"
        steps.append(
            f"s{t} AS (SELECT walk_id, ai.nbr AS cur, CAST({t} AS BIGINT) AS step\n"
            f"  FROM {prev} JOIN ai ON ai.node = {prev}.cur\n"
            f"   AND ai.idx = {_walk_hash_sql(t)} % ai.deg)"
        )
    joined = ",\n".join(steps)
    return f"""
WITH e0 AS (
  SELECT DISTINCT 'part:' || l_partkey AS src_key,
         'supplier:' || l_suppkey AS dst_key
  FROM lineitem WHERE l_quantity >= 48
),
e AS (SELECT src_key, dst_key FROM e0 UNION SELECT dst_key, src_key FROM e0),
adj AS (SELECT DISTINCT src_key AS node, dst_key AS nbr FROM e),
ai AS (
  SELECT node, nbr,
         row_number() OVER (PARTITION BY node ORDER BY nbr) - 1 AS idx,
         count(*) OVER (PARTITION BY node) AS deg
  FROM adj
),
s0 AS (SELECT DISTINCT node AS walk_id, node AS cur, CAST(0 AS BIGINT) AS step
       FROM adj),
{joined}
SELECT walk_id, step, cur AS node
FROM (SELECT * FROM s0 UNION ALL SELECT * FROM s1 UNION ALL SELECT * FROM s2
      UNION ALL SELECT * FROM s3 UNION ALL SELECT * FROM s4)
ORDER BY walk_id, step
"""


O_GRAPH_WALKS = _graph_walks_oracle()


def q_win_time_range(spark, sf_dir):
    """Event-time RANGE window frame: trailing-24-hour spend per user —
    the time-interval frame (RANGE BETWEEN INTERVAL ... PRECEDING)
    distinct from every ROWS frame elsewhere in the suite.  RANGE
    includes ts-peers identically on both engines, so tied timestamps
    (common in real streams, generated by the events fuzzer) are
    deterministic by construction, no tiebreak column needed."""
    ev = _t(spark, sf_dir, "events").where(F.col("user_id") % 11 == 0)
    return (
        ev.select(
            "user_id",
            "ts",
            "event_id",
            F.expr("cast(round(value * 100) as bigint)").alias("cents"),
        )
        .select(
            "*",
            F.expr(
                "sum(cents) OVER (PARTITION BY user_id ORDER BY ts"
                " RANGE BETWEEN INTERVAL 24 HOURS PRECEDING AND CURRENT ROW)"
            ).alias("trail_cents"),
        )
        .orderBy("user_id", "ts", "event_id")
    )


O_WIN_TIME_RANGE = """
SELECT user_id, ts, event_id,
       CAST(round(value * 100) AS BIGINT) AS cents,
       CAST(sum(CAST(round(value * 100) AS BIGINT)) OVER (
         PARTITION BY user_id ORDER BY ts
         RANGE BETWEEN INTERVAL 24 HOURS PRECEDING AND CURRENT ROW)
       AS BIGINT) AS trail_cents
FROM events WHERE user_id % 11 = 0
ORDER BY user_id, ts, event_id
"""


def q_io_partition_prune(spark, sf_dir):
    """Hive-partitioned parquet layout + partition-pruned read: events
    written partitionBy(event_type), read back with a type filter —
    the filter must prune DIRECTORIES (PartitionFilters in the scan,
    asserted by the plan test), not rows.  The oracle digests the
    original table under the same predicate, so the whole
    write→layout→prune→read path is value-checked."""
    from .sources import io

    path = f"{_IO_ROOT}/partprune-{os.path.basename(sf_dir.rstrip('/'))}"
    ev = _t(spark, sf_dir, "events")
    io.write_parquet(
        ev.select(
            "event_id",
            "event_type",
            F.expr("cast(round(value * 100) as bigint)").alias("cents"),
        ),
        path,
        partition_by=["event_type"],
    )
    back = io.read_parquet(spark, path).where(F.col("event_type") == "purchase")
    return back.groupBy("event_type").agg(
        F.count("*").alias("n"),
        F.sum("cents").alias("sum_cents"),
        F.min("event_id").alias("min_id"),
        F.max("event_id").alias("max_id"),
    )


O_IO_PARTITION_PRUNE = """
SELECT event_type, count(*) AS n,
       CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS sum_cents,
       min(event_id) AS min_id, max(event_id) AS max_id
FROM events WHERE event_type = 'purchase'
GROUP BY event_type
"""


def q_agg_listagg(spark, sf_dir):
    """Ordered string aggregation (LISTAGG / string_agg): nation roster
    per region, comma-joined in lexicographic order — deterministic
    because the order is total; Spark spells it
    array_join(sort_array(collect_list(...)))."""
    n = _t(spark, sf_dir, "nation")
    r = _t(spark, sf_dir, "region")
    return (
        n.join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .groupBy("r_name")
        .agg(
            F.array_join(
                F.sort_array(F.collect_list("n_name")), ","
            ).alias("nations"),
            F.count("*").alias("n_nations"),
        )
        .orderBy("r_name")
    )


O_AGG_LISTAGG = """
SELECT r_name, string_agg(n_name, ',' ORDER BY n_name) AS nations,
       count(*) AS n_nations
FROM nation JOIN region ON n_regionkey = r_regionkey
GROUP BY r_name ORDER BY r_name
"""


def q_evt_changepoint(spark, sf_dir):
    """CUSUM changepoint per event type over the daily count series: the
    day where the cumulative deviation from the series mean peaks (Page
    '54) — the standard level-shift detector complementing the local
    spike scan (`evt_spikes` flags hours; CUSUM locates the structural
    break).

    All integer: mean_milli = (total·1000) div days, cusum_milli_d =
    run_d·1000 − idx_d·mean_milli (running count sum vs expected), the
    changepoint is argmax |cusum| with ties to the earliest day (both
    engines pick via row_number ordered by (|cusum| DESC, day ASC) —
    a per-type window over the tiny daily series, partition-parallel)."""
    from pyspark.sql import Window

    ev = _t(spark, sf_dir, "events")
    daily = ev.groupBy(
        "event_type", F.date_trunc("day", F.col("ts")).alias("day")
    ).agg(F.count("*").alias("n"))
    wrun = (
        Window.partitionBy("event_type")
        .orderBy("day")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    wall = Window.partitionBy("event_type")
    c = daily.select(
        "event_type",
        "day",
        (F.sum("n").over(wrun) * 1000).alias("run_milli"),
        F.row_number().over(Window.partitionBy("event_type").orderBy("day")).alias(
            "idx"
        ),
        F.expr("(sum(n) over (partition by event_type) * 1000)").alias("tot_milli"),
        F.count("*").over(wall).alias("days"),
    ).select(
        "event_type",
        "day",
        "days",
        F.expr("tot_milli div days").alias("mean_milli"),
        (
            F.col("run_milli") - F.col("idx") * F.expr("tot_milli div days")
        ).alias("cusum_milli"),
    )
    wpick = Window.partitionBy("event_type").orderBy(
        F.abs(F.col("cusum_milli")).desc(), F.col("day").asc()
    )
    return (
        c.select("*", F.row_number().over(wpick).alias("rn"))
        .where(F.col("rn") == 1)
        .select(
            "event_type",
            F.col("day").alias("cp_day"),
            "cusum_milli",
            "mean_milli",
            "days",
        )
        .orderBy("event_type")
    )


O_EVT_CHANGEPOINT = """
WITH daily AS (
  SELECT event_type, date_trunc('day', ts) AS day, count(*) AS n
  FROM events GROUP BY 1, 2
),
c AS (
  SELECT event_type, day,
         CAST(sum(n) OVER (PARTITION BY event_type ORDER BY day
              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) * 1000
              AS BIGINT) AS run_milli,
         row_number() OVER (PARTITION BY event_type ORDER BY day) AS idx,
         CAST(sum(n) OVER (PARTITION BY event_type) * 1000 AS BIGINT)
           AS tot_milli,
         count(*) OVER (PARTITION BY event_type) AS days
  FROM daily
),
d AS (
  SELECT event_type, day, days,
         tot_milli // days AS mean_milli,
         run_milli - idx * (tot_milli // days) AS cusum_milli
  FROM c
),
p AS (
  SELECT *, row_number() OVER (PARTITION BY event_type
              ORDER BY abs(cusum_milli) DESC, day ASC) AS rn
  FROM d
)
SELECT event_type, day AS cp_day, CAST(cusum_milli AS BIGINT) AS cusum_milli,
       CAST(mean_milli AS BIGINT) AS mean_milli, days
FROM p WHERE rn = 1 ORDER BY event_type
"""


def q_evt_funnel_steps(spark, sf_dir):
    """Ordered 3-step funnel (view → click → purchase, 7-day horizon from
    first view): per-step user counts and integer-permille conversion.
    Strictly ordered semantics — each step's first qualifying event must
    fall AFTER the previous step's first event and within the horizon.
    Every stage join is keyed on user_id (co-partitioned with the prior
    aggregate's shuffle); event-type predicates push into the scan."""
    from .operators.behavior import funnel_steps

    ev = _t(spark, sf_dir, "events")
    return funnel_steps(
        ev, "user_id", "ts", "event_type",
        steps=["view", "click", "purchase"], horizon_days=7,
    )


O_EVT_FUNNEL_STEPS = """
WITH d0 AS (
  SELECT user_id AS u, min(ts) AS t, min(ts) AS t0,
         min(ts) + INTERVAL 7 DAY AS deadline
  FROM events WHERE event_type = 'view' GROUP BY 1
),
s1 AS (
  SELECT e.user_id AS u, d0.t0, d0.deadline, min(e.ts) AS t
  FROM events e JOIN d0 ON e.user_id = d0.u
  WHERE e.event_type = 'click' AND e.ts > d0.t AND e.ts <= d0.deadline
  GROUP BY 1, 2, 3
),
s2 AS (
  SELECT e.user_id AS u, s1.t0, min(e.ts) AS t
  FROM events e JOIN s1 ON e.user_id = s1.u
  WHERE e.event_type = 'purchase' AND e.ts > s1.t AND e.ts <= s1.deadline
  GROUP BY 1, 2
),
n AS (
  SELECT 0 AS step_idx, 'view' AS step, count(*) AS n_users,
         CAST(0 AS BIGINT) AS lag_sum FROM d0
  UNION ALL SELECT 1, 'click', count(*),
         CAST(coalesce(sum(date_diff('second', t0, t)), 0) AS BIGINT) FROM s1
  UNION ALL SELECT 2, 'purchase', count(*),
         CAST(coalesce(sum(date_diff('second', t0, t)), 0) AS BIGINT) FROM s2
)
SELECT CAST(step_idx AS INT) AS step_idx, step,
       CAST(n_users AS BIGINT) AS n_users,
       coalesce(n_users * 1000 // nullif((SELECT count(*) FROM d0), 0), 0)
         AS conv_permille,
       coalesce(lag_sum // nullif(n_users, 0), 0) AS avg_secs_from_first
FROM n ORDER BY step_idx
"""


def q_evt_cohort_ltv(spark, sf_dir):
    """Cohort LTV triangle — the revenue twin of evt_retention: purchase
    cents accumulated per (first-activity-week cohort, week offset), with
    running cumulative and per-user LTV in exact integer cents.  Cohort
    keys stay TIMESTAMP (the r3 dtype lesson); the cumulative window
    partitions by cohort over at most |weeks| rows."""
    from .operators.behavior import cohort_ltv

    ev = _t(spark, sf_dir, "events")
    return cohort_ltv(ev, "user_id", "ts", "event_type", "value", "purchase")


O_EVT_COHORT_LTV = """
WITH first AS (
  SELECT user_id AS u, date_trunc('week', min(ts)) AS cohort_week
  FROM events GROUP BY 1
),
rev AS (
  SELECT user_id AS u, date_trunc('week', ts) AS week,
         CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS cents
  FROM events WHERE event_type = 'purchase' GROUP BY 1, 2
),
csize AS (SELECT cohort_week, count(*) AS cohort_users FROM first GROUP BY 1),
tri AS (
  SELECT cohort_week,
         CAST(datediff('day', cohort_week, week) // 7 AS BIGINT) AS week_offset,
         CAST(sum(cents) AS BIGINT) AS rev_cents
  FROM rev JOIN first USING (u) GROUP BY 1, 2
),
cum AS (
  SELECT cohort_week, week_offset, rev_cents,
         CAST(sum(rev_cents) OVER (PARTITION BY cohort_week ORDER BY week_offset
              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
           AS cum_rev_cents
  FROM tri
)
SELECT cohort_week, week_offset, cohort_users, rev_cents, cum_rev_cents,
       cum_rev_cents // cohort_users AS cum_per_user_cents
FROM cum JOIN csize USING (cohort_week)
ORDER BY cohort_week, week_offset
"""


def q_graph_adamic_adar(spark, sf_dir):
    """Adamic–Adar link prediction over the same significant-supply
    bipartite graph as the neighbor-Jaccard gate: common neighbors
    weighted by 1/ln(degree), integer nano-unit contributions summed
    exactly; hub witnesses (degree > 100) excluded identically on both
    engines."""
    from .operators.graph_algos import adamic_adar_pairs

    li = _t(spark, sf_dir, "lineitem").where(F.col("l_quantity") >= 48)
    bulk = li.select(
        F.concat(F.lit("part:"), F.col("l_partkey")).alias("src_key"),
        F.concat(F.lit("supplier:"), F.col("l_suppkey")).alias("dst_key"),
    ).distinct()
    return adamic_adar_pairs(bulk, min_common=2, max_degree=100).orderBy(
        "node_a", "node_b"
    )


O_GRAPH_ADAMIC_ADAR = """
WITH e0 AS (
  SELECT DISTINCT 'part:' || l_partkey AS src_key,
         'supplier:' || l_suppkey AS dst_key
  FROM lineitem WHERE l_quantity >= 48
),
e AS (SELECT src_key, dst_key FROM e0 UNION SELECT dst_key, src_key FROM e0),
adj AS (SELECT DISTINCT src_key AS node, dst_key AS nbr FROM e),
deg AS (SELECT node, count(*) AS d FROM adj GROUP BY node),
contrib AS (
  SELECT a.node, a.nbr,
         CAST(floor(1000000000.0 / ln(d.d)) AS BIGINT) AS contrib
  FROM adj a JOIN deg d ON d.node = a.nbr
  WHERE d.d BETWEEN 2 AND 100
)
SELECT a.node AS node_a, b.node AS node_b,
       count(*) AS common,
       CAST(sum(a.contrib) AS BIGINT) AS aa_nano
FROM contrib a JOIN contrib b ON a.nbr = b.nbr AND a.node < b.node
GROUP BY a.node, b.node
HAVING count(*) >= 2
ORDER BY node_a, node_b
"""


def q_stream_wau_hll(spark, sf_dir):
    """REAL streaming sliding-sketch execution: readStream → watermark →
    7-day/1-day sliding window → per-(window, bucket) max-rho registers
    (the ONE aggregation streaming allows; state = windows×256 rows,
    bounded) → availableNow → memory sink; the finishing estimate runs as
    a batch aggregate over the sink — the production split (registers in
    the stream job, estimates in the serving query)."""
    from .operators import sketches
    from .streaming.stream import read_events_stream, run_to_memory, sliding_hll_registers

    ev = read_events_stream(spark, sf_dir)
    regs = run_to_memory(sliding_hll_registers(ev), "stream_wau_hll_tbl")
    return sketches.hll_estimate_registers(regs, ["window_end"], p=8).orderBy(
        "window_end"
    )


def _stream_wau_oracle():
    from .operators.sketches import hll_stream_oracle_sql

    return hll_stream_oracle_sql("events", "user_id", "ts", p=8, window_days=7)


O_STREAM_WAU_HLL = _stream_wau_oracle()


def q_stream_cm_heavy(spark, sf_dir):
    """REAL streaming windowed count-min: readStream → watermark → each
    event explodes to its depth×1 cells → per-(1-day window, row, bucket)
    counts (state = windows×3×64 cells, bounded however many keys) →
    availableNow → memory sink; the heavy-hitter probe over the observed
    key set runs as a batch aggregate over the sink — count-min's
    mergeability is what makes the split exact."""
    from .operators import sketches
    from .streaming.stream import (
        read_events_stream,
        run_to_memory,
        windowed_cm_registers,
    )

    ev = read_events_stream(spark, sf_dir)
    grid = run_to_memory(windowed_cm_registers(ev), "stream_cm_heavy_tbl")
    cand = _t(spark, sf_dir, "events").select("event_type").distinct()
    return sketches.cm_estimate_registers(grid, cand).orderBy(
        "window_end", "key"
    )


def _stream_cm_oracle() -> str:
    from .operators.sketches import CM_DEPTH
    from .queries_pipeline import _cm_hash_sql

    g = "\n  UNION ALL ".join(
        f"SELECT window_end, {d} AS row, {_cm_hash_sql('k', d)} AS bucket FROM src"
        for d in range(CM_DEPTH)
    )
    pr = "\n  UNION ALL ".join(
        f"SELECT key, {d} AS row, {_cm_hash_sql('CAST(key AS VARCHAR)', d)} AS bucket"
        " FROM cand"
        for d in range(CM_DEPTH)
    )
    return f"""
WITH src AS (
  SELECT date_trunc('day', ts) + to_days(1) AS window_end,
         CAST(event_type AS VARCHAR) AS k
  FROM events
),
g AS (
  {g}
),
grid AS (SELECT window_end, row, bucket, count(*) AS cnt FROM g
         GROUP BY window_end, row, bucket),
cand AS (SELECT DISTINCT event_type AS key FROM events),
wins AS (SELECT DISTINCT window_end FROM grid),
probe AS (
  {pr}
),
cells AS (SELECT w.window_end, p.key, p.row, p.bucket FROM wins w CROSS JOIN probe p)
SELECT cells.window_end, key, CAST(min(COALESCE(grid.cnt, 0)) AS BIGINT) AS est
FROM cells LEFT JOIN grid
  ON grid.window_end = cells.window_end
 AND grid.row = cells.row AND grid.bucket = cells.bucket
GROUP BY cells.window_end, key
ORDER BY cells.window_end, key
"""


O_STREAM_CM_HEAVY = _stream_cm_oracle()


def q_evt_funnel(spark, sf_dir):
    """Event funnel (ClickHouse windowFunnel shape): users who did
    view → click → purchase in strict event-time order, completing within
    2 h of the first view.  Three stacked window-min expressions over ONE
    user_id partitioning (single Exchange; the per-user groupBy then reuses
    the same hash partitioning), then a tiny depth histogram."""
    from pyspark.sql import Window as W

    ev = _t(spark, sf_dir, "events")
    w = W.partitionBy("user_id")
    s1 = ev.withColumn(
        "t1", F.min(F.when(F.col("event_type") == "view", F.col("ts"))).over(w)
    )
    s2 = s1.withColumn(
        "t2",
        F.min(
            F.when(
                (F.col("event_type") == "click") & (F.col("ts") > F.col("t1")),
                F.col("ts"),
            )
        ).over(w),
    )
    s3 = s2.withColumn(
        "t3",
        F.min(
            F.when(
                (F.col("event_type") == "purchase") & (F.col("ts") > F.col("t2")),
                F.col("ts"),
            )
        ).over(w),
    )
    per_user = s3.groupBy("user_id").agg(
        F.first("t1").alias("t1"), F.first("t2").alias("t2"), F.first("t3").alias("t3")
    )
    deadline = F.col("t1") + F.expr("INTERVAL 2 HOURS")
    depth = (
        F.when(F.col("t3").isNotNull() & (F.col("t3") <= deadline), F.lit(3))
        .when(F.col("t2").isNotNull() & (F.col("t2") <= deadline), F.lit(2))
        .when(F.col("t1").isNotNull(), F.lit(1))
        .otherwise(F.lit(0))
    )
    return (
        per_user.select(depth.alias("funnel_depth"))
        .groupBy("funnel_depth")
        .agg(F.count("*").alias("n_users"))
    )


O_EVT_FUNNEL = """
WITH v AS (
  SELECT user_id, min(ts) AS t1 FROM events WHERE event_type = 'view' GROUP BY user_id
), c AS (
  SELECT e.user_id, min(ts) AS t2
  FROM events e JOIN v USING (user_id)
  WHERE event_type = 'click' AND ts > t1 GROUP BY e.user_id
), p AS (
  SELECT e.user_id, min(ts) AS t3
  FROM events e JOIN c USING (user_id)
  WHERE event_type = 'purchase' AND ts > t2 GROUP BY e.user_id
), allu AS (
  SELECT DISTINCT user_id FROM events
), j AS (
  SELECT a.user_id, v.t1, c.t2, p.t3
  FROM allu a LEFT JOIN v USING (user_id)
             LEFT JOIN c USING (user_id)
             LEFT JOIN p USING (user_id)
)
SELECT CASE WHEN t3 IS NOT NULL AND t3 <= t1 + INTERVAL 2 HOUR THEN 3
            WHEN t2 IS NOT NULL AND t2 <= t1 + INTERVAL 2 HOUR THEN 2
            WHEN t1 IS NOT NULL THEN 1
            ELSE 0 END AS funnel_depth,
       count(*) AS n_users
FROM j GROUP BY 1
"""


# --------------------------------------------------------------------------
# Further TPC-H plan shapes: two-sided dimension join (Q7), outer-join
# histogram (Q13), having-semi-join (Q18), disjunctive pushdown (Q19),
# anti-join + scalar subquery (Q22 shape).  All money/quantity arithmetic
# uses the integer cents recipe so cross-engine sums are order-free exact.
# --------------------------------------------------------------------------

_REV_CENTS100 = (
    "cast(round(l_extendedprice * 100) as decimal(18,0))"
    " * cast(round((1 - l_discount) * 100) as decimal(18,0))"
)
_REV_CENTS100_SQL = (
    "CAST(round(l_extendedprice * 100) AS DECIMAL(18,0))"
    " * CAST(round((1 - l_discount) * 100) AS DECIMAL(18,0))"
)


def q_agg_q7_nation_volume(spark, sf_dir):
    """TPC-H Q7 shape: shipping volume between two nations, by direction and
    ship year.  Two independent dimension chains hang off the fact table —
    supplier→nation on l_suppkey and orders→customer→nation on the order key
    — with a disjunctive filter over the (supp, cust) nation pair.

    Scale: both nation chains are broadcast (25-row dim); the only wide
    shuffle is lineitem⋈orders on orderkey, which bucketing co-locates at
    100 TB.  customer is broadcast here (15 k rows at sf0.1); on a real
    cluster it exceeds the broadcast threshold and AQE picks a shuffle join
    on o_custkey instead — the plan is declared, not hand-scheduled.
    """
    li = _t(spark, sf_dir, "lineitem")
    o = _t(spark, sf_dir, "orders")
    c = _t(spark, sf_dir, "customer")
    s = _t(spark, sf_dir, "supplier")
    n = _t(spark, sf_dir, "nation")
    supp_n = s.join(F.broadcast(n), F.col("s_nationkey") == F.col("n_nationkey")).select(
        "s_suppkey", F.col("n_name").alias("supp_nation")
    )
    cust_n = c.join(F.broadcast(n), F.col("c_nationkey") == F.col("n_nationkey")).select(
        "c_custkey", F.col("n_name").alias("cust_nation")
    )
    pair = (
        (F.col("supp_nation") == "NATION_1") & (F.col("cust_nation") == "NATION_2")
    ) | ((F.col("supp_nation") == "NATION_2") & (F.col("cust_nation") == "NATION_1"))
    return (
        li.join(o, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(F.broadcast(supp_n), F.col("l_suppkey") == F.col("s_suppkey"))
        .join(cust_n, F.col("o_custkey") == F.col("c_custkey"))
        .where(pair)
        .groupBy("supp_nation", "cust_nation", F.year("l_shipdate").alias("l_year"))
        .agg(F.sum(F.expr(_REV_CENTS100)).cast("bigint").alias("volume_cents100"))
        .orderBy("supp_nation", "cust_nation", "l_year")
    )


O_AGG_Q7 = f"""
SELECT sn.n_name AS supp_nation, cn.n_name AS cust_nation,
       CAST(year(l_shipdate) AS BIGINT) AS l_year,
       CAST(sum({_REV_CENTS100_SQL}) AS BIGINT) AS volume_cents100
FROM lineitem
JOIN orders   ON l_orderkey = o_orderkey
JOIN supplier ON l_suppkey = s_suppkey
JOIN nation sn ON s_nationkey = sn.n_nationkey
JOIN customer ON o_custkey = c_custkey
JOIN nation cn ON c_nationkey = cn.n_nationkey
WHERE (sn.n_name = 'NATION_1' AND cn.n_name = 'NATION_2')
   OR (sn.n_name = 'NATION_2' AND cn.n_name = 'NATION_1')
GROUP BY 1, 2, 3 ORDER BY 1, 2, 3
"""


def q_agg_q13_order_histogram(spark, sf_dir):
    """TPC-H Q13 shape: distribution of orders-per-customer — a LEFT OUTER
    join (customers with zero qualifying orders must survive with count 0)
    feeding a second aggregation over the first's result.

    Scale: two shuffles (custkey, then c_count); the second input is one row
    per customer and the histogram domain is tiny, so the second exchange is
    negligible.  The filter on the orders side is applied pre-join, inside
    the scan stage.
    """
    c = _t(spark, sf_dir, "customer")
    o = _t(spark, sf_dir, "orders").where(F.col("o_orderpriority") != "5-LOW")
    per_cust = (
        c.join(o, F.col("c_custkey") == F.col("o_custkey"), "left")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return (
        per_cust.groupBy("c_count")
        .agg(F.count("*").alias("custdist"))
        .orderBy(F.desc("custdist"), F.desc("c_count"))
    )


O_AGG_Q13 = """
WITH per_cust AS (
  SELECT c_custkey, count(o_orderkey) AS c_count
  FROM customer LEFT JOIN orders
    ON c_custkey = o_custkey AND o_orderpriority <> '5-LOW'
  GROUP BY c_custkey
)
SELECT c_count, count(*) AS custdist
FROM per_cust GROUP BY c_count ORDER BY custdist DESC, c_count DESC
"""


def q_agg_q18_large_orders(spark, sf_dir):
    """TPC-H Q18 shape: large-quantity orders — a HAVING-filtered aggregate
    used as a semi-join filter back onto the fact/dim chain.

    Quantities ride as exact integer cents so the HAVING threshold is an
    integer comparison on both engines.  Scale: the groupBy(l_orderkey)
    pre-aggregates map-side; the surviving key set is tiny (p99 of order
    quantity is ~262 at this distribution, threshold 300), so the back-join
    is a broadcast of the filtered keys — the classic "aggregate once,
    semi-join the survivors" shape.
    """
    li = _t(spark, sf_dir, "lineitem")
    o = _t(spark, sf_dir, "orders")
    c = _t(spark, sf_dir, "customer")
    qty = "cast(round(l_quantity * 100) as decimal(18,0))"
    big = (
        li.groupBy("l_orderkey")
        .agg(F.sum(F.expr(qty)).cast("bigint").alias("qty_cents"))
        .where(F.col("qty_cents") > 300 * 100)
    )
    return (
        o.join(F.broadcast(big), F.col("o_orderkey") == F.col("l_orderkey"))
        .join(c, F.col("o_custkey") == F.col("c_custkey"))
        .select(
            "c_name",
            "c_custkey",
            "o_orderkey",
            F.expr("cast(round(o_totalprice * 100) as bigint)").alias("total_cents"),
            "qty_cents",
        )
        .orderBy(F.desc("total_cents"), "o_orderkey")
        .limit(20)
    )


O_AGG_Q18 = """
WITH big AS (
  SELECT l_orderkey,
         CAST(sum(CAST(round(l_quantity * 100) AS DECIMAL(18,0))) AS BIGINT)
           AS qty_cents
  FROM lineitem GROUP BY l_orderkey
  HAVING sum(CAST(round(l_quantity * 100) AS DECIMAL(18,0))) > 30000
)
SELECT c_name, c_custkey, o_orderkey,
       CAST(round(o_totalprice * 100) AS BIGINT) AS total_cents, qty_cents
FROM orders JOIN big ON o_orderkey = l_orderkey
JOIN customer ON o_custkey = c_custkey
ORDER BY total_cents DESC, o_orderkey LIMIT 20
"""


def q_agg_q19_disjunctive_revenue(spark, sf_dir):
    """TPC-H Q19 shape: revenue under a disjunction of (brand, size,
    quantity-band) predicate groups spanning both join sides.

    The common conjuncts (p_size >= 1, quantity bounds) still push into the
    scans; the brand-specific OR evaluates post-join.  One broadcast join,
    one scalar aggregate — no wide shuffle at any scale.
    """
    li = _t(spark, sf_dir, "lineitem")
    p = _t(spark, sf_dir, "part")

    def band(brand: str, max_size: int, qlo: int, qhi: int):
        return (
            (F.col("p_brand") == brand)
            & (F.col("p_size").between(1, max_size))
            & (F.col("l_quantity").between(qlo, qhi))
        )

    return (
        li.join(F.broadcast(p), F.col("l_partkey") == F.col("p_partkey"))
        .where(
            band("Brand#12", 15, 1, 15)
            | band("Brand#23", 20, 10, 25)
            | band("Brand#34", 25, 20, 35)
        )
        .agg(F.sum(F.expr(_REV_CENTS100)).cast("bigint").alias("revenue_cents100"))
    )


O_AGG_Q19 = f"""
SELECT CAST(sum({_REV_CENTS100_SQL}) AS BIGINT) AS revenue_cents100
FROM lineitem JOIN part ON l_partkey = p_partkey
WHERE (p_brand = 'Brand#12' AND p_size BETWEEN 1 AND 15 AND l_quantity BETWEEN 1 AND 15)
   OR (p_brand = 'Brand#23' AND p_size BETWEEN 1 AND 20 AND l_quantity BETWEEN 10 AND 25)
   OR (p_brand = 'Brand#34' AND p_size BETWEEN 1 AND 25 AND l_quantity BETWEEN 20 AND 35)
"""


def q_agg_q22_idle_rich(spark, sf_dir):
    """TPC-H Q22 shape: per-nation count/balance of above-average-balance
    customers who never placed an URGENT order — scalar-subquery threshold +
    anti-join.

    The average-balance comparison is cross-multiplied into pure integers
    (bal_cents · n_pos > sum_pos_cents) so no engine ever divides: exact on
    both sides with zero rounding policy.  Scale: the threshold aggregate is
    one row (broadcast); the anti-join shuffles on custkey — or broadcasts
    the distinct urgent-custkey set when it is small, which AQE decides.
    """
    c = _t(spark, sf_dir, "customer")
    o = _t(spark, sf_dir, "orders")
    bal = F.expr("cast(round(c_acctbal * 100) as bigint)")
    pos = c.where(F.col("c_acctbal") > 0).agg(
        F.sum(bal).alias("sum_pos_cents"), F.count("*").alias("n_pos")
    )
    urgent = o.where(F.col("o_orderpriority") == "1-URGENT").select("o_custkey")
    return (
        c.withColumn("bal_cents", bal)
        .crossJoin(F.broadcast(pos))
        .where(F.col("bal_cents") * F.col("n_pos") > F.col("sum_pos_cents"))
        .join(urgent, F.col("c_custkey") == F.col("o_custkey"), "left_anti")
        .groupBy("c_nationkey")
        .agg(F.count("*").alias("numcust"), F.sum("bal_cents").alias("totbal_cents"))
        .orderBy("c_nationkey")
    )


O_AGG_Q22 = """
WITH pos AS (
  SELECT CAST(sum(CAST(round(c_acctbal * 100) AS BIGINT)) AS BIGINT) AS sum_pos_cents,
         count(*) AS n_pos
  FROM customer WHERE c_acctbal > 0
)
SELECT c_nationkey, count(*) AS numcust,
       CAST(sum(CAST(round(c_acctbal * 100) AS BIGINT)) AS BIGINT) AS totbal_cents
FROM customer, pos
WHERE CAST(round(c_acctbal * 100) AS BIGINT) * n_pos > sum_pos_cents
  AND c_custkey NOT IN (
    SELECT o_custkey FROM orders WHERE o_orderpriority = '1-URGENT')
GROUP BY c_nationkey ORDER BY c_nationkey
"""


def q_evt_anomaly_mad(spark, sf_dir):
    """Median/MAD robust outlier scan per event type: values deviating
    more than 3×MAD from the type median, one summary row per type with
    micro-quantized robust stats and the outlier count."""
    from .operators.profiling import mad_outliers

    ev = _t(spark, sf_dir, "events")
    return mad_outliers(ev, "event_type", "value", k=3.0)


def _mad_oracle():
    from .operators.profiling import mad_outliers_oracle_sql

    return mad_outliers_oracle_sql("events", "event_type", "value", k=3.0)


O_EVT_ANOMALY_MAD = _mad_oracle()


def q_graph_hits(spark, sf_dir):
    """Integer fixed-point HITS (3 rounds, L∞ normalization) on the
    part→supplier bipartite subgraph: parts are hubs, suppliers
    authorities.  The iteration runs on the fixture's 8-byte integer
    node ids (same discipline as kcore: every per-round shuffle carries
    16 B/edge instead of two key strings); the id→key map joins back
    once on the final node-sized frame.  Score values are identical —
    HITS arithmetic never looks at the key."""
    from .operators.graph_algos import hits_scaled

    g = _fixture(spark, sf_dir)
    # one JSON-parse pass, materialized: the operator input and the
    # keymap below otherwise each re-parse `details` over the full
    # cached edge table (three scans total)
    supplied = cut_lineage(
        g.edges.where(
            F.get_json_object("details", "$.rel") == "supplied_by"
        ).select("src", "dst", "src_key", "dst_key")
    )
    scores = hits_scaled(
        supplied.select(
            F.col("src").alias("src_key"), F.col("dst").alias("dst_key")
        ),
        iters=3,
    ).withColumnRenamed("key", "nid")
    keymap = (
        supplied.select(F.col("src").alias("nid"), F.col("src_key").alias("key"))
        .unionByName(
            supplied.select(F.col("dst").alias("nid"), F.col("dst_key").alias("key"))
        )
        .distinct()
    )
    return scores.join(keymap, "nid").select("key", "hub", "auth")


def _hits_oracle(iters: int = 3, scale: int = 10**6) -> str:
    """Unrolled fixed-point HITS over the same subgraph (same truncating
    division, same L∞ normalization, same a-then-h update order)."""
    cte = [
        "e AS (SELECT DISTINCT 'part:' || l_partkey AS src_key,"
        " 'supplier:' || l_suppkey AS dst_key FROM lineitem)",
        "nodes AS (SELECT src_key AS key FROM e UNION SELECT dst_key FROM e)",
        f"h0 AS (SELECT key, CAST({scale} AS BIGINT) AS h FROM nodes)",
    ]
    ph = "h0"
    for i in range(1, iters + 1):
        cte.append(
            f"ar{i} AS (SELECT e.dst_key AS key, CAST(sum({ph}.h) AS BIGINT) AS s"
            f" FROM e JOIN {ph} ON e.src_key = {ph}.key GROUP BY e.dst_key)"
        )
        cte.append(f"am{i} AS (SELECT max(s) AS mx FROM ar{i})")
        cte.append(
            f"a{i} AS (SELECT nodes.key,"
            f" COALESCE((COALESCE(ar{i}.s, 0) * {scale}) // nullif(am{i}.mx, 0), 0) AS a"
            f" FROM nodes CROSS JOIN am{i}"
            f" LEFT JOIN ar{i} ON ar{i}.key = nodes.key)"
        )
        cte.append(
            f"hr{i} AS (SELECT e.src_key AS key, CAST(sum(a{i}.a) AS BIGINT) AS s"
            f" FROM e JOIN a{i} ON e.dst_key = a{i}.key GROUP BY e.src_key)"
        )
        cte.append(f"hm{i} AS (SELECT max(s) AS mx FROM hr{i})")
        cte.append(
            f"h{i} AS (SELECT nodes.key,"
            f" COALESCE((COALESCE(hr{i}.s, 0) * {scale}) // nullif(hm{i}.mx, 0), 0) AS h"
            f" FROM nodes CROSS JOIN hm{i}"
            f" LEFT JOIN hr{i} ON hr{i}.key = nodes.key)"
        )
        ph = f"h{i}"
    return (
        "WITH " + ",\n".join(cte)
        + f"\nSELECT nodes.key, h{iters}.h AS hub, a{iters}.a AS auth"
        f"\nFROM nodes JOIN h{iters} ON h{iters}.key = nodes.key"
        f" JOIN a{iters} ON a{iters}.key = nodes.key"
    )


O_GRAPH_HITS = _hits_oracle()


def q_agg_corr_regr(spark, sf_dir):
    """Pearson correlation + OLS slope/intercept of (quantity, whole-dollar
    price) per return flag — the statistical-aggregate surface (corr/covar/
    regr_*) computed from EXACT integer component sums (n, Σx, Σy, Σxy,
    Σx², Σy²), so the one final double formula is identical on any engine.
    Whole-dollar y (cents div 100) keeps Σy² far from BIGINT overflow at
    any SF.  Zero-variance groups yield NULL, not a divide crash."""
    from .operators.profiling import corr_regr_stats

    li = _t(spark, sf_dir, "lineitem")
    base = li.select(
        "l_returnflag",
        F.col("l_quantity").cast("long").alias("x"),
        F.expr("cast(round(l_extendedprice * 100) as bigint) div 100").alias("y"),
    )
    return corr_regr_stats(base, "l_returnflag")


O_AGG_CORR = """
WITH base AS (
  SELECT l_returnflag, CAST(l_quantity AS BIGINT) AS x,
         CAST(round(l_extendedprice * 100) AS BIGINT) // 100 AS y
  FROM lineitem
),
comps AS (
  SELECT l_returnflag, count(*) AS n,
         CAST(sum(x) AS BIGINT) AS sx, CAST(sum(y) AS BIGINT) AS sy,
         CAST(sum(x * y) AS BIGINT) AS sxy,
         CAST(sum(x * x) AS BIGINT) AS sxx,
         CAST(sum(y * y) AS BIGINT) AS syy
  FROM base GROUP BY l_returnflag
),
staged AS (
  SELECT *,
         CAST(n AS DOUBLE) * sxx - CAST(sx AS DOUBLE) * sx AS vx,
         CAST(n AS DOUBLE) * syy - CAST(sy AS DOUBLE) * sy AS vy,
         CAST(n AS DOUBLE) * sxy - CAST(sx AS DOUBLE) * sy AS cnum
  FROM comps
)
SELECT l_returnflag, n AS n_rows,
       CASE WHEN vx > 0 AND vy > 0 THEN
         CAST(floor(cnum / sqrt(vx * vy) * 1000000) AS BIGINT) ELSE NULL END
         AS corr_micro,
       CASE WHEN vx > 0 THEN
         CAST(floor(cnum / vx * 1000000) AS BIGINT) ELSE NULL END AS slope_micro,
       CASE WHEN vx > 0 THEN
         CAST(floor((sy - cnum / vx * sx) / n * 1000000) AS BIGINT) ELSE NULL END
         AS icept_micro
FROM staged
"""


def q_graph_bipartite_proj(spark, sf_dir):
    """Weighted supplier co-supply graph: one-mode projection of the
    part→supplier bipartite subgraph (w = shared parts), hub parts with
    fanout > 8 dropped before the pair self-join (LSH-bucket discipline)."""
    from .operators.graph_algos import bipartite_projection

    g = _fixture(spark, sf_dir)
    supplied = g.edges.where(
        F.get_json_object("details", "$.rel") == "supplied_by"
    )
    return bipartite_projection(supplied, max_fanout=8)


O_GRAPH_BIPROJ = """
WITH e AS (
  SELECT DISTINCT 'part:' || l_partkey AS src_key,
         'supplier:' || l_suppkey AS dst_key
  FROM lineitem
),
small AS (
  SELECT src_key FROM e GROUP BY src_key HAVING count(*) <= 8
),
ee AS (SELECT e.* FROM e SEMI JOIN small USING (src_key))
SELECT a.dst_key AS a, b.dst_key AS b, count(*) AS w
FROM ee a JOIN ee b ON a.src_key = b.src_key AND a.dst_key < b.dst_key
GROUP BY a.dst_key, b.dst_key
"""


def q_agg_skew_kurtosis(spark, sf_dir):
    """Skewness and excess kurtosis of order quantity per return flag from
    EXACT integer moment sums (Σx..Σx⁴ — quantity ≤ 50, so x⁴ is far from
    the BIGINT ceiling at any SF); the closing formulas are one fixed
    double-expression tree, micro-quantized."""
    li = _t(spark, sf_dir, "lineitem")
    base = li.select("l_returnflag", F.col("l_quantity").cast("long").alias("x"))
    m = base.groupBy("l_returnflag").agg(
        F.count("*").alias("n"),
        F.sum("x").alias("s1"),
        F.sum(F.expr("x * x")).alias("s2"),
        F.sum(F.expr("x * x * x")).alias("s3"),
        F.sum(F.expr("x * x * x * x")).alias("s4"),
    )
    staged = (
        m.withColumn("mu", F.expr("cast(s1 as double) / n"))
        .withColumn("m2", F.expr("cast(s2 as double) / n - mu * mu"))
        .withColumn(
            "m3",
            F.expr("cast(s3 as double) / n - 3 * mu * (cast(s2 as double) / n)"
                   " + 2 * mu * mu * mu"),
        )
        .withColumn(
            "m4",
            F.expr(
                "cast(s4 as double) / n - 4 * mu * (cast(s3 as double) / n)"
                " + 6 * mu * mu * (cast(s2 as double) / n) - 3 * mu * mu * mu * mu"
            ),
        )
    )
    return staged.select(
        "l_returnflag",
        F.col("n").alias("n_rows"),
        F.expr(
            "CASE WHEN m2 > 0 THEN cast(floor(m3 / (sqrt(m2) * sqrt(m2) * sqrt(m2))"
            " * 1000000) as bigint) ELSE NULL END"
        ).alias("skew_micro"),
        F.expr(
            "CASE WHEN m2 > 0 THEN cast(floor((m4 / (m2 * m2) - 3) * 1000000)"
            " as bigint) ELSE NULL END"
        ).alias("kurt_micro"),
    )


O_AGG_SKEWKURT = """
WITH base AS (
  SELECT l_returnflag, CAST(l_quantity AS BIGINT) AS x FROM lineitem
),
m AS (
  SELECT l_returnflag, count(*) AS n,
         CAST(sum(x) AS BIGINT) AS s1, CAST(sum(x * x) AS BIGINT) AS s2,
         CAST(sum(x * x * x) AS BIGINT) AS s3,
         CAST(sum(x * x * x * x) AS BIGINT) AS s4
  FROM base GROUP BY l_returnflag
),
staged AS (
  SELECT *, CAST(s1 AS DOUBLE) / n AS mu FROM m
),
staged2 AS (
  SELECT *,
         CAST(s2 AS DOUBLE) / n - mu * mu AS m2,
         CAST(s3 AS DOUBLE) / n - 3 * mu * (CAST(s2 AS DOUBLE) / n)
           + 2 * mu * mu * mu AS m3,
         CAST(s4 AS DOUBLE) / n - 4 * mu * (CAST(s3 AS DOUBLE) / n)
           + 6 * mu * mu * (CAST(s2 AS DOUBLE) / n) - 3 * mu * mu * mu * mu AS m4
  FROM staged
)
SELECT l_returnflag, n AS n_rows,
       CASE WHEN m2 > 0 THEN CAST(floor(m3 / (sqrt(m2) * sqrt(m2) * sqrt(m2))
            * 1000000) AS BIGINT) ELSE NULL END AS skew_micro,
       CASE WHEN m2 > 0 THEN CAST(floor((m4 / (m2 * m2) - 3) * 1000000)
            AS BIGINT) ELSE NULL END AS kurt_micro
FROM staged2
"""


def q_win_first_last(spark, sf_dir):
    """first_value / last_value / nth_value over each customer's order
    history (full-partition frame) — the remaining ranking-window surface:
    first order date, latest order cents, second order key per customer,
    one row per customer (1-in-31 sample)."""
    from pyspark.sql import Window

    o = _t(spark, sf_dir, "orders").where(F.col("o_custkey") % 31 == 0)
    w = (
        Window.partitionBy("o_custkey")
        .orderBy("o_orderdate", "o_orderkey")
        .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    )
    enriched = o.select(
        "o_custkey",
        "o_orderkey",
        F.first_value(F.col("o_orderdate")).over(w).alias("first_date"),
        F.last_value(F.expr("cast(round(o_totalprice * 100) as bigint)"))
        .over(w)
        .alias("last_cents"),
        F.nth_value(F.col("o_orderkey"), 2).over(w).alias("second_order"),
        F.row_number()
        .over(Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey"))
        .alias("rn"),
    )
    return enriched.where(F.col("rn") == 1).drop("rn")


O_WIN_FIRST_LAST = """
WITH base AS (SELECT * FROM orders WHERE o_custkey % 31 = 0),
enriched AS (
  SELECT o_custkey, o_orderkey,
         first_value(o_orderdate) OVER w AS first_date,
         last_value(CAST(round(o_totalprice * 100) AS BIGINT)) OVER w AS last_cents,
         nth_value(o_orderkey, 2) OVER w AS second_order,
         row_number() OVER (PARTITION BY o_custkey
                            ORDER BY o_orderdate, o_orderkey) AS rn
  FROM base
  WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
               ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
)
SELECT o_custkey, o_orderkey, first_date, last_cents, second_order
FROM enriched WHERE rn = 1
"""


def q_evt_rfm_segments(spark, sf_dir):
    """RFM user segmentation (recency / frequency / monetary quartiles):
    per-user stats in exact integers (days, counts, cents), quartile
    boundaries via the exact-percentile trust base broadcast back — NO
    global ntile window (a single-partition sort at corpus scale); the
    segment grid is ≤64 rows."""
    ev = _t(spark, sf_dir, "events")
    anchor = ev.agg(F.max(F.col("ts").cast("date")).alias("amax"))
    per = (
        ev.groupBy("user_id")
        .agg(
            F.max(F.col("ts").cast("date")).alias("last_d"),
            F.count("*").alias("n_ev"),
            F.sum(F.expr("cast(round(value * 100) as bigint)")).alias("cents"),
        )
        .crossJoin(F.broadcast(anchor))
        .withColumn("rec_days", F.datediff(F.col("amax"), F.col("last_d")))
    )
    q = per.agg(
        *[
            F.expr(f"percentile(cast({c} as double), {p})").alias(f"{c}_q{i}")
            for c in ("rec_days", "n_ev", "cents")
            for i, p in ((1, 0.25), (2, 0.5), (3, 0.75))
        ]
    )
    def _score(c):
        return F.expr(
            f"CASE WHEN {c} <= {c}_q1 THEN 1 WHEN {c} <= {c}_q2 THEN 2"
            f" WHEN {c} <= {c}_q3 THEN 3 ELSE 4 END"
        ).cast("long")

    scored = per.crossJoin(F.broadcast(q)).select(
        _score("rec_days").alias("r_score"),
        _score("n_ev").alias("f_score"),
        _score("cents").alias("m_score"),
        "cents",
    )
    return scored.groupBy("r_score", "f_score", "m_score").agg(
        F.count("*").alias("n_users"),
        F.sum("cents").alias("sum_cents"),
    )


O_EVT_RFM = """
WITH anchor AS (SELECT max(CAST(ts AS DATE)) AS amax FROM events),
per AS (
  SELECT user_id, max(CAST(ts AS DATE)) AS last_d, count(*) AS n_ev,
         CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS cents
  FROM events GROUP BY user_id
),
per2 AS (
  SELECT per.*, CAST(amax - last_d AS BIGINT) AS rec_days FROM per, anchor
),
q AS (
  SELECT quantile_cont(CAST(rec_days AS DOUBLE), 0.25) AS rec_days_q1,
         quantile_cont(CAST(rec_days AS DOUBLE), 0.5)  AS rec_days_q2,
         quantile_cont(CAST(rec_days AS DOUBLE), 0.75) AS rec_days_q3,
         quantile_cont(CAST(n_ev AS DOUBLE), 0.25) AS n_ev_q1,
         quantile_cont(CAST(n_ev AS DOUBLE), 0.5)  AS n_ev_q2,
         quantile_cont(CAST(n_ev AS DOUBLE), 0.75) AS n_ev_q3,
         quantile_cont(CAST(cents AS DOUBLE), 0.25) AS cents_q1,
         quantile_cont(CAST(cents AS DOUBLE), 0.5)  AS cents_q2,
         quantile_cont(CAST(cents AS DOUBLE), 0.75) AS cents_q3
  FROM per2
),
scored AS (
  SELECT CAST(CASE WHEN rec_days <= rec_days_q1 THEN 1
              WHEN rec_days <= rec_days_q2 THEN 2
              WHEN rec_days <= rec_days_q3 THEN 3 ELSE 4 END AS BIGINT) AS r_score,
         CAST(CASE WHEN n_ev <= n_ev_q1 THEN 1 WHEN n_ev <= n_ev_q2 THEN 2
              WHEN n_ev <= n_ev_q3 THEN 3 ELSE 4 END AS BIGINT) AS f_score,
         CAST(CASE WHEN cents <= cents_q1 THEN 1 WHEN cents <= cents_q2 THEN 2
              WHEN cents <= cents_q3 THEN 3 ELSE 4 END AS BIGINT) AS m_score,
         cents
  FROM per2, q
)
SELECT r_score, f_score, m_score, count(*) AS n_users,
       CAST(sum(cents) AS BIGINT) AS sum_cents
FROM scored GROUP BY r_score, f_score, m_score
"""


def q_join_bloom_prefilter(spark, sf_dir):
    """Explicit Bloom runtime-filter join: lineitem rows are dropped by an
    8 KB broadcast sketch of the urgent-order keys BEFORE the join
    shuffle; the oracle is the PLAIN join — the equivalence (no false
    negatives, exact join removes false positives) is the contract."""
    from .operators.skew import bloom_prefilter_join

    li = _t(spark, sf_dir, "lineitem")
    urgent = (
        _t(spark, sf_dir, "orders")
        .where(F.col("o_orderpriority") == "1-URGENT")
        .select("o_orderkey")
    )
    joined = bloom_prefilter_join(li, "l_orderkey", urgent, "o_orderkey")
    return joined.groupBy("l_returnflag").agg(
        F.count("*").alias("n_lines"),
        F.sum(F.col("l_quantity").cast("long")).alias("sum_qty"),
    )


O_JOIN_BLOOM = """
SELECT l_returnflag, count(*) AS n_lines,
       CAST(sum(CAST(l_quantity AS BIGINT)) AS BIGINT) AS sum_qty
FROM lineitem JOIN orders ON l_orderkey = o_orderkey
WHERE o_orderpriority = '1-URGENT'
GROUP BY l_returnflag
"""


def q_win_percent_rank(spark, sf_dir):
    """percent_rank + cume_dist per order priority over a deterministic
    1-in-97 order sample (micro-quantized: both are exact small rationals
    from one division, identical on any engine).  Completes the ranking-
    window surface next to rank/ntile."""
    from pyspark.sql import Window

    o = _t(spark, sf_dir, "orders").where(F.col("o_orderkey") % 97 == 0)
    w = Window.partitionBy("o_orderpriority").orderBy(
        F.expr("cast(round(o_totalprice * 100) as bigint)"), "o_orderkey"
    )
    return o.select(
        "o_orderpriority",
        "o_orderkey",
        F.expr("cast(round(o_totalprice * 100) as bigint)").alias("cents"),
        F.floor(F.percent_rank().over(w) * F.lit(1_000_000.0))
        .cast("long")
        .alias("pr_micro"),
        F.floor(F.cume_dist().over(w) * F.lit(1_000_000.0))
        .cast("long")
        .alias("cd_micro"),
    )


O_WIN_PERCENT_RANK = """
SELECT o_orderpriority, o_orderkey,
       CAST(round(o_totalprice * 100) AS BIGINT) AS cents,
       CAST(floor(percent_rank() OVER w * 1000000.0) AS BIGINT) AS pr_micro,
       CAST(floor(cume_dist() OVER w * 1000000.0) AS BIGINT) AS cd_micro
FROM orders WHERE o_orderkey % 97 = 0
WINDOW w AS (PARTITION BY o_orderpriority
             ORDER BY CAST(round(o_totalprice * 100) AS BIGINT), o_orderkey)
"""




def q_evt_seasonal_dow(spark, sf_dir):
    """Day-of-week seasonal index per event type: mean daily volume on
    each weekday relative to the type's overall daily mean, as one exact
    integer division over order-exact sums.  dow = epoch-days % 7
    (0 = Thursday) — portable arithmetic, never the engines' conflicting
    dayofweek builtins."""
    from .operators.timeseries import seasonal_dow

    return seasonal_dow(_t(spark, sf_dir, "events"), "event_type", "ts")


O_EVT_SEASONAL_DOW = """
WITH daily AS (
  SELECT event_type, date_trunc('day', ts) AS day, count(*) AS n
  FROM events GROUP BY 1, 2
),
bydow AS (
  SELECT event_type,
         CAST(date_diff('day', DATE '1970-01-01', CAST(day AS DATE)) % 7
              AS BIGINT) AS dow,
         CAST(count(*) AS BIGINT) AS n_days,
         CAST(sum(n) AS BIGINT) AS n_events
  FROM daily GROUP BY 1, 2
)
SELECT event_type, dow, n_days, n_events,
       CAST((n_events * sum(n_days) OVER (PARTITION BY event_type) * 1000)
            // nullif(n_days * sum(n_events) OVER (PARTITION BY event_type), 0)
            AS BIGINT) AS index_permille
FROM bydow ORDER BY event_type, dow
"""


def q_evt_lag_corr(spark, sf_dir):
    """Lagged cross-correlation of the click and purchase daily series
    (lags -3..3): Pearson r composed once in doubles from exact integer
    component sums — does one series lead the other?"""
    from .operators.timeseries import lag_corr_daily

    return lag_corr_daily(
        _t(spark, sf_dir, "events"), "ts", "event_type",
        "click", "purchase", max_lag=3,
    )


O_EVT_LAG_CORR = """
WITH daily AS (
  SELECT event_type AS t, CAST(date_trunc('day', ts) AS DATE) AS day,
         count(*) AS n
  FROM events WHERE event_type IN ('click', 'purchase') GROUP BY 1, 2
),
x AS (SELECT day, n AS x FROM daily WHERE t = 'click'),
y AS (SELECT day AS yday, n AS y FROM daily WHERE t = 'purchase'),
lagged AS (
  SELECT l.lag, x.x, y.y
  FROM x CROSS JOIN (SELECT unnest(range(-3, 4)) AS lag) l
  JOIN y ON y.yday = x.day + CAST(l.lag AS INT)
),
c AS (
  SELECT CAST(lag AS BIGINT) AS lag,
         CAST(count(*) AS BIGINT) AS n_days,
         CAST(sum(x) AS BIGINT) AS sx, CAST(sum(y) AS BIGINT) AS sy,
         CAST(sum(x * y) AS BIGINT) AS sxy,
         CAST(sum(x * x) AS BIGINT) AS sxx,
         CAST(sum(y * y) AS BIGINT) AS syy
  FROM lagged GROUP BY 1
)
SELECT lag, n_days, sx, sy, sxy, sxx, syy,
       CAST(n_days * sxy - sx * sy AS DOUBLE)
         / nullif(sqrt(CAST(n_days * sxx - sx * sx AS DOUBLE))
                  * sqrt(CAST(n_days * syy - sy * sy AS DOUBLE)), 0.0)
         AS corr
FROM c ORDER BY lag
"""


def q_profile_benford(spark, sf_dir):
    """Benford first-digit profile of order totals (integer cents):
    observed permille per digit vs floor(1e6*ln(1+1/d)/ln 10)."""
    from .operators.profiling import benford_digits

    o = _t(spark, sf_dir, "orders")
    return benford_digits(
        o, F.round(F.col("o_totalprice") * 100).cast("long")
    )


O_PROFILE_BENFORD = """
WITH d AS (
  SELECT CAST(substring(CAST(CAST(round(o_totalprice * 100) AS BIGINT)
                             AS VARCHAR), 1, 1) AS BIGINT) AS digit
  FROM orders
),
g AS (SELECT digit, CAST(count(*) AS BIGINT) AS n FROM d GROUP BY 1)
SELECT digit, n,
       CAST(n * 1000 // sum(n) OVER () AS BIGINT) AS permille,
       CAST(floor(1000000 * ln(1.0 + 1.0 / digit) / ln(10.0)) AS BIGINT)
         AS benford_micro
FROM g ORDER BY digit
"""


def q_profile_expectations(spark, sf_dir):
    """Data-quality expectations report over lineitem: four row-local
    range/ordering rules in ONE conditional aggregate + the referential-
    integrity anti-join, as (rule, n_rows, n_violations, permille)."""
    from .operators.profiling import expectations_report

    return expectations_report(
        _t(spark, sf_dir, "lineitem"), _t(spark, sf_dir, "orders")
    )


O_PROFILE_EXPECTATIONS = """
WITH r AS (
  SELECT CAST(count(*) AS BIGINT) AS n_rows,
         CAST(sum(CASE WHEN NOT (l_quantity BETWEEN 1 AND 50) THEN 1 ELSE 0 END) AS BIGINT) AS v_qty,
         CAST(sum(CASE WHEN NOT (l_extendedprice > 0) THEN 1 ELSE 0 END) AS BIGINT) AS v_price,
         CAST(sum(CASE WHEN NOT (l_discount BETWEEN 0.0 AND 0.10) THEN 1 ELSE 0 END) AS BIGINT) AS v_disc,
         CAST(sum(CASE WHEN NOT (l_tax BETWEEN 0.0 AND 0.08) THEN 1 ELSE 0 END) AS BIGINT) AS v_tax,
         CAST(sum(CASE WHEN NOT (l_shipdate BETWEEN TIMESTAMP '1992-01-01'
                                 AND TIMESTAMP '1998-12-31 23:59:59')
                  THEN 1 ELSE 0 END) AS BIGINT) AS v_ship
  FROM lineitem
),
fk AS (
  SELECT CAST(count(*) AS BIGINT) AS v_fk FROM lineitem
  WHERE l_orderkey NOT IN (SELECT o_orderkey FROM orders)
),
u AS (
  SELECT 'fk_orderkey_exists' AS rule, n_rows, v_fk AS n_violations FROM r, fk
  UNION ALL SELECT 'l_discount_in_0_0.10', n_rows, v_disc FROM r
  UNION ALL SELECT 'l_extendedprice_positive', n_rows, v_price FROM r
  UNION ALL SELECT 'l_quantity_in_1_50', n_rows, v_qty FROM r
  UNION ALL SELECT 'l_shipdate_in_1992_1998', n_rows, v_ship FROM r
  UNION ALL SELECT 'l_tax_in_0_0.08', n_rows, v_tax FROM r
)
SELECT rule, n_rows, n_violations,
       CAST(n_violations * 1000 // nullif(n_rows, 0) AS BIGINT) AS violation_permille
FROM u ORDER BY rule
"""




def q_graph_ppr(spark, sf_dir):
    """Personalized PageRank (3 iterations) from a 3-customer seed set
    over the full directed fixture graph — graph-proximity scoring for
    related-entity queries; restart mass to the seeds only, inner
    propagation keeps state proportional to the reached neighborhood."""
    from .operators.graph_algos import personalized_pagerank

    g = _fixture(spark, sf_dir)
    seeds = spark.createDataFrame(
        [("customer:1",), ("customer:7",), ("customer:13",)], "key string"
    )
    # keymap = vertices (covers every endpoint AND the customer seeds),
    # sparing the operator's two-sided union + string distinct
    return personalized_pagerank(
        g.edges.select("src_key", "dst_key"), seeds, iters=3,
        keymap=g.vertices.select("key"),
    ).orderBy("key")


def _ppr_oracle(iters: int = 3, scale: int = 10**12) -> str:
    """Unrolled fixed-point personalized PageRank over the full fixture
    edge set; computed over all nodes with a seed indicator, final
    projection keeps nonzero mass (≡ the engine's inner propagation —
    zero-mass nodes contribute nothing to any sum)."""
    base = f"(15 * {scale}) // (100 * 3)"
    cte = [
        "e AS (SELECT 'customer:' || c_custkey AS src_key,"
        " 'nation:' || c_nationkey AS dst_key FROM customer"
        " UNION ALL SELECT 'supplier:' || s_suppkey, 'nation:' || s_nationkey FROM supplier"
        " UNION ALL SELECT 'nation:' || n_nationkey, 'region:' || n_regionkey FROM nation"
        " UNION ALL SELECT DISTINCT 'customer:' || o_custkey, 'part:' || l_partkey"
        "   FROM orders JOIN lineitem ON o_orderkey = l_orderkey"
        " UNION ALL SELECT DISTINCT 'part:' || l_partkey, 'supplier:' || l_suppkey FROM lineitem)",
        "nodes AS (SELECT src_key AS key FROM e UNION SELECT dst_key FROM e)",
        "deg AS (SELECT src_key, count(*) AS d FROM e GROUP BY src_key)",
        "seeds AS (SELECT 'customer:' || k AS key FROM (VALUES (1), (7), (13)) v(k))",
        f"pr0 AS (SELECT key, {scale} // 3 AS pr FROM seeds)",
    ]
    prev = "pr0"
    for i in range(1, iters + 1):
        cte.append(
            f"g{i} AS (SELECT e.dst_key AS key, sum({prev}.pr // deg.d) AS s"
            f" FROM e JOIN {prev} ON e.src_key = {prev}.key"
            f" JOIN deg ON deg.src_key = e.src_key GROUP BY e.dst_key)"
        )
        cte.append(
            f"pr{i} AS (SELECT nodes.key,"
            f" CASE WHEN seeds.key IS NOT NULL THEN {base} ELSE 0 END"
            f" + (85 * COALESCE(g{i}.s, 0)) // 100 AS pr"
            f" FROM nodes LEFT JOIN seeds ON seeds.key = nodes.key"
            f" LEFT JOIN g{i} ON g{i}.key = nodes.key)"
        )
        prev = f"pr{i}"
    return (
        "WITH " + ",\n".join(cte)
        + f"\nSELECT key, CAST(pr AS BIGINT) AS ppr FROM {prev}"
        + " WHERE pr > 0 ORDER BY key"
    )


O_GRAPH_PPR = _ppr_oracle()




def q_clean_quantile_norm(spark, sf_dir):
    """Per-source → global decile normalization map over document
    lengths: type-1 discrete boundaries in pure integer arithmetic
    (the cross-source score-calibration table; interpolated percentiles
    of integer columns are banned by the COVERAGE.md addendum)."""
    from .operators.profiling import quantile_norm_map

    return quantile_norm_map(
        _t(spark, sf_dir, "documents"), "source", "n_chars", n_q=10
    )


O_CLEAN_QUANTILE_NORM = """
WITH gh AS (
  SELECT source AS grp, n_chars AS v, count(*) AS c
  FROM documents GROUP BY 1, 2
),
gcum AS (
  SELECT grp, v, c,
         sum(c) OVER (PARTITION BY grp ORDER BY v
                      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum,
         sum(c) OVER (PARTITION BY grp) AS n
  FROM gh
),
src AS (
  SELECT grp, d.decile, v AS src_hi, n
  FROM gcum CROSS JOIN (SELECT unnest(range(1, 11)) AS decile) d
  WHERE 10 * (cum - c) < d.decile * n AND d.decile * n <= 10 * cum
),
dv AS (SELECT n_chars AS v, count(*) AS c FROM documents GROUP BY 1),
gl AS (
  SELECT v, c, sum(c) OVER (ORDER BY v
    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
  FROM dv
),
tot AS (SELECT sum(c) AS nt FROM dv),
gq AS (
  SELECT d.decile, v AS glob_hi
  FROM gl CROSS JOIN tot
       CROSS JOIN (SELECT unnest(range(1, 11)) AS decile) d
  WHERE 10 * (cum - c) < d.decile * nt AND d.decile * nt <= 10 * cum
)
SELECT src.grp AS source, CAST(src.decile AS BIGINT) AS decile,
       CAST(src.n AS BIGINT) AS n_rows,
       CAST(src.src_hi AS BIGINT) AS src_hi,
       CAST(gq.glob_hi AS BIGINT) AS glob_hi
FROM src JOIN gq ON gq.decile = src.decile
ORDER BY source, decile
"""




def q_graph_scc(spark, sf_dir):
    """Strongly connected components of the directed fixture graph with
    the in_region edges ALSO reversed (region→nation), which fuses each
    region with its nations into one directed cycle — so the gate
    exercises real multi-node SCCs plus thousands of singleton
    customers/parts/suppliers hanging off them.  The oracle computes
    exact mutual reachability by transitive closure (set semantics)."""
    from .operators.graph_algos import strongly_connected_components

    g = _fixture(spark, sf_dir)
    base = g.edges.select(
        "src_key",
        "dst_key",
        F.get_json_object("details", "$.rel").alias("rel"),
    )
    keep = base.where(F.col("rel") != "ordered").select("src_key", "dst_key")
    rev = base.where(F.col("rel") == "in_region").select(
        F.col("dst_key").alias("src_key"), F.col("src_key").alias("dst_key")
    )
    # one JSON-parse pass, materialized: the operator derives its node
    # set (two scans) and filtered edge set (one more) from this input —
    # uncut, each scan re-parses `details` over the full cached edge
    # table (six parse passes measured; this was ~80 % of the query)
    return strongly_connected_components(
        cut_lineage(keep.unionByName(rev)), max_outer=4
    ).orderBy("key")


O_GRAPH_SCC = """
WITH RECURSIVE e AS (
  SELECT 'customer:' || c_custkey AS a, 'nation:' || c_nationkey AS b FROM customer
  UNION ALL SELECT 'supplier:' || s_suppkey, 'nation:' || s_nationkey FROM supplier
  UNION ALL SELECT 'nation:' || n_nationkey, 'region:' || n_regionkey FROM nation
  UNION ALL SELECT DISTINCT 'part:' || l_partkey, 'supplier:' || l_suppkey FROM lineitem
  UNION ALL SELECT 'region:' || n_regionkey, 'nation:' || n_nationkey FROM nation
),
r(a, b) AS (
  SELECT a, b FROM e WHERE a <> b
  UNION
  SELECT r.a, e.b FROM r JOIN e ON e.a = r.b WHERE r.a <> e.b
),
nodes AS (SELECT a AS k FROM e UNION SELECT b FROM e),
mutual AS (
  SELECT r1.a AS k, r1.b AS m FROM r r1 JOIN r r2 ON r1.a = r2.b AND r1.b = r2.a
)
SELECT n.k AS key,
       least(n.k, coalesce(min(mutual.m), n.k)) AS scc
FROM nodes n LEFT JOIN mutual ON mutual.k = n.k
GROUP BY n.k ORDER BY key
"""




def q_evt_attribution(spark, sf_dir):
    """Last-touch attribution of purchase revenue to the user's most
    recent click/view within 72 h ('direct' if none) — one per-user
    carry-forward window over the (ts, is_conv, event_id) total order,
    no self-join; integer cents."""
    from .operators.behavior import attribution_last_touch

    return attribution_last_touch(
        _t(spark, sf_dir, "events"),
        "user_id", "ts", "event_id", "event_type", "value",
        conversion_type="purchase", touch_types=("click", "view"),
        window_hours=72,
    )


O_EVT_ATTRIBUTION = """
WITH base AS (
  SELECT user_id AS u, ts, event_id AS eid, event_type AS t,
         CASE WHEN event_type = 'purchase'
              THEN CAST(round(value * 100) AS BIGINT) END AS cents,
         CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END AS is_conv
  FROM events WHERE event_type IN ('purchase', 'click', 'view')
),
c AS (
  SELECT *,
         last_value(CASE WHEN is_conv = 0 THEN t END IGNORE NULLS)
           OVER w AS tt,
         last_value(CASE WHEN is_conv = 0 THEN ts END IGNORE NULLS)
           OVER w AS tts
  FROM base
  WINDOW w AS (PARTITION BY u ORDER BY ts, is_conv, eid
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
)
SELECT CASE WHEN tts >= ts - INTERVAL 72 HOUR THEN tt
            ELSE 'direct' END AS channel,
       CAST(count(*) AS BIGINT) AS n_conversions,
       CAST(sum(cents) AS BIGINT) AS cents
FROM c WHERE is_conv = 1 GROUP BY 1 ORDER BY channel
"""


def q_io_csv_quarantine(spark, sf_dir):
    """Untrusted-feed ingestion: write a CSV feed with three planted
    malformed lines, read it back PERMISSIVE with a corrupt-record
    quarantine column, and report clean/corrupt counts plus the clean
    aggregate — malformed rows never fail the job and never silently
    null into the aggregate."""
    from .sources import io

    path = f"{_IO_ROOT}/csvq-{os.path.basename(sf_dir.rstrip('/'))}"
    docs = _t(spark, sf_dir, "documents").where(F.col("doc_id") < 200)
    lines = docs.select(
        F.concat_ws(
            ",", F.col("doc_id"), F.col("source"), F.col("n_chars")
        ).alias("value")
    )
    planted = spark.createDataFrame(
        [
            ("oops,src0,12",),          # unparseable doc_id
            ("1,src0,5,extra,extra",),  # token overflow
            ("12 34,src9,x",),          # two bad fields
        ],
        "value string",
    )
    lines.unionByName(planted).write.mode("overwrite").text(path)
    back = io.read_csv_quarantine(
        spark, path, "doc_id bigint, source string, n_chars bigint"
    )
    return back.agg(
        F.sum(F.col("_bad").isNull().cast("long")).alias("n_clean"),
        F.sum(F.col("_bad").isNotNull().cast("long")).alias("n_corrupt"),
        F.sum(
            F.when(F.col("_bad").isNull(), F.col("n_chars")).otherwise(0)
        ).cast("long").alias("sum_chars_clean"),
    )


O_IO_CSV_QUARANTINE = """
SELECT CAST((SELECT count(*) FROM documents WHERE doc_id < 200) AS BIGINT)
         AS n_clean,
       CAST(3 AS BIGINT) AS n_corrupt,
       CAST((SELECT sum(n_chars) FROM documents WHERE doc_id < 200)
            AS BIGINT) AS sum_chars_clean
"""


# Planted JSONL corruption classes (each exercises a distinct verdict
# path of from_json; semantics pinned in tests/test_io_quarantine.py):
_JSONL_BAD = [
    "not json at all",                                    # unparseable
    '{"doc_id": 3, "source": "trunc"',                    # truncated
    '{"doc_id": "oops", "source": "x", "n_chars": 1}',    # string in bigint
    '{"doc_id": 4.5, "source": "y", "n_chars": 2}',       # float in bigint
    '{"doc_id": 7, "source": "z", "n_chars": [1, 2]}',    # array in bigint
    '{"doc_id": true, "source": "w", "n_chars": 3}',      # bool in bigint
]
# Clean-but-tricky plants: JSON int coerces into the string column;
# missing fields are clean nulls.  Blank lines are dropped by the reader.
_JSONL_TRICKY = [
    '{"doc_id": 9999991, "source": 42, "n_chars": 7}',
    '{"source": "only"}',
    "",
    "   ",
]


def q_io_jsonl_quarantine(spark, sf_dir):
    """Untrusted JSONL feed ingestion: write the corpus as JSON lines
    with six planted malformed lines (plus coercion/blank-line decoys),
    read back PERMISSIVE with a corrupt-record quarantine column, and
    report clean/corrupt counts, the clean aggregate, and an md5 over
    the SORTED corrupt raw lines — pinning not just how many lines were
    quarantined but WHICH ones."""
    from .sources import io

    path = f"{_IO_ROOT}/jsonlq-{os.path.basename(sf_dir.rstrip('/'))}"
    docs = _t(spark, sf_dir, "documents").where(F.col("doc_id") < 200)
    lines = docs.select(
        F.to_json(F.struct("doc_id", "source", "n_chars")).alias("value")
    )
    planted = spark.createDataFrame(
        [(x,) for x in _JSONL_BAD + _JSONL_TRICKY], "value string"
    )
    lines.unionByName(planted).write.mode("overwrite").text(path)
    back = io.read_jsonl_quarantine(
        spark, path, "doc_id bigint, source string, n_chars bigint"
    )
    return back.agg(
        F.sum(F.col("_bad").isNull().cast("long")).alias("n_clean"),
        F.sum(F.col("_bad").isNotNull().cast("long")).alias("n_corrupt"),
        F.sum(
            F.when(F.col("_bad").isNull(), F.col("n_chars")).otherwise(0)
        ).cast("long").alias("sum_chars_clean"),
        F.md5(
            F.concat_ws("\n", F.sort_array(F.collect_list("_bad")))
        ).alias("corrupt_md5"),
    )


def _jsonl_quarantine_oracle() -> str:
    vals = ", ".join("('" + x.replace("'", "''") + "')" for x in _JSONL_BAD)
    return f"""
WITH bad(l) AS (VALUES {vals})
SELECT CAST((SELECT count(*) + 2 FROM documents WHERE doc_id < 200)
            AS BIGINT) AS n_clean,
       CAST((SELECT count(*) FROM bad) AS BIGINT) AS n_corrupt,
       CAST((SELECT sum(n_chars) + 7 FROM documents WHERE doc_id < 200)
            AS BIGINT) AS sum_chars_clean,
       (SELECT md5(string_agg(l, chr(10) ORDER BY l)) FROM bad)
         AS corrupt_md5
"""


O_IO_JSONL_QUARANTINE = _jsonl_quarantine_oracle()


def q_io_schema_evolution(spark, sf_dir):
    """Schema-evolution ingestion: two parquet generations of the same
    feed — v1 lacks the quality column, v2 adds it — read back together
    with mergeSchema; v1 rows surface NULL quality (never a silent 0 or
    a read failure).  The aggregate value-checks the whole evolved
    read: per source, rows/chars from BOTH generations, quality stats
    from v2 only."""
    from .sources import io

    path = f"{_IO_ROOT}/evolve-{os.path.basename(sf_dir.rstrip('/'))}"
    docs = _t(spark, sf_dir, "documents")
    v1 = docs.where(F.col("doc_id") % 2 == 0).select(
        "doc_id", "source", "n_chars"
    )
    v2 = docs.where(F.col("doc_id") % 2 == 1).select(
        "doc_id", "source", "n_chars",
        (F.col("n_chars") % 100).cast("long").alias("quality"),
    )
    io.write_parquet(v1, f"{path}/gen=1")
    io.write_parquet(v2, f"{path}/gen=2")
    back = spark.read.option("mergeSchema", "true").parquet(
        f"{path}/gen=1", f"{path}/gen=2"
    )
    return (
        back.groupBy("source")
        .agg(
            F.count("*").cast("long").alias("n_rows"),
            F.sum("n_chars").cast("long").alias("sum_chars"),
            F.sum(F.col("quality").isNull().cast("long")).alias("n_no_quality"),
            F.sum("quality").cast("long").alias("sum_quality"),
        )
        .orderBy("source")
    )


O_IO_SCHEMA_EVOLUTION = """
SELECT source, CAST(count(*) AS BIGINT) AS n_rows,
       CAST(sum(n_chars) AS BIGINT) AS sum_chars,
       CAST(sum(CASE WHEN doc_id % 2 = 0 THEN 1 ELSE 0 END) AS BIGINT)
         AS n_no_quality,
       CAST(sum(CASE WHEN doc_id % 2 = 1 THEN n_chars % 100 END) AS BIGINT)
         AS sum_quality
FROM documents GROUP BY source ORDER BY source
"""


def q_stream_jsonl_quarantine(spark, sf_dir):
    """Streaming form of the JSONL quarantine: the same untrusted feed
    read via ``readStream.text`` → full-struct ``from_json`` (stateless,
    stream-legal) → append memory sink; malformed lines quarantine
    in-flight instead of killing the stream.  Same aggregate and the
    same oracle as the batch gate — a correct streaming ingest is
    indistinguishable from the batch read."""
    from .streaming.stream import run_to_memory

    path = f"{_IO_ROOT}/jsonlq-stream-{os.path.basename(sf_dir.rstrip('/'))}"
    docs = _t(spark, sf_dir, "documents").where(F.col("doc_id") < 200)
    lines = docs.select(
        F.to_json(F.struct("doc_id", "source", "n_chars")).alias("value")
    )
    planted = spark.createDataFrame(
        [(x,) for x in _JSONL_BAD + _JSONL_TRICKY], "value string"
    )
    lines.unionByName(planted).write.mode("overwrite").text(path)

    from .sources.io import jsonl_quarantine_frame

    src = spark.readStream.format("text").load(path)
    parsed = jsonl_quarantine_frame(
        src, "doc_id bigint, source string, n_chars bigint"
    )
    sink = run_to_memory(
        parsed, "stream_jsonlq_tbl", output_mode="append"
    )
    return sink.agg(
        F.sum(F.col("_bad").isNull().cast("long")).alias("n_clean"),
        F.sum(F.col("_bad").isNotNull().cast("long")).alias("n_corrupt"),
        F.sum(
            F.when(F.col("_bad").isNull(), F.col("n_chars")).otherwise(0)
        ).cast("long").alias("sum_chars_clean"),
        F.md5(
            F.concat_ws("\n", F.sort_array(F.collect_list("_bad")))
        ).alias("corrupt_md5"),
    )


O_STREAM_JSONL_QUARANTINE = O_IO_JSONL_QUARANTINE


def q_io_csv_multiline(spark, sf_dir):
    """Quoted-newline CSV round-trip: every third document gets its
    spaces rewritten to embedded newlines, the feed goes out through the
    CSV writer (which must quote them) and back through the multiLine
    reader (which must NOT split records at them).  The digest pins
    byte-exact text survival.  Note the scale trade-off this gate
    documents: multiLine CSV files are not splittable — one task per
    file — so embedded-newline feeds should be converted to parquet at
    the edge; this path exists for ingesting what others hand you."""
    from .sources import io

    path = f"{_IO_ROOT}/csvml-{os.path.basename(sf_dir.rstrip('/'))}"
    docs = _t(spark, sf_dir, "documents").where(F.col("doc_id") < 300)
    feed = docs.select(
        "doc_id",
        F.when(
            F.col("doc_id") % 3 == 0, F.regexp_replace("text", " ", "\n")
        ).otherwise(F.col("text")).alias("text"),
    )
    feed.write.mode("overwrite").option("header", True).csv(path)
    back = (
        spark.read.option("header", True)
        .option("multiLine", True)
        .schema("doc_id long, text string")
        .csv(path)
    )
    return back.agg(
        F.count("*").cast("long").alias("n_rows"),
        F.sum((F.length("text") - F.length(F.replace(F.col("text"), F.lit("\n"), F.lit("")))).cast("long")).alias("n_newlines"),
        F.md5(
            F.concat_ws(
                "",
                F.transform(
                    F.sort_array(F.collect_list(F.struct("doc_id", "text"))),
                    lambda x: x["text"],
                ),
            )
        ).alias("digest"),
    )


O_IO_CSV_MULTILINE = """
WITH feed AS (
  SELECT doc_id,
         CASE WHEN doc_id % 3 = 0 THEN replace(text, ' ', chr(10))
              ELSE text END AS text
  FROM documents WHERE doc_id < 300
)
SELECT CAST(count(*) AS BIGINT) AS n_rows,
       CAST(sum(length(text) - length(replace(text, chr(10), ''))) AS BIGINT)
         AS n_newlines,
       md5(string_agg(text, chr(30) ORDER BY doc_id)) AS digest
FROM feed
"""


EXT_REGISTRY: dict[str, tuple] = {
    "evt_ohlc": (q_evt_ohlc, O_EVT_OHLC),
    "evt_gapfill_locf": (q_evt_gapfill_locf, O_EVT_GAPFILL),
    "graph_adamic_adar": (q_graph_adamic_adar, O_GRAPH_ADAMIC_ADAR),
    "evt_anomaly_mad": (q_evt_anomaly_mad, O_EVT_ANOMALY_MAD),
    "graph_hits": (q_graph_hits, O_GRAPH_HITS),
    "agg_corr_regr": (q_agg_corr_regr, O_AGG_CORR),
    "win_percent_rank": (q_win_percent_rank, O_WIN_PERCENT_RANK),
    "join_bloom_prefilter": (q_join_bloom_prefilter, O_JOIN_BLOOM),
    "evt_rfm_segments": (q_evt_rfm_segments, O_EVT_RFM),
    "graph_bipartite_proj": (q_graph_bipartite_proj, O_GRAPH_BIPROJ),
    "agg_skew_kurtosis": (q_agg_skew_kurtosis, O_AGG_SKEWKURT),
    "win_first_last": (q_win_first_last, O_WIN_FIRST_LAST),
    "agg_q7_nation_volume": (q_agg_q7_nation_volume, O_AGG_Q7),
    "agg_q13_order_histogram": (q_agg_q13_order_histogram, O_AGG_Q13),
    "agg_q18_large_orders": (q_agg_q18_large_orders, O_AGG_Q18),
    "agg_q19_disjunctive_revenue": (q_agg_q19_disjunctive_revenue, O_AGG_Q19),
    "agg_q22_idle_rich": (q_agg_q22_idle_rich, O_AGG_Q22),
    "skew_salted_topn": (q_skew_salted_topn, O_SKEW_TOPN),
    "skew_salted_join": (q_skew_salted_join, O_SKEW_JOIN),
    "graph_sssp_weighted": (q_graph_sssp_weighted, O_GRAPH_SSSP),
    "graph_pagerank": (q_graph_pagerank, O_GRAPH_PAGERANK),
    "graph_lpa": (q_graph_lpa, O_GRAPH_LPA),
    "graph_neighbor_jaccard": (q_graph_neighbor_jaccard, O_GRAPH_NBR_JACCARD),
    "graph_betweenness": (q_graph_betweenness, O_GRAPH_BETWEENNESS),
    "stream_static_join": (q_stream_static_join, O_STREAM_STATIC),
    "stream_stream_join": (q_stream_stream_join, O_STREAM_STREAM),
    "evt_props_json": (q_evt_props_json, O_EVT_PROPS),
    "agg_distinct_2phase": (q_agg_distinct_2phase, O_DISTINCT_2PHASE),
    "s15_latest_versions": (q_s15_latest_versions, O_LATEST_VERSIONS),
    "agg_q10_returned_revenue": (q_agg_q10_returned_revenue, O_AGG_Q10),
    "agg_q12_priority_flags": (q_agg_q12_priority_flags, O_AGG_Q12),
    "evt_rollup_cascade": (q_evt_rollup_cascade, O_EVT_ROLLUP),
    "evt_funnel": (q_evt_funnel, O_EVT_FUNNEL),
    "evt_transitions": (q_evt_transitions, O_EVT_TRANSITIONS),
    "stream_stateful_counts": (q_stream_stateful_counts, O_STREAM_STATEFUL),
    "stream_user_profile": (q_stream_user_profile, O_STREAM_PROFILE),
    "stream_logtable_cdc": (q_stream_logtable_cdc, O_STREAM_LOGTABLE),
    "agg_above_segment_avg": (q_agg_above_segment_avg, O_ABOVE_SEG_AVG),
    "join_asof": (q_join_asof, O_JOIN_ASOF),
    "join_asof_tolerance": (q_join_asof_tolerance, O_JOIN_ASOF_TOL),
    "join_asof_nearest": (q_join_asof_nearest, O_JOIN_ASOF_NEAREST),
    "join_interval_overlap": (q_join_interval_overlap, O_JOIN_INTERVAL_OVERLAP),
    "join_range_bands": (q_join_range_bands, O_JOIN_RANGE),
    "graph_cc": (q_graph_cc, O_GRAPH_CC),
    "graph_triangles": (q_graph_triangles, O_GRAPH_TRIANGLES),
    "graph_kcore": (q_graph_kcore, O_GRAPH_KCORE),
    "graph_degree_stats": (q_graph_degree_stats, O_GRAPH_DEGREE),
    "stream_session_window": (q_stream_session_window, O_STREAM_SESSION),
    "evt_retention": (q_evt_retention, O_EVT_RETENTION),
    "s15_logtable_diff": (q_s15_logtable_diff, O_S15_LOGTABLE_DIFF),
    "evt_spikes": (q_evt_spikes, O_EVT_SPIKES),
    "evt_active_users_7d": (q_evt_active_users_7d, O_EVT_ACTIVE_USERS),
    "evt_stickiness": (q_evt_stickiness, O_EVT_STICKINESS),
    "evt_wau_hll": (q_evt_wau_hll, O_EVT_WAU_HLL),
    "stream_wau_hll": (q_stream_wau_hll, O_STREAM_WAU_HLL),
    "stream_cm_heavy": (q_stream_cm_heavy, O_STREAM_CM_HEAVY),
    "graph_bfs_levels": (q_graph_bfs_levels, O_GRAPH_BFS),
    "s9_geo_exact": (q_s9_geo_exact, O_S9),
    "j2_adjacency_details": (q_j2_adjacency_details, O_J2),
    "w5_time_probe": (q_w5_time_probe, O_W5),
    "p5_keytype_rawhex": (q_p5_keytype_rawhex, O_P5),
    "agg_q6_forecast_revenue": (q_agg_q6_forecast_revenue, O_AGG_Q6),
    "agg_cube": (q_agg_cube, O_AGG_CUBE),
    "agg_pivot": (q_agg_pivot, O_AGG_PIVOT),
    "win_ntile": (q_win_ntile, O_WIN_NTILE),
    "agg_count_distinct": (q_agg_count_distinct, O_AGG_CNTD),
    "win_running_sum": (q_win_running_sum, O_WIN_RUNNING),
    "win_frames": (q_win_frames, O_WIN_FRAMES),
    "agg_q4_order_priority": (q_agg_q4_order_priority, O_AGG_Q4),
    "agg_q14_promo_share": (q_agg_q14_promo_share, O_AGG_Q14),
    "sql_grouping_sets": (q_sql_grouping_sets, O_SQL_GSETS),
    "g2_dfs_path": (q_g2_dfs_path, O_G2),
    "stream_window_counts": (q_stream_window_counts, O_STREAM_WINDOW),
    "stream_dedup": (q_stream_dedup, O_STREAM_DEDUP),
    "evt_session_window": (q_evt_session_window, O_SESSION_WINDOW),
    "fn_registry_udf": (q_fn_registry_udf, O_FN_REGISTRY),
    "fn_password_hash": (q_fn_password_hash, O_FN_PASSWORD),
    "fn_scalar_surface": (q_fn_scalar_surface, O_FN_SCALARS),
    "io_orc_roundtrip": (q_io_orc_roundtrip, _IO_DIGEST_ORACLE),
    "evt_changepoint": (q_evt_changepoint, O_EVT_CHANGEPOINT),
    "evt_funnel_steps": (q_evt_funnel_steps, O_EVT_FUNNEL_STEPS),
    "evt_cohort_ltv": (q_evt_cohort_ltv, O_EVT_COHORT_LTV),
    "stream_ohlc": (q_stream_ohlc, O_STREAM_OHLC),
    "graph_walks": (q_graph_walks, O_GRAPH_WALKS),
    "evt_ewma": (q_evt_ewma, O_EVT_EWMA),
    "evt_holt": (q_evt_holt, O_EVT_HOLT),
    "evt_holt_winters": (q_evt_holt_winters, O_EVT_HOLT_WINTERS),
    "evt_forecast_mae": (q_evt_forecast_mae, O_EVT_FORECAST_MAE),
    "evt_survival_km": (q_evt_survival_km, O_EVT_SURVIVAL_KM),
    "evt_markov_stationary": (q_evt_markov_stationary, O_EVT_MARKOV),
    "evt_rate_wilson": (q_evt_rate_wilson, O_EVT_RATE_WILSON),
    "evt_hill_alpha": (q_evt_hill_alpha, O_EVT_HILL),
    "evt_ab_test": (q_evt_ab_test, O_EVT_AB_TEST),
    "graph_modularity": (q_graph_modularity, O_GRAPH_MODULARITY),
    "graph_harmonic": (q_graph_harmonic, O_GRAPH_HARMONIC),
    "win_time_range": (q_win_time_range, O_WIN_TIME_RANGE),
    "io_partition_prune": (q_io_partition_prune, O_IO_PARTITION_PRUNE),
    "agg_listagg": (q_agg_listagg, O_AGG_LISTAGG),
    "io_csv_roundtrip": (q_io_csv_roundtrip, _IO_DIGEST_ORACLE),
    "io_json_roundtrip": (q_io_json_roundtrip, _IO_DIGEST_ORACLE),
    "io_parquet_roundtrip": (q_io_parquet_roundtrip, _IO_DIGEST_ORACLE),
    "io_framedbin_roundtrip": (q_io_framedbin_roundtrip, _IO_DIGEST_ORACLE),
    "s15_upsert_version": (q_s15_upsert_version, O_S15_UPSERT),
    "s15_logtable_persisted": (q_s15_logtable_persisted, O_S15_LOGTABLE),
    "s15_logtable_asof": (q_s15_logtable_asof, O_S15_LOGTABLE_ASOF),
    "s15_logtable_compact": (q_s15_logtable_compact, O_S15_LOGTABLE_COMPACT),
    "s18_delete_nodes": (q_s18_delete_nodes, O_S18_DELETE),
    "reindex_status": (q_reindex_status, O_REINDEX_STATUS),
    "evt_seasonal_dow": (q_evt_seasonal_dow, O_EVT_SEASONAL_DOW),
    "evt_lag_corr": (q_evt_lag_corr, O_EVT_LAG_CORR),
    "profile_benford": (q_profile_benford, O_PROFILE_BENFORD),
    "profile_expectations": (q_profile_expectations, O_PROFILE_EXPECTATIONS),
    "graph_ppr": (q_graph_ppr, O_GRAPH_PPR),
    "clean_quantile_norm": (q_clean_quantile_norm, O_CLEAN_QUANTILE_NORM),
    "graph_scc": (q_graph_scc, O_GRAPH_SCC),
    "evt_attribution": (q_evt_attribution, O_EVT_ATTRIBUTION),
    "io_csv_quarantine": (q_io_csv_quarantine, O_IO_CSV_QUARANTINE),
    "io_jsonl_quarantine": (q_io_jsonl_quarantine, O_IO_JSONL_QUARANTINE),
    "io_schema_evolution": (q_io_schema_evolution, O_IO_SCHEMA_EVOLUTION),
    "io_csv_multiline": (q_io_csv_multiline, O_IO_CSV_MULTILINE),
    "stream_jsonl_quarantine": (q_stream_jsonl_quarantine, O_STREAM_JSONL_QUARANTINE),
}
