"""Property-based tests (SURVEY.md §5 strategy (c) — the reference's
unfulfilled `proper` intent): round-trip ingest→index→search, and
traversal-closure laws.  Bounded example counts keep Spark wall-time sane;
each example is a full distributed round trip.
"""

from __future__ import annotations

import json

from hypothesis import HealthCheck, given, settings, strategies as st
from pyspark.sql import functions as F

from egraphdb_spark.ingest import build_indexes, make_vertices
from egraphdb_spark.operators.search import search

_SETTINGS = dict(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture, HealthCheck.too_slow],
)

# JSON-scalar values per key_type, chosen to exercise the inference table
_VALUES = st.one_of(
    st.integers(min_value=-(2**40), max_value=2**40),
    st.floats(min_value=-1e6, max_value=1e6, allow_nan=False).filter(
        lambda x: x != int(x)  # keep it a JSON float, not an int in disguise
    ),
    st.text(
        alphabet="abcdefghijklmnopqrstuvwxyzABCXYZ0123456789 _-",
        min_size=1,
        max_size=12,
    ).filter(lambda s: s.strip() and not s.strip().lstrip("-").isdigit()),
)


def _mk_vertices(spark, docs: list[tuple[str, dict, list[str]]]):
    rows = [
        (key, json.dumps(details), [[p] for p in paths])
        for key, details, paths in docs
    ]
    df = spark.createDataFrame(
        rows, "key string, details string, index_paths array<array<string>>"
    ).withColumn("lowercase_index_paths", F.array().cast("array<array<string>>"))
    return make_vertices(df)


@given(
    values=st.lists(_VALUES, min_size=1, max_size=6, unique_by=lambda v: str(v)),
    probe_idx=st.integers(min_value=0),
)
@settings(**_SETTINGS)
def test_search_returns_exactly_declaring_nodes(spark, values, probe_idx):
    """Every ingested value is findable; only declaring nodes match."""
    probe = values[probe_idx % len(values)]
    docs = [(f"n{i}", {"f": v}, ["f"]) for i, v in enumerate(values)]
    # one extra node with the SAME value but no declared index — must not match
    docs.append(("shadow", {"f": probe}, []))
    v = _mk_vertices(spark, docs)
    idx = build_indexes(v)
    if isinstance(probe, int):
        kt = "int"
    elif isinstance(probe, float):
        kt = "double"
    else:
        kt = "text"
    got = search(
        v,
        idx,
        {
            "type": "index",
            "conditions": {"any": [{"key": probe, "key_type": kt, "index_name": "f"}]},
            "selected_paths": {"k": ["__key"]},
        },
    ).collect()
    want = {f"n{i}" for i, val in enumerate(values) if val == probe}
    assert {r["k"] for r in got} == want


@given(
    n=st.integers(min_value=2, max_value=7),
    extra=st.integers(min_value=0, max_value=5),
)
@settings(**_SETTINGS)
def test_khop_chain_levels(spark, n, extra):
    """On a directed chain v0→v1→…→vn, k_hop(v0, depth) returns exactly one
    node per level: level i ↦ v_i (traversal closure law)."""
    from egraphdb_spark.operators.traversal import k_hop

    pairs = [(f"v{i}", f"v{i+1}", "{}") for i in range(n)]
    edges_df = spark.createDataFrame(
        pairs, "src_key string, dst_key string, details string"
    )
    from egraphdb_spark.ingest import make_edges

    e = make_edges(edges_df)
    depth = min(n, 1 + extra)
    got = sorted((r["level"], r["key"]) for r in k_hop(e, ["v0"], depth).collect())
    assert got == [(i, f"v{i}") for i in range(1, depth + 1)]


# ----------------------------------------------------------- framedbin codec


@given(
    payloads=st.lists(st.binary(min_size=0, max_size=2000), min_size=0, max_size=50)
)
@settings(max_examples=50, deadline=None)
def test_frame_codec_roundtrip_property(payloads):
    """write_frames → read_frames is the identity for any payload list
    within the 16-bit frame cap (pure Python — no Spark per example)."""
    import io as pyio

    from egraphdb_spark.sources.framedbin import read_frames, write_frames

    buf = pyio.BytesIO()
    n = write_frames(buf, iter(payloads))
    assert n == len(payloads)
    buf.seek(0)
    assert list(read_frames(buf)) == payloads


# ----------------------------------------------------------- F14 uuid/id laws


@given(
    ts=st.integers(min_value=0, max_value=(1 << 60) - 1),
    crc=st.integers(min_value=0, max_value=(1 << 32) - 1),
    sched=st.integers(min_value=0, max_value=255),
    data=st.integers(min_value=0, max_value=(1 << 24) - 1),
)
@settings(max_examples=6, deadline=None, suppress_health_check=[HealthCheck.function_scoped_fixture, HealthCheck.too_slow])
def test_custom_uuid_roundtrip_property(spark, ts, crc, sched, data):
    """mint→parse recovers the full 60-bit timestamp; the uuid is 32 hex
    chars with the version nibble 'f' at position 13 (egraph_util.erl
    packs 0xF | T1 there); custom_id is time-sortable."""
    from egraphdb_spark.functions import scalars

    df = spark.createDataFrame(
        [(ts, crc, sched, data)], "ts long, crc long, sched long, data long"
    )
    row = df.select(
        scalars.custom_uuid("ts", "crc", "sched", "data").alias("u"),
        scalars.uuid_tsmicro(scalars.custom_uuid("ts", "crc", "sched", "data")).alias("t"),
        scalars.id_tsmicro(scalars.custom_id("ts", "sched")).alias("t2"),
    ).collect()[0]
    assert len(row["u"]) == 32 and row["u"][12] == "f"
    assert row["t"] == ts
    assert row["t2"] == ts


# ---------------------------------------------------------------------------
# Round-4 pipeline operators vs pure-Python references on random corpora
# ---------------------------------------------------------------------------

_DOC_TEXT = st.text(
    alphabet="ab c\tdef  gh\n", min_size=0, max_size=40
)


@given(texts=st.lists(_DOC_TEXT, min_size=1, max_size=6))
@settings(**_SETTINGS)
def test_bpe_pair_counts_matches_python_reference(spark, texts):
    import re
    from collections import Counter

    from egraphdb_spark.operators import text as text_ops

    docs = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )
    got = {
        r["pair"]: r["n"]
        for r in text_ops.bpe_pair_counts(docs, "text", top_n=1000).collect()
    }

    words = Counter()
    for t in texts:
        words.update(re.findall(r"[a-z]+|[0-9]+|[^a-z0-9\s]", t.lower()))
    ref = Counter()
    for w, c in words.items():
        for i in range(len(w) - 1):
            ref[w[i : i + 2]] += c
    assert got == dict(ref)


@given(texts=st.lists(_DOC_TEXT, min_size=1, max_size=5))
@settings(**_SETTINGS)
def test_shingles_match_python_reference(spark, texts):
    import re

    from egraphdb_spark.operators import dedup

    docs = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )
    got = {}
    for r in dedup.shingle_table(docs, "doc_id", "text").collect():
        got.setdefault(r["id"], set()).add(r["shingle"])

    n = dedup.SHINGLE_LEN
    ref = {}
    for i, t in enumerate(texts):
        norm = re.sub(r"\s+", " ", t.strip().lower())
        s = {norm[j : j + n] for j in range(len(norm) - n + 1)} if len(norm) >= n else set()
        if s:
            ref[i] = s
    assert got == ref


@given(
    ids=st.lists(st.integers(min_value=0, max_value=10**6), min_size=1, max_size=30, unique=True),
    n_shards=st.integers(min_value=1, max_value=7),
)
@settings(**_SETTINGS)
def test_shard_manifest_matches_python_reference(spark, ids, n_shards):
    import hashlib

    from egraphdb_spark.operators.packing import shard_manifest

    df = spark.createDataFrame(
        [(i, i % 13 + 1) for i in ids], "doc_id long, n_tokens long"
    )
    got = {
        r["shard_id"]: (r["n_docs"], r["n_tokens"], r["min_id"], r["max_id"])
        for r in shard_manifest(df, "doc_id", "n_tokens", n_shards).collect()
    }

    ref = {}
    for i in ids:
        u = int(hashlib.md5(f"shard:{i}".encode()).hexdigest()[:15], 16)
        s = u % n_shards
        d = ref.setdefault(s, [0, 0, None, None])
        d[0] += 1
        d[1] += i % 13 + 1
        d[2] = i if d[2] is None else min(d[2], i)
        d[3] = i if d[3] is None else max(d[3], i)
    assert got == {k: tuple(v) for k, v in ref.items()}


@given(texts=st.lists(_DOC_TEXT, min_size=1, max_size=8))
@settings(**_SETTINGS)
def test_token_count_matches_python_split(spark, texts):
    """tokens()/token_count == str.split() semantics (drop boundary
    empties) for any ASCII-whitespace mess."""
    from egraphdb_spark.operators import text as text_ops

    docs = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )
    got = {
        r["doc_id"]: (r["n"], r["toks"])
        for r in docs.select(
            "doc_id",
            text_ops.token_count("text").alias("n"),
            text_ops.tokens(F.col("text")).alias("toks"),
        ).collect()
    }
    for i, t in enumerate(texts):
        assert got[i] == (len(t.split()), t.split()), repr(t)


# ---------------------------------------------------------------------------
# Graph algorithms vs pure-Python references on random graphs
# (self-loops, duplicate edges, isolated subgraphs, multi-edges)
# ---------------------------------------------------------------------------

_RAND_EDGE = st.tuples(
    st.integers(min_value=0, max_value=7), st.integers(min_value=0, max_value=7)
)


def _kv(i: int) -> str:
    return f"n:{i}"


@given(pairs=st.lists(_RAND_EDGE, min_size=1, max_size=20))
@settings(**_SETTINGS)
def test_connected_components_matches_union_find(spark, pairs):
    from pyspark.sql import functions as F

    from egraphdb_spark.operators.graph_algos import connected_components

    edges = spark.createDataFrame(
        [(_kv(a), _kv(b)) for a, b in pairs], "src_key string, dst_key string"
    ).select("src_key", "dst_key", F.lit("{}").alias("details"))
    got = {
        r["key"]: r["component"]
        for r in connected_components(edges, max_iter=30).collect()
    }

    # union-find reference (undirected semantics, min-key representative)
    parent = {}

    def find(x):
        while parent.setdefault(x, x) != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in pairs:
        ra, rb = find(_kv(a)), find(_kv(b))
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    ref = {}
    for a, b in pairs:
        for n in (_kv(a), _kv(b)):
            ref[n] = find(n)
    # canonicalize: representative = min member of each class
    groups = {}
    for n, r in ref.items():
        groups.setdefault(find(r), set()).add(n)
    ref = {n: min(g) for g in groups.values() for n in g}
    assert got == ref


@given(pairs=st.lists(_RAND_EDGE, min_size=1, max_size=20))
@settings(**_SETTINGS)
def test_bfs_levels_matches_python_bfs(spark, pairs):
    from collections import deque

    from pyspark.sql import functions as F

    from egraphdb_spark.operators.graph_algos import bfs_levels

    src = _kv(pairs[0][0])
    edges = spark.createDataFrame(
        [(_kv(a), _kv(b)) for a, b in pairs], "src_key string, dst_key string"
    ).select("src_key", "dst_key", F.lit("{}").alias("details"))
    got = {r["key"]: r["level"] for r in bfs_levels(edges, src, max_depth=10).collect()}

    adj = {}
    for a, b in pairs:
        adj.setdefault(_kv(a), set()).add(_kv(b))  # directed, as implemented
    ref = {src: 0}
    q = deque([src])
    while q:
        u = q.popleft()
        if ref[u] >= 10:
            continue
        for v in adj.get(u, ()):
            if v not in ref:
                ref[v] = ref[u] + 1
                q.append(v)
    assert got == ref


@given(pairs=st.lists(_RAND_EDGE, min_size=1, max_size=20), k=st.integers(2, 3))
@settings(**_SETTINGS)
def test_kcore_matches_python_peel(spark, pairs, k):
    from pyspark.sql import functions as F

    from egraphdb_spark.operators.graph_algos import kcore_peel

    edges = spark.createDataFrame(
        [(_kv(a), _kv(b)) for a, b in pairs], "src_key string, dst_key string"
    ).select(
        F.xxhash64("src_key").alias("src"),
        F.xxhash64("dst_key").alias("dst"),
        "src_key",
        "dst_key",
    )
    rounds = 8
    got = {r["key"]: r["degree"] for r in kcore_peel(edges, k=k, rounds=rounds).collect()}

    # python peel on the undirected distinct edge set, same fixed rounds
    und = {frozenset((_kv(a), _kv(b))) for a, b in pairs if a != b}
    # self-loops: Spark's undirected distinct (a,b)+(b,a) keeps (x,x) once
    loops = {_kv(a) for a, b in pairs if a == b}
    adj = {}
    for e in und:
        x, y = tuple(e)
        adj.setdefault(x, set()).add(y)
        adj.setdefault(y, set()).add(x)
    for x in loops:
        adj.setdefault(x, set()).add(x)
    nodes = set(adj)
    for _ in range(rounds):
        deg = {n: len(adj.get(n, set()) & nodes) for n in nodes}
        alive = {n for n in nodes if deg[n] >= k}
        if alive == nodes:
            break
        nodes = alive
    ref = {}
    for n in nodes:
        d = len(adj.get(n, set()) & nodes)
        if d > 0:
            ref[n] = d
    assert got == ref


@given(pairs=st.lists(_RAND_EDGE, min_size=1, max_size=20))
@settings(**_SETTINGS)
def test_pagerank_scaled_matches_python_fixed_point(spark, pairs):
    from pyspark.sql import functions as F

    from egraphdb_spark.operators.graph_algos import pagerank_scaled

    edges = spark.createDataFrame(
        [(_kv(a), _kv(b)) for a, b in pairs], "src_key string, dst_key string"
    ).select("src_key", "dst_key", F.lit("{}").alias("details"))
    got = {r["key"]: r["pr"] for r in pagerank_scaled(edges, iters=3).collect()}

    # integer fixed-point reference mirroring the operator exactly:
    # multi-edges contribute once per edge ROW, out-degree counts rows
    scale = 10**12
    nodes = sorted({_kv(a) for a, _ in pairs} | {_kv(b) for _, b in pairs})
    n = len(nodes)
    outdeg = {}
    for a, _ in pairs:
        outdeg[_kv(a)] = outdeg.get(_kv(a), 0) + 1
    base = (15 * scale) // (100 * n)
    pr = {k: scale // n for k in nodes}
    for _ in range(3):
        s = {}
        for a, b in pairs:
            s[_kv(b)] = s.get(_kv(b), 0) + pr[_kv(a)] // outdeg[_kv(a)]
        pr = {k: base + (85 * s.get(k, 0)) // 100 for k in nodes}
    assert got == pr
