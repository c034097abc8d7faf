"""Point/batch/paged/time-range scans over vertices and edges.

Maps SURVEY.md §2.1 S1-S6, S11 and §2.5 W1-W5 onto DataFrame primitives.
The reference's shard routing (low 11 bits of the id → 1 of 2048 tables,
src/egraph_shard_util.erl:60-70) becomes hash-bucket pruning; its ≤500-key
`IN (...)` batching (models/egraph_detail_model.erl:306-332) becomes a
broadcast semi-join.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, functions as F

from ..ingest import node_id


def point_lookup(vertices: DataFrame, key: str) -> DataFrame:
    """S1 — GET /detail/:id (models/egraph_detail_model.erl:103-124).

    Filters on the hashed id (as the reference does) so a bucketed store
    prunes to one bucket; the key column is only carried for output.
    """
    return vertices.where(F.col("id") == node_id(F.lit(key)))


def multi_get(vertices: DataFrame, keys: Sequence[str]) -> DataFrame:
    """S2 — batch multi-get (models/egraph_detail_model.erl:306-332).

    A literal id array + broadcast semi-join replaces per-shard IN-lists.
    For huge key sets callers pass a DataFrame to :func:`multi_get_df`.
    """
    ids = [F.xxhash64(F.lit(k)) for k in keys]
    return vertices.where(F.col("id").isin(*[i for i in ids]) if ids else F.lit(False))


def multi_get_df(vertices: DataFrame, keys_df: DataFrame) -> DataFrame:
    """S2 at scale: semi-join against a key DataFrame (column ``key``)."""
    ids = keys_df.select(node_id("key").alias("id"))
    return vertices.join(ids.hint("broadcast"), on="id", how="left_semi")


def full_scan_page(
    vertices: DataFrame, limit: int, offset: int = 0, kind: str | None = None
) -> DataFrame:
    """S3 — paged full scan (models/egraph_detail_model.erl:371-388).

    The reference pages per-shard with LIMIT/OFFSET and no global order; we
    impose a deterministic total order on ``key`` so pages are stable (and
    testable).  OFFSET+LIMIT forces a single-partition tail at scale — fine
    for interactive paging, not for bulk export (use ordered writes there).
    """
    df = vertices if kind is None else vertices.where(F.col("kind") == kind)
    return df.orderBy("key").offset(offset).limit(limit)


def time_range_scan(
    vertices: DataFrame,
    start,
    end,
    ascending: bool = True,
    limit: int | None = None,
) -> DataFrame:
    """S4 — window over updated_at (models/egraph_detail_model.erl:334-369).

    Inclusive bounds, ordered either way, soft limit — matching the
    reference's prev/next paging probe (:693-718).
    """
    df = vertices.where(F.col("updated_at").between(F.lit(start), F.lit(end)))
    order = F.col("updated_at").asc() if ascending else F.col("updated_at").desc()
    df = df.orderBy(order, F.col("key"))
    return df.limit(limit) if limit is not None else df


def out_edges(edges: DataFrame, src_key: str) -> DataFrame:
    """S5 — all out-edges of a node (models/egraph_link_model.erl:267-276)."""
    return edges.where(F.col("src") == node_id(F.lit(src_key)))


def edge_lookup(edges: DataFrame, src_key: str, dst_key: str) -> DataFrame:
    """S6 — (source, destination) exact (models/egraph_link_model.erl:289-297)."""
    return edges.where(
        (F.col("src") == node_id(F.lit(src_key)))
        & (F.col("dst") == node_id(F.lit(dst_key)))
    )


def index_dump(
    indexes: DataFrame, index_name: str, limit: int | None = None, offset: int = 0
) -> DataFrame:
    """S11 — full dump of one index (models/egraph_index_model.erl:388-411)."""
    df = indexes.where(F.col("index_name") == index_name).orderBy("id")
    df = df.offset(offset) if offset else df
    return df.limit(limit) if limit is not None else df
