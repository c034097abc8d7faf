"""Traversal operators over the derived TPC-H graph fixture."""

from pyspark.sql import functions as F

from egraphdb_spark.operators.traversal import bfs_path, k_hop


def test_k_hop_levels(graph):
    got = k_hop(graph.edges, ["customer:7"], depth=2).collect()
    by_level = {}
    for r in got:
        by_level.setdefault(r["level"], set()).add(r["key"])
    # level 1: customer's nation + ordered parts
    nation_key = [k for k in by_level[1] if k.startswith("nation:")]
    assert len(nation_key) == 1
    assert any(k.startswith("part:") for k in by_level[1])
    # level 2: the nation's region + part suppliers
    assert any(k.startswith("region:") for k in by_level[2])
    assert any(k.startswith("supplier:") for k in by_level[2])


def test_bfs_path_valid(graph):
    # customer → nation → region exists via in_nation/in_region edges
    path = bfs_path(graph.edges, "customer:7", "region:0", max_depth=4)
    if path is None:
        # customer:7's nation may map to another region; find its true region
        row = (
            graph.edges.where(
                (F.col("src_key") == "customer:7") & F.col("dst_key").startswith("nation:")
            )
            .join(
                graph.edges.withColumnRenamed("src_key", "nk").withColumnRenamed(
                    "dst_key", "rk"
                ),
                F.col("dst_key") == F.col("nk"),
            )
            .select("rk")
            .head()
        )
        path = bfs_path(graph.edges, "customer:7", row["rk"], max_depth=4)
    assert path is not None
    assert path[0] == "customer:7"
    # every consecutive pair must be a real edge
    edge_set = {
        (r["src_key"], r["dst_key"])
        for r in graph.edges.select("src_key", "dst_key").collect()
    }
    for a, b in zip(path, path[1:]):
        assert (a, b) in edge_set, f"({a},{b}) not an edge"


def test_bfs_no_path_returns_none(graph):
    # regions have no out-edges → nothing reachable from a region
    assert bfs_path(graph.edges, "region:0", "customer:7", max_depth=3) is None
