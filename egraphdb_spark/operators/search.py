"""The generic index-search operator (`POST /v1/search` in the reference).

Query IR — the JSON map itself, exactly as the reference pattern-matches it
(models/egraph_v1_search_model.erl:177-201; examples/query.json):

    {
      "type": "index",
      "conditions": {
        "any": [ {"key": K | [lo, hi], "key_type": T, "index_name": N,
                  "distance_sphere": meters?}, ... ]     # OR-union
      },
      "filters":  [ {"key": K | [lo, hi], "key_type": T,
                     "index_json_path": [..]}, ... ],     # AND, on details
      "selected_paths": { "as_name": [json path], ... }   # projection
    }

Semantics reproduced 1:1 (SURVEY.md §3.1):
  * ``any`` conditions each scan the typed index and their id sets are
    unioned + deduped (src/egraph_api.erl:342-349)
  * matched ids are joined back to vertices (the reference's sharded batch
    multi-get becomes one equi-join; Catalyst/AQE picks broadcast when the
    id set is small)
  * ``filters`` AND-evaluate against the FULL details document, not the
    index (src/egraph_api.erl:366-385; SURVEY.md §7 risk 6) — ranges are
    inclusive on both ends
  * ``selected_paths`` projects JSON paths, missing → null
    (src/egraph_api.erl:241-246)

Scale shape: index scan prunes on index_name (partition pruning when the
index table is written partitioned by name) → small id set → broadcast
semi-join against vertices → codegen'd filter/project.  No Python row code.
"""

from __future__ import annotations

from typing import Any

from pyspark.sql import Column, DataFrame, functions as F

from ..functions.geo import haversine_m
from ..ingest import json_path_str
from ..schema import GEO_TYPE

_TYPE_COL = {
    "int": "v_int",
    "double": "v_double",
    "text": "v_text",
    "date": "v_date",
    "datetime": "v_ts",
    "geo": "v_geo",
}

_CAST = {
    "int": "long",
    "double": "double",
    "text": "string",
    "date": "date",
    "datetime": "timestamp",
}


def _typed_lit(value: Any, key_type: str) -> Column:
    return F.lit(value).cast(_CAST[key_type])


def index_condition_ids(indexes: DataFrame, cond: dict) -> DataFrame:
    """One `any` condition → DataFrame of matching node ids.

    Exact (models/egraph_index_model.erl:303-341), inclusive range
    (:310-316), geo-exact (:319-321) and geo distance_sphere (:322-328).
    """
    key = cond["key"]
    key_type = cond["key_type"]
    name = cond["index_name"]
    scoped = indexes.where(F.col("index_name") == name)
    if key_type == "geo":
        lon, lat = (float(c) for c in key["coordinates"])
        if "distance_sphere" in cond:
            from ..functions.geo import bbox_prefilter

            d = float(cond["distance_sphere"])
            dist = haversine_m(
                F.col("v_geo.coordinates")[0],
                F.col("v_geo.coordinates")[1],
                F.lit(lon),
                F.lit(lat),
            )
            # sargable bbox first (reaches stats/partition pruning), exact
            # haversine on the survivors — identical result set
            pred = bbox_prefilter(
                F.col("v_geo.coordinates")[0], F.col("v_geo.coordinates")[1], lon, lat, d
            ) & (dist <= d)
        else:
            pred = (F.col("v_geo.coordinates")[0] == lon) & (
                F.col("v_geo.coordinates")[1] == lat
            )
    else:
        vcol = F.col(_TYPE_COL[key_type])
        if isinstance(key, (list, tuple)):  # [start, end] → inclusive range
            pred = vcol.between(_typed_lit(key[0], key_type), _typed_lit(key[1], key_type))
        else:
            pred = vcol == _typed_lit(key, key_type)
    return scoped.where(pred).select("id")


def geo_knearest(
    indexes: DataFrame,
    index_name: str,
    lon: float,
    lat: float,
    k: int,
    radius_m: float | None = None,
    id_col: str = "id",
    order_round: int | None = None,
) -> DataFrame:
    """(id, dist_m) — the ``k`` geo-indexed nodes nearest to (lon, lat)
    by great-circle distance, ascending.

    The reference's geo scan orders by ``ST_Distance_Sphere`` with the
    same sphere constant (models/egraph_index_model.erl:361-367); this is
    the k-nearest completion of that surface — "5 closest warehouses to
    this point" — expressed as order-by + limit so Catalyst plans a
    TakeOrderedAndProject: each partition keeps its local top-k and only
    k rows per partition reach the final merge, never a global sort.

    Scale: ``index_name`` scoping rides partition pruning of the index
    store (one directory scanned).  For dense planets pass ``radius_m``
    — an upper bound on the k-th distance (from density stats or a prior
    coarse round) — and the sargable bbox prefilter reaches parquet
    min/max row-group skipping before any trig runs.  The bound is the
    caller's contract: a too-small radius honestly returns fewer than k.

    Ties at the k-th distance break by ``id_col`` (deterministic under
    any partitioning).  ``order_round`` quantizes the ORDERING distance
    to that many decimals first — pass it when an external consumer
    (oracle, report) orders by a rounded distance, so boundary rows at a
    rounding collision select identically on both sides; haversine's
    asin/cos are not in the correctly-rounded cross-engine trust base,
    which is why rounded comparisons are the portable form.
    """
    scoped = indexes.where(F.col("index_name") == index_name)
    glon = F.col("v_geo.coordinates")[0]
    glat = F.col("v_geo.coordinates")[1]
    if radius_m is not None:
        from ..functions.geo import bbox_prefilter

        scoped = scoped.where(bbox_prefilter(glon, glat, lon, lat, radius_m))
    dist = haversine_m(glon, glat, F.lit(float(lon)), F.lit(float(lat)))
    out = scoped.select(F.col(id_col).alias("id"), dist.alias("dist_m"))
    order = (
        F.round(F.col("dist_m"), int(order_round))
        if order_round is not None
        else F.col("dist_m")
    )
    return out.orderBy(order, F.col("id")).limit(int(k))


def search_ids(indexes: DataFrame, any_conditions: list[dict]) -> DataFrame:
    """OR-union of condition id sets, deduped (src/egraph_api.erl:342-349)."""
    out = None
    for cond in any_conditions:
        ids = index_condition_ids(indexes, cond)
        out = ids if out is None else out.unionByName(ids)
    if out is None:
        raise ValueError("conditions.any must be non-empty")
    return out.distinct()


def details_value(key_type: str, path: list[str]) -> Column:
    """Typed value of a JSON path read from the details document."""
    raw = F.get_json_object(F.col("details"), json_path_str(path))
    if key_type == "geo":
        return F.from_json(raw, GEO_TYPE)
    return raw.try_cast(_CAST[key_type])


def filter_predicate(flt: dict) -> Column:
    """One post-fetch filter → boolean Column (src/egraph_api.erl:366-385)."""
    key = flt["key"]
    key_type = flt["key_type"]
    path = flt["index_json_path"]
    val = details_value(key_type, path)
    if key_type == "geo":
        lon, lat = (float(c) for c in key["coordinates"])
        return (val["coordinates"][0] == lon) & (val["coordinates"][1] == lat)
    if isinstance(key, (list, tuple)):
        return val.between(_typed_lit(key[0], key_type), _typed_lit(key[1], key_type))
    return val == _typed_lit(key, key_type)


def apply_filters(df: DataFrame, filters: list[dict] | None) -> DataFrame:
    for flt in filters or []:
        path = tuple(flt.get("index_json_path", ()))
        if path in _INJECTED_PATHS and _INJECTED_PATHS[path] in df.columns:
            val = F.col(_INJECTED_PATHS[path])
            key = flt["key"]
            if isinstance(key, (list, tuple)):
                pred = val.between(F.lit(key[0]), F.lit(key[1]))
            else:
                pred = val == F.lit(key)
            df = df.where(pred)
        else:
            df = df.where(filter_predicate(flt))  # AND conjunction (P4)
    return df


# The reference injects these keys into every details document at write time
# (include/egraph_constants.hrl:142-147; detail_model.erl:182-189): `__key` on
# nodes, `__source`/`__destination` on links.  We keep them as engine columns
# instead of rewriting the user's JSON, and resolve the special paths here.
_INJECTED_PATHS = {
    ("__key",): "key",
    ("__source",): "src_key",
    ("__destination",): "dst_key",
}


def _path_value(df: DataFrame, path: list[str]) -> Column:
    special = _INJECTED_PATHS.get(tuple(path))
    if special is not None and special in df.columns:
        return F.col(special)
    return F.get_json_object(F.col("details"), json_path_str(path))


def project_selected_paths(
    df: DataFrame, selected_paths: dict[str, list[str]] | None
) -> DataFrame:
    """`selected_paths` projection; raw JSON values as strings, missing → null."""
    if not selected_paths:
        return df
    cols = [_path_value(df, path).alias(name) for name, path in selected_paths.items()]
    return df.select(*cols)


def search(vertices: DataFrame, indexes: DataFrame, query: dict) -> DataFrame:
    """Full `/v1/search` pipeline: any-union → semi-join → filters → project."""
    ids = search_ids(indexes, query["conditions"]["any"])
    matched = vertices.join(ids, on="id", how="left_semi")
    filtered = apply_filters(matched, query.get("filters"))
    return project_selected_paths(filtered, query.get("selected_paths"))
