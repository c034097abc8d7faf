"""Query-IR validation — the reference's JSON query language, checked.

The reference's IR is the JSON map itself, pattern-matched directly
(models/egraph_v1_search_model.erl:177-201); malformed queries surface as
Erlang function-clause crashes.  Here the IR is validated up front with
actionable errors, then compiled to a DataFrame plan by operators/search.py
(Catalyst handles everything downstream — SURVEY.md §4).

Grammar (examples/query.json; README.md:197-207):

    query      := { "type": "index", "conditions": conditions,
                    "filters": [filter*]?, "selected_paths": {name: path}? }
    conditions := { "any": [condition+] }            # OR-union
    condition  := { "key": scalar | [lo, hi] | geojson_point,
                    "key_type": "int"|"double"|"text"|"date"|"datetime"|"geo",
                    "index_name": str, "distance_sphere": meters? }
    filter     := { "key": scalar | [lo, hi], "key_type": ...,
                    "index_json_path": [str+] }      # AND, on details
    path       := [str+]
"""

from __future__ import annotations

from typing import Any

KEY_TYPES = ("int", "double", "text", "date", "datetime", "geo")


class QueryIRError(ValueError):
    """Malformed query IR (the reference would crash; we explain)."""


def _check_condition(cond: Any, i: int) -> None:
    if not isinstance(cond, dict):
        raise QueryIRError(f"conditions.any[{i}] must be an object")
    for field in ("key", "key_type", "index_name"):
        if field not in cond:
            raise QueryIRError(f"conditions.any[{i}] missing '{field}'")
    kt = cond["key_type"]
    if kt not in KEY_TYPES:
        raise QueryIRError(
            f"conditions.any[{i}].key_type {kt!r} not one of {KEY_TYPES}"
        )
    key = cond["key"]
    if kt == "geo":
        if not (isinstance(key, dict) and key.get("type") == "Point"
                and isinstance(key.get("coordinates"), (list, tuple))
                and len(key["coordinates"]) == 2):
            raise QueryIRError(
                f"conditions.any[{i}]: geo key must be a GeoJSON Point"
            )
    elif isinstance(key, (list, tuple)) and len(key) != 2:
        raise QueryIRError(
            f"conditions.any[{i}]: range key must be [start, end]"
        )
    if "distance_sphere" in cond and kt != "geo":
        raise QueryIRError(
            f"conditions.any[{i}]: distance_sphere requires key_type geo"
        )


def validate(query: dict) -> dict:
    """Validate the IR; returns it unchanged so callers can chain."""
    if not isinstance(query, dict):
        raise QueryIRError("query must be an object")
    if query.get("type", "index") != "index":
        raise QueryIRError(f"unsupported query type {query.get('type')!r}")
    conds = query.get("conditions")
    if not isinstance(conds, dict) or not conds.get("any"):
        raise QueryIRError("conditions.any must be a non-empty list")
    for i, cond in enumerate(conds["any"]):
        _check_condition(cond, i)
    for i, flt in enumerate(query.get("filters") or []):
        if not isinstance(flt, dict) or "index_json_path" not in flt:
            raise QueryIRError(f"filters[{i}] missing 'index_json_path'")
        if flt.get("key_type") not in KEY_TYPES:
            raise QueryIRError(f"filters[{i}].key_type invalid")
        path = flt["index_json_path"]
        if not (isinstance(path, (list, tuple)) and path
                and all(isinstance(p, str) for p in path)):
            raise QueryIRError(f"filters[{i}].index_json_path must be [str+]")
    sp = query.get("selected_paths")
    if sp is not None:
        if not isinstance(sp, dict):
            raise QueryIRError("selected_paths must be an object")
        for name, path in sp.items():
            if not (isinstance(path, (list, tuple)) and path):
                raise QueryIRError(f"selected_paths[{name!r}] must be [str+]")
    return query
