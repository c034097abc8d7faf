"""S14/S17 — length-framed binary stream as a native Spark data source.

The reference streams query results as length-framed binary frames
(``<<Size:16/big, Payload/binary>>``, src/egraph_api.erl:276-325, framing
at :351-362) and ingests the same encoding as ``x-erlang-binary`` request
bodies (handlers/egraph_generic_handler.erl:184-213).  The payload there is
``term_to_binary(Row)`` — an Erlang-VM-specific encoding; this engine keeps
the wire framing bit-identical (2-byte big-endian length prefix, 64 KiB
frame cap) and carries the row as canonical UTF-8 JSON, the same row shape
the reference's JSON surface emits for identical queries.

Implemented with the PySpark 4 Python DataSource API rather than helper
functions, so the format participates in Spark's planner like any file
source::

    spark.dataSource.register(FramedBinaryDataSource)
    df.write.format("framedbin").mode("overwrite").save(path)
    spark.read.format("framedbin").schema(sch).load(path)

Scale design:

* **Write**: one ``part-*.fb`` file per upstream partition — no coalesce,
  all executors stream frames concurrently (the distributed analogue of the
  reference's single chunked HTTP socket).
* **Read**: one ``InputPartition`` per file, so parallelism equals the
  writing parallelism; a 1000-file dataset fans out to 1000 tasks.
* **Filter pushdown**: ``pushFilters`` accepts the comparison/null filters
  and evaluates them inside the Python reader, so filtered rows never cross
  the Python→JVM Arrow boundary.  Catalyst re-applies residuals, so
  accepting a filter is an optimization, never a correctness risk.
"""

from __future__ import annotations

import json
import os
import struct
import uuid
from dataclasses import dataclass
from typing import Iterator

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    DataSourceWriter,
    EqualTo,
    Filter,
    GreaterThan,
    GreaterThanOrEqual,
    InputPartition,
    IsNotNull,
    IsNull,
    LessThan,
    LessThanOrEqual,
    WriterCommitMessage,
)
from pyspark.sql.types import StructType

# Reference framing constants (src/egraph_api.erl:351-362): 2-byte length
# prefix, big-endian, so a frame payload is capped at 64 KiB - 1.
# ">H" packed inline (a precompiled struct.Struct instance is not
# cloudpickle-able, and register() ships this module by value)
_LEN_SIZE = 2
MAX_FRAME = 0xFFFF


def write_frames(fh, payloads: Iterator[bytes]) -> int:
    """Write length-framed payloads to a binary file handle; returns count."""
    n = 0
    for p in payloads:
        if len(p) > MAX_FRAME:
            raise ValueError(
                f"frame payload {len(p)} B exceeds the 16-bit length prefix "
                f"({MAX_FRAME} B) — the reference's framing limit"
            )
        fh.write(struct.pack(">H", len(p)))
        fh.write(p)
        n += 1
    return n


def read_frames(fh) -> Iterator[bytes]:
    """Yield framed payloads from a binary file handle; rejects truncation."""
    while True:
        head = fh.read(2)
        if not head:
            return
        if len(head) != 2:
            raise EOFError("truncated frame header")
        (size,) = struct.unpack(">H", head)
        payload = fh.read(size)
        if len(payload) != size:
            raise EOFError("truncated frame payload")
        yield payload


@dataclass
class _FilePartition(InputPartition):
    path: str


class _FramedReader(DataSourceReader):
    def __init__(self, schema: StructType, options: dict):
        self._schema = schema
        self._path = options.get("path")
        if not self._path:
            raise ValueError("framedbin requires a path")
        self._filters: list[Filter] = []

    def pushFilters(self, filters: list[Filter]) -> Iterator[Filter]:
        supported = (
            EqualTo,
            GreaterThan,
            GreaterThanOrEqual,
            LessThan,
            LessThanOrEqual,
            IsNull,
            IsNotNull,
        )
        for f in filters:
            col = getattr(f, "attribute", None)
            if isinstance(f, supported) and col is not None and len(col) == 1:
                self._filters.append(f)
            else:
                yield f  # residual — Catalyst re-applies it above the scan

    def partitions(self):
        return [
            _FilePartition(os.path.join(self._path, name))
            for name in sorted(os.listdir(self._path))
            if name.endswith(".fb")
        ]

    def _keep(self, rec: dict) -> bool:
        for f in self._filters:
            v = rec.get(f.attribute[0])
            if isinstance(f, IsNull):
                ok = v is None
            elif isinstance(f, IsNotNull):
                ok = v is not None
            elif v is None:
                ok = False
            elif isinstance(f, EqualTo):
                ok = v == f.value
            elif isinstance(f, GreaterThan):
                ok = v > f.value
            elif isinstance(f, GreaterThanOrEqual):
                ok = v >= f.value
            elif isinstance(f, LessThan):
                ok = v < f.value
            else:
                ok = v <= f.value
            if not ok:
                return False
        return True

    def read(self, partition: _FilePartition):
        names = self._schema.fieldNames()
        with open(partition.path, "rb") as fh:
            for payload in read_frames(fh):
                rec = json.loads(payload)
                if self._keep(rec):
                    yield tuple(rec.get(n) for n in names)


@dataclass
class _Committed(WriterCommitMessage):
    file: str
    rows: int


class _FramedWriter(DataSourceWriter):
    def __init__(self, schema: StructType, options: dict, overwrite: bool):
        self._names = schema.fieldNames()
        self._path = options.get("path")
        if not self._path:
            raise ValueError("framedbin requires a path")
        # Constructed on the driver before tasks launch: clearing prior
        # output here gives mode("overwrite") its usual semantics without
        # any task-side races.
        if overwrite and os.path.isdir(self._path):
            for name in os.listdir(self._path):
                if name.endswith(".fb") or name.endswith(".tmp"):
                    os.remove(os.path.join(self._path, name))

    def write(self, rows) -> _Committed:
        os.makedirs(self._path, exist_ok=True)
        name = f"part-{uuid.uuid4().hex}.fb"
        tmp = os.path.join(self._path, f".{name}.tmp")
        payloads = (
            json.dumps(
                dict(zip(self._names, tuple(row))), separators=(",", ":")
            ).encode("utf-8")
            for row in rows
        )
        with open(tmp, "wb") as fh:
            n = write_frames(fh, payloads)
        final = os.path.join(self._path, name)
        os.rename(tmp, final)  # atomic publish; abort leaves only .tmp litter
        return _Committed(file=final, rows=n)

    def commit(self, messages):
        pass

    def abort(self, messages):
        for m in messages:
            if m is not None and os.path.exists(m.file):
                os.remove(m.file)


class FramedBinaryDataSource(DataSource):
    """``framedbin`` — the reference's length-framed stream as a file format."""

    @classmethod
    def name(cls) -> str:
        return "framedbin"

    def schema(self):
        raise NotImplementedError(
            "framedbin frames carry schemaless payloads; pass .schema(...) "
            "like the reference's binary_to_term consumer, which also knows "
            "the row shape out of band"
        )

    def reader(self, schema: StructType) -> _FramedReader:
        return _FramedReader(schema, self.options)

    def writer(self, schema: StructType, overwrite: bool) -> _FramedWriter:
        if not overwrite:
            raise NotImplementedError("framedbin supports mode('overwrite') only")
        return _FramedWriter(schema, self.options, overwrite)


def register(spark) -> None:
    """Idempotently register the framedbin format on a session.

    Enables Python-source filter pushdown (off by default; runtime-settable)
    — without it Spark refuses any reader that implements ``pushFilters``.
    Set on the passed-in session so foreign (driver-supplied) sessions work.

    The reader/writer classes are unpickled inside Spark's Python *worker*
    processes, which inherit the executor environment — NOT the driver's
    sys.path.  An embedding application that imported this package from a
    path-loaded location (the driver loads ``__spark_entry__.py`` by file
    path) would hit ``ModuleNotFoundError: egraphdb_spark`` in the worker.
    Registering the module for pickle-by-value makes the classes
    self-contained in the pickle stream, so no worker-side import happens.
    """
    try:  # cloudpickle >= 2.0 (bundled with pyspark 4)
        import sys

        from pyspark import cloudpickle

        cloudpickle.register_pickle_by_value(sys.modules[__name__])
    except (ImportError, AttributeError):
        pass  # older cloudpickle: fall back to by-reference (same-path envs)
    spark.conf.set("spark.sql.python.filterPushdown.enabled", "true")
    spark.dataSource.register(FramedBinaryDataSource)
