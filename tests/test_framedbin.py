"""framedbin Python DataSource — the reference's length-framed binary
stream (src/egraph_api.erl:276-325) as a planner-integrated file format."""

from __future__ import annotations

import io as pyio
import struct

import pytest

from egraphdb_spark.sources import framedbin


@pytest.fixture(scope="module", autouse=True)
def _registered(spark):
    framedbin.register(spark)


def _df(spark, n=200, parts=4):
    return spark.range(0, n, 1, parts).selectExpr(
        "id", "concat('name_', id) AS name", "cast(id % 7 as double) AS score"
    )


def test_frame_codec_roundtrip_and_truncation():
    buf = pyio.BytesIO()
    framedbin.write_frames(buf, iter([b"abc", b"", b"\x00" * 1000]))
    buf.seek(0)
    assert list(framedbin.read_frames(buf)) == [b"abc", b"", b"\x00" * 1000]
    # wire format: 2-byte big-endian length prefix (egraph_api.erl:351-362)
    buf.seek(0)
    assert buf.read(2) == struct.pack(">H", 3)
    # oversize payload rejected at the 16-bit cap
    with pytest.raises(ValueError, match="16-bit"):
        framedbin.write_frames(pyio.BytesIO(), iter([b"x" * 70000]))
    # truncation rejected
    half = pyio.BytesIO(struct.pack(">H", 10) + b"short")
    with pytest.raises(EOFError):
        list(framedbin.read_frames(half))


def test_roundtrip_preserves_rows_and_parallelism(spark, tmp_path):
    path = str(tmp_path / "fb")
    _df(spark, 200, 4).write.format("framedbin").mode("overwrite").save(path)
    files = [p for p in (tmp_path / "fb").iterdir() if p.suffix == ".fb"]
    assert len(files) == 4  # one file per upstream partition — no coalesce
    back = (
        spark.read.format("framedbin")
        .schema("id bigint, name string, score double")
        .load(path)
    )
    assert back.rdd.getNumPartitions() == 4  # read parallelism = file count
    rows = {r["id"]: r for r in back.collect()}
    assert len(rows) == 200
    assert rows[13]["name"] == "name_13" and rows[13]["score"] == 6.0


def test_overwrite_replaces_previous_output(spark, tmp_path):
    path = str(tmp_path / "fb")
    _df(spark, 100).write.format("framedbin").mode("overwrite").save(path)
    _df(spark, 7, 1).write.format("framedbin").mode("overwrite").save(path)
    back = (
        spark.read.format("framedbin")
        .schema("id bigint, name string, score double")
        .load(path)
    )
    assert back.count() == 7


def test_filter_pushdown_reduces_rows_and_stays_exact(spark, tmp_path):
    path = str(tmp_path / "fb")
    _df(spark, 100).write.format("framedbin").mode("overwrite").save(path)
    back = (
        spark.read.format("framedbin")
        .schema("id bigint, name string, score double")
        .load(path)
    )
    got = sorted(r["id"] for r in back.filter("id >= 95 and name = 'name_97'").collect())
    assert got == [97]
    # unsupported filters stay residual and still apply
    got2 = sorted(r["id"] for r in back.filter("id % 50 = 1").collect())
    assert got2 == [1, 51]


def test_nulls_roundtrip(spark, tmp_path):
    path = str(tmp_path / "fb")
    spark.sql(
        "select cast(null as bigint) id, 'x' name, cast(null as double) score"
    ).write.format("framedbin").mode("overwrite").save(path)
    row = (
        spark.read.format("framedbin")
        .schema("id bigint, name string, score double")
        .load(path)
        .collect()[0]
    )
    assert row["id"] is None and row["name"] == "x" and row["score"] is None
