"""Log-structured parquet table: persistent upsert/delete semantics
(the reference's in-place versioned mutations, egraph_detail_model.erl:
574-588 / 260-277, re-expressed as merge-on-read over immutable segments).
"""

import shutil
import tempfile

import pytest
from pyspark.sql import functions as F

from egraphdb_spark.sources import logtable as lt


@pytest.fixture()
def tdir():
    d = tempfile.mkdtemp(prefix="logtable_")
    yield d
    shutil.rmtree(d, ignore_errors=True)


def _rows(df):
    return {
        r["k"]: (r["val"], r["note"])
        for r in df.select("k", "val", "note").collect()
    }


def test_upsert_delete_merge_on_read(spark, tdir):
    base = spark.createDataFrame(
        [(1, 10, "a"), (2, 20, "b"), (3, 30, "c")], "k long, val long, note string"
    )
    lt.create(base, tdir, ["k"])
    # upsert: change k=2, insert k=4
    lt.append_upsert(
        spark.createDataFrame([(2, 99, "b2"), (4, 40, "d")], "k long, val long, note string"),
        tdir,
    )
    # delete k=1
    lt.append_delete(spark.createDataFrame([(1,)], "k long"), tdir)
    got = _rows(lt.read_latest(spark, tdir))
    assert got == {2: (99, "b2"), 3: (30, "c"), 4: (40, "d")}


def test_snapshot_as_of_prunes_partitions(spark, tdir):
    base = spark.createDataFrame([(1, 10, "a")], "k long, val long, note string")
    lt.create(base, tdir, ["k"])
    lt.append_upsert(
        spark.createDataFrame([(1, 11, "a1")], "k long, val long, note string"), tdir
    )
    lt.append_delete(spark.createDataFrame([(1,)], "k long"), tdir)
    # as_of each segment shows the state at that point in the log
    assert _rows(lt.read_latest(spark, tdir, as_of=0)) == {1: (10, "a")}
    assert _rows(lt.read_latest(spark, tdir, as_of=1)) == {1: (11, "a1")}
    assert _rows(lt.read_latest(spark, tdir)) == {}
    # the snapshot filter is partition pruning, not a data-column filter
    plan = (
        lt.read_log(spark, tdir)
        .where(F.col("seg") <= 1)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "PartitionFilters" in plan


def test_etag_is_winning_segment(spark, tdir):
    base = spark.createDataFrame([(1, 10, "a"), (2, 20, "b")], "k long, val long, note string")
    lt.create(base, tdir, ["k"])
    seg = lt.append_upsert(
        spark.createDataFrame([(2, 21, "b1")], "k long, val long, note string"), tdir
    )
    seqs = {r["k"]: r["_seq"] for r in lt.read_latest(spark, tdir).collect()}
    assert seqs == {1: 0, 2: seg}


def test_compact_preserves_state(spark, tdir):
    base = spark.createDataFrame(
        [(i, i * 10, f"n{i}") for i in range(1, 8)], "k long, val long, note string"
    )
    lt.create(base, tdir, ["k"])
    lt.append_upsert(
        spark.createDataFrame([(3, 333, "x"), (9, 90, "n9")], "k long, val long, note string"),
        tdir,
    )
    lt.append_delete(spark.createDataFrame([(5,), (6,)], "k long"), tdir)
    before = _rows(lt.read_latest(spark, tdir))
    lt.compact(spark, tdir)
    after = _rows(lt.read_latest(spark, tdir))
    assert before == after
    # read amplification is back to one segment
    assert len(lt._segments(tdir)) == 1
    # and the table still accepts new mutations after compaction
    lt.append_upsert(
        spark.createDataFrame([(9, 91, "n9b")], "k long, val long, note string"), tdir
    )
    assert _rows(lt.read_latest(spark, tdir))[9] == (91, "n9b")


def test_create_refuses_existing(spark, tdir):
    base = spark.createDataFrame([(1, 10, "a")], "k long, val long, note string")
    lt.create(base, tdir, ["k"])
    with pytest.raises(ValueError):
        lt.create(base, tdir, ["k"])


def test_snapshot_diff_classification(spark, tmp_path):
    from egraphdb_spark.sources import logtable as lt

    path = str(tmp_path / "t")
    base = spark.createDataFrame(
        [(1, "a"), (2, "b"), (3, "c")], "k long, v string"
    )
    lt.create(base, path, ["k"])
    lt.append_upsert(
        spark.createDataFrame([(2, "B"), (4, "d")], "k long, v string"), path
    )
    lt.append_delete(spark.createDataFrame([(3,), (99,)], "k long"), path)
    diff = {r["k"]: r for r in lt.snapshot_diff(spark, path, 0).collect()}
    assert diff[2]["change"] == "update"
    assert diff[4]["change"] == "insert"
    assert diff[3]["change"] == "delete"
    assert 99 not in diff, "tombstone of a never-existed key is a net nil"
    assert 1 not in diff, "untouched keys never appear"
    # diff of an empty range is empty
    assert lt.snapshot_diff(spark, path, 0, 0).count() == 0
