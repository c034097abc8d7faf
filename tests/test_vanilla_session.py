"""Driver-session portability: every gate must run on a SparkSession the
engine did NOT build.

Round-1 post-mortem (VERDICT.md §wrong-1): all 50 driver-checked gates died
with PARQUET_TYPE_ILLEGAL because ``spark.sql.legacy.parquet.nanosAsLong``
was set only in the builder's own ``session.py`` — the driver supplies its
own session.  ``spark.newSession()`` gives a session sharing the JVM but
with a FRESH SQLConf (no engine confs inherited), which reproduces the
foreign-session environment exactly: before the fix, reading
events.parquet (TIMESTAMP(NANOS)) through it raised AnalysisException.
"""

import pytest

from conftest import SF_SMOKE


@pytest.fixture(scope="module")
def vanilla(spark):
    """A session with default SQLConf — what the driver hands us."""
    s = spark.newSession()
    # newSession() inherits SparkConf-level defaults set by the builder, so
    # force the conf to its out-of-the-box value to reproduce the driver's
    # truly-vanilla session (where the conf was never set at all).
    s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "false")
    return s


def test_load_tables_on_vanilla_session(vanilla):
    from egraphdb_spark.graph import load_tables

    t = load_tables(vanilla, SF_SMOKE)
    # events.ts must come back as a real timestamp — either restored from
    # bigint nanos (Sparks honoring the legacy nanosAsLong conf) or read
    # natively as timestamp_ntz (Spark 4.1+, which ignores the conf)
    assert dict(t["events"].dtypes)["ts"] in ("timestamp", "timestamp_ntz")
    assert t["events"].limit(1).count() == 1


def test_gate_runs_on_vanilla_session(vanilla):
    import __spark_entry__ as entrymod

    q = entrymod.queries()
    df = q["s1_point_lookup"](vanilla, SF_SMOKE)
    assert df.count() >= 0


def test_events_gate_on_vanilla_session(vanilla):
    import __spark_entry__ as entrymod

    q = entrymod.queries()
    df = q["evt_window_hourly"](vanilla, SF_SMOKE)
    assert df.count() > 0


def test_stream_reader_on_vanilla_session(vanilla):
    from egraphdb_spark.streaming.stream import read_events_stream

    sdf = read_events_stream(vanilla, SF_SMOKE)
    assert dict(sdf.dtypes)["ts"] == "timestamp"
