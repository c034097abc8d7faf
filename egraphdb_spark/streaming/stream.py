"""Structured Streaming surface.

The reference's "streaming" is HTTP chunked transfer of result rows
(src/egraph_api.erl:121-142) — there is no dataflow streaming, watermarks,
or event-time state anywhere in it (SURVEY.md §2.9).  The Spark-native
engine exposes real Structured Streaming over the events table: windowed
aggregation with watermarks, session windows, and within-watermark
deduplication — all built-in operators, no custom state stores.

Scale design: the file source here stands in for Kafka; every
transformation below is identical under `readStream` from any source.
Watermarks bound state: a 1-hour watermark means the state store holds at
most ~1 hour of windows per key, regardless of stream length.  Output goes
through `trigger(availableNow=True)` in tests (process-everything-then-
stop), which is also the production backfill pattern.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F
from pyspark.sql.types import (
    DoubleType,
    LongType,
    StringType,
    StructField,
    StructType,
    TimestampType,
)

EVENTS_SCHEMA = StructType(
    [
        StructField("event_id", LongType()),
        StructField("ts", TimestampType()),
        StructField("user_id", LongType()),
        StructField("event_type", StringType()),
        StructField("value", DoubleType()),
        StructField("props", StringType()),
    ]
)

# The driver's events.parquet stores TIMESTAMP(NANOS); with the session's
# nanosAsLong flag Spark reads it as BIGINT nanos, so the stream schema uses
# LongType for ts and converts after read (same dance as graph.load_tables).
_EVENTS_SCHEMA_NANOS = StructType(
    [f if f.name != "ts" else StructField("ts", LongType()) for f in EVENTS_SCHEMA]
)


def read_events_stream(spark: SparkSession, sf_dir: str) -> DataFrame:
    """File-source stream over the events table (stand-in for Kafka).

    The file source wants a *directory* it can watch; the fixture is a
    single parquet file, so we expose it through a symlinked staging dir
    (exactly what a production file-drop ingestion directory looks like).
    """
    import os

    # Foreign sessions (the driver's) don't carry the nanos conf; set it here
    # so the TIMESTAMP(NANOS) file parses as BIGINT under the explicit schema.
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")

    stage = f"/tmp/egraphdb_stream_src/{os.path.basename(sf_dir.rstrip('/'))}"
    os.makedirs(stage, exist_ok=True)
    link = f"{stage}/events-000.parquet"
    if not os.path.exists(link):
        try:
            os.symlink(f"{sf_dir}/events.parquet", link)
        except OSError:
            import shutil

            shutil.copyfile(f"{sf_dir}/events.parquet", link)
    raw = spark.readStream.schema(_EVENTS_SCHEMA_NANOS).parquet(stage)
    # integer div: epoch-nanos overflow double's mantissa (see graph.py)
    return raw.withColumn("ts", F.expr("timestamp_micros(ts div 1000)"))


def windowed_counts(events: DataFrame, window: str = "30 minutes",
                    watermark: str = "1 hour") -> DataFrame:
    """Tumbling-window counts per event_type with a bounded-state watermark."""
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.window("ts", window).alias("w"), "event_type")
        .agg(F.count("*").alias("n"))
        .select(F.col("w.start").alias("window_start"), "event_type", "n")
    )


def sessionized(events: DataFrame, gap: str = "30 minutes",
                watermark: str = "1 hour") -> DataFrame:
    """Session windows per user: start, end (= last event + gap), count."""
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.session_window("ts", gap).alias("w"), "user_id")
        .agg(F.count("*").alias("n"))
        .select(
            "user_id",
            F.col("w.start").alias("session_start"),
            F.col("w.end").alias("session_end"),
            "n",
        )
    )


def dedup_within_watermark(events: DataFrame, watermark: str = "1 hour") -> DataFrame:
    """Drop duplicate event_ids arriving within the watermark horizon.

    The streaming twin of exact dedup: state holds one key per event inside
    the watermark window only — bounded memory at any throughput.
    """
    return events.withWatermark("ts", watermark).dropDuplicatesWithinWatermark(
        ["event_id"]
    )


def stream_upsert_nodes(
    events: DataFrame, current_vertices: DataFrame, sink: list
) -> DataFrame:
    """Streaming ingest of events into the vertices table via foreachBatch.

    Each micro-batch becomes canonical nodes (key = "event:<id>") and is
    MERGEd with the reference's versioned-upsert semantics; ``sink``
    receives the running vertices DataFrame after each batch (on Delta this
    would be a MERGE INTO; immutable-parquet semantics rewrite the table).
    Returns the streaming writer's source frame for the caller to start.
    """
    from pyspark.sql import functions as F2

    from ..ingest import make_vertices, upsert_nodes

    state = {"vertices": current_vertices}

    def on_batch(batch_df: DataFrame, batch_id: int) -> None:
        nodes = batch_df.select(
            F2.concat(F2.lit("event:"), F2.col("event_id")).alias("key"),
            F2.to_json(F2.struct("event_id", "event_type", "value")).alias("details"),
            F2.array(F2.array(F2.lit("event_type"))).alias("index_paths"),
            F2.array().cast("array<array<string>>").alias("lowercase_index_paths"),
        )
        incoming = make_vertices(nodes, kind=F2.lit("event"))
        state["vertices"] = upsert_nodes(state["vertices"], incoming).localCheckpoint(
            eager=True
        )
        sink.append(state["vertices"])

    return events, on_batch


def stateful_user_counts(events: DataFrame, timeout_ms: int = 0) -> DataFrame:
    """Custom stateful streaming operator via applyInPandasWithState.

    Keeps one running (count, sum) per user_id in the state store and emits
    the updated totals each micro-batch — the hand-rolled equivalent of a
    streaming aggregation, here as the template for state machines Spark's
    built-ins can't express (sessionization with business rules, CDC
    merge, fraud counters).  State per key is O(1); the store scales with
    distinct keys, not stream length.
    """
    from collections.abc import Iterator

    import pandas as pd
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    out_schema = "user_id bigint, n bigint, total double"
    state_schema = "n bigint, cents bigint"

    def update(
        key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        # exact integer cents, so totals are bit-identical on any engine
        # regardless of summation order
        n, cents = state.get if state.exists else (0, 0)
        for pdf in pdfs:
            n += len(pdf)
            cents += int((pdf["value"] * 100).round().astype("int64").sum())
        state.update((n, cents))
        yield pd.DataFrame(
            {"user_id": [key[0]], "n": [n], "total": [cents / 100.0]}
        )

    return (
        events.select("user_id", "value")
        .groupBy("user_id")
        .applyInPandasWithState(
            update,
            outputStructType=out_schema,
            stateStructType=state_schema,
            outputMode="update",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )


def run_to_memory(
    sdf: DataFrame, name: str, output_mode: str = "complete"
) -> DataFrame:
    """Execute a streaming DataFrame with availableNow → in-memory table.

    Processes everything currently in the source, then stops — the batch-
    parity execution mode (and the production backfill trigger).  Returns
    the materialized result as a batch DataFrame.
    """
    spark = sdf.sparkSession
    q = (
        sdf.writeStream.format("memory")
        .queryName(name)
        .outputMode(output_mode)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return spark.table(name)
