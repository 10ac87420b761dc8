"""Structured Streaming surface (SURVEY.md §2.9).

The crawl frontier feedback loop itself cannot be a stream (cyclic
dataflow), but the engine's *ingest* side is naturally streaming: seed
feeds, metrics, and page-snapshot deltas.  This module gives the
readStream → watermark → windowed-agg → writeStream shape over the
``events`` table schema (event_id, ts, user_id, event_type, value,
props), runnable against a file source in tests.

Both operators also come in batch form (same Column expressions) so the
DuckDB oracle can verify the aggregation semantics; the streaming tests
assert stream-vs-batch equality on a static input.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

EVENTS = T.StructType([
    T.StructField("event_id", T.LongType()),
    T.StructField("ts", T.TimestampType()),
    T.StructField("user_id", T.LongType()),
    T.StructField("event_type", T.StringType()),
    T.StructField("value", T.DoubleType()),
    T.StructField("props", T.StringType()),
])


def windowed_counts(events: DataFrame, window: str = "1 hour",
                    watermark: str = "2 hours") -> DataFrame:
    """Tumbling-window counts per event_type with late-data watermark."""
    src = events
    if events.isStreaming:
        src = events.withWatermark("ts", watermark)
    return (src.groupBy(F.window("ts", window).alias("w"), "event_type")
            .agg(F.count("*").alias("n_events"),
                 F.round(F.sum("value"), 6).alias("sum_value"))
            .select(F.col("w.start").alias("window_start"),
                    "event_type", "n_events", "sum_value"))


def read_events_stream(spark: SparkSession, path: str,
                       max_files_per_trigger: int = 4) -> DataFrame:
    return (spark.readStream
            .schema(EVENTS)
            .option("maxFilesPerTrigger", max_files_per_trigger)
            .parquet(path))


def run_stream_to_sink(stream_df: DataFrame, checkpoint: str,
                       out_path: str):
    """writeStream with checkpointing; availableNow drains the source
    then stops — the bounded-test harness shape."""
    return (stream_df.writeStream
            .format("parquet")
            .option("path", out_path)
            .option("checkpointLocation", checkpoint)
            .outputMode("append")
            .trigger(availableNow=True)
            .start())


def sessionize(events: DataFrame, gap: str = "30 minutes") -> DataFrame:
    """Session windows per user (built-in session_window)."""
    src = events
    if events.isStreaming:
        src = events.withWatermark("ts", gap)
    return (src.groupBy(F.session_window("ts", gap).alias("w"), "user_id")
            .agg(F.count("*").alias("n_events"))
            .select(F.col("w.start").alias("session_start"),
                    F.col("w.end").alias("session_end"),
                    "user_id", "n_events"))


def stateful_running_totals(events: DataFrame) -> DataFrame:
    """Custom stateful operator via ``applyInPandasWithState``: per-user
    running (count, sum) carried across micro-batches in GroupState —
    the crawl-ingest shape for per-domain counters (S13/A5) as a
    continuous stream.  Emits the updated running totals for every user
    touched in each micro-batch; after the source drains, the LAST row
    per user equals the batch groupBy aggregate regardless of how rows
    were split across micro-batches (pinned by
    tests/test_pipeline_ops.py::TestStreaming).
    """
    import pandas as pd
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    def update_totals(key, pdfs, state: GroupState):
        n, s = state.get if state.exists else (0, 0.0)
        for pdf in pdfs:
            n += int(len(pdf))
            s += float(pdf["value"].fillna(0.0).sum())
        state.update((n, s))
        yield pd.DataFrame({"user_id": [key[0]], "n_events": [n],
                            "sum_value": [s]})

    return (events.groupBy("user_id").applyInPandasWithState(
        update_totals,
        outputStructType="user_id long, n_events long, sum_value double",
        stateStructType="n_events long, sum_value double",
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout))
