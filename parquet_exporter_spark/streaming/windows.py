"""Structured Streaming operators: tumbling / sliding / session windows,
watermarked late-data handling, stateful dedup.

The same ``F.window`` / ``F.session_window`` expressions run in batch and
streaming; the oracle-checked batch twins live in queries/streaming.py and
the genuinely-streaming behaviors (watermark advancement, late drop,
dropDuplicatesWithinWatermark state) are exercised in
tests/test_streaming.py by replaying parquet files through a file source
into a memory sink.

Scale notes: streaming state (window aggregates, dedup keys) is
partitioned by group key across executors; watermarks bound state size —
without one, session/dedup state grows forever. All sinks below use
append/update with watermarks so state is evictable.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

EVENTS_SCHEMA = (
    "event_id long, ts timestamp, user_id long, event_type string, "
    "value double, props string"
)


def read_stream(spark, directory: str, max_files_per_trigger: int | None = None) -> DataFrame:
    reader = spark.readStream.schema(EVENTS_SCHEMA)
    if max_files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    return reader.parquet(directory)


def tumbling_counts(events: DataFrame, width: str = "10 minutes") -> DataFrame:
    return (
        events.withWatermark("ts", "30 minutes")
        .groupBy(F.window("ts", width).alias("win"), "event_type")
        .agg(F.count(F.lit(1)).alias("n"), F.round(F.sum("value"), 4).alias("sum_value"))
        .select(
            F.col("win.start").alias("win_start"),
            F.col("win.end").alias("win_end"),
            "event_type",
            "n",
            "sum_value",
        )
    )


def sliding_counts(
    events: DataFrame, width: str = "10 minutes", slide: str = "5 minutes"
) -> DataFrame:
    return (
        events.withWatermark("ts", "30 minutes")
        .groupBy(F.window("ts", width, slide).alias("win"))
        .agg(F.count(F.lit(1)).alias("n"))
        .select(F.col("win.start").alias("win_start"), "n")
    )


def session_counts(events: DataFrame, gap: str = "5 minutes") -> DataFrame:
    return (
        events.withWatermark("ts", "30 minutes")
        .groupBy(F.session_window("ts", gap).alias("win"), "user_id")
        .agg(F.count(F.lit(1)).alias("n"))
        .select(
            F.col("win.start").alias("session_start"),
            F.col("win.end").alias("session_end"),
            "user_id",
            "n",
        )
    )


def dedup_within_watermark(events: DataFrame, watermark: str = "10 minutes") -> DataFrame:
    return events.withWatermark("ts", watermark).dropDuplicatesWithinWatermark(["event_id"])


def run_to_memory(stream_df: DataFrame, name: str, output_mode: str = "append"):
    """Drive a streaming DataFrame to completion against currently-visible
    files; returns the query handle (stopped). Results in table `name`."""
    q = (
        stream_df.writeStream.format("memory")
        .queryName(name)
        .outputMode(output_mode)
        .start()
    )
    q.processAllAvailable()
    return q
