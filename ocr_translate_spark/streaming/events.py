"""Streaming analog of the reference's micro-batching request queues.

The reference batches same-shape requests with a 0.5 s timeout window
(ref messaging.py:74-110, 260-273) — a processing-time tumbling window.
The engine itself is batch+snapshot (SURVEY.md §2.12: no event-time
semantics in the reference), but the events table gets a real Structured
Streaming path so downstream consumers can run the same aggregation
incrementally.

``windowed_counts`` is the shared logical plan; ``run_stream_smoke`` drives
it through readStream -> memory sink for tests (one shot, synchronous).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F


def windowed_counts(events: DataFrame, minutes: int = 5) -> DataFrame:
    """Tumbling-window counts+sums per event_type with a 10-min watermark."""
    # watermarks require TIMESTAMP; the events table stores TIMESTAMP_NTZ
    events = events.withColumn("ts", F.col("ts").cast("timestamp"))
    return (
        events.withWatermark("ts", "10 minutes")
        .groupBy(F.window("ts", f"{minutes} minutes").alias("w"), "event_type")
        .agg(F.count("*").alias("n"), F.sum("value").alias("total_value"))
        .select(
            F.col("w.start").alias("window_start"),
            "event_type",
            "n",
            "total_value",
        )
    )


def run_stream_smoke(
    spark: SparkSession, events_path: str, minutes: int = 5
) -> DataFrame:
    """Drive the windowed aggregation as a real stream over the parquet
    events table (memory sink, processAllAvailable)."""
    import os
    import tempfile

    schema = spark.read.parquet(events_path).schema
    if os.path.isfile(events_path):
        # FileStreamSource requires a directory; expose the file through one
        stage_dir = tempfile.mkdtemp(prefix="stream_smoke_")
        os.symlink(os.path.abspath(events_path), os.path.join(stage_dir, "part-0.parquet"))
        events_path = stage_dir
    stream = spark.readStream.schema(schema).parquet(events_path)
    agg = windowed_counts(stream, minutes)
    query = (
        agg.writeStream.outputMode("complete")
        .format("memory")
        .queryName("events_windowed_smoke")
        .start()
    )
    try:
        query.processAllAvailable()
    finally:
        query.stop()
    return spark.sql("SELECT * FROM events_windowed_smoke")
