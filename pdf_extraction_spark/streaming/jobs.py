"""Structured Streaming jobs.

The reference is strictly bounded-batch (SURVEY.md §2.9: its "batch jobs"
are ≤100-file synchronous batches, reference app/routers/batch.py:15,
324-333), so streaming is an ENGINE capability, not a parity requirement:

- ``stream_events_windowed``  : watermarked tumbling-window aggregation over
  an events directory — the continuous analogue of the stats queries
  (A3/A4, reference app/routers/stats.py).
- ``stream_extraction``       : the SAME extraction transform
  (``extract_stage`` — mapInPandas composes with streaming) run as an
  incremental job over a transcript landing directory. The file-source +
  checkpointLocation pair gives exactly-once sink semantics — the streaming
  twin of the batch pipeline's lineage ledger.

Scale notes: the file source tracks processed files in the checkpoint (no
re-listing races); ``maxFilesPerTrigger`` bounds per-micro-batch memory; at
real scale the source becomes Kafka/Iceberg-CDC with identical plan shape.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

EVENTS_SCHEMA = (
    "event_id bigint, ts timestamp, user_id bigint, event_type string, "
    "value double, props string"
)

TRANSCRIPTS_SCHEMA = (
    "conv_id string, turn_idx int, role string, text string, tool string, ts timestamp"
)


def stream_events_windowed(
    spark: SparkSession,
    src_dir: str,
    window: str = "5 minutes",
    watermark: str = "10 minutes",
    max_files_per_trigger: int = 16,
) -> DataFrame:
    """readStream(events) → watermark → tumbling-window counts/sums."""
    events = (
        spark.readStream.schema(EVENTS_SCHEMA)
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .parquet(src_dir)
    )
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.window("ts", window), "event_type")
        .agg(
            F.count("*").alias("n"),
            F.round(F.sum("value"), 2).alias("sum_value"),
        )
        .select(
            F.col("window.start").alias("win_start"),
            F.col("window.end").alias("win_end"),
            "event_type", "n", "sum_value",
        )
    )


def stream_extraction(
    spark: SparkSession,
    src_dir: str,
    out_dir: str,
    checkpoint_dir: str,
    max_files_per_trigger: int = 8,
):
    """Incremental extraction over a transcript landing directory.
    Returns the started StreamingQuery (caller drives the trigger)."""
    from pdf_extraction_spark.plans.pipeline import extract_stage

    transcripts = (
        spark.readStream.schema(TRANSCRIPTS_SCHEMA)
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .parquet(src_dir)
    )
    extracted = extract_stage(transcripts)
    return (
        extracted.writeStream.format("parquet")
        .option("path", out_dir)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
