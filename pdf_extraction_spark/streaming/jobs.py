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


def stream_dedup_turns(
    spark: SparkSession,
    src_dir: str,
    out_dir: str,
    checkpoint_dir: str,
    max_files_per_trigger: int = 4,
):
    """Custom STATEFUL streaming operator (applyInPandasWithState): emit each
    (conv_id, text-hash) only the FIRST time it is seen — a streaming exact
    dedup whose state survives across micro-batches via the checkpoint.

    State per conv_id: the set of md5 hashes already emitted (bounded in
    practice by per-conversation turn counts; at 10^12-turn scale the state
    store is RocksDB-backed and partitioned by conv_id like everything else).
    This is the streaming twin of the batch C1/C4 dedup ledger.
    """
    import hashlib
    from typing import Iterable, Iterator, Tuple

    import pandas as pd
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    transcripts = (
        spark.readStream.schema(TRANSCRIPTS_SCHEMA)
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .parquet(src_dir)
    )

    out_schema = "conv_id string, turn_idx int, text_hash string"
    state_schema = "seen array<string>"

    def dedup(key: Tuple[str], pdfs: Iterable[pd.DataFrame], state: GroupState) -> Iterator[pd.DataFrame]:
        seen = set(state.get[0]) if state.exists else set()
        rows = []
        for pdf in pdfs:
            for conv_id, turn_idx, text in zip(pdf["conv_id"], pdf["turn_idx"], pdf["text"]):
                h = hashlib.md5((text or "").encode("utf-8")).hexdigest()
                if h not in seen:
                    seen.add(h)
                    rows.append((conv_id, int(turn_idx), h))
        state.update((sorted(seen),))
        yield pd.DataFrame(rows, columns=["conv_id", "turn_idx", "text_hash"])

    deduped = transcripts.groupBy("conv_id").applyInPandasWithState(
        dedup, out_schema, state_schema, "append", GroupStateTimeout.NoTimeout
    )
    return (
        deduped.writeStream.format("parquet")
        .option("path", out_dir)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
