"""Structured Streaming: windowed events agg + incremental extraction
(exactly-once file sink, restart safety)."""

import os
import shutil

import pytest
from pyspark.sql import functions as F

from pdf_extraction_spark import fixtures
from pdf_extraction_spark.plans.pipeline import extract_stage
from pdf_extraction_spark.streaming.jobs import stream_events_windowed, stream_extraction

SF = "/root/testdata/sf0.001"


def test_events_windowed_stream_matches_batch(spark, tmp_path):
    # stream the events parquet as files
    src = str(tmp_path / "events_src")
    os.makedirs(src)
    shutil.copy(os.path.join(SF, "events.parquet"), os.path.join(src, "part-0.parquet"))

    q = (
        stream_events_windowed(spark, src)
        .writeStream.format("memory").queryName("ev_out")
        .outputMode("append").trigger(availableNow=True).start()
    )
    q.awaitTermination(120)
    got = spark.sql("SELECT * FROM ev_out")

    batch = (
        spark.read.parquet(os.path.join(SF, "events.parquet"))
        .groupBy(F.window("ts", "5 minutes"), "event_type")
        .agg(F.count("*").alias("n"), F.round(F.sum("value"), 2).alias("sum_value"))
    )
    # append mode emits only windows closed by the watermark; every emitted
    # row must match its batch twin exactly
    b = {(r["window"]["start"], r["event_type"]): (r["n"], r["sum_value"]) for r in batch.collect()}
    rows = got.collect()
    assert rows, "stream emitted no closed windows"
    for r in rows:
        assert b[(r["win_start"], r["event_type"])] == (r["n"], r["sum_value"])


def test_stream_extraction_matches_batch(spark, tmp_path):
    src = str(tmp_path / "tsrc")
    out = str(tmp_path / "tout")
    ckpt = str(tmp_path / "ckpt")
    pdf = fixtures.transcripts_pandas(n_convs=10, whale_every=0)
    tdf = spark.createDataFrame(pdf).withColumn("turn_idx", F.col("turn_idx").cast("int"))
    tdf.write.parquet(src)

    q = stream_extraction(spark, src, out, ckpt)
    q.awaitTermination(180)

    got = (
        spark.read.parquet(out)
        .select("conv_id", "turn_idx", "extracted_text", "status")
        .orderBy("conv_id", "turn_idx")
        .toPandas()
    )
    want = (
        extract_stage(spark.createDataFrame(pdf))
        .select("conv_id", "turn_idx", "extracted_text", "status")
        .orderBy("conv_id", "turn_idx")
        .toPandas()
    )
    assert got.equals(want)

    # restart with same checkpoint: no new files → no duplicate output
    q2 = stream_extraction(spark, src, out, ckpt)
    q2.awaitTermination(120)
    assert spark.read.parquet(out).count() == len(want)
