"""Checkpoint/resume semantics (C4): interrupted run + resume ==
single full run, byte-identical output; completed buckets are skipped."""

import pandas as pd
import pytest
from pyspark.sql import functions as F

from pdf_extraction_spark import fixtures
from pdf_extraction_spark.plans.checkpoint import Ledger
from pdf_extraction_spark.plans.pipeline import run_extraction
from pdf_extraction_spark.sources.tables import TableIO


def _result_frame(spark, root):
    return (
        TableIO(spark, root)
        .read("extracted")
        .select("conv_id", "turn_idx", "extracted_text", "status", "route", "bucket")
        .orderBy("conv_id", "turn_idx")
        .toPandas()
    )


@pytest.fixture()
def small_transcripts(spark):
    pdf = fixtures.transcripts_pandas(n_convs=20, whale_every=10, whale_len=60)
    return spark.createDataFrame(pdf)


def test_interrupt_then_resume_equals_full_run(spark, small_transcripts, tmp_path):
    full_root = str(tmp_path / "full")
    part_root = str(tmp_path / "partial")

    s1 = run_extraction(spark, small_transcripts, full_root, run_id="r1", n_buckets=8, n_waves=2)
    assert s1["buckets_run"] == 8 and not s1["resumed"]

    # Simulate a crash after wave 1 of 2: run with n_waves=2 but kill wave 2
    # by monkeypatching? Simpler + honest: run only a subset of buckets by
    # pre-marking the complement ledger rows absent and interrupting via a
    # partial run (n_waves=1 over half the buckets).
    import pdf_extraction_spark.plans.pipeline as pl

    # First "crashed" run: process buckets 0-3 only by intercepting the todo
    # list through a ledger pre-pass — emulate by running with resume after
    # marking 4-7 done, then wiping those ledger rows.
    io = TableIO(spark, part_root)
    ledger = Ledger(io, "r2")
    fake = [{"bucket": b, "n_turns": 0, "checksum": -999} for b in range(4, 8)]
    ledger.mark_done(fake)
    s2 = run_extraction(spark, small_transcripts, part_root, run_id="r2", n_buckets=8, n_waves=2)
    assert s2["resumed"] and s2["buckets_run"] == 4  # only 0-3 ran

    # "restart": clear the fake rows so 4-7 are no longer done, then resume
    led = io.read("lineage").filter(F.col("checksum") != "-999")
    led_pdf = led.toPandas()
    import shutil

    shutil.rmtree(io.path("lineage"))
    spark.createDataFrame(led_pdf).write.mode("overwrite").parquet(io.path("lineage"))

    s3 = run_extraction(spark, small_transcripts, part_root, run_id="r2", n_buckets=8, n_waves=2)
    assert s3["resumed"] and s3["buckets_run"] == 4  # the remaining 4-7

    got = _result_frame(spark, part_root)
    want = _result_frame(spark, full_root)
    pd.testing.assert_frame_equal(got.reset_index(drop=True), want.reset_index(drop=True))


def test_rerun_is_noop(spark, small_transcripts, tmp_path):
    root = str(tmp_path / "w")
    run_extraction(spark, small_transcripts, root, run_id="r1", n_buckets=8)
    before = _result_frame(spark, root)
    s = run_extraction(spark, small_transcripts, root, run_id="r1", n_buckets=8)
    assert s["buckets_run"] == 0 and s["resumed"]
    after = _result_frame(spark, root)
    pd.testing.assert_frame_equal(before, after)


def test_ledger_checksums_match_rewritten_data(spark, small_transcripts, tmp_path):
    """Re-running a bucket (idempotent overwrite) reproduces its checksum."""
    root = str(tmp_path / "w")
    run_extraction(spark, small_transcripts, root, run_id="r1", n_buckets=8)
    io = TableIO(spark, root)
    led = io.read("lineage").toPandas().set_index("bucket")
    stats = Ledger.bucket_stats(io.read("extracted"))
    assert len(stats) > 0
    for s in stats:
        assert str(s["checksum"]) == led.loc[s["bucket"], "checksum"]
        assert s["n_turns"] == led.loc[s["bucket"], "n_turns"]


def test_whale_conversation_is_salted(spark, tmp_path):
    """A whale conversation must span multiple tasks after salting."""
    pdf = fixtures.transcripts_pandas(n_convs=1, whale_every=1, whale_len=500)
    df = spark.createDataFrame(pdf)
    from pdf_extraction_spark.plans.pipeline import _with_bucket

    salted = (
        _with_bucket(df, 8)
        .withColumn("salt", (F.col("turn_idx") / F.lit(100)).cast("int"))
        .repartition(8, "bucket", "salt")
        .withColumn("pid", F.spark_partition_id())
    )
    n_parts = salted.select("pid").distinct().count()
    assert n_parts >= 3  # 500 turns / salt grain 100 → ≥5 salt groups; hashing may collide a little
