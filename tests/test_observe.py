"""Execution-metrics observability: the numbers surfaced from the executed
plan must agree with ground truth the test can compute independently."""

import os

import pytest
from pyspark.sql import functions as F

SF = "/root/testdata/sf0.001"

pytestmark = pytest.mark.skipif(not os.path.isdir(SF), reason="driver testdata absent")


def test_metrics_match_ground_truth(spark):
    from pdf_extraction_spark.plans.observe import execution_metrics, metrics_summary

    ev = spark.read.parquet(os.path.join(SF, "events.parquet"))
    df = ev.groupBy("event_type").agg(F.count("*").alias("n"))
    n_groups = len(df.collect())  # executing THIS df populates its metrics
    # (df.count() would execute a separate aggregate plan and leave these at 0)

    s = metrics_summary(df)
    assert s["rows_scanned"] == ev.count()          # full scan, no pushdown filter
    assert s["files_scanned"] >= 1
    assert s["shuffle_records_written"] >= n_groups  # partial aggregates per task
    assert s["peak_memory_max"] > 0

    names = [n for _d, n, _m in execution_metrics(df)]
    assert any(n.startswith("Scan") for n in names)
    assert "Exchange" in names


def test_pushdown_visible_in_scan_metrics(spark):
    """A pushed filter must REDUCE rows_scanned vs the full table — the
    regression this module exists to catch (pushdown silently lost →
    scan volume explodes)."""
    from pdf_extraction_spark.plans.observe import execution_metrics, metrics_summary

    ev = spark.read.parquet(os.path.join(SF, "events.parquet"))
    df = ev.filter(F.col("event_type") == "purchase").groupBy("user_id").count()
    df.collect()
    s = metrics_summary(df)
    full = ev.count()
    want = ev.filter(F.col("event_type") == "purchase").count()
    # the scan never reads MORE than the table (row-group stats may not
    # skip anything at this single tiny file), and the Filter node right
    # above it must cut the stream to exactly the selected rows — the
    # filtering-really-happened evidence the monitor alerts on
    assert 0 < s["rows_scanned"] <= full
    filter_rows = [m.get("numOutputRows") for _d, n, m in execution_metrics(df)
                   if n == "Filter"]
    assert filter_rows and filter_rows[-1] == want


def test_pipeline_persists_op_metrics_table(spark, tmp_path):
    """run_extraction writes a per-run op_metrics table (operator-grain
    executed-plan stats) and a second run APPENDS its own rows; the
    alertable fields are populated on the node kinds that own them."""
    from pdf_extraction_spark import fixtures
    from pdf_extraction_spark.plans.pipeline import run_extraction
    from pdf_extraction_spark.sources.tables import TableIO

    root = str(tmp_path / "w")
    df = spark.createDataFrame(fixtures.transcripts_pandas(n_convs=12))
    run_extraction(spark, df, root, run_id="rA", n_buckets=4)
    io = TableIO(spark, root)
    om = io.read("op_metrics").toPandas()
    assert set(om["run_id"]) == {"rA"}
    assert (om["stage"] == "run_metrics").all()

    def check_run(sub):
        scans = sub[sub["node"].str.startswith("Scan")]
        assert len(scans) and scans["rows_out"].notna().all()
        assert scans["rows_out"].sum() > 0 and scans["files_read"].sum() > 0
        exch = sub[sub["node"] == "Exchange"]
        assert len(exch) and exch["shuffle_bytes_written"].notna().all()
        assert exch["shuffle_bytes_written"].sum() > 0
        aggs = sub[sub["node"].str.contains("Aggregate")]
        assert len(aggs) and aggs["spill_bytes"].notna().all()  # 0 is fine, NULL is not
        # peak_memory exists only on node kinds that track it (HashAggregate,
        # Sort — this plan's percentile agg is ObjectHashAggregate, which
        # does not); the contract is "never silently zero": absent == NULL

    check_run(om)

    # a second run over the same warehouse appends its own rows
    run_extraction(spark, df, root, run_id="rB", n_buckets=4)
    om2 = io.read("op_metrics").toPandas()
    assert set(om2["run_id"]) == {"rA", "rB"}
    check_run(om2[om2["run_id"] == "rB"])
    # a pure resume no-op (same run_id, nothing to do) appends nothing
    run_extraction(spark, df, root, run_id="rB", n_buckets=4)
    assert len(io.read("op_metrics").toPandas()) == len(om2)
