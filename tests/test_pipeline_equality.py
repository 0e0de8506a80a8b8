"""THE north-rule gate: per-turn text equality, Spark vs pure-Python oracle,
under stable (conv_id, turn_idx) ordering."""

import pandas as pd
import pytest

from pdf_extraction_spark import fixtures
from pdf_extraction_spark.plans.pipeline import extract_stage


def _spans_tuples(spans):
    return [
        (s["span_idx"], s["kind"], s["text"], s["page"],
         s["bbox"]["x1"], s["bbox"]["y1"], s["bbox"]["x2"], s["bbox"]["y2"])
        for s in (spans or [])
    ]


def test_per_turn_equality(spark, transcripts_df):
    got = (
        extract_stage(transcripts_df)
        .orderBy("conv_id", "turn_idx")
        .select("conv_id", "turn_idx", "extracted_text", "spans", "quality_score",
                "doc_kind", "classify_method", "route", "status")
        .toPandas()
    )
    golden = fixtures.golden_pandas(transcripts_df.toPandas())

    assert len(got) == len(golden)
    for col in ("conv_id", "turn_idx", "extracted_text", "doc_kind",
                "classify_method", "route", "status"):
        mism = (got[col].fillna("") != golden[col].fillna("")).sum() if got[col].dtype == object \
            else (got[col] != golden[col]).sum()
        assert mism == 0, f"{col}: {mism} mismatching turns"
    assert (got["quality_score"] - golden["quality_score"]).abs().max() == 0.0

    # spans: structural equality after Arrow round-trip
    for g_spans, o_spans in zip(got["spans"], golden["spans"]):
        g = [
            (s["span_idx"], s["kind"], s["text"], s["page"],
             s["bbox"]["x1"], s["bbox"]["y1"], s["bbox"]["x2"], s["bbox"]["y2"])
            for s in (list(g_spans) if g_spans is not None else [])
        ]
        assert g == _spans_tuples(o_spans)


def test_stable_ordering_dense(spark, transcripts_df):
    got = (
        extract_stage(transcripts_df)
        .orderBy("conv_id", "turn_idx")
        .select("conv_id", "turn_idx")
        .toPandas()
    )
    for conv, grp in got.groupby("conv_id"):
        assert list(grp["turn_idx"]) == list(range(len(grp)))


def test_null_and_empty_text(spark):
    import datetime as dt

    t = dt.datetime(2024, 1, 1)
    rows = [
        ("c0", 0, "user", None, None, t),
        ("c0", 1, "user", "", None, t),
        ("c0", 2, "user", "A real paragraph with plenty of words for the extractor to keep.",
         None, t),
    ]
    df = spark.createDataFrame(rows, "conv_id string, turn_idx int, role string, text string, tool string, ts timestamp")
    out = extract_stage(df).orderBy("turn_idx").toPandas()
    assert list(out["status"]) == ["failed", "failed", "ok"]
    assert out.loc[2, "extracted_text"].startswith("A real paragraph")
