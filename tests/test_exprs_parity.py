"""Native Column expressions must agree with the pure-Python core."""

import pandas as pd
from pyspark.sql import functions as F

from pdf_extraction_spark import fixtures
from pdf_extraction_spark.core.canonical import slug
from pdf_extraction_spark.core.classify import MEMO_PHRASES, QP_PHRASES, classify_text
from pdf_extraction_spark.core.quality import calculate_quality_score
from pdf_extraction_spark.functions.exprs import (
    classify_cascade_exprs,
    quality_score_expr,
    route_expr,
    slug_expr,
    token_estimate_expr,
)


def test_quality_score_expr_parity(spark):
    grid = [
        (tl, ec, hc, nt, nv)
        for tl in (0, 100, 101, 500, 501, 1000, 1001)
        for ec in (0, 5, 6, 21, 51)
        for hc in (0, 1, 3, 5)
        for nt, nv in ((0, 0), (1, 0), (2, 1))
    ]
    df = spark.createDataFrame(grid, "tl int, ec int, hc int, nt int, nv int")
    got = df.withColumn(
        "q", quality_score_expr(F.col("tl"), F.col("ec"), F.col("hc"), F.col("nt"), F.col("nv"))
    ).toPandas()
    for row in got.itertuples(index=False):
        tables = [{"data": [1] * 4}] * row.nv + [{"data": [1]}] * (row.nt - row.nv)
        want = calculate_quality_score(row.tl, row.ec, row.hc, tables)
        assert row.q == want, (row, want)


def test_route_expr(spark):
    df = spark.createDataFrame([(0.69,), (0.7,), (0.71,)], "q double")
    got = [r["r"] for r in df.withColumn("r", route_expr(F.col("q"))).collect()]
    assert got == ["fallback", "primary", "primary"]


def test_slug_expr_parity(spark):
    samples = ["Business Studies P1", "a/b\\c", "--Weird__ Name!!--", "MiXeD 123", "///", ""]
    df = spark.createDataFrame([(s,) for s in samples], "s string")
    got = [r["slug"] for r in df.withColumn("slug", slug_expr(F.col("s"))).orderBy("s").collect()]
    want = [slug(s) for s in sorted(samples)]
    assert got == want


def test_token_estimate_expr(spark):
    df = spark.createDataFrame([("abcd" * 10,), ("abc",), ("",)], "s string")
    got = [r["t"] for r in df.withColumn("t", token_estimate_expr(F.col("s"))).collect()]
    assert got == [10, 0, 0]


def test_classify_cascade_expr_parity(spark):
    texts = [r["text"] for r in fixtures.iter_transcripts(n_convs=25, whale_every=0) if r["text"].strip()]
    texts += [
        "MG 2024\nbody",
        "QP final\nbody",
        "x\nThis marking guideline has a model answer and mark allocation.",
        "x\n" + "y" * 3100 + " answer book appears late here",
        "nothing relevant at all",
    ]
    df = spark.createDataFrame([(t,) for t in texts], "text string")
    kind, conf, method = classify_cascade_exprs(F.col("text"), MEMO_PHRASES, QP_PHRASES)
    got = df.select(
        "text", kind.alias("kind"), conf.alias("conf"), method.alias("method")
    ).toPandas()
    for row in got.itertuples(index=False):
        w_kind, w_conf, w_method = classify_text(row.text)
        assert (row.kind, row.method) == (w_kind, w_method), row.text[:80]
        assert abs(row.conf - w_conf) < 1e-9
