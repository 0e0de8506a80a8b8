"""Multimodal plumbing: binary columns, typed metadata, stubbed decoders."""

import pytest
from pyspark.sql import functions as F

from pdf_extraction_spark.operators.multimodal import (
    FEATURE_DIM,
    decode_image,
    media_features,
    resize_image,
    sample_frames,
    synth_media,
)

SF = "/root/testdata/sf0.001"


def test_stubs_raise_without_codec():
    for fn in (lambda: decode_image(b"x"),
               lambda: resize_image(b"x", 2, 2),
               lambda: sample_frames(b"x", 10, 100)):
        with pytest.raises(NotImplementedError):
            fn()


def test_fake_decoder_deterministic():
    a = decode_image(b"payload", fake=True)
    assert a == decode_image(b"payload", fake=True)
    assert len(a) == FEATURE_DIM
    assert all(0.0 <= v <= 1.0 for v in a)


def test_media_schema_and_features(spark):
    media = synth_media(spark, SF)
    assert dict(media.dtypes)["payload"] == "binary"
    assert dict(media.dtypes)["meta"].startswith("struct<width:int")

    feats = media_features(media, fake=True)
    rows = feats.limit(20).collect()
    assert rows
    for r in rows:
        assert r["status"] == "ok"
        assert len(r["features"]) == FEATURE_DIM
        assert r["n_bytes"] > 0


def test_null_and_empty_payloads(spark):
    df = spark.createDataFrame(
        [(1, "image", b""), (2, "image", None), (3, "image", b"abc")],
        "doc_id long, media_type string, payload binary",
    )
    out = {r["doc_id"]: r for r in media_features(df, fake=True).collect()}
    assert out[1]["status"] == "empty" and out[1]["features"] == []
    assert out[2]["status"] == "empty"
    assert out[3]["status"] == "ok"


def test_codec_unavailable_path(spark):
    df = spark.createDataFrame([(1, "image", b"abc")],
                               "doc_id long, media_type string, payload binary")
    out = media_features(df, fake=False).collect()[0]
    assert out["status"] == "codec_unavailable"
    assert out["features"] == []


def test_metadata_only_scan_prunes_payload(spark, tmp_path):
    """Column pruning: a metadata-only query must not read the payload."""
    p = str(tmp_path / "media")
    synth_media(spark, SF).write.parquet(p)
    q = spark.read.parquet(p).select("doc_id", "meta.width").filter(F.col("doc_id") < 10)
    plan = q._sc._jvm.PythonSQLUtils.explainString(q._jdf.queryExecution(), "formatted")
    read = [l for l in plan.splitlines() if l.startswith("ReadSchema")][0]
    assert "payload" not in read


def test_transform_stats_resize_and_frames(spark):
    """Resize / frame-sample plumbing: output sizes match the deterministic
    fakes' closed forms per media type."""
    from pdf_extraction_spark.operators.multimodal import (
        FRAME_EVERY_MS,
        media_transform_stats,
        synth_media,
    )

    media = synth_media(spark, "/root/testdata/sf0.001")
    rows = {r["doc_id"]: r for r in media_transform_stats(media, fake=True).collect()}
    src = {r["doc_id"]: r for r in media.collect()}
    assert rows.keys() == src.keys()
    for doc_id, r in rows.items():
        nb = len(bytes(src[doc_id]["payload"]))
        meta = src[doc_id]["meta"]
        if r["media_type"] == "image":
            assert r["out_bytes"] == min(nb, meta["width"] * meta["height"])
            assert r["n_frames"] == 1
        elif r["media_type"] == "video":
            n = max(1, meta["duration_ms"] // FRAME_EVERY_MS)
            step = max(1, nb // n)
            assert r["n_frames"] == n
            assert r["out_bytes"] == min(n * step, nb)
        else:
            assert r["out_bytes"] == nb
