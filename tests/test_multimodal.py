"""Multimodal plumbing: binary columns, typed metadata, REAL stdlib
PNG/WAV codecs (JPEG/video stubbed + gated)."""

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


# ------------------------------------------------------------- real codecs
def _gradient_rgb(h, w):
    import numpy as np

    y = np.arange(h, dtype=np.int32)[:, None]
    x = np.arange(w, dtype=np.int32)[None, :]
    g = np.zeros((h, w, 3), dtype=np.uint8)
    g[..., 0] = np.broadcast_to(y * 7 % 256, (h, w))
    g[..., 1] = np.broadcast_to(x * 11 % 256, (h, w))
    g[..., 2] = (y * 3 + x * 5) % 256
    return g


def test_png_roundtrip_every_filter_type():
    """decode_png must invert all five scanline filters; encode with each
    filter and require bit-identical pixel recovery."""
    import numpy as np

    from pdf_extraction_spark.core.codecs import decode_png, encode_png

    rng = np.random.default_rng(11)
    for ch in (1, 2, 3, 4):
        arr = rng.integers(0, 256, size=(9, 7, ch), dtype=np.uint8)
        for f in range(5):
            back = decode_png(encode_png(arr, filter_type=f))
            assert back.shape == arr.shape, (ch, f)
            assert (back == arr).all(), f"filter {f}, {ch}ch: pixel mismatch"


def test_png_malformed_raises():
    import pytest as _pytest

    from pdf_extraction_spark.core.codecs import CodecError, decode_png, encode_png

    with _pytest.raises(CodecError):
        decode_png(b"not a png at all")
    good = encode_png(_gradient_rgb(4, 4))
    corrupted = good[:-8] + b"\x00" * 8  # break the IEND CRC
    with _pytest.raises(CodecError):
        decode_png(corrupted)


def test_png_resize_nearest_exact():
    import numpy as np

    from pdf_extraction_spark.core.codecs import decode_png, encode_png, resize_nearest
    from pdf_extraction_spark.operators.multimodal import resize_image

    arr = np.array([[[0], [100]], [[200], [255]]], dtype=np.uint8)  # 2x2 gray
    up = resize_nearest(arr, 4, 4)
    # each source pixel becomes a 2x2 block under nearest-neighbor
    assert (up[:2, :2, 0] == 0).all() and (up[:2, 2:, 0] == 100).all()
    assert (up[2:, :2, 0] == 200).all() and (up[2:, 2:, 0] == 255).all()
    # end-to-end through the operator surface: PNG in → resized PNG out
    out = resize_image(encode_png(arr), 4, 4)
    assert (decode_png(out) == up).all()


def test_wav_roundtrip_and_features():
    import numpy as np

    from pdf_extraction_spark.core.codecs import decode_wav, encode_wav
    from pdf_extraction_spark.operators.multimodal import audio_features

    t = np.arange(800)
    samples = (np.sin(2 * np.pi * t / 50) * 20000).astype("int16")
    payload = encode_wav(samples, 8000)
    back, rate = decode_wav(payload)
    assert rate == 8000 and (back[:, 0] == samples).all()
    f = audio_features(payload)
    assert f[0] == 800.0 and f[1] == 1.0 and f[2] == 8000.0
    assert abs(f[3]) < 1e-3          # sine mean ~ 0
    assert 0.3 < f[4] < 0.7          # rms of a 20000/32768 sine ≈ 0.43
    assert f[7] > 0.03               # 16 sign flips / 800 samples


def test_media_features_real_codecs_end_to_end(spark):
    """The Arrow stage decodes REAL payloads (PNG + WAV) when magic bytes
    match, falls back to the md5 fake for unknown formats, and routes
    malformed payloads to a status instead of killing the task."""
    import numpy as np

    from pdf_extraction_spark.core.codecs import encode_png, encode_wav
    from pdf_extraction_spark.operators.multimodal import (
        image_features,
        media_features,
    )

    png = encode_png(_gradient_rgb(6, 5))
    wav = encode_wav((np.arange(100) % 64 * 512 - 16384).astype("int16"), 16000)
    rows = [
        (1, "image", bytearray(png), (5, 6, 0, "png")),
        (2, "audio", bytearray(wav), (0, 0, 12, "wav")),
        (3, "image", bytearray(b"\x89PNG\r\n\x1a\nGARBAGE___"), (0, 0, 0, "corrupt")),
        (4, "image", bytearray(b"plain text bytes"), (0, 0, 0, "unknown")),
    ]
    df = spark.createDataFrame(
        rows,
        "doc_id bigint, media_type string, payload binary, "
        "meta struct<width:int,height:int,duration_ms:int,codec:string>",
    )
    got = {r["doc_id"]: r for r in media_features(df, fake=True).collect()}
    assert got[1]["status"] == "ok"
    assert got[1]["features"] == image_features(png)   # real decode, exact
    assert got[1]["features"][0] == 5.0 and got[1]["features"][1] == 6.0
    assert got[2]["status"] == "ok"
    assert got[2]["features"][2] == 16000.0            # real WAV rate
    assert got[3]["status"] == "decode_error"          # poison row survives
    assert got[4]["status"] == "ok" and len(got[4]["features"]) == 8  # fake path

    # fake=False: unknown formats surface codec_unavailable, real ones decode
    got2 = {r["doc_id"]: r for r in media_features(df, fake=False).collect()}
    assert got2[1]["status"] == "ok" and got2[4]["status"] == "codec_unavailable"


def test_png_roundtrip_property():
    """Property: ANY uint8 array (1..24 in each dim, 1-4 channels) encoded
    with ANY filter type decodes back bit-identically."""
    import numpy as np
    from hypothesis import given, settings
    from hypothesis import strategies as st

    from pdf_extraction_spark.core.codecs import decode_png, encode_png

    @settings(max_examples=40, deadline=None)
    @given(
        h=st.integers(1, 24), w=st.integers(1, 24),
        ch=st.sampled_from([1, 2, 3, 4]),
        f=st.integers(0, 4),
        seed=st.integers(0, 2**31 - 1),
    )
    def check(h, w, ch, f, seed):
        arr = np.random.default_rng(seed).integers(0, 256, size=(h, w, ch), dtype=np.uint8)
        assert (decode_png(encode_png(arr, filter_type=f)) == arr).all()

    check()


def test_wav_roundtrip_property():
    import numpy as np
    from hypothesis import given, settings
    from hypothesis import strategies as st

    from pdf_extraction_spark.core.codecs import decode_wav, encode_wav

    @settings(max_examples=20, deadline=None)
    @given(n=st.integers(1, 2000), ch=st.sampled_from([1, 2]),
           rate=st.sampled_from([8000, 16000, 44100]), seed=st.integers(0, 2**31 - 1))
    def check(n, ch, rate, seed):
        s = np.random.default_rng(seed).integers(-32768, 32767, size=(n, ch)).astype("int16")
        back, r = decode_wav(encode_wav(s, rate))
        assert r == rate and back.shape == (n, ch) and (back == s).all()

    check()


def test_malformed_wav_variants_route_to_decode_error(spark):
    """Code-review regression: EVERY malformed-WAV failure mode (truncated
    chunks → EOFError, odd data-chunk length → ValueError, zero frames)
    must surface as CodecError → 'decode_error' status, never a dead task."""
    import struct

    from pdf_extraction_spark.core.codecs import encode_wav
    from pdf_extraction_spark.operators.multimodal import media_features
    import numpy as np

    good = encode_wav(np.array([1, 2, 3], dtype="int16"), 8000)
    truncated = good[:20]                                  # mid-fmt chunk
    # odd data-chunk byte count: patch the data size field to 3
    odd = bytearray(good)
    odd[-8:-4] = struct.pack("<I", 3)
    empty = encode_wav(np.zeros((0, 1), dtype="int16"), 8000)

    rows = [(1, "audio", bytearray(truncated)), (2, "audio", bytearray(bytes(odd[:-1]))),
            (3, "audio", bytearray(empty)), (4, "audio", bytearray(good))]
    df = spark.createDataFrame(rows, "doc_id long, media_type string, payload binary")
    got = {r["doc_id"]: r["status"] for r in media_features(df, fake=False).collect()}
    assert got[1] == "decode_error"
    assert got[2] == "decode_error"
    assert got[3] == "decode_error"
    assert got[4] == "ok"


def test_png_bad_ihdr_length_is_codec_error():
    import struct
    import zlib

    import pytest as _pytest

    from pdf_extraction_spark.core.codecs import PNG_MAGIC, CodecError, decode_png

    bad_ihdr = struct.pack(">IIBBBB", 2, 2, 8, 0, 0, 0)  # 12 bytes, not 13
    chunk = struct.pack(">I", len(bad_ihdr)) + b"IHDR" + bad_ihdr + struct.pack(
        ">I", zlib.crc32(b"IHDR" + bad_ihdr) & 0xFFFFFFFF
    )
    with _pytest.raises(CodecError):
        decode_png(PNG_MAGIC + chunk)
