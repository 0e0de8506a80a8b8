"""Multimodal columns: image/audio/video as opaque BINARY + typed metadata.

Design for the 100 TB case:
- media rows are ``(doc_id, media_type, payload BINARY, meta STRUCT<width,
  height, duration_ms, codec>)`` — payloads stay opaque bytes end-to-end;
  Spark never interprets them, so scans stream and column pruning can drop
  the heavy payload column whenever only metadata is needed.
- decode / feature-extract / resize / frame-sample run as Arrow-batched
  ``mapInPandas`` stages (bytes → fixed-width features), exactly like the
  text extraction stage: map-only, no shuffle, batch-size-bounded memory.
- codecs: PNG and WAV decode/resize are REAL (stdlib zlib/struct/wave —
  ``core/codecs.py``; round-trip-tested against hand-built fixtures,
  including every PNG filter type). Payloads are sniffed by magic bytes;
  formats needing external libs this container lacks (JPEG, video demux)
  remain stubbed: they raise NotImplementedError unless ``fake=True``, in
  which case a deterministic md5-derived feature vector stands in (which
  is what keeps the synthetic-corpus queries oracle-checkable in SQL).
  Swapping a stub for Pillow/pyav changes ONE function body.
"""

from __future__ import annotations

import hashlib
from typing import Iterable, Iterator, List, Optional

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from pdf_extraction_spark.sources.tables import load_testdata as T

MEDIA_SCHEMA = (
    "doc_id bigint, media_type string, payload binary, "
    "meta struct<width:int, height:int, duration_ms:int, codec:string>"
)

FEATURE_DIM = 8

FEATURES_SCHEMA = (
    "doc_id bigint, media_type string, n_bytes int, "
    f"features array<double>, status string"
)


def synth_media(spark: SparkSession, sf: str) -> DataFrame:
    """Deterministic binary media synthesized from the documents table
    (payload = utf-8 bytes of the text; media_type round-robins)."""
    docs = T(spark, sf, "documents")
    mt = F.element_at(
        F.array(F.lit("image"), F.lit("audio"), F.lit("video")),
        (F.col("doc_id") % 3 + 1).cast("int"),
    )
    meta = F.struct(
        (F.col("doc_id") % 640 + 16).cast("int").alias("width"),
        (F.col("doc_id") % 480 + 16).cast("int").alias("height"),
        (F.col("doc_id") % 10000).cast("int").alias("duration_ms"),
        F.lit("fake/deterministic").alias("codec"),
    )
    return docs.select(
        "doc_id",
        mt.alias("media_type"),
        F.encode("text", "UTF-8").alias("payload"),
        meta.alias("meta"),
    )


# ---------------------------------------------------------------- decoders

def image_features(payload: bytes) -> List[float]:
    """REAL PNG decode (core/codecs.py) → FEATURE_DIM deterministic doubles:
    [width, height, channels, mean, std, min, max, mean |∂x|] with pixel
    stats normalized to [0, 1]."""
    import numpy as np

    from pdf_extraction_spark.core.codecs import decode_png

    arr = decode_png(payload).astype(np.float64) / 255.0
    dx = np.abs(np.diff(arr, axis=1)).mean() if arr.shape[1] > 1 else 0.0
    return [
        float(arr.shape[1]), float(arr.shape[0]), float(arr.shape[2]),
        round(float(arr.mean()), 6), round(float(arr.std()), 6),
        round(float(arr.min()), 6), round(float(arr.max()), 6),
        round(float(dx), 6),
    ]


def audio_features(payload: bytes) -> List[float]:
    """REAL WAV decode (stdlib) → [n_frames, channels, rate, mean, rms,
    min, max, zero-cross rate], sample stats normalized by 2^15."""
    import numpy as np

    from pdf_extraction_spark.core.codecs import decode_wav

    samples, rate = decode_wav(payload)
    x = samples.astype(np.float64) / 32768.0
    mono = x.mean(axis=1)
    zc = float(np.mean(np.signbit(mono[1:]) != np.signbit(mono[:-1]))) if len(mono) > 1 else 0.0
    return [
        float(samples.shape[0]), float(samples.shape[1]), float(rate),
        round(float(x.mean()), 6), round(float(np.sqrt((x ** 2).mean())), 6),
        round(float(x.min()), 6), round(float(x.max()), 6), round(zc, 6),
    ]


def decode_image(payload: bytes, fake: bool = False) -> List[float]:
    """PNG payloads decode for REAL (magic-sniffed). Other formats (JPEG,
    …) need codec libs this container lacks: they raise unless ``fake=True``
    (deterministic md5-derived features — the SQL-oracle-checkable path
    for the synthetic text-bytes corpus)."""
    from pdf_extraction_spark.core.codecs import PNG_MAGIC

    if payload.startswith(PNG_MAGIC):
        return image_features(payload)
    if not fake:
        raise NotImplementedError("non-PNG image codecs not available in this environment")
    h = hashlib.md5(payload).digest()
    return [round(b / 255.0, 6) for b in h[:FEATURE_DIM]]


def resize_image(payload: bytes, width: int, height: int, fake: bool = False) -> bytes:
    """PNG payloads: REAL decode → nearest-neighbor resize → PNG re-encode.
    Other formats raise unless ``fake=True`` (length-truncation stand-in
    whose output size is closed-form for the SQL oracle)."""
    from pdf_extraction_spark.core.codecs import PNG_MAGIC, decode_png, encode_png, resize_nearest

    if payload.startswith(PNG_MAGIC):
        return encode_png(resize_nearest(decode_png(payload), width, height))
    if not fake:
        raise NotImplementedError("non-PNG image codecs not available in this environment")
    return payload[: max(1, min(len(payload), width * height))]


def sample_frames(payload: bytes, every_ms: int, duration_ms: int, fake: bool = False) -> List[bytes]:
    """STUB: real impl would demux frames via pyav."""
    if not fake:
        raise NotImplementedError("video codecs not available in this environment")
    n = max(1, duration_ms // max(1, every_ms))
    step = max(1, len(payload) // n)
    return [payload[i * step : (i + 1) * step] for i in range(n)]


def media_features(media: DataFrame, fake: bool = True) -> DataFrame:
    """bytes → feature vectors, Arrow-batched, map-only, null-safe."""

    def run(batches: Iterable[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from pdf_extraction_spark.core.codecs import CodecError

        for pdf in batches:
            feats: List[Optional[List[float]]] = []
            status: List[str] = []
            n_bytes: List[int] = []
            for payload in pdf["payload"]:
                b = bytes(payload) if payload is not None else b""
                n_bytes.append(len(b))
                if not b:
                    feats.append([])
                    status.append("empty")
                    continue
                try:
                    if b.startswith(b"RIFF") and b[8:12] == b"WAVE":
                        feats.append(audio_features(b))  # real WAV decode
                    else:
                        feats.append(decode_image(b, fake=fake))
                    status.append("ok")
                except NotImplementedError:
                    feats.append([])
                    status.append("codec_unavailable")
                except CodecError:  # malformed payload ≠ dead task (C3)
                    feats.append([])
                    status.append("decode_error")
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "media_type": pdf["media_type"],
                    "n_bytes": n_bytes,
                    "features": feats,
                    "status": status,
                }
            )

    return media.select("doc_id", "media_type", "payload").mapInPandas(run, FEATURES_SCHEMA)


def q_multimodal_features(spark: SparkSession, sf: str) -> DataFrame:
    """Feature-extraction aggregate over synthesized binary media. The fake
    decoder is md5-based, so a SQL oracle CAN verify it end-to-end."""
    from pdf_extraction_spark.parallel import fan_out

    # r7 fan_out: payload synthesis + decode is the heavy map work and the
    # documents scan is one task (guide §2.2)
    feats = media_features(fan_out(synth_media(spark, sf), "doc_id"), fake=True)
    return (
        feats.groupBy("media_type")
        .agg(
            F.count("*").alias("n"),
            F.sum("n_bytes").alias("total_bytes"),
            F.round(F.sum(F.get("features", 0)), 6).alias("sum_f0"),
            F.sum(F.when(F.col("status") == "ok", 1).otherwise(0)).alias("n_ok"),
        )
        .orderBy("media_type")
    )


_SQL_MULTIMODAL = """
WITH m AS (
  SELECT doc_id,
         CASE (doc_id % 3) WHEN 0 THEN 'image' WHEN 1 THEN 'audio' ELSE 'video' END AS media_type,
         octet_length(encode(text)) AS n_bytes,
         -- DuckDB md5(VARCHAR) hashes the utf-8 encoding == md5 of payload bytes
         round(CAST(('0x' || substr(md5(text), 1, 2))::INTEGER AS DOUBLE) / 255.0, 6) AS f0
  FROM documents
)
SELECT media_type, count(*) AS n, CAST(sum(n_bytes) AS BIGINT) AS total_bytes,
       round(sum(f0), 6) AS sum_f0,
       count(*) AS n_ok
FROM m GROUP BY media_type ORDER BY media_type
"""


TRANSFORM_SCHEMA = (
    "doc_id bigint, media_type string, out_bytes bigint, n_frames int"
)

FRAME_EVERY_MS = 250


def media_transform_stats(media: DataFrame, fake: bool = True) -> DataFrame:
    """The resize / frame-sample plumbing as one Arrow-batched map-only
    stage: images are resized to their meta (width, height), videos are
    frame-sampled every FRAME_EVERY_MS over meta.duration_ms, audio passes
    through. Emits size/count stats so the deterministic fakes are
    oracle-checkable (their output sizes are closed-form in the input
    length — swapping in real codecs keeps the stage shape)."""

    def run(batches: Iterable[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out_bytes: List[int] = []
            n_frames: List[int] = []
            for payload, mt, meta in zip(pdf["payload"], pdf["media_type"], pdf["meta"]):
                b = bytes(payload) if payload is not None else b""
                if mt == "image":
                    out = resize_image(b, meta["width"], meta["height"], fake=fake)
                    out_bytes.append(len(out))
                    n_frames.append(1)
                elif mt == "video":
                    frames = sample_frames(b, FRAME_EVERY_MS, meta["duration_ms"], fake=fake)
                    out_bytes.append(sum(len(f) for f in frames))
                    n_frames.append(len(frames))
                else:  # audio: passthrough
                    out_bytes.append(len(b))
                    n_frames.append(1)
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "media_type": pdf["media_type"],
                    "out_bytes": out_bytes,
                    "n_frames": n_frames,
                }
            )

    return media.select("doc_id", "media_type", "payload", "meta").mapInPandas(
        run, TRANSFORM_SCHEMA
    )


def q_multimodal_transform(spark: SparkSession, sf: str) -> DataFrame:
    stats = media_transform_stats(synth_media(spark, sf), fake=True)
    return (
        stats.groupBy("media_type")
        .agg(
            F.count("*").alias("n"),
            F.sum("out_bytes").alias("total_out_bytes"),
            F.sum("n_frames").alias("total_frames"),
        )
        .orderBy("media_type")
    )


# The fakes' output sizes are closed-form in octet_length(payload):
#   resize  → payload[:max(1, min(nb, w*h))]           → min(nb, w*h) bytes
#   frames  → n = max(1, dur//250); step = max(1, nb//n);
#             Σ len(payload[i*step:(i+1)*step])        → min(n*step, nb)
_SQL_MULTIMODAL_TRANSFORM = f"""
WITH m AS (
  SELECT doc_id,
         CASE (doc_id % 3) WHEN 0 THEN 'image' WHEN 1 THEN 'audio' ELSE 'video' END AS media_type,
         octet_length(encode(text)) AS nb,
         doc_id % 640 + 16 AS w, doc_id % 480 + 16 AS h,
         doc_id % 10000 AS dur
  FROM documents
), t AS (
  SELECT media_type,
    CASE media_type
      WHEN 'image' THEN least(nb, w * h)
      WHEN 'video' THEN least(greatest(1, dur // {FRAME_EVERY_MS})
                              * greatest(1, nb // greatest(1, dur // {FRAME_EVERY_MS})), nb)
      ELSE nb END AS out_bytes,
    CASE media_type WHEN 'video' THEN greatest(1, dur // {FRAME_EVERY_MS}) ELSE 1 END AS n_frames
  FROM m
)
SELECT media_type, count(*) AS n,
       CAST(sum(out_bytes) AS BIGINT) AS total_out_bytes,
       CAST(sum(n_frames) AS BIGINT) AS total_frames
FROM t GROUP BY media_type ORDER BY media_type
"""


QUERIES = {
    "multimodal_features": (q_multimodal_features, _SQL_MULTIMODAL),
    "multimodal_transform": (q_multimodal_transform, _SQL_MULTIMODAL_TRANSFORM),
}
