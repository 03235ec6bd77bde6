"""Multimodal column plumbing: image/audio/video as opaque binary + metadata.

Reference lineage: image preprocessing (arkham-shard-ingest/workers/
image_worker.py:212-687 — resize/deskew/denoise via PIL/cv2) and OCR
(arkham-shard-ocr/workers/paddle_worker.py:123-293). Neither PIL, cv2, nor
any codec library exists in this container, so the DECODE step is a
clearly-marked deterministic fake (or NotImplementedError when
``strict=True``) — but everything Spark-side is real and tested: schemas,
Arrow batch shape, mapInPandas signatures, partitioning, and the
model-singleton pattern the reference uses per worker process
(ner_worker.py:72-111 lazy model loading ≡ module-level init inside the UDF).

Swap `_decode_image_stub` for a real PIL/cv2 call and nothing else changes.
"""

from __future__ import annotations

import hashlib
from typing import Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql.types import (
    ArrayType,
    BinaryType,
    DoubleType,
    IntegerType,
    StringType,
    StructField,
    StructType,
)

STRICT_DEFAULT = False

MEDIA_SCHEMA = StructType(
    [
        StructField("media_id", StringType(), False),
        StructField("media_type", StringType(), False),  # image | audio | video
        StructField("payload", BinaryType(), True),
        StructField("mime", StringType(), True),
        StructField("width", IntegerType(), True),
        StructField("height", IntegerType(), True),
        StructField("duration_s", DoubleType(), True),
    ]
)

IMAGE_FEATURES_SCHEMA = StructType(
    [
        StructField("media_id", StringType(), False),
        StructField("width", IntegerType(), True),
        StructField("height", IntegerType(), True),
        StructField("feature", ArrayType(DoubleType()), True),
        StructField("error", StringType(), True),
    ]
)

FRAME_SAMPLE_SCHEMA = StructType(
    [
        StructField("media_id", StringType(), False),
        StructField("frame_index", IntegerType(), False),
        StructField("frame_ts_s", DoubleType(), False),
        StructField("frame_digest", StringType(), False),
    ]
)


def _decode_image_stub(payload: bytes, strict: bool) -> tuple[int, int, list[float]]:
    """STUB decode: no image codec in this container.

    strict=True raises NotImplementedError (production would call
    PIL.Image.open). The fake is deterministic in the payload bytes so tests
    exercise the full distributed plumbing with stable assertions: dims from
    the digest, 8-dim feature = normalized digest bytes.
    """
    if strict:
        raise NotImplementedError("image decode requires PIL/cv2 (not in sandbox)")
    digest = hashlib.sha256(payload).digest()
    width = 64 + digest[0] % 192
    height = 64 + digest[1] % 192
    feature = [b / 255.0 for b in digest[2:10]]
    return width, height, feature


def extract_image_features(
    media: DataFrame, batch_hint: int = 256, strict: bool = STRICT_DEFAULT
) -> DataFrame:
    """media(image rows) → (media_id, width, height, feature[8], error).

    The per-executor "model" is initialized once per python worker (the
    reference's lazy-singleton pattern); errors quarantine per row.
    """

    from ..shipping import ensure_shipped

    ensure_shipped(media.sparkSession)

    def _run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        _model_loaded = {"init": True}  # singleton seam: load weights here once

        for pdf in batches:
            rows = []
            for mid, payload in zip(pdf["media_id"].tolist(), pdf["payload"].tolist()):
                try:
                    if payload is None:
                        raise ValueError("empty payload")
                    w, h, feat = _decode_image_stub(bytes(payload), strict)
                    rows.append(
                        {"media_id": mid, "width": w, "height": h,
                         "feature": feat, "error": None}
                    )
                except Exception as exc:
                    rows.append(
                        {"media_id": mid, "width": None, "height": None,
                         "feature": None, "error": f"{type(exc).__name__}: {exc}"}
                    )
            yield pd.DataFrame(rows, columns=[f.name for f in IMAGE_FEATURES_SCHEMA.fields])

    return media.where("media_type = 'image'").select("media_id", "payload").mapInPandas(
        _run, IMAGE_FEATURES_SCHEMA
    )


def sample_video_frames(
    media: DataFrame, fps: float = 1.0, max_frames: int = 16
) -> DataFrame:
    """Frame sampling plan for video rows: deterministic frame timestamps from
    duration (decode stubbed — digests derive from payload+index)."""

    from ..shipping import ensure_shipped

    ensure_shipped(media.sparkSession)

    def _run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for mid, payload, dur in zip(
                pdf["media_id"].tolist(), pdf["payload"].tolist(), pdf["duration_s"].tolist()
            ):
                if payload is None or dur is None or dur <= 0:
                    continue
                n = min(max_frames, max(1, int(dur * fps)))
                base = hashlib.sha256(bytes(payload)).hexdigest()[:16]
                for i in range(n):
                    rows.append(
                        {
                            "media_id": mid,
                            "frame_index": i,
                            "frame_ts_s": round(i / fps, 3),
                            "frame_digest": hashlib.sha256(
                                f"{base}:{i}".encode()
                            ).hexdigest()[:16],
                        }
                    )
            yield pd.DataFrame(rows, columns=[f.name for f in FRAME_SAMPLE_SCHEMA.fields])

    return media.where("media_type = 'video'").select(
        "media_id", "payload", "duration_s"
    ).mapInPandas(_run, FRAME_SAMPLE_SCHEMA)


AUDIO_FEATURES_SCHEMA = StructType(
    [
        StructField("media_id", StringType(), False),
        StructField("sample_rate", IntegerType(), True),
        StructField("channels", IntegerType(), True),
        StructField("bits", IntegerType(), True),
        StructField("duration_s", DoubleType(), True),
        StructField("rms", DoubleType(), True),
        StructField("peak", DoubleType(), True),
        StructField("error", StringType(), True),
    ]
)


def _decode_wav(payload: bytes) -> dict:
    """REAL decode for PCM WAV (RIFF) — stdlib struct + numpy, no codec
    library needed. Non-RIFF payloads (mp3/ogg/...) raise and quarantine;
    swapping in a real codec extends the format set, same seam as images."""
    import struct

    import numpy as np

    if payload[:4] != b"RIFF" or payload[8:12] != b"WAVE":
        raise ValueError("not a RIFF/WAVE payload")
    pos = 12
    fmt = None
    data = None
    while pos + 8 <= len(payload):
        cid, size = payload[pos : pos + 4], struct.unpack(
            "<I", payload[pos + 4 : pos + 8]
        )[0]
        body = payload[pos + 8 : pos + 8 + size]
        if cid == b"fmt ":
            fmt = struct.unpack("<HHIIHH", body[:16])
        elif cid == b"data":
            data = body
        pos += 8 + size + (size & 1)  # chunks are word-aligned
    if fmt is None or data is None:
        raise ValueError("missing fmt/data chunk")
    _audio_fmt, channels, rate, _bps, _align, bits = fmt
    if bits == 16:
        samples = np.frombuffer(data, dtype="<i2").astype(np.float64) / 32768.0
    elif bits == 8:
        samples = (np.frombuffer(data, dtype="u1").astype(np.float64) - 128.0) / 128.0
    else:
        raise ValueError(f"unsupported bit depth {bits}")
    n_frames = len(samples) // max(1, channels)
    return {
        "sample_rate": int(rate),
        "channels": int(channels),
        "bits": int(bits),
        "duration_s": round(n_frames / rate, 6) if rate else None,
        "rms": float(np.sqrt(np.mean(samples**2))) if len(samples) else 0.0,
        "peak": float(np.max(np.abs(samples))) if len(samples) else 0.0,
    }


def extract_audio_features(media: DataFrame) -> DataFrame:
    """audio rows → (sample_rate, channels, bits, duration, rms, peak).

    Unlike the image path, this decode is REAL: PCM WAV needs only stdlib
    RIFF parsing + numpy. Undecodable payloads quarantine per row."""
    from ..shipping import ensure_shipped

    ensure_shipped(media.sparkSession)
    names = [f.name for f in AUDIO_FEATURES_SCHEMA.fields]

    def _run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for mid, payload in zip(pdf["media_id"].tolist(), pdf["payload"].tolist()):
                try:
                    if payload is None:
                        raise ValueError("empty payload")
                    rows.append({"media_id": mid, **_decode_wav(bytes(payload)), "error": None})
                except Exception as exc:
                    rows.append(
                        {"media_id": mid, "sample_rate": None, "channels": None,
                         "bits": None, "duration_s": None, "rms": None,
                         "peak": None, "error": f"{type(exc).__name__}: {exc}"}
                    )
            yield pd.DataFrame(rows, columns=names)

    return media.where("media_type = 'audio'").select("media_id", "payload").mapInPandas(
        _run, AUDIO_FEATURES_SCHEMA
    )
