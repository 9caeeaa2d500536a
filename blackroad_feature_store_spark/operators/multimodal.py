"""Multimodal column plumbing: image/audio/video as opaque binary
columns with typed metadata.

The container has no image/audio codecs, so the decode kernels are
STUBBED (clearly marked below): ``decode_image``/``decode_audio`` raise
``NotImplementedError`` unless ``fake=True``, in which case they emit a
deterministic fake derived from the payload bytes — which keeps the
Spark-side plumbing (schema, Arrow batch shape, mapInPandas
partitioning) fully real and testable.

Design for 100 TB:
* assets live in an ``assets`` table: (asset_id, modality,
  content:binary, meta:map<string,string>) — binary payloads stay
  opaque to Catalyst, metadata is queryable/prunable.
* kernels run via ``mapInPandas`` so each Arrow batch crosses the
  Python boundary once; per-batch vectorized work, never per-row.
* frame sampling / resizing are *projections* — they shrink data early,
  before any shuffle.
"""

from __future__ import annotations

import hashlib
from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

ASSET_SCHEMA = T.StructType(
    [
        T.StructField("asset_id", T.LongType()),
        T.StructField("modality", T.StringType()),  # image|audio|video|text
        T.StructField("content", T.BinaryType()),
        T.StructField("meta", T.MapType(T.StringType(), T.StringType())),
    ]
)

IMAGE_FEATURES_SCHEMA = T.StructType(
    [
        T.StructField("asset_id", T.LongType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("n_bytes", T.LongType()),
        T.StructField("sha256", T.StringType()),
    ]
)


def documents_as_assets(documents: DataFrame) -> DataFrame:
    """Wrap the documents table as binary assets (the text payload as
    bytes) — the ingestion shape a real image/audio corpus would use."""
    return documents.select(
        F.col("doc_id").alias("asset_id"),
        F.lit("text").alias("modality"),
        F.encode("text", "UTF-8").alias("content"),
        F.create_map(
            F.lit("lang"), F.col("lang"), F.lit("source"), F.col("source")
        ).alias("meta"),
    )


def _fake_decode_dims(payload: bytes) -> tuple[int, int]:
    """Deterministic fake decoder: dimensions derived from a payload
    digest. STUB — replace with PIL/libvips in a codec-enabled image."""
    d = hashlib.sha256(payload).digest()
    return 64 + d[0] % 192, 64 + d[1] % 192


def image_features(assets: DataFrame, fake: bool = True) -> DataFrame:
    """Per-asset decoded image features via mapInPandas (one Arrow
    batch per call; vectorized inside).

    With ``fake=False`` this raises NotImplementedError from the
    executors — the real decode needs PIL/libvips, absent here.
    """

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if not fake:
                # STUB: no image codec in this container.
                raise NotImplementedError(
                    "image decode requires PIL/libvips; run with fake=True"
                )
            dims = [_fake_decode_dims(bytes(b)) for b in pdf["content"]]
            yield pd.DataFrame(
                {
                    "asset_id": pdf["asset_id"],
                    "width": [w for w, _ in dims],
                    "height": [h for _, h in dims],
                    "n_bytes": [len(bytes(b)) for b in pdf["content"]],
                    "sha256": [
                        hashlib.sha256(bytes(b)).hexdigest()
                        for b in pdf["content"]
                    ],
                }
            )

    return assets.mapInPandas(kernel, IMAGE_FEATURES_SCHEMA)


def asset_metadata(assets: DataFrame) -> DataFrame:
    """Pure-SQL metadata projection over binary payloads (no decode):
    byte length + md5 + metadata fields. This is the oracle-checkable
    part of the multimodal path."""
    return assets.select(
        "asset_id",
        "modality",
        F.octet_length("content").alias("n_bytes"),
        F.md5("content").alias("content_md5"),
        F.element_at("meta", "lang").alias("meta_lang"),
        F.element_at("meta", "source").alias("meta_source"),
    )


def sample_frames(
    assets: DataFrame, every_n_bytes: int = 1024, max_frames: int = 8
) -> DataFrame:
    """'Frame sampling' plumbing: slice the binary payload at a fixed
    stride into at most ``max_frames`` chunks (what a video pipeline
    does with keyframes). Pure built-ins: substring on binary."""
    idx = F.explode(
        F.sequence(
            F.lit(0),
            F.least(
                F.lit(max_frames - 1),
                (F.octet_length("content") / every_n_bytes).cast("int"),
            ),
        )
    ).alias("frame_no")
    return assets.select("asset_id", idx, "content").select(
        "asset_id",
        "frame_no",
        F.substring(
            F.col("content"), F.col("frame_no") * every_n_bytes + 1, every_n_bytes
        ).alias("frame_bytes"),
    )


AUDIO_FEATURES_SCHEMA = T.StructType(
    [
        T.StructField("asset_id", T.LongType()),
        T.StructField("sample_rate", T.IntegerType()),
        T.StructField("duration_ms", T.LongType()),
        T.StructField("rms", T.DoubleType()),
        T.StructField("n_bytes", T.LongType()),
        T.StructField("sha256", T.StringType()),
    ]
)


def _fake_decode_audio(payload: bytes) -> tuple[int, int, float]:
    """Deterministic fake audio decoder: (sample_rate, duration_ms,
    rms) derived from a payload digest. STUB — replace with
    soundfile/librosa in a codec-enabled image."""
    d = hashlib.sha256(payload).digest()
    rate = (8000, 16000, 22050, 44100)[d[0] % 4]
    duration_ms = 500 + int.from_bytes(d[1:3], "big") % 59500
    rms = round((d[3] / 255.0) * 0.5 + 0.01, 6)
    return rate, duration_ms, rms


def audio_features(assets: DataFrame, fake: bool = True) -> DataFrame:
    """Per-asset decoded audio features (sample rate, duration, RMS
    loudness) via mapInPandas — same Arrow-batch shape as
    ``image_features``; the decode kernel is the only stub.

    With ``fake=False`` this raises NotImplementedError from the
    executors — the real decode needs soundfile/librosa, absent here.
    """

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if not fake:
                # STUB: no audio codec in this container.
                raise NotImplementedError(
                    "audio decode requires soundfile/librosa; "
                    "run with fake=True"
                )
            decoded = [_fake_decode_audio(bytes(b)) for b in pdf["content"]]
            yield pd.DataFrame(
                {
                    "asset_id": pdf["asset_id"],
                    "sample_rate": [r for r, _, _ in decoded],
                    "duration_ms": [m for _, m, _ in decoded],
                    "rms": [v for _, _, v in decoded],
                    "n_bytes": [len(bytes(b)) for b in pdf["content"]],
                    "sha256": [
                        hashlib.sha256(bytes(b)).hexdigest()
                        for b in pdf["content"]
                    ],
                }
            )

    return assets.mapInPandas(kernel, AUDIO_FEATURES_SCHEMA)


RESIZED_SCHEMA = T.StructType(
    [
        T.StructField("asset_id", T.LongType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("content", T.BinaryType()),
        T.StructField("n_bytes", T.LongType()),
    ]
)


def resize_images(
    assets: DataFrame, width: int = 224, height: int = 224, fake: bool = True
) -> DataFrame:
    """Batch image resize via mapInPandas — the preprocessing step a
    vision-training pipeline runs between decode and feature
    extraction. Output rows carry the target dimensions and the
    resized payload as binary.

    The resample kernel is STUBBED (no codec in this container): with
    ``fake=True`` the "resized" payload is a deterministic function of
    (payload digest, target dims) sized ~width*height/64 bytes, so the
    Spark-side contract — Arrow batch shape, binary output column,
    downstream writability — is fully real and testable. With
    ``fake=False`` it raises NotImplementedError from the executors.
    """

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if not fake:
                # STUB: no image codec in this container.
                raise NotImplementedError(
                    "image resize requires PIL/libvips; run with fake=True"
                )
            out_bytes = []
            for b in pdf["content"]:
                seed = hashlib.sha256(
                    bytes(b) + f":{width}x{height}".encode()
                ).digest()
                reps = max(1, (width * height) // (64 * len(seed)))
                out_bytes.append(seed * reps)
            yield pd.DataFrame(
                {
                    "asset_id": pdf["asset_id"],
                    "width": [width] * len(pdf),
                    "height": [height] * len(pdf),
                    "content": out_bytes,
                    "n_bytes": [len(x) for x in out_bytes],
                }
            )

    return assets.mapInPandas(kernel, RESIZED_SCHEMA)
