"""Multimodal column plumbing: image/audio/video as opaque binary
columns with typed metadata.

Each kernel has two modes:

* ``fake=True`` (default): a deterministic fake derived from the
  payload digest — hash-stable, so the DuckDB oracles can replicate it
  exactly; the Spark-side plumbing (schema, Arrow batch shape,
  mapInPandas partitioning) is identical to the real path.
* ``fake=False``: REAL decode via :mod:`.codecs` — PIL / soundfile
  when importable, else the built-in pure stdlib+numpy codecs (full
  PNG decode/encode + resize, JPEG/GIF/BMP/PPM header dims, PCM WAV
  with numpy RMS). Undecodable payloads yield NULL feature columns
  instead of failing the job — at 100 TB a corrupt file must not kill
  the pipeline; filter ``width IS NULL`` downstream to quarantine.

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
    digest (oracle-replicable; same output shape as the real path)."""
    d = hashlib.sha256(payload).digest()
    return 64 + d[0] % 192, 64 + d[1] % 192


def image_features(assets: DataFrame, fake: bool = True) -> DataFrame:
    """Per-asset decoded image features via mapInPandas (one Arrow
    batch per call; vectorized inside).

    ``fake=False`` reads REAL container headers
    (:func:`codecs.sniff_image_dims`: PNG/JPEG/GIF/BMP/PPM, or any
    PIL format when PIL is importable) — header-only, so the kernel
    stays O(bytes hashed) per asset even for multi-MB payloads;
    unrecognized payloads get NULL dims."""

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from . import codecs

        for pdf in batches:
            payloads = [bytes(b) for b in pdf["content"]]
            if fake:
                # Never null — plain lists convert to Arrow faster
                # than nullable extension arrays.
                dims: list[tuple] = [_fake_decode_dims(p) for p in payloads]
                width, height = (
                    [w for w, _ in dims], [h for _, h in dims],
                )
            else:
                dims = [
                    codecs.sniff_image_dims(p) or (None, None)
                    for p in payloads
                ]
                width = pd.array([w for w, _ in dims], dtype="Int32")
                height = pd.array([h for _, h in dims], dtype="Int32")
            yield pd.DataFrame(
                {
                    "asset_id": pdf["asset_id"],
                    "width": width,
                    "height": height,
                    "n_bytes": [len(p) for p in payloads],
                    "sha256": [
                        hashlib.sha256(p).hexdigest() for p in payloads
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
    rms) derived from a payload digest (oracle-replicable)."""
    d = hashlib.sha256(payload).digest()
    rate = (8000, 16000, 22050, 44100)[d[0] % 4]
    duration_ms = 500 + int.from_bytes(d[1:3], "big") % 59500
    rms = round((d[3] / 255.0) * 0.5 + 0.01, 6)
    return rate, duration_ms, rms


def audio_features(assets: DataFrame, fake: bool = True) -> DataFrame:
    """Per-asset decoded audio features (sample rate, duration, RMS
    loudness) via mapInPandas — same Arrow-batch shape as
    ``image_features``.

    ``fake=False`` REALLY decodes PCM WAV (stdlib ``wave`` + numpy
    full-scale-normalized RMS; soundfile instead when importable,
    which also admits FLAC/OGG) — :func:`codecs.decode_wav`.
    Undecodable payloads get NULL features."""

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from . import codecs

        for pdf in batches:
            payloads = [bytes(b) for b in pdf["content"]]
            if fake:
                # Never null — plain lists convert to Arrow faster
                # than nullable extension arrays.
                decoded: list[tuple] = [_fake_decode_audio(p) for p in payloads]
                rate_col: object = [r for r, _, _ in decoded]
                dur_col: object = [m for _, m, _ in decoded]
                rms_col: object = [v for _, _, v in decoded]
            else:
                decoded = []
                for p in payloads:
                    try:
                        decoded.append(codecs.decode_wav(p))
                    except ValueError:
                        decoded.append((None, None, None))
                rate_col = pd.array([r for r, _, _ in decoded], dtype="Int32")
                dur_col = pd.array([m for _, m, _ in decoded], dtype="Int64")
                rms_col = pd.array([v for _, _, v in decoded], dtype="Float64")
            yield pd.DataFrame(
                {
                    "asset_id": pdf["asset_id"],
                    "sample_rate": rate_col,
                    "duration_ms": dur_col,
                    "rms": rms_col,
                    "n_bytes": [len(p) for p in payloads],
                    "sha256": [
                        hashlib.sha256(p).hexdigest() for p in payloads
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

    ``fake=True``: the "resized" payload is a deterministic function
    of (payload digest, target dims) — oracle-replicable plumbing.
    ``fake=False``: REAL resample — pixel-decode
    (:func:`codecs.decode_image`: PIL when importable, else the pure
    PNG decoder), nearest-neighbor resize, re-encode as PNG.
    Undecodable payloads get NULL content."""

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from . import codecs

        for pdf in batches:
            out_bytes: list = []
            for b in pdf["content"]:
                payload = bytes(b)
                if fake:
                    seed = hashlib.sha256(
                        payload + f":{width}x{height}".encode()
                    ).digest()
                    reps = max(1, (width * height) // (64 * len(seed)))
                    out_bytes.append(seed * reps)
                else:
                    try:
                        img = codecs.decode_image(payload)
                        out_bytes.append(
                            codecs.encode_png(
                                codecs.resize_nearest(img, width, height)
                            )
                        )
                    except ValueError:
                        out_bytes.append(None)
            yield pd.DataFrame(
                {
                    "asset_id": pdf["asset_id"],
                    "width": [width] * len(pdf),
                    "height": [height] * len(pdf),
                    "content": out_bytes,
                    "n_bytes": pd.array(
                        [len(x) if x is not None else None for x in out_bytes],
                        dtype="Int64",
                    ),
                }
            )

    return assets.mapInPandas(kernel, RESIZED_SCHEMA)


DHASH_SCHEMA = "asset_id long, dhash long"


def image_dhash(assets: DataFrame, fake: bool = True) -> DataFrame:
    """Perceptual difference-hash per image asset — the standard
    near-duplicate signature for images (dHash: grayscale → 9×8
    resample → 64 horizontal-gradient sign bits). Re-encoded,
    resized, or slightly-edited copies land within a few bits of each
    other, which exact sha256 dedup can never see.

    ``fake=True`` derives a deterministic 64-bit stand-in from the
    payload digest (same output shape, oracle-replicable);
    ``fake=False`` REALLY decodes (:func:`codecs.decode_image` — PIL
    when importable, pure-PNG fallback) and computes the true dHash;
    undecodable payloads yield NULL and simply drop out of pair
    generation — a corrupt file never kills the pipeline.
    """

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        from . import codecs

        for pdf in batches:
            out = []
            for b in pdf["content"]:
                p = bytes(b)
                if fake:
                    d = hashlib.sha256(p).digest()
                    out.append(
                        int.from_bytes(d[:8], "big", signed=True)
                    )
                    continue
                try:
                    img = codecs.decode_image(p)
                except ValueError:
                    out.append(None)
                    continue
                gray = (
                    img.astype(np.float64).mean(axis=2)
                    if img.ndim == 3
                    else img.astype(np.float64)
                )
                small = codecs.resize_nearest(
                    gray.astype(np.uint8), 9, 8
                ).astype(np.int16)
                bits = (small[:, 1:] > small[:, :-1]).flatten()
                h = 0
                for bit in bits:
                    h = (h << 1) | int(bit)
                # to signed 64-bit
                if h >= 1 << 63:
                    h -= 1 << 64
                out.append(h)
            yield pd.DataFrame(
                {
                    "asset_id": pdf["asset_id"],
                    "dhash": pd.array(out, dtype="Int64"),
                }
            )

    return assets.mapInPandas(kernel, DHASH_SCHEMA)


def dhash_duplicate_pairs(
    hashes: DataFrame,
    max_distance: int = 3,
    bands: int = 4,
    id_col: str = "asset_id",
    hash_col: str = "dhash",
) -> DataFrame:
    """Near-duplicate image pairs by dHash hamming distance, at scale:
    the 64-bit hash splits into ``bands`` equal bands; candidates
    share at least one exact band (a self equi-join on (band index,
    band value) — never all-pairs), then the true distance filter
    ``bit_count(a XOR b) <= max_distance`` verifies. Pigeonhole: with
    ``max_distance < bands`` a true pair ALWAYS shares an intact band,
    so recall is exact, not probabilistic (the simhash trick applied
    to image signatures).
    """
    if not 64 % bands == 0:
        raise ValueError("bands must divide 64")
    width = 64 // bands
    mask = (1 << width) - 1
    h = hashes.where(F.col(hash_col).isNotNull()).select(
        F.col(id_col), F.col(hash_col)
    )
    banded = h.select(
        id_col,
        hash_col,
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(b).alias("band"),
                        F.shiftrightunsigned(F.col(hash_col), b * width)
                        .bitwiseAND(F.lit(mask))
                        .alias("val"),
                    )
                    for b in range(bands)
                ]
            )
        ).alias("__b"),
    ).select(id_col, hash_col, "__b.band", "__b.val")
    a, b = banded.alias("a"), banded.alias("b")
    dist = F.bit_count(
        F.col(f"a.{hash_col}").bitwiseXOR(F.col(f"b.{hash_col}"))
    )
    return (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.val") == F.col("b.val"))
            & (F.col(f"a.{id_col}") < F.col(f"b.{id_col}")),
        )
        .select(
            F.col(f"a.{id_col}").alias("id_a"),
            F.col(f"b.{id_col}").alias("id_b"),
            dist.alias("distance"),
        )
        .where(F.col("distance") <= max_distance)
        .distinct()
    )
