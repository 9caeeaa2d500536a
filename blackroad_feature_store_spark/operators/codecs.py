"""Real (non-fake) media codecs for the multimodal kernels.

The container has no PIL/soundfile, but "real decode" does not need
them for the formats a training pipeline actually meets first:

* **PNG** is zlib + five per-row byte filters — both published in the
  PNG spec (RFC 2083) — so this module carries a complete pure
  stdlib+numpy decoder AND encoder for 8-bit gray / gray+alpha / RGB /
  RGBA / palette, non-interlaced images. Enough to decode, resize, and
  re-encode real pixels end-to-end.
* **JPEG / GIF / BMP / PPM** dimensions are plain header fields; the
  sniffer reads them without a full pixel decode (pixel decode of
  JPEG genuinely needs a codec — that path upgrades to PIL when
  importable).
* **WAV** is stdlib ``wave`` + numpy for sample math (RMS loudness).

When PIL / soundfile ARE importable they take precedence, widening the
accepted formats; these pure decoders are the fallback, so
``fake=False`` works out of the box in this container. The reference
stores no media at all (its values are JSON scalars,
feature_store.py:80-104); this module is part of the
beyond-the-reference LLM-pipeline surface.
"""

from __future__ import annotations

import io
import struct
import wave
import zlib
from typing import Optional

import numpy as np

try:  # optional, preferred when present
    from PIL import Image as _PIL_Image  # type: ignore
except ImportError:
    _PIL_Image = None

try:  # optional, preferred when present
    import soundfile as _soundfile  # type: ignore
except ImportError:
    _soundfile = None

PNG_SIG = b"\x89PNG\r\n\x1a\n"

# PNG color type -> samples per pixel (before palette expansion)
_PNG_CHANNELS = {0: 1, 2: 3, 3: 1, 4: 2, 6: 4}


# ---------------------------------------------------------------------------
# Dimension sniffing (header-only, no pixel decode)
# ---------------------------------------------------------------------------


def sniff_image_dims(payload: bytes) -> Optional[tuple[int, int]]:
    """(width, height) from the container header of PNG / JPEG / GIF /
    BMP / binary-PPM payloads; None when the format is unrecognized.
    Header-only: O(1) bytes examined except JPEG's marker walk."""
    if _PIL_Image is not None:
        try:
            with _PIL_Image.open(io.BytesIO(payload)) as im:
                return int(im.width), int(im.height)
        except Exception:
            return None
    n = len(payload)
    if n >= 24 and payload[:8] == PNG_SIG and payload[12:16] == b"IHDR":
        w, h = struct.unpack(">II", payload[16:24])
        return w, h
    if n >= 4 and payload[:2] == b"\xff\xd8":  # JPEG: walk to a SOF marker
        i = 2
        while i + 9 <= n:
            if payload[i] != 0xFF:
                i += 1
                continue
            marker = payload[i + 1]
            if marker == 0xFF:
                # 0xFF fill/padding byte before a marker — skip it;
                # treating it as a segment would consume two pad bytes
                # as a bogus length and derail the walk.
                i += 1
                continue
            if marker in (0xD8, 0x01) or 0xD0 <= marker <= 0xD7:
                i += 2
                continue
            seg_len = struct.unpack(">H", payload[i + 2 : i + 4])[0]
            # SOF0-15 except DHT(C4)/JPG(C8)/DAC(CC) carry dimensions
            if 0xC0 <= marker <= 0xCF and marker not in (0xC4, 0xC8, 0xCC):
                h, w = struct.unpack(">HH", payload[i + 5 : i + 9])
                return w, h
            i += 2 + seg_len
        return None
    if n >= 10 and payload[:6] in (b"GIF87a", b"GIF89a"):
        w, h = struct.unpack("<HH", payload[6:10])
        return w, h
    if n >= 26 and payload[:2] == b"BM":
        w, h = struct.unpack("<ii", payload[18:26])
        return abs(w), abs(h)
    if n >= 2 and payload[:2] == b"P6":  # binary PPM: ASCII header
        fields: list[int] = []
        i, tok = 2, b""
        while i < n and len(fields) < 2:
            c = payload[i : i + 1]
            if c == b"#":  # comment to end of line
                while i < n and payload[i : i + 1] != b"\n":
                    i += 1
            elif c.isdigit():
                tok += c
            elif tok:
                fields.append(int(tok))
                tok = b""
            i += 1
        if len(fields) == 2:
            return fields[0], fields[1]
    return None


# ---------------------------------------------------------------------------
# PNG pixel decode / encode (pure stdlib + numpy)
# ---------------------------------------------------------------------------


def decode_png(payload: bytes) -> np.ndarray:
    """Decode an 8-bit non-interlaced PNG to a (H, W, C) uint8 array
    (C = 1 gray, 2 gray+alpha, 3 RGB, 4 RGBA; palette expands to RGB).

    Complete implementation of the spec's decode path: chunk walk,
    zlib inflate, and the five scanline filters (None/Sub/Up/Average/
    Paeth). Raises ValueError on non-PNG or unsupported variants."""
    if payload[:8] != PNG_SIG:
        raise ValueError("not a PNG payload")
    pos, width = 8, None
    idat, palette = bytearray(), None
    try:
        while pos + 8 <= len(payload):
            (clen,) = struct.unpack(">I", payload[pos : pos + 4])
            ctype = payload[pos + 4 : pos + 8]
            data = payload[pos + 8 : pos + 8 + clen]
            if ctype == b"IHDR":
                width, height, depth, color, _comp, _filt, interlace = (
                    struct.unpack(">IIBBBBB", data)
                )
                if depth != 8 or interlace != 0 or color not in _PNG_CHANNELS:
                    raise ValueError(
                        f"unsupported PNG variant (depth={depth}, "
                        f"color={color}, interlace={interlace})"
                    )
            elif ctype == b"PLTE":
                palette = np.frombuffer(data, np.uint8).reshape(-1, 3)
            elif ctype == b"IDAT":
                idat += data
            elif ctype == b"IEND":
                break
            pos += 12 + clen  # len + type + data + crc
        if width is None or not idat:
            raise ValueError("truncated PNG (missing IHDR or IDAT)")
        raw = np.frombuffer(zlib.decompress(bytes(idat)), np.uint8)
    except (struct.error, zlib.error) as e:
        # Corrupt chunk framing or pixel stream — same contract as any
        # other undecodable payload.
        raise ValueError(f"corrupt PNG payload: {e}") from e
    ch = _PNG_CHANNELS[color]
    stride = width * ch
    if raw.size != (stride + 1) * height:
        raise ValueError("PNG pixel data does not match declared dims")
    raw = raw.reshape(height, stride + 1)
    out = np.empty((height, stride), np.uint8)
    zero_row = np.zeros(stride, np.uint8)
    for y in range(height):
        filt, line = raw[y, 0], raw[y, 1:].copy()
        prior = out[y - 1] if y else zero_row
        if filt == 0:
            pass
        elif filt == 1:  # Sub — sequential in x (left-neighbor recurrence)
            for x in range(ch, stride):
                line[x] = (int(line[x]) + int(line[x - ch])) & 0xFF
        elif filt == 2:  # Up — no intra-row dependence, vectorized
            line = (line.astype(np.int16) + prior).astype(np.uint8)
        elif filt == 3:  # Average
            for x in range(stride):
                left = int(line[x - ch]) if x >= ch else 0
                line[x] = (int(line[x]) + ((left + int(prior[x])) >> 1)) & 0xFF
        elif filt == 4:  # Paeth
            for x in range(stride):
                a = int(line[x - ch]) if x >= ch else 0
                c = int(prior[x - ch]) if x >= ch else 0
                b = int(prior[x])
                p = a + b - c
                pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                pr = a if (pa <= pb and pa <= pc) else (b if pb <= pc else c)
                line[x] = (int(line[x]) + pr) & 0xFF
        else:
            raise ValueError(f"bad PNG filter byte {filt}")
        out[y] = line
    img = out.reshape(height, width, ch)
    if color == 3:  # palette -> RGB
        if palette is None:
            raise ValueError("palette PNG without PLTE")
        idx = img[:, :, 0]
        if int(idx.max(initial=0)) >= len(palette):
            # Out-of-range index must be the ValueError the decode
            # kernels catch — a bare IndexError would kill the job on
            # one corrupt file ('corrupt input must not kill the
            # pipeline' contract).
            raise ValueError(
                f"palette index {int(idx.max(initial=0))} out of range "
                f"for PLTE of {len(palette)} entries"
            )
        img = palette[idx]
    return img


def encode_png(img: np.ndarray) -> bytes:
    """Encode a (H, W) or (H, W, C) uint8 array as a PNG (filter 0
    rows, one zlib stream) — the minimal spec-valid encoder."""
    if img.ndim == 2:
        img = img[:, :, None]
    height, width, ch = img.shape
    color = {1: 0, 2: 4, 3: 2, 4: 6}[ch]

    def chunk(ctype: bytes, data: bytes) -> bytes:
        body = ctype + data
        return struct.pack(">I", len(data)) + body + struct.pack(
            ">I", zlib.crc32(body) & 0xFFFFFFFF
        )

    ihdr = struct.pack(">IIBBBBB", width, height, 8, color, 0, 0, 0)
    rows = np.ascontiguousarray(img.reshape(height, width * ch))
    scan = np.concatenate(
        [np.zeros((height, 1), np.uint8), rows], axis=1
    ).tobytes()
    return (
        PNG_SIG
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib.compress(scan, 6))
        + chunk(b"IEND", b"")
    )


def resize_nearest(img: np.ndarray, width: int, height: int) -> np.ndarray:
    """Nearest-neighbor resample of (H, W[, C]) uint8 to (height,
    width[, C]) — the standard index-mapping formulation."""
    src_h, src_w = img.shape[:2]
    ys = np.minimum((np.arange(height) * src_h) // height, src_h - 1)
    xs = np.minimum((np.arange(width) * src_w) // width, src_w - 1)
    return img[ys][:, xs]


def decode_image(payload: bytes) -> np.ndarray:
    """Pixel-decode a payload: PIL when importable (any PIL format),
    else the pure PNG decoder. Raises ValueError when undecodable."""
    if _PIL_Image is not None:
        try:
            with _PIL_Image.open(io.BytesIO(payload)) as im:
                return np.asarray(im.convert("RGB"))
        except Exception as e:
            raise ValueError(f"undecodable image payload: {e}") from e
    return decode_png(payload)


# ---------------------------------------------------------------------------
# WAV decode (stdlib wave + numpy)
# ---------------------------------------------------------------------------


def decode_wav(payload: bytes) -> tuple[int, int, float]:
    """(sample_rate, duration_ms, rms) from a PCM WAV payload.

    RMS is computed over all channels on full-scale-normalized samples
    (range [0, 1]); 8-bit unsigned, 16/32-bit signed, and 24-bit
    packed PCM are handled. soundfile is used instead when importable
    (which also admits FLAC/OGG). Raises ValueError when undecodable."""
    if _soundfile is not None:
        try:
            data, rate = _soundfile.read(
                io.BytesIO(payload), dtype="float64", always_2d=True
            )
            dur_ms = int(round(len(data) * 1000 / rate))
            return int(rate), dur_ms, float(np.sqrt(np.mean(data**2)))
        except Exception as e:
            raise ValueError(f"undecodable audio payload: {e}") from e
    try:
        with wave.open(io.BytesIO(payload), "rb") as wf:
            rate = wf.getframerate()
            n = wf.getnframes()
            width = wf.getsampwidth()
            frames = wf.readframes(n)
    except (wave.Error, EOFError, struct.error) as e:
        raise ValueError(f"undecodable WAV payload: {e}") from e
    if rate <= 0:
        raise ValueError("WAV with non-positive sample rate")
    dur_ms = int(round(n * 1000 / rate))
    if width == 1:  # unsigned 8-bit, midpoint 128
        x = (np.frombuffer(frames, np.uint8).astype(np.float64) - 128.0) / 128.0
    elif width == 2:
        x = np.frombuffer(frames, "<i2").astype(np.float64) / 32768.0
    elif width == 3:  # 24-bit packed little-endian
        b = np.frombuffer(frames, np.uint8).reshape(-1, 3)
        raw = (
            b[:, 0].astype(np.int32)
            | (b[:, 1].astype(np.int32) << 8)
            | (b[:, 2].astype(np.int32) << 16)
        )
        raw = np.where(raw & 0x800000, raw - (1 << 24), raw)
        x = raw.astype(np.float64) / float(1 << 23)
    elif width == 4:
        x = np.frombuffer(frames, "<i4").astype(np.float64) / float(1 << 31)
    else:
        raise ValueError(f"unsupported WAV sample width {width}")
    rms = float(np.sqrt(np.mean(x**2))) if x.size else 0.0
    return rate, dur_ms, rms
