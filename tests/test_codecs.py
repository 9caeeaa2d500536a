"""Pure-codec unit tests (no Spark): the stdlib+numpy PNG/WAV codecs
behind the multimodal kernels' fake=False path. Spec references: PNG
RFC 2083 (chunks, five scanline filters), WAV/RIFF PCM layout."""

import io
import struct
import wave
import zlib

import numpy as np
import pytest

from blackroad_feature_store_spark.operators import codecs as C


def _rgb_gradient(h, w):
    img = np.zeros((h, w, 3), np.uint8)
    img[..., 0] = (np.arange(w, dtype=np.uint16)[None, :] * 4 % 256).astype(np.uint8)
    img[..., 1] = (np.arange(h, dtype=np.uint16)[:, None] * 6 % 256).astype(np.uint8)
    return img


# -- PNG -----------------------------------------------------------------------


@pytest.mark.parametrize(
    "shape", [(37, 53, 3), (10, 10, 1), (9, 7, 4), (8, 5, 2)]
)
def test_png_roundtrip_all_channel_counts(shape):
    rng = np.random.default_rng(0)
    img = rng.integers(0, 256, shape, dtype=np.uint8)
    back = C.decode_png(C.encode_png(img))
    assert back.shape == shape
    assert (back == img).all()


def test_png_decode_all_filter_types():
    # Hand-encode a PNG using every filter type (0..4, one per row) by
    # running the spec's filter transforms forward; the decoder must
    # invert each exactly.
    h, w, ch = 5, 6, 3
    rng = np.random.default_rng(1)
    raw = rng.integers(0, 256, (h, w, ch), dtype=np.uint8)

    def filt_row(y, ftype):
        line = raw[y].reshape(-1).astype(int)
        prior = raw[y - 1].reshape(-1).astype(int) if y else np.zeros(w * ch, int)
        out = np.zeros(w * ch, int)
        for x in range(w * ch):
            a = line[x - ch] if x >= ch else 0
            b = prior[x]
            c = prior[x - ch] if x >= ch else 0
            if ftype == 0:
                pred = 0
            elif ftype == 1:
                pred = a
            elif ftype == 2:
                pred = b
            elif ftype == 3:
                pred = (a + b) >> 1
            else:
                p = a + b - c
                pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                pred = a if (pa <= pb and pa <= pc) else (b if pb <= pc else c)
            out[x] = (line[x] - pred) & 0xFF
        return out.astype(np.uint8)

    scan = b"".join(
        bytes([y % 5]) + filt_row(y, y % 5).tobytes() for y in range(h)
    )

    def chunk(t, d):
        body = t + d
        return (
            struct.pack(">I", len(d))
            + body
            + struct.pack(">I", zlib.crc32(body) & 0xFFFFFFFF)
        )

    png = (
        C.PNG_SIG
        + chunk(b"IHDR", struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0))
        + chunk(b"IDAT", zlib.compress(scan))
        + chunk(b"IEND", b"")
    )
    assert (C.decode_png(png) == raw).all()


def test_png_palette_expands_to_rgb():
    # color type 3: 1 byte/pixel indexing a PLTE table
    pal = np.array([[255, 0, 0], [0, 255, 0], [0, 0, 255]], np.uint8)
    idx = np.array([[0, 1], [2, 0]], np.uint8)
    scan = b"".join(b"\x00" + idx[y].tobytes() for y in range(2))

    def chunk(t, d):
        body = t + d
        return (
            struct.pack(">I", len(d))
            + body
            + struct.pack(">I", zlib.crc32(body) & 0xFFFFFFFF)
        )

    png = (
        C.PNG_SIG
        + chunk(b"IHDR", struct.pack(">IIBBBBB", 2, 2, 8, 3, 0, 0, 0))
        + chunk(b"PLTE", pal.tobytes())
        + chunk(b"IDAT", zlib.compress(scan))
        + chunk(b"IEND", b"")
    )
    out = C.decode_png(png)
    assert (out == pal[idx]).all()


def test_png_rejects_garbage_and_truncation():
    for bad in (b"", b"garbage", b"\x89PNGxxxx", C.PNG_SIG + b"\x00" * 8):
        with pytest.raises(ValueError):
            C.decode_png(bad)


def test_resize_nearest_shapes_and_identity():
    img = _rgb_gradient(24, 40)
    out = C.resize_nearest(img, 10, 6)
    assert out.shape == (6, 10, 3)
    assert (C.resize_nearest(img, 40, 24) == img).all()  # identity
    up = C.resize_nearest(img, 80, 48)  # upscale repeats pixels
    assert (up[::2, ::2] == img).all()


# -- dimension sniffing --------------------------------------------------------


def test_sniff_dims_all_formats():
    png = C.encode_png(_rgb_gradient(13, 21))
    assert C.sniff_image_dims(png) == (21, 13)
    jpeg = (
        b"\xff\xd8"
        + b"\xff\xe0" + struct.pack(">H", 16) + b"JFIF\x00" + b"\x00" * 9
        + b"\xff\xc0" + struct.pack(">H", 17) + b"\x08"
        + struct.pack(">HH", 240, 320) + b"\x03" + b"\x00" * 10
        + b"\xff\xd9"
    )
    assert C.sniff_image_dims(jpeg) == (320, 240)
    gif = b"GIF89a" + struct.pack("<HH", 12, 34) + b"\x00" * 10
    assert C.sniff_image_dims(gif) == (12, 34)
    bmp = b"BM" + b"\x00" * 16 + struct.pack("<ii", 77, -88) + b"\x00" * 10
    assert C.sniff_image_dims(bmp) == (77, 88)  # negative h = top-down BMP
    ppm = b"P6\n# comment\n640 480\n255\n" + b"\x00" * 10
    assert C.sniff_image_dims(ppm) == (640, 480)
    assert C.sniff_image_dims(b"not an image") is None
    assert C.sniff_image_dims(b"") is None


# -- WAV -----------------------------------------------------------------------


def _wav_bytes(samples_bytes, rate, width, channels=1):
    buf = io.BytesIO()
    with wave.open(buf, "wb") as wf:
        wf.setnchannels(channels)
        wf.setsampwidth(width)
        wf.setframerate(rate)
        wf.writeframes(samples_bytes)
    return buf.getvalue()


def test_wav_16bit_sine_rms():
    rate = 16000
    t = np.arange(int(rate * 0.25))
    s = (0.5 * np.sin(2 * np.pi * 440 * t / rate) * 32767).astype("<i2")
    r, ms, rms = C.decode_wav(_wav_bytes(s.tobytes(), rate, 2))
    assert (r, ms) == (16000, 250)
    assert abs(rms - 0.5 / np.sqrt(2)) < 0.01  # sine RMS = A/sqrt(2)


def test_wav_8_24_32bit_widths():
    # 8-bit unsigned
    s8 = ((np.sin(2 * np.pi * 100 * np.arange(800) / 8000) * 0.25 + 0.5) * 255)
    r, ms, _ = C.decode_wav(_wav_bytes(s8.astype(np.uint8).tobytes(), 8000, 1))
    assert (r, ms) == (8000, 100)
    # 32-bit signed
    s32 = (0.25 * np.sin(2 * np.pi * 220 * np.arange(4000) / 8000) * ((1 << 31) - 1))
    r, ms, rms = C.decode_wav(_wav_bytes(s32.astype("<i4").tobytes(), 8000, 4))
    assert (r, ms) == (8000, 500)
    assert abs(rms - 0.25 / np.sqrt(2)) < 0.01
    # 24-bit packed
    s24 = (0.3 * np.sin(2 * np.pi * 300 * np.arange(2400) / 2400) * ((1 << 23) - 1)).astype(np.int32)
    packed = b"".join(int(v & 0xFFFFFF).to_bytes(3, "little") for v in s24)
    r, ms, rms = C.decode_wav(_wav_bytes(packed, 24000, 3))
    assert (r, ms) == (24000, 100)
    assert abs(rms - 0.3 / np.sqrt(2)) < 0.01


def test_wav_rejects_garbage():
    for bad in (b"", b"junk", b"RIFF\x00\x00\x00\x00WAVE"):
        with pytest.raises(ValueError):
            C.decode_wav(bad)


def test_fuzz_never_crashes():
    # At 100 TB the decoders see arbitrary corrupt bytes; the contract
    # is ValueError (decoders) / None (sniffer) — never an unhandled
    # crash. Random payloads plus truncations/corruptions of real ones.
    import random

    rng = random.Random(20260813)
    payloads = [
        bytes(rng.getrandbits(8) for _ in range(rng.randrange(0, 256)))
        for _ in range(300)
    ]
    real_png = C.encode_png(_rgb_gradient(9, 9))
    t = np.arange(400)
    real_wav = _wav_bytes(
        (np.sin(t / 5.0) * 30000).astype("<i2").tobytes(), 8000, 2
    )
    for real in (real_png, real_wav):
        payloads += [real[:n] for n in range(0, len(real), 37)]  # truncate
        flip = bytearray(real)
        for i in range(0, len(flip), 11):  # corrupt
            flip[i] ^= 0xFF
        payloads.append(bytes(flip))
    for p in payloads:
        d = C.sniff_image_dims(p)
        assert d is None or (len(d) == 2 and all(isinstance(x, int) for x in d))
        for fn in (C.decode_png, C.decode_wav, C.decode_image):
            try:
                fn(p)
            except ValueError:
                pass  # the documented failure mode


# -- round-6 hardening --------------------------------------------------------


def test_png_palette_index_out_of_range_is_valueerror():
    # Corrupt palette PNG: pixel index 5 vs 3 PLTE entries. Must raise
    # ValueError (what the decode kernels catch), never IndexError —
    # one corrupt file must not kill the pipeline.
    pal = np.array([[255, 0, 0], [0, 255, 0], [0, 0, 255]], np.uint8)
    idx = np.array([[0, 5], [1, 0]], np.uint8)
    scan = b"".join(b"\x00" + idx[y].tobytes() for y in range(2))

    def chunk(t, d):
        body = t + d
        return (
            struct.pack(">I", len(d))
            + body
            + struct.pack(">I", zlib.crc32(body) & 0xFFFFFFFF)
        )

    png = (
        C.PNG_SIG
        + chunk(b"IHDR", struct.pack(">IIBBBBB", 2, 2, 8, 3, 0, 0, 0))
        + chunk(b"PLTE", pal.tobytes())
        + chunk(b"IDAT", zlib.compress(scan))
        + chunk(b"IEND", b"")
    )
    with pytest.raises(ValueError, match="palette index"):
        C.decode_png(png)


def test_sniff_jpeg_with_fill_bytes():
    # 0xFF padding before a marker is legal JPEG framing; the sniffer
    # must skip fill bytes, not read pad as a bogus segment length.
    jpeg = (
        b"\xff\xd8"
        + b"\xff\xe0" + struct.pack(">H", 16) + b"JFIF\x00" + b"\x00" * 9
        + b"\xff\xff\xff"  # fill bytes before the SOF marker
        + b"\xff\xc0" + struct.pack(">H", 17) + b"\x08"
        + struct.pack(">HH", 240, 320) + b"\x03" + b"\x00" * 10
        + b"\xff\xd9"
    )
    assert C.sniff_image_dims(jpeg) == (320, 240)
