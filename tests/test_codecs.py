"""Pure-Python codec tests (no Spark session needed): PNG/BMP/PPM/WAV
decode correctness, including all five PNG scanline filters."""

from __future__ import annotations

import struct
import zlib

import numpy as np
import pytest

from supersonic_spark.pipeline import codecs


def _rand_img(h, w, ch, seed=0):
    return np.random.RandomState(seed).randint(0, 256, (h, w, ch), dtype=np.uint8)


@pytest.mark.parametrize("ch", [1, 2, 3, 4])
def test_png_roundtrip_channels(ch):
    px = _rand_img(7, 11, ch, seed=ch)
    out = codecs.decode_png(codecs.encode_png(px))
    assert out.shape == (7, 11, ch)
    assert np.array_equal(out, px)


def test_png_grayscale_2d_input():
    px = _rand_img(4, 4, 1, seed=9)[:, :, 0]
    out = codecs.decode_png(codecs.encode_png(px))
    assert np.array_equal(out[:, :, 0], px)


def _encode_png_with_filters(px: np.ndarray, filters: list[int]) -> bytes:
    """Re-encode with explicit per-row filter types (exercises the decoder's
    unfilter paths — our own encoder only ever emits filter 0)."""
    h, w, ch = px.shape
    prev = np.zeros(w * ch, dtype=np.int32)
    raw = bytearray()
    for y in range(h):
        line = px[y].reshape(-1).astype(np.int32)
        f = filters[y % len(filters)]
        raw.append(f)
        filt = np.zeros(w * ch, dtype=np.int32)
        for x in range(w * ch):
            a = int(line[x - ch]) if x >= ch else 0
            b = int(prev[x])
            c = int(prev[x - ch]) if x >= ch else 0
            if f == 0:
                pred = 0
            elif f == 1:
                pred = a
            elif f == 2:
                pred = b
            elif f == 3:
                pred = (a + b) >> 1
            else:
                p = a + b - c
                pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                pred = a if (pa <= pb and pa <= pc) else (b if pb <= pc else c)
            filt[x] = (int(line[x]) - pred) & 0xFF
        raw.extend(filt.astype(np.uint8).tobytes())
        prev = line
    ctype = {1: 0, 2: 4, 3: 2, 4: 6}[ch]

    def chunk(tag, body):
        return (struct.pack(">I", len(body)) + tag + body
                + struct.pack(">I", zlib.crc32(tag + body) & 0xFFFFFFFF))

    ihdr = struct.pack(">IIBBBBB", w, h, 8, ctype, 0, 0, 0)
    return (codecs.PNG_MAGIC + chunk(b"IHDR", ihdr)
            + chunk(b"IDAT", zlib.compress(bytes(raw))) + chunk(b"IEND", b""))


def test_png_all_filter_types_decode():
    px = _rand_img(10, 6, 3, seed=42)
    blob = _encode_png_with_filters(px, [0, 1, 2, 3, 4])
    assert np.array_equal(codecs.decode_png(blob), px)


def test_png_palette():
    pal = _rand_img(1, 8, 3, seed=3)[0]  # 8 palette entries
    idx = np.random.RandomState(4).randint(0, 8, (5, 5, 1), dtype=np.uint8)

    def chunk(tag, body):
        return (struct.pack(">I", len(body)) + tag + body
                + struct.pack(">I", zlib.crc32(tag + body) & 0xFFFFFFFF))

    ihdr = struct.pack(">IIBBBBB", 5, 5, 8, 3, 0, 0, 0)
    raw = b"".join(b"\x00" + idx[y].tobytes() for y in range(5))
    blob = (codecs.PNG_MAGIC + chunk(b"IHDR", ihdr) + chunk(b"PLTE", pal.tobytes())
            + chunk(b"IDAT", zlib.compress(raw)) + chunk(b"IEND", b""))
    assert np.array_equal(codecs.decode_png(blob), pal[idx[:, :, 0]])


def test_png_malformed_raises():
    with pytest.raises(codecs.CodecError):
        codecs.decode_png(b"\x89PNG\r\n\x1a\nnot-chunks")
    with pytest.raises(codecs.CodecError):
        codecs.decode_png(b"hello world" * 2)


def test_bmp_24bit_bottom_up():
    px = _rand_img(3, 4, 3, seed=5)
    # hand-roll a bottom-up 24-bit BMP
    stride = (4 * 3 + 3) & ~3
    rows = b""
    for y in range(2, -1, -1):  # bottom-up
        row = px[y][:, [2, 1, 0]].tobytes()  # RGB → BGR
        rows += row + b"\x00" * (stride - len(row))
    info = struct.pack("<IiiHHIIiiII", 40, 4, 3, 1, 24, 0, len(rows), 2835, 2835, 0, 0)
    hdr = b"BM" + struct.pack("<IHHI", 14 + 40 + len(rows), 0, 0, 14 + 40)
    out = codecs.decode_bmp(hdr + info + rows)
    assert np.array_equal(out, px)


def test_ppm_roundtrip_with_comment():
    px = _rand_img(2, 3, 3, seed=6)
    blob = b"P6\n# a comment\n3 2\n255\n" + px.tobytes()
    assert np.array_equal(codecs.decode_ppm(blob), px)
    assert np.array_equal(codecs.decode_ppm(codecs.encode_ppm(px)), px)


def test_wav_pcm16_roundtrip():
    wave = np.sin(np.linspace(0, 20, 500))
    blob = codecs.encode_wav_pcm16(wave, rate=22050)
    out, rate = codecs.decode_wav(blob)
    assert rate == 22050 and out.shape == (500, 1)
    # quantization (±0.5 LSB) + the standard ×32767 / ÷32768 scale asymmetry
    assert np.max(np.abs(out[:, 0] - wave)) < 1.0 / 16000


def test_wav_float32_and_pcm8():
    w = np.array([0.5, -0.25, 0.125], dtype="<f4")
    body = b"WAVE" + b"fmt " + struct.pack("<I", 16) + struct.pack("<HHIIHH", 3, 1, 8000, 32000, 4, 32)
    body += b"data" + struct.pack("<I", 12) + w.tobytes()
    out, rate = codecs.decode_wav(b"RIFF" + struct.pack("<I", len(body)) + body)
    assert rate == 8000 and np.allclose(out[:, 0], w)

    pcm8 = bytes([128, 255, 0, 128])
    body = b"WAVE" + b"fmt " + struct.pack("<I", 16) + struct.pack("<HHIIHH", 1, 1, 8000, 8000, 1, 8)
    body += b"data" + struct.pack("<I", 4) + pcm8
    out, _ = codecs.decode_wav(b"RIFF" + struct.pack("<I", len(body)) + body)
    assert np.allclose(out[:, 0], [0.0, 127 / 128, -1.0, 0.0])


def test_wav_stereo():
    wave = np.stack([np.ones(10) * 0.5, np.ones(10) * -0.5], axis=1)
    out, _ = codecs.decode_wav(codecs.encode_wav_pcm16(wave))
    assert out.shape == (10, 2)
    assert np.allclose(out.mean(axis=1), 0.0, atol=1e-4)


def test_sniff_format():
    assert codecs.sniff_format(codecs.encode_png(_rand_img(2, 2, 3))) == "png"
    assert codecs.sniff_format(codecs.encode_wav_pcm16(np.zeros(4))) == "wav"
    assert codecs.sniff_format(b"P6\n1 1\n255\n\x00\x00\x00") == "ppm"
    assert codecs.sniff_format(b"\xff\xd8\xff\xe0JFIF....") == "jpeg"
    assert codecs.sniff_format(b"plain text here") is None
    assert codecs.sniff_format(None) is None


def test_resize_nearest():
    px = _rand_img(8, 8, 3, seed=7)
    small = codecs.resize_nearest(px, 4, 4)
    assert small.shape == (4, 4, 3)
    assert np.array_equal(small, px[::2, ::2])
    up = codecs.resize_nearest(small, 8, 8)
    assert up.shape == (8, 8, 3)


# --- property-based round trips (hypothesis) ---

from hypothesis import given, settings
from hypothesis import strategies as st
from hypothesis.extra.numpy import arrays


@given(
    px=arrays(np.uint8, st.tuples(st.integers(1, 12), st.integers(1, 12),
                                  st.sampled_from([1, 2, 3, 4]))),
)
@settings(max_examples=40, deadline=None)
def test_png_roundtrip_property(px):
    out = codecs.decode_png(codecs.encode_png(px))
    assert out.shape == px.shape and np.array_equal(out, px)


@given(
    wave=arrays(np.float64, st.integers(1, 200),
                elements=st.floats(-1.0, 1.0, allow_nan=False)),
    rate=st.sampled_from([8000, 16000, 44100]),
)
@settings(max_examples=40, deadline=None)
def test_wav_roundtrip_property(wave, rate):
    out, got_rate = codecs.decode_wav(codecs.encode_wav_pcm16(wave, rate))
    assert got_rate == rate and out.shape == (len(wave), 1)
    # quantization (±0.5 LSB) + ×32767/÷32768 scale asymmetry
    assert np.max(np.abs(out[:, 0] - wave)) < 1.0 / 16000


@given(px=arrays(np.uint8, st.tuples(st.integers(1, 10), st.integers(1, 10),
                                     st.just(3))))
@settings(max_examples=30, deadline=None)
def test_ppm_roundtrip_property(px):
    assert np.array_equal(codecs.decode_ppm(codecs.encode_ppm(px)), px)


@given(data=st.binary(max_size=64))
@settings(max_examples=60, deadline=None)
def test_decoders_never_crash_on_garbage(data):
    """Arbitrary bytes must yield CodecError (mapped to ok=False by the
    kernels), never an unhandled exception — corrupt blobs are data."""
    for fn in (codecs.decode_png, codecs.decode_bmp, codecs.decode_ppm):
        try:
            fn(data)
        except codecs.CodecError:
            pass
    try:
        codecs.decode_wav(data)
    except codecs.CodecError:
        pass
    codecs.sniff_format(data)
