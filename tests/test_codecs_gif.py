"""GIF codec tests (pure Python): LZW round-trips, multi-frame decode,
palette/extension handling, malformed input."""

from __future__ import annotations

import numpy as np
import pytest

from supersonic_spark.pipeline import codecs_gif as G
from supersonic_spark.pipeline.codecs import CodecError


def _gray_frames(n, h, w, seed=0):
    rng = np.random.RandomState(seed)
    out = []
    for _ in range(n):
        g = rng.randint(0, 256, (h, w), dtype=np.uint8)
        out.append(np.repeat(g[:, :, None], 3, axis=2))
    return out


def test_gif_single_frame_roundtrip_exact():
    frames = _gray_frames(1, 13, 21, seed=1)
    out = G.decode_gif_frames(G.encode_gif(frames))
    assert len(out) == 1
    assert np.array_equal(out[0], frames[0])  # GIF is lossless


def test_gif_multi_frame_roundtrip_exact():
    frames = _gray_frames(5, 9, 7, seed=2)
    out = G.decode_gif_frames(G.encode_gif(frames))
    assert len(out) == 5
    for a, b in zip(out, frames):
        assert np.array_equal(a, b)


def test_gif_large_frame_crosses_clear_spans():
    """> 253 pixels forces the uncompressed-LZW encoder to emit interior
    CLEAR codes; the decoder must resynchronize exactly."""
    frames = _gray_frames(2, 40, 40, seed=3)  # 1600 px per frame
    out = G.decode_gif_frames(G.encode_gif(frames))
    assert all(np.array_equal(a, b) for a, b in zip(out, frames))


_FIRST_FRAME_OFFSET = 13 + 768  # header + logical screen + 256-entry GCT


def test_gif_extensions_are_skipped():
    blob = bytearray(G.encode_gif(_gray_frames(1, 4, 4, seed=4)))
    # splice a graphic-control extension before the image descriptor
    idx = _FIRST_FRAME_OFFSET
    assert blob[idx] == 0x2C
    gce = b"\x21\xf9\x04\x00\x0a\x00\x00\x00"
    blob2 = bytes(blob[:idx]) + gce + bytes(blob[idx:])
    out = G.decode_gif_frames(blob2)
    assert len(out) == 1


def test_gif_malformed():
    with pytest.raises(CodecError):
        G.decode_gif_frames(b"GIF89a\x00")  # truncated
    with pytest.raises(CodecError):
        G.decode_gif_frames(b"not a gif at all!")
    good = G.encode_gif(_gray_frames(1, 6, 6, seed=5))
    with pytest.raises(CodecError):
        G.decode_gif_frames(good[: len(good) // 2])
    # interlace flag rejected
    bad = bytearray(good)
    idx = _FIRST_FRAME_OFFSET
    assert bad[idx] == 0x2C
    bad[idx + 9] |= 0x40
    with pytest.raises(CodecError, match="interlaced"):
        G.decode_gif_frames(bytes(bad))


def test_gif_87a_header_accepted():
    blob = bytearray(G.encode_gif(_gray_frames(1, 3, 3, seed=6)))
    blob[:6] = b"GIF87a"
    assert len(G.decode_gif_frames(bytes(blob))) == 1
