"""Baseline JPEG codec tests (pure Python, no Spark): DCT/Huffman
round-trips at both subsampling layouts, grayscale, edge sizes, restart
semantics, and malformed-input behavior."""

from __future__ import annotations

import numpy as np
import pytest

from supersonic_spark.pipeline import codecs
from supersonic_spark.pipeline import codecs_jpeg as J


def _psnr(a: np.ndarray, b: np.ndarray) -> float:
    err = np.sqrt(np.mean((a.astype(float) - b.astype(float)) ** 2))
    return 20 * np.log10(255 / max(err, 1e-9))


def _smooth_rgb(h, w, seed=0):
    """Low-frequency test image (JPEG is built for smooth content)."""
    rng = np.random.RandomState(seed)
    y, x = np.mgrid[0:h, 0:w]
    chans = []
    for c in range(3):
        a, b, p = rng.uniform(0.5, 2, 3)
        chans.append(
            127 + 90 * np.sin(a * x / w * 3 + p) * np.cos(b * y / h * 3)
        )
    return np.clip(np.stack(chans, axis=-1), 0, 255).astype(np.uint8)


@pytest.mark.parametrize("sub", ["444", "420"])
def test_jpeg_roundtrip_color(sub):
    px = _smooth_rgb(40, 56, seed=1)
    blob = J.encode_jpeg(px, quality=90, subsample=sub)
    out = J.decode_jpeg(blob)
    assert out.shape == px.shape
    assert _psnr(out, px) > (38 if sub == "444" else 33)


def test_jpeg_roundtrip_gray():
    px = _smooth_rgb(24, 24, seed=2)[:, :, 0]
    out = J.decode_jpeg(J.encode_jpeg(px, quality=90))
    assert out.shape == (24, 24, 1)
    assert _psnr(out[:, :, 0], px) > 40


def test_jpeg_non_multiple_of_mcu_sizes():
    """Dimensions not divisible by 8 (or 16 at 4:2:0) pad internally but
    decode back to the exact original size."""
    for h, w, sub in [(9, 13, "444"), (17, 23, "420"), (1, 1, "444")]:
        px = _smooth_rgb(h, w, seed=h * w)
        out = J.decode_jpeg(J.encode_jpeg(px, quality=95, subsample=sub))
        assert out.shape == (h, w, 3)


def test_jpeg_solid_fill_dc_accuracy():
    """A solid-color image is pure DC: reconstruction error is bounded by
    half a quantization step (≤ ~2 gray levels at quality 85)."""
    for v in (0, 73, 128, 200, 255):
        px = np.full((16, 16, 3), v, dtype=np.uint8)
        out = J.decode_jpeg(J.encode_jpeg(px, quality=85))
        assert abs(out.astype(float).mean() - v) <= 2.5, v


def test_jpeg_quality_monotonic_size():
    px = _smooth_rgb(48, 48, seed=3)
    sizes = [len(J.encode_jpeg(px, quality=q)) for q in (30, 60, 90)]
    assert sizes[0] < sizes[1] < sizes[2]
    assert _psnr(J.decode_jpeg(J.encode_jpeg(px, quality=30)), px) < _psnr(
        J.decode_jpeg(J.encode_jpeg(px, quality=90)), px
    )


def test_jpeg_through_codec_front_door():
    """sniff_format routes ff d8 ff bytes to the JPEG decoder."""
    px = _smooth_rgb(16, 16, seed=4)
    blob = J.encode_jpeg(px, quality=90)
    assert codecs.sniff_format(blob) == "jpeg"
    out = codecs.decode_image(blob)
    assert out.shape == (16, 16, 3) and _psnr(out, px) > 35


def test_jpeg_malformed_raises_codec_error():
    with pytest.raises(codecs.CodecError):
        J.decode_jpeg(b"\xff\xd8\xff\xd9")  # SOI then EOI, no scan
    with pytest.raises(codecs.CodecError):
        J.decode_jpeg(b"not a jpeg at all")
    good = J.encode_jpeg(_smooth_rgb(8, 8), quality=90)
    with pytest.raises(codecs.CodecError):
        J.decode_jpeg(good[: len(good) // 2])  # truncated entropy data
    # progressive SOF2 is rejected, not mis-decoded
    prog = bytearray(good)
    idx = prog.find(b"\xff\xc0")
    prog[idx + 1] = 0xC2
    with pytest.raises(codecs.CodecError, match="progressive"):
        J.decode_jpeg(bytes(prog))


def test_jpeg_huffman_tables_are_prefix_free():
    for spec in (J._DC_LUMA_SPEC, J._DC_CHROMA_SPEC, J._AC_LUMA_SPEC,
                 J._AC_CHROMA_SPEC):
        codes = J._huff_codes(spec)
        assert len(codes) == len(spec[1])
        seen = set()
        for sym, (code, ln) in codes.items():
            bits = format(code, f"0{ln}b")
            for prior in seen:
                assert not bits.startswith(prior) and not prior.startswith(bits)
            seen.add(bits)


def _reset_backend(monkeypatch, value: str | None):
    monkeypatch.setattr(codecs, "_JPEG_BACKEND", None)
    if value is None:
        monkeypatch.delenv("SPARK_GRAFT_JPEG_BACKEND", raising=False)
    else:
        monkeypatch.setenv("SPARK_GRAFT_JPEG_BACKEND", value)


def _have_pil() -> bool:
    try:
        import PIL  # noqa: F401

        return True
    except ImportError:
        return False


def test_jpeg_backend_selection(monkeypatch):
    # forced pure always works, with or without Pillow
    _reset_backend(monkeypatch, "pure")
    assert codecs.jpeg_backend() == "pure"
    # auto resolves to pil exactly when Pillow imports
    _reset_backend(monkeypatch, None)
    assert codecs.jpeg_backend() == ("pil" if _have_pil() else "pure")
    # explicit pil without Pillow must surface loudly, not as ok=False
    if not _have_pil():
        _reset_backend(monkeypatch, "pil")
        with pytest.raises(RuntimeError, match="Pillow"):
            codecs.jpeg_backend()
    # decode still works end-to-end under the forced-pure hatch
    _reset_backend(monkeypatch, "pure")
    px = _smooth_rgb(24, 32)
    out = codecs.decode_image(J.encode_jpeg(px, quality=90))
    assert out.shape == (24, 32, 3)


@pytest.mark.skipif(not _have_pil(), reason="Pillow not installed in this container")
@pytest.mark.parametrize("sub", ["444", "420"])
def test_jpeg_pil_path_agrees_with_pure(monkeypatch, sub):
    """The libjpeg escape hatch must honor the pure decoder's contract:
    same shape/dtype/channel order, pixels within the JPEG standard's
    cross-decoder IDCT tolerance."""
    for px in (_smooth_rgb(40, 56, seed=3), _smooth_rgb(33, 41, seed=7)):
        blob = J.encode_jpeg(px, quality=88, subsample=sub)
        pure = J.decode_jpeg(blob)
        _reset_backend(monkeypatch, "pil")
        pil = codecs.decode_image(blob)
        assert pil.shape == pure.shape and pil.dtype == np.uint8
        diff = np.abs(pil.astype(np.int16) - pure.astype(np.int16))
        assert diff.max() <= 4 and diff.mean() <= 1.5

    # grayscale keeps the (H, W, 1) contract
    gray = _smooth_rgb(24, 24, seed=1)[:, :, :1]
    blob = J.encode_jpeg(gray, quality=90)
    pure = J.decode_jpeg(blob)
    _reset_backend(monkeypatch, "pil")
    pil = codecs.decode_image(blob)
    assert pil.shape == pure.shape == (24, 24, 1)
    assert np.abs(pil.astype(np.int16) - pure.astype(np.int16)).max() <= 4
