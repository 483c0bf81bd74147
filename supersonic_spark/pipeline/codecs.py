"""Pure-stdlib media codecs for the multimodal kernels.

This container has no PIL/libvips/ffmpeg, but PNG's compression layer is
stdlib ``zlib`` and BMP/PPM/WAV are plain struct layouts — so the decode
kernels in :mod:`supersonic_spark.pipeline.multimodal` can be REAL (parse
the actual byte stream, recover the actual pixels/samples) without any
codec dependency.  Everything here is driver-free pure functions over
``bytes`` — they run inside Arrow-batched mapInPandas workers, one call per
blob, and never touch Spark.

Formats:
- PNG  decode (8-bit gray / gray+alpha / RGB / RGBA / palette; all five
  scanline filters: None/Sub/Up/Average/Paeth) + encode (filter 0, RGB/gray)
- BMP  decode (uncompressed 24/32-bit BITMAPINFOHEADER) — bottom-up rows
- PPM  decode (binary ``P6``, maxval ≤ 255) + encode
- WAV  decode (RIFF PCM int8/16/32 + IEEE float32) + encode (PCM16)
- JPEG baseline decode + encode (DCT/Huffman/4:4:4/4:2:0) — see
  :mod:`supersonic_spark.pipeline.codecs_jpeg`

Progressive JPEG / video containers remain out of scope; blobs in those
formats decode to ``ok=False`` rather than raising — at 100 TB a corrupt
or exotic blob is data to be filtered, not a reason to kill the stage.
"""

from __future__ import annotations

import struct
import zlib

import numpy as np

PNG_MAGIC = b"\x89PNG\r\n\x1a\n"

#: PNG color type → samples per pixel (before palette expansion)
_PNG_CHANNELS = {0: 1, 2: 3, 3: 1, 4: 2, 6: 4}


class CodecError(ValueError):
    """Raised on malformed media bytes (callers map it to ok=False)."""


# ---------------------------------------------------------------- sniffing

def sniff_format(blob: bytes) -> str | None:
    """Best-effort container sniff from magic bytes; None if unknown."""
    if blob is None or len(blob) < 8:
        return None
    if blob[:8] == PNG_MAGIC:
        return "png"
    if blob[:2] == b"BM":
        return "bmp"
    if blob[:2] == b"P6":
        return "ppm"
    if blob[:4] == b"RIFF" and blob[8:12] == b"WAVE":
        return "wav"
    if blob[:3] == b"\xff\xd8\xff":
        return "jpeg"
    return None


# ---------------------------------------------------------------- png

def _png_unfilter(raw: bytes, width: int, height: int, bpp: int) -> np.ndarray:
    """Reverse PNG scanline filtering → (height, width*bpp) uint8 matrix.

    Filters 0 (None) and 2 (Up) are whole-row numpy ops; Sub/Average/Paeth
    carry a left-neighbor dependency, so those rows walk byte positions —
    still O(row bytes), and our own encoder emits filter 0 everywhere, so
    the engine's round-trip path stays on the vectorized branch."""
    stride = width * bpp
    if len(raw) != height * (stride + 1):
        raise CodecError(f"PNG data length {len(raw)} != expected {height * (stride + 1)}")
    out = np.zeros((height, stride), dtype=np.uint8)
    prev = np.zeros(stride, dtype=np.uint16)
    for y in range(height):
        ftype = raw[y * (stride + 1)]
        line = np.frombuffer(raw, dtype=np.uint8, count=stride, offset=y * (stride + 1) + 1)
        if ftype == 0:
            cur = line.copy()
        elif ftype == 2:
            cur = ((line.astype(np.uint16) + prev) & 0xFF).astype(np.uint8)
        elif ftype in (1, 3, 4):
            cur = np.zeros(stride, dtype=np.uint8)
            for x in range(stride):
                a = int(cur[x - bpp]) if x >= bpp else 0
                b = int(prev[x])
                if ftype == 1:
                    pred = a
                elif ftype == 3:
                    pred = (a + b) >> 1
                else:  # Paeth
                    c = int(out[y - 1, x - bpp]) if (x >= bpp and y > 0) else 0
                    p = a + b - c
                    pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                    pred = a if (pa <= pb and pa <= pc) else (b if pb <= pc else c)
                cur[x] = (int(line[x]) + pred) & 0xFF
        else:
            raise CodecError(f"PNG filter type {ftype} invalid")
        out[y] = cur
        prev = cur.astype(np.uint16)
    return out


def decode_png(blob: bytes) -> np.ndarray:
    """PNG bytes → (height, width, channels) uint8 array.

    Supports bit depth 8, color types 0/2/3/4/6, no interlacing."""
    if blob[:8] != PNG_MAGIC:
        raise CodecError("not a PNG (bad magic)")
    pos, width, height, depth, ctype = 8, None, None, None, None
    idat, palette = [], None
    while pos + 8 <= len(blob):
        (clen,), ctag = struct.unpack(">I", blob[pos : pos + 4]), blob[pos + 4 : pos + 8]
        body = blob[pos + 8 : pos + 8 + clen]
        if len(body) != clen:
            raise CodecError("truncated PNG chunk")
        if ctag == b"IHDR":
            width, height, depth, ctype, _comp, _filt, interlace = struct.unpack(
                ">IIBBBBB", body
            )
            if depth != 8:
                raise CodecError(f"PNG bit depth {depth} unsupported (8 only)")
            if ctype not in _PNG_CHANNELS:
                raise CodecError(f"PNG color type {ctype} invalid")
            if interlace:
                raise CodecError("interlaced PNG unsupported")
        elif ctag == b"PLTE":
            palette = np.frombuffer(body, dtype=np.uint8).reshape(-1, 3)
        elif ctag == b"IDAT":
            idat.append(body)
        elif ctag == b"IEND":
            break
        pos += 12 + clen  # len + tag + body + crc
    if width is None or not idat:
        raise CodecError("PNG missing IHDR/IDAT")
    raw = zlib.decompress(b"".join(idat))
    ch = _PNG_CHANNELS[ctype]
    mat = _png_unfilter(raw, width, height, ch).reshape(height, width, ch)
    if ctype == 3:
        if palette is None:
            raise CodecError("paletted PNG missing PLTE")
        mat = palette[mat[:, :, 0]]
    return mat


def encode_png(pixels: np.ndarray) -> bytes:
    """(height, width[, channels]) uint8 → PNG bytes (filter 0, one IDAT)."""
    px = np.asarray(pixels, dtype=np.uint8)
    if px.ndim == 2:
        px = px[:, :, None]
    h, w, ch = px.shape
    ctype = {1: 0, 2: 4, 3: 2, 4: 6}[ch]

    def chunk(tag: bytes, body: bytes) -> bytes:
        return (
            struct.pack(">I", len(body))
            + tag
            + body
            + struct.pack(">I", zlib.crc32(tag + body) & 0xFFFFFFFF)
        )

    ihdr = struct.pack(">IIBBBBB", w, h, 8, ctype, 0, 0, 0)
    raw = b"".join(b"\x00" + px[y].tobytes() for y in range(h))
    return (
        PNG_MAGIC
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib.compress(raw, 6))
        + chunk(b"IEND", b"")
    )


# ---------------------------------------------------------------- bmp

def decode_bmp(blob: bytes) -> np.ndarray:
    """Uncompressed 24/32-bit BITMAPINFOHEADER BMP → (h, w, 3) uint8 (RGB)."""
    if blob[:2] != b"BM" or len(blob) < 54:
        raise CodecError("not a BMP")
    data_off = struct.unpack("<I", blob[10:14])[0]
    hdr_size = struct.unpack("<I", blob[14:18])[0]
    if hdr_size < 40:
        raise CodecError(f"BMP header size {hdr_size} unsupported")
    w, h_signed = struct.unpack("<ii", blob[18:26])
    planes, bpp = struct.unpack("<HH", blob[26:30])
    compression = struct.unpack("<I", blob[30:34])[0]
    if compression != 0 or bpp not in (24, 32):
        raise CodecError(f"BMP bpp={bpp} compression={compression} unsupported")
    h = abs(h_signed)
    nb = bpp // 8
    stride = (w * nb + 3) & ~3  # rows pad to 4 bytes
    need = data_off + stride * h
    if len(blob) < need:
        raise CodecError("truncated BMP pixel data")
    rows = np.frombuffer(blob, dtype=np.uint8, count=stride * h, offset=data_off)
    rows = rows.reshape(h, stride)[:, : w * nb].reshape(h, w, nb)
    if h_signed > 0:
        rows = rows[::-1]  # bottom-up storage
    return rows[:, :, [2, 1, 0]]  # BGR(A) → RGB, alpha dropped


# ---------------------------------------------------------------- ppm

def decode_ppm(blob: bytes) -> np.ndarray:
    """Binary PPM (``P6``, maxval ≤ 255) → (h, w, 3) uint8."""
    if blob[:2] != b"P6":
        raise CodecError("not a binary PPM")
    # header: P6 <w> <h> <maxval> with comments/whitespace between tokens
    pos, fields = 2, []
    while len(fields) < 3:
        while pos < len(blob) and blob[pos : pos + 1].isspace():
            pos += 1
        if pos < len(blob) and blob[pos : pos + 1] == b"#":
            while pos < len(blob) and blob[pos] != 0x0A:
                pos += 1
            continue
        start = pos
        while pos < len(blob) and not blob[pos : pos + 1].isspace():
            pos += 1
        if start == pos:
            raise CodecError("truncated PPM header")
        fields.append(int(blob[start:pos]))
    pos += 1  # single whitespace after maxval
    w, h, maxval = fields
    if maxval > 255:
        raise CodecError("16-bit PPM unsupported")
    need = w * h * 3
    if len(blob) - pos < need:
        raise CodecError("truncated PPM pixel data")
    return np.frombuffer(blob, dtype=np.uint8, count=need, offset=pos).reshape(h, w, 3)


def encode_ppm(pixels: np.ndarray) -> bytes:
    px = np.asarray(pixels, dtype=np.uint8)
    h, w = px.shape[:2]
    return b"P6\n%d %d\n255\n" % (w, h) + px.tobytes()


# ---------------------------------------------------------------- image front door

#: lazily resolved JPEG decode backend: "pil" (libjpeg via Pillow — 2-3
#: orders faster than the bit-serial Python Huffman loop) or "pure".
#: SPARK_GRAFT_JPEG_BACKEND=auto|pure|pil; auto (default) prefers PIL when
#: importable.  Resolved once per process — on executors that means once
#: per Python worker, exactly where the decode runs.
_JPEG_BACKEND: str | None = None


def jpeg_backend() -> str:
    global _JPEG_BACKEND
    if _JPEG_BACKEND is None:
        import os

        mode = os.environ.get("SPARK_GRAFT_JPEG_BACKEND", "auto").lower()
        if mode == "pure":
            _JPEG_BACKEND = "pure"
        else:
            try:
                from PIL import Image  # noqa: F401

                _JPEG_BACKEND = "pil"
            except ImportError:
                if mode == "pil":
                    # explicit request: surface loudly, never as ok=False
                    raise RuntimeError(
                        "SPARK_GRAFT_JPEG_BACKEND=pil but Pillow is not importable"
                    )
                _JPEG_BACKEND = "pure"
    return _JPEG_BACKEND


def _decode_jpeg_pil(blob: bytes) -> np.ndarray:
    """libjpeg-backed decode with the SAME output contract as the pure
    path (codecs_jpeg.decode_jpeg): (H, W, 3) RGB, or (H, W, 1) for
    grayscale JPEGs; malformed input → CodecError.  Pixel values may
    differ from the pure decoder by ±2 (different IDCT approximations —
    both within the JPEG standard's decoder tolerance)."""
    import io

    from PIL import Image

    try:
        im = Image.open(io.BytesIO(bytes(blob)))
        im.load()
        if im.mode == "L":
            return np.asarray(im, dtype=np.uint8)[:, :, None]
        return np.asarray(im.convert("RGB"), dtype=np.uint8)
    except CodecError:
        raise
    except Exception as e:  # PIL raises its own zoo of exceptions
        raise CodecError(f"JPEG decode failed (pil): {e}") from e


def decode_image(blob: bytes, fmt: str | None = None) -> np.ndarray:
    """Decode PNG/BMP/PPM/baseline-JPEG bytes → (h, w, ch) uint8; raises
    CodecError on malformed or unsupported input (WebP, …).  JPEG uses
    libjpeg via Pillow when available (see :func:`jpeg_backend`) — the
    100 TB path; the dependency-free pure decoder is the fallback and
    the reference implementation the escape hatch is tested against."""
    fmt = fmt or sniff_format(blob)
    if fmt == "png":
        return decode_png(blob)
    if fmt == "bmp":
        return decode_bmp(blob)
    if fmt == "ppm":
        return decode_ppm(blob)
    if fmt == "jpeg":
        if jpeg_backend() == "pil":
            return _decode_jpeg_pil(blob)
        # lazy import: codecs_jpeg imports CodecError from this module
        from supersonic_spark.pipeline.codecs_jpeg import decode_jpeg

        return decode_jpeg(blob)
    raise CodecError(f"unsupported image format: {fmt!r}")


def resize_nearest(pixels: np.ndarray, width: int, height: int) -> np.ndarray:
    """Nearest-neighbor resize via numpy fancy indexing (pure gather)."""
    h, w = pixels.shape[:2]
    ys = (np.arange(height) * h // height).clip(0, h - 1)
    xs = (np.arange(width) * w // width).clip(0, w - 1)
    return pixels[ys][:, xs]


# ---------------------------------------------------------------- wav

def decode_wav(blob: bytes) -> tuple[np.ndarray, int]:
    """RIFF/WAVE bytes → (float64 waveform in [-1, 1] shaped (frames,
    channels), sample_rate).  PCM 8/16/32-bit int and IEEE float32."""
    if blob[:4] != b"RIFF" or blob[8:12] != b"WAVE":
        raise CodecError("not a RIFF/WAVE file")
    pos, fmt, data = 12, None, None
    while pos + 8 <= len(blob):
        tag, clen = blob[pos : pos + 4], struct.unpack("<I", blob[pos + 4 : pos + 8])[0]
        body = blob[pos + 8 : pos + 8 + clen]
        if tag == b"fmt ":
            if len(body) < 16:
                raise CodecError("truncated fmt chunk")
            fmt = struct.unpack("<HHIIHH", body[:16])
        elif tag == b"data":
            data = body
        pos += 8 + clen + (clen & 1)  # chunks are word-aligned
    if fmt is None or data is None:
        raise CodecError("WAV missing fmt/data chunk")
    audio_fmt, n_ch, rate, _byte_rate, _align, bits = fmt
    if audio_fmt == 1 and bits == 16:
        wave = np.frombuffer(data, dtype="<i2").astype(np.float64) / 32768.0
    elif audio_fmt == 1 and bits == 8:  # PCM8 is unsigned
        wave = (np.frombuffer(data, dtype=np.uint8).astype(np.float64) - 128.0) / 128.0
    elif audio_fmt == 1 and bits == 32:
        wave = np.frombuffer(data, dtype="<i4").astype(np.float64) / 2147483648.0
    elif audio_fmt == 3 and bits == 32:
        wave = np.frombuffer(data, dtype="<f4").astype(np.float64)
    else:
        raise CodecError(f"WAV format {audio_fmt}/{bits}-bit unsupported")
    if n_ch < 1:
        raise CodecError("WAV channel count 0")
    frames = len(wave) // n_ch
    return wave[: frames * n_ch].reshape(frames, n_ch), rate


def encode_wav_pcm16(wave: np.ndarray, rate: int = 16000) -> bytes:
    """(frames[, channels]) float in [-1, 1] → 16-bit PCM WAV bytes."""
    w = np.asarray(wave, dtype=np.float64)
    if w.ndim == 1:
        w = w[:, None]
    n_ch = w.shape[1]
    pcm = np.clip(np.round(w * 32767.0), -32768, 32767).astype("<i2").tobytes()
    fmt = struct.pack("<HHIIHH", 1, n_ch, rate, rate * n_ch * 2, n_ch * 2, 16)
    body = b"WAVE" + b"fmt " + struct.pack("<I", len(fmt)) + fmt
    body += b"data" + struct.pack("<I", len(pcm)) + pcm
    return b"RIFF" + struct.pack("<I", len(body)) + body
