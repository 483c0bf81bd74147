"""Pure-python GIF codec: the multi-frame (video-adjacent) member of the
codec family.

GIF's compression is LZW — stdlib-implementable — and it is LOSSLESS, so
multi-frame decode is exactly checkable (unlike JPEG's DC bounds).  This
gives the video-shaped pipeline path (frame extraction / sampling) real
decoded frames to work on instead of the byte-count stub.

Scope: GIF87a/89a, global and local color tables, multi-frame animations,
graphic-control/comment/application extensions (skipped structurally);
interlaced frames are rejected (CodecError), frame composition semantics
(disposal, transparency) are not applied — each image descriptor decodes
independently into its own rect on the logical screen, which is exact for
the full-frame animations the encoder here produces.  Malformed bytes
raise :class:`supersonic_spark.pipeline.codecs.CodecError`.

Throughput honesty: LZW decode is byte-serial Python — fine for test
corpora and small assets, 2-3 orders below a native codec; the kernel
boundary (`multimodal.gif_frame_features`) is the swap-in point.
"""

from __future__ import annotations

import struct

import numpy as np

from supersonic_spark.pipeline.codecs import CodecError

GIF_MAGICS = (b"GIF87a", b"GIF89a")


# ---------------------------------------------------------------- LZW

def _lzw_decode(data: bytes, min_code_size: int, n_pixels: int) -> np.ndarray:
    """GIF-flavoured LZW: variable code width starting at min+1, CLEAR
    resets the dictionary, EOI ends the stream."""
    clear = 1 << min_code_size
    eoi = clear + 1
    out = np.empty(n_pixels, dtype=np.uint8)
    n_out = 0

    acc = nbits = pos = 0
    width = min_code_size + 1
    dict_entries: list[bytes] = []
    prev: bytes | None = None

    def reset():
        nonlocal width, dict_entries, prev
        width = min_code_size + 1
        dict_entries = [bytes([i]) for i in range(clear)] + [b"", b""]
        prev = None

    reset()
    while True:
        while nbits < width:
            if pos >= len(data):
                raise CodecError("GIF LZW stream ended without EOI")
            acc |= data[pos] << nbits
            nbits += 8
            pos += 1
        code = acc & ((1 << width) - 1)
        acc >>= width
        nbits -= width
        if code == clear:
            reset()
            continue
        if code == eoi:
            break
        if prev is None:
            if code >= len(dict_entries):
                raise CodecError("GIF LZW first code out of range")
            entry = dict_entries[code]
        elif code < len(dict_entries):
            entry = dict_entries[code]
            dict_entries.append(prev + entry[:1])
        elif code == len(dict_entries):
            entry = prev + prev[:1]
            dict_entries.append(entry)
        else:
            raise CodecError("GIF LZW code out of range")
        if n_out + len(entry) > n_pixels:
            entry = entry[: n_pixels - n_out]  # tolerant of trailing excess
        out[n_out : n_out + len(entry)] = np.frombuffer(entry, dtype=np.uint8)
        n_out += len(entry)
        prev = dict_entries[code] if code < len(dict_entries) else entry
        if len(dict_entries) == (1 << width) and width < 12:
            width += 1
        if n_out >= n_pixels:
            break
    if n_out < n_pixels:
        raise CodecError(f"GIF LZW produced {n_out} of {n_pixels} pixels")
    return out


def _lzw_encode(indices: np.ndarray, min_code_size: int) -> bytes:
    """'Uncompressed-GIF' LZW: emit CLEAR often enough that the code width
    never grows past min+1, then write every pixel as a literal code —
    valid LZW, zero compression, trivially correct."""
    clear = 1 << min_code_size
    eoi = clear + 1
    width = min_code_size + 1
    # after a CLEAR the decoder adds one dict entry per literal; keep the
    # dictionary below 2^width so width never changes
    span = (1 << width) - eoi - 2
    out = bytearray()
    acc = nbits = 0

    def emit(code):
        nonlocal acc, nbits
        acc |= code << nbits
        nbits += width
        while nbits >= 8:
            out.append(acc & 0xFF)
            acc >>= 8
            nbits -= 8

    emit(clear)
    for i, v in enumerate(indices):
        if i and i % span == 0:
            emit(clear)
        emit(int(v))
    emit(eoi)
    if nbits:
        out.append(acc & 0xFF)
    return bytes(out)


def _sub_blocks(data: bytes) -> bytes:
    """Payload → length-prefixed sub-block chain + terminator."""
    out = bytearray()
    for i in range(0, len(data), 255):
        chunk = data[i : i + 255]
        out.append(len(chunk))
        out += chunk
    out.append(0)
    return bytes(out)


def _read_sub_blocks(blob: bytes, pos: int) -> tuple[bytes, int]:
    out = bytearray()
    while True:
        if pos >= len(blob):
            raise CodecError("truncated GIF sub-block chain")
        n = blob[pos]
        pos += 1
        if n == 0:
            return bytes(out), pos
        out += blob[pos : pos + n]
        if len(blob) < pos + n:
            raise CodecError("truncated GIF sub-block")
        pos += n


# ---------------------------------------------------------------- decode

def decode_gif_frames(blob: bytes) -> list[np.ndarray]:
    """GIF bytes → list of (h, w, 3) uint8 RGB frames (one per image
    descriptor, each rendered into its rect on the logical screen; pixels
    outside the rect are 0)."""
    if len(blob) < 13 or blob[:6] not in GIF_MAGICS:
        raise CodecError("not a GIF")
    sw, sh = struct.unpack("<HH", blob[6:10])
    packed, _bg, _aspect = blob[10], blob[11], blob[12]
    pos = 13
    gct = None
    if packed & 0x80:
        n = 2 << (packed & 0x07)
        if len(blob) < pos + 3 * n:
            raise CodecError("truncated GIF global color table")
        gct = np.frombuffer(blob[pos : pos + 3 * n], dtype=np.uint8).reshape(-1, 3)
        pos += 3 * n
    frames: list[np.ndarray] = []
    while pos < len(blob):
        tag = blob[pos]
        pos += 1
        if tag == 0x3B:  # trailer
            break
        if tag == 0x21:  # extension: label + sub-blocks
            pos += 1
            _, pos = _read_sub_blocks(blob, pos)
            continue
        if tag != 0x2C:
            raise CodecError(f"unknown GIF block 0x{tag:02x}")
        left, top, w, h = struct.unpack("<HHHH", blob[pos : pos + 8])
        ipacked = blob[pos + 8]
        pos += 9
        if ipacked & 0x40:
            raise CodecError("interlaced GIF unsupported")
        ct = gct
        if ipacked & 0x80:
            n = 2 << (ipacked & 0x07)
            if len(blob) < pos + 3 * n:
                raise CodecError("truncated GIF local color table")
            ct = np.frombuffer(blob[pos : pos + 3 * n], dtype=np.uint8).reshape(-1, 3)
            pos += 3 * n
        if ct is None:
            raise CodecError("GIF frame without a color table")
        min_code = blob[pos]
        pos += 1
        data, pos = _read_sub_blocks(blob, pos)
        idx = _lzw_decode(data, min_code, w * h).reshape(h, w)
        if idx.max() >= len(ct):
            raise CodecError("GIF pixel index outside color table")
        frame = np.zeros((sh, sw, 3), dtype=np.uint8)
        frame[top : top + h, left : left + w] = ct[idx]
        frames.append(frame)
    if not frames:
        raise CodecError("GIF with no image data")
    return frames


# ---------------------------------------------------------------- encode

def encode_gif(frames: list[np.ndarray]) -> bytes:
    """List of (h, w, 3) uint8 frames → GIF89a bytes with a 256-entry
    grayscale-cube palette (each pixel maps to its nearest palette entry;
    inputs whose channels are equal round-trip exactly)."""
    if not frames:
        raise ValueError("need at least one frame")
    sh, sw = frames[0].shape[:2]
    out = bytearray(b"GIF89a")
    out += struct.pack("<HH", sw, sh)
    out.append(0x80 | 0x07)  # GCT present, 256 entries
    out += b"\x00\x00"
    # palette: index i → (i, i, i)
    pal = np.repeat(np.arange(256, dtype=np.uint8)[:, None], 3, axis=1)
    out += pal.tobytes()
    for fr in frames:
        fr = np.asarray(fr, dtype=np.uint8)
        if fr.shape[:2] != (sh, sw):
            raise ValueError("all frames must share the logical screen size")
        idx = fr.mean(axis=2).round().astype(np.uint8)  # gray palette index
        out += b"\x2c" + struct.pack("<HHHH", 0, 0, sw, sh) + b"\x00"
        out.append(8)  # LZW min code size
        out += _sub_blocks(_lzw_encode(idx.reshape(-1), 8))
    out += b"\x3b"
    return bytes(out)
