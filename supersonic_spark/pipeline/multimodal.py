"""Multimodal (image/audio/video) column plumbing.

Media are opaque ``binary`` columns travelling next to typed metadata
structs — the Spark-native way to move 100 TB of media through the same
DataFrame plans as the text/relational data (partition by content hash,
never collect, never string-ify).

The decode kernels are REAL for the formats whose codecs are pure stdlib
(see :mod:`supersonic_spark.pipeline.codecs` and ``codecs_jpeg``): PNG /
BMP / PPM / baseline JPEG images and RIFF PCM WAV audio decode to actual
pixels/samples inside the Arrow-batched kernels below.  Anything else
(progressive JPEG, video containers, corrupt bytes) decodes to
``ok=False`` — at corpus scale an undecodable blob is data to filter, not
a reason to kill the stage.  ``fake=True`` keeps the
deterministic codec-free stand-in (dimensions derived from the content
hash) for plumbing tests that don't construct real files.
"""

from __future__ import annotations

import zlib
from typing import Iterator

import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from supersonic_spark.pipeline import codecs

#: metadata struct carried beside every media blob
MEDIA_META_TYPE = T.StructType(
    [
        T.StructField("media_type", T.StringType(), False),  # image|audio|video
        T.StructField("format", T.StringType(), True),  # png|jpeg|wav|mp4…
        T.StructField("source_uri", T.StringType(), True),
        T.StructField("content_hash", T.LongType(), True),
    ]
)

IMAGE_FEATURES_TYPE = T.StructType(
    [
        T.StructField("width", T.IntegerType(), True),
        T.StructField("height", T.IntegerType(), True),
        T.StructField("n_bytes", T.LongType(), True),
        T.StructField("channels", T.IntegerType(), True),
        T.StructField("pix_sum", T.LongType(), True),  # Σ pixel bytes — decode checksum
        T.StructField("ok", T.BooleanType(), False),
    ]
)


def attach_media(df: DataFrame, blob_col: str, media_type: str, fmt: str | None = None,
                 uri_col: str | None = None) -> DataFrame:
    """Wrap a raw binary column with the typed metadata struct (content hash
    via xxhash64 — dedup/bucketing key for blobs)."""
    meta = F.struct(
        F.lit(media_type).alias("media_type"),
        F.lit(fmt).alias("format"),
        (F.col(uri_col) if uri_col else F.lit(None).cast("string")).alias("source_uri"),
        F.xxhash64(F.col(blob_col)).alias("content_hash"),
    )
    return df.withColumn("media_meta", meta)


def _decode_one(blob: bytes, fake: bool) -> dict:
    """Decode a single image blob → image-features dict.

    Real path: pure-stdlib PNG/BMP/PPM/baseline-JPEG decode (see
    pipeline.codecs) — actual dimensions, channel count, and a pixel
    checksum proving the pixels were recovered, not just the header read.
    Undecodable/unsupported blobs (progressive JPEG, corrupt data) yield
    ok=False.  ``fake=True`` keeps the deterministic codec-free stand-in
    (length-derived dimensions)."""
    none = {"width": None, "height": None, "n_bytes": None, "channels": None,
            "pix_sum": None, "ok": False}
    if blob is None:
        return none
    if fake:
        # dimensions derive from blob LENGTH (not a Python-only hash) so the
        # fake path is replayable by any SQL engine — the plumbing query's
        # oracle recomputes these from octet_length
        w = 64 + (len(blob) % 1920)
        return {"width": int(w), "height": int((w * 3) // 4), "n_bytes": len(blob),
                "channels": 3, "pix_sum": None, "ok": True}
    try:
        px = codecs.decode_image(bytes(blob))
    except codecs.CodecError:
        return dict(none, n_bytes=len(blob))
    return {
        "width": int(px.shape[1]),
        "height": int(px.shape[0]),
        "n_bytes": len(blob),
        "channels": int(px.shape[2]),
        "pix_sum": int(px.sum(dtype="int64")),
        "ok": True,
    }


def decode_image_meta(df: DataFrame, blob_col: str, fake: bool = False,
                      out_col: str = "image_features") -> DataFrame:
    """Arrow-batched decode: mapInPandas so each Python invocation handles a
    whole columnar batch (the sanctioned Python path for media kernels).
    Input is redistributed when the source yields fewer splits than cores —
    decode kernels are the most CPU-dense operators in the engine."""
    from supersonic_spark.operators.core import ensure_parallelism

    df = ensure_parallelism(df)
    # StructType.add mutates in place — build a fresh schema
    out_schema = T.StructType(df.schema.fields + [T.StructField(out_col, IMAGE_FEATURES_TYPE, True)])
    in_cols = df.columns

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = pdf[in_cols].copy()
            out[out_col] = [_decode_one(b, fake) for b in pdf[blob_col]]
            yield out

    return df.mapInPandas(run, out_schema)


def synthesize_png(df: DataFrame, width_col: str, height_col: str, fill_col: str,
                   out_col: str = "blob") -> DataFrame:
    """Synthesize solid-fill RGB PNG blobs from per-row (width, height,
    fill-value) columns — the encoder twin of :func:`decode_image_meta`,
    used to drive the REAL decode path end-to-end without external image
    files.  Runs in mapInPandas like every media kernel."""
    import numpy as np

    from supersonic_spark.operators.core import ensure_parallelism

    df = ensure_parallelism(df)
    out_schema = T.StructType(df.schema.fields + [T.StructField(out_col, T.BinaryType(), True)])
    in_cols = df.columns

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = pdf[in_cols].copy()
            out[out_col] = [
                codecs.encode_png(np.full((int(h), int(w), 3), int(v) & 0xFF, dtype=np.uint8))
                for w, h, v in zip(pdf[width_col], pdf[height_col], pdf[fill_col])
            ]
            yield out

    return df.mapInPandas(run, out_schema)


def synthesize_jpeg(df: DataFrame, width_col: str, height_col: str, fill_col: str,
                    quality: int = 85, subsample: str = "444",
                    out_col: str = "blob") -> DataFrame:
    """Synthesize solid-fill RGB baseline-JPEG blobs from per-row
    dimensions — drives the REAL entropy-coded decode path (DCT + Huffman)
    end to end.  A solid fill is pure DC, so the decoded mean pixel is
    within half a quantization step of the fill value — the oracle-checkable
    property for a lossy codec."""
    import numpy as np

    from supersonic_spark.operators.core import ensure_parallelism
    from supersonic_spark.pipeline import codecs_jpeg

    df = ensure_parallelism(df)
    out_schema = T.StructType(df.schema.fields + [T.StructField(out_col, T.BinaryType(), True)])
    in_cols = df.columns

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = pdf[in_cols].copy()
            out[out_col] = [
                codecs_jpeg.encode_jpeg(
                    np.full((int(h), int(w), 3), int(v) & 0xFF, dtype=np.uint8),
                    quality=quality, subsample=subsample,
                )
                for w, h, v in zip(pdf[width_col], pdf[height_col], pdf[fill_col])
            ]
            yield out

    return df.mapInPandas(run, out_schema)


def synthesize_wav(df: DataFrame, frames_col: str, level_col: str,
                   rate: int = 16000, out_col: str = "blob") -> DataFrame:
    """Synthesize 16-bit PCM WAV blobs: per row, ``frames`` samples of an
    alternating ±``level`` (int16 scale) square wave — closed-form RMS
    (level/32768) and zero-crossing count (frames-1) make the REAL WAV
    decode path oracle-checkable."""
    import numpy as np

    from supersonic_spark.operators.core import ensure_parallelism

    df = ensure_parallelism(df)
    out_schema = T.StructType(df.schema.fields + [T.StructField(out_col, T.BinaryType(), True)])
    in_cols = df.columns

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = pdf[in_cols].copy()
            blobs = []
            for n, lvl in zip(pdf[frames_col], pdf[level_col]):
                n, lvl = int(n), int(lvl)
                wave = np.where(np.arange(n) % 2 == 0, lvl, -lvl) / 32767.0
                blobs.append(codecs.encode_wav_pcm16(wave, rate))
            out[out_col] = blobs
            yield out

    return df.mapInPandas(run, out_schema)


def synthesize_gif(df: DataFrame, frames_col: str, width_col: str, height_col: str,
                   fill_col: str, out_col: str = "blob") -> DataFrame:
    """Synthesize multi-frame GIF blobs: ``frames`` solid-gray frames where
    frame f's fill is (fill + 7·f) mod 256 — GIF is lossless, so every
    decoded frame's pixel sum has an exact closed form."""
    import numpy as np

    from supersonic_spark.operators.core import ensure_parallelism
    from supersonic_spark.pipeline import codecs_gif

    df = ensure_parallelism(df)
    out_schema = T.StructType(df.schema.fields + [T.StructField(out_col, T.BinaryType(), True)])
    in_cols = df.columns

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = pdf[in_cols].copy()
            blobs = []
            for n, w, h, v in zip(pdf[frames_col], pdf[width_col],
                                  pdf[height_col], pdf[fill_col]):
                frames = [
                    np.full((int(h), int(w), 3), (int(v) + 7 * f) % 256, dtype=np.uint8)
                    for f in range(int(n))
                ]
                blobs.append(codecs_gif.encode_gif(frames))
            out[out_col] = blobs
            yield out

    return df.mapInPandas(run, out_schema)


GIF_FRAME_FEATURES_TYPE = T.StructType(
    [
        T.StructField("frame_index", T.IntegerType(), True),
        T.StructField("n_frames", T.IntegerType(), True),
        T.StructField("width", T.IntegerType(), True),
        T.StructField("height", T.IntegerType(), True),
        T.StructField("pix_sum", T.LongType(), True),
        T.StructField("ok", T.BooleanType(), False),
    ]
)


def gif_frame_features(df: DataFrame, blob_col: str, every_n: int = 1) -> DataFrame:
    """REAL multi-frame (video-shaped) decode: parse each GIF blob, decode
    its frames through LZW, and emit one row per SAMPLED frame (stride
    ``every_n``) with exact per-frame pixel stats — the decoded-frames
    successor of :func:`frame_sample_plan`'s byte-count stub.  Undecodable
    blobs emit a single ok=False row, keeping the corpus-tolerant
    contract."""
    from supersonic_spark.operators.core import ensure_parallelism
    from supersonic_spark.pipeline import codecs_gif

    df = ensure_parallelism(df)
    out_schema = T.StructType(
        df.schema.fields + [T.StructField("frame", GIF_FRAME_FEATURES_TYPE, True)]
    )
    in_cols = df.columns

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for _, row in pdf.iterrows():
                base = {c: row[c] for c in in_cols}
                try:
                    frames = codecs_gif.decode_gif_frames(bytes(row[blob_col]))
                except codecs.CodecError:
                    rows.append(dict(base, frame={
                        "frame_index": None, "n_frames": None, "width": None,
                        "height": None, "pix_sum": None, "ok": False}))
                    continue
                for fi in range(0, len(frames), every_n):
                    fr = frames[fi]
                    rows.append(dict(base, frame={
                        "frame_index": fi, "n_frames": len(frames),
                        "width": int(fr.shape[1]), "height": int(fr.shape[0]),
                        "pix_sum": int(fr.sum(dtype="int64")), "ok": True}))
            yield pd.DataFrame(rows, columns=in_cols + ["frame"])

    return df.mapInPandas(run, out_schema)


def frame_sample_plan(df: DataFrame, blob_col: str, every_n: int = 30) -> DataFrame:
    """Video frame-sampling *plan*: emits (video, frame_index) rows for a
    downstream decode kernel — the explode happens JVM-side so the Python
    decode only ever sees the frames it must touch.  For containers with a
    real decoder here (GIF), :func:`gif_frame_features` does plan + decode
    in one kernel; this byte-count stub stands in for codecs (MP4/H.264)
    that have none."""
    n_frames = (F.octet_length(F.col(blob_col)) / F.lit(1024)).cast("int")  # stub: 1 frame/KiB
    idx = F.sequence(F.lit(0), F.greatest(n_frames - 1, F.lit(0)), F.lit(every_n))
    return df.withColumn("frame_index", F.explode(idx))


IMAGE_RESIZE_TYPE = T.StructType(
    [
        T.StructField("width", T.IntegerType(), True),
        T.StructField("height", T.IntegerType(), True),
        T.StructField("data", T.BinaryType(), True),
    ]
)


def resize_image(df: DataFrame, blob_col: str, width: int, height: int,
                 fake: bool = False, out_col: str = "resized") -> DataFrame:
    """Resize kernel over mapInPandas (Arrow batches).

    Real path: decode PNG/BMP/PPM (pure stdlib — pipeline.codecs),
    nearest-neighbor resample via numpy gather, re-encode as PNG.
    Undecodable blobs yield a NULL struct.  ``fake=True`` emits the
    deterministic codec-free stand-in (content-hash-seeded bytes of the
    target size) for plumbing tests."""
    from supersonic_spark.operators.core import ensure_parallelism

    df = ensure_parallelism(df)
    out_schema = T.StructType(df.schema.fields + [T.StructField(out_col, IMAGE_RESIZE_TYPE, True)])
    in_cols = df.columns

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import hashlib

        for pdf in batches:
            out = pdf[in_cols].copy()
            res = []
            for blob in pdf[blob_col]:
                if fake:
                    seed = hashlib.sha256(bytes(blob or b"")).digest()
                    data = (seed * (width * height // len(seed) + 1))[: width * height]
                    res.append({"width": width, "height": height, "data": data})
                    continue
                try:
                    px = codecs.decode_image(bytes(blob))
                    small = codecs.resize_nearest(px, width, height)
                    res.append(
                        {"width": width, "height": height, "data": codecs.encode_png(small)}
                    )
                except (codecs.CodecError, TypeError):
                    res.append(None)
            out[out_col] = res
            yield out

    return df.mapInPandas(run, out_schema)


AUDIO_FEATURES_TYPE = T.StructType(
    [
        T.StructField("n_bytes", T.IntegerType(), True),
        T.StructField("n_frames", T.LongType(), True),
        T.StructField("channels", T.IntegerType(), True),
        T.StructField("sample_rate", T.IntegerType(), True),
        T.StructField("rms", T.DoubleType(), True),
        T.StructField("zero_crossings", T.IntegerType(), True),
        T.StructField("ok", T.BooleanType(), False),
    ]
)


def audio_features(df: DataFrame, blob_col: str, fake: bool = False,
                   out_col: str = "audio_features") -> DataFrame:
    """Audio feature extraction (RMS energy, zero-crossing count) over
    mapInPandas.

    Real path: RIFF PCM WAV decode (pure stdlib — pipeline.codecs), mono
    mixdown, then numpy RMS / zero-crossing over the recovered waveform;
    non-WAV or corrupt blobs yield ok=False.  With ``fake=True`` the blob
    bytes are interpreted directly as a raw int8 waveform — deterministic,
    codec-free — for plumbing tests."""
    from supersonic_spark.operators.core import ensure_parallelism

    import numpy as np

    df = ensure_parallelism(df)
    out_schema = T.StructType(df.schema.fields + [T.StructField(out_col, AUDIO_FEATURES_TYPE, True)])
    in_cols = df.columns

    def stats(wave: "np.ndarray") -> tuple[float, int]:
        rms = float(np.sqrt(np.mean(wave**2)))
        zc = int(np.sum(np.signbit(wave[1:]) != np.signbit(wave[:-1])))
        return rms, zc

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = pdf[in_cols].copy()
            feats = []
            for blob in pdf[blob_col]:
                raw = bytes(blob or b"")
                if fake:
                    wave = np.frombuffer(raw, dtype=np.int8).astype("float64")
                    if len(wave) == 0:
                        feats.append({"n_bytes": 0, "n_frames": 0, "channels": None,
                                      "sample_rate": None, "rms": 0.0,
                                      "zero_crossings": 0, "ok": False})
                        continue
                    rms, zc = stats(wave)
                    feats.append({"n_bytes": len(wave), "n_frames": len(wave),
                                  "channels": 1, "sample_rate": None, "rms": rms,
                                  "zero_crossings": zc, "ok": True})
                    continue
                try:
                    frames, rate = codecs.decode_wav(raw)
                except codecs.CodecError:
                    feats.append({"n_bytes": len(raw), "n_frames": None, "channels": None,
                                  "sample_rate": None, "rms": None,
                                  "zero_crossings": None, "ok": False})
                    continue
                mono = frames.mean(axis=1)
                rms, zc = stats(mono) if len(mono) else (0.0, 0)
                feats.append({"n_bytes": len(raw), "n_frames": int(frames.shape[0]),
                              "channels": int(frames.shape[1]), "sample_rate": int(rate),
                              "rms": rms, "zero_crossings": zc, "ok": True})
            out[out_col] = feats
            yield out

    return df.mapInPandas(run, out_schema)
