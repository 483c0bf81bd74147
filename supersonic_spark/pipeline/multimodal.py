"""Multimodal (image/audio/video) column plumbing.

Media are opaque ``binary`` columns travelling next to typed metadata
structs — the Spark-native way to move 100 TB of media through the same
DataFrame plans as the text/relational data (partition by content hash,
never collect, never string-ify).

The actual codecs (PIL/ffmpeg/torchaudio) are NOT in this container, so the
decode kernels are STUBBED: ``decode_image_meta`` raises
NotImplementedError unless ``fake=True``, in which case it produces a
deterministic fake decode (dimensions derived from the content hash) so the
Spark-side plumbing — schema, batching, partitioning, UDF signature — is
real and testable end-to-end.  Swapping in a real codec changes only the
body of ``_decode_one``.
"""

from __future__ import annotations

import zlib
from typing import Iterator

import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

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


def _decode_one(blob: bytes, fake: bool) -> tuple:
    """Decode a single image blob → (width, height, n_bytes, ok).

    STUB: real decoding needs an image codec not present in this container.
    ``fake=True`` derives deterministic dimensions from the blob content so
    pipelines are testable; fake=False raises (marking the integration
    point).
    """
    if not fake:
        raise NotImplementedError(
            "image decode requires a codec (PIL/libvips) not available here; "
            "run with fake=True or plug a real decoder into _decode_one"
        )
    if blob is None:
        return (None, None, None, False)
    h = zlib.crc32(bytes(blob))  # deterministic across runs/processes
    w = 64 + (h % 1920)
    return (int(w), int((w * 3) // 4), len(blob), True)


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
            feats = [_decode_one(b, fake) for b in pdf[blob_col]]
            out = pdf[in_cols].copy()
            out[out_col] = [
                {"width": w, "height": hh, "n_bytes": nb, "ok": ok}
                for (w, hh, nb, ok) in feats
            ]
            yield out

    return df.mapInPandas(run, out_schema)


def frame_sample_plan(df: DataFrame, blob_col: str, every_n: int = 30) -> DataFrame:
    """Video frame-sampling *plan*: emits (video, frame_index) rows for a
    downstream decode kernel — the explode happens JVM-side so the Python
    decode only ever sees the frames it must touch.  Decode itself is the
    stubbed kernel above."""
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
    """Resize kernel over mapInPandas (Arrow batches).  Real decoders are
    not in this container: ``fake=True`` emits a deterministic stand-in
    (content-hash-seeded bytes of the target size) so the Spark-side
    plumbing — schema, batching, partitioning — is fully exercised;
    ``fake=False`` raises NotImplementedError inside the kernel."""
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
                if not fake:
                    raise NotImplementedError(
                        "image resize needs a real codec (PIL/cv2) — not in this container"
                    )
                seed = hashlib.sha256(bytes(blob or b"")).digest()
                data = (seed * (width * height // len(seed) + 1))[: width * height]
                res.append({"width": width, "height": height, "data": data})
            out[out_col] = res
            yield out

    return df.mapInPandas(run, out_schema)


AUDIO_FEATURES_TYPE = T.StructType(
    [
        T.StructField("n_bytes", T.IntegerType(), True),
        T.StructField("rms", T.DoubleType(), True),
        T.StructField("zero_crossings", T.IntegerType(), True),
        T.StructField("ok", T.BooleanType(), False),
    ]
)


def audio_features(df: DataFrame, blob_col: str, fake: bool = False,
                   out_col: str = "audio_features") -> DataFrame:
    """Audio feature extraction (RMS energy, zero-crossing count) over
    mapInPandas.  With ``fake=True`` the blob bytes are interpreted as a
    raw int8 waveform — deterministic, codec-free — so the numeric path
    (numpy over Arrow batches) is real even though no audio decoder is."""
    from supersonic_spark.operators.core import ensure_parallelism

    import numpy as np

    df = ensure_parallelism(df)
    out_schema = T.StructType(df.schema.fields + [T.StructField(out_col, AUDIO_FEATURES_TYPE, True)])
    in_cols = df.columns

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = pdf[in_cols].copy()
            feats = []
            for blob in pdf[blob_col]:
                if not fake:
                    raise NotImplementedError(
                        "audio decode needs a real codec (soundfile/ffmpeg) — not in this container"
                    )
                wave = np.frombuffer(bytes(blob or b""), dtype=np.int8).astype("float64")
                if len(wave) == 0:
                    feats.append({"n_bytes": 0, "rms": 0.0, "zero_crossings": 0, "ok": False})
                    continue
                rms = float(np.sqrt(np.mean(wave**2)))
                zc = int(np.sum(np.signbit(wave[1:]) != np.signbit(wave[:-1])))
                feats.append(
                    {"n_bytes": len(wave), "rms": rms, "zero_crossings": zc, "ok": True}
                )
            out[out_col] = feats
            yield out

    return df.mapInPandas(run, out_schema)
