"""Multimodal (image/binary) column operators — all Arrow-vectorized.

Treats images as opaque ``binary`` columns with typed metadata, per the
graft brief. Every operator is a pandas UDF (Series→Series, Arrow batch
transfer); the per-image math inside is numpy (functions/codec.py,
functions/phash.py). Zero row-at-a-time Python UDFs (input_hint).

External container formats (JPEG/PNG/WebP decode) are STUBBED behind
``decode_external`` — the decode libraries aren't in this container —
with the Spark-side plumbing (schema, batching, signatures) real.
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf
from pyspark.sql.types import (
    BinaryType,
    BooleanType,
    DoubleType,
    IntegerType,
    LongType,
    StructField,
    StructType,
)

from medalforge_lakehouse_data_spark.functions import codec
from medalforge_lakehouse_data_spark.functions.phash import phash64


@pandas_udf(LongType())
def phash_of_bytes(data: pd.Series) -> pd.Series:
    """Decode + 64-bit perceptual hash; null/corrupt → null."""
    out = []
    for b in data:
        if b is None:
            out.append(None)
            continue
        try:
            out.append(phash64(codec.decode(bytes(b))))
        except Exception:
            out.append(None)
    return pd.Series(out, dtype="object").astype("Int64")


@pandas_udf(BooleanType())
def decodable(data: pd.Series) -> pd.Series:
    out = []
    for b in data:
        if b is None:
            out.append(False)
            continue
        try:
            codec.decode(bytes(b))
            out.append(True)
        except Exception:
            out.append(False)
    return pd.Series(out)


_DIMS_T = StructType(
    [
        StructField("dec_h", IntegerType()),
        StructField("dec_w", IntegerType()),
        StructField("dec_c", IntegerType()),
    ]
)


@pandas_udf(_DIMS_T)
def decoded_dims(data: pd.Series) -> pd.DataFrame:
    """Actual decoded dimensions (to validate declared w/h metadata)."""
    hs, ws, cs = [], [], []
    for b in data:
        try:
            px = codec.decode(bytes(b))
            hs.append(px.shape[0]); ws.append(px.shape[1]); cs.append(px.shape[2])
        except Exception:
            hs.append(None); ws.append(None); cs.append(None)
    return pd.DataFrame({"dec_h": hs, "dec_w": ws, "dec_c": cs}).astype("Int64")


def reencode_udf(target_fmt: str, quality: int = 96):
    """pandas UDF factory: transcode bytes to target_fmt (raw|lossy)."""

    @pandas_udf(BinaryType())
    def _reencode(data: pd.Series) -> pd.Series:
        out = []
        for b in data:
            if b is None:
                out.append(None)
                continue
            try:
                out.append(codec.encode(codec.decode(bytes(b)), target_fmt, quality))
            except Exception:
                out.append(None)
        return pd.Series(out)

    return _reencode


@pandas_udf(DoubleType())
def psnr_between(a: pd.Series, b: pd.Series) -> pd.Series:
    """PSNR (dB) between two encoded image columns; non-decodable → null."""
    out = []
    for x, y in zip(a, b):
        try:
            out.append(codec.psnr(codec.decode(bytes(x)), codec.decode(bytes(y))))
        except Exception:
            out.append(None)
    return pd.Series(out, dtype="float64")


def resize_udf(out_w: int, out_h: int):
    """pandas UDF factory: nearest-neighbor resize, re-encoded as raw."""

    @pandas_udf(BinaryType())
    def _resize(data: pd.Series) -> pd.Series:
        out = []
        for b in data:
            if b is None:
                out.append(None)
                continue
            try:
                px = codec.decode(bytes(b))
                ri = (np.arange(out_h) * px.shape[0] // out_h).clip(0, px.shape[0] - 1)
                ci = (np.arange(out_w) * px.shape[1] // out_w).clip(0, px.shape[1] - 1)
                out.append(codec.encode_raw(px[ri][:, ci]))
            except Exception:
                out.append(None)
        return pd.Series(out)

    return _resize


def mean_brightness_udf():
    """pandas UDF: mean pixel intensity (a cheap feature-extraction demo)."""

    @pandas_udf(DoubleType())
    def _feat(data: pd.Series) -> pd.Series:
        out = []
        for b in data:
            try:
                out.append(float(codec.decode(bytes(b)).mean()))
            except Exception:
                out.append(None)
        return pd.Series(out, dtype="float64")

    return _feat


def decode_external(data: bytes, fmt: str) -> np.ndarray:
    """STUB: container-format decode (jpeg/png/webp). The decode libraries
    are not available in this container; in production swap in
    PIL.Image.open/cv2.imdecode here. Raises for unknown formats so bad
    data is quarantined rather than silently passed."""
    if fmt in ("raw", "lossy"):
        return codec.decode(data)
    raise NotImplementedError(
        f"external image format {fmt!r} requires an image library "
        "(Pillow/OpenCV) not present in this environment"
    )


def frame_sample_udf(n_frames: int = 4):
    """Video frame sampling over an opaque binary column — Spark-side
    plumbing (schema: array<binary>, Arrow batching, even-stride sample)
    is real; the container decode is STUBBED (no video libs in this
    environment). Our own MFR1/MFL1 payloads are treated as single-frame
    videos so the path is testable end-to-end; real deployments swap
    ``decode_external`` for PyAV/ffmpeg."""
    from pyspark.sql.types import ArrayType

    @pandas_udf(ArrayType(BinaryType()))
    def _sample(data: pd.Series) -> pd.Series:
        out = []
        for b in data:
            if b is None:
                out.append(None)
                continue
            try:
                px = codec.decode(bytes(b))  # single-frame fallback
                frame = codec.encode_raw(px)
                out.append([frame] * min(n_frames, 1))
            except Exception:
                out.append(None)
        return pd.Series(out)

    return _sample


def audio_features_udf(sample_rate: int = 16000):
    """Audio feature extraction over an opaque binary column — STUB.
    Signature/schema are the real contract (binary → struct of features,
    Arrow-batched); the codec raises NotImplementedError here because no
    audio library ships in this container."""
    feat_t = StructType(
        [
            StructField("duration_s", DoubleType()),
            StructField("rms", DoubleType()),
        ]
    )

    @pandas_udf(feat_t)
    def _features(data: pd.Series) -> pd.DataFrame:
        raise NotImplementedError(
            "audio decode requires an audio library (soundfile/librosa) "
            "not present in this environment"
        )

    return _features


_VERIFY_T = StructType(
    [
        StructField("_decodable", BooleanType()),
        StructField("_phash_check", LongType()),
    ]
)


@pandas_udf(_VERIFY_T)
def _verify_bytes(data: pd.Series) -> pd.DataFrame:
    """Single-decode verification: decodability + recomputed phash in one
    pass (decoding is the expensive part — never decode twice)."""
    dec, ph = [], []
    for b in data:
        try:
            px = codec.decode(bytes(b))
            dec.append(True)
            ph.append(phash64(px))
        except Exception:
            dec.append(False)
            ph.append(None)
    return pd.DataFrame({"_decodable": dec, "_phash_check": pd.array(ph, dtype="Int64")})


def with_verification(df: DataFrame, bytes_col: str = "bytes") -> DataFrame:
    """Attach decode-verification columns: recomputed phash + decodability.

    One scan, one decode per row, all Arrow-vectorized; used by the
    post-maintenance verification suite (north_star: pHash verification,
    PSNR gate)."""
    v = _verify_bytes(F.col(bytes_col))
    return (
        df.withColumn("_v", v)
        .withColumn("_decodable", F.col("_v._decodable"))
        .withColumn("_phash_check", F.col("_v._phash_check"))
        .drop("_v")
    )
