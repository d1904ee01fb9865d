"""Deterministic synthetic image+caption table generator.

Produces the graft's authoritative input shape (BASELINE.json input_hint):
  image_id:string, bytes:binary, w:int, h:int, fmt:string,
  caption:string, phash:bigint

Properties engineered for the maintenance test suite (FIXTURES.md §1):
  * seed-stable: same (n, seed) → byte-identical rows, any cluster size
  * Zipf-skewed duplicate pixel content → heavy phash key skew
    (exercises salted joins / AQE skew handling in MERGE & dedup)
  * mixed raw/lossy formats, varied w/h (clamp + clustering fodder)
  * captions with occasional leading/trailing whitespace (trim fodder)

Generation is DISTRIBUTED: mapInPandas over spark.range(n), so bench
datasets scale with the cluster; each Arrow batch synthesizes its rows
from pure per-row seeds (no driver-side data).
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.types import (
    BinaryType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

from medalforge_lakehouse_data_spark.functions import codec
from medalforge_lakehouse_data_spark.functions.phash import phash64

IMAGES_SCHEMA = StructType(
    [
        StructField("image_id", StringType()),
        StructField("bytes", BinaryType()),
        StructField("w", IntegerType()),
        StructField("h", IntegerType()),
        StructField("fmt", StringType()),
        StructField("caption", StringType()),
        StructField("phash", LongType()),
    ]
)

_SIZES = np.array([32, 48, 64, 96, 128])
_SUBJECTS = ["sunset", "harbor", "forest", "market", "skyline", "meadow", "canyon"]


def _zipf_base(i: np.ndarray, n_bases: int, seed: int) -> np.ndarray:
    """Deterministic Zipf-ish base assignment: rank r gets weight ~ 1/r.

    Implemented via inverse-CDF over per-row uniform hashes so it needs
    no global state. Base 0 is the hot key (~1/H(n) of all rows)."""
    # splitmix64-style hash of (i, seed) → uniform in [0,1)
    mix = np.uint64((seed * 0x9E3779B97F4A7C15) & 0xFFFFFFFFFFFFFFFF)
    x = (i.astype(np.uint64) + mix) * np.uint64(0xBF58476D1CE4E5B9)
    x ^= x >> np.uint64(31)
    x *= np.uint64(0x94D049BB133111EB)
    x ^= x >> np.uint64(27)
    u = (x >> np.uint64(11)).astype(np.float64) / float(1 << 53)
    ranks = np.arange(1, n_bases + 1, dtype=np.float64)
    cdf = np.cumsum(1.0 / ranks)
    cdf /= cdf[-1]
    return np.searchsorted(cdf, u, side="right").clip(0, n_bases - 1)


def _base_pixels(base: int, seed: int) -> tuple[np.ndarray, int, int]:
    rng = np.random.default_rng((seed << 20) ^ base)
    w = int(_SIZES[rng.integers(0, len(_SIZES))])
    h = int(_SIZES[rng.integers(0, len(_SIZES))])
    yy, xx = np.mgrid[0:h, 0:w].astype(np.float32)
    a, b = rng.uniform(30, 70, 2)
    f1, f2 = rng.uniform(8, 30, 2)
    p1, p2 = rng.uniform(0, 6.28, 2)
    g = 128 + a * np.sin(xx / f1 + p1) + b * np.cos(yy / f2 + p2)
    g = g + rng.normal(0, 6, (h, w))
    img = np.stack(
        [g, g * rng.uniform(0.7, 1.0), g * rng.uniform(0.7, 1.0)], axis=2
    )
    return np.clip(img, 0, 255).astype(np.uint8), w, h


def _caption(base: int, i: int) -> str:
    s = _SUBJECTS[base % len(_SUBJECTS)]
    text = f"A synthetic {s} scene, variant {base}, frame {i % 97}."
    if i % 13 == 0:
        text = "  " + text
    if i % 17 == 0:
        text = text + "   "
    return text


def generate_batch(ids: np.ndarray, seed: int, n_bases: int) -> pd.DataFrame:
    bases = _zipf_base(ids, n_bases, seed)
    cache: dict[tuple[int, str], tuple[bytes, int, int, int]] = {}
    out = {k: [] for k in ("image_id", "bytes", "w", "h", "fmt", "caption", "phash")}
    for i, base in zip(ids.tolist(), bases.tolist()):
        fmt = "raw" if (base % 3 == 0) else "lossy"
        key = (base, fmt)
        if key not in cache:
            px, w, h = _base_pixels(base, seed)
            enc = codec.encode(px, fmt)
            # phash of what a reader will decode (lossy: decode round-trip)
            ph = phash64(codec.decode(enc) if fmt == "lossy" else px)
            cache[key] = (enc, w, h, ph)
        enc, w, h, ph = cache[key]
        out["image_id"].append(f"img_{i:012d}")
        out["bytes"].append(enc)
        out["w"].append(w)
        out["h"].append(h)
        out["fmt"].append(fmt)
        out["caption"].append(_caption(base, i))
        out["phash"].append(ph)
    return pd.DataFrame(out)


def images_df(
    spark: SparkSession,
    n: int,
    seed: int = 42,
    n_bases: int | None = None,
    partitions: int | None = None,
    id_offset: int = 0,
) -> DataFrame:
    """Distributed deterministic image table of n rows."""
    n_bases = n_bases or max(16, n // 50)
    partitions = partitions or max(8, n // 5000)

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids = pdf["id"].to_numpy() + id_offset
            yield generate_batch(ids, seed, n_bases)

    return (
        spark.range(0, n, 1, partitions)
        .mapInPandas(gen, schema=IMAGES_SCHEMA)
    )


def dirty_images_df(spark: SparkSession, n: int, seed: int = 42) -> DataFrame:
    """Variant with quality-rule violations (FIXTURES.md §1 dirty table):
    null image_id, corrupt bytes, out-of-range w/h, duplicate image_id."""
    base = images_df(spark, n, seed)

    def dirty(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            idx = pdf.index.to_numpy()
            rownum = pdf["image_id"].str.slice(4).astype(int).to_numpy()
            pdf.loc[rownum % 19 == 3, "image_id"] = None
            pdf.loc[rownum % 23 == 5, "bytes"] = b"CORRUPT!"
            pdf.loc[rownum % 29 == 7, "w"] = -5
            pdf.loc[rownum % 31 == 11, "h"] = 99999
            dup = rownum % 37 == 13
            if dup.any():
                pdf.loc[dup, "image_id"] = "img_000000000000"
            yield pdf

    return base.mapInPandas(dirty, schema=IMAGES_SCHEMA)
