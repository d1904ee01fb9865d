"""Deduplication family for training-data pipelines, at-scale shapes:

  exact_dedup        hash-groupBy on content (or any column set)
  minhash_lsh        shingle → minhash signature → band buckets →
                     bucket-join candidate pairs → verified Jaccard
  simhash            64-bit simhash + Hamming-banded near-dup pairs
  ngram_jaccard      token n-gram inverted index → pair Jaccard
  embedding_near_dup cosine-over-threshold pairs via hyperplane-LSH
                     buckets (brute force for small inputs)

All pair-finders avoid O(n²): candidates come from equi-joins on
bucket/band keys (shuffle on compact keys), verification runs only on
candidates. Skew guard: oversized buckets are capped (documented on
each function) — the salting pattern from operators/skew.py applies
when a bucket key is pathologically hot."""

from __future__ import annotations

import zlib

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf
from pyspark.sql.types import ArrayType, LongType
from pyspark.sql.window import Window

from medalforge_lakehouse_data_spark.operators.etl_core import deduplicate as _dedup_step

_MERSENNE = (1 << 61) - 1


def _det_hash64(s: str, seed: int = 0) -> int:
    """Deterministic 63-bit string hash (crc32 hi/lo halves). Python's
    builtin hash() is PYTHONHASHSEED-salted per process — unusable on a
    cluster where executors must agree on shingle hashes."""
    b = s.encode("utf-8", "ignore")
    hi = zlib.crc32(b, seed & 0xFFFFFFFF)
    lo = zlib.crc32(b, ~seed & 0xFFFFFFFF)
    return ((hi << 31) ^ lo) & 0x7FFFFFFFFFFFFFFF


def exact_dedup(df: DataFrame, columns: list[str], order_by: list[str] | None = None) -> DataFrame:
    """Exact dedup on a column set. With order_by → deterministic winner
    (window/agg dedup); without → groupBy first-seen-arbitrary via
    max_by on a stable struct (still deterministic given unique rows)."""
    if order_by:
        return _dedup_step(df, columns, order_by, strategy="agg")
    return df.dropDuplicates(columns)


def _minhash_params(num_hashes: int, seed: int) -> tuple[np.ndarray, np.ndarray]:
    rng = np.random.default_rng(seed)
    a = rng.integers(1, _MERSENNE - 1, num_hashes, dtype=np.int64)
    b = rng.integers(0, _MERSENNE - 1, num_hashes, dtype=np.int64)
    return a, b


def minhash_signature_udf(num_hashes: int = 64, shingle_k: int = 5, seed: int = 42):
    """pandas UDF: text → minhash signature (array<long>).

    Shingles are k-word windows hashed with a polynomial rolling hash;
    minhash uses (a*x+b) mod p universal hashing, vectorized numpy over
    (shingles × hashes) per row."""
    a, b = _minhash_params(num_hashes, seed)

    @pandas_udf(ArrayType(LongType()))
    def _sig(texts: pd.Series) -> pd.Series:
        out = []
        for t in texts:
            if t is None:
                out.append(None)
                continue
            words = t.lower().split()
            if len(words) >= shingle_k:
                sh = {_det_hash64(" ".join(words[i : i + shingle_k]))
                      for i in range(len(words) - shingle_k + 1)}
            else:
                sh = {_det_hash64(" ".join(words))}
            x = np.fromiter(sh, dtype=np.int64, count=len(sh))
            # (H, S) products mod mersenne prime, then min per hash
            m = (a[:, None].astype(np.uint64) * x[None, :].astype(np.uint64)
                 + b[:, None].astype(np.uint64)) % np.uint64(_MERSENNE)
            out.append(m.min(axis=1).astype(np.int64).tolist())
        return pd.Series(out)

    return _sig


def minhash_near_dup_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    num_hashes: int = 64,
    bands: int = 16,
    shingle_k: int = 5,
    threshold: float = 0.7,
    seed: int = 42,
    max_bucket: int = 500,
) -> DataFrame:
    """Near-duplicate pairs (id_a < id_b, est_jaccard >= threshold).

    LSH banding: signature split into ``bands`` bands of r rows; docs
    sharing any band-hash become candidates (one shuffle on the band
    key). est_jaccard = fraction of matching minhashes. Buckets larger
    than ``max_bucket`` are dropped (boilerplate explosion guard — the
    standard practice; log-visible via the caller counting dropped)."""
    if num_hashes % bands:
        raise ValueError("num_hashes must be divisible by bands")
    r = num_hashes // bands
    sig = minhash_signature_udf(num_hashes, shingle_k, seed)
    with_sig = df.select(F.col(id_col).alias("id"), F.col(text_col).alias("text")) \
                 .withColumn("sig", sig(F.col("text"))).filter(F.col("sig").isNotNull())
    with_sig = with_sig.cache()

    band_cols = F.explode(
        F.transform(
            F.sequence(F.lit(0), F.lit(bands - 1)),
            lambda i: F.struct(
                i.alias("band"),
                F.xxhash64(F.concat_ws(",", F.transform(
                    F.slice(F.col("sig"), i * r + 1, r), lambda v: v.cast("string")
                ))).alias("bucket"),
            ),
        )
    )
    banded = with_sig.select("id", band_cols.alias("b")).select(
        "id", F.col("b.band").alias("band"), F.col("b.bucket").alias("bucket")
    )
    # cap pathological buckets
    sized = banded.withColumn(
        "bsize", F.count("*").over(Window.partitionBy("band", "bucket"))
    ).filter(F.col("bsize") <= max_bucket).drop("bsize")
    pairs = (
        sized.alias("l")
        .join(sized.alias("r"), ["band", "bucket"])
        .filter(F.col("l.id") < F.col("r.id"))
        .select(F.col("l.id").alias("id_a"), F.col("r.id").alias("id_b"))
        .distinct()
    )
    sigs = with_sig.select(F.col("id"), F.col("sig"))
    est = (
        pairs.join(sigs.withColumnRenamed("id", "id_a").withColumnRenamed("sig", "sig_a"), "id_a")
        .join(sigs.withColumnRenamed("id", "id_b").withColumnRenamed("sig", "sig_b"), "id_b")
        .withColumn(
            "est_jaccard",
            F.size(F.filter(F.zip_with("sig_a", "sig_b", lambda x, y: x == y), lambda v: v))
            / F.lit(float(num_hashes)),
        )
        .select("id_a", "id_b", "est_jaccard")
    )
    return est.filter(F.col("est_jaccard") >= threshold)


def simhash_udf(seed: int = 42):
    """pandas UDF: text → 64-bit simhash (token-hash bit voting)."""

    @pandas_udf(LongType())
    def _sim(texts: pd.Series) -> pd.Series:
        out = []
        for t in texts:
            if t is None:
                out.append(None)
                continue
            acc = np.zeros(64, dtype=np.int64)
            for w in t.lower().split():
                h = np.uint64(_det_hash64(w, seed))
                bits = (h >> np.arange(64, dtype=np.uint64)) & np.uint64(1)
                acc += np.where(bits.astype(bool), 1, -1)
            v = np.uint64(0)
            for i in range(64):
                if acc[i] > 0:
                    v |= np.uint64(1) << np.uint64(i)
            out.append(int(v.astype(np.int64)))
        return pd.Series(out, dtype="object").astype("Int64")

    return _sim


def simhash_near_dup_pairs(
    df: DataFrame, id_col: str, text_col: str, max_hamming: int = 3, seed: int = 42
) -> DataFrame:
    """Near-dup pairs by simhash Hamming distance <= max_hamming.

    Pigeonhole banding: split 64 bits into (max_hamming+1) bands — any
    pair within distance shares at least one exact band → equi-join on
    (band, band_bits), verify with bit_count(xor)."""
    nb = max_hamming + 1
    width = 64 // nb
    sim = simhash_udf(seed)
    base = df.select(F.col(id_col).alias("id"), sim(F.col(text_col)).alias("sh")) \
             .filter(F.col("sh").isNotNull()).cache()
    def _band_bits(i: int):
        shifted = F.shiftright(F.col("sh"), i * width)
        if width >= 64:  # single band: the whole hash, no mask (JVM long)
            return shifted
        return shifted.bitwiseAND(F.lit((1 << width) - 1))

    band_structs = [
        F.struct(F.lit(i).alias("band"), _band_bits(i).alias("bits"))
        for i in range(nb)
    ]
    bands = base.select(
        "id", "sh", F.explode(F.array(*band_structs)).alias("b")
    ).select("id", "sh", F.col("b.band").alias("band"), F.col("b.bits").alias("bits"))
    cand = (
        bands.alias("l").join(bands.alias("r"), ["band", "bits"])
        .filter(F.col("l.id") < F.col("r.id"))
        .select(F.col("l.id").alias("id_a"), F.col("r.id").alias("id_b"),
                F.col("l.sh").alias("sh_a"), F.col("r.sh").alias("sh_b"))
        .distinct()
    )
    return (
        cand.withColumn("hamming", F.bit_count(F.col("sh_a").bitwiseXOR(F.col("sh_b"))))
        .filter(F.col("hamming") <= max_hamming)
        .select("id_a", "id_b", "hamming")
    )


def ngram_jaccard_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    n: int = 3,
    threshold: float = 0.5,
    max_posting: int = 1000,
) -> DataFrame:
    """Exact token-n-gram Jaccard pairs via inverted index:
    explode n-grams → self-join on the n-gram (postings capped at
    ``max_posting`` to bound hot-gram fanout) → |A∩B| per pair → Jaccard
    with per-doc set sizes. Pure DataFrame ops, fully distributed."""
    words = F.split(F.lower(F.trim(F.col(text_col))), r"\s+")
    grams = F.when(
        F.array_size(words) >= n,
        F.array_distinct(
            F.transform(
                F.sequence(F.lit(0), F.array_size(words) - n),
                lambda i: F.xxhash64(F.concat_ws(" ", F.slice(words, i + 1, n))),
            )
        ),
    ).otherwise(F.array(F.xxhash64(F.concat_ws(" ", words))))
    base = df.select(F.col(id_col).alias("id"), grams.alias("grams")).cache()
    sizes = base.select("id", F.array_size("grams").alias("sz"))
    posts = base.select("id", F.explode("grams").alias("g"))
    posts = posts.withColumn("psize", F.count("*").over(Window.partitionBy("g"))) \
                 .filter(F.col("psize") <= max_posting).drop("psize")
    inter = (
        posts.alias("l").join(posts.alias("r"), "g")
        .filter(F.col("l.id") < F.col("r.id"))
        .groupBy(F.col("l.id").alias("id_a"), F.col("r.id").alias("id_b"))
        .agg(F.count("*").alias("common"))
    )
    out = (
        inter.join(sizes.withColumnRenamed("id", "id_a").withColumnRenamed("sz", "sz_a"), "id_a")
        .join(sizes.withColumnRenamed("id", "id_b").withColumnRenamed("sz", "sz_b"), "id_b")
        .withColumn("jaccard", F.col("common") / (F.col("sz_a") + F.col("sz_b") - F.col("common")))
        .select("id_a", "id_b", "jaccard")
    )
    return out.filter(F.col("jaccard") >= threshold)


def embedding_near_dup_pairs(
    df: DataFrame,
    id_col: str,
    vec_col: str,
    threshold: float = 0.95,
    n_planes: int = 12,
    seed: int = 42,
    brute_force_limit: int = 10_000,
) -> DataFrame:
    """Cosine-similarity near-dup pairs over an embedding column.

    Small inputs: exact brute force (self-join). At scale: random-
    hyperplane LSH — sign-bit signature → bucket equi-join → exact
    cosine verify on candidates only. High thresholds keep recall high
    (collision prob = (1 - θ/π)^n_planes)."""
    from medalforge_lakehouse_data_spark.operators.ann import (
        cosine_expr,
        hyperplane_bucket_udf,
    )

    base = df.select(F.col(id_col).alias("id"), F.col(vec_col).alias("v"))
    n = base.count()
    if n <= brute_force_limit:
        # Exact all-pairs via Arrow: the (small) corpus matrix ships in the
        # UDF closure; each Arrow batch does a B×N matmul and emits only
        # over-threshold pairs. BLAS makes the O(n²·d) flops trivial at
        # this size; rows leaving Python = matches only. (The LSH branch
        # below is the 10^12-scale path — nothing is collected there.)
        pdf = base.toPandas()
        ids_all = pdf["id"].to_numpy()
        m_all = np.stack(pdf["v"].to_numpy()).astype(np.float64)
        m_all = m_all / (np.linalg.norm(m_all, axis=1, keepdims=True) + 1e-300)
        id_t = dict(base.dtypes)["id"]

        def pair_batches(batches):
            for b in batches:
                ids = b["id"].to_numpy()
                m = np.stack(b["v"].to_numpy()).astype(np.float64)
                m = m / (np.linalg.norm(m, axis=1, keepdims=True) + 1e-300)
                sims = m @ m_all.T  # (B, N)
                bi, ni = np.nonzero(sims >= threshold)
                keep = ids[bi] < ids_all[ni]
                yield pd.DataFrame({
                    "id_a": ids[bi][keep],
                    "id_b": ids_all[ni][keep],
                    "cosine": sims[bi, ni][keep],
                })

        return base.mapInPandas(
            pair_batches, schema=f"id_a {id_t}, id_b {id_t}, cosine double"
        ).distinct()
    dim = len(base.select("v").first()["v"])
    bucket = hyperplane_bucket_udf(dim, n_planes, seed)
    b = base.withColumn("bkt", bucket(F.col("v")))
    pairs = (
        b.alias("l").join(b.alias("r"), "bkt")
        .filter(F.col("l.id") < F.col("r.id"))
    )
    out = pairs.select(
        F.col("l.id").alias("id_a"),
        F.col("r.id").alias("id_b"),
        cosine_expr(F.col("l.v"), F.col("r.v")).alias("cosine"),
    )
    return out.filter(F.col("cosine") >= threshold).distinct()
