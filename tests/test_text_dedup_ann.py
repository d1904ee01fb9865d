"""Training-data ops: text analysis, dedup family, ANN — over the
driver-provided documents/embeddings tables."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from medalforge_lakehouse_data_spark.functions import text as T
from medalforge_lakehouse_data_spark.operators import ann, dedup

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def docs(spark):
    return spark.read.parquet(f"{SF}/documents.parquet").cache()


@pytest.fixture(scope="module")
def embs(spark):
    return spark.read.parquet(f"{SF}/embeddings.parquet").cache()


def test_text_analysis_columns(spark, docs):
    out = T.with_text_analysis(docs, "text")
    r = out.select("lang_pred", "quality", "n_tokens_bpe", "n_tokens_ws",
                   "punct_ratio", "fingerprint").first()
    assert r.n_tokens_bpe >= r.n_tokens_ws > 0
    assert 0.0 <= r.quality <= 1.0
    # docs are english word-salad with 'the'/'a' present → mostly en
    langs = out.groupBy("lang_pred").count().collect()
    top = max(langs, key=lambda x: x["count"])
    assert top.lang_pred == "en"


def test_lang_id_known_samples(spark):
    df = spark.createDataFrame(
        [("the cat is on the mat and it is happy",),
         ("el gato es un animal que vive en la casa",),
         ("le chat est un animal et les chiens aussi",),
         ("zzz qqq xxx",)],
        ["text"],
    )
    out = [r[0] for r in df.select(T.lang_id("text")).collect()]
    assert out == ["en", "es", "fr", "und"]


def test_fingerprint_stable_under_whitespace(spark):
    df = spark.createDataFrame(
        [("a b c d e f g h",), ("  a   b c d e f g   h ",), ("totally different words here now ok",)],
        ["text"],
    )
    fps = [r[0] for r in df.select(T.fingerprint("text")).collect()]
    assert fps[0] == fps[1] != fps[2]


def test_exact_dedup(spark):
    df = spark.createDataFrame(
        [(1, "same text"), (2, "same text"), (3, "other")], ["id", "text"]
    )
    out = dedup.exact_dedup(df, ["text"], order_by=["id asc"])
    assert {r.id for r in out.collect()} == {1, 3}


def test_minhash_finds_near_duplicates(spark, docs):
    # plant near-duplicates: copy 5 docs with one word changed
    base = docs.limit(5).select(
        (F.col("doc_id") + 1_000_000).alias("doc_id"),
        F.concat(F.col("text"), F.lit(" extra")).alias("text"),
    )
    corpus = docs.select("doc_id", "text").unionByName(base)
    pairs = dedup.minhash_near_dup_pairs(
        corpus, "doc_id", "text", num_hashes=64, bands=16, threshold=0.5
    )
    found = {(r.id_a, r.id_b) for r in pairs.collect()}
    planted = {(i, i + 1_000_000) for i in range(5)}
    assert planted <= found, f"missing {planted - found}"
    # estimates are high for near-identical docs
    assert all(r.est_jaccard >= 0.5 for r in pairs.collect())


def test_simhash_near_dup(spark, docs):
    base = docs.limit(3).select(
        (F.col("doc_id") + 1_000_000).alias("doc_id"),
        F.concat(F.col("text"), F.lit(" tail")).alias("text"),
    )
    corpus = docs.select("doc_id", "text").unionByName(base)
    pairs = dedup.simhash_near_dup_pairs(corpus, "doc_id", "text", max_hamming=6)
    found = {(r.id_a, r.id_b) for r in pairs.collect()}
    planted = {(i, i + 1_000_000) for i in range(3)}
    assert planted <= found
    # identical docs → distance 0
    ident = dedup.simhash_near_dup_pairs(
        spark.createDataFrame([(1, "a b c d e"), (2, "a b c d e")], ["doc_id", "text"]),
        "doc_id", "text", max_hamming=0)
    assert [(r.id_a, r.id_b, r.hamming) for r in ident.collect()] == [(1, 2, 0)]


def test_ngram_jaccard_pairs(spark):
    df = spark.createDataFrame(
        [(1, "the quick brown fox jumps over the lazy dog"),
         (2, "the quick brown fox jumps over the lazy cat"),
         (3, "completely unrelated sentence with nothing shared at all")],
        ["doc_id", "text"],
    )
    pairs = dedup.ngram_jaccard_pairs(df, "doc_id", "text", n=3, threshold=0.3)
    got = {(r.id_a, r.id_b): r.jaccard for r in pairs.collect()}
    assert (1, 2) in got and got[(1, 2)] > 0.4
    assert all(k == (1, 2) for k in got)


def test_brute_force_topk_self_hit(spark, embs):
    queries = embs.limit(3).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("query_vec")
    )
    out = ann.brute_force_topk(embs, queries, k=5)
    rows = out.collect()
    assert len(rows) == 15
    # rank 1 for each query is the query itself (cosine 1.0)
    r1 = {r.query_id: (r.vec_id, r.cosine) for r in rows if r.rank == 1}
    for qid, (vid, cos) in r1.items():
        assert vid == qid and cos > 0.999


def test_ivf_topk_recall_vs_brute_force(spark, embs):
    queries = embs.limit(5).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("query_vec")
    )
    exact = ann.brute_force_topk(embs, queries, k=5)
    approx = ann.ivf_topk(embs, queries, k=5, nlist=8, n_probe=4)
    e = {(r.query_id, r.vec_id) for r in exact.collect()}
    a = {(r.query_id, r.vec_id) for r in approx.collect()}
    recall = len(e & a) / len(e)
    assert recall >= 0.6, f"IVF recall too low: {recall}"
    # self-hit must survive probing (query's own cell always probed first)
    assert all((q, q) in a for q in range(5) if (q, q) in e)


def test_embedding_near_dup_pairs(spark, embs):
    # plant exact duplicates
    dup = embs.limit(3).select(
        (F.col("vec_id") + 1_000_000).alias("vec_id"), "embedding"
    )
    corpus = embs.select("vec_id", "embedding").unionByName(dup)
    pairs = dedup.embedding_near_dup_pairs(corpus, "vec_id", "embedding", threshold=0.999)
    found = {(r.id_a, r.id_b) for r in pairs.collect()}
    assert {(i, i + 1_000_000) for i in range(3)} <= found
