"""Round-4 ADVICE regression tests.

1. bloom per-VALUE float fast-path: a mixed integral/fractional float
   build must still accept an all-integral probe (per-array decisions
   produced bloom false negatives → silent merge mis-pruning).
2. full-mode cluster_rewrite pins its read to the planned entries and
   re-plans inside the retry loop: a concurrent append landing between
   listing and read (or during a conflict-retry window) must appear
   exactly once in the final table, never duplicated.
3. IVF indexes are keyed per (vec_col, nlist): two cell counts coexist
   instead of clobber-retraining each other; maintenance retrains a
   stale index once the corpus doubles.
"""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql.types import LongType, StringType, StructField, StructType

from medalforge_lakehouse_data_spark.format.bloom import Bloom, hash_values
from medalforge_lakehouse_data_spark.format.table import Table
from medalforge_lakehouse_data_spark.maintenance import clustering
from medalforge_lakehouse_data_spark.maintenance.auto import (
    MaintenancePolicy,
    maybe_maintain,
)
from medalforge_lakehouse_data_spark.operators import ann
from medalforge_lakehouse_data_spark.operators.merge import merge_into

SIMPLE = StructType([
    StructField("k", LongType()),
    StructField("v", StringType()),
])


# ------------------------------------------------- 1. bloom per-value hashing


def test_bloom_mixed_float_build_accepts_integral_probe():
    """File column [1.0, 2.5, 3.0, nan] vs planner probe [1, 3] (ints):
    the integral floats must hash on the int path regardless of their
    fractional neighbors."""
    build = np.array([1.0, 2.5, 3.0, float("nan")], dtype=np.float64)
    b = Bloom.build(build)
    got = b.may_contain(np.array([1, 3], dtype=np.int64))
    assert bool(got.all()), "mixed-array build str-hashed its integral keys"
    # and the fractional value still matches a float probe
    assert bool(b.may_contain(np.array([2.5]))[0])


def test_bloom_int_build_accepts_mixed_float_probe():
    b = Bloom.build(np.arange(20, dtype=np.int64))
    probe = np.array([4.0, 7.5, 11.0], dtype=np.float64)
    got = b.may_contain(probe)
    assert bool(got[0]) and bool(got[2])


def test_hash_values_per_element_composition_invariance():
    """hash(x) must not depend on what else is in the array."""
    mixed = hash_values(np.array([1.0, 2.5, 3.0]))
    assert mixed[0] == hash_values(np.array([1.0]))[0]
    assert mixed[0] == hash_values(np.array([1], dtype=np.int64))[0]
    assert mixed[1] == hash_values(np.array([2.5]))[0]
    assert mixed[2] == hash_values(np.array([3.0, 4.0]))[0]


def test_hash_values_huge_and_nonfinite_floats_stable():
    # out-of-int64-range / non-finite floats take the str path, both sides
    vals = np.array([1e19, float("inf"), float("nan")])
    a = hash_values(vals)
    b = np.array([hash_values(vals[i:i + 1])[0] for i in range(3)])
    assert (a == b).all()


# ---------------------------- 2. cluster full-mode vs concurrent append


def _mk_table(spark, path, n=40, files=4):
    t = Table.create(path, SIMPLE)
    per = n // files
    for i in range(files):
        t.append(spark, spark.createDataFrame(
            [(i * per + j, f"v{i * per + j}") for j in range(per)], SIMPLE))
    return t


def test_cluster_full_mode_concurrent_append_not_duplicated(
        spark, tmp_path, monkeypatch):
    """An append landing between the full-mode file listing and the read
    must NOT be folded into the rewrite while its file stays referenced
    (that duplicated its rows). The read is pinned to planned entries."""
    t = _mk_table(spark, str(tmp_path / "t"))
    real_read = Table.read_entries
    fired = {"done": False}

    def racing_read(self, spark_, entries, apply_deletes=True):
        if not fired["done"]:
            fired["done"] = True
            Table(self.root).append(
                spark, spark.createDataFrame([(1000, "late")], SIMPLE))
        return real_read(self, spark_, entries, apply_deletes)

    monkeypatch.setattr(Table, "read_entries", racing_read)
    m = clustering.cluster_rewrite(t, spark, columns=("k",), mode="full")
    assert m["files_out"] >= 1
    rows = t.scan(spark).collect()
    ks = [r.k for r in rows]
    assert len(ks) == len(set(ks)) == 41, \
        f"expected 41 unique keys, got {len(ks)} rows / {len(set(ks))} unique"
    assert 1000 in set(ks)


def test_cluster_full_mode_replans_on_conflict_retry(
        spark, tmp_path, monkeypatch):
    """A MoR delete forces a conflict-retry; an append in the same window
    must be picked up by the RE-PLAN (fresh listing), appearing exactly
    once, while the delete applies."""
    t = _mk_table(spark, str(tmp_path / "t"))
    real_read = Table.read_entries
    fired = {"done": False}

    def racing_read(self, spark_, entries, apply_deletes=True):
        df = real_read(self, spark_, entries, apply_deletes)
        if not fired["done"]:
            fired["done"] = True
            other = Table(self.root)
            merge_into(other, spark.createDataFrame([(7, "x")], SIMPLE),
                       ["k"], spark, when_matched="delete",
                       when_not_matched=None, strategy="merge-on-read")
            other.append(
                spark, spark.createDataFrame([(2000, "late")], SIMPLE))
            df = df.cache()
            df.count()  # materialize the stale read
        return df

    monkeypatch.setattr(Table, "read_entries", racing_read)
    clustering.cluster_rewrite(t, spark, columns=("k",), mode="full")
    ks = [r.k for r in t.scan(spark).collect()]
    assert len(ks) == len(set(ks)), "retry duplicated rows"
    assert 7 not in set(ks), "retry resurrected a MoR-deleted row"
    assert 2000 in set(ks)
    assert len(ks) == 40  # 40 - 1 deleted + 1 appended


# ----------------------------------- 3. IVF per-nlist keys + staleness


@pytest.fixture()
def emb_table(spark, tmp_path):
    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet") \
        .selectExpr("vec_id",
                    "transform(embedding, x -> cast(x as double)) as embedding")
    t = Table.create(str(tmp_path / "emb"), emb.schema)
    t.append(spark, emb)
    return t, emb


def test_ivf_indexes_coexist_per_nlist(spark, emb_table, monkeypatch):
    t, emb = emb_table
    c4 = ann.build_ivf_index(t, spark, "embedding", nlist=4, sample_rows=2000)
    c8 = ann.build_ivf_index(t, spark, "embedding", nlist=8, sample_rows=2000)
    assert ann.load_ivf_index(t, "embedding", 4).shape == (4, c4.shape[1])
    assert ann.load_ivf_index(t, "embedding", 8).shape == (8, c8.shape[1])
    # ambiguous no-nlist load raises instead of guessing
    with pytest.raises(ValueError, match="multiple IVF indexes"):
        ann.load_ivf_index(t, "embedding")
    assert {(c, n) for c, n, _ in ann.list_ivf_indexes(t)} == {
        ("embedding", 4), ("embedding", 8)}

    # neither caller retrains: both indexes persist
    def boom(*a, **kw):
        raise AssertionError("retrained despite persisted per-nlist index")

    monkeypatch.setattr(ann, "train_ivf_centroids", boom)
    q = emb.limit(2).selectExpr("vec_id as query_id", "embedding as query_vec")
    assert ann.ivf_topk_on_table(t, spark, q, k=3, nlist=4, n_probe=4).count() == 6
    assert ann.ivf_topk_on_table(t, spark, q, k=3, nlist=8, n_probe=8).count() == 6


def test_ivf_staleness_retrains_when_corpus_doubles(spark, emb_table, monkeypatch):
    t, emb = emb_table
    ann.build_ivf_index(t, spark, "embedding", nlist=4, sample_rows=2000)
    (_, _, trained0), = ann.list_ivf_indexes(t)
    assert trained0 > 0

    # below the 2x threshold: no retrain
    policy = MaintenancePolicy(compact_after_appends=10_000,
                               max_delete_files=0)
    def boom(*a, **kw):
        raise AssertionError("retrained below staleness threshold")
    monkeypatch.setattr(ann, "train_ivf_centroids", boom)
    out = maybe_maintain(t, spark, policy)
    assert "ivf_retrained" not in out
    monkeypatch.undo()

    # append past 2x trained rows → maybe_maintain retrains + restamps
    t.append(spark, emb)
    t.append(spark, emb.withColumn("vec_id", emb.vec_id + 1_000_000))
    out = maybe_maintain(t, spark, policy)
    assert out.get("ivf_retrained"), "stale IVF index not retrained"
    (_, _, trained1), = ann.list_ivf_indexes(t)
    assert trained1 >= 3 * trained0 - 3


# ------------------------- 4. merge serves recorded cluster boundaries


def _images_table(spark, tmp_path, rows=1000):
    from medalforge_lakehouse_data_spark.testing.datagen import (
        IMAGES_SCHEMA,
        images_df,
    )

    t = Table.create(str(tmp_path / "imgs"), IMAGES_SCHEMA,
                     properties={"merge.cluster-rekey-min-bytes": "1"})
    t.append(spark, images_df(spark, rows, seed=3), target_file_count=8)
    clustering.cluster_rewrite(
        t, spark, columns=("phash", "w", "h"), target_file_bytes=64 * 1024)
    return t


def test_merge_uses_recorded_cluster_boundaries(spark, tmp_path, monkeypatch):
    """After a full cluster job, a layout-preserving merge must re-key on
    the boundaries recorded in cluster.* properties — zero extra Spark
    jobs — and still preserve tags + pruning + correctness."""
    from pyspark.sql import functions as F

    from medalforge_lakehouse_data_spark.testing.datagen import images_df

    t = _images_table(spark, tmp_path)
    props = t.metadata().properties
    assert props.get("cluster.boundaries"), "cluster job recorded no boundaries"
    assert props.get("cluster.bounds") and props.get("cluster.boundaries-rows")

    # the percentile fallback must NOT run
    def boom(*a, **kw):
        raise AssertionError("keys-only percentile pass ran despite recorded boundaries")

    monkeypatch.setattr(clustering, "curve_boundaries", boom)
    upd = images_df(spark, 200, seed=3).withColumn(
        "caption", F.concat(F.lit("v2 "), F.col("caption")))
    m = merge_into(t, upd, ["image_id"], spark)
    assert m["rekey_boundaries"] == "recorded", m
    entries = t.files()
    assert all(e.cluster for e in entries), "merge output lost the cluster tag"
    mx: dict = {}
    t.scan(spark, filters=[("phash", "between", (-(2**62), 0))],
           metrics_out=mx).count()
    assert mx["files_kept"] < mx["files_total"], "pruning decayed after merge"
    out = t.scan(spark)
    assert out.count() == 1000
    assert out.filter(F.col("caption").startswith("v2 ")).count() == 200


def test_merge_falls_back_when_source_exceeds_recorded_bounds(
        spark, tmp_path):
    """A source carrying cluster-column values outside the recorded
    normalization bounds would clamp at the curve edge — the merge must
    fall back to the fresh percentile pass instead."""
    from pyspark.sql import functions as F

    from medalforge_lakehouse_data_spark.testing.datagen import images_df

    t = _images_table(spark, tmp_path)
    upd = images_df(spark, 200, seed=3).withColumn(
        "w", F.lit(10_000_000))  # far beyond any recorded w bound
    m = merge_into(t, upd, ["image_id"], spark)
    assert m["rekey_boundaries"] == "computed", m
    assert t.scan(spark).filter(F.col("w") == 10_000_000).count() == 200


def test_merge_falls_back_when_recorded_layout_stale(spark, tmp_path):
    """Once the table grows past 2x the rows at record time, the
    equal-frequency split no longer describes it — fall back."""
    from pyspark.sql import functions as F

    from medalforge_lakehouse_data_spark.testing.datagen import images_df

    t = _images_table(spark, tmp_path)
    # triple the table without re-clustering
    t.append(spark, images_df(spark, 2000, seed=5, id_offset=100_000))
    upd = images_df(spark, 200, seed=3).withColumn(
        "caption", F.concat(F.lit("v2 "), F.col("caption")))
    m = merge_into(t, upd, ["image_id"], spark)
    assert m["rekey_boundaries"] == "computed", m
    assert t.scan(spark).count() == 3000


# --------------------------- 5. time-based partition transforms


def test_days_partition_transform_prunes(spark, tmp_path):
    """days(ts) partition: a ts range filter prunes whole day partitions
    at the PARTITION tier (ts excluded from stats so only partition
    values can prune), mirroring the reference's forced ingestion_date
    partition (data_contract_manager.py:165-174)."""
    import datetime

    from pyspark.sql.types import TimestampType

    schema = StructType([
        StructField("event_id", LongType()),
        StructField("ts", TimestampType()),
        StructField("v", StringType()),
    ])
    rows = [(d * 100 + i,
             datetime.datetime(2024, 1, 1 + d, 6 + (i % 12)),
             f"v{d}_{i}")
            for d in range(6) for i in range(20)]
    t = Table.create(str(tmp_path / "t"), schema,
                     partition_spec=["days(ts)"],
                     properties={"stats.columns": "event_id"})
    t.append(spark, spark.createDataFrame(rows, schema))
    entries = t.files(content="data")
    days = {e.partition.get("ts_day") for e in entries}
    assert len(days) == 6 and all(d is not None for d in days)

    m: dict = {}
    out = t.scan(spark, filters=[
        ("ts", ">=", datetime.datetime(2024, 1, 5, 0, 0))], metrics_out=m)
    assert out.count() == 40  # days 5 and 6
    # ±1 day slack keeps day 4 too; days 1-3 must be pruned
    assert m["files_kept"] < m["files_total"], m
    # point filter
    m2: dict = {}
    got = t.scan(spark, filters=[
        ("ts", "between", (datetime.datetime(2024, 1, 2, 0, 0),
                           datetime.datetime(2024, 1, 2, 23, 59)))],
        metrics_out=m2).count()
    assert got == 20 and m2["files_kept"] < m2["files_total"]


def test_truncate_partition_transform_prunes(spark, tmp_path):
    schema = StructType([
        StructField("k", LongType()),
        StructField("v", StringType()),
    ])
    t = Table.create(str(tmp_path / "t"), schema,
                     partition_spec=["truncate(k, 100)"],
                     properties={"stats.columns": "v"})
    t.append(spark, spark.createDataFrame(
        [(i, f"v{i}") for i in range(-150, 450)], schema))
    entries = t.files(content="data")
    tvals = {e.partition.get("k_trunc_100") for e in entries}
    assert tvals == {-200, -100, 0, 100, 200, 300, 400}
    m: dict = {}
    got = t.scan(spark, filters=[("k", "between", (120, 180))],
                 metrics_out=m).count()
    assert got == 61
    assert m["files_kept"] < m["files_total"], m
    m3: dict = {}
    assert t.scan(spark, filters=[("k", "=", -120)], metrics_out=m3).count() == 1
    assert m3["files_kept"] < m3["files_total"], "negative-key truncate mis-binned"


def test_truncate_string_partition(spark, tmp_path):
    schema = StructType([
        StructField("lang", StringType()),
        StructField("n", LongType()),
    ])
    t = Table.create(str(tmp_path / "t"), schema,
                     partition_spec=["truncate(lang, 2)"],
                     properties={"stats.columns": "n"})
    t.append(spark, spark.createDataFrame(
        [("en-US", 1), ("en-GB", 2), ("fr-FR", 3), ("de-DE", 4)], schema))
    m: dict = {}
    got = t.scan(spark, filters=[("lang", "=", "fr-FR")], metrics_out=m)
    assert got.count() == 1
    assert m["files_kept"] < m["files_total"], m


def test_days_spec_evolution_no_misprune(spark, tmp_path):
    """Evolve an unpartitioned table to days(ts): old files lack the
    field (kept conservatively), new files prune; rows never lost."""
    import datetime

    from pyspark.sql.types import TimestampType

    schema = StructType([
        StructField("event_id", LongType()),
        StructField("ts", TimestampType()),
    ])
    old = [(i, datetime.datetime(2024, 3, 1 + (i % 4))) for i in range(40)]
    new = [(100 + i, datetime.datetime(2024, 3, 10 + (i % 4))) for i in range(40)]
    t = Table.create(str(tmp_path / "t"), schema,
                     properties={"stats.columns": "event_id"})
    t.append(spark, spark.createDataFrame(old, schema))
    t.update_partition_spec(["days(ts)"])
    t.append(spark, spark.createDataFrame(new, schema))
    # full scan sees everything
    assert t.scan(spark).count() == 80
    m: dict = {}
    got = t.scan(spark, filters=[
        ("ts", ">=", datetime.datetime(2024, 3, 12))], metrics_out=m).count()
    assert got == 20
    # old files kept (no partition value), some NEW day files pruned
    assert m["files_kept"] < m["files_total"], m


def test_days_partition_rename_column(spark, tmp_path):
    import datetime

    from pyspark.sql.types import TimestampType

    schema = StructType([
        StructField("ts", TimestampType()),
        StructField("v", LongType()),
    ])
    t = Table.create(str(tmp_path / "t"), schema, partition_spec=["days(ts)"])
    t.append(spark, spark.createDataFrame(
        [(datetime.datetime(2024, 5, 1), 1)], schema))
    t.rename_column("ts", "event_ts")
    assert t.metadata().partition_spec == ["days(event_ts)"]
    assert t.scan(spark).count() == 1


def test_days_transform_rejects_non_temporal(spark, tmp_path):
    schema = StructType([StructField("k", LongType())])
    with pytest.raises(ValueError, match="days"):
        Table.create(str(tmp_path / "t"), schema, partition_spec=["days(k)"])


# ------------------------------ 6. codec zlib level (transcode speed)


def test_codec_zlevel_roundtrip_and_psnr():
    """Any zlib level decodes identically (level is not in the header);
    lossy at the fast default still clears the PSNR>=40 gate."""
    import numpy as np

    from medalforge_lakehouse_data_spark.functions import codec

    rng = np.random.default_rng(7)
    px = (rng.integers(0, 256, (48, 40, 3)).astype(np.float32) * 0.3
          + 100).astype(np.uint8)
    for z in (1, 6, 9):
        assert np.array_equal(codec.decode(codec.encode_raw(px, z)), px)
    d1 = codec.decode(codec.encode_lossy(px, 96, zlevel=1))
    d6 = codec.decode(codec.encode_lossy(px, 96, zlevel=6))
    assert np.array_equal(d1, d6), "zlib level changed decoded pixels"
    assert codec.psnr(px, d1) >= 40.0


def test_transcode_honors_zlib_level_property(spark, tmp_path):
    from medalforge_lakehouse_data_spark.maintenance.transcode import (
        transcode_rewrite,
    )
    from medalforge_lakehouse_data_spark.testing.datagen import (
        IMAGES_SCHEMA,
        images_df,
    )

    t9 = Table.create(str(tmp_path / "t9"), IMAGES_SCHEMA,
                      properties={"codec.zlib-level": "9"})
    t1 = Table.create(str(tmp_path / "t1"), IMAGES_SCHEMA,
                      properties={"codec.zlib-level": "1"})
    df = images_df(spark, 60, seed=21)
    t9.append(spark, df)
    t1.append(spark, df)
    m9 = transcode_rewrite(t9, spark, target_fmt="lossy", quality=96)
    m1 = transcode_rewrite(t1, spark, target_fmt="lossy", quality=96)
    assert m9["rows"] == m1["rows"] == 60
    # level 9 must compress at least as small as level 1
    assert m9["bytes_out"] <= m1["bytes_out"]
    # both decode to identical pixel content ⇒ identical phash sets
    p9 = {r.phash for r in t9.scan(spark).select("phash").collect()}
    p1 = {r.phash for r in t1.scan(spark).select("phash").collect()}
    assert p9 == p1


# ------------------- 7. incremental spec-migration clustering


def test_incremental_cluster_migrates_old_spec_files(spark, tmp_path):
    """After update_partition_spec, migrate_spec=True selects the
    old-spec files (already cluster-tagged or not) and rewrites them
    under the NEW spec incrementally; default leaves them alone."""
    from medalforge_lakehouse_data_spark.format.table import (
        parse_partition_field,
    )
    from medalforge_lakehouse_data_spark.testing.datagen import (
        IMAGES_SCHEMA,
        images_df,
    )

    t = Table.create(str(tmp_path / "t"), IMAGES_SCHEMA)
    t.append(spark, images_df(spark, 400, seed=9), target_file_count=4)
    clustering.cluster_rewrite(t, spark, columns=("phash", "w", "h"),
                               target_file_bytes=128 * 1024)
    t.update_partition_spec(["bucket(image_id, 4)"])
    cur_fields = {parse_partition_field(p)[0]
                  for p in t.metadata().partition_spec}
    old_spec = [e for e in t.files(content="data")
                if set(e.partition or {}) != cur_fields]
    assert old_spec, "setup: expected old-spec files"

    # default incremental: old-spec but cluster-tagged files are skipped
    m0 = clustering.cluster_rewrite(t, spark, columns=("phash", "w", "h"),
                                    mode="incremental", min_input_files=1)
    assert m0["files_in"] == 0

    m1 = clustering.cluster_rewrite(t, spark, columns=("phash", "w", "h"),
                                    mode="incremental", min_input_files=1,
                                    migrate_spec=True)
    assert m1["files_in"] == len(old_spec)
    entries = t.files(content="data")
    assert all(set(e.partition or {}) == cur_fields for e in entries), \
        "migration left old-spec files behind"
    assert all(e.cluster for e in entries)
    assert t.scan(spark).count() == 400
    # bucket-tier pruning now effective on the WHOLE table
    from medalforge_lakehouse_data_spark.operators.merge import merge_into
    from pyspark.sql import functions as F
    src = images_df(spark, 3, seed=9).withColumn(
        "caption", F.concat(F.lit("u "), F.col("caption")))
    mm = merge_into(t, src, ["image_id"], spark)
    assert mm["affected_files"] < mm["files_total"]


# --------------------- 8. streaming windowed agg with watermark


def test_stream_windowed_agg_watermark_upsert(spark, tmp_path):
    """Event-time tumbling windows with a watermark, drained via
    availableNow into a Table through the engine's MERGE: batch
    equivalence on the first drain; a second drain over a grown source
    UPDATES the affected window rows instead of duplicating them."""
    import datetime

    from pyspark.sql import functions as F
    from pyspark.sql.types import (
        DoubleType,
        StringType,
        StructField,
        StructType,
        TimestampType,
    )

    from medalforge_lakehouse_data_spark.sources.ingest import (
        stream_windowed_agg,
    )

    ev_schema = StructType([
        StructField("ts", TimestampType()),
        StructField("event_type", StringType()),
        StructField("value", DoubleType()),
    ])
    src = str(tmp_path / "events_src")
    base = datetime.datetime(2024, 7, 1, 10, 0)
    rows1 = [(base + datetime.timedelta(minutes=7 * i), t, float(i))
             for i in range(20) for t in ("click", "view")]
    spark.createDataFrame(rows1, ev_schema).coalesce(2) \
        .write.mode("append").parquet(src)

    out_schema = StructType([
        StructField("w_start", TimestampType()),
        StructField("event_type", StringType()),
        StructField("n", __import__("pyspark.sql.types", fromlist=["LongType"]).LongType()),
        StructField("sum_value", DoubleType()),
    ])
    t = Table.create(str(tmp_path / "agg"), out_schema)
    ck = str(tmp_path / "ck")
    r1 = stream_windowed_agg(spark, src, "parquet", ev_schema, t, ck,
                             ts_col="ts", window="1 hour",
                             watermark="2 hours")
    assert r1.files_processed >= 1  # micro-batches drained

    expect = (spark.read.parquet(src)
              .groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
              .agg(F.count("*").alias("n"),
                   F.sum(F.col("value").cast("double")).alias("sum_value"))
              .select(F.col("w.start").alias("w_start"), "event_type",
                      "n", "sum_value"))
    got = t.scan(spark)
    assert sorted(map(tuple, got.collect())) == sorted(map(tuple, expect.collect()))

    # grow the source INSIDE the last window (not late) and re-drain
    last = max(r[0] for r in rows1)
    rows2 = [(last + datetime.timedelta(minutes=1), "click", 100.0)]
    spark.createDataFrame(rows2, ev_schema).coalesce(1) \
        .write.mode("append").parquet(src)
    stream_windowed_agg(spark, src, "parquet", ev_schema, t, ck,
                        ts_col="ts", window="1 hour", watermark="2 hours")
    got2 = t.scan(spark)
    expect2 = (spark.read.parquet(src)
               .groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
               .agg(F.count("*").alias("n"),
                    F.sum(F.col("value").cast("double")).alias("sum_value"))
               .select(F.col("w.start").alias("w_start"), "event_type",
                       "n", "sum_value"))
    assert sorted(map(tuple, got2.collect())) == sorted(map(tuple, expect2.collect())), \
        "second drain duplicated or failed to update window rows"


def test_auto_maintenance_migrates_spec_when_policy_enabled(spark, tmp_path):
    from medalforge_lakehouse_data_spark.format.table import (
        parse_partition_field,
    )
    from medalforge_lakehouse_data_spark.testing.datagen import (
        IMAGES_SCHEMA,
        images_df,
    )

    t = Table.create(str(tmp_path / "t"), IMAGES_SCHEMA)
    t.append(spark, images_df(spark, 300, seed=13), target_file_count=3)
    clustering.cluster_rewrite(t, spark, columns=("phash", "w", "h"),
                               target_file_bytes=128 * 1024)
    t.update_partition_spec(["bucket(image_id, 4)"])
    # recluster runs after the compaction trigger fires; the migrate_spec
    # policy then sweeps the old-spec files along with the new one
    policy = MaintenancePolicy(compact_after_appends=1, min_small_files=1,
                               max_delete_files=0, ivf_retrain_factor=0,
                               migrate_spec=True)
    t.append(spark, images_df(spark, 30, seed=14, id_offset=10_000))
    out = maybe_maintain(t, spark, policy)
    assert out.get("clustered"), out
    cur_fields = {parse_partition_field(p)[0]
                  for p in t.metadata().partition_spec}
    assert all(set(e.partition or {}) == cur_fields
               for e in t.files(content="data"))
    assert t.scan(spark).count() == 330
