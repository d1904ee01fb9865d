"""Transcode rewrite: format migration preserves row identity, captions,
PSNR gate; phash recomputed consistently."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from medalforge_lakehouse_data_spark.format import Table
from medalforge_lakehouse_data_spark.maintenance.transcode import transcode_rewrite
from medalforge_lakehouse_data_spark.operators.multimodal import psnr_between, with_verification
from medalforge_lakehouse_data_spark.testing.datagen import IMAGES_SCHEMA, images_df


def test_transcode_to_lossy(spark, tmp_path):
    t = Table.create(str(tmp_path / "t"), IMAGES_SCHEMA, partition_spec=["fmt"])
    t.append(spark, images_df(spark, 600, seed=21), target_file_count=6)
    pre = t.current_snapshot_id()
    before = {r.image_id: r.caption for r in t.scan(spark).select("image_id", "caption").collect()}
    orig_bytes = t.scan(spark).select("image_id", F.col("bytes").alias("orig"))

    m = transcode_rewrite(t, spark, target_fmt="lossy", quality=96)
    assert m["rows"] == 600 and m["kept_original"] == 0

    out = t.scan(spark)
    # row identity + caption equality
    after = {r.image_id: r.caption for r in out.select("image_id", "caption").collect()}
    assert after == before
    # all lossy now, phash self-consistent, decodable
    assert out.filter(F.col("fmt") != "lossy").count() == 0
    v = with_verification(out).select(
        F.min(F.col("_phash_check") == F.col("phash")).alias("ok"),
        F.min("_decodable").alias("dec")).collect()[0]
    assert v.ok and v.dec
    # PSNR vs original decoded pixels >= 40 dB (north_star gate)
    j = out.join(orig_bytes, "image_id")
    minp = j.select(F.min(psnr_between(F.col("orig"), F.col("bytes")))).collect()[0][0]
    assert minp >= 40.0
    # old snapshot still reads the original bytes (isolation)
    assert t.scan(spark, snapshot_id=pre).filter(F.col("fmt") == "raw").count() > 0


def test_transcode_to_raw_roundtrip(spark, tmp_path):
    t = Table.create(str(tmp_path / "t"), IMAGES_SCHEMA)
    t.append(spark, images_df(spark, 200, seed=22))
    m = transcode_rewrite(t, spark, target_fmt="raw")
    assert m["rows"] == 200
    out = t.scan(spark)
    assert out.filter(F.col("fmt") != "raw").count() == 0
    v = with_verification(out).select(F.min(F.col("_phash_check") == F.col("phash"))).collect()[0][0]
    assert v


def test_transcode_idempotent_commit(spark, tmp_path):
    t = Table.create(str(tmp_path / "t"), IMAGES_SCHEMA)
    t.append(spark, images_df(spark, 100, seed=23))
    m1 = transcode_rewrite(t, spark, target_fmt="lossy", job_id="tj")
    n_snaps = len(t.snapshots())
    m2 = transcode_rewrite(t, spark, target_fmt="lossy", job_id="tj")
    # same job_id → same commit_key → second run may rewrite files but the
    # commit is a no-op (no new snapshot)
    assert len(t.snapshots()) == n_snaps
    assert t.scan(spark).count() == 100
