"""Round-5 regression tests (round-4 VERDICT items + ADVICE fixes):

1. commit_new_entries validates against concurrently-landed delete
   files (ADVICE #1 — conditional merge-on-read could resurrect
   deleted rows); the conditional-MoR unit retries and converges.
2. Manifest-derived merge re-key boundaries (VERDICT #1): full
   cluster jobs stamp per-file zkey ranges; merges serve boundaries
   from them when the property list is absent/capped and report
   rekey_boundaries="manifest".
3. Stale cluster.boundaries* records are cleared when a full rewrite
   completes without recording fresh ones (ADVICE #4).
4. Recorded-layout staleness auto-repair (VERDICT #2): growth past
   the factor → maybe_maintain re-records from manifest stats →
   next merge is "recorded" again.
5. Rate-limited spec migration (VERDICT #3): migrate_max_bytes caps
   each incremental run, oldest first; scans stay correct mid-way.
6. Coupon-collector bucket-prune skip (VERDICT #6): dense sources
   skip the distinct-bucket agg, trickle sources still collect.
7. Table.changes() CDC-lite across append / CoW-merge / MoR-delete /
   layout commits (VERDICT #4).
8. stream_windowed_agg survives a checkpoint reset (ADVICE #3): new
   run tokens keep restarted batch ids from aliasing committed ones.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F
from pyspark.sql.types import LongType, StringType, StructField, StructType

from medalforge_lakehouse_data_spark.format.table import (
    CommitConflictError,
    Table,
)
from medalforge_lakehouse_data_spark.maintenance import clustering
from medalforge_lakehouse_data_spark.maintenance.auto import (
    MaintenancePolicy,
    maybe_maintain,
)
from medalforge_lakehouse_data_spark.operators.merge import merge_into

SIMPLE = StructType([
    StructField("k", LongType()),
    StructField("val", StringType()),
])


def _clustered_table(spark, path, n=40_000, files=8, target=64 * 1024):
    df = spark.range(n).select(
        F.col("id").alias("k"),
        (F.col("id") * 37 % 1000).cast("long").alias("a"),
        (F.col("id") * 13 % 500).cast("long").alias("b"),
        F.concat(F.lit("v"), F.col("id")).alias("s"))
    t = Table.create(path, df.schema,
                     properties={"merge.cluster-rekey-min-bytes": "1"})
    t.append(spark, df, target_file_count=files)
    clustering.cluster_rewrite(t, spark, columns=("a", "b"), curve="zorder",
                               target_file_bytes=target, mode="full")
    return t


def _upd(spark, start, stop, step, tag):
    return spark.range(start, stop, step).select(
        F.col("id").alias("k"),
        (F.col("id") * 37 % 1000).cast("long").alias("a"),
        (F.col("id") * 13 % 500).cast("long").alias("b"),
        F.lit(tag).alias("s"))


# ------------------------------------------ 1. MoR commit delete validation


def test_commit_new_entries_rejects_concurrent_delete(spark, tmp_path):
    t = Table.create(str(tmp_path / "t"), SIMPLE)
    t.append(spark, spark.createDataFrame(
        [(i, f"v{i}") for i in range(20)], SIMPLE))
    plan_seq = t.metadata().last_sequence
    df = t.read_entries(spark, t.files(content="data"))
    added = t._write_data_files(spark, df, target_file_count=1)
    merge_into(t, spark.createDataFrame([(3, "x")], SIMPLE), ["k"], spark,
               when_matched="delete", when_not_matched=None,
               strategy="merge-on-read")
    with pytest.raises(CommitConflictError):
        t.commit_new_entries(added, operation="merge",
                             validate_from_sequence=plan_seq)
    # without the guard the same commit goes through (append semantics)
    t.commit_new_entries(added, operation="merge")


def test_conditional_mor_merge_does_not_resurrect_deleted_rows(
        spark, tmp_path, monkeypatch):
    """The ADVICE #1 race end-to-end: a MoR delete lands between the
    conditional-MoR merge's read and its commit. The merge must detect
    the conflict, re-plan, and leave the deleted key deleted."""
    t = Table.create(str(tmp_path / "t"), SIMPLE)
    t.append(spark, spark.createDataFrame(
        [(i, f"old_{i}") for i in range(30)], SIMPLE))

    real_read = Table.read_entries
    fired = {"done": False}

    def racing_read(self, spark_, entries, apply_deletes=True):
        df = real_read(self, spark_, entries, apply_deletes)
        if not fired["done"]:
            fired["done"] = True
            merge_into(Table(self.root),
                       spark.createDataFrame([(7, "x")], SIMPLE),
                       ["k"], spark, when_matched="delete",
                       when_not_matched=None, strategy="merge-on-read")
            df = df.cache()
            df.count()  # materialize the STALE read (pre-delete row set)
        return df

    monkeypatch.setattr(Table, "read_entries", racing_read)
    src = spark.createDataFrame([(k, f"new_{k}") for k in (5, 6, 7, 8)],
                                SIMPLE)
    # update-only (no INSERT clause): after the serialized-first delete,
    # key 7 is unmatched and must STAY deleted — the stale first-attempt
    # patch would have re-appended it with a fresh seq
    m = merge_into(t, src, ["k"], spark, matched_condition="s.k % 1 = 0",
                   when_not_matched=None, strategy="merge-on-read")
    assert m["affected_files"] == 0
    assert m["delete_rows"] == 3  # retried plan fired only {5, 6, 8}
    rows = {r.k: r.val for r in t.scan(spark).collect()}
    assert 7 not in rows, "conditional MoR merge resurrected a deleted row"
    assert rows[5] == "new_5" and rows[6] == "new_6" and rows[8] == "new_8"
    assert len(rows) == 29


# ------------------------------------------ 2. manifest-derived boundaries


def test_full_cluster_stamps_zranges(spark, tmp_path):
    t = _clustered_table(spark, str(tmp_path / "t"))
    ents = t.files(content="data")
    assert ents and all(e.zrange is not None for e in ents)
    assert all(e.zrange[0] <= e.zrange[1] for e in ents)
    # ranges must be (near-)disjoint: sorted by lo, each file's lo is at
    # least the previous file's hi boundary (shared edges allowed — the
    # tie-spread can land boundary-valued rows in either neighbor)
    rs = sorted(e.zrange for e in ents)
    for (_lo1, hi1), (lo2, _hi2) in zip(rs, rs[1:]):
        assert lo2 >= hi1  # consecutive ranges share at most the edge


def test_merge_serves_manifest_boundaries_when_property_absent(spark, tmp_path):
    t = _clustered_table(spark, str(tmp_path / "t"))
    m1 = merge_into(t, _upd(spark, 0, 40_000, 40, "u1"), ["k"], spark)
    assert m1["rekey_boundaries"] == "recorded"
    # simulate the >MAX_RECORDED_BOUNDARIES regime: list absent, bounds kept
    t.set_properties({"cluster.boundaries": None})
    m2 = merge_into(t, _upd(spark, 0, 40_000, 40, "u2"), ["k"], spark)
    assert m2["rekey_boundaries"] == "manifest"
    assert t.scan(spark).count() == 40_000
    assert t.scan(spark, filters=[("s", "=", "u2")]).count() == 1000
    # merge output re-stamped zranges → a third merge still serves manifest
    m3 = merge_into(t, _upd(spark, 0, 40_000, 40, "u3"), ["k"], spark)
    assert m3["rekey_boundaries"] == "manifest"
    assert t.scan(spark, filters=[("s", "=", "u3")]).count() == 1000


def test_full_rewrite_past_cap_records_bounds_and_clears_list(
        spark, tmp_path, monkeypatch):
    monkeypatch.setattr(clustering, "MAX_RECORDED_BOUNDARIES", 2)
    t = _clustered_table(spark, str(tmp_path / "t"))
    props = t.metadata().properties
    assert "cluster.boundaries" not in props  # capped → list not recorded
    assert "cluster.bounds" in props          # normalization still recorded
    assert int(props["cluster.boundaries-rows"]) == 40_000
    m = merge_into(t, _upd(spark, 0, 40_000, 40, "u1"), ["k"], spark)
    assert m["rekey_boundaries"] == "manifest"


def test_stale_boundaries_cleared_when_full_rewrite_skips_recording(
        spark, tmp_path, monkeypatch):
    """ADVICE #4: a later full rewrite that cannot record fresh
    boundaries must delete the previous cluster.boundaries* records in
    the same flow — merges must not re-key to the replaced layout."""
    t = _clustered_table(spark, str(tmp_path / "t"))
    assert "cluster.boundaries" in t.metadata().properties
    monkeypatch.setattr(clustering, "MAX_RECORDED_BOUNDARIES", 2)
    clustering.cluster_rewrite(t, spark, columns=("a", "b"), curve="zorder",
                               target_file_bytes=64 * 1024, mode="full")
    props = t.metadata().properties
    assert "cluster.boundaries" not in props
    assert "cluster.bounds" in props


def test_cluster_config_change_clears_old_records(spark, tmp_path):
    t = _clustered_table(spark, str(tmp_path / "t"))
    assert "cluster.boundaries" in t.metadata().properties
    # re-cluster on different columns: the old records must not survive
    # into the new config's label even before the new record lands
    clustering.cluster_rewrite(t, spark, columns=("b", "a"), curve="zorder",
                               target_file_bytes=64 * 1024, mode="full")
    props = t.metadata().properties
    assert props["cluster.columns"] == "b,a"
    rec = clustering.recorded_layout(props, ("b", "a"), "zorder")
    assert rec is not None  # fresh record for the NEW config


# ------------------------------------------ 4. staleness auto-repair


def test_maybe_maintain_rerecords_stale_boundaries(spark, tmp_path):
    t = _clustered_table(spark, str(tmp_path / "t"))
    t.set_properties({"cluster.boundaries": None})  # simulate capped record
    t.append(spark, spark.range(40_000, 90_000).select(
        F.col("id").alias("k"), (F.col("id") * 37 % 1000).cast("long").alias("a"),
        (F.col("id") * 13 % 500).cast("long").alias("b"),
        F.lit("g").alias("s")), target_file_count=4)
    out = maybe_maintain(t, spark, MaintenancePolicy(
        compact_after_appends=1, min_small_files=1,
        small_file_bytes=64 * 1024 * 1024, target_file_bytes=64 * 1024))
    assert out.get("boundaries_rerecorded"), out
    assert int(t.metadata().properties["cluster.boundaries-rows"]) == 90_000
    m = merge_into(t, _upd(spark, 0, 90_000, 90, "u1"), ["k"], spark)
    assert m["rekey_boundaries"] == "recorded"
    assert t.scan(spark).count() == 90_000


def test_maybe_maintain_no_rerecord_below_factor(spark, tmp_path):
    t = _clustered_table(spark, str(tmp_path / "t"))
    out = maybe_maintain(t, spark, MaintenancePolicy(compact_after_appends=99))
    assert "boundaries_rerecorded" not in out


# ------------------------------------------ 5. rate-limited spec migration


def test_migration_cap_spreads_over_runs(spark, tmp_path):
    t = _clustered_table(spark, str(tmp_path / "t"), files=6)
    n_before = t.scan(spark).count()
    t.update_partition_spec(["bucket(k, 4)"])
    cur_fields = {"k_bucket_4"}
    stale0 = [e for e in t.files(content="data")
              if set(e.partition or {}) != cur_fields]
    assert stale0, "setup: expected old-spec files"
    cap = max(e.bytes for e in stale0) + 1  # ≈ one file per run
    runs = 0
    while True:
        km = clustering.cluster_rewrite(
            t, spark, columns=("a", "b"), curve="zorder",
            target_file_bytes=64 * 1024, mode="incremental",
            migrate_spec=True, migrate_max_bytes=cap, min_input_files=1)
        runs += 1
        assert t.scan(spark).count() == n_before  # correct mid-migration
        if km.get("migrate_remaining_files", 0) == 0 and km["files_in"] == 0:
            break
        assert runs < 20
    assert runs > 2, "cap did not spread migration across runs"
    stale_after = [e for e in t.files(content="data")
                   if set(e.partition or {}) != cur_fields]
    assert not stale_after


# ------------------------------------------ 6. bucket-prune agg bound


def test_bucket_prune_skipped_for_dense_source(spark, tmp_path):
    df = spark.range(4000).select(F.col("id").alias("k"),
                                  F.concat(F.lit("v"), F.col("id")).alias("val"))
    t = Table.create(str(tmp_path / "t"), df.schema,
                     partition_spec=["bucket(k, 8)"])
    t.append(spark, df, target_file_count=4)
    dense = spark.range(0, 4000, 10).select(
        F.col("id").alias("k"), F.lit("d").alias("val"))  # 400 > 4·8·ln9
    m = merge_into(t, dense, ["k"], spark)
    assert m["bucket_prune"] == "skipped-dense"
    trickle = spark.createDataFrame([(5, "x"), (6, "y")], df.schema)
    m2 = merge_into(t, trickle, ["k"], spark)
    assert m2["bucket_prune"] == "collected"
    assert m2["affected_files"] <= m2["files_total"]
    rows = {r.k: r.val for r in t.scan(spark).collect()}
    assert rows[5] == "x" and rows[10] == "d" and rows[11] == "v11"


# ------------------------------------------ 7. Table.changes (CDC-lite)


def test_changes_across_commit_types(spark, tmp_path):
    t = Table.create(str(tmp_path / "t"), SIMPLE)
    t.append(spark, spark.createDataFrame(
        [(i, f"v{i}") for i in range(20)], SIMPLE))            # sid 1
    t.append(spark, spark.createDataFrame(
        [(i, f"v{i}") for i in range(20, 25)], SIMPLE))        # sid 2
    merge_into(t, spark.createDataFrame(                        # sid 3 (CoW)
        [(1, "u1"), (2, "u2"), (3, "u3"), (30, "i30"), (31, "i31")],
        SIMPLE), ["k"], spark)
    merge_into(t, spark.createDataFrame([(4, "x"), (22, "x")], SIMPLE),
               ["k"], spark, when_matched="delete",
               when_not_matched=None, strategy="merge-on-read")  # sid 4
    clustering.cluster_rewrite(t, spark, columns=("k",), curve="zorder",
                               target_file_bytes=1 << 20, mode="full")  # sid 5

    ch = t.changes(spark, from_snapshot_id=1).collect()
    by = {}
    for r in ch:
        by.setdefault((r["_commit_snapshot_id"], r["_change_type"]),
                      set()).add((r.k, r.val))
    assert by[(2, "insert")] == {(i, f"v{i}") for i in range(20, 25)}
    assert by[(3, "insert")] == {(1, "u1"), (2, "u2"), (3, "u3"),
                                 (30, "i30"), (31, "i31")}
    assert by[(3, "delete")] == {(1, "v1"), (2, "v2"), (3, "v3")}
    assert by[(4, "delete")] == {(4, None), (22, None)}
    assert not any(sid == 5 for sid, _ in by), "layout commit leaked changes"
    # replaying the change stream over snapshot 1 reproduces the table
    assert len(by[(2, "insert")]) + len(by[(3, "insert")]) == 10


def test_changes_empty_range_and_validation(spark, tmp_path):
    t = Table.create(str(tmp_path / "t"), SIMPLE)
    t.append(spark, spark.createDataFrame([(1, "a")], SIMPLE))
    assert t.changes(spark, from_snapshot_id=1).count() == 0
    with pytest.raises(KeyError):
        t.changes(spark, from_snapshot_id=99)
    full = t.changes(spark, from_snapshot_id=0).collect()
    assert {(r.k, r.val, r["_change_type"]) for r in full} == {(1, "a", "insert")}


# ------------------------------------------ 8. stream checkpoint reset


def test_stream_agg_survives_checkpoint_reset(spark, tmp_path):
    import datetime
    import shutil

    from pyspark.sql.types import DoubleType, TimestampType

    from medalforge_lakehouse_data_spark.sources.ingest import (
        stream_windowed_agg,
    )

    ev_schema = StructType([
        StructField("ts", TimestampType()),
        StructField("event_type", StringType()),
        StructField("value", DoubleType()),
    ])
    src = str(tmp_path / "src")
    base = datetime.datetime(2024, 7, 1, 10, 0)
    rows = [(base + datetime.timedelta(minutes=9 * i), "click", float(i))
            for i in range(10)]
    spark.createDataFrame(rows, ev_schema).coalesce(1) \
        .write.mode("append").parquet(src)
    out_schema = StructType([
        StructField("w_start", TimestampType()),
        StructField("event_type", StringType()),
        StructField("n", LongType()),
        StructField("sum_value", DoubleType()),
    ])
    t = Table.create(str(tmp_path / "agg"), out_schema)
    ck = str(tmp_path / "ck")
    stream_windowed_agg(spark, src, "parquet", ev_schema, t, ck,
                        ts_col="ts", window="1 hour", watermark="2 hours")
    first = {(r.w_start, r.event_type): (r.n, r.sum_value)
             for r in t.scan(spark).collect()}
    assert first
    # RESET the checkpoint (batch ids restart at 0) and grow the source:
    # without per-run commit tokens the restarted batch 0 merge would be
    # deduped as "resumed" and the window rows would go stale
    shutil.rmtree(ck)
    more = [(base + datetime.timedelta(minutes=9 * i), "click", float(i))
            for i in range(10, 20)]
    spark.createDataFrame(more, ev_schema).coalesce(1) \
        .write.mode("append").parquet(src)
    stream_windowed_agg(spark, src, "parquet", ev_schema, t, ck,
                        ts_col="ts", window="1 hour", watermark="2 hours")
    after = {(r.w_start, r.event_type): (r.n, r.sum_value)
             for r in t.scan(spark).collect()}
    expect = {
        ((base + datetime.timedelta(minutes=9 * i)).replace(minute=0), "click")
        for i in range(20)}
    assert set(after) == expect
    total_n = sum(v[0] for v in after.values())
    assert total_n == 20, f"stale window rows after checkpoint reset: {after}"


# ------------------------------------------ misc: property unset


def test_set_properties_none_unsets(tmp_path):
    t = Table.create(str(tmp_path / "t"), SIMPLE, properties={"x": "1"})
    t.set_properties({"x": None, "y": "2"})
    props = t.metadata().properties
    assert "x" not in props and props["y"] == "2"


# ------------------------------------------ 9. changes() before-images


def test_changes_delete_before_images(spark, tmp_path):
    t = Table.create(str(tmp_path / "t"), SIMPLE)
    # separate appends -> separate files with tight disjoint k ranges,
    # so the delete file's k min/max stats can prune at the manifest tier
    for lo in range(0, 50, 10):
        t.append(spark, spark.createDataFrame(
            [(i, f"v{i}") for i in range(lo, lo + 10)], SIMPLE))
    t.append(spark, spark.createDataFrame([(7, "v7b")], SIMPLE))  # 2nd version
    pre = t.metadata().current_snapshot_id
    merge_into(t, spark.createDataFrame([(7, "x"), (12, "x")], SIMPLE),
               ["k"], spark, when_matched="delete", when_not_matched=None,
               strategy="merge-on-read")
    ch = t.changes(spark, from_snapshot_id=pre,
                   delete_before_images=True).collect()
    got = {(r.k, r.val, r["_change_type"]) for r in ch}
    # one delete per LIVE parent row version, full columns populated
    assert got == {(7, "v7", "delete"), (7, "v7b", "delete"),
                   (12, "v12", "delete")}
    # default path still emits key-only rows
    base = {(r.k, r.val) for r in t.changes(spark, from_snapshot_id=pre)
            .filter(F.col("_change_type") == "delete").collect()}
    assert base == {(7, None), (12, None)}
    # the stats-derived between-filter prunes the parent scan to the
    # files whose k range overlaps [7, 12]
    kept, _ = t.plan_files(pre, [("k", "between", (7, 12))])
    assert 0 < len(kept) < len(t.files(pre))
    assert all(e.stats["k"].min <= 12 and e.stats["k"].max >= 7
               for e in kept if "k" in e.stats)


# ------------------------------------------ 10. hilbert merge key span


def test_merge_key_span_bounds_hilbert():
    """Hilbert layouts now get the span restriction too (round-4 TODO):
    the source value box is covered exactly by hilbert_box_range, and
    every in-box point key falls inside the returned span."""
    from types import SimpleNamespace

    from medalforge_lakehouse_data_spark.maintenance.clustering import (
        box_curve_key_range,
        point_curve_key,
    )
    from medalforge_lakehouse_data_spark.operators.merge import _merge_key_span

    cl_cols = ["a", "b"]
    rec_bounds = {"a": (0, 1000), "b": (0, 500)}
    affected = [SimpleNamespace(zrange=[100, 200])]
    sb = {"mn_a": 10, "mx_a": 60, "mn_b": 5, "mx_b": 40,
          "nn_a": 0, "nn_b": 0}
    span = _merge_key_span(affected, sb, cl_cols, rec_bounds, "hilbert",
                           box_curve_key_range)
    assert span is not None
    lo, hi = span
    assert lo <= 100 and hi >= 200  # affected zrange folded in
    for a in range(10, 61, 10):
        for b in range(5, 41, 7):
            k = point_curve_key([a, b], cl_cols, rec_bounds, "hilbert")
            assert lo <= k <= hi, (a, b, k, span)
    # untagged affected file still disables the span
    assert _merge_key_span([SimpleNamespace(zrange=None)], sb, cl_cols,
                           rec_bounds, "hilbert", box_curve_key_range) is None


def test_hilbert_manifest_merge_correct(spark, tmp_path):
    df = spark.range(10_000).select(
        F.col("id").alias("k"),
        (F.col("id") * 37 % 1000).cast("long").alias("a"),
        (F.col("id") * 13 % 500).cast("long").alias("b"),
        F.concat(F.lit("v"), F.col("id")).alias("s"))
    t = Table.create(str(tmp_path / "t"),
                     df.schema,
                     properties={"merge.cluster-rekey-min-bytes": "1"})
    t.append(spark, df, target_file_count=8)
    clustering.cluster_rewrite(t, spark, columns=("a", "b"),
                               curve="hilbert", target_file_bytes=64 * 1024,
                               mode="full")
    t.set_properties({"cluster.boundaries": None})  # force manifest path
    m = merge_into(t, _upd(spark, 0, 10_000, 25, "u1"), ["k"], spark)
    assert m["rekey_boundaries"] == "manifest"
    assert t.scan(spark).count() == 10_000
    assert t.scan(spark, filters=[("s", "=", "u1")]).count() == 400
    rows = {r.k: r.s for r in t.scan(
        spark, filters=[("k", "between", (0, 100))]).collect()}
    assert rows[25] == "u1" and rows[26] == "v26"


# ------------------------------------------ 11. layout-boundary cache


def test_manifest_boundaries_cached_per_snapshot(spark, tmp_path,
                                                 monkeypatch):
    t = _clustered_table(spark, str(tmp_path / "t"), n=10_000)
    calls = {"n": 0}
    real_files = Table.files

    def counting_files(self, *a, **kw):
        calls["n"] += 1
        return real_files(self, *a, **kw)

    monkeypatch.setattr(Table, "files", counting_files)
    b1 = clustering.manifest_layout_boundaries(t, ("a", "b"), "zorder",
                                               64 * 1024)
    walked = calls["n"]
    assert b1 is not None and walked > 0
    # same snapshot, any span → served from cache, no manifest walk
    b2 = clustering.manifest_layout_boundaries(t, ("a", "b"), "zorder",
                                               64 * 1024,
                                               span=(b1[0], b1[-1]))
    assert calls["n"] == walked
    assert b2 == [b for b in b1 if b1[0] <= b <= b1[-1]]
    # cached copy is isolated from caller mutation
    b1.append(-1)
    assert clustering.manifest_layout_boundaries(
        t, ("a", "b"), "zorder", 64 * 1024)[-1] != -1
    # a commit (new snapshot) invalidates the key → fresh walk
    t.append(spark, _upd(spark, 100_000, 100_010, 1, "x"))
    clustering.manifest_layout_boundaries(t, ("a", "b"), "zorder", 64 * 1024)
    assert calls["n"] > walked
