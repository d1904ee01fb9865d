"""Round-6 fixes: ADVICE r5 items + optimization-round invariants.

1. changes() reads CoW-removed files with the PARENT snapshot's deletes
   applied — a row masked by an earlier MoR delete must not surface as a
   spurious 'delete' event when its old file is rewritten (ADVICE #1).
2. _stamp_zranges clamps edge files to the curve-key domain (or the
   merge's proven key span), never ±2^63 sentinels (ADVICE #2).
3. The coupon-collector bucket-prune skip is sized on DISTINCT keys,
   not source rows (ADVICE #3).
4. Empty-target insert merges take the append fast path with identical
   results and idempotency.
"""

from __future__ import annotations

from pyspark.sql.types import IntegerType, LongType, StringType, StructField, StructType

from medalforge_lakehouse_data_spark.format.table import Table
from medalforge_lakehouse_data_spark.maintenance import clustering
from medalforge_lakehouse_data_spark.operators.merge import merge_into

SIMPLE = StructType([
    StructField("k", LongType()),
    StructField("val", StringType()),
])


def test_changes_cow_rewrite_applies_parent_deletes(spark, tmp_path):
    """MoR-delete K, append a new K elsewhere, then CoW-merge a sibling
    key living in K's old file: changes() must NOT emit a delete event
    for K at the rewrite commit (the old file's K row was already masked
    before the rewrite). Pre-fix, the raw read of the removed file
    surfaced K in old_rows and an incremental consumer would net-delete
    a key that is still live."""
    t = Table.create(str(tmp_path / "t"), SIMPLE)
    t.append(spark, spark.createDataFrame(
        [(i, f"v{i}") for i in range(10)], SIMPLE),
        target_file_count=1)                                    # sid 1
    merge_into(t, spark.createDataFrame([(5, "x")], SIMPLE), ["k"], spark,
               when_matched="delete", when_not_matched=None,
               strategy="merge-on-read")                        # sid 2
    t.append(spark, spark.createDataFrame([(5, "new5")], SIMPLE),
             target_file_count=1)                               # sid 3
    merge_into(t, spark.createDataFrame([(3, "u3")], SIMPLE),
               ["k"], spark)                                    # sid 4 (CoW)

    ch = t.changes(spark, from_snapshot_id=3).collect()
    dels = {(r.k, r.val) for r in ch if r["_change_type"] == "delete"}
    ins = {(r.k, r.val) for r in ch if r["_change_type"] == "insert"}
    assert dels == {(3, "v3")}, f"spurious deletes: {dels}"
    assert ins == {(3, "u3")}
    # key 5's live row (the sid-3 append) is untouched by the window
    live = {(r.k, r.val) for r in t.scan(spark).collect()}
    assert (5, "new5") in live


def test_zrange_edge_stamps_clamped_to_domain(spark, tmp_path):
    schema = StructType([
        StructField("a", LongType()),
        StructField("b", LongType()),
        StructField("val", StringType()),
    ])
    t = Table.create(str(tmp_path / "t"), schema)
    rows = [(i * 37 % 1000, i * 91 % 1000, f"v{i}") for i in range(2000)]
    t.append(spark, spark.createDataFrame(rows, schema), target_file_count=4)
    m = clustering.cluster_rewrite(
        t, spark, columns=("a", "b"), curve="zorder",
        target_file_bytes=4 * 1024, mode="full")
    assert m["files_out"] > 1
    lo_d, hi_d = clustering.curve_key_domain(2)
    assert (lo_d, hi_d) == (0, (1 << 62) - 1)
    stamped = [e for e in t.files(content="data") if e.zrange is not None]
    assert stamped, "full cluster rewrite must stamp zranges"
    for e in stamped:
        assert lo_d <= e.zrange[0] <= e.zrange[1] <= hi_d, e.zrange


def test_bucket_prune_uses_distinct_keys(spark, tmp_path):
    schema = StructType([
        StructField("k", IntegerType()),
        StructField("val", StringType()),
    ])
    t = Table.create(str(tmp_path / "t"), schema,
                     partition_spec=["bucket(k, 8)"])
    t.append(spark, spark.createDataFrame(
        [(i, f"v{i}") for i in range(400)], schema), target_file_count=4)
    # duplicate-heavy source: 500 rows over 30 distinct keys. Row count
    # (500) exceeds the 4·N·lnN skip threshold for N=8 buckets, but the
    # DISTINCT key count (30) does not — pruning must still collect.
    dup_rows = [(k, f"d{k}-{j}") for k in range(30) for j in range(17)]
    src = spark.createDataFrame(dup_rows[:500], schema)
    out = merge_into(t, src, ["k"], spark, check_unique_keys=False,
                     when_matched=None, when_not_matched="insert")
    assert out["bucket_prune"] == "collected"


def test_empty_target_insert_merge_fast_path(spark, tmp_path):
    t = Table.create(str(tmp_path / "t"), SIMPLE)
    src = spark.createDataFrame([(i, f"v{i}") for i in range(50)], SIMPLE)
    out = merge_into(t, src, ["k"], spark, commit_key="first-merge")
    assert out["affected_files"] == 0 and out["files_total"] == 0
    assert {(r.k, r.val) for r in t.scan(spark).collect()} == {
        (i, f"v{i}") for i in range(50)}
    # idempotent resume on the same commit key
    again = merge_into(t, src, ["k"], spark, commit_key="first-merge")
    assert again.get("resumed") is True
    assert t.scan(spark).count() == 50


def test_jvm_zorder_key_bit_identical_to_numpy(spark):
    """curve_key_col (whole-stage-codegen Morton path) must produce the
    EXACT key the numpy pandas-UDF kernel produces — layouts, recorded
    boundaries and the driver-side span replicas all assume one keying."""
    import math
    import random

    from pyspark.sql import functions as F
    from pyspark.sql.types import DoubleType, LongType, StructField, StructType

    from medalforge_lakehouse_data_spark.maintenance.clustering import (
        curve_key_udf,
        with_curve_key,
    )

    rng = random.Random(7)
    rows = []
    for _ in range(400):
        def v():
            r = rng.random()
            if r < 0.05:
                return None
            if r < 0.08:
                return float("nan")
            if r < 0.10:
                return float("inf") if r < 0.09 else float("-inf")
            return rng.uniform(-1e9, 1e9)
        rows.append((rng.randrange(-(2**62), 2**62), v(), float(rng.uniform(0, 255))))
    schema = StructType([
        StructField("a", LongType()),
        StructField("b", DoubleType()),
        StructField("c", DoubleType()),
    ])
    df = spark.createDataFrame(rows, schema)
    for cols, bounds in [
        (("a", "b", "c"), {"a": (-(2**62), 2**62), "b": (-1e9, 1e9), "c": (0.0, 255.0)}),
        (("a", "b"), {"a": (-(2**62), 2**62), "b": (-1e9, 1e9)}),
        (("c",), {"c": (0.0, 255.0)}),
        (("a", "b"), {"a": (5, 5), "b": (-1e9, 1e9)}),  # degenerate bound
    ]:
        got = with_curve_key(df, cols, bounds, "zorder").select("_zkey")
        udf = curve_key_udf(cols, bounds, "zorder")
        want = df.withColumn("_zkey", udf(*[F.col(c) for c in cols])).select("_zkey")
        g = [r[0] for r in got.collect()]
        w = [r[0] for r in want.collect()]
        assert g == w, f"key mismatch for {cols}"
        assert all(x is not None and x >= 0 for x in g)


def test_delete_split_read_matches_per_row_rule(spark, tmp_path):
    """The driver-side delete-application split (segment files by
    applicable-delete subset, key-only anti-joins) must produce exactly
    the rows the per-row seq-rule join produces, across interleaved
    appends and MoR deletes — including re-inserted keys that a
    seq-blind anti-join would wrongly remove."""
    t = Table.create(str(tmp_path / "t"), SIMPLE)
    t.append(spark, spark.createDataFrame(
        [(i, f"v{i}") for i in range(20)], SIMPLE), target_file_count=2)  # seq 1
    merge_into(t, spark.createDataFrame([(3, "x"), (7, "x")], SIMPLE),
               ["k"], spark, when_matched="delete", when_not_matched=None,
               strategy="merge-on-read")                                  # seq 2
    t.append(spark, spark.createDataFrame([(3, "re3")], SIMPLE),
             target_file_count=1)                                         # seq 3
    merge_into(t, spark.createDataFrame([(10, "x")], SIMPLE),
               ["k"], spark, when_matched="delete", when_not_matched=None,
               strategy="merge-on-read")                                  # seq 4
    t.append(spark, spark.createDataFrame([(10, "re10")], SIMPLE),
             target_file_count=1)                                         # seq 5

    want = {(i, f"v{i}") for i in range(20) if i not in (3, 7, 10)}
    want |= {(3, "re3"), (10, "re10")}

    got_split = {(r.k, r.val) for r in t.scan(spark).collect()}
    assert got_split == want
    # force the per-row fallback and compare
    old = Table.DELETE_SPLIT_MAX_SEQS
    try:
        Table.DELETE_SPLIT_MAX_SEQS = 0
        got_row = {(r.k, r.val) for r in t.scan(spark).collect()}
    finally:
        Table.DELETE_SPLIT_MAX_SEQS = old
    assert got_row == want
