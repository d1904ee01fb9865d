"""Schema evolution over the table format (round-2 VERDICT #8):
add / rename / widen with scan-side reconciliation by stable field id.

Invariants:
  * live scans present the CURRENT schema; rows from files written
    under older versions come back with NULL backfill (added columns),
    the new name (renames), and the widened type (promotions)
  * a snapshot pinned BEFORE the evolution still reads with ITS schema
  * unsafe type changes are rejected
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F
from pyspark.sql.types import (
    DoubleType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

from medalforge_lakehouse_data_spark.format.table import Table

V1 = StructType([
    StructField("id", LongType()),
    StructField("qty", IntegerType()),
    StructField("note", StringType()),
])


@pytest.fixture()
def evolved(spark, tmp_path):
    t = Table.create(str(tmp_path / "t"), V1)
    df1 = spark.createDataFrame([(1, 10, "a"), (2, 20, "b")], V1)
    t.append(spark, df1, target_file_count=1)
    pre_snap = t.current_snapshot_id()
    t.add_column("score", "double")
    t.rename_column("note", "comment")
    t.widen_column("qty", "long")
    df2 = spark.createDataFrame(
        [(3, 1 << 40, "c", 0.5)],
        StructType([
            StructField("id", LongType()),
            StructField("qty", LongType()),
            StructField("comment", StringType()),
            StructField("score", DoubleType()),
        ]),
    )
    t.append(spark, df2, target_file_count=1)
    return t, pre_snap


def test_unified_scan_after_evolution(spark, evolved):
    t, _ = evolved
    out = t.scan(spark)
    assert out.columns == ["id", "qty", "comment", "score"]
    assert dict(out.dtypes)["qty"] == "bigint"
    rows = {r.id: (r.qty, r.comment, r.score) for r in out.collect()}
    assert rows[1] == (10, "a", None)      # null backfill + rename + widen
    assert rows[2] == (20, "b", None)
    assert rows[3] == (1 << 40, "c", 0.5)  # value needing the widened type


def test_pinned_snapshot_keeps_old_schema(spark, evolved):
    t, pre_snap = evolved
    old = t.scan(spark, snapshot_id=pre_snap)
    assert old.columns == ["id", "qty", "note"]
    assert dict(old.dtypes)["qty"] == "int"
    assert {r.note for r in old.collect()} == {"a", "b"}


def test_filters_and_projection_on_evolved_columns(spark, evolved):
    t, _ = evolved
    # filter on renamed column hits old-file rows
    assert t.scan(spark, filters=[("comment", "=", "a")]).count() == 1
    # filter on added column: old rows are NULL → excluded
    assert t.scan(spark, filters=[("score", ">=", 0.0)]).count() == 1
    # projection works across versions
    assert t.scan(spark, columns=["id", "score"]).columns == ["id", "score"]


def test_unsafe_widen_rejected(spark, tmp_path):
    t = Table.create(str(tmp_path / "t"), V1)
    with pytest.raises(ValueError, match="unsafe"):
        t.widen_column("qty", "string")
    with pytest.raises(ValueError, match="already exists"):
        t.add_column("qty", "long")
    with pytest.raises(KeyError):
        t.rename_column("nope", "x")


def test_merge_after_evolution(spark, evolved):
    from medalforge_lakehouse_data_spark.operators.merge import merge_into

    t, _ = evolved
    src = spark.createDataFrame(
        [(2, 99, "updated", 1.0), (4, 4, "new", 2.0)],
        t.schema,
    )
    merge_into(t, src, ["id"], spark)
    rows = {r.id: (r.qty, r.comment, r.score) for r in t.scan(spark).collect()}
    assert rows[2] == (99, "updated", 1.0)
    assert rows[4] == (4, "new", 2.0)
    assert rows[1] == (10, "a", None)


def test_compaction_after_evolution(spark, evolved):
    from medalforge_lakehouse_data_spark.maintenance import compaction

    t, _ = evolved
    compaction.compact(t, spark, target_file_bytes=64 * 1024 * 1024)
    rows = {r.id: (r.qty, r.comment, r.score) for r in t.scan(spark).collect()}
    assert rows[1] == (10, "a", None), "compaction corrupted renamed column"
    assert rows[3] == (1 << 40, "c", 0.5)
