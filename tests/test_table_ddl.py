"""Metadata DDL surface: time travel by timestamp, history, properties,
column comments (reference: table_manager.py ALTER COLUMN COMMENT /
TBLPROPERTIES semantics)."""

from __future__ import annotations

import pytest
from pyspark.sql.types import LongType, StringType, StructField, StructType

from medalforge_lakehouse_data_spark.format import Table

SCHEMA = StructType([StructField("id", LongType()), StructField("v", StringType())])


def test_time_travel_and_history(spark, tmp_table_dir):
    t = Table.create(tmp_table_dir, SCHEMA)
    s1 = t.append(spark, spark.createDataFrame([(1, "a")], SCHEMA))
    s2 = t.append(spark, spark.createDataFrame([(2, "b")], SCHEMA))
    # as-of between the two commits resolves to s1
    mid = (s1.timestamp_ms + s2.timestamp_ms) // 2 if s2.timestamp_ms > s1.timestamp_ms else s1.timestamp_ms
    assert t.snapshot_as_of(mid).snapshot_id == s1.snapshot_id
    assert t.snapshot_as_of(s1.timestamp_ms - 10_000) is None
    assert t.scan(spark, as_of_timestamp_ms=s1.timestamp_ms).count() == 1
    assert t.scan(spark, as_of_timestamp_ms=s1.timestamp_ms - 10_000).count() == 0
    with pytest.raises(ValueError):
        t.scan(spark, snapshot_id=s1.snapshot_id, as_of_timestamp_ms=mid)
    h = t.history()
    assert [e["snapshot_id"] for e in h] == [s1.snapshot_id, s2.snapshot_id]
    assert h[1]["total_rows"] == 2


def test_properties_and_comments(spark, tmp_table_dir):
    t = Table.create(tmp_table_dir, SCHEMA, properties={"appendOnly": "true"})
    t.set_properties({"write.target-file-bytes": "1048576"})
    props = t.metadata().properties
    assert props["appendOnly"] == "true"
    assert props["write.target-file-bytes"] == "1048576"
    t.set_column_comment("v", "the value")
    assert t.schema["v"].metadata["comment"] == "the value"
    with pytest.raises(KeyError):
        t.set_column_comment("ghost", "x")
    # snapshots unaffected by metadata-only changes
    assert t.current_snapshot_id() is None
    t.append(spark, spark.createDataFrame([(1, "a")], SCHEMA))
    assert t.scan(spark).count() == 1
