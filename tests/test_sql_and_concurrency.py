"""spark.sql over engine tables (view registration) + commit-lock
serialization under concurrent writers."""

from __future__ import annotations

import threading

from pyspark.sql.types import LongType, StringType, StructField, StructType

from medalforge_lakehouse_data_spark.format import Table

SCHEMA = StructType([StructField("id", LongType()), StructField("grp", StringType())])


def test_sql_over_table_view(spark, tmp_table_dir):
    t = Table.create(tmp_table_dir, SCHEMA)
    s1 = t.append(spark, spark.createDataFrame([(i, "a" if i % 2 else "b") for i in range(50)], SCHEMA))
    t.append(spark, spark.createDataFrame([(99, "c")], SCHEMA))
    t.create_or_replace_view(spark, "tbl")
    rows = spark.sql("SELECT grp, count(*) AS n FROM tbl GROUP BY grp ORDER BY grp").collect()
    assert [(r.grp, r.n) for r in rows] == [("a", 25), ("b", 25), ("c", 1)]
    # pinned-snapshot view: time travel through SQL
    t.create_or_replace_view(spark, "tbl_v1", snapshot_id=s1.snapshot_id)
    assert spark.sql("SELECT count(*) AS n FROM tbl_v1").collect()[0].n == 50


def test_concurrent_appends_serialize(spark, tmp_table_dir):
    """8 threads appending concurrently: the commit lock serializes
    metadata swaps — all rows land, snapshot chain is linear."""
    t = Table.create(tmp_table_dir, SCHEMA)
    errors: list[Exception] = []

    def appender(k: int) -> None:
        try:
            df = spark.createDataFrame([(k * 100 + i, f"g{k}") for i in range(20)], SCHEMA)
            t.append(spark, df, commit_key=f"writer-{k}")
        except Exception as e:  # pragma: no cover
            errors.append(e)

    threads = [threading.Thread(target=appender, args=(k,)) for k in range(8)]
    for th in threads:
        th.start()
    for th in threads:
        th.join()
    assert not errors
    assert t.scan(spark).count() == 160
    snaps = t.snapshots()
    assert len(snaps) == 8
    # linear parent chain, strictly increasing ids
    ids = [s.snapshot_id for s in snaps]
    assert ids == sorted(ids)
    parents = [s.parent_id for s in snaps]
    assert parents == [None] + ids[:-1]
