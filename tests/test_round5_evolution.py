"""Round-5 table-format additions: ROLLBACK TO SNAPSHOT, DROP COLUMN,
and ancestry-aware incremental reads.

Invariants:
  * rollback_to moves the current pointer to an ancestor, metadata-only;
    pinned scans of abandoned snapshots keep working until expiry
  * commits after a rollback branch from the restored snapshot; changes()
    follows the ancestry chain and never replays the abandoned branch
  * expire_snapshots after a rollback reclaims the abandoned branch's
    unique files via the reachability GC
  * drop_column removes the field from live scans; re-adding the same
    name mints a NEW field id, so old stored values stay NULL (Iceberg
    drop/re-add semantics); spec- or cluster-referenced columns refuse
"""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F
from pyspark.sql.types import (
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

from medalforge_lakehouse_data_spark.format.table import Table
from medalforge_lakehouse_data_spark.maintenance.expire import expire_snapshots

SCHEMA = StructType([
    StructField("id", LongType()),
    StructField("v", StringType()),
])


def _rows(df):
    return sorted((r["id"], r["v"]) for r in df.collect())


@pytest.fixture()
def forked(spark, tmp_path):
    """s1: ids 1-2; s2: ids 3-4; s3: ids 5-6; rollback to s1; s4: id 7
    (parent s1). Abandoned branch = {s2, s3}."""
    t = Table.create(str(tmp_path / "t"), SCHEMA)
    t.append(spark, spark.createDataFrame([(1, "a"), (2, "b")], SCHEMA),
             target_file_count=1)
    t.append(spark, spark.createDataFrame([(3, "c"), (4, "d")], SCHEMA),
             target_file_count=1)
    t.append(spark, spark.createDataFrame([(5, "e"), (6, "f")], SCHEMA),
             target_file_count=1)
    t.rollback_to(1)
    t.append(spark, spark.createDataFrame([(7, "g")], SCHEMA),
             target_file_count=1)
    return t


def test_rollback_restores_ancestor_state(spark, tmp_path):
    t = Table.create(str(tmp_path / "t"), SCHEMA)
    t.append(spark, spark.createDataFrame([(1, "a"), (2, "b")], SCHEMA),
             target_file_count=1)
    t.append(spark, spark.createDataFrame([(3, "c")], SCHEMA),
             target_file_count=1)
    assert t.current_snapshot_id() == 2
    t.rollback_to(1)
    assert t.current_snapshot_id() == 1
    assert _rows(t.scan(spark)) == [(1, "a"), (2, "b")]
    # abandoned snapshot still pin-readable before expiry
    assert _rows(t.scan(spark, snapshot_id=2)) == [(1, "a"), (2, "b"), (3, "c")]
    # idempotent; non-ancestor / unknown targets refuse
    t.rollback_to(1)
    with pytest.raises(ValueError):
        t.rollback_to(2)  # 2 is no longer on the current line
    with pytest.raises(KeyError):
        t.rollback_to(99)


def test_post_rollback_commits_branch_from_restored(spark, forked):
    t = forked
    assert _rows(t.scan(spark)) == [(1, "a"), (2, "b"), (7, "g")]
    snaps = {s.snapshot_id: s for s in t.snapshots()}
    assert snaps[4].parent_id == 1
    assert t.ancestry() == [1, 4]


def test_changes_follows_ancestry_not_abandoned_branch(spark, forked):
    t = forked
    ch = t.changes(spark, from_snapshot_id=0).collect()
    got = sorted((r["id"], r["_change_type"], r["_commit_snapshot_id"])
                 for r in ch)
    # only s1 and s4 — the abandoned s2/s3 inserts must not replay
    assert got == [(1, "insert", 1), (2, "insert", 1), (7, "insert", 4)]
    with pytest.raises(ValueError):
        t.changes(spark, from_snapshot_id=2)  # off-line start refuses


def test_expire_after_rollback_reclaims_abandoned_files(spark, forked):
    t = forked
    abandoned = {e.path for sid in (2, 3) for e in t.files(sid)} - {
        e.path for e in t.files(1)}
    assert abandoned
    out = expire_snapshots(t, keep_last=1, grace_s=0)
    assert set(out["expired_snapshots"]) >= {2, 3}
    for rel in abandoned:
        assert not os.path.exists(os.path.join(t.root, rel))
    assert _rows(t.scan(spark)) == [(1, "a"), (2, "b"), (7, "g")]


# -- drop_column ------------------------------------------------------------

def test_drop_column_and_readd_is_new_field(spark, tmp_path):
    t = Table.create(str(tmp_path / "t"), StructType([
        StructField("id", LongType()),
        StructField("v", StringType()),
        StructField("extra", IntegerType()),
    ]))
    t.append(spark, spark.createDataFrame(
        [(1, "a", 10), (2, "b", 20)],
        t.schema), target_file_count=1)
    pre = t.current_snapshot_id()
    t.drop_column("extra")
    assert t.scan(spark).columns == ["id", "v"]
    # pinned pre-drop snapshot still presents its own schema
    assert t.scan(spark, snapshot_id=pre).columns == ["id", "v", "extra"]
    # new writes omit the column; then re-add the NAME → new field id
    t.append(spark, spark.createDataFrame([(3, "c")], t.schema),
             target_file_count=1)
    t.add_column("extra", "int")
    out = {r["id"]: r["extra"] for r in t.scan(spark).collect()}
    assert out == {1: None, 2: None, 3: None}  # old values stay invisible
    with pytest.raises(KeyError):
        t.drop_column("nope")


def test_drop_column_guards_spec_and_cluster(spark, tmp_path):
    t = Table.create(str(tmp_path / "t"), SCHEMA,
                     partition_spec=["bucket(id, 4)"])
    with pytest.raises(ValueError, match="partition"):
        t.drop_column("id")
    t2 = Table.create(str(tmp_path / "t2"), SCHEMA)
    t2.set_properties({"cluster.columns": "v", "cluster.curve": "zorder"})
    with pytest.raises(ValueError, match="cluster"):
        t2.drop_column("v")


# -- tags (named refs) ------------------------------------------------------

def test_tag_protects_snapshot_from_expiry(spark, tmp_path):
    t = Table.create(str(tmp_path / "t"), SCHEMA)
    for i in range(4):
        t.append(spark, spark.createDataFrame([(i, str(i))], SCHEMA),
                 target_file_count=1)
    sid = t.create_tag("audit", snapshot_id=2)
    assert sid == 2 and t.ref("audit") == 2
    out = expire_snapshots(t, keep_last=1, grace_s=0)
    # 2 survives via the tag, 1 and 3 expire
    assert set(out["expired_snapshots"]) == {1, 3}
    assert _rows(t.scan(spark, snapshot_id=t.ref("audit"))) == [
        (0, "0"), (1, "1")]
    # dropping the tag releases it for the next expiry
    t.remove_tag("audit")
    out2 = expire_snapshots(t, keep_last=1, grace_s=0)
    assert 2 in set(out2["expired_snapshots"])


def test_tag_guards_and_replace(spark, tmp_path):
    t = Table.create(str(tmp_path / "t"), SCHEMA)
    with pytest.raises(ValueError):
        t.create_tag("v1")  # empty table
    t.append(spark, spark.createDataFrame([(1, "a")], SCHEMA),
             target_file_count=1)
    assert t.create_tag("v1") == 1  # defaults to current
    t.append(spark, spark.createDataFrame([(2, "b")], SCHEMA),
             target_file_count=1)
    with pytest.raises(ValueError):
        t.create_tag("v1", snapshot_id=2)
    assert t.create_tag("v1", snapshot_id=2, replace=True) == 2
    assert t.tags() == {"v1": 2}
    with pytest.raises(KeyError):
        t.ref("nope")
    with pytest.raises(KeyError):
        t.remove_tag("nope")
    with pytest.raises(KeyError):
        t.create_tag("v2", snapshot_id=99)


def test_set_current_snapshot_reaches_off_line_tag(spark, forked):
    t = forked
    # tag the abandoned s3, then jump the pointer to it (rollback_to
    # refuses non-ancestors; set_current_snapshot is the escape hatch)
    t.create_tag("abandoned-tip", snapshot_id=3)
    with pytest.raises(ValueError):
        t.rollback_to(3)
    t.set_current_snapshot(t.ref("abandoned-tip"))
    assert t.current_snapshot_id() == 3
    assert _rows(t.scan(spark)) == [(1, "a"), (2, "b"), (3, "c"),
                                    (4, "d"), (5, "e"), (6, "f")]
    assert t.ancestry() == [1, 2, 3]


# -- metadata inspection tables ---------------------------------------------

def test_inspect_metadata_tables(spark, forked):
    t = forked
    t.create_tag("audit", snapshot_id=2)
    snaps = t.inspect(spark, "snapshots")
    assert {r["snapshot_id"] for r in snaps.collect()} == {1, 2, 3, 4}
    assert snaps.filter(F.col("operation") == "append").count() == 4
    refs = t.inspect(spark, "refs").collect()
    assert [(r["name"], r["snapshot_id"]) for r in refs] == [("audit", 2)]
    files = t.inspect(spark, "files")
    fr = files.collect()
    assert all(r["content"] == "data" for r in fr)
    assert files.agg(F.sum("rows")).collect()[0][0] == 3  # s1 (2) + s4 (1)
    man = t.inspect(spark, "manifests", snapshot_id=3).collect()
    assert len(man) >= 1 and all(r["path"] for r in man)
    # SQL over metadata: small-file count
    files.createOrReplaceTempView("tmeta_files")
    n = spark.sql(
        "SELECT count(*) c FROM tmeta_files WHERE bytes < 1048576"
    ).collect()[0]["c"]
    assert n == len(fr)
    with pytest.raises(ValueError):
        t.inspect(spark, "bogus")


def test_ancestry_and_rollback_survive_expired_parents(spark, tmp_path):
    t = Table.create(str(tmp_path / "t"), SCHEMA)
    for i in range(3):
        t.append(spark, spark.createDataFrame([(i, str(i))], SCHEMA),
                 target_file_count=1)
    expire_snapshots(t, keep_last=1, grace_s=0)
    # s3 survives with parent_id=2 pointing at an expired snapshot:
    # the ancestry walk truncates instead of crashing
    assert t.ancestry() == [3]
    with pytest.raises(KeyError):
        t.ancestry(snapshot_id=99)
    t.append(spark, spark.createDataFrame([(9, "z")], SCHEMA),
             target_file_count=1)
    assert t.ancestry() == [3, 4]
    with pytest.raises(KeyError):
        t.rollback_to(2)        # expired target: unknown snapshot
    t.rollback_to(3)            # retained ancestor still works
    assert t.current_snapshot_id() == 3


def test_wap_write_audit_publish_flow(spark, tmp_path):
    """WAP recipe over tags+rollback: pin the audited state, let writers
    land commits, audit the head, then either publish (move the pin
    forward) or roll back to the pin — no branch machinery needed."""
    t = Table.create(str(tmp_path / "t"), SCHEMA)
    t.append(spark, spark.createDataFrame([(1, "a")], SCHEMA),
             target_file_count=1)
    t.create_tag("published")                     # pin the good state

    # write: a batch lands on the table but is not yet "published"
    t.append(spark, spark.createDataFrame([(2, "BAD")], SCHEMA),
             target_file_count=1)
    # audit fails → consumers were never switched; roll back to the pin
    bad = t.scan(spark).filter(F.col("v") == "BAD").count()
    assert bad == 1
    t.rollback_to(t.ref("published"))
    assert _rows(t.scan(spark)) == [(1, "a")]

    # next attempt passes audit → publish = move the pin forward
    t.append(spark, spark.createDataFrame([(3, "c")], SCHEMA),
             target_file_count=1)
    assert t.scan(spark).filter(F.col("v") == "BAD").count() == 0
    t.create_tag("published", replace=True)
    assert t.ref("published") == t.current_snapshot_id()
    # the abandoned bad commit is reclaimable; the pin survives expiry
    out = expire_snapshots(t, keep_last=1, grace_s=0)
    assert 2 in set(out["expired_snapshots"])
    assert _rows(t.scan(spark)) == [(1, "a"), (3, "c")]
