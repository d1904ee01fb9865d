"""Incremental (CDC-driven) silver pipeline: process only bronze changes
since the last run, with a snapshot cursor on the target and per-window
commit keys for exactly-once replay.

Invariants:
  * first run = initial load (cursor 0); second run with no new bronze
    commits is a no-op (no target snapshot, no re-read);
  * appends since the cursor flow through checks/quarantine/ETL and
    MERGE-upsert into the target — quarantine counts cover ONLY the
    delta rows;
  * bronze upserts (MoR delete+insert of a key) land as the new version;
    bronze deletes propagate as a MERGE delete; a key deleted then
    re-inserted in one window survives with the latest version;
  * replaying the same window (crash between commits) leaves the target
    byte-identical (commit keys);
  * incremental results equal a full-refresh rebuild on the same bronze.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F
from pyspark.sql.types import (
    DoubleType,
    LongType,
    StringType,
    StructField,
    StructType,
)

from medalforge_lakehouse_data_spark.format.table import Table
from medalforge_lakehouse_data_spark.operators.merge import merge_into
from medalforge_lakehouse_data_spark.pipeline.silver import (
    run_pipeline_incremental,
)
from medalforge_lakehouse_data_spark.plans.catalog import Catalog
from medalforge_lakehouse_data_spark.plans.silver_contract import (
    load_silver_contract,
)

SCHEMA = StructType([
    StructField("id", StringType()),
    StructField("amount", DoubleType()),
])

CONTRACT = {
    "version": "1.0",
    "source": {"bronze_table": "main.bronze.src"},
    "target": {
        "catalog": "main", "schema": "silver", "table": "tgt",
        "write": {"mode": "merge", "merge_keys": ["id"]},
    },
    "dqx": {"checks": [
        {"name": "not_null_id",
         "check": {"function": "is_not_null", "arguments": {"column": "id"}}},
        {"name": "amount_range",
         "check": {"function": "is_in_range",
                   "arguments": {"column": "amount", "min_limit": 0,
                                 "max_limit": 1000}}},
    ]},
    "etl": {"standard": [
        {"method": "trim_columns", "args": {"columns": ["id"]}},
    ]},
    "quarantine": {
        "remediate": [
            {"method": "clamp_range",
             "args": {"column": "amount", "min": 0.0, "max": 1000.0}},
        ],
        "sink": {"table": "main.monitoring.quar"},
    },
}


def _mk(spark, rows):
    return spark.createDataFrame(rows, SCHEMA)


@pytest.fixture()
def env(spark, tmp_path):
    catalog = Catalog(str(tmp_path / "wh"))
    contract = load_silver_contract(CONTRACT)
    src = catalog.create_table("main.bronze.src", SCHEMA)
    return catalog, contract, src


def _target_rows(spark, catalog):
    t = catalog.load("main.silver.tgt")
    return {r["id"]: r["amount"] for r in t.scan(spark).collect()}


def test_initial_load_then_noop(spark, env):
    catalog, contract, src = env
    src.append(spark, _mk(spark, [("a", 1.0), ("b", 2.0)]),
               target_file_count=1)
    res = run_pipeline_incremental(spark, contract, catalog)
    assert res.metrics["cdc_inserts"] == 2 and res.metrics["cdc_deletes"] == 0
    assert _target_rows(spark, catalog) == {"a": 1.0, "b": 2.0}
    snap = catalog.load("main.silver.tgt").current_snapshot_id()
    res2 = run_pipeline_incremental(spark, contract, catalog)
    assert res2.metrics.get("noop") is True
    assert catalog.load("main.silver.tgt").current_snapshot_id() == snap


def test_appends_quarantine_only_delta(spark, env):
    catalog, contract, src = env
    src.append(spark, _mk(spark, [("a", 1.0)]), target_file_count=1)
    run_pipeline_incremental(spark, contract, catalog)
    # delta batch: one clean row + one out-of-range (remediable) row
    src.append(spark, _mk(spark, [("c", 3.0), ("d", 5000.0)]),
               target_file_count=1)
    res = run_pipeline_incremental(spark, contract, catalog)
    assert res.metrics["cdc_inserts"] == 2
    assert res.quarantined_rows == 1      # only d, only from the delta
    assert res.remediated_rows == 1       # clamped to 1000
    assert _target_rows(spark, catalog) == {"a": 1.0, "c": 3.0, "d": 1000.0}


def test_upsert_delete_and_reinsert_semantics(spark, env):
    catalog, contract, src = env
    src.append(spark, _mk(spark, [("a", 1.0), ("b", 2.0), ("c", 3.0),
                                  ("e", 5.0)]), target_file_count=1)
    run_pipeline_incremental(spark, contract, catalog)
    # window: upsert a (MoR: delete+insert same commit), delete b,
    # delete e then re-insert it in a later commit
    merge_into(src, _mk(spark, [("a", 10.0)]), ["id"], spark,
               strategy="merge-on-read")
    merge_into(src, _mk(spark, [("b", 2.0), ("e", 5.0)]), ["id"], spark,
               when_matched="delete", when_not_matched=None,
               strategy="merge-on-read")
    src.append(spark, _mk(spark, [("e", 50.0)]), target_file_count=1)
    res = run_pipeline_incremental(spark, contract, catalog)
    assert res.metrics["cdc_deletes"] == 1          # only b nets out
    assert _target_rows(spark, catalog) == {"a": 10.0, "c": 3.0, "e": 50.0}


def test_replay_is_exactly_once(spark, env):
    catalog, contract, src = env
    src.append(spark, _mk(spark, [("a", 1.0), ("bad", 5000.0)]),
               target_file_count=1)
    run_pipeline_incremental(spark, contract, catalog)
    tgt = catalog.load("main.silver.tgt")
    quar = catalog.load("main.monitoring.quar")
    snap, qsnap = tgt.current_snapshot_id(), quar.current_snapshot_id()
    # simulate a crash before the cursor advanced: rewind the cursor and
    # re-run the same window — every commit must no-op on its commit_key
    from medalforge_lakehouse_data_spark.pipeline.silver import (
        CDC_CURSOR_PREFIX,
    )
    key = f"{CDC_CURSOR_PREFIX}{src.metadata().table_uuid}"
    tgt.set_properties({key: "0"})
    res = run_pipeline_incremental(spark, contract, catalog)
    assert res.metrics["cdc_inserts"] == 2
    tgt = catalog.load("main.silver.tgt")
    assert tgt.current_snapshot_id() == snap
    assert catalog.load("main.monitoring.quar").current_snapshot_id() == qsnap
    assert _target_rows(spark, catalog) == {"a": 1.0, "bad": 1000.0}


def test_incremental_matches_full_refresh(spark, env):
    catalog, contract, src = env
    src.append(spark, _mk(spark, [("a", 1.0), ("b", 2.0)]),
               target_file_count=1)
    run_pipeline_incremental(spark, contract, catalog)
    merge_into(src, _mk(spark, [("b", 20.0), ("c", 30.0)]), ["id"], spark)
    merge_into(src, _mk(spark, [("a", 1.0)]), ["id"], spark,
               when_matched="delete", when_not_matched=None)
    run_pipeline_incremental(spark, contract, catalog)
    inc = _target_rows(spark, catalog)
    # rebuild from scratch under a different target and compare
    contract2 = load_silver_contract(
        {**CONTRACT, "target": {**CONTRACT["target"], "table": "tgt2"}})
    res = run_pipeline_incremental(spark, contract2, catalog,
                                   full_refresh=True)
    t2 = catalog.load("main.silver.tgt2")
    full = {r["id"]: r["amount"] for r in t2.scan(spark).collect()}
    assert inc == full == {"b": 20.0, "c": 30.0}
    # and the fast-forwarded cursor makes the next run a no-op
    res2 = run_pipeline_incremental(spark, contract2, catalog)
    assert res2.metrics.get("noop") is True


def test_mode_guard(spark, env):
    catalog, _, _ = env
    bad = load_silver_contract(
        {**CONTRACT,
         "target": {**CONTRACT["target"],
                    "write": {"mode": "append", "merge_keys": []}}})
    with pytest.raises(ValueError, match="merge"):
        run_pipeline_incremental(spark, bad, catalog)


def test_source_rollback_demands_full_refresh(spark, env):
    catalog, contract, src = env
    src.append(spark, _mk(spark, [("a", 1.0)]), target_file_count=1)
    src.append(spark, _mk(spark, [("b", 2.0)]), target_file_count=1)
    run_pipeline_incremental(spark, contract, catalog)   # cursor = 2
    src.rollback_to(1)
    src.append(spark, _mk(spark, [("c", 3.0)]), target_file_count=1)
    # cursor 2 is now on the abandoned branch
    with pytest.raises(RuntimeError, match="full_refresh"):
        run_pipeline_incremental(spark, contract, catalog)
    res = run_pipeline_incremental(spark, contract, catalog,
                                   full_refresh=True)
    assert _target_rows(spark, catalog) == {"a": 1.0, "c": 3.0, "b": 2.0}


def test_bronze_schema_evolution_flows_through(spark, env):
    catalog, contract, src = env
    src.append(spark, _mk(spark, [("a", 1.0)]), target_file_count=1)
    run_pipeline_incremental(spark, contract, catalog)
    # bronze grows a column mid-stream; the delta batch carries it
    src.add_column("note", "string")
    from pyspark.sql.types import StructType, StructField
    s2 = StructType([StructField("id", StringType()),
                     StructField("amount", DoubleType()),
                     StructField("note", StringType())])
    src.append(spark, spark.createDataFrame([("b", 2.0, "hello")], s2),
               target_file_count=1)
    res = run_pipeline_incremental(spark, contract, catalog)
    assert res.metrics["cdc_inserts"] == 1
    tgt = catalog.load("main.silver.tgt")
    out = {r["id"]: (r["amount"], r["note"])
           for r in tgt.scan(spark).collect()}
    # the new column reaches silver; pre-evolution rows read NULL
    assert out == {"a": (1.0, None), "b": (2.0, "hello")}
