"""Driver contract for the spark-graft builder (PySpark target).

``queries()`` exposes every implemented operator from SURVEY.md §2 and
the training-data ops as (spark, sf_dir) → DataFrame callables;
``oracle_sql()`` gives DuckDB-equivalent SQL for each SQL-expressible
one (driver compares row counts + schema + order-insensitive value
hash at sf=0.01). Maintenance jobs that need the engine's own table
format (compaction/clustering/merge roundtrips) are included as
rows-only checks; their full invariants are pytest-gated (tests/).

Alignment rules honored throughout: every computed column is aliased
identically in Spark and SQL; double aggregations go through
decimal(18,2|4) casts so both engines sum exactly; ratio columns are
rounded to 4 decimals on both sides.

Output-schema rule (round-2 driver-gate fix): NO decimal column ever
reaches a query's final select. Decimal sums are exact internally, but
the driver's value hasher stringifies Decimal('412093.00') differently
from DuckDB's float 412093.0, failing hash_match on representation
alone (VERDICT.md round 1: 9 such queries, all value-identical). Every
final decimal aggregate is therefore cast to double with an explicit
round(x, 2|4) on BOTH the Spark and DuckDB sides — the exact pattern
the already-passing ratio columns used.
"""

from __future__ import annotations

import os
import tempfile
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

SF_DEFAULT = "/root/testdata/sf0.001"


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))


def _dbl(name: str, scale: int):
    """Final-select cast: exact decimal aggregate → rounded double.

    Keeps the sum exact (decimal) through the aggregation, then emits a
    double so the driver's hasher sees the same representation Spark-
    and DuckDB-side (see module docstring, round-2 gate fix)."""
    return F.round(F.col(name).cast("double"), scale).alias(name)


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: TPC-H Q1-style pricing summary over sf0.001 lineitem."""
    return q_pricing_summary(spark, SF_DEFAULT)


# ---------------------------------------------------------------------------
# TPC-H-ish relational core


def q_pricing_summary(spark, sf):
    li = _t(spark, sf, "lineitem")
    d = lambda c: F.col(c).cast("decimal(18,2)")
    return (
        li.filter(F.col("l_shipdate") <= F.lit("1998-09-02"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.sum(d("l_quantity")).alias("sum_qty"),
            F.sum(d("l_extendedprice")).alias("sum_base_price"),
            F.sum(
                (d("l_extendedprice") * (F.lit(1).cast("decimal(18,2)") - d("l_discount")))
                .cast("decimal(18,4)")  # lossless: scale-2 × scale-2 = scale-4
            ).alias("sum_disc_price"),
            F.count("*").alias("count_order"),
        )
        .select("l_returnflag", "l_linestatus", _dbl("sum_qty", 2),
                _dbl("sum_base_price", 2), _dbl("sum_disc_price", 4),
                "count_order")
        .orderBy("l_returnflag", "l_linestatus")
    )


def q_shipping_priority(spark, sf):
    c = _t(spark, sf, "customer").filter(F.col("c_mktsegment") == "BUILDING")
    o = _t(spark, sf, "orders")
    li = _t(spark, sf, "lineitem")
    rev = (
        F.col("l_extendedprice").cast("decimal(18,2)")
        * (F.lit(1).cast("decimal(18,2)") - F.col("l_discount").cast("decimal(18,2)"))
    ).cast("decimal(18,4)")
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .groupBy("l_orderkey", "o_orderdate")
        .agg(F.sum(rev).alias("revenue"))
        .orderBy(F.desc("revenue"), "l_orderkey")
        .limit(10)
        .select("l_orderkey", "o_orderdate", _dbl("revenue", 4))
    )


def q_local_suppliers(spark, sf):
    """Broadcast-dim star join: revenue by nation within one region."""
    r = _t(spark, sf, "region").filter(F.col("r_name") == "ASIA")
    n = _t(spark, sf, "nation")
    s = _t(spark, sf, "supplier")
    li = _t(spark, sf, "lineitem")
    rev = (
        F.col("l_extendedprice").cast("decimal(18,2)")
        * (F.lit(1).cast("decimal(18,2)") - F.col("l_discount").cast("decimal(18,2)"))
    ).cast("decimal(18,4)")
    return (
        li.join(s, li.l_suppkey == s.s_suppkey)
        .join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .groupBy("n_name")
        .agg(F.sum(rev).alias("revenue"), F.count("*").alias("n_items"))
        .select("n_name", _dbl("revenue", 4), "n_items")
        .orderBy("n_name")
    )


def q_top_orders_per_customer(spark, sf):
    o = _t(spark, sf, "orders")
    w = Window.partitionBy("o_custkey").orderBy(
        F.desc("o_totalprice"), F.col("o_orderkey")
    )
    return (
        o.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= 3)
        .select("o_custkey", "o_orderkey", "rk")
    )


def q_events_by_type(spark, sf):
    e = _t(spark, sf, "events")
    return (
        e.groupBy("event_type")
        .agg(
            F.count("*").alias("n"),
            F.sum(F.col("value").cast("decimal(18,4)")).alias("sum_value"),
            F.countDistinct("user_id").alias("n_users"),
        )
        .select("event_type", "n", _dbl("sum_value", 4), "n_users")
        .orderBy("event_type")
    )


def q_events_windowed(spark, sf):
    """Tumbling 1-hour window aggregation over the events table — the
    exact shape a Structured Streaming job runs (F.window is the
    streaming-compatible operator; executed batch here so DuckDB's
    time_bucket can oracle it)."""
    e = _t(spark, sf, "events")
    return (
        e.groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
        .agg(F.count("*").alias("n"),
             F.sum(F.col("value").cast("decimal(18,4)")).alias("sum_value"))
        .select(F.col("w.start").alias("w_start"), "event_type", "n",
                _dbl("sum_value", 4))
        .orderBy("w_start", "event_type")
    )


def q_forecast_revenue(spark, sf):
    """TPC-H Q6-style: tight filter + single agg (predicate-pushdown path)."""
    li = _t(spark, sf, "lineitem")
    return li.filter(
        (F.col("l_shipdate") >= F.lit("1995-01-01"))
        & (F.col("l_shipdate") < F.lit("1996-01-01"))
        & (F.col("l_discount").between(0.03, 0.07))
        & (F.col("l_quantity") < 24)
    ).agg(
        F.sum(
            (F.col("l_extendedprice").cast("decimal(18,2)")
             * F.col("l_discount").cast("decimal(18,2)")).cast("decimal(18,4)")
        ).alias("revenue"),
        F.count("*").alias("n"),
    ).select(_dbl("revenue", 4), "n")


def q_semi_join_customers_with_orders(spark, sf):
    c = _t(spark, sf, "customer")
    o = _t(spark, sf, "orders")
    return c.join(o, c.c_custkey == o.o_custkey, "left_semi").select(
        "c_custkey", "c_mktsegment"
    )


def q_anti_join_customers_without_orders(spark, sf):
    c = _t(spark, sf, "customer")
    o = _t(spark, sf, "orders").filter(F.col("o_orderstatus") == "F")
    return c.join(o, c.c_custkey == o.o_custkey, "left_anti").select(
        "c_custkey", "c_name"
    )


def q_having_big_orders(spark, sf):
    li = _t(spark, sf, "lineitem")
    return (
        li.groupBy("l_orderkey")
        .agg(F.sum(F.col("l_quantity").cast("decimal(18,2)")).alias("total_qty"))
        .filter(F.col("total_qty") > 150)
        .select("l_orderkey", _dbl("total_qty", 2))
    )


def q_distinct_agg(spark, sf):
    o = _t(spark, sf, "orders")
    return o.groupBy("o_orderstatus").agg(
        F.countDistinct("o_custkey").alias("n_cust"),
        F.countDistinct("o_orderpriority").alias("n_prio"),
        F.count("*").alias("n"),
    ).orderBy("o_orderstatus")


def q_avg_over_subquery(spark, sf):
    """Scalar-subquery pattern: orders above the global average price."""
    o = _t(spark, sf, "orders")
    avg_price = o.agg(F.avg(F.col("o_totalprice").cast("decimal(18,2)")).alias("a"))
    return (
        o.crossJoin(F.broadcast(avg_price))
        .filter(F.col("o_totalprice") > F.col("a") * 1.5)
        .select("o_orderkey", "o_totalprice")
    )


def q_rollup_status_priority(spark, sf):
    """ROLLUP grouping-sets aggregation (subtotals + grand total)."""
    o = _t(spark, sf, "orders")
    return (
        o.rollup("o_orderstatus", "o_orderpriority")
        .agg(F.count("*").alias("n"),
             F.sum(F.col("o_totalprice").cast("decimal(18,2)")).alias("total"))
        .select(
            F.coalesce("o_orderstatus", F.lit("ALL")).alias("status"),
            F.coalesce("o_orderpriority", F.lit("ALL")).alias("priority"),
            "n", _dbl("total", 2),
        )
    )


def q_date_rollup_monthly(spark, sf):
    o = _t(spark, sf, "orders")
    return (
        o.groupBy(
            F.year("o_orderdate").alias("ano"), F.month("o_orderdate").alias("mes")
        )
        .agg(F.count("*").alias("n_orders"),
             F.sum(F.col("o_totalprice").cast("decimal(18,2)")).alias("total"))
        .select("ano", "mes", "n_orders", _dbl("total", 2))
        .orderBy("ano", "mes")
    )


# ---------------------------------------------------------------------------
# ETL core steps (reference parity — SURVEY.md §2.2/2.5/2.8)


def q_etl_trim(spark, sf):
    from medalforge_lakehouse_data_spark.operators.etl_core import trim_columns

    c = _t(spark, sf, "customer").select(
        "c_custkey", F.concat(F.lit("  "), F.col("c_name"), F.lit("  ")).alias("c_name")
    )
    return trim_columns(c, ["c_name"])


def q_etl_cast(spark, sf):
    from medalforge_lakehouse_data_spark.operators.etl_core import cast_columns

    li = _t(spark, sf, "lineitem").select(
        "l_orderkey", "l_linenumber",
        F.col("l_quantity").alias("qty"),
        F.col("l_shipdate").cast("string").alias("ship_s"),
    )
    out = cast_columns(li, {"qty": "int", "ship_s": "date"})
    return out.withColumnRenamed("qty", "qty_int").withColumnRenamed("ship_s", "ship_d")


def q_etl_normalize_dates(spark, sf):
    from medalforge_lakehouse_data_spark.operators.etl_core import normalize_dates

    e = _t(spark, sf, "events").select(
        "event_id", F.date_format("ts", "yyyy-MM-dd").alias("d")
    )
    return normalize_dates(e, ["d"], format="yyyy-MM-dd")


def q_etl_coerce_date(spark, sf):
    """Round-trip: format dates two ways, coerce back (multi-pattern)."""
    from medalforge_lakehouse_data_spark.operators.etl_core import coerce_date

    o = _t(spark, sf, "orders").select(
        "o_orderkey",
        F.when(
            F.col("o_orderkey") % 2 == 0, F.date_format("o_orderdate", "M/d/yyyy")
        ).otherwise(F.date_format("o_orderdate", "yyyy-MM-dd")).alias("od"),
    )
    return coerce_date(o, "od", ["M/d/yyyy", "yyyy-MM-dd"])


def q_etl_clamp(spark, sf):
    from medalforge_lakehouse_data_spark.operators.etl_core import clamp_range

    li = _t(spark, sf, "lineitem").select(
        "l_orderkey", "l_linenumber", F.col("l_quantity").alias("qty")
    )
    return clamp_range(li, "qty", min=10.0, max=40.0)


def q_etl_drop_if_null(spark, sf):
    from medalforge_lakehouse_data_spark.operators.etl_core import drop_if_null

    e = _t(spark, sf, "events").select(
        "event_id",
        F.when(F.col("value") > 0, F.col("value")).alias("v"),
    )
    return drop_if_null(e, ["v"])


def q_etl_dedup(spark, sf):
    from medalforge_lakehouse_data_spark.operators.etl_core import deduplicate

    li = _t(spark, sf, "lineitem").select("l_orderkey", "l_linenumber", "l_quantity")
    out = deduplicate(li, ["l_orderkey"], ["l_linenumber desc"])
    return out.select("l_orderkey", "l_linenumber")


def q_etl_dedup_agg(spark, sf):
    """Same dedup via the scale-path agg strategy (max_by, no sort)."""
    from medalforge_lakehouse_data_spark.operators.etl_core import deduplicate

    li = _t(spark, sf, "lineitem").select("l_orderkey", "l_linenumber", "l_quantity")
    out = deduplicate(li, ["l_orderkey"], ["l_linenumber desc"], strategy="agg")
    return out.select("l_orderkey", "l_linenumber")


def q_etl_union_by_name(spark, sf):
    a = _t(spark, sf, "orders").select("o_orderkey", "o_totalprice")
    b = _t(spark, sf, "orders").select(
        (F.col("o_orderkey") + 10_000_000).alias("o_orderkey"), "o_orderstatus"
    )
    return a.unionByName(b, allowMissingColumns=True)


# ---------------------------------------------------------------------------
# Quality checks (engine parity)


def q_check_unique_flag(spark, sf):
    from medalforge_lakehouse_data_spark.operators.checks import apply_checks

    li = _t(spark, sf, "lineitem").select("l_orderkey", "l_linenumber")
    checked = apply_checks(
        li,
        [{"name": "ok_unique", "criticality": "error",
          "check": {"function": "is_unique", "arguments": {"columns": ["l_orderkey"]}}}],
    )
    return checked.select(
        "l_orderkey", "l_linenumber", (F.size("_errors") > 0).alias("is_dup")
    )


def q_check_split(spark, sf):
    from medalforge_lakehouse_data_spark.operators.checks import apply_checks_and_split

    o = _t(spark, sf, "orders")
    checks = [
        {"name": "price_range", "criticality": "error",
         "check": {"function": "is_in_range",
                   "arguments": {"column": "o_totalprice", "min_limit": 1000.0,
                                  "max_limit": 400000.0}}},
        {"name": "status_f", "criticality": "error",
         "check": {"function": "sql_expression",
                   "arguments": {"expression": "o_orderstatus <> 'X'"}}},
    ]
    _valid, quar = apply_checks_and_split(o, checks)
    return quar.select("o_orderkey", F.size("_errors").alias("n_errors"))


# ---------------------------------------------------------------------------
# MERGE INTO (the real table-format path, oracle-checked)


def _merge_fixture(spark, sf, when_matched, when_not_matched, strategy="copy-on-write"):
    from medalforge_lakehouse_data_spark.format.table import Table
    from medalforge_lakehouse_data_spark.operators.merge import merge_into

    o = _t(spark, sf, "orders")
    target_df = o.filter(F.col("o_orderkey") % 2 == 0).select(
        "o_orderkey", "o_custkey", F.col("o_totalprice").cast("decimal(18,2)").alias("price")
    )
    source_df = o.filter(F.col("o_orderkey") % 3 == 0).select(
        "o_orderkey", "o_custkey",
        (F.col("o_totalprice").cast("decimal(18,2)") + F.lit(1).cast("decimal(18,2)"))
        .cast("decimal(18,2)").alias("price"),
    )
    with tempfile.TemporaryDirectory() as tmp:
        t = Table.create(os.path.join(tmp, "t"), target_df.schema)
        t.append(spark, target_df, target_file_count=8, sort_within=["o_orderkey"])
        merge_into(t, source_df, ["o_orderkey"], spark,
                   when_matched=when_matched, when_not_matched=when_not_matched,
                   strategy=strategy)
        out = t.scan(spark).select("o_orderkey", "o_custkey", _dbl("price", 2))
        out = spark.createDataFrame(out.collect(), out.schema)  # materialize before tmp cleanup
    return out


def q_merge_upsert(spark, sf):
    return _merge_fixture(spark, sf, "update", "insert")


def q_merge_delete(spark, sf):
    return _merge_fixture(spark, sf, "delete", None)


def q_merge_mor_upsert(spark, sf):
    """Merge-on-read upsert: equality-delete file + appended versions,
    zero rewritten files. Must produce the SAME row set as the
    copy-on-write upsert — the oracle SQL is shared verbatim."""
    return _merge_fixture(spark, sf, "update", "insert", strategy="merge-on-read")


def q_merge_mor_delete(spark, sf):
    return _merge_fixture(spark, sf, "delete", None, strategy="merge-on-read")


def q_merge_conditional(spark, sf, strategy="copy-on-write"):
    """Conditional MERGE: WHEN MATCHED AND s.o_custkey % 2 = 0 THEN
    UPDATE SET price = s.price (column-subset update); WHEN NOT MATCHED
    THEN INSERT. Oracle mirrors it with a LEFT JOIN + CASE."""
    from medalforge_lakehouse_data_spark.format.table import Table
    from medalforge_lakehouse_data_spark.operators.merge import merge_into

    o = _t(spark, sf, "orders")
    target_df = o.filter(F.col("o_orderkey") % 2 == 0).select(
        "o_orderkey", "o_custkey", F.col("o_totalprice").cast("decimal(18,2)").alias("price")
    )
    source_df = o.filter(F.col("o_orderkey") % 3 == 0).select(
        "o_orderkey", "o_custkey",
        (F.col("o_totalprice").cast("decimal(18,2)") + F.lit(1).cast("decimal(18,2)"))
        .cast("decimal(18,2)").alias("price"),
    )
    with tempfile.TemporaryDirectory() as tmp:
        t = Table.create(os.path.join(tmp, "t"), target_df.schema)
        t.append(spark, target_df, target_file_count=8, sort_within=["o_orderkey"])
        merge_into(t, source_df, ["o_orderkey"], spark,
                   matched_condition="s.o_custkey % 2 = 0",
                   update_columns=["price"], strategy=strategy)
        out = t.scan(spark).select("o_orderkey", "o_custkey", _dbl("price", 2))
        out = spark.createDataFrame(out.collect(), out.schema)
    return out


def q_merge_mor_conditional(spark, sf):
    """Same conditional/subset MERGE executed merge-on-read: equality
    deletes of the FIRED keys + patched row versions, zero rewritten
    files (round-3 VERDICT missing #2). Must produce the SAME row set —
    the oracle SQL is shared verbatim with merge_conditional."""
    return q_merge_conditional(spark, sf, strategy="merge-on-read")


def q_incremental_scan(spark, sf):
    """Changes-since-snapshot (CDC-lite) scan — Table.changes() (round-4
    VERDICT #4; Delta CDF / Iceberg incremental-read parity, vs the
    reference's full re-read of the silver source,
    reference: silver/application/pipeline.py:29-30).

    Deterministic history over orders: snapshot 1 = o_orderkey%3 != 0;
    commit 2 appends %3==0 ∧ %4==0; commit 3 MoR-upserts %5==0 with
    price+1 (blind equality delete of every source key + appended
    versions); commit 4 MoR-deletes %7==0. changes(since=1) must report
    exactly those commits' insert rows and delete-key rows."""
    from medalforge_lakehouse_data_spark.format.table import Table
    from medalforge_lakehouse_data_spark.operators.merge import merge_into

    o = _t(spark, sf, "orders")
    price = F.round(F.col("o_totalprice").cast("double"), 2).alias("price")
    base = o.filter(F.col("o_orderkey") % 3 != 0).select(
        "o_orderkey", "o_custkey", price)
    app = o.filter((F.col("o_orderkey") % 3 == 0)
                   & (F.col("o_orderkey") % 4 == 0)).select(
        "o_orderkey", "o_custkey", price)
    ups = o.filter(F.col("o_orderkey") % 5 == 0).select(
        "o_orderkey", "o_custkey",
        (F.round(F.col("o_totalprice").cast("double"), 2) + 1).alias("price"))
    dels = o.filter(F.col("o_orderkey") % 7 == 0).select(
        "o_orderkey", "o_custkey", price)
    with tempfile.TemporaryDirectory() as tmp:
        t = Table.create(os.path.join(tmp, "t"), base.schema)
        t.append(spark, base, target_file_count=8)          # snapshot 1
        t.append(spark, app, target_file_count=2)           # snapshot 2
        merge_into(t, ups, ["o_orderkey"], spark,           # snapshot 3
                   strategy="merge-on-read")
        merge_into(t, dels, ["o_orderkey"], spark,          # snapshot 4
                   when_matched="delete", when_not_matched=None,
                   strategy="merge-on-read")
        out = t.changes(spark, from_snapshot_id=1)
        out = out.select("o_orderkey", "o_custkey", "price",
                         "_change_type", "_commit_snapshot_id")
        out = spark.createDataFrame(out.collect(), out.schema)
    return out


def q_rollback_scan(spark, sf):
    """ROLLBACK TO SNAPSHOT (round-5; Iceberg rollback_to_snapshot /
    Delta RESTORE parity): snapshot 1 = even orderkeys, snapshot 2
    appends the odd ones, snapshot 3 CoW-merge-deletes %3==0; rollback
    to snapshot 2 un-does the delete (metadata-only), then snapshot 4
    branches from it with %1000==7 rows at price+100. Final scan =
    every order plus the branch rows — the deleted keys restored."""
    from medalforge_lakehouse_data_spark.format.table import Table
    from medalforge_lakehouse_data_spark.operators.merge import merge_into

    o = _t(spark, sf, "orders")
    price = F.round(F.col("o_totalprice").cast("double"), 2).alias("price")
    base = o.filter(F.col("o_orderkey") % 2 == 0).select(
        "o_orderkey", "o_custkey", price)
    app = o.filter(F.col("o_orderkey") % 2 == 1).select(
        "o_orderkey", "o_custkey", price)
    dels = o.filter(F.col("o_orderkey") % 3 == 0).select(
        "o_orderkey", "o_custkey", price)
    branch = o.filter(F.col("o_orderkey") % 1000 == 7).select(
        "o_orderkey", "o_custkey",
        (F.round(F.col("o_totalprice").cast("double"), 2) + 100)
        .alias("price"))
    with tempfile.TemporaryDirectory() as tmp:
        t = Table.create(os.path.join(tmp, "t"), base.schema)
        t.append(spark, base, target_file_count=8)          # snapshot 1
        t.append(spark, app, target_file_count=4)           # snapshot 2
        merge_into(t, dels, ["o_orderkey"], spark,          # snapshot 3
                   when_matched="delete", when_not_matched=None)
        t.rollback_to(2)
        t.append(spark, branch, target_file_count=1)        # snapshot 4
        assert t.ancestry() == [1, 2, 4]
        out = t.scan(spark).select("o_orderkey", "o_custkey", "price")
        out = spark.createDataFrame(out.collect(), out.schema)
    return out


def q_incremental_before_images(spark, sf):
    """changes(delete_before_images=True): the MoR delete commit's FULL
    deleted rows, read from the parent snapshot pruned by the delete
    file's own key min/max manifest stats + broadcast-bounded left-semi
    join (round-5; Delta CDF before-image parity). Same deterministic
    history as q_incremental_scan; the change window covers only the
    snapshot-4 delete, so the result is the live-at-snapshot-3 version
    of every deleted key."""
    from medalforge_lakehouse_data_spark.format.table import Table
    from medalforge_lakehouse_data_spark.operators.merge import merge_into

    o = _t(spark, sf, "orders")
    price = F.round(F.col("o_totalprice").cast("double"), 2).alias("price")
    base = o.filter(F.col("o_orderkey") % 3 != 0).select(
        "o_orderkey", "o_custkey", price)
    app = o.filter((F.col("o_orderkey") % 3 == 0)
                   & (F.col("o_orderkey") % 4 == 0)).select(
        "o_orderkey", "o_custkey", price)
    ups = o.filter(F.col("o_orderkey") % 5 == 0).select(
        "o_orderkey", "o_custkey",
        (F.round(F.col("o_totalprice").cast("double"), 2) + 1).alias("price"))
    dels = o.filter(F.col("o_orderkey") % 7 == 0).select(
        "o_orderkey", "o_custkey", price)
    with tempfile.TemporaryDirectory() as tmp:
        t = Table.create(os.path.join(tmp, "t"), base.schema)
        t.append(spark, base, target_file_count=8)          # snapshot 1
        t.append(spark, app, target_file_count=2)           # snapshot 2
        merge_into(t, ups, ["o_orderkey"], spark,           # snapshot 3
                   strategy="merge-on-read")
        merge_into(t, dels, ["o_orderkey"], spark,          # snapshot 4
                   when_matched="delete", when_not_matched=None,
                   strategy="merge-on-read")
        out = t.changes(spark, from_snapshot_id=3,
                        delete_before_images=True)
        out = out.select("o_orderkey", "o_custkey", "price",
                         "_change_type", "_commit_snapshot_id")
        out = spark.createDataFrame(out.collect(), out.schema)
    return out


# ---------------------------------------------------------------------------
# Training-data ops over documents/embeddings


def q_docs_token_stats(spark, sf):
    from medalforge_lakehouse_data_spark.functions.text import (
        quality_features,
        token_count,
        whitespace_token_count,
    )

    d = _t(spark, sf, "documents")
    f = quality_features("text")
    return d.select(
        "doc_id",
        F.length("text").alias("n_chars_q"),
        whitespace_token_count("text").alias("n_tokens_ws"),
        token_count("text").alias("n_tokens_bpe"),
        F.round(f["punct_ratio"], 4).alias("punct_ratio"),
        F.round(f["mean_word_len"], 4).alias("mean_word_len"),
    )


def q_docs_lang_id(spark, sf):
    from medalforge_lakehouse_data_spark.functions.text import lang_id

    return _t(spark, sf, "documents").select(
        "doc_id", lang_id("text").alias("lang_pred")
    )


def q_docs_exact_dedup(spark, sf):
    from medalforge_lakehouse_data_spark.operators.dedup import exact_dedup

    d = _t(spark, sf, "documents").select("doc_id", "lang", "source")
    return exact_dedup(d, ["lang", "source"], order_by=["doc_id asc"])


def q_docs_ngram_jaccard(spark, sf):
    from medalforge_lakehouse_data_spark.operators.dedup import ngram_jaccard_pairs

    d = _t(spark, sf, "documents").select("doc_id", "text")
    pairs = ngram_jaccard_pairs(d, "doc_id", "text", n=3, threshold=0.18)
    return pairs.select("id_a", "id_b", F.round("jaccard", 4).alias("jaccard"))


def q_emb_near_dup(spark, sf):
    from medalforge_lakehouse_data_spark.operators.dedup import embedding_near_dup_pairs

    e = _t(spark, sf, "embeddings")
    planted = e.filter(F.col("vec_id") < 20).select(
        (F.col("vec_id") + 100000).alias("vec_id"), "embedding"
    )
    corpus = e.select("vec_id", "embedding").unionByName(planted)
    dbl = F.transform(F.col("embedding"), lambda x: x.cast("double"))
    corpus = corpus.withColumn("embedding", dbl)
    pairs = embedding_near_dup_pairs(corpus, "vec_id", "embedding", threshold=0.98)
    return pairs.select("id_a", "id_b")


def q_ann_topk(spark, sf):
    from medalforge_lakehouse_data_spark.operators.ann import brute_force_topk

    e = _t(spark, sf, "embeddings").withColumn(
        "embedding", F.transform("embedding", lambda x: x.cast("double"))
    )
    queries = e.filter(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("query_vec")
    )
    out = brute_force_topk(e, queries, k=10)
    return out.select("query_id", "vec_id", "rank")


def q_ann_ivf_topk(spark, sf):
    """IVF ANN (rows-only: centroids are engine-internal). Self-hit rank-1
    rows are emitted so the driver's row-count check is meaningful."""
    from medalforge_lakehouse_data_spark.operators.ann import ivf_topk

    e = _t(spark, sf, "embeddings").withColumn(
        "embedding", F.transform("embedding", lambda x: x.cast("double"))
    )
    queries = e.filter(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("query_vec")
    )
    out = ivf_topk(e, queries, k=10, nlist=8, n_probe=8)  # full probe = exact
    return out.select("query_id", "vec_id", "rank")


def _planted_corpus(spark, sf):
    """documents ∪ near-dup copies of docs 0-9 (text + ' tail')."""
    d = _t(spark, sf, "documents").select("doc_id", "text")
    planted = d.filter(F.col("doc_id") < 10).select(
        (F.col("doc_id") + 1_000_000).alias("doc_id"),
        F.concat(F.col("text"), F.lit(" tail")).alias("text"),
    )
    return d.unionByName(planted)


def q_docs_minhash_near_dup(spark, sf):
    """MinHash-LSH candidates → exact shingle-Jaccard verify ≥ 0.8.

    The verified output equals DuckDB's brute-force all-pairs Jaccard
    at this threshold: 24 bands × 4 rows, so a pair with true j ≥ 0.8
    misses the candidate set with prob (1-0.8⁴)^24 ≈ 3e-6 — and the
    est_jaccard pre-filter (0.5) sits > 7σ below j=0.8 with 96 hashes.
    (r=4 keeps band buckets selective; the earlier r=2 variant made
    ~half of all organic pairs candidates at sf0.1 and the candidate
    join dominated.) This makes the LSH path a full driver-oracle row
    instead of the round-1 rows-only check."""
    from medalforge_lakehouse_data_spark.operators.dedup import (
        minhash_near_dup_pairs,
        shingle_jaccard_verify,
    )

    corpus = _planted_corpus(spark, sf)
    cand = minhash_near_dup_pairs(
        corpus, "doc_id", "text", num_hashes=96, bands=24, threshold=0.5
    )
    ver = shingle_jaccard_verify(cand, corpus, "doc_id", "text", shingle_k=5)
    return ver.filter(F.col("jaccard") >= 0.8).select(
        "id_a", "id_b", F.round("jaccard", 4).alias("jaccard")
    )


def q_docs_simhash(spark, sf):
    """SimHash candidates (Hamming ≤ 7, pigeonhole-banded → full recall
    at that distance) → exact shingle-Jaccard verify ≥ 0.8. Same oracle
    as the MinHash path: two independent candidate generators must both
    reproduce DuckDB's brute-force answer."""
    from medalforge_lakehouse_data_spark.operators.dedup import (
        shingle_jaccard_verify,
        simhash_near_dup_pairs,
    )

    corpus = _planted_corpus(spark, sf)
    cand = simhash_near_dup_pairs(corpus, "doc_id", "text", max_hamming=7)
    ver = shingle_jaccard_verify(cand, corpus, "doc_id", "text", shingle_k=5)
    return ver.filter(F.col("jaccard") >= 0.8).select(
        "id_a", "id_b", F.round("jaccard", 4).alias("jaccard")
    )


def q_docs_fingerprint(spark, sf):
    """Content-fingerprint exact-dup pairs: reformatted copies (upper-
    cased, whitespace-mangled) of docs 0-9 must collide with their
    originals and nothing else. Oracle: normalized-text-equality pairs."""
    from medalforge_lakehouse_data_spark.functions.text import fingerprint

    d = _t(spark, sf, "documents").select("doc_id", "text")
    mangled = d.filter(F.col("doc_id") < 10).select(
        (F.col("doc_id") + 1_000_000).alias("doc_id"),
        F.concat(
            F.lit("  "), F.regexp_replace(F.upper(F.col("text")), " ", "   "), F.lit(" ")
        ).alias("text"),
    )
    corpus = d.unionByName(mangled)
    fp = corpus.select("doc_id", fingerprint("text").alias("fp"))
    return (
        fp.alias("a")
        .join(fp.alias("b"), "fp")
        .filter(F.col("a.doc_id") < F.col("b.doc_id"))
        .select(F.col("a.doc_id").alias("id_a"), F.col("b.doc_id").alias("id_b"))
    )


def q_docs_quality(spark, sf):
    from medalforge_lakehouse_data_spark.functions.text import quality_score

    return _t(spark, sf, "documents").select(
        "doc_id", F.round(quality_score("text"), 4).alias("quality")
    )


# ---------------------------------------------------------------------------
# Maintenance engine roundtrip (rows-only; invariants pytest-gated)


def q_maintenance_roundtrip(spark, sf):
    """Image table lifecycle: ingest many small files → bin-packing
    compaction → Hilbert clustering → MERGE → pruned scan. Emits per-fmt
    row/phash counts, which must equal the pre-maintenance table's."""
    from medalforge_lakehouse_data_spark.format.table import Table
    from medalforge_lakehouse_data_spark.maintenance import clustering, compaction
    from medalforge_lakehouse_data_spark.testing.datagen import IMAGES_SCHEMA, images_df

    with tempfile.TemporaryDirectory() as tmp:
        t = Table.create(os.path.join(tmp, "imgs"), IMAGES_SCHEMA, partition_spec=["fmt"])
        t.append(spark, images_df(spark, 1500, seed=11), target_file_count=12)
        compaction.compact(t, spark, target_file_bytes=32 * 1024 * 1024)
        clustering.cluster_rewrite(t, spark, columns=("phash", "w", "h"),
                                   curve="hilbert", target_file_bytes=512 * 1024)
        out = (
            t.scan(spark)
            .groupBy("fmt")
            .agg(F.count("*").alias("n"),
                 F.countDistinct("phash").alias("n_phash"),
                 F.countDistinct("image_id").alias("n_ids"))
            .orderBy("fmt")
        )
        out = spark.createDataFrame(out.collect(), out.schema)
    return out


def q_images_verification(spark, sf):
    """Codec gate: synthetic images decode and phash-verify end-to-end
    through Arrow UDFs (rows-only)."""
    from medalforge_lakehouse_data_spark.operators.multimodal import with_verification
    from medalforge_lakehouse_data_spark.testing.datagen import images_df

    df = images_df(spark, 500, seed=13)
    v = with_verification(df)
    return v.groupBy("fmt").agg(
        F.count("*").alias("n"),
        F.sum(F.when(F.col("_decodable"), 1).otherwise(0)).alias("n_decodable"),
        F.sum(F.when(F.col("_phash_check") == F.col("phash"), 1).otherwise(0)).alias("n_phash_ok"),
    ).orderBy("fmt")


# ---------------------------------------------------------------------------


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {
        "pricing_summary": q_pricing_summary,
        "shipping_priority": q_shipping_priority,
        "local_suppliers": q_local_suppliers,
        "top_orders_per_customer": q_top_orders_per_customer,
        "events_by_type": q_events_by_type,
        "events_windowed": q_events_windowed,
        "forecast_revenue": q_forecast_revenue,
        "semi_join_customers": q_semi_join_customers_with_orders,
        "anti_join_customers": q_anti_join_customers_without_orders,
        "having_big_orders": q_having_big_orders,
        "distinct_agg": q_distinct_agg,
        "avg_over_subquery": q_avg_over_subquery,
        "date_rollup_monthly": q_date_rollup_monthly,
        "rollup_status_priority": q_rollup_status_priority,
        "etl_trim": q_etl_trim,
        "etl_cast": q_etl_cast,
        "etl_normalize_dates": q_etl_normalize_dates,
        "etl_coerce_date": q_etl_coerce_date,
        "etl_clamp": q_etl_clamp,
        "etl_drop_if_null": q_etl_drop_if_null,
        "etl_dedup": q_etl_dedup,
        "etl_dedup_agg": q_etl_dedup_agg,
        "etl_union_by_name": q_etl_union_by_name,
        "check_unique_flag": q_check_unique_flag,
        "check_split": q_check_split,
        "merge_upsert": q_merge_upsert,
        "merge_delete": q_merge_delete,
        "merge_conditional": q_merge_conditional,
        "merge_mor_upsert": q_merge_mor_upsert,
        "merge_mor_delete": q_merge_mor_delete,
        "merge_mor_conditional": q_merge_mor_conditional,
        "incremental_scan": q_incremental_scan,
        "incremental_before_images": q_incremental_before_images,
        "rollback_scan": q_rollback_scan,
        "docs_token_stats": q_docs_token_stats,
        "docs_lang_id": q_docs_lang_id,
        "docs_exact_dedup": q_docs_exact_dedup,
        "docs_ngram_jaccard": q_docs_ngram_jaccard,
        "docs_quality": q_docs_quality,
        "emb_near_dup": q_emb_near_dup,
        "ann_topk": q_ann_topk,
        "ann_ivf_topk": q_ann_ivf_topk,
        "docs_minhash_near_dup": q_docs_minhash_near_dup,
        "docs_simhash": q_docs_simhash,
        "docs_fingerprint": q_docs_fingerprint,
        "maintenance_roundtrip": q_maintenance_roundtrip,
        "images_verification": q_images_verification,
    }


# Ground truth for both LSH near-dup paths: brute-force all-pairs exact
# 5-word-shingle Jaccard >= 0.8 over documents ∪ planted ' tail' copies.
_SHINGLE_JACCARD_ORACLE = r"""
    WITH corpus AS (
      SELECT doc_id, text FROM documents
      UNION ALL
      SELECT doc_id + 1000000 AS doc_id, text || ' tail' AS text
      FROM documents WHERE doc_id < 10),
    w AS (SELECT doc_id, string_split_regex(lower(trim(text)), '\s+') AS w
          FROM corpus),
    g AS (SELECT doc_id,
                 list_distinct(CASE WHEN len(w) >= 5 THEN
                   list_transform(generate_series(1, len(w)-4),
                                  i -> array_to_string(w[i:i+4], ' '))
                   ELSE [array_to_string(w, ' ')] END) AS grams
          FROM w),
    pairs AS (
      SELECT a.doc_id AS id_a, b.doc_id AS id_b,
             len(list_intersect(a.grams, b.grams)) AS common,
             len(a.grams) AS sa, len(b.grams) AS sb
      FROM g a, g b WHERE a.doc_id < b.doc_id)
    SELECT id_a, id_b, round(common / (sa + sb - common), 4) AS jaccard
    FROM pairs WHERE common / (sa + sb - common) >= 0.8
"""


_STOPWORD_VALUES = """(values
    ('de', 0, ['der','die','und','das','ist','von','mit','den','im','ein']),
    ('en', 1, ['the','and','is','of','to','a','in','that','it','for']),
    ('es', 2, ['el','la','de','que','y','en','un','es','se','no']),
    ('fr', 3, ['le','la','de','et','les','des','en','un','du','une']),
    ('pt', 4, ['o','a','de','que','e','do','da','em','um','para'])
  ) l(lang, rank, sw)"""


def oracle_sql() -> dict[str, str]:
    out = {
        "pricing_summary": """
            SELECT l_returnflag, l_linestatus,
                   round(cast(sum(cast(l_quantity as decimal(18,2))) as double), 2) AS sum_qty,
                   round(cast(sum(cast(l_extendedprice as decimal(18,2))) as double), 2) AS sum_base_price,
                   round(cast(sum(cast(cast(l_extendedprice as decimal(18,2))
                       * (cast(1 as decimal(18,2)) - cast(l_discount as decimal(18,2)))
                       as decimal(18,4))) as double), 4) AS sum_disc_price,
                   count(*) AS count_order
            FROM lineitem
            WHERE l_shipdate <= timestamp '1998-09-02'
            GROUP BY l_returnflag, l_linestatus
        """,
        "shipping_priority": """
            SELECT l_orderkey, o_orderdate,
                   round(cast(revenue as double), 4) AS revenue
            FROM (
              SELECT l_orderkey, o_orderdate,
                     sum(cast(cast(l_extendedprice as decimal(18,2))
                         * (cast(1 as decimal(18,2)) - cast(l_discount as decimal(18,2)))
                         as decimal(18,4))) AS revenue
              FROM lineitem JOIN orders ON l_orderkey = o_orderkey
              JOIN customer ON o_custkey = c_custkey
              WHERE c_mktsegment = 'BUILDING'
              GROUP BY l_orderkey, o_orderdate
              ORDER BY revenue DESC, l_orderkey LIMIT 10)
        """,
        "local_suppliers": """
            SELECT n_name,
                   round(cast(sum(cast(cast(l_extendedprice as decimal(18,2))
                       * (cast(1 as decimal(18,2)) - cast(l_discount as decimal(18,2)))
                       as decimal(18,4))) as double), 4) AS revenue,
                   count(*) AS n_items
            FROM lineitem JOIN supplier ON l_suppkey = s_suppkey
            JOIN nation ON s_nationkey = n_nationkey
            JOIN region ON n_regionkey = r_regionkey
            WHERE r_name = 'ASIA'
            GROUP BY n_name
        """,
        "top_orders_per_customer": """
            SELECT o_custkey, o_orderkey, rk FROM (
              SELECT o_custkey, o_orderkey,
                     row_number() OVER (PARTITION BY o_custkey
                                        ORDER BY o_totalprice DESC, o_orderkey) AS rk
              FROM orders) WHERE rk <= 3
        """,
        "events_by_type": """
            SELECT event_type, count(*) AS n,
                   round(cast(sum(cast(value as decimal(18,4))) as double), 4) AS sum_value,
                   count(distinct user_id) AS n_users
            FROM events GROUP BY event_type
        """,
        "events_windowed": """
            SELECT time_bucket(INTERVAL '1 hour', ts) AS w_start,
                   event_type, count(*) AS n,
                   round(cast(sum(cast(value as decimal(18,4))) as double), 4) AS sum_value
            FROM events GROUP BY 1, 2
        """,
        "forecast_revenue": """
            SELECT round(cast(sum(cast(cast(l_extendedprice as decimal(18,2))
                       * cast(l_discount as decimal(18,2)) as decimal(18,4))) as double), 4) AS revenue,
                   count(*) AS n
            FROM lineitem
            WHERE l_shipdate >= timestamp '1995-01-01'
              AND l_shipdate <  timestamp '1996-01-01'
              AND l_discount BETWEEN 0.03 AND 0.07
              AND l_quantity < 24
        """,
        "semi_join_customers": """
            SELECT c_custkey, c_mktsegment FROM customer
            WHERE c_custkey IN (SELECT o_custkey FROM orders)
        """,
        "anti_join_customers": """
            SELECT c_custkey, c_name FROM customer
            WHERE c_custkey NOT IN (SELECT o_custkey FROM orders
                                    WHERE o_orderstatus = 'F')
        """,
        "having_big_orders": """
            SELECT l_orderkey,
                   round(cast(sum(cast(l_quantity as decimal(18,2))) as double), 2) AS total_qty
            FROM lineitem GROUP BY l_orderkey
            HAVING sum(cast(l_quantity as decimal(18,2))) > 150
        """,
        "distinct_agg": """
            SELECT o_orderstatus, count(distinct o_custkey) AS n_cust,
                   count(distinct o_orderpriority) AS n_prio, count(*) AS n
            FROM orders GROUP BY o_orderstatus
        """,
        "avg_over_subquery": """
            SELECT o_orderkey, o_totalprice FROM orders
            WHERE o_totalprice > (SELECT avg(cast(o_totalprice as decimal(18,2)))
                                  FROM orders) * 1.5
        """,
        "rollup_status_priority": """
            SELECT coalesce(o_orderstatus, 'ALL') AS status,
                   coalesce(o_orderpriority, 'ALL') AS priority,
                   count(*) AS n,
                   round(cast(sum(cast(o_totalprice as decimal(18,2))) as double), 2) AS total
            FROM orders GROUP BY ROLLUP (o_orderstatus, o_orderpriority)
        """,
        "date_rollup_monthly": """
            SELECT year(o_orderdate) AS ano, month(o_orderdate) AS mes,
                   count(*) AS n_orders,
                   round(cast(sum(cast(o_totalprice as decimal(18,2))) as double), 2) AS total
            FROM orders GROUP BY 1, 2
        """,
        "etl_trim": """
            SELECT c_custkey, trim('  ' || c_name || '  ') AS c_name FROM customer
        """,
        "etl_cast": """
            SELECT l_orderkey, l_linenumber,
                   cast(l_quantity as int) AS qty_int,
                   cast(cast(l_shipdate as varchar) as date) AS ship_d
            FROM lineitem
        """,
        "etl_normalize_dates": """
            SELECT event_id, cast(strftime(ts, '%Y-%m-%d') as date) AS d,
                   year(ts) AS ano, month(ts) AS mes
            FROM events
        """,
        "etl_coerce_date": """
            SELECT o_orderkey, cast(o_orderdate as date) AS od FROM orders
        """,
        "etl_clamp": """
            SELECT l_orderkey, l_linenumber,
                   least(greatest(l_quantity, 10.0), 40.0) AS qty
            FROM lineitem
        """,
        "etl_drop_if_null": """
            SELECT event_id, value AS v FROM events WHERE value > 0
        """,
        "etl_dedup": """
            SELECT l_orderkey, l_linenumber FROM (
              SELECT l_orderkey, l_linenumber,
                     row_number() OVER (PARTITION BY l_orderkey
                                        ORDER BY l_linenumber DESC) AS rn
              FROM lineitem) WHERE rn = 1
        """,
        "etl_dedup_agg": """
            SELECT l_orderkey, max(l_linenumber) AS l_linenumber
            FROM lineitem GROUP BY l_orderkey
        """,
        "etl_union_by_name": """
            SELECT o_orderkey, o_totalprice, NULL AS o_orderstatus FROM orders
            UNION ALL
            SELECT o_orderkey + 10000000 AS o_orderkey, NULL, o_orderstatus FROM orders
        """,
        "check_unique_flag": """
            SELECT l_orderkey, l_linenumber,
                   count(*) OVER (PARTITION BY l_orderkey) > 1 AS is_dup
            FROM lineitem
        """,
        "check_split": """
            SELECT o_orderkey,
                   ((o_totalprice < 1000.0 OR o_totalprice > 400000.0)::int
                    + (NOT coalesce(o_orderstatus <> 'X', false))::int) AS n_errors
            FROM orders
            WHERE (o_totalprice < 1000.0 OR o_totalprice > 400000.0)
               OR NOT coalesce(o_orderstatus <> 'X', false)
        """,
        "merge_upsert": """
            WITH target AS (
              SELECT o_orderkey, o_custkey,
                     cast(o_totalprice as decimal(18,2)) AS price
              FROM orders WHERE o_orderkey % 2 = 0),
            source AS (
              SELECT o_orderkey, o_custkey,
                     cast(cast(o_totalprice as decimal(18,2))
                          + cast(1 as decimal(18,2)) as decimal(18,2)) AS price
              FROM orders WHERE o_orderkey % 3 = 0),
            merged AS (
              SELECT * FROM source
              UNION ALL
              SELECT t.* FROM target t ANTI JOIN source s ON t.o_orderkey = s.o_orderkey)
            SELECT o_orderkey, o_custkey, round(cast(price as double), 2) AS price
            FROM merged
        """,
        "merge_conditional": """
            WITH target AS (
              SELECT o_orderkey, o_custkey,
                     cast(o_totalprice as decimal(18,2)) AS price
              FROM orders WHERE o_orderkey % 2 = 0),
            source AS (
              SELECT o_orderkey, o_custkey,
                     cast(cast(o_totalprice as decimal(18,2))
                          + cast(1 as decimal(18,2)) as decimal(18,2)) AS price
              FROM orders WHERE o_orderkey % 3 = 0)
            SELECT t.o_orderkey, t.o_custkey,
                   round(cast(CASE WHEN s.o_orderkey IS NOT NULL
                                    AND s.o_custkey % 2 = 0
                              THEN s.price ELSE t.price END as double), 2) AS price
            FROM target t LEFT JOIN source s ON t.o_orderkey = s.o_orderkey
            UNION ALL
            SELECT s.o_orderkey, s.o_custkey, round(cast(s.price as double), 2) AS price
            FROM source s ANTI JOIN target t ON s.o_orderkey = t.o_orderkey
        """,
        "merge_delete": """
            WITH target AS (
              SELECT o_orderkey, o_custkey,
                     cast(o_totalprice as decimal(18,2)) AS price
              FROM orders WHERE o_orderkey % 2 = 0),
            source AS (SELECT o_orderkey FROM orders WHERE o_orderkey % 3 = 0)
            SELECT t.o_orderkey, t.o_custkey, round(cast(t.price as double), 2) AS price
            FROM target t ANTI JOIN source s ON t.o_orderkey = s.o_orderkey
        """,
        "incremental_scan": """
            SELECT o_orderkey, o_custkey,
                   round(cast(o_totalprice as double), 2) AS price,
                   'insert' AS _change_type,
                   cast(2 as bigint) AS _commit_snapshot_id
            FROM orders WHERE o_orderkey % 3 = 0 AND o_orderkey % 4 = 0
            UNION ALL
            SELECT o_orderkey, cast(NULL as bigint), cast(NULL as double),
                   'delete', cast(3 as bigint)
            FROM orders WHERE o_orderkey % 5 = 0
            UNION ALL
            SELECT o_orderkey, o_custkey,
                   round(cast(o_totalprice as double), 2) + 1,
                   'insert', cast(3 as bigint)
            FROM orders WHERE o_orderkey % 5 = 0
            UNION ALL
            SELECT o_orderkey, cast(NULL as bigint), cast(NULL as double),
                   'delete', cast(4 as bigint)
            FROM orders WHERE o_orderkey % 7 = 0
        """,
        "incremental_before_images": """
            SELECT o_orderkey, o_custkey,
                   CASE WHEN o_orderkey % 5 = 0
                        THEN round(cast(o_totalprice as double), 2) + 1
                        ELSE round(cast(o_totalprice as double), 2)
                   END AS price,
                   'delete' AS _change_type,
                   cast(4 as bigint) AS _commit_snapshot_id
            FROM orders
            WHERE o_orderkey % 7 = 0
              AND (o_orderkey % 3 != 0 OR o_orderkey % 4 = 0
                   OR o_orderkey % 5 = 0)
        """,
        "rollback_scan": """
            SELECT o_orderkey, o_custkey,
                   round(cast(o_totalprice as double), 2) AS price
            FROM orders
            UNION ALL
            SELECT o_orderkey, o_custkey,
                   round(cast(o_totalprice as double), 2) + 100 AS price
            FROM orders WHERE o_orderkey % 1000 = 7
        """,
        "docs_token_stats": r"""
            WITH t AS (
              SELECT doc_id, text, length(text) AS n_chars_q,
                     string_split_regex(trim(text), '\s+') AS toks
              FROM documents)
            SELECT doc_id, n_chars_q,
                   len(toks) AS n_tokens_ws,
                   len(regexp_extract_all(text, '[A-Za-z]+|[0-9]+|[^\sA-Za-z0-9]')) AS n_tokens_bpe,
                   round((n_chars_q - length(regexp_replace(text, '[^\w\s]', '', 'g')))
                         / greatest(n_chars_q, 1), 4) AS punct_ratio,
                   round(length(regexp_replace(text, '\s+', '', 'g'))
                         / greatest(len(toks), 1), 4) AS mean_word_len
            FROM t
        """,
        "docs_lang_id": rf"""
            WITH words AS (
              SELECT doc_id,
                     list_distinct(string_split_regex(lower(trim(text)),
                                   '[\s[:punct:]]+')) AS w
              FROM documents),
            hits AS (
              SELECT doc_id, l.lang, l.rank, len(list_intersect(w, l.sw)) AS h
              FROM words, {_STOPWORD_VALUES})
            SELECT doc_id,
                   CASE WHEN max(h) >= 1 THEN arg_max(lang, h*10 + rank)
                        ELSE 'und' END AS lang_pred
            FROM hits GROUP BY doc_id
        """,
        "docs_exact_dedup": """
            SELECT doc_id, lang, source FROM (
              SELECT doc_id, lang, source,
                     row_number() OVER (PARTITION BY lang, source
                                        ORDER BY doc_id) AS rn
              FROM documents) WHERE rn = 1
        """,
        "docs_ngram_jaccard": r"""
            WITH g AS (
              SELECT doc_id,
                     list_distinct(CASE WHEN len(w) >= 3 THEN
                       list_transform(generate_series(1, len(w)-2),
                                      i -> array_to_string(w[i:i+2], ' '))
                       ELSE [array_to_string(w, ' ')] END) AS grams
              FROM (SELECT doc_id,
                           string_split_regex(lower(trim(text)), '\s+') AS w
                    FROM documents)),
            pairs AS (
              SELECT a.doc_id AS id_a, b.doc_id AS id_b,
                     len(list_intersect(a.grams, b.grams)) AS common,
                     len(a.grams) AS sa, len(b.grams) AS sb
              FROM g a, g b WHERE a.doc_id < b.doc_id)
            SELECT id_a, id_b,
                   round(common / (sa + sb - common), 4) AS jaccard
            FROM pairs WHERE common / (sa + sb - common) >= 0.18
        """,
        "docs_quality": r"""
            WITH f AS (
              SELECT doc_id,
                     len(string_split_regex(trim(text), '\s+')) AS n_tokens,
                     length(regexp_replace(text, '\s+', '', 'g'))
                       / greatest(len(string_split_regex(trim(text), '\s+')), 1) AS mwl,
                     (length(text) - length(regexp_replace(text, '[^\w\s]', '', 'g')))
                       / greatest(length(text), 1) AS punct_ratio,
                     len(list_intersect(
                           list_distinct(string_split_regex(lower(trim(text)), '[\s[:punct:]]+')),
                           ['the','and','is','of','to','a','in','that','it','for']))
                       / greatest(len(list_distinct(
                           string_split_regex(lower(trim(text)), '[\s[:punct:]]+'))), 1)
                       AS stopword_ratio
              FROM documents)
            SELECT doc_id,
                   round(((CASE WHEN n_tokens BETWEEN 5 AND 100000 THEN 1.0 ELSE 0.2 END)::DOUBLE * 0.3::DOUBLE
                       + (CASE WHEN mwl BETWEEN 2 AND 12 THEN 1.0 ELSE 0.3 END)::DOUBLE * 0.2::DOUBLE
                       + (CASE WHEN punct_ratio <= 0.3 THEN 1.0 ELSE 0.4 END)::DOUBLE * 0.2::DOUBLE
                       + (CASE WHEN stopword_ratio >= 0.01 THEN 1.0 ELSE 0.5 END)::DOUBLE * 0.3::DOUBLE)::DOUBLE, 4)::DOUBLE
                     AS quality
            FROM f
        """,
        "emb_near_dup": """
            WITH corpus AS (
              SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings
              UNION ALL
              SELECT vec_id + 100000 AS vec_id, embedding::DOUBLE[] AS v
              FROM embeddings WHERE vec_id < 20)
            SELECT a.vec_id AS id_a, b.vec_id AS id_b
            FROM corpus a, corpus b
            WHERE a.vec_id < b.vec_id
              AND list_cosine_similarity(a.v, b.v) >= 0.98
        """,
        "ann_topk": """
            WITH q AS (SELECT vec_id AS query_id, embedding::DOUBLE[] AS qv
                       FROM embeddings WHERE vec_id < 5),
            scored AS (
              SELECT q.query_id, e.vec_id,
                     list_cosine_similarity(e.embedding::DOUBLE[], q.qv) AS c
              FROM embeddings e, q)
            SELECT query_id, vec_id, rank FROM (
              SELECT query_id, vec_id,
                     row_number() OVER (PARTITION BY query_id
                                        ORDER BY c DESC, vec_id) AS rank
              FROM scored) WHERE rank <= 10
        """,
        "ann_ivf_topk": """
            WITH q AS (SELECT vec_id AS query_id, embedding::DOUBLE[] AS qv
                       FROM embeddings WHERE vec_id < 5),
            scored AS (
              SELECT q.query_id, e.vec_id,
                     list_cosine_similarity(e.embedding::DOUBLE[], q.qv) AS c
              FROM embeddings e, q)
            SELECT query_id, vec_id, rank FROM (
              SELECT query_id, vec_id,
                     row_number() OVER (PARTITION BY query_id
                                        ORDER BY c DESC, vec_id) AS rank
              FROM scored) WHERE rank <= 10
        """,
        # LSH paths: verified exact shingle-Jaccard output == DuckDB
        # brute-force all-pairs at the same threshold (recall argument
        # in the query docstrings). Both candidate generators share one
        # ground-truth oracle.
        "docs_minhash_near_dup": _SHINGLE_JACCARD_ORACLE,
        "docs_simhash": _SHINGLE_JACCARD_ORACLE,
        "docs_fingerprint": r"""
            WITH corpus AS (
              SELECT doc_id,
                     regexp_replace(lower(trim(text)), '\s+', ' ', 'g') AS norm
              FROM documents
              UNION ALL
              SELECT doc_id + 1000000 AS doc_id,
                     regexp_replace(lower(trim(text)), '\s+', ' ', 'g') AS norm
              FROM documents WHERE doc_id < 10)
            SELECT a.doc_id AS id_a, b.doc_id AS id_b
            FROM corpus a JOIN corpus b
              ON a.norm = b.norm AND a.doc_id < b.doc_id
        """,
        # rows-only (engine-internal table format / codec):
        # maintenance_roundtrip, images_verification
    }
    # merge-on-read must land on the SAME row set as copy-on-write —
    # identical oracles make the driver check that equivalence directly
    out["merge_mor_upsert"] = out["merge_upsert"]
    out["merge_mor_delete"] = out["merge_delete"]
    out["merge_mor_conditional"] = out["merge_conditional"]
    return out
