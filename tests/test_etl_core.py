"""ETL core steps — behavioral parity with the reference's test_core.py
(trim/cast/date/dedup/coerce/clamp/drop, missing=error|skip policies,
dedup-with-absent-key ⇒ global window)."""

from __future__ import annotations

import datetime

import pytest
from pyspark.sql import functions as F

from medalforge_lakehouse_data_spark.operators import etl_core as core


@pytest.fixture()
def df(spark):
    return spark.createDataFrame(
        [
            ("  a  ", "1", "3/14/2021", 50.0, 1),
            ("b", "2", "2021-03-15", -10.0, 2),
            ("b", "x", None, 200000.0, 3),
        ],
        ["name", "num", "created_at", "amount", "priority"],
    )


def test_trim(df):
    out = core.trim_columns(df, ["name"]).select("name").collect()
    assert [r.name for r in out] == ["a", "b", "b"]


def test_trim_missing_error_and_skip(df):
    with pytest.raises(core.MissingColumnsError):
        core.trim_columns(df, ["nope"])
    assert core.trim_columns(df, ["nope"], missing="skip").count() == 3


def test_cast(df):
    out = core.cast_columns(df, {"num": "int"})
    assert out.schema["num"].dataType.typeName() == "integer"
    vals = [r.num for r in out.orderBy("priority").collect()]
    assert vals == [1, 2, None]


def test_normalize_dates_derives_ano_mes(spark):
    df = spark.createDataFrame([("2021-03-15",)], ["d"])
    out = core.normalize_dates(df, ["d"], format="yyyy-MM-dd")
    r = out.collect()[0]
    assert r.d == datetime.date(2021, 3, 15) and r.ano == 2021 and r.mes == 3


def test_deduplicate_window(df):
    out = core.deduplicate(df, ["name"], ["priority desc"])
    rows = {r.name: r.priority for r in out.collect()}
    assert rows == {"  a  ": 1, "b": 3}


def test_deduplicate_agg_strategy_matches_window(spark):
    df = spark.createDataFrame(
        [(i % 7, i, f"v{i}") for i in range(100)], ["k", "ord", "v"]
    )
    w = core.deduplicate(df, ["k"], ["ord desc"]).orderBy("k").collect()
    a = core.deduplicate(df, ["k"], ["ord desc"], strategy="agg").orderBy("k").collect()
    assert [(r.k, r.ord, r.v) for r in w] == [(r.k, r.ord, r.v) for r in a]


def test_deduplicate_absent_key_global_window(df):
    # reference behavior (test_core.py:175-184): all keys absent + skip ⇒
    # ONE surviving row (global window)
    out = core.deduplicate(df, ["ghost"], ["priority desc"], missing="skip")
    assert out.count() == 1 and out.collect()[0].priority == 3


def test_deduplicate_empty_order_by_rejected(df):
    with pytest.raises(ValueError):
        core.deduplicate(df, ["name"], [])


def test_coerce_date_multiformat(df):
    out = core.coerce_date(df, "created_at", ["M/d/yyyy", "yyyy-MM-dd"])
    vals = [r.created_at for r in out.orderBy("priority").collect()]
    assert vals == [datetime.date(2021, 3, 14), datetime.date(2021, 3, 15), None]


def test_coerce_date_to_format_string(df):
    out = core.coerce_date(df, "created_at", ["M/d/yyyy", "yyyy-MM-dd"], to_format="yyyy-MM-dd")
    vals = [r.created_at for r in out.orderBy("priority").collect()]
    assert vals == ["2021-03-14", "2021-03-15", None]


def test_clamp_range(df):
    out = core.clamp_range(df, "amount", min=0, max=100000)
    vals = [r.amount for r in out.orderBy("priority").collect()]
    assert vals == [50.0, 0.0, 100000.0]


def test_clamp_one_sided_and_null_preserved(spark):
    df = spark.createDataFrame([(None,), (5.0,), (-3.0,)], ["x"])
    out = core.clamp_range(df, "x", min=0)
    assert sorted([r.x for r in out.collect()], key=lambda v: (v is None, v)) == [-0.0, 5.0, None] or \
           [r.x for r in out.collect()].count(None) == 1


def test_drop_if_null(df):
    out = core.drop_if_null(df, ["created_at"])
    assert out.count() == 2


def test_run_steps_order(df):
    out = core.run_steps(
        df,
        [
            {"method": "trim_columns", "args": {"columns": ["name"]}},
            {"method": "deduplicate", "args": {"keys": ["name"], "order_by": ["priority desc"]}},
        ],
    )
    rows = {r.name: r.priority for r in out.collect()}
    assert rows == {"a": 1, "b": 3}


def test_strip_technical_columns(spark):
    df = spark.createDataFrame([(1, "e", "w", "x")], ["id", "_errors", "_warnings", "_dqx_info"])
    assert core.strip_technical_columns(df).columns == ["id"]


def test_audit_columns(spark):
    df = spark.createDataFrame([(1,)], ["id"])
    out = core.add_audit_columns(df)
    r = out.collect()[0]
    assert r.ingestion_date == r.ingestion_ts.date()
