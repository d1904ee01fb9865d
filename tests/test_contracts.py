"""Contract models: bronze JSON + silver YAML validation rules
(reference parity: test_models.py / test_data_contract_manager.py /
test_silver.py patterns)."""

from __future__ import annotations

import pytest
from pyspark.sql.types import ArrayType, DecimalType, StringType, StructType

from medalforge_lakehouse_data_spark.plans.bronze_contract import (
    ContractError,
    load_bronze_contract,
    parse_dtype,
)
from medalforge_lakehouse_data_spark.plans.catalog import split_fqn
from medalforge_lakehouse_data_spark.plans.silver_contract import (
    load_silver_contract,
)
from medalforge_lakehouse_data_spark.plans.silver_contract import (
    ContractError as SilverError,
)

BRONZE = {
    "version": "1.0",
    "catalog": "bronze",
    "schema": "sales",
    "table": "orders",
    "columns": [
        {"name": "id", "dtype": "string", "comment": "Order ID"},
        {"name": "created_at", "dtype": "timestamp"},
        {"name": "amount", "dtype": "decimal(18,2)"},
        {"name": "tags", "dtype": "array<string>"},
        {"name": "meta", "dtype": "struct<source:string, ts:timestamp>"},
    ],
    "partitions": ["created_at"],
    "source": {"format": "json", "options": {"multiline": True}},
}


def test_bronze_contract_parses():
    c = load_bronze_contract(BRONZE)
    assert c.fqn == "bronze.sales.orders"
    s = c.schema_struct
    assert isinstance(s["amount"].dataType, DecimalType)
    assert isinstance(s["tags"].dataType, ArrayType)
    assert c.effective_partitions == ["created_at", "ingestion_date"]
    audit = c.schema_with_audit.fieldNames()
    assert "ingestion_ts" in audit and "ingestion_date" in audit
    payload = c.as_ingestion_payload()
    assert payload["format"] == "json"
    assert payload["column_comments"]["id"] == "Order ID"


def test_dtype_aliases_and_fallback():
    assert parse_dtype("bigint").typeName() == "long"
    assert parse_dtype("float64").typeName() == "double"
    assert parse_dtype("decimal(10,3)") == DecimalType(10, 3)
    # silent fallback to string (reference :213-214)
    assert parse_dtype("no_such_type") == StringType()


@pytest.mark.parametrize(
    "mutate,msg",
    [
        (lambda d: d["columns"].append({"name": "id", "dtype": "string"}), "duplicate"),
        (lambda d: d.update(partitions=["tags"]), "complex"),
        (lambda d: d.update(partitions=["ghost"]), "not in schema"),
        (lambda d: d.update(columns=[]), "empty"),
        (lambda d: d.update(table="1bad"), "identifier"),
        (lambda d: d["columns"].append({"name": "bad name", "dtype": "string"}), "column name"),
    ],
)
def test_bronze_contract_rejections(mutate, msg):
    import copy

    d = copy.deepcopy(BRONZE)
    mutate(d)
    with pytest.raises(ContractError, match=msg):
        load_bronze_contract(d)


def test_txt_requires_delimiter():
    import copy

    d = copy.deepcopy(BRONZE)
    d["source"] = {"format": "txt", "options": {}}
    d["partitions"] = []
    with pytest.raises(ContractError, match="delimiter"):
        load_bronze_contract(d)


def test_csv_reader_defaults_merged():
    import copy

    d = copy.deepcopy(BRONZE)
    d["source"] = {"format": "csv", "options": {"delimiter": ";"}}
    c = load_bronze_contract(d)
    opts = c.effective_reader_options
    assert opts["delimiter"] == ";" and opts["header"] == "true"


SILVER_YAML = """
version: "1.0"
source:
  bronze_table: "bronze.sales.orders"
target:
  catalog: "silver"
  schema: "sales"
  table: "sales_clean"
  write:
    mode: "merge"
    merge_keys: ["id"]
    partition_by: ["ano", "mes"]
    zorder_by: ["created_at"]
dqx:
  criticality_default: "error"
  checks:
    - name: not_null_id
      check: {function: not_null, arguments: {col_name: "id"}}
    - name: amount_range
      check: {function: is_in_range, arguments: {column: amount, min_limit: 0, max_limit: 100000}}
etl:
  standard:
    - method: normalize_dates
      args: {columns: ["created_at"], format: "yyyy-MM-dd", project_ano_mes: true}
quarantine:
  remediate:
    - method: coerce_date
      args:
        column: created_at
        from_patterns: ["M/d/yyyy", "yyyy-MM-dd"]
        to_format: "yyyy-MM-dd"
  sink:
    table: "monitoring.quarantine.sales"
customs:
  allow: true
  registry:
    - name: discount_rule
      module: medalforge_lakehouse_data_spark.customs.sample_rules
      method: apply_discount_if_high_value
      args_schema:
        percent: {type: number, required: true, min: 0, max: 50}
        threshold: {type: number, required: true, min: 0}
  use_in:
    - stage: standard
      method: discount_rule
      args: {percent: 10, threshold: 1000}
"""


def test_silver_contract_parses():
    c = load_silver_contract(SILVER_YAML)
    assert c.target.fqn == "silver.sales.sales_clean"
    assert c.target.write.merge_keys == ["id"]
    # alias normalization happened at load time
    assert c.checks[0]["check"]["function"] == "is_not_null"
    assert c.checks[0]["check"]["arguments"] == {"column": "id"}
    # step-arg aliases mapped to engine names
    assert c.etl_standard[0]["args"]["derive_year_month"] is True
    assert c.remediate[0]["args"]["formats"][0] == "M/d/yyyy"
    assert c.customs_registry[0].name == "discount_rule"


def test_silver_version_gate_and_extra_forbid():
    with pytest.raises(SilverError, match="version"):
        load_silver_contract(SILVER_YAML.replace('version: "1.0"', 'version: "2.0"'))
    with pytest.raises(SilverError, match="unknown top-level"):
        load_silver_contract(SILVER_YAML + "\nrogue_key: 1\n")


def test_merge_mode_requires_keys():
    bad = SILVER_YAML.replace('merge_keys: ["id"]', "merge_keys: []")
    with pytest.raises(SilverError, match="merge_keys"):
        load_silver_contract(bad)


def test_split_fqn():
    assert split_fqn("a.b.c") == ("a", "b", "c")
    assert split_fqn("b.c", default_catalog="main") == ("main", "b", "c")
    with pytest.raises(ValueError):
        split_fqn("a.b.c.d")
    with pytest.raises(ValueError):
        split_fqn("a.1bad.c")
