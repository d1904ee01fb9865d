"""Customs plugin layer: loader allowlist/mark/signature security, args
DSL, staged runner (reference: test_loader/test_runner/test_args/test_sdk)."""

from __future__ import annotations

import pytest

from medalforge_lakehouse_data_spark.customs.args import ArgsError, validate_args
from medalforge_lakehouse_data_spark.customs.loader import CustomLoadError, load_custom
from medalforge_lakehouse_data_spark.customs.runner import CustomsRunner
from medalforge_lakehouse_data_spark.plans.silver_contract import CustomSpec

MOD = "medalforge_lakehouse_data_spark.customs.sample_rules"


def test_load_custom_ok():
    fn = load_custom(MOD, "apply_discount_if_high_value")
    assert callable(fn)


def test_loader_rejects_outside_allowlist():
    with pytest.raises(CustomLoadError, match="allowlist"):
        load_custom("os", "system")


def test_loader_rejects_unmarked():
    # `custom` (the decorator itself) is importable but not marked
    with pytest.raises(CustomLoadError, match="not marked"):
        load_custom("medalforge_lakehouse_data_spark.customs.sdk", "custom")


def test_loader_rejects_missing():
    with pytest.raises(CustomLoadError, match="not found"):
        load_custom(MOD, "nope")


def test_args_validation():
    schema = {
        "percent": {"type": "number", "required": True, "min": 0, "max": 50},
        "label": {"type": "string", "default": "x"},
        "n": {"type": "integer", "min": 1},
        "flag": {"type": "boolean"},
        "mode": {"type": "string", "enum": ["a", "b"]},
    }
    out = validate_args(schema, {"percent": 10, "n": 3, "flag": "true", "mode": "a"})
    assert out == {"percent": 10.0, "label": "x", "n": 3, "flag": True, "mode": "a"}
    with pytest.raises(ArgsError, match="unexpected"):
        validate_args(schema, {"percent": 1, "rogue": 1})
    with pytest.raises(ArgsError, match="missing required"):
        validate_args(schema, {})
    with pytest.raises(ArgsError, match="above max"):
        validate_args(schema, {"percent": 99})
    with pytest.raises(ArgsError, match="expected integer"):
        validate_args(schema, {"percent": 1, "n": 2.5})
    with pytest.raises(ArgsError, match="not in enum"):
        validate_args(schema, {"percent": 1, "mode": "z"})


def test_runner_applies_discount(spark):
    df = spark.createDataFrame([(1, 500.0), (2, 2000.0)], ["id", "amount"])
    spec = CustomSpec(
        name="discount_rule",
        module=MOD,
        method="apply_discount_if_high_value",
        args_schema={
            "percent": {"type": "number", "required": True, "min": 0, "max": 50},
            "threshold": {"type": "number", "required": True, "min": 0},
        },
    )
    runner = CustomsRunner([spec])
    out = runner.apply_stage(
        df, "standard",
        [{"stage": "standard", "method": "discount_rule",
          "args": {"percent": 10, "threshold": 1000}}],
    )
    rows = {r.id: (r.amount, r.discount_applied) for r in out.collect()}
    assert rows[1] == (500.0, False)
    assert rows[2] == (1800.0, True)
    # idempotency guard: re-apply does not double-discount
    out2 = runner.apply_stage(
        out, "standard",
        [{"stage": "standard", "method": "discount_rule",
          "args": {"percent": 10, "threshold": 1000}}],
    )
    assert {r.id: r.amount for r in out2.collect()}[2] == 1800.0


def test_runner_duplicate_names_rejected():
    spec = CustomSpec(name="a", module=MOD, method="apply_discount_if_high_value")
    with pytest.raises(ValueError, match="duplicate"):
        CustomsRunner([spec, spec])


def test_runner_disallowed_is_noop(spark):
    df = spark.createDataFrame([(1, 5000.0)], ["id", "amount"])
    spec = CustomSpec(name="discount_rule", module=MOD, method="apply_discount_if_high_value")
    runner = CustomsRunner([spec], allow=False)
    out = runner.apply_stage(df, "standard", [{"stage": "standard", "method": "discount_rule", "args": {}}])
    assert out is df
