"""Staged application of registered customs.

Reference semantics (reference: silver/customs/runner.py:8-60):
registry name → (module, method, args_schema); duplicate registry names
rejected; use_in entries select stage + method + args; args validated
against the schema before the call."""

from __future__ import annotations

from pyspark.sql import DataFrame

from medalforge_lakehouse_data_spark.customs.args import validate_args
from medalforge_lakehouse_data_spark.customs.loader import (
    DEFAULT_ALLOWED_PREFIXES,
    load_custom,
)


class CustomsRunner:
    def __init__(self, registry: list, allow: bool = True,
                 allowed_prefixes: tuple[str, ...] = DEFAULT_ALLOWED_PREFIXES):
        self.allow = allow
        self.allowed_prefixes = allowed_prefixes
        self._specs: dict[str, object] = {}
        for spec in registry:
            if spec.name in self._specs:
                raise ValueError(f"duplicate custom name {spec.name!r}")
            self._specs[spec.name] = spec

    def apply_stage(self, df: DataFrame, stage: str, use_in: list[dict]) -> DataFrame:
        if not self.allow:
            return df
        for use in use_in:
            if use.get("stage") != stage:
                continue
            name = use["method"]
            spec = self._specs.get(name)
            if spec is None:
                raise ValueError(f"custom {name!r} not registered")
            fn = load_custom(spec.module, spec.method, self.allowed_prefixes)
            args = validate_args(spec.args_schema, use.get("args", {}))
            df = fn(df, **args)
        return df
