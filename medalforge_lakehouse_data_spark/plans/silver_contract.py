"""Silver data contract: YAML → validated model.

Semantic port of the reference's SilverYaml/TargetCfg/DQXCfg/Steps
models (reference: silver/domain/silver.py:17-68, target.py:11-56,
dqx.py:157-172, etl.py:9-78): version 1.x gate, unknown-key rejection
(extra=forbid), check normalization at validation time, and arg-name
aliases from the live contract (from_patterns→formats,
project_ano_mes→derive_year_month)."""

from __future__ import annotations

from dataclasses import dataclass, field

import yaml

from medalforge_lakehouse_data_spark.operators.checks import normalize_check


class ContractError(ValueError):
    pass


_STEP_ARG_ALIASES = {
    "coerce_date": {"from_patterns": "formats"},
    "normalize_dates": {"project_ano_mes": "derive_year_month"},
}

_TOP_KEYS = {"version", "source", "target", "dqx", "etl", "quarantine", "customs"}


def _normalize_step(step: dict) -> dict:
    method = step.get("method")
    if not method:
        raise ContractError(f"etl step missing 'method': {step}")
    args = dict(step.get("args", {}))
    for old, new in _STEP_ARG_ALIASES.get(method, {}).items():
        if old in args and new not in args:
            args[new] = args.pop(old)
    return {"method": method, "args": args}


@dataclass
class WriteCfg:
    mode: str = "merge"
    merge_keys: list[str] = field(default_factory=list)
    partition_by: list[str] = field(default_factory=list)
    zorder_by: list[str] = field(default_factory=list)


@dataclass
class TargetCfg:
    catalog: str
    schema_name: str
    table: str
    write: WriteCfg

    @property
    def fqn(self) -> str:
        return f"{self.catalog}.{self.schema_name}.{self.table}"


@dataclass
class CustomSpec:
    name: str
    module: str
    method: str
    args_schema: dict = field(default_factory=dict)


@dataclass
class SilverContract:
    version: str
    source_table: str
    target: TargetCfg
    checks: list[dict] = field(default_factory=list)
    etl_standard: list[dict] = field(default_factory=list)
    remediate: list[dict] = field(default_factory=list)
    quarantine_sink: str | None = None
    customs_allow: bool = False
    customs_registry: list[CustomSpec] = field(default_factory=list)
    customs_use_in: list[dict] = field(default_factory=list)


def load_silver_contract(source: str | dict) -> SilverContract:
    if isinstance(source, dict):
        d = source
    elif "\n" in source or source.lstrip().startswith(("version", "{")):
        d = yaml.safe_load(source)
    else:
        with open(source) as f:
            d = yaml.safe_load(f)

    unknown = set(d) - _TOP_KEYS
    if unknown:
        # reference: Pydantic extra="forbid" (silver.py:47-62)
        raise ContractError(f"unknown top-level keys: {sorted(unknown)}")
    version = str(d.get("version", ""))
    if not version.startswith("1."):
        raise ContractError(f"unsupported contract version {version!r} (need 1.x)")

    tgt = d.get("target") or {}
    write = tgt.get("write") or {}
    if write.get("mode", "merge") == "merge" and not write.get("merge_keys"):
        raise ContractError("write.mode=merge requires merge_keys")
    target = TargetCfg(
        catalog=tgt["catalog"],
        schema_name=tgt["schema"],
        table=tgt["table"],
        write=WriteCfg(
            mode=write.get("mode", "merge"),
            merge_keys=list(write.get("merge_keys", [])),
            partition_by=list(write.get("partition_by", [])),
            zorder_by=list(write.get("zorder_by", [])),
        ),
    )

    dqx = d.get("dqx") or {}
    default_crit = dqx.get("criticality_default", "error")
    checks = []
    for c in list(dqx.get("checks", [])) + list(dqx.get("custom", [])):
        c = dict(c)
        c.setdefault("criticality", default_crit)
        checks.append(normalize_check(c))

    etl = d.get("etl") or {}
    quarantine = d.get("quarantine") or {}
    customs = d.get("customs") or {}
    return SilverContract(
        version=version,
        source_table=(d.get("source") or {}).get("bronze_table", ""),
        target=target,
        checks=checks,
        etl_standard=[_normalize_step(s) for s in etl.get("standard", [])],
        remediate=[_normalize_step(s) for s in quarantine.get("remediate", [])],
        quarantine_sink=(quarantine.get("sink") or {}).get("table"),
        customs_allow=bool(customs.get("allow", False)),
        customs_registry=[CustomSpec(**r) for r in customs.get("registry", [])],
        customs_use_in=list(customs.get("use_in", [])),
    )
