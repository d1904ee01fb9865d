"""Argument validation/coercion DSL for custom transforms.

Semantic port of the reference's args DSL (reference:
silver/customs/args.py:63-126): types number/integer/boolean/string,
enum, regex, min/max ranges, required/default, extras rejected."""

from __future__ import annotations

import re
from typing import Any


class ArgsError(ValueError):
    pass


def validate_args(schema: dict[str, dict], args: dict[str, Any]) -> dict[str, Any]:
    """Validate+coerce args against the schema; returns the effective args."""
    schema = schema or {}
    extras = set(args) - set(schema)
    if extras:
        raise ArgsError(f"unexpected arguments: {sorted(extras)}")
    out: dict[str, Any] = {}
    for name, spec in schema.items():
        spec = spec or {}
        if name in args:
            val = args[name]
        elif "default" in spec:
            val = spec["default"]
        elif spec.get("required"):
            raise ArgsError(f"missing required argument {name!r}")
        else:
            continue
        typ = spec.get("type", "string")
        val = _coerce(name, typ, val)
        if "enum" in spec and val not in spec["enum"]:
            raise ArgsError(f"{name}: {val!r} not in enum {spec['enum']}")
        if "regex" in spec and not re.fullmatch(spec["regex"], str(val)):
            raise ArgsError(f"{name}: {val!r} does not match /{spec['regex']}/")
        if "min" in spec and val < spec["min"]:
            raise ArgsError(f"{name}: {val} below min {spec['min']}")
        if "max" in spec and val > spec["max"]:
            raise ArgsError(f"{name}: {val} above max {spec['max']}")
        out[name] = val
    return out


def _coerce(name: str, typ: str, val: Any) -> Any:
    try:
        if typ == "number":
            if isinstance(val, bool):
                raise TypeError
            return float(val)
        if typ == "integer":
            if isinstance(val, bool) or (isinstance(val, float) and not val.is_integer()):
                raise TypeError
            return int(val)
        if typ == "boolean":
            if isinstance(val, bool):
                return val
            if str(val).lower() in ("true", "false"):
                return str(val).lower() == "true"
            raise TypeError
        if typ == "string":
            if not isinstance(val, str):
                raise TypeError
            return val
    except (TypeError, ValueError):
        raise ArgsError(f"{name}: expected {typ}, got {val!r}")
    raise ArgsError(f"{name}: unknown arg type {typ!r}")
