"""Sandboxed loader for custom transforms.

Security semantics from the reference (reference:
silver/customs/loader.py:6-43): module must start with an allowlisted
prefix, the function must carry the @custom mark, and its first
parameter must be named ``df``."""

from __future__ import annotations

import importlib
import inspect

from medalforge_lakehouse_data_spark.customs.sdk import MARK

DEFAULT_ALLOWED_PREFIXES = ("medalforge_lakehouse_data_spark.customs.",)


class CustomLoadError(ValueError):
    pass


def load_custom(
    module: str,
    method: str,
    allowed_prefixes: tuple[str, ...] = DEFAULT_ALLOWED_PREFIXES,
):
    if not any(module.startswith(p) for p in allowed_prefixes):
        raise CustomLoadError(
            f"module {module!r} outside allowlist {list(allowed_prefixes)}"
        )
    try:
        mod = importlib.import_module(module)
    except ImportError as e:
        raise CustomLoadError(f"cannot import {module!r}: {e}") from e
    fn = getattr(mod, method, None)
    if fn is None:
        raise CustomLoadError(f"{module}.{method} not found")
    if not getattr(fn, MARK, False):
        raise CustomLoadError(f"{module}.{method} is not marked @custom")
    params = list(inspect.signature(fn).parameters)
    if not params or params[0] != "df":
        raise CustomLoadError(f"{module}.{method} first parameter must be 'df'")
    return fn
