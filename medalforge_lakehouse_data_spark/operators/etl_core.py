"""Core declarative ETL steps — reference parity.

Each function mirrors one step of the reference's ETL core
(reference: src/onedata/silver/etl/core.py) with identical semantics:
DataFrame-in/DataFrame-out, ``missing="error"|"skip"`` column policy,
pure Column expressions (JVM-side, whole-stage codegen — no Python in
the hot path).

Scale notes: `deduplicate` keeps the reference's window+row_number
shape (core.py:186-235); at very large scale prefer
``strategy="agg"`` which uses groupBy + max_by(struct) — a partial-agg
(map-side combine) instead of a full sort per partition key.
"""

from __future__ import annotations

import re
from functools import reduce
from operator import or_

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


class MissingColumnsError(ValueError):
    pass


_ORDER_RE = re.compile(
    r"^(.*?)(?:\s+(asc|desc))?(?:\s+nulls\s+(first|last))?\s*$", re.IGNORECASE
)


def _order_expr(o: str):
    """Parse an order_by string like ``"created_at desc nulls last"`` into
    a sort Column. (F.expr alone drops the direction token.)"""
    m = _ORDER_RE.match(o.strip())
    expr_s, direction, nulls = m.group(1), (m.group(2) or "").lower(), (m.group(3) or "").lower()
    c = F.expr(expr_s)
    if direction == "desc":
        return {"first": c.desc_nulls_first(), "last": c.desc_nulls_last()}.get(nulls, c.desc())
    if direction == "asc" or nulls:
        return {"first": c.asc_nulls_first(), "last": c.asc_nulls_last()}.get(nulls, c.asc())
    return c


def _ensure_columns(
    df: DataFrame, columns: list[str], missing: str, step: str
) -> list[str]:
    """Column-existence guard (reference: core.py:25-45). Returns the
    columns to act on; raises or filters per the ``missing`` policy."""
    if missing not in ("error", "skip"):
        raise ValueError(f"{step}: missing must be 'error' or 'skip'")
    present = set(df.columns)
    absent = [c for c in columns if c not in present]
    if absent and missing == "error":
        raise MissingColumnsError(f"{step}: missing columns {absent}")
    return [c for c in columns if c in present]


def trim_columns(df: DataFrame, columns: list[str], missing: str = "error") -> DataFrame:
    """F.trim over listed columns (reference: core.py:50-85)."""
    cols = _ensure_columns(df, columns, missing, "trim_columns")
    for c in cols:
        df = df.withColumn(c, F.trim(F.col(c)))
    return df


def cast_columns(df: DataFrame, mapping: dict[str, str], missing: str = "error") -> DataFrame:
    """Cast per {column: dtype} mapping (reference: core.py:88-121).

    try_cast, not cast: Spark 4 defaults to ANSI mode where a malformed
    value aborts the job; the reference ran Spark 3.x semantics where it
    becomes NULL (then handled by quality checks). try_cast preserves
    that contract under ANSI."""
    cols = _ensure_columns(df, list(mapping), missing, "cast_columns")
    for c in cols:
        df = df.withColumn(c, F.col(c).try_cast(mapping[c]))
    return df


def normalize_dates(
    df: DataFrame,
    columns: list[str],
    format: str | None = None,
    formats: dict[str, str] | None = None,
    missing: str = "error",
    derive_year_month: bool = True,
) -> DataFrame:
    """to_date each column (per-column fmt map or one fmt); derive
    ``ano``/``mes`` from the first date column if absent
    (reference: core.py:124-183)."""
    cols = _ensure_columns(df, columns, missing, "normalize_dates")
    fmt_for = lambda c: (formats or {}).get(c, format)
    for c in cols:
        f = fmt_for(c)
        df = df.withColumn(c, F.try_to_date(F.col(c), f) if f else F.try_to_date(F.col(c)))
    if derive_year_month and cols:
        first = cols[0]
        if "ano" not in df.columns:
            df = df.withColumn("ano", F.year(F.col(first)))
        if "mes" not in df.columns:
            df = df.withColumn("mes", F.month(F.col(first)))
    return df


def _agg_order_direction(spec: str, df: DataFrame) -> str | None:
    """'asc'/'desc' when the order_by entry has a window-equivalent
    min_by/max_by translation: a plain column with the DEFAULT null
    placement (asc⇒nulls first, desc⇒nulls last). Anything else —
    expressions, or a non-default nulls qualifier — returns None and
    the caller falls back to the window strategy."""
    parts = spec.split()
    if not parts or parts[0] not in df.columns:
        return None
    tail = [p.lower() for p in parts[1:]]
    if tail in ([], ["asc"], ["asc", "nulls", "first"]):
        return "asc"
    if tail in (["desc"], ["desc", "nulls", "last"]):
        return "desc"
    return None


def deduplicate(
    df: DataFrame,
    keys: list[str],
    order_by: list[str],
    missing: str = "error",
    strategy: str = "window",
) -> DataFrame:
    """Keep first row per key set under the declared ordering
    (reference: core.py:186-235). ``order_by`` entries are SQL
    expression strings like ``"created_at desc"``; empty order_by is an
    error; with missing="skip" absent keys are dropped (all absent ⇒
    global window — observed reference behavior, test_core.py:175-184).

    strategy="agg": same semantics via groupBy + min_by/max_by — partial
    aggregation instead of a full per-key sort; use when keys are high-
    cardinality at scale. Supported for a single plain-column order_by
    with the default null placement ('col', 'col asc[ nulls first]',
    'col desc[ nulls last]'); other forms fall back to the window
    strategy. Null safety (round-1 ADVICE fix): min_by/max_by skip NULL
    ordering values, so the ordering key is the never-null struct
    (is_not_null(col), col) — NULL rows sort first under asc / last
    under desc exactly like the window, and an all-null group returns a
    real row instead of an all-NULL one.
    """
    if not order_by:
        raise ValueError("deduplicate: order_by must not be empty")
    keys_present = _ensure_columns(df, keys, missing, "deduplicate")
    order_exprs = [_order_expr(o) for o in order_by]
    direction = _agg_order_direction(order_by[0], df) if len(order_by) == 1 else None
    if strategy == "agg" and direction is not None:
        ocol = order_by[0].split()[0]
        agg_fn = F.max_by if direction == "desc" else F.min_by
        okey = F.struct(
            F.col(ocol).isNotNull().alias("__h"), F.col(ocol).alias("__v")
        )
        row = F.struct(*[F.col(c) for c in df.columns])
        grouped = (
            df.groupBy(*[F.col(k) for k in keys_present])
            if keys_present
            else df.groupBy(F.lit(1).alias("__g"))
        )
        out = grouped.agg(agg_fn(row, okey).alias("__r"))
        return out.select(*[F.col(f"__r.{c}").alias(c) for c in df.columns])
    w = (
        Window.partitionBy(*[F.col(k) for k in keys_present])
        if keys_present
        else Window.partitionBy(F.lit(1))
    ).orderBy(*order_exprs)
    return (
        df.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .drop("_rn")
    )


def coerce_date(
    df: DataFrame,
    column: str,
    formats: list[str],
    to_format: str | None = None,
    missing: str = "error",
) -> DataFrame:
    """Multi-format date remediation: coalesce(to_date(col, fmt)...) over
    the ordered pattern list; output date, or a formatted string when
    ``to_format`` is given (reference: core.py:240-291)."""
    cols = _ensure_columns(df, [column], missing, "coerce_date")
    if not cols:
        return df
    if not formats:
        raise ValueError("coerce_date: formats must not be empty")
    parsed = None
    for fmt in formats:
        p = F.try_to_date(F.col(column), fmt)
        parsed = p if parsed is None else F.coalesce(parsed, p)
    out = F.date_format(parsed, to_format) if to_format else parsed
    return df.withColumn(column, out)


def clamp_range(
    df: DataFrame,
    column: str,
    min: float | int | None = None,
    max: float | int | None = None,
    missing: str = "error",
) -> DataFrame:
    """Numeric clipping, one- or two-sided, no implicit cast
    (reference: core.py:294-344)."""
    cols = _ensure_columns(df, [column], missing, "clamp_range")
    if not cols:
        return df
    if min is None and max is None:
        raise ValueError("clamp_range: at least one of min/max required")
    c = F.col(column)
    expr = c
    if min is not None:
        expr = F.when(c < F.lit(min), F.lit(min)).otherwise(expr)
    if max is not None:
        expr = F.when(c > F.lit(max), F.lit(max)).otherwise(expr)
    # preserve nulls (when() already passes nulls through to otherwise)
    return df.withColumn(column, F.when(c.isNull(), None).otherwise(expr))


def drop_if_null(df: DataFrame, columns: list[str], missing: str = "error") -> DataFrame:
    """Drop rows where ANY listed column is null (OR-accumulated
    condition; reference: core.py:347-385)."""
    cols = _ensure_columns(df, columns, missing, "drop_if_null")
    if not cols:
        return df
    cond = reduce(or_, [F.col(c).isNull() for c in cols])
    return df.where(~cond)


def strip_technical_columns(df: DataFrame) -> DataFrame:
    """Drop _errors/_warnings/_dqx_* (reference: etl_stage.py:12-18)."""
    keep = [
        c
        for c in df.columns
        if c not in ("_errors", "_warnings") and not c.startswith("_dqx_")
    ]
    return df.select(*keep)


def add_audit_columns(df: DataFrame) -> DataFrame:
    """ingestion_ts / ingestion_date audit projection
    (reference: ingestor_interfaces.py:31-51)."""
    if "ingestion_ts" not in df.columns:
        df = df.withColumn("ingestion_ts", F.current_timestamp())
    if "ingestion_date" not in df.columns:
        df = df.withColumn("ingestion_date", F.to_date(F.col("ingestion_ts")))
    return df


# dispatch table for declarative step sequences (reference: etl_stage.py:20-32
# uses getattr on the module; we keep an explicit registry)
STANDARD_STEPS = {
    "trim_columns": trim_columns,
    "cast_columns": cast_columns,
    "normalize_dates": normalize_dates,
    "deduplicate": deduplicate,
    "coerce_date": coerce_date,
    "clamp_range": clamp_range,
    "drop_if_null": drop_if_null,
}


def run_steps(df: DataFrame, steps: list[dict]) -> DataFrame:
    """Execute a declared sequence: [{"method": name, "args": {...}}].
    Declared order is execution order (reference: README.md:277)."""
    for s in steps:
        method = s["method"]
        if method not in STANDARD_STEPS:
            raise ValueError(f"unknown etl step {method!r}")
        df = STANDARD_STEPS[method](df, **s.get("args", {}))
    return df
