"""Local replica of the driver's correctness gate: run every queries()
entry on Spark and its oracle_sql() on DuckDB at sf0.01; compare row
count, column names, and an order-insensitive value hash.

Usage: python tools/check_oracles.py [sf_dir] [query ...]
"""

from __future__ import annotations

import hashlib
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def norm_cell(v):
    import datetime
    import decimal

    if v is None:
        return "␀"
    if isinstance(v, bool):
        return str(v).lower()
    if isinstance(v, decimal.Decimal):
        # Mirror the driver's hasher, which normalizes through float:
        # Decimal('412093.00') must hash like 412093.0 (round-1 lesson).
        return f"{float(v):.10g}"
    if isinstance(v, float):
        return f"{v:.10g}"
    if isinstance(v, datetime.datetime):
        return v.isoformat()
    if isinstance(v, datetime.date):
        return v.isoformat()
    return str(v)


def table_hash(cols: list[str], rows: list[tuple]) -> tuple[int, str]:
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    lines = sorted(
        "|".join(norm_cell(r[i]) for i in order) for r in rows
    )
    h = hashlib.sha256("\n".join(lines).encode()).hexdigest()[:16]
    return len(rows), h


def make_duckdb(sf_dir: str):
    con = duckdb.connect()
    for t in TABLES:
        p = os.path.join(sf_dir, f"{t}.parquet")
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    return con


def check_query(spark, con, qs: dict, oracles: dict, name: str,
                sf_dir: str) -> tuple[str | None, str]:
    """Run one queries() entry vs its oracle. Returns (error, message);
    error is None on pass or rows-only. Shared by the CLI and the
    ``pytest -m oracle`` gate (tests/test_oracles.py) so oracle drift
    fails the suite, not just the round gate."""
    try:
        sdf = qs[name](spark, sf_dir)
        dec_cols = [f.name for f in sdf.schema.fields
                    if f.dataType.typeName().startswith("decimal")]
        if dec_cols and name in oracles:
            # Output-schema rule: decimal must never reach a final
            # select (driver hasher stringifies it differently from
            # DuckDB floats). Hard-fail locally before the driver does.
            return "decimal", f"decimal output columns {dec_cols}"
        srows = sdf.collect()
        scols = sdf.columns
        sn, sh = table_hash(scols, [tuple(r) for r in srows])
    except Exception as e:
        return "spark", f"spark error {type(e).__name__}: {e}"
    if name not in oracles:
        return None, f"{sn} rows (rows-only, no oracle)"
    try:
        res = con.execute(oracles[name])
        ocols = [d[0] for d in res.description]
        orows = res.fetchall()
        on, oh = table_hash(ocols, orows)
    except Exception as e:
        return "duckdb", f"duckdb error {e}"
    if sorted(scols) != sorted(ocols):
        return "columns", f"columns {sorted(scols)} vs {sorted(ocols)}"
    if sn != on:
        return "rows", f"rows {sn} vs {on}"
    if sh != oh:
        return "hash", f"value hash mismatch ({sn} rows)"
    return None, f"{sn} rows hash={sh}"


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])
    import __spark_entry__ as entrymod
    from medalforge_lakehouse_data_spark.session import get_spark

    spark = get_spark(master="local[8]", shuffle_partitions=8)
    con = make_duckdb(sf_dir)
    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()
    failures = []
    for name in qs:
        if only and name not in only:
            continue
        err, msg = check_query(spark, con, qs, oracles, name, sf_dir)
        if err is not None:
            failures.append(name)
            print(f"FAIL  {name}: {msg}")
        elif name in oracles:
            print(f"OK    {name}: {msg}")
        else:
            print(f"rows  {name}: {msg}")
    print(f"\n{len(failures)} failures" + (f": {failures}" if failures else ""))
    sys.exit(1 if failures else 0)


if __name__ == "__main__":
    main()
