"""Directory-backed 3-level catalog: catalog.schema.table → Table path.

Plays Unity Catalog's role in the reference (reference:
silver/utils/uc.py:13-77 — FQN split/validation, CREATE SCHEMA IF NOT
EXISTS; bronze/managers/table_manager.py — external LOCATION tables).
A warehouse is a directory tree ``<root>/<catalog>/<schema>/<table>``;
all DDL is idempotent create-if-absent."""

from __future__ import annotations

import os
import re

from pyspark.sql.types import StructType

from medalforge_lakehouse_data_spark.format.table import Table

_IDENT = re.compile(r"^[A-Za-z_][A-Za-z0-9_]*$")


def split_fqn(fqn: str, default_catalog: str = "main") -> tuple[str, str, str]:
    """2- or 3-part FQN → (catalog, schema, table); 2-part gets the
    default catalog (reference: write_stage.py:8-20 current_catalog)."""
    parts = fqn.split(".")
    if len(parts) == 2:
        parts = [default_catalog] + parts
    if len(parts) != 3:
        raise ValueError(f"FQN must be catalog.schema.table, got {fqn!r}")
    for p in parts:
        if not _IDENT.match(p):
            raise ValueError(f"invalid identifier {p!r} in FQN {fqn!r}")
    return tuple(parts)  # type: ignore[return-value]


class Catalog:
    def __init__(self, warehouse_root: str, default_catalog: str = "main"):
        self.root = os.path.abspath(warehouse_root)
        self.default_catalog = default_catalog

    def path(self, fqn: str) -> str:
        c, s, t = split_fqn(fqn, self.default_catalog)
        return os.path.join(self.root, c, s, t)

    def table_exists(self, fqn: str) -> bool:
        return Table.exists(self.path(fqn))

    def load(self, fqn: str) -> Table:
        return Table.load(self.path(fqn))

    def create_table(
        self,
        fqn: str,
        schema: StructType,
        partition_spec: list[str] | None = None,
        properties: dict[str, str] | None = None,
        if_not_exists: bool = True,
    ) -> Table:
        return Table.create(
            self.path(fqn), schema, partition_spec, properties, if_not_exists
        )

    def ensure_table(self, fqn: str, schema: StructType,
                     partition_spec: list[str] | None = None,
                     properties: dict[str, str] | None = None) -> Table:
        """CREATE TABLE IF NOT EXISTS semantics (table_manager.py:182-250)."""
        return self.create_table(fqn, schema, partition_spec, properties, True)

    def drop_table(self, fqn: str) -> None:
        import shutil

        shutil.rmtree(self.path(fqn), ignore_errors=True)

    def list_tables(self, catalog: str, schema: str) -> list[str]:
        base = os.path.join(self.root, catalog, schema)
        if not os.path.isdir(base):
            return []
        return sorted(
            t for t in os.listdir(base) if Table.exists(os.path.join(base, t))
        )
