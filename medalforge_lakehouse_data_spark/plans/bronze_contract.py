"""Bronze data contract: JSON → validated model → StructType + plan.

Semantic port of the reference's DataContractManager (reference:
bronze/managers/data_contract_manager.py) without Pydantic: plain
dataclass + explicit validation, same rules:

  * identifiers match ^[A-Za-z_][A-Za-z0-9_]*$ (:22-26)
  * columns non-empty, duplicate-free (:138-146)
  * partition columns exist and are not complex types (:148-163)
  * ingestion_date always appended to the partition spec (:165-174)
  * dtype aliases (:29-37), decimal(p,s) (:201-204), complex types via
    Spark's DDL parser with silent fallback to string (:206-214)
  * per-format reader-option merge/validation (:298-350)
  * audit columns injected if absent (table_manager.py:137-149)
"""

from __future__ import annotations

import json
import re
from dataclasses import dataclass, field

from pyspark.sql.types import (
    BooleanType,
    DataType,
    DateType,
    DecimalType,
    DoubleType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
    TimestampType,
    _parse_datatype_string,
)

_IDENT = re.compile(r"^[A-Za-z_][A-Za-z0-9_]*$")
_DECIMAL = re.compile(r"^decimal\s*\(\s*(\d+)\s*,\s*(\d+)\s*\)$", re.I)

SUPPORTED_DTYPES: dict[str, DataType] = {
    "string": StringType(),
    "int": IntegerType(),
    "integer": IntegerType(),
    "bigint": LongType(),
    "long": LongType(),
    "double": DoubleType(),
    "float64": DoubleType(),
    "boolean": BooleanType(),
    "bool": BooleanType(),
    "date": DateType(),
    "timestamp": TimestampType(),
    "timestamptz": TimestampType(),
    "binary": __import__("pyspark.sql.types", fromlist=["BinaryType"]).BinaryType(),
}

READER_DEFAULTS = {
    "csv": {
        "header": "true",
        "delimiter": ",",
        "quote": '"',
        "escape": "\\",
        "nullValue": "",
    },
    "json": {},
    "txt": {},
}


class ContractError(ValueError):
    pass


def parse_dtype(dtype: str) -> DataType:
    s = dtype.strip()
    low = s.lower()
    if low in SUPPORTED_DTYPES:
        return SUPPORTED_DTYPES[low]
    m = _DECIMAL.match(low)
    if m:
        return DecimalType(int(m.group(1)), int(m.group(2)))
    try:
        return _parse_complex(s)
    except Exception:
        try:
            # Spark's own DDL parser (needs an active session/JVM)
            return _parse_datatype_string(s)
        except Exception:
            # reference behavior: silent fallback (:213-214)
            return StringType()


def _split_top(s: str) -> list[str]:
    """Split on commas at angle-bracket depth 0."""
    out, depth, cur = [], 0, []
    for ch in s:
        if ch == "<":
            depth += 1
        elif ch == ">":
            depth -= 1
        if ch == "," and depth == 0:
            out.append("".join(cur))
            cur = []
        else:
            cur.append(ch)
    if cur:
        out.append("".join(cur))
    return out


def _parse_complex(s: str) -> DataType:
    """Pure-Python DDL parser for array<>/map<>/struct<> — no JVM needed
    (contract parsing must work before a SparkSession exists)."""
    from pyspark.sql.types import ArrayType, MapType

    t = s.strip()
    low = t.lower()
    if low.startswith("array<") and t.endswith(">"):
        return ArrayType(parse_dtype(t[6:-1]))
    if low.startswith("map<") and t.endswith(">"):
        k, v = _split_top(t[4:-1])
        return MapType(parse_dtype(k), parse_dtype(v))
    if low.startswith("struct<") and t.endswith(">"):
        fields = []
        for part in _split_top(t[7:-1]):
            name, _, ftype = part.partition(":")
            if not ftype:
                raise ValueError(f"bad struct field {part!r}")
            fields.append(StructField(name.strip(), parse_dtype(ftype)))
        return StructType(fields)
    raise ValueError(f"not a complex type: {s!r}")


def _is_complex(dt: DataType) -> bool:
    return dt.typeName() in ("array", "map", "struct")


@dataclass
class ColumnSpec:
    name: str
    dtype: str
    comment: str | None = None

    @property
    def spark_type(self) -> DataType:
        return parse_dtype(self.dtype)


@dataclass
class BronzeContract:
    catalog: str
    schema_name: str
    table: str
    columns: list[ColumnSpec]
    fmt: str
    reader_options: dict[str, str] = field(default_factory=dict)
    partitions: list[str] = field(default_factory=list)
    version: str = "1.0"

    @property
    def fqn(self) -> str:
        return f"{self.catalog}.{self.schema_name}.{self.table}"

    # -- validation (run at parse) ---------------------------------------

    def validate(self) -> None:
        for ident in (self.catalog, self.schema_name, self.table):
            if not _IDENT.match(ident):
                raise ContractError(f"invalid identifier {ident!r}")
        if not self.columns:
            raise ContractError("columns must not be empty")
        names = [c.name for c in self.columns]
        dupes = {n for n in names if names.count(n) > 1}
        if dupes:
            raise ContractError(f"duplicate columns: {sorted(dupes)}")
        for c in self.columns:
            if not _IDENT.match(c.name):
                raise ContractError(f"invalid column name {c.name!r}")
        by_name = {c.name: c for c in self.columns}
        for p in self.partitions:
            if p in ("ingestion_date", "ingestion_ts"):
                continue
            if p not in by_name:
                raise ContractError(f"partition column {p!r} not in schema")
            if _is_complex(by_name[p].spark_type):
                raise ContractError(f"partition column {p!r} may not be complex")
        fmt = self.fmt.lower()
        if fmt not in ("csv", "json", "txt"):
            raise ContractError(f"unsupported format {self.fmt!r}")
        if fmt == "json" and "multiline" in self.reader_options:
            v = self.reader_options["multiline"]
            if not isinstance(v, bool) and str(v).lower() not in ("true", "false"):
                raise ContractError("json multiline must be boolean")
        if fmt == "txt" and not self.reader_options.get("delimiter"):
            raise ContractError("txt format requires a non-empty delimiter")

    # -- derived artifacts -------------------------------------------------

    @property
    def schema_struct(self) -> StructType:
        fields = [
            StructField(c.name, c.spark_type, True, {"comment": c.comment} if c.comment else {})
            for c in self.columns
        ]
        return StructType(fields)

    @property
    def schema_with_audit(self) -> StructType:
        s = self.schema_struct
        names = set(s.fieldNames())
        fields = list(s.fields)
        if "ingestion_ts" not in names:
            fields.append(StructField("ingestion_ts", TimestampType()))
        if "ingestion_date" not in names:
            fields.append(StructField("ingestion_date", DateType()))
        return StructType(fields)

    @property
    def effective_partitions(self) -> list[str]:
        # reference: ingestion_date always appended (:165-174)
        parts = [p for p in self.partitions if p != "ingestion_date"]
        parts.append("ingestion_date")
        return parts

    @property
    def effective_reader_options(self) -> dict[str, str]:
        fmt = "csv" if self.fmt.lower() == "txt" else self.fmt.lower()
        merged = dict(READER_DEFAULTS.get(fmt, {}))
        merged.update({k: v for k, v in self.reader_options.items()})
        return merged

    def as_ingestion_payload(self) -> dict:
        """IR #2 of the bronze lifecycle (reference:
        data_contract_manager.py:352-366)."""
        return {
            "fqn": self.fqn,
            "schema_struct": self.schema_with_audit,
            "format": "csv" if self.fmt.lower() == "txt" else self.fmt.lower(),
            "reader_options": self.effective_reader_options,
            "partitions": self.effective_partitions,
            "column_comments": {c.name: c.comment for c in self.columns if c.comment},
        }


def load_bronze_contract(source: str | dict) -> BronzeContract:
    """Parse from a JSON string/path/dict and validate."""
    if isinstance(source, dict):
        d = source
    elif source.lstrip().startswith("{"):
        d = json.loads(source)
    else:
        with open(source) as f:
            d = json.load(f)
    src = d.get("source", {})
    c = BronzeContract(
        catalog=d["catalog"],
        schema_name=d["schema"],
        table=d["table"],
        columns=[ColumnSpec(**col) for col in d.get("columns", [])],
        fmt=src.get("format", d.get("format", "csv")),
        reader_options=dict(src.get("options", d.get("reader_options", {}))),
        partitions=list(d.get("partitions", [])),
        version=d.get("version", "1.0"),
    )
    c.validate()
    return c
