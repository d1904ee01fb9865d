"""Bronze orchestration: contract → validate/plan/ingest.

Reference lifecycle (reference: bronze/orchestrator.py:228-312): mode
string → (validate, plan, ingest) flags; path derivation
(raw_root/<cat>/<sch>/<tbl> source, bronze_root/datasets/... location,
checkpoints isolated per reprocess label); idempotent DDL always before
ingest; run logging wraps the whole run."""

from __future__ import annotations

import os
from dataclasses import dataclass

from pyspark.sql import SparkSession

from medalforge_lakehouse_data_spark.format.table import Table
from medalforge_lakehouse_data_spark.monitoring.runs import PipelineRunLogger
from medalforge_lakehouse_data_spark.plans.bronze_contract import BronzeContract
from medalforge_lakehouse_data_spark.plans.catalog import Catalog
from medalforge_lakehouse_data_spark.sources.ingest import IngestResult, ingest_batch


@dataclass
class IngestionPlan:
    fqn: str
    source_dir: str
    location: str
    checkpoint_dir: str
    fmt: str
    reader_options: dict
    partitions: list[str]

    def describe(self) -> str:
        return (
            f"IngestionPlan(fqn={self.fqn}, format={self.fmt}, "
            f"source={self.source_dir}, location={self.location}, "
            f"checkpoint={self.checkpoint_dir}, partitions={self.partitions})"
        )


def parse_mode(mode: str) -> tuple[bool, bool, bool]:
    """'validate+plan+ingest' → flags (reference: orchestrator.py:47-66)."""
    parts = {p.strip() for p in mode.split("+") if p.strip()}
    unknown = parts - {"validate", "plan", "ingest"}
    if unknown or not parts:
        raise ValueError(f"invalid mode {mode!r}")
    return "validate" in parts, "plan" in parts, "ingest" in parts


def build_plan(
    contract: BronzeContract,
    raw_root: str,
    bronze_root: str,
    reprocess_label: str | None = None,
) -> IngestionPlan:
    payload = contract.as_ingestion_payload()
    cat, sch, tbl = contract.catalog, contract.schema_name, contract.table
    suffix = f"_{reprocess_label}" if reprocess_label else ""
    return IngestionPlan(
        fqn=payload["fqn"],
        source_dir=os.path.join(raw_root, cat, sch, tbl),
        location=os.path.join(bronze_root, "datasets", cat, sch, tbl),
        checkpoint_dir=os.path.join(bronze_root, "_checkpoints", cat, sch, f"{tbl}{suffix}"),
        fmt=payload["format"],
        reader_options=payload["reader_options"],
        partitions=payload["partitions"],
    )


def run(
    spark: SparkSession,
    contract: BronzeContract,
    raw_root: str,
    bronze_root: str,
    mode: str = "validate+plan+ingest",
    include_existing: bool = True,
    reprocess_label: str | None = None,
    run_logger: PipelineRunLogger | None = None,
) -> tuple[IngestionPlan, IngestResult | None]:
    do_validate, do_plan, do_ingest = parse_mode(mode)
    if do_validate:
        contract.validate()
    plan = build_plan(contract, raw_root, bronze_root, reprocess_label)
    result = None
    logger = run_logger or PipelineRunLogger(None)
    with logger:
        if do_ingest:
            payload = contract.as_ingestion_payload()
            # DDL always before ingest, idempotent (orchestrator.py:269-275)
            table = Table.create(
                plan.location,
                payload["schema_struct"],
                partition_spec=payload["partitions"],
                properties={"appendOnly": "true"},
                if_not_exists=True,
            )
            bad = Table.create(
                plan.location + "_badrecords",
                _bad_records_schema(),
                if_not_exists=True,
            )
            result = ingest_batch(
                spark,
                plan.source_dir,
                contract.fmt.lower(),
                # read with the DECLARED schema; audit columns are added
                # post-read (ingestor_interfaces.py:31-51), not expected
                # in the source files
                contract.schema_struct,
                table,
                plan.checkpoint_dir,
                reader_options=payload["reader_options"],
                include_existing=include_existing,
                reprocess_label=None,  # already isolated via checkpoint_dir
                bad_records_table=bad,
            )
            logger.add_metrics(
                files=result.files_processed,
                rows=result.rows_ingested,
                corrupt=result.rows_corrupt,
            )
    return plan, result


def _bad_records_schema():
    from pyspark.sql.types import StringType, StructField, StructType, TimestampType

    return StructType(
        [
            StructField("source_file", StringType()),
            StructField("record", StringType()),
            StructField("captured_ts", TimestampType()),
        ]
    )
