"""Silver pipeline: checks split → remediate → re-check → ETL → customs →
union → MERGE → quarantine/rejected sinks → metrics.

Stage order is the reference's, exactly (reference:
silver/application/pipeline.py:12-107):

  1. source scan
  2. checks split → (valid, quarantine)
  3. persist RAW quarantine (with technical columns) to the sink
  4. strip tech cols + remediation steps on quarantine
  5. re-check remediated rows → (fixed_valid, still_bad)
  6. standard ETL steps on BOTH valid branches (declared order)
  7. customs on both branches
  8. unionByName(allowMissingColumns=True)
  9. MERGE INTO target on contract merge_keys (+ optional cluster-by)
 10. still-bad rows → *_rejected sink (fallback naming
     <catalog>.<schema>_quarantine.<table>_rejected)
 11. run metrics

Perf deltas vs the reference (which recomputed both branches at every
action, noted in SURVEY.md §3.2): the checked DataFrame and both
branches are cached before multi-action fan-out."""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession

from medalforge_lakehouse_data_spark.customs.runner import CustomsRunner
from medalforge_lakehouse_data_spark.maintenance.clustering import cluster_rewrite
from medalforge_lakehouse_data_spark.operators import etl_core
from medalforge_lakehouse_data_spark.operators.checks import apply_checks_and_split
from medalforge_lakehouse_data_spark.operators.merge import merge_into
from medalforge_lakehouse_data_spark.plans.catalog import Catalog
from medalforge_lakehouse_data_spark.plans.silver_contract import SilverContract
from medalforge_lakehouse_data_spark.monitoring.runs import PipelineRunLogger


@dataclass
class PipelineResult:
    merged_rows: int
    quarantined_rows: int
    remediated_rows: int
    rejected_rows: int
    target_snapshot_id: int | None
    metrics: dict = field(default_factory=dict)


def _rejected_fqn(contract: SilverContract) -> str:
    t = contract.target
    # reference fallback naming (pipeline.py:84-96)
    return f"{t.catalog}.{t.schema_name}_quarantine.{t.table}_rejected"


def run_pipeline(
    spark: SparkSession,
    contract: SilverContract,
    catalog: Catalog,
    source_df: DataFrame | None = None,
    run_logger: PipelineRunLogger | None = None,
    allowed_custom_prefixes: tuple[str, ...] | None = None,
) -> PipelineResult:
    logger = run_logger or PipelineRunLogger(None)
    with logger:
        # 1. source
        if source_df is None:
            source_df = catalog.load(contract.source_table).scan(spark)

        # 2. split
        valid_df, quarantine_df = apply_checks_and_split(source_df, contract.checks)
        valid_df = valid_df.cache()
        quarantine_df = quarantine_df.cache()
        n_quarantine = quarantine_df.count()

        # 3. raw quarantine sink (with technical columns, as the reference
        # persists DQX's _errors for triage)
        if contract.quarantine_sink and n_quarantine:
            qsink_df = quarantine_df.withColumn(
                "_errors", quarantine_df["_errors"].cast("string")
            ).withColumn("_warnings", quarantine_df["_warnings"].cast("string"))
            qt = catalog.ensure_table(contract.quarantine_sink, qsink_df.schema)
            qt.append(spark, qsink_df)

        # 4. remediate quarantined rows
        fixed = etl_core.strip_technical_columns(quarantine_df)
        fixed = etl_core.run_steps(fixed, contract.remediate)

        # 5. re-check
        fixed_valid, still_bad = apply_checks_and_split(fixed, contract.checks)
        fixed_valid = fixed_valid.cache()
        n_remediated = fixed_valid.count()

        # 6. standard steps on both branches (declared order = execution order)
        valid_out = etl_core.run_steps(valid_df, contract.etl_standard)
        fixed_out = etl_core.run_steps(fixed_valid, contract.etl_standard)

        # 7. customs on both branches
        if contract.customs_allow and contract.customs_registry:
            runner = CustomsRunner(
                contract.customs_registry,
                allow=True,
                **(
                    {"allowed_prefixes": allowed_custom_prefixes}
                    if allowed_custom_prefixes
                    else {}
                ),
            )
            valid_out = runner.apply_stage(valid_out, "standard", contract.customs_use_in)
            fixed_out = runner.apply_stage(fixed_out, "standard", contract.customs_use_in)

        # 8. union
        final = valid_out.unionByName(fixed_out, allowMissingColumns=True)
        # The reference dedups per branch only; a key colliding ACROSS
        # branches (a valid row and a remediated row sharing a merge key)
        # would make MERGE nondeterministic (README.md:379 — Delta errors).
        # We re-apply the contract's own declared deduplicate step on the
        # union so its ordering rule arbitrates cross-branch collisions.
        dedup_steps = [s for s in contract.etl_standard if s["method"] == "deduplicate"]
        if dedup_steps and contract.target.write.mode == "merge":
            final = etl_core.run_steps(final, dedup_steps)

        # 9. MERGE INTO target (ensure table from df schema, like
        # merge.py:144-149 ensure_external_table_from_df)
        t = contract.target
        target_table = catalog.ensure_table(
            t.fqn, final.schema, partition_spec=t.write.partition_by
        )
        if t.write.mode == "merge":
            merge_into(target_table, final, t.write.merge_keys, spark)
        elif t.write.mode == "append":
            target_table.append(spark, final)
        elif t.write.mode == "overwrite":
            target_table.overwrite_all(spark, final)
        else:
            raise ValueError(f"unknown write mode {t.write.mode!r}")
        # post-merge clustering (reference: OPTIMIZE ZORDER after MERGE)
        if t.write.zorder_by:
            cluster_rewrite(
                target_table, spark, columns=tuple(t.write.zorder_by), curve="zorder"
            )
        merged_rows = target_table.metadata().current_snapshot().summary.get("total_rows", 0)

        # 10. rejected sink
        n_rejected = still_bad.count()
        if n_rejected:
            rej_df = still_bad.withColumn(
                "_errors", still_bad["_errors"].cast("string")
            ).withColumn("_warnings", still_bad["_warnings"].cast("string"))
            rt = catalog.ensure_table(_rejected_fqn(contract), rej_df.schema)
            rt.append(spark, rej_df)

        # 11. metrics
        logger.add_metrics(
            merged_rows=merged_rows,
            quarantined=n_quarantine,
            remediated=n_remediated,
            rejected=n_rejected,
        )
        valid_df.unpersist()
        quarantine_df.unpersist()
        fixed_valid.unpersist()
        return PipelineResult(
            merged_rows=merged_rows,
            quarantined_rows=n_quarantine,
            remediated_rows=n_remediated,
            rejected_rows=n_rejected,
            target_snapshot_id=target_table.current_snapshot_id(),
            metrics=dict(logger.metrics),
        )
