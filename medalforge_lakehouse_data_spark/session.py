"""SparkSession factory with scale-oriented defaults.

The reference delegates session creation to Databricks; here we own it.
Defaults are chosen for a multi-executor cluster: AQE on (runtime re-plan,
skew-join splitting, partition coalescing), Arrow on (all image/vector work
flows through pandas/Arrow UDFs — zero per-row Python, per BASELINE.json
input_hint), shuffle partitions sized to available parallelism.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(
    app_name: str = "medalforge-lakehouse",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", os.cpu_count() or 4))
    master = master or f"local[{cpus}]"
    shuffle_partitions = shuffle_partitions or max(cpus, 8)

    builder = (
        SparkSession.builder.appName(app_name)
        .master(master)
        # Runtime re-planning: coalesce tiny shuffle partitions, split skewed
        # joins. Essential at 100 TB where static plans mis-size partitions.
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        # Arrow batch transfer for every pandas UDF (codec/phash/zindex).
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "2048")
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        # Keep scan partitions bounded so a 100 TB table splits into
        # executor-memory-sized chunks (128 MB default is right; explicit).
        .config("spark.sql.files.maxPartitionBytes", "134217728")
        .config("spark.sql.session.timeZone", "UTC")
        # Reference semantics are Spark 3.x / DBR non-ANSI: malformed
        # casts/dates yield NULL (then quarantined by checks) instead of
        # failing the job; contract sql_expressions rely on this.
        .config("spark.sql.ansi.enabled", "false")
        # local mode runs every executor thread inside the driver JVM: with
        # 32 concurrent tasks writing parquet (row-group buffers) and moving
        # Arrow batches of image bytes, an 8g heap GC-thrashes. Size for the
        # machine (cluster deployments override via spark-submit).
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEMORY", "48g"))
        .config("spark.ui.enabled", "false")
    )
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    return builder.getOrCreate()
