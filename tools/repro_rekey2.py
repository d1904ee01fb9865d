"""Bisect the local[32] slowness inside the assign+shuffle+sort chain."""

from __future__ import annotations

import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

ROWS = int(sys.argv[1]) if len(sys.argv) > 1 else 2000
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
N_OUT = int(os.environ.get("N_OUT", "35"))


def main():
    from pyspark.sql import functions as F

    from medalforge_lakehouse_data_spark.format.table import Table
    from medalforge_lakehouse_data_spark.maintenance.clustering import (
        column_bounds,
        curve_boundaries,
        hash_preimages,
        partition_assign_udf,
        with_curve_key,
    )
    from medalforge_lakehouse_data_spark.session import get_spark
    from medalforge_lakehouse_data_spark.testing.datagen import IMAGES_SCHEMA, images_df

    spark = get_spark(master=f"local[{CPUS}]", shuffle_partitions=CPUS)
    tmp = tempfile.mkdtemp(prefix="repro-rekey2-")
    t = Table.create(os.path.join(tmp, "t"), IMAGES_SCHEMA, partition_spec=["fmt"])
    t.append(spark, images_df(spark, ROWS, seed=99, partitions=CPUS * 2,
                              n_bases=max(64, ROWS // 4)),
             target_file_count=32)

    cl = ["phash", "w", "h"]
    bounds = column_bounds(t, cl)
    keys_only = with_curve_key(t.scan(spark).select(*cl), cl, bounds, "zorder")
    bnds = curve_boundaries(keys_only, N_OUT)
    pre = hash_preimages(spark, N_OUT)
    pid_udf = partition_assign_udf(bnds)
    map_df = spark.createDataFrame([(i, x) for i, x in enumerate(pre)],
                                   "_pid int, _px long")

    def mk():
        df = t.scan(spark)
        keyed = with_curve_key(df, cl, bounds, "zorder")
        return keyed.withColumn("_mtie", F.xxhash64(F.col("image_id")))

    steps = {
        "scan+count": lambda: t.scan(spark).count(),
        "curve+tie": lambda: mk().count(),
        "+pid_udf": lambda: mk().withColumn(
            "_pid", pid_udf(F.col("_zkey"), F.col("_mtie"))).count(),
        "+bcast_join": lambda: mk().withColumn(
            "_pid", pid_udf(F.col("_zkey"), F.col("_mtie")))
            .join(F.broadcast(map_df), "_pid").count(),
        "+repart": lambda: mk().withColumn(
            "_pid", pid_udf(F.col("_zkey"), F.col("_mtie")))
            .join(F.broadcast(map_df), "_pid")
            .repartition(N_OUT, F.col("_px")).count(),
        "+sort": lambda: mk().withColumn(
            "_pid", pid_udf(F.col("_zkey"), F.col("_mtie")))
            .join(F.broadcast(map_df), "_pid")
            .repartition(N_OUT, F.col("_px"))
            .sortWithinPartitions("_zkey", "_mtie").count(),
    }
    for label, fn in steps.items():
        t0 = time.monotonic()
        n = fn()
        print(f"{label:14s} {time.monotonic()-t0:7.2f}s  n={n}", flush=True)
    shutil.rmtree(tmp, ignore_errors=True)


if __name__ == "__main__":
    main()
