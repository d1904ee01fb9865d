"""Time the clustering one-pass range-write sub-steps in isolation at a
given parallelism (SPARK_GRAFT_CPUS). Isolates the local[32] pathology
seen in merge/rekey (tools/repro_merge.py)."""

from __future__ import annotations

import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

ROWS = int(sys.argv[1]) if len(sys.argv) > 1 else 2000
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
N_OUT = int(os.environ.get("N_OUT", "35"))


def tick(label, t0):
    print(f"{label:24s} {time.monotonic()-t0:7.2f}s", flush=True)
    return time.monotonic()


def main():
    from pyspark.sql import functions as F

    from medalforge_lakehouse_data_spark.format.table import Table
    from medalforge_lakehouse_data_spark.maintenance.clustering import (
        column_bounds,
        curve_boundaries,
        hash_preimages,
        partition_assign_udf,
        with_curve_key,
        write_range_partitioned,
    )
    from medalforge_lakehouse_data_spark.session import get_spark
    from medalforge_lakehouse_data_spark.testing.datagen import IMAGES_SCHEMA, images_df

    spark = get_spark(master=f"local[{CPUS}]", shuffle_partitions=CPUS)
    tmp = tempfile.mkdtemp(prefix="repro-rekey-")
    t = Table.create(os.path.join(tmp, "t"), IMAGES_SCHEMA, partition_spec=["fmt"])
    t0 = time.monotonic()
    t.append(spark, images_df(spark, ROWS, seed=99, partitions=CPUS * 2,
                              n_bases=max(64, ROWS // 4)),
             target_file_count=32)
    t0 = tick("append", t0)

    cl = ["phash", "w", "h"]
    bounds = column_bounds(t, cl)
    df = t.scan(spark)
    keyed = with_curve_key(df, cl, bounds, "zorder")
    keyed = keyed.withColumn("_mtie", F.xxhash64(F.col("image_id")))
    t0 = time.monotonic()
    keys_only = with_curve_key(df.select(*cl), cl, bounds, "zorder")
    bnds = curve_boundaries(keys_only, N_OUT)
    t0 = tick("curve_boundaries", t0)
    pre = hash_preimages(spark, N_OUT)
    t0 = tick("hash_preimages", t0)
    pid_udf = partition_assign_udf(bnds)
    k2 = keyed.withColumn("_pid", pid_udf(F.col("_zkey"), F.col("_mtie")))
    map_df = spark.createDataFrame([(i, x) for i, x in enumerate(pre)],
                                   "_pid int, _px long")
    k2 = k2.join(F.broadcast(map_df), "_pid")
    k2 = k2.repartition(N_OUT, F.col("_px")).sortWithinPartitions("_zkey", "_mtie")
    n = k2.count()
    t0 = tick(f"assign+shuffle+sort n={n}", t0)
    added = write_range_partitioned(t, spark, keyed, N_OUT, bnds, ["_zkey", "_mtie"])
    t0 = tick(f"write_range_partitioned files={len(added)}", t0)
    import shutil

    shutil.rmtree(tmp, ignore_errors=True)


if __name__ == "__main__":
    main()
