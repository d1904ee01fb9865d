"""Variant test: compute _px inside the pandas UDF (closure preimage
lookup) — no broadcast join in the plan."""

from __future__ import annotations

import os
import shutil
import sys
import tempfile
import time

import numpy as np
import pandas as pd

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

ROWS = int(sys.argv[1]) if len(sys.argv) > 1 else 2000
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
N_OUT = int(os.environ.get("N_OUT", "35"))


def main():
    from pyspark.sql import functions as F
    from pyspark.sql.functions import pandas_udf

    from medalforge_lakehouse_data_spark.format.table import Table
    from medalforge_lakehouse_data_spark.maintenance.clustering import (
        column_bounds,
        curve_boundaries,
        hash_preimages,
        with_curve_key,
    )
    from medalforge_lakehouse_data_spark.session import get_spark
    from medalforge_lakehouse_data_spark.testing.datagen import IMAGES_SCHEMA, images_df

    spark = get_spark(master=f"local[{CPUS}]", shuffle_partitions=CPUS)
    tmp = tempfile.mkdtemp(prefix="repro-rekey3-")
    t = Table.create(os.path.join(tmp, "t"), IMAGES_SCHEMA, partition_spec=["fmt"])
    t.append(spark, images_df(spark, ROWS, seed=99, partitions=CPUS * 2,
                              n_bases=max(64, ROWS // 4)),
             target_file_count=32)

    cl = ["phash", "w", "h"]
    bounds = column_bounds(t, cl)
    keys_only = with_curve_key(t.scan(spark).select(*cl), cl, bounds, "zorder")
    bnds = curve_boundaries(keys_only, N_OUT)
    pre = hash_preimages(spark, N_OUT)

    b = np.asarray(bnds, dtype=np.int64)
    px_lut = np.asarray(pre, dtype=np.int64)

    @pandas_udf("long")
    def _px(zkey: pd.Series, ztie: pd.Series) -> pd.Series:
        z = zkey.to_numpy(dtype=np.int64, na_value=0)
        lo = np.searchsorted(b, z, side="left")
        hi = np.searchsorted(b, z, side="right")
        span = hi - lo + 1
        tie = ztie.to_numpy(dtype=np.int64, na_value=0).astype(np.uint64)
        pid = lo + (tie % span.astype(np.uint64)).astype(np.int64)
        return pd.Series(px_lut[pid])

    def mk():
        df = t.scan(spark)
        keyed = with_curve_key(df, cl, bounds, "zorder")
        return keyed.withColumn("_mtie", F.xxhash64(F.col("image_id")))

    for i in range(3):
        t0 = time.monotonic()
        n = (mk().withColumn("_px", _px(F.col("_zkey"), F.col("_mtie")))
             .repartition(N_OUT, F.col("_px"))
             .sortWithinPartitions("_zkey", "_mtie").count())
        print(f"closure-px run{i} {time.monotonic()-t0:7.2f}s n={n}", flush=True)
    # distribution check: each range id -> own partition
    pdf = (mk().withColumn("_px", _px(F.col("_zkey"), F.col("_mtie")))
           .repartition(N_OUT, F.col("_px"))
           .withColumn("_part", F.spark_partition_id())
           .groupBy("_part").count().toPandas())
    print(f"partitions used: {len(pdf)} / {N_OUT}, "
          f"rows min={pdf['count'].min()} max={pdf['count'].max()}")
    shutil.rmtree(tmp, ignore_errors=True)


if __name__ == "__main__":
    main()
