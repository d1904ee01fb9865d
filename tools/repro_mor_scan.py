"""Profile the merge-on-read scan tax: table + N MoR merges, then scan."""

from __future__ import annotations

import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

ROWS = int(sys.argv[1]) if len(sys.argv) > 1 else 12000
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
N_MOR = int(os.environ.get("N_MOR", "1"))


def main():
    from pyspark.sql import functions as F

    from medalforge_lakehouse_data_spark.format.table import Table
    from medalforge_lakehouse_data_spark.operators.merge import merge_into
    from medalforge_lakehouse_data_spark.session import get_spark
    from medalforge_lakehouse_data_spark.testing.datagen import IMAGES_SCHEMA, images_df

    spark = get_spark(master=f"local[{CPUS}]", shuffle_partitions=CPUS)
    tmp = tempfile.mkdtemp(prefix="repro-mor-")
    t = Table.create(os.path.join(tmp, "t"), IMAGES_SCHEMA, partition_spec=["fmt"],
                     properties={"bloom.columns": "image_id"})
    t.append(spark, images_df(spark, ROWS, seed=99, partitions=CPUS * 2,
                              n_bases=max(64, ROWS // 4)),
             target_file_count=32)
    t0 = time.monotonic()
    n0 = t.scan(spark).count()
    print(f"scan_pre_mor   {time.monotonic()-t0:6.2f}s n={n0}")
    for i in range(N_MOR):
        upd = images_df(spark, ROWS // 100, seed=100 + i).withColumn(
            "caption", F.concat(F.lit("v2 "), F.col("caption")))
        merge_into(t, upd, ["image_id"], spark, strategy="merge-on-read")
    print(f"delete files: {len(t.delete_files())}")
    for i in range(3):
        t0 = time.monotonic()
        n1 = t.scan(spark).count()
        print(f"scan_post_mor  {time.monotonic()-t0:6.2f}s n={n1}")
    # where does time go? count with only the seq join (no deletes path)
    t0 = time.monotonic()
    df = t.scan(spark)
    df.explain("formatted")
    print(f"explain        {time.monotonic()-t0:6.2f}s")
    shutil.rmtree(tmp, ignore_errors=True)


if __name__ == "__main__":
    main()
