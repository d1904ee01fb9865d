"""Profile the bench's maint_merge stage in isolation.

Builds the same image-table state as bench.py (ingest → compact →
cluster → transcode) once, snapshots the table directory, then times
merge_into under different configs on fresh copies:

  rekey     — default (clustering-preserving one-pass range write)
  norekey   — merge.cluster-rekey-min-bytes huge (plain rewrite path)

Usage: python tools/repro_merge.py [rows]
"""

from __future__ import annotations

import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

ROWS = int(sys.argv[1]) if len(sys.argv) > 1 else 2000
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "8"))


def main():
    from pyspark.sql import functions as F

    from medalforge_lakehouse_data_spark.format.table import Table
    from medalforge_lakehouse_data_spark.maintenance import clustering, compaction, transcode
    from medalforge_lakehouse_data_spark.operators.merge import merge_into
    from medalforge_lakehouse_data_spark.session import get_spark
    from medalforge_lakehouse_data_spark.testing.datagen import IMAGES_SCHEMA, images_df

    spark = get_spark(master=f"local[{CPUS}]", shuffle_partitions=CPUS)
    tmp = tempfile.mkdtemp(prefix="repro-merge-")
    base = os.path.join(tmp, "base")
    t = Table.create(base, IMAGES_SCHEMA, partition_spec=["fmt"],
                     properties={"bloom.columns": "image_id"})
    t0 = time.monotonic()
    t.append(spark, images_df(spark, ROWS, seed=99, partitions=CPUS * 2,
                              n_bases=max(64, ROWS // 4)),
             target_file_count=max(64, CPUS * 4))
    print(f"ingest         {time.monotonic()-t0:7.2f}s")
    t0 = time.monotonic()
    compaction.compact(t, spark, target_file_bytes=32 * 1024 * 1024)
    print(f"compact        {time.monotonic()-t0:7.2f}s")
    post = sum(e.bytes for e in t.files())
    t0 = time.monotonic()
    clustering.cluster_rewrite(t, spark, columns=("phash", "w", "h"),
                               curve="zorder",
                               target_file_bytes=max(1, post // max(16, CPUS)))
    print(f"cluster        {time.monotonic()-t0:7.2f}s")
    t0 = time.monotonic()
    transcode.transcode_rewrite(t, spark, target_fmt="lossy", quality=96,
                                target_file_count=max(16, CPUS))
    print(f"transcode      {time.monotonic()-t0:7.2f}s")
    print("props:", {k: v for k, v in t.metadata().properties.items()
                     if "cluster" in k or "target" in k})

    upd = images_df(spark, ROWS // 20, seed=99).withColumn(
        "caption", F.concat(F.lit("v2 "), F.col("caption")))
    ins = images_df(spark, ROWS // 100, seed=99, id_offset=50_000_000)
    src = upd.unionByName(ins)

    if os.environ.get("REPRO_TIMERS"):
        from medalforge_lakehouse_data_spark.maintenance import clustering as _cl
        from medalforge_lakehouse_data_spark.operators import merge as _mg

        def wrap(mod, name):
            orig = getattr(mod, name)

            def timed(*a, **kw):
                t0 = time.monotonic()
                out = orig(*a, **kw)
                print(f"    [{name}] {time.monotonic()-t0:6.2f}s", flush=True)
                return out

            setattr(mod, name, timed)

        wrap(_cl, "curve_boundaries")
        wrap(_cl, "column_bounds")
        wrap(_mg, "_prune_affected") if hasattr(_mg, "_prune_affected") else None
        worig = Table._write_data_files

        def wtimed(self, *a, **kw):
            t0 = time.monotonic()
            out = worig(self, *a, **kw)
            print(f"    [_write_data_files] {time.monotonic()-t0:6.2f}s", flush=True)
            return out

        Table._write_data_files = wtimed
        # re-point merge's imported symbols
        _mg.write_range_partitioned = _cl.write_range_partitioned

    for label, props in (
        ("norekey", {"merge.cluster-rekey-min-bytes": str(1 << 60)}),
        ("rekey", {}),
    ):
        root = os.path.join(tmp, label)
        shutil.copytree(base, root)
        tc = Table(root)
        if props:
            tc.set_properties(props)
        t0 = time.monotonic()
        mm = merge_into(tc, src, ["image_id"], spark)
        dt = time.monotonic() - t0
        print(f"merge/{label:8s} {dt:7.2f}s affected={mm['affected_files']}"
              f"/{mm['files_total']} added={mm.get('added_files')}")
    shutil.rmtree(tmp, ignore_errors=True)


if __name__ == "__main__":
    main()
