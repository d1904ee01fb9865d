"""Cluster-stage scaling at volume (round-2 VERDICT #9).

The full-pipeline scaling run (tools/bench_scaling.py) measures the
cluster stage at ~100 MB, where fixed costs (driver planning, stage
launch) cap its speedup. This harness isolates the stage at >=4x the
bytes: the input table (datagen -> ingest -> compact -> transcode) is
built ONCE at high parallelism, then each measurement is a fresh JVM
that copies the table directory and runs ONLY cluster_rewrite at the
target parallelism. Configs alternate, min-of-rounds per config, BLAS
pinned — the same noisy-host protocol as the main scaling run.

Also verifies the roundtrip each run: row count and content fingerprint
(xxhash64 of every row's id+phash+byte length, XOR-combined) identical
pre/post rewrite.

Usage:
  python tools/bench_scaling_cluster.py                 # orchestrate
  python tools/bench_scaling_cluster.py --worker N DIR  # internal
Env: SCALING_IMAGE_ROWS (default 96000), SCALING_ROUNDS (default 3),
     SCALING_N_LO / SCALING_N_HI (default 2 / 8).
"""

from __future__ import annotations

import json
import os
import shutil
import subprocess
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

ROWS = int(os.environ.get("SCALING_IMAGE_ROWS", "96000"))
ROUNDS = int(os.environ.get("SCALING_ROUNDS", "3"))
N_LO = int(os.environ.get("SCALING_N_LO", "2"))
N_HI = int(os.environ.get("SCALING_N_HI", "8"))
BUILD_CPUS = int(os.environ.get("SCALING_BUILD_CPUS", "16"))


def _fingerprint(spark, df):
    # order-insensitive content fingerprint: bit_xor of per-row hashes
    # (overflow-free regardless of ANSI mode, unlike a sum)
    from pyspark.sql import functions as F

    row = df.select(
        F.count("*").alias("n"),
        F.expr("bit_xor(xxhash64(image_id, phash, length(bytes)))").alias("fp"),
    ).collect()[0]
    return int(row["n"]), int(row["fp"] or 0)


def build(table_dir: str) -> None:
    from medalforge_lakehouse_data_spark.format.table import Table
    from medalforge_lakehouse_data_spark.maintenance import compaction
    from medalforge_lakehouse_data_spark.maintenance.transcode import transcode_rewrite
    from medalforge_lakehouse_data_spark.session import get_spark
    from medalforge_lakehouse_data_spark.testing.datagen import IMAGES_SCHEMA, images_df

    spark = get_spark(app_name="scaling-build", master=f"local[{BUILD_CPUS}]",
                      shuffle_partitions=max(BUILD_CPUS, 8))
    spark.sparkContext.setLogLevel("ERROR")
    t = Table.create(table_dir, IMAGES_SCHEMA, partition_spec=["fmt"])
    t.append(spark, images_df(spark, ROWS, seed=77, partitions=128, n_bases=ROWS),
             target_file_count=256)
    small = sum(e.bytes for e in t.files())
    compaction.compact(t, spark, target_file_bytes=max(1, small // 48),
                       min_file_bytes=256 * 1024 * 1024)
    transcode_rewrite(t, spark, target_fmt="lossy", quality=96,
                      target_file_count=64)
    total = t.metadata().current_snapshot().summary["total_bytes"]
    print(json.dumps({"built_rows": ROWS, "built_bytes": total}), file=sys.stderr)
    spark.stop()


def worker(cpus: int, base_dir: str) -> dict:
    for var in ("OMP_NUM_THREADS", "OPENBLAS_NUM_THREADS", "MKL_NUM_THREADS"):
        os.environ[var] = "1"
    from medalforge_lakehouse_data_spark.format.table import Table
    from medalforge_lakehouse_data_spark.maintenance import clustering
    from medalforge_lakehouse_data_spark.session import get_spark
    from medalforge_lakehouse_data_spark.testing.datagen import images_df

    spark = get_spark(app_name=f"scaling-cluster-{cpus}", master=f"local[{cpus}]",
                      shuffle_partitions=max(cpus, 8))
    spark.sparkContext.setLogLevel("ERROR")
    # warm JVM + python workers (excluded from the measurement, both configs)
    images_df(spark, 64, seed=1, partitions=8).count()
    tmp = tempfile.mkdtemp(prefix="scaling-cluster-")
    root = os.path.join(tmp, "t")
    try:
        shutil.copytree(base_dir, root)
        t = Table(root)
        n0, fp0 = _fingerprint(spark, t.scan(spark))
        nbytes = sum(e.bytes for e in t.files())
        t0 = time.monotonic()
        clustering.cluster_rewrite(t, spark, columns=("phash", "w", "h"),
                                   curve="zorder",
                                   target_file_bytes=max(1, nbytes // 64))
        dt = time.monotonic() - t0
        n1, fp1 = _fingerprint(spark, t.scan(spark))
        assert (n0, fp0) == (n1, fp1), ("roundtrip fingerprint changed",
                                        (n0, fp0), (n1, fp1))
        return {"cpus": cpus, "rows": n0, "bytes": nbytes,
                "cluster_s": round(dt, 2),
                "gb_per_min": round((nbytes / 1e9) / (dt / 60), 3),
                "fingerprint_ok": True}
    finally:
        shutil.rmtree(tmp, ignore_errors=True)
        spark.stop()


def main():
    if len(sys.argv) > 3 and sys.argv[1] == "--worker":
        print(json.dumps(worker(int(sys.argv[2]), sys.argv[3])))
        return
    base = tempfile.mkdtemp(prefix="scaling-cluster-base-")
    table_dir = os.path.join(base, "t")
    try:
        build(table_dir)
        runs: dict[int, list[dict]] = {N_LO: [], N_HI: []}
        for _ in range(ROUNDS):
            for cpus in (N_LO, N_HI):
                for _w in range(30):
                    n = subprocess.run(["pgrep", "-c", "java"],
                                       capture_output=True, text=True)
                    if n.stdout.strip() in ("", "0"):
                        break
                    time.sleep(2)
                time.sleep(2)
                out = subprocess.run(
                    [sys.executable, os.path.abspath(__file__), "--worker",
                     str(cpus), table_dir],
                    capture_output=True, text=True,
                    cwd=os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                )
                lines = [ln for ln in out.stdout.strip().splitlines()
                         if ln.startswith("{")]
                if not lines:
                    print(f"worker local[{cpus}] failed:\n{out.stderr[-2000:]}",
                          file=sys.stderr)
                    continue
                r = json.loads(lines[-1])
                runs[cpus].append(r)
                print(f"local[{cpus}]: {r}", file=sys.stderr)
        lo = min(runs[N_LO], key=lambda r: r["cluster_s"])
        hi = min(runs[N_HI], key=lambda r: r["cluster_s"])
        speedup = lo["cluster_s"] / hi["cluster_s"]
        summary = {
            "stage": "cluster_rewrite",
            f"local{N_LO}": lo,
            f"local{N_HI}": hi,
            "n_lo": N_LO, "n_hi": N_HI,
            "rounds": ROUNDS,
            "speedup_lo_to_hi": round(speedup, 3),
            "scaling_efficiency": round(speedup / (N_HI / N_LO), 3),
        }
        print(json.dumps(summary))
    finally:
        shutil.rmtree(base, ignore_errors=True)


if __name__ == "__main__":
    main()
