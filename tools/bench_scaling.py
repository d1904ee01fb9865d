"""Two-parallelism scaling evidence (BASELINE.json north_rule).

The rule demands throughput scaling efficiency >= 0.8 from N to 4N
executors; the sandbox proxy (task brief) is the same job on the same
input at local[8] vs local[32]. Each run is a fresh JVM (subprocess) so
measurements don't share JIT/caches.

Workload: the maintenance pipeline on a synthetic image table —
distributed datagen (DCT-heavy) → ingest → bin-packing compaction →
Z-order cluster rewrite → decode+pHash verification scan (Arrow UDFs).
This is the engine's compute profile, not a micro-benchmark.

Usage:
  python tools/bench_scaling.py            # orchestrate 8 vs 32, print table
  python tools/bench_scaling.py --worker N # single measurement (internal)
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

ROWS = int(os.environ.get("SCALING_IMAGE_ROWS", "12000"))
ROUNDS = int(os.environ.get("SCALING_ROUNDS", "3"))


def worker(cpus: int) -> dict:
    from pyspark.sql import functions as F

    from medalforge_lakehouse_data_spark.format.table import Table
    from medalforge_lakehouse_data_spark.maintenance import clustering, compaction
    from medalforge_lakehouse_data_spark.operators.multimodal import with_verification
    from medalforge_lakehouse_data_spark.session import get_spark
    from medalforge_lakehouse_data_spark.testing.datagen import IMAGES_SCHEMA, images_df

    spark = get_spark(app_name=f"scaling-{cpus}", master=f"local[{cpus}]",
                      shuffle_partitions=max(cpus, 8))
    spark.sparkContext.setLogLevel("ERROR")
    with tempfile.TemporaryDirectory() as tmp:
        t0 = time.monotonic()
        t = Table.create(os.path.join(tmp, "imgs"), IMAGES_SCHEMA, partition_spec=["fmt"])
        # fixed input/partitioning regardless of cpus: same job, same plan
        t.append(spark, images_df(spark, ROWS, seed=77, partitions=128),
                 target_file_count=256)
        t_ingest = time.monotonic() - t0

        t0 = time.monotonic()
        # bin target sized so compaction yields ~48 output files: the write
        # stage stays parallel at both cluster sizes (a 2-bin compaction
        # would serialize into 2 single-task writes and cap speedup)
        small_bytes = sum(e.bytes for e in t.files())
        compaction.compact(t, spark, target_file_bytes=max(1, small_bytes // 48),
                           min_file_bytes=256 * 1024 * 1024)
        t_compact = time.monotonic() - t0

        t0 = time.monotonic()
        nbytes = sum(e.bytes for e in t.files())
        clustering.cluster_rewrite(t, spark, columns=("phash", "w", "h"),
                                   curve="zorder",
                                   target_file_bytes=max(1, nbytes // 64))
        t_cluster = time.monotonic() - t0

        t0 = time.monotonic()
        v = with_verification(t.scan(spark)).select(
            F.sum(F.when(F.col("_decodable") & (F.col("_phash_check") == F.col("phash")), 1)
                  .otherwise(0)).alias("ok"),
            F.count("*").alias("n"),
        ).collect()[0]
        t_verify = time.monotonic() - t0
        assert v.ok == v.n == ROWS + 0, (v.ok, v.n)
        total_bytes = t.metadata().current_snapshot().summary["total_bytes"]

    total = t_ingest + t_compact + t_cluster + t_verify
    return {
        "cpus": cpus,
        "rows": ROWS,
        "bytes": total_bytes,
        "ingest_s": round(t_ingest, 2),
        "compact_s": round(t_compact, 2),
        "cluster_s": round(t_cluster, 2),
        "verify_s": round(t_verify, 2),
        "total_s": round(total, 2),
        "rows_per_s": round(ROWS / total, 1),
    }


def main():
    if len(sys.argv) > 2 and sys.argv[1] == "--worker":
        print(json.dumps(worker(int(sys.argv[2]))))
        return
    # The sandbox shares a noisy host: single measurements vary several-fold.
    # Alternate configs for ROUNDS rounds and take the MIN per config (the
    # standard noisy-host protocol; min approximates the uncontended run).
    runs: dict[int, list[dict]] = {8: [], 32: []}
    for _ in range(ROUNDS):
        for cpus in (8, 32):
            for _w in range(30):
                n = subprocess.run(["pgrep", "-c", "java"], capture_output=True, text=True)
                if n.stdout.strip() in ("", "0"):
                    break
                time.sleep(2)
            time.sleep(2)
            out = subprocess.run(
                [sys.executable, os.path.abspath(__file__), "--worker", str(cpus)],
                capture_output=True, text=True,
                cwd=os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
            )
            line = out.stdout.strip().splitlines()[-1]
            r = json.loads(line)
            runs[cpus].append(r)
            print(f"local[{cpus}]: {r}", file=sys.stderr)
    results = {c: min(rs, key=lambda r: r["total_s"]) for c, rs in runs.items()}
    r8, r32 = results[8], results[32]
    speedup = r8["total_s"] / r32["total_s"]
    efficiency = speedup / (32 / 8)
    summary = {
        "local8": r8,
        "local32": r32,
        "speedup_8_to_32": round(speedup, 3),
        "scaling_efficiency": round(efficiency, 3),
        "gate": ">=0.8",
        "pass": efficiency >= 0.8,
    }
    print(json.dumps(summary))


if __name__ == "__main__":
    main()
