"""Per-query isolation harness for the optimization round (guide §1).

NOT part of the frozen driver contract (bench.py is the measured file).
This harness:
  * times each declared DataFrame query with the noop sink so the
    computation is measured, not the sink or a count()'s column pruning;
  * labels jobs via setJobDescription;
  * captures .explain("formatted") to plans/r06/<q>_<tag>.txt.

Usage:
  python bench_extra.py [--queries q1,q2,...] [--tag before|after]
                        [--rounds N] [--plans-only]

Env: SPARK_GRAFT_SF_DIR, SPARK_GRAFT_CPUS (same as bench.py).
"""

from __future__ import annotations

import argparse
import io
import json
import os
import sys
import time
from contextlib import redirect_stdout

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", os.cpu_count() or 8))

# queries that return a pure (lazy) DataFrame — noop-sink timeable and
# plan-captureable. Fixture queries (merge_*, incremental_*, rollback_*,
# maintenance_*) build tables internally and materialize; they are timed
# end-to-end instead.
LAZY = [
    "pricing_summary", "shipping_priority", "local_suppliers",
    "top_orders_per_customer", "events_by_type", "events_windowed",
    "forecast_revenue", "semi_join_customers", "anti_join_customers",
    "having_big_orders", "distinct_agg", "avg_over_subquery",
    "date_rollup_monthly", "rollup_status_priority",
    "etl_trim", "etl_cast", "etl_normalize_dates", "etl_coerce_date",
    "etl_clamp", "etl_drop_if_null", "etl_dedup", "etl_dedup_agg",
    "etl_union_by_name", "check_unique_flag", "check_split",
    "docs_token_stats", "docs_lang_id", "docs_exact_dedup",
    "docs_ngram_jaccard", "docs_quality", "docs_fingerprint",
    "docs_minhash_near_dup", "docs_simhash", "emb_near_dup",
    "ann_topk", "ann_ivf_topk",
]


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--queries", default="")
    ap.add_argument("--tag", default="before")
    ap.add_argument("--rounds", type=int, default=1)
    ap.add_argument("--plans-only", action="store_true")
    ap.add_argument("--no-plans", action="store_true")
    args = ap.parse_args()

    import __spark_entry__ as em
    from medalforge_lakehouse_data_spark.session import get_spark

    spark = get_spark(app_name="mf-bench-extra", master=f"local[{CPUS}]",
                      shuffle_partitions=max(CPUS, 8))
    spark.sparkContext.setLogLevel("ERROR")
    from pyspark.sql import functions as F

    def _warm_iter(batches):
        yield from batches

    spark.range(100_000).groupBy((F.col("id") % 7).alias("g")).count().collect()
    spark.range(10_000).mapInPandas(_warm_iter, "id long").count()

    qs = em.queries()
    names = [q for q in args.queries.split(",") if q] or LAZY
    plans_dir = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                             "plans", "r06")
    os.makedirs(plans_dir, exist_ok=True)

    timings: dict[str, list[float]] = {}
    for name in names:
        fn = qs[name]
        df = fn(spark, SF_DIR)
        if not args.no_plans:
            buf = io.StringIO()
            with redirect_stdout(buf):
                df.explain("formatted")
            with open(os.path.join(plans_dir, f"{name}_{args.tag}.txt"), "w") as f:
                f.write(buf.getvalue())
        if args.plans_only:
            continue
        for r in range(args.rounds):
            spark.sparkContext.setJobDescription(f"{name} [{args.tag} r{r}]")
            spark.catalog.clearCache()
            df = fn(spark, SF_DIR)
            t0 = time.monotonic()
            df.write.format("noop").mode("overwrite").save()
            timings.setdefault(name, []).append(
                round(time.monotonic() - t0, 3))
            spark.sparkContext.setJobDescription(None)
    out = {
        "tag": args.tag, "sf": SF_DIR, "cpus": CPUS,
        "timings": {k: v for k, v in timings.items()},
        "min": {k: min(v) for k, v in timings.items()},
    }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
