"""Benchmark harness (BASELINE.md protocol).

Runs the SURVEY §2.1 inventory at $SPARK_GRAFT_SF_DIR (default
/root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS]:

- COLD: materialize every fixture view to sorted Parquet (build time);
- WARM: each query against the persisted indexes, stale='ok',
  median of N runs (default 3).

Prints ONE JSON line:
  {"metric": "warm_total_sec_q01_q20", "value": <sum of medians>,
   "unit": "sec", "queries": {"q01": sec, ...}, "sf": <sf>,
   "cold_build_sec": <total build>, "cpus": N}
"""

from __future__ import annotations

import json
import os
import shutil
import statistics
import sys
import tempfile
import time


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    runs = int(os.environ.get("SPARK_GRAFT_BENCH_RUNS", "3"))
    sf = sf_dir.rstrip("/").rsplit("sf", 1)[-1]

    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    from pyspark.sql import SparkSession

    spark = (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName("mapreduce_spark_bench")
        .config("spark.sql.shuffle.partitions", cpus)
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory",
                os.environ.get("SPARK_GRAFT_DRIVER_MEM", "16g"))
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    from mapreduce_spark.engine import Engine
    from mapreduce_spark.inventory import Inventory

    store = tempfile.mkdtemp(prefix="mrbench-")
    try:
        eng = Engine(spark, sf_dir, store)
        inv = Inventory(spark, sf_dir, engine=eng, warm=True)

        t0 = time.time()
        inv.materialize()
        cold_sec = time.time() - t0

        per_query: dict[str, float] = {}
        for name, fn in inv.all_queries().items():
            fn().collect()  # warmup (plan/codegen caches)
            samples = []
            for _ in range(runs):
                t = time.time()
                fn().collect()
                samples.append(time.time() - t)
            per_query[name] = round(statistics.median(samples), 4)

        total = round(sum(per_query.values()), 4)

        # training-data extension headliners (corpus-level batch jobs).
        # Median of `runs` like the inventory queries: single-shot
        # timings on a long-lived session swing several-× with GC /
        # block-manager state, which made earlier rounds' numbers
        # unreproducible.  Cache cleared between operators so one
        # query's persisted intermediates can't pressure the next.
        from mapreduce_spark.extensions.inventory import EXT_QUERIES

        for name in (
            "x_text_stats x_dedup_exact x_dedup_minhash x_dedup_simhash "
            "x_dedup_embedding x_sim_topk x_sim_ivf x_mm_features"
        ).split():
            samples = []
            for _ in range(runs):
                spark.catalog.clearCache()
                t = time.time()
                EXT_QUERIES[name](spark, sf_dir).collect()
                samples.append(time.time() - t)
            per_query[name] = round(statistics.median(samples), 4)
        print(
            json.dumps(
                {
                    "metric": "warm_total_sec_q01_q20",
                    "value": total,
                    "unit": "sec",
                    "queries": per_query,
                    "sf": float(sf) if sf.replace(".", "").isdigit()
                    else sf,
                    "cold_build_sec": round(cold_sec, 4),
                    "cpus": int(cpus),
                    "runs": runs,
                }
            )
        )
    finally:
        shutil.rmtree(store, ignore_errors=True)


if __name__ == "__main__":
    main()
