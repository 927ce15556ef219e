"""Benchmark harness (BASELINE.md protocol).

Runs the SURVEY §2.1 inventory at $SPARK_GRAFT_SF_DIR (default
/root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS]:

- COLD: materialize every fixture view to sorted Parquet (build time);
- WARM: each query against the persisted indexes, stale='ok',
  median of N runs (default 3).

Prints ONE JSON line:
  {"metric": "warm_total_sec_read_path", "value": <sum of medians>,
   "unit": "sec", "queries_counted": N, "queries": {"q01": sec, ...},
   "sf": <sf>, "cold_build_sec": <total build>, "cpus": N}

``value`` totals every inventory read-path query (q18 excluded — it is
the M1 maintenance metamorphic check, reported separately under
``maintenance_q18_sec``); extension operators are benched individually
in ``queries`` but not added to the headline.
"""

from __future__ import annotations

import json
import os
import shutil
import statistics
import sys
import tempfile
import time


def _layered_read_overhead(spark, sf_dir: str, runs: int) -> dict:
    """LSM read-path overhead at depth (SURVEY §7.3 / VERDICT r1 #7):
    build one view as base + 9 (tomb, delta) layers, time a grouped
    read on the 10-piece stack, compact, time it again.  Reported as
    {layered_read_sec, compacted_read_sec, layered_read_ratio}."""
    import statistics
    import tempfile

    from pyspark.sql import functions as F

    from mapreduce_spark.engine import Engine
    from mapreduce_spark.operators.mapphase import MapSpec

    store = tempfile.mkdtemp(prefix="mrlayers-")
    try:
        eng = Engine(spark, sf_dir, store, compact_after=99)
        view = {
            "map": MapSpec(
                "lineitem",
                [("str", "l_returnflag"), ("str", "l_linestatus")],
                ("num", "l_quantity"),
            ),
            "reduce": "_sum",
        }
        eng.put_design("layers", {"v": view})
        raw = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
        seq = (F.col("l_orderkey") * 8 + F.col("l_linenumber")).cast(
            "long"
        )
        hi = raw.agg(F.max(seq)).collect()[0][0]
        step = hi // 10 + 1
        for i in range(10):
            eng.update_view(
                "layers/v",
                changes=raw.filter(
                    (seq > i * step) & (seq <= (i + 1) * step)
                ),
            )

        def timed() -> float:
            samples = []
            for _ in range(runs):
                t = time.time()
                eng.query("layers/v", group_level=2,
                          stale="ok").df.collect()
                samples.append(time.time() - t)
            return round(statistics.median(samples), 4)

        layered = timed()
        sig = eng.registry.resolve("layers", "v")
        eng._compact(sig, eng.registry.get_view(sig))
        compacted = timed()
        return {
            "layered_read_sec": layered,
            "compacted_read_sec": compacted,
            "layered_read_ratio": round(layered / max(compacted, 1e-9),
                                        2),
        }
    finally:
        shutil.rmtree(store, ignore_errors=True)


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

        # q18 is a REBUILD-equivalence metamorphic check (two full
        # builds + a delta merge by construction) — it measures M1
        # maintenance, not the read path, so it reports under its own
        # metric instead of inflating the warm read-path headline
        maintenance_q18 = per_query.get("q18")
        total = round(
            sum(v for k, v in per_query.items() if k != "q18"), 4
        )
        read_path_count = len([k for k in per_query if k != "q18"])

        # training-data extension headliners (corpus-level batch jobs).
        # Median of `runs` like the inventory queries: single-shot
        # timings on a long-lived session swing several-× with GC /
        # block-manager state, which made earlier rounds' numbers
        # unreproducible.  Cache cleared between operators so one
        # query's persisted intermediates can't pressure the next.
        from mapreduce_spark.extensions.inventory import (
            EXT_BENCH_QUERIES,
        )

        # every extension oracle row gets a bench number (a perf
        # regression in any operator must be visible round-over-round)
        for name in sorted(EXT_BENCH_QUERIES):
            spark.catalog.clearCache()
            EXT_BENCH_QUERIES[name](spark, sf_dir).collect()  # warmup
            samples = []
            for _ in range(runs):
                spark.catalog.clearCache()
                t = time.time()
                EXT_BENCH_QUERIES[name](spark, sf_dir).collect()
                samples.append(time.time() - t)
            per_query[name] = round(statistics.median(samples), 4)

        layered = _layered_read_overhead(spark, sf_dir, runs)
        print(
            json.dumps(
                {
                    "metric": "warm_total_sec_read_path",
                    "value": total,
                    "queries_counted": read_path_count,
                    "unit": "sec",
                    "queries": per_query,
                    "sf": float(sf) if sf.replace(".", "").isdigit()
                    else sf,
                    "cold_build_sec": round(cold_sec, 4),
                    "maintenance_q18_sec": maintenance_q18,
                    **layered,
                    "cpus": int(cpus),
                    "runs": runs,
                }
            )
        )
    finally:
        shutil.rmtree(store, ignore_errors=True)


if __name__ == "__main__":
    main()
