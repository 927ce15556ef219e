"""Same-session A/B: right_size'd vs raw input for the cheap
single-scan text ops and the mapInPandas media ops (guide §1 —
measure in ONE session so box drift between windows cannot masquerade
as a result).

The raw arm monkeypatches util.right_size to identity; operators
import it lazily, so the patch takes effect per invocation.

Usage: python tools/ab_right_size.py [runs]
"""

from __future__ import annotations

import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    runs = int(sys.argv[1]) if len(sys.argv) > 1 else 5
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")

    from pyspark.sql import SparkSession

    spark = (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName("ab_right_size")
        .config("spark.sql.shuffle.partitions", cpus)
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.ui.enabled", "false")
        .config("spark.ui.showConsoleProgress", "false")
        .config("spark.ui.retainedStages", "20000")
        .config("spark.driver.memory", "16g")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    sc = spark.sparkContext

    from bench import _group_metrics
    from mapreduce_spark.extensions import (
        decontam,
        dedup,
        text,
    )
    from mapreduce_spark.extensions import inventory as xinv
    from mapreduce_spark.extensions import util

    real_rs = util.right_size
    # text/decontam/dedup bind right_size at module import time —
    # patch every binding, not just util's
    mods = [util, text, decontam, dedup, xinv]

    rows = [
        "x_text_stats", "x_text_langid", "x_text_pii", "x_text_fp",
        "x_text_rep", "x_mm_features", "x_mm_ppm", "x_mm_wav",
        "x_dedup_simhash",
    ]

    def run_case(name, label, patch):
        fake = lambda df, min_factor=1: df  # noqa: E731
        for m in mods:
            if hasattr(m, "right_size"):
                m.right_size = fake if patch else real_rs
        try:
            fn = xinv.EXT_BENCH_QUERIES[name]
            fn(spark, sf_dir).collect()  # warmup
            walls, cpus_ = [], []
            for i in range(runs):
                spark.catalog.clearCache()
                g = f"ab-{name}-{label}-{i}"
                sc.setJobGroup(g, g)
                t0 = time.time()
                fn(spark, sf_dir).collect()
                walls.append(time.time() - t0)
                sc._jsc.clearJobGroup()
                cpu, _ = _group_metrics(spark, g)
                cpus_.append(cpu / 1e9)
            print(
                f"{name:16s} {label:4s} wall {statistics.median(walls):7.3f}"
                f"  cpu {statistics.median(cpus_):7.3f}", flush=True,
            )
        finally:
            for m in mods:
                if hasattr(m, "right_size"):
                    m.right_size = real_rs

    for name in rows:
        # interleave arms so slow box drift hits both equally
        run_case(name, "raw", True)
        run_case(name, "rs", False)


if __name__ == "__main__":
    main()
