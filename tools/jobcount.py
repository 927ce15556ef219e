"""Jobs-per-query audit for the warm read path (VERDICT r10 #1).

Materializes the inventory at a small SF, then runs each warm query
once inside its own Spark job group and reports how many Spark JOBS
(and stages) each query launched.  Job count — not wall — is the
scheduler-latency exposure that co-tenant contention multiplies: a
query with 0.3 CPU-s and 9 jobs pays 9 scheduling round-trips.

Usage: python tools/jobcount.py [sf_dir] [q12 q14 ...]
"""

from __future__ import annotations

import json
import os
import sys
import tempfile
import shutil


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])
    sys.path.insert(0, os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))))
    from pyspark.sql import SparkSession

    spark = (
        SparkSession.builder.master("local[8]")
        .appName("jobcount")
        .config("spark.sql.shuffle.partitions", "8")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.ui.enabled", "false")
        .config("spark.ui.showConsoleProgress", "false")
        .config("spark.ui.retainedStages", "20000")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    from mapreduce_spark.engine import Engine
    from mapreduce_spark.inventory import Inventory

    store = tempfile.mkdtemp(prefix="mrjobs-")
    try:
        eng = Engine(spark, sf_dir, store)
        inv = Inventory(spark, sf_dir, engine=eng, warm=True)
        inv.materialize()

        sc = spark.sparkContext
        tracker = sc.statusTracker()
        out = {}
        for name, fn in inv.all_queries().items():
            if only and name not in only:
                continue
            fn().collect()  # warmup
            g = f"jc-{name}"
            sc.setJobGroup(g, g)
            try:
                fn().collect()
            finally:
                sc._jsc.clearJobGroup()
            jids = sorted(tracker.getJobIdsForGroup(g))
            stages = 0
            for jid in jids:
                ji = tracker.getJobInfo(jid)
                if ji is not None:
                    stages += len(ji.stageIds)
            out[name] = {"jobs": len(jids), "stages": stages}
        for k, v in out.items():
            print(f"{k}: jobs={v['jobs']} stages={v['stages']}")
        print(json.dumps(out))
    finally:
        shutil.rmtree(store, ignore_errors=True)


if __name__ == "__main__":
    main()
