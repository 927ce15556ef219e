"""Per-job detail for one warm query: what does each Spark job DO?

Usage: python tools/jobdetail.py q01 [q11 ...]
"""

from __future__ import annotations

import os
import sys
import tempfile
import shutil


def main() -> None:
    names = sys.argv[1:] or ["q01"]
    sf_dir = "/root/testdata/sf0.01"
    sys.path.insert(0, os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))))
    from pyspark.sql import SparkSession

    spark = (
        SparkSession.builder.master("local[8]")
        .appName("jobdetail")
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

    store = tempfile.mkdtemp(prefix="mrjd-")
    try:
        eng = Engine(spark, sf_dir, store)
        inv = Inventory(spark, sf_dir, engine=eng, warm=True)
        inv.materialize()
        sc = spark.sparkContext
        tracker = sc.statusTracker()
        gw = sc._gateway
        ss = sc._jsc.sc().statusStore()
        qs = inv.all_queries()
        for name in names:
            fn = qs[name]
            fn().collect()  # warmup
            g = f"jd-{name}"
            sc.setJobGroup(g, g)
            try:
                fn().collect()
            finally:
                sc._jsc.clearJobGroup()
            print(f"=== {name} ===")
            for jid in sorted(tracker.getJobIdsForGroup(g)):
                ji = tracker.getJobInfo(jid)
                if ji is None:
                    continue
                sdescs = []
                for sid in ji.stageIds:
                    try:
                        st = ss.stageData(
                            sid, False, gw.jvm.java.util.ArrayList(),
                            False, gw.new_array(gw.jvm.double, 0),
                        )
                        it = st.iterator()
                        while it.hasNext():
                            s = it.next()
                            sdescs.append(
                                f"s{sid}[{s.numTasks()}t] "
                                + s.name().split("\n")[0][:90]
                            )
                    except Exception:
                        sdescs.append(f"s{sid}[?]")
                print(f"  job {jid}:")
                for d in sdescs:
                    print(f"    {d}")
    finally:
        shutil.rmtree(store, ignore_errors=True)


if __name__ == "__main__":
    main()
