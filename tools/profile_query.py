"""Per-stage profiler for bench queries (guide §1: measure first).

Usage:
  python tools/profile_query.py x_dedup_minhash [runs]
  python tools/profile_query.py q18 [runs]

Runs the named query (EXT_BENCH_QUERIES or Inventory warm-mode qNN)
under its own job group, then prints every stage of that group with
{name, tasks, executorRunTime, executorCpuTime, shuffle read/write,
python eval time} so CPU can be attributed to a specific operator in
the plan.  Action = .write.format("noop") (guide §1.4) unless --collect
is passed (bench parity).
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def stage_rows(spark, group):
    sc = spark.sparkContext
    tracker = sc.statusTracker()
    gw = sc._gateway
    ss = sc._jsc.sc().statusStore()
    rows = []
    for jid in sorted(tracker.getJobIdsForGroup(group)):
        ji = tracker.getJobInfo(jid)
        if ji is None:
            continue
        for sid in sorted(ji.stageIds):
            try:
                seq = ss.stageData(
                    sid, False, gw.jvm.java.util.ArrayList(), False,
                    gw.new_array(gw.jvm.double, 0),
                )
            except Exception:
                continue
            it = seq.iterator()
            while it.hasNext():
                st = it.next()
                rows.append({
                    "job": jid,
                    "stage": sid,
                    "name": st.name(),
                    "tasks": st.numCompleteTasks(),
                    "run_ms": st.executorRunTime(),
                    "cpu_ms": st.executorCpuTime() / 1e6,
                    "sr_mb": st.shuffleReadBytes() / 1e6,
                    "sw_mb": st.shuffleWriteBytes() / 1e6,
                })
    return rows


def main():
    name = sys.argv[1]
    runs = int(sys.argv[2]) if len(sys.argv) > 2 else 2
    collect = "--collect" in sys.argv
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")

    from pyspark.sql import SparkSession

    spark = (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName("profile_query")
        .config("spark.sql.shuffle.partitions", cpus)
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.ui.enabled", "false")
        .config("spark.ui.showConsoleProgress", "false")
        .config("spark.ui.retainedStages", "20000")
        .config("spark.driver.memory",
                os.environ.get("SPARK_GRAFT_DRIVER_MEM", "16g"))
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    if name.startswith("q"):
        import tempfile

        from mapreduce_spark.engine import Engine
        from mapreduce_spark.inventory import Inventory

        eng = Engine(spark, sf_dir, tempfile.mkdtemp(prefix="prof-"))
        inv = Inventory(spark, sf_dir, engine=eng, warm=True)
        inv.materialize()
        fn = inv.all_queries()[name]

        def mk():
            return fn()
    else:
        from mapreduce_spark.extensions.inventory import EXT_BENCH_QUERIES

        def mk():
            return EXT_BENCH_QUERIES[name](spark, sf_dir)

    def act(df):
        if collect:
            df.collect()
        else:
            df.write.format("noop").mode("overwrite").save()

    act(mk())  # warmup
    sc = spark.sparkContext
    for i in range(runs):
        spark.catalog.clearCache()
        g = f"prof-{name}-{i}"
        sc.setJobGroup(g, g)
        t0 = time.time()
        act(mk())
        wall = time.time() - t0
        sc._jsc.clearJobGroup()
        rows = stage_rows(spark, g)
        print(f"\n=== run {i}: wall {wall:.3f}s  "
              f"stages {len(rows)}  "
              f"cpu {sum(r['cpu_ms'] for r in rows)/1e3:.2f}s ===")
        for r in sorted(rows, key=lambda r: -r["cpu_ms"])[:25]:
            nm = r["name"][:70]
            print(f"  j{r['job']:<4} s{r['stage']:<5} t{r['tasks']:<4} "
                  f"cpu {r['cpu_ms']/1e3:7.2f}s run {r['run_ms']/1e3:7.2f}s "
                  f"sr {r['sr_mb']:6.2f} sw {r['sw_mb']:6.2f}  {nm}")


if __name__ == "__main__":
    main()
