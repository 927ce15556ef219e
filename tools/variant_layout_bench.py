"""Doc-body layout experiment (round 11, VERDICT r10 #4): JSON-string
vs shredded-VARIANT storage for raw doc sources.

Synthesizes a q31-shaped raw docs table from the sf0.1 documents
fixture (lang, n_chars, text fields inside a JSON body), stores it
twice — ``doc_json STRING`` and ``doc_var VARIANT`` (shredded,
sources.docs.shred_raw_table) — and measures the variant-tier build
and an incremental refresh on each layout: wall, executor CPU, scan
input bytes.

Prints one JSON line for PLANS.md / BASELINE.md.

Usage: python tools/variant_layout_bench.py [sf_dir]
"""

from __future__ import annotations

import json
import os
import sys
import tempfile
import time

sys.path.insert(
    0, os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
)


def _group_metrics(spark, group):
    sc = spark.sparkContext
    tracker = sc.statusTracker()
    gw = sc._gateway
    ss = sc._jsc.sc().statusStore()
    cpu = inp = 0
    for jid in tracker.getJobIdsForGroup(group):
        ji = tracker.getJobInfo(jid)
        if ji is None:
            continue
        for sid in ji.stageIds:
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
                cpu += st.executorCpuTime()
                inp += st.inputBytes()
    return cpu, inp


def measure(spark, sf_dir, table, js, label):
    from pyspark.sql import functions as F

    from mapreduce_spark.engine import Engine
    from mapreduce_spark.sources.docs import load_table

    sc = spark.sparkContext
    out = {}
    eng = Engine(spark, sf_dir, tempfile.mkdtemp(prefix="vlb-"))
    eng.put_design("d", {"v": {"map": (table, js), "reduce": "_sum"}})
    from mapreduce_spark.functions.jsvariant import VariantJSView

    vd = next(iter(eng._defs.values()))
    out["tier"] = type(vd.map_def).__name__
    assert isinstance(vd.map_def, VariantJSView), (
        f"{label}: source did not compile to the variant tier"
    )
    raw = load_table(spark, sf_dir, table)
    hi = raw.agg(F.max("seq")).collect()[0][0]
    cut = int(hi * 0.99)

    g = f"{label}-build"
    sc.setJobGroup(g, g)
    t = time.time()
    eng.update_view("d/v", to_seq=cut)
    out["build_wall"] = round(time.time() - t, 3)
    sc._jsc.clearJobGroup()
    cpu, inp = _group_metrics(spark, g)
    out["build_cpu"] = round(cpu / 1e9, 3)
    out["build_input_mb"] = round(inp / 1e6, 2)

    g = f"{label}-refresh"
    sc.setJobGroup(g, g)
    t = time.time()
    eng.update_view("d/v")  # the remaining ~1% of seqs
    out["refresh_wall"] = round(time.time() - t, 3)
    sc._jsc.clearJobGroup()
    cpu, inp = _group_metrics(spark, g)
    out["refresh_cpu"] = round(cpu / 1e9, 3)
    out["refresh_input_mb"] = round(inp / 1e6, 2)

    g = f"{label}-read"
    sc.setJobGroup(g, g)
    t = time.time()
    eng.query("d/v", group=True, stale="ok").df.collect()
    out["read_wall"] = round(time.time() - t, 3)
    sc._jsc.clearJobGroup()
    return out


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    from pyspark.sql import SparkSession
    from pyspark.sql import functions as F

    spark = (
        SparkSession.builder.master(
            f"local[{os.environ.get('SPARK_GRAFT_CPUS', '32')}]"
        )
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.ui.enabled", "false")
        .config("spark.ui.showConsoleProgress", "false")
        .config("spark.ui.retainedStages", "20000")
        .config("spark.driver.memory", "8g")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    from mapreduce_spark.sources.docs import (
        raw_doc_table,
        register_table,
        shred_raw_table,
    )

    # q31-shaped raw docs: body carries lang, n_chars AND the full
    # text (the column a 100 TB corpus actually makes heavy), ×8
    # replicas of the sf0.1 documents table
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    reps = spark.range(40).withColumnRenamed("id", "_rep")
    shift = docs.agg(F.max("doc_id")).collect()[0][0] + 1
    base = (
        docs.crossJoin(reps)
        .withColumn("doc_id",
                    F.col("doc_id") + F.col("_rep") * F.lit(shift))
        .select(
            F.format_string("raw:%08d", "doc_id").alias("_id"),
            F.col("doc_id").cast("long").alias("seq"),
            F.to_json(F.struct(
                F.col("lang"),
                F.length("text").cast("double").alias("n_chars"),
                # fixture texts are tiny — pad to ~1 KB bodies so the
                # layouts differ the way a real corpus does (the body
                # dominates; the view reads only lang + n_chars)
                F.repeat(F.col("text"), 40).alias("text"),
            )).alias("doc_json"),
        )
    )
    sdir = tempfile.mkdtemp(prefix="vlb-s-")
    vdir = tempfile.mkdtemp(prefix="vlb-v-")
    base.write.mode("overwrite").parquet(f"{sdir}/jdocs.parquet")
    register_table(raw_doc_table("jdocs"))
    t = time.time()
    p = shred_raw_table(spark, sdir, "jdocs", vdir)
    shred_sec = round(time.time() - t, 2)
    os.rename(p, f"{vdir}/vdocs.parquet")
    register_table(raw_doc_table("vdocs"))

    # the view reads lang + n_chars — NOT text: the shredded layout
    # should scan only the two shredded columns, the string layout
    # must read (and parse) every full body
    js = ("function(doc){ if (doc.lang !== 'en') "
          "{ emit(doc.lang, doc.n_chars); } }")
    # warmup leg (JVM/codegen)
    measure(spark, sdir, "jdocs", js, "warm0")

    def du(d):
        tot = 0
        for root, _dirs, files in os.walk(d):
            tot += sum(os.path.getsize(os.path.join(root, x))
                       for x in files)
        return round(tot / 1e6, 1)

    res = {
        "rows": base.count(),
        "shred_sec": shred_sec,
        "string_mb": du(f"{sdir}/jdocs.parquet"),
        "variant_mb": du(f"{vdir}/vdocs.parquet"),
        "string_layout": measure(spark, sdir, "jdocs", js, "str"),
        "variant_layout": measure(spark, vdir, "vdocs", js, "var"),
    }
    print(json.dumps(res))


if __name__ == "__main__":
    main()
