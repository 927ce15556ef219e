"""Dump the physical plans of the engine's load-bearing queries so the
pushdown / broadcast / partial-agg claims in PLANS.md stay checkable.

Usage: python tools/explain_audit.py [sf_dir]
"""

from __future__ import annotations

import os
import sys
import tempfile

sys.path.insert(
    0, os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
)


def main() -> None:
    sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    from pyspark.sql import SparkSession

    spark = (
        SparkSession.builder.master("local[8]")
        .config("spark.sql.shuffle.partitions", "8")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    from mapreduce_spark.engine import Engine
    from mapreduce_spark.inventory import Inventory

    eng = Engine(spark, sf, tempfile.mkdtemp(prefix="mrplan-"))
    inv = Inventory(spark, sf, engine=eng, warm=True)
    for v in ("flag_status_qty", "orderdate", "brand_price",
              "order_cust_link", "cust_nation"):
        eng.update_view(f"bench/{v}")

    def show(name: str, df) -> None:
        print(f"\n{'='*72}\n== {name}\n{'='*72}")
        df.explain("formatted")

    show("q02 group_level=2 _sum (partial+final agg)", inv.q02())
    show("q06 range scan (startkey/endkey pushdown)", inv.q06())
    show("q09 keys lookup (In pushdown + inline table)", inv.q09())
    show("q12 include_docs limit=50 (semi-join prune)", inv.q12())

    # round 5: keyed include_docs WITHOUT a limit — the docs-side prune
    # is an AQE-decided semi-join (no driver-side probe job); expect a
    # LeftSemi in the adaptive plan
    eng.update_view("bench/cust_nation")
    show(
        "key= include_docs no-limit (adaptive semi prune, no probe)",
        eng.query("bench/cust_nation", stale="ok", key=7,
                  include_docs=True).df,
    )

    # round 5: a JS reduce source that LOWERS to the builtin — plan
    # must be the same JVM hash-aggregate as reduce='_sum' (no Python)
    show(
        "JS reduce lowered to _sum (partial+final hash agg, no Python)",
        eng.query(
            {
                "map": eng._defs[
                    eng.registry.resolve("bench", "flag_status_qty")
                ].map_def,
                "reduce": "function(k, v) { return sum(v); }",
            },
            group_level=1,
        ).df,
    )

    show("q28 JS-compiled view (guards pushed to scan)", inv.q28())
    show("q29 docid boundaries (coarse key_enc bounds pushed, "
         "docid tie-break residual)", inv.q29())

    # sorted=false: no Sort/TakeOrdered node in the map-query plan
    eng.update_view("bench/mktsegment")
    show(
        "sorted=false map scan (no Sort/TakeOrdered)",
        eng.query("bench/mktsegment", stale="ok",
                  startkey="BUILDING", endkey="HOUSEHOLD",
                  sorted=False).df,
    )

    from mapreduce_spark.extensions import dedup, similarity

    docs = spark.read.parquet(f"{sf}/documents.parquet")
    emb = spark.read.parquet(f"{sf}/embeddings.parquet")
    show("minhash LSH pairs", dedup.minhash_lsh_pairs(docs, 0.5))
    show("cosine top-k (broadcast queries)",
         similarity.cosine_topk(emb, [0, 1], 10))
    show("embedding near-dup blocked GEMM (no BNLJ anywhere)",
         dedup.embedding_near_dup_blocked(emb, 0.4, n_blocks=4))

    # layered LSM read: broadcast anti-joins only, newest layer's join
    # constant-folds away; zero-job envelope stats
    import tempfile as _tf

    from mapreduce_spark.engine import Engine as _E
    from mapreduce_spark.operators.mapphase import MapSpec as _MS
    from pyspark.sql import functions as F

    e2 = _E(spark, sf, _tf.mkdtemp(prefix="mrlay-"), compact_after=99)
    e2.put_design("lay", {"v": {
        "map": _MS("lineitem", ("str", "l_returnflag"),
                   ("num", "l_quantity")), "reduce": "_sum"}})
    raw = spark.read.parquet(f"{sf}/lineitem.parquet")
    seqc = (F.col("l_orderkey") * 8 + F.col("l_linenumber")).cast("long")
    hi = raw.agg(F.max(seqc)).collect()[0][0]
    step = hi // 4 + 1
    for i in range(4):
        e2.update_view("lay/v", changes=raw.filter(
            (seqc > i * step) & (seqc <= (i + 1) * step)))
    show("4-layer LSM assemble (broadcast anti-joins only)",
         e2._assemble_view(e2.registry.resolve("lay", "v")))


if __name__ == "__main__":
    main()
