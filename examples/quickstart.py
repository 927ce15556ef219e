"""Quickstart: the PouchDB/CouchDB-user switchover path, end to end.

Run:  python examples/quickstart.py  [sf_dir]

Covers: design docs (MapSpec, Python fn, JS source), the full query
surface (ranges, docid paging, grouping, batch), a raw CouchDB-style
export as a source, incremental refresh + compaction, observability
(explain / info), and a training-data pipeline (dedup → sample → pack).
"""

import json
import os
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

from pyspark.sql import SparkSession
from pyspark.sql import functions as F


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    spark = (
        SparkSession.builder.master("local[4]")
        .config("spark.sql.shuffle.partitions", "8")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    from mapreduce_spark import Engine, raw_doc_table, register_table
    from mapreduce_spark.operators.mapphase import MapSpec

    eng = Engine(spark, sf_dir, tempfile.mkdtemp(prefix="qs-views-"))

    # -- 1. a design doc: structured, Python, and JS views ------------
    def by_segment(doc, emit):  # arbitrary Python map fn
        emit(doc["c_mktsegment"], doc["c_acctbal"])

    eng.put_design("app", {
        "qty": {  # declarative MapSpec → pure-JVM build
            "map": MapSpec("lineitem",
                           [("str", "l_returnflag"),
                            ("str", "l_linestatus")],
                           ("num", "l_quantity")),
            "reduce": "_sum",
        },
        "seg": {"map": ("customer", by_segment), "reduce": "_stats"},
        "big_orders": {  # a CouchDB JS ddoc, compiled to the JVM path
            "map": ("orders", """
                function (doc) {
                  if (doc.o_orderstatus === 'O' &&
                      doc.o_totalprice > 150000) {
                    emit(doc.o_orderpriority, doc.o_totalprice);
                  }
                }"""),
            "reduce": "_count",
        },
        # round-6 compiled subset: Math bucketing, ternary, prefix
        # guard (pushed to the scan as startswith), object value,
        # and the canonical {sum, count} reduce LOWERED to one JVM
        # aggregate — no JS engine, no Python, full pushdown
        "avg_price": {
            "map": ("orders", """
                function (doc) {
                  if (doc.o_orderpriority.indexOf('1-') === 0) {
                    emit([Math.floor(doc.o_totalprice / 100000),
                          doc.o_orderstatus === 'O' ? 'open' : 'done'],
                         doc.o_totalprice);
                  }
                }"""),
            "reduce": """
                function (keys, values, rereduce) {
                  if (rereduce) {
                    var s = 0;
                    var c = 0;
                    for (var i = 0; i < values.length; i++) {
                      s += values[i].sum;
                      c += values[i].count;
                    }
                    return {sum: s, count: c};
                  } else {
                    return {sum: sum(values), count: values.length};
                  }
                }""",
        },
    })

    print("grouped _sum:",
          eng.query("app/qty", group_level=2).rows()[:2], "…")
    print("_stats:",
          eng.query("app/seg", group=True, limit=1).rows())
    print("JS view:",
          eng.query("app/big_orders", group=True, limit=2).rows())
    print("JS math/ternary view (lowered {sum,count} reduce):",
          eng.query("app/avg_price", group_level=1).rows()[:2])
    # date-bucketing ddoc: compiles to year()/month() (JVM, prunable)
    print("JS date view:", eng.query({
        "map": ("orders",
                "function(doc){ emit([new Date(doc.o_orderdate)"
                ".getUTCFullYear(), new Date(doc.o_orderdate)"
                ".getUTCMonth() + 1], doc.o_totalprice); }"),
        "reduce": "_sum",
    }, group_level=1, limit=2).rows())

    # -- 2. the query surface -----------------------------------------
    print("range+docid page:", len(eng.query(
        "app/seg", reduce=False,
        startkey="BUILDING", startkey_docid="customer:000050",
        endkey="HOUSEHOLD", limit=10, update=False,
    ).rows()), "rows")
    batch = eng.query_batch("app/qty", [
        {"group": True},
        {"reduce": False, "limit": 3, "include_docs": True},
    ])
    print("batch:", [len(r.rows()) for r in batch])

    # -- 3. a raw CouchDB export as a source --------------------------
    sf2 = tempfile.mkdtemp(prefix="qs-raw-")
    register_table(raw_doc_table("mydb"))
    docs = [
        {"_id": f"d{i:03d}", "_rev": "1-x", "_deleted": False, "seq": i,
         "doc_json": json.dumps({"_id": f"d{i:03d}",
                                 "kind": "a" if i % 2 else "b",
                                 "n": float(i)})}
        for i in range(1, 41)
    ]
    spark.createDataFrame(
        docs, "_id string,_rev string,_deleted boolean,seq long,"
              "doc_json string"
    ).write.parquet(f"{sf2}/mydb.parquet")
    raw_eng = Engine(spark, sf2, tempfile.mkdtemp(prefix="qs-rawv-"))
    raw_eng.put_design("d", {"byk": {
        # interpreted JS over dynamic doc bodies — BOTH members are JS
        # source, like a real CouchDB export; this reduce is outside
        # the builtin-lowering set so it runs through the distributed
        # partial/final (rereduce) phases
        "map": ("mydb", "function(doc){ emit(doc.kind, doc.n); }"),
        "reduce": """function(keys, values, rereduce) {
            if (rereduce) {
              var out = {sum: 0, count: 0};
              for (var i = 0; i < values.length; i++) {
                out.sum += values[i].sum;
                out.count += values[i].count;
              }
              return out;
            }
            return {sum: sum(values), count: values.length};
        }""",
    }})
    print("raw+JS (custom JS reduce):",
          raw_eng.query("d/byk", group=True).rows())

    # -- 4. maintenance & observability -------------------------------
    eng.update_view("app/qty")          # incremental (no-op here)
    print("info:", {k: v for k, v in eng.info("app/qty").items()
                    if k in ("language", "update_seq", "sizes")})
    plan = eng.explain("app/seg", reduce=False, key="MACHINERY")
    print("explain has PushedFilters:", "PushedFilters" in plan)
    print("compact:", eng.compact("app/qty"))

    # -- 5. training-data pipeline ------------------------------------
    from mapreduce_spark.extensions import dedup, sampling

    corpus = spark.read.parquet(f"{sf_dir}/documents.parquet")
    d = dedup.exact_dedup(corpus)
    keep = corpus.join(d.filter(~F.col("is_dup")).select("doc_id"),
                       "doc_id")
    # near-dup GROUPS: MinHash pairs → connected components; keep one
    # representative (min doc_id) per duplicate cluster
    clusters = dedup.duplicate_clusters(keep, 0.5)
    near_dups = clusters.filter(
        F.col("doc_id") != F.col("cluster_id")).select("doc_id")
    keep = keep.join(near_dups, "doc_id", "left_anti")
    print("near-dup clusters:",
          clusters.select("cluster_id").distinct().count(),
          "docs removed:", near_dups.count())
    # PII scrub (C4/FineWeb-style) — counts + token redaction, one
    # codegen'd scan; no Python in the hot path
    from mapreduce_spark.extensions import text as tx

    scrubbed = keep.withColumn("text", tx.redact_pii("text"))
    pii = tx.pii_features(keep).agg(
        F.sum("n_emails").alias("emails"), F.sum("n_urls").alias("urls")
    ).collect()[0]
    print("pii scrub:", dict(pii.asDict()))

    # model-based quality filter: MLlib fits, scoring is one JVM
    # sigmoid over literal coefficients
    feats = tx.quality_features(scrubbed)
    labeled = feats.withColumn(  # demo labels: long+diverse = good
        "label", ((F.col("n_tokens") >= 40)
                  & (F.col("distinct_ratio") > 0.4)).cast("long"))
    model = tx.fit_quality_filter(labeled)
    kept_q = tx.score_quality(scrubbed, model) \
        .filter(F.col("model_score") > 0.5)
    print("quality filter kept:", kept_q.count(), "/", keep.count())

    samp = sampling.stratified_sample(scrubbed, 10, stratum_col="lang")
    packed = sampling.pack_sequences(
        samp.select("doc_id", "lang",
                    F.size(F.split("text", " ")).cast("long")
                    .alias("n_tok")),
        512, token_col="n_tok")
    print("pipeline:", packed.groupBy("lang")
          .agg(F.max("bin").alias("bins")).orderBy("lang")
          .collect())


if __name__ == "__main__":
    main()
