"""Scale rehearsal: synthesize sf1 (10× sf0.1) and measure how the
headline operators scale (BASELINE.md "sf1 rehearsal" table).

sf1 is derived from the driver's sf0.1 fixtures (never regenerated
upstream data — TESTDATA.md forbids touching /root/testdata):

- ``lineitem``: 10 replicas with disjoint ``l_orderkey`` ranges (seq
  stays strictly monotone per replica shift);
- ``documents``: 10 replicas with disjoint doc_ids AND a per-replica
  token suffix, so replicas share no shingles — near-dup pair output
  scales ~linearly (10 disjoint shards) instead of exploding with
  cross-replica duplicates;
- ``embeddings``: 10 replicas with disjoint vec_ids and a per-replica
  circular shift of the vector, decorrelating cross-replica cosines.

Measured once per scale (cold plans, same session):

- ``build+q02``: persisted view build over lineitem + grouped _sum
  read — the core map/reduce path;
- ``minhash``: MinHash-LSH near-dup pairs over documents;
- ``gemm``: blocked-GEMM embedding near-dup (the documented quadratic
  exception).

Prints one JSON line with per-operator (sf0.1 sec, sf1 sec, exponent
= log10(t1/t01); 1.0 = linear in the 10× row count).

Usage: python tools/scale_rehearsal.py [out_dir=/tmp/sf1]
"""

from __future__ import annotations

import json
import math
import os
import sys
import tempfile
import time

sys.path.insert(
    0, os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
)

SF01 = "/root/testdata/sf0.1"
REPS = 10


def synthesize(spark, out_dir: str) -> None:
    from pyspark.sql import functions as F

    os.makedirs(out_dir, exist_ok=True)
    reps = spark.range(REPS).withColumnRenamed("id", "_rep")

    li = spark.read.parquet(f"{SF01}/lineitem.parquet")
    shift = li.agg(F.max("l_orderkey")).collect()[0][0] + 1
    (
        li.crossJoin(reps)
        .withColumn(
            "l_orderkey",
            (F.col("l_orderkey") + F.col("_rep") * F.lit(shift)).cast(
                li.schema["l_orderkey"].dataType
            ),
        )
        .drop("_rep")
        .write.mode("overwrite")
        .parquet(f"{out_dir}/lineitem.parquet")
    )

    docs = spark.read.parquet(f"{SF01}/documents.parquet")
    dshift = docs.agg(F.max("doc_id")).collect()[0][0] + 1
    (
        docs.crossJoin(reps)
        .withColumn("doc_id", F.col("doc_id") + F.col("_rep") * F.lit(dshift))
        .withColumn(
            "text",
            F.array_join(
                F.transform(
                    F.split("text", " "),
                    lambda x: F.concat(x, F.col("_rep").cast("string")),
                ),
                " ",
            ),
        )
        .drop("_rep")
        .write.mode("overwrite")
        .parquet(f"{out_dir}/documents.parquet")
    )

    emb = spark.read.parquet(f"{SF01}/embeddings.parquet")
    eshift = emb.agg(F.max("vec_id")).collect()[0][0] + 1
    dim = len(emb.select("embedding").first()[0])
    rolled = F.concat(
        F.slice(F.col("embedding"), (F.col("_rep") % dim) + 1,
                dim - (F.col("_rep") % dim)),
        F.slice(F.col("embedding"), 1, F.col("_rep") % dim),
    )
    (
        emb.crossJoin(reps)
        .withColumn("vec_id", F.col("vec_id") + F.col("_rep") * F.lit(eshift))
        .withColumn("embedding", rolled)
        .drop("_rep")
        .write.mode("overwrite")
        .parquet(f"{out_dir}/embeddings.parquet")
    )


def measure(spark, sf_dir: str) -> dict:
    from mapreduce_spark.engine import Engine
    from mapreduce_spark.extensions import dedup
    from mapreduce_spark.operators.mapphase import MapSpec

    out = {}
    t = time.time()
    eng = Engine(spark, sf_dir, tempfile.mkdtemp(prefix="sfr-"))
    eng.put_design(
        "r",
        {
            "v": {
                "map": MapSpec(
                    "lineitem",
                    [("str", "l_returnflag"), ("str", "l_linestatus")],
                    ("num", "l_quantity"),
                ),
                "reduce": "_sum",
            }
        },
    )
    eng.query("r/v", group_level=2).df.collect()
    out["build_q02"] = round(time.time() - t, 2)

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    t = time.time()
    n = dedup.minhash_lsh_pairs(docs, 0.5).count()
    out["minhash"] = round(time.time() - t, 2)
    out["minhash_pairs"] = n

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    t = time.time()
    n = dedup.embedding_near_dup_blocked(emb, 0.4).count()
    out["gemm"] = round(time.time() - t, 2)
    out["gemm_pairs"] = n
    return out


def main() -> None:
    out_dir = sys.argv[1] if len(sys.argv) > 1 else "/tmp/sf1"
    from pyspark.sql import SparkSession

    spark = (
        SparkSession.builder.master(
            f"local[{os.environ.get('SPARK_GRAFT_CPUS', '32')}]"
        )
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", "16g")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    if not os.path.exists(f"{out_dir}/embeddings.parquet"):
        t = time.time()
        synthesize(spark, out_dir)
        print(f"# synthesized sf1 in {time.time() - t:.1f}s",
              file=sys.stderr)

    r01 = measure(spark, SF01)
    r1 = measure(spark, out_dir)
    expo = {
        k: round(math.log10(max(r1[k], 1e-3) / max(r01[k], 1e-3)), 2)
        for k in ("build_q02", "minhash", "gemm")
    }
    print(json.dumps({"sf0.1": r01, "sf1": r1, "exponent": expo}))


if __name__ == "__main__":
    main()
