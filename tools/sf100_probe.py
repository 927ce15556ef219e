"""sf100 probe (round 12, VERDICT r11 #7): stretch the two
cheapest-to-run, highest-value scale cases ONE more decade —
selective read and steady-state refresh — on a 600M-row lineitem
(1000× sf0.1).

Design: ONE map-only view (l_orderkey → l_quantity) serves both
measurements, so the probe pays a single O(corpus) build:

- ``selread``: the same ~10k-order narrow window selects identical
  rows at sf0.1 (600k-row view) and sf100 (600M-row view).  X3
  predicts ~flat (row-group min/max pruning on the key_enc-sorted
  store); an O(view) scan would be 1000×.
- ``refresh_steady``: a fixed ~60k-row change batch against the 600M
  view.  M1's O(changes) accounting predicts ~flat.

The base build is built to seq-quantile s0 so the last two ~60k-row
seq slices remain as refresh batches (refresh_first pays the one-time
lazy counts pass, refresh_steady is the forever cost).

Usage: python tools/sf100_probe.py [out_dir]   (default /tmp/sf100)
Prints one JSON line with both legs and per-decade exponents (3
decades sf0.1 → sf100).

minhash mode (round 13, VERDICT r12 #2): ``python tools/sf100_probe.py
minhash [out_dir]`` stretches the dedup spine a third decade — 5M
documents (1000× sf0.1, same disjoint-replica recipe as
scale_rehearsal: shifted doc_ids + a per-replica token suffix so
replicas share no shingles and true-pair volume scales linearly):

- ``minhash_sig``: the signature build alone (shingle explode + 96
  affine min-aggs, all whole-stage codegen) — a linear scan by
  construction, exponent ≈ 1.0 expected;
- ``minhash_pairs``: full candidate generation + exact verify
  (signatures + band-bucket equi-join + Jaccard) — near-linear
  expected while band buckets stay bounded (the max_df postings cap
  and disjoint replicas keep them so).

ivf mode (round 13): ``python tools/sf100_probe.py ivf [out_dir]``
stretches the ANN amortized path a third decade — 2M vectors (1000×
sf0.1, disjoint vec_ids + circular-shift decorrelation):

- ``ivf_build``: index build + persisted bundle write (linear like
  any index build; one file per cell after the round-13 repartition);
- ``ivf_query``: FIXED query batch (5 ids, k=10, nprobe=8) against
  the persisted bundle via the vid-sidecar IVFIndex path — probed
  fraction nprobe/√N shrinks with the corpus, so the decade exponent
  must come in clearly sublinear (sf1→sf10 measured ~0.3/decade).
"""

from __future__ import annotations

import json
import math
import os
import statistics
import sys
import tempfile
import time

sys.path.insert(
    0, os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
)

SF01 = "/root/testdata/sf0.1"
REPS = 1000
BATCH_ROWS = 60_000


def synthesize_lineitem(spark, out_dir: str) -> None:
    from pyspark.sql import functions as F

    li_path = f"{out_dir}/lineitem.parquet"
    if os.path.exists(li_path):
        return
    os.makedirs(out_dir, exist_ok=True)
    reps = spark.range(REPS).withColumnRenamed("id", "_rep")
    # the sf0.1 source is ONE 11 MB file — without a repartition the
    # crossJoin inherits ~1 input split and the 600M-row write
    # serializes onto a couple of tasks (measured ~8 h); 32-way gives
    # ~350 MB of output per task
    li = spark.read.parquet(f"{SF01}/lineitem.parquet").repartition(32)
    shift = li.agg(F.max("l_orderkey")).collect()[0][0] + 1
    t = time.time()
    (
        li.crossJoin(reps)
        .withColumn(
            "l_orderkey",
            (F.col("l_orderkey") + F.col("_rep") * F.lit(shift))
            .cast(li.schema["l_orderkey"].dataType),
        )
        .drop("_rep")
        # the changes-feed ingest contract (PLANS.md round 11): the
        # raw table must be seq-CLUSTERED or `seq > since` refresh
        # pruning degrades to a full scan.  The crossJoin interleaves
        # all 1000 replicas row-by-row, so every row group would span
        # the whole orderkey range — range-repartition + sort restores
        # the layout a real ingest writes.
        .repartitionByRange(64, "l_orderkey")
        .sortWithinPartitions("l_orderkey", "l_linenumber")
        .write.mode("overwrite")
        .parquet(li_path)
    )
    print(f"# synthesized sf100 lineitem in {time.time()-t:.1f}s",
          file=sys.stderr)


def synthesize_documents(spark, out_dir: str,
                         n_reps: int | None = None) -> None:
    from pyspark.sql import functions as F

    d_path = f"{out_dir}/documents.parquet"
    if os.path.exists(d_path):
        return
    os.makedirs(out_dir, exist_ok=True)
    reps = spark.range(
        REPS if n_reps is None else n_reps
    ).withColumnRenamed("id", "_rep")
    # same split-inheritance trap as lineitem: the sf0.1 source is one
    # small file; repartition before the crossJoin or the 5M-doc write
    # serializes onto a couple of tasks
    docs = spark.read.parquet(f"{SF01}/documents.parquet").repartition(8)
    dshift = docs.agg(F.max("doc_id")).collect()[0][0] + 1
    t = time.time()
    (
        docs.crossJoin(reps)
        .withColumn(
            "doc_id", F.col("doc_id") + F.col("_rep") * F.lit(dshift)
        )
        # per-replica token suffix: replicas share NO shingles, so
        # cross-replica band collisions are hash accidents only and
        # true near-dup pairs scale linearly with the corpus
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
        .repartition(64)
        .write.mode("overwrite")
        .parquet(d_path)
    )
    print(f"# synthesized sf100 documents in {time.time()-t:.1f}s",
          file=sys.stderr)


def synthesize_embeddings(spark, out_dir: str,
                          n_reps: int | None = None) -> None:
    from pyspark.sql import functions as F

    e_path = f"{out_dir}/embeddings.parquet"
    if os.path.exists(e_path):
        return
    os.makedirs(out_dir, exist_ok=True)
    reps = spark.range(
        REPS if n_reps is None else n_reps
    ).withColumnRenamed("id", "_rep")
    emb = spark.read.parquet(f"{SF01}/embeddings.parquet").repartition(8)
    eshift = emb.agg(F.max("vec_id")).collect()[0][0] + 1
    dim = len(emb.select("embedding").first()[0])
    # circular shift by replica decorrelates cross-replica cosines
    # (same recipe as scale_rehearsal's sf1/sf10 embeddings)
    rolled = F.concat(
        F.slice(F.col("embedding"), (F.col("_rep") % dim) + 1,
                dim - (F.col("_rep") % dim)),
        F.slice(F.col("embedding"), 1, F.col("_rep") % dim),
    )
    t = time.time()
    (
        emb.crossJoin(reps)
        .withColumn(
            "vec_id", F.col("vec_id") + F.col("_rep") * F.lit(eshift)
        )
        .withColumn("embedding", rolled)
        .drop("_rep")
        .repartition(32)
        .write.mode("overwrite")
        .parquet(e_path)
    )
    print(f"# synthesized sf100 embeddings in {time.time()-t:.1f}s",
          file=sys.stderr)


def measure_ivf(spark, sf_dir: str, work_dir: str) -> dict:
    from mapreduce_spark.extensions import similarity

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    out = {"vectors": emb.count()}
    dest = os.path.join(work_dir, "bundle")
    t = time.time()
    idx, cents = similarity.ivf_index(emb)
    similarity.write_ivf_index(idx, cents, dest)
    out["ivf_build"] = round(time.time() - t, 2)
    out["n_cells"] = len(cents)
    bundle = similarity.read_ivf_index(spark, dest)
    qids = [0, 1, 2, 3, 4]
    similarity.ivf_topk(None, qids, 10, index=bundle,
                        nprobe=8).count()  # warm
    walls = []
    for _ in range(3):
        t = time.time()
        out["ivf_query_rows"] = similarity.ivf_topk(
            None, qids, 10, index=bundle, nprobe=8
        ).count()
        walls.append(time.time() - t)
    out["ivf_query"] = round(statistics.median(walls), 3)
    return out


def main_ivf() -> None:
    out_dir = sys.argv[2] if len(sys.argv) > 2 else "/tmp/sf100"
    from pyspark.sql import SparkSession

    spark = (
        SparkSession.builder.master(
            f"local[{os.environ.get('SPARK_GRAFT_CPUS', '32')}]"
        )
        .config("spark.sql.shuffle.partitions", "64")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", "48g")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    synthesize_embeddings(spark, out_dir)
    with tempfile.TemporaryDirectory(prefix="ivfwarm-") as wd:
        measure_ivf(spark, "/root/testdata/sf0.001", wd)  # warmup
    with tempfile.TemporaryDirectory(prefix="ivf01-") as wd:
        r01 = measure_ivf(spark, SF01, wd)
    with tempfile.TemporaryDirectory(prefix="ivf100-") as wd:
        r100 = measure_ivf(spark, out_dir, wd)
    expo = {
        k: round(
            math.log10(max(r100[k], 1e-3) / max(r01[k], 1e-3)) / 3.0,
            2,
        )
        for k in ("ivf_build", "ivf_query")
    }
    print(json.dumps({
        "sf0.1": r01, "sf100": r100,
        "exponent_per_decade": expo,
    }))


def synthesize_random_embeddings(spark, out_dir: str, n: int,
                                 dim: int = 64) -> None:
    """Deterministic hash-random embeddings — the structure-FREE
    recall regime.  The replica-shift sf100 corpus is degenerate for
    recall measurement in both directions (1000 reps ⇒ ~15 bit-
    identical same-shift copies per query fill the top-10 inside one
    cell → recall trivially 1.0; 100 reps ⇒ autocorrelated shifts
    create near-ties scattered across cells → recall artificially
    low).  Uniform hash-random vectors are the opposite extreme: no
    cluster structure at all, the adversarial bound for IVF."""
    from pyspark.sql import functions as F

    path = f"{out_dir}/embeddings.parquet"
    if os.path.exists(path):
        return
    os.makedirs(out_dir, exist_ok=True)
    comps = [
        (F.xxhash64(F.col("id"), F.lit(i)) % 100000 / 50000.0
         ).cast("float")
        for i in range(dim)
    ]
    (
        spark.range(n)
        .select(F.col("id").alias("vec_id"),
                F.array(*comps).alias("embedding"))
        .repartition(32)
        .write.mode("overwrite").parquet(path)
    )


def measure_recall(spark, sf_dir: str, work_dir: str,
                   nprobes=(4, 8, 16, 32), k: int = 10,
                   n_queries: int = 20, assign_r: int = 1) -> dict:
    """IVF recall@k vs the exact cosine top-k at the SAME scale the
    latency was measured (VERDICT r13 #2): build the bundle once, run
    the amortized ivf_topk per nprobe, score against one exact
    broadcast-scan pass.  Recall is averaged over n_queries·k neighbor
    slots."""
    from mapreduce_spark.extensions import similarity

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    out = {"vectors": emb.count(), "assign_r": assign_r}
    dest = os.path.join(work_dir, "bundle")
    idx, cents = similarity.ivf_index(emb, assign_r=assign_r)
    similarity.write_ivf_index(idx, cents, dest, assign_r=assign_r)
    bundle = similarity.read_ivf_index(spark, dest)
    out["n_cells"] = len(cents)
    qids = list(range(n_queries))
    exact: dict[int, set] = {}
    for r in similarity.cosine_topk(emb, qids, k).collect():
        exact.setdefault(r["qid"], set()).add(r["vid"])
    for np_ in nprobes:
        got: dict[int, set] = {}
        t = time.time()
        rows = similarity.ivf_topk(
            None, qids, k, index=bundle, nprobe=np_
        ).collect()
        wall = time.time() - t
        for r in rows:
            got.setdefault(r["qid"], set()).add(r["vid"])
        hits = sum(len(got.get(q, set()) & exact[q]) for q in qids)
        out[f"nprobe{np_}"] = {
            "recall": round(hits / (k * len(qids)), 3),
            "query_wall": round(wall, 2),
        }
    return out


def main_recall() -> None:
    sf100_dir = sys.argv[2] if len(sys.argv) > 2 else "/tmp/sf100"
    sf10_dir = sys.argv[3] if len(sys.argv) > 3 else "/tmp/sf10emb"
    from pyspark.sql import SparkSession

    spark = (
        SparkSession.builder.master(
            f"local[{os.environ.get('SPARK_GRAFT_CPUS', '32')}]"
        )
        .config("spark.sql.shuffle.partitions", "64")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", "48g")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    synthesize_embeddings(spark, sf10_dir, n_reps=100)   # 200k vectors
    synthesize_embeddings(spark, sf100_dir)              # 2M vectors
    synthesize_random_embeddings(spark, "/tmp/rnd200k", 200_000)
    synthesize_random_embeddings(spark, "/tmp/rnd2m", 2_000_000)
    res = {}
    with tempfile.TemporaryDirectory(prefix="rec10-") as wd:
        res["sf10"] = measure_recall(spark, sf10_dir, wd)
    with tempfile.TemporaryDirectory(prefix="rec100-") as wd:
        res["sf100"] = measure_recall(spark, sf100_dir, wd)
    with tempfile.TemporaryDirectory(prefix="recr10-") as wd:
        res["rand200k"] = measure_recall(spark, "/tmp/rnd200k", wd)
    with tempfile.TemporaryDirectory(prefix="recr100-") as wd:
        res["rand2m"] = measure_recall(spark, "/tmp/rnd2m", wd)
    print(json.dumps(res))


def main_recall_multiassign() -> None:
    """Round-14 follow-up: the same recall sweep on the structure-free
    corpora with multi-assignment r=2 and r=3 — the axis the r=1 sweep
    measured weakest (rand2m 0.28 @ nprobe=8)."""
    from pyspark.sql import SparkSession

    spark = (
        SparkSession.builder.master(
            f"local[{os.environ.get('SPARK_GRAFT_CPUS', '32')}]"
        )
        .config("spark.sql.shuffle.partitions", "64")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", "48g")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    synthesize_random_embeddings(spark, "/tmp/rnd200k", 200_000)
    synthesize_random_embeddings(spark, "/tmp/rnd2m", 2_000_000)
    res = {}
    for r in (2, 3):
        with tempfile.TemporaryDirectory(prefix=f"mar{r}-") as wd:
            res[f"rand200k_r{r}"] = measure_recall(
                spark, "/tmp/rnd200k", wd, assign_r=r
            )
        with tempfile.TemporaryDirectory(prefix=f"mbr{r}-") as wd:
            res[f"rand2m_r{r}"] = measure_recall(
                spark, "/tmp/rnd2m", wd, assign_r=r
            )
        print(json.dumps({k: v for k, v in res.items()
                          if k.endswith(f"_r{r}")}), flush=True)
    print(json.dumps(res))


def measure_pipeline(spark, sf_dir: str) -> dict:
    """x_pipeline scale leg (VERDICT r13 #4): the composed
    dedup→cluster→sample→pack plan, total plus per-stage walls, so a
    super-linear exponent is attributable to a stage (each stage is
    individually measured linear-ish already — composition defects
    like a lost persist or a repeated scan show up HERE)."""
    from pyspark.sql import functions as F

    from mapreduce_spark.extensions import dedup
    from mapreduce_spark.extensions.inventory import (
        JACCARD_T,
        x_pipeline,
    )

    out = {}
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    out["docs"] = docs.count()

    t = time.time()
    out["rows_out"] = x_pipeline(spark, sf_dir).count()
    out["pipeline_total"] = round(time.time() - t, 2)

    # stage legs (independent actions over the same lazy stages)
    t = time.time()
    d = dedup.exact_dedup(docs)
    keep = docs.join(
        d.filter(~F.col("is_dup")).select("doc_id"), "doc_id"
    )
    out["survivors_exact"] = keep.count()
    out["stage_exact"] = round(time.time() - t, 2)

    t = time.time()
    out["cluster_rows"] = dedup.duplicate_clusters(
        keep, JACCARD_T
    ).count()
    out["stage_clusters"] = round(time.time() - t, 2)
    return out


def main_pipeline() -> None:
    from pyspark.sql import SparkSession

    spark = (
        SparkSession.builder.master(
            f"local[{os.environ.get('SPARK_GRAFT_CPUS', '32')}]"
        )
        .config("spark.sql.shuffle.partitions", "64")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", "48g")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    synthesize_documents(spark, "/tmp/sfdocs1", n_reps=10)
    synthesize_documents(spark, "/tmp/sfdocs10", n_reps=100)
    measure_pipeline(spark, "/root/testdata/sf0.001")  # warmup
    res = {
        "sf0.1": measure_pipeline(spark, SF01),
        "sf1": measure_pipeline(spark, "/tmp/sfdocs1"),
        "sf10": measure_pipeline(spark, "/tmp/sfdocs10"),
    }
    expo = {}
    for k in ("pipeline_total", "stage_exact", "stage_clusters"):
        expo[k] = round(math.log10(
            max(res["sf10"][k], 1e-3) / max(res["sf0.1"][k], 1e-3)
        ) / 2.0, 2)
    print(json.dumps({**res, "exponent_per_decade": expo}))


def measure_pack(spark, sf_dir: str) -> dict:
    """Real-BPE packing scale leg: x_pack_bpe (BPE token counts via
    the Arrow-batched hook + the window/binning pack plan) across
    document decades.  The replica synthesis suffixes every word with
    its replica index, so the per-executor BPE word cache CANNOT
    amortize across replicas — distinct word types grow linearly with
    the corpus, the worst case for the cache the encoder relies on."""
    from pyspark.sql import functions as F

    from mapreduce_spark.extensions.bpe import BPETokenizer
    from mapreduce_spark.extensions.inventory import PACK_BUDGET
    from mapreduce_spark.extensions.sampling import pack_sequences

    out = {}
    # fixed 64-way parallelism at EVERY scale: the sf0.1 fixture is
    # one parquet file (one scan task), which would hand the small
    # decade a 64x parallelism handicap and fake a flat exponent
    docs = spark.read.parquet(
        f"{sf_dir}/documents.parquet"
    ).repartition(64)
    out["docs"] = docs.count()
    out["word_types"] = (
        docs.select(F.explode(F.split("text", " ")).alias("w"))
        .agg(F.approx_count_distinct("w")).collect()[0][0]
    )
    tok = BPETokenizer()
    packed = pack_sequences(
        docs.select("doc_id", "lang", "text"), PACK_BUDGET,
        token_count_fn=tok.count_batch, stratum_col="lang",
        id_col="doc_id",
    )
    t = time.time()
    # agg over bin/off, NOT count(): a bare count lets Catalyst prune
    # the window AND the tokenizer UDF — measured 0.28 s vs the real
    # 3.5 s at 500k docs
    row = packed.agg(
        F.count(F.lit(1)).alias("rows"), F.sum("bin").alias("chk")
    ).collect()[0]
    out["pack_bpe"] = round(time.time() - t, 2)
    out["rows_out"] = row["rows"]
    return out


def main_pack() -> None:
    from pyspark.sql import SparkSession

    spark = (
        SparkSession.builder.master(
            f"local[{os.environ.get('SPARK_GRAFT_CPUS', '32')}]"
        )
        .config("spark.sql.shuffle.partitions", "64")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", "48g")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    synthesize_documents(spark, "/tmp/sfdocs1", n_reps=10)
    synthesize_documents(spark, "/tmp/sfdocs10", n_reps=100)
    measure_pack(spark, "/root/testdata/sf0.001")  # warmup
    res = {
        "sf0.1": measure_pack(spark, SF01),
        "sf1": measure_pack(spark, "/tmp/sfdocs1"),
        "sf10": measure_pack(spark, "/tmp/sfdocs10"),
    }
    expo = round(math.log10(
        max(res["sf10"]["pack_bpe"], 1e-3)
        / max(res["sf0.1"]["pack_bpe"], 1e-3)
    ) / 2.0, 2)
    print(json.dumps({**res, "pack_bpe_exponent_per_decade": expo}))


def measure_minhash(spark, sf_dir: str) -> dict:
    from pyspark.sql import functions as F

    from mapreduce_spark.extensions import dedup

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    out = {"docs": docs.count()}

    t = time.time()
    sigs = dedup.minhash_signatures(docs)
    # materialize via a count over the full signature frame: the agg
    # consumes every (doc, sig, shingle-set) row the band join would
    out["sig_rows"] = sigs.agg(
        F.count("*"), F.sum(F.size("sig"))
    ).first()[0]
    out["minhash_sig"] = round(time.time() - t, 2)

    t = time.time()
    out["minhash_pairs_n"] = dedup.minhash_lsh_pairs(docs, 0.5).count()
    out["minhash_pairs"] = round(time.time() - t, 2)
    return out


def main_minhash() -> None:
    out_dir = sys.argv[2] if len(sys.argv) > 2 else "/tmp/sf100"
    from pyspark.sql import SparkSession

    spark = (
        SparkSession.builder.master(
            f"local[{os.environ.get('SPARK_GRAFT_CPUS', '32')}]"
        )
        .config("spark.sql.shuffle.partitions", "64")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", "48g")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    synthesize_documents(spark, out_dir)
    measure_minhash(spark, "/root/testdata/sf0.001")  # warmup
    r01 = measure_minhash(spark, SF01)
    r100 = measure_minhash(spark, out_dir)
    expo = {
        k: round(
            math.log10(max(r100[k], 1e-3) / max(r01[k], 1e-3)) / 3.0,
            2,
        )
        for k in ("minhash_sig", "minhash_pairs")
    }
    print(json.dumps({
        "sf0.1": r01, "sf100": r100,
        "exponent_per_decade": expo,
    }))


def measure(spark, sf_dir: str) -> dict:
    from pyspark.sql import functions as F

    from mapreduce_spark.engine import Engine
    from mapreduce_spark.operators.mapphase import MapSpec
    from mapreduce_spark.sources.docs import load_table

    raw = load_table(spark, sf_dir, "lineitem")
    seq = (F.col("l_orderkey") * 8 + F.col("l_linenumber")).cast(
        "long"
    )
    n = raw.count()
    qs = raw.select(seq.alias("s")).approxQuantile(
        "s",
        [max(0.0, 1 - 2 * BATCH_ROWS / n),
         max(0.0, 1 - BATCH_ROWS / n)],
        0.001,
    )
    s0, s1 = int(qs[0]), int(qs[1])

    eng = Engine(spark, sf_dir, tempfile.mkdtemp(prefix="sf100-"))
    eng.put_design(
        "sel",
        {
            "v": {
                "map": MapSpec(
                    "lineitem",
                    ("num", "l_orderkey"),
                    ("num", "l_quantity"),
                )
            }
        },
    )
    vdef = eng._resolve("sel/v")[0]
    out = {"rows": n}
    t = time.time()
    eng.update_view(vdef, to_seq=s0)
    out["base_build"] = round(time.time() - t, 2)

    # narrow window: identical selected rows at every scale (replica
    # shards shift l_orderkey by disjoint ranges)
    lo, hi = 100_000, 110_000
    walls = []
    sel_rows = 0
    for _ in range(3):
        t = time.time()
        sel_rows = len(
            eng.query("sel/v", startkey=lo, endkey=hi,
                      stale="ok").df.collect()
        )
        walls.append(time.time() - t)
    res = eng.query("sel/v", startkey=lo, endkey=hi, stale="ok")
    plan = res.df._jdf.queryExecution().executedPlan().toString()
    out["sel_read_narrow"] = round(statistics.median(walls), 3)
    out["sel_rows"] = sel_rows
    out["sel_pushed_filter"] = "GreaterThanOrEqual(key_enc" in plan

    t = time.time()
    eng.update_view(vdef, to_seq=s1)  # one-time lazy counts (O(view))
    out["refresh_first"] = round(time.time() - t, 2)
    t = time.time()
    eng.update_view(vdef)  # steady state: pure O(changes)
    out["refresh_steady"] = round(time.time() - t, 2)
    return out


def main() -> None:
    if len(sys.argv) > 1 and sys.argv[1] == "minhash":
        main_minhash()
        return
    if len(sys.argv) > 1 and sys.argv[1] == "pack":
        main_pack()
        return
    if len(sys.argv) > 1 and sys.argv[1] == "pipeline":
        main_pipeline()
        return
    if len(sys.argv) > 1 and sys.argv[1] == "recall":
        main_recall()
        return
    if len(sys.argv) > 1 and sys.argv[1] == "recall-ma":
        main_recall_multiassign()
        return
    if len(sys.argv) > 1 and sys.argv[1] == "ivf":
        main_ivf()
        return
    out_dir = sys.argv[1] if len(sys.argv) > 1 else "/tmp/sf100"
    from pyspark.sql import SparkSession

    spark = (
        SparkSession.builder.master(
            f"local[{os.environ.get('SPARK_GRAFT_CPUS', '32')}]"
        )
        .config("spark.sql.shuffle.partitions", "64")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", "16g")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    synthesize_lineitem(spark, out_dir)
    # warmup (JVM/codegen init must not land on the sf0.1 column)
    measure(spark, "/root/testdata/sf0.001")
    r01 = measure(spark, SF01)
    r100 = measure(spark, out_dir)
    expo = {
        k: round(
            math.log10(max(r100[k], 1e-3) / max(r01[k], 1e-3)) / 3.0,
            2,
        )
        for k in ("sel_read_narrow", "refresh_steady",
                  "refresh_first", "base_build")
    }
    print(json.dumps({
        "sf0.1": r01, "sf100": r100,
        "exponent_per_decade": expo,
    }))


if __name__ == "__main__":
    main()
