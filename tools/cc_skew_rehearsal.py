"""CC mega-component skew rehearsal (VERDICT r12 #1).

``connected_components`` (extensions/dedup.py — alternating
large-star/small-star, Kiveris et al. SoCC'14) guards the flagship
dedup-at-100TB claim, but its skew story was untested: a boilerplate
MEGA-COMPONENT (one duplicate cluster holding 30-50% of all paired
docs — common in real crawls) concentrates one groupBy/join key per
round once the component collapses toward its root star.

Two skew mechanisms, adjudicated separately:

- the per-round ``groupBy(src).min`` — map-side partial aggregation
  pre-folds each task's hot-key rows to ONE row, so the shuffle
  carries ~partitions rows for the hot key (same physics as the
  round-7 grouped-reduce skew table);
- the per-round ``sym.join(mins, "src")`` — a sort-merge join keyed
  by src puts every hot-key row in one reducer partition; AQE's
  skew-join split (on in every session this engine creates) divides
  that partition across tasks, because the mins side is key-unique
  and cheaply replicated.

This tool MEASURES both claims instead of believing them: same edge
count, three component shapes, wall + executor CPU per shape.

Shapes (same node/edge budget per scale):

- ``uniform``   — size-5 star components (the benign layout);
- ``megatree``  — 40% of nodes in ONE component wired as a random
  recursive tree (parent(i) = xxhash64(i) mod i): the realistic
  LSH-pair shape, whose hot root EMERGES over rounds;
- ``megastar``  — the same 40% pre-collapsed into a star on node 0:
  maximum key concentration from round 1 (the adversarial bound).

Output: one JSON line with per-shape {wall_s, cpu_s, rounds-proxy
jobs, clusters, max_cluster}; the skew verdict is the megastar/uniform
ratio pair.  BASELINE.md gets the table.

Usage: python tools/cc_skew_rehearsal.py [n_edges] [n_edges ...]
       (default 1_000_000 10_000_000)
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(
    0, os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
)

MEGA_FRAC = 0.4


def _shapes(spark, n_edges: int):
    """Three equal-edge-count edge shapes (as lazy thunks): uniform /
    megatree / megastar.  Node ids are disjoint across the mega and
    uniform regions; the caller checkpoints each shape just before
    measuring it (synthesis cost stays out of the measured loop) and
    releases it before the next."""
    from pyspark.sql import functions as F

    # uniform: size-5 stars → 4 edges per component
    n_nodes = (n_edges * 5) // 4
    uniform = (
        spark.range(n_nodes)
        .filter(F.col("id") % 5 != 0)
        .select(
            F.col("id").alias("id_a"),
            ((F.col("id") / 5).cast("long") * 5).alias("id_b"),
        )
    )

    # mega region: m nodes in one component (tree edges: m-1),
    # remainder in size-5 stars starting at node id `m`
    m = int(n_edges * MEGA_FRAC)
    rest_edges = n_edges - (m - 1)
    rest_nodes = (rest_edges * 5) // 4

    def rest_stars():
        return (
            spark.range(m, m + rest_nodes)
            .filter((F.col("id") - m) % 5 != 0)
            .select(
                F.col("id").alias("id_a"),
                (((F.col("id") - m) / 5).cast("long") * 5 + m)
                .alias("id_b"),
            )
        )

    megatree = (
        spark.range(1, m)
        .select(
            F.col("id").alias("id_a"),
            F.pmod(F.xxhash64("id"), F.col("id")).alias("id_b"),
        )
        .union(rest_stars())
    )
    megastar = (
        spark.range(1, m)
        .select(F.col("id").alias("id_a"), F.lit(0).cast("long").alias("id_b"))
        .union(rest_stars())
    )
    # thunks, not frames: each shape is synthesized+checkpointed only
    # when measured and released before the next — three eager
    # 100M-edge checkpoints at once OOM'd a 48g heap (round 13)
    return {
        "uniform": lambda: uniform,
        "megatree": lambda: megatree,
        "megastar": lambda: megastar,
    }


def _group_cpu(spark, group: str) -> tuple[float, int]:
    """(executor CPU seconds, job count) across a job group."""
    sc = spark.sparkContext
    tracker = sc.statusTracker()
    gw = sc._gateway
    ss = sc._jsc.sc().statusStore()
    cpu = 0
    jobs = 0
    for jid in tracker.getJobIdsForGroup(group):
        jobs += 1
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
                cpu += it.next().executorCpuTime()
    return cpu / 1e9, jobs


def run_scale(spark, n_edges: int) -> dict:
    from pyspark.sql import functions as F

    from mapreduce_spark.extensions.dedup import connected_components

    shapes = _shapes(spark, n_edges)
    res = {}
    for name, thunk in shapes.items():
        e = thunk().repartition(32).localCheckpoint(eager=True)
        group = f"cc-{name}-{n_edges}"
        spark.sparkContext.setJobGroup(group, group)
        t0 = time.monotonic()
        labels = connected_components(
            e, "id_a", "id_b",
            shortcut_every=int(
                os.environ.get("SPARK_GRAFT_CC_SHORTCUT", "0")
            ),
        )
        stats = labels.groupBy("root").count().agg(
            F.count("*").alias("clusters"),
            F.max("count").alias("max_cluster"),
        ).first()
        wall = time.monotonic() - t0
        spark.sparkContext.setJobGroup("idle", "idle")
        cpu, jobs = _group_cpu(spark, group)
        res[name] = {
            "wall_s": round(wall, 2),
            "cpu_s": round(cpu, 2),
            "jobs": jobs,
            "clusters": int(stats["clusters"]),
            "max_cluster": int(stats["max_cluster"]),
        }
        e.unpersist()
    for mega in ("megatree", "megastar"):
        res[f"{mega}_over_uniform_wall"] = round(
            res[mega]["wall_s"] / res["uniform"]["wall_s"], 2
        )
        res[f"{mega}_over_uniform_cpu"] = round(
            res[mega]["cpu_s"] / res["uniform"]["cpu_s"], 2
        )
    return res


def main() -> None:
    from pyspark.sql import SparkSession

    scales = [int(a) for a in sys.argv[1:]] or [1_000_000, 10_000_000]
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    spark = (
        SparkSession.builder.master(f"local[{cpus}]")
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", "48g")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    out = {"mega_frac": MEGA_FRAC, "scales": {}}
    for n in scales:
        out["scales"][str(n)] = run_scale(spark, n)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
