"""Jobs-per-query regression gate (VERDICT r11 #1).

The r8-r10 driver-wall drift (9.7 -> 16.0 s at byte-identical
shuffles) was pure Spark-job-count growth: each job pays a
0.1-0.3 s scheduling round-trip under co-tenant contention, so the
warm wall tracks JOB COUNT, not CPU.  Round 11 cut the read path
130 -> 79 jobs (stats-gated sort fusion, footer-schema cache, static
semi-prune, pk_unique collapse skip) and halved the wall at flat
CPU -- but nothing enforced the win, and the same silent drift can
recur with any future feature.  This test pins a per-query job
CEILING at the r12 measured values (identical at sf0.001 and
sf0.01 -- the counts are plan-shape facts, not data facts).

Stages are NOT pinned: AQE can legally re-split stages run to run
(q12 measured 8 stages at sf0.01 vs 5 at sf0.001 with the same 4
jobs).  Jobs are scheduler round-trips and deterministic for a
fixed plan shape.

If this test fails LOW (a query now uses fewer jobs), lower the
ceiling -- the gate should stay tight.  If it fails HIGH, a feature
added a Spark job to the warm read path: either fuse it (see
operators/query.py fused_sort, sources/docs.py schema cache for the
round-11 levers) or consciously raise the ceiling with a comment
explaining what the extra job buys.
"""

import tempfile

import pytest

from mapreduce_spark.engine import Engine
from mapreduce_spark.inventory import VIEW_DEFS, Inventory

# Measured with tools/jobcount.py at sf0.001 AND sf0.01 (2026-08-15,
# round 12): identical job counts at both scales.
JOB_CEILINGS = {
    "q01": 2, "q02": 3, "q04": 2, "q05": 2, "q06": 2, "q07": 1,
    "q08": 2, "q09": 3, "q10": 1, "q11": 6, "q12": 4, "q13": 2,
    "q14": 2, "q15": 2, "q16": 3, "q17": 3, "q18": 17, "q19": 2,
    "q20": 1, "q21": 3, "q22": 2, "q23": 2, "q24": 1, "q25": 2,
    # q31: 4 since round 12 — the third ('v', shredded-VARIANT
    # layout) oracle leg reads one more persisted view (+1 job for
    # +1 layout under the value-hash gate)
    "q26": 2, "q28": 2, "q29": 2, "q30": 3, "q31": 4, "q32": 2,
    "q33": 2, "q34": 7, "q35": 2, "q36": 2,
}


@pytest.fixture(scope="module")
def warm_inventory(spark, sf_dir):
    eng = Engine(spark, sf_dir, tempfile.mkdtemp(prefix="mrjobgate-"))
    inv = Inventory(spark, sf_dir, engine=eng, warm=True)
    inv.materialize()
    return inv


def test_warm_read_path_job_ceilings(spark, warm_inventory):
    """Every warm inventory query must stay at or below its pinned
    Spark-job ceiling.  One warmup run per query (first-touch
    schema/stat caches), then one measured run in a job group."""
    sc = spark.sparkContext
    tracker = sc.statusTracker()
    over = []
    under = []
    for name, fn in warm_inventory.all_queries().items():
        fn().collect()  # warmup: one-time cache fills are not the gate
        group = f"jobgate-{name}"
        sc.setJobGroup(group, group)
        try:
            fn().collect()
        finally:
            sc._jsc.clearJobGroup()
        jobs = len(tracker.getJobIdsForGroup(group))
        ceiling = JOB_CEILINGS[name]
        if jobs > ceiling:
            over.append(f"{name}: {jobs} jobs > ceiling {ceiling}")
        elif jobs < ceiling:
            under.append(f"{name}: {jobs} < {ceiling}")
    assert not over, (
        "warm read-path job-count regression (the r8-r10 wall-drift "
        "failure mode):\n  " + "\n  ".join(over)
    )
    # improvements are not failures, but keep the gate honest: a
    # future round should ratchet the ceilings down (reported via
    # -rA / verbose output, not an assert)
    if under:
        print("job ceilings now loose (ratchet down): " +
              ", ".join(under))


def test_total_warm_job_budget():
    """Belt-and-braces aggregate bound on the ceiling TABLE itself:
    per-query bumps ("just one more job") must not quietly re-grow
    the read path.  r12 measured total: 101 jobs across all 34
    queries including q18's full metamorphic rebuild (the r10
    regressed state was ~150 on the same counting; PLANS.md's
    130 -> 79 figures counted the non-maintenance read legs only).
    102 = 101 measured + 1 for q31's round-12 shredded-layout oracle
    leg (a deliberate +1-view coverage buy)."""
    assert sum(JOB_CEILINGS.values()) <= 102, (
        "ceiling table drifted past the round-12 measured state -- "
        "fuse the new job or justify the bump here"
    )


def test_view_defs_cover_ceiling_table():
    """The ceiling table and the inventory must stay in sync: a new
    query without a ceiling would silently skip the gate."""
    inv_names = set(
        "q01 q02 q04 q05 q06 q07 q08 q09 q10 q11 q12 q13 q14 q15 "
        "q16 q17 q18 q19 q20 q21 q22 q23 q24 q25 q26 q28 q29 q30 "
        "q31 q32 q33 q34 q35 q36".split()
    )
    assert set(JOB_CEILINGS) == inv_names
    assert VIEW_DEFS  # the warm fixture actually has views to build
