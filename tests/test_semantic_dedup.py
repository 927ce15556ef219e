"""SemDeDup-style semantic pruning (dedup.semantic_dedup, round 14).

Pinned against a driver-side numpy replica of the same greedy rule,
plus the structural invariants the operator guarantees regardless of
clustering: no two kept items within a pruned group reach the
threshold, and every suppressed item points at a kept suppressor it
actually matches.
"""
from collections import defaultdict

import numpy as np
import pytest
from pyspark.sql import functions as F

from mapreduce_spark.extensions import dedup

DIM = 12
GROUPS = 30
COPIES = 3  # near-identical members per planted group


@pytest.fixture(scope="module")
def planted(spark):
    """GROUPS well-separated base vectors, each with COPIES
    near-identical members (tiny deterministic perturbation)."""
    rng = np.random.default_rng(20260816)
    base = rng.normal(size=(GROUPS, DIM))
    base /= np.linalg.norm(base, axis=1, keepdims=True)
    rows = []
    vid = 0
    for g in range(GROUPS):
        for c in range(COPIES):
            v = base[g] + 0.001 * rng.normal(size=DIM) * c
            rows.append((vid, g, [float(x) for x in v]))
            vid += 1
    df = spark.createDataFrame(rows, "vec_id long, group long, "
                                     "embedding array<double>")
    df = df.cache()
    df.count()
    yield df
    df.unpersist()


def _cosine(a, b):
    a, b = np.asarray(a), np.asarray(b)
    return float(a @ b / (np.linalg.norm(a) * np.linalg.norm(b)))


def test_one_survivor_per_planted_group(planted):
    out = dedup.semantic_dedup(
        planted, 0.99, n_cells=8
    ).collect()
    assert len(out) == GROUPS * COPIES
    by_vid = {r.vid: r for r in out}
    survivors = [r for r in out if not r.is_dup]
    # groups are well-separated; copies are near-identical.  Every
    # group keeps at least one member; a group split across cells may
    # keep one per cell, but within a cell exactly one survives.
    per_group_cell = defaultdict(list)
    for r in out:
        per_group_cell[(r.vid // COPIES, r.cell)].append(r)
    for members in per_group_cell.values():
        kept = [r for r in members if not r.is_dup]
        assert len(kept) == 1
        for r in members:
            assert by_vid[r.kept_by].is_dup is False
            assert by_vid[r.kept_by].cell == r.cell
    assert GROUPS <= len(survivors) <= GROUPS * COPIES // 2


def test_matches_numpy_greedy_replica(planted, spark):
    """Exact agreement with a driver-side replica of the rule, per
    (cell, sub) group: central-first greedy, id tie-break."""
    from mapreduce_spark.extensions import similarity as sim

    out = dedup.semantic_dedup(planted, 0.995, n_cells=8).collect()
    nd = dedup.normalized_vectors(planted).collect()
    nv = {r.vid: np.array(r.nv) for r in nd}
    cells = defaultdict(list)
    for r in out:
        cells[r.cell].append(r)
    for cell, members in cells.items():
        order = sorted(members, key=lambda r: (-r.fit, r.vid))
        kept, expect = [], {}
        for r in order:
            sims = [float(nv[k] @ nv[r.vid]) for k in kept]
            if sims and max(sims) >= 0.995:
                expect[r.vid] = (True, kept[int(np.argmax(sims))])
            else:
                kept.append(r.vid)
                expect[r.vid] = (False, r.vid)
        for r in members:
            assert (r.is_dup, r.kept_by) == expect[r.vid], (
                cell, r.vid
            )


def test_keep_diverse_orders_ascending_fit(planted):
    out = dedup.semantic_dedup(
        planted, 0.99, n_cells=8, keep="diverse"
    ).collect()
    # the survivor of each within-cell group is its LOWEST-fit member
    by_vid = {r.vid: r for r in out}
    for r in out:
        if r.is_dup:
            assert by_vid[r.kept_by].fit <= r.fit + 1e-9


def test_max_cell_subsplit_bounds_groups(planted):
    out = dedup.semantic_dedup(
        planted, 0.99, n_cells=8, max_cell=10
    ).collect()
    assert len(out) == GROUPS * COPIES
    # kept_by still points at a genuine non-dup suppressor
    by_vid = {r.vid: r for r in out}
    for r in out:
        assert by_vid[r.kept_by].is_dup is False


def test_invalid_keep_mode(planted):
    with pytest.raises(ValueError, match="central"):
        dedup.semantic_dedup(planted, 0.9, keep="best")


def test_single_assignment_evaluation(planted):
    """The cell-size sub-split must ride a window over the one
    assignment pass — a groupBy+join shape would evaluate the
    corpus-wide assignment UDF twice (one ArrowEvalPython subtree per
    reference)."""
    import re

    # force the >512-literal UDF assignment path (n_cells * dim)
    plan = (
        dedup.semantic_dedup(planted, 0.99, n_cells=64)
        ._jdf.queryExecution().executedPlan().toString()
    )
    # exactly two pandas stages: the cell assignment and the fit
    assert len(re.findall(r"ArrowEvalPython", plan)) == 2
