"""Shared helpers for the extension operators."""

from __future__ import annotations

import os
import warnings

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

_release_warned = False


def release_local_checkpoint(df: DataFrame) -> None:
    """Release the storage blocks of a ``localCheckpoint()``'d
    DataFrame.

    ``DataFrame.unpersist()`` is the WRONG lever here — it talks to
    the CacheManager (``.cache()/.persist()`` plans) and silently
    no-ops on the RDD-level persist a checkpoint holds; likewise
    ``queryExecution().toRdd()`` returns a fresh wrapper RDD whose
    unpersist touches nothing (measured round 13: a long CC run
    retained one edge frame PER ROUND and OOM'd a 48g heap at 100M
    edges).  The checkpointed DataFrame's analyzed plan is a
    ``LogicalRDD`` whose ``rdd()`` accessor IS the persisted RDD —
    unpersist that.  Best-effort: any plan shape other than a
    checkpoint (or a future Spark changing the internals) just
    leaves the blocks for session GC, as before — but NOT silently:
    this helper rides private accessors, and a Spark upgrade that
    renames them would otherwise no-op invisibly, regressing
    connected_components to O(rounds) retained edge frames (the
    100M-edge OOM this exists to prevent) with no signal outside the
    version-pinned test suite (ADVICE r13).  One warning per session,
    not per call — iterative callers hit this every round."""
    global _release_warned
    try:
        df._jdf.queryExecution().analyzed().rdd().unpersist(False)
    except Exception as exc:
        if not _release_warned:
            _release_warned = True
            warnings.warn(
                "release_local_checkpoint could not reach the "
                f"checkpointed RDD ({type(exc).__name__}: {exc}); "
                "storage blocks of iterative checkpoints will "
                "accumulate until session GC. Spark internals may "
                "have changed.",
                RuntimeWarning,
                stacklevel=2,
            )


def dot_col(x: Column, y: Column) -> Column:
    """Σ xᵢ·yᵢ via zip_with/aggregate (JVM higher-order functions).

    NB: higher-order-function lambdas are CodegenFallback — evaluated
    by the expression interpreter once per ELEMENT.  That sounds like
    a reason to batch through Arrow (:func:`dot_pairs`), but the r15
    interleaved A/B on the exact top-k shape measured the kernel as a
    LOSS at pair-scoring sites (wall 1.56 → 2.25 s, JVM CPU 0.81 →
    1.22 + uncounted Python-worker CPU): a pair row carries BOTH
    d-dim arrays, so the Python boundary ships 2·d doubles per pair
    and the transfer dwarfs the interpreted fold it replaces.  Keep
    the fold for per-pair scoring; reach for Arrow kernels where the
    batch input is one row per VECTOR (``_band_values``, the
    blocked-GEMM tiles, ``_assign_cells``), where the boundary cost
    amortizes across all comparisons against that vector."""
    return F.aggregate(
        F.zip_with(x, y, lambda a, b: a * b),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def dot_pairs(x: Column, y: Column) -> Column:
    """Arrow-batched Σ xᵢ·yᵢ over two array<double> columns.

    One ``np.einsum`` per Arrow batch instead of an interpreted HOF
    fold per element.  MEASURED AND REJECTED as the default for the
    pair-scoring paths (r15): at bench scale (2k vectors × 64 dims ×
    5 queries) it ships 2·d doubles per PAIR across the Python
    boundary and loses ~45% wall to :func:`dot_col` — see that
    docstring for the numbers.  Kept because the trade flips when the
    per-pair payload is reused across many pairs on one side (dense
    candidate lists per query at high dim), and because its
    value-tolerance story is established: summation order differs
    from the sequential fold only in the last float64 bits — the same
    tolerance class as the DuckDB oracle's ``list_cosine_similarity``
    (its own SIMD order); hash-equality of all four sim/embedding
    contract rows was verified at sf0.01 AND sf0.1 with this kernel
    wired in before the A/B reverted it.
    """
    @F.pandas_udf("double")
    def _dot_kernel(a: pd.Series, b: pd.Series) -> pd.Series:
        if not len(a):
            return pd.Series([], dtype="float64")
        A = np.array(a.tolist(), dtype=np.float64)
        B = np.array(b.tolist(), dtype=np.float64)
        return pd.Series(np.einsum("ij,ij->i", A, B))

    # the near-dup consumers filter on the produced column; without
    # this the optimizer pushes that filter below the projection and
    # evaluates the kernel TWICE (one ArrowEvalPython under the
    # Filter, one above — guide §4.4 shape, observed on
    # embedding_near_dup).  The kernel is pure, but nondeterministic
    # marking is the documented lever that pins a single evaluation.
    return _dot_kernel.asNondeterministic()(x, y)


def norm_col(x: Column) -> Column:
    return F.sqrt(
        F.aggregate(x, F.lit(0.0), lambda acc, v: acc + v * v)
    )


def normalized_vectors(emb: DataFrame, id_col: str = "vec_id",
                       vec_col: str = "embedding") -> DataFrame:
    """(vid, nv) with nv L2-normalized, double precision.

    The norm is materialized into its own column FIRST — embedding the
    norm aggregate inside the per-element transform lambda would
    re-evaluate it once per element (O(d²) interpreted work per row).
    """
    v = F.col(vec_col).cast("array<double>")
    staged = right_size(emb).select(
        F.col(id_col).alias("vid"), v.alias("_v")
    ).withColumn("_n", F.greatest(norm_col(F.col("_v")), F.lit(1e-12)))
    return staged.select(
        "vid",
        F.transform("_v", lambda x: x / F.col("_n")).alias("nv"),
    )


def fanout_width(df: DataFrame, min_factor: int = 1,
                 min_bytes: int = 0) -> int:
    """Partition count ``right_size`` would fan ``df`` out to, or 0.

    Exposed separately so a caller that must decide something ELSE
    based on whether the fan-out will happen (e.g. the engine's
    persist-across-sampling-passes choice) can ask without building
    a throwaway repartitioned frame.

    ``min_bytes`` gates the fan-out on total input size: below it the
    serial compute is cheaper than the exchange plus the extra AQE
    shuffle-stage job the repartition costs (a 4 KB dimension table
    gains nothing from 32 tasks).  Sizes are read from the local
    filesystem; non-local or unstat-able inputs are assumed big
    (fan out) — at real scale the file-count check already made this
    a no-op."""
    target = df.sparkSession.sparkContext.defaultParallelism * min_factor
    try:
        files = df.inputFiles()
    except Exception:
        return 0
    if not (0 < len(files) < target):
        return 0
    if min_bytes:
        from urllib.parse import unquote, urlparse

        total = 0
        for uri in files:
            parts = urlparse(uri)
            if parts.scheme not in ("", "file"):
                total = min_bytes  # remote store: size unknown
                break
            try:
                total += os.path.getsize(unquote(parts.path))
            except OSError:
                total = min_bytes
                break
            if total >= min_bytes:
                break
        if total < min_bytes:
            return 0
    return target


def right_size(df: DataFrame, min_factor: int = 1,
               min_bytes: int = 0) -> DataFrame:
    """Ensure a CPU-bound stage has at least one partition per core.

    Small inputs (one parquet file) arrive as a single split, which
    serializes md5/shingle/dot-product work onto one task; a 100 TB
    input already has thousands of splits and this is a no-op.

    The probe uses ``inputFiles()`` (driver-side leaf-file listing —
    split count ≥ file count) instead of ``df.rdd.getNumPartitions()``,
    which would force the whole lineage through RDD conversion planning
    on every call.  Non-file-backed frames (inputFiles empty) pass
    through untouched.  See ``fanout_width`` for the ``min_bytes``
    size gate."""
    n = fanout_width(df, min_factor=min_factor, min_bytes=min_bytes)
    return df.repartition(n) if n else df
