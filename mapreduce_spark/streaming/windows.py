"""Watermarked event-time window aggregates over the builtin reduce
vocabulary.

The reference expresses time windows by making the USER put time
components into the emitted key (``emit([type, y, m, d, h], v)`` —
SURVEY.md §2 Q16) and has no late-data story beyond full per-doc
recompute.  This module is the Spark-native strengthening: real
event-time tumbling/sliding windows with a watermark bounding state,
producing the same `{sum, count, min, max, sumsqr}` shapes as the
`_stats`/`_sum`/`_count` builtins so results are comparable across the
two idioms.

Scale notes: the aggregation state is per (window, key) and pruned by
the watermark; skewed keys can be salted upstream; output mode
``update``/``append`` streams deltas instead of full recomputes.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def windowed_reduce(stream: DataFrame, *, ts_col: str, window: str,
                    keys: list[str], value_col: str | None = None,
                    watermark: str = "1 hour",
                    slide: str | None = None) -> DataFrame:
    """Tumbling (or sliding, with ``slide``) windowed builtin reduce.

    Returns a streaming DataFrame keyed by (window_start, window_end,
    *keys) with _count/_sum/_stats-equivalent aggregate columns.  Works
    identically on a batch DataFrame (Spark's unified semantics), which
    is how tests pin streaming output to the batch oracle.
    """
    win = F.window(F.col(ts_col), window, slide or window)
    src = stream
    if stream.isStreaming:
        src = stream.withWatermark(ts_col, watermark)
    v: Column = (
        F.col(value_col) if value_col else F.lit(None).cast("double")
    )
    return (
        src.groupBy(win.alias("w"), *[F.col(k) for k in keys])
        .agg(
            F.count(F.lit(1)).alias("cnt"),
            F.sum(v).alias("sum_v"),
            F.min(v).alias("min_v"),
            F.max(v).alias("max_v"),
            F.sum(v * v).alias("sumsqr_v"),
        )
        .select(
            F.col("w.start").alias("window_start"),
            F.col("w.end").alias("window_end"),
            *keys,
            "cnt",
            "sum_v",
            "min_v",
            "max_v",
            "sumsqr_v",
        )
    )
