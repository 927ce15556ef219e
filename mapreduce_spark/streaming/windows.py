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


def watermarkable(df: DataFrame, ts_col: str) -> tuple[DataFrame, bool]:
    """Prepare an event-time column for ``withWatermark``.

    Spark watermarks require LTZ TIMESTAMP
    (EVENT_TIME_IS_NOT_ON_TIMESTAMP_TYPE), but the doc-model normal
    form is ``timestamp_ntz`` (sources/docs.ts_to_micros).  Cast NTZ →
    LTZ here and have the window operator cast the window bounds back,
    so batch and stream runs of the same pipeline produce identical
    schemas.  Value-exact under the engine's pinned UTC session
    timezone.  Returns (df, was_ntz).
    """
    ntz = dict(df.dtypes).get(ts_col) == "timestamp_ntz"
    if ntz:
        df = df.withColumn(ts_col, F.col(ts_col).cast("timestamp"))
    return df, ntz


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
    src, ntz = stream, False
    if stream.isStreaming:
        src, ntz = watermarkable(stream, ts_col)
        src = src.withWatermark(ts_col, watermark)
    win = F.window(F.col(ts_col), window, slide or window)
    v: Column = (
        F.col(value_col) if value_col else F.lit(None).cast("double")
    )

    def bound(c: str) -> Column:
        return F.col(c).cast("timestamp_ntz") if ntz else F.col(c)

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
            bound("w.start").alias("window_start"),
            bound("w.end").alias("window_end"),
            *keys,
            "cnt",
            "sum_v",
            "min_v",
            "max_v",
            "sumsqr_v",
        )
    )
