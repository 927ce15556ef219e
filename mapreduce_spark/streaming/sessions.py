"""Session windows + custom stateful operators over streams.

Two shapes the reference cannot express at all (it has no event-time
or state machinery — SURVEY.md §2 M-row):

- ``session_reduce`` — declarative session windows
  (``F.session_window``): gap-based sessions per key with the same
  aggregate vocabulary as the builtins.  Unified batch/stream
  semantics, so tests pin the streaming output to the batch run.
- ``running_totals`` — a custom stateful operator via
  ``applyInPandasWithState``: per-key cumulative aggregates carried in
  GroupState across micro-batches (the pattern a bespoke streaming
  operator — dedup-by-key, CDC folding, rate limiting — builds on).

Scale notes: state lives per key in the state store, partitioned by
the grouping key; watermarks bound session state, and the stateful
operator should set timeouts in production (omitted here — the tests
drive bounded replays).
"""

from __future__ import annotations

from typing import Any, Iterator, Tuple

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout


def session_reduce(df: DataFrame, *, ts_col: str, gap: str,
                   keys: list[str], value_col: str | None = None,
                   watermark: str = "1 hour") -> DataFrame:
    """Gap-based session windows per key with count/sum aggregates.

    Works identically on batch and streaming inputs (streaming gets a
    watermark to bound session state).
    """
    from mapreduce_spark.streaming.windows import watermarkable

    src, ntz = df, False
    if df.isStreaming:
        src, ntz = watermarkable(df, ts_col)
        src = src.withWatermark(ts_col, watermark)
    v = F.col(value_col) if value_col else F.lit(None).cast("double")

    def bound(c):
        return F.col(c).cast("timestamp_ntz") if ntz else F.col(c)

    return (
        src.groupBy(
            F.session_window(F.col(ts_col), gap).alias("w"),
            *[F.col(k) for k in keys],
        )
        .agg(
            F.count(F.lit(1)).alias("cnt"),
            F.sum(v).alias("sum_v"),
        )
        .select(
            bound("w.start").alias("session_start"),
            bound("w.end").alias("session_end"),
            *keys,
            "cnt",
            "sum_v",
        )
    )


RUNNING_SCHEMA = T.StructType(
    [
        T.StructField("key", T.StringType(), False),
        T.StructField("total_cnt", T.LongType(), False),
        T.StructField("total_sum", T.DoubleType(), False),
    ]
)

_STATE_SCHEMA = T.StructType(
    [
        T.StructField("cnt", T.LongType(), False),
        T.StructField("sum", T.DoubleType(), False),
    ]
)


def running_totals(stream: DataFrame, *, key_col: str,
                   value_col: str) -> DataFrame:
    """Custom stateful operator: per-key running (count, sum) across
    micro-batches via applyInPandasWithState.

    Emits the updated cumulative row for each key seen in a batch —
    the streaming analog of an incrementally-maintained `_stats`-lite
    view keyed by the group.
    """
    src = stream.select(
        F.col(key_col).cast("string").alias("key"),
        F.col(value_col).cast("double").alias("v"),
    )

    def update(
        key: Tuple[Any, ...],
        pdfs: Iterator[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        cnt, total = state.get if state.exists else (0, 0.0)
        for pdf in pdfs:
            cnt += len(pdf)
            total += float(pdf["v"].fillna(0.0).sum())
        state.update((cnt, total))
        yield pd.DataFrame(
            [{"key": key[0], "total_cnt": cnt, "total_sum": total}]
        )

    return src.groupBy("key").applyInPandasWithState(
        update,
        outputStructType=RUNNING_SCHEMA,
        stateStructType=_STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
