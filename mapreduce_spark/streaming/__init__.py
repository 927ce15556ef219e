"""Structured Streaming surface of the engine.

The reference has no event-time semantics at all (SURVEY.md §2 M-row:
"late" data is just another change sequence, recomputed per doc).  Our
streaming layer therefore has two parts:

- ``maintain`` — the reference-parity part: a changes *stream* drives
  the same incremental view maintenance (M1) the batch path uses, via
  ``foreachBatch`` + the engine's tombstone/delta layers and last_seq
  checkpoint (exactly-once by convergence: replaying a batch tombstones
  its own prior emits).
- ``windows`` — the Spark-native extension: watermarked tumbling/
  sliding-window aggregates over the same builtin reduce vocabulary
  (_count/_sum/_stats), for the "time window as key" idiom (Q16)
  expressed with real event-time semantics instead of key prefixes.
"""

from mapreduce_spark.streaming.maintain import (
    file_changes_stream,
    maintain_view,
)
from mapreduce_spark.streaming.sessions import (
    running_totals,
    session_reduce,
)
from mapreduce_spark.streaming.windows import windowed_reduce

__all__ = [
    "file_changes_stream",
    "maintain_view",
    "running_totals",
    "session_reduce",
    "windowed_reduce",
]
