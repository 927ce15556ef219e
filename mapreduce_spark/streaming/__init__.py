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
- ``dedup`` — streaming deduplication for ingest pipelines: exact
  content dedup with watermark-TTL state, and near-dup dedup against
  all of history via a foreachBatch-maintained MinHash signature
  index.
"""

from mapreduce_spark.streaming.dedup import (
    incremental_minhash_dedup,
    stream_exact_dedup,
)
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
    "incremental_minhash_dedup",
    "maintain_view",
    "stream_exact_dedup",
    "running_totals",
    "session_reduce",
    "windowed_reduce",
]
