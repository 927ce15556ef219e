"""Streaming incremental view maintenance (SURVEY.md §2 M1 as a
Structured Streaming job).

``maintain_view`` plugs a changes stream into ``Engine.update_view``
through ``foreachBatch``: each micro-batch is mapped, its docs'
previous emits tombstoned, and a delta layer appended — identical to
the batch refresh path, so a streaming-maintained view and a batch
rebuild are hash-equal (test_streaming.py asserts it).

Exactly-once story, two layers deep:
- Spark's streaming checkpoint (``checkpointLocation``) makes each
  source offset range fire foreachBatch at least once;
- the engine's per-batch filter on ``seq > last_seq`` plus the
  tombstone convergence property (a replayed batch tombstones its own
  earlier emits before re-inserting them) make duplicate firings
  harmless.

At scale this is the lakehouse MERGE pattern: refresh cost is
O(changed docs) per trigger, reads stay pruned (the layer stack is
bounded by compaction), and the stream can run ``Trigger.AvailableNow``
for query-time catch-up (stale-mode parity) or continuously.
"""

from __future__ import annotations

from typing import Any

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from mapreduce_spark.sources.docs import TABLES


def file_changes_stream(spark: SparkSession, path: str,
                        table: str) -> DataFrame:
    """A raw-schema changes stream from a directory of parquet files
    (the file source is the local stand-in for Kafka/CDC; schema comes
    from the table registry so no inference pass is needed)."""
    static = spark.read.parquet(path)
    return (
        spark.readStream.schema(static.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(path)
    )


def maintain_view(engine: Any, view_name: str, changes: DataFrame,
                  checkpoint_dir: str, *, available_now: bool = True,
                  filter_seq: bool = False):
    """Drive incremental maintenance of a persisted view from a stream.

    Returns the started StreamingQuery; with ``available_now`` the
    query drains everything currently in the source and stops (the
    streaming analog of the default refresh-then-query staleness
    mode, M2).

    ``filter_seq=True`` additionally drops rows at-or-below the
    engine's last_seq checkpoint — correct ONLY for sources that
    replay in seq order (a CouchDB-style changes feed); for arbitrary
    arrival orders Spark's own checkpoint is the dedup boundary and
    the filter must stay off.
    """
    vdef = engine._resolve(view_name)[0]
    seq_expr = TABLES[vdef.table].seq_expr

    def process(batch_df: DataFrame, batch_id: int) -> None:
        fresh = batch_df
        if filter_seq:
            entry = engine.registry.get_view(vdef.sig)
            last = entry["last_seq"] if entry else 0
            fresh = batch_df.filter(
                F.expr(seq_expr).cast("long") > F.lit(last)
            )
        engine.update_view(vdef, changes=fresh)

    writer = (
        changes.writeStream.foreachBatch(process)
        .option("checkpointLocation", checkpoint_dir)
        .queryName(f"maintain-{vdef.sig[:8]}")
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
