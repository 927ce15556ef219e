"""Source-format adapters: the doc tables as Parquet, JSON-lines, or
CSV directories.

The reference's data interchange is JSON documents (PouchDB dump /
replication streams); this module gives the engine the same breadth on
the Spark side: any fixture table can live as ``<name>.parquet``,
``<name>.json`` (newline-delimited) or ``<name>.csv`` and
``sources.docs.load_table`` resolves whichever is present — every
query, view build, and extension operator then runs unchanged.

Format notes (100 TB-aware):

- **Parquet** is the performance path (columnar pruning, row-group
  stats for the sorted-view range scans).  JSON/CSV exist for
  interchange and ingestion: at scale you land JSON/CSV once, convert
  to Parquet (``convert_table``), and query the Parquet.
- **JSON** export serializes timestamps as ISO-8601 (Spark default);
  the loader restores them via ``to_timestamp`` from the DocTable
  metadata, so round-tripped tables are schema-equivalent.  Declared
  JSON-string columns (``events.props``) are quoted on write and come
  back as strings, exactly like the raw Parquet schema.
- **CSV** cannot carry arrays: exporting a table with ``array_cols``
  (embeddings) raises — use JSON or Parquet for those.
- Schema inference runs once per load (driver-side, sampled by
  Spark); for repeated production loads convert to Parquet instead of
  re-inferring per job.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

FORMATS = ("parquet", "json", "csv")


def table_path(sf_dir: str, name: str) -> tuple[str, str] | None:
    """(path, format) of whichever representation of the table exists,
    in preference order parquet > json > csv; None if absent."""
    for fmt in FORMATS:
        p = f"{sf_dir}/{name}.{fmt}"
        if os.path.exists(p):
            return p, fmt
    return None


def export_table(df: DataFrame, path: str, fmt: str,
                 table: str | None = None) -> None:
    """Write a raw-schema table frame as JSON-lines or CSV (Parquet:
    use the engine's writers).  ``table`` enables the array-column
    guard for CSV."""
    from mapreduce_spark.sources.docs import TABLES

    if fmt == "json":
        df.write.mode("overwrite").json(path)
        return
    if fmt == "csv":
        t = TABLES.get(table or "")
        if t and t.array_cols:
            raise ValueError(
                f"CSV cannot carry array columns {t.array_cols}; "
                "export embeddings-like tables as JSON or Parquet"
            )
        df.write.mode("overwrite").option("header", "true").csv(path)
        return
    if fmt == "parquet":
        df.write.mode("overwrite").parquet(path)
        return
    raise ValueError(f"unknown format {fmt!r} (one of {FORMATS})")


def load_formatted(spark: SparkSession, path: str, fmt: str,
                   name: str) -> DataFrame:
    """Read a non-parquet table representation back to the raw schema
    shape: timestamps restored from ISO strings, integer-ish columns
    left as inferred (downstream MapSpec/doc-space code casts
    explicitly, so long-vs-int inference differences are immaterial).
    """
    from mapreduce_spark.sources.docs import TABLES

    if fmt == "json":
        df = spark.read.json(path)
    elif fmt == "csv":
        df = (
            spark.read.option("header", "true")
            .option("inferSchema", "true")
            .csv(path)
        )
    else:
        raise ValueError(f"load_formatted handles json/csv, not {fmt}")
    t = TABLES.get(name)
    if t:
        for c in t.timestamp_cols:
            if c in df.columns and df.schema[c].dataType.simpleString() \
                    == "string":
                df = df.withColumn(c, F.to_timestamp(c))
        # JSON inference parses declared JSON-string columns into
        # structs when they were written unquoted; normalize back
        for c in t.json_cols:
            if c in df.columns and df.schema[c].dataType.simpleString() \
                    not in ("string",):
                df = df.withColumn(c, F.to_json(c))
    return df


def convert_table(spark: SparkSession, sf_dir: str, name: str,
                  out_dir: str, fmt: str = "parquet") -> str:
    """Land a table in another format (the ingest-once-then-Parquet
    path).  Returns the written path."""
    from mapreduce_spark.sources.docs import load_table

    df = load_table(spark, sf_dir, name)
    out = f"{out_dir}/{name}.{fmt}"
    export_table(df, out, fmt, table=name)
    return out
