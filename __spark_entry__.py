"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` smoke-runs the flagship query at sf0.001;
``queries()`` / ``oracle_sql()`` expose the SURVEY.md §2.1 inventory
(Q1-Q20) plus the training-data extension operators, all implemented by
the ``mapreduce_spark`` engine and checked against DuckDB at sf0.01.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    from mapreduce_spark.inventory import q02

    return q02(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    from mapreduce_spark.inventory import QUERIES

    out = dict(QUERIES)
    try:
        from mapreduce_spark.extensions.inventory import EXT_QUERIES

        out.update(EXT_QUERIES)
    except ImportError:
        pass
    return out


def oracle_sql() -> dict[str, str]:
    """DuckDB-runnable oracle SQL for each query (same column aliases)."""
    from mapreduce_spark.inventory import ORACLE_SQL

    out = dict(ORACLE_SQL)
    try:
        from mapreduce_spark.extensions.inventory import EXT_ORACLE_SQL

        out.update(EXT_ORACLE_SQL)
    except ImportError:
        pass
    return out
