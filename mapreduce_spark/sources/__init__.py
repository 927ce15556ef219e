from mapreduce_spark.sources.docs import (
    TABLES,
    DocTable,
    as_docs,
    docs_df,
    load_table,
)

__all__ = ["TABLES", "DocTable", "as_docs", "docs_df", "load_table"]
