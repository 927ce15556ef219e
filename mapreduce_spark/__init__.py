"""mapreduce_spark — a PySpark-native analytics engine with the query and
data-processing capabilities of pouchdb/mapreduce (CouchDB-style incremental
map/reduce views), re-designed Spark-first.

Reference: github.com/pouchdb/mapreduce (moved into pouchdb/pouchdb — see
/root/reference/readme.md). Blueprint: /root/repo/SURVEY.md.
"""

from mapreduce_spark.collate import (
    collate,
    normalize_key,
    parse_indexable_string,
    to_indexable_string,
)
from mapreduce_spark.errors import (
    BuiltInError,
    MapReduceError,
    NotFoundError,
    QueryParseError,
)

__version__ = "0.1.0"

__all__ = [
    "collate",
    "normalize_key",
    "to_indexable_string",
    "parse_indexable_string",
    "MapReduceError",
    "QueryParseError",
    "NotFoundError",
    "BuiltInError",
    "Engine",
    "DocTable",
    "register_table",
    "raw_doc_table",
]

_LAZY = {
    "Engine": ("mapreduce_spark.engine", "Engine"),
    "DocTable": ("mapreduce_spark.sources.docs", "DocTable"),
    "register_table": ("mapreduce_spark.sources.docs", "register_table"),
    "raw_doc_table": ("mapreduce_spark.sources.docs", "raw_doc_table"),
}


def __getattr__(name):
    # Lazy import: keep `import mapreduce_spark` free of the pyspark import
    # cost for pure-Python consumers (e.g. collation property tests).
    if name in _LAZY:
        import importlib

        mod, attr = _LAZY[name]
        return getattr(importlib.import_module(mod), attr)
    raise AttributeError(name)
