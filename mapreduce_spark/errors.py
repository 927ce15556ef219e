"""Error classes with reference parity (SURVEY.md §2 V1).

Mirrors the error surface of pouchdb/mapreduce (upstream packages
``pouchdb-mapreduce-utils`` error classes + ``checkQueryParseError``):
``QueryParseError`` (HTTP-400-shaped option validation), ``NotFoundError``
(``missing_named_view``), ``BuiltInError`` (``invalid_value`` for unknown
``_``-prefixed reduce names and bad builtin inputs).
"""

from __future__ import annotations


class MapReduceError(Exception):
    """Base class for engine errors."""

    status: int = 500
    name: str = "error"

    def __init__(self, message: str, *, reason: str | None = None) -> None:
        super().__init__(message)
        self.message = message
        self.reason = reason or message


class QueryParseError(MapReduceError):
    """Invalid query options (upstream ``QueryParseError``, HTTP 400)."""

    status = 400
    name = "query_parse_error"


class NotFoundError(MapReduceError):
    """Missing design doc / view (upstream ``NotFoundError``)."""

    status = 404
    name = "not_found"

    def __init__(self, message: str = "missing_named_view", **kw) -> None:
        super().__init__(message, **kw)


class BuiltInError(MapReduceError):
    """Bad builtin reduce name or invalid builtin input
    (upstream ``BuiltInError``, reason ``invalid_value``)."""

    status = 500
    name = "invalid_value"
