"""Query options: the engine's logical plan IR + validation (V1).

The reference has no plan IR beyond the validated options object
(SURVEY.md §3); we keep the same shape.  Validation mirrors upstream
``pouchdb-abstract-mapreduce/src/index.js#checkQueryParseError`` +
``coerceInteger``: error *classes* and trigger conditions are parity;
message texts are ours.
"""

from __future__ import annotations

from dataclasses import dataclass, field, replace
from typing import Any

from mapreduce_spark.errors import QueryParseError


class _Unset:
    def __repr__(self) -> str:  # pragma: no cover
        return "UNSET"

    def __bool__(self) -> bool:
        return False


UNSET = _Unset()


def _coerce_integer(v: Any, name: str) -> int:
    # upstream coerceInteger: numeric strings and floats with integral
    # value are accepted; anything else is a QueryParseError
    try:
        f = float(v)
        i = int(f)
        if f == i:
            return i
    except (TypeError, ValueError):
        pass
    raise QueryParseError(f"Invalid value for integer: {v!r}")


def options_from(opts: dict) -> "QueryOptions":
    """Construct QueryOptions, mapping unknown kwargs to the upstream
    error class (a clear QueryParseError naming the offenders, never a
    bare dataclass TypeError).  Shared by the local engine and the
    HTTP passthrough."""
    try:
        return QueryOptions(**opts)
    except TypeError:
        bad = sorted(set(opts) - set(QueryOptions.__dataclass_fields__))
        if not bad:  # TypeError for some other reason: don't mislabel
            raise
        raise QueryParseError(
            f"unknown query option(s): {', '.join(bad)}"
        ) from None


@dataclass
class QueryOptions:
    """Validated options for one view query (SURVEY.md §2 entry-point)."""

    reduce: bool | None = None  # None = reduce iff view has one
    group: bool = False
    group_level: int | None = None
    key: Any = UNSET
    keys: Any = UNSET
    startkey: Any = UNSET
    endkey: Any = UNSET
    # docid tie-breaks for the range boundaries (CouchDB
    # startkey_docid/endkey_docid): the index key is (key, docid), so
    # these refine where the scan starts/stops WITHIN a run of
    # duplicate keys — the canonical duplicate-key pagination
    # mechanism.  CouchDB parity: ignored when the matching key option
    # is not set.
    startkey_docid: Any = UNSET
    endkey_docid: Any = UNSET
    inclusive_end: bool = True
    descending: bool = False
    limit: int | None = None
    skip: int = 0
    include_docs: bool = False
    conflicts: bool = False
    # J3 attachments (raw doc sources store attachment bodies in the
    # doc): include_docs returns STUBS (data dropped; stub/length/
    # digest added) by default, `attachments=True` inlines the base64
    # data verbatim — CouchDB's exact contract.  Typed fixture tables
    # carry no attachments, so the option is a no-op there.
    attachments: bool = False
    # accepted for API parity and ignored (base64-vs-binary transport
    # encodings don't apply to a DataFrame engine)
    att_encoding_info: bool = False
    binary: bool = False
    stale: str | None = None  # None | 'ok' | 'update_after'
    # CouchDB 2.x successor of `stale`: True (refresh first, default),
    # False (serve current index; ≡ stale='ok'), 'lazy' (serve current,
    # refresh after; ≡ stale='update_after').  Normalized onto `stale`
    # in validated(); takes precedence when both are given (upstream
    # treats `stale` as deprecated sugar).
    update: Any = UNSET
    # sorted=False (map queries): rows come back in storage order —
    # skips the global sort / TakeOrdered, CouchDB's documented
    # performance escape hatch.  Grouped reduces ignore it (grouping
    # defines the order); keys= ignores it (request order is semantic).
    sorted: bool = True
    # CouchDB `stable`: whether the response may only come from a
    # stable (fully committed) view snapshot.  This engine's reads are
    # ALWAYS stable — the LSM assemble sees exactly the registry's
    # committed base+layers (atomic JSON rename) — so the option is
    # accepted for API parity and validated, never changes behavior.
    stable: bool | None = None
    update_seq: bool = False

    def validated(self, *, has_reduce: bool) -> "QueryOptions":
        o = replace(self)
        if o.group_level is not None:
            o.group_level = _coerce_integer(o.group_level, "group_level")
            if o.group_level < 0:
                raise QueryParseError(
                    "Invalid value for positive integer: "
                    f"{o.group_level!r}"
                )
        if o.limit is not None:
            o.limit = _coerce_integer(o.limit, "limit")
            if o.limit < 0:
                # CouchDB: negative limit is a query_parse_error
                raise QueryParseError(
                    f"Invalid value for positive integer: {o.limit!r}"
                )
        o.skip = _coerce_integer(o.skip or 0, "skip")
        if o.skip < 0:
            raise QueryParseError(
                f"Invalid value for positive integer: {o.skip!r}"
            )

        will_reduce = has_reduce if o.reduce is None else (
            o.reduce and has_reduce
        )
        if o.reduce and not has_reduce:
            # explicit reduce=true on a map-only view
            raise QueryParseError(
                "Invalid use of reduce on a map-only view"
            )
        if (o.group or o.group_level is not None) and not will_reduce:
            raise QueryParseError(
                "Invalid use of grouping on a map view"
            )

        if o.keys is not UNSET:
            if not isinstance(o.keys, list):
                raise QueryParseError("`keys` must be an array")
            if o.group_level is not None:
                raise QueryParseError(
                    "Multi-key fetches for a reduce view must use "
                    "`group: true` (not `group_level`)"
                )
            if will_reduce and not o.group:
                raise QueryParseError(
                    "Multi-key fetches for reduce views must use "
                    "`group: true`"
                )
            if o.startkey is not UNSET or o.endkey is not UNSET:
                raise QueryParseError(
                    "Multi-key fetches for views must not use "
                    "startkey/endkey"
                )
        # CouchDB: "Ignored if startkey is not set" (resp. endkey)
        if o.startkey is UNSET:
            o.startkey_docid = UNSET
        if o.endkey is UNSET:
            o.endkey_docid = UNSET
        for nm in ("startkey_docid", "endkey_docid"):
            v = getattr(o, nm)
            if v is not UNSET and not isinstance(v, str):
                raise QueryParseError(f"`{nm}` must be a string")
        if o.stale not in (None, "ok", "update_after"):
            raise QueryParseError(f"Invalid value for stale: {o.stale!r}")
        if o.stable not in (None, True, False):
            raise QueryParseError(
                f"Invalid value for stable: {o.stable!r}"
            )
        if o.update is not UNSET:
            if o.update is True:
                o.stale = None
            elif o.update is False:
                o.stale = "ok"
            elif o.update == "lazy":
                o.stale = "update_after"
            else:
                raise QueryParseError(
                    f"Invalid value for update: {o.update!r}"
                )
        if o.group_level == 0 and not o.group:
            # CouchDB: group_level=0 ≡ no grouping (one global
            # reduction); normalized here, AFTER the grouping-on-a-
            # map-view check above (which must still fire for it)
            o.group_level = None
        return o

    @property
    def is_grouped(self) -> bool:
        return self.group or self.group_level is not None
