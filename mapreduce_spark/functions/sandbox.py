"""Sandbox helpers available to Python map/reduce functions (F1).

Upstream compiles user JS with exactly these globals in scope
(``pouchdb-abstract-mapreduce`` evalFunc: ``emit``, ``sum``, ``log``,
``isArray``, ``toJSON``).  In Python the idiomatic equivalent is an
importable module — user functions do::

    from mapreduce_spark.functions.sandbox import sum_values, log, \
        is_array, to_json

``emit`` is positional (the second argument of the map fn), matching
the engine's map contract.
"""

from __future__ import annotations

import json
import logging
from typing import Any

_log = logging.getLogger("mapreduce_spark.views")


def sum_values(values: list) -> Any:
    """CouchDB-compatible sum (upstream ``pouchdb-mapreduce-utils#sum``):
    numbers sum numerically; arrays sum element-wise; a number mixed
    with arrays counts as [number]; shorter arrays zero-pad; any other
    type raises (builtin_reduce_error shape)."""
    out: Any = 0
    for v in values:
        if isinstance(v, (int, float)) and not isinstance(v, bool):
            if isinstance(out, list):
                out[0] = out[0] + v
            else:
                out = out + v
        elif isinstance(v, list):
            if not isinstance(out, list):
                out = [out]
            if len(v) > len(out):
                out = out + [0] * (len(v) - len(out))
            for i, x in enumerate(v):
                if not isinstance(x, (int, float)) or isinstance(x, bool):
                    raise TypeError(
                        "builtin _sum function requires map values to "
                        "be numbers or arrays of numbers"
                    )
                out[i] = out[i] + x
        else:
            raise TypeError(
                "builtin _sum function requires map values to be "
                "numbers or arrays of numbers"
            )
    return out


def log(*args: Any) -> None:
    """Upstream ``log()`` global → the engine's logger."""
    _log.info(" ".join(str(a) for a in args))


def is_array(v: Any) -> bool:
    """Upstream ``isArray`` (note: NOT true for tuples/strings —
    JS-array semantics)."""
    return isinstance(v, list)


def to_json(v: Any) -> str:
    """Upstream ``toJSON`` → compact JSON (JS JSON.stringify shape)."""
    return json.dumps(v, separators=(",", ":"), ensure_ascii=False)
