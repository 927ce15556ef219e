"""A deterministic JS ``Date`` for the interpreted ddoc tiers.

Upstream runs design docs in a real JS engine, and date bucketing
(``new Date(doc.ts).getUTCFullYear()``) is one of the most common
map-fn idioms; PouchDB's collation converts Date keys via
``toJSON()`` (SURVEY §1.3 normalizeKey).  This engine pins ddoc
execution to UTC — a view build must be deterministic and
identical on every executor, so:

- the local-time getters (``getFullYear`` …) EQUAL the UTC ones
  (CouchDB servers conventionally run UTC; a TZ-dependent view is a
  misfeature we deliberately do not reproduce);
- ``new Date()`` with NO arguments and ``Date.now()`` raise a loud
  error instead of returning the wall clock: a current-time view
  would silently diverge between incremental refresh and rebuild;
- ``toString`` renders the ISO form (V8's human format is
  implementation- and TZ-defined — there is no portable answer).

Everything else follows the ECMAScript spec: epoch-milliseconds
representation clamped to ±8.64e15 (NaN = Invalid Date), component
constructors with JS month/day overflow rolling and the 0-99 →
1900+y year rule, ISO-8601 parsing (date-only and date-time, ``Z``
or ``±HH:MM`` offsets), and ``toJSON()`` → ISO string / null when
invalid.  Calendar math is the standard days-from-civil algorithm
(public domain, Howard Hinnant's date library write-up), valid over
the full JS range (±275760 years) — no ``datetime`` year limits.
"""

from __future__ import annotations

import math
import re
from typing import Any

_MAX_MS = 8.64e15  # spec: 100 000 000 days either side of epoch
_DAY_MS = 86_400_000.0


def _days_from_civil(y: int, m: int, d: int) -> int:
    """(year, month 1-12, day) → days since 1970-01-01."""
    y -= m <= 2
    era = (y if y >= 0 else y - 399) // 400
    yoe = y - era * 400
    doy = (153 * ((m - 3) % 12) + 2) // 5 + d - 1
    doe = yoe * 365 + yoe // 4 - yoe // 100 + doy
    return era * 146097 + doe - 719468


def _civil_from_days(z: int) -> tuple[int, int, int]:
    """days since epoch → (year, month 1-12, day)."""
    z += 719468
    era = (z if z >= 0 else z - 146096) // 146097
    doe = z - era * 146097
    yoe = (doe - doe // 1460 + doe // 36524 - doe // 146096) // 365
    y = yoe + era * 400
    doy = doe - (365 * yoe + yoe // 4 - yoe // 100)
    mp = (5 * doy + 2) // 153
    d = doy - (153 * mp + 2) // 5 + 1
    m = mp + (3 if mp < 10 else -9)
    return y + (m <= 2), m, d


def _to_int(v: float) -> float:
    """JS ToIntegerOrInfinity on an already-ToNumber'd value."""
    if v != v:
        return math.nan
    if math.isinf(v):
        return v
    return math.trunc(v)


def make_day_ms(year: float, month: float = 0.0, day: float = 1.0,
                h: float = 0.0, mi: float = 0.0, s: float = 0.0,
                ms: float = 0.0) -> float:
    """JS MakeDay/MakeTime/TimeClip over numeric components (month is
    the JS 0-based month INDEX; overflow in any component rolls)."""
    parts = [_to_int(x) for x in (year, month, day, h, mi, s, ms)]
    if any(p != p or math.isinf(p) for p in parts):
        return math.nan
    y, mo, d, h, mi, s, ms = (int(p) for p in parts)
    if 0 <= y <= 99:
        y += 1900
    y += mo // 12
    mo = mo % 12  # Python %: always 0-11, matching JS MakeDay
    days = _days_from_civil(y, mo + 1, 1) + (d - 1)
    total = (days * _DAY_MS + h * 3_600_000.0 + mi * 60_000.0
             + s * 1_000.0 + float(ms))
    return total if abs(total) <= _MAX_MS else math.nan


def _days_in_month(y: int, m: int) -> int:
    if m == 2:
        leap = y % 4 == 0 and (y % 100 != 0 or y % 400 == 0)
        return 29 if leap else 28
    return 31 if m in (1, 3, 5, 7, 8, 10, 12) else 30


_ISO_RE = re.compile(
    r"^([+-]\d{6}|\d{4})(?:-(\d{2})(?:-(\d{2}))?)?"
    r"(?:[T ](\d{2}):(\d{2})(?::(\d{2})(?:\.(\d{1,9}))?)?"
    r"(Z|[+-]\d{2}:?\d{2})?)?$"
)


def parse_date(s: str) -> float:
    """``Date.parse`` for the ISO-8601 subset (the only format the
    spec requires).  Date-only forms are UTC; a date-time without an
    offset is local time — equal to UTC in this engine.  Anything
    else is Invalid Date (NaN), loudly deterministic."""
    m = _ISO_RE.match(s.strip())
    if m is None:
        return math.nan
    y = int(m.group(1))
    mo = int(m.group(2) or 1)
    d = int(m.group(3) or 1)
    if not (1 <= mo <= 12 and 1 <= d <= _days_in_month(y, mo)):
        # real engines REJECT impossible ISO dates ("2019-02-29" is
        # Invalid Date, it does not roll like the component ctor)
        return math.nan
    h = int(m.group(4) or 0)
    mi = int(m.group(5) or 0)
    sec = int(m.group(6) or 0)
    frac = (m.group(7) or "").ljust(3, "0")[:3]
    ms = int(frac or 0)
    if h > 24 or mi > 59 or sec > 59 or (h == 24 and (mi or sec or ms)):
        return math.nan
    total = (_days_from_civil(y, mo, d) * _DAY_MS + h * 3_600_000.0
             + mi * 60_000.0 + sec * 1_000.0 + float(ms))
    off = m.group(8)
    if off and off != "Z":
        sign = 1 if off[0] == "+" else -1
        oh, om = int(off[1:3]), int(off[-2:])
        total -= sign * (oh * 3_600_000.0 + om * 60_000.0)
    return total if abs(total) <= _MAX_MS else math.nan


class JSDate:
    """Immutable epoch-ms Date (NaN = Invalid Date).  See module
    docstring for the determinism contract."""

    __slots__ = ("ms",)

    def __init__(self, ms: float) -> None:
        ms = float(ms)
        if ms == ms and abs(ms) <= _MAX_MS:
            # spec: the time value is an integral number of ms
            self.ms = float(math.trunc(ms))
        else:
            self.ms = math.nan

    # -- component extraction (UTC == local in this engine) ----------
    def _civil(self) -> tuple[int, int, int]:
        return _civil_from_days(int(self.ms // _DAY_MS))

    def _valid(self) -> bool:
        return self.ms == self.ms

    def get(self, what: str) -> float:
        if not self._valid():
            return math.nan
        if what == "time":
            return self.ms
        if what == "tzoffset":
            return 0.0
        day_ms = self.ms - math.floor(self.ms / _DAY_MS) * _DAY_MS
        if what == "hours":
            return float(int(day_ms // 3_600_000))
        if what == "minutes":
            return float(int(day_ms // 60_000) % 60)
        if what == "seconds":
            return float(int(day_ms // 1_000) % 60)
        if what == "milliseconds":
            return float(int(day_ms) % 1000)
        y, m, d = self._civil()
        if what == "year":
            return float(y)
        if what == "month":
            return float(m - 1)  # JS month index
        if what == "date":
            return float(d)
        if what == "day":  # 1970-01-01 was a Thursday (4)
            return float((int(self.ms // _DAY_MS) + 4) % 7)
        raise ValueError(what)

    def to_iso(self) -> str:
        """toISOString (raises ValueError on Invalid Date — mapped to
        a JS RangeError throw by the caller)."""
        if not self._valid():
            raise ValueError("Invalid Date")
        y, m, d = self._civil()
        day_ms = int(self.ms - math.floor(self.ms / _DAY_MS) * _DAY_MS)
        ys = (f"{y:04d}" if 0 <= y <= 9999
              else f"{'+' if y > 0 else '-'}{abs(y):06d}")
        return (f"{ys}-{m:02d}-{d:02d}T{day_ms // 3600000:02d}:"
                f"{day_ms // 60000 % 60:02d}:{day_ms // 1000 % 60:02d}."
                f"{day_ms % 1000:03d}Z")

    def to_json_value(self) -> str | None:
        """Date.prototype.toJSON: ISO string, or null when invalid —
        also the emit-boundary key/value conversion (pouchdb-collate
        normalizeKey: Date → date.toJSON())."""
        return self.to_iso() if self._valid() else None

    def js_number_value(self) -> float:
        """ToNumber(date) = the time value."""
        return self.ms

    def __str__(self) -> str:  # ToString — deterministic ISO form
        return self.to_iso() if self._valid() else "Invalid Date"

    def __repr__(self) -> str:
        return f"JSDate({self.ms!r})"


def construct_date(args: list[Any], tonum, tostr) -> JSDate:
    """``new Date(...)`` with 1+ evaluated JS arguments (zero-arg is
    rejected by the caller for determinism).  ``tonum``/``tostr`` are
    the interpreter's ToNumber/ToString."""
    if len(args) == 1:
        a = args[0]
        if isinstance(a, JSDate):
            return JSDate(a.ms)
        if isinstance(a, str):
            return JSDate(parse_date(a))
        if isinstance(a, bool) or isinstance(a, (int, float)):
            return JSDate(float(tonum(a)))
        if a is None or isinstance(a, (list, dict)):
            # JS ToPrimitive: arrays stringify, null is +0 via
            # ToNumber, objects are NaN
            if a is None:
                return JSDate(0.0)
            if isinstance(a, list):
                return JSDate(parse_date(tostr(a)))
            return JSDate(math.nan)
        return JSDate(float(tonum(a)))
    vals = [float(tonum(a)) for a in args[:7]]
    return JSDate(make_day_ms(*vals))
