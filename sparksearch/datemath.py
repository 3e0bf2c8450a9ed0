"""Date-math expression resolution for range queries.

Implements the reference's date-math grammar
(sv/common/time/JavaDateMathParser.java, wired into range at
sv/index/query/RangeQueryBuilder.java:444):

    expr     := anchor [op]*
    anchor   := "now" | "<ISO date>||"
    op       := ("+"|"-") N unit        arithmetic
              | "/" unit                rounding
    unit     := y M w d h H m s

Rounding direction follows the reference's range semantics: the LOWER
bound of a range (gte / lt against an upper? — concretely: gte and lt)
rounds DOWN to the unit start; gt and lte round UP to the last
millisecond of the unit (so `lte: now/d` includes the whole current day
and `gt: now/d` excludes it).

`now` is injectable for determinism (the reference freezes `now` per
request context); Executor.fixed_now feeds it.
"""

from __future__ import annotations

import re
from datetime import datetime, timedelta

__all__ = ["parse_date_math", "is_date_math", "resolve_range_value"]

_OP_RE = re.compile(r"([+\-/])(\d*)([yMwdhHms])")

_UNIT_SECONDS = {"s": 1, "m": 60, "h": 3600, "H": 3600,
                 "d": 86400, "w": 604800}


def is_date_math(v: object) -> bool:
    return isinstance(v, str) and (v.startswith("now") or "||" in v)


def _round_down(dt: datetime, unit: str) -> datetime:
    if unit == "s":
        return dt.replace(microsecond=0)
    if unit in ("m",):
        return dt.replace(second=0, microsecond=0)
    if unit in ("h", "H"):
        return dt.replace(minute=0, second=0, microsecond=0)
    if unit == "d":
        return dt.replace(hour=0, minute=0, second=0, microsecond=0)
    if unit == "w":
        start = dt - timedelta(days=dt.weekday())  # ISO week starts Monday
        return start.replace(hour=0, minute=0, second=0, microsecond=0)
    if unit == "M":
        return dt.replace(day=1, hour=0, minute=0, second=0, microsecond=0)
    if unit == "y":
        return dt.replace(month=1, day=1, hour=0, minute=0, second=0,
                          microsecond=0)
    raise ValueError(f"unknown unit: {unit}")


def _add(dt: datetime, n: int, unit: str) -> datetime:
    if unit in _UNIT_SECONDS:
        return dt + timedelta(seconds=n * _UNIT_SECONDS[unit])
    if unit == "M":
        month0 = dt.month - 1 + n
        year = dt.year + month0 // 12
        month = month0 % 12 + 1
        from calendar import monthrange
        day = min(dt.day, monthrange(year, month)[1])
        return dt.replace(year=year, month=month, day=day)
    if unit == "y":
        try:
            return dt.replace(year=dt.year + n)
        except ValueError:  # Feb 29
            return dt.replace(year=dt.year + n, day=28)
    raise ValueError(f"unknown unit: {unit}")


def _next_unit(dt: datetime, unit: str) -> datetime:
    return _add(_round_down(dt, unit), 1, unit)


def parse_date_math(expr: str, now: datetime,
                    round_up: bool = False) -> datetime:
    """Resolve a date-math expression against a fixed `now`.

    round_up=True makes each `/unit` round to the last microsecond of the
    unit instead of its start (the gt/lte direction)."""
    s = expr.strip()
    if s.startswith("now"):
        dt, rest = now, s[3:]
    else:
        anchor, sep, rest = s.partition("||")
        if not sep:
            anchor, rest = s, ""
        a = anchor.strip()
        try:
            dt = datetime.fromisoformat(a)
        except ValueError:
            raise ValueError(f"bad date-math anchor: {anchor!r}")
    pos = 0
    for m in _OP_RE.finditer(rest):
        if m.start() != pos:
            raise ValueError(f"bad date-math ops: {rest!r}")
        pos = m.end()
        op, n, unit = m.group(1), m.group(2), m.group(3)
        if op == "/":
            if n:
                raise ValueError(f"rounding takes no count: {rest!r}")
            dt = (_next_unit(dt, unit) - timedelta(microseconds=1)
                  if round_up else _round_down(dt, unit))
        else:
            count = int(n) if n else 1
            dt = _add(dt, count if op == "+" else -count, unit)
    if pos != len(rest.strip()):
        raise ValueError(f"trailing date-math input: {rest!r}")
    return dt


def resolve_range_value(v: object, bound: str,
                        now: datetime | None) -> object:
    """Resolve a range bound if it is date math; pass through otherwise.

    bound ∈ {gte, gt, lte, lt}; gt/lte round up inside `/unit`, gte/lt
    round down (RangeQueryBuilder.java:444 + DateMathParser roundUp)."""
    if not is_date_math(v):
        return v
    if now is None:
        now = datetime.utcnow().replace(microsecond=0)
    return parse_date_math(v, now, round_up=bound in ("gt", "lte"))
