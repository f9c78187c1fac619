"""Date math — the reference's ``now-7d/d`` expressions.

Mirrors ``server/src/main/java/org/opensearch/common/time/
JavaDateMathParser.java`` (parse): an anchor (``now`` or an absolute date
followed by ``||``) plus a chain of ``+N<unit>`` / ``-N<unit>`` adjustments
and ``/unit`` roundings, evaluated LEFT TO RIGHT. Units: y M w d h H m s.

Rounding semantics (parseMath): ``/unit`` truncates to the start of the
unit; when the expression is used as an EXCLUSIVE upper bound the reference
rounds UP instead — expose that via ``round_up=True`` (gt/lte bound
handling in RangeQueryBuilder).

Months/years are calendar-aware (not fixed-size), matching java.time.
"""
from __future__ import annotations

import datetime as _dt
import re
from typing import Optional

import numpy as np

_MATH = re.compile(r"([+\-/])(\d*)([yMwdhHms])")

_FIXED_SECONDS = {"w": 7 * 86400, "d": 86400, "h": 3600, "H": 3600,
                  "m": 60, "s": 1}


def _parse_anchor(expr: str, now: _dt.datetime) -> tuple:
    if expr.startswith("now"):
        return now, expr[3:]
    anchor, sep, math = expr.partition("||")
    if not sep and _MATH.search(expr):
        raise ValueError(
            f"date-math without 'now' needs a '||' separator: {expr!r}")
    # absolute date: ISO date or datetime
    a = anchor.strip()
    for fmt in ("%Y-%m-%dT%H:%M:%S.%f", "%Y-%m-%dT%H:%M:%S",
                "%Y-%m-%d %H:%M:%S", "%Y-%m-%d", "%Y-%m", "%Y"):
        try:
            return _dt.datetime.strptime(a, fmt), math
        except ValueError:
            continue
    raise ValueError(f"unparseable date anchor: {anchor!r}")


def _add_months(dt: _dt.datetime, n: int) -> _dt.datetime:
    month0 = dt.year * 12 + (dt.month - 1) + n
    y, m = divmod(month0, 12)
    # clamp day into the target month (java.time plusMonths semantics)
    for day in (dt.day, 30, 29, 28):
        try:
            return dt.replace(year=y, month=m + 1, day=day)
        except ValueError:
            continue
    raise AssertionError


def _round_down(dt: _dt.datetime, unit: str) -> _dt.datetime:
    if unit == "y":
        return dt.replace(month=1, day=1, hour=0, minute=0, second=0,
                          microsecond=0)
    if unit == "M":
        return dt.replace(day=1, hour=0, minute=0, second=0, microsecond=0)
    if unit == "w":  # ISO week starts Monday (DateFormatters WEEK_FIELDS)
        d0 = dt - _dt.timedelta(days=dt.weekday())
        return d0.replace(hour=0, minute=0, second=0, microsecond=0)
    if unit == "d":
        return dt.replace(hour=0, minute=0, second=0, microsecond=0)
    if unit in ("h", "H"):
        return dt.replace(minute=0, second=0, microsecond=0)
    if unit == "m":
        return dt.replace(second=0, microsecond=0)
    if unit == "s":
        return dt.replace(microsecond=0)
    raise ValueError(f"unknown rounding unit: {unit}")


def _step_up(dt: _dt.datetime, unit: str) -> _dt.datetime:
    if unit == "y":
        return dt.replace(year=dt.year + 1)
    if unit == "M":
        return _add_months(dt, 1)
    return dt + _dt.timedelta(seconds=_FIXED_SECONDS[unit])


def parse_date_math(expr: str, now: Optional[_dt.datetime] = None,
                    round_up: bool = False) -> _dt.datetime:
    """Evaluate a date-math expression -> datetime. ``now`` anchors the
    relative form (REQUIRED for 'now…' expressions — the engine never reads
    the wall clock implicitly, keeping pipelines deterministic)."""
    if expr.startswith("now") and now is None:
        raise ValueError("'now'-anchored expression needs an explicit now=")
    dt, math = _parse_anchor(expr, now or _dt.datetime(1970, 1, 1))
    pos = 0
    for m in _MATH.finditer(math):
        if m.start() != pos:
            raise ValueError(f"bad date-math fragment: {math[pos:]!r}")
        pos = m.end()
        op, num, unit = m.groups()
        if op == "/":
            if num:
                raise ValueError("rounding takes no count")
            # round-up subtracts ONE unit of the engine's comparison
            # resolution (microseconds — timestamps compare at us here,
            # unlike the reference's ms), so docs in the last 999us of the
            # rounded unit stay inside lte/gt bounds
            lo = _round_down(dt, unit)
            dt = _step_up(lo, unit) - _dt.timedelta(microseconds=1) \
                if round_up else lo
            continue
        n = int(num or 1) * (1 if op == "+" else -1)
        if unit == "y":
            dt = _add_months(dt, 12 * n)
        elif unit == "M":
            dt = _add_months(dt, n)
        else:
            dt = dt + _dt.timedelta(seconds=n * _FIXED_SECONDS[unit])
    if pos != len(math):
        raise ValueError(f"bad date-math fragment: {math[pos:]!r}")
    return dt


def date_math_us(expr: str, now: Optional[_dt.datetime] = None,
                 round_up: bool = False) -> np.int64:
    """Expression -> microseconds since epoch (the engine's timestamp64[us]
    comparison key — see graft-env-pitfalls on us-vs-ns resolutions)."""
    import calendar
    dt = parse_date_math(expr, now=now, round_up=round_up)
    # integer arithmetic: float seconds can't represent .999999 exactly, so
    # timestamp()*1e6 truncates the round-up bounds 1us low
    return np.int64(calendar.timegm(dt.timetuple()) * 1_000_000
                    + dt.microsecond)
