"""Date-math parser semantics (sv/common/time/JavaDateMathParser.java)."""

from datetime import datetime

import pytest

from sparksearch.datemath import is_date_math, parse_date_math, \
    resolve_range_value

NOW = datetime(2025, 6, 15, 13, 45, 30)


@pytest.mark.parametrize("expr,expect", [
    ("now", NOW),
    ("now-1d", datetime(2025, 6, 14, 13, 45, 30)),
    ("now+2h", datetime(2025, 6, 15, 15, 45, 30)),
    ("now-90m", datetime(2025, 6, 15, 12, 15, 30)),
    ("now/d", datetime(2025, 6, 15)),
    ("now-1d/d", datetime(2025, 6, 14)),
    ("now/w", datetime(2025, 6, 9)),            # Monday of that ISO week
    ("now-1M", datetime(2025, 5, 15, 13, 45, 30)),
    ("now+1y", datetime(2026, 6, 15, 13, 45, 30)),
    ("now/M", datetime(2025, 6, 1)),
    ("now-3m/m", datetime(2025, 6, 15, 13, 42, 0)),
    ("2025-01-05||+2h", datetime(2025, 1, 5, 2, 0, 0)),
    ("2025-01-31||+1M", datetime(2025, 2, 28)),  # month-length clamp
    ("2025-01-05 10:00:00||-1d/d", datetime(2025, 1, 4)),
])
def test_round_down(expr, expect):
    assert parse_date_math(expr, NOW) == expect


def test_round_up_is_end_of_unit():
    # lte: now/d must include the whole current day
    up = parse_date_math("now/d", NOW, round_up=True)
    assert up == datetime(2025, 6, 15, 23, 59, 59, 999999)
    up = parse_date_math("now-1d/m", NOW, round_up=True)
    assert up == datetime(2025, 6, 14, 13, 45, 59, 999999)


def test_resolve_range_directions():
    # gte/lt round down, gt/lte round up (RangeQueryBuilder.java:444)
    assert resolve_range_value("now/d", "gte", NOW) == datetime(2025, 6, 15)
    assert resolve_range_value("now/d", "lt", NOW) == datetime(2025, 6, 15)
    assert resolve_range_value("now/d", "lte", NOW) \
        == datetime(2025, 6, 15, 23, 59, 59, 999999)
    assert resolve_range_value("now/d", "gt", NOW) \
        == datetime(2025, 6, 15, 23, 59, 59, 999999)


def test_non_date_math_passthrough():
    assert not is_date_math("2025-01-01 00:00:00")
    assert resolve_range_value(42, "gte", NOW) == 42
    assert resolve_range_value("2025-01-01", "gte", NOW) == "2025-01-01"


def test_bad_expressions_raise():
    with pytest.raises(ValueError):
        parse_date_math("now-1q", NOW)
    with pytest.raises(ValueError):
        parse_date_math("now//d", NOW)
    with pytest.raises(ValueError):
        parse_date_math("notadate||+1d", NOW)
