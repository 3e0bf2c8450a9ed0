"""MultiValueMode: sorting by a multi-valued field with a mode.

The reference reduces a doc's multiple field values to ONE comparable
sort key per `sort_mode` — min/max/sum/avg/median
(sv/search/MultiValueMode.java; FieldSortBuilder `mode` option,
sv/search/sort/FieldSortBuilder.java). Doc values iterate sorted, so
MEDIAN picks the middle value (even count: average of the two middles —
MultiValueMode.java:234-258).

Spark shape: the multi-valued field is an array column and every mode is
a JVM higher-order/array function evaluated inside the same scan that
fetches the doc — no explode, no shuffle, no Python. The key plugs into
the `_search` body sort through the same placeholder-column mechanism as
script sorts.
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import Column, functions as F

__all__ = ["multivalue_key", "ModeKey", "mode_sort_key"]

_MODES = ("min", "max", "sum", "avg", "median")


def multivalue_key(field_name: str, mode: str,
                   integral: bool = False) -> Column:
    """One sort key per doc from an array column, per MultiValueMode.

    `integral=True` mirrors the reference's separate long pick path:
    MEDIAN over integer doc values rounds the even-count mid-pair average
    to a long via Math.round == floor(x + 0.5)
    (MultiValueMode.java:241-246), while the double path keeps the
    unrounded average."""
    c = F.col(field_name)
    if mode == "min":
        return F.array_min(c)
    if mode == "max":
        return F.array_max(c)
    n = F.size(c)
    if mode in ("sum", "avg"):
        tot = F.aggregate(c, F.lit(0.0),
                          lambda a, x: a + x.cast("double"))
        return tot if mode == "sum" else F.when(n > 0, tot / n)
    if mode == "median":
        s = F.sort_array(c)
        i = ((n - 1) / F.lit(2)).cast("int") + F.lit(1)  # 1-based low mid
        lo = F.element_at(s, i).cast("double")
        hi = F.try_element_at(s, i + F.lit(1)).cast("double")
        mid = (lo + hi) / 2
        if integral:
            mid = F.floor(mid + F.lit(0.5)).cast("double")  # Math.round
        return (F.when(n == 0, F.lit(None).cast("double"))
                 .when(n % 2 == 1, lo)
                 .otherwise(mid))
    raise ValueError(f"sort mode must be one of {_MODES}, got {mode!r}")


@dataclass
class ModeKey:
    """Adapter matching the CompiledScript surface the body-sort
    placeholder machinery expects (.col + .doc_fields)."""
    col: Column
    doc_fields: set = field(default_factory=set)


def mode_sort_key(field_name: str, mode: str,
                  integral: bool = False) -> ModeKey:
    return ModeKey(multivalue_key(field_name, mode, integral=integral),
                   {field_name})
