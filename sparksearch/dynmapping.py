"""Dynamic mapping inference — the reference's DocumentParser type
inference for unmapped fields, as a distributed batch operator.

Reference semantics (sv/index/mapper/DocumentParser.java
``createBuilderFromDynamicValue``, lines 695-810, and
RootObjectMapper.java Defaults, lines 73-91):

- JSON number: int/long/big-integer -> ``long``; float/double/
  big-decimal -> ``float`` ("float by default instead of double since
  this is much more space-efficient").
- JSON boolean -> ``boolean``.
- JSON string: with ``numeric_detection`` (default FALSE) a
  long/double-parseable string maps to long/float; otherwise, with
  ``date_detection`` (default TRUE), a string that is NOT parseable as
  a number is tried against the dynamic date formats
  (``strict_date_optional_time`` then ``yyyy/MM/dd HH:mm:ss`` /
  ``yyyy/MM/dd``; the ladder's epoch_millis entry is unreachable for
  dynamic detection because pure numbers are refused — "too likely to
  be false positives") -> ``date``; anything else -> ``text`` with a
  ``.keyword`` sub-field (ignore_above 256).
- JSON object -> ``object`` (recurse); array -> the element rule per
  element with the same path (first element's type wins); null ->
  no mapping.

Batch semantics: the reference fixes a field's type at its FIRST
occurrence (later conflicting docs are rejected at index time).  The
batch analogue resolves each path to the type contributed by the
lowest-``id`` document containing it, and reports ``n_types`` (distinct
types seen) so conflicts are visible instead of silently dropped.

Scale shape: one ``mapInPandas`` pass emits (path, dtype, id) rows —
O(docs x fields), map-only — then ONE groupBy(path) with min/min_by
partial aggregation; output is O(distinct paths), never O(docs).  No
driver-side iteration, no collect.
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["infer_dynamic_mapping", "dynamic_type_of_string"]

#: Java Long.parseLong: optional sign, digits only (range check applied)
_LONG_RE = re.compile(r"^[+-]?\d+$")
#: Java Double.parseDouble: decimal/scientific forms (hex floats and
#: NaN/Infinity accepted there are intentionally excluded — a corpus
#: string like "Infinity" mapping to float would be a false positive the
#: reference tolerates only because numeric_detection defaults off)
_DOUBLE_RE = re.compile(r"^[+-]?(\d+\.?\d*|\.\d+)([eE][+-]?\d+)?[fFdD]?$")

#: strict_date_optional_time: ISO-8601 date with optional time; a bare
#: yyyy is long-parseable so it never reaches date detection
_ISO_RE = re.compile(
    r"^\d{4}-\d{2}(-\d{2}([Tt ]\d{2}:\d{2}(:\d{2}(\.\d{1,9})?)?"
    r"([Zz]|[+-]\d{2}:?\d{2})?)?)?$")
_SLASH_RE = re.compile(
    r"^\d{4}/\d{2}/\d{2}( \d{2}:\d{2}:\d{2})?$")


def dynamic_type_of_string(text: str, numeric_detection: bool = False,
                           date_detection: bool = True) -> str:
    """Type a JSON string value per createBuilderFromDynamicValue."""
    as_long = bool(_LONG_RE.match(text)) and -2**63 <= int(text) < 2**63
    as_double = bool(_DOUBLE_RE.match(text))
    if as_long and numeric_detection:
        return "long"
    if as_double and numeric_detection:
        return "float"
    if not as_long and not as_double and date_detection:
        if _ISO_RE.match(text) or _SLASH_RE.match(text):
            return "date"
    return "text"


def _walk(obj, path: str, out: dict, numeric_detection: bool,
          date_detection: bool) -> None:
    """Emit first-wins (path -> dtype) into `out`, reference walk order."""

    def put(p: str, t: str) -> None:
        if p not in out:
            out[p] = t

    if obj is None:
        return
    if isinstance(obj, dict):
        if path:
            put(path, "object")
        for k, v in obj.items():
            _walk(v, f"{path}.{k}" if path else k, out,
                  numeric_detection, date_detection)
    elif isinstance(obj, list):
        for v in obj:
            _walk(v, path, out, numeric_detection, date_detection)
    elif isinstance(obj, bool):               # before int: bool is int
        put(path, "boolean")
    elif isinstance(obj, int):
        put(path, "long")
    elif isinstance(obj, float):
        put(path, "float")
    elif isinstance(obj, str):
        t = dynamic_type_of_string(obj, numeric_detection, date_detection)
        put(path, t)
        if t == "text":
            put(path + ".keyword", "keyword")
    else:
        raise TypeError(f"unhandled JSON value type at {path!r}: "
                        f"{type(obj).__name__}")


def infer_dynamic_mapping(df: DataFrame, id_col: str, json_col: str,
                          numeric_detection: bool = False,
                          date_detection: bool = True) -> DataFrame:
    """Infer the dynamic mapping a stream of JSON docs would create.

    Returns (path, dtype, first_id, n_types): dtype is the type fixed by
    the lowest-`id_col` doc containing the path (the reference's
    first-occurrence rule); n_types > 1 flags paths later docs would
    have been REJECTED for (DocumentParser throws on type conflicts).
    """
    import json as _json

    import pandas as pd

    nd, dd = bool(numeric_detection), bool(date_detection)

    def emit(batches):
        for pdf in batches:
            paths, dtypes, ids = [], [], []
            for i, js in zip(pdf[id_col], pdf[json_col]):
                if js is None:
                    continue
                seen: dict = {}
                _walk(_json.loads(js), "", seen, nd, dd)
                for p, t in seen.items():
                    paths.append(p)
                    dtypes.append(t)
                    ids.append(i)
            yield pd.DataFrame(
                {"path": paths, "dtype": dtypes, "id": ids})

    rows = df.select(id_col, json_col).mapInPandas(
        emit, schema="path string, dtype string, id long")
    return (rows.groupBy("path")
            .agg(F.min_by("dtype", "id").alias("dtype"),
                 F.min("id").alias("first_id"),
                 F.countDistinct("dtype").alias("n_types"))
            .select("path", "dtype",
                    F.col("first_id").cast("long"),
                    F.col("n_types").cast("int").alias("n_types"))
            .orderBy("path"))
