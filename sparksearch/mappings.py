"""Index mappings layer — OpenSearch field mappings as derived doc-value
columns on the docs scan.

Implements the mapper-core semantics a flat pages corpus can express,
each as a pure Catalyst expression inlined into the SAME docs scan as
every stored column (zero extra jobs, zero Python):

- **multi-fields** (``fields``): a ``keyword`` sub-field of a text field
  with ``ignore_above`` — the sub-field doc value is NULL past the char
  limit (reference ``sv/index/mapper/KeywordFieldMapper.java`` ignoreAbove:
  the value is simply not indexed, so doc-value reads miss it); a
  ``token_count`` sub-field maps to the stored index-time ``dl`` statistic
  (mapper-extras TokenCountFieldMapper, cf. index.with_token_count).
- **keyword ``normalizer``**: lowercase / trim normalizer chain applied to
  the keyword doc value (KeywordFieldMapper.Builder#normalizer — a
  normalizer is an analyzer that must emit exactly one token, hence pure
  string functions here).
- **``null_value``**: NULL input replaced by the configured literal at
  index time (KeywordFieldMapper.Builder#nullValue).
- **``copy_to``**: source-field values appended to a target field's value
  array (``sv/index/mapper/FieldMapper.java`` CopyTo) — queries on the
  target see every copied value; the ``_source`` is NOT modified.
- **``scaled_float``** (mapper-extras ScaledFloatFieldMapper): the doc
  value is ``round(value * scaling_factor)`` stored as a long; queries and
  aggs see the decoded ``stored / scaling_factor`` double, so precision is
  exactly the scaled-long lattice.
- **dynamic mapping inference** (DocumentParser/DynamicFieldsBuilder
  defaults): unseen string → ``text`` + ``.keyword`` sub-field with
  ignore_above 256; timestamp → ``date``; long → ``long``; double →
  ``float``; binary → ``binary``.

Sub-field columns keep the OpenSearch dotted path (``text.keyword``) —
select them with backticks: ``F.col("`text.keyword`")``.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F
from pyspark.sql import types as T

__all__ = ["apply_mappings", "infer_mappings", "scaled_float_stored"]


def _normalize(col: Column, normalizer: str | None) -> Column:
    """Keyword normalizer chain. Supported: 'lowercase' (the stock
    normalizer every cluster defines) and 'trim_lowercase'."""
    if normalizer is None:
        return col
    if normalizer == "lowercase":
        return F.lower(col)
    if normalizer == "trim_lowercase":
        return F.trim(F.lower(col))
    raise ValueError(f"unknown normalizer: {normalizer}")


def _keyword_value(src: Column, spec: dict) -> Column:
    """Keyword doc value: null_value fill, then ignore_above cutoff, then
    normalizer. Order matches the reference mapper: nullValue applies to
    NULL input before indexing; ignoreAbove drops long values entirely."""
    null_value = spec.get("null_value")
    if null_value is not None:
        src = F.coalesce(src, F.lit(null_value))
    ignore_above = spec.get("ignore_above")
    if ignore_above is not None:
        src = F.when(F.length(src) <= int(ignore_above), src)
    return _normalize(src, spec.get("normalizer"))


def scaled_float_stored(src: Column, scaling_factor: float) -> Column:
    """ScaledFloatFieldMapper encode: Math.round(value * scalingFactor)
    stored as a long (HALF_UP for positives, matching Java Math.round
    on the non-negative values this corpus produces)."""
    return F.round(src * F.lit(float(scaling_factor)), 0).cast("long")


def apply_mappings(df: DataFrame, mappings: dict) -> DataFrame:
    """Apply a ``{"properties": {...}}`` mappings dict to a docs frame,
    adding one derived column per mapped feature. Unmapped columns pass
    through untouched; mapped TEXT fields keep their original column (the
    inverted index over ``text`` is built elsewhere — this layer only
    materializes doc values)."""
    props = mappings.get("properties", mappings)
    for name, spec in props.items():
        ftype = spec.get("type", "text")
        src = F.col(name) if name in df.columns else F.lit(None).cast("string")
        if ftype == "scaled_float":
            factor = float(spec["scaling_factor"])
            stored = scaled_float_stored(src.cast("double"), factor)
            df = (df.withColumn(name + ".stored", stored)
                    .withColumn(name + ".value",
                                stored.cast("double") / F.lit(factor)))
        # multi-fields (computed BEFORE any in-place keyword rewrite —
        # sub-fields and copy_to see the ORIGINAL source value, as the
        # reference's DocumentParser hands each sub-mapper the raw token)
        for sub, sub_spec in (spec.get("fields") or {}).items():
            sub_name = f"{name}.{sub}"
            stype = sub_spec.get("type", "keyword")
            if stype == "keyword":
                df = df.withColumn(sub_name, _keyword_value(src, sub_spec))
            elif stype == "token_count":
                if "dl" not in df.columns:
                    raise ValueError("token_count sub-field needs the "
                                     "index-time dl statistic on the frame")
                df = df.withColumn(sub_name, F.col("dl"))
            else:
                raise ValueError(f"unsupported sub-field type: {stype}")
        # copy_to: append this field's value to the target's value array
        for target in ([spec["copy_to"]] if isinstance(spec.get("copy_to"), str)
                       else spec.get("copy_to") or []):
            existing = (F.col(target) if target in df.columns
                        else F.array().cast("array<string>"))
            df = df.withColumn(
                target,
                F.when(src.isNotNull(),
                       F.array_append(existing, src.cast("string")))
                 .otherwise(existing))
        if ftype == "keyword":
            # a keyword-mapped field IS its doc value: replace in place
            # (last, so sub-fields/copy_to above saw the raw value)
            df = df.withColumn(name, _keyword_value(src, spec))
    return df


_DYNAMIC_TYPES = {
    T.StringType(): "text",
    T.TimestampType(): "date",
    T.LongType(): "long",
    T.IntegerType(): "long",
    T.DoubleType(): "float",
    T.FloatType(): "float",
    T.BooleanType(): "boolean",
    T.BinaryType(): "binary",
}


def infer_mappings(df: DataFrame) -> dict:
    """Dynamic mapping inference over a frame's schema — the defaults
    DocumentParser applies to unseen fields (dynamic: true): every string
    becomes ``text`` with a ``.keyword`` sub-field (ignore_above 256),
    Spark's native types map 1:1 onto the OpenSearch numeric/date/binary
    types. Returns an OpenSearch-style ``{"properties": ...}`` dict."""
    props: dict = {}
    for f in df.schema.fields:
        os_type = _DYNAMIC_TYPES.get(f.dataType)
        if os_type is None:
            continue  # arrays/structs: nested mapping, out of scope (flat corpus)
        entry: dict = {"type": os_type}
        if os_type == "text":
            entry["fields"] = {"keyword": {"type": "keyword",
                                           "ignore_above": 256}}
        props[f.name] = entry
    return {"properties": props}
