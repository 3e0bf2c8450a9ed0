"""Declarative ingest pipelines: ``PUT _ingest/pipeline`` JSON compiled
to Catalyst column transforms.

Reference: modules/ingest-common/src/main/java/org/opensearch/ingest/
common/*Processor.java (the full 1.x processor registry: append, bytes,
convert, csv, date, date_index_name, dissect, dot_expander, fail,
foreach, grok, gsub, html_strip, join, json, kv, lowercase, remove,
rename, script, set, sort, split, trim, uppercase, urldecode), plus
IngestService pipeline storage and the ``_ingest/pipeline/_simulate``
API. Grok built-ins follow the published logstash/Oniguruma base
pattern set.

Spark-first shape: a pipeline definition compiles ONCE (driver-side) to
a chain of pure-Catalyst ``withColumn`` transforms — whole-stage-codegen
JVM execution, no per-row Python. The only Python kernel is
``html_strip``, which reuses the frozen Arrow-batched extractor the
build path uses (byte-identical with the gate). Per-processor ``if``
conditions compile through the Painless subset compiler to a boolean
Column and gate the transform per row (value processors only —
structural processors like remove/rename change the schema, which is
per-batch, not per-row; those raise on ``if``).

Deviations (documented, raise loudly where they matter):
- ``on_failure`` handler chains are not supported; per-processor
  ``ignore_failure: true`` yields null on conversion failure instead.
- ``json`` parses to map<string,string> unless an explicit ``schema``
  engine extension is given.
"""
from __future__ import annotations

import json as _jsonlib
import os
import re

import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = ["compile_pipeline", "run_pipeline", "put_pipeline",
           "delete_pipeline", "get_pipeline", "simulate_pipeline",
           "GROK_PATTERNS"]


class IngestError(ValueError):
    pass


def _c(field: str) -> Column:
    return F.col(f"`{field}`") if "." in field else F.col(field)


def _has(df: DataFrame, field: str) -> bool:
    return field in df.columns


def _missing(spec: dict, df: DataFrame, field: str, ptype: str) -> bool:
    """Shared ignore_missing handling: True → skip this processor."""
    if _has(df, field):
        return False
    if spec.get("ignore_missing"):
        return True
    raise IngestError(
        f"{ptype} processor: field [{field}] not present in document "
        f"(columns: {df.columns}); set ignore_missing to skip")


def _cond(spec: dict) -> Column | None:
    """Per-processor ``if`` — a Painless-subset boolean over ctx fields,
    compiled to a Column (ConditionalProcessor)."""
    src = spec.get("if")
    if not src:
        return None
    from sparksearch.painless import compile_script
    rewritten = re.sub(r"\bctx\.([A-Za-z_][A-Za-z0-9_]*)",
                       r"doc['\1'].value", src)
    return compile_script(rewritten).column()


def _guarded(df: DataFrame, field: str, new: Column,
             cond: Column | None) -> DataFrame:
    """Set ``field`` to ``new``, keeping the old value (or null) on rows
    where the processor's ``if`` is false."""
    if cond is None:
        return df.withColumn(field, new)
    old = _c(field) if _has(df, field) else F.lit(None)
    return df.withColumn(field, F.when(cond, new).otherwise(old))


def _no_if(spec: dict, ptype: str) -> None:
    if spec.get("if"):
        raise IngestError(
            f"{ptype} processor: per-row 'if' is not supported on "
            f"schema-changing processors")


# ---------------------------------------------------------------------------
# scalar kernels shared by the top-level processor and foreach
# ---------------------------------------------------------------------------

_BYTE_UNITS = ["b", "kb", "mb", "gb", "tb", "pb"]


def _bytes_expr(src: Column, ignore_failure: bool) -> Column:
    """ByteSizeValue parse: "<number><unit>" → long bytes
    (BytesProcessor)."""
    s = F.lower(F.trim(src))
    num = F.regexp_extract(s, r"^([0-9]*\.?[0-9]+)\s*(b|kb|mb|gb|tb|pb)$",
                           1).try_cast("double")
    unit = F.regexp_extract(s, r"^([0-9]*\.?[0-9]+)\s*(b|kb|mb|gb|tb|pb)$",
                            2)
    mult = F.element_at(
        F.map_from_arrays(
            F.array(*[F.lit(u) for u in _BYTE_UNITS]),
            F.array(*[F.lit(float(1024 ** i))
                      for i in range(len(_BYTE_UNITS))])), unit)
    out = F.floor(num * mult).cast("long")
    if ignore_failure:
        return out
    return F.when(src.isNotNull() & out.isNull(), F.raise_error(
        F.concat(F.lit("bytes processor: failed to parse ["), src,
                 F.lit("]")))).otherwise(out)


_CONVERT_TYPES = {"integer": "int", "long": "long", "float": "float",
                  "double": "double", "string": "string"}


def _convert_expr(src: Column, typ: str, ignore_failure: bool) -> Column:
    """ConvertProcessor: strict parse — a non-null source that fails to
    convert is an error unless ignore_failure."""
    if typ == "boolean":
        low = F.lower(F.trim(src.cast("string")))
        out = F.when(low == "true", F.lit(True)) \
               .when(low == "false", F.lit(False))
    elif typ == "auto":
        raise IngestError("convert processor: type 'auto' is not "
                          "supported; name the target type")
    elif typ in _CONVERT_TYPES:
        out = src.cast("string").try_cast(_CONVERT_TYPES[typ])
    else:
        raise IngestError(f"convert processor: unknown type {typ!r}")
    if ignore_failure:
        return out
    return F.when(src.isNotNull() & out.isNull(), F.raise_error(
        F.concat(F.lit(f"convert processor: cannot convert ["),
                 src.cast("string"), F.lit(f"] to {typ}")))).otherwise(out)


def _elem_fn(ptype: str, spec: dict):
    """Element-level kernel for foreach over an array field — the subset
    of processors that are pure value functions (ForEachProcessor)."""
    ig = bool(spec.get("ignore_failure"))
    if ptype == "lowercase":
        return lambda x: F.lower(x)
    if ptype == "uppercase":
        return lambda x: F.upper(x)
    if ptype == "trim":
        return lambda x: F.trim(x)
    if ptype == "gsub":
        return lambda x: F.regexp_replace(x, spec["pattern"],
                                          spec["replacement"])
    if ptype == "bytes":
        return lambda x: _bytes_expr(x, ig)
    if ptype == "convert":
        return lambda x: _convert_expr(x, spec["type"], ig)
    if ptype == "urldecode":
        return lambda x: F.url_decode(x)
    raise IngestError(
        f"foreach processor: inner processor {ptype!r} is not an "
        f"element-level value processor")


# ---------------------------------------------------------------------------
# grok
# ---------------------------------------------------------------------------

#: Published logstash base patterns (grok-patterns file, public domain).
GROK_PATTERNS = {
    "WORD": r"\b\w+\b",
    "NOTSPACE": r"\S+",
    "SPACE": r"\s*",
    "DATA": r".*?",
    "GREEDYDATA": r".*",
    "INT": r"(?:[+-]?(?:[0-9]+))",
    "NUMBER": r"(?:[+-]?(?:[0-9]+(?:\.[0-9]+)?))",
    "BASE10NUM": r"(?:[+-]?(?:[0-9]+(?:\.[0-9]+)?))",
    "POSINT": r"\b(?:[1-9][0-9]*)\b",
    "USERNAME": r"[a-zA-Z0-9._-]+",
    "USER": r"[a-zA-Z0-9._-]+",
    "IPV4": r"(?:(?:25[0-5]|2[0-4][0-9]|[01]?[0-9][0-9]?)\.){3}"
            r"(?:25[0-5]|2[0-4][0-9]|[01]?[0-9][0-9]?)",
    "HOSTNAME": r"\b(?:[0-9A-Za-z][0-9A-Za-z-]{0,62})"
                r"(?:\.(?:[0-9A-Za-z][0-9A-Za-z-]{0,62}))*\.?\b",
    "LOGLEVEL": r"(?:[Tt]race|TRACE|[Dd]ebug|DEBUG|[Ii]nfo|INFO|"
                r"[Ww]arn(?:ing)?|WARN(?:ING)?|[Ee]rr(?:or)?|"
                r"ERR(?:OR)?|[Ff]atal|FATAL)",
    "UUID": r"[A-Fa-f0-9]{8}-(?:[A-Fa-f0-9]{4}-){3}[A-Fa-f0-9]{12}",
    "TIMESTAMP_ISO8601": r"\d{4}-\d{2}-\d{2}[T ]\d{2}:\d{2}"
                         r"(?::\d{2}(?:\.\d+)?)?(?:Z|[+-]\d{2}:?\d{2})?",
}

_GROK_REF = re.compile(
    r"%\{(\w+)(?::([\w.\[\]@]+?))?(?::(int|long|float|double|boolean))?\}")

_GROK_CASTS = {"int": "int", "long": "long", "float": "float",
               "double": "double", "boolean": "boolean"}


def _grok_to_regex(pattern: str, extra: dict | None = None
                   ) -> tuple[str, list[tuple[str, str | None]]]:
    """Expand %{SYNTAX:name[:type]} refs to a plain regex with one
    capture group per named ref; returns (regex, [(name, cast-type)])."""
    defs = dict(GROK_PATTERNS)
    defs.update(extra or {})
    names: list[tuple[str, str | None]] = []

    def sub(m):
        syntax, name, typ = m.group(1), m.group(2), m.group(3)
        if syntax not in defs:
            raise IngestError(f"grok: unknown pattern %{{{syntax}}}")
        body = _grok_to_regex(defs[syntax], extra)[0] \
            if "%{" in defs[syntax] else defs[syntax]
        if name:
            names.append((name, typ))
            return f"({body})"
        return f"(?:{body})"

    return _GROK_REF.sub(sub, pattern), names


# ---------------------------------------------------------------------------
# dissect
# ---------------------------------------------------------------------------

_DISSECT_KEY = re.compile(r"%\{([^}]*)\}")


def _dissect_to_regex(pattern: str) -> tuple[str, list[str]]:
    """DissectProcessor: positional delimiter parse — keys become
    non-greedy captures (the final key greedy), literals match exactly.
    ``%{}`` and ``%{?name}`` skip. Append/reference modifiers are not
    supported (raise)."""
    parts = _DISSECT_KEY.split(pattern)
    # parts alternate literal, key, literal, key, ... literal
    keys = parts[1::2]
    for k in keys:
        if k.startswith(("+", "&", "*")):
            raise IngestError(
                f"dissect: modifier key %{{{k}}} is not supported")
    names: list[str] = []
    rx = []
    n_keys = len(keys)
    for i, part in enumerate(parts):
        if i % 2 == 0:
            rx.append(re.escape(part))
        else:
            last = (i // 2) == n_keys - 1
            body = r".*" if last else r".*?"
            if part == "" or part.startswith("?"):
                rx.append(f"(?:{body})")
            else:
                names.append(part)
                rx.append(f"({body})")
    # dissect is a strict positional parse: the pattern must consume the
    # WHOLE value (unlike grok's unanchored find)
    return "^" + "".join(rx) + "$", names


# ---------------------------------------------------------------------------
# processor compilers: spec -> (DataFrame -> DataFrame)
# ---------------------------------------------------------------------------

def _p_set(spec):
    def run(df):
        field = spec["field"]
        if "copy_from" in spec:
            new = _c(spec["copy_from"])
        else:
            new = F.lit(spec["value"])
        if not spec.get("override", True) and _has(df, field):
            new = F.coalesce(_c(field), new)
        return _guarded(df, field, new, _cond(spec))
    return run


def _p_remove(spec):
    def run(df):
        _no_if(spec, "remove")
        fields = spec["field"]
        fields = [fields] if isinstance(fields, str) else list(fields)
        for f_ in fields:
            if _missing(spec, df, f_, "remove"):
                continue
            df = df.drop(f_)
        return df
    return run


def _p_rename(spec):
    def run(df):
        _no_if(spec, "rename")
        field, target = spec["field"], spec["target_field"]
        if _missing(spec, df, field, "rename"):
            return df
        if _has(df, target):
            raise IngestError(
                f"rename processor: target field [{target}] already "
                f"exists")
        return df.withColumn(target, _c(field)).drop(field)
    return run


def _p_append(spec):
    def run(df):
        field = spec["field"]
        v = spec["value"]
        vals = v if isinstance(v, list) else [v]
        add = F.array(*[F.lit(x) for x in vals])
        if _has(df, field):
            cur = _c(field)
            dt = dict(df.dtypes).get(field, "")
            base = cur if dt.startswith("array") \
                else F.when(cur.isNull(), F.array()).otherwise(F.array(cur))
            base = F.coalesce(base, F.array())
            if spec.get("allow_duplicates", True):
                new = F.concat(base, add)
            else:
                new = F.concat(base, F.array_except(add, base))
        else:
            new = add
        return _guarded(df, field, new, _cond(spec))
    return run


def _p_bytes(spec):
    def run(df):
        field = spec["field"]
        if _missing(spec, df, field, "bytes"):
            return df
        target = spec.get("target_field", field)
        return _guarded(df, target,
                        _bytes_expr(_c(field),
                                    bool(spec.get("ignore_failure"))),
                        _cond(spec))
    return run


def _p_convert(spec):
    def run(df):
        field = spec["field"]
        if _missing(spec, df, field, "convert"):
            return df
        target = spec.get("target_field", field)
        return _guarded(df, target,
                        _convert_expr(_c(field), spec["type"],
                                      bool(spec.get("ignore_failure"))),
                        _cond(spec))
    return run


def _p_csv(spec):
    def run(df):
        field = spec["field"]
        if _missing(spec, df, field, "csv"):
            return df
        targets = spec["target_fields"]
        sep = spec.get("separator", ",")
        quote = spec.get("quote", '"')
        schema = ", ".join(f"`{t}` string" for t in targets)
        parsed = F.from_csv(_c(field), schema,
                            {"sep": sep, "quote": quote})
        cond = _cond(spec)
        for t in targets:
            v = parsed.getField(t)
            if spec.get("trim"):
                v = F.trim(v)
            df = _guarded(df, t, v, cond)
        return df
    return run


def _p_date(spec):
    def run(df):
        field = spec["field"]
        if _missing(spec, df, field, "date"):
            return df
        target = spec.get("target_field", "@timestamp")
        legs = []
        for fmt in spec.get("formats", ["ISO8601"]):
            src = _c(field)
            if fmt == "ISO8601":
                legs.append(F.to_timestamp(src))
            elif fmt == "UNIX":
                legs.append(F.timestamp_seconds(
                    src.cast("string").try_cast("double")))
            elif fmt == "UNIX_MS":
                legs.append(F.timestamp_millis(
                    src.cast("string").try_cast("long")))
            else:
                legs.append(F.try_to_timestamp(src.cast("string"),
                                               F.lit(fmt)))
        out = F.coalesce(*legs) if len(legs) > 1 else legs[0]
        if not spec.get("ignore_failure"):
            src = _c(field)
            out = F.when(src.isNotNull() & out.isNull(), F.raise_error(
                F.concat(F.lit("date processor: unable to parse ["),
                         src.cast("string"), F.lit("]")))).otherwise(out)
        return _guarded(df, target, out, _cond(spec))
    return run


def _p_date_index_name(spec):
    def run(df):
        field = spec["field"]
        if _missing(spec, df, field, "date_index_name"):
            return df
        rounding = spec["date_rounding"]
        fmt = spec.get("index_name_format", "yyyy-MM-dd")
        prefix = spec.get("index_name_prefix", "")
        zone = spec.get("timezone", "UTC")
        ts = F.to_timestamp(_c(field))
        # <prefix{formatted||/rounding{format|zone}}>
        # (DateIndexNameProcessor.java:116-127) — date-math expression
        # form resolved downstream by index-name date math
        out = F.concat(F.lit("<" + prefix + "{"),
                       F.date_format(ts, fmt),
                       F.lit("||/" + rounding + "{" + fmt + "|" + zone
                             + "}}>"))
        return _guarded(df, "_index", out, _cond(spec))
    return run


def _p_dissect(spec):
    rx, names = _dissect_to_regex(spec["pattern"])   # eager validation

    def run(df):
        field = spec["field"]
        if _missing(spec, df, field, "dissect"):
            return df
        cond = _cond(spec)
        for i, name in enumerate(names, start=1):
            df = _guarded(df, name, F.regexp_extract(_c(field), rx, i),
                          cond)
        return df
    return run


def _p_dot_expander(spec):
    def run(df):
        _no_if(spec, "dot_expander")
        field = spec["field"]
        if "." not in field:
            raise IngestError(
                f"dot_expander: field [{field}] has no dot")
        if not _has(df, field):
            return df
        root, rest = field.split(".", 1)
        if _has(df, root):
            dt = dict(df.dtypes)[root]
            if not dt.startswith("struct"):
                raise IngestError(
                    f"dot_expander: cannot expand [{field}] — [{root}] "
                    f"exists and is not an object")
            new = F.col(root).withField(rest, _c(field))
        else:
            new = F.struct(_c(field).alias(rest))
        return df.withColumn(root, new).drop(field)
    return run


def _p_fail(spec):
    def run(df):
        # the guard must ride a column that SURVIVES the plan — a
        # dropped marker column would be pruned by Catalyst and the
        # error would never fire. Fold it into the first column.
        msg = spec["message"]
        cond = _cond(spec)
        c0 = df.columns[0]
        dt = df.schema[0].dataType.simpleString()
        probe = F.raise_error(F.lit(f"fail processor: {msg}")).cast(dt)
        new = probe if cond is None \
            else F.when(cond, probe).otherwise(_c(c0))
        return df.withColumn(c0, new)
    return run


def _p_foreach(spec):
    inner = spec["processor"]
    if len(inner) != 1:
        raise IngestError("foreach: exactly one inner processor")
    (ptype, cfg), = inner.items()
    fn = _elem_fn(ptype, cfg)                        # eager validation

    def run(df):
        field = spec["field"]
        if _missing(spec, df, field, "foreach"):
            return df
        return _guarded(df, field, F.transform(_c(field), fn),
                        _cond(spec))
    return run


def _p_grok(spec):
    # compile eagerly — bad patterns fail at pipeline-compile time
    compiled = [_grok_to_regex(p, spec.get("pattern_definitions"))
                for p in spec["patterns"]]
    all_names: list[tuple[str, str | None]] = []
    for _, names in compiled:
        for nt in names:
            if nt[0] not in [n for n, _ in all_names]:
                all_names.append(nt)

    def run(df):
        field = spec["field"]
        if _missing(spec, df, field, "grok"):
            return df
        cond = _cond(spec)
        src = _c(field)
        for name, typ in all_names:
            legs = []
            for rx, names in compiled:
                ns = [n for n, _ in names]
                if name not in ns:
                    continue
                gi = ns.index(name) + 1
                # grok matches UNANCHORED (Grok.captures uses find()) —
                # a pattern may hit anywhere in the value; anchor
                # explicitly with ^/$ inside the pattern if needed
                legs.append(F.when(src.rlike(rx),
                                   F.regexp_extract(src, rx, gi)))
            v = F.coalesce(*legs) if len(legs) > 1 else legs[0]
            if typ:
                v = v.try_cast(_GROK_CASTS[typ])
            df = _guarded(df, name, v, cond)
        return df
    return run


def _p_gsub(spec):
    def run(df):
        field = spec["field"]
        if _missing(spec, df, field, "gsub"):
            return df
        target = spec.get("target_field", field)
        return _guarded(df, target,
                        F.regexp_replace(_c(field), spec["pattern"],
                                         spec["replacement"]),
                        _cond(spec))
    return run


def _html_strip_udf():
    # constructed lazily — pandas_udf needs a live session; `pd` must be
    # module-global for the type-hint resolution
    from sparksearch.extract import extract_text

    def _strip(vals: pd.Series) -> pd.Series:
        return vals.map(lambda v: None if v is None else extract_text(v))
    return F.pandas_udf(_strip, "string")


def _p_html_strip(spec):
    def run(df):
        field = spec["field"]
        if _missing(spec, df, field, "html_strip"):
            return df
        target = spec.get("target_field", field)
        return _guarded(df, target, _html_strip_udf()(_c(field)),
                        _cond(spec))
    return run


def _p_join(spec):
    def run(df):
        field = spec["field"]
        if _missing(spec, df, field, "join"):
            return df
        target = spec.get("target_field", field)
        return _guarded(df, target,
                        F.array_join(_c(field), spec["separator"]),
                        _cond(spec))
    return run


def _p_json(spec):
    def run(df):
        field = spec["field"]
        if _missing(spec, df, field, "json"):
            return df
        target = spec.get("target_field", field)
        schema = spec.get("schema", "map<string,string>")
        return _guarded(df, target, F.from_json(_c(field), schema),
                        _cond(spec))
    return run


def _p_kv(spec):
    def run(df):
        field = spec["field"]
        if _missing(spec, df, field, "kv"):
            return df
        target = spec.get("target_field", field)
        return _guarded(df, target,
                        F.str_to_map(_c(field),
                                     F.lit(spec["field_split"]),
                                     F.lit(spec["value_split"])),
                        _cond(spec))
    return run


def _case(fn):
    def make(spec):
        def run(df):
            field = spec["field"]
            if _missing(spec, df, field, "case"):
                return df
            target = spec.get("target_field", field)
            return _guarded(df, target, fn(_c(field)), _cond(spec))
        return run
    return make


def _p_script(spec):
    # parse statement forms eagerly (the Painless compile itself needs a
    # live session for column construction, so it stays in run)
    src = spec.get("source") or spec.get("inline")
    if not src:
        raise IngestError("script processor requires 'source'")
    parsed = []
    for stmt in (s.strip() for s in src.split(";") if s.strip()):
        m = re.fullmatch(r"ctx\.([A-Za-z_][A-Za-z0-9_.]*)\s*=(?!=)"
                         r"\s*(.+)", stmt, re.S)
        if not m:
            raise IngestError(
                f"script processor: only 'ctx.field = <expr>' "
                f"assignment statements are supported, got: {stmt!r}")
        rewritten = re.sub(r"\bctx\.([A-Za-z_][A-Za-z0-9_]*)",
                           r"doc['\1'].value", m.group(2))
        parsed.append((m.group(1), rewritten))

    def run(df):
        from sparksearch.painless import compile_script
        cond = _cond(spec)
        for target, rewritten in parsed:
            col = compile_script(rewritten,
                                 params=spec.get("params")).column()
            df = _guarded(df, target, col, cond)
        return df
    return run


def _p_sort(spec):
    def run(df):
        field = spec["field"]
        if _missing(spec, df, field, "sort"):
            return df
        target = spec.get("target_field", field)
        out = F.array_sort(_c(field))
        if spec.get("order", "asc") == "desc":
            out = F.reverse(out)
        return _guarded(df, target, out, _cond(spec))
    return run


def _p_split(spec):
    def run(df):
        field = spec["field"]
        if _missing(spec, df, field, "split"):
            return df
        target = spec.get("target_field", field)
        arr = F.split(_c(field), spec["separator"])
        if not spec.get("preserve_trailing", False):
            # Java String.split semantics: drop TRAILING empty strings
            # only — interior empties survive ("a,,b" → [a, "", b])
            trail = F.aggregate(
                F.reverse(arr),
                F.struct(F.lit(0).alias("n"), F.lit(True).alias("run")),
                lambda acc, x: F.struct(
                    F.when(acc["run"] & (x == F.lit("")),
                           acc["n"] + 1).otherwise(acc["n"]).alias("n"),
                    (acc["run"] & (x == F.lit(""))).alias("run")))["n"]
            arr = F.slice(arr, F.lit(1), F.size(arr) - trail)
        return _guarded(df, target, arr, _cond(spec))
    return run


def _p_pipeline(spec):
    def run(df):
        reg_path = spec.get("registry")
        if not reg_path:
            raise IngestError(
                "pipeline processor requires a 'registry' path in this "
                "engine (the stored-pipeline JSON registry)")
        sub = get_pipeline(reg_path, spec["name"])
        return compile_pipeline(sub, registry=reg_path)(df)
    return run


#: (name, version-capture regex) — a published-subset of the uap-core
#: browser families (modules/ingest-user-agent reads the full
#: regexes.yaml; this registry covers the major families and yields
#: "Other" for the rest, which is also the reference's unmatched
#: behavior — documented deviation: exotic families parse as Other).
_UA_FAMILIES = [
    ("Edge", r"Edge?/(\d+)"),
    ("Opera", r"OPR/(\d+)"),
    ("Chrome", r"Chrome/(\d+)"),
    ("Firefox", r"Firefox/(\d+)"),
    ("Safari", r"Version/(\d+)(?:[\d.]*) .*Safari"),
    ("IE", r"MSIE (\d+)"),
]


def _p_user_agent(spec):
    def run(df):
        field = spec["field"]
        if _missing(spec, df, field, "user_agent"):
            return df
        target = spec.get("target_field", "user_agent")
        src = _c(field)
        name = F.lit("Other")
        major = F.lit(None).cast("string")
        for fam, rx in reversed(_UA_FAMILIES):
            hit = src.rlike(rx)
            name = F.when(hit, F.lit(fam)).otherwise(name)
            major = F.when(hit, F.regexp_extract(src, rx, 1)) \
                     .otherwise(major)
        os_ = F.regexp_extract(src, r"\(([^)]*)\)", 1)
        out = F.struct(name.alias("name"), major.alias("major"),
                       os_.alias("os"))
        return _guarded(df, target, out, _cond(spec))
    return run


def _p_geoip(spec):
    db = spec.get("database")
    if not db:
        raise IngestError(
            "geoip processor requires a 'database' (list of "
            "{cidr, ...attribute} rows) in this engine — there is no "
            "bundled GeoLite2 mmdb")

    def run(df):
        _no_if(spec, "geoip")
        field = spec["field"]
        if _missing(spec, df, field, "geoip"):
            return df
        target = spec.get("target_field", "geoip")
        import pandas as pdl
        from sparksearch.mappers_plugins import geoip_enrich
        spark = df.sparkSession
        ranges = spark.createDataFrame(pdl.DataFrame(db))
        attr_cols = [c for c in ranges.columns if c != "cidr"]
        enriched = geoip_enrich(df, field, ranges)
        return (enriched
                .withColumn(target, F.struct(*[_c(c) for c in attr_cols]))
                .drop(*attr_cols))
    return run


_PROCESSORS = {
    "set": _p_set, "remove": _p_remove, "rename": _p_rename,
    "append": _p_append, "bytes": _p_bytes, "convert": _p_convert,
    "csv": _p_csv, "date": _p_date, "date_index_name": _p_date_index_name,
    "dissect": _p_dissect, "dot_expander": _p_dot_expander,
    "fail": _p_fail, "foreach": _p_foreach, "grok": _p_grok,
    "gsub": _p_gsub, "html_strip": _p_html_strip, "join": _p_join,
    "json": _p_json, "kv": _p_kv,
    "lowercase": _case(F.lower), "uppercase": _case(F.upper),
    "trim": _case(F.trim), "urldecode": _case(F.url_decode),
    "script": _p_script, "sort": _p_sort, "split": _p_split,
    "pipeline": _p_pipeline,
    "user_agent": _p_user_agent, "geoip": _p_geoip,
}


def compile_pipeline(pipeline: dict, registry: str | None = None):
    """Compile a pipeline body ({"processors": [{type: spec}, ...]}) to
    one DataFrame→DataFrame function. Compilation is driver-side and
    eager about unknown processors / unsupported options; execution is
    the composed Catalyst plan."""
    procs = []
    for p in pipeline.get("processors", []):
        if len(p) != 1:
            raise IngestError(f"each processor must be a single-key "
                              f"object, got {sorted(p)}")
        (ptype, spec), = p.items()
        if spec.get("on_failure"):
            raise IngestError(
                f"{ptype} processor: on_failure handler chains are not "
                f"supported; use ignore_failure for null-on-error")
        if ptype not in _PROCESSORS:
            raise IngestError(f"unknown processor type: {ptype!r}")
        if ptype == "pipeline" and registry and "registry" not in spec:
            spec = dict(spec, registry=registry)
        procs.append(_PROCESSORS[ptype](spec))

    def run(df: DataFrame) -> DataFrame:
        for fn in procs:
            df = fn(df)
        return df
    return run


def run_pipeline(df: DataFrame, pipeline: dict,
                 registry: str | None = None) -> DataFrame:
    return compile_pipeline(pipeline, registry=registry)(df)


# ---------------------------------------------------------------------------
# stored pipelines (_ingest/pipeline CRUD) + _simulate
# ---------------------------------------------------------------------------

def _load(path: str) -> dict:
    if os.path.exists(path):
        with open(path) as f:
            return _jsonlib.load(f)
    return {}


def put_pipeline(path: str, pipeline_id: str, body: dict) -> None:
    """``PUT _ingest/pipeline/<id>`` — compile-checks the body before
    storing (IngestService validates on put)."""
    compile_pipeline(body, registry=path)
    reg = _load(path)
    reg[pipeline_id] = body
    tmp = path + ".tmp"
    with open(tmp, "w") as f:
        _jsonlib.dump(reg, f, indent=2, sort_keys=True)
    os.replace(tmp, path)


def delete_pipeline(path: str, pipeline_id: str) -> None:
    reg = _load(path)
    reg.pop(pipeline_id, None)
    tmp = path + ".tmp"
    with open(tmp, "w") as f:
        _jsonlib.dump(reg, f, indent=2, sort_keys=True)
    os.replace(tmp, path)


def get_pipeline(path: str, pipeline_id: str) -> dict:
    reg = _load(path)
    if pipeline_id not in reg:
        raise KeyError(f"unknown pipeline: {pipeline_id!r}")
    return reg[pipeline_id]


def simulate_pipeline(spark, pipeline: dict, docs: list[dict],
                      registry: str | None = None) -> list[dict]:
    """``POST _ingest/pipeline/_simulate`` — run the compiled pipeline
    over the sample docs and return the transformed documents."""
    import pandas as pd
    df = spark.createDataFrame(pd.DataFrame(docs))
    out = run_pipeline(df, pipeline, registry=registry)
    return [row.asDict(recursive=True) for row in out.collect()]
