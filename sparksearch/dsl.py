"""JSON query DSL → query AST, plus mustache-style search templates.

The reference parses the `_search` request body's JSON query DSL into
QueryBuilder objects (registrations at
/root/reference/server/src/main/java/org/opensearch/search/SearchModule.java:1112-1174;
each builder's fromXContent under sv/index/query/*QueryBuilder.java), and
`modules/lang-mustache/` renders `_search/template` requests by substituting
`{{param}}` placeholders into the JSON before parsing. Both are pure
driver-side front-ends here: `from_dsl` maps the JSON dict onto the
dataclass AST in queries.py, `render_template` does the mustache-subset
substitution ({{var}}, {{#section}} conditional, {{^inverted}}). The
executor and plans are unchanged — this is the parse layer only.
"""

from __future__ import annotations

import re
from typing import Any

from sparksearch.queries import (
    Bool, Boosting, ConstantScore, DisMax, Exists, Fuzzy, Ids, Intervals,
    Match, MatchAll, MatchBoolPrefix, MatchNone, MatchPhrase,
    MatchPhrasePrefix, MoreLikeThis, MultiMatch, Nested, Prefix, Query, Range,
    Regexp, Script, ScriptScore, SpanFirst, SpanNear, SpanNot, SpanOr,
    SpanWithin, Term, Terms, TermsSet, Wildcard,
    DecayFunction, FieldValueFactor, FunctionScore, WeightFunction,
)

__all__ = ["from_dsl", "render_template", "validate_query"]


def _field_body(body: dict) -> tuple[str, Any]:
    """Unwrap the single {field: spec} level of a leaf query."""
    if len(body) != 1:
        raise ValueError(f"expected one field key, got {sorted(body)}")
    return next(iter(body.items()))


def _text_spec(spec: Any) -> dict:
    """Leaf text queries accept either "query text" or {"query": ...}."""
    return spec if isinstance(spec, dict) else {"query": spec}


def _match(body: dict) -> Match:
    field, spec = _field_body(body)
    s = _text_spec(spec)
    return Match(field, s["query"], operator=s.get("operator", "or"),
                 minimum_should_match=s.get("minimum_should_match"),
                 analyzer=s.get("analyzer"),
                 fuzziness=s.get("fuzziness"),
                 fuzzy_transpositions=bool(
                     s.get("fuzzy_transpositions", True)),
                 max_expansions=int(s.get("max_expansions", 50)))


def _match_phrase(body: dict) -> MatchPhrase:
    field, spec = _field_body(body)
    s = _text_spec(spec)
    return MatchPhrase(field, s["query"], slop=int(s.get("slop", 0)),
                       analyzer=s.get("analyzer"))


def _term(body: dict) -> Term:
    field, spec = _field_body(body)
    return Term(field, spec["value"] if isinstance(spec, dict) else spec)


def _terms(body: dict) -> Terms:
    field, values = _field_body(body)
    return Terms(field, tuple(values))


def _range(body: dict) -> Range:
    field, spec = _field_body(body)
    return Range(field, gte=spec.get("gte"), gt=spec.get("gt"),
                 lte=spec.get("lte"), lt=spec.get("lt"))


def _bool(body: dict) -> Bool:
    def clauses(key: str) -> list[Query]:
        v = body.get(key, [])
        return [from_dsl(c) for c in (v if isinstance(v, list) else [v])]
    return Bool(must=clauses("must"), should=clauses("should"),
                must_not=clauses("must_not"), filter=clauses("filter"),
                minimum_should_match=body.get("minimum_should_match"))


def _multi_match(body: dict) -> MultiMatch:
    return MultiMatch(fields=list(body["fields"]), text=body["query"],
                      type=body.get("type", "best_fields"),
                      tie_breaker=float(body.get("tie_breaker", 0.0)),
                      operator=body.get("operator", "or"),
                      minimum_should_match=body.get("minimum_should_match"))


def _simple(cls, value_key: str):
    def build(body: dict):
        field, spec = _field_body(body)
        v = spec[value_key] if isinstance(spec, dict) else spec
        return cls(field, v)
    return build


def _fuzzy(body: dict) -> Fuzzy:
    field, spec = _field_body(body)
    s = _text_spec(spec) if isinstance(spec, dict) else {"value": spec}
    return Fuzzy(field, s.get("value", s.get("query")),
                 fuzziness=s.get("fuzziness", "AUTO"),
                 transpositions=bool(s.get("transpositions", True)),
                 max_expansions=int(s.get("max_expansions", 50)))


def _dis_max(body: dict) -> DisMax:
    return DisMax(queries=[from_dsl(q) for q in body["queries"]],
                  tie_breaker=float(body.get("tie_breaker", 0.0)))


def _constant_score(body: dict) -> ConstantScore:
    return ConstantScore(filter_query=from_dsl(body["filter"]),
                         boost=float(body.get("boost", 1.0)))


def _boosting(body: dict) -> Boosting:
    return Boosting(positive=from_dsl(body["positive"]),
                    negative=from_dsl(body["negative"]),
                    negative_boost=float(body.get("negative_boost", 0.5)))


def _script_spec(spec: Any) -> tuple[str, dict | None]:
    """{"source": ..., "params": ..., "lang": ...} or a bare source
    string.  lang "painless" (default) passes through; lang "expression"
    (modules/lang-expression — Lucene expressions) is lowered to the
    painless expression subset at parse time, so the rest of the engine
    sees one script dialect."""
    if isinstance(spec, str):
        return spec, None
    lang = spec.get("lang", "painless")
    source = spec["source"]
    if lang == "expression":
        from sparksearch.painless import expression_to_painless
        source = expression_to_painless(source)
    elif lang not in ("painless",):
        raise ValueError(f"unsupported script lang {lang!r}")
    return source, spec.get("params")


def _distance_feature(body: dict):
    from sparksearch.queries import DistanceFeature
    return DistanceFeature(body["field"], origin=body["origin"],
                           pivot=body["pivot"],
                           boost=float(body.get("boost", 1.0)))


def _common_terms(body: dict):
    from sparksearch.queries import CommonTerms
    field, spec = _field_body(body)
    if not isinstance(spec, dict):
        spec = {"query": spec}
    return CommonTerms(
        field, spec["query"],
        cutoff_frequency=float(spec.get("cutoff_frequency", 0.01)),
        low_freq_operator=spec.get("low_freq_operator", "or"),
        high_freq_operator=spec.get("high_freq_operator", "or"),
        analyzer=spec.get("analyzer"))


def _query_string(body: dict):
    from sparksearch.qs_parser import parse_query_string
    return parse_query_string(body["query"],
                              body.get("default_field", "text"))


def _simple_query_string(body: dict):
    # shared grammar subset (| && + forms parse identically);
    # `fields` takes the first entry as the default field
    from sparksearch.qs_parser import parse_query_string
    fields = body.get("fields") or ["text"]
    return parse_query_string(body["query"], fields[0].split("^")[0])


def _span_term_leaf(body: dict):
    # standalone span_term — a one-clause ordered span (SpanTermQueryBuilder)
    from sparksearch.queries import SpanNear
    field, spec = _field_body(body)
    term = spec["value"] if isinstance(spec, dict) else spec
    return SpanNear(field, (term,), slop=0, in_order=True)


def _span_multi(body: dict):
    from sparksearch.queries import SpanMulti
    inner = from_dsl(body["match"])
    field = getattr(inner, "field_name", "text")
    return SpanMulti(field, inner,
                     max_expansions=int(body.get("max_expansions", 50)))


def _rank_feature(body: dict):
    from sparksearch.queries import RankFeature
    field = body["field"]
    for fn in ("saturation", "log", "sigmoid", "linear"):
        if fn in body:
            s = body[fn] or {}
            return RankFeature(field, function=fn,
                               pivot=float(s.get("pivot", 1.0)),
                               scaling_factor=float(
                                   s.get("scaling_factor", 1.0)),
                               exponent=float(s.get("exponent", 1.0)),
                               boost=float(body.get("boost", 1.0)))
    return RankFeature(field, boost=float(body.get("boost", 1.0)))


def _script(body: dict) -> Script:
    src, params = _script_spec(body["script"])
    return Script(src, params)


def _script_score(body: dict) -> FunctionScore:
    """Top-level script_score query (ScriptScoreQueryBuilder.java): the
    script's value REPLACES the query score (`_score` available inside)."""
    src, params = _script_spec(body["script"])
    return FunctionScore(query=from_dsl(body["query"]),
                         functions=[ScriptScore(src, params)],
                         boost_mode="replace")


def _one_function(f: dict):
    """One entry of function_score.functions
    (sv/index/query/functionscore/FunctionScoreQueryBuilder.java:72;
    per-function filters are not supported — wrap the query instead)."""
    if "weight" in f:
        if len(f) != 1:
            raise ValueError(
                "per-function weight unsupported: add a separate "
                "{'weight': w} entry (score_mode folds it in)")
        return WeightFunction(float(f["weight"]))
    if "field_value_factor" in f:
        s = f["field_value_factor"]
        return FieldValueFactor(s["field"],
                                factor=float(s.get("factor", 1.0)),
                                modifier=s.get("modifier", "none"),
                                missing=float(s.get("missing", 1.0)))
    if "script_score" in f:
        src, params = _script_spec(f["script_score"]["script"])
        return ScriptScore(src, params)
    if "random_score" in f:
        from sparksearch.queries import RandomScore
        s = f["random_score"] or {}
        return RandomScore(seed=int(s.get("seed", 0)),
                           field=s.get("field", "docid"))
    for kind in ("gauss", "exp", "linear"):
        if kind in f:
            field, s = _field_body(f[kind])
            return DecayFunction(kind, field, s["origin"],
                                 scale=float(s["scale"]),
                                 offset=float(s.get("offset", 0.0)),
                                 decay=float(s.get("decay", 0.5)))
    raise ValueError(f"unsupported score function: {sorted(f)}")


def _function_score(body: dict) -> FunctionScore:
    fns = body.get("functions")
    if fns is None:
        fns = [{k: v} for k, v in body.items()
               if k in ("weight", "field_value_factor", "script_score",
                        "random_score", "gauss", "exp", "linear")]
    return FunctionScore(
        query=from_dsl(body.get("query", {"match_all": {}})),
        functions=[_one_function(f) for f in fns],
        score_mode=body.get("score_mode", "multiply"),
        boost_mode=body.get("boost_mode", "multiply"))


def _mlt(body: dict) -> MoreLikeThis:
    """`like` accepts free text, {"_id": ...} doc references, or a mixed
    list of both (MoreLikeThisQueryBuilder.fromXContent Item parsing)."""
    fields = body.get("fields", ["text"])
    like = body["like"]
    texts, ids = [], []
    for item in (like if isinstance(like, list) else [like]):
        if isinstance(item, dict):
            ids.append(int(item["_id"]))
        else:
            texts.append(str(item))
    return MoreLikeThis(fields[0], " ".join(texts), like_ids=tuple(ids),
                        max_query_terms=int(body.get("max_query_terms", 25)),
                        minimum_should_match=body.get(
                            "minimum_should_match", "30%"),
                        min_doc_freq=int(body.get("min_doc_freq", 1)),
                        min_term_freq=int(body.get("min_term_freq", 1)),
                        include=bool(body.get("include", False)))


def _span_terms(clauses: list) -> tuple[str, list]:
    from sparksearch.queries import SpanGap
    terms = []
    field = None
    for c in clauses:
        if "span_gap" in c:
            f, width = _field_body(c["span_gap"])
            field = field or f
            terms.append(SpanGap(f, int(width)))
            continue
        if "field_masking_span" in c:
            # {"field_masking_span": {"query": {"span_term": {...}},
            #   "field": <masked field>, "filters": [...]}} — the filters
            # chain defines the sub-field (FieldMaskingSpanQueryBuilder;
            # the reference reads it from the mapping, this engine takes
            # it inline)
            from sparksearch.queries import FieldMaskingSpan
            fm = c["field_masking_span"]
            mf, spec = _field_body(fm["query"]["span_term"])
            term = spec["value"] if isinstance(spec, dict) else spec
            terms.append(FieldMaskingSpan(
                fm.get("field", mf), term,
                filters=tuple(fm.get("filters", ()))))
            continue
        f, spec = _field_body(c["span_term"])
        field = field or f
        terms.append(spec["value"] if isinstance(spec, dict) else spec)
    return field, terms


def _field_masking_top(body: dict):
    """Top-level field_masking_span (outside a span_near): planned as a
    one-clause span — matches wherever any expansion member occurs
    (FieldMaskingSpanQueryBuilder used standalone)."""
    from sparksearch.queries import FieldMaskingSpan
    mf, spec = _field_body(body["query"]["span_term"])
    term = spec["value"] if isinstance(spec, dict) else spec
    return FieldMaskingSpan(body.get("field", mf), term,
                            filters=tuple(body.get("filters", ())))


def _span_near(body: dict) -> SpanNear:
    field, terms = _span_terms(body["clauses"])
    return SpanNear(field, tuple(terms), slop=int(body.get("slop", 0)),
                    in_order=bool(body.get("in_order", True)))


def _span_first(body: dict) -> SpanFirst:
    m = body["match"]
    if "span_term" in m:
        field, terms = _span_terms([m])
        slop = 0
    else:
        inner = _span_near(m["span_near"])
        field, terms, slop = inner.field_name, list(inner.clauses), inner.slop
    return SpanFirst(field, tuple(terms), end=int(body["end"]), slop=slop)


def _span_or(body: dict) -> SpanOr:
    field, terms = _span_terms(body["clauses"])
    return SpanOr(field, tuple(terms))


def _span_not(body: dict) -> SpanNot:
    field, inc = _span_terms([body["include"]])
    _, exc = _span_terms([body["exclude"]])
    return SpanNot(field, inc[0], exc[0],
                   pre=int(body.get("pre", 0)),
                   post=int(body.get("post", 0)))


def _span_within(mode: str):
    def build(body: dict) -> SpanWithin:
        _, little = _span_terms([body["little"]])
        inner = _span_near(body["big"]["span_near"])
        return SpanWithin(inner.field_name, little[0],
                          tuple(inner.clauses), big_slop=inner.slop,
                          mode=mode)
    return build


def _terms_set(body: dict) -> TermsSet:
    field, spec = _field_body(body)
    return TermsSet(field, tuple(spec["terms"]),
                    required=int(spec.get("required", 1)))


def _intervals_source(spec: dict):
    """One IntervalsSourceProvider node (match / prefix / any_of /
    all_of, each optionally carrying a `filter` block), recursively
    (IntervalQueryBuilder.fromXContent; IntervalFilter for the filter
    kinds containing/contained_by/overlapping/not_*/before/after)."""
    from sparksearch.queries import (IntervalsAllOf, IntervalsAnyOf,
                                     IntervalsFiltered, IntervalsMatch,
                                     IntervalsPrefix)

    def filtered(node, body):
        flt = body.get("filter") if isinstance(body, dict) else None
        if not flt:
            return node
        (kind, fspec), = flt.items()
        return IntervalsFiltered(node, kind, _intervals_source(fspec))

    if "match" in spec:
        m = spec["match"]
        return filtered(
            IntervalsMatch(m["query"],
                           max_gaps=int(m.get("max_gaps", -1)),
                           ordered=bool(m.get("ordered", False)),
                           analyzer=m.get("analyzer")), m)
    if "prefix" in spec:
        pr = spec["prefix"]
        if isinstance(pr, dict):
            return filtered(IntervalsPrefix(pr["prefix"]), pr)
        return IntervalsPrefix(pr)
    if "any_of" in spec:
        a = spec["any_of"]
        return filtered(IntervalsAnyOf(tuple(
            _intervals_source(x) for x in a["intervals"])), a)
    if "all_of" in spec:
        a = spec["all_of"]
        return filtered(IntervalsAllOf(
            tuple(_intervals_source(x) for x in a["intervals"]),
            max_gaps=int(a.get("max_gaps", -1)),
            ordered=bool(a.get("ordered", False))), a)
    raise ValueError(f"unsupported intervals source: {sorted(spec)}")


def _intervals(body: dict) -> Intervals:
    field, spec = _field_body(body)
    if set(spec) == {"match"} and "filter" not in spec["match"]:
        # plain match source: the fast span_near text path (legacy form,
        # reference defaults ordered=false/max_gaps=-1 differ — this form
        # keeps the engine's documented text-form defaults)
        m = spec["match"]
        return Intervals(field, m["query"],
                         max_gaps=int(m.get("max_gaps", 0)),
                         ordered=bool(m.get("ordered", True)))
    return Intervals(field, source=_intervals_source(spec))


_LEAF = {
    "match_all": lambda b: MatchAll(),
    "match_none": lambda b: MatchNone(),
    "match": _match,
    "match_phrase": _match_phrase,
    "match_phrase_prefix": lambda b: (lambda f, s: MatchPhrasePrefix(
        f, s["query"], max_expansions=int(s.get("max_expansions", 50)),
        analyzer=s.get("analyzer")))(
            _field_body(b)[0], _text_spec(_field_body(b)[1])),
    "match_bool_prefix": lambda b: (lambda f, s: MatchBoolPrefix(
        f, s["query"], operator=s.get("operator", "or"),
        minimum_should_match=s.get("minimum_should_match"),
        analyzer=s.get("analyzer")))(
            _field_body(b)[0], _text_spec(_field_body(b)[1])),
    "multi_match": _multi_match,
    "term": _term,
    "terms": _terms,
    "range": _range,
    "exists": lambda b: Exists(b["field"]),
    "ids": lambda b: Ids(tuple(b["values"])),
    "prefix": _simple(Prefix, "value"),
    "wildcard": _simple(Wildcard, "value"),
    "regexp": _simple(Regexp, "value"),
    "fuzzy": _fuzzy,
    "bool": _bool,
    # default score_mode is AVG, not none: NestedQueryBuilder.fromXContent
    # defaults ScoreMode.Avg (NestedQueryBuilder.java:209) — in this
    # engine's constant-scoring nested model that is 1.0 per matching
    # parent, vs 0.0 (filter context) for an explicit "none"
    "nested": lambda b: Nested(b["path"], from_dsl(b["query"]),
                               score_mode=b.get("score_mode", "avg")),
    "dis_max": _dis_max,
    "constant_score": _constant_score,
    "boosting": _boosting,
    "more_like_this": _mlt,
    "span_near": _span_near,
    "field_masking_span": _field_masking_top,
    "span_first": _span_first,
    "span_or": _span_or,
    "span_not": _span_not,
    "span_within": _span_within("within"),
    "span_containing": _span_within("containing"),
    "terms_set": _terms_set,
    "intervals": _intervals,
    "wrapper": lambda b: _wrapper(b),
    "script": _script,
    "script_score": _script_score,
    "function_score": _function_score,
    "rank_feature": _rank_feature,
    "distance_feature": _distance_feature,
    "common": _common_terms,
    "query_string": _query_string,
    "simple_query_string": _simple_query_string,
    "span_term": _span_term_leaf,
    "span_multi": _span_multi,
}


def _wrapper(body: dict) -> Query:
    """`wrapper` — serialized JSON of a full query object re-parsed
    through the same registry (sv/index/query/WrapperQueryBuilder.java
    doRewrite). Accepts the REST base64 form plus the Java-client
    raw-JSON string/bytes forms; junk is rejected loudly instead of
    surfacing a bare binascii error."""
    import base64
    import binascii
    import json
    src = body["query"]
    if isinstance(src, (bytes, bytearray)):
        raw = bytes(src)
    else:
        s = str(src).strip()
        if s.startswith("{"):
            raw = s.encode()
        else:
            try:
                raw = base64.b64decode(s, validate=True)
            except (binascii.Error, ValueError) as e:
                raise ValueError(f"wrapper: query is neither JSON nor "
                                 f"base64: {e}") from None
    return from_dsl(json.loads(raw))


def _boost_of(body: Any) -> float:
    """Extract a query-level `boost` — top-level for compound queries,
    inside the single field spec for field-keyed leaves."""
    if not isinstance(body, dict):
        return 1.0
    if "boost" in body:
        return float(body["boost"])
    if len(body) == 1:
        v = next(iter(body.values()))
        if isinstance(v, dict) and "boost" in v:
            return float(v["boost"])
    return 1.0


def _name_of(body: Any) -> str | None:
    """Extract `_name` (AbstractQueryBuilder queryName) — top-level for
    compound queries, inside the single field spec for field-keyed leaves."""
    if not isinstance(body, dict):
        return None
    if "_name" in body:
        return str(body["_name"])
    if len(body) == 1:
        v = next(iter(body.values()))
        if isinstance(v, dict) and "_name" in v:
            return str(v["_name"])
    return None


def from_dsl(dsl: dict) -> Query:
    """Parse one JSON query-DSL object (the value of "query") to the AST.

    Every query type honors `boost`: a non-1 boost wraps the parsed query
    in FunctionScore(weight) with boost_mode=multiply — the reference
    multiplies each query's score by its boost
    (AbstractQueryBuilder.java boost plumbing). Never silently dropped."""
    if len(dsl) != 1:
        raise ValueError(f"expected one query type, got {sorted(dsl)}")
    kind, body = next(iter(dsl.items()))
    try:
        build = _LEAF[kind]
    except KeyError:
        raise ValueError(f"unsupported query type: {kind}") from None
    q = build(body)
    boost = _boost_of(body)
    # leaves that fold `boost` into their own scoring function already
    # (constant_score's filter boost, rank_feature/distance_feature's
    # boost·f(x) form) must not get the generic multiply wrapper too
    if boost != 1.0 and kind not in ("constant_score", "rank_feature",
                                     "distance_feature"):
        from sparksearch.queries import FunctionScore, WeightFunction
        q = FunctionScore(query=q, functions=[WeightFunction(boost)],
                          boost_mode="multiply")
    name = _name_of(body)
    if name:
        from sparksearch.queries import Named
        q = Named(q, name)
    return q


# ---------------------------------------------------------------------------
# search templates (lang-mustache subset)
# ---------------------------------------------------------------------------

_VAR = re.compile(r"\{\{([#^/]?)([\w.]+)\}\}")


def _render_str(s: str, params: dict) -> Any:
    """Substitute {{var}} in one string. A string that is exactly one
    placeholder keeps the param's type (int stays int)."""
    m = _VAR.fullmatch(s)
    if m and not m.group(1):
        return params.get(m.group(2), "")

    def sub(mo: re.Match) -> str:
        if mo.group(1):
            raise ValueError("section tags only valid at dict level")
        v = params.get(mo.group(2), "")
        return "" if v is None else str(v)

    return _VAR.sub(sub, s)


def render_template(source: Any, params: dict) -> Any:
    """Render a search template: walk the JSON structure substituting
    {{var}}; a dict key "{{#var}}"/"{{^var}}" keeps its subtree only when
    the param is truthy/falsy (conditional sections, flattened in place)."""
    if isinstance(source, str):
        return _render_str(source, params)
    if isinstance(source, list):
        return [render_template(x, params) for x in source]
    if isinstance(source, dict):
        out = {}
        for k, v in source.items():
            m = _VAR.fullmatch(k)
            if m and m.group(1) in ("#", "^"):
                truthy = bool(params.get(m.group(2)))
                keep = truthy if m.group(1) == "#" else not truthy
                if keep:
                    sub = render_template(v, params)
                    if not isinstance(sub, dict):
                        raise ValueError("section value must be an object")
                    out.update(sub)
                continue
            out[render_template(k, params)] = render_template(v, params)
        return out
    return source


def validate_query(dsl: dict) -> tuple[bool, str]:
    """`_validate/query` API: parse-check a JSON DSL query without running
    it; returns (valid, explanation) — the explanation is the rewritten
    query AST, like the reference's explain=true rewrite string
    (sv/action/admin/indices/validate/query/TransportValidateQueryAction.java)."""
    try:
        q = from_dsl(dsl)
    except (ValueError, KeyError, TypeError) as e:
        return False, f"parse error: {e}"
    try:
        # explain=true reports the REWRITTEN Lucene query's toString —
        # the profiler's description is exactly that form
        from sparksearch.profiler import rewrite_tree
        return True, rewrite_tree(q)["description"]
    except NotImplementedError:
        return True, repr(q)
