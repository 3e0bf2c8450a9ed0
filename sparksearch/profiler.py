"""Search ``profile`` analogue.

Reference: sv/search/profile/query/QueryProfiler.java +
InternalQueryProfileTree.java build a tree of ProfileResult nodes —
(type = the Lucene query class simple name, description =
query.toString(), children = sub-queries) — for the query AFTER
rewrite (a `match` profiles as the BooleanQuery-of-TermQuerys it
rewrites to; sv/search/profile/ProfileResult.java holds the node
shape, QueryTimingType.java the breakdown keys).

Wall-clock breakdown timings are non-deterministic, so the gated
surface here is the deterministic tree: ``profile_rows`` emits the
preorder DFS as (ord, depth, type, description) rows exactly as
ProfileResult nests them. Descriptions follow Lucene's toString
conventions: ``+`` must, ``-`` must_not, ``#`` filter, ``field:term``,
``field:"p h r a s e"``(~slop), ``[lo TO hi]`` ranges, ``~n`` fuzzy
and minimum_should_match suffixes.
"""

from __future__ import annotations

from sparksearch.queries import (Bool, ConstantScore, DisMax, Exists, Fuzzy,
                                 Match, MatchAll, MatchNone, MatchPhrase,
                                 Prefix, Query, Range, Term, Terms, TextPrefix,
                                 Wildcard)

__all__ = ["rewrite_tree", "profile_rows", "profile_df"]


def _analyzed(text: str, analyzer: str) -> list[str]:
    from sparksearch.analysis import analyze
    return [t.term for t in analyze(text, analyzer)]


def rewrite_tree(q: Query, analyzer: str = "standard") -> dict:
    """(type, description, children) for the rewritten query — the
    node shape of ProfileResult."""
    if isinstance(q, MatchAll):
        return {"type": "MatchAllDocsQuery", "description": "*:*",
                "children": []}
    if isinstance(q, MatchNone):
        return {"type": "MatchNoDocsQuery",
                "description": 'MatchNoDocsQuery("")', "children": []}
    if isinstance(q, Term):
        return {"type": "TermQuery",
                "description": f"{q.field_name}:{q.value}", "children": []}
    if isinstance(q, Terms):
        vals = " ".join(str(v) for v in q.values)
        return {"type": "TermInSetQuery",
                "description": f"{q.field_name}:({vals})", "children": []}
    if isinstance(q, Match):
        terms = _analyzed(q.text, q.analyzer or analyzer)
        kids = [{"type": "TermQuery",
                 "description": f"{q.field_name}:{t}", "children": []}
                for t in terms]
        if len(kids) == 1:
            return kids[0]
        pre = "+" if q.operator == "and" else ""
        desc = " ".join(pre + k["description"] for k in kids)
        if q.minimum_should_match is not None and q.operator != "and":
            desc = f"({desc})~{q.minimum_should_match}"
        return {"type": "BooleanQuery", "description": desc,
                "children": kids}
    if isinstance(q, MatchPhrase):
        terms = _analyzed(q.text, q.analyzer or analyzer)
        desc = f'{q.field_name}:"{" ".join(terms)}"'
        if q.slop:
            desc += f"~{q.slop}"
        return {"type": "PhraseQuery", "description": desc, "children": []}
    if isinstance(q, Range):
        lo = q.gte if q.gte is not None else q.gt
        hi = q.lte if q.lte is not None else q.lt
        lb = "[" if q.gt is None else "{"
        rb = "]" if q.lt is None else "}"
        lo = "*" if lo is None else lo
        hi = "*" if hi is None else hi
        return {"type": "IndexOrDocValuesQuery",
                "description": f"{q.field_name}:{lb}{lo} TO {hi}{rb}",
                "children": []}
    if isinstance(q, Exists):
        return {"type": "FieldExistsQuery",
                "description": f"FieldExistsQuery [field={q.field_name}]",
                "children": []}
    if isinstance(q, (Prefix, TextPrefix)):
        return {"type": "PrefixQuery",
                "description": f"{q.field_name}:{q.value}*", "children": []}
    if isinstance(q, Wildcard):
        return {"type": "WildcardQuery",
                "description": f"{q.field_name}:{q.pattern}",
                "children": []}
    if isinstance(q, Fuzzy):
        return {"type": "FuzzyQuery",
                "description": f"{q.field_name}:{q.value}~{q.fuzziness}",
                "children": []}
    if isinstance(q, ConstantScore):
        kid = rewrite_tree(q.filter_query, analyzer)
        return {"type": "ConstantScoreQuery",
                "description": f"ConstantScore({kid['description']})",
                "children": [kid]}
    if isinstance(q, DisMax):
        kids = [rewrite_tree(s, analyzer) for s in q.queries]
        inner = " | ".join(k["description"] for k in kids)
        return {"type": "DisjunctionMaxQuery",
                "description": f"({inner})~{q.tie_breaker}",
                "children": kids}
    if isinstance(q, Bool):
        kids, parts = [], []
        for pre, clauses in (("+", q.must), ("", q.should),
                             ("-", q.must_not), ("#", q.filter)):
            for c in clauses:
                k = rewrite_tree(c, analyzer)
                kids.append(k)
                d = k["description"]
                if k["children"]:
                    d = f"({d})"
                parts.append(pre + d)
        desc = " ".join(parts)
        if q.minimum_should_match is not None:
            desc = f"({desc})~{q.minimum_should_match}"
        return {"type": "BooleanQuery", "description": desc,
                "children": kids}
    raise NotImplementedError(
        f"profile: no rewrite description for {type(q).__name__}")


def profile_rows(q: Query, analyzer: str = "standard") -> list[tuple]:
    """Preorder DFS of the rewritten tree:
    (ord, depth, type, description)."""
    rows: list[tuple] = []

    def walk(node: dict, depth: int):
        rows.append((len(rows), depth, node["type"], node["description"]))
        for k in node["children"]:
            walk(k, depth + 1)

    walk(rewrite_tree(q, analyzer), 0)
    return rows


def profile_df(spark, q: Query, analyzer: str = "standard"):
    """The gated DataFrame form of the profile tree."""
    return spark.createDataFrame(
        profile_rows(q, analyzer),
        "ord int, depth int, type string, description string")
