"""Nested-docs queries: block-join semantics over array-of-structs columns.

The reference stores a nested field's objects as hidden child Lucene
documents in the same block as the parent and answers `nested` queries
with a block join (sv/index/query/NestedQueryBuilder.java:96-180,
ToParentBlockJoinQuery). The Spark-native shape needs no join at all:
a nested field IS an `array<struct<...>>` doc-values column, and "at
least one child doc satisfies the whole inner query" is an `exists()`
higher-order function whose lambda evaluates every inner clause against
the SAME array element. One docs scan, zero shuffle, and the semantics
the block join exists to provide — `a=1 AND b=2` must hold on ONE
element, not across two — fall out of the lambda scoping.

Inner queries are the doc-values family (term/terms/range/exists/
prefix/bool); nested text fields are not indexed into the postings, so
BM25-scored inner queries are rejected rather than silently mis-scored
(ScoreMode collapses to the filter-context constant, the reference's
ScoreMode.None path).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

from sparksearch.queries import (Bool, Exists, Nested, Prefix, Query, Range,
                                 Term, Terms, calculate_min_should_match)

__all__ = ["element_cond", "nested_cond", "nested_filter"]


def _leaf(e: Column, path: str, field_name: str) -> Column:
    """Resolve an inner field reference against the array element: the
    reference addresses nested leaves as `path.leaf`; a bare leaf name
    is accepted too."""
    name = field_name
    if name.startswith(path + "."):
        name = name[len(path) + 1:]
    return e[name]


def element_cond(e: Column, path: str, q: Query) -> Column:
    """The inner query as a predicate over ONE array element `e`."""
    if isinstance(q, Term):
        return _leaf(e, path, q.field_name) == F.lit(q.value)
    if isinstance(q, Terms):
        return _leaf(e, path, q.field_name).isin(list(q.values))
    if isinstance(q, Exists):
        return _leaf(e, path, q.field_name).isNotNull()
    if isinstance(q, Prefix):
        return _leaf(e, path, q.field_name).startswith(q.value)
    if isinstance(q, Range):
        col = _leaf(e, path, q.field_name)
        cond = F.lit(True)
        for bound, op in (("gte", col.__ge__), ("gt", col.__gt__),
                          ("lte", col.__le__), ("lt", col.__lt__)):
            v = getattr(q, bound)
            if v is not None:
                cond = cond & op(F.lit(v))
        return cond
    if isinstance(q, Bool):
        cond = F.lit(True)
        for c in list(q.must) + list(q.filter):
            cond = cond & element_cond(e, path, c)
        for c in q.must_not:
            cond = cond & ~element_cond(e, path, c)
        if q.should:
            legs = [element_cond(e, path, c) for c in q.should]
            need = calculate_min_should_match(
                len(legs), q.minimum_should_match,
                has_required=bool(q.must or q.filter))
            if need > 0:  # need==0: should clauses are purely optional
                n_sat = sum((l.cast("int") for l in legs), F.lit(0))
                cond = cond & (n_sat >= F.lit(need))
        return cond
    raise TypeError(
        f"nested: inner query {type(q).__name__} is not a doc-values "
        f"predicate (nested text fields are not BM25-indexed)")


def nested_cond(path: str, q: Query) -> Column:
    """The whole nested query as one docs-scan predicate."""
    return F.exists(F.col(path), lambda e: element_cond(e, path, q))


def nested_filter(docs: DataFrame, q: Nested) -> DataFrame:
    """Filter a docs table by a Nested query (standalone helper for
    pipelines that hold a DataFrame rather than an IndexReader)."""
    return docs.filter(nested_cond(q.path, q.query))


def matching_elements(path: str, q: Query) -> Column:
    """The array of elements that satisfy the inner query — the basis of
    nested scoring (one 'child doc' per element) and inner_hits."""
    return F.filter(F.col(path), lambda e: element_cond(e, path, q))


def inner_hits(docs: DataFrame, q: Nested, size: int = 3,
               name: str = "inner_hits") -> DataFrame:
    """Nested inner_hits: each matching doc with its first `size`
    matching elements attached (InnerHitBuilder on a nested query —
    sv/index/query/InnerHitBuilder.java; NestedQueryBuilder
    innerHitBuilder). Same single-scan shape: the element filter runs
    once per doc inside the scan, no child-doc join."""
    sel = matching_elements(q.path, q.query)
    return (docs.filter(F.size(sel) > 0)
            .withColumn(name, F.slice(sel, 1, size)))
