"""random_score + field_masking_span (round-3 registry leaves)."""

import pytest
from pyspark.sql import functions as F

from sparksearch.build import build_index
from sparksearch.exec import Executor
from sparksearch.index import IndexReader
from sparksearch.queries import (FieldMaskingSpan, FunctionScore, Match,
                                 MatchAll, RandomScore, SpanNear)


@pytest.fixture(scope="module")
def tiny_ix(spark, tmp_path_factory):
    out = str(tmp_path_factory.mktemp("ix_r3"))
    docs = spark.createDataFrame(
        [("u1", "libros grandes scan fast"),
         ("u2", "libro pequena scan slow"),
         ("u3", "scan libros libro luces"),
         ("u4", "join table merge")],
        "url string, text string") \
        .withColumn("warc_ts", F.lit("2025-01-01 00:00:00").cast("timestamp")) \
        .withColumn("lang", F.lit("es"))
    build_index(docs, out, n_buckets=4, partitions=2)
    ix = IndexReader(spark, out)
    return ix, Executor(ix)


def test_random_score_deterministic_and_uniform(tiny_ix):
    _, ex = tiny_ix
    q = FunctionScore(query=MatchAll(),
                      functions=[RandomScore(seed=42)],
                      boost_mode="replace")
    a = {r["docid"]: r["score"] for r in ex.plan(q).collect()} \
        if hasattr(ex, "plan") else \
        {r["docid"]: r["score"] for r in ex._plan(q, True).collect()}
    b = {r["docid"]: r["score"] for r in ex._plan(q, True).collect()}
    assert a == b                       # stable across runs
    assert all(0.0 <= v < 1.0 for v in a.values())
    assert len(set(a.values())) == len(a)   # distinct per doc
    # different seed -> different values
    q2 = FunctionScore(query=MatchAll(),
                       functions=[RandomScore(seed=43)],
                       boost_mode="replace")
    c = {r["docid"]: r["score"] for r in ex._plan(q2, True).collect()}
    assert c != a


def test_field_masking_span_multi_term_expansion(tiny_ix):
    """mask(light_spanish:'libr') expands to BOTH surface forms libros
    and libro; span_near with 'scan' (unordered, slop 1) must hit docs
    where either form is within one position of 'scan'."""
    _, ex = tiny_ix
    chain = ({"type": "stemmer", "language": "light_spanish"},)
    exp = ex._expand_masked(FieldMaskingSpan("text.es", "libr", chain))
    assert exp == ["libro", "libros"]
    q = SpanNear("text",
                 (FieldMaskingSpan("text.es", "libr", chain), "scan"),
                 slop=1, in_order=False)
    hits = {r["docid"] for r in ex._plan(q, True).collect()}
    docs = {r["url"]: r["docid"] for r in ex.ix.docs.collect()}
    # u1: libros ... scan (gap 1, within slop); u2: libro ... scan (gap 1);
    # u3: scan libros (adjacent). u4 has neither.
    assert hits == {docs["u1"], docs["u2"], docs["u3"]}


def test_field_masking_span_empty_expansion(tiny_ix):
    _, ex = tiny_ix
    chain = ({"type": "stemmer", "language": "light_spanish"},)
    q = SpanNear("text",
                 (FieldMaskingSpan("text.es", "zzz", chain), "scan"),
                 slop=1, in_order=False)
    assert ex._plan(q, True).count() == 0


def test_field_masking_span_dsl(tiny_ix):
    from sparksearch.dsl import from_dsl
    q = from_dsl({"span_near": {
        "clauses": [
            {"field_masking_span": {
                "query": {"span_term": {"text.es": "libr"}},
                "field": "text",
                "filters": [{"type": "stemmer",
                             "language": "light_spanish"}]}},
            {"span_term": {"text": "scan"}},
        ],
        "slop": 1, "in_order": False}})
    assert isinstance(q, SpanNear)
    fm = q.clauses[0]
    assert isinstance(fm, FieldMaskingSpan) and fm.term == "libr"


def test_random_score_dsl(tiny_ix):
    from sparksearch.dsl import from_dsl
    q = from_dsl({"function_score": {
        "query": {"match": {"text": "scan"}},
        "functions": [{"random_score": {"seed": 7}}],
        "boost_mode": "multiply"}})
    assert isinstance(q.functions[0], RandomScore)
    assert q.functions[0].seed == 7


def test_intervals_source_algebra(tiny_ix):
    """all_of(ordered, max_gaps) over any_of/prefix leaves, hand-checked
    against the fixture corpus."""
    from sparksearch.queries import (Intervals, IntervalsAllOf,
                                     IntervalsAnyOf, IntervalsMatch,
                                     IntervalsPrefix)
    _, ex = tiny_ix
    docs = {r["url"]: r["docid"] for r in ex.ix.docs.collect()}

    # u1 "libros grandes scan fast": libros ... scan, one word between ->
    # (e-s+1) - 2 = 2 gaps... (pos0, pos2): span 3, covered 2, gap 1 <= 1
    src = IntervalsAllOf(
        (IntervalsMatch("libros"), IntervalsMatch("scan")),
        max_gaps=1, ordered=True)
    hits = {r["docid"] for r in
            ex._plan(Intervals("text", source=src), True).collect()}
    assert hits == {docs["u1"]}

    # any_of unions: libro OR libros before scan, 1 gap allowed ->
    # u1 (libros _ scan) and u2 (libro _ scan); NOT u3 (scan first)
    src2 = IntervalsAllOf(
        (IntervalsAnyOf((IntervalsMatch("libro"),
                         IntervalsMatch("libros"))),
         IntervalsMatch("scan")),
        max_gaps=1, ordered=True)
    hits2 = {r["docid"] for r in
             ex._plan(Intervals("text", source=src2), True).collect()}
    assert hits2 == {docs["u1"], docs["u2"]}

    # unordered: u3 "scan libros libro luces" now matches (adjacent,
    # reversed order)
    src3 = IntervalsAllOf(
        (IntervalsAnyOf((IntervalsMatch("libro"),
                         IntervalsMatch("libros"))),
         IntervalsMatch("scan")),
        max_gaps=1, ordered=False)
    hits3 = {r["docid"] for r in
             ex._plan(Intervals("text", source=src3), True).collect()}
    assert hits3 == {docs["u1"], docs["u2"], docs["u3"]}

    # prefix leaf: lib* adjacent-after scan -> u3 only
    src4 = IntervalsAllOf(
        (IntervalsMatch("scan"), IntervalsPrefix("lib")),
        max_gaps=0, ordered=True)
    hits4 = {r["docid"] for r in
             ex._plan(Intervals("text", source=src4), True).collect()}
    assert hits4 == {docs["u3"]}
