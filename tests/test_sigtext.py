"""significant_text agg: source re-analysis, analyzer override,
filter_duplicate_text."""

from sparksearch.queries import Match


def _pages(spark):
    from sparksearch.corpus import pages_from_documents
    return pages_from_documents(spark, "/root/testdata/sf0.001")


def test_significant_text_matches_significant_terms_on_standard(
        spark, index_sf0001):
    """With the index analyzer and no dedup, re-analysis must reproduce
    the postings-derived significant_terms exactly (same corpus, same
    tokenization)."""
    from sparksearch.aggs import significant_terms, significant_text
    from sparksearch.exec import Executor
    ex = Executor(index_sf0001)
    a = significant_terms(ex, Match("text", "scan"), size=5,
                          min_doc_count=2).collect()
    b = significant_text(ex, _pages(spark), Match("text", "scan"),
                         size=5, min_doc_count=2).collect()
    assert [(r.term, r.fg, r.bg, r.jlh) for r in a] == \
        [(r.term, r.fg, r.bg, r.jlh) for r in b]


def test_significant_text_filter_duplicate_text(spark, index_sf0001):
    """Exact-duplicate foreground sources are counted once; fg counts
    can only shrink and never grow."""
    from sparksearch.aggs import significant_text
    from sparksearch.exec import Executor
    ex = Executor(index_sf0001)
    raw = {r.term: r.fg for r in significant_text(
        ex, _pages(spark), Match("text", "scan"), size=50,
        min_doc_count=1).collect()}
    dd = {r.term: r.fg for r in significant_text(
        ex, _pages(spark), Match("text", "scan"), size=50,
        min_doc_count=1, filter_duplicate_text=True).collect()}
    assert dd  # still produces terms
    for t, n in dd.items():
        assert n <= raw.get(t, 0)


def test_significant_text_analyzer_override_and_sample(spark,
                                                       index_sf0001):
    """english analyzer override stems the re-analyzed terms; sampling
    caps the foreground at the top-N scored hits."""
    from sparksearch.aggs import significant_text
    from sparksearch.exec import Executor
    ex = Executor(index_sf0001)
    r = significant_text(ex, _pages(spark), Match("text", "scan"),
                         size=20, min_doc_count=1, analyzer="english",
                         sample_size=5).collect()
    # fg can never exceed the 5-doc sample
    assert r and all(x.fg <= 5 for x in r)
    # english analyzer drops stopwords: none may appear as a bucket
    assert all(x.term not in ("the", "a", "of") for x in r)
