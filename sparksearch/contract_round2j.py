"""Driver-contract entries, round-2j surface: the `_search` request-body
API — one JSON body driving query DSL + sort + from/size + _source +
aggs, the top-level surface of the reference
(sv/rest/action/search/RestSearchAction.java →
sv/search/builder/SearchSourceBuilder.java).

Each entry feeds a literal body dict to sparksearch.api and the oracle
recomputes the full pipeline in SQL, so the body→plan translation itself
is what's gated (field sort with pagination, relevance sort with offset,
terms-bucket aggs with sub-metrics).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from sparksearch import contract as C

_idf, _tfn = C._idf_sql, C._tfn_sql


def q_api_relevance_page(spark, sf_dir):
    """Relevance-sorted page 2: query + from/size + min_score through the
    body; default sort (_score desc, _doc asc)."""
    from sparksearch.api import search_df
    _, ex = C.get_engine(spark, sf_dir)
    body = {"query": {"match": {"text": "hash join"}},
            "from": 5, "size": 10, "min_score": 0.1,
            "_source": False}
    return search_df(ex, body).select("docid", "url", "score")


def q_api_field_sort(spark, sf_dir):
    """Field sort + source filtering: term filter, dl desc, lang/dl
    returned via _source includes."""
    from sparksearch.api import search_df
    _, ex = C.get_engine(spark, sf_dir)
    body = {"query": {"term": {"lang": "en"}},
            "sort": [{"dl": {"order": "desc"}}],
            "size": 15,
            "_source": {"includes": ["lang", "dl"]}}
    out = search_df(ex, body)
    return out.select("docid", "url", "lang",
                      F.col("dl").cast("long").alias("dl"))


def q_api_search_after(spark, sf_dir):
    """Keyset page 2 via body search_after over a field sort."""
    from sparksearch.api import search_df
    _, ex = C.get_engine(spark, sf_dir)
    body1 = {"query": {"match_all": {}},
             "sort": [{"dl": {"order": "desc"}}], "size": 10,
             "_source": {"includes": ["dl"]}}
    page1 = search_df(ex, body1).collect()
    last = page1[-1]
    body2 = dict(body1)
    body2["search_after"] = [int(last["dl"]), int(last["docid"])]
    return (search_df(ex, body2)
            .select("docid", "url", F.col("dl").cast("long").alias("dl")))


def q_api_post_filter(spark, sf_dir):
    """post_filter narrows HITS (not aggs) after scoring — scores must be
    identical to the unfiltered query (SearchSourceBuilder postFilter)."""
    from sparksearch.api import search_df
    _, ex = C.get_engine(spark, sf_dir)
    body = {"query": {"match": {"text": "hash join"}},
            "post_filter": {"term": {"lang": "en"}},
            "size": 10, "_source": False}
    return search_df(ex, body).select("docid", "url", "score")


def q_api_scoped_agg(spark, sf_dir):
    """Body aggs run over the query-matched set in filter context
    (AggregationPhase behind the query), not the whole index."""
    from sparksearch.api import aggs_df
    _, ex = C.get_engine(spark, sf_dir)
    body = {"query": {"match": {"text": "join"}},
            "aggs": {"langs": {"terms": {"field": "lang", "size": 5},
                               "aggs": {"avg_dl": {"avg": {"field": "dl"}}}}}}
    return aggs_df(ex, body)


def q_api_nested_agg(spark, sf_dir):
    """Nested bucket agg: terms(lang) × histogram(dl) drill-down over the
    query-matched set, with a sibling per-outer-bucket avg metric — one
    flat row per (lang, dl-bucket) pair."""
    from sparksearch.api import aggs_df
    _, ex = C.get_engine(spark, sf_dir)
    body = {"query": {"match": {"text": "join"}},
            "aggs": {"langs": {
                "terms": {"field": "lang", "size": 3},
                "aggs": {"dl_h": {"histogram": {"field": "dl",
                                                "interval": 25}},
                         "avg_dl": {"avg": {"field": "dl"}}}}}}
    return aggs_df(ex, body)


def q_api_collapse(spark, sf_dir):
    """Body collapse: one best hit per lang by the relevance sort."""
    from sparksearch.api import search_df
    _, ex = C.get_engine(spark, sf_dir)
    body = {"query": {"match": {"text": "hash join"}},
            "collapse": {"field": "lang"}, "size": 10,
            "_source": {"includes": ["lang"]}}
    return search_df(ex, body).select("docid", "url", "score", "lang")


def q_api_highlight(spark, sf_dir):
    """Body highlight: pre/post tags wrap analyzed query-term occurrences
    in the fetched source text."""
    from sparksearch.api import search_df
    _, ex = C.get_engine(spark, sf_dir)
    pages = C.pages_df(spark, sf_dir)
    body = {"query": {"match": {"text": "join"}}, "size": 3,
            "_source": False,
            "highlight": {"fields": {"text": {}}}}
    return (search_df(ex, body, pages=pages)
            .select("docid", "url", "score", "highlight"))


def q_api_rescore(spark, sf_dir):
    """Body rescore: QueryRescorer over the top-20 primary window,
    total = 1·primary + 2·secondary."""
    from sparksearch.api import search_df
    _, ex = C.get_engine(spark, sf_dir)
    body = {"query": {"match": {"text": "hash join"}},
            "rescore": {"window_size": 20,
                        "query": {"rescore_query":
                                  {"match": {"text": "table"}},
                                  "query_weight": 1.0,
                                  "rescore_query_weight": 2.0}},
            "size": 10, "_source": False}
    return search_df(ex, body).select("docid", "url", "score")


def q_api_terms_agg(spark, sf_dir):
    """Body aggs: terms(lang) buckets with avg(dl) sub-metric."""
    from sparksearch.api import aggs_df
    _, ex = C.get_engine(spark, sf_dir)
    body = {"aggs": {"langs": {"terms": {"field": "lang", "size": 5},
                               "aggs": {"avg_dl": {"avg": {"field": "dl"}}}}}}
    return aggs_df(ex, body)


def sqls() -> dict[str, str]:
    P, TOK, DL = C._PAGES, C._TOK, C._DL
    match2 = f"""
tfa AS ( SELECT docid, count(*) AS tf FROM tok WHERE term = 'hash'
         GROUP BY docid ),
dfa AS ( SELECT count(*) AS df FROM tfa ),
tfb AS ( SELECT docid, count(*) AS tf FROM tok WHERE term = 'join'
         GROUP BY docid ),
dfb AS ( SELECT count(*) AS df FROM tfb ),
sca AS ( SELECT tfa.docid, {_idf('dfa.df', 'g.n')} *
                {_tfn('tfa.tf', 'dlq.dl_q', 'g.avgdl')} AS s
         FROM tfa CROSS JOIN dfa JOIN dlq USING (docid) CROSS JOIN g ),
scb AS ( SELECT tfb.docid, {_idf('dfb.df', 'g.n')} *
                {_tfn('tfb.tf', 'dlq.dl_q', 'g.avgdl')} AS s
         FROM tfb CROSS JOIN dfb JOIN dlq USING (docid) CROSS JOIN g ),
sc AS ( SELECT docid, sum(s) AS raw, round(sum(s), 4) AS score FROM (
          SELECT * FROM sca UNION ALL SELECT * FROM scb )
        GROUP BY docid )""".strip()

    return {
        "api_relevance_page": f"""
WITH {P}, {TOK}, {DL}, {match2}
SELECT p.docid, p.url, sc.score
FROM sc JOIN pages p USING (docid)
WHERE sc.raw >= 0.1
ORDER BY sc.score DESC, p.docid ASC
LIMIT 10 OFFSET 5
""".strip(),
        "api_field_sort": f"""
WITH {P}, {TOK}, {DL}
SELECT p.docid, p.url, p.lang, CAST(dlq.dl AS BIGINT) AS dl
FROM pages p JOIN dlq USING (docid)
WHERE p.lang = 'en'
ORDER BY dlq.dl DESC, p.docid ASC
LIMIT 15
""".strip(),
        "api_search_after": f"""
WITH {P}, {TOK}, {DL},
ordered AS ( SELECT p.docid, p.url, CAST(dlq.dl AS BIGINT) AS dl
             FROM pages p JOIN dlq USING (docid)
             ORDER BY dlq.dl DESC, p.docid ASC
             LIMIT 20 )
SELECT docid, url, dl FROM ordered
ORDER BY dl DESC, docid ASC
LIMIT 10 OFFSET 10
""".strip(),
        "api_post_filter": f"""
WITH {P}, {TOK}, {DL}, {match2}
SELECT p.docid, p.url, sc.score
FROM sc JOIN pages p USING (docid)
WHERE p.lang = 'en'
ORDER BY sc.score DESC, p.docid ASC
LIMIT 10
""".strip(),
        "api_scoped_agg": f"""
WITH {P}, {TOK}, {DL},
m AS ( SELECT DISTINCT docid FROM tok WHERE term = 'join' ),
j AS ( SELECT p.lang, CAST(dlq.dl AS DOUBLE) AS dl
       FROM pages p JOIN m USING (docid) JOIN dlq USING (docid)
       WHERE p.lang IS NOT NULL )
SELECT lang AS key, CAST(count(*) AS BIGINT) AS doc_count,
       CAST(round(avg(dl), 6) AS DOUBLE) AS avg_dl
FROM j GROUP BY lang
ORDER BY doc_count DESC, key ASC
LIMIT 5
""".strip(),
        "api_rescore": f"""
WITH {P}, {TOK}, {DL}, {match2},
tfc AS ( SELECT docid, count(*) AS tf FROM tok WHERE term = 'table'
         GROUP BY docid ),
dfc AS ( SELECT count(*) AS df FROM tfc ),
sc2 AS ( SELECT tfc.docid, {_idf('dfc.df', 'g.n')} *
                {_tfn('tfc.tf', 'dlq.dl_q', 'g.avgdl')} AS s
         FROM tfc CROSS JOIN dfc JOIN dlq USING (docid) CROSS JOIN g ),
prim AS ( SELECT docid, raw FROM sc ORDER BY raw DESC, docid ASC LIMIT 20 )
SELECT p.docid, p.url,
       CAST(round(prim.raw * 1.0 + coalesce(sc2.s, 0) * 2.0, 4)
            AS DOUBLE) AS score
FROM prim LEFT JOIN sc2 USING (docid) JOIN pages p USING (docid)
ORDER BY round(prim.raw * 1.0 + coalesce(sc2.s, 0) * 2.0, 4) DESC,
         p.docid ASC
LIMIT 10
""".strip(),
        "api_collapse": f"""
WITH {P}, {TOK}, {DL}, {match2},
ranked AS (
  SELECT p.docid, p.url, sc.score, p.lang,
         row_number() OVER (PARTITION BY p.lang
                            ORDER BY sc.score DESC, p.docid ASC) AS rn
  FROM sc JOIN pages p USING (docid) )
SELECT docid, url, score, lang FROM ranked
WHERE rn = 1
ORDER BY score DESC, docid ASC
LIMIT 10
""".strip(),
        "api_highlight": f"""
WITH topk AS ( {C.match_sql('join', k=3)} ),
{C._PAGES.replace('pages AS', 'pages2 AS')}
SELECT t.docid, t.url, t.score,
       regexp_replace(p.text, '\\b(join)\\b', '<em>\\1</em>', 'g')
         AS highlight
FROM topk t JOIN pages2 p ON p.url = t.url
ORDER BY t.score DESC, t.docid ASC
""".strip(),
        "api_nested_agg": f"""
WITH {P}, {TOK}, {DL},
m AS ( SELECT DISTINCT docid FROM tok WHERE term = 'join' ),
j AS ( SELECT p.lang, CAST(dlq.dl AS DOUBLE) AS dl
       FROM pages p JOIN m USING (docid) JOIN dlq USING (docid)
       WHERE p.lang IS NOT NULL ),
top3 AS ( SELECT lang FROM j GROUP BY lang
          ORDER BY count(*) DESC, lang ASC LIMIT 3 ),
outer_m AS ( SELECT lang, CAST(round(avg(dl), 6) AS DOUBLE) AS avg_dl
             FROM j JOIN top3 USING (lang) GROUP BY lang )
SELECT j.lang AS key, floor(j.dl / 25) * 25 AS dl_h,
       CAST(count(*) AS BIGINT) AS doc_count, outer_m.avg_dl
FROM j JOIN top3 USING (lang) JOIN outer_m ON outer_m.lang = j.lang
GROUP BY j.lang, floor(j.dl / 25) * 25, outer_m.avg_dl
ORDER BY key, dl_h
""".strip(),
        "api_terms_agg": f"""
WITH {P}, {TOK}, {DL},
j AS ( SELECT p.lang, CAST(dlq.dl AS DOUBLE) AS dl
       FROM pages p JOIN dlq USING (docid) WHERE p.lang IS NOT NULL )
SELECT lang AS key, CAST(count(*) AS BIGINT) AS doc_count,
       CAST(round(avg(dl), 6) AS DOUBLE) AS avg_dl
FROM j GROUP BY lang
ORDER BY doc_count DESC, key ASC
LIMIT 5
""".strip(),
    }


def oracle_sql() -> dict:
    return sqls()


def queries() -> dict:
    return {
        "api_relevance_page": q_api_relevance_page,
        "api_field_sort": q_api_field_sort,
        "api_search_after": q_api_search_after,
        "api_terms_agg": q_api_terms_agg,
        "api_post_filter": q_api_post_filter,
        "api_scoped_agg": q_api_scoped_agg,
        "api_nested_agg": q_api_nested_agg,
        "api_collapse": q_api_collapse,
        "api_highlight": q_api_highlight,
        "api_rescore": q_api_rescore,
    }
