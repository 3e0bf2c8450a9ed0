"""Driver-contract entries, round-2e surface: the `common` terms query and
`distance_feature` as a composable DSL operator (not just a column-expr
pattern).

Reference cites: sv/index/query/CommonTermsQueryBuilder.java (df split at
cutoff_frequency, low/high-frequency operator semantics — deprecated alias
of match but still registered in SearchModule),
sv/index/query/DistanceFeatureQueryBuilder.java (boost·pivot/(pivot+dist)
decay, pivot duration strings for date fields).

Both entries deliberately enter through the JSON DSL (`from_dsl`) so the
parse → AST → plan path is what the oracle gates, and both oracles recompute
the semantics independently: the common-terms oracle derives the low/high
split from document frequencies *in SQL* (no split hard-coded), so the gate
fails if the engine's cutoff arithmetic drifts.
"""

from __future__ import annotations

from sparksearch import contract as C
from sparksearch.contract_misc import _ORIGIN

_idf, _tfn = C._idf_sql, C._tfn_sql

_CT_TEXT = "dup join the"          # dup is rare; join/the are in ~80% of docs
_CT_CUTOFF = 0.5                   # fraction of N — splits dup | join,the


def q_common_terms(spark, sf_dir):
    """`common` query through the DSL: low-df terms select (OR) and score,
    high-df terms only add score to already-selected docs
    (CommonTermsQueryBuilder / Lucene CommonTermsQuery rewrite)."""
    from sparksearch.dsl import from_dsl
    _, ex = C.get_engine(spark, sf_dir)
    q = from_dsl({"common": {"text": {
        "query": _CT_TEXT, "cutoff_frequency": _CT_CUTOFF}}})
    return C.topk_rounded(ex, q, k=10)


def q_distance_feature_dsl(spark, sf_dir):
    """distance_feature as a bool should-clause via the DSL: BM25(must) +
    boost·pivot/(pivot+|warc_ts−origin|) decay, pivot given as the duration
    string '100s' (DistanceFeatureQueryBuilder date-field parsing)."""
    from sparksearch.dsl import from_dsl
    _, ex = C.get_engine(spark, sf_dir)
    q = from_dsl({"bool": {
        "must": [{"match": {"text": "join"}}],
        "should": [{"distance_feature": {
            "field": "warc_ts", "origin": _ORIGIN,
            "pivot": "100s", "boost": 2.0}}]}})
    return C.topk_rounded(ex, q, k=10)


def sqls() -> dict[str, str]:
    P, TOK, DL = C._PAGES, C._TOK, C._DL
    qt_vals = ", ".join(f"('{t}')" for t in _CT_TEXT.split())
    return {
        "query_common_terms": f"""
WITH {P}, {TOK}, {DL},
qt(term) AS ( VALUES {qt_vals} ),
tf AS ( SELECT t.docid, t.term, count(*) AS tf
        FROM tok t JOIN qt USING (term) GROUP BY t.docid, t.term ),
dft AS ( SELECT term, count(*) AS df FROM tf GROUP BY term ),
cls AS ( SELECT dft.term, dft.df,
                dft.df <= {_CT_CUTOFF} * g.n AS is_low
         FROM dft CROSS JOIN g ),
sc AS ( SELECT tf.docid, cls.is_low,
               {_idf('cls.df', 'g.n')} *
               {_tfn('tf.tf', 'dlq.dl_q', 'g.avgdl')} AS score
        FROM tf JOIN cls USING (term) JOIN dlq USING (docid) CROSS JOIN g ),
lowdocs AS ( SELECT DISTINCT docid FROM sc WHERE is_low )
SELECT p.docid, p.url, round(sum(sc.score), 4) AS score
FROM sc JOIN lowdocs USING (docid) JOIN pages p USING (docid)
GROUP BY p.docid, p.url
ORDER BY round(sum(sc.score), 4) DESC, p.docid ASC
LIMIT 10
""".strip(),
        "query_distance_feature_dsl": f"""
WITH {P}, {TOK}, {DL},
tf AS ( SELECT docid, count(*) AS tf FROM tok WHERE term = 'join'
        GROUP BY docid ),
dft AS ( SELECT count(*) AS df FROM tf ),
sc AS ( SELECT tf.docid,
               {_idf('dft.df', 'g.n')} *
               {_tfn('tf.tf', 'dlq.dl_q', 'g.avgdl')} AS score
        FROM tf CROSS JOIN dft JOIN dlq USING (docid) CROSS JOIN g )
SELECT p.docid, p.url,
       round(sc.score + 2.0 * 100.0 /
             (100.0 + abs(epoch(p.warc_ts)
                          - epoch(TIMESTAMP '{_ORIGIN}'))), 4) AS score
FROM sc JOIN pages p USING (docid)
ORDER BY round(sc.score + 2.0 * 100.0 /
               (100.0 + abs(epoch(p.warc_ts)
                            - epoch(TIMESTAMP '{_ORIGIN}'))), 4) DESC,
         p.docid ASC
LIMIT 10
""".strip(),
    }


def oracle_sql() -> dict:
    return sqls()


def queries() -> dict:
    return {
        "query_common_terms": q_common_terms,
        "query_distance_feature_dsl": q_distance_feature_dsl,
    }
