"""Round-3 contract entries: the last reference-registry leaves that fit
this corpus — function_score random_score and field_masking_span.

- ``random_score``: seeded deterministic per-doc value in [0,1)
  (RandomScoreFunctionBuilder). The engine derives it from md5 so the
  oracle recomputes it with DuckDB's OWN md5 + hex cast — bit-identical
  across engines with zero shared code.
- ``field_masking_span``: a light_spanish-stemmed sub-field term inside a
  span_near on the base field (FieldMaskingSpanQueryBuilder,
  SearchModule.java:1140-1156). The oracle derives the expansion set in
  SQL from the same stem CTE used by the stem_spanish gate — the masked
  clause matches any surface form whose stem equals the query stem.
"""

from __future__ import annotations

from sparksearch import contract as C

_SEED = 7

#: sub-field filter chain for the masked clause (defines "text.es")
_ES_CHAIN = ({"type": "stemmer", "language": "light_spanish"},)


def q_random_score(spark, sf_dir):
    """function_score random_score × BM25 (boost_mode=multiply): a
    seeded reshuffle of the match ranking, stable across runs and
    engines."""
    from sparksearch.queries import FunctionScore, Match, RandomScore
    _, ex = C.get_engine(spark, sf_dir)
    q = FunctionScore(query=Match("text", "join"),
                      functions=[RandomScore(seed=_SEED)],
                      boost_mode="multiply")
    return C.topk_rounded(ex, q, k=10)


def _sql_random_score() -> str:
    idf, tfn = C._idf_sql, C._tfn_sql
    rnd = (f"(('0x' || substr(md5(CAST(sc.docid AS VARCHAR) || ':{_SEED}'), "
           f"1, 8))::UBIGINT / 4294967296.0)")
    return f"""
WITH {C._PAGES},
{C._TOK},
{C._DL},
tf AS ( SELECT docid, count(*) AS tf FROM tok
        WHERE term = 'join' GROUP BY docid ),
dft AS ( SELECT count(*) AS df FROM tf ),
sc AS ( SELECT tf.docid,
               {idf('dft.df', 'g.n')} *
               {tfn('tf.tf', 'dlq.dl_q', 'g.avgdl')} AS score
        FROM tf CROSS JOIN dft JOIN dlq USING (docid) CROSS JOIN g )
SELECT p.docid, p.url, round(sc.score * {rnd}, 4) AS score
FROM sc JOIN pages p USING (docid)
ORDER BY round(sc.score * {rnd}, 4) DESC, p.docid ASC LIMIT 10
""".strip()


def q_field_masking_span(spark, sf_dir):
    """span_near(mask(text.es:'tabl'), 'scan') slop=1 ordered: the
    masked clause expands to base terms stemming to 'tabl' under
    light_spanish ('table' in this corpus), then joins positions with
    'scan' exactly like a plain span_near."""
    from sparksearch.queries import FieldMaskingSpan, SpanNear
    _, ex = C.get_engine(spark, sf_dir)
    q = SpanNear("text",
                 (FieldMaskingSpan("text.es", "tabl", filters=_ES_CHAIN),
                  "scan"),
                 slop=1, in_order=True)
    return C.topk_rounded(ex, q, k=10)


def _sql_field_masking_span() -> str:
    # the light_spanish stem mirror over the base dictionary (same
    # hand-written CTE as the stem_spanish oracle), selecting the
    # expansion of 'tabl'; then the standard ordered span_near SQL with
    # pseudo-idf summed over the expansion members
    idf, tfn = C._idf_sql, C._tfn_sql
    from sparksearch.contract_round3b import _es_stem_ctes
    exp_idf = "(SELECT v FROM expidf)"
    scan_idf = (f"(SELECT {idf('count(*)', '(SELECT n FROM g)')} FROM ("
                f"SELECT DISTINCT docid FROM tokpos WHERE term = 'scan'))")
    return f"""
WITH {C._PAGES},
{C._TOKPOS},
tok AS ( SELECT docid, term FROM tokpos ),
{C._DL},
dict0 AS ( SELECT DISTINCT term FROM tok ),
{_es_stem_ctes()},
exp AS ( SELECT term FROM stemmap WHERE stem = 'tabl' ),
expdf AS ( SELECT e.term, count(DISTINCT t.docid) AS df
           FROM exp e JOIN tokpos t USING (term) GROUP BY e.term ),
expidf AS ( SELECT sum({idf('df', '(SELECT n FROM g)')}) AS v
            FROM expdf ),
p0 AS ( SELECT t.docid, t.pos FROM tokpos t JOIN exp USING (term) ),
p1 AS ( SELECT docid, pos FROM tokpos WHERE term = 'scan' ),
mm AS ( SELECT p0.docid, p0.pos FROM p0
        JOIN p1 ON p1.docid = p0.docid AND p1.pos > p0.pos
        AND (p1.pos - p0.pos - 1) <= 1 ),
ph AS ( SELECT docid, CAST(count(DISTINCT pos) AS DOUBLE) AS pf
        FROM mm GROUP BY docid ),
sc AS ( SELECT ph.docid,
               ({exp_idf} + {scan_idf}) *
               {tfn('ph.pf', 'dlq.dl_q', 'g.avgdl')} AS score
        FROM ph JOIN dlq USING (docid) CROSS JOIN g )
SELECT p.docid, p.url, round(sc.score, 4) AS score
FROM sc JOIN pages p USING (docid)
ORDER BY round(sc.score, 4) DESC, p.docid ASC LIMIT 10
""".strip()


_MLT_IDS = (0,)
_MLT_MIN_TF = 2


def q_mlt_like_docs(spark, sf_dir):
    """more_like_this doc-reference form: like=[{"_id": 0}] — doc 0's
    source text is re-analyzed, terms with tf >= 2 ranked by tf·idf, the
    top 25 run as an OR match with msm '30%', and doc 0 itself excluded
    (include=false, the reference default —
    MoreLikeThisQueryBuilder.java)."""
    from sparksearch.corpus import pages_from_documents
    from sparksearch.exec import Executor
    from sparksearch.queries import MoreLikeThis
    ix, _ = C.get_engine(spark, sf_dir)
    ex = Executor(ix, source_pages=pages_from_documents(spark, sf_dir))
    q = MoreLikeThis("text", like_ids=_MLT_IDS, min_term_freq=_MLT_MIN_TF)
    return C.topk_rounded(ex, q, k=10)


def _sql_mlt_like_docs() -> str:
    idf, tfn = C._idf_sql, C._tfn_sql
    ids_in = ", ".join(str(i) for i in _MLT_IDS)
    return f"""
WITH {C._PAGES},
{C._TOK},
{C._DL},
ltf AS ( SELECT term, count(*) AS tf FROM tok WHERE docid IN ({ids_in})
         GROUP BY term HAVING count(*) >= {_MLT_MIN_TF} ),
gdf AS ( SELECT term, count(DISTINCT docid) AS df FROM tok GROUP BY term ),
ranked AS ( SELECT l.term,
                   row_number() OVER (
                     ORDER BY l.tf * {idf('gd.df', 'g.n')} DESC,
                              l.term ASC) AS rn
            FROM ltf l JOIN gdf gd USING (term) CROSS JOIN g ),
sel AS ( SELECT term FROM ranked WHERE rn <= 25 ),
msm AS ( SELECT CAST(floor(count(*) * 30.0 / 100.0) AS BIGINT) AS v
         FROM sel ),
tf AS ( SELECT docid, term, count(*) AS tf FROM tok
        WHERE term IN ( SELECT term FROM sel ) GROUP BY docid, term ),
dft AS ( SELECT term, count(*) AS df FROM tf GROUP BY term ),
sc AS ( SELECT tf.docid,
               sum({idf('dft.df', 'g.n')} *
                   {tfn('tf.tf', 'dlq.dl_q', 'g.avgdl')}) AS score,
               count(*) AS nm
        FROM tf JOIN dft USING (term) JOIN dlq USING (docid) CROSS JOIN g
        GROUP BY tf.docid )
SELECT p.docid, p.url, round(sc.score, 4) AS score
FROM sc JOIN pages p USING (docid)
WHERE sc.nm >= (SELECT v FROM msm) AND sc.docid NOT IN ({ids_in})
ORDER BY round(sc.score, 4) DESC, p.docid ASC LIMIT 10
""".strip()


def queries() -> dict:
    return {
        "random_score": q_random_score,
        "field_masking_span": q_field_masking_span,
        "mlt_like_docs": q_mlt_like_docs,
    }


def oracle_sql() -> dict:
    return {
        "random_score": _sql_random_score(),
        "field_masking_span": _sql_field_masking_span(),
        "mlt_like_docs": _sql_mlt_like_docs(),
    }
