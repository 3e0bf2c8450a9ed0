"""Driver-contract entries for the extended query DSL (SURVEY.md §2.2):
multi-term dictionary queries, score combinators, multi_match,
query_string, more_like_this, suggest, highlight — each with a DuckDB twin.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from sparksearch import contract as C
from sparksearch.queries import (
    Bool, Boosting, ConstantScore, DisMax, Fuzzy, Match, MoreLikeThis,
    MultiMatch, Regexp, Term, TextPrefix, Wildcard,
)

_MLT_TEXT = "hash join table scan merge sort fast"


def _ex(spark, sf_dir):
    return C.get_engine(spark, sf_dir)[1]


def _topk(spark, sf_dir, q, k=10):
    return C.topk_rounded(_ex(spark, sf_dir), q, k=k)


# ---------------------------------------------------------------------------
# Spark sides
# ---------------------------------------------------------------------------

def q_wildcard(spark, sf_dir):
    return _topk(spark, sf_dir, Wildcard("text", "jo*"), k=15)


def q_regexp(spark, sf_dir):
    return _topk(spark, sf_dir, Regexp("text", "s[cl].."), k=15)


def q_fuzzy(spark, sf_dir):
    return _topk(spark, sf_dir, Fuzzy("text", "joib", 1), k=15)


def q_text_prefix(spark, sf_dir):
    return _topk(spark, sf_dir, TextPrefix("text", "s"), k=15)


def q_dismax(spark, sf_dir):
    return _topk(spark, sf_dir,
                 DisMax([Match("text", "join"), Match("text", "fast")],
                        tie_breaker=0.3))


def q_constant_score(spark, sf_dir):
    return _topk(spark, sf_dir,
                 Bool(should=[Match("text", "join"),
                              ConstantScore(Term("lang", "en"), 0.42)]))


def q_boosting(spark, sf_dir):
    return _topk(spark, sf_dir,
                 Boosting(positive=Match("text", "join"),
                          negative=Match("text", "slow"),
                          negative_boost=0.5))


def q_multimatch(spark, sf_dir):
    return _topk(spark, sf_dir,
                 MultiMatch(fields=["text", "lang"], text="de",
                            type="most_fields"))


def q_query_string(spark, sf_dir):
    from sparksearch.qs_parser import parse_query_string
    q = parse_query_string("+hash join -error")
    return _topk(spark, sf_dir, q)


def q_query_string_grouped(spark, sf_dir):
    from sparksearch.qs_parser import parse_query_string
    q = parse_query_string('(hash AND join) OR "table scan"')
    return _topk(spark, sf_dir, q)


def q_mlt(spark, sf_dir):
    return _topk(spark, sf_dir,
                 MoreLikeThis("text", _MLT_TEXT, max_query_terms=4,
                              minimum_should_match=2))


def q_suggest(spark, sf_dir):
    from sparksearch.fetchops import suggest_terms
    ix = C.get_engine(spark, sf_dir)[0]
    return suggest_terms(ix, "joni hask", max_edits=2, size=3)


def q_highlight(spark, sf_dir):
    from sparksearch.fetchops import highlight
    ex = _ex(spark, sf_dir)
    topk = C.topk_rounded(ex, Match("text", "join"), k=3)
    pages = C.pages_df(spark, sf_dir)
    return highlight(topk, pages, ["join"])


# ---------------------------------------------------------------------------
# oracle SQL twins
# ---------------------------------------------------------------------------

def _const_score_sql(term_cond: str, k: int) -> str:
    P, TOK = C._PAGES, C._TOK
    return f"""
WITH {P}, {TOK},
m AS ( SELECT DISTINCT docid FROM tok WHERE {term_cond} )
SELECT p.docid, p.url, CAST(1.0 AS DOUBLE) AS score
FROM pages p JOIN m USING (docid)
ORDER BY p.docid ASC LIMIT {k}
""".strip()


def _sc_term(name: str, term: str) -> str:
    """CTE pair scoring a single term: {name}(docid, score)."""
    idf, tfn = C._idf_sql, C._tfn_sql
    return f"""
tf_{name} AS ( SELECT docid, count(*) AS tf FROM tok WHERE term = '{term}'
               GROUP BY docid ),
df_{name} AS ( SELECT count(*) AS df FROM tf_{name} ),
{name} AS ( SELECT t.docid,
            {idf(f'd.df', 'g.n')} * {tfn('t.tf', 'dlq.dl_q', 'g.avgdl')}
            AS score
            FROM tf_{name} t CROSS JOIN df_{name} d
            JOIN dlq USING (docid) CROSS JOIN g )
""".strip()


def sqls() -> dict[str, str]:
    P, TOK, TOKPOS, DL = C._PAGES, C._TOK, C._TOKPOS, C._DL
    idf, tfn = C._idf_sql, C._tfn_sql

    out = {
        "query_wildcard": _const_score_sql("term LIKE 'jo%'", 15),
        "query_regexp": _const_score_sql(
            "regexp_full_match(term, 's[cl]..')", 15),
        # engine default transpositions=true: DL via DuckDB's independent
        # damerau_levenshtein (the df-ranked max_expansions=50 cap cannot
        # bind on this corpus's expansion set)
        "query_fuzzy": _const_score_sql(
            "damerau_levenshtein(term, 'joib') <= 1", 15),
        "query_text_prefix": _const_score_sql("term LIKE 's%'", 15),
    }

    out["query_dismax"] = f"""
WITH {P}, {TOK}, {DL},
{_sc_term('sj', 'join')},
{_sc_term('sf', 'fast')},
u AS ( SELECT docid, score FROM sj UNION ALL SELECT docid, score FROM sf ),
agg AS ( SELECT docid, max(score) AS mx, sum(score) AS sm
         FROM u GROUP BY docid )
SELECT p.docid, p.url, round(agg.mx + 0.3 * (agg.sm - agg.mx), 4) AS score
FROM agg JOIN pages p USING (docid)
ORDER BY round(agg.mx + 0.3 * (agg.sm - agg.mx), 4) DESC, p.docid ASC
LIMIT 10
""".strip()

    out["query_constant_score"] = f"""
WITH {P}, {TOK}, {DL},
{_sc_term('sj', 'join')},
cs AS ( SELECT docid, 0.42 AS score FROM pages WHERE lang = 'en' ),
u AS ( SELECT docid, score FROM sj UNION ALL SELECT docid, score FROM cs ),
agg AS ( SELECT docid, sum(score) AS score FROM u GROUP BY docid )
SELECT p.docid, p.url, round(agg.score, 4) AS score
FROM agg JOIN pages p USING (docid)
ORDER BY round(agg.score, 4) DESC, p.docid ASC LIMIT 10
""".strip()

    out["query_boosting"] = f"""
WITH {P}, {TOK}, {DL},
{_sc_term('sj', 'join')},
neg AS ( SELECT DISTINCT docid FROM tok WHERE term = 'slow' )
SELECT p.docid, p.url,
       round(CASE WHEN n.docid IS NOT NULL THEN sj.score * 0.5
             ELSE sj.score END, 4) AS score
FROM sj LEFT JOIN neg n USING (docid) JOIN pages p USING (docid)
ORDER BY round(CASE WHEN n.docid IS NOT NULL THEN sj.score * 0.5
               ELSE sj.score END, 4) DESC, p.docid ASC LIMIT 10
""".strip()

    # multimatch most_fields "de": text leg empty ('de' not a corpus term
    # at these SFs — enforced by df lookup in both engines), lang leg 1.0
    out["query_multimatch"] = f"""
WITH {P}, {TOK}, {DL},
{_sc_term('tleg', 'de')},
kleg AS ( SELECT docid, 1.0 AS score FROM pages WHERE lang = 'de' ),
u AS ( SELECT docid, score FROM tleg UNION ALL
       SELECT docid, score FROM kleg ),
agg AS ( SELECT docid, sum(score) AS score FROM u GROUP BY docid )
SELECT p.docid, p.url, round(agg.score, 4) AS score
FROM agg JOIN pages p USING (docid)
ORDER BY round(agg.score, 4) DESC, p.docid ASC LIMIT 10
""".strip()

    # +hash join -error → must hash (scored), should join, must_not error
    out["query_string_mods"] = f"""
WITH {P}, {TOK}, {DL},
{_sc_term('sh', 'hash')},
{_sc_term('sj', 'join')},
bad AS ( SELECT DISTINCT docid FROM tok WHERE term = 'error' )
SELECT p.docid, p.url,
       round(sh.score + coalesce(sj.score, 0), 4) AS score
FROM sh LEFT JOIN sj USING (docid) JOIN pages p USING (docid)
WHERE p.docid NOT IN ( SELECT docid FROM bad )
ORDER BY round(sh.score + coalesce(sj.score, 0), 4) DESC, p.docid ASC
LIMIT 10
""".strip()

    # (hash AND join) OR "table scan"
    out["query_string_grouped"] = f"""
WITH {P}, {TOKPOS},
tok AS ( SELECT docid, term FROM tokpos ),
{DL},
{_sc_term('sh', 'hash')},
{_sc_term('sj', 'join')},
b1 AS ( SELECT sh.docid, sh.score + sj.score AS score
        FROM sh JOIN sj USING (docid) ),
p0 AS ( SELECT docid, pos FROM tokpos WHERE term = 'table' ),
p1 AS ( SELECT docid, pos FROM tokpos WHERE term = 'scan' ),
ph AS ( SELECT p0.docid, count(*) AS pf
        FROM p0 JOIN p1 ON p1.docid = p0.docid AND p1.pos = p0.pos + 1
        GROUP BY p0.docid ),
phidf AS ( SELECT
  (SELECT {idf('count(*)', '(SELECT n FROM g)')} FROM
     (SELECT DISTINCT docid FROM tokpos WHERE term = 'table'))
  + (SELECT {idf('count(*)', '(SELECT n FROM g)')} FROM
     (SELECT DISTINCT docid FROM tokpos WHERE term = 'scan')) AS s ),
b2 AS ( SELECT ph.docid,
               phidf.s * {tfn('ph.pf', 'dlq.dl_q', 'g.avgdl')} AS score
        FROM ph JOIN dlq USING (docid) CROSS JOIN g CROSS JOIN phidf ),
u AS ( SELECT docid, score FROM b1 UNION ALL SELECT docid, score FROM b2 ),
agg AS ( SELECT docid, sum(score) AS score FROM u GROUP BY docid )
SELECT p.docid, p.url, round(agg.score, 4) AS score
FROM agg JOIN pages p USING (docid)
ORDER BY round(agg.score, 4) DESC, p.docid ASC LIMIT 10
""".strip()

    # more_like_this: rank like-text terms by df asc (≡ tf·idf desc for
    # distinct terms), keep 4, OR-match with msm 2
    mlt_terms = ", ".join(f"'{t}'" for t in sorted(set(_MLT_TEXT.split())))
    out["query_mlt"] = f"""
WITH {P}, {TOK}, {DL},
cand AS ( SELECT term, count(DISTINCT docid) AS df FROM tok
          WHERE term IN ({mlt_terms}) GROUP BY term ),
sel AS ( SELECT term FROM cand ORDER BY df ASC, term ASC LIMIT 4 ),
tf AS ( SELECT docid, term, count(*) AS tf FROM tok
        WHERE term IN ( SELECT term FROM sel ) GROUP BY docid, term ),
dft AS ( SELECT term, count(*) AS df FROM tf GROUP BY term ),
sc AS ( SELECT tf.docid,
               sum({idf('dft.df', 'g.n')} *
                   {tfn('tf.tf', 'dlq.dl_q', 'g.avgdl')}) AS score,
               count(DISTINCT tf.term) AS nm
        FROM tf JOIN dft USING (term) JOIN dlq USING (docid) CROSS JOIN g
        GROUP BY tf.docid )
SELECT p.docid, p.url, round(sc.score, 4) AS score
FROM sc JOIN pages p USING (docid)
WHERE sc.nm >= 2
ORDER BY round(sc.score, 4) DESC, p.docid ASC LIMIT 10
""".strip()

    out["query_suggest"] = f"""
WITH {P}, {TOK},
dict AS ( SELECT term, CAST(count(DISTINCT docid) AS BIGINT) AS df
          FROM tok GROUP BY term ),
inputs AS ( SELECT unnest(['hask', 'joni']) AS input ),
cand AS ( SELECT i.input, d.term, levenshtein(i.input, d.term) AS dist, d.df
          FROM inputs i CROSS JOIN dict d
          WHERE levenshtein(i.input, d.term) BETWEEN 1 AND 2
            AND substr(d.term, 1, 1) = substr(i.input, 1, 1)
            AND i.input NOT IN ( SELECT term FROM dict ) ),
ranked AS ( SELECT input, term, CAST(dist AS INT) AS dist, df,
            CAST(row_number() OVER (PARTITION BY input
                 ORDER BY dist ASC, df DESC, term ASC) AS INT) AS rank
            FROM cand )
SELECT input, term, dist, df, rank FROM ranked
WHERE rank <= 3 ORDER BY input, rank
""".strip()

    hl = C.match_sql("join", k=3)
    out["query_highlight"] = f"""
WITH topk AS ( {hl} ),
{C._PAGES.replace('pages AS', 'pages2 AS')}
SELECT t.docid, t.url, t.score,
       regexp_replace(p.text, '\\b(join)\\b', '<em>\\1</em>', 'g')
         AS highlight
FROM topk t JOIN pages2 p ON p.url = t.url
ORDER BY t.score DESC, t.docid ASC
""".strip()
    return out


def queries() -> dict:
    return {
        "query_wildcard": q_wildcard,
        "query_regexp": q_regexp,
        "query_fuzzy": q_fuzzy,
        "query_text_prefix": q_text_prefix,
        "query_dismax": q_dismax,
        "query_constant_score": q_constant_score,
        "query_boosting": q_boosting,
        "query_multimatch": q_multimatch,
        "query_string_mods": q_query_string,
        "query_string_grouped": q_query_string_grouped,
        "query_mlt": q_mlt,
        "query_suggest": q_suggest,
        "query_highlight": q_highlight,
    }


def oracle_sql() -> dict:
    return sqls()
