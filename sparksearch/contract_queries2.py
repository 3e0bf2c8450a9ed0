"""Driver-contract entries for the round-2 query DSL surface:
match fuzziness, match_phrase_prefix, span_near / intervals, date-math
ranges, and the function_score operator — each with a DuckDB SQL twin
(reference: sv/index/search/MatchQuery.java:291-342, MultiPhraseQuery
path, sv/search/SearchModule.java:1140-1156 span registrations,
sv/index/query/RangeQueryBuilder.java:444,
sv/index/query/functionscore/FunctionScoreQueryBuilder.java:72).
"""

from __future__ import annotations

import math
from datetime import datetime

from pyspark.sql import functions as F

from sparksearch import contract as C
from sparksearch.analysis import analyze
from sparksearch.exec import Executor
from sparksearch.queries import (
    Bool, DecayFunction, FieldValueFactor, FunctionScore, Intervals, Match,
    MatchPhrasePrefix, MultiMatch, Range, SpanNear, WeightFunction,
)

#: frozen `now` for the date-math entries (both engines see the same value)
_NOW = datetime(2025, 1, 1, 0, 7, 30)

_FUZZY_TEXT = "joind tabel"
_GAUSS = DecayFunction("gauss", "warc_ts", "2025-01-01 00:04:00",
                       scale=120.0, offset=30.0, decay=0.5)


def _topk(spark, sf_dir, q, k=10):
    return C.topk_rounded(C.get_engine(spark, sf_dir)[1], q, k=k)


# ---------------------------------------------------------------------------
# Spark sides
# ---------------------------------------------------------------------------

def q_match_fuzzy(spark, sf_dir):
    return _topk(spark, sf_dir,
                 Match("text", _FUZZY_TEXT, fuzziness="AUTO"))


def q_match_fuzzy_and(spark, sf_dir):
    return _topk(spark, sf_dir,
                 Match("text", _FUZZY_TEXT, operator="and",
                       fuzziness="AUTO"))


def q_phrase_prefix(spark, sf_dir):
    return _topk(spark, sf_dir, MatchPhrasePrefix("text", "hash jo"))


def q_span_near_ordered(spark, sf_dir):
    return _topk(spark, sf_dir,
                 SpanNear("text", ("hash", "join"), slop=2, in_order=True))


def q_span_near_unordered(spark, sf_dir):
    return _topk(spark, sf_dir,
                 SpanNear("text", ("join", "hash"), slop=3, in_order=False))


def q_intervals(spark, sf_dir):
    return _topk(spark, sf_dir,
                 Intervals("text", "table scan fast", max_gaps=4,
                           ordered=True))


def q_range_date_math(spark, sf_dir):
    """Range with date-math bounds against a frozen now: docs in
    [now-6m/m, now) — resolution happens in the engine, the oracle uses
    independently hand-computed literal timestamps."""
    ix, _ = C.get_engine(spark, sf_dir)
    ex = Executor(ix, fixed_now=_NOW)
    q = Bool(must=[Match("text", "join")],
             filter=[Range("warc_ts", gte="now-6m/m", lt="now")])
    return C.topk_rounded(ex, q, k=10)


def q_multimatch_cross(spark, sf_dir):
    return _topk(spark, sf_dir,
                 MultiMatch(fields=["text", "lang"], text="en join",
                            type="cross_fields"))


def q_multimatch_phrase(spark, sf_dir):
    return _topk(spark, sf_dir,
                 MultiMatch(fields=["text", "lang"], text="hash join",
                            type="phrase"))


def q_suggest_phrase(spark, sf_dir):
    from sparksearch.fetchops import suggest_phrase
    ix, _ = C.get_engine(spark, sf_dir)
    return suggest_phrase(ix, "joni hask", per_token=3, max_edits=2, size=3)


def q_suggest_completion(spark, sf_dir):
    from sparksearch.fetchops import suggest_completion
    ix, _ = C.get_engine(spark, sf_dir)
    return suggest_completion(ix, "s", size=5)


def q_function_score_fvf(spark, sf_dir):
    q = FunctionScore(
        query=Match("text", "join"),
        functions=[FieldValueFactor("dl", factor=0.1, modifier="ln1p"),
                   WeightFunction(1.2)],
        score_mode="multiply", boost_mode="multiply")
    return _topk(spark, sf_dir, q)


def q_function_score_decay(spark, sf_dir):
    q = FunctionScore(query=Match("text", "join"), functions=[_GAUSS],
                      score_mode="multiply", boost_mode="multiply")
    return _topk(spark, sf_dir, q)


# ---------------------------------------------------------------------------
# oracle SQL twins
# ---------------------------------------------------------------------------

def _fuzzy_sql(operator: str) -> str:
    P, TOK, DL = C._PAGES, C._TOK, C._DL
    idf, tfn = C._idf_sql, C._tfn_sql
    terms = [t for t, _ in analyze(_FUZZY_TEXT, "standard")]
    vals = ", ".join(
        f"('{t}', {Executor._fuzz_of(t, 'AUTO')}, 1.0)" for t in terms)
    need = len(terms) if operator == "and" else 0
    return f"""
WITH {P}, {TOK}, {DL},
dict AS ( SELECT term, CAST(count(DISTINCT docid) AS BIGINT) AS df
          FROM tok GROUP BY term ),
qts AS ( SELECT * FROM (VALUES {vals}) v(qt, fz, w) ),
exp0 AS ( SELECT q.qt, q.w, d.term, d.df FROM qts q JOIN dict d
          ON abs(length(d.term) - length(q.qt)) <= q.fz
          AND damerau_levenshtein(d.term, q.qt) <= q.fz ),
exp AS ( SELECT qt, w, term, df FROM (
           SELECT *, row_number() OVER (PARTITION BY qt
                       ORDER BY df DESC, term ASC) AS rn FROM exp0 )
         WHERE rn <= 50 ),
tf AS ( SELECT docid, term, count(*) AS tf FROM tok
        WHERE term IN ( SELECT term FROM exp ) GROUP BY docid, term ),
sc AS ( SELECT tf.docid, e.qt, e.w,
               max({idf('e.df', 'g.n')} *
                   {tfn('tf.tf', 'dlq.dl_q', 'g.avgdl')}) AS s
        FROM tf JOIN exp e USING (term) JOIN dlq USING (docid) CROSS JOIN g
        GROUP BY tf.docid, e.qt, e.w ),
agg AS ( SELECT docid, sum(w * s) AS score, sum(w) AS nm
         FROM sc GROUP BY docid )
SELECT p.docid, p.url, round(agg.score, 4) AS score
FROM agg JOIN pages p USING (docid)
WHERE agg.nm >= {need}
ORDER BY round(agg.score, 4) DESC, p.docid ASC LIMIT 10
""".strip()


def _pseudo_idf(terms: list[str]) -> str:
    idf = C._idf_sql
    return " + ".join(
        f"(SELECT {idf('count(*)', '(SELECT n FROM g)')} "
        f"FROM (SELECT DISTINCT docid FROM tokpos WHERE term = '{t}'))"
        for t in terms)


def _span_base() -> list[str]:
    return [C._PAGES, C._TOKPOS, "tok AS ( SELECT docid, term FROM tokpos )",
            C._DL]


def _span_score_tail(terms: list[str], k: int = 10) -> str:
    tfn = C._tfn_sql
    return f"""
sc AS ( SELECT ph.docid,
               ({_pseudo_idf(terms)}) *
               {tfn('ph.pf', 'dlq.dl_q', 'g.avgdl')} AS score
        FROM ph JOIN dlq USING (docid) CROSS JOIN g )
SELECT p.docid, p.url, round(sc.score, 4) AS score
FROM sc JOIN pages p USING (docid)
ORDER BY round(sc.score, 4) DESC, p.docid ASC LIMIT {k}
""".strip()


def sqls() -> dict[str, str]:
    P, TOK, DL = C._PAGES, C._TOK, C._DL
    idf, tfn = C._idf_sql, C._tfn_sql
    out = {
        "match_fuzzy": _fuzzy_sql("or"),
        "match_fuzzy_and": _fuzzy_sql("and"),
    }

    out["query_phrase_prefix"] = "WITH " + ",\n".join(_span_base()) + f""",
exp AS ( SELECT term FROM ( SELECT DISTINCT term FROM tok )
         WHERE term LIKE 'jo%' ORDER BY term LIMIT 50 ),
a AS ( SELECT docid, pos FROM tokpos WHERE term = 'hash' ),
lastp AS ( SELECT DISTINCT t.docid, t.pos
           FROM tokpos t JOIN exp USING (term) ),
mm AS ( SELECT a.docid, a.pos FROM a
        JOIN lastp l ON l.docid = a.docid AND l.pos = a.pos + 1 ),
ph AS ( SELECT docid, CAST(count(DISTINCT pos) AS DOUBLE) AS pf
        FROM mm GROUP BY docid ),
{_span_score_tail(['hash'])}
"""

    out["span_near_ordered"] = "WITH " + ",\n".join(_span_base()) + f""",
p0 AS ( SELECT docid, pos FROM tokpos WHERE term = 'hash' ),
p1 AS ( SELECT docid, pos FROM tokpos WHERE term = 'join' ),
mm AS ( SELECT p0.docid, p0.pos FROM p0
        JOIN p1 ON p1.docid = p0.docid AND p1.pos > p0.pos
        AND (p1.pos - p0.pos - 1) <= 2 ),
ph AS ( SELECT docid, CAST(count(DISTINCT pos) AS DOUBLE) AS pf
        FROM mm GROUP BY docid ),
{_span_score_tail(['hash', 'join'])}
"""

    out["span_near_unordered"] = "WITH " + ",\n".join(_span_base()) + f""",
p0 AS ( SELECT docid, pos FROM tokpos WHERE term = 'join' ),
p1 AS ( SELECT docid, pos FROM tokpos WHERE term = 'hash' ),
mm AS ( SELECT p0.docid, least(p0.pos, p1.pos) AS anchor FROM p0
        JOIN p1 ON p1.docid = p0.docid AND p1.pos <> p0.pos
        AND (greatest(p0.pos, p1.pos) - least(p0.pos, p1.pos) - 1) <= 3 ),
ph AS ( SELECT docid, CAST(count(DISTINCT anchor) AS DOUBLE) AS pf
        FROM mm GROUP BY docid ),
{_span_score_tail(['join', 'hash'])}
"""

    out["intervals_match"] = "WITH " + ",\n".join(_span_base()) + f""",
p0 AS ( SELECT docid, pos FROM tokpos WHERE term = 'table' ),
p1 AS ( SELECT docid, pos FROM tokpos WHERE term = 'scan' ),
p2 AS ( SELECT docid, pos FROM tokpos WHERE term = 'fast' ),
mm AS ( SELECT p0.docid, p0.pos FROM p0
        JOIN p1 ON p1.docid = p0.docid AND p1.pos > p0.pos
        JOIN p2 ON p2.docid = p0.docid AND p2.pos > p1.pos
        AND (p2.pos - p0.pos - 2) <= 4 ),
ph AS ( SELECT docid, CAST(count(DISTINCT pos) AS DOUBLE) AS pf
        FROM mm GROUP BY docid ),
{_span_score_tail(['table', 'scan', 'fast'])}
"""

    # now = 2025-01-01 00:07:30; now-6m/m = 00:01:00 (hand-computed — the
    # oracle does NOT run the engine's date-math parser)
    sc_join = f"""
tf AS ( SELECT docid, count(*) AS tf FROM tok WHERE term = 'join'
        GROUP BY docid ),
dft AS ( SELECT count(*) AS df FROM tf ),
sc AS ( SELECT tf.docid,
               {idf('dft.df', 'g.n')} * {tfn('tf.tf', 'dlq.dl_q', 'g.avgdl')}
               AS score
        FROM tf CROSS JOIN dft JOIN dlq USING (docid) CROSS JOIN g )
""".strip()

    out["range_date_math"] = f"""
WITH {P}, {TOK}, {DL},
{sc_join}
SELECT p.docid, p.url, round(sc.score, 4) AS score
FROM sc JOIN pages p USING (docid)
WHERE p.warc_ts >= TIMESTAMP '2025-01-01 00:01:00'
  AND p.warc_ts < TIMESTAMP '2025-01-01 00:07:30'
ORDER BY round(sc.score, 4) DESC, p.docid ASC LIMIT 10
""".strip()

    out["function_score_fvf"] = f"""
WITH {P}, {TOK}, {DL},
{sc_join}
SELECT p.docid, p.url,
       round(sc.score * ln(1 + 0.1 * dlq.dl) * 1.2, 4) AS score
FROM sc JOIN dlq USING (docid) JOIN pages p USING (docid)
ORDER BY round(sc.score * ln(1 + 0.1 * dlq.dl) * 1.2, 4) DESC, p.docid ASC
LIMIT 10
""".strip()

    out["multimatch_cross_fields"] = f"""
WITH {P}, {TOK}, {DL},
tf AS ( SELECT docid, term, count(*) AS tf FROM tok
        WHERE term IN ('en', 'join') GROUP BY docid, term ),
dft AS ( SELECT term, count(*) AS df FROM tf GROUP BY term ),
textleg AS ( SELECT tf.docid, tf.term,
             {idf('dft.df', 'g.n')} *
             {tfn('tf.tf', 'dlq.dl_q', 'g.avgdl')} AS score
             FROM tf JOIN dft USING (term) JOIN dlq USING (docid)
             CROSS JOIN g ),
langleg AS ( SELECT docid, lang AS term, 1.0 AS score FROM pages
             WHERE lang IN ('en', 'join') ),
u AS ( SELECT * FROM textleg UNION ALL SELECT * FROM langleg ),
best AS ( SELECT docid, term, max(score) AS score
          FROM u GROUP BY docid, term ),
agg AS ( SELECT docid, sum(score) AS score FROM best GROUP BY docid )
SELECT p.docid, p.url, round(agg.score, 4) AS score
FROM agg JOIN pages p USING (docid)
ORDER BY round(agg.score, 4) DESC, p.docid ASC LIMIT 10
""".strip()

    out["multimatch_phrase"] = C.phrase_sql("hash join")

    def _shortlist(i: int, tok: str) -> str:
        return f"""
c{i} AS ( SELECT term, log10(df + 1) - dist AS s FROM (
    SELECT term, df, levenshtein(term, '{tok}') AS dist,
           row_number() OVER (ORDER BY levenshtein(term, '{tok}') ASC,
                              df DESC, term ASC) AS rn
    FROM dict
    WHERE abs(length(term) - {len(tok)}) <= 2
      AND levenshtein(term, '{tok}') <= 2 )
  WHERE rn <= 3 )
""".strip()

    out["query_suggest_phrase"] = f"""
WITH {P}, {TOK},
dict AS ( SELECT term, CAST(count(DISTINCT docid) AS BIGINT) AS df
          FROM tok GROUP BY term ),
{_shortlist(0, 'joni')},
{_shortlist(1, 'hask')},
combos AS ( SELECT c0.term || ' ' || c1.term AS phrase,
                   CAST(round(c0.s + c1.s, 6) AS DOUBLE) AS score
            FROM c0 CROSS JOIN c1 ),
ranked AS ( SELECT phrase, score,
            CAST(row_number() OVER (ORDER BY score DESC, phrase ASC)
                 AS INT) AS rank FROM combos )
SELECT phrase, score, rank FROM ranked WHERE rank <= 3 ORDER BY rank
""".strip()

    out["query_suggest_completion"] = f"""
WITH {P}, {TOK}
SELECT term, CAST(count(DISTINCT docid) AS BIGINT) AS df
FROM tok WHERE term LIKE 's%'
GROUP BY term ORDER BY df DESC, term ASC LIMIT 5
""".strip()

    sigma2 = -(_GAUSS.scale ** 2) / (2.0 * math.log(_GAUSS.decay))
    gauss = (f"exp(-(greatest(abs(epoch(p.warc_ts) - epoch(TIMESTAMP "
             f"'{_GAUSS.origin}')) - {_GAUSS.offset}, 0) ^ 2) "
             f"/ (2 * {sigma2!r}))")
    out["function_score_decay"] = f"""
WITH {P}, {TOK}, {DL},
{sc_join}
SELECT p.docid, p.url, round(sc.score * {gauss}, 4) AS score
FROM sc JOIN pages p USING (docid)
ORDER BY round(sc.score * {gauss}, 4) DESC, p.docid ASC LIMIT 10
""".strip()
    return out


def queries() -> dict:
    return {
        "match_fuzzy": q_match_fuzzy,
        "match_fuzzy_and": q_match_fuzzy_and,
        "query_phrase_prefix": q_phrase_prefix,
        "span_near_ordered": q_span_near_ordered,
        "span_near_unordered": q_span_near_unordered,
        "intervals_match": q_intervals,
        "range_date_math": q_range_date_math,
        "multimatch_cross_fields": q_multimatch_cross,
        "multimatch_phrase": q_multimatch_phrase,
        "query_suggest_phrase": q_suggest_phrase,
        "query_suggest_completion": q_suggest_completion,
        "function_score_fvf": q_function_score_fvf,
        "function_score_decay": q_function_score_decay,
    }


def oracle_sql() -> dict:
    return sqls()
