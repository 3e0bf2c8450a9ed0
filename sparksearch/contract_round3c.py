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

from pyspark.sql import functions as F

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


_HL_TERMS = ["join", "table"]
_HL_SZ, _HL_N, _HL_NMS = 60, 2, 30


def q_highlight_opts(spark, sf_dir):
    """Unified-highlighter options on the fragmenter: fragment_size=60,
    number_of_fragments=2, order=score, no_match_size=30 — hits of a
    'scan' match highlighted for join/table; scan-docs without either
    term return the untagged leading 30 chars
    (AbstractHighlighterBuilder option set)."""
    from sparksearch.corpus import pages_from_documents
    from sparksearch.fetchops import highlight_fragments
    from sparksearch.queries import Match
    _, ex = C.get_engine(spark, sf_dir)
    topk = C.topk_rounded(ex, Match("text", "scan"), k=8)
    pages = pages_from_documents(spark, sf_dir)
    return highlight_fragments(topk, pages, _HL_TERMS,
                               fragment_size=_HL_SZ,
                               number_of_fragments=_HL_N,
                               no_match_size=_HL_NMS, order="score")


def _sql_highlight_opts() -> str:
    idf, tfn = C._idf_sql, C._tfn_sql
    pat = r"\b(" + "|".join(sorted(set(_HL_TERMS))) + r")\b"
    return f"""
WITH {C._PAGES},
{C._TOK},
{C._DL},
tf AS ( SELECT docid, count(*) AS tf FROM tok WHERE term = 'scan'
        GROUP BY docid ),
dft AS ( SELECT count(*) AS df FROM tf ),
sc AS ( SELECT tf.docid,
               {idf('dft.df', 'g.n')} *
               {tfn('tf.tf', 'dlq.dl_q', 'g.avgdl')} AS score
        FROM tf CROSS JOIN dft JOIN dlq USING (docid) CROSS JOIN g ),
topk AS ( SELECT p.docid, p.url, round(sc.score, 4) AS score
          FROM sc JOIN pages p USING (docid)
          ORDER BY round(sc.score, 4) DESC, p.docid ASC LIMIT 8 ),
hl AS ( SELECT t.docid, t.url, t.score, p.text,
               regexp_replace(p.text, '{pat}', '<em>\\1</em>', 'g') AS h
        FROM topk t JOIN pages p USING (docid) ),
frags AS ( SELECT docid, url, score,
                  unnest(generate_series(0,
                    CAST(greatest(1, ceil(length(h) / {_HL_SZ}.0)) AS INT)
                    - 1)) AS frag_idx, h
           FROM hl ),
fr2 AS ( SELECT docid, url, score, CAST(frag_idx AS INT) AS frag_idx,
                substr(h, frag_idx * {_HL_SZ} + 1, {_HL_SZ}) AS fragment
         FROM frags ),
fr3 AS ( SELECT *, CAST((length(fragment)
                  - length(replace(fragment, '<em>', ''))) / 4 AS INT)
                AS n_matches FROM fr2 ),
top_fr AS ( SELECT docid, url, score, frag_idx, fragment, n_matches
            FROM ( SELECT *, row_number() OVER (PARTITION BY docid
                     ORDER BY n_matches DESC, frag_idx ASC) AS rn
                   FROM fr3 WHERE n_matches > 0 )
            WHERE rn <= {_HL_N} ),
no_match AS ( SELECT h.docid, h.url, h.score, CAST(0 AS INT) AS frag_idx,
                     substr(h.text, 1, {_HL_NMS}) AS fragment,
                     CAST(0 AS INT) AS n_matches
              FROM hl h WHERE h.docid NOT IN
                   ( SELECT DISTINCT docid FROM top_fr ) )
SELECT * FROM top_fr UNION ALL SELECT * FROM no_match
""".strip()


_ERR_MAXG = 3
#: rated-list grades by rated rank (1-based): top AND-hit most relevant
_ERR_GRADES = {1: 3, 2: 2, 3: 2, 4: 1, 5: 1}


def q_rank_eval_err(spark, sf_dir):
    """rank_eval ERR@10 with graded relevance (ExpectedReciprocalRank.java):
    rated set = top-5 of the stricter AND query, graded 3/2/2/1/1 by its
    rank; the OR ranking is evaluated against it."""
    from pyspark.sql import Window as W

    from sparksearch.aggs import expected_reciprocal_rank
    from sparksearch.queries import Match
    _, ex = C.get_engine(spark, sf_dir)
    rated = (C.topk_rounded(ex, Match("text", "hash join", operator="and"),
                            k=5)
             .withColumn("_rk", F.row_number().over(
                 W.orderBy(F.col("score").desc(), F.col("docid").asc())))
             .select("docid",
                     F.element_at(
                         F.create_map(*[F.lit(x) for kv in
                                        _ERR_GRADES.items() for x in kv]),
                         F.col("_rk")).alias("grade")))
    ranked = C.topk_rounded(ex, Match("text", "hash join"), k=10) \
        .select("docid", "score")
    return expected_reciprocal_rank(ranked, rated, k=10,
                                    max_grade=_ERR_MAXG)


def _sql_rank_eval_err() -> str:
    grade_case = " ".join(f"WHEN {rk} THEN {g}"
                          for rk, g in sorted(_ERR_GRADES.items()))
    return f"""
WITH rated0 AS ( {C.match_sql('hash join', operator='and', k=5)} ),
rated AS ( SELECT docid,
                  CASE row_number() OVER (ORDER BY score DESC, docid ASC)
                       {grade_case} ELSE 0 END AS grade
           FROM rated0 ),
ranked AS ( {C.match_sql('hash join', k=10)} ),
rr AS ( SELECT docid,
               row_number() OVER (ORDER BY score DESC, docid ASC) AS rank
        FROM ranked ),
j AS ( SELECT rr.rank,
              (pow(2.0, coalesce(rated.grade, 0)) - 1.0)
                / {2 ** _ERR_MAXG}.0 AS r
       FROM rr LEFT JOIN rated USING (docid) WHERE rr.rank <= 10 ),
casc AS ( SELECT rank, r,
                 exp(coalesce(sum(ln(1.0 - r)) OVER (ORDER BY rank
                       ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
                     0.0)) AS stopped
          FROM j )
SELECT CAST(round(sum(r / rank * stopped), 6) AS DOUBLE) AS err_at_10
FROM casc
""".strip()


def q_completion_contexts(spark, sf_dir):
    """Completion suggester with category contexts: 's'-prefixed
    suggestions restricted to docs whose lang context is es/de
    (CategoryContextMapping.java); df and the reported context set are
    both computed within the context filter."""
    from sparksearch.fetchops import suggest_completion_contexts
    ix, _ = C.get_engine(spark, sf_dir)
    return suggest_completion_contexts(ix, "s", field="lang",
                                       values=["es", "de"], size=5)


def _sql_completion_contexts() -> str:
    return f"""
WITH {C._PAGES},
{C._TOK},
ctx AS ( SELECT t.term, t.docid, p.lang
         FROM tok t JOIN pages p USING (docid)
         WHERE t.term LIKE 's%' AND p.lang IN ('es', 'de') )
SELECT term, CAST(count(DISTINCT docid) AS BIGINT) AS df,
       string_agg(DISTINCT lang, ',' ORDER BY lang) AS contexts
FROM ctx GROUP BY term
ORDER BY df DESC, term ASC LIMIT 5
""".strip()


_FZ_PREFIX, _FZ_EDITS, _FZ_PLEN = "scam", 1, 1


def q_completion_fuzzy(spark, sf_dir):
    """Fuzzy completion (FuzzyOptions / Lucene FuzzyCompletionQuery):
    'scam' with fuzziness 1 and nonFuzzyPrefix 1 reaches 'scan...'
    completions the exact walk misses."""
    from sparksearch.fetchops import suggest_completion_fuzzy
    ix, _ = C.get_engine(spark, sf_dir)
    return suggest_completion_fuzzy(ix, _FZ_PREFIX, fuzziness=_FZ_EDITS,
                                    prefix_length=_FZ_PLEN, size=5)


def _sql_completion_fuzzy() -> str:
    n = len(_FZ_PREFIX)
    return f"""
WITH {C._PAGES},
{C._TOK},
d AS ( SELECT term, CAST(count(DISTINCT docid) AS BIGINT) AS df
       FROM tok GROUP BY term ),
cand AS ( SELECT term, df,
                 CAST(levenshtein(substr(term, 1, {n}), '{_FZ_PREFIX}')
                      AS INT) AS dist
          FROM d WHERE substr(term, 1, {_FZ_PLEN})
                       = '{_FZ_PREFIX[:_FZ_PLEN]}' )
SELECT term, df, dist FROM cand WHERE dist <= {_FZ_EDITS}
ORDER BY dist ASC, df DESC, term ASC LIMIT 5
""".strip()


def q_intervals_allof(spark, sf_dir):
    """intervals with a composed source tree
    (IntervalsSourceProvider): all_of(ordered, max_gaps=2,
    [match 'table', any_of(match 'scan', match 'merge')]) — 'table'
    followed within 2 gaps by either 'scan' or 'merge'."""
    from sparksearch.queries import (Intervals, IntervalsAllOf,
                                     IntervalsAnyOf, IntervalsMatch)
    _, ex = C.get_engine(spark, sf_dir)
    src = IntervalsAllOf(
        (IntervalsMatch("table"),
         IntervalsAnyOf((IntervalsMatch("scan"),
                         IntervalsMatch("merge")))),
        max_gaps=2, ordered=True)
    return C.topk_rounded(ex, Intervals("text", source=src), k=10)


def _sql_intervals_allof() -> str:
    idf, tfn = C._idf_sql, C._tfn_sql
    one_idf = (lambda cond: f"(SELECT {idf('count(*)', '(SELECT n FROM g)')}"
               f" FROM (SELECT DISTINCT docid FROM tokpos WHERE {cond}))")
    pseudo = " + ".join(one_idf(f"term = '{t}'")
                        for t in ("table", "scan", "merge"))
    return f"""
WITH {C._PAGES},
{C._TOKPOS},
tok AS ( SELECT docid, term FROM tokpos ),
{C._DL},
p0 AS ( SELECT docid, pos FROM tokpos WHERE term = 'table' ),
p1 AS ( SELECT docid, pos FROM tokpos
        WHERE term IN ('scan', 'merge') ),
mm AS ( SELECT p0.docid, p0.pos AS s FROM p0
        JOIN p1 ON p1.docid = p0.docid AND p1.pos > p0.pos
        AND (p1.pos - p0.pos + 1) - 2 <= 2 ),
ph AS ( SELECT docid, CAST(count(DISTINCT s) AS DOUBLE) AS pf
        FROM mm GROUP BY docid ),
sc AS ( SELECT ph.docid,
               ({pseudo}) * {tfn('ph.pf', 'dlq.dl_q', 'g.avgdl')} AS score
        FROM ph JOIN dlq USING (docid) CROSS JOIN g )
SELECT p.docid, p.url, round(sc.score, 4) AS score
FROM sc JOIN pages p USING (docid)
ORDER BY round(sc.score, 4) DESC, p.docid ASC LIMIT 10
""".strip()


def queries() -> dict:
    return {
        "random_score": q_random_score,
        "field_masking_span": q_field_masking_span,
        "mlt_like_docs": q_mlt_like_docs,
        "highlight_opts": q_highlight_opts,
        "rank_eval_err": q_rank_eval_err,
        "completion_contexts": q_completion_contexts,
        "completion_fuzzy": q_completion_fuzzy,
        "intervals_allof": q_intervals_allof,
    }


def oracle_sql() -> dict:
    return {
        "random_score": _sql_random_score(),
        "field_masking_span": _sql_field_masking_span(),
        "mlt_like_docs": _sql_mlt_like_docs(),
        "highlight_opts": _sql_highlight_opts(),
        "rank_eval_err": _sql_rank_eval_err(),
        "completion_contexts": _sql_completion_contexts(),
        "completion_fuzzy": _sql_completion_fuzzy(),
        "intervals_allof": _sql_intervals_allof(),
    }
