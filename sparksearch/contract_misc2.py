"""Driver-contract entries, round-2 misc surface:

- percolate_queries: the percolator (sv/modules/percolator/) — stored
  queries matched against the whole corpus, oracle = per-kind SQL legs
  over an identical literal query table.
- analyze_adversarial: the UAX#29 analyzer gate the round-1 verdict asked
  for — the ENGINE'S vectorized Arrow path (doc_postings_udf →
  analyze_batch) runs over punctuation/unicode-heavy strings, and the
  oracle side is HAND-DERIVED literal tokens (from the UAX#29 word-break
  rules: MidNumLet apostrophe/dot joining, diacritic letters, underscore
  ExtendNumLet, symbol drops), NOT a replay of the same Python code.
- agg_variable_width_histogram / agg_scripted_metric: the last two §2.4
  rows (SearchModule.java:612; ScriptedMetricAggregationBuilder).
- match_bool_prefix: BM25 term clauses + constant-score prefix clause
  (MatchBoolPrefixQueryBuilder).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from sparksearch import contract as C
from sparksearch.queries import Match, MatchBoolPrefix

# ---------------------------------------------------------------------------
# adversarial analyzer corpus: (sid, text, hand-derived tokens-with-pos)
# ---------------------------------------------------------------------------

#: expectations hand-derived from UAX#29 + Lucene standard-analyzer rules
#: (tests/test_analysis.py goldens; reference indices.analyze/10_analyze.yml)
_ADVERSARIAL = [
    (0, "The QUICK brown-foxes, jumped… 42 times!",
     ["the", "quick", "brown", "foxes", "jumped", "42", "times"]),
    (1, "it's O'Neill's café №5",
     ["it's", "o'neill's", "café", "5"]),
    (2, "visit example.com or 3.14 now",
     ["visit", "example.com", "or", "3.14", "now"]),
    (3, "a.5 foo_bar baz_",
     ["a", "5", "foo_bar", "baz_"]),
    (4, "¡Hola! ¿qué tal? — bien",
     ["hola", "qué", "tal", "bien"]),
]


def q_analyze_adversarial(spark, sf_dir):
    from sparksearch.build import doc_postings_udf
    df = spark.createDataFrame([(sid, text) for sid, text, _ in _ADVERSARIAL],
                               "sid int, text string")
    tok = df.select("sid",
                    doc_postings_udf("standard")(F.col("text")).alias("_t"))
    return (tok.select("sid", F.explode("_t.entries").alias("e"))
            .select("sid", F.col("e.term").alias("term"),
                    F.explode("e.positions").alias("pos"))
            .select("sid", F.col("pos").cast("int").alias("pos"), "term")
            .orderBy("sid", "pos"))


def sql_analyze_adversarial() -> str:
    rows = []
    for sid, _, toks in _ADVERSARIAL:
        for pos, t in enumerate(toks):
            rows.append(f"({sid}, {pos}, '{t.replace(chr(39), chr(39)*2)}')")
    return ("SELECT sid, pos, term FROM (VALUES "
            + ", ".join(rows) + ") v(sid, pos, term) ORDER BY sid, pos")


# ---------------------------------------------------------------------------
# percolator
# ---------------------------------------------------------------------------

_PERC_QUERIES = [
    ("q_and_hash_join", "match_and", ["hash", "join"], None),
    ("q_or_2of3", "match_or", ["merge", "sort", "scan"], 2),
    ("q_phrase_hash_join", "phrase", ["hash", "join"], None),
    ("q_term_bloom", "term", ["bloom"], None),
]


def q_percolate(spark, sf_dir):
    from sparksearch.percolate import percolate
    docs = C.pages_df(spark, sf_dir).select("url", "text")
    qdf = spark.createDataFrame(
        _PERC_QUERIES, "qid string, kind string, terms array<string>, msm int")
    return percolate(docs, qdf)


def sql_percolate() -> str:
    return f"""
WITH {C._PAGES},
{C._TOKPOS},
dt AS ( SELECT DISTINCT docid, term FROM tokpos ),
hits AS (
  SELECT docid, 'q_and_hash_join' AS qid FROM dt
    WHERE term IN ('hash', 'join')
    GROUP BY docid HAVING count(DISTINCT term) = 2
  UNION ALL
  SELECT docid, 'q_or_2of3' FROM dt
    WHERE term IN ('merge', 'sort', 'scan')
    GROUP BY docid HAVING count(DISTINCT term) >= 2
  UNION ALL
  SELECT DISTINCT p0.docid, 'q_phrase_hash_join'
    FROM tokpos p0 JOIN tokpos p1
      ON p1.docid = p0.docid AND p1.pos = p0.pos + 1 AND p1.term = 'join'
    WHERE p0.term = 'hash'
  UNION ALL
  SELECT DISTINCT docid, 'q_term_bloom' FROM dt WHERE term = 'bloom' )
SELECT p.url, h.qid FROM hits h JOIN pages p USING (docid)
ORDER BY p.url, h.qid
""".strip()


# ---------------------------------------------------------------------------
# match_bool_prefix
# ---------------------------------------------------------------------------

def q_match_bool_prefix(spark, sf_dir):
    return C.topk_rounded(C.get_engine(spark, sf_dir)[1],
                          MatchBoolPrefix("text", "fast sca"), k=10)


def sql_match_bool_prefix() -> str:
    P, TOK, DL = C._PAGES, C._TOK, C._DL
    idf, tfn = C._idf_sql, C._tfn_sql
    return f"""
WITH {P}, {TOK}, {DL},
tf AS ( SELECT docid, count(*) AS tf FROM tok WHERE term = 'fast'
        GROUP BY docid ),
dft AS ( SELECT count(*) AS df FROM tf ),
sc AS ( SELECT tf.docid,
               {idf('dft.df', 'g.n')} * {tfn('tf.tf', 'dlq.dl_q', 'g.avgdl')}
               AS score
        FROM tf CROSS JOIN dft JOIN dlq USING (docid) CROSS JOIN g ),
pre AS ( SELECT DISTINCT docid, 1.0 AS score FROM tok
         WHERE term LIKE 'sca%' ),
u AS ( SELECT docid, score FROM sc UNION ALL SELECT docid, score FROM pre ),
agg AS ( SELECT docid, sum(score) AS score FROM u GROUP BY docid )
SELECT p.docid, p.url, round(agg.score, 4) AS score
FROM agg JOIN pages p USING (docid)
ORDER BY round(agg.score, 4) DESC, p.docid ASC LIMIT 10
""".strip()


# ---------------------------------------------------------------------------
# variable_width_histogram / scripted_metric
# ---------------------------------------------------------------------------

def q_variable_width_histogram(spark, sf_dir):
    from sparksearch.aggs import variable_width_histogram
    ex = C.get_engine(spark, sf_dir)[1]
    out = variable_width_histogram(ex.ix.docs, "dl", buckets=5,
                                   tie_col="docid", exact=True)
    return out.select("bucket", F.col("min").cast("long").alias("min"),
                      F.col("max").cast("long").alias("max"),
                      F.round("avg", 6).alias("avg"), "doc_count")


def sql_variable_width_histogram() -> str:
    return f"""
WITH {C._PAGES}, {C._TOK}, {C._DL},
assigned AS ( SELECT dl AS v,
              ntile(5) OVER (ORDER BY dl ASC, docid ASC) AS bucket
              FROM dlq )
SELECT bucket, CAST(min(v) AS BIGINT) AS min, CAST(max(v) AS BIGINT) AS max,
       round(avg(CAST(v AS DOUBLE)), 6) AS avg,
       CAST(count(*) AS BIGINT) AS doc_count
FROM assigned GROUP BY bucket ORDER BY bucket
""".strip()


def q_scripted_metric(spark, sf_dir):
    from sparksearch.aggs import matched_docs, scripted_metric
    ex = C.get_engine(spark, sf_dir)[1]
    docs = matched_docs(ex, Match("text", "join"))
    out = scripted_metric(docs, (F.col("dl") * F.col("dl")).cast("double"),
                          combine="sum", reduce="sum")
    return out.select(F.round("value", 6).alias("value"))


def sql_scripted_metric() -> str:
    return f"""
WITH {C._PAGES}, {C._TOK}, {C._DL},
m AS ( SELECT DISTINCT docid FROM tok WHERE term = 'join' )
SELECT round(sum(CAST(dlq.dl AS DOUBLE) * dlq.dl), 6) AS value
FROM dlq JOIN m USING (docid)
""".strip()


# ---------------------------------------------------------------------------

def queries() -> dict:
    return {
        "match_bool_prefix": q_match_bool_prefix,
        "percolate_queries": q_percolate,
        "analyze_adversarial": q_analyze_adversarial,
        "agg_variable_width_histogram": q_variable_width_histogram,
        "agg_scripted_metric": q_scripted_metric,
    }


def oracle_sql() -> dict:
    return {
        "match_bool_prefix": sql_match_bool_prefix(),
        "percolate_queries": sql_percolate(),
        "analyze_adversarial": sql_analyze_adversarial(),
        "agg_variable_width_histogram": sql_variable_width_histogram(),
        "agg_scripted_metric": sql_scripted_metric(),
    }
