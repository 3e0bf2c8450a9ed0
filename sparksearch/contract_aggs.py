"""Driver-contract entries for the aggregation surface (aggs.py).

Each aggregation runs through the real engine — index build, query-phase
doc set, then the aggregation pipeline — and is paired with a DuckDB SQL
twin over the same derived pages corpus (contract.py CTE fragments).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from sparksearch import contract as C
from sparksearch.queries import Match

_M_JOIN = "m AS ( SELECT DISTINCT docid FROM tok WHERE term = 'join' )"


def _ex(spark, sf_dir):
    return C.get_engine(spark, sf_dir)[1]


# ---------------------------------------------------------------------------
# Spark sides
# ---------------------------------------------------------------------------

def q_terms_lang(spark, sf_dir):
    from sparksearch.aggs import matched_docs, terms_agg
    ex = _ex(spark, sf_dir)
    return terms_agg(matched_docs(ex, Match("text", "join")), "lang", 10)


def q_date_histogram(spark, sf_dir):
    from sparksearch.aggs import date_histogram, matched_docs
    ex = _ex(spark, sf_dir)
    return date_histogram(matched_docs(ex, Match("text", "join")),
                          "warc_ts", "minute")


def q_histogram_dl(spark, sf_dir):
    from sparksearch.aggs import histogram
    ex = _ex(spark, sf_dir)
    return histogram(ex.ix.docs, "dl", 10.0)


def q_range_dl(spark, sf_dir):
    from sparksearch.aggs import range_agg
    ex = _ex(spark, sf_dir)
    return range_agg(ex.ix.docs, "dl", [(None, 30), (30, 60), (60, None)])


def q_stats_dl(spark, sf_dir):
    from sparksearch.aggs import matched_docs, stats_agg
    ex = _ex(spark, sf_dir)
    return stats_agg(matched_docs(ex, Match("text", "join")), "dl",
                     extended=True)


def q_percentiles_dl(spark, sf_dir):
    from sparksearch.aggs import percentiles_agg
    ex = _ex(spark, sf_dir)
    return percentiles_agg(ex.ix.docs, "dl", [0.25, 0.5, 0.75, 0.95])


def q_cardinality(spark, sf_dir):
    from sparksearch.aggs import cardinality_agg, matched_docs
    ex = _ex(spark, sf_dir)
    return cardinality_agg(matched_docs(ex, Match("text", "join")), "lang")


def q_top_hits(spark, sf_dir):
    from sparksearch.aggs import scored_docs, top_hits
    ex = _ex(spark, sf_dir)
    sc = (scored_docs(ex, Match("text", "join"))
          .select("docid", "lang", F.round("score", 4).alias("score")))
    return top_hits(sc, "lang", 2)


def q_significant_terms(spark, sf_dir):
    from sparksearch.aggs import significant_terms
    ex = _ex(spark, sf_dir)
    return significant_terms(ex, Match("text", "scan"), size=5,
                             min_doc_count=3)


def q_pipeline_cumsum(spark, sf_dir):
    from sparksearch.aggs import date_histogram_pipeline, matched_docs
    ex = _ex(spark, sf_dir)
    return date_histogram_pipeline(
        matched_docs(ex, Match("text", "join")), "warc_ts", "minute")


def q_composite_after(spark, sf_dir):
    from sparksearch.aggs import composite_agg
    ex = _ex(spark, sf_dir)
    docs = ex.ix.docs.withColumn(
        "site", F.regexp_extract("url", "site([0-9]+)", 1).cast("int"))
    return composite_agg(docs, ["lang", "site"], size=10, after=("en", 50))


def q_collapse_site(spark, sf_dir):
    from sparksearch.aggs import collapse, scored_docs
    ex = _ex(spark, sf_dir)
    sc = (scored_docs(ex, Match("text", "join"))
          .withColumn("site",
                      F.regexp_extract("url", "site([0-9]+)", 1).cast("int"))
          .select("docid", "site", F.round("score", 4).alias("score")))
    return collapse(sc, "site", 5).select("docid", "site", "score")


def q_rescore(spark, sf_dir):
    from sparksearch.aggs import rescore
    ex = _ex(spark, sf_dir)
    return rescore(ex, Match("text", "join"), Match("text", "fast"),
                   window_size=20, k=10)


def q_matrix_stats(spark, sf_dir):
    from sparksearch.aggs import matrix_stats
    ex = _ex(spark, sf_dir)
    return matrix_stats(ex.ix.docs, "dl", "dl_q")


def q_filters_missing(spark, sf_dir):
    """filters + missing agg: named predicate buckets in one pass."""
    ex = _ex(spark, sf_dir)
    d = ex.ix.docs
    return d.agg(
        F.sum((F.col("dl") < 30).cast("long")).alias("short_docs"),
        F.sum((F.col("dl") >= 60).cast("long")).alias("long_docs"),
        F.sum((F.col("lang") == "en").cast("long")).alias("en_docs"),
        F.sum(F.col("lang").isNull().cast("long")).alias("missing_lang"))


# ---------------------------------------------------------------------------
# oracle SQL twins
# ---------------------------------------------------------------------------

def _with(*frags: str) -> str:
    return "WITH " + ",\n".join(frags)


def sqls() -> dict[str, str]:
    P, TOK, DL = C._PAGES, C._TOK, C._DL
    idf, tfn = C._idf_sql, C._tfn_sql
    base = [P, TOK, DL]

    sc_join = f"""
tf AS ( SELECT docid, count(*) AS tf FROM tok WHERE term = 'join'
        GROUP BY docid ),
dft AS ( SELECT count(*) AS df FROM tf ),
sc AS ( SELECT tf.docid,
               {idf('dft.df', 'g.n')} * {tfn('tf.tf', 'dlq.dl_q', 'g.avgdl')}
               AS score
        FROM tf CROSS JOIN dft JOIN dlq USING (docid) CROSS JOIN g )
""".strip()

    sc_fast = f"""
tf2 AS ( SELECT docid, count(*) AS tf FROM tok WHERE term = 'fast'
         GROUP BY docid ),
dft2 AS ( SELECT count(*) AS df FROM tf2 ),
sc2 AS ( SELECT tf2.docid,
                {idf('dft2.df', 'g.n')} *
                {tfn('tf2.tf', 'dlq.dl_q', 'g.avgdl')} AS score
         FROM tf2 CROSS JOIN dft2 JOIN dlq USING (docid) CROSS JOIN g )
""".strip()

    return {
        "agg_terms_lang": _with(*base, _M_JOIN) + """
SELECT p.lang AS key, CAST(count(*) AS BIGINT) AS doc_count
FROM pages p JOIN m USING (docid)
GROUP BY p.lang ORDER BY doc_count DESC, key ASC LIMIT 10
""",
        "agg_date_histogram": _with(*base, _M_JOIN) + """
SELECT date_trunc('minute', p.warc_ts) AS key,
       CAST(count(*) AS BIGINT) AS doc_count
FROM pages p JOIN m USING (docid)
GROUP BY 1 ORDER BY key
""",
        "agg_histogram_dl": _with(*base) + """
SELECT CAST(floor(dl / 10.0) * 10.0 AS DOUBLE) AS key,
       CAST(count(*) AS BIGINT) AS doc_count
FROM dlq GROUP BY 1 ORDER BY key
""",
        "agg_range_dl": _with(*base) + """
SELECT key, doc_count FROM (
  SELECT '*-30' AS key, CAST(sum(CASE WHEN dl < 30 THEN 1 ELSE 0 END)
         AS BIGINT) AS doc_count, 0 AS o FROM dlq
  UNION ALL
  SELECT '30-60', CAST(sum(CASE WHEN dl >= 30 AND dl < 60 THEN 1 ELSE 0 END)
         AS BIGINT), 1 FROM dlq
  UNION ALL
  SELECT '60-*', CAST(sum(CASE WHEN dl >= 60 THEN 1 ELSE 0 END)
         AS BIGINT), 2 FROM dlq )
ORDER BY o
""",
        "agg_stats_dl": _with(*base, _M_JOIN) + """
SELECT CAST(count(*) AS BIGINT) AS count,
       CAST(min(dl) AS DOUBLE) AS min, CAST(max(dl) AS DOUBLE) AS max,
       CAST(round(avg(CAST(dl AS DOUBLE)), 6) AS DOUBLE) AS avg,
       CAST(round(sum(CAST(dl AS DOUBLE)), 6) AS DOUBLE) AS sum,
       CAST(round(var_pop(CAST(dl AS DOUBLE)), 6) AS DOUBLE) AS variance,
       CAST(round(stddev_pop(CAST(dl AS DOUBLE)), 6) AS DOUBLE)
         AS std_deviation
FROM dlq JOIN m USING (docid)
""",
        "agg_percentiles_dl": _with(*base) + """
SELECT CAST(round(quantile_cont(CAST(dl AS DOUBLE), 0.25), 6) AS DOUBLE)
         AS p25,
       CAST(round(quantile_cont(CAST(dl AS DOUBLE), 0.5), 6) AS DOUBLE)
         AS p50,
       CAST(round(quantile_cont(CAST(dl AS DOUBLE), 0.75), 6) AS DOUBLE)
         AS p75,
       CAST(round(quantile_cont(CAST(dl AS DOUBLE), 0.95), 6) AS DOUBLE)
         AS p95
FROM dlq
""",
        "agg_cardinality": _with(*base, _M_JOIN) + """
SELECT CAST(count(DISTINCT p.lang) AS BIGINT) AS cardinality
FROM pages p JOIN m USING (docid)
""",
        "agg_top_hits": _with(*base, sc_join) + """
SELECT key, rank, docid, score FROM (
  SELECT p.lang AS key,
         CAST(row_number() OVER (PARTITION BY p.lang
              ORDER BY round(sc.score, 4) DESC, p.docid ASC) AS INT) AS rank,
         p.docid, round(sc.score, 4) AS score
  FROM sc JOIN pages p USING (docid) )
WHERE rank <= 2 ORDER BY key, rank
""",
        "agg_significant_terms": _with(*base) + """
, m AS ( SELECT DISTINCT docid FROM tok WHERE term = 'scan' ),
fgn AS ( SELECT count(*) AS n FROM m ),
fg AS ( SELECT t.term, CAST(count(DISTINCT t.docid) AS BIGINT) AS fg
        FROM tok t JOIN m USING (docid) GROUP BY t.term ),
bg AS ( SELECT term, CAST(count(DISTINCT docid) AS BIGINT) AS bg
        FROM tok GROUP BY term ),
j AS ( SELECT fg.term, fg.fg, bg.bg,
              (CAST(fg.fg AS DOUBLE) / fgn.n
               - CAST(bg.bg AS DOUBLE) / g.n)
              * ((CAST(fg.fg AS DOUBLE) / fgn.n)
                 / (CAST(bg.bg AS DOUBLE) / g.n)) AS jlh
       FROM fg JOIN bg USING (term) CROSS JOIN fgn CROSS JOIN g
       WHERE fg.fg >= 3 )
SELECT term, fg, bg, CAST(round(jlh, 6) AS DOUBLE) AS jlh FROM j
ORDER BY round(jlh, 6) DESC, term ASC LIMIT 5
""",
        "agg_pipeline_cumsum": _with(*base, _M_JOIN) + """
, buckets AS (
  SELECT date_trunc('minute', p.warc_ts) AS key,
         CAST(count(*) AS BIGINT) AS doc_count
  FROM pages p JOIN m USING (docid) GROUP BY 1 )
SELECT key, doc_count,
       CAST(sum(doc_count) OVER (ORDER BY key ROWS BETWEEN UNBOUNDED
            PRECEDING AND CURRENT ROW) AS BIGINT) AS cumulative,
       CAST(doc_count - lag(doc_count) OVER (ORDER BY key) AS BIGINT)
         AS derivative
FROM buckets ORDER BY key
""",
        "agg_composite_after": _with(*base) + """
, sited AS (
  SELECT lang, CAST(regexp_extract(url, 'site([0-9]+)', 1) AS INT) AS site
  FROM pages ),
buckets AS ( SELECT lang, site, CAST(count(*) AS BIGINT) AS doc_count
             FROM sited GROUP BY lang, site )
SELECT lang, site, doc_count FROM buckets
WHERE lang > 'en' OR (lang = 'en' AND site > 50)
ORDER BY lang, site LIMIT 10
""",
        "agg_collapse_site": _with(*base, sc_join) + """
SELECT docid, site, score FROM (
  SELECT p.docid,
         CAST(regexp_extract(p.url, 'site([0-9]+)', 1) AS INT) AS site,
         round(sc.score, 4) AS score,
         row_number() OVER (
           PARTITION BY CAST(regexp_extract(p.url, 'site([0-9]+)', 1) AS INT)
           ORDER BY round(sc.score, 4) DESC, p.docid ASC) AS rn
  FROM sc JOIN pages p USING (docid) )
WHERE rn = 1 ORDER BY score DESC, docid ASC LIMIT 5
""",
        "agg_rescore": _with(*base, sc_join, sc_fast) + """
, prim AS ( SELECT docid, score FROM sc
            ORDER BY score DESC, docid ASC LIMIT 20 )
SELECT docid,
       CAST(round(prim.score * 1.0 + coalesce(sc2.score, 0) * 2.0, 6)
            AS DOUBLE) AS score
FROM prim LEFT JOIN sc2 USING (docid)
ORDER BY round(prim.score * 1.0 + coalesce(sc2.score, 0) * 2.0, 6) DESC,
         docid ASC
LIMIT 10
""",
        "agg_matrix_stats": _with(*base) + f"""
SELECT CAST(count(*) AS BIGINT) AS count,
       CAST(round(covar_pop(CAST(dl AS DOUBLE), CAST(dl_q AS DOUBLE)), 6)
            AS DOUBLE) AS covariance,
       CAST(round(corr(CAST(dl AS DOUBLE), CAST(dl_q AS DOUBLE)), 6)
            AS DOUBLE) AS correlation
FROM dlq
""",
        "agg_filters_missing": _with(*base) + """
SELECT CAST(sum(CASE WHEN dlq.dl < 30 THEN 1 ELSE 0 END) AS BIGINT)
         AS short_docs,
       CAST(sum(CASE WHEN dlq.dl >= 60 THEN 1 ELSE 0 END) AS BIGINT)
         AS long_docs,
       CAST(sum(CASE WHEN p.lang = 'en' THEN 1 ELSE 0 END) AS BIGINT)
         AS en_docs,
       CAST(sum(CASE WHEN p.lang IS NULL THEN 1 ELSE 0 END) AS BIGINT)
         AS missing_lang
FROM dlq JOIN pages p USING (docid)
""",
    }


def queries() -> dict:
    return {
        "agg_terms_lang": q_terms_lang,
        "agg_date_histogram": q_date_histogram,
        "agg_histogram_dl": q_histogram_dl,
        "agg_range_dl": q_range_dl,
        "agg_stats_dl": q_stats_dl,
        "agg_percentiles_dl": q_percentiles_dl,
        "agg_cardinality": q_cardinality,
        "agg_top_hits": q_top_hits,
        "agg_significant_terms": q_significant_terms,
        "agg_pipeline_cumsum": q_pipeline_cumsum,
        "agg_composite_after": q_composite_after,
        "agg_collapse_site": q_collapse_site,
        "agg_rescore": q_rescore,
        "agg_matrix_stats": q_matrix_stats,
        "agg_filters_missing": q_filters_missing,
    }


def oracle_sql() -> dict:
    return {k: v.strip() for k, v in sqls().items()}
