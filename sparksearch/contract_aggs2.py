"""Driver-contract entries for the round-2 aggregation surface:
remaining pipeline aggs (mov_avg/mov_fn/serial_diff, bucket_script/
bucket_selector/bucket_sort) and bucket aggs (rare_terms, multi_terms,
adjacency_matrix, sampler/diversified_sampler, auto_date_histogram,
date_range) — reference registrations sv/search/SearchModule.java:510-833.

Same contract pattern as contract_aggs.py: the Spark side runs through the
real engine (query-phase doc set → aggregation pipeline), the oracle is
DuckDB SQL over the identical derived pages corpus.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from sparksearch import contract as C
from sparksearch.queries import Match

_M_JOIN = "m AS ( SELECT DISTINCT docid FROM tok WHERE term = 'join' )"


def _ex(spark, sf_dir):
    return C.get_engine(spark, sf_dir)[1]


# ---------------------------------------------------------------------------
# Spark sides
# ---------------------------------------------------------------------------

def q_moving_fns(spark, sf_dir):
    from sparksearch.aggs import date_histogram, matched_docs, \
        moving_window_aggs
    ex = _ex(spark, sf_dir)
    buckets = date_histogram(matched_docs(ex, Match("text", "join")),
                             "warc_ts", "minute")
    return moving_window_aggs(buckets, window=3, lag=1)


def q_bucket_script_chain(spark, sf_dir):
    from sparksearch.aggs import bucket_script_chain, matched_docs
    ex = _ex(spark, sf_dir)
    buckets = (matched_docs(ex, Match("text", "join"))
               .groupBy("lang")
               .agg(F.count("*").cast("long").alias("doc_count"),
                    F.sum("dl").cast("long").alias("sum_dl")))
    script = F.round(F.col("sum_dl").cast("double") / F.col("doc_count"), 6)
    return bucket_script_chain(
        buckets, script, "avg_dl", F.col("doc_count") >= 5,
        [F.col("avg_dl").desc(), F.col("lang").asc()], 3)


def q_rare_terms(spark, sf_dir):
    from sparksearch.aggs import rare_terms
    ex = _ex(spark, sf_dir)
    docs = ex.ix.docs.withColumn(
        "site", F.regexp_extract("url", "site([0-9]+)", 1).cast("int"))
    return rare_terms(docs, "site", max_doc_count=3)


def q_multi_terms(spark, sf_dir):
    from sparksearch.aggs import multi_terms
    ex = _ex(spark, sf_dir)
    docs = ex.ix.docs.withColumn(
        "site", F.regexp_extract("url", "site([0-9]+)", 1).cast("int"))
    return multi_terms(docs, ["lang", "site"], size=10)


def q_adjacency_matrix(spark, sf_dir):
    from sparksearch.aggs import adjacency_matrix
    ex = _ex(spark, sf_dir)
    return adjacency_matrix(ex.ix.docs, {
        "early": F.col("warc_ts") < F.to_timestamp(
            F.lit("2025-01-01 00:04:00")),
        "en": F.col("lang") == "en",
        "short": F.col("dl") < 40,
    })


def _scored_join(spark, sf_dir):
    from sparksearch.aggs import scored_docs
    ex = _ex(spark, sf_dir)
    return (scored_docs(ex, Match("text", "join"))
            .select("docid", "lang", F.round("score", 4).alias("score")))


def q_sampler(spark, sf_dir):
    from sparksearch.aggs import sampler_terms
    return sampler_terms(_scored_join(spark, sf_dir), shard_size=100,
                         field="lang", size=10)


def q_diversified_sampler(spark, sf_dir):
    from sparksearch.aggs import sampler_terms
    return sampler_terms(_scored_join(spark, sf_dir), shard_size=20,
                         field="lang", size=10, diversify="lang",
                         max_docs_per_value=2)


def q_auto_date_histogram(spark, sf_dir):
    from sparksearch.aggs import auto_date_histogram, matched_docs
    ex = _ex(spark, sf_dir)
    return auto_date_histogram(matched_docs(ex, Match("text", "join")),
                               "warc_ts", target_buckets=20)


def q_date_range(spark, sf_dir):
    from sparksearch.aggs import date_range_agg
    ex = _ex(spark, sf_dir)
    return date_range_agg(ex.ix.docs, "warc_ts", [
        (None, "2025-01-01 00:02:00"),
        ("2025-01-01 00:02:00", "2025-01-01 00:05:00"),
        ("2025-01-01 00:05:00", None)])


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

    scored = """
scored AS ( SELECT p.docid, p.lang, round(sc.score, 4) AS score
            FROM sc JOIN pages p USING (docid) )
""".strip()

    out = {}

    out["agg_moving_fns"] = _with(*base, _M_JOIN) + """
, buckets AS (
  SELECT date_trunc('minute', p.warc_ts) AS key,
         CAST(count(*) AS BIGINT) AS doc_count
  FROM pages p JOIN m USING (docid) GROUP BY 1 )
SELECT key, doc_count,
       CAST(round(avg(CAST(doc_count AS DOUBLE)) OVER (ORDER BY key
            ROWS BETWEEN 2 PRECEDING AND CURRENT ROW), 6) AS DOUBLE)
         AS moving_avg,
       CAST(max(CAST(doc_count AS DOUBLE)) OVER (ORDER BY key
            ROWS BETWEEN 2 PRECEDING AND CURRENT ROW) AS DOUBLE)
         AS moving_max,
       CAST(CAST(doc_count AS DOUBLE)
            - lag(CAST(doc_count AS DOUBLE)) OVER (ORDER BY key) AS DOUBLE)
         AS serial_diff
FROM buckets ORDER BY key
"""

    out["agg_bucket_script_chain"] = _with(*base, _M_JOIN) + """
, buckets AS (
  SELECT p.lang, CAST(count(*) AS BIGINT) AS doc_count,
         CAST(sum(dlq.dl) AS BIGINT) AS sum_dl
  FROM pages p JOIN m USING (docid) JOIN dlq USING (docid)
  GROUP BY p.lang )
SELECT lang, doc_count, sum_dl,
       CAST(round(CAST(sum_dl AS DOUBLE) / doc_count, 6) AS DOUBLE)
         AS avg_dl
FROM buckets WHERE doc_count >= 5
ORDER BY round(CAST(sum_dl AS DOUBLE) / doc_count, 6) DESC, lang ASC
LIMIT 3
"""

    site = ("sited AS ( SELECT docid, lang, warc_ts, "
            "CAST(regexp_extract(url, 'site([0-9]+)', 1) AS INT) AS site "
            "FROM pages )")

    out["agg_rare_terms"] = _with(*base, site) + """
SELECT site AS key, CAST(count(*) AS BIGINT) AS doc_count
FROM sited GROUP BY site HAVING count(*) <= 3
ORDER BY doc_count ASC, key ASC
"""

    out["agg_multi_terms"] = _with(*base, site) + """
SELECT lang, site, CAST(count(*) AS BIGINT) AS doc_count
FROM sited GROUP BY lang, site
ORDER BY doc_count DESC, lang ASC, site ASC LIMIT 10
"""

    out["agg_adjacency_matrix"] = _with(*base) + """
, f AS ( SELECT p.docid,
         (p.warc_ts < TIMESTAMP '2025-01-01 00:04:00') AS early,
         (p.lang = 'en') AS en, (dlq.dl < 40) AS short
         FROM pages p JOIN dlq USING (docid) ),
cells AS (
  SELECT 'early' AS key, CAST(sum(CASE WHEN early THEN 1 ELSE 0 END)
         AS BIGINT) AS doc_count, 0 AS o FROM f
  UNION ALL SELECT 'early&en', CAST(sum(CASE WHEN early AND en THEN 1
         ELSE 0 END) AS BIGINT), 1 FROM f
  UNION ALL SELECT 'early&short', CAST(sum(CASE WHEN early AND short THEN 1
         ELSE 0 END) AS BIGINT), 2 FROM f
  UNION ALL SELECT 'en', CAST(sum(CASE WHEN en THEN 1 ELSE 0 END)
         AS BIGINT), 3 FROM f
  UNION ALL SELECT 'en&short', CAST(sum(CASE WHEN en AND short THEN 1
         ELSE 0 END) AS BIGINT), 4 FROM f
  UNION ALL SELECT 'short', CAST(sum(CASE WHEN short THEN 1 ELSE 0 END)
         AS BIGINT), 5 FROM f )
SELECT key, doc_count FROM cells WHERE doc_count > 0 ORDER BY o
"""

    out["agg_sampler"] = _with(*base, sc_join, scored) + """
, topd AS ( SELECT * FROM scored
            ORDER BY score DESC, docid ASC LIMIT 100 )
SELECT lang AS key, CAST(count(*) AS BIGINT) AS doc_count
FROM topd GROUP BY lang
ORDER BY doc_count DESC, key ASC LIMIT 10
"""

    out["agg_diversified_sampler"] = _with(*base, sc_join, scored) + """
, dv AS ( SELECT docid, lang, score,
          row_number() OVER (PARTITION BY lang
            ORDER BY score DESC, docid ASC) AS rn
          FROM scored ),
topd AS ( SELECT * FROM dv WHERE rn <= 2
          ORDER BY score DESC, docid ASC LIMIT 20 )
SELECT lang AS key, CAST(count(*) AS BIGINT) AS doc_count
FROM topd GROUP BY lang
ORDER BY doc_count DESC, key ASC LIMIT 10
"""

    # auto interval pick mirrors aggs.AUTO_DATE_INTERVALS: finest unit with
    # ≤ 20 distinct buckets
    out["agg_auto_date_histogram"] = _with(*base, _M_JOIN) + """
, md AS ( SELECT p.* FROM pages p JOIN m USING (docid) ),
cand AS ( SELECT
    count(DISTINCT date_trunc('second', warc_ts)) AS cs,
    count(DISTINCT date_trunc('minute', warc_ts)) AS cm,
    count(DISTINCT date_trunc('hour', warc_ts)) AS ch,
    count(DISTINCT date_trunc('day', warc_ts)) AS cd,
    count(DISTINCT date_trunc('month', warc_ts)) AS cmo FROM md ),
pick AS ( SELECT CASE WHEN cs <= 20 THEN 'second'
                      WHEN cm <= 20 THEN 'minute'
                      WHEN ch <= 20 THEN 'hour'
                      WHEN cd <= 20 THEN 'day'
                      WHEN cmo <= 20 THEN 'month'
                      ELSE 'year' END AS iv FROM cand )
SELECT CASE pick.iv
         WHEN 'second' THEN date_trunc('second', md.warc_ts)
         WHEN 'minute' THEN date_trunc('minute', md.warc_ts)
         WHEN 'hour' THEN date_trunc('hour', md.warc_ts)
         WHEN 'day' THEN date_trunc('day', md.warc_ts)
         WHEN 'month' THEN date_trunc('month', md.warc_ts)
         ELSE date_trunc('year', md.warc_ts) END AS key,
       CAST(count(*) AS BIGINT) AS doc_count,
       pick.iv AS interval
FROM md CROSS JOIN pick
GROUP BY 1, pick.iv ORDER BY key
"""

    out["agg_date_range"] = _with(*base) + """
SELECT key, doc_count FROM (
  SELECT '*-2025-01-01 00:02:00' AS key,
         CAST(sum(CASE WHEN warc_ts < TIMESTAMP '2025-01-01 00:02:00'
              THEN 1 ELSE 0 END) AS BIGINT) AS doc_count, 0 AS o FROM pages
  UNION ALL
  SELECT '2025-01-01 00:02:00-2025-01-01 00:05:00',
         CAST(sum(CASE WHEN warc_ts >= TIMESTAMP '2025-01-01 00:02:00'
              AND warc_ts < TIMESTAMP '2025-01-01 00:05:00'
              THEN 1 ELSE 0 END) AS BIGINT), 1 FROM pages
  UNION ALL
  SELECT '2025-01-01 00:05:00-*',
         CAST(sum(CASE WHEN warc_ts >= TIMESTAMP '2025-01-01 00:05:00'
              THEN 1 ELSE 0 END) AS BIGINT), 2 FROM pages )
ORDER BY o
"""
    return {k: v.strip() for k, v in out.items()}


def queries() -> dict:
    return {
        "agg_moving_fns": q_moving_fns,
        "agg_bucket_script_chain": q_bucket_script_chain,
        "agg_rare_terms": q_rare_terms,
        "agg_multi_terms": q_multi_terms,
        "agg_adjacency_matrix": q_adjacency_matrix,
        "agg_sampler": q_sampler,
        "agg_diversified_sampler": q_diversified_sampler,
        "agg_auto_date_histogram": q_auto_date_histogram,
        "agg_date_range": q_date_range,
    }


def oracle_sql() -> dict:
    return sqls()
