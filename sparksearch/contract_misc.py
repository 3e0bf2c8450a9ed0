"""Driver-contract entries: slicing, lookups, doc-value filters, extra
metric aggs, distance_feature scoring, rank_eval, field sorts."""

from __future__ import annotations

from pyspark.sql import functions as F

from sparksearch import contract as C
from sparksearch.queries import Match

_ORIGIN = "2025-01-01 00:02:00"
_RELEVANT_K = 5  # top-5 of match 'hash join' per oracle = rated relevant


def _ix(spark, sf_dir):
    return C.get_engine(spark, sf_dir)[0]


def _ex(spark, sf_dir):
    return C.get_engine(spark, sf_dir)[1]


# ---------------------------------------------------------------------------
# Spark sides
# ---------------------------------------------------------------------------

def q_sliced_scroll(spark, sf_dir):
    """Sliced scan: slice id = md5-derived hash of url mod max (the
    portable form of SliceQuery's floorMod(hash(field), max))."""
    d = _ix(spark, sf_dir).docs
    slice_id = (F.instr(F.lit("0123456789abcdef"),
                        F.substring(F.md5("url"), 1, 1)) - 1) % 4
    return (d.where(slice_id == 0)
            .select("docid", "url").orderBy("docid").limit(20))


def q_terms_lookup(spark, sf_dir):
    """terms lookup: the filter set comes from another query's result
    (here: the 2 most common langs), then a terms filter."""
    d = _ix(spark, sf_dir).docs
    top_langs = [r["lang"] for r in
                 (d.groupBy("lang").count()
                  .orderBy(F.col("count").desc(), F.col("lang").asc())
                  .limit(2).collect())]
    return (d.where(F.col("lang").isin(top_langs))
            .select("docid", "url", "lang").orderBy("docid").limit(20))


def q_prefix_keyword(spark, sf_dir):
    d = _ix(spark, sf_dir).docs
    return (d.where(F.col("url").startswith("https://site1"))
            .where(F.col("lang").isNotNull())
            .select("docid", "url").orderBy("docid").limit(20))


def q_weighted_avg(spark, sf_dir):
    d = _ix(spark, sf_dir).docs
    w = (F.col("docid") % 3 + 1).cast("double")
    v = F.col("dl").cast("double")
    return d.agg(
        F.round(F.sum(v * w) / F.sum(w), 6).alias("weighted_avg_dl"))


def q_median_abs_dev(spark, sf_dir):
    d = _ix(spark, sf_dir).docs
    med = d.agg(F.percentile(F.col("dl").cast("double"),
                             F.lit(0.5)).alias("m"))
    return (d.crossJoin(F.broadcast(med))
            .agg(F.round(F.percentile(
                F.abs(F.col("dl").cast("double") - F.col("m")),
                F.lit(0.5)), 6).alias("mad_dl")))


def q_distance_feature(spark, sf_dir):
    """distance_feature: BM25 + boost·pivot/(pivot+|ts−origin|) on the
    match result (DistanceFeatureQueryBuilder semantics)."""
    ex = _ex(spark, sf_dir)
    scored = ex._plan(Match("text", "join"), scored=True)
    d = ex.ix.docs.select("docid", "url", "warc_ts")
    dist = F.abs(F.unix_timestamp("warc_ts")
                 - F.unix_timestamp(F.lit(_ORIGIN)))
    boost = F.lit(2.0) * F.lit(100.0) / (F.lit(100.0) + dist.cast("double"))
    out = (scored.join(d, "docid")
           .select("docid", "url",
                   F.round(F.col("score") + boost, 4).alias("score")))
    return (out.orderBy(F.col("score").desc(), F.col("docid").asc())
            .limit(10))


def q_rank_eval(spark, sf_dir):
    """rank_eval: Precision@10 and MRR of the match_or result against a
    rated-relevant set = the top-5 of a stricter query (match AND)."""
    ex = _ex(spark, sf_dir)
    rated = C.topk_rounded(ex, Match("text", "hash join", operator="and"),
                           k=_RELEVANT_K).select("docid")
    ranked = (C.topk_rounded(ex, Match("text", "hash join"), k=10)
              .select("docid", "score"))
    from pyspark.sql import Window
    w = F.row_number().over(
        Window.orderBy(F.col("score").desc(), F.col("docid").asc()))
    ranked = ranked.withColumn("rank", w)
    j = ranked.join(F.broadcast(rated.withColumn("_rel", F.lit(1))),
                    "docid", "left")
    return j.agg(
        F.round(F.sum(F.coalesce(F.col("_rel"), F.lit(0)))
                / F.lit(10.0), 6).alias("precision_at_10"),
        F.round(F.max(F.when(F.col("_rel") == 1,
                             F.lit(1.0) / F.col("rank"))
                      .otherwise(F.lit(0.0))), 6).alias("mrr"))


def q_media_manifest(spark, sf_dir):
    """Multimodal manifest stats over the corpus's binary payload column
    (html): exact byte counts + content hashes, JVM-side only."""
    from sparksearch.multimodal import media_manifest
    media = media_manifest(C.pages_df(spark, sf_dir))
    return (media.select(
        "media_id", "kind",
        F.octet_length("payload").cast("long").alias("n_bytes"),
        F.md5("payload").alias("content_md5"))
        .orderBy("media_id"))


def q_sort_by_field(spark, sf_dir):
    d = _ix(spark, sf_dir).docs
    return (d.select("docid", "url", "lang", "dl")
            .orderBy(F.col("lang").asc_nulls_last(), F.col("dl").desc(),
                     F.col("docid").asc())
            .limit(20))


# ---------------------------------------------------------------------------
# oracle SQL twins
# ---------------------------------------------------------------------------

def _media_manifest_sql() -> str:
    # the html template keys its comment rule off the ORIGINAL doc_id, so
    # derive straight from documents (the pages CTE's docid is the url rank)
    from sparksearch.corpus import html_template_sql
    html = html_template_sql("d.text", "d.doc_id")
    return f"""
SELECT 'https://site' || (d.doc_id % 97) || '.example/p/' ||
       lpad(CAST(d.doc_id AS VARCHAR), 8, '0') AS media_id,
       'html' AS kind,
       CAST(octet_length(encode({html})) AS BIGINT) AS n_bytes,
       md5({html}) AS content_md5
FROM documents d
ORDER BY media_id
""".strip()


def sqls() -> dict[str, str]:
    P, TOK, DL = C._PAGES, C._TOK, C._DL
    idf, tfn = C._idf_sql, C._tfn_sql
    return {
        "sliced_scroll": f"""
WITH {P}
SELECT docid, url FROM pages
WHERE (instr('0123456789abcdef', substring(md5(url), 1, 1)) - 1) % 4 = 0
ORDER BY docid LIMIT 20
""".strip(),
        "terms_lookup": f"""
WITH {P},
top_langs AS ( SELECT lang FROM pages GROUP BY lang
               ORDER BY count(*) DESC, lang ASC LIMIT 2 )
SELECT docid, url, lang FROM pages
WHERE lang IN ( SELECT lang FROM top_langs )
ORDER BY docid LIMIT 20
""".strip(),
        "prefix_keyword": f"""
WITH {P}
SELECT docid, url FROM pages
WHERE url LIKE 'https://site1%' AND lang IS NOT NULL
ORDER BY docid LIMIT 20
""".strip(),
        "agg_weighted_avg": f"""
WITH {P}, {TOK}, {DL}
SELECT CAST(round(sum(CAST(dl AS DOUBLE) * (docid % 3 + 1))
                  / sum(CAST(docid % 3 + 1 AS DOUBLE)), 6) AS DOUBLE)
       AS weighted_avg_dl
FROM dlq
""".strip(),
        "agg_median_abs_dev": f"""
WITH {P}, {TOK}, {DL},
med AS ( SELECT quantile_cont(CAST(dl AS DOUBLE), 0.5) AS m FROM dlq )
SELECT CAST(round(quantile_cont(abs(CAST(dl AS DOUBLE) - med.m), 0.5), 6)
            AS DOUBLE) AS mad_dl
FROM dlq, med
""".strip(),
        "query_distance_feature": f"""
WITH {P}, {TOK}, {DL},
tf AS ( SELECT docid, count(*) AS tf FROM tok WHERE term = 'join'
        GROUP BY docid ),
dft AS ( SELECT count(*) AS df FROM tf ),
sc AS ( SELECT tf.docid,
               {idf('dft.df', 'g.n')} * {tfn('tf.tf', 'dlq.dl_q', 'g.avgdl')}
               AS score
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
        "rank_eval": f"""
WITH rated AS ( {C.match_sql('hash join', operator='and', k=_RELEVANT_K)} ),
ranked AS ( {C.match_sql('hash join', k=10)} ),
rr AS ( SELECT docid, score,
        row_number() OVER (ORDER BY score DESC, docid ASC) AS rank
        FROM ranked ),
j AS ( SELECT rr.rank,
              CASE WHEN rated.docid IS NOT NULL THEN 1 ELSE 0 END AS rel
       FROM rr LEFT JOIN rated ON rated.docid = rr.docid )
SELECT CAST(round(sum(rel) / 10.0, 6) AS DOUBLE) AS precision_at_10,
       CAST(round(max(CASE WHEN rel = 1 THEN 1.0 / rank ELSE 0.0 END), 6)
            AS DOUBLE) AS mrr
FROM j
""".strip(),
        "media_manifest": _media_manifest_sql(),
        "ingest_pipeline": _ingest_pipeline_sql(),
        "sort_by_field": f"""
WITH {P}, {TOK}, {DL}
SELECT p.docid, p.url, p.lang, CAST(dlq.dl AS BIGINT) AS dl
FROM pages p JOIN dlq USING (docid)
ORDER BY p.lang ASC NULLS LAST, dlq.dl DESC, p.docid ASC
LIMIT 20
""".strip(),
    }


def queries() -> dict:
    return {
        "sliced_scroll": q_sliced_scroll,
        "terms_lookup": q_terms_lookup,
        "prefix_keyword": q_prefix_keyword,
        "agg_weighted_avg": q_weighted_avg,
        "agg_median_abs_dev": q_median_abs_dev,
        "query_distance_feature": q_distance_feature,
        "rank_eval": q_rank_eval,
        "sort_by_field": q_sort_by_field,
        "media_manifest": q_media_manifest,
        "ingest_pipeline": q_ingest_pipeline,
    }


def oracle_sql() -> dict:
    return sqls()


# ---------------------------------------------------------------------------
# ingest pipeline processors (SURVEY.md §2.1/§2.8: grok, json, date, csv,
# gsub, convert — modules/ingest-common in the reference)
# ---------------------------------------------------------------------------

def q_ingest_pipeline(spark, sf_dir):
    """The reference's ingest processors as a withColumn chain over a raw
    log-line reconstruction: grok-style regexp field extraction, json
    extraction, date parse roundtrip, csv split, gsub, numeric convert."""
    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    log = F.concat(F.col("event_type"), F.lit(" user="),
                   F.col("user_id").cast("string"),
                   F.lit(" k="),
                   F.get_json_object("props", "$.k"))
    csvline = F.concat_ws(",", F.col("event_type"),
                          F.col("user_id").cast("string"))
    out = (ev
           .withColumn("_log", log)
           .select(
               "event_id",
               # grok: named-field extraction from the raw line
               F.regexp_extract("_log", r"^(\w+) user=", 1).alias("g_type"),
               F.regexp_extract("_log", r"user=([0-9]+)", 1)
               .cast("long").alias("g_user"),
               # json processor
               F.get_json_object("props", "$.k").cast("int").alias("j_k"),
               # date processor: format + reparse (second precision)
               F.to_timestamp(
                   F.date_format("ts", "yyyy-MM-dd HH:mm:ss"),
                   "yyyy-MM-dd HH:mm:ss").alias("d_ts"),
               # csv processor
               F.split(csvline, ",").getItem(1).cast("long").alias("c_user"),
               # gsub + lowercase processors
               F.regexp_replace(F.lower("event_type"), "[aeiou]", "*")
               .alias("s_type"),
               # convert processor (2-decimal fixed-point to integer cents)
               F.round(F.col("value") * 100).cast("long").alias("v_cents"),
           )
           .orderBy("event_id"))
    return out


def _ingest_pipeline_sql() -> str:
    return r"""
SELECT event_id,
       regexp_extract(event_type || ' user=' || CAST(user_id AS VARCHAR)
                      || ' k=' || json_extract_string(props, '$.k'),
                      '^(\w+) user=', 1) AS g_type,
       CAST(regexp_extract(event_type || ' user=' || CAST(user_id AS VARCHAR)
                           || ' k=' || json_extract_string(props, '$.k'),
                           'user=([0-9]+)', 1) AS BIGINT) AS g_user,
       CAST(json_extract_string(props, '$.k') AS INT) AS j_k,
       strptime(strftime(ts, '%Y-%m-%d %H:%M:%S'),
                '%Y-%m-%d %H:%M:%S') AS d_ts,
       CAST(string_split(event_type || ',' || CAST(user_id AS VARCHAR),
                         ',')[2] AS BIGINT) AS c_user,
       regexp_replace(lower(event_type), '[aeiou]', '*', 'g') AS s_type,
       CAST(round(value * 100) AS BIGINT) AS v_cents
FROM events
ORDER BY event_id
""".strip()
