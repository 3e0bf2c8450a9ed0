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
        "ingest_pipeline2": q_ingest_pipeline2,
        "agg_ip_range": q_agg_ip_range,
    }


def oracle_sql() -> dict:
    return {
        "match_bool_prefix": sql_match_bool_prefix(),
        "percolate_queries": sql_percolate(),
        "analyze_adversarial": sql_analyze_adversarial(),
        "agg_variable_width_histogram": sql_variable_width_histogram(),
        "agg_scripted_metric": sql_scripted_metric(),
        "ingest_pipeline2": sql_ingest_pipeline2(),
        "agg_ip_range": sql_agg_ip_range(),
    }


# ---------------------------------------------------------------------------
# ingest pipeline, part 2: dissect / kv / user_agent / fingerprint / trim
# (modules/ingest-common DissectProcessor, KeyValueProcessor; modules/
# ingest-user-agent; FingerprintProcessor) — same chain pattern as the
# round-1 `ingest_pipeline` entry, new processor families
# ---------------------------------------------------------------------------

def q_ingest_pipeline2(spark, sf_dir):
    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    log = F.concat(F.col("event_type"), F.lit(" user="),
                   F.col("user_id").cast("string"),
                   F.lit(" k="),
                   F.coalesce(F.get_json_object("props", "$.k"),
                              F.lit("0")))
    # deterministic synthetic UA string per event (the processor parses
    # it back; parsing is the thing under test)
    ua = F.concat(
        F.lit("Mozilla/5.0 ("),
        F.element_at(F.array(F.lit("Linux"), F.lit("Windows"),
                             F.lit("Mac OS X")),
                     (F.col("user_id") % 3 + 1).cast("int")),
        F.lit(") "),
        F.element_at(F.array(F.lit("Chrome"), F.lit("Firefox")),
                     (F.col("user_id") % 2 + 1).cast("int")),
        F.lit("/"), (F.col("user_id") % 100).cast("string"), F.lit(".0"))
    out = (ev
           .withColumn("_log", log).withColumn("_ua", ua)
           .select(
               "event_id",
               # dissect: positional delimiter parse, NO regex
               # ("%{type} user=%{uid} k=%{k}")
               F.substring_index("_log", " user=", 1).alias("ds_type"),
               F.substring_index(F.substring_index("_log", " k=", 1),
                                 " user=", -1).cast("long").alias("ds_uid"),
               F.substring_index("_log", " k=", -1).alias("ds_k"),
               # kv processor: field_split=' ', value_split='='
               F.element_at(
                   F.str_to_map(
                       F.substring_index("_log", " ", -2),
                       F.lit(" "), F.lit("=")),
                   F.lit("k")).alias("kv_k"),
               # user_agent processor: name / major version / os
               F.regexp_extract("_ua", r"\) (\w+)/", 1).alias("ua_name"),
               F.regexp_extract("_ua", r"/(\d+)\.0$", 1)
               .cast("int").alias("ua_major"),
               F.regexp_extract("_ua", r"\(([^)]*)\)", 1).alias("ua_os"),
               # fingerprint processor: stable hash of selected fields
               F.md5(F.concat_ws("|", "event_type",
                                 F.col("user_id").cast("string")))
               .alias("fp"),
               # trim + uppercase processors
               F.upper(F.trim(F.concat(F.lit("  "), "event_type",
                                       F.lit(" ")))).alias("u_type"),
           )
           .orderBy("event_id"))
    return out


def sql_ingest_pipeline2() -> str:
    log = ("event_type || ' user=' || CAST(user_id AS VARCHAR) || ' k=' || "
           "coalesce(json_extract_string(props, '$.k'), '0')")
    ua = ("'Mozilla/5.0 (' || (CASE user_id % 3 WHEN 0 THEN 'Linux' "
          "WHEN 1 THEN 'Windows' ELSE 'Mac OS X' END) || ') ' || "
          "(CASE user_id % 2 WHEN 0 THEN 'Chrome' ELSE 'Firefox' END) || "
          "'/' || CAST(user_id % 100 AS VARCHAR) || '.0'")
    return f"""
WITH ev AS ( SELECT *, {log} AS _log, {ua} AS _ua FROM events )
SELECT event_id,
       split_part(_log, ' user=', 1) AS ds_type,
       CAST(split_part(split_part(_log, ' k=', 1), ' user=', 2) AS BIGINT)
         AS ds_uid,
       split_part(_log, ' k=', 2) AS ds_k,
       regexp_extract(_log, 'k=([^ ]*)$', 1) AS kv_k,
       regexp_extract(_ua, '\\) (\\w+)/', 1) AS ua_name,
       CAST(regexp_extract(_ua, '/(\\d+)\\.0$', 1) AS INT) AS ua_major,
       regexp_extract(_ua, '\\(([^)]*)\\)', 1) AS ua_os,
       md5(event_type || '|' || CAST(user_id AS VARCHAR)) AS fp,
       upper(trim('  ' || event_type || ' ')) AS u_type
FROM ev ORDER BY event_id
""".strip()


# ---------------------------------------------------------------------------
# ip_range agg (IpRangeAggregationBuilder) — synthetic per-event IPs
# ---------------------------------------------------------------------------

def q_agg_ip_range(spark, sf_dir):
    from sparksearch.aggs import ip_range_agg
    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    ip = F.concat_ws(".", F.lit(10), (F.col("user_id") % 200).cast("int"),
                     F.lit(0), (F.col("user_id") % 250).cast("int"))
    return ip_range_agg(ev.withColumn("ip", ip), "ip", [
        (None, "10.50.0.0"), ("10.50.0.0", "10.150.0.0"),
        ("10.150.0.0", None)])


def sql_agg_ip_range() -> str:
    num = ("(10 * 16777216 + (user_id % 200) * 65536 + (user_id % 250))")
    return f"""
WITH e AS ( SELECT {num} AS ipn FROM events )
SELECT key, doc_count FROM (
  SELECT '*-10.50.0.0' AS key,
         CAST(sum(CASE WHEN ipn < 10 * 16777216 + 50 * 65536
              THEN 1 ELSE 0 END) AS BIGINT) AS doc_count, 0 AS o FROM e
  UNION ALL
  SELECT '10.50.0.0-10.150.0.0',
         CAST(sum(CASE WHEN ipn >= 10 * 16777216 + 50 * 65536
              AND ipn < 10 * 16777216 + 150 * 65536
              THEN 1 ELSE 0 END) AS BIGINT), 1 FROM e
  UNION ALL
  SELECT '10.150.0.0-*',
         CAST(sum(CASE WHEN ipn >= 10 * 16777216 + 150 * 65536
              THEN 1 ELSE 0 END) AS BIGINT), 2 FROM e )
ORDER BY o
""".strip()
