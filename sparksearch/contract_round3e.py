"""Round-3 contract entries: structured field types.

`ip` term-CIDR / numeric range+sort, `range` field ShapeRelations, and
`_doc_count` pre-aggregated bucket counts (fieldtypes.py; reference
IpFieldMapper.java, RangeType.java, DocCountFieldMapper.java).

Events carry no IP / interval columns, so each entry synthesizes them
deterministically from user_id/event_id with arithmetic both sides
recompute independently (the agg_ip_range pattern).
"""

from __future__ import annotations

from pyspark.sql import functions as F


def _ips(ev):
    ip = F.concat_ws(".", F.lit(10), (F.col("user_id") % 200).cast("int"),
                     F.lit(0), (F.col("user_id") % 250).cast("int"))
    return ev.withColumn("ip", ip)


_IPN_SQL = "(10 * 16777216 + (user_id % 200) * 65536 + (user_id % 250))"
_IPS_SQL = ("('10.' || CAST(user_id % 200 AS VARCHAR) || '.0.' || "
            "CAST(user_id % 250 AS VARCHAR))")


def q_ip_field_cidr(spark, sf_dir):
    """term on an ip field with CIDR notation: 10.32.0.0/11 covers
    second octet 32..63 (IpFieldMapper.termQuery -> parseCidr)."""
    from sparksearch.fieldtypes import ip_term_cond
    ev = _ips(spark.read.parquet(f"{sf_dir}/events.parquet"))
    return (ev.where(ip_term_cond(F.col("ip"), "10.32.0.0/11"))
            .select("event_id", "ip")
            .orderBy("event_id").limit(25))


def sql_ip_field_cidr() -> str:
    # /11 network 10.32.0.0 -> [10*2^24 + 32*2^16, + 2^21 - 1]
    lo = 10 * 16777216 + 32 * 65536
    hi = lo + 2097152 - 1
    return f"""
SELECT event_id, {_IPS_SQL} AS ip FROM events
WHERE {_IPN_SQL} BETWEEN {lo} AND {hi}
ORDER BY event_id LIMIT 25
""".strip()


def q_ip_field_sort(spark, sf_dir):
    """ip range + sort compare numerically: 10.9.x < 10.10.x < 10.100.x,
    the opposite of string order (IpFieldMapper.rangeQuery)."""
    from sparksearch.fieldtypes import ip_num, ip_range_cond
    ev = _ips(spark.read.parquet(f"{sf_dir}/events.parquet"))
    return (ev.where(ip_range_cond(F.col("ip"), gte="10.9.0.0",
                                   lt="10.100.0.0"))
            .select("event_id", "ip")
            .orderBy(ip_num(F.col("ip")), F.col("event_id"))
            .limit(30))


def sql_ip_field_sort() -> str:
    lo = 10 * 16777216 + 9 * 65536
    hi = 10 * 16777216 + 100 * 65536
    return f"""
SELECT event_id, {_IPS_SQL} AS ip FROM events
WHERE {_IPN_SQL} >= {lo} AND {_IPN_SQL} < {hi}
ORDER BY {_IPN_SQL}, event_id LIMIT 30
""".strip()


def q_range_field_rel(spark, sf_dir):
    """range-typed field {gte, lte} vs window [5, 12] under all three
    ShapeRelations (RangeType.createRangeQuery)."""
    from sparksearch.fieldtypes import range_relation_cond
    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    lo = (F.col("user_id") % 20).cast("int")
    r = ev.withColumn("rng", F.struct(
        lo.alias("gte"),
        (lo + (F.col("event_id") % 5).cast("int")).alias("lte")))
    aggs = [F.sum(range_relation_cond(F.col("rng"), 5, 12, rel)
                  .cast("long")).alias(rel)
            for rel in ("intersects", "within", "contains")]
    agg = r.agg(*aggs)
    parts = [F.struct(F.lit(i).alias("o"), F.lit(rel).alias("relation"),
                      F.col(rel).alias("doc_count"))
             for i, rel in enumerate(("intersects", "within", "contains"))]
    return (agg.select(F.explode(F.array(*parts)).alias("b"))
            .select("b.relation", F.col("b.doc_count").cast("long")
                    .alias("doc_count"), F.col("b.o").alias("_o"))
            .orderBy("_o").drop("_o"))


def sql_range_field_rel() -> str:
    return """
WITH r AS ( SELECT (user_id % 20) AS lo,
                   (user_id % 20) + (event_id % 5) AS hi FROM events )
SELECT relation, doc_count FROM (
  SELECT 'intersects' AS relation,
         CAST(sum(CASE WHEN lo <= 12 AND hi >= 5 THEN 1 ELSE 0 END)
              AS BIGINT) AS doc_count, 0 AS o FROM r
  UNION ALL
  SELECT 'within',
         CAST(sum(CASE WHEN lo >= 5 AND hi <= 12 THEN 1 ELSE 0 END)
              AS BIGINT), 1 FROM r
  UNION ALL
  SELECT 'contains',
         CAST(sum(CASE WHEN lo <= 5 AND hi >= 12 THEN 1 ELSE 0 END)
              AS BIGINT), 2 FROM r )
ORDER BY o
""".strip()


def q_agg_doc_count(spark, sf_dir):
    """terms agg over pre-aggregated rows: bucket counts =
    sum(_doc_count), not row counts (DocCountFieldMapper)."""
    from sparksearch.fieldtypes import terms_agg_doc_count
    ev = (spark.read.parquet(f"{sf_dir}/events.parquet")
          .withColumn("_doc_count",
                      ((F.col("user_id") % 7) + 1).cast("int")))
    return terms_agg_doc_count(ev, "event_type", size=10)


def sql_agg_doc_count() -> str:
    return """
SELECT event_type AS key,
       CAST(sum((user_id % 7) + 1) AS BIGINT) AS doc_count
FROM events GROUP BY event_type
ORDER BY doc_count DESC, key ASC LIMIT 10
""".strip()


def q_sessionize(spark, sf_dir):
    """Gaps-and-islands sessionization of the event log (30-min gap),
    summarized per user — the batch analogue of session_window and the
    first step of most event-training pipelines (dataops.sessionize)."""
    from sparksearch.dataops import session_stats
    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    return session_stats(ev, gap_minutes=30)


def sql_sessionize() -> str:
    # floor(epoch()) mirrors Spark's timestamp->long truncation so a
    # fractional-second gap straddling 1800 s can't split the two sides
    return """
WITH s AS ( SELECT user_id, ts,
        CASE WHEN lag(ts) OVER w IS NULL
             OR CAST(floor(epoch(ts)) AS BIGINT)
                - CAST(floor(epoch(lag(ts) OVER w)) AS BIGINT) > 1800
             THEN 1 ELSE 0 END AS brk
    FROM events WINDOW w AS (PARTITION BY user_id ORDER BY ts) ),
sid AS ( SELECT user_id,
                sum(brk) OVER (PARTITION BY user_id ORDER BY ts
                               ROWS UNBOUNDED PRECEDING) AS session_id
         FROM s ),
per AS ( SELECT user_id, session_id, count(*) AS n
         FROM sid GROUP BY user_id, session_id )
SELECT user_id, CAST(count(*) AS BIGINT) AS n_sessions,
       CAST(sum(n) AS BIGINT) AS n_events,
       CAST(max(n) AS BIGINT) AS max_session_events
FROM per GROUP BY user_id ORDER BY user_id
""".strip()


def q_ext_stats_bucket(spark, sf_dir):
    """extended_stats_bucket over the per-event_type doc_count buckets
    (the last sibling pipeline agg in the reference registry without an
    entry)."""
    from sparksearch.aggs import extended_stats_bucket
    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    buckets = ev.groupBy(F.col("event_type").alias("key")).agg(
        F.count(F.lit(1)).alias("doc_count"))
    return extended_stats_bucket(buckets, "doc_count", sigma=2.0)


def sql_ext_stats_bucket() -> str:
    return """
WITH b AS ( SELECT count(*) AS dc FROM events GROUP BY event_type )
SELECT CAST(count(*) AS BIGINT) AS count,
       CAST(min(dc) AS DOUBLE) AS min, CAST(max(dc) AS DOUBLE) AS max,
       round(avg(dc), 6) AS avg, round(sum(dc), 6) AS sum,
       round(sum(dc * dc), 6) AS sum_of_squares,
       round(var_pop(dc), 6) AS variance,
       round(stddev_pop(dc), 6) AS std_deviation,
       round(round(avg(dc), 6) + 2.0 * round(stddev_pop(dc), 6), 6)
         AS std_upper,
       round(round(avg(dc), 6) - 2.0 * round(stddev_pop(dc), 6), 6)
         AS std_lower
FROM b
""".strip()


def q_ingest_pipeline3(spark, sf_dir):
    """Third ingest-processor batch (modules/ingest-common): set (literal
    field), rename, split -> sort -> dedupe -> join over an array field,
    bytes (unit-suffix parse), and foreach (per-element transform)."""
    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    toks = F.split(F.concat_ws(",", "event_type", "event_type",
                               F.lit("zz")), ",")
    return (ev.select(
        "event_id",
        F.lit("web").alias("p_source"),                     # set
        F.col("event_type").alias("p_kind"),                # rename
        F.array_join(F.array_sort(F.array_distinct(toks)),  # split/sort/
                     "-").alias("p_tags"),                  # dedupe/join
        (F.regexp_extract(F.concat(F.col("user_id").cast("string"),
                                   F.lit("kb")), r"^(\d+)kb$", 1)
         .cast("long") * 1024).alias("p_bytes"),            # bytes
        F.array_join(F.transform(toks, lambda x: F.upper(x)),
                     ",").alias("p_upper"),                 # foreach
    ).orderBy("event_id"))


def sql_ingest_pipeline3() -> str:
    return """
SELECT event_id,
       'web' AS p_source,
       event_type AS p_kind,
       array_to_string(list_sort(list_distinct(string_split(
           event_type || ',' || event_type || ',zz', ','))), '-') AS p_tags,
       CAST(regexp_extract(CAST(user_id AS VARCHAR) || 'kb',
                           '^([0-9]+)kb$', 1) AS BIGINT) * 1024 AS p_bytes,
       array_to_string(list_transform(string_split(
           event_type || ',' || event_type || ',zz', ','),
           x -> upper(x)), ',') AS p_upper
FROM events ORDER BY event_id
""".strip()


def q_chunk_documents(spark, sf_dir):
    """RAG-style overlapping character chunking (size 120, overlap 40)
    over the documents table — map-only sequence+explode, no UDF
    (dataops.chunk_documents)."""
    from sparksearch.dataops import chunk_documents
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    return (chunk_documents(docs, size=120, overlap=40)
            .orderBy("doc_id", "chunk_id"))


def sql_chunk_documents() -> str:
    return """
WITH d AS ( SELECT doc_id, text, length(text) AS L FROM documents ),
ser AS ( SELECT generate_series AS start
         FROM generate_series(0, 100000, 80) ),
s AS ( SELECT d.doc_id, d.text, ser.start
       FROM d JOIN ser ON ser.start <= greatest(d.L - 1, 0) )
SELECT doc_id,
       CAST(row_number() OVER (PARTITION BY doc_id ORDER BY start) - 1
            AS INT) AS chunk_id,
       CAST(start AS INT) AS chunk_start,
       substr(text, CAST(start + 1 AS INT), 120) AS chunk_text
FROM s
WHERE length(substr(text, CAST(start + 1 AS INT), 120)) > 0
ORDER BY doc_id, chunk_id
""".strip()


def _q_lang_analyzer(lang: str, probes):
    """Prebuilt language analyzer (lang_analyzers.py) through the real
    Arrow-UDF analyze path, vs hand goldens (elision + stop position
    holes + stemmer)."""
    from functools import reduce

    def run(spark, sf_dir):
        from sparksearch.build import tokenize_udf
        outs = []
        for pid, text in probes:
            df = spark.createDataFrame([(text,)], "text string")
            tok = df.withColumn("_t", tokenize_udf(lang)(F.col("text")))
            outs.append(tok.select(
                F.lit(pid).alias("probe"),
                F.explode(F.arrays_zip("_t.terms", "_t.poss")).alias("tp"))
                .select("probe", F.col("tp.terms").alias("term"),
                        F.col("tp.poss").cast("int").alias("pos")))
        return (reduce(lambda a, b: a.unionAll(b), outs)
                .orderBy("probe", "pos", "term"))
    run.__name__ = f"q_lang_analyzer_{lang}"
    run.__doc__ = (f"prebuilt {lang} analyzer vs hand goldens "
                   f"(lang_analyzers.py; Lucene analyzer composition)")
    return run


# ---------------------------------------------------------------------------
# round-3e analysis filters: serbian/hindi/sorani normalization, czech_stem,
# concatenate_graph — goldens through the real Arrow-UDF analyze path
# ---------------------------------------------------------------------------

_LN_SETTINGS = {"tokenizer": "whitespace",
                "filter": ["lowercase", "serbian_normalization",
                           "hindi_normalization", "sorani_normalization"]}
_LN_PROBES = [(0, "Ђачки џез"), (1, "क़रीब हाँ"), (2, "يك table")]
#: hand-derived: ђачки -> djacki, џез -> dzez (bald-latin translit);
#: क़रीब nukta-folds to करीब, हाँ chandrabindu -> हां; يك folds to یک
_LN_GOLDENS = [
    (0, "djacki", 0), (0, "dzez", 1),
    (1, "करीब", 0), (1, "हां", 1),
    (2, "یک", 0), (2, "table", 1),
]

_CC_SETTINGS = {"tokenizer": "whitespace",
                "filter": ["lowercase",
                           {"type": "stemmer", "language": "czech"},
                           "concatenate_graph"]}
_CC_PROBES = [(0, "Hrady ženami"), (1, "otcov")]
#: czech light: hrady -> hrad, ženami -> žen; concatenate_graph joins the
#: stream into ONE token at position 0 with the default " " separator
_CC_GOLDENS = [(0, "hrad žen", 0), (1, "otc", 0)]


_SNOW_DE_PROBES = [(0, "Häuser Kinder arbeiten"),
                   (1, "Schönheit Bücher")]
#: hand-derived from the Snowball German spec (R1 suffix steps + umlaut
#: unfold): häuser->haus, kinder->kind, arbeiten->arbeit,
#: schönheit->schonheit (heit outside R2), bücher->buch
_SNOW_DE_GOLDENS = [(0, "haus", 0), (0, "kind", 1), (0, "arbeit", 2),
                    (1, "schonheit", 0), (1, "buch", 1)]

_SNOW_FR_PROBES = [(0, "continuer mangeaient"), (1, "châteaux nationale")]
#: hand-traced from the Snowball French spec (see tests/test_stemmers.py)
_SNOW_FR_GOLDENS = [(0, "continu", 0), (0, "mang", 1),
                    (1, "château", 0), (1, "national", 1)]

_SNOW_ES_PROBES = [(0, "cantando canciones"), (1, "trabajadores libros")]
#: hand-traced from the Snowball Spanish spec
_SNOW_ES_GOLDENS = [(0, "cant", 0), (0, "cancion", 1),
                    (1, "trabaj", 0), (1, "libr", 1)]

_LC_SETTINGS = {"tokenizer": "whitespace",
                "filter": [{"type": "lowercase", "language": "turkish"}]}
_LC_PROBES = [(0, "İSTANBUL DİYARBAKIR ISPARTA")]
#: Turkish casing: dotted İ -> i, dotless I -> ı
_LC_GOLDENS = [(0, "istanbul", 0), (0, "diyarbakır", 1),
               (0, "ısparta", 2)]
_LCG_SETTINGS = {"tokenizer": "whitespace",
                 "filter": [{"type": "lowercase", "language": "greek"}]}
_LCG_PROBES = [(0, "ΚΑΛΌΣ Ελλάς ΜΑΪΟΣ")]
#: Greek lowercase folds accents/diaeresis and final sigma
_LCG_GOLDENS = [(0, "καλοσ", 0), (0, "ελλασ", 1), (0, "μαιοσ", 2)]

_LA_FR_PROBES = [(0, "L'église et les chanteurs")]
#: prebuilt french analyzer: elision strips l', et/les stop out leaving
#: position holes, snowball stems église->églis chanteurs->chanteur
_LA_FR_GOLDENS = [(0, "églis", 0), (0, "chanteur", 3)]
_LA_DE_PROBES = [(0, "Die Häuser und Kinder")]
_LA_DE_GOLDENS = [(0, "haus", 1), (0, "kind", 3)]

_SNOW_SV_PROBES = [(0, "bilarna flickorna"), (1, "starkaste vänligt")]
_SNOW_SV_GOLDENS = [(0, "bil", 0), (0, "flick", 1),
                    (1, "stark", 0), (1, "vän", 1)]
_SNOW_DA_PROBES = [(0, "bilerne kvinderne"), (1, "huset venligst")]
_SNOW_DA_GOLDENS = [(0, "bil", 0), (0, "kvind", 1),
                    (1, "hus", 0), (1, "ven", 1)]
_SNOW_NO_PROBES = [(0, "bilene mulighetene"), (1, "vakkert norske")]
_SNOW_NO_GOLDENS = [(0, "bil", 0), (0, "mul", 1),
                    (1, "vakker", 0), (1, "norsk", 1)]
_SNOW_IT_PROBES = [(0, "ragazzi parlando"), (1, "abbandonata lunghe")]
_SNOW_IT_GOLDENS = [(0, "ragazz", 0), (0, "parl", 1),
                    (1, "abbandon", 0), (1, "lung", 1)]
_SNOW_PT_PROBES = [(0, "gatos cantando"), (1, "bandeira falou")]
_SNOW_PT_GOLDENS = [(0, "gat", 0), (0, "cant", 1),
                    (1, "bandeir", 0), (1, "fal", 1)]

_P2_PROBES = [(0, "crying skies generously"), (1, "relational feed")]
#: porter2 (Snowball English) — distinct from Porter1 on these exact
#: words (porter1: crying->cry, skies->ski, relational->relat too but
#: generously->gener)
_P2_GOLDENS = [(0, "cri", 0), (0, "sky", 1), (0, "generous", 2),
               (1, "relat", 0), (1, "feed", 1)]

_SNOW_NL_PROBES = [(0, "boeken huizen"), (1, "katten aanbiedingen")]
#: hand-traced from the Snowball Dutch spec
_SNOW_NL_GOLDENS = [(0, "boek", 0), (0, "huiz", 1),
                    (1, "kat", 0), (1, "aanbied", 1)]

_SNOW_RU_PROBES = [(0, "книгами красивый"), (1, "читала осталось")]
#: Snowball Russian spec: noun -ами, adjectival -ый, verb -ла,
#: reflexive -сь then verb -ло + trailing vowel
_SNOW_RU_GOLDENS = [(0, "книг", 0), (0, "красив", 1),
                    (1, "чита", 0), (1, "оста", 1)]


def queries() -> dict:
    from sparksearch.contract_round3b import _q_stem_goldens
    from sparksearch.contract_round3d import _q_filter_goldens
    return {
        "ip_field_cidr": q_ip_field_cidr,
        "ip_field_sort": q_ip_field_sort,
        "range_field_rel": q_range_field_rel,
        "agg_doc_count": q_agg_doc_count,
        "sessionize_events": q_sessionize,
        "agg_ext_stats_bucket": q_ext_stats_bucket,
        "ingest_pipeline3": q_ingest_pipeline3,
        "tf_lang_norms": _q_filter_goldens(
            "an_lang_norms", _LN_SETTINGS, _LN_PROBES,
            "serbian/hindi/sorani normalization filters vs hand goldens"),
        "tf_concat_czech": _q_filter_goldens(
            "an_concat_cz", _CC_SETTINGS, _CC_PROBES,
            "czech light stemmer + concatenate_graph vs hand goldens"),
        "stem_snowball_de": _q_stem_goldens("an_snow_de", "german",
                                            _SNOW_DE_PROBES),
        "stem_snowball_ru": _q_stem_goldens("an_snow_ru", "russian",
                                            _SNOW_RU_PROBES),
        "stem_snowball_fr": _q_stem_goldens("an_snow_fr", "french",
                                            _SNOW_FR_PROBES),
        "stem_snowball_es": _q_stem_goldens("an_snow_es", "spanish",
                                            _SNOW_ES_PROBES),
        "stem_snowball_nl": _q_stem_goldens("an_snow_nl", "dutch",
                                            _SNOW_NL_PROBES),
        "stem_porter2": _q_stem_goldens("an_porter2", "porter2",
                                        _P2_PROBES),
        "stem_snowball_sv": _q_stem_goldens("an_snow_sv", "swedish",
                                            _SNOW_SV_PROBES),
        "stem_snowball_da": _q_stem_goldens("an_snow_da", "danish",
                                            _SNOW_DA_PROBES),
        "stem_snowball_no": _q_stem_goldens("an_snow_no", "norwegian",
                                            _SNOW_NO_PROBES),
        "stem_snowball_it": _q_stem_goldens("an_snow_it", "italian",
                                            _SNOW_IT_PROBES),
        "stem_snowball_pt": _q_stem_goldens("an_snow_pt", "portuguese",
                                            _SNOW_PT_PROBES),
        "lang_analyzer_fr": _q_lang_analyzer("french", _LA_FR_PROBES),
        "lang_analyzer_de": _q_lang_analyzer("german", _LA_DE_PROBES),
        "chunk_documents": q_chunk_documents,
        "tf_lowercase_turkish": _q_filter_goldens(
            "an_lc_tr", _LC_SETTINGS, _LC_PROBES,
            "Turkish dotted/dotless-i lowercase vs hand goldens"),
        "tf_lowercase_greek": _q_filter_goldens(
            "an_lc_el", _LCG_SETTINGS, _LCG_PROBES,
            "Greek accent-fold + final-sigma lowercase vs hand goldens"),
    }


def oracle_sql() -> dict:
    return {
        "ip_field_cidr": sql_ip_field_cidr(),
        "ip_field_sort": sql_ip_field_sort(),
        "range_field_rel": sql_range_field_rel(),
        "agg_doc_count": sql_agg_doc_count(),
        "sessionize_events": sql_sessionize(),
        "agg_ext_stats_bucket": sql_ext_stats_bucket(),
        "ingest_pipeline3": sql_ingest_pipeline3(),
        "tf_lang_norms": _sql_goldens_3e(_LN_GOLDENS),
        "tf_concat_czech": _sql_goldens_3e(_CC_GOLDENS),
        "stem_snowball_de": _sql_goldens_3e(_SNOW_DE_GOLDENS),
        "stem_snowball_ru": _sql_goldens_3e(_SNOW_RU_GOLDENS),
        "stem_snowball_fr": _sql_goldens_3e(_SNOW_FR_GOLDENS),
        "stem_snowball_es": _sql_goldens_3e(_SNOW_ES_GOLDENS),
        "stem_snowball_nl": _sql_goldens_3e(_SNOW_NL_GOLDENS),
        "stem_porter2": _sql_goldens_3e(_P2_GOLDENS),
        "stem_snowball_sv": _sql_goldens_3e(_SNOW_SV_GOLDENS),
        "stem_snowball_da": _sql_goldens_3e(_SNOW_DA_GOLDENS),
        "stem_snowball_no": _sql_goldens_3e(_SNOW_NO_GOLDENS),
        "stem_snowball_it": _sql_goldens_3e(_SNOW_IT_GOLDENS),
        "stem_snowball_pt": _sql_goldens_3e(_SNOW_PT_GOLDENS),
        "lang_analyzer_fr": _sql_goldens_3e(_LA_FR_GOLDENS),
        "lang_analyzer_de": _sql_goldens_3e(_LA_DE_GOLDENS),
        "chunk_documents": sql_chunk_documents(),
        "tf_lowercase_turkish": _sql_goldens_3e(_LC_GOLDENS),
        "tf_lowercase_greek": _sql_goldens_3e(_LCG_GOLDENS),
    }


def _sql_goldens_3e(goldens) -> str:
    from sparksearch.contract_round3b import _sql_goldens
    return _sql_goldens(goldens)
