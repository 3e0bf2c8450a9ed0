"""Driver-contract entries, round-2m surface: the classic scroll cursor
and the mapper layer (multi-fields, ignore_above, normalizer, null_value,
copy_to, scaled_float, dynamic-mapping defaults).

References: sv/rest/action/search/RestSearchScrollAction.java (scroll),
sv/index/mapper/KeywordFieldMapper.java (ignore_above / normalizer /
null_value), sv/index/mapper/FieldMapper.java CopyTo,
modules/mapper-extras ScaledFloatFieldMapper.java, and the
DocumentParser dynamic-mapping defaults (string → text + .keyword
ignore_above 256).

Every mapped doc value is a pure Catalyst expression on the pages scan —
the oracles recompute the identical semantics in DuckDB SQL.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from sparksearch import contract as C


# ---------------------------------------------------------------------------
# classic scroll
# ---------------------------------------------------------------------------

def q_scroll_pages(spark, sf_dir):
    """Scroll cursor continuation: open a scroll (size 7) over a sorted
    filter-context query, drain pages 2 and 3 through the keyset cursor
    the PIT-pinned scroll state carries, and return their union — rows
    8..21 of the total order. Exercises scroll_open → scroll_next ×2."""
    from sparksearch.api import scroll_next, scroll_open
    _, ex = C.get_engine(spark, sf_dir)
    body = {"query": {"term": {"lang": "de"}},
            "sort": [{"warc_ts": "asc"}], "size": 7,
            "_source": {"includes": ["warc_ts"]}}
    _, st = scroll_open(ex, body)
    rows2, st = scroll_next(spark, st)
    rows3, st = scroll_next(spark, st)
    data = [(r["docid"], r["url"], r["warc_ts"]) for r in rows2 + rows3]
    return spark.createDataFrame(
        data, "docid long, url string, warc_ts timestamp")


# ---------------------------------------------------------------------------
# mapper layer
# ---------------------------------------------------------------------------

def q_mapping_multifield(spark, sf_dir):
    """Dynamic-default multi-field: `text` mapped as text + `.keyword`
    sub-field with ignore_above 256 (the DocumentParser default for an
    unseen string). Per-lang count of docs whose keyword doc value
    exists — texts longer than the cutoff have a NULL sub-field value,
    exactly KeywordFieldMapper.ignoreAbove's silent drop."""
    from sparksearch.mappings import apply_mappings, infer_mappings
    pages = C.pages_df(spark, sf_dir)
    inferred = infer_mappings(pages)["properties"]["text"]
    mapped = apply_mappings(pages, {"properties": {"text": inferred}})
    return (mapped.groupBy("lang")
            .agg(F.count(F.col("`text.keyword`")).alias("kw_count"),
                 F.count(F.lit(1)).alias("total"))
            .orderBy("lang"))


def q_mapping_null_value(spark, sf_dir):
    """keyword null_value + normalizer: a source field that is NULL for
    de pages and UPPERCASED otherwise; the mapping fills NULL with
    'UNKNOWN' then the lowercase normalizer runs over every indexed
    value (null_value included, as in the reference mapper chain).
    Terms-agg counts over the mapped doc value."""
    from sparksearch.mappings import apply_mappings
    pages = C.pages_df(spark, sf_dir).withColumn(
        "lang_tag", F.when(F.col("lang") != "de", F.upper("lang")))
    mapped = apply_mappings(
        pages, {"properties": {"lang_tag": {
            "type": "keyword", "normalizer": "lowercase",
            "null_value": "UNKNOWN"}}})
    return (mapped.groupBy(F.col("lang_tag").alias("key"))
            .agg(F.count(F.lit(1)).alias("doc_count"))
            .orderBy(F.col("doc_count").desc(), F.col("key").asc()))


def q_mapping_scaled_float(spark, sf_dir):
    """scaled_float (mapper-extras): quality = doc_id/3 mapped with
    scaling_factor 100 — the doc value is round(quality*100) stored as a
    long, and every query sees the DECODED stored/100 double, so the
    range filter below selects on the scaled-long lattice, not the raw
    input. Returns (doc_id, stored long, decoded double) for decoded in
    [30, 40]."""
    from sparksearch.mappings import apply_mappings
    pages = C.pages_df(spark, sf_dir).withColumn(
        "doc_id", F.expr("CAST(right(url, 8) AS BIGINT)")).withColumn(
        "quality", F.col("doc_id") / F.lit(3.0))
    mapped = apply_mappings(
        pages, {"properties": {"quality": {
            "type": "scaled_float", "scaling_factor": 100}}})
    return (mapped
            .filter((F.col("`quality.value`") >= 30.0)
                    & (F.col("`quality.value`") <= 40.0))
            .select("doc_id",
                    F.col("`quality.stored`").alias("stored"),
                    F.col("`quality.value`").alias("decoded"))
            .orderBy("doc_id"))


def q_mapping_copy_to(spark, sf_dir):
    """copy_to: `lang` and the url's host copied into a `tags` field —
    a term query against the copied field sees both source values
    (FieldMapper CopyTo builds the target's value list; _source is
    untouched). Pages tagged site7.example, in url order."""
    from sparksearch.mappings import apply_mappings
    pages = C.pages_df(spark, sf_dir).withColumn(
        "site", F.regexp_extract("url", r"https://([^/]+)/", 1))
    mapped = apply_mappings(
        pages, {"properties": {
            "lang": {"type": "keyword", "copy_to": "tags"},
            "site": {"type": "keyword", "copy_to": "tags"}}})
    return (mapped.filter(F.array_contains("tags", "site7.example"))
            .select("url", "lang", "tags")
            .orderBy("url"))


def queries() -> dict:
    return {
        "scroll_pages": q_scroll_pages,
        "mapping_multifield": q_mapping_multifield,
        "mapping_null_value": q_mapping_null_value,
        "mapping_scaled_float": q_mapping_scaled_float,
        "mapping_copy_to": q_mapping_copy_to,
    }


def oracle_sql() -> dict:
    P = C._PAGES
    out = {}
    out["scroll_pages"] = f"""
WITH {P}
SELECT docid, url, warc_ts FROM pages
WHERE lang = 'de'
ORDER BY warc_ts ASC, docid ASC
LIMIT 14 OFFSET 7
""".strip()
    out["mapping_multifield"] = f"""
WITH {P}
SELECT lang,
       count(CASE WHEN length(text) <= 256 THEN text END) AS kw_count,
       count(*) AS total
FROM pages GROUP BY lang ORDER BY lang
""".strip()
    out["mapping_null_value"] = f"""
WITH {P}
SELECT lower(coalesce(CASE WHEN lang <> 'de' THEN upper(lang) END,
                      'UNKNOWN')) AS key,
       count(*) AS doc_count
FROM pages GROUP BY 1 ORDER BY doc_count DESC, key ASC
""".strip()
    out["mapping_scaled_float"] = f"""
WITH {P},
q AS ( SELECT CAST(right(url, 8) AS BIGINT) AS doc_id,
              CAST(round(CAST(right(url, 8) AS BIGINT) / 3.0 * 100, 0)
                   AS BIGINT) AS stored
       FROM pages )
SELECT doc_id, stored, stored / 100.0 AS decoded
FROM q
WHERE stored / 100.0 BETWEEN 30.0 AND 40.0
ORDER BY doc_id
""".strip()
    out["mapping_copy_to"] = f"""
WITH {P}
SELECT url, lang, [lang, split_part(url, '/', 3)] AS tags
FROM pages
WHERE split_part(url, '/', 3) = 'site7.example' OR lang = 'site7.example'
ORDER BY url
""".strip()
    return out
