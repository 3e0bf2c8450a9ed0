"""Driver-contract entries, round-2n surface: nested (block-join) queries
over array-of-structs doc values, and parent/child join-field queries.

References: sv/index/query/NestedQueryBuilder.java:96-180 (path + inner
query, every clause bound to ONE nested element),
sv/index/mapper/ObjectMapper.java (nested=true storage),
modules/parent-join/.../join/query/HasChildQueryBuilder.java,
HasParentQueryBuilder.java, ParentIdQueryBuilder.java (join field:
parent + child docs in one index, shard-local join).

Spark shapes: nested = ONE exists() lambda inside the docs scan
(nested.py); has_child = filter children -> map-side-combinable count
per parent -> broadcast join into the parents scan; has_parent =
broadcast matching parent ids -> left-semi join on the child scan
(relations.py). The nested `sections` array (16-token chunks with
idx/n/first/last) is derived identically in both engines, so the gate
checks the lambda compilation itself.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from sparksearch import contract as C

_SEC = 16  # tokens per section

# ws referenced from a prior projection; sentinel row i=nsec is sliced off
_WS = "filter(split(text, ' '), w -> w <> '')"
_NSEC = "CAST(ceil(size(ws) / 16.0) AS INT)"
_SECTIONS = f"""
slice(transform(sequence(0, {_NSEC}), i -> struct(
    i AS idx,
    CAST(least(16, size(ws) - i * 16) AS INT) AS n,
    try_element_at(ws, i * 16 + 1) AS first,
    try_element_at(ws, greatest(least((i + 1) * 16, size(ws)), 1)) AS last)),
  1, {_NSEC})
""".strip()


def _sectioned(spark, sf_dir):
    return (C.pages_df(spark, sf_dir)
            .withColumn("ws", F.expr(_WS))
            .withColumn("sections", F.expr(_SECTIONS)))


def q_nested_sections(spark, sf_dir):
    """nested query: pages having >= 1 FULL (n=16) section whose first
    token is 'spark' — both clauses must hold on the SAME section (a
    short trailing section starting with 'spark' does not match; a
    flattened object field would conflate them). Filtered through the
    engine's nested_cond compiler, the exact predicate exec.py plans
    for a Nested query."""
    from sparksearch.nested import nested_cond
    from sparksearch.queries import Bool, Range, Term
    q = Bool(must=[Term("sections.first", "spark"),
                   Range("sections.n", gte=_SEC)])
    matched = ("CAST(size(filter(sections, "
               f"s -> s.first = 'spark' AND s.n >= {_SEC})) AS INT)")
    return (_sectioned(spark, sf_dir)
            .filter(nested_cond("sections", q))
            .select("url",
                    F.expr("CAST(size(sections) AS INT)").alias("n_sections"),
                    F.expr(matched).alias("matched"))
            .orderBy("url"))


def _family(spark, sf_dir):
    """One docs frame with the reference's join-field columns: parent
    rows (join_name='site') and child rows (join_name='page',
    join_parent=the site host)."""
    pages = (C.pages_df(spark, sf_dir)
             .withColumn("site",
                         F.regexp_extract("url", r"https://([^/]+)/", 1)))
    children = pages.select(
        "url", F.lit("page").alias("join_name"),
        F.col("site").alias("join_parent"), "lang",
        F.lit(None).cast("int").alias("num"))
    parents = (pages.select("site").distinct().select(
        F.col("site").alias("url"), F.lit("site").alias("join_name"),
        F.lit(None).cast("string").alias("join_parent"),
        F.lit(None).cast("string").alias("lang"),
        F.regexp_extract("site", r"site(\d+)", 1).cast("int").alias("num")))
    return parents.unionByName(children)


def q_has_child(spark, sf_dir):
    """has_child: sites having >= 2 German pages, with the child count
    (inner-hits cardinality)."""
    from sparksearch.relations import has_child
    fam = _family(spark, sf_dir)
    out = has_child(fam, "site", "page", F.col("lang") == "de",
                    min_children=2)
    return (out.select(F.col("url").alias("site"), "child_count")
            .orderBy(F.col("child_count").desc(), F.col("site").asc()))


def q_has_parent(spark, sf_dir):
    """has_parent: pages whose parent site doc matches a parent-level
    filter (site number % 7 = 3) — broadcast semi-join, no child-side
    shuffle."""
    from sparksearch.relations import has_parent
    fam = _family(spark, sf_dir)
    out = has_parent(fam, "site", "page", F.col("num") % 7 == 3)
    return out.select("url", "lang").orderBy("url").limit(40)


def q_parent_id(spark, sf_dir):
    """parent_id: children of one specific parent — a pushed-down
    equality scan on the join_parent doc value."""
    from sparksearch.relations import parent_id
    fam = _family(spark, sf_dir)
    return (parent_id(fam, "page", "site7.example")
            .select("url", "lang").orderBy("url").limit(20))


def q_nested_terms_agg(spark, sf_dir):
    """nested + reverse_nested aggregation: top-10 section first-tokens
    by NESTED doc count (elements), each with the reverse_nested
    parent-doc count."""
    from sparksearch.aggs import nested_terms
    return nested_terms(_sectioned(spark, sf_dir), "sections",
                        "sections.first", size=10)


def q_api_sort_mode(spark, sf_dir):
    """sort_mode over a multi-valued field: English pages sorted by
    (median word length desc, avg word length desc, _doc) through the
    full _search body — the MultiValueMode reduction (median = middle of
    the sorted values, even count averages the two middles) computed as
    JVM array functions inside the fetch scan."""
    from sparksearch.api import search_df
    from sparksearch.exec import Executor
    ix, _ = C.get_engine(spark, sf_dir)
    side = (C.pages_df(spark, sf_dir).select(
        "url",
        F.expr("transform(filter(split(text, ' '), w -> w <> ''), "
               "w -> length(w))").alias("lens")))
    ex = Executor(ix.with_docvalues(side))
    body = {"query": {"term": {"lang": "en"}},
            "sort": [{"lens": {"order": "desc", "mode": "median"}},
                     {"lens": {"order": "desc", "mode": "avg"}}],
            "size": 15, "_source": False}
    out = search_df(ex, body)
    return out.select("docid", "url",
                      F.round(F.col("_mode_0"), 4).alias("med_len"),
                      F.round(F.col("_mode_1"), 4).alias("avg_len"))


def queries() -> dict:
    return {
        "nested_sections": q_nested_sections,
        "api_sort_mode": q_api_sort_mode,
        "agg_nested_terms": q_nested_terms_agg,
        "join_has_child": q_has_child,
        "join_has_parent": q_has_parent,
        "join_parent_id": q_parent_id,
    }


_SEC_SQL = """
sec AS ( SELECT url, list_filter(string_split(text, ' '), w -> w <> '') AS ws
         FROM pages ),
secs AS ( SELECT url, len(ws) AS nw,
                 list_transform(range(0, CAST(ceil(len(ws) / 16.0) AS BIGINT)),
                   i -> struct_pack(idx := i,
                                    n := least(16, len(ws) - i * 16),
                                    first := ws[i * 16 + 1],
                                    last := ws[least((i + 1) * 16, len(ws))]))
                   AS sections
          FROM sec )
""".strip()


def oracle_sql() -> dict:
    P = C._PAGES
    out = {}
    out["nested_sections"] = f"""
WITH {P},
{_SEC_SQL}
SELECT url, CAST(len(sections) AS INT) AS n_sections,
       CAST(len(list_filter(sections,
                s -> s.first = 'spark' AND s.n >= {_SEC})) AS INT) AS matched
FROM secs
WHERE len(list_filter(sections,
          s -> s.first = 'spark' AND s.n >= {_SEC})) > 0
ORDER BY url
""".strip()
    out["api_sort_mode"] = f"""
WITH {P},
L AS ( SELECT docid, url, lang,
              list_transform(list_filter(string_split(text, ' '),
                                         w -> w <> ''),
                             w -> length(w)) AS lens
       FROM pages ),
K AS ( SELECT docid, url, lang,
              CASE WHEN len(lens) = 0 THEN NULL
                   WHEN len(lens) % 2 = 1
                     THEN CAST(list_sort(lens)[(len(lens) + 1) // 2]
                               AS DOUBLE)
                   ELSE (CAST(list_sort(lens)[len(lens) // 2] AS DOUBLE)
                         + CAST(list_sort(lens)[len(lens) // 2 + 1]
                                AS DOUBLE)) / 2 END AS med,
              CAST(list_sum(lens) AS DOUBLE) / len(lens) AS avg
       FROM L )
SELECT docid, url, round(med, 4) AS med_len, round(avg, 4) AS avg_len
FROM K WHERE lang = 'en'
ORDER BY med DESC, avg DESC, docid ASC
LIMIT 15
""".strip()
    out["agg_nested_terms"] = f"""
WITH {P},
{_SEC_SQL}
SELECT s['first'] AS key, CAST(count(*) AS BIGINT) AS doc_count,
       CAST(count(DISTINCT url) AS BIGINT) AS parent_doc_count
FROM ( SELECT url, unnest(sections) AS s FROM secs )
GROUP BY 1
ORDER BY doc_count DESC, key ASC
LIMIT 10
""".strip()
    out["join_has_child"] = f"""
WITH {P}
SELECT split_part(url, '/', 3) AS site,
       CAST(count(*) AS BIGINT) AS child_count
FROM pages WHERE lang = 'de'
GROUP BY 1 HAVING count(*) >= 2
ORDER BY child_count DESC, site ASC
""".strip()
    out["join_has_parent"] = f"""
WITH {P}
SELECT url, lang FROM pages
WHERE CAST(regexp_extract(split_part(url, '/', 3), 'site(\\d+)', 1) AS INT)
      % 7 = 3
ORDER BY url LIMIT 40
""".strip()
    out["join_parent_id"] = f"""
WITH {P}
SELECT url, lang FROM pages
WHERE split_part(url, '/', 3) = 'site7.example'
ORDER BY url LIMIT 20
""".strip()
    return out
