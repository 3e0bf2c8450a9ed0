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
    the sorted values; even count averages the two middles and, for
    INTEGER doc values, rounds like the reference's long pick path,
    MultiValueMode.java:241-246) computed as JVM array functions inside
    the fetch scan."""
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


def q_nested_score_sum(spark, sf_dir):
    """Scored nested query through the REAL executor: score_mode=sum
    over constant-scoring children = the matching-element count (top-10
    pages by number of full sections opening with a stopword-ish
    token). Sections attach to the engine's docs scan as a doc-values
    sidecar; the plan is one scan + TakeOrderedAndProject."""
    from sparksearch.exec import Executor
    from sparksearch.queries import Bool, Nested, Range, Terms
    ix, _ = C.get_engine(spark, sf_dir)
    side = (_sectioned(spark, sf_dir).select("url", "sections"))
    ex = Executor(ix.with_docvalues(side))
    q = Nested("sections",
               Bool(must=[Terms("sections.first", ("the", "a", "data")),
                          Range("sections.n", gte=_SEC)]),
               score_mode="sum")
    return C.topk_rounded(ex, q, k=10)


def q_nested_inner_hits(spark, sf_dir):
    """inner_hits on a nested query: each matching page with its first
    matching section's idx and the total match count."""
    from sparksearch.nested import inner_hits
    from sparksearch.queries import Bool, Nested, Range, Term
    q = Nested("sections", Bool(must=[Term("sections.first", "spark"),
                                      Range("sections.n", gte=_SEC)]))
    out = inner_hits(_sectioned(spark, sf_dir), q, size=2)
    return (out.select(
        "url",
        F.expr("CAST(inner_hits[0].idx AS INT)").alias("first_idx"),
        F.expr("CAST(size(inner_hits) AS INT)").alias("n_hits"))
        .orderBy("url"))


# ---------------------------------------------------------------------------
# embedding k-means (clustering.py)
# ---------------------------------------------------------------------------

_KM_K, _KM_T = 4, 2


def q_kmeans_embeddings(spark, sf_dir):
    """Deterministic Lloyd's k-means over the embeddings table (init =
    k lowest-id vectors, T update iterations, means rounded to 6
    decimals so float summation order can't flip an assignment): final
    per-cluster member count + centroid L2 norm."""
    import math

    from sparksearch.clustering import kmeans
    embs = spark.read.parquet(sf_dir + "/embeddings.parquet")
    assigned, cents = kmeans(embs, k=_KM_K, iters=_KM_T)
    norms = {i: round(math.sqrt(sum(x * x for x in c)), 4)
             for i, c in enumerate(cents)}
    nmap = F.create_map(*[x for i, nv in norms.items()
                          for x in (F.lit(i), F.lit(nv))])
    return (assigned.groupBy("cl")
            .agg(F.count(F.lit(1)).cast("long").alias("n"))
            .select(F.col("cl").alias("cluster"), "n",
                    F.element_at(nmap, F.col("cl")).alias("cnorm"))
            .orderBy("cluster"))


_KM_CAP = 60


def q_cluster_sample(spark, sf_dir):
    """Cluster-balanced sampling: cap every k-means cluster at N members
    (deterministic: lowest vec_ids win) — the topic-balancing pass a
    training-mixture builder runs after clustering. Two-stage shape: the
    per-cluster rank is a window INSIDE each cluster partition, so no
    single reducer sees more than one cluster's rows."""
    from pyspark.sql import Window

    from sparksearch.clustering import kmeans
    embs = spark.read.parquet(sf_dir + "/embeddings.parquet")
    assigned, _ = kmeans(embs, k=_KM_K, iters=_KM_T)
    w = Window.partitionBy("cl").orderBy(F.col("vid").asc())
    kept = (assigned.withColumn("_r", F.row_number().over(w))
            .filter(F.col("_r") <= _KM_CAP))
    return (kept.groupBy("cl")
            .agg(F.count(F.lit(1)).cast("long").alias("n_sampled"),
                 F.min("vid").cast("long").alias("min_id"),
                 F.max("vid").cast("long").alias("max_id"))
            .select(F.col("cl").alias("cluster"), "n_sampled",
                    "min_id", "max_id")
            .orderBy("cluster"))


def _cluster_sample_sql() -> str:
    # reuse the unrolled kmeans pipeline up to the final assignment `af`
    base = _kmeans_sql()
    head = base[:base.rindex("SELECT af.cl")]
    return f"""
{head}
SELECT cl AS cluster, CAST(count(*) AS BIGINT) AS n_sampled,
       CAST(min(vid) AS BIGINT) AS min_id,
       CAST(max(vid) AS BIGINT) AS max_id
FROM ( SELECT *, row_number() OVER (PARTITION BY cl ORDER BY vid ASC) AS r
       FROM af )
WHERE r <= {_KM_CAP}
GROUP BY cl ORDER BY cluster
""".strip()


def _kmeans_sql() -> str:
    k, t = _KM_K, _KM_T
    parts = [f"""
e AS ( SELECT vec_id AS vid,
              list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
       FROM embeddings ),
c0 AS ( SELECT row_number() OVER (ORDER BY vid) - 1 AS cid, v
        FROM ( SELECT vid, v FROM e ORDER BY vid LIMIT {k} ) )
""".strip()]
    for n in range(1, t + 1):
        prev = f"c{n - 1}"
        parts.append(f"""
d{n} AS ( SELECT e.vid, e.v, c.cid,
          list_sum(list_transform(range(1, len(e.v) + 1),
                   i -> (e.v[i] - c.v[i]) * (e.v[i] - c.v[i]))) AS d
          FROM e, {prev} c ),
a{n} AS ( SELECT vid, v, cid AS cl FROM (
            SELECT *, row_number() OVER (PARTITION BY vid
                       ORDER BY d ASC, cid ASC) AS rn FROM d{n} )
          WHERE rn = 1 ),
cm{n} AS ( SELECT cl AS cid, list(m ORDER BY pos) AS v FROM (
             SELECT cl, pos, round(avg(val), 6) AS m
             FROM ( SELECT cl, unnest(v) AS val,
                           generate_subscripts(v, 1) AS pos FROM a{n} )
             GROUP BY cl, pos ) GROUP BY cl ),
c{n} AS ( SELECT cid, v FROM cm{n}
          UNION ALL
          SELECT cid, v FROM {prev}
          WHERE cid NOT IN ( SELECT cid FROM cm{n} ) )
""".strip())
    parts.append(f"""
df AS ( SELECT e.vid, c.cid,
        list_sum(list_transform(range(1, len(e.v) + 1),
                 i -> (e.v[i] - c.v[i]) * (e.v[i] - c.v[i]))) AS d
        FROM e, c{t} c ),
af AS ( SELECT vid, cid AS cl FROM (
          SELECT *, row_number() OVER (PARTITION BY vid
                     ORDER BY d ASC, cid ASC) AS rn FROM df )
        WHERE rn = 1 )
""".strip())
    ctes = ",\n".join(parts)
    return f"""
WITH {ctes}
SELECT af.cl AS cluster, CAST(count(*) AS BIGINT) AS n,
       ( SELECT round(sqrt(list_sum(list_transform(c.v, x -> x * x))), 4)
         FROM c{t} c WHERE c.cid = af.cl ) AS cnorm
FROM af GROUP BY af.cl ORDER BY cluster
""".strip()


# ---------------------------------------------------------------------------
# cross-index search (multisearch.py)
# ---------------------------------------------------------------------------

_MIDX_LANGS = ("en", "de")
_MIDX_Q = "hash join table"
_MIDX_K = 12
_MIDX_CACHE: dict = {}


def _lang_engines(spark, sf_dir):
    """One small index per language — each with ITS OWN docids and BM25
    statistics (per-shard stats, the default QUERY_THEN_FETCH posture)."""
    import os
    import tempfile

    from sparksearch.build import build_index
    from sparksearch.exec import Executor
    from sparksearch.index import IndexReader
    key = os.path.realpath(sf_dir)
    if key not in _MIDX_CACHE:
        pages = C.pages_df(spark, sf_dir)
        exs = {}
        for lang in _MIDX_LANGS:
            out = tempfile.mkdtemp(prefix=f"sparksearch_midx_{lang}_")
            build_index(pages.filter(F.col("lang") == lang), out,
                        analyzer="standard", n_buckets=4, partitions=4)
            exs[f"ix_{lang}"] = Executor(IndexReader(spark, out))
        _MIDX_CACHE[key] = exs
    return _MIDX_CACHE[key]


def q_msearch_indices(spark, sf_dir):
    """Cross-index search: `ix_*` wildcard over per-language indices,
    each scored with its own n/avgdl/df (QUERY_THEN_FETCH per-shard
    stats), per-index top-k merged by (score desc, _index, docid) —
    the coordinating-node reduce."""
    from sparksearch.multisearch import msearch_indices
    from sparksearch.queries import Match
    exs = _lang_engines(spark, sf_dir)
    return msearch_indices(
        exs, Match("text", _MIDX_Q), k=_MIDX_K, expression="ix_*",
        search_fn=lambda ex, qq, kk: C.topk_rounded(ex, qq, k=kk))


def q_dfs_msearch(spark, sf_dir):
    """DFS_QUERY_THEN_FETCH across the per-language indices: term
    statistics collected per index, summed by the coordinator
    (aggregateDfs), every index re-scored with the GLOBAL idf/avgdl —
    scores comparable across indices, unlike the per-shard default."""
    from sparksearch.multisearch import dfs_msearch_indices
    from sparksearch.queries import Match
    exs = _lang_engines(spark, sf_dir)
    return dfs_msearch_indices(
        exs, Match("text", _MIDX_Q), k=_MIDX_K, expression="ix_*",
        search_fn=lambda gx, qq, kk: C.topk_rounded(gx, qq, k=kk))


def _midx_weights_inlist():
    from collections import Counter
    terms = C._terms_list(_MIDX_Q)
    cnt = Counter(terms)
    weights = " ".join(f"WHEN '{t}' THEN {c}" for t, c in sorted(cnt.items()))
    inlist = ", ".join(f"'{t}'" for t in sorted(set(terms)))
    return weights, inlist


def _midx_base_sql(lang: str) -> str:
    """Per-index corpus CTEs: the index is the lang subset of pages,
    with its own docids (url rank within the subset), per-doc dl, and
    per-doc query-term tf."""
    from sparksearch.norms import quantized_dl_sql
    _, inlist = _midx_weights_inlist()
    s = lang
    return f"""
pages_{s} AS ( SELECT row_number() OVER (ORDER BY url) - 1 AS docid,
                      url, text
               FROM pages WHERE lang = '{s}' ),
tok_{s} AS ( SELECT docid, term FROM (
               SELECT docid, unnest(string_split(text, ' ')) AS term
               FROM pages_{s}) WHERE term <> '' ),
dl_{s} AS ( SELECT docid, count(*) AS dl FROM tok_{s} GROUP BY docid ),
dlq_{s} AS ( SELECT docid, dl, {quantized_dl_sql('dl')} AS dl_q
             FROM dl_{s} ),
tf_{s} AS ( SELECT docid, term, count(*) AS tf FROM tok_{s}
            WHERE term IN ({inlist}) GROUP BY docid, term )
""".strip()


def _midx_score_sql(lang: str, gsfx: str | None = None) -> str:
    """Per-index scoring CTEs. gsfx=None scores with the index's OWN
    stats (QUERY_THEN_FETCH); gsfx='all' scores with the shared
    aggregated g_all/dft_all (DFS_QUERY_THEN_FETCH)."""
    weights, _ = _midx_weights_inlist()
    s = lang
    gs = gsfx or s
    own = "" if gsfx else f"""
g_{s} AS ( SELECT count(*) AS n,
                  CAST(sum(dl) AS DOUBLE) / count(*) AS avgdl FROM dl_{s} ),
dft_{s} AS ( SELECT term, count(*) AS df FROM tf_{s} GROUP BY term ),
""".strip() + "\n"
    return own + f"""
sc_{s} AS (
  SELECT tf.docid,
         sum((CASE tf.term {weights} ELSE 0 END) *
             {C._idf_sql(f'dft_{gs}.df', f'g_{gs}.n')} *
             {C._tfn_sql('tf.tf', f'dlq_{s}.dl_q', f'g_{gs}.avgdl')}) AS score
  FROM tf_{s} tf JOIN dft_{gs} USING (term) JOIN dlq_{s} USING (docid)
       CROSS JOIN g_{gs}
  GROUP BY tf.docid ),
top_{s} AS (
  SELECT 'ix_{s}' AS _index, p.docid, p.url,
         round(sc.score, 4) AS score
  FROM sc_{s} sc JOIN pages_{s} p USING (docid)
  ORDER BY round(sc.score, 4) DESC, p.docid ASC
  LIMIT {_MIDX_K} )
""".strip()


def _midx_leg_sql(lang: str) -> str:
    return _midx_base_sql(lang) + ",\n" + _midx_score_sql(lang)


_MIDX_GLOBAL_SQL = """
g_all AS ( SELECT count(*) AS n,
                  CAST(sum(dl) AS DOUBLE) / count(*) AS avgdl
           FROM ( SELECT dl FROM dl_en UNION ALL SELECT dl FROM dl_de ) ),
dft_all AS ( SELECT term, count(*) AS df
             FROM ( SELECT * FROM tf_en UNION ALL SELECT * FROM tf_de )
             GROUP BY term )
""".strip()


def queries() -> dict:
    return {
        "nested_sections": q_nested_sections,
        "nested_score_sum": q_nested_score_sum,
        "nested_inner_hits": q_nested_inner_hits,
        "api_sort_mode": q_api_sort_mode,
        "msearch_indices": q_msearch_indices,
        "dfs_msearch": q_dfs_msearch,
        "kmeans_embeddings": q_kmeans_embeddings,
        "cluster_sample": q_cluster_sample,
        "agg_nested_terms": q_nested_terms_agg,
        "join_has_child": q_has_child,
        "join_has_parent": q_has_parent,
        "join_parent_id": q_parent_id,
    }


_SEC_SQL = """
sec AS ( SELECT docid, url,
                list_filter(string_split(text, ' '), w -> w <> '') AS ws
         FROM pages ),
secs AS ( SELECT docid, url, len(ws) AS nw,
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
    legs = ",\n".join(_midx_leg_sql(s) for s in _MIDX_LANGS)
    union = "\nUNION ALL\n".join(
        f"SELECT * FROM top_{s}" for s in _MIDX_LANGS)
    out["msearch_indices"] = f"""
WITH {P},
{legs}
SELECT _index, docid, url, score FROM ( {union} )
ORDER BY score DESC, _index ASC, docid ASC
LIMIT {_MIDX_K}
""".strip()
    out["kmeans_embeddings"] = _kmeans_sql()
    out["cluster_sample"] = _cluster_sample_sql()
    dfs_parts = [_midx_base_sql(s) for s in _MIDX_LANGS]
    dfs_parts.append(_MIDX_GLOBAL_SQL)
    dfs_parts += [_midx_score_sql(s, gsfx="all") for s in _MIDX_LANGS]
    dfs_ctes = ",\n".join(dfs_parts)
    out["dfs_msearch"] = f"""
WITH {P},
{dfs_ctes}
SELECT _index, docid, url, score FROM ( {union} )
ORDER BY score DESC, _index ASC, docid ASC
LIMIT {_MIDX_K}
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
                   ELSE CAST(floor(
                          (CAST(list_sort(lens)[len(lens) // 2] AS DOUBLE)
                           + CAST(list_sort(lens)[len(lens) // 2 + 1]
                                  AS DOUBLE)) / 2 + 0.5) AS DOUBLE)
                   END AS med,
              CAST(list_sum(lens) AS DOUBLE) / len(lens) AS avg
       FROM L )
SELECT docid, url, round(med, 4) AS med_len, round(avg, 4) AS avg_len
FROM K WHERE lang = 'en'
ORDER BY med DESC, avg DESC, docid ASC
LIMIT 15
""".strip()
    out["nested_score_sum"] = f"""
WITH {P},
{_SEC_SQL},
m AS ( SELECT docid, url,
              len(list_filter(sections,
                  s -> list_contains(['the', 'a', 'data'], s.first)
                       AND s.n >= {_SEC})) AS cnt
       FROM secs )
SELECT docid, url, round(CAST(cnt AS DOUBLE), 4) AS score
FROM m WHERE cnt > 0
ORDER BY score DESC, docid ASC
LIMIT 10
""".strip()
    out["nested_inner_hits"] = f"""
WITH {P},
{_SEC_SQL},
m AS ( SELECT url, list_filter(sections,
                  s -> s.first = 'spark' AND s.n >= {_SEC}) AS f
       FROM secs )
SELECT url, CAST(f[1].idx AS INT) AS first_idx,
       CAST(least(2, len(f)) AS INT) AS n_hits
FROM m WHERE len(f) > 0
ORDER BY url
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
