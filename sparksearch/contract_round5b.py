"""Driver-contract entries, round-5b surface: the remaining
SimilarityService BUILT_IN members — DFR, DFI, IB.

Reference cites: sv/index/similarity/SimilarityService.java (BUILT_IN
registry includes "DFR"/"DFI"/"IB"), SimilarityProviders.java:333-384
(createDfrSimilarity / createDfiSimilarity / createIBSimilarity parse
basic_model {g,if,in,ine} / after_effect {b,l} / normalization
{no,h1,h2,h3,z} / independence_measure {standardized,saturated,
chisquared} / distribution {ll,spl} / lambda {df,ttf}); formulas are
the published Lucene 9.4 similarity classes (DFRSimilarity,
DFISimilarity, IBSimilarity and their BasicModel / AfterEffect /
Normalization / Independence / Distribution / Lambda helpers — see
sparksearch/similarity.py docstrings for the exact math).

Entry matrix (chosen to cover every implemented knob at least once):

- ``similarity_dfr``      DFR(basic_model=g,  after_effect=b, h2 c=1)
- ``similarity_dfr_ine``  DFR(basic_model=ine, after_effect=l, h1 c=1)
- ``similarity_dfr_if``   DFR(basic_model=if, after_effect=b, no)
- ``similarity_dfi``      DFI(independence_measure=chisquared)
- ``similarity_ib``       IB(distribution=ll,  lambda=df,  h2 c=1)
- ``similarity_ib_spl``   IB(distribution=spl, lambda=ttf, h1 c=1)

(basic_model=in and the other two DFI measures are pytest-covered in
tests/test_similarity_dfr.py.) Each entry runs the same two-term match
through an Executor with the similarity overridden; the oracle
recomputes the exact formula in SQL over the same corpus, so a drift in
any constant (the +0.5/+1/+2 smoothings, the (1+tfn) factor, the clamp)
fails the gate.
"""

from __future__ import annotations

from sparksearch import contract as C

_Q = ("hash", "join")


def _run(spark, sf_dir, similarity):
    from sparksearch.exec import Executor
    from sparksearch.queries import Match
    ix, _ = C.get_engine(spark, sf_dir)
    ex = Executor(ix, similarity=similarity)
    return C.topk_rounded(ex, Match("text", " ".join(_Q)), k=10)


def q_dfr_gb(spark, sf_dir):
    return _run(spark, sf_dir, {"type": "DFR", "basic_model": "g",
                                "after_effect": "b",
                                "normalization": "h2"})


def q_dfr_ine(spark, sf_dir):
    return _run(spark, sf_dir, {"type": "DFR", "basic_model": "ine",
                                "after_effect": "l",
                                "normalization": "h1"})


def q_dfr_if(spark, sf_dir):
    return _run(spark, sf_dir, {"type": "DFR", "basic_model": "if",
                                "after_effect": "b",
                                "normalization": "no"})


def q_dfi(spark, sf_dir):
    return _run(spark, sf_dir,
                {"type": "DFI", "independence_measure": "chisquared"})


def q_ib_ll(spark, sf_dir):
    return _run(spark, sf_dir, {"type": "IB", "distribution": "ll",
                                "lambda": "df", "normalization": "h2"})


def q_ib_spl(spark, sf_dir):
    return _run(spark, sf_dir, {"type": "IB", "distribution": "spl",
                                "lambda": "ttf", "normalization": "h1"})


def q_significant_text(spark, sf_dir):
    """significant_text over the corpus source with
    filter_duplicate_text=true (exact-dup foreground pruning)."""
    from sparksearch.aggs import significant_text
    from sparksearch.corpus import pages_from_documents
    from sparksearch.queries import Match
    ix, ex = C.get_engine(spark, sf_dir)
    pages = pages_from_documents(spark, sf_dir)
    return significant_text(ex, pages, Match("text", "scan"), size=5,
                            min_doc_count=3, filter_duplicate_text=True)


def q_agg_children(spark, sf_dir):
    """children agg: parent buckets (site number mod 5) stepped down to
    child page counts."""
    from pyspark.sql import functions as F
    from sparksearch.contract_round2n import _family
    from sparksearch.relations import children_agg
    fam = _family(spark, sf_dir)
    return children_agg(fam, "site", "page",
                        (F.col("num") % 5).cast("int"), size=10)


def q_agg_parent(spark, sf_dir):
    """parent agg: child lang buckets stepped up to distinct-parent
    counts (a site with many pages of one lang counts once)."""
    from pyspark.sql import functions as F
    from sparksearch.contract_round2n import _family
    from sparksearch.relations import parent_agg
    fam = _family(spark, sf_dir)
    return parent_agg(fam, "site", "page", F.col("lang"), size=10,
                      child_filter=F.col("lang").isNotNull())


def q_dedup_paragraph(spark, sf_dir):
    """C4-style paragraph dedup over a deterministically duplicated
    corpus: every doc_id % 10 == 0 page gets the first 16-token
    paragraph of doc 0 PREPENDED (16 tokens keeps window alignment), so
    the dedup must strip that paragraph everywhere but its first
    occurrence and leave every other paragraph untouched."""
    from pyspark.sql import functions as F
    from sparksearch.dataops import paragraph_dedup
    pages = C.pages_df(spark, sf_dir).select("url", "text")
    did = pages.withColumn(
        "_did", F.regexp_extract("url", r"([0-9]+)$", 1).cast("int"))
    dup = (did.where(F.col("_did") == 0)
           .select(F.array_join(F.slice(F.split("text", " "), 1, 16),
                                " ").alias("_dpara")))
    inj = (did.crossJoin(F.broadcast(dup))
           .withColumn("text",
                       F.when(F.col("_did") % 10 == 0,
                              F.concat_ws(" ", "_dpara", "text"))
                       .otherwise(F.col("text")))
           .select("url", "text"))
    out = paragraph_dedup(inj, window=16)
    return (out.select("url", "n_paras", "n_kept",
                       F.md5("text").alias("h"))
            .orderBy("url"))


def q_query_profile(spark, sf_dir):
    """`profile: true` analogue — the rewritten-query ProfileResult
    tree (preorder DFS) for a representative bool body; timings are
    wall-clock and excluded from the gated surface (profiler.py)."""
    from sparksearch.dsl import from_dsl
    from sparksearch.profiler import profile_df
    dsl = {"bool": {
        "must": [{"match": {"text": {"query": "hash join",
                                     "operator": "and"}}}],
        "should": [{"match_phrase": {"text": {"query": "fast scan",
                                              "slop": 1}}},
                   {"constant_score": {"filter": {
                       "prefix": {"url": "https://site7"}}}}],
        "must_not": [{"term": {"lang": "de"}}],
        "filter": [{"range": {"dl": {"gte": 10, "lt": 200}}},
                   {"exists": {"field": "lang"}}]}}
    return profile_df(spark, from_dsl(dsl))


def q_query_wrapper(spark, sf_dir):
    """`wrapper` query: base64-serialized inner query must plan and
    score identically to the plain form
    (WrapperQueryBuilder.doRewrite)."""
    import base64
    import json
    from sparksearch.dsl import from_dsl
    ix, ex = C.get_engine(spark, sf_dir)
    inner = {"match": {"text": {"query": "slow batch group",
                                "operator": "and"}}}
    b64 = base64.b64encode(json.dumps(inner).encode()).decode()
    return C.topk_rounded(ex, from_dsl({"wrapper": {"query": b64}}), k=10)


def q_validate_query(spark, sf_dir):
    """`_validate/query?explain=true` analogue: parse-check bodies
    without executing; explanations are the rewritten-query toString
    (TransportValidateQueryAction + the profiler's rewrite)."""
    from sparksearch.dsl import validate_query
    cases = [
        ("ok_bool", {"bool": {"must": [{"match": {"text": "hash join"}}],
                              "filter": [{"term": {"lang": "en"}}]}}),
        ("ok_phrase", {"match_phrase": {"text": {"query": "fast scan",
                                                 "slop": 1}}}),
        ("bad_empty_match", {"match": {}}),
        ("bad_unknown", {"no_such_query": {"x": 1}}),
    ]
    rows = [(cid,) + validate_query(d) for cid, d in cases]
    return spark.createDataFrame(
        rows, "id string, valid boolean, explanation string")


def q_dedup_substring(spark, sf_dir):
    """Unaligned exact-substring dedup: every doc_id % 10 == 0 page is
    prepended with 5 literal filler tokens + the first 12 tokens of
    doc 0, so the duplicated span sits at offset 5 — window-ALIGNED
    paragraph dedup cannot see it, the shingle-based substring dedup
    must delete it everywhere except the globally-first occurrence."""
    from pyspark.sql import functions as F
    from sparksearch.dataops import substring_dedup
    pages = C.pages_df(spark, sf_dir).select("url", "text")
    did = pages.withColumn(
        "_did", F.regexp_extract("url", r"([0-9]+)$", 1).cast("int"))
    dup = (did.where(F.col("_did") == 0)
           .select(F.array_join(F.slice(F.split("text", " "), 1, 12),
                                " ").alias("_dpara")))
    inj = (did.crossJoin(F.broadcast(dup))
           .withColumn("text",
                       F.when(F.col("_did") % 10 == 0,
                              F.concat_ws(" ",
                                          F.lit("zq1 zq2 zq3 zq4 zq5"),
                                          "_dpara", "text"))
                       .otherwise(F.col("text")))
           .select("url", "text"))
    out = substring_dedup(inj, k=12)
    return (out.select("url", "n_tokens", "n_removed",
                       F.md5("text").alias("h"))
            .orderBy("url"))


_LINED = """
CASE WHEN _did % 89 = 0 THEN _l0 || '\\nlorem ipsum dolor sit amet.'
     WHEN _did % 97 = 0 THEN _l0 || '\\nconfig { x } done.'
     ELSE _l0 END
""".strip()


def q_c4_filters(spark, sf_dir):
    """C4 line/page cleaning over a deterministically 'lined' corpus:
    10-token lines, every 4th line left without terminal punctuation
    (dropped by the line rule), did%89 docs get a lorem-ipsum line and
    did%97 docs a curly-brace line (page-level kills)."""
    from pyspark.sql import functions as F
    from sparksearch.dataops import c4_line_filters
    pages = C.pages_df(spark, sf_dir).select("url", "text")
    did = pages.withColumn(
        "_did", F.regexp_extract("url", r"([0-9]+)$", 1).cast("int"))
    lined = (did
             .withColumn("_l0", F.expr(
                 "array_join(transform(sequence(0, CAST(ceil(size("
                 "filter(split(text, ' '), w -> w <> '')) / 10.0) AS "
                 "INT) - 1), i -> array_join(slice(filter(split(text, "
                 "' '), w -> w <> ''), i * 10 + 1, 10), ' ') || (CASE "
                 "WHEN i % 4 <> 3 THEN '.' ELSE '' END)), '\\n')"))
             .withColumn("text", F.expr(_LINED))
             .select("url", "text"))
    out = c4_line_filters(lined)
    return (out.select("url", "n_lines", "n_kept_lines", "sentences",
                       "kept", F.md5("text").alias("h"))
            .orderBy("url"))


def q_terms_order_metric(spark, sf_dir):
    """terms agg ordered by a sub-aggregation metric
    (TermsAggregationBuilder order: {"avg_dl": "desc"} instead of
    _count): buckets ranked by the metric value, key tiebreak."""
    from pyspark.sql import functions as F
    _, ex = C.get_engine(spark, sf_dir)
    d = ex.ix.docs.where(F.col("lang").isNotNull())
    return (d.groupBy(F.col("lang").alias("key"))
            .agg(F.count("*").cast("long").alias("doc_count"),
                 F.round(F.avg("dl"), 6).alias("avg_dl"))
            .orderBy(F.col("avg_dl").desc(), F.col("key").asc())
            .limit(5))


def q_filters_other(spark, sf_dir):
    """filters agg with other_bucket=true (FiltersAggregationBuilder
    otherBucket): docs matching NONE of the named filters land in the
    `_other_` bucket — still one pass, one combinable aggregate."""
    from pyspark.sql import functions as F
    _, ex = C.get_engine(spark, sf_dir)
    d = ex.ix.docs
    short = F.col("dl") < 30
    longd = F.col("dl") >= 60
    en = F.col("lang") == "en"
    return d.agg(
        F.sum(short.cast("long")).alias("short_docs"),
        F.sum(longd.cast("long")).alias("long_docs"),
        F.sum(en.cast("long")).alias("en_docs"),
        F.sum((~(short | longd | F.coalesce(en, F.lit(False))))
              .cast("long")).alias("_other_"))


def q_composite_date(spark, sf_dir):
    """composite agg with a date_histogram source (minute rounding) +
    a terms source, resumed from a fixed `after` key — the keyset
    pagination the reference uses to walk unbounded bucket spaces."""
    import datetime
    from pyspark.sql import functions as F
    from sparksearch.aggs import composite_agg
    pages = (C.pages_df(spark, sf_dir)
             .withColumn("minute", F.date_trunc("minute",
                                                F.col("warc_ts")))
             .where(F.col("lang").isNotNull()))
    after = (datetime.datetime(2025, 1, 1, 0, 2, 0), "en")
    return composite_agg(pages, ["minute", "lang"], size=8,
                         after=after)


def q_corpus_report(spark, sf_dir):
    """Per-language corpus card over the documents table: doc/token
    volumes, exact p50/p95 token lengths, exact-dup rate, + total."""
    from sparksearch.dataops import corpus_report
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    return corpus_report(docs)


def q_sig_background(spark, sf_dir):
    """significant_terms with background_filter: foreground = docs
    matching 'scan' WITHIN the lang='en' background; per-term bg df
    computed over the filtered background, not the whole index."""
    from sparksearch.aggs import significant_terms
    from sparksearch.queries import Match, Term
    _, ex = C.get_engine(spark, sf_dir)
    return significant_terms(ex, Match("text", "scan"), size=5,
                             min_doc_count=2,
                             background_filter=Term("lang", "en"))


def q_intervals_filter(spark, sf_dir):
    """intervals `filter` block (IntervalFilter): all_of('table' then
    'scan' within 3 gaps) restricted to spans NOT containing 'value';
    parsed through the DSL to exercise the filter grammar; the filter
    side contributes no scoring terms."""
    from sparksearch.dsl import from_dsl
    _, ex = C.get_engine(spark, sf_dir)
    dsl = {"intervals": {"text": {"all_of": {
        "intervals": [{"match": {"query": "table"}},
                      {"match": {"query": "scan"}}],
        "ordered": True, "max_gaps": 3,
        "filter": {"not_containing": {"match": {"query": "value"}}}}}}}
    return C.topk_rounded(ex, from_dsl(dsl), k=10)


def q_knn_recall_ivf(spark, sf_dir):
    """ANN recall harness: recall@10 of IVF(8 cells, 3 probes) vs exact
    brute force over query vectors 0-4, plus the averaged summary
    row."""
    from sparksearch.dataops import ann_recall
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    return ann_recall(emb, [0, 1, 2, 3, 4], k=10, n_cells=8, n_probe=3)


def q_api_fields_format(spark, sf_dir):
    """FieldAndFormat: docvalue_fields with a date `format` returns the
    formatted string while the sort runs on the raw timestamp
    (FetchDocValuesPhase semantics)."""
    from sparksearch.api import search_df
    _, ex = C.get_engine(spark, sf_dir)
    body = {"query": {"match": {"text": "join"}},
            "sort": [{"warc_ts": {"order": "desc"}}],
            "size": 10, "_source": False,
            "docvalue_fields": [{"field": "warc_ts",
                                 "format": "yyyy-MM-dd HH:mm"}]}
    return search_df(ex, body).select("docid", "url", "warc_ts")


def q_wand_tuned(spark, sf_dir):
    """Block-max WAND under TUNED BM25 (k1=1.6, b=0.9): the packed
    impact pairs are raw (max_tf, min_dlq) statistics, so pruning
    bounds re-derive exactly for any parameterization — gated against
    the same SQL formula as the plan-path similarity_bm25_tuned
    entry."""
    from sparksearch.contract import wand_topk_rounded
    from sparksearch.exec import Executor
    from sparksearch.queries import Match
    wix, _ = C.get_engine_wand(spark, sf_dir)
    ex = Executor(wix, similarity={"type": "BM25", "k1": 1.6, "b": 0.9})
    return wand_topk_rounded(ex, Match("text", "hash join"), k=10)


def q_suggest_collate(spark, sf_dir):
    """Phrase suggester with collate pruning: candidate phrases whose
    tokens never co-occur in one document are dropped before ranking
    (PhraseSuggester collate stage)."""
    from sparksearch.fetchops import suggest_phrase
    ix, _ = C.get_engine(spark, sf_dir)
    return suggest_phrase(ix, "joni hask", per_token=3, max_edits=2,
                          size=3, collate=True)


def q_suggest_modes(spark, sf_dir):
    """Term suggester suggest_mode=popular over mixed inputs: for the
    KNOWN term 'join' only strictly-more-frequent dictionary terms at
    distance <= 2 sharing its first letter qualify; the misspelling
    'joni' (df 0) admits any candidate (TermSuggestionBuilder
    SuggestMode.POPULAR)."""
    from sparksearch.fetchops import suggest_terms
    ix, _ = C.get_engine(spark, sf_dir)
    return suggest_terms(ix, "join joni", max_edits=2, size=3,
                         suggest_mode="popular")


def q_api_sort_missing(spark, sf_dir):
    """FieldSortBuilder `missing` policy through the full body path: a
    nullable runtime field sorted desc with missing=_first — the
    null docs must lead (Spark's bare desc() would bury them last),
    real values follow descending, docid tiebreak."""
    from pyspark.sql import functions as F
    from sparksearch.api import search_df
    _, ex = C.get_engine(spark, sf_dir)
    body = {"query": {"match_all": {}},
            "runtime_mappings": {
                "big_dl": "doc['dl'].value > 150 ? doc['dl'].value "
                          ": null"},
            "sort": [{"big_dl": {"order": "desc", "missing": "_first"}},
                     {"_doc": "asc"}],
            "size": 15, "_source": False,
            "docvalue_fields": ["big_dl"]}
    return (search_df(ex, body)
            .select("docid", "url", F.col("big_dl").cast("long")
                    .alias("big_dl")))


def q_temperature_mixture(spark, sf_dir):
    """Temperature sampling (q ∝ p^(1/T), T=2, 40% target) over the
    documents table's lang distribution via the deterministic
    content-hash keep rule."""
    from sparksearch.dataops import temperature_sample
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    return temperature_sample(docs, key_col="lang", id_col="doc_id",
                              temperature=2.0, target_frac=0.4)


def _q_sig(heuristic):
    def run(spark, sf_dir):
        from sparksearch.aggs import significant_terms
        from sparksearch.queries import Match
        _, ex = C.get_engine(spark, sf_dir)
        return significant_terms(ex, Match("text", "scan"), size=5,
                                 min_doc_count=3, heuristic=heuristic)
    run.__doc__ = (f"significant_terms with the {heuristic} heuristic "
                   "(heuristic package parity)")
    return run


def _per_term(term: str, tag: str, formula: str) -> str:
    return f"""
tf{tag} AS ( SELECT docid, count(*) AS tf FROM tok WHERE term = '{term}'
        GROUP BY docid ),
cf{tag} AS ( SELECT count(*) AS cf FROM tok WHERE term = '{term}' ),
df{tag} AS ( SELECT count(*) AS df FROM tf{tag} ),
sc{tag} AS ( SELECT tf{tag}.docid, {formula} AS s
        FROM tf{tag} CROSS JOIN cf{tag} CROSS JOIN df{tag}
        JOIN dlq USING (docid) CROSS JOIN g )""".strip()


def _sum_topk(tags: list[str]) -> str:
    unions = " UNION ALL ".join(f"SELECT * FROM sc{t}" for t in tags)
    return f"""
sc AS ( SELECT docid, sum(s) AS score FROM ( {unions} ) GROUP BY docid )
SELECT p.docid, p.url, round(sc.score, 4) AS score
FROM sc JOIN pages p USING (docid)
ORDER BY round(sc.score, 4) DESC, p.docid ASC
LIMIT 10""".strip()


# tfn normalizations as SQL fragments (c = 1)
_TFN_H2 = "({tf} * log2(1 + 1.0 * g.avgdl / dlq.dl_q))"
_TFN_H1 = "(1.0 * {tf} * g.avgdl / dlq.dl_q)"
_TFN_NO = "(CAST({tf} AS DOUBLE))"


def sqls() -> dict[str, str]:
    P, TOK, DL = C._PAGES, C._TOK, C._DL

    def build(formula_for):
        chains = [_per_term(t, chr(ord('a') + i),
                            formula_for(chr(ord('a') + i)))
                  for i, t in enumerate(_Q)]
        tags = [chr(ord('a') + i) for i in range(len(_Q))]
        return ("WITH " + ",\n".join([P, TOK, DL] + chains) + ",\n"
                + _sum_topk(tags))

    def dfr_gb(g):
        tf, cf, df = f"tf{g}.tf", f"cf{g}.cf", f"df{g}.df"
        tfn = _TFN_H2.format(tf=tf)
        lam = f"(({cf} + 1.0) / (g.n + {cf} + 1.0))"
        model = (f"(log2(1 + {lam}) + {tfn} * "
                 f"log2((1 + {lam}) / {lam}))")
        return (f"greatest(0.0, (({cf} + 2.0) / {df}) * {model} "
                f"/ (1 + {tfn}))")

    def dfr_ine(g):
        tf, cf = f"tf{g}.tf", f"cf{g}.cf"
        tfn = _TFN_H1.format(tf=tf)
        ne = f"(g.n * (1 - pow((g.n - 1.0) / g.n, {cf})))"
        return (f"greatest(0.0, {tfn} * log2((g.n + 1.0) / ({ne} + 0.5))"
                f" / (1 + {tfn}))")

    def dfr_if(g):
        tf, cf, df = f"tf{g}.tf", f"cf{g}.cf", f"df{g}.df"
        tfn = _TFN_NO.format(tf=tf)
        return (f"greatest(0.0, (({cf} + 2.0) / {df}) * {tfn} * "
                f"log2(1 + (g.n + 1.0) / ({cf} + 0.5)) / (1 + {tfn}))")

    def dfi(g):
        tf, cf = f"tf{g}.tf", f"cf{g}.cf"
        e = f"(({cf} + 1.0) * dlq.dl_q / (g.ttf + 1.0))"
        return (f"CASE WHEN {tf} <= {e} THEN 0.0 ELSE "
                f"log2(({tf} - {e}) * ({tf} - {e}) / {e} + 1) END")

    def ib_ll(g):
        tf, df = f"tf{g}.tf", f"df{g}.df"
        tfn = _TFN_H2.format(tf=tf)
        lam = f"(({df} + 1.0) / (g.n + 1.0))"
        return f"greatest(0.0, -log2({lam} / ({tfn} + {lam})))"

    def ib_spl(g):
        tf, cf = f"tf{g}.tf", f"cf{g}.cf"
        tfn = _TFN_H1.format(tf=tf)
        lam = f"(({cf} + 1.0) / (g.n + 1.0))"
        return (f"greatest(0.0, -log2((pow({lam}, {tfn} / ({tfn} + 1.0))"
                f" - {lam}) / (1.0 - {lam})))")

    sig_text = ("WITH " + ",\n".join([P, TOK, DL]) + """
, m AS ( SELECT DISTINCT docid FROM tok WHERE term = 'scan' ),
fgd AS ( SELECT min(p.docid) AS docid
         FROM m JOIN pages p USING (docid) GROUP BY p.text ),
fgn AS ( SELECT count(*) AS n FROM fgd ),
fg AS ( SELECT t.term, CAST(count(DISTINCT t.docid) AS BIGINT) AS fg
        FROM tok t JOIN fgd USING (docid) GROUP BY t.term ),
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
ORDER BY jlh DESC, term ASC LIMIT 5""")

    agg_children = f"WITH {P}" + """
SELECT CAST(CAST(regexp_extract(split_part(url, '/', 3),
                 'site(\\d+)', 1) AS INT) % 5 AS INT) AS key,
       CAST(count(*) AS BIGINT) AS doc_count
FROM pages GROUP BY 1
ORDER BY doc_count DESC, key ASC LIMIT 10"""

    agg_parent = f"WITH {P}" + """
SELECT lang AS key,
       CAST(count(DISTINCT split_part(url, '/', 3)) AS BIGINT)
         AS doc_count
FROM pages WHERE lang IS NOT NULL GROUP BY 1
ORDER BY doc_count DESC, key ASC LIMIT 10"""

    dedup_para = f"WITH {P}" + """
, did AS ( SELECT url, CAST(regexp_extract(url, '([0-9]+)$', 1) AS INT)
                  AS did, text FROM pages ),
dup AS ( SELECT array_to_string(
           list_filter(string_split(text, ' '), w -> w <> '')[1:16], ' ')
           AS dpara FROM did WHERE did = 0 ),
inj AS ( SELECT url, CASE WHEN did % 10 = 0 THEN dpara || ' ' || text
                          ELSE text END AS text
         FROM did CROSS JOIN dup ),
ws AS ( SELECT url, list_filter(string_split(text, ' '), w -> w <> '')
               AS ws FROM inj ),
p0 AS ( SELECT url, ws,
               unnest(range(0, CAST(ceil(len(ws) / 16.0) AS BIGINT)))
                 AS pidx FROM ws ),
paras AS ( SELECT url, pidx,
                  array_to_string(ws[pidx*16+1 : pidx*16+16], ' ') AS para
           FROM p0 ),
keep AS ( SELECT url, pidx, para FROM (
            SELECT url, pidx, para,
                   row_number() OVER (PARTITION BY para
                                      ORDER BY url, pidx) AS rn
            FROM paras ) WHERE rn = 1 ),
reb AS ( SELECT url, count(*) AS n_kept,
                string_agg(para, ' ' ORDER BY pidx) AS text
         FROM keep GROUP BY url ),
tot AS ( SELECT url, count(*) AS n_paras FROM paras GROUP BY url )
SELECT t.url, CAST(t.n_paras AS BIGINT) AS n_paras,
       CAST(coalesce(r.n_kept, 0) AS BIGINT) AS n_kept,
       md5(coalesce(r.text, '')) AS h
FROM tot t LEFT JOIN reb r USING (url)
WHERE coalesce(r.n_kept, 0) > 0
ORDER BY t.url"""

    profile = """
SELECT * FROM (VALUES
  (0, 0, 'BooleanQuery',
   '+(+text:hash +text:join) text:"fast scan"~1 (ConstantScore(url:https://site7*)) -lang:de #dl:[10 TO 200} #FieldExistsQuery [field=lang]'),
  (1, 1, 'BooleanQuery', '+text:hash +text:join'),
  (2, 2, 'TermQuery', 'text:hash'),
  (3, 2, 'TermQuery', 'text:join'),
  (4, 1, 'PhraseQuery', 'text:"fast scan"~1'),
  (5, 1, 'ConstantScoreQuery', 'ConstantScore(url:https://site7*)'),
  (6, 2, 'PrefixQuery', 'url:https://site7*'),
  (7, 1, 'TermQuery', 'lang:de'),
  (8, 1, 'IndexOrDocValuesQuery', 'dl:[10 TO 200}'),
  (9, 1, 'FieldExistsQuery', 'FieldExistsQuery [field=lang]')
) AS t(ord, depth, type, description) ORDER BY ord"""

    # NXY table fragments over the shared sig CTE chain
    _sig_base = ("WITH " + ",\n".join([P, TOK, DL]) + """
, m AS ( SELECT DISTINCT docid FROM tok WHERE term = 'scan' ),
fgn AS ( SELECT CAST(count(*) AS DOUBLE) AS n FROM m ),
fg AS ( SELECT t.term, CAST(count(DISTINCT t.docid) AS BIGINT) AS fg
        FROM tok t JOIN m USING (docid) GROUP BY t.term ),
bg AS ( SELECT term, CAST(count(DISTINCT docid) AS BIGINT) AS bg
        FROM tok GROUP BY term ),
nxy AS ( SELECT fg.term, fg.fg, bg.bg,
                CAST(fg.fg AS DOUBLE) AS n11,
                fgn.n - fg.fg AS n01,
                CAST(bg.bg - fg.fg AS DOUBLE) AS n10,
                g.n - bg.bg - (fgn.n - fg.fg) AS n00,
                CAST(bg.bg AS DOUBLE) AS n1_,
                CAST(g.n - bg.bg AS DOUBLE) AS n0_,
                fgn.n AS n_1, g.n - fgn.n AS n_0,
                CAST(g.n AS DOUBLE) AS nn
         FROM fg JOIN bg USING (term) CROSS JOIN fgn CROSS JOIN g
         WHERE fg.fg >= 3 )""")

    def sig(formula, extra_where=""):
        return (_sig_base + f"""
SELECT term, fg, bg, CAST(round({formula}, 6) AS DOUBLE) AS score
FROM nxy WHERE 1=1 {extra_where}
ORDER BY score DESC, term ASC LIMIT 5""")

    _not_neg = "AND NOT (n11 / n_1 < n10 / n_0)"
    chi = ("nn * pow(n11 * n00 - n01 * n10, 2.0) "
           "/ (n_1 * n1_ * n0_ * n_0)")
    mi_t = ("CASE WHEN abs(nn * {xy}) < 1e-7 AND abs({xy} / nn) < 1e-7 "
            "THEN 0.0 ELSE abs({xy} / nn) * ln(abs(nn * {xy}) "
            "/ abs({x_} * {_y})) END")
    mi = ("(" + " + ".join([
        mi_t.format(xy="n00", x_="n0_", _y="n_0"),
        mi_t.format(xy="n01", x_="n0_", _y="n_1"),
        mi_t.format(xy="n10", x_="n1_", _y="n_0"),
        mi_t.format(xy="n11", x_="n1_", _y="n_1"),
    ]) + ") / ln(2)")
    gnd = ("CASE WHEN n11 = 0 THEN 0.0 "
           "WHEN n1_ = n_1 AND n1_ = n11 THEN 1.0 "
           "ELSE exp(-((greatest(ln(n1_), ln(n_1)) - ln(n11)) "
           "/ (ln(nn) - least(ln(n1_), ln(n_1))))) END")
    pct = "CASE WHEN bg = 0 THEN 0.0 ELSE n11 / CAST(bg AS DOUBLE) END"

    dedup_sub = f"WITH {P}" + """
, did AS ( SELECT url, CAST(regexp_extract(url, '([0-9]+)$', 1) AS INT)
                  AS did, text FROM pages ),
dup AS ( SELECT array_to_string(
           list_filter(string_split(text, ' '), w -> w <> '')[1:12], ' ')
           AS dpara FROM did WHERE did = 0 ),
inj AS ( SELECT url, CASE WHEN did % 10 = 0
                          THEN 'zq1 zq2 zq3 zq4 zq5 ' || dpara || ' ' || text
                          ELSE text END AS text
         FROM did CROSS JOIN dup ),
ws AS ( SELECT url, list_filter(string_split(text, ' '), w -> w <> '')
               AS ws FROM inj ),
sh0 AS ( SELECT url, ws,
                unnest(range(0, greatest(len(ws) - 12 + 1, 0))) AS i
         FROM ws ),
sh AS ( SELECT url, i,
               md5(array_to_string(ws[i+1 : i+12], ' ')) AS h
        FROM sh0 ),
dups AS ( SELECT url, i FROM (
            SELECT url, i,
                   row_number() OVER (PARTITION BY h ORDER BY url, i)
                     AS rn
            FROM sh ) WHERE rn > 1 ),
tok AS ( SELECT url, ws,
                unnest(range(0, len(ws))) AS p FROM ws ),
keeptok AS ( SELECT t.url, t.p, t.ws[t.p + 1] AS tk
             FROM tok t
             WHERE NOT EXISTS ( SELECT 1 FROM dups d
                                WHERE d.url = t.url
                                  AND d.i <= t.p AND t.p < d.i + 12 ) ),
reb AS ( SELECT url, string_agg(tk, ' ' ORDER BY p) AS text,
                count(*) AS n_kept
         FROM keeptok GROUP BY url ),
tot AS ( SELECT url, len(ws) AS n_tokens FROM ws )
SELECT t.url, CAST(t.n_tokens AS BIGINT) AS n_tokens,
       CAST(t.n_tokens - coalesce(r.n_kept, 0) AS BIGINT) AS n_removed,
       md5(coalesce(r.text, '')) AS h
FROM tot t LEFT JOIN reb r USING (url)
ORDER BY t.url"""

    c4 = f"WITH {P}" + """
, did AS ( SELECT url, CAST(regexp_extract(url, '([0-9]+)$', 1) AS INT)
                  AS did, text FROM pages ),
ws AS ( SELECT url, did,
               list_filter(string_split(text, ' '), w -> w <> '') AS ws
        FROM did ),
l0 AS ( SELECT url, did,
               array_to_string(list_transform(
                 range(0, CAST(ceil(len(ws) / 10.0) AS BIGINT)),
                 i -> array_to_string(ws[i*10+1 : i*10+10], ' ') ||
                      (CASE WHEN i % 4 <> 3 THEN '.' ELSE '' END)),
                 chr(10)) AS l0
        FROM ws ),
lined AS ( SELECT url,
                  CASE WHEN did % 89 = 0
                         THEN l0 || chr(10) || 'lorem ipsum dolor sit amet.'
                       WHEN did % 97 = 0
                         THEN l0 || chr(10) || 'config { x } done.'
                       ELSE l0 END AS text
           FROM l0 ),
split_l AS ( SELECT url, text, string_split(text, chr(10)) AS lines
             FROM lined ),
keptl AS ( SELECT url, text, lines,
                  list_filter(lines, l ->
                    regexp_matches(l, '[.!?"]\\s*$')
                    AND len(list_filter(string_split(l, ' '),
                                        w -> w <> '')) >= 3
                    AND NOT regexp_matches(lower(l), 'javascript'))
                    AS kl
           FROM split_l ),
reb AS ( SELECT url, text, lines, kl,
                array_to_string(kl, chr(10)) AS kept_text
         FROM keptl )
SELECT url,
       CAST(len(lines) AS BIGINT) AS n_lines,
       CAST(len(kl) AS BIGINT) AS n_kept_lines,
       CAST(length(kept_text)
            - length(replace(replace(replace(kept_text, '.', ''),
                                     '!', ''), '?', '')) AS BIGINT)
         AS sentences,
       ( (length(kept_text)
          - length(replace(replace(replace(kept_text, '.', ''),
                                   '!', ''), '?', ''))) >= 5
         AND NOT contains(lower(text), 'lorem ipsum')
         AND NOT contains(text, '{') ) AS kept,
       md5(kept_text) AS h
FROM reb ORDER BY url"""

    temp_mix = """
WITH c AS ( SELECT lang AS key, CAST(count(*) AS DOUBLE) AS n
            FROM documents GROUP BY lang ),
tot AS ( SELECT CAST(sum(n) AS DOUBLE) AS nn FROM c ),
z AS ( SELECT sum(pow(n / nn, 0.5)) AS zz FROM c CROSS JOIN tot ),
r AS ( SELECT key,
              round(least(1.0, (pow(n / nn, 0.5) / zz) * 0.4 * nn / n),
                    6) AS rate
       FROM c CROSS JOIN tot CROSS JOIN z )
SELECT d.doc_id, d.lang FROM documents d JOIN r ON r.key = d.lang
WHERE CAST(CONCAT('0x', substr(md5(CAST(d.doc_id AS VARCHAR)), 1, 8))
           AS BIGINT) % 10000 < r.rate * 10000
ORDER BY d.doc_id"""

    sort_missing = ("WITH " + ",\n".join([P, TOK, DL]) + """
, sel AS ( SELECT p.docid, p.url,
                  CASE WHEN dlq.dl > 150 THEN dlq.dl END AS big_dl
           FROM pages p JOIN dlq USING (docid) )
SELECT docid, url, CAST(big_dl AS BIGINT) AS big_dl FROM sel
ORDER BY big_dl DESC NULLS FIRST, docid ASC LIMIT 15""")

    suggest_modes = ("WITH " + ",\n".join([P, TOK]) + """
, dict AS ( SELECT term, CAST(count(DISTINCT docid) AS BIGINT) AS df
            FROM tok GROUP BY term ),
inputs AS ( SELECT i.input, coalesce(d.df, 0) AS in_df
            FROM ( SELECT unnest(['join', 'joni']) AS input ) i
            LEFT JOIN dict d ON d.term = i.input ),
cand AS ( SELECT i.input, d.term,
                 levenshtein(i.input, d.term) AS dist, d.df
          FROM inputs i CROSS JOIN dict d
          WHERE levenshtein(i.input, d.term) BETWEEN 1 AND 2
            AND substr(d.term, 1, 1) = substr(i.input, 1, 1)
            AND d.df > i.in_df ),
ranked AS ( SELECT input, term, CAST(dist AS INT) AS dist, df,
            CAST(row_number() OVER (PARTITION BY input
                 ORDER BY dist ASC, df DESC, term ASC) AS INT) AS rank
            FROM cand )
SELECT input, term, dist, df, rank FROM ranked
WHERE rank <= 3 ORDER BY input, rank""")

    def _shortlist(i, tok):
        return f"""
c{i} AS ( SELECT term, log10(df + 1) - dist AS s FROM (
    SELECT term, df, levenshtein(term, '{tok}') AS dist,
           row_number() OVER (ORDER BY levenshtein(term, '{tok}') ASC,
                              df DESC, term ASC) AS rn
    FROM dict
    WHERE abs(length(term) - {len(tok)}) <= 2
      AND levenshtein(term, '{tok}') <= 2 )
  WHERE rn <= 3 )""".strip()

    suggest_collate = f"""
WITH {P}, {TOK},
dict AS ( SELECT term, CAST(count(DISTINCT docid) AS BIGINT) AS df
          FROM tok GROUP BY term ),
{_shortlist(0, 'joni')},
{_shortlist(1, 'hask')},
combos AS ( SELECT c0.term AS t0, c1.term AS t1,
                   c0.term || ' ' || c1.term AS phrase,
                   CAST(round(c0.s + c1.s, 6) AS DOUBLE) AS score
            FROM c0 CROSS JOIN c1 ),
collated AS ( SELECT phrase, score FROM combos
              WHERE EXISTS ( SELECT 1 FROM tok a JOIN tok b
                             USING (docid)
                             WHERE a.term = combos.t0
                               AND b.term = combos.t1 ) ),
ranked AS ( SELECT phrase, score,
            CAST(row_number() OVER (ORDER BY score DESC, phrase ASC)
                 AS INT) AS rank FROM collated )
SELECT phrase, score, rank FROM ranked WHERE rank <= 3 ORDER BY rank"""

    fields_format = f"""
WITH {P}, {TOK},
m AS ( SELECT DISTINCT docid FROM tok WHERE term = 'join' )
SELECT p.docid, p.url, strftime(p.warc_ts, '%Y-%m-%d %H:%M') AS warc_ts
FROM pages p JOIN m USING (docid)
ORDER BY p.warc_ts DESC, p.docid ASC LIMIT 10"""

    _cosab = ("list_sum(list_transform(range(1, len({a}) + 1), "
              "i -> {a}[i] * {b}[i])) / "
              "( sqrt(list_sum(list_transform({a}, x -> x * x))) * "
              "sqrt(list_sum(list_transform({b}, x -> x * x))))")
    knn_recall = f"""
WITH e AS ( SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings ),
qs AS ( SELECT vec_id AS qid, v AS qv FROM e
        WHERE vec_id IN (0, 1, 2, 3, 4) ),
pairs AS ( SELECT q.qid, e.vec_id AS id,
                  {_cosab.format(a='e.v', b='q.qv')} AS cs
           FROM e CROSS JOIN qs q WHERE e.vec_id <> q.qid ),
truth AS ( SELECT qid, id FROM (
             SELECT qid, id, row_number() OVER (PARTITION BY qid
                    ORDER BY cs DESC, id ASC) AS rn FROM pairs )
           WHERE rn <= 10 ),
cents AS ( SELECT vec_id AS cid, v AS cv FROM e WHERE vec_id < 8 ),
ac AS ( SELECT e.vec_id AS id, c.cid,
               {_cosab.format(a='e.v', b='c.cv')} AS cs
        FROM e CROSS JOIN cents c ),
assign AS ( SELECT id, cid FROM (
              SELECT id, cid, row_number() OVER (PARTITION BY id
                     ORDER BY cs DESC, cid ASC) AS rn FROM ac )
            WHERE rn = 1 ),
probes AS ( SELECT id AS qid, cid FROM (
              SELECT id, cid, row_number() OVER (PARTITION BY id
                     ORDER BY cs DESC, cid ASC) AS rn
              FROM ac WHERE id IN (0, 1, 2, 3, 4) )
            WHERE rn <= 3 ),
cand AS ( SELECT p.qid, p.id, p.cs
          FROM pairs p JOIN assign a ON a.id = p.id
          JOIN probes pr ON pr.qid = p.qid AND pr.cid = a.cid ),
approx AS ( SELECT qid, id FROM (
              SELECT qid, id, row_number() OVER (PARTITION BY qid
                     ORDER BY cs DESC, id ASC) AS rn FROM cand )
            WHERE rn <= 10 ),
hits AS ( SELECT t.qid, count(*) AS n FROM truth t
          JOIN approx ap ON ap.qid = t.qid AND ap.id = t.id
          GROUP BY t.qid ),
perq AS ( SELECT q.qid AS query_id, coalesce(h.n, 0) AS n_hits,
                 round(coalesce(h.n, 0) / 10.0, 4) AS recall
          FROM ( SELECT DISTINCT qid FROM qs ) q
          LEFT JOIN hits h ON h.qid = q.qid )
SELECT CAST(query_id AS INT) AS query_id,
       CAST(n_hits AS BIGINT) AS n_hits, recall FROM perq
UNION ALL
SELECT -1, CAST(sum(n_hits) AS BIGINT), round(avg(recall), 4)
FROM perq
ORDER BY query_id"""

    _one_idf = (lambda cond:
                f"(SELECT {C._idf_sql('count(*)', '(SELECT n FROM g)')} "
                f"FROM (SELECT DISTINCT docid FROM tokpos WHERE {cond}))")
    _pseudo = " + ".join(_one_idf(f"term = '{t}'")
                         for t in ("table", "scan"))
    intervals_filter = f"""
WITH {C._PAGES},
{C._TOKPOS},
tok AS ( SELECT docid, term FROM tokpos ),
{C._DL},
p0 AS ( SELECT docid, pos FROM tokpos WHERE term = 'table' ),
p1 AS ( SELECT docid, pos FROM tokpos WHERE term = 'scan' ),
mm AS ( SELECT p0.docid, p0.pos AS s, p1.pos AS e FROM p0
        JOIN p1 ON p1.docid = p0.docid AND p1.pos > p0.pos
        AND (p1.pos - p0.pos + 1) - 2 <= 3 ),
filt AS ( SELECT m.docid, m.s, m.e FROM mm m
          WHERE NOT EXISTS ( SELECT 1 FROM tokpos v
                             WHERE v.docid = m.docid
                               AND v.term = 'value'
                               AND v.pos >= m.s AND v.pos <= m.e ) ),
ph AS ( SELECT docid, CAST(count(DISTINCT s) AS DOUBLE) AS pf
        FROM filt GROUP BY docid ),
sc AS ( SELECT ph.docid,
               ({_pseudo}) * {C._tfn_sql('ph.pf', 'dlq.dl_q', 'g.avgdl')}
                 AS score
        FROM ph JOIN dlq USING (docid) CROSS JOIN g )
SELECT p.docid, p.url, round(sc.score, 4) AS score
FROM sc JOIN pages p USING (docid)
ORDER BY round(sc.score, 4) DESC, p.docid ASC LIMIT 10"""

    sig_bg = ("WITH " + ",\n".join([P, TOK, DL]) + """
, bgd AS ( SELECT docid FROM pages WHERE lang = 'en' ),
m AS ( SELECT DISTINCT t.docid FROM tok t
       JOIN bgd USING (docid) WHERE t.term = 'scan' ),
fgn AS ( SELECT count(*) AS n FROM m ),
bgn AS ( SELECT count(*) AS n FROM bgd ),
fg AS ( SELECT t.term, CAST(count(DISTINCT t.docid) AS BIGINT) AS fg
        FROM tok t JOIN m USING (docid) GROUP BY t.term ),
bg AS ( SELECT t.term, CAST(count(DISTINCT t.docid) AS BIGINT) AS bg
        FROM tok t JOIN bgd USING (docid) GROUP BY t.term ),
j AS ( SELECT fg.term, fg.fg, bg.bg,
              (CAST(fg.fg AS DOUBLE) / fgn.n
               - CAST(bg.bg AS DOUBLE) / bgn.n)
              * ((CAST(fg.fg AS DOUBLE) / fgn.n)
                 / (CAST(bg.bg AS DOUBLE) / bgn.n)) AS jlh
       FROM fg JOIN bg USING (term) CROSS JOIN fgn CROSS JOIN bgn
       WHERE fg.fg >= 2 )
SELECT term, fg, bg, CAST(round(jlh, 6) AS DOUBLE) AS jlh FROM j
ORDER BY jlh DESC, term ASC LIMIT 5""")

    corpus_rep = """
WITH b AS ( SELECT coalesce(lang, '__null__') AS k,
                   len(list_filter(string_split(text, ' '),
                                   w -> w <> '')) AS dl,
                   md5(text) AS h
            FROM documents ),
per AS ( SELECT k AS key, CAST(count(*) AS BIGINT) AS n_docs,
                CAST(sum(dl) AS BIGINT) AS n_tokens,
                round(quantile_cont(dl, 0.5), 4) AS p50_dl,
                round(quantile_cont(dl, 0.95), 4) AS p95_dl,
                round((count(*) - count(DISTINCT h))
                      / CAST(count(*) AS DOUBLE), 6) AS dup_rate
         FROM b GROUP BY k ),
tot AS ( SELECT '__total__' AS key, CAST(count(*) AS BIGINT) AS n_docs,
                CAST(sum(dl) AS BIGINT) AS n_tokens,
                round(quantile_cont(dl, 0.5), 4) AS p50_dl,
                round(quantile_cont(dl, 0.95), 4) AS p95_dl,
                round((count(*) - count(DISTINCT h))
                      / CAST(count(*) AS DOUBLE), 6) AS dup_rate
         FROM b )
SELECT * FROM per UNION ALL SELECT * FROM tot ORDER BY key"""

    composite_date = f"WITH {P}" + """
, b AS ( SELECT date_trunc('minute', warc_ts) AS minute, lang,
                CAST(count(*) AS BIGINT) AS doc_count
         FROM pages WHERE lang IS NOT NULL GROUP BY 1, 2 )
SELECT minute, lang, doc_count FROM b
WHERE minute > TIMESTAMP '2025-01-01 00:02:00'
   OR (minute = TIMESTAMP '2025-01-01 00:02:00' AND lang > 'en')
ORDER BY minute, lang LIMIT 8"""

    filters_other = ("WITH " + ",\n".join([P, TOK, DL]) + """
, d AS ( SELECT p.docid, p.lang, dlq.dl FROM pages p
         JOIN dlq USING (docid) )
SELECT CAST(sum(CASE WHEN dl < 30 THEN 1 ELSE 0 END) AS BIGINT)
         AS short_docs,
       CAST(sum(CASE WHEN dl >= 60 THEN 1 ELSE 0 END) AS BIGINT)
         AS long_docs,
       CAST(sum(CASE WHEN lang = 'en' THEN 1 ELSE 0 END) AS BIGINT)
         AS en_docs,
       CAST(sum(CASE WHEN NOT (dl < 30 OR dl >= 60
                               OR coalesce(lang = 'en', FALSE))
                     THEN 1 ELSE 0 END) AS BIGINT) AS "_other_"
FROM d""")

    terms_order = ("WITH " + ",\n".join([P, TOK, DL]) + """
SELECT p.lang AS key, CAST(count(*) AS BIGINT) AS doc_count,
       CAST(round(avg(dlq.dl), 6) AS DOUBLE) AS avg_dl
FROM pages p JOIN dlq USING (docid)
WHERE p.lang IS NOT NULL
GROUP BY p.lang
ORDER BY avg_dl DESC, key ASC LIMIT 5""")

    from sparksearch import contract_round2g as _CR2G
    return {
        "agg_terms_order_metric": terms_order,
        "agg_filters_other": filters_other,
        "agg_composite_date": composite_date,
        "corpus_report": corpus_rep,
        "agg_sig_background": sig_bg,
        "intervals_filter": intervals_filter,
        "knn_recall_ivf": knn_recall,
        "api_fields_format": fields_format,
        "wand_tuned": _CR2G.sqls()["similarity_bm25_tuned"],
        "query_suggest_collate": suggest_collate,
        "query_suggest_modes": suggest_modes,
        "api_sort_missing": sort_missing,
        "temperature_mixture": temp_mix,
        "c4_filters": c4,
        "dedup_substring": dedup_sub,
        "agg_sig_chi_square": sig(chi, _not_neg),
        "agg_sig_mutual_info": sig(mi, _not_neg),
        "agg_sig_gnd": sig(gnd),
        "agg_sig_percentage": sig(pct),
        "agg_significant_text": sig_text,
        "agg_children": agg_children,
        "agg_parent": agg_parent,
        "dedup_paragraph": dedup_para,
        "query_profile": profile,
        "query_wrapper": C.match_sql("slow batch group", operator="and"),
        "validate_query": """
SELECT * FROM (VALUES
  ('ok_bool', TRUE, '+(text:hash text:join) #lang:en'),
  ('ok_phrase', TRUE, 'text:"fast scan"~1'),
  ('bad_empty_match', FALSE, 'parse error: expected one field key, got []'),
  ('bad_unknown', FALSE,
   'parse error: unsupported query type: no_such_query')
) AS t(id, valid, explanation) ORDER BY id""",
        "similarity_dfr": build(dfr_gb),
        "similarity_dfr_ine": build(dfr_ine),
        "similarity_dfr_if": build(dfr_if),
        "similarity_dfi": build(dfi),
        "similarity_ib": build(ib_ll),
        "similarity_ib_spl": build(ib_spl),
    }


def oracle_sql() -> dict:
    return sqls()


def queries() -> dict:
    return {
        "agg_terms_order_metric": q_terms_order_metric,
        "agg_filters_other": q_filters_other,
        "agg_composite_date": q_composite_date,
        "corpus_report": q_corpus_report,
        "agg_sig_background": q_sig_background,
        "intervals_filter": q_intervals_filter,
        "knn_recall_ivf": q_knn_recall_ivf,
        "api_fields_format": q_api_fields_format,
        "wand_tuned": q_wand_tuned,
        "query_suggest_collate": q_suggest_collate,
        "query_suggest_modes": q_suggest_modes,
        "api_sort_missing": q_api_sort_missing,
        "temperature_mixture": q_temperature_mixture,
        "c4_filters": q_c4_filters,
        "dedup_substring": q_dedup_substring,
        "agg_sig_chi_square": _q_sig("chi_square"),
        "agg_sig_mutual_info": _q_sig("mutual_information"),
        "agg_sig_gnd": _q_sig("gnd"),
        "agg_sig_percentage": _q_sig("percentage"),
        "agg_significant_text": q_significant_text,
        "agg_children": q_agg_children,
        "agg_parent": q_agg_parent,
        "dedup_paragraph": q_dedup_paragraph,
        "query_profile": q_query_profile,
        "query_wrapper": q_query_wrapper,
        "validate_query": q_validate_query,
        "similarity_dfr": q_dfr_gb,
        "similarity_dfr_ine": q_dfr_ine,
        "similarity_dfr_if": q_dfr_if,
        "similarity_dfi": q_dfi,
        "similarity_ib": q_ib_ll,
        "similarity_ib_spl": q_ib_spl,
    }
