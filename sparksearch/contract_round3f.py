"""Round-3 continuation contract entries.

- mapping_size     — mapper-size `_size` metadata field (SizeFieldMapper)
- murmur3_hash     — mapper-murmur3 hash field; gate = injectivity on the
                     corpus + determinism (count distinct hash == count
                     distinct value; the hash itself has no SQL oracle)
- annotated_text   — mapper-annotated-text token streams vs hand goldens
- geoip_enrich     — ingest-geoip analogue: CIDR-range attribute lookup
                     through the /16-bucketed broadcast equi-join
- script_expression — lang-expression lowered to the painless compiler
- dsir_weights     — DSIR bigram importance log-weights vs a full SQL
                     mirror (training-data op)
- knn_pq_adc       — product-quantization ADC kNN vs a DuckDB unroll of
                     the identical train/encode/table arithmetic
- stem_snowball_ro/hu/fi/tr/de2, stem_indonesian, stem_galician_min —
                     continuation stemmers vs hand-derived goldens
- lang_analyzer_tr/fi — prebuilt analyzer compositions vs goldens
- tf_cologne, tf_icu_normalizer — Kölner Phonetik / ICU nfkc_cf filters
"""

from __future__ import annotations

from pyspark.sql import functions as F


# ---------------------------------------------------------------------------
# mapper-size
# ---------------------------------------------------------------------------

def q_mapping_size(spark, sf_dir):
    """`_size` = source byte length, filterable + sortable
    (SizeFieldMapper.java — enabled:true stores source().length())."""
    from sparksearch.mappers_plugins import with_size
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    out = with_size(docs, "text", out="size_b")
    return (out.where(F.col("size_b") >= 200)
            .select("doc_id", "size_b")
            .orderBy(F.desc("size_b"), "doc_id").limit(25))


def sql_mapping_size() -> str:
    return """
SELECT doc_id, CAST(octet_length(encode(text)) AS BIGINT) AS size_b
FROM documents WHERE octet_length(encode(text)) >= 200
ORDER BY size_b DESC, doc_id LIMIT 25
""".strip()


# ---------------------------------------------------------------------------
# mapper-murmur3
# ---------------------------------------------------------------------------

def q_murmur3_hash(spark, sf_dir):
    """murmur3 field: index-time hash column must be deterministic and
    collision-free on the corpus (Murmur3FieldMapper h1 — cardinality
    aggs count hashes instead of re-hashing values)."""
    from sparksearch.mappers_plugins import with_murmur3
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    h = with_murmur3(docs, "text", out="h")
    return h.agg(
        F.count("*").cast("long").alias("rows"),
        F.countDistinct("text").cast("long").alias("n_text"),
        F.countDistinct("h").cast("long").alias("n_hash"))


def sql_murmur3_hash() -> str:
    # a 64-bit hash over this corpus is injective: n_hash == n_text
    return """
SELECT CAST(count(*) AS BIGINT) AS rows,
       CAST(count(DISTINCT text) AS BIGINT) AS n_text,
       CAST(count(DISTINCT text) AS BIGINT) AS n_hash
FROM documents
""".strip()


# ---------------------------------------------------------------------------
# mapper-annotated-text — goldens gate
# ---------------------------------------------------------------------------

_ANN_PROBES = [
    (0, "visit [New York](NYC) soon"),
    (1, "the [Golden Gate Bridge](Landmark&SF) at dawn"),
    (2, "plain text only"),
    (3, "[a](X%26Y) b"),
]

#: hand-derived: surface tokens at stream positions, each annotation
#: value ONE token at the first surface token's position (posInc 0);
#: %xx decoded after the & split
_ANN_GOLDENS = [
    (0, "visit", 0), (0, "NYC", 1), (0, "new", 1), (0, "york", 2),
    (0, "soon", 3),
    (1, "the", 0), (1, "Landmark", 1), (1, "SF", 1), (1, "golden", 1),
    (1, "gate", 2), (1, "bridge", 3), (1, "at", 4), (1, "dawn", 5),
    (2, "plain", 0), (2, "text", 1), (2, "only", 2),
    (3, "X&Y", 0), (3, "a", 0), (3, "b", 1),
]


def q_annotated_text(spark, sf_dir):
    """annotated_text field analysis via the Arrow UDF path
    (AnnotatedTextFieldMapper: annotations injected at the surface's
    first token position)."""
    from pyspark.sql.functions import pandas_udf

    @pandas_udf("array<struct<term:string,pos:int>>")
    def _ann(texts):
        import pandas as pd

        from sparksearch.mappers_plugins import annotated_analyze
        return pd.Series([
            [(t, p) for t, p in annotated_analyze(s or "")]
            for s in texts])

    df = spark.createDataFrame([(p, s) for p, s in _ANN_PROBES],
                               "probe int, markup string")
    return (df.select("probe", F.explode(_ann("markup")).alias("tp"))
            .select("probe", F.col("tp.term").alias("term"),
                    F.col("tp.pos").alias("pos"))
            .orderBy("probe", "pos", "term"))


def sql_annotated_text() -> str:
    vals = ", ".join(
        "({}, '{}', {})".format(p, t.replace("'", "''"), pos)
        for p, t, pos in _ANN_GOLDENS)
    return f"""
SELECT probe, term, CAST(pos AS INT) AS pos
FROM (VALUES {vals}) AS v(probe, term, pos)
ORDER BY probe, pos, term
""".strip()


# ---------------------------------------------------------------------------
# ingest-geoip analogue
# ---------------------------------------------------------------------------

def q_geoip_enrich(spark, sf_dir):
    """CIDR-range lookup enrich over the events IPs (GeoIpProcessor
    semantics; /16-bucketed broadcast equi-join plan)."""
    from sparksearch.contract_round3e import _ips
    from sparksearch.mappers_plugins import geoip_enrich
    ev = _ips(spark.read.parquet(f"{sf_dir}/events.parquet"))
    ranges = spark.createDataFrame(
        [("10.0.0.0/9", "low"), ("10.128.0.0/10", "mid")],
        "cidr string, zone string")
    out = geoip_enrich(ev, "ip", ranges)
    return (out.groupBy("zone")
            .agg(F.count("*").cast("long").alias("doc_count"))
            .orderBy(F.asc_nulls_last("zone")))


def sql_geoip_enrich() -> str:
    return """
SELECT CASE WHEN user_id % 200 < 128 THEN 'low'
            WHEN user_id % 200 < 192 THEN 'mid'
            ELSE NULL END AS zone,
       CAST(count(*) AS BIGINT) AS doc_count
FROM events GROUP BY 1 ORDER BY zone NULLS LAST
""".strip()


# ---------------------------------------------------------------------------
# DSIR importance weighting (training-data op)
# ---------------------------------------------------------------------------

def q_dsir_weights(spark, sf_dir):
    """DSIR (Xie et al. 2023) per-doc importance log-weights: bigram
    log-likelihood ratio target-vs-raw with add-1 smoothing over the
    union vocabulary; target = sources src1/src2.  Exact-bigram gate
    path (the hashed-bucket variant is the documented scale path)."""
    from sparksearch.dataops import dsir_importance
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    target = docs.where(F.col("source").isin("src1", "src2"))
    return dsir_importance(docs, target).orderBy("doc_id")


def sql_dsir_weights() -> str:
    return """
WITH toks AS ( SELECT doc_id, source, string_split(lower(text), ' ') AS w
               FROM documents ),
big AS ( SELECT doc_id, source,
                unnest(list_transform(generate_series(1, len(w)-1),
                                      i -> w[i] || ' ' || w[i+1])) AS b
         FROM toks WHERE len(w) >= 2 ),
rc AS ( SELECT b, count(*) AS cr FROM big GROUP BY b ),
tc AS ( SELECT b, count(*) AS ct FROM big
        WHERE source IN ('src1', 'src2') GROUP BY b ),
tot AS ( SELECT (SELECT sum(cr) FROM rc) AS nr,
                (SELECT sum(ct) FROM tc) AS nt,
                (SELECT count(*) FROM
                    (SELECT b FROM rc UNION SELECT b FROM tc)) AS v ),
terms AS ( SELECT big.doc_id,
                  ln((coalesce(tc.ct, 0) + 1.0) / (tot.nt + 1.0 * tot.v))
                - ln((coalesce(rc.cr, 0) + 1.0) / (tot.nr + 1.0 * tot.v))
                  AS t
           FROM big LEFT JOIN rc USING (b) LEFT JOIN tc USING (b)
           CROSS JOIN tot )
SELECT d.doc_id, round(coalesce(s.logw, 0.0), 4) AS logw
FROM documents d LEFT JOIN
     ( SELECT doc_id, sum(t) AS logw FROM terms GROUP BY doc_id ) s
     USING (doc_id)
ORDER BY d.doc_id
""".strip()


# ---------------------------------------------------------------------------
# product quantization kNN (ADC)
# ---------------------------------------------------------------------------

_PQ_M, _PQ_KC, _PQ_Q, _PQ_K = 2, 4, 7, 10


def q_knn_pq(spark, sf_dir):
    """PQ/ADC kNN (Jégou et al. 2011; the OpenSearch k-NN plugin's
    faiss IVF-PQ family): per-subspace Lloyd codebooks, m-int codes,
    query answered by an ADC lookup-table scan.  Tiny (m=2, kc=4)
    gate instance — the oracle unrolls the identical training,
    encoding, and table arithmetic; serving params are m=8-16, kc=256."""
    from sparksearch.dataops import pq_knn
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    return pq_knn(emb, query_id=_PQ_Q, k=_PQ_K, m=_PQ_M, kc=_PQ_KC,
                  iters=1)


def sql_knn_pq() -> str:
    dim, m, kc, q = 64, _PQ_M, _PQ_KC, _PQ_Q
    w = dim // m
    parts = ["""
e AS ( SELECT vec_id AS vid,
              list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
       FROM embeddings )""".strip()]
    dsql = ("list_sum(list_transform(range(1, len(s.sv) + 1), "
            "i -> (s.sv[i] - c.cv[i]) * (s.sv[i] - c.cv[i])))")
    for j in range(m):
        lo, hi = j * w + 1, (j + 1) * w
        parts.append(f"""
s{j} AS ( SELECT vid, (v)[{lo}:{hi}] AS sv FROM e ),
c{j}0 AS ( SELECT row_number() OVER (ORDER BY vid) - 1 AS cid, sv AS cv
           FROM ( SELECT vid, sv FROM s{j} ORDER BY vid LIMIT {kc} ) ),
a{j}1 AS ( SELECT vid, sv, cid AS cl FROM (
             SELECT s.vid, s.sv, c.cid, {dsql} AS d,
                    row_number() OVER (PARTITION BY s.vid
                        ORDER BY {dsql} ASC, c.cid ASC) AS rn
             FROM s{j} s, c{j}0 c ) WHERE rn = 1 ),
cm{j}1 AS ( SELECT cl AS cid, list(mm ORDER BY pos) AS cv FROM (
              SELECT cl, pos, round(avg(val), 6) AS mm
              FROM ( SELECT cl, unnest(sv) AS val,
                            generate_subscripts(sv, 1) AS pos FROM a{j}1 )
              GROUP BY cl, pos ) GROUP BY cl ),
c{j}1 AS ( SELECT cid, cv FROM cm{j}1
           UNION ALL
           SELECT cid, cv FROM c{j}0
           WHERE cid NOT IN ( SELECT cid FROM cm{j}1 ) ),
f{j} AS ( SELECT vid, cid AS code FROM (
            SELECT s.vid, c.cid, {dsql} AS d,
                   row_number() OVER (PARTITION BY s.vid
                       ORDER BY {dsql} ASC, c.cid ASC) AS rn
            FROM s{j} s, c{j}1 c ) WHERE rn = 1 ),
t{j} AS ( SELECT c.cid,
                 list_sum(list_transform(range(1, len(qq.sv) + 1),
                     i -> (qq.sv[i] - c.cv[i]) * (qq.sv[i] - c.cv[i])))
                 AS tv
          FROM c{j}1 c, ( SELECT sv FROM s{j} WHERE vid = {q} ) qq )
""".strip())
        ctes = ",\n".join(parts)
    return f"""
WITH {ctes}
SELECT f0.vid AS vec_id, round(t0.tv + t1.tv, 6) AS adc
FROM f0 JOIN f1 USING (vid)
JOIN t0 ON t0.cid = f0.code
JOIN t1 ON t1.cid = f1.code
WHERE f0.vid != {q}
ORDER BY adc ASC, vec_id ASC LIMIT {_PQ_K}
""".strip()


# ---------------------------------------------------------------------------
# lang-expression scripts
# ---------------------------------------------------------------------------

def q_script_expression(spark, sf_dir):
    """script_score with `"lang": "expression"` (modules/lang-expression):
    bare-function Lucene-expression syntax lowered to the painless
    compiler at DSL parse time, so the script still runs JVM-side."""
    from sparksearch import contract as C
    from sparksearch.dsl import from_dsl
    _, ex = C.get_engine(spark, sf_dir)
    q = from_dsl({"script_score": {
        "query": {"match": {"text": "join"}},
        "script": {"lang": "expression",
                   "source": "_score * ln(doc['dl'].value + 1)"}}})
    return C.topk_rounded(ex, q, k=10)


def sql_script_expression() -> str:
    from sparksearch import contract as C
    from sparksearch.contract_round2c import _SC_JOIN
    expr = "sc.score * ln(dl.dl + 1)"
    return f"""
WITH {C._PAGES}, {C._TOK}, {C._DL},
{_SC_JOIN}
SELECT p.docid, p.url, round({expr}, 4) AS score
FROM sc JOIN pages p USING (docid) JOIN dl USING (docid)
ORDER BY round({expr}, 4) DESC, p.docid ASC LIMIT 10
""".strip()


# ---------------------------------------------------------------------------
# continuation Snowball stemmers (snowball2.py) — goldens gates
# ---------------------------------------------------------------------------

_SNOW_RO_PROBES = [(0, "studenţii lucrează"), (1, "istorică importante")]
#: hand-derived from the Snowball Romanian spec (see tests/test_snowball2.py)
_SNOW_RO_GOLDENS = [(0, "studenţ", 0), (0, "lucr", 1),
                    (1, "istor", 0), (1, "import", 1)]

_SNOW_HU_PROBES = [(0, "házak asztallal"), (1, "embereknek könyvünk")]
_SNOW_HU_GOLDENS = [(0, "ház", 0), (0, "asztal", 1),
                    (1, "ember", 0), (1, "könyv", 1)]

_SNOW_FI_PROBES = [(0, "taloissa kaupungeissa"), (1, "kirjat nopeasti")]
_SNOW_FI_GOLDENS = [(0, "talo", 0), (0, "kaupung", 1),
                    (1, "kirj", 0), (1, "nopeast", 1)]

_SNOW_TR_PROBES = [(0, "kitapları evlerinden"), (1, "ağaçtan güzeldir")]
_SNOW_TR_GOLDENS = [(0, "kitap", 0), (0, "ev", 1),
                    (1, "ağaç", 0), (1, "güzel", 1)]

_SNOW_DE2_PROBES = [(0, "haeuser schoene"), (1, "quelle kinder")]
#: ae/oe fold to umlauts then stem as german; qu keeps its u
_SNOW_DE2_GOLDENS = [(0, "haus", 0), (0, "schon", 1),
                     (1, "quell", 0), (1, "kind", 1)]

_ID_PROBES = [(0, "makanan membaca"), (1, "belajar bukunya")]
#: Tala rules: -an suffix, mem- prefix, bel- (ajar class), -nya possessive
_ID_GOLDENS = [(0, "makan", 0), (0, "baca", 1),
               (1, "ajar", 0), (1, "buku", 1)]

_GL_PROBES = [(0, "cancións animais"), (1, "papeis libros")]
#: Galician plural reduction: ns→n, ais→al, eis→el, plain -s
_GL_GOLDENS = [(0, "canción", 0), (0, "animal", 1),
               (1, "papel", 0), (1, "libro", 1)]

#: prebuilt turkish analyzer: apostrophe strip, Turkish I→ı lowercase,
#: 've' stop hole, Snowball stems
_LA_TR_PROBES = [(0, "Istanbul'da kitaplar ve güzeldir")]
_LA_TR_GOLDENS = [(0, "ıstanbul", 0), (0, "kitap", 1), (0, "güzel", 3)]

#: prebuilt finnish analyzer: 'ja' stop hole, Snowball stems
_LA_FI_PROBES = [(0, "taloissa ja kirjat")]
_LA_FI_GOLDENS = [(0, "talo", 0), (0, "kirj", 2)]

#: Kölner Phonetik through the chain: homophones conflate; replace=false
#: stacks the code at the original's position
_CGN_SETTINGS = {
    "tokenizer": "standard",
    "filter": ["lowercase",
               {"type": "phonetic", "encoder": "koelnerphonetik",
                "replace": False}],
}
_CGN_PROBES = [(0, "Meier Mayer"), (1, "Breschnew")]
_CGN_GOLDENS = [(0, "67", 0), (0, "meier", 0), (0, "67", 1),
                (0, "mayer", 1), (1, "17863", 0), (1, "breschnew", 0)]

#: icu_normalizer nfkc_cf: ligature + fullwidth compat folds, ß casefold
_ICU_SETTINGS = {
    "tokenizer": "whitespace",
    "filter": [{"type": "icu_normalizer", "name": "nfkc_cf"}],
}
_ICU_PROBES = [(0, "ﬁsh straße Ｗｉｄｅ")]
_ICU_GOLDENS = [(0, "fish", 0), (0, "strasse", 1), (0, "wide", 2)]


# ---------------------------------------------------------------------------
# registry
# ---------------------------------------------------------------------------

def queries() -> dict:
    from sparksearch.contract_round3b import _q_stem_goldens
    stems = {
        "stem_snowball_ro": _q_stem_goldens("an_snow_ro", "romanian",
                                            _SNOW_RO_PROBES),
        "stem_snowball_hu": _q_stem_goldens("an_snow_hu", "hungarian",
                                            _SNOW_HU_PROBES),
        "stem_snowball_fi": _q_stem_goldens("an_snow_fi", "finnish",
                                            _SNOW_FI_PROBES),
        "stem_snowball_tr": _q_stem_goldens("an_snow_tr", "turkish",
                                            _SNOW_TR_PROBES),
        "stem_snowball_de2": _q_stem_goldens("an_snow_de2", "german2",
                                             _SNOW_DE2_PROBES),
        "stem_indonesian": _q_stem_goldens("an_id", "indonesian",
                                           _ID_PROBES),
        "stem_galician_min": _q_stem_goldens("an_gl_min",
                                             "minimal_galician",
                                             _GL_PROBES),
    }
    from sparksearch.contract_round3e import _q_lang_analyzer
    stems["lang_analyzer_tr"] = _q_lang_analyzer("turkish", _LA_TR_PROBES)
    stems["lang_analyzer_fi"] = _q_lang_analyzer("finnish", _LA_FI_PROBES)
    from sparksearch.contract_round3d import _q_filter_goldens
    stems["tf_cologne"] = _q_filter_goldens(
        "an_cologne", _CGN_SETTINGS, _CGN_PROBES,
        "Kölner Phonetik encoder vs published vectors (replace=false "
        "stacking)")
    stems["tf_icu_normalizer"] = _q_filter_goldens(
        "an_icu", _ICU_SETTINGS, _ICU_PROBES,
        "icu_normalizer nfkc_cf (ligature/fullwidth compat + case fold) "
        "vs Unicode-derived goldens")
    return {**stems, **{
        "mapping_size": q_mapping_size,
        "murmur3_hash": q_murmur3_hash,
        "annotated_text": q_annotated_text,
        "geoip_enrich": q_geoip_enrich,
        "script_expression": q_script_expression,
        "dsir_weights": q_dsir_weights,
        "knn_pq_adc": q_knn_pq,
    }}


def oracle_sql() -> dict:
    from sparksearch.contract_round3e import _sql_goldens_3e
    return {
        "stem_snowball_ro": _sql_goldens_3e(_SNOW_RO_GOLDENS),
        "stem_snowball_hu": _sql_goldens_3e(_SNOW_HU_GOLDENS),
        "stem_snowball_fi": _sql_goldens_3e(_SNOW_FI_GOLDENS),
        "stem_snowball_tr": _sql_goldens_3e(_SNOW_TR_GOLDENS),
        "stem_snowball_de2": _sql_goldens_3e(_SNOW_DE2_GOLDENS),
        "stem_indonesian": _sql_goldens_3e(_ID_GOLDENS),
        "stem_galician_min": _sql_goldens_3e(_GL_GOLDENS),
        "lang_analyzer_tr": _sql_goldens_3e(_LA_TR_GOLDENS),
        "lang_analyzer_fi": _sql_goldens_3e(_LA_FI_GOLDENS),
        "tf_cologne": _sql_goldens_3e(_CGN_GOLDENS),
        "tf_icu_normalizer": _sql_goldens_3e(_ICU_GOLDENS),
        "dsir_weights": sql_dsir_weights(),
        "knn_pq_adc": sql_knn_pq(),
        "mapping_size": sql_mapping_size(),
        "murmur3_hash": sql_murmur3_hash(),
        "annotated_text": sql_annotated_text(),
        "geoip_enrich": sql_geoip_enrich(),
        "script_expression": sql_script_expression(),
    }
