"""Driver-contract entries for round 4 (b): the served IVF-PQ lifecycle.

- knn_ivfpq_served — `ivfpq_build` ONCE per sf_dir (coarse assign →
  residual → pq_train → pq_encode → parquet partitioned by cell +
  codebook sidecar), then `ivfpq_query` answers from the persisted
  codes with NO retraining and NO float-vector scan: the cell filter is
  directory pruning, the id exclusion a pushed-down filter, the ADC a
  constant-folded CASE.  This gates the faiss IndexIVFPQ shape the
  OpenSearch k-NN plugin serves (plugin/src/main/java/org/opensearch/
  knn/index/) including residual encoding (by_residual=true), replacing
  the per-call `ivfpq_knn` form as the scale story.

The DuckDB oracle unrolls the identical arithmetic: coarse L2 argmin to
the n_cells lowest-id vectors, residual subtraction, one deterministic
Lloyd iteration per subspace (init = kc lowest-id residual subvectors,
means rounded to 6 dp, empty clusters keep init), nearest-codebook
encoding, per-probed-cell query-residual ADC tables, round(·, 6).
"""

from __future__ import annotations

import os
import tempfile

from pyspark.sql import functions as F

_N_CELLS, _N_PROBE, _M, _KC, _Q, _K = 8, 3, 4, 8, 7, 10
_DIM = 64

_IVF_DIRS: dict[str, str] = {}


def _index_dir(spark, sf_dir: str) -> str:
    key = os.path.realpath(sf_dir)
    if key not in _IVF_DIRS:
        from sparksearch.dataops import ivfpq_build
        out = os.path.join(
            tempfile.gettempdir(),
            "sparksearch_ivfpq_" + key.strip("/").replace("/", "_"))
        if not os.path.exists(os.path.join(out, "ivfpq_meta.json")):
            emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
            ivfpq_build(emb, out, n_cells=_N_CELLS, m=_M, kc=_KC, iters=1)
        _IVF_DIRS[key] = out
    return _IVF_DIRS[key]


def q_knn_ivfpq_served(spark, sf_dir):
    """Train-once / encode-at-ingest / query-many IVF-PQ with residual
    codes (faiss IndexIVFPQ; k-NN plugin `method: ivf, encoder: pq`)."""
    from sparksearch.dataops import ivfpq_query
    idx = _index_dir(spark, sf_dir)
    qv = (spark.read.parquet(f"{sf_dir}/embeddings.parquet")
          .where(F.col("vec_id") == _Q).first()["embedding"])
    out = ivfpq_query(spark, idx, qv, k=_K, n_probe=_N_PROBE,
                      exclude_id=_Q)
    return out.select(F.col("vid").alias("vec_id"), "adc")


def sql_knn_ivfpq_served() -> str:
    return _ivfpq_sql(cc_cte=None, nc=_N_CELLS, np_=_N_PROBE, m=_M,
                      kc=_KC, q=_Q, k=_K, dim=_DIM)


def _ivfpq_sql(cc_cte: str | None, nc: int, np_: int, m: int, kc: int,
               q: int, k: int, dim: int = _DIM) -> str:
    """The served-IVFPQ DuckDB unroll, parameterized on the coarse
    codebook CTE: `cc_cte` must define `cc(ccid, ccv)` (may chain its
    own CTEs, e.g. a kmeans unroll for the trained quantizer —
    contract_round5.sql_knn_ivfpq_trained); None keeps the sampled
    lowest-id codebook."""
    w = dim // m
    l2 = ("list_sum(list_transform(range(1, len({a}) + 1), "
          "i -> ({a}[i] - {b}[i]) * ({a}[i] - {b}[i])))")
    dfull = l2.format(a="e.v", b="cc.ccv")
    dsql = l2.format(a="s.sv", b="c.cv")
    if cc_cte is None:
        cc_cte = f"cc AS ( SELECT vid AS ccid, v AS ccv FROM e " \
                 f"WHERE vid < {nc} )"
    parts = [f"""
e AS ( SELECT vec_id AS vid,
              list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
       FROM embeddings ),
{cc_cte},
asg AS ( SELECT vid, v, ccid AS cell, ccv FROM (
           SELECT e.vid, e.v, cc.ccid, cc.ccv, {dfull} AS d,
                  row_number() OVER (PARTITION BY e.vid
                      ORDER BY {dfull} ASC, cc.ccid ASC) AS rn
           FROM e, cc ) WHERE rn = 1 ),
r AS ( SELECT vid, cell,
              list_transform(range(1, len(v) + 1), i -> v[i] - ccv[i]) AS v
       FROM asg )""".strip()]
    for j in range(m):
        lo, hi = j * w + 1, (j + 1) * w
        parts.append(f"""
s{j} AS ( SELECT vid, (v)[{lo}:{hi}] AS sv FROM r ),
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
qs{j} AS ( SELECT cell, (v)[{lo}:{hi}] AS sv FROM qr ),
t{j} AS ( SELECT s.cell, c.cid,
                 {dsql} AS tv
          FROM qs{j} s, c{j}1 c )""".strip())
    qcte = f"""
qv AS ( SELECT v FROM e WHERE vid = {q} ),
pc AS ( SELECT ccid AS cell, ccv FROM (
          SELECT cc.ccid, cc.ccv,
                 {l2.format(a="q.v", b="cc.ccv")} AS d
          FROM cc, qv q ORDER BY d ASC, cc.ccid ASC LIMIT {np_} ) ),
qr AS ( SELECT pc.cell,
               list_transform(range(1, len(q.v) + 1),
                              i -> q.v[i] - pc.ccv[i]) AS v
        FROM pc, qv q )""".strip()
    parts.insert(1, qcte)
    ctes = ",\n".join(parts)
    adcsum = " + ".join(f"t{j}.tv" for j in range(m))
    joins = "\n".join(
        f"JOIN t{j} ON t{j}.cell = r.cell AND t{j}.cid = f{j}.code"
        for j in range(m))
    fjoins = " ".join(f"JOIN f{j} USING (vid)" for j in range(m))
    return f"""
WITH {ctes}
SELECT r.vid AS vec_id, round({adcsum}, 6) AS adc
FROM r {fjoins}
{joins}
WHERE r.vid != {q}
ORDER BY adc ASC, vec_id ASC LIMIT {k}
""".strip()


def q_ingest_attachment(spark, sf_dir):
    """ingest-attachment analogue (AttachmentProcessor.java:132-200):
    each document's text is wrapped in a REAL Flate-compressed PDF
    inside the job (Arrow batches, bytes never leave executors), then
    the attachment processor sniffs the type and extracts content /
    content_length / title back — a byte-exact round trip."""
    import pandas as pd
    from sparksearch.attachments import ingest_attachment, make_pdf

    docs = (spark.read.parquet(f"{sf_dir}/documents.parquet")
            .select("doc_id", "text"))

    def wrap(batches):
        for pdf in batches:
            yield pd.DataFrame({
                "doc_id": pdf["doc_id"],
                "data": [make_pdf(t, title=f"doc-{i}")
                         for i, t in zip(pdf["doc_id"], pdf["text"])]})

    pdfs = docs.mapInPandas(wrap, schema="doc_id long, data binary")
    out = ingest_attachment(pdfs, field="data")
    return (out.select("doc_id",
                       F.col("attachment_content_type").alias("ctype"),
                       F.col("attachment_content_length").alias("clen"),
                       F.col("attachment_title").alias("title"),
                       F.col("attachment_content").alias("content"))
            .orderBy("doc_id"))


def sql_ingest_attachment() -> str:
    return """
SELECT doc_id,
       'application/pdf' AS ctype,
       CAST(length(regexp_replace(text, '^\s+|\s+$', '', 'g')) AS BIGINT)
         AS clen,
       'doc-' || CAST(doc_id AS VARCHAR) AS title,
       regexp_replace(text, '^\s+|\s+$', '', 'g') AS content
FROM documents ORDER BY doc_id
""".strip()


# ---------------------------------------------------------------------------
# explain for bool / phrase (round-3 VERDICT "Missing #5": the reference
# explains every query type — ExplainPhase.java; api.py previously raised
# for anything but match)
# ---------------------------------------------------------------------------

def _bool_q():
    from sparksearch.queries import Bool, Match
    return Bool(must=[Match("text", "join")],
                should=[Match("text", "fast"), Match("text", "slow")],
                must_not=[Match("text", "error")])


def q_explain_bool(spark, sf_dir):
    """Per-clause BM25 breakdown for every top-10 hit of a mixed bool —
    Lucene BooleanWeight's "sum of:" subtree flattened with a clause
    label (fetchops._explain_bool)."""
    from sparksearch import contract as C
    from sparksearch.fetchops import explain_many
    _, ex = C.get_engine(spark, sf_dir)
    q = _bool_q()
    top = C.topk_rounded(ex, q, k=10).collect()
    return explain_many(ex, q, [r["docid"] for r in top])


def sql_explain_bool() -> str:
    from sparksearch import contract as C
    P, TOK, DL = C._PAGES, C._TOK, C._DL
    idf = C._idf_sql("dft.df", "g.n")
    tfn = C._tfn_sql("tf.tf", "dlq.dl_q", "g.avgdl")
    return f"""
WITH {P}, {TOK}, {DL},
tf AS ( SELECT docid, term, count(*) AS tf FROM tok
        WHERE term IN ('error','fast','join','slow') GROUP BY docid, term ),
dft AS ( SELECT term, count(*) AS df FROM tf GROUP BY term ),
sc AS ( SELECT tf.docid, tf.term, tf.tf, dft.df,
               {idf} AS idf_v, {tfn} AS tfn_v
        FROM tf JOIN dft USING (term) JOIN dlq USING (docid) CROSS JOIN g ),
agg AS (
  SELECT docid,
         sum(CASE WHEN term = 'join' THEN idf_v * tfn_v ELSE 0 END) AS s_must,
         sum(CASE WHEN term IN ('fast','slow') THEN idf_v * tfn_v
                  ELSE 0 END) AS s_opt,
         bool_or(term = 'join') AS has_must,
         bool_or(term = 'error') AS has_not
  FROM sc GROUP BY docid ),
top10 AS ( SELECT docid FROM agg
           WHERE has_must AND NOT has_not
           ORDER BY round(s_must + s_opt, 4) DESC, docid ASC LIMIT 10 )
SELECT sc.docid,
       CASE sc.term WHEN 'join' THEN 'must[0]:match(text:join)'
                    WHEN 'fast' THEN 'should[0]:match(text:fast)'
                    WHEN 'slow' THEN 'should[1]:match(text:slow)' END AS clause,
       sc.term, CAST(sc.tf AS DOUBLE) AS tf, CAST(sc.df AS BIGINT) AS df,
       CAST(round(sc.idf_v, 6) AS DOUBLE) AS idf,
       CAST(round(sc.tfn_v, 6) AS DOUBLE) AS tfn,
       CAST(1.0 AS DOUBLE) AS weight,
       CAST(round(sc.idf_v * sc.tfn_v, 6) AS DOUBLE) AS contribution
FROM sc JOIN top10 USING (docid)
WHERE sc.term != 'error'
ORDER BY sc.docid, clause, sc.term
""".strip()


def q_explain_phrase(spark, sf_dir):
    """Phrase pseudo-term explanation for every top-10 phrase hit —
    tf = phrase frequency, idf = Σ member idfs (PhraseWeight.explain)."""
    from sparksearch import contract as C
    from sparksearch.fetchops import explain_many
    from sparksearch.queries import MatchPhrase
    _, ex = C.get_engine(spark, sf_dir)
    q = MatchPhrase("text", "hash join")
    top = C.topk_rounded(ex, q, k=10).collect()
    return explain_many(ex, q, [r["docid"] for r in top])


def sql_explain_phrase() -> str:
    from sparksearch import contract as C
    P, TOKPOS, DL = C._PAGES, C._TOKPOS, C._DL
    idf_terms = " + ".join(
        f"(SELECT {C._idf_sql('count(*)', '(SELECT n FROM g)')} "
        f"FROM (SELECT DISTINCT docid FROM tokpos WHERE term = '{t}'))"
        for t in ("hash", "join"))
    tfn = C._tfn_sql("ph.pf", "dlq.dl_q", "g.avgdl")
    return f"""
WITH {P},
{TOKPOS},
tok AS ( SELECT docid, term FROM tokpos ),
{DL},
p0 AS ( SELECT docid, pos FROM tokpos WHERE term = 'hash' ),
p1 AS ( SELECT docid, pos FROM tokpos WHERE term = 'join' ),
ph AS ( SELECT p0.docid, count(*) AS pf
        FROM p0 JOIN p1 ON p1.docid = p0.docid AND p1.pos = p0.pos + 1
        GROUP BY p0.docid ),
top10 AS ( SELECT docid FROM (
             SELECT ph.docid, ({idf_terms}) * {tfn} AS score
             FROM ph JOIN dlq USING (docid) CROSS JOIN g )
           ORDER BY round(score, 4) DESC, docid ASC LIMIT 10 )
SELECT ph.docid, 'hash join' AS term,
       CAST(ph.pf AS DOUBLE) AS tf, CAST(NULL AS BIGINT) AS df,
       CAST(round({idf_terms}, 6) AS DOUBLE) AS idf,
       CAST(round({tfn}, 6) AS DOUBLE) AS tfn,
       CAST(1.0 AS DOUBLE) AS weight,
       CAST(round(({idf_terms}) * {tfn}, 6) AS DOUBLE) AS contribution
FROM ph JOIN top10 USING (docid) JOIN dlq USING (docid) CROSS JOIN g
ORDER BY ph.docid
""".strip()


# ---------------------------------------------------------------------------
# metaphone (analysis-phonetic, commons-codec Metaphone — the plugin's
# default encoder, previously a loud refusal)
# ---------------------------------------------------------------------------

_MP_SETTINGS = {
    "tokenizer": "whitespace",
    "filter": [{"type": "phonetic", "encoder": "metaphone",
                "replace": False}],
}
_MP_PROBES = [(0, "testing dogs knight"), (1, "SCHEDULE CHARACTER why")]
#: commons-codec MetaphoneTest vectors; replace=false stacks the code at
#: the original's position ("why" encodes to "" → no stacked token)
_MP_GOLDENS = [(0, "testing", 0), (0, "TSTN", 0),
               (0, "dogs", 1), (0, "TKS", 1),
               (0, "knight", 2), (0, "NT", 2),
               (1, "SCHEDULE", 0), (1, "SKTL", 0),
               (1, "CHARACTER", 1), (1, "KRKT", 1),
               (1, "why", 2)]

# ---------------------------------------------------------------------------
# icu_tokenizer (analysis-icu IcuTokenizerFactory): UAX#29 word break +
# dictionary break engine for CJK / SE-Asian runs
# ---------------------------------------------------------------------------

_ICU_TK_SETTINGS = {
    "tokenizer": {"type": "icu_tokenizer",
                  "dictionary": ["画面", "สวัสดี", "ครับ"]},
}
_ICU_TK_PROBES = [(0, "don't stop 3.14 1,000 e.g. test"),
                  (1, "ログイン画面です"),
                  (2, "สวัสดีครับ hello")]
#: hand-derived from UAX#29 (WB5-13b) + greedy dictionary break
_ICU_TK_GOLDENS = [(0, "don't", 0), (0, "stop", 1), (0, "3.14", 2),
                   (0, "1,000", 3), (0, "e.g", 4), (0, "test", 5),
                   (1, "ログイン", 0), (1, "画面", 1),
                   (1, "で", 2), (1, "す", 3),
                   (2, "สวัสดี", 0), (2, "ครับ", 1), (2, "hello", 2)]


# ---------------------------------------------------------------------------
# WARC source connector (Common-Crawl-shaped ingest, SURVEY §2.1)
# ---------------------------------------------------------------------------

def q_warc_ingest(spark, sf_dir):
    """Round-trip the pages corpus through REAL gzip-member WARC files:
    pack ~1/8th of the corpus per archive (applyInPandas), then
    `warc_to_pages` parses them back — url, warc_ts, and the extracted
    text must all survive byte-exactly."""
    from sparksearch.corpus import pages_from_documents
    from sparksearch.warc import pages_to_warc, warc_to_pages

    pages = pages_from_documents(spark, sf_dir)
    warcs = pages_to_warc(pages, n_files=8, compress=True)
    out = warc_to_pages(warcs)
    return out.select("url", "warc_ts", "text").orderBy("url")


def sql_warc_ingest() -> str:
    from sparksearch import contract as C
    return f"""
WITH {C._PAGES}
SELECT url, warc_ts, text FROM pages ORDER BY url
""".strip()


# ---------------------------------------------------------------------------
# rank_features (plural) — sparse feature maps
# (modules/mapper-extras/.../RankFeaturesFieldMapper.java)
# ---------------------------------------------------------------------------

def q_rank_features_map(spark, sf_dir):
    """rank_features mapper: per-doc sparse feature MAP, queried per key
    through the rank_feature functions — sigmoid on a derived 'bonus'
    feature + log on the doc-length feature, composed in a bool should
    (the documented usage)."""
    from sparksearch import contract as C
    from sparksearch.exec import Executor
    from sparksearch.queries import Bool, Match, RankFeature
    ix, _ = C.get_engine(spark, sf_dir)
    side = ix.docs.select(
        "url",
        F.create_map(
            F.lit("dlf"), F.col("dl").cast("double"),
            F.lit("bonus"), (F.col("dl") % 7 + 1).cast("double"))
        .alias("features"))
    ex2 = Executor(ix.with_docvalues(side))
    q = Bool(must=[Match("text", "join")],
             should=[RankFeature("features.bonus", function="sigmoid",
                                 pivot=3.0, exponent=2.0, boost=0.4),
                     RankFeature("features.dlf", function="log",
                                 scaling_factor=1.0, boost=0.1)])
    return C.topk_rounded(ex2, q, k=10)


def sql_rank_features_map() -> str:
    from sparksearch import contract as C
    from sparksearch.contract_round2c import _SC_JOIN
    P, TOK, DL = C._PAGES, C._TOK, C._DL
    b = "(dl.dl % 7 + 1)"
    return f"""
WITH {P}, {TOK}, {DL},
{_SC_JOIN},
rf AS ( SELECT sc.docid,
               sc.score
               + 0.4 * (pow({b}, 2.0) / (pow({b}, 2.0) + 9.0))
               + 0.1 * ln(1.0 + dl.dl) AS score
        FROM sc JOIN dl USING (docid) )
SELECT p.docid, p.url, round(rf.score, 4) AS score
FROM rf JOIN pages p USING (docid)
ORDER BY round(rf.score, 4) DESC, p.docid ASC LIMIT 10
""".strip()


# ---------------------------------------------------------------------------
# _mtermvectors (TransportMultiTermVectorsAction)
# ---------------------------------------------------------------------------

def q_mtermvectors(spark, sf_dir):
    """Batched `_mtermvectors`: three docs' vectors from one plan."""
    from sparksearch import contract as C
    from sparksearch.fetchops import term_vectors_many
    ix, _ = C.get_engine(spark, sf_dir)
    tv = term_vectors_many(ix, C.pages_df(spark, sf_dir),
                           docids=[3, 7, 11])
    return tv.withColumn(
        "positions",
        F.concat_ws(",", F.col("positions").cast("array<string>")))


def sql_mtermvectors() -> str:
    from sparksearch import contract as C
    return f"""
WITH {C._PAGES}, {C._TOKPOS}
SELECT docid, term, CAST(count(*) AS BIGINT) AS tf,
       array_to_string(list(pos ORDER BY pos), ',') AS positions
FROM tokpos WHERE docid IN (3, 7, 11)
GROUP BY docid, term ORDER BY docid, term
""".strip()


# ---------------------------------------------------------------------------
# real pixel kernel: BMP nearest-neighbor resize (multimodal stage)
# ---------------------------------------------------------------------------

def q_media_resize(spark, sf_dir):
    """Per-doc 8×6 BMPs with formula pixels → `resize_images` to 5×4
    (REAL pure-bytes nearest-neighbor pixel resample, src=(x·w)//w') →
    decoded width/height/byte-size/pixel-sum.  The oracle replays the
    identical integer resample arithmetic in SQL over a pixel grid."""
    import pandas as pd
    from sparksearch.multimodal import bmp_decode, make_bmp, resize_images

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet") \
        .select("doc_id")

    def wrap(batches):
        for pdf in batches:
            payloads = [make_bmp(
                8, 6, lambda x, y, d=int(d): (
                    (d * 7 + y * 13 + x * 31) % 256,) * 3)
                for d in pdf["doc_id"]]
            yield pd.DataFrame({"media_id": pdf["doc_id"].astype(str),
                                "payload": payloads})

    media = docs.mapInPandas(wrap, "media_id string, payload binary")
    out = resize_images(media, 5, 4)

    def summarize(batches):
        for pdf in batches:
            rows = []
            for r in pdf.itertuples(index=False):
                data = bytes(r.payload)
                _, _, px = bmp_decode(data)
                psum = sum(sum(p) for row in px for p in row)
                rows.append((int(r.media_id), int(r.width),
                             int(r.height), len(data), psum))
            yield pd.DataFrame(rows, columns=[
                "doc_id", "width", "height", "n_bytes", "pixel_sum"])

    return (out.mapInPandas(
        summarize, "doc_id long, width int, height int, "
                   "n_bytes long, pixel_sum long")
        .orderBy("doc_id"))


def sql_media_resize() -> str:
    return """
WITH px AS (
  SELECT d.doc_id, gx.x, gy.y,
         (d.doc_id * 7 + ((gy.y * 6) // 4) * 13
          + ((gx.x * 8) // 5) * 31) % 256 AS v
  FROM documents d,
       generate_series(0, 4) AS gx(x),
       generate_series(0, 3) AS gy(y) )
SELECT doc_id, CAST(5 AS INT) AS width, CAST(4 AS INT) AS height,
       CAST(118 AS BIGINT) AS n_bytes,
       CAST(3 * sum(v) AS BIGINT) AS pixel_sum
FROM px GROUP BY doc_id ORDER BY doc_id
""".strip()


# ---------------------------------------------------------------------------
# robots.txt filtering (RFC 9309) — crawl-pipeline gatekeeper
# ---------------------------------------------------------------------------

_ROBOTS_TXT = ("User-agent: evilbot\nDisallow: /\n\n"
               "User-agent: *\nDisallow: /p/000000\n"
               "Allow: /p/0000005\nDisallow: /p/*7$\n")


def q_robots_filter(spark, sf_dir):
    """RFC 9309 precedence over every host: Disallow /p/000000 (len 9)
    blocks docs 0-99, Allow /p/0000005 (len 10) re-admits 50-59, the
    wildcard-anchored Disallow /p/*7$ (len 5) blocks ids ending in 7
    unless a longer rule already decided."""
    from sparksearch.corpus import pages_from_documents
    from sparksearch.robots import robots_filter
    pages = pages_from_documents(spark, sf_dir).select("url", "lang")
    hosts = pages.select(F.regexp_extract(
        "url", r"^[a-z][a-z0-9+.-]*://([^/]*)", 1).alias("host")).distinct()
    robots = hosts.withColumn("content", F.lit(_ROBOTS_TXT))
    out = robots_filter(pages, robots, agent="ccbot")
    return out.select("url").orderBy("url")


def sql_robots_filter() -> str:
    from sparksearch import contract as C
    return f"""
WITH {C._PAGES},
x AS ( SELECT url, CAST(substr(url, length(url) - 7, 8) AS INT) AS did
       FROM pages )
SELECT url FROM x
WHERE (did BETWEEN 50 AND 59) OR (did > 99 AND did % 10 <> 7)
ORDER BY url
""".strip()


# ---------------------------------------------------------------------------
# deterministic epoch shuffle (training-data pipeline)
# ---------------------------------------------------------------------------

def q_epoch_shuffle(spark, sf_dir):
    """Reproducible per-epoch global permutation: rank = position in
    md5(key:epoch) order, computed with the two-pass ranged pattern
    (no single-task window); the oracle replays the identical md5."""
    from sparksearch.dataops import epoch_shuffle
    docs = (spark.read.parquet(f"{sf_dir}/documents.parquet")
            .select("doc_id"))
    out = epoch_shuffle(docs, epoch=3, key_cols=["doc_id"])
    return out.select("doc_id", "shuffle_rank").orderBy("doc_id")


def sql_epoch_shuffle() -> str:
    return """
SELECT doc_id,
       CAST(row_number() OVER (
           ORDER BY md5(CAST(doc_id AS VARCHAR) || ':3'),
                    CAST(doc_id AS VARCHAR)) AS BIGINT) AS shuffle_rank
FROM documents ORDER BY doc_id
""".strip()


# ---------------------------------------------------------------------------
# completion suggester regex mode (RegexOptions.java)
# ---------------------------------------------------------------------------

_CR_REGEX = "s[ctl]"


def q_completion_regex(spark, sf_dir):
    """Regex completion (RegexCompletionQuery): the pattern matches a
    PREFIX of the suggestion — 's[ctl]' reaches scan/stream/slow/... ."""
    from sparksearch import contract as C
    from sparksearch.fetchops import suggest_completion_regex
    ix, _ = C.get_engine(spark, sf_dir)
    return suggest_completion_regex(ix, _CR_REGEX, size=5)


def sql_completion_regex() -> str:
    from sparksearch import contract as C
    return f"""
WITH {C._PAGES},
{C._TOK},
d AS ( SELECT term, CAST(count(DISTINCT docid) AS BIGINT) AS df
       FROM tok GROUP BY term )
SELECT term, df FROM d
WHERE regexp_matches(term, '^(?:{_CR_REGEX})')
ORDER BY df DESC, term ASC LIMIT 5
""".strip()


def queries() -> dict:
    from sparksearch.contract_round3d import _q_filter_goldens
    return {"knn_ivfpq_served": q_knn_ivfpq_served,
            "completion_regex": q_completion_regex,
            "warc_ingest": q_warc_ingest,
            "robots_filter": q_robots_filter,
            "epoch_shuffle": q_epoch_shuffle,
            "rank_features_map": q_rank_features_map,
            "media_resize": q_media_resize,
            "mtermvectors": q_mtermvectors,
            "ingest_attachment": q_ingest_attachment,
            "query_explain_bool": q_explain_bool,
            "query_explain_phrase": q_explain_phrase,
            "tf_metaphone": _q_filter_goldens(
                "an_metaphone", _MP_SETTINGS, _MP_PROBES,
                "Metaphone encoder vs commons-codec published vectors "
                "(replace=false stacking)"),
            "tk_icu": _q_filter_goldens(
                "an_icu_tk", _ICU_TK_SETTINGS, _ICU_TK_PROBES,
                "icu_tokenizer UAX#29 word break + dictionary break "
                "engine vs hand-derived goldens")}


def oracle_sql() -> dict:
    from sparksearch.contract_round3b import _sql_goldens
    return {"knn_ivfpq_served": sql_knn_ivfpq_served(),
            "completion_regex": sql_completion_regex(),
            "warc_ingest": sql_warc_ingest(),
            "robots_filter": sql_robots_filter(),
            "epoch_shuffle": sql_epoch_shuffle(),
            "rank_features_map": sql_rank_features_map(),
            "media_resize": sql_media_resize(),
            "mtermvectors": sql_mtermvectors(),
            "ingest_attachment": sql_ingest_attachment(),
            "query_explain_bool": sql_explain_bool(),
            "query_explain_phrase": sql_explain_phrase(),
            "tf_metaphone": _sql_goldens(_MP_GOLDENS),
            "tk_icu": _sql_goldens(_ICU_TK_GOLDENS)}
