"""Driver-contract entries, round-2k surface: crawl-curation dataops —
PII redaction and per-domain capping.

The synthetic corpus text carries no natural PII, so the pii entry
deterministically INJECTS emails / IPv4s / phone numbers from doc_id on
BOTH sides (same concat rule in Spark and SQL) before redacting — the
gate then checks the real thing: pattern coverage, count semantics, and
replacement order, not a no-op pass-through.

DuckDB regexp_replace defaults to first-match-only, so every oracle
replace carries the 'g' flag to mirror Spark's replace-all.
"""

from __future__ import annotations

from pyspark.sql import functions as F


def _injected(spark, sf_dir):
    """documents + deterministic PII tail derived from doc_id."""
    d = spark.read.parquet(f"{sf_dir}/documents.parquet")
    tail = F.concat(
        F.lit(" contact user"), (F.col("doc_id") % 7).cast("string"),
        F.lit("@mail"), (F.col("doc_id") % 3).cast("string"),
        F.lit(".example from 10."), (F.col("doc_id") % 4).cast("string"),
        F.lit(".0."), (F.col("doc_id") % 256).cast("string"),
        F.lit(" call 555-12"), (F.col("doc_id") % 10).cast("string"),
        F.lit("-4567"))
    return d.withColumn("text", F.concat(F.col("text"), tail))


def q_pii_redact(spark, sf_dir):
    from sparksearch.dataops import pii_redact
    out = pii_redact(_injected(spark, sf_dir))
    return (out.select("doc_id", "n_emails", "n_ips", "n_phones",
                       F.md5(F.col("text")).alias("text_md5"))
            .orderBy("doc_id"))


def q_knn_sq8(spark, sf_dir):
    """SQ8 scalar-quantized kNN: both sides quantized to the global
    256-level grid, cosine over dequantized codes, top-10 for vec 0."""
    from sparksearch.dataops import sq8_knn
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    return sq8_knn(emb, query_id=0, k=10)


def q_terms_sharded(spark, sf_dir):
    """Distributed terms merge with doc_count_error_upper_bound: 4
    deterministic shards (doc_id % 4) each return only their local top-2
    langs; the coordinator sums and bounds what a missing shard may have
    hidden (InternalTerms reduce semantics)."""
    from sparksearch.aggs import terms_agg_sharded
    d = spark.read.parquet(f"{sf_dir}/documents.parquet")
    return terms_agg_sharded(d, "lang", size=5, shard_size=2,
                             shard_col=(F.col("doc_id") % 4))


def q_repeated_spans(spark, sf_dir):
    """Substring-level dedup signal: maximal token spans whose 3-gram
    shingles recur across >= 3 docs (Lee et al. suffix-array dedup,
    distributed approximation)."""
    from sparksearch.dataops import repeated_ngram_spans
    d = spark.read.parquet(f"{sf_dir}/documents.parquet")
    return repeated_ngram_spans(d, k=3, min_df=3)


def q_hashed_bow(spark, sf_dir):
    """Feature-hashed linear scorer (fastText-style classifier serving
    plumbing): token -> md5 bucket -> md5-derived weight -> mean."""
    from sparksearch.dataops import hashed_bow_score
    d = spark.read.parquet(f"{sf_dir}/documents.parquet")
    return hashed_bow_score(d, dim=1024)


def q_domain_cap(spark, sf_dir):
    """Cap the 97 synthetic hosts at 60 pages each; urls derived from
    doc_id by the corpus rule so no index build is needed."""
    from sparksearch.dataops import domain_cap
    d = spark.read.parquet(f"{sf_dir}/documents.parquet")
    url = F.concat(F.lit("https://site"),
                   (F.col("doc_id") % 97).cast("string"),
                   F.lit(".example/p/"),
                   F.lpad(F.col("doc_id").cast("string"), 8, "0"))
    pages = d.select(F.col("doc_id").alias("docid"), url.alias("url"))
    kept = domain_cap(pages, cap=60)
    return (kept.select("docid", "host",
                        F.col("host_rank").cast("long").alias("host_rank"))
            .orderBy("docid"))


_PII_TAIL_SQL = """
SELECT doc_id,
       text || ' contact user' || CAST(doc_id % 7 AS VARCHAR) ||
       '@mail' || CAST(doc_id % 3 AS VARCHAR) ||
       '.example from 10.' || CAST(doc_id % 4 AS VARCHAR) ||
       '.0.' || CAST(doc_id % 256 AS VARCHAR) ||
       ' call 555-12' || CAST(doc_id % 10 AS VARCHAR) || '-4567' AS text
FROM documents
""".strip()

_EMAIL = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
_IPV4 = "\\b(\\d{1,3}\\.){3}\\d{1,3}\\b"
_PHONE = "\\+?\\d{3}[-. ]\\d{3}[-. ]\\d{4}"


def oracle_sql() -> dict:
    return {
        "pii_redact": f"""
WITH inj AS ( {_PII_TAIL_SQL} ),
counted AS (
  SELECT doc_id, text,
         CAST(len(regexp_extract_all(text, '{_EMAIL}')) AS BIGINT) AS n_emails,
         CAST(len(regexp_extract_all(text, '{_IPV4}')) AS BIGINT) AS n_ips,
         CAST(len(regexp_extract_all(text, '{_PHONE}')) AS BIGINT) AS n_phones
  FROM inj )
SELECT doc_id, n_emails, n_ips, n_phones,
       md5(regexp_replace(regexp_replace(regexp_replace(text,
           '{_EMAIL}', '<EMAIL>', 'g'),
           '{_IPV4}', '<IP>', 'g'),
           '{_PHONE}', '<PHONE>', 'g')) AS text_md5
FROM counted
ORDER BY doc_id
""".strip(),
        "repeated_spans": """
WITH t AS ( SELECT doc_id, string_split(text, ' ') AS tt FROM documents ),
grams AS (
  SELECT doc_id, unnest(gl) AS g, generate_subscripts(gl, 1) - 1 AS pos
  FROM ( SELECT doc_id,
                CASE WHEN len(tt) >= 3 THEN
                  list_transform(range(0, len(tt) - 2),
                                 i -> array_to_string(tt[i+1:i+3], ' '))
                ELSE [] END AS gl
         FROM t ) ),
freq AS ( SELECT g FROM (
            SELECT g, count(DISTINCT doc_id) AS df FROM grams GROUP BY g )
          WHERE df >= 3 ),
hot AS ( SELECT doc_id, pos FROM grams WHERE g IN (SELECT g FROM freq) ),
runs AS ( SELECT doc_id, pos,
                 pos - row_number() OVER (PARTITION BY doc_id
                                          ORDER BY pos) AS isl
          FROM hot )
SELECT doc_id, CAST(min(pos) AS BIGINT) AS span_start,
       CAST(max(pos) + 2 AS BIGINT) AS span_end,
       CAST(count(*) AS BIGINT) AS n_grams
FROM runs GROUP BY doc_id, isl
ORDER BY doc_id, span_start
""".strip(),
        "hashed_bow": """
WITH tok AS (
  SELECT doc_id, unnest(string_split(text, ' ')) AS tkn FROM documents ),
b AS (
  SELECT doc_id,
         CAST(((instr('0123456789abcdef', substring(md5(tkn), 1, 1)) - 1)
               * 256 +
               (instr('0123456789abcdef', substring(md5(tkn), 2, 1)) - 1)
               * 16 +
               (instr('0123456789abcdef', substring(md5(tkn), 3, 1)) - 1))
              % 1024 AS INTEGER) AS bucket
  FROM tok WHERE tkn <> '' ),
w AS (
  SELECT doc_id,
         ((instr('0123456789abcdef',
                 substring(md5(CAST(bucket AS VARCHAR)), 1, 1)) - 1)
          - 7.5) / 8.0 AS w
  FROM b )
SELECT doc_id, CAST(round(avg(w), 6) AS DOUBLE) AS score
FROM w GROUP BY doc_id ORDER BY doc_id
""".strip(),
        "terms_sharded": """
WITH local AS (
  SELECT doc_id % 4 AS shard, lang AS key, count(*) AS cnt
  FROM documents WHERE lang IS NOT NULL
  GROUP BY doc_id % 4, lang ),
ranked AS (
  SELECT *, row_number() OVER (PARTITION BY shard
                               ORDER BY cnt DESC, key ASC) AS rn
  FROM local ),
per_shard AS (
  SELECT shard, count(*) AS n_all,
         min(CASE WHEN rn <= 2 THEN cnt END) AS cut
  FROM ranked GROUP BY shard ),
cutoffs AS (
  SELECT shard, CASE WHEN n_all > 2 THEN cut ELSE 0 END AS cut_eff
  FROM per_shard ),
t AS ( SELECT sum(cut_eff) AS total_cut FROM cutoffs ),
merged AS (
  SELECT r.key, sum(r.cnt) AS doc_count, sum(c.cut_eff) AS seen_cut
  FROM ranked r JOIN cutoffs c USING (shard)
  WHERE r.rn <= 2 GROUP BY r.key )
SELECT key, CAST(doc_count AS BIGINT) AS doc_count,
       CAST(t.total_cut - seen_cut AS BIGINT)
         AS doc_count_error_upper_bound
FROM merged CROSS JOIN t
ORDER BY doc_count DESC, key ASC
LIMIT 5
""".strip(),
        "knn_sq8": """
WITH comp AS (
  SELECT vec_id, unnest(embedding) AS v,
         generate_subscripts(embedding, 1) AS d
  FROM embeddings ),
g AS ( SELECT CAST(min(v) AS DOUBLE) AS lo,
              CAST(max(v) AS DOUBLE) AS hi FROM comp ),
deq AS (
  SELECT vec_id, d,
         g.lo + floor((CAST(v AS DOUBLE) - g.lo) * 255.0 / (g.hi - g.lo)
                      + 0.5) * (g.hi - g.lo) / 255.0 AS dv
  FROM comp CROSS JOIN g ),
qv AS ( SELECT d, dv AS qdv FROM deq WHERE vec_id = 0 ),
qn AS ( SELECT sqrt(sum(qdv * qdv)) AS nq FROM qv ),
dots AS (
  SELECT deq.vec_id, sum(dv * qdv) AS dot, sqrt(sum(dv * dv)) AS nv
  FROM deq JOIN qv USING (d)
  WHERE deq.vec_id <> 0
  GROUP BY deq.vec_id )
SELECT vec_id, CAST(round(dot / (nv * nq), 6) AS DOUBLE) AS cosine
FROM dots CROSS JOIN qn
ORDER BY round(dot / (nv * nq), 6) DESC, vec_id ASC
LIMIT 10
""".strip(),
        "domain_cap": """
WITH pages AS (
  SELECT doc_id AS docid,
         'https://site' || CAST(doc_id % 97 AS VARCHAR) ||
         '.example/p/' || lpad(CAST(doc_id AS VARCHAR), 8, '0') AS url
  FROM documents ),
ranked AS (
  SELECT docid,
         regexp_extract(url, '^[a-z][a-z0-9+.-]*://([^/:?#]*)', 1) AS host,
         CAST(row_number() OVER (
           PARTITION BY regexp_extract(url, '^[a-z][a-z0-9+.-]*://([^/:?#]*)', 1)
           ORDER BY docid) AS BIGINT) AS host_rank
  FROM pages )
SELECT docid, host, host_rank FROM ranked
WHERE host_rank <= 60
ORDER BY docid
""".strip(),
    }


def queries() -> dict:
    return {
        "pii_redact": q_pii_redact,
        "domain_cap": q_domain_cap,
        "knn_sq8": q_knn_sq8,
        "terms_sharded": q_terms_sharded,
        "repeated_spans": q_repeated_spans,
        "hashed_bow": q_hashed_bow,
    }
