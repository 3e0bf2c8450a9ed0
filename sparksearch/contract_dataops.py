"""Driver-contract entries for the training-data operators (dataops.py).

Every Spark operator is paired with a DuckDB-dialect ANSI-SQL twin that
reproduces it EXACTLY (same md5-derived pseudo-randomness, same rounding,
same ordering), so the driver's value-hash gate checks the full pipelines —
shingling, MinHash banding, Jaccard verification, SimHash bit votes,
hyperplane LSH cells — not just row counts.
"""

from __future__ import annotations

import hashlib

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

# ---------------------------------------------------------------------------
# shared SQL fragments
# ---------------------------------------------------------------------------

#: distinct word 3-gram shingles per doc (k=3)
SHINGLES_SQL = """
tokarr AS ( SELECT doc_id, string_split(text, ' ') AS t FROM documents ),
sh AS (
  SELECT DISTINCT doc_id, unnest(gl) AS shingle FROM (
    SELECT doc_id,
           CASE WHEN len(t) >= 3 THEN
             list_transform(range(0, len(t) - 2),
                            i -> array_to_string(t[i+1:i+3], ' '))
           ELSE [] END AS gl
    FROM tokarr ) )
""".strip()

JACCARD_SQL = """
sizes AS ( SELECT doc_id, count(*) AS sz FROM sh GROUP BY doc_id ),
inter AS (
  SELECT c.id_a, c.id_b, count(*) AS inter
  FROM cand c
  JOIN sh sa ON sa.doc_id = c.id_a
  JOIN sh sb ON sb.doc_id = c.id_b AND sb.shingle = sa.shingle
  GROUP BY c.id_a, c.id_b ),
verified AS (
  SELECT c.id_a, c.id_b,
         CAST(round(CAST(coalesce(i.inter, 0) AS DOUBLE)
                    / (za.sz + zb.sz - coalesce(i.inter, 0)), 6)
              AS DOUBLE) AS jaccard
  FROM cand c
  LEFT JOIN inter i ON i.id_a = c.id_a AND i.id_b = c.id_b
  JOIN sizes za ON za.doc_id = c.id_a
  JOIN sizes zb ON zb.doc_id = c.id_b )
""".strip()


def _minhash_cols(m: int = 16) -> str:
    return ",\n         ".join(
        f"min(md5('{i}:' || shingle)) AS h{i}" for i in range(m))


def _band_cols(m: int = 16, bands: int = 4) -> str:
    r = m // bands
    return ",\n         ".join(
        "md5(" + " || '|' || ".join(f"h{b * r + j}" for j in range(r))
        + f") AS b{b}" for b in range(bands))


# ---------------------------------------------------------------------------
# Spark sides
# ---------------------------------------------------------------------------

def _docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/documents.parquet")


def _emb(spark: SparkSession, sf_dir: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/embeddings.parquet")


def q_dedup_exact(spark, sf_dir):
    from sparksearch.dataops import exact_dedup
    return exact_dedup(_docs(spark, sf_dir))


def q_dedup_minhash(spark, sf_dir):
    from sparksearch.dataops import minhash_lsh_pairs
    return minhash_lsh_pairs(_docs(spark, sf_dir), k=3, num_hashes=16,
                             bands=4, threshold=0.5)


def q_dedup_ngram(spark, sf_dir):
    from sparksearch.dataops import ngram_jaccard_pairs
    return ngram_jaccard_pairs(_docs(spark, sf_dir), k=3, threshold=0.5)


def q_dedup_simhash(spark, sf_dir):
    from sparksearch.dataops import simhash_pairs
    return simhash_pairs(_docs(spark, sf_dir), max_hamming=3)


def q_simhash_fp(spark, sf_dir):
    from sparksearch.dataops import simhash_fingerprints
    return simhash_fingerprints(_docs(spark, sf_dir)).orderBy("doc_id")


def q_knn_brute(spark, sf_dir):
    from sparksearch.dataops import brute_force_knn
    return brute_force_knn(_emb(spark, sf_dir), query_id=0, k=10)


def q_knn_lsh(spark, sf_dir):
    from sparksearch.dataops import lsh_knn
    return lsh_knn(_emb(spark, sf_dir), query_id=0, k=10, planes=4,
                   multiprobe=1)


def q_pack_sequences(spark, sf_dir):
    from sparksearch.dataops import pack_sequences
    return pack_sequences(_docs(spark, sf_dir), max_tokens=512)


def q_mixture_sample(spark, sf_dir):
    from sparksearch.dataops import mixture_sample
    return mixture_sample(_docs(spark, sf_dir),
                          {"en": 0.5, "fr": 0.25, "de": 1.0})


def q_decontaminate(spark, sf_dir):
    """Contamination check: benchmark set = every 50th doc; training set =
    the rest. Self-matches are impossible by construction (disjoint)."""
    from sparksearch.dataops import decontaminate
    d = _docs(spark, sf_dir)
    bench = d.where(F.col("doc_id") % 50 == 0)
    train = d.where(F.col("doc_id") % 50 != 0)
    return decontaminate(train, bench, k=4, window=3)


def q_lm_quality(spark, sf_dir):
    from sparksearch.dataops import lm_quality
    return lm_quality(_docs(spark, sf_dir))


def q_knn_ivf(spark, sf_dir):
    from sparksearch.dataops import ivf_knn
    return ivf_knn(_emb(spark, sf_dir), query_id=0, k=10, n_cells=8,
                   n_probe=3)


def q_lang_id(spark, sf_dir):
    from sparksearch.dataops import language_id
    return language_id(_docs(spark, sf_dir))


def q_quality(spark, sf_dir):
    from sparksearch.dataops import quality_score
    return quality_score(_docs(spark, sf_dir))


def q_token_stats(spark, sf_dir):
    from sparksearch.dataops import token_stats
    return token_stats(_docs(spark, sf_dir))


def q_winnow(spark, sf_dir):
    from sparksearch.dataops import winnow_fingerprints
    return winnow_fingerprints(_docs(spark, sf_dir), k=4, window=3)


# ---------------------------------------------------------------------------
# oracle SQL twins (DuckDB dialect-compatible ANSI subset)
# ---------------------------------------------------------------------------

def sql_dedup_exact() -> str:
    return """
SELECT min(doc_id) AS doc_id, CAST(count(*) AS BIGINT) AS n_copies
FROM documents GROUP BY md5(text) ORDER BY doc_id
""".strip()


def sql_dedup_minhash() -> str:
    return f"""
WITH {SHINGLES_SQL},
sig AS ( SELECT doc_id,
         {_minhash_cols(16)}
         FROM sh GROUP BY doc_id ),
banded AS ( SELECT doc_id,
         {_band_cols(16, 4)}
         FROM sig ),
melted AS (
  SELECT doc_id, unnest(['0:'||b0, '1:'||b1, '2:'||b2, '3:'||b3]) AS bucket
  FROM banded ),
cand AS (
  SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
  FROM melted a JOIN melted b ON a.bucket = b.bucket
  WHERE a.doc_id < b.doc_id ),
{JACCARD_SQL}
SELECT id_a, id_b, jaccard FROM verified
WHERE jaccard >= 0.5 ORDER BY id_a, id_b
""".strip()


def sql_dedup_ngram() -> str:
    return f"""
WITH {SHINGLES_SQL},
cand AS (
  SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
  FROM sh a JOIN sh b ON a.shingle = b.shingle
  WHERE a.doc_id < b.doc_id ),
{JACCARD_SQL}
SELECT id_a, id_b, jaccard FROM verified
WHERE jaccard >= 0.5 ORDER BY id_a, id_b
""".strip()


def _simhash_fp_sql() -> str:
    """CTE producing fp(doc_id, simhash) with the same md5-digit bit votes."""
    sums = []
    for d in range(16):
        for b in range(4):
            sums.append(
                f"sum((((instr('0123456789abcdef', substring(h, {d + 1}, 1))"
                f" - 1) >> {b}) & 1) * 2 - 1) AS s{d * 4 + b}")
    sums_sql = ",\n         ".join(sums)
    digits = []
    for d in range(16):
        val = " + ".join(
            f"(CASE WHEN s{d * 4 + b} > 0 THEN {1 << b} ELSE 0 END)"
            for b in range(4))
        digits.append(
            f"substring('0123456789abcdef', ({val}) + 1, 1)")
    fp = " || ".join(digits)
    return f"""
toks AS (
  SELECT doc_id, md5(tok) AS h FROM (
    SELECT doc_id, unnest(string_split(text, ' ')) AS tok FROM documents )
  WHERE tok <> '' ),
votes AS (
  SELECT doc_id,
         {sums_sql}
  FROM toks GROUP BY doc_id ),
fp AS ( SELECT doc_id, {fp} AS simhash FROM votes )
""".strip()


def sql_simhash_fp() -> str:
    return f"""
WITH {_simhash_fp_sql()}
SELECT doc_id, simhash FROM fp ORDER BY doc_id
""".strip()


def sql_dedup_simhash() -> str:
    # chunks: 4 digits each (max_hamming=3 → 4 chunks)
    chunk = ("SELECT doc_id, simhash, '{c}:' || substring(simhash, {s}, 4)"
             " AS bucket FROM fp")
    melted = " UNION ALL ".join(
        chunk.format(c=c, s=1 + 4 * c) for c in range(4))
    ham = " + ".join(
        f"(instr('0123456789abcdef', substring('0112122312232334', "
        f"xor(instr('0123456789abcdef', substring(a.fp_a, {d}, 1)) - 1, "
        f"instr('0123456789abcdef', substring(a.fp_b, {d}, 1)) - 1) + 1, 1))"
        f" - 1)" for d in range(1, 17))
    return f"""
WITH {_simhash_fp_sql()},
melted AS ( {melted} ),
cand AS (
  SELECT DISTINCT a.doc_id AS id_a, a.simhash AS fp_a,
                  b.doc_id AS id_b, b.simhash AS fp_b
  FROM melted a JOIN melted b ON a.bucket = b.bucket
  WHERE a.doc_id < b.doc_id ),
hams AS (
  SELECT id_a, id_b, CAST(({ham}) AS INT) AS hamming
  FROM (SELECT id_a, id_b, fp_a, fp_b FROM cand) a )
SELECT id_a, id_b, hamming FROM hams
WHERE hamming <= 3 ORDER BY id_a, id_b
""".strip()


_COS_SQL = """
CAST(round(
  list_sum(list_transform(range(1, len(e.v) + 1), i -> e.v[i] * q.v[i]))
  / ( sqrt(list_sum(list_transform(e.v, x -> x * x)))
    * sqrt(list_sum(list_transform(q.v, x -> x * x)))), 6) AS DOUBLE)
""".strip()


def sql_knn_brute() -> str:
    return f"""
WITH e AS ( SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings ),
q AS ( SELECT embedding::DOUBLE[] AS v FROM embeddings WHERE vec_id = 0 )
SELECT e.vec_id, {_COS_SQL} AS cosine
FROM e, q WHERE e.vec_id <> 0
ORDER BY cosine DESC, e.vec_id ASC LIMIT 10
""".strip()


def sql_pack_sequences(max_tokens: int = 512) -> str:
    return f"""
WITH toks AS ( SELECT doc_id,
    CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens
    FROM documents ),
pre AS ( SELECT doc_id, n_tokens,
    COALESCE(sum(n_tokens) OVER (ORDER BY doc_id
        ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS before
    FROM toks )
SELECT doc_id, n_tokens,
       CAST(before // {max_tokens} AS BIGINT) AS bin_id,
       CAST(before % {max_tokens} AS BIGINT) AS bin_offset
FROM pre ORDER BY doc_id
""".strip()


def sql_mixture_sample(denom: int = 10000) -> str:
    return f"""
SELECT doc_id, lang FROM documents
WHERE CAST(CONCAT('0x', substr(md5(CAST(doc_id AS VARCHAR)), 1, 8))
           AS BIGINT) % {denom}
      < (CASE lang WHEN 'en' THEN 0.5 WHEN 'fr' THEN 0.25
                   WHEN 'de' THEN 1.0 ELSE 0.0 END) * {denom}
ORDER BY doc_id
""".strip()


def sql_decontaminate() -> str:
    """Winnow both splits (benchmark = doc_id % 50 == 0) with the same
    fingerprint CTE as sql_winnow, then a fingerprint semi-join."""
    fps = """
tokarr AS ( SELECT doc_id, string_split(text, ' ') AS t FROM documents ),
kg AS (
  SELECT doc_id, pos, gh FROM (
    SELECT doc_id,
           unnest(range(0, greatest(len(t) - 3, 0))) AS pos,
           unnest(CASE WHEN len(t) >= 4 THEN
             list_transform(range(0, len(t) - 3),
                            i -> md5(array_to_string(t[i+1:i+4], ' ')))
           ELSE [] END) AS gh
    FROM tokarr ) ),
wins AS (
  SELECT DISTINCT doc_id,
         min(gh) OVER (PARTITION BY doc_id ORDER BY pos
                       ROWS BETWEEN CURRENT ROW AND 2 FOLLOWING) AS fp
  FROM kg )
""".strip()
    return f"""
WITH {fps}
SELECT DISTINCT w.doc_id FROM wins w
WHERE w.doc_id % 50 <> 0
  AND EXISTS ( SELECT 1 FROM wins b
               WHERE b.doc_id % 50 = 0 AND b.fp = w.fp )
ORDER BY w.doc_id
""".strip()


def sql_lm_quality() -> str:
    return """
WITH toks AS (
  SELECT doc_id,
         generate_subscripts(string_split(text, ' '), 1) AS pos,
         unnest(string_split(text, ' ')) AS w
  FROM documents ),
tk AS ( SELECT * FROM toks WHERE w <> '' ),
big AS ( SELECT doc_id, w,
                lead(w) OVER (PARTITION BY doc_id ORDER BY pos) AS w2
         FROM tk ),
bg AS ( SELECT * FROM big WHERE w2 IS NOT NULL ),
uc AS ( SELECT w, count(*) AS cw FROM tk GROUP BY w ),
bc AS ( SELECT w, w2, count(*) AS cb FROM bg GROUP BY w, w2 ),
v AS ( SELECT CAST(count(DISTINCT w) AS DOUBLE) AS vv FROM tk )
SELECT bg.doc_id, CAST(count(*) AS BIGINT) AS n_bigrams,
       CAST(round(avg(ln((bc.cb + 1.0) / (uc.cw + v.vv))), 6) AS DOUBLE)
         AS lm_logprob
FROM bg JOIN bc USING (w, w2) JOIN uc USING (w) CROSS JOIN v
GROUP BY bg.doc_id ORDER BY bg.doc_id
""".strip()


def sql_knn_ivf(n_cells: int = 8, n_probe: int = 3) -> str:
    """Oracle twin of dataops.ivf_knn: same sampled codebook (vec_id <
    n_cells), argmax-cosine assignment with smallest-centroid tie-break,
    top-n_probe cells for the query, exact cosine top-k inside them."""
    return f"""
WITH e AS ( SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings ),
cents AS ( SELECT vec_id AS cid, v AS cv FROM e WHERE vec_id < {n_cells} ),
ac AS ( SELECT e.vec_id, c.cid,
          list_sum(list_transform(range(1, len(e.v) + 1),
                                  i -> e.v[i] * c.cv[i]))
          / ( sqrt(list_sum(list_transform(e.v, x -> x * x)))
            * sqrt(list_sum(list_transform(c.cv, x -> x * x)))) AS cs
        FROM e CROSS JOIN cents c ),
assign AS ( SELECT vec_id, cid AS cell FROM (
    SELECT vec_id, cid,
           row_number() OVER (PARTITION BY vec_id
                              ORDER BY cs DESC, cid ASC) AS rn
    FROM ac ) WHERE rn = 1 ),
q AS ( SELECT v FROM e WHERE vec_id = 0 ),
probes AS ( SELECT cid FROM ac WHERE vec_id = 0
            ORDER BY cs DESC, cid ASC LIMIT {n_probe} )
SELECT e.vec_id, {_COS_SQL} AS cosine
FROM e JOIN assign USING (vec_id), q
WHERE assign.cell IN ( SELECT cid FROM probes ) AND e.vec_id <> 0
ORDER BY cosine DESC, e.vec_id ASC LIMIT 10
""".strip()


def _plane_sql(p: int, dim: int) -> str:
    """Hyperplane p as an inline DOUBLE[] literal (same md5-digit values the
    Spark side uses — computed here once, deterministically)."""
    vals = []
    for d in range(dim):
        h = hashlib.md5(f"{p}_{d}".encode()).hexdigest()
        vals.append(str(int(h[0], 16) - 7.5))
    return "[" + ", ".join(vals) + "]::DOUBLE[]"


def sql_knn_lsh(dim: int = 128, planes: int = 4) -> str:
    bits = []
    for p in range(planes):
        bits.append(
            f"(CASE WHEN list_sum(list_transform(range(1, {dim + 1}), "
            f"i -> v[i] * ({_plane_sql(p, dim)})[i])) > 0 "
            f"THEN '1' ELSE '0' END)")
    cell = " || ".join(bits)
    # probe cells: query cell + all 1-bit flips, as SQL string surgery
    flips = ", ".join(
        f"substring(qc.cell, 1, {p}) || "
        f"(CASE WHEN substring(qc.cell, {p + 1}, 1) = '1' THEN '0' "
        f"ELSE '1' END) || substring(qc.cell, {p + 2}, {planes - p - 1})"
        for p in range(planes))
    return f"""
WITH e AS ( SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings ),
cells AS ( SELECT vec_id, v, ({cell}) AS cell FROM e ),
qc AS ( SELECT v, cell FROM cells WHERE vec_id = 0 ),
probes AS ( SELECT unnest([qc.cell, {flips}]) AS cell FROM qc ),
q AS ( SELECT v FROM qc )
SELECT c.vec_id,
       CAST(round(
         list_sum(list_transform(range(1, {dim + 1}), i -> c.v[i] * q.v[i]))
         / ( sqrt(list_sum(list_transform(c.v, x -> x * x)))
           * sqrt(list_sum(list_transform(q.v, x -> x * x)))), 6) AS DOUBLE)
       AS cosine
FROM cells c JOIN probes p ON c.cell = p.cell CROSS JOIN q
WHERE c.vec_id <> 0
ORDER BY cosine DESC, c.vec_id ASC LIMIT 10
""".strip()


def sql_lang_id() -> str:
    from sparksearch.dataops import _LANG_MARKERS
    counts = ",\n         ".join(
        "sum(CASE WHEN tok IN ({}) THEN 1 ELSE 0 END) AS n_{}".format(
            ", ".join(f"'{w}'" for w in ws), lg)
        for lg, ws in sorted(_LANG_MARKERS.items()))
    langs = sorted(_LANG_MARKERS)
    best = "greatest(" + ", ".join(f"n_{lg}" for lg in langs) + ")"
    pick = "'und'"
    for lg in langs[::-1]:
        pick = (f"CASE WHEN n_{lg} = {best} AND {best} > 0 "
                f"THEN '{lg}' ELSE {pick} END")
    # forward order so the FIRST language in sorted order wins ties —
    # mirror dataops.language_id (reverse-built whens → first match wins)
    pick = "'und'"
    for lg in langs[::-1]:
        pick = (f"CASE WHEN n_{lg} = {best} AND {best} > 0 "
                f"THEN '{lg}' ELSE ({pick}) END")
    return f"""
WITH toks AS (
  SELECT doc_id, unnest(string_split(lower(text), ' ')) AS tok
  FROM documents ),
per AS ( SELECT doc_id,
         {counts}
         FROM toks GROUP BY doc_id )
SELECT doc_id, ({pick}) AS lang_pred FROM per ORDER BY doc_id
""".strip()


def sql_quality() -> str:
    stop = ["the", "and", "of", "to", "in", "is", "a", "that"]
    stop_in = ", ".join(f"'{w}'" for w in stop)
    return f"""
WITH base AS (
  SELECT doc_id, text,
         len(list_filter(string_split(text, ' '), t -> t <> '')) AS n_toks,
         length(text) AS text_len,
         len(list_filter(string_split(text, ' '),
                         t -> t IN ({stop_in}))) AS n_stop
  FROM documents ),
feats AS (
  SELECT doc_id,
         CAST(n_toks AS BIGINT) AS n_tokens,
         CAST(round(CAST(text_len - (n_toks - 1) AS DOUBLE) / n_toks, 6)
              AS DOUBLE) AS mean_token_len,
         CAST(round(CAST(n_stop AS DOUBLE) / n_toks, 6) AS DOUBLE)
           AS stopword_ratio,
         CAST(round(CAST(length(regexp_replace(text, '[^0-9]', '', 'g'))
                         AS DOUBLE) / greatest(text_len, 1), 6) AS DOUBLE)
           AS digit_ratio,
         CAST(round(least(n_toks / 100.0, 1.0) * 0.4
               + least((CAST(n_stop AS DOUBLE) / n_toks) * 5.0, 1.0) * 0.4
               + (1.0 - least(CAST(length(regexp_replace(text, '[^0-9]',
                  '', 'g')) AS DOUBLE) / greatest(text_len, 1) * 10.0, 1.0))
                 * 0.2, 6) AS DOUBLE) AS quality
  FROM base )
SELECT * FROM feats ORDER BY doc_id
""".strip()


def sql_token_stats() -> str:
    return """
SELECT doc_id,
       CAST(len(list_filter(string_split(text, ' '), t -> t <> ''))
            AS BIGINT) AS ws_tokens,
       CAST(ceil(length(text) / 4.0) AS BIGINT) AS bpe_tokens_est
FROM documents ORDER BY doc_id
""".strip()


def sql_winnow() -> str:
    return """
WITH tokarr AS ( SELECT doc_id, string_split(text, ' ') AS t FROM documents ),
kg AS (
  SELECT doc_id, pos, gh FROM (
    SELECT doc_id,
           unnest(range(0, greatest(len(t) - 3, 0))) AS pos,
           unnest(CASE WHEN len(t) >= 4 THEN
             list_transform(range(0, len(t) - 3),
                            i -> md5(array_to_string(t[i+1:i+4], ' ')))
           ELSE [] END) AS gh
    FROM tokarr ) ),
wins AS (
  SELECT DISTINCT doc_id,
         min(gh) OVER (PARTITION BY doc_id ORDER BY pos
                       ROWS BETWEEN CURRENT ROW AND 2 FOLLOWING) AS fp
  FROM kg )
SELECT doc_id, fp FROM wins ORDER BY doc_id, fp
""".strip()


def q_knn_join_lsh(spark, sf_dir):
    from sparksearch.dataops import lsh_knn_join
    return lsh_knn_join(_emb(spark, sf_dir), k=5, planes=4, multiprobe=1,
                        query_ids=list(range(10)))


def q_dedup_clusters(spark, sf_dir):
    from sparksearch.dataops import connected_components, minhash_lsh_pairs
    pairs = minhash_lsh_pairs(_docs(spark, sf_dir), k=3, num_hashes=16,
                              bands=4, threshold=0.5)
    return connected_components(pairs)


def sql_knn_join_lsh(dim: int = 128, planes: int = 4, k: int = 5,
                     n_queries: int = 10) -> str:
    bits = []
    for p in range(planes):
        bits.append(
            f"(CASE WHEN list_sum(list_transform(range(1, {dim + 1}), "
            f"i -> v[i] * ({_plane_sql(p, dim)})[i])) > 0 "
            f"THEN '1' ELSE '0' END)")
    cell = " || ".join(bits)
    flips = ", ".join(
        f"substring(q.cell, 1, {p}) || "
        f"(CASE WHEN substring(q.cell, {p + 1}, 1) = '1' THEN '0' "
        f"ELSE '1' END) || substring(q.cell, {p + 2}, {planes - p - 1})"
        for p in range(planes))
    dot = (f"list_sum(list_transform(range(1, {dim + 1}), "
           f"i -> cq.v[i] * cv.v[i]))")
    return f"""
WITH e AS ( SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings ),
cells AS ( SELECT vec_id, v, ({cell}) AS cell FROM e ),
q AS ( SELECT vec_id AS query_id, cell FROM cells
       WHERE vec_id < {n_queries} ),
probes AS ( SELECT query_id, unnest([q.cell, {flips}]) AS cell FROM q ),
cand AS ( SELECT DISTINCT p.query_id, c.vec_id
          FROM probes p JOIN cells c USING (cell)
          WHERE c.vec_id <> p.query_id ),
scored AS ( SELECT cd.query_id, cd.vec_id,
            CAST(round({dot}
              / ( sqrt(list_sum(list_transform(cq.v, x -> x * x)))
                * sqrt(list_sum(list_transform(cv.v, x -> x * x)))), 6)
              AS DOUBLE) AS cosine
            FROM cand cd
            JOIN cells cq ON cq.vec_id = cd.query_id
            JOIN cells cv ON cv.vec_id = cd.vec_id ),
ranked AS ( SELECT query_id, vec_id,
            CAST(row_number() OVER (PARTITION BY query_id
                 ORDER BY cosine DESC, vec_id ASC) AS INT) AS rank, cosine
            FROM scored )
SELECT query_id, vec_id, rank, cosine FROM ranked
WHERE rank <= {k} ORDER BY query_id, rank
""".strip()


def sql_dedup_clusters() -> str:
    return f"""
WITH RECURSIVE
pairs AS ( {sql_dedup_minhash()} ),
und AS ( SELECT id_a AS src, id_b AS dst FROM pairs
         UNION ALL SELECT id_b, id_a FROM pairs ),
reach(src, dst) AS (
  SELECT src, src FROM und
  UNION
  SELECT r.src, u.dst FROM reach r JOIN und u ON u.src = r.dst )
SELECT CAST(src AS BIGINT) AS doc_id, CAST(min(dst) AS BIGINT) AS cluster_id
FROM reach GROUP BY src ORDER BY doc_id
""".strip()


def queries() -> dict:
    return {
        "dedup_exact": q_dedup_exact,
        "dedup_minhash_lsh": q_dedup_minhash,
        "dedup_ngram_jaccard": q_dedup_ngram,
        "dedup_simhash": q_dedup_simhash,
        "simhash_fingerprints": q_simhash_fp,
        "knn_cosine_brute": q_knn_brute,
        "knn_cosine_lsh": q_knn_lsh,
        "knn_cosine_ivf": q_knn_ivf,
        "lm_quality": q_lm_quality,
        "pack_sequences": q_pack_sequences,
        "mixture_sample": q_mixture_sample,
        "decontaminate": q_decontaminate,
        "knn_join_lsh": q_knn_join_lsh,
        "dedup_clusters": q_dedup_clusters,
        "dedup_embedding": q_dedup_embedding,
        "lang_id": q_lang_id,
        "quality_score": q_quality,
        "token_stats": q_token_stats,
        "winnow_fingerprints": q_winnow,
    }


def oracle_sql() -> dict:
    return {
        "dedup_exact": sql_dedup_exact(),
        "dedup_minhash_lsh": sql_dedup_minhash(),
        "dedup_ngram_jaccard": sql_dedup_ngram(),
        "dedup_simhash": sql_dedup_simhash(),
        "simhash_fingerprints": sql_simhash_fp(),
        "knn_cosine_brute": sql_knn_brute(),
        "knn_cosine_lsh": sql_knn_lsh(),
        "knn_cosine_ivf": sql_knn_ivf(),
        "lm_quality": sql_lm_quality(),
        "pack_sequences": sql_pack_sequences(),
        "mixture_sample": sql_mixture_sample(),
        "decontaminate": sql_decontaminate(),
        "knn_join_lsh": sql_knn_join_lsh(),
        "dedup_clusters": sql_dedup_clusters(),
        "dedup_embedding": sql_dedup_embedding(dim=64),
        "lang_id": sql_lang_id(),
        "quality_score": sql_quality(),
        "token_stats": sql_token_stats(),
        "winnow_fingerprints": sql_winnow(),
    }


def q_dedup_embedding(spark, sf_dir):
    from sparksearch.dataops import embedding_dup_pairs
    return embedding_dup_pairs(_emb(spark, sf_dir), threshold=0.45,
                               planes=4)


def sql_dedup_embedding(dim: int = 128, planes: int = 4,
                        threshold: float = 0.45) -> str:
    bits = []
    for p in range(planes):
        bits.append(
            f"(CASE WHEN list_sum(list_transform(range(1, {dim + 1}), "
            f"i -> v[i] * ({_plane_sql(p, dim)})[i])) > 0 "
            f"THEN '1' ELSE '0' END)")
    cell = " || ".join(bits)
    cos = (f"list_sum(list_transform(range(1, {dim + 1}), "
           f"i -> a.v[i] * b.v[i])) "
           f"/ ( sqrt(list_sum(list_transform(a.v, x -> x * x))) "
           f"* sqrt(list_sum(list_transform(b.v, x -> x * x))))")
    return f"""
WITH e AS ( SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings ),
cells AS ( SELECT vec_id, v, ({cell}) AS cell FROM e ),
cand AS ( SELECT a.vec_id AS id_a, b.vec_id AS id_b, a.v AS av, b.v AS bv
          FROM cells a JOIN cells b USING (cell)
          WHERE a.vec_id < b.vec_id ),
sc AS ( SELECT id_a, id_b,
        CAST(round(list_sum(list_transform(range(1, {dim + 1}),
                 i -> av[i] * bv[i]))
          / ( sqrt(list_sum(list_transform(av, x -> x * x)))
            * sqrt(list_sum(list_transform(bv, x -> x * x)))), 6) AS DOUBLE)
          AS cosine
        FROM cand )
SELECT id_a, id_b, cosine FROM sc
WHERE cosine >= {threshold} ORDER BY id_a, id_b
""".strip()
