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
    # the copied field stays array<string> in the engine; the gate output
    # stringifies it (comma join) because the driver's canonicalizer can
    # only sort/hash scalar columns (round-2 red row: unhashable list)
    return (mapped.filter(F.array_contains("tags", "site7.example"))
            .select("url", "lang",
                    F.concat_ws(",", "tags").alias("tags"))
            .orderBy("url"))


# ---------------------------------------------------------------------------
# distributed BPE tokenizer training (training-data pipeline)
# ---------------------------------------------------------------------------

_BPE_K = 4  # merges learned in the gated entry (oracle unrolls K levels)
_BPE_CACHE: dict = {}


def _get_merges(spark, sf_dir):
    import os
    key = os.path.realpath(sf_dir)
    if key not in _BPE_CACHE:
        from sparksearch.bpe import bpe_train
        # driver_max_words=0 pins the DISTRIBUTED merge loop under the
        # oracle; the driver-local fast path is gated separately by
        # contract_round3.q_bpe_merges_local (same oracle SQL)
        _BPE_CACHE[key] = bpe_train(C.pages_df(spark, sf_dir), _BPE_K,
                                    driver_max_words=0)
    return _BPE_CACHE[key]


def q_bpe_merges(spark, sf_dir):
    """Learn the first K BPE merges from the corpus word histogram —
    (count desc, pair asc) deterministic selection, exact greedy
    left-to-right application between steps. The oracle unrolls the
    identical K iterations in SQL (a `list_reduce` fold over the
    space-joined symbol form — the same greedy scan as the engine's
    `aggregate` fold)."""
    merges = _get_merges(spark, sf_dir)
    return spark.createDataFrame(
        [(m["step"], m["left"], m["right"], m["merged"], m["pair_count"])
         for m in merges],
        "step int, left string, right string, merged string, "
        "pair_count long")


def q_bpe_tokenize(spark, sf_dir):
    """Apply the learned merge table back to the corpus: per-doc BPE
    token count for the 20 lowest-docid pages — the end-to-end
    learn-then-tokenize loop a training pipeline runs."""
    from sparksearch.bpe import bpe_apply
    merges = _get_merges(spark, sf_dir)
    out = bpe_apply(C.pages_df(spark, sf_dir), merges)
    return (out.select("url", "bpe_len").orderBy("url").limit(20))


def q_bpe_vocab(spark, sf_dir):
    """The learned tokenizer's vocab table: corpus character alphabet
    (id by symbol order) followed by the K merge symbols in learned
    order."""
    from sparksearch.bpe import bpe_vocab
    merges = _get_merges(spark, sf_dir)
    return (bpe_vocab(C.pages_df(spark, sf_dir), merges)
            .orderBy("id"))


def q_bpe_encode(spark, sf_dir):
    """Id-encoding checksum: tokenize with the learned merges, map every
    token to its vocab id via a broadcast join, and per-doc report the
    id count and id sum for the 15 lowest urls — gates the end-to-end
    text -> tokens -> ids pipeline."""
    from sparksearch.bpe import bpe_encode, bpe_vocab
    merges = _get_merges(spark, sf_dir)
    pages = C.pages_df(spark, sf_dir)
    vocab = bpe_vocab(pages, merges)
    out = bpe_encode(pages, merges, vocab)
    return (out.select(
        "url",
        F.expr("CAST(size(bpe_ids) AS INT)").alias("n_ids"),
        F.expr("CAST(aggregate(bpe_ids, 0L, (a, x) -> a + x) AS BIGINT)")
        .alias("id_sum"))
        .orderBy("url").limit(15))


def _bpe_oracle_levels(k: int) -> str:
    """CTE chain: s1..sk symbol tables, best1..bestk chosen pairs."""
    chars = ("list_transform(range(1, length(word) + 1), "
             "i -> substr(word, i, 1))")
    parts = [f"""
w0 AS ( SELECT word, CAST(count(*) AS BIGINT) AS cnt
        FROM ( SELECT unnest(string_split(text, ' ')) AS word FROM pages )
        WHERE word <> '' GROUP BY word ),
s1 AS ( SELECT cnt, array_to_string({chars}, ' ') AS syms FROM w0 )
""".strip()]
    for n in range(1, k + 1):
        parts.append(f"""
p{n} AS ( SELECT arr[i] AS a, arr[i + 1] AS b, CAST(sum(cnt) AS BIGINT) AS c
          FROM ( SELECT cnt, string_split(syms, ' ') AS arr FROM s{n} ),
               unnest(range(1, len(arr))) AS t(i)
          GROUP BY 1, 2 ),
best{n} AS ( SELECT a, b, c FROM p{n}
             ORDER BY c DESC, a ASC, b ASC LIMIT 1 )
""".strip())
        if n < k:
            parts.append(f"""
s{n + 1} AS ( SELECT cnt, {_merge_fold_sql('syms')} AS syms
              FROM s{n}, best{n} )
""".strip())
    return ",\n".join(parts)


def _merge_fold_sql(col: str) -> str:
    """Exact greedy left-to-right merge of the in-scope (a, b) pair over
    a space-joined symbol string — DuckDB list_reduce mirror of
    bpe._merge_expr (single-symbol words pass through unchanged since
    list_reduce of a 1-element list returns the element)."""
    return (f"list_reduce(string_split({col}, ' '), (acc, x) -> "
            f"CASE WHEN x = b AND string_split(acc, ' ')[-1] = a "
            f"THEN substr(acc, 1, length(acc) - length(a)) || a || b "
            f"ELSE acc || ' ' || x END)")


def _bpe_merges_sql() -> str:
    levels = _bpe_oracle_levels(_BPE_K)
    rows = "\nUNION ALL\n".join(
        f"SELECT {n} AS step, a AS \"left\", b AS \"right\", "
        f"a || b AS merged, c AS pair_count FROM best{n}"
        for n in range(1, _BPE_K + 1))
    return f"WITH {C._PAGES},\n{levels}\n{rows}\nORDER BY step"


def _bpe_tokenize_sql() -> str:
    # per-word char split, then one tok{n} CTE per learned merge, each
    # cross-joined with its 1-row best{n} so the fold lambda sees (a, b)
    # as plain columns — mirrors bpe.bpe_apply exactly
    levels = _bpe_oracle_levels(_BPE_K)
    chars_w = ("list_transform(range(1, length(w) + 1), "
               "i -> substr(w, i, 1))")
    toks = [f"""
tok0 AS ( SELECT url, list_transform(
            list_filter(string_split(text, ' '), w -> w <> ''),
            w -> array_to_string({chars_w}, ' ')) AS ws FROM pages )
""".strip()]
    for n in range(1, _BPE_K + 1):
        toks.append(f"""
tok{n} AS ( SELECT url, list_transform(ws, w -> {_merge_fold_sql('w')}) AS ws
            FROM tok{n - 1}, best{n} )
""".strip())
    chain = ",\n".join(toks)
    return f"""
WITH {C._PAGES},
{levels},
{chain}
SELECT url, CAST(len(flatten(list_transform(ws, w -> string_split(w, ' '))))
                 AS INT) AS bpe_len
FROM tok{_BPE_K} ORDER BY url LIMIT 20
""".strip()


_VOCAB_SQL = """
chars AS ( SELECT DISTINCT unnest(list_transform(
             range(1, length(t) + 1), i -> substr(t, i, 1))) AS symbol
           FROM ( SELECT replace(text, ' ', '') AS t FROM pages ) ),
base AS ( SELECT CAST(row_number() OVER (ORDER BY symbol) - 1 AS INT) AS id,
                 symbol, 'char' AS kind
          FROM chars ),
nb AS ( SELECT CAST(count(*) AS INT) AS n FROM chars )
""".strip()


def _bpe_vocab_sql() -> str:
    levels = _bpe_oracle_levels(_BPE_K)
    merge_rows = "\nUNION ALL\n".join(
        f"SELECT CAST((SELECT n FROM nb) + {i} AS INT) AS id, "
        f"(SELECT a || b FROM best{i + 1}) AS symbol, 'merge' AS kind"
        for i in range(_BPE_K))
    return f"""
WITH {C._PAGES},
{levels},
{_VOCAB_SQL}
SELECT id, symbol, kind FROM base
UNION ALL
{merge_rows}
ORDER BY id
""".strip()


def _bpe_encode_sql() -> str:
    levels = _bpe_oracle_levels(_BPE_K)
    chars_w = ("list_transform(range(1, length(w) + 1), "
               "i -> substr(w, i, 1))")
    toks = [f"""
tok0 AS ( SELECT url, list_transform(
            list_filter(string_split(text, ' '), w -> w <> ''),
            w -> array_to_string({chars_w}, ' ')) AS ws FROM pages )
""".strip()]
    for n in range(1, _BPE_K + 1):
        toks.append(f"""
tok{n} AS ( SELECT url, list_transform(ws, w -> {_merge_fold_sql('w')}) AS ws
            FROM tok{n - 1}, best{n} )
""".strip())
    chain = ",\n".join(toks)
    merge_rows = "\nUNION ALL\n".join(
        f"SELECT CAST((SELECT n FROM nb) + {i} AS INT) AS id, "
        f"(SELECT a || b FROM best{i + 1}) AS symbol"
        for i in range(_BPE_K))
    return f"""
WITH {C._PAGES},
{levels},
{chain},
{_VOCAB_SQL},
v AS ( SELECT id, symbol FROM base
       UNION ALL
       {merge_rows} ),
toks AS ( SELECT url, unnest(flatten(list_transform(
            ws, w -> string_split(w, ' ')))) AS t
          FROM tok{_BPE_K} )
SELECT url, CAST(count(*) AS INT) AS n_ids,
       CAST(sum(v.id) AS BIGINT) AS id_sum
FROM toks JOIN v ON v.symbol = toks.t
GROUP BY url ORDER BY url LIMIT 15
""".strip()


def queries() -> dict:
    return {
        "scroll_pages": q_scroll_pages,
        "bpe_vocab": q_bpe_vocab,
        "bpe_encode": q_bpe_encode,
        "mapping_multifield": q_mapping_multifield,
        "mapping_null_value": q_mapping_null_value,
        "mapping_scaled_float": q_mapping_scaled_float,
        "mapping_copy_to": q_mapping_copy_to,
        "bpe_merges": q_bpe_merges,
        "bpe_tokenize": q_bpe_tokenize,
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
SELECT url, lang,
       array_to_string([lang, split_part(url, '/', 3)], ',') AS tags
FROM pages
WHERE split_part(url, '/', 3) = 'site7.example' OR lang = 'site7.example'
ORDER BY url
""".strip()
    out["bpe_merges"] = _bpe_merges_sql()
    out["bpe_tokenize"] = _bpe_tokenize_sql()
    out["bpe_vocab"] = _bpe_vocab_sql()
    out["bpe_encode"] = _bpe_encode_sql()
    return out
