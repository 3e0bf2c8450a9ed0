"""Training-data pipeline operators over web-text corpora.

Beyond the reference's search surface, a 100 TB corpus pipeline needs
dedup / similarity / text-quality operators. Everything here is pure
DataFrame algebra (joins, groupBys, window functions, built-in expressions)
— no UDFs — so Catalyst gets full pushdown and whole-stage codegen, and
every operator has an exact ANSI-SQL twin for the DuckDB oracle gate.

Hashing: operators that need pseudo-randomness (MinHash permutations,
SimHash bit mixing, hyperplane LSH) default to md5-derived values because
md5 is bit-identical in Spark SQL and DuckDB (oracle parity). At cluster
scale swap `hash_mode="xxhash64"` for the JVM-fused 64-bit hash — same
algebra, ~3-5× cheaper, no longer oracle-comparable.

Scale notes per operator are in each docstring. The common theme: candidate
generation is always a bucketed equi-join (band bucket, simhash chunk, LSH
cell) — never an all-pairs cross join — so shuffles stay proportional to
candidate count; exact verification runs only on candidates.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

__all__ = [
    "exact_dedup",
    "paragraph_dedup",
    "substring_dedup",
    "c4_line_filters",
    "temperature_rates",
    "temperature_sample",
    "ann_recall",
    "corpus_report",
    "shingles",
    "minhash_signatures",
    "minhash_lsh_pairs",
    "ngram_jaccard_pairs",
    "simhash_fingerprints",
    "simhash_pairs",
    "brute_force_knn",
    "knn_vector_scores",
    "lsh_knn",
    "lsh_knn_join",
    "connected_components",
    "language_id",
    "quality_score",
    "token_stats",
    "winnow_fingerprints",
    "gopher_repetition",
    "pii_redact",
    "domain_cap",
    "sq8_encode",
    "sq8_knn",
    "repeated_ngram_spans",
    "hashed_bow_score",
]


# ---------------------------------------------------------------------------
# helpers
# ---------------------------------------------------------------------------

def _digit(col: Column, i: int) -> Column:
    """i-th (1-based) hex digit of an md5 string as int 0..15."""
    return (F.instr(F.lit("0123456789abcdef"),
                    F.substring(col, i, 1)) - 1).cast("int")


# ---------------------------------------------------------------------------
# exact dedup
# ---------------------------------------------------------------------------

def exact_dedup(docs: DataFrame, text_col: str = "text",
                id_col: str = "doc_id") -> DataFrame:
    """Exact duplicate removal: keep the smallest id per identical text.

    One hash-partitioned groupBy on md5(text) — the canonical map-side
    combinable dedup; at 10^12 docs the shuffle carries one (hash, min_id)
    pair per distinct text per partition.
    Returns (doc_id, n_copies) for the kept docs, ordered by doc_id.
    """
    return (docs.groupBy(F.md5(F.col(text_col)).alias("_h"))
            .agg(F.min(id_col).alias(id_col),
                 F.count("*").cast("long").alias("n_copies"))
            .select(id_col, "n_copies")
            .orderBy(id_col))


def paragraph_dedup(docs: DataFrame, text_col: str = "text",
                    key_col: str = "url", window: int = 16,
                    drop_empty: bool = True) -> DataFrame:
    """C4/Dolma-style cross-document PARAGRAPH dedup: the corpus is cut
    into fixed ``window``-token paragraphs; every paragraph seen before
    (globally, first occurrence = lowest (key, position)) is removed
    from later documents, and documents are re-assembled from their
    surviving paragraphs in order (Raffel et al. 2020 §2.2 dedups exact
    three-sentence spans; Dolma/RefinedWeb dedup exact paragraphs —
    same operator with a different span definition).

    Scale shape: paragraphs explode to (hash, key, pidx) rows; the
    global first-occurrence is ``min(struct(key, pidx))`` per hash — a
    map-side-combinable aggregation, NOT a row_number window, so a
    boilerplate paragraph repeated in 10^9 docs combines to one row per
    map partition instead of a single skewed window group. Survivors
    re-join on the hash (AQE handles residual skew) and re-assemble
    with one groupBy on the doc key.

    Returns (key, n_paras, n_kept, text) with the rebuilt text.
    """
    toks = F.filter(F.split(F.col(text_col), " "), lambda w: w != "")
    paras = (docs
             .select(F.col(key_col).alias("_k"), toks.alias("_ws"))
             .select("_k", F.posexplode(F.expr(
                 f"CASE WHEN size(_ws) = 0 THEN array() ELSE "
                 f"transform(sequence(0, CAST(ceil(size(_ws) / {window}.0)"
                 f" AS INT) - 1), i -> array_join(slice(_ws, i * {window}"
                 f" + 1, {window}), ' ')) END")).alias("_pidx", "_para")))
    firsts = (paras.groupBy(F.md5("_para").alias("_h"))
              .agg(F.min(F.struct("_k", "_pidx")).alias("_first")))
    keep = (paras.withColumn("_h", F.md5("_para"))
            .join(firsts, "_h")
            .where((F.col("_k") == F.col("_first._k"))
                   & (F.col("_pidx") == F.col("_first._pidx"))))
    out = (keep.groupBy("_k")
           .agg(F.count(F.lit(1)).cast("long").alias("n_kept"),
                F.array_join(
                    F.transform(F.array_sort(F.collect_list(
                        F.struct("_pidx", "_para"))), lambda s: s["_para"]),
                    " ").alias("_text")))
    counts = (paras.groupBy("_k")
              .agg(F.count(F.lit(1)).cast("long").alias("n_paras")))
    totals = (docs.select(F.col(key_col).alias("_k")).distinct()
              .join(counts, "_k", "left")
              .withColumn("n_paras",
                          F.coalesce("n_paras", F.lit(0).cast("long"))))
    res = (totals.join(out, "_k", "left")
           .select(F.col("_k").alias(key_col), "n_paras",
                   F.coalesce("n_kept", F.lit(0)).alias("n_kept"),
                   F.coalesce("_text", F.lit("")).alias(text_col)))
    if drop_empty:
        res = res.where(F.col("n_kept") > 0)
    return res


def substring_dedup(docs: DataFrame, text_col: str = "text",
                    key_col: str = "url", k: int = 20) -> DataFrame:
    """Unaligned exact-substring dedup (Lee et al. 2022, "Deduplicating
    Training Data Makes Language Models Better", §3.2 ExactSubstr): any
    ``k``-token span whose content already occurred earlier in the
    corpus (global (key, position) order) is deleted from the later
    position; the first occurrence survives. Unlike window-aligned
    paragraph dedup, this catches duplicated spans at ANY offset —
    the paper's suffix-array construction is replaced by the
    shuffle-native equivalent: shingle rows + a map-side-combinable
    global min per shingle hash.

    Plan shape, per stage:
    1. one row per (doc, shingle start) with md5 of the k-token window
       — built by a JVM transform over the token array, no token
       explode;
    2. first occurrence = min(struct(key, start)) per hash (partial
       aggregation, skew-safe for boilerplate shingles);
    3. later occurrences join back (AQE skew-handled) and collect to a
       per-doc sorted `starts` array;
    4. kept text = HOF filter over the token array — a token at p is
       dropped iff some duplicated start s has s <= p < s+k. All
       Catalyst; the per-token `exists` is linear in the doc's dup-span
       count, which stays small except for pathological all-duplicate
       docs (where the doc is deleted anyway).

    Returns (key, n_tokens, n_removed, text).
    """
    toks = F.filter(F.split(F.col(text_col), " "), lambda w: w != "")
    base = docs.select(F.col(key_col).alias("_k"), toks.alias("_ws"))
    sh = (base
          .select("_k", F.posexplode(F.expr(
              f"CASE WHEN size(_ws) < {k} THEN array() ELSE "
              f"transform(sequence(0, size(_ws) - {k}), i -> "
              f"md5(array_join(slice(_ws, i + 1, {k}), ' '))) END"))
           .alias("_i", "_h")))
    firsts = (sh.groupBy("_h")
              .agg(F.min(F.struct("_k", "_i")).alias("_first")))
    dup_starts = (sh.join(firsts, "_h")
                  .where((F.col("_k") != F.col("_first._k"))
                         | (F.col("_i") != F.col("_first._i")))
                  .groupBy("_k")
                  .agg(F.array_sort(F.collect_list("_i"))
                       .alias("_starts")))
    joined = (base.join(dup_starts, "_k", "left")
              .withColumn("_starts",
                          F.coalesce("_starts", F.expr("array()"))))
    kept = F.expr(
        f"transform(filter(transform(_ws, (t, p) -> struct(t AS t, "
        f"p AS p)), x -> NOT exists(_starts, s -> s <= x.p AND "
        f"x.p < s + {k})), x -> x.t)")
    return (joined
            .select(F.col("_k").alias(key_col),
                    F.size("_ws").cast("long").alias("n_tokens"),
                    (F.size("_ws") - F.size(kept)).cast("long")
                    .alias("n_removed"),
                    F.array_join(kept, " ").alias(text_col)))


def c4_line_filters(docs: DataFrame, text_col: str = "text",
                    key_col: str = "url",
                    min_words_per_line: int = 3,
                    min_sentences: int = 5) -> DataFrame:
    """C4 cleaning heuristics (Raffel et al. 2020 §2.2 — the published
    rule set behind the C4 corpus):

    line level (applied to ``\\n``-separated lines):
      - keep only lines ending in a terminal punctuation mark
        (``. ! ? "``)
      - drop lines with fewer than ``min_words_per_line`` words
      - drop lines containing the word "javascript" (case-insensitive)
    page level (on the ORIGINAL page, as in the paper):
      - drop pages with fewer than ``min_sentences`` sentences
        (counted as terminal-punctuation marks in the retained lines)
      - drop pages containing "lorem ipsum" (case-insensitive)
      - drop pages containing a curly brace
    (The paper's bad-words list and its three-sentence-span dedup are
    separate concerns: pass your own list to a filter, and see
    ``paragraph_dedup``/``substring_dedup``.)

    Pure Catalyst HOFs over the line array — one narrow projection, no
    shuffle, no Python. Returns every input row with
    (key, n_lines, n_kept_lines, sentences, kept, text) where ``text``
    is the retained-lines join and ``kept`` the page-level verdict.
    """
    lines = F.split(F.col(text_col), "\n")
    keep_line = (
        f"l -> l rlike '[.!?\"]\\\\s*$' "
        f"AND size(filter(split(l, ' '), w -> w <> '')) >= "
        f"{int(min_words_per_line)} "
        f"AND NOT lower(l) rlike 'javascript'")
    kept_lines = F.expr(f"filter(split({text_col}, '\\n'), {keep_line})")
    kept_text = F.array_join(kept_lines, "\n")
    sentences = (F.length(kept_text)
                 - F.length(F.translate(kept_text, ".!?", "")))
    page_ok = ((sentences >= int(min_sentences))
               & ~F.lower(F.col(text_col)).contains("lorem ipsum")
               & ~F.col(text_col).contains("{"))
    return docs.select(
        F.col(key_col),
        F.size(lines).cast("long").alias("n_lines"),
        F.size(kept_lines).cast("long").alias("n_kept_lines"),
        sentences.cast("long").alias("sentences"),
        page_ok.alias("kept"),
        kept_text.alias(text_col))


# ---------------------------------------------------------------------------
# shingling + MinHash + LSH
# ---------------------------------------------------------------------------

def shingles(docs: DataFrame, k: int = 3, text_col: str = "text",
             id_col: str = "doc_id") -> DataFrame:
    """Distinct word k-gram shingles per doc: (doc_id, shingle).

    Token explode + window-free self-zip via posexplode and slicing —
    all built-ins, distinct applied per doc.
    """
    toks = docs.select(
        F.col(id_col),
        F.split(F.col(text_col), " ").alias("_t"))
    n = F.size("_t")
    grams = toks.select(
        id_col,
        F.explode(
            F.when(n >= k,
                   F.transform(F.sequence(F.lit(0), n - k),
                               lambda i: F.concat_ws(
                                   " ", F.slice("_t", i + 1, k))))
            .otherwise(F.array())).alias("shingle"))
    return grams.distinct()


def minhash_signatures(sh: DataFrame, num_hashes: int = 16,
                       id_col: str = "doc_id") -> DataFrame:
    """MinHash signature per doc: (doc_id, h0..h{m-1}).

    Permutation i = min over shingles of md5(i || ':' || shingle) (string
    min — portable across engines). One groupBy computes all m minima
    (map-side combine keeps the shuffle at m values per doc per partition).
    """
    aggs = [F.min(F.md5(F.concat(F.lit(f"{i}:"), F.col("shingle"))))
            .alias(f"h{i}") for i in range(num_hashes)]
    return sh.groupBy(id_col).agg(*aggs)


def minhash_lsh_pairs(docs: DataFrame, k: int = 3, num_hashes: int = 16,
                      bands: int = 4, threshold: float = 0.7,
                      text_col: str = "text",
                      id_col: str = "doc_id") -> DataFrame:
    """Near-duplicate pairs via MinHash banding + exact Jaccard verify.

    rows_per_band = num_hashes / bands; docs sharing any band bucket become
    candidates (bucketed equi-join — shuffle ∝ candidates, not n²);
    candidates are verified with the exact shingle Jaccard, keeping pairs
    ≥ threshold. Returns (id_a, id_b, jaccard), id_a < id_b, ordered.
    """
    assert num_hashes % bands == 0
    r = num_hashes // bands
    sh = shingles(docs, k, text_col, id_col).persist()
    sig = minhash_signatures(sh, num_hashes, id_col)
    band_cols = [
        F.md5(F.concat_ws("|", *[F.col(f"h{b * r + j}") for j in range(r)]))
        .alias(f"b{b}") for b in range(bands)]
    banded = sig.select(id_col, *band_cols)
    melted = banded.select(
        id_col,
        F.explode(F.array(*[
            F.concat(F.lit(f"{b}:"), F.col(f"b{b}")) for b in range(bands)
        ])).alias("bucket"))
    a = melted.alias("a")
    b_ = melted.alias("b")
    cand = (a.join(b_, "bucket")
            .where(F.col(f"a.{id_col}") < F.col(f"b.{id_col}"))
            .select(F.col(f"a.{id_col}").alias("id_a"),
                    F.col(f"b.{id_col}").alias("id_b"))
            .distinct())
    verified = _jaccard_verify(cand, sh, id_col)
    sh.unpersist()
    return (verified.where(F.col("jaccard") >= threshold)
            .orderBy("id_a", "id_b"))


def _jaccard_verify(cand: DataFrame, sh: DataFrame,
                    id_col: str = "doc_id") -> DataFrame:
    sizes = sh.groupBy(id_col).agg(F.count("*").alias("sz"))
    sh_a = sh.select(F.col(id_col).alias("id_a"), F.col("shingle"))
    sh_b = sh.select(F.col(id_col).alias("id_b"), F.col("shingle"))
    inter = (cand.join(sh_a, "id_a").join(sh_b, ["id_b", "shingle"])
             .groupBy("id_a", "id_b").agg(F.count("*").alias("inter")))
    out = (cand
           .join(inter, ["id_a", "id_b"], "left")
           .join(sizes.withColumnRenamed(id_col, "id_a")
                      .withColumnRenamed("sz", "sz_a"), "id_a")
           .join(sizes.withColumnRenamed(id_col, "id_b")
                      .withColumnRenamed("sz", "sz_b"), "id_b"))
    j = (F.coalesce(F.col("inter"), F.lit(0)).cast("double")
         / (F.col("sz_a") + F.col("sz_b")
            - F.coalesce(F.col("inter"), F.lit(0))))
    return out.select("id_a", "id_b", F.round(j, 6).alias("jaccard"))


def ngram_jaccard_pairs(docs: DataFrame, k: int = 3, threshold: float = 0.5,
                        text_col: str = "text",
                        id_col: str = "doc_id") -> DataFrame:
    """Exact n-gram Jaccard near-dup pairs (the small-scale oracle path).

    Candidates = pairs sharing ≥1 shingle (inverted-index join on the
    shingle itself), then the same exact verify. MinHash-LSH is the scale
    path; this is exact and quadratic only within shingle buckets.
    """
    sh = shingles(docs, k, text_col, id_col).persist()
    sh_a = sh.select(F.col(id_col).alias("id_a"), "shingle")
    sh_b = sh.select(F.col(id_col).alias("id_b"), "shingle")
    cand = (sh_a.join(sh_b, "shingle")
            .where(F.col("id_a") < F.col("id_b"))
            .select("id_a", "id_b").distinct())
    out = (_jaccard_verify(cand, sh, id_col)
           .where(F.col("jaccard") >= threshold)
           .orderBy("id_a", "id_b"))
    sh.unpersist()
    return out


# ---------------------------------------------------------------------------
# SimHash
# ---------------------------------------------------------------------------

def simhash_fingerprints(docs: DataFrame, bits: int = 64,
                         text_col: str = "text",
                         id_col: str = "doc_id") -> DataFrame:
    """64-bit SimHash per doc as a 16-hex-digit string.

    Token bit j comes from hex digit j//4 of md5(token) (portable across
    engines); per doc, bit j of the fingerprint is the sign of
    Σ_tokens (2·bit_j − 1). One explode + one groupBy with 16 digit sums.
    """
    assert bits == 64
    toks = docs.select(
        F.col(id_col),
        F.explode(F.split(F.col(text_col), " ")).alias("tok"))
    toks = toks.where(F.col("tok") != "").withColumn("_h", F.md5("tok"))
    digit_sums = []
    for d in range(16):
        v = _digit(F.col("_h"), d + 1)
        # 4 bits per hex digit: accumulate each bit's +1/-1 vote packed per
        # digit — emit 4 separate sums
        for b in range(4):
            bit = F.shiftright(v, b).bitwiseAND(F.lit(1))
            digit_sums.append(
                F.sum(bit * 2 - 1).alias(f"s{d * 4 + b}"))
    agg = toks.groupBy(id_col).agg(*digit_sums)
    # rebuild hex fingerprint: digit d = Σ_b (s_{4d+b} > 0) << b
    digits = []
    for d in range(16):
        val = None
        for b in range(4):
            piece = (F.col(f"s{d * 4 + b}") > 0).cast("int") * (1 << b)
            val = piece if val is None else (val + piece)
        digits.append(F.lit("0123456789abcdef").substr(val + 1, F.lit(1)))
    fp = F.concat(*digits).alias("simhash")
    return agg.select(id_col, fp)


def simhash_pairs(docs: DataFrame, max_hamming: int = 3,
                  text_col: str = "text",
                  id_col: str = "doc_id") -> DataFrame:
    """Near-dup pairs with SimHash hamming distance ≤ max_hamming.

    Pigeonhole banding: split the 16 hex digits into max_hamming+1 chunks;
    any pair within distance shares ≥1 identical chunk, so candidates come
    from equality joins on chunks (shuffle ∝ candidates). Hamming distance
    is then computed exactly on the two fingerprints (digit-wise popcount).
    Returns (id_a, id_b, hamming), ordered.
    """
    fps = simhash_fingerprints(docs, 64, text_col, id_col).persist()
    nchunks = max_hamming + 1
    per = 16 // nchunks or 1
    chunks = []
    start = 1
    for c in range(nchunks):
        ln = per if c < nchunks - 1 else 16 - per * (nchunks - 1)
        chunks.append(F.concat(F.lit(f"{c}:"),
                               F.substring("simhash", start, ln))
                      .alias(f"c{c}"))
        start += ln
    melted = (fps.select(id_col, "simhash", *chunks)
              .select(id_col, "simhash",
                      F.explode(F.array(*[F.col(f"c{c}")
                                          for c in range(nchunks)]))
                      .alias("bucket")))
    a = melted.select(F.col(id_col).alias("id_a"),
                      F.col("simhash").alias("fp_a"), "bucket")
    b = melted.select(F.col(id_col).alias("id_b"),
                      F.col("simhash").alias("fp_b"), "bucket")
    cand = (a.join(b, "bucket").where(F.col("id_a") < F.col("id_b"))
            .select("id_a", "fp_a", "id_b", "fp_b").distinct())
    # exact hamming via per-digit XOR popcount (popcount of 0..15 inline)
    pop = F.lit("0112122312232334")  # popcount LUT for a hex nibble
    ham = None
    for d in range(1, 17):
        va = _digit(F.col("fp_a"), d)
        vb = _digit(F.col("fp_b"), d)
        x = va.bitwiseXOR(vb)
        # LUT chars are '0'..'4'; instr over the hex alphabet maps them
        # back to ints 0..4
        piece = (F.instr(F.lit("0123456789abcdef"),
                         pop.substr(x + 1, F.lit(1))) - 1)
        ham = piece if ham is None else ham + piece
    out = (cand.select("id_a", "id_b", ham.cast("int").alias("hamming"))
           .where(F.col("hamming") <= max_hamming)
           .orderBy("id_a", "id_b"))
    fps.unpersist()
    return out


# ---------------------------------------------------------------------------
# embedding similarity
# ---------------------------------------------------------------------------

def _cosine(a: Column, b: Column) -> Column:
    dot = F.aggregate(F.zip_with(a, b, lambda x, y: x * y),
                      F.lit(0.0), lambda acc, v: acc + v)
    na = F.sqrt(F.aggregate(a, F.lit(0.0), lambda acc, v: acc + v * v))
    nb = F.sqrt(F.aggregate(b, F.lit(0.0), lambda acc, v: acc + v * v))
    return dot / (na * nb)


def brute_force_knn(emb: DataFrame, query_id: int, k: int = 10,
                    id_col: str = "vec_id",
                    vec_col: str = "embedding") -> DataFrame:
    """Exact cosine top-k against one query vector.

    The query row is a 1-row broadcast cross join; the dot product is a
    JVM-side higher-order function (zip_with + aggregate) — fully
    distributed scan, TakeOrderedAndProject top-k, no Python.
    """
    q = emb.where(F.col(id_col) == query_id) \
           .select(F.col(vec_col).alias("_qv"))
    scored = (emb.crossJoin(F.broadcast(q))
              .where(F.col(id_col) != query_id)
              .select(id_col,
                      F.round(_cosine(F.col(vec_col).cast("array<double>"),
                                      F.col("_qv").cast("array<double>")),
                              6).alias("cosine")))
    return scored.orderBy(F.col("cosine").desc(),
                          F.col(id_col).asc()).limit(k)


def knn_vector_scores(emb: DataFrame, vector: list[float],
                      space_type: str = "cosinesimil",
                      id_col: str = "vec_id",
                      vec_col: str = "embedding") -> DataFrame:
    """Score every vector against one LITERAL query vector — the knn
    query's scoring pass (k-NN plugin spaces; plugin repo, not in
    /root/reference core). Returns (id_col, score) unlimited; callers
    apply the top-k.

    Score transforms mirror the plugin's distance→score maps:
    cosinesimil → (2 - (1 - cos)) / 2 = (1 + cos) / 2;  l2 → 1 / (1 + d²).
    The query vector is a Catalyst array literal broadcast inside the
    expression — no join, no Python; TakeOrderedAndProject downstream.
    """
    qv = F.array(*[F.lit(float(x)) for x in vector])
    v = F.col(vec_col).cast("array<double>")
    if space_type == "cosinesimil" and not any(float(x) for x in vector):
        # the plugin rejects this too (cosine undefined for the zero
        # vector); catching it driver-side avoids an ANSI 0/0 task error
        raise ValueError("zero vector is not supported for cosinesimil")
    if space_type == "cosinesimil":
        score = (F.lit(1.0) + _cosine(v, qv)) / 2.0
    elif space_type == "l2":
        d2 = F.aggregate(F.zip_with(v, qv, lambda x, y: (x - y) * (x - y)),
                         F.lit(0.0), lambda acc, z: acc + z)
        score = 1.0 / (1.0 + d2)
    else:
        raise ValueError(f"unsupported space_type: {space_type}")
    return emb.select(id_col, score.alias("score"))


def _plane_vals(planes: int, dim: int) -> list[list[float]]:
    import hashlib
    return [[int(hashlib.md5(f"{p}_{d}".encode()).hexdigest()[0], 16) - 7.5
             for d in range(dim)] for p in range(planes)]


def _cell_expr(vc: Column, planes_vals: list[list[float]]) -> Column:
    bits = []
    for pv in planes_vals:
        arr = F.array(*[F.lit(v) for v in pv])
        dot = F.aggregate(F.zip_with(vc, arr, lambda x, y: x * y),
                          F.lit(0.0), lambda acc, v: acc + v)
        bits.append((dot > 0).cast("int").cast("string"))
    return F.concat(*bits)


def lsh_planes_for(n: int, target_bucket: int = 1024,
                   lo: int = 1, hi: int = 24) -> int:
    """Auto-size the hyperplane count from the corpus size: 2^planes
    cells with ~n/2^planes vectors each, so planes = ceil(log2(n /
    target_bucket)) keeps the EXPECTED bucket at `target_bucket` and the
    per-cell candidate join ~O(n * target_bucket) instead of the
    near-quadratic blowup a fixed small plane count hits at 100 TB."""
    import math
    if n <= target_bucket:
        return lo
    return max(lo, min(hi, math.ceil(math.log2(n / target_bucket))))


def lsh_bucket_stats(emb: DataFrame, planes: int,
                     vec_col: str = "embedding") -> DataFrame:
    """Bucket-size histogram for a plane count — the skew check a 100 TB
    run logs before committing to an LSH join: (bucket_size, n_cells)."""
    dim = len(emb.select(vec_col).first()[0])
    v = F.col(vec_col).cast("array<double>")
    return (emb.select(_cell_expr(v, _plane_vals(planes, dim))
                       .alias("_cell"))
            .groupBy("_cell").agg(F.count(F.lit(1)).alias("bucket_size"))
            .groupBy("bucket_size").agg(F.count(F.lit(1)).alias("n_cells"))
            .orderBy(F.col("bucket_size").desc()))


def lsh_knn_join(emb: DataFrame, k: int = 5, planes: int | None = 4,
                 multiprobe: int = 1, query_ids: list | None = None,
                 id_col: str = "vec_id", vec_col: str = "embedding",
                 target_bucket: int = 1024,
                 max_bucket: int | None = None,
                 n_total: int | None = None) -> DataFrame:
    """Batch ANN join: top-k cosine neighbors for EVERY vector at once —
    the 100 TB training-pipeline shape (all-queries ANN, not per-query).

    Every vector doubles as query and candidate: candidates carry their
    LSH cell; queries melt to their own cell plus (multiprobe=1) each
    1-bit-flipped cell. Neighbor candidates come from the cell equi-join —
    shuffle ∝ Σ bucket sizes, never the n² cross join — then exact cosine
    re-rank and a per-query window top-k. `query_ids` optionally restricts
    the query side (the candidate index stays full).

    Scale controls:
    - `planes=None` auto-sizes from the corpus count via
      `lsh_planes_for(n, target_bucket)` (pass `n_total` to skip the
      count job when the caller already knows it);
    - `max_bucket` is the skew guard: cells larger than it are split
      into ceil(size/max_bucket) sub-cells by a second hash of the id,
      and each query probes only its own sub-cell inside an oversized
      bucket — bounding every joined bucket at ~max_bucket candidates
      (a documented recall trade inside pathological hash cells, which
      at web scale are near-duplicate clusters anyway). The split is one
      tiny cells-aggregation + a broadcast join; bucket counts are
      |cells|-sized, never corpus-sized.

    Returns (query_id, vec_id, rank, cosine) ordered by query then rank.
    """
    dim = len(emb.select(vec_col).first()[0])
    if planes is None:
        n = n_total if n_total is not None else emb.count()
        planes = lsh_planes_for(n, target_bucket)
    pv = _plane_vals(planes, dim)
    v = F.col(vec_col).cast("array<double>")
    with_cell = emb.select(F.col(id_col), v.alias("_v"),
                           _cell_expr(v, pv).alias("_cell"))
    qside = with_cell
    if query_ids is not None:
        qside = qside.where(F.col(id_col).isin(list(query_ids)))
    probe_cols = [F.col("_cell")]
    for p in range(planes * (1 if multiprobe >= 1 else 0)):
        flipped = F.concat(
            F.substring("_cell", 1, p),
            F.when(F.substring("_cell", p + 1, 1) == "1", "0")
             .otherwise("1"),
            F.substring("_cell", p + 2, planes - p - 1))
        probe_cols.append(flipped)
    probes = qside.select(
        F.col(id_col).alias("query_id"), F.col("_v").alias("_qv"),
        F.explode(F.array(*probe_cols)).alias("_cell"))
    if max_bucket:
        sizes = (with_cell.groupBy("_cell")
                 .agg(F.count(F.lit(1)).alias("_bn")))
        nsub = F.greatest(F.lit(1),
                          F.ceil(F.col("_bn") / F.lit(max_bucket)))
        sub_of = lambda idc: F.concat(  # noqa: E731
            F.col("_cell"), F.lit("#"),
            F.pmod(F.xxhash64(idc), nsub).cast("string"))
        with_cell = (with_cell.join(F.broadcast(sizes), "_cell")
                     .withColumn("_cell", sub_of(F.col(id_col)))
                     .drop("_bn"))
        probes = (probes.join(F.broadcast(sizes), "_cell")
                  .withColumn("_cell", sub_of(F.col("query_id")))
                  .drop("_bn"))
    cand = (probes.join(with_cell, "_cell")
            .where(F.col("query_id") != F.col(id_col))
            .dropDuplicates(["query_id", id_col]))
    scored = cand.select(
        "query_id", id_col,
        F.round(_cosine(F.col("_qv"), F.col("_v")), 6).alias("cosine"))
    w = Window.partitionBy("query_id").orderBy(
        F.col("cosine").desc(), F.col(id_col).asc())
    return (scored.withColumn("rank", F.row_number().over(w))
            .where(F.col("rank") <= k)
            .select("query_id", id_col, F.col("rank").cast("int"), "cosine")
            .orderBy("query_id", "rank"))


def connected_components(pairs: DataFrame, id_a: str = "id_a",
                         id_b: str = "id_b", max_iter: int = 50) -> DataFrame:
    """Connected components over near-duplicate pairs → dedup clusters:
    (doc_id, cluster_id = min id in the component).

    Iterative min-label propagation in pure DataFrame algebra: each round
    every node takes min(own label, neighbors' labels); converges in
    O(component diameter) rounds (near-dup clusters are shallow). Each
    round is one join + groupBy — shuffle ∝ |E|; the driver only sees the
    single changed-count per round. This is the pairs→groups step a
    training-data pipeline runs after MinHash/SimHash pair generation.
    """
    edges = pairs.select(F.col(id_a).alias("src"), F.col(id_b).alias("dst"))
    und = edges.unionByName(
        edges.select(F.col("dst").alias("src"), F.col("src").alias("dst")))
    und = und.persist()
    labels = (und.select(F.col("src").alias("id")).distinct()
              .withColumn("label", F.col("id"))
              .persist())
    for _ in range(max_iter):
        nbr = (und.join(labels.select(F.col("id").alias("dst"),
                                      F.col("label").alias("_nl")), "dst")
               .groupBy("src").agg(F.min("_nl").alias("_ml")))
        new = (labels.join(nbr.withColumnRenamed("src", "id"), "id", "left")
               .select("id",
                       F.least(F.col("label"),
                               F.coalesce(F.col("_ml"), F.col("label")))
                       .alias("label"))
               .persist())
        changed = (new.join(labels.withColumnRenamed("label", "_old"), "id")
                   .where(F.col("label") != F.col("_old")).count())
        labels.unpersist()
        labels = new
        if changed == 0:
            break
    und.unpersist()
    return (labels.select(F.col("id").alias("doc_id"),
                          F.col("label").alias("cluster_id"))
            .orderBy("doc_id"))


def lsh_knn(emb: DataFrame, query_id: int, k: int = 10, planes: int = 8,
            multiprobe: int = 1,
            id_col: str = "vec_id", vec_col: str = "embedding") -> DataFrame:
    """Approximate cosine top-k via random-hyperplane LSH with multi-probe.

    Hyperplane p's d-th component = (hexdigit(md5(p||'_'||d)) − 7.5)
    (deterministic, portable). Cell = sign bits of the P plane dot
    products; the exact scan covers the query's cell plus (multiprobe=1)
    every cell at Hamming distance 1 — P+1 cells of 2^P, so the scan
    fraction is ~(P+1)/2^P of the corpus while recall stays high. The
    probe set is a tiny isin list (broadcast); candidates come from an
    equi-semi-join on the cell id, never a full scan.
    """
    dim = len(emb.select(vec_col).first()[0])

    def plane_comp(p: int, d: int) -> float:
        # mirrors md5-digit extraction: value of first hex digit
        import hashlib
        h = hashlib.md5(f"{p}_{d}".encode()).hexdigest()
        return int(h[0], 16) - 7.5

    planes_vals = [[plane_comp(p, d) for d in range(dim)]
                   for p in range(planes)]

    def cell_expr(vc: Column) -> Column:
        bits = []
        for p in range(planes):
            arr = F.array(*[F.lit(v) for v in planes_vals[p]])
            dot = F.aggregate(F.zip_with(vc, arr, lambda x, y: x * y),
                              F.lit(0.0), lambda acc, v: acc + v)
            bits.append((dot > 0).cast("int").cast("string"))
        return F.concat(*bits)

    with_cell = emb.withColumn(
        "_cell", cell_expr(F.col(vec_col).cast("array<double>")))
    qrow = with_cell.where(F.col(id_col) == query_id) \
        .select(vec_col, "_cell").first()
    qcell = qrow["_cell"]
    probe_cells = [qcell]
    if multiprobe >= 1:
        for p in range(planes):
            flipped = qcell[:p] + ("0" if qcell[p] == "1" else "1") \
                + qcell[p + 1:]
            probe_cells.append(flipped)
    qv = F.array(*[F.lit(float(v)) for v in qrow[vec_col]])
    scored = (with_cell
              .where(F.col("_cell").isin(probe_cells))
              .where(F.col(id_col) != query_id)
              .select(id_col,
                      F.round(_cosine(F.col(vec_col).cast("array<double>"),
                                      qv), 6).alias("cosine")))
    return scored.orderBy(F.col("cosine").desc(),
                          F.col(id_col).asc()).limit(k)


# ---------------------------------------------------------------------------
# text analysis
# ---------------------------------------------------------------------------

_LANG_MARKERS = {
    "en": ["the", "and", "of", "to", "in", "is", "with", "for"],
    "de": ["der", "die", "das", "und", "ist", "mit", "für", "nicht"],
    "es": ["el", "la", "los", "las", "es", "con", "para", "por"],
    "fr": ["le", "la", "les", "et", "est", "avec", "pour", "dans"],
}


def language_id(docs: DataFrame, text_col: str = "text",
                id_col: str = "doc_id") -> DataFrame:
    """Marker-word language ID: argmax of per-language marker hits
    (deterministic tie-break by language code). One explode + pivot-free
    conditional aggregation."""
    toks = docs.select(
        F.col(id_col),
        F.explode(F.split(F.lower(F.col(text_col)), " ")).alias("tok"))
    aggs = [F.sum(F.col("tok").isin(ws).cast("int")).alias(f"n_{lg}")
            for lg, ws in sorted(_LANG_MARKERS.items())]
    per = toks.groupBy(id_col).agg(*aggs)
    best = F.greatest(*[F.col(f"n_{lg}") for lg in sorted(_LANG_MARKERS)])
    pick = None
    for lg in sorted(_LANG_MARKERS, reverse=True):
        cond = (F.col(f"n_{lg}") == best) & (best > 0)
        pick = F.when(cond, F.lit(lg)).otherwise(
            pick if pick is not None else F.lit("und"))
    return per.select(id_col, pick.alias("lang_pred")).orderBy(id_col)


def quality_score(docs: DataFrame, text_col: str = "text",
                  id_col: str = "doc_id") -> DataFrame:
    """Heuristic quality features + score: token count, mean token length,
    stopword ratio, digit ratio. Pure column expressions."""
    toks = F.split(F.col(text_col), " ")
    n_toks = F.size(F.filter(toks, lambda t: t != ""))
    text_len = F.length(F.col(text_col))
    mean_tok_len = (text_len - (n_toks - 1)).cast("double") / n_toks
    stop = ["the", "and", "of", "to", "in", "is", "a", "that"]
    n_stop = F.size(F.filter(toks, lambda t: t.isin(stop)))
    stop_ratio = n_stop.cast("double") / n_toks
    digit_ratio = (F.length(F.regexp_replace(F.col(text_col), "[^0-9]", ""))
                   .cast("double") / F.greatest(text_len, F.lit(1)))
    score = (F.least(n_toks / F.lit(100.0), F.lit(1.0)) * 0.4
             + F.least(stop_ratio * 5.0, F.lit(1.0)) * 0.4
             + (1.0 - F.least(digit_ratio * 10.0, F.lit(1.0))) * 0.2)
    return docs.select(
        F.col(id_col),
        n_toks.cast("long").alias("n_tokens"),
        F.round(mean_tok_len, 6).alias("mean_token_len"),
        F.round(stop_ratio, 6).alias("stopword_ratio"),
        F.round(digit_ratio, 6).alias("digit_ratio"),
        F.round(score, 6).alias("quality"),
    ).orderBy(id_col)


def token_stats(docs: DataFrame, text_col: str = "text",
                id_col: str = "doc_id") -> DataFrame:
    """Token counting: whitespace tokens and a BPE-ish estimate
    (ceil(chars/4) — the standard subword budget heuristic)."""
    toks = F.split(F.col(text_col), " ")
    n_ws = F.size(F.filter(toks, lambda t: t != ""))
    n_bpe = F.ceil(F.length(F.col(text_col)) / F.lit(4.0))
    return docs.select(
        F.col(id_col),
        n_ws.cast("long").alias("ws_tokens"),
        n_bpe.cast("long").alias("bpe_tokens_est"),
    ).orderBy(id_col)


def winnow_fingerprints(docs: DataFrame, k: int = 4, window: int = 3,
                        text_col: str = "text",
                        id_col: str = "doc_id") -> DataFrame:
    """Winnowing document fingerprints (rolling k-gram hash, min per
    window) — the classic local fingerprinting scheme for copy detection.

    k-gram hash = md5 (portable); the window min is a SQL window function
    over token position. Returns distinct (doc_id, fp) ordered.
    """
    grams = docs.select(
        F.col(id_col),
        F.split(F.col(text_col), " ").alias("_t"))
    n = F.size("_t")
    kg = grams.select(
        id_col,
        F.posexplode(
            F.when(n >= k,
                   F.transform(F.sequence(F.lit(0), n - k),
                               lambda i: F.md5(F.concat_ws(
                                   " ", F.slice("_t", i + 1, k)))))
            .otherwise(F.array())).alias("pos", "gh"))
    w = (Window.partitionBy(id_col).orderBy("pos")
         .rowsBetween(0, window - 1))
    fps = kg.select(id_col, F.min("gh").over(w).alias("fp")).distinct()
    return fps.orderBy(id_col, "fp")


def embedding_dup_pairs(emb: DataFrame, threshold: float = 0.9,
                        planes: int = 4, id_col: str = "vec_id",
                        vec_col: str = "embedding") -> DataFrame:
    """Embedding-cosine near-duplicate pairs: hyperplane-LSH same-cell
    candidate generation → exact cosine verify ≥ threshold, (id_a < id_b).

    The 100 TB shape: shuffle ∝ Σ cell-bucket sizes (the n² cross join
    never materializes); feed the pairs to connected_components for
    dedup clusters. More planes → smaller buckets → fewer candidates and
    a higher (documented) false-negative floor, exactly the LSH recall
    trade the MinHash path makes."""
    dim = len(emb.select(vec_col).first()[0])
    pv = _plane_vals(planes, dim)
    v = F.col(vec_col).cast("array<double>")
    with_cell = emb.select(F.col(id_col), v.alias("_v"),
                           _cell_expr(v, pv).alias("_cell"))
    a = with_cell.select(F.col(id_col).alias("id_a"),
                         F.col("_v").alias("_va"), "_cell")
    b = with_cell.select(F.col(id_col).alias("id_b"),
                         F.col("_v").alias("_vb"), "_cell")
    return (a.join(b, "_cell")
            .where(F.col("id_a") < F.col("id_b"))
            .select("id_a", "id_b",
                    F.round(_cosine(F.col("_va"), F.col("_vb")), 6)
                    .alias("cosine"))
            .where(F.col("cosine") >= threshold)
            .orderBy("id_a", "id_b"))


def ivf_knn(emb: DataFrame, query_id: int, k: int = 10, n_cells: int = 8,
            n_probe: int = 2, id_col: str = "vec_id",
            vec_col: str = "embedding") -> DataFrame:
    """IVF (inverted-file) ANN: coarse-quantize vectors to their nearest
    centroid cell, then scan only the `n_probe` cells nearest the query —
    the classic IVF-Flat index (Faiss/SPANN family), the ANN scale path
    beside hyperplane LSH.

    Deterministic coarse codebook: the first `n_cells` vectors by id ARE
    the centroids (sampled codebook — no RNG, so the DuckDB oracle can
    replicate assignments exactly). Assignment = argmax cosine, ties to
    the smallest centroid index. The 100 TB shape: the cell column is
    computed once at ingest (a write-side withColumn, here inline), each
    query scans ~n_probe/n_cells of the corpus with a pushed-down IN
    filter, and the codebook is a driver-side broadcast of n_cells·dim
    floats — no shuffle, no n² join.
    """
    cents = [list(map(float, r[vec_col])) for r in
             emb.where(F.col(id_col) < n_cells)
                .orderBy(id_col).select(vec_col).collect()]

    def cos_to(c: list[float], vc: Column) -> Column:
        arr = F.array(*[F.lit(x) for x in c])
        return _cosine(vc, arr)

    v = F.col(vec_col).cast("array<double>")
    cs = F.array(*[cos_to(c, v) for c in cents])
    cell = (F.array_position(cs, F.array_max(cs)) - 1).cast("int")
    assigned = emb.select(F.col(id_col), v.alias("_v"), cell.alias("_cell"))

    qrow = assigned.where(F.col(id_col) == query_id) \
                   .select("_v").collect()[0]
    qv = list(map(float, qrow["_v"]))
    import math as _m

    def _cos_py(a, b):
        dot = sum(x * y for x, y in zip(a, b))
        na = _m.sqrt(sum(x * x for x in a))
        nb = _m.sqrt(sum(x * x for x in b))
        return dot / (na * nb)

    order = sorted(range(len(cents)),
                   key=lambda i: (-_cos_py(qv, cents[i]), i))
    probes = order[:n_probe]

    qarr = F.array(*[F.lit(x) for x in qv])
    return (assigned
            .where(F.col("_cell").isin(probes))
            .where(F.col(id_col) != query_id)
            .select(id_col,
                    F.round(_cosine(F.col("_v"), qarr), 6).alias("cosine"))
            .orderBy(F.col("cosine").desc(), F.col(id_col).asc())
            .limit(k))


def pack_sequences(docs: DataFrame, max_tokens: int = 512,
                   text_col: str = "text",
                   id_col: str = "doc_id",
                   partitions: int | None = None) -> DataFrame:
    """Sequence packing for LLM training: concatenate docs in id order and
    chunk at `max_tokens` — each doc is assigned the bin its FIRST token
    lands in (concat-and-chunk packing, the standard high-utilization
    alternative to pad-per-doc). Deterministic: bin = floor(prefix_sum /
    max_tokens) over whitespace token counts in id order.

    Scale shape — the DISTRIBUTED two-pass prefix sum (assign_docids'
    scheme), not a global window (a Window.orderBy with no partitionBy
    collapses 10^12 rows onto one task): range-partition by id, sum each
    partition's tokens (one P-row collect), then add per-partition offsets
    inside a partition-local window. No single-task bottleneck, no driver
    data beyond P longs."""
    spark = docs.sparkSession
    p = partitions or spark.sparkContext.defaultParallelism
    toks = (docs.select(
        F.col(id_col),
        F.size(F.split(F.col(text_col), " ")).cast("long")
        .alias("n_tokens"))
        .repartitionByRange(p, F.col(id_col))
        .sortWithinPartitions(id_col)
        .withColumn("_pid", F.spark_partition_id())
        .persist())
    sums = {r["_pid"]: r["s"] for r in
            toks.groupBy("_pid").agg(F.sum("n_tokens").alias("s")).collect()}
    offsets, acc = {}, 0
    for pid in sorted(sums):
        offsets[pid] = acc
        acc += sums[pid]
    off_map = F.create_map(*[x for pid, o in offsets.items()
                             for x in (F.lit(int(pid)), F.lit(int(o)))])
    w = (Window.partitionBy("_pid").orderBy(id_col)
         .rowsBetween(Window.unboundedPreceding, -1))
    out = toks.select(
        id_col, "n_tokens",
        (F.coalesce(F.sum("n_tokens").over(w), F.lit(0))
         + F.element_at(off_map, F.col("_pid"))).alias("_before"))
    res = (out.select(
        id_col, "n_tokens",
        (F.col("_before") / max_tokens).cast("long").alias("bin_id"),
        (F.col("_before") % max_tokens).cast("long").alias("bin_offset"))
        .orderBy(id_col))
    res._sparksearch_cached = toks  # caller may unpersist after the action
    return res


def mixture_sample(docs: DataFrame, rates: dict[str, float],
                   key_col: str = "lang", id_col: str = "doc_id",
                   denom: int = 10000) -> DataFrame:
    """Deterministic training-mixture sampling: keep a `rates[key]`
    fraction of each source (language/domain/corpus), chosen by content
    hash — reproducible across runs and engines, no RNG state. A source
    absent from `rates` is dropped (rate 0).

    Hash = md5 prefix for oracle parity (xxhash64 is the documented scale
    swap); keep iff hash(id) % denom < rate·denom. One scan, no shuffle."""
    rmap = F.create_map(*[x for k, v in rates.items()
                          for x in (F.lit(k), F.lit(float(v)))])
    rate = F.coalesce(F.element_at(rmap, F.col(key_col)), F.lit(0.0))
    h = F.conv(F.substring(F.md5(F.col(id_col).cast("string")), 1, 8),
               16, 10).cast("long") % denom
    return (docs.filter(h < rate * denom)
            .select(id_col, key_col).orderBy(id_col))


def corpus_report(docs: DataFrame, text_col: str = "text",
                  key_col: str = "lang") -> DataFrame:
    """Per-source corpus card: the summary table a training-data
    pipeline publishes per crawl snapshot — doc count, token volume,
    exact token-length percentiles, and the exact-duplicate rate, per
    source plus a ``__total__`` row.

    One narrow projection (token count + content hash per doc) feeding
    one map-side-combinable grouped aggregation; percentiles are exact
    here (the oracle gate) — swap ``percentile`` for
    ``percentile_approx`` at the 10^12-doc scale, same plan shape.

    Returns (key, n_docs, n_tokens, p50_dl, p95_dl, dup_rate).
    """
    base = docs.select(
        F.coalesce(F.col(key_col), F.lit("__null__")).alias("_k"),
        F.size(F.filter(F.split(F.col(text_col), " "),
                        lambda w: w != "")).alias("_dl"),
        F.md5(F.col(text_col)).alias("_h"))

    def agg(grouped):
        return grouped.agg(
            F.count("*").cast("long").alias("n_docs"),
            F.sum("_dl").cast("long").alias("n_tokens"),
            F.round(F.expr("percentile(_dl, 0.5)"), 4).alias("p50_dl"),
            F.round(F.expr("percentile(_dl, 0.95)"), 4).alias("p95_dl"),
            F.round((F.count("*") - F.countDistinct("_h"))
                    / F.count("*"), 6).alias("dup_rate"))

    per = agg(base.groupBy(F.col("_k").alias("key")))
    total = agg(base.groupBy(F.lit("__total__").alias("key")))
    return per.unionByName(total).orderBy("key")


def ann_recall(emb: DataFrame, query_ids: list[int], k: int = 10,
               n_cells: int = 8, n_probe: int = 3,
               id_col: str = "vec_id",
               vec_col: str = "embedding") -> DataFrame:
    """Recall@k of IVF-Flat against exact brute force over a query set
    — the standard ANN quality harness (the k-NN plugin's recall tooling
    measures exactly this; recall = |approx top-k ∩ exact top-k| / k
    per query).

    One distributed plan for ALL queries: the query vectors broadcast
    against the corpus for the exact ranking (|Q|·N score rows — the
    ground-truth cost every recall harness pays), the IVF ranking
    reuses the same score frame restricted to the probed cells, and
    both top-k's are per-query window ranks. No driver loop over
    queries.

    Returns (query_id, n_hits, recall) per query plus the
    query-averaged summary row (query_id = -1).
    """
    ids = sorted(int(q) for q in query_ids)
    e = emb.select(F.col(id_col).alias("_id"),
                   F.col(vec_col).alias("_v"))
    qs = (e.where(F.col("_id").isin(ids))
          .select(F.col("_id").alias("_qid"), F.col("_v").alias("_qv")))
    cos = _cosine(F.col("_v"), F.col("_qv"))
    pairs = (e.crossJoin(F.broadcast(qs))
             .where(F.col("_id") != F.col("_qid"))
             .select("_qid", "_id", cos.alias("_cos")))
    wq = Window.partitionBy("_qid").orderBy(F.col("_cos").desc(),
                                            F.col("_id").asc())
    truth = (pairs.withColumn("_rn", F.row_number().over(wq))
             .where(F.col("_rn") <= k).select("_qid", "_id"))
    # IVF side: sampled codebook (vec_id < n_cells, the ivf_knn
    # convention), argmax-cosine assignment, per-query top-n_probe cells
    cents = (e.where(F.col("_id") < n_cells)
             .select(F.col("_id").alias("_cid"),
                     F.col("_v").alias("_cv")))
    ac = (e.crossJoin(F.broadcast(cents))
          .select("_id", "_cid",
                  _cosine(F.col("_v"), F.col("_cv")).alias("_cs")))
    wa = Window.partitionBy("_id").orderBy(F.col("_cs").desc(),
                                           F.col("_cid").asc())
    assign = (ac.withColumn("_rn", F.row_number().over(wa))
              .where(F.col("_rn") == 1).select("_id", "_cid"))
    probes = (ac.where(F.col("_id").isin(ids))
              .withColumn("_rn", F.row_number().over(
                  Window.partitionBy("_id").orderBy(
                      F.col("_cs").desc(), F.col("_cid").asc())))
              .where(F.col("_rn") <= n_probe)
              .select(F.col("_id").alias("_qid"), "_cid"))
    cand = (pairs.join(assign, "_id")
            .join(F.broadcast(probes), ["_qid", "_cid"], "left_semi"))
    approx = (cand.withColumn("_rn", F.row_number().over(wq))
              .where(F.col("_rn") <= k).select("_qid", "_id"))
    hits = (truth.join(approx, ["_qid", "_id"], "left_semi")
            .groupBy("_qid").agg(F.count("*").cast("long")
                                 .alias("n_hits")))
    per_q = (qs.select("_qid").join(hits, "_qid", "left")
             .select(F.col("_qid").cast("int").alias("query_id"),
                     F.coalesce("n_hits", F.lit(0).cast("long"))
                     .alias("n_hits"))
             .withColumn("recall",
                         F.round(F.col("n_hits") / float(k), 4)))
    summary = per_q.agg(
        F.lit(-1).cast("int").alias("query_id"),
        F.sum("n_hits").cast("long").alias("n_hits"),
        F.round(F.avg("recall"), 4).alias("recall"))
    return per_q.unionByName(summary).orderBy("query_id")


def temperature_rates(docs: DataFrame, key_col: str = "lang",
                      temperature: float = 2.0,
                      target_frac: float = 0.5) -> DataFrame:
    """Temperature-based mixture weights (the multilingual sampling
    rule of XLM-R / mT5: q_d ∝ p_d^(1/T), flattening the source
    distribution toward uniform as T grows). Given a target corpus
    fraction, converts the q distribution to per-source KEEP RATES:
    rate_d = min(1, q_d · target · N / n_d) — sources the temperature
    up-weights saturate at 1 rather than oversample (no replacement).

    One map-side-combinable count per source; returns
    (key, n, p, q, rate) with rate rounded to 6 places so the
    downstream hash-threshold comparison is engine-stable.
    """
    counts = (docs.groupBy(F.col(key_col).alias("key"))
              .agg(F.count("*").cast("long").alias("n")))
    tot = counts.agg(F.sum("n").cast("double").alias("_N"))
    j = counts.crossJoin(F.broadcast(tot))
    p = F.col("n") / F.col("_N")
    q_raw = F.pow(p, 1.0 / float(temperature))
    zdf = (j.select(q_raw.alias("_q")).agg(F.sum("_q").alias("_Z")))
    j2 = j.crossJoin(F.broadcast(zdf))
    q = F.pow(p, 1.0 / float(temperature)) / F.col("_Z")
    rate = F.least(F.lit(1.0),
                   q * float(target_frac) * F.col("_N") / F.col("n"))
    return (j2.select("key", "n",
                      F.round(p, 6).alias("p"),
                      F.round(q, 6).alias("q"),
                      F.round(rate, 6).alias("rate"))
            .orderBy("key"))


def temperature_sample(docs: DataFrame, key_col: str = "lang",
                       id_col: str = "doc_id",
                       temperature: float = 2.0,
                       target_frac: float = 0.5,
                       denom: int = 10000) -> DataFrame:
    """Deterministic temperature-mixture sampling: per-source rates
    from ``temperature_rates`` applied through ``mixture_sample``'s
    content-hash rule (md5(id) % denom < rate·denom) — reproducible
    across runs and engines, no RNG state. The tiny per-source rate
    table is collected driver-side (|sources| rows)."""
    rates = {r["key"]: r["rate"]
             for r in temperature_rates(docs, key_col, temperature,
                                        target_frac).collect()}
    return mixture_sample(docs, rates, key_col=key_col, id_col=id_col,
                          denom=denom)


def decontaminate(docs: DataFrame, benchmark: DataFrame,
                  k: int = 4, window: int = 3,
                  text_col: str = "text",
                  id_col: str = "doc_id") -> DataFrame:
    """Benchmark decontamination: flag training docs sharing ANY winnowing
    fingerprint (k-gram rolling-hash local minima) with a held-out
    benchmark set — the standard n-gram-overlap train/test contamination
    check. Returns the contaminated doc ids (distinct, ordered).

    Scale shape: fingerprint both sides (winnow_fingerprints — window over
    positions, no n²), then ONE semi-join keyed by fingerprint; the
    benchmark side is tiny and broadcasts."""
    d_fps = winnow_fingerprints(docs, k=k, window=window,
                                text_col=text_col, id_col=id_col)
    b_fps = (winnow_fingerprints(benchmark, k=k, window=window,
                                 text_col=text_col, id_col=id_col)
             .select("fp").distinct())
    return (d_fps.join(F.broadcast(b_fps), "fp", "left_semi")
            .select(id_col).distinct().orderBy(id_col))


def lm_quality(docs: DataFrame, text_col: str = "text",
               id_col: str = "doc_id") -> DataFrame:
    """Language-model quality scoring: per-doc mean bigram log-probability
    under the corpus's OWN add-one-smoothed bigram LM — the classic
    perplexity-style filter (gibberish / boilerplate / outlier docs score
    far below the corpus mode) used beside heuristic quality_score in
    training-data pipelines.

    ln P(w2|w1) = ln( (c(w1,w2) + 1) / (c(w1) + V) ), averaged over the
    doc's bigrams. All JVM-side: token explode, lead() bigrams, two
    map-side-combined count aggregations, two joins keyed by the grams, a
    1-row vocab broadcast. Shuffle ∝ corpus bigram count — no n², no
    Python."""
    toks = (docs.select(
        F.col(id_col),
        F.posexplode(F.split(F.col(text_col), " ")).alias("pos", "w"))
        .filter(F.col("w") != ""))
    w2 = F.lead("w").over(Window.partitionBy(id_col).orderBy("pos"))
    big = (toks.select(id_col, "w", w2.alias("w2"))
           .filter(F.col("w2").isNotNull()))
    uc = toks.groupBy("w").agg(F.count("*").alias("_cw"))
    bc = big.groupBy("w", "w2").agg(F.count("*").alias("_cb"))
    vocab = toks.agg(F.countDistinct("w").cast("double").alias("_v"))
    j = (big.join(bc, ["w", "w2"]).join(uc, "w")
         .crossJoin(F.broadcast(vocab)))
    lp = F.log((F.col("_cb") + 1.0) / (F.col("_cw") + F.col("_v")))
    return (j.groupBy(id_col)
            .agg(F.count("*").cast("long").alias("n_bigrams"),
                 F.round(F.avg(lp), 6).alias("lm_logprob"))
            .orderBy(id_col))


def gopher_repetition(docs: DataFrame, text_col: str = "text",
                      id_col: str = "doc_id",
                      top2_max: float = 0.20,
                      dup3_max: float = 0.60) -> DataFrame:
    """Gopher-style repetition signals (Rae et al. 2021 §A1.1, the
    repetition-removal rules every large-scale text pipeline runs):

      top2_frac — fraction of the doc's characters contained in
                  occurrences of its most frequent 2-gram
                  (tie-break: higher count, then lexicographic gram)
      dup3_frac — fraction of characters in 3-grams occurring >= 2 times
                  (occurrence-counted, capped at 1.0 — overlaps are not
                  deduplicated, documented divergence from the paper)
      flagged   — top2_frac > top2_max OR dup3_frac > dup3_max

    Character counts exclude the single-space separators (sum of token
    lengths). All JVM-side: token posexplode, lead() windows per doc,
    map-side-combined counts — shuffle is one hash partition by doc id,
    no Python, no n².
    """
    toks = (docs.select(
        F.col(id_col),
        F.posexplode(F.split(F.col(text_col), " ")).alias("pos", "w"))
        .filter(F.col("w") != ""))
    win = Window.partitionBy(id_col).orderBy("pos")
    g = toks.select(
        id_col, "w",
        F.lead("w", 1).over(win).alias("w2"),
        F.lead("w", 2).over(win).alias("w3"))
    chars = toks.groupBy(id_col).agg(
        F.sum(F.length("w")).cast("double").alias("_chars"))

    g2 = (g.filter(F.col("w2").isNotNull())
          .groupBy(id_col, "w", "w2")
          .agg(F.count("*").alias("_c"),
               F.min(F.length("w") + F.length("w2")).alias("_len")))
    top_w = Window.partitionBy(id_col).orderBy(
        F.col("_c").desc(), F.col("w").asc(), F.col("w2").asc())
    top2 = (g2.withColumn("_rn", F.row_number().over(top_w))
            .filter(F.col("_rn") == 1)
            .select(id_col, (F.col("_c") * F.col("_len"))
                    .cast("double").alias("_top2_chars")))

    g3 = (g.filter(F.col("w3").isNotNull())
          .groupBy(id_col, "w", "w2", "w3")
          .agg(F.count("*").alias("_c"),
               F.min(F.length("w") + F.length("w2") + F.length("w3"))
               .alias("_len")))
    dup3 = (g3.filter(F.col("_c") >= 2)
            .groupBy(id_col)
            .agg(F.sum(F.col("_c") * F.col("_len"))
                 .cast("double").alias("_dup3_chars")))

    top2_frac = F.round(F.least(
        F.coalesce(F.col("_top2_chars"), F.lit(0.0)) / F.col("_chars"),
        F.lit(1.0)), 6)
    dup3_frac = F.round(F.least(
        F.coalesce(F.col("_dup3_chars"), F.lit(0.0)) / F.col("_chars"),
        F.lit(1.0)), 6)
    return (chars.join(top2, id_col, "left").join(dup3, id_col, "left")
            .select(F.col(id_col),
                    top2_frac.alias("top2_frac"),
                    dup3_frac.alias("dup3_frac"),
                    ((top2_frac > top2_max) | (dup3_frac > dup3_max))
                    .alias("flagged"))
            .orderBy(id_col))


# ---------------------------------------------------------------------------
# URL canonicalization + URL-level dedup (crawl-pipeline hygiene)
# ---------------------------------------------------------------------------

def canonical_url(c: Column) -> Column:
    """RFC 3986-style URL normalization as a pure Catalyst expression
    chain: strip fragment → lowercase scheme://host[:port] → drop default
    ports (:80 http, :443 https) → remove tracking params (utm_*, fbclid,
    gclid; other params kept) → strip one trailing slash.

    Every step is a regexp over the URL string — whole-stage codegen, no
    UDF — so it runs at full scan speed over a 10^12-row crawl. Patterns
    are RE2-compatible (no lookaround) so the DuckDB oracle can mirror
    them 1:1.
    """
    c = F.regexp_replace(c, r"#.*$", "")
    head = F.lower(F.regexp_extract(c, r"^[a-zA-Z][a-zA-Z0-9+.-]*://[^/?#]*", 0))
    tail = F.regexp_replace(c, r"^[a-zA-Z][a-zA-Z0-9+.-]*://[^/?#]*", "")
    c = F.concat(head, tail)
    c = F.regexp_replace(c, r"^(https://[^/:?#]*):443(/|\?|$)", "$1$2")
    c = F.regexp_replace(c, r"^(http://[^/:?#]*):80(/|\?|$)", "$1$2")
    _track = "utm_[^&#]*|fbclid=[^&#]*|gclid=[^&#]*"
    c = F.regexp_replace(c, rf"&({_track})", "")
    c = F.regexp_replace(c, rf"\?({_track})&", "?")
    c = F.regexp_replace(c, rf"\?({_track})$", "")
    return F.regexp_replace(c, r"/$", "")


def url_dedup(pages: DataFrame, url_col: str = "url") -> DataFrame:
    """Collapse crawl records whose URLs normalize to the same canonical
    form: one hash-partitioned groupBy on the canonical URL (map-side
    combinable — same 100 TB shape as exact_dedup), keeping the earliest
    (warc_ts, docid) record as the canonical representative.

    Returns (canonical_url, keeper_docid, n_variants).
    """
    c = pages.withColumn("canonical_url", canonical_url(F.col(url_col)))
    order = [c_ for c_ in ("warc_ts", "docid") if c_ in pages.columns]
    keeper = F.min(F.struct(*order)).alias("_k")
    return (c.groupBy("canonical_url")
             .agg(keeper, F.count("*").alias("n_variants"))
             .select("canonical_url",
                     F.col("_k.docid").alias("keeper_docid"),
                     "n_variants"))


# ---------------------------------------------------------------------------
# PII redaction + per-domain capping (crawl-curation stages)
# ---------------------------------------------------------------------------

#: RE2-compatible patterns (no lookaround) so the DuckDB oracle mirrors
#: them 1:1; Java regex and RE2 agree on every construct used here
PII_EMAIL = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
PII_IPV4 = r"\b(\d{1,3}\.){3}\d{1,3}\b"
PII_PHONE = r"\+?\d{3}[-. ]\d{3}[-. ]\d{4}"


def pii_redact(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Scrub emails / IPv4s / phone numbers from `text_col`, appending
    per-doc redaction counts (counted on the ORIGINAL text, then replaced
    in email → ip → phone order so one category can't consume another's
    span mid-count).

    Pure regexp Catalyst chain — whole-stage codegen, no UDF — so it runs
    at full scan speed over a 10^12-row crawl; the common no-PII row costs
    three cheap regex scans and no allocation.
    """
    t = F.col(text_col)
    out = (docs
           .withColumn("n_emails",
                       F.regexp_count(t, F.lit(PII_EMAIL)).cast("long"))
           .withColumn("n_ips",
                       F.regexp_count(t, F.lit(PII_IPV4)).cast("long"))
           .withColumn("n_phones",
                       F.regexp_count(t, F.lit(PII_PHONE)).cast("long")))
    red = F.regexp_replace(t, PII_EMAIL, "<EMAIL>")
    red = F.regexp_replace(red, PII_IPV4, "<IP>")
    red = F.regexp_replace(red, PII_PHONE, "<PHONE>")
    return out.withColumn(text_col, red)


def domain_cap(pages: DataFrame, cap: int, url_col: str = "url",
               order_col: str = "docid") -> DataFrame:
    """Keep at most `cap` pages per host (head-domain quota — standard
    crawl curation so template-heavy megasites can't dominate a training
    mix). Keeps the first `cap` by `order_col` within each host.

    Scale shape: top-k-per-key. A single global window on host would
    shuffle every row to its host's partition — head domains ARE the skew.
    Two stages instead: (1) per-(host, input-partition) rank prunes each
    partition to ≤ cap candidates per host with only a skew-free
    (host, pid) shuffle; (2) the global per-host rank then runs over
    ≤ cap·P survivors per host, not the raw crawl.
    """
    from pyspark.sql import Window
    host = F.regexp_extract(F.col(url_col), r"^[a-z][a-z0-9+.-]*://([^/:?#]*)", 1)
    p = pages.withColumn("host", host) \
             .withColumn("_pid", F.spark_partition_id())
    w1 = (Window.partitionBy("host", "_pid")
          .orderBy(F.col(order_col).asc()))
    cand = (p.withColumn("_r1", F.row_number().over(w1))
            .filter(F.col("_r1") <= cap).drop("_r1", "_pid"))
    w2 = Window.partitionBy("host").orderBy(F.col(order_col).asc())
    return (cand.withColumn("host_rank", F.row_number().over(w2))
            .filter(F.col("host_rank") <= cap))


# ---------------------------------------------------------------------------
# SQ8 scalar-quantized kNN (Lucene int8 vector quantization analogue)
# ---------------------------------------------------------------------------

def sq8_encode(emb: DataFrame, vec_col: str = "embedding"):
    """Scalar-quantize float vectors to uint8 codes (Lucene's
    ScalarQuantizer / OpenSearch SQ kNN: one global [lo, hi] interval over
    all components, 256 levels). Returns (codes_df, lo, hi): codes_df
    carries `code: array<int>` in 1 byte/dim of information — a 4×
    footprint cut that at 100 TB of embeddings is the difference between
    spilling and a RAM-resident scan.

    (lo, hi) comes from one bounded 1-row driver agg; encoding itself is
    a JVM `transform` over the array — no Python, no shuffle.
    """
    lo, hi = emb.agg(
        F.min(F.array_min(F.col(vec_col))).cast("double"),
        F.max(F.array_max(F.col(vec_col))).cast("double")).first()
    scale = 255.0 / (hi - lo) if hi > lo else 0.0
    codes = emb.withColumn(
        "code",
        F.transform(F.col(vec_col),
                    lambda v: F.round((v.cast("double") - lo) * scale)
                    .cast("int")))
    return codes, lo, hi


def sq8_knn(emb: DataFrame, query_id: int, k: int = 10,
            id_col: str = "vec_id", vec_col: str = "embedding") -> DataFrame:
    """Approximate cosine top-k over SQ8-dequantized vectors: both sides
    quantize to the shared 256-level grid, distances run on the
    dequantized codes (asymmetric-distance-style). Same distributed shape
    as brute_force_knn — 1-row broadcast, JVM higher-order fns,
    TakeOrderedAndProject — but the scan reads 1-byte codes, not floats.
    """
    codes, lo, hi = sq8_encode(emb, vec_col)
    step = (hi - lo) / 255.0
    deq = codes.select(
        id_col,
        F.transform(F.col("code"),
                    lambda c: F.lit(lo) + c.cast("double") * F.lit(step))
        .alias("_dv"))
    q = deq.where(F.col(id_col) == query_id) \
           .select(F.col("_dv").alias("_qv"))
    scored = (deq.crossJoin(F.broadcast(q))
              .where(F.col(id_col) != query_id)
              .select(id_col,
                      F.round(_cosine(F.col("_dv"), F.col("_qv")), 6)
                      .alias("cosine")))
    return scored.orderBy(F.col("cosine").desc(),
                          F.col(id_col).asc()).limit(k)


# ---------------------------------------------------------------------------
# substring-level dedup + feature-hashed quality scoring
# ---------------------------------------------------------------------------

def repeated_ngram_spans(docs: DataFrame, k: int = 5, min_df: int = 3,
                         text_col: str = "text",
                         id_col: str = "doc_id") -> DataFrame:
    """Token spans whose k-gram shingles recur across ≥ min_df docs — the
    distributed approximation of suffix-array substring dedup (Lee et al.,
    "Deduplicating Training Data Makes Language Models Better": remove
    repeated substrings, not just whole-doc dups).

    Positions whose shingle is corpus-frequent merge into maximal spans by
    gaps-and-islands (pos − row_number is constant within a run). Returns
    (doc_id, span_start, span_end, n_grams) with token-index bounds
    [span_start, span_end] inclusive, end = last covered token.

    Scale shape: one explode + one groupBy(shingle) for the df table
    (map-side combinable), a broadcast-free semi-join back on the shingle
    hash, then per-doc windows (per-doc rows ≪ partition size; no skew —
    the hot shingles distribute by doc).
    """
    toks = docs.select(F.col(id_col),
                       F.split(F.col(text_col), " ").alias("_t"))
    n = F.size("_t")
    grams = toks.select(
        id_col,
        F.when(n >= k,
               F.expr(f"transform(sequence(0, size(_t) - {k}), "
                      f"i -> struct(i AS pos, "
                      f"concat_ws(' ', slice(_t, i + 1, {k})) AS g))")
               ).otherwise(F.array()).alias("_gs"))
    pos = grams.select(id_col, F.explode("_gs").alias("e")) \
               .select(id_col, F.col("e.pos").alias("pos"),
                       F.md5(F.col("e.g")).alias("gh"))
    freq = (pos.groupBy("gh")
            .agg(F.countDistinct(id_col).alias("df"))
            .filter(F.col("df") >= min_df)
            .select("gh"))
    hot = pos.join(freq, "gh", "left_semi")
    w = Window.partitionBy(id_col).orderBy("pos")
    runs = hot.withColumn("_isl", F.col("pos") - F.row_number().over(w))
    return (runs.groupBy(id_col, "_isl")
            .agg(F.min("pos").cast("long").alias("span_start"),
                 (F.max("pos") + (k - 1)).cast("long").alias("span_end"),
                 F.count("*").cast("long").alias("n_grams"))
            .drop("_isl")
            .orderBy(id_col, "span_start"))


def hashed_bow_score(docs: DataFrame, dim: int = 1024,
                     text_col: str = "text",
                     id_col: str = "doc_id") -> DataFrame:
    """Feature-hashed linear text scorer — the fastText-style quality
    classifier's serving plumbing (CCNet / web-corpus filtering): token →
    hashed bucket → per-bucket weight → mean over tokens. The md5-derived
    demo weights stand in for a trained model; swap in a real
    (bucket, weight) table and nothing else changes.

    Pure Catalyst: explode + modular bucket hash + groupBy mean. At crawl
    scale it's one shuffle keyed by doc_id with map-side partial sums.
    """
    tok = docs.select(F.col(id_col),
                      F.explode(F.split(F.col(text_col), " ")).alias("t")) \
              .filter(F.col("t") != "")
    h = F.md5(F.col("t"))
    bucket = ((_digit(h, 1) * 256 + _digit(h, 2) * 16 + _digit(h, 3))
              % dim).alias("bucket")
    wh = F.md5(F.col("bucket").cast("string"))
    weight = ((_digit(wh, 1) - 7.5) / 8.0).alias("w")
    scored = tok.select(id_col, bucket).select(id_col, "bucket", weight)
    return (scored.groupBy(id_col)
            .agg(F.round(F.avg("w"), 6).alias("score"))
            .orderBy(id_col))


def sessionize(ev: DataFrame, key_col: str = "user_id",
               ts_col: str = "ts", gap_minutes: int = 30) -> DataFrame:
    """Gaps-and-islands sessionization: a new session starts when the
    per-key gap exceeds ``gap_minutes`` (the batch analogue of Spark's
    streaming ``session_window`` and the usual first step of event-log
    training pipelines).  One shuffle on ``key_col``; both window passes
    run inside that partitioning, so there is no global window and skew
    is bounded by the busiest single key."""
    w = Window.partitionBy(key_col).orderBy(ts_col)
    # TIMESTAMP_NTZ has no direct long cast; epoch seconds via ltz (UTC)
    secs = F.col(ts_col).cast("timestamp_ltz").cast("long")
    prev = F.lag(secs).over(w)
    is_new = F.when(
        prev.isNull() | (secs - prev > gap_minutes * 60), 1).otherwise(0)
    return ev.withColumn("session_id",
                         F.sum(is_new).over(w).cast("long"))


def session_stats(ev: DataFrame, key_col: str = "user_id",
                  ts_col: str = "ts",
                  gap_minutes: int = 30) -> DataFrame:
    """Per-key session summary over `sessionize` output: session count,
    event count, and the longest session's event count."""
    s = sessionize(ev, key_col, ts_col, gap_minutes)
    per = (s.groupBy(key_col, "session_id")
           .agg(F.count(F.lit(1)).alias("n")))
    return (per.groupBy(key_col)
            .agg(F.countDistinct("session_id").cast("long")
                 .alias("n_sessions"),
                 F.sum("n").cast("long").alias("n_events"),
                 F.max("n").cast("long").alias("max_session_events"))
            .orderBy(key_col))


def chunk_documents(docs: DataFrame, size: int = 512, overlap: int = 128,
                    id_col: str = "doc_id",
                    text_col: str = "text") -> DataFrame:
    """Split documents into fixed-size character windows with overlap —
    the standard RAG / context-window chunking pass.  stride =
    size - overlap; the last chunk is the remainder (never empty unless
    the doc is).  Pure Catalyst: sequence + transform + explode, no UDF;
    output is (id, chunk_id, chunk_start, chunk_text), partitioning
    inherited from the scan — at 100 TB this is a map-only pass."""
    if overlap >= size:
        raise ValueError("overlap must be < size")
    stride = size - overlap
    starts = F.sequence(
        F.lit(0),
        F.greatest(F.length(text_col) - 1, F.lit(0)),
        F.lit(stride))
    chunks = F.transform(
        starts, lambda s: F.struct(
            s.alias("start"),
            F.substring(F.col(text_col), s + 1, size).alias("txt")))
    return (docs
            .select(F.col(id_col), F.posexplode(chunks).alias("chunk_id",
                                                              "c"))
            .select(id_col, "chunk_id",
                    F.col("c.start").alias("chunk_start"),
                    F.col("c.txt").alias("chunk_text"))
            .where(F.length("chunk_text") > 0))


# ---------------------------------------------------------------------------
# DSIR-style importance weighting (Xie et al., "Data Selection for
# Language Models via Importance Resampling", 2023): score each raw doc
# by the log-likelihood ratio of its n-grams under a target-domain
# distribution vs the raw distribution, then resample by the weights.
# ---------------------------------------------------------------------------

def _bigrams(col):
    t = F.split(F.lower(col), r"\s+")
    return F.when(
        F.size(t) >= 2,
        F.transform(F.sequence(F.lit(0), F.size(t) - 2),
                    lambda i: F.concat(F.element_at(t, i + 1), F.lit(" "),
                                       F.element_at(t, i + 2)))) \
        .otherwise(F.array().cast("array<string>"))


def dsir_importance(docs: DataFrame, target: DataFrame,
                    text_col: str = "text", id_col: str = "doc_id",
                    smoothing: float = 1.0,
                    n_buckets: int | None = None) -> DataFrame:
    """Per-doc DSIR importance log-weight: Σ over the doc's word bigrams
    of ln p̂_target(b) − ln p̂_raw(b), add-`smoothing` estimates over the
    union vocabulary.

    Gate path (`n_buckets=None`): exact bigram strings — two groupBy
    count tables, target side broadcast.  Scale path (`n_buckets=B`):
    bigrams hash into B buckets (the paper's hashed n-grams), so BOTH
    count tables are B rows — broadcastable at any corpus size and the
    scoring join disappears into two map-side lookups; one shuffle for
    the per-doc weight sum either way.  Size B well below the corpus
    bigram count (the paper uses 10k at web scale): with B ≫ data the
    add-`smoothing` mass dominates and the weight degenerates toward a
    per-bigram constant (doc length)."""
    key = (lambda c: F.pmod(F.xxhash64(c), F.lit(n_buckets))) \
        if n_buckets else (lambda c: c)
    raw_b = (docs.select(F.col(id_col),
                         F.explode(_bigrams(F.col(text_col))).alias("b"))
             .withColumn("b", key(F.col("b"))))
    tgt_b = (target.select(F.explode(_bigrams(F.col(text_col))).alias("b"))
             .withColumn("b", key(F.col("b"))))
    rc = raw_b.groupBy("b").agg(F.count("*").alias("cr"))
    tc = tgt_b.groupBy("b").agg(F.count("*").alias("ct"))
    if n_buckets:
        vocab = F.lit(float(n_buckets))
    else:
        vocab = F.col("_v")
    totals = (rc.agg(F.sum("cr").alias("_nr")).crossJoin(
        tc.agg(F.sum("ct").alias("_nt"))))
    if not n_buckets:
        totals = totals.crossJoin(
            rc.select("b").union(tc.select("b")).distinct()
            .agg(F.count("*").cast("double").alias("_v")))
    s = F.lit(float(smoothing))
    joined = (raw_b
              .join(rc.hint("broadcast") if n_buckets else rc, "b", "left")
              .join(F.broadcast(tc), "b", "left")
              .crossJoin(F.broadcast(totals)))
    term = (F.log((F.coalesce(F.col("ct"), F.lit(0)) + s)
                  / (F.col("_nt") + s * vocab))
            - F.log((F.coalesce(F.col("cr"), F.lit(0)) + s)
                    / (F.col("_nr") + s * vocab)))
    w = joined.groupBy(id_col).agg(F.sum(term).alias("logw"))
    return (docs.select(id_col).join(w, id_col, "left")
            .select(id_col, F.round(F.coalesce(F.col("logw"), F.lit(0.0)),
                                    4).alias("logw")))


def dsir_sample(weights: DataFrame, k: int, seed: int = 7,
                id_col: str = "doc_id") -> DataFrame:
    """Gumbel-top-k resampling over DSIR log-weights, deterministic:
    the Gumbel noise comes from a uniform derived from
    xxhash64(id, seed), so re-runs select the same k docs (the paper
    samples without replacement ∝ exp(logw); Gumbel-top-k is that
    sampler).  One TakeOrderedAndProject — no global sort."""
    u = (F.pmod(F.xxhash64(F.col(id_col).cast("string"), F.lit(seed)),
                F.lit(2 ** 31)) + 1) / F.lit(float(2 ** 31 + 1))
    gumbel = -F.log(-F.log(u))
    return (weights
            .select(id_col, "logw",
                    (F.col("logw") + gumbel).alias("_gkey"))
            .orderBy(F.desc("_gkey")).limit(k)
            .select(id_col, "logw"))


def stratified_split(df: DataFrame, fractions: dict | None = None,
                     group_col: str | None = None, seed: int = 13,
                     out_col: str = "split") -> DataFrame:
    """Deterministic, leakage-safe train/val/test assignment.

    Each GROUP (default: the row itself) hashes to a uniform in [0, 1)
    via xxhash64(group, seed); cumulative `fractions` thresholds assign
    the split, so (a) re-runs and cluster-size changes never move a row,
    and (b) with `group_col` (e.g. the registrable domain) every row of
    a group lands in ONE split — near-duplicates inside a site cannot
    leak train→test.  Pure Catalyst (a hash + a CASE); no shuffle, no
    sampling job, trivially correct at any scale."""
    fractions = fractions or {"train": 0.9, "val": 0.05, "test": 0.05}
    total = sum(fractions.values())
    if abs(total - 1.0) > 1e-9:
        raise ValueError(f"fractions must sum to 1, got {total}")
    key = F.col(group_col) if group_col else \
        F.concat_ws("\x1f", *[F.col(c).cast("string") for c in df.columns])
    u = (F.pmod(F.xxhash64(key, F.lit(seed)), F.lit(1_000_000))
         / F.lit(1_000_000.0))
    expr, acc = None, 0.0
    names = list(fractions)
    for name in names[:-1]:
        acc += fractions[name]
        cond = u < F.lit(acc)
        expr = F.when(cond, name) if expr is None else expr.when(cond, name)
    expr = (F.lit(names[-1]) if expr is None
            else expr.otherwise(names[-1]))
    return df.withColumn(out_col, expr)


# ---------------------------------------------------------------------------
# Product quantization (Jégou, Douze, Schmid, "Product Quantization for
# Nearest Neighbor Search", TPAMI 2011 — the IVF-PQ family OpenSearch's
# k-NN plugin exposes via faiss): split the vector into m subspaces,
# k-means each subspace to a kc-entry codebook, store m small codes per
# vector, and answer queries by Asymmetric Distance Computation (ADC) —
# a per-query lookup table, never a float-vector scan.
# ---------------------------------------------------------------------------

def _pq_slices(dim: int, m: int) -> list[tuple[int, int]]:
    if dim % m:
        raise ValueError(f"dim {dim} not divisible by m={m} subspaces")
    w = dim // m
    return [(j * w + 1, w) for j in range(m)]   # 1-based for slice()


def pq_train(embs: DataFrame, m: int = 8, kc: int = 256, iters: int = 2,
             id_col: str = "vec_id",
             vec_col: str = "embedding") -> list[list[list[float]]]:
    """Per-subspace codebooks via the deterministic Lloyd's machinery
    (clustering.kmeans: lowest-id init, means rounded to 6 decimals).
    Training cost: m × iters bounded (kc × dim/m)-double collects —
    the 'training, not serving' posture of bpe/kmeans.  Serving-scale
    params are m=8..16, kc=256 (1 byte/code); the contract gate runs a
    tiny (m=2, kc=4) instance the SQL oracle unrolls exactly."""
    from sparksearch.clustering import kmeans
    dim = len(embs.select(vec_col).first()[0])
    books = []
    for start, w in _pq_slices(dim, m):
        sub = embs.select(
            F.col(id_col),
            F.slice(F.col(vec_col), start, w).alias("sub"))
        _, cents = kmeans(sub, k=kc, iters=iters, id_col=id_col,
                          vec_col="sub")
        books.append(cents)
    return books


def _pq_dist_expr(sub_sql: str, cent: list[float]) -> str:
    arr = "array(" + ", ".join(repr(float(x)) for x in cent) + ")"
    return (f"aggregate(zip_with({sub_sql}, {arr}, "
            f"(x, y) -> (x - y) * (x - y)), 0D, (a, x) -> a + x)")


def pq_encode(embs: DataFrame, books: list[list[list[float]]],
              id_col: str = "vec_id",
              vec_col: str = "embedding",
              keep: tuple = ()) -> DataFrame:
    """(id, code array<int>): per subspace, the index of the nearest
    codebook centroid (ties → lowest index).  One constant-folded JVM
    projection — m×kc distance expressions, no Python, no shuffle.
    Footprint: m codes ≈ m bytes of information per vector vs 4·dim
    bytes of floats (64× at dim=64, m=8, kc=256).  `keep` passes
    extra columns through (e.g. the IVF cell id at ingest)."""
    m = len(books)
    dim = sum(len(b[0]) for b in books) if books else 0
    codes = []
    for j, (start, w) in enumerate(_pq_slices(dim, m)):
        sub = f"slice(transform({vec_col}, x -> CAST(x AS DOUBLE)), " \
              f"{start}, {w})"
        dists = ("array(" + ", ".join(_pq_dist_expr(sub, c)
                                      for c in books[j]) + ")")
        codes.append(f"CAST(array_position({dists}, "
                     f"array_min({dists})) - 1 AS INT)")
    return embs.select(F.col(id_col),
                       *[F.col(c) for c in keep],
                       F.expr("array(" + ", ".join(codes) + ")")
                       .alias("code"))


def pq_knn(embs: DataFrame, query_id: int, k: int = 10, m: int = 2,
           kc: int = 4, iters: int = 1, id_col: str = "vec_id",
           vec_col: str = "embedding") -> DataFrame:
    """ADC top-k: approximate squared-L2 of query vs every PQ code —
    dist ≈ Σ_j table_j[code_j], table_j precomputed driver-side from the
    query's subvectors (m×kc doubles).  The scan reads only the m-int
    code column (at 100 TB: the codes table is ~dim·4/m× smaller than
    the floats and the per-row work is m array lookups inside codegen);
    one TakeOrderedAndProject, no shuffle, no Python."""
    books = pq_train(embs, m=m, kc=kc, iters=iters, id_col=id_col,
                     vec_col=vec_col)
    codes = pq_encode(embs, books, id_col=id_col, vec_col=vec_col)
    q = embs.where(F.col(id_col) == query_id) \
        .select(F.expr(f"transform({vec_col}, x -> CAST(x AS DOUBLE))")
                .alias("v")).first()["v"]
    dim = len(q)
    tables = []
    for j, (start, w) in enumerate(_pq_slices(dim, m)):
        qj = q[start - 1: start - 1 + w]
        tables.append([sum((a - b) * (a - b) for a, b in zip(qj, c))
                       for c in books[j]])
    parts = [
        "element_at(array("
        + ", ".join(f"CAST({x!r} AS DOUBLE)" for x in tables[j])
        + f"), code[{j}] + 1)" for j in range(m)]
    adc = " + ".join(parts)
    return (codes.where(F.col(id_col) != query_id)
            .select(id_col, F.round(F.expr(adc), 6).alias("adc"))
            .orderBy(F.col("adc").asc(), F.col(id_col).asc())
            .limit(k))


def pq_knn_refined(emb: DataFrame, query_id: int, k: int = 10,
                   m: int = 8, kc: int = 16, iters: int = 2,
                   refine_factor: int = 4, id_col: str = "vec_id",
                   vec_col: str = "embedding") -> DataFrame:
    """PQ/ADC candidates re-ranked by EXACT L2 (the faiss `refine`
    stage): take the top k·refine_factor codes by ADC, fetch only those
    float vectors (a broadcast semi-join — k·rf rows, never the corpus),
    and exact-score them.  Recovers most of the recall PQ loses while
    the full scan still reads only the m-int code column."""
    cand = pq_knn(emb, query_id, k=k * refine_factor, m=m, kc=kc,
                  iters=iters, id_col=id_col, vec_col=vec_col) \
        .select(id_col)
    v = F.expr(f"transform({vec_col}, x -> CAST(x AS DOUBLE))")
    e = emb.select(F.col(id_col), v.alias("_v"))
    q = e.where(F.col(id_col) == query_id).first()["_v"]
    qarr = "array(" + ", ".join(f"CAST({x!r} AS DOUBLE)" for x in q) + ")"
    l2 = F.expr(f"aggregate(zip_with(_v, {qarr}, "
                f"(x, y) -> (x - y) * (x - y)), 0D, (a, x) -> a + x)")
    return (e.join(F.broadcast(cand), id_col)
            .select(id_col, F.round(l2, 6).alias("l2"))
            .orderBy(F.col("l2").asc(), F.col(id_col).asc())
            .limit(k))


def ivfpq_knn(emb: DataFrame, query_id: int, k: int = 10,
              n_cells: int = 8, n_probe: int = 2, m: int = 8,
              kc: int = 16, iters: int = 2, id_col: str = "vec_id",
              vec_col: str = "embedding") -> DataFrame:
    """IVF-PQ: the coarse IVF cell filter composed with the PQ/ADC scan
    (faiss IndexIVFPQ, the OpenSearch k-NN plugin's billion-scale
    config).  The scan touches only the n_probe nearest cells AND only
    the m-int code column inside them — the two orthogonal reductions
    multiply.  Deterministic like both parents (sampled coarse codebook,
    lowest-id Lloyd init).

    This self-contained form trains the PQ codebooks on the probed
    subset per call and codes plain vectors — a convenience/demo shape.
    The SERVING path (and the gated one: contract entry
    `knn_ivfpq_served`) is `ivfpq_build` once → persisted cell-
    partitioned codes with RESIDUAL encoding (faiss by_residual) →
    `ivfpq_query` many, where a query is directory pruning + a pushed
    filter + an ADC scan with no retraining."""
    cents = [list(map(float, r[vec_col])) for r in
             emb.where(F.col(id_col) < n_cells)
                .orderBy(id_col).select(vec_col).collect()]
    v = F.col(vec_col).cast("array<double>")
    cs = F.array(*[_cosine(v, F.array(*[F.lit(x) for x in c]))
                   for c in cents])
    cell = (F.array_position(cs, F.array_max(cs)) - 1).cast("int")
    assigned = emb.withColumn("_cell", cell)
    qv = list(map(float, emb.where(F.col(id_col) == query_id)
                  .select(vec_col).first()[0]))
    import math as _m

    def _cos_py(a, b):
        dot = sum(x * y for x, y in zip(a, b))
        return dot / (_m.sqrt(sum(x * x for x in a))
                      * _m.sqrt(sum(x * x for x in b)) or 1.0)

    order = sorted(range(len(cents)),
                   key=lambda i: (-_cos_py(qv, cents[i]), i))
    probed = assigned.where(F.col("_cell").isin(order[:n_probe])) \
        .drop("_cell")
    return pq_knn(probed, query_id, k=k, m=m, kc=kc, iters=iters,
                  id_col=id_col, vec_col=vec_col)


# ---------------------------------------------------------------------------
# Served IVF-PQ: the train-once / encode-at-ingest / query-many lifecycle
# (faiss IndexIVFPQ as exposed by the OpenSearch k-NN plugin's
# `method: {name: ivf, encoder: pq}` — KNNEngine.FAISS index build at
# plugin/src/main/java/org/opensearch/knn/index/*).  This is the shape
# that runs at 100 TB: training happens once on a sample, every ingested
# vector is reduced to an m-int code + a cell id, and a query touches
# only the n_probe probed cell partitions and only the code column.
# ---------------------------------------------------------------------------

def _l2_expr(col_sql: str, cent: list[float]):
    arr = "array(" + ", ".join(repr(float(x)) for x in cent) + ")"
    return (f"aggregate(zip_with({col_sql}, {arr}, "
            f"(x, y) -> (x - y) * (x - y)), 0D, (a, x) -> a + x)")


def ivfpq_build(emb: DataFrame, out_dir: str, n_cells: int = 8,
                m: int = 8, kc: int = 16, iters: int = 1,
                id_col: str = "vec_id",
                vec_col: str = "embedding",
                coarse: list[list[float]] | None = None) -> dict:
    """Build a persistent IVF-PQ index with RESIDUAL encoding.

    1. coarse quantizer: `coarse` if given (an arbitrary pre-trained
       codebook, e.g. `clustering.kmeans` centroids — faiss IndexIVF
       accepts any pre-trained quantizer and this is its `train()`
       path), else the n_cells lowest-id vectors (the sampled
       shortcut); the downstream layout is identical either way;
    2. cell assignment by squared-L2 argmin (ties → lowest cell) — one
       constant-folded JVM projection;
    3. residual r = v − centroid[cell] (faiss `by_residual=true`): PQ
       codebooks are trained on residuals, which concentrates the
       per-subspace variance and is what recovers IVF-PQ's recall at
       large n_cells;
    4. `pq_train` on the residuals (deterministic Lloyd, means rounded
       to 6 dp), `pq_encode` of the residuals with the cell id kept;
    5. codes written as parquet PARTITIONED BY cell (so the query-time
       cell filter is directory pruning, not a scan) and the sidecar
       `ivfpq_meta.json` holds centroids + codebooks (n_cells×dim +
       m×kc×dim/m doubles — driver/broadcast sized at any corpus).

    Scale shape: one pass to assign+residual+encode whose only exchange
    is the cell repartition feeding the partitionBy write; training cost
    bounded by `pq_train`'s m × iters (kc × dim/m)-double collects.
    """
    import json
    import os
    e = emb.select(
        F.col(id_col).alias("vid"),
        F.expr(f"transform({vec_col}, x -> CAST(x AS DOUBLE))").alias("v"))
    if coarse is not None:
        cents = [list(map(float, c)) for c in coarse]
        if len(cents) != n_cells:
            raise ValueError(
                f"coarse codebook has {len(cents)} centroids, "
                f"n_cells={n_cells}")
    else:
        cents = [list(map(float, r["v"])) for r in
                 e.where(F.col("vid") < n_cells).orderBy("vid").collect()]
        if len(cents) < n_cells:
            raise ValueError(f"need >= {n_cells} vectors with id < n_cells")
    dim = len(cents[0])
    dists = "array(" + ", ".join(_l2_expr("v", c) for c in cents) + ")"
    cell = (f"CAST(array_position({dists}, "
            f"array_min({dists})) - 1 AS INT)")
    cent_arr = "array(" + ", ".join(
        "array(" + ", ".join(repr(float(x)) for x in c) + ")"
        for c in cents) + ")"
    resid = (e.withColumn("cell", F.expr(cell))
             .withColumn("rv", F.expr(
                 f"zip_with(v, element_at({cent_arr}, cell + 1), "
                 f"(x, y) -> x - y)")))
    books = pq_train(resid, m=m, kc=kc, iters=iters,
                     id_col="vid", vec_col="rv")
    codes = pq_encode(resid, books, id_col="vid", vec_col="rv",
                      keep=("cell",))
    (codes.repartition("cell")
     .write.mode("overwrite").partitionBy("cell")
     .parquet(os.path.join(out_dir, "codes")))
    meta = {"n_cells": n_cells, "m": m, "kc": kc, "dim": dim,
            "iters": iters, "centroids": cents, "books": books}
    os.makedirs(out_dir, exist_ok=True)
    tmp = os.path.join(out_dir, "ivfpq_meta.json.tmp")
    with open(tmp, "w") as f:
        json.dump(meta, f)
    os.replace(tmp, os.path.join(out_dir, "ivfpq_meta.json"))
    return meta


def ivfpq_query(spark, index_dir: str, qvec, k: int = 10,
                n_probe: int = 2, exclude_id=None) -> DataFrame:
    """Answer a query against an `ivfpq_build` index: NO training, NO
    float-vector scan.  Driver side: n_cells L2s pick the n_probe
    nearest cells (ties → lowest cell) and one m×kc ADC table per
    probed cell is computed from the query RESIDUAL q − centroid[cell].
    Executor side: a scan of the codes parquet pruned to the probed
    cell directories (PartitionFilters) + the id exclusion
    (PushedFilters), per-row cost = m array lookups via a CASE over
    the probed cells, one TakeOrderedAndProject.  At 100 TB the scan
    reads n_probe/n_cells of an m-byte-per-vector table."""
    import json
    import os
    with open(os.path.join(index_dir, "ivfpq_meta.json")) as f:
        meta = json.load(f)
    cents, books, m = meta["centroids"], meta["books"], meta["m"]
    dim = meta["dim"]
    q = [float(x) for x in qvec]
    d2 = [sum((a - b) * (a - b) for a, b in zip(q, c)) for c in cents]
    probed = sorted(range(len(cents)), key=lambda i: (d2[i], i))[:n_probe]
    arms = []
    for c in probed:
        qr = [a - b for a, b in zip(q, cents[c])]
        parts = []
        for j, (start, w) in enumerate(_pq_slices(dim, m)):
            qj = qr[start - 1: start - 1 + w]
            tab = [sum((a - b) * (a - b) for a, b in zip(qj, cv))
                   for cv in books[j]]
            parts.append(
                "element_at(array("
                + ", ".join(f"CAST({x!r} AS DOUBLE)" for x in tab)
                + f"), code[{j}] + 1)")
        arms.append((c, " + ".join(parts)))
    adc = "CASE " + " ".join(
        f"WHEN cell = {c} THEN ({e})" for c, e in arms) + " END"
    codes = (spark.read.parquet(os.path.join(index_dir, "codes"))
             .where(F.col("cell").isin(probed)))
    if exclude_id is not None:
        codes = codes.where(F.col("vid") != exclude_id)
    return (codes.select("vid", F.round(F.expr(adc), 6).alias("adc"))
            .orderBy(F.col("adc").asc(), F.col("vid").asc())
            .limit(k))


def epoch_shuffle(df: DataFrame, epoch: int, key_cols: list | None = None,
                  out_col: str = "shuffle_rank",
                  n_partitions: int = 8) -> DataFrame:
    """Deterministic global training-epoch shuffle: every epoch is an
    independent, reproducible permutation of the corpus — the op a
    training-data pipeline runs before sequence packing so shard order
    isn't corpus order.

    hash = md5(key ⊕ ':' ⊕ epoch): engine-portable (Spark and the
    DuckDB oracle produce identical hex), uniform, and seedable by
    epoch.  The global rank is the two-pass ranged pattern
    (aggs.ranged_pipeline_frame): repartitionByRange on the hash,
    per-partition running counts, bounded per-partition offsets — NO
    single-task global window, no driver materialization.  Ties (equal
    hashes — only possible with duplicate keys) break on the key
    string."""
    from sparksearch.aggs import ranged_pipeline_frame
    cols = key_cols or df.columns
    key = F.concat_ws("\x1f", *[F.col(c).cast("string") for c in cols])
    base = (df.withColumn("_k", key)
            .withColumn("_h", F.md5(F.concat(F.col("_k"),
                                             F.lit(f":{int(epoch)}"))))
            .withColumn("_one", F.lit(1)))
    frame, off = ranged_pipeline_frame(base, key="_h", carry=0,
                                       n_partitions=n_partitions,
                                       cum_metrics=("_one",))
    w = (Window.partitionBy("_pid").orderBy("_h", "_k")
         .rowsBetween(Window.unboundedPreceding, 0))
    rank = (F.sum(F.when(~F.col("_carry"), F.col("_one"))
                  .otherwise(F.lit(0))).over(w) + off["_one"])
    return (frame.where(~F.col("_carry"))
            .withColumn(out_col, rank.cast("long"))
            .drop("_pid", "_carry", "_one", "_h", "_k"))


def hard_negatives(emb: DataFrame, anchor_ids: list[int], k: int = 5,
                   dup_threshold: float = 0.95,
                   exclude_same_label: bool = True,
                   id_col: str = "vec_id", vec_col: str = "embedding",
                   label_col: str = "label") -> DataFrame:
    """Hard-negative mining for contrastive training: per anchor, the k
    MOST similar vectors that are still valid negatives — not the anchor
    itself, not a near-duplicate (cosine >= dup_threshold, which would
    be a false negative), and (optionally) not sharing the anchor's
    label (same-source rows are presumed positives).  This is the ANCE /
    DPR-style "top of the ranking minus the positives" mining rule.

    Plan shape: the anchor set is a bounded broadcast (mine in batches
    of ~10^3 anchors at corpus scale — each batch is ONE corpus scan);
    cosine is the JVM zip_with/aggregate expression, the dup/label
    exclusions are pushed into the same scan's filter, and per-anchor
    top-k is a window over the candidate set partitioned by anchor.
    Shuffle is candidates-only (rows surviving the threshold filter),
    never the full cross product materialized.  For a cheaper first cut
    at 10^12 rows, pre-filter candidates with ivfpq_query / lsh buckets
    and re-rank the survivors here — same contract.

    Returns (anchor_id, neg_id, cosine, rank), rank 1 = hardest.
    """
    ids = sorted(set(int(a) for a in anchor_ids))
    anchors = (emb.where(F.col(id_col).isin(ids))
               .select(F.col(id_col).alias("anchor_id"),
                       F.col(vec_col).cast("array<double>").alias("_av"),
                       F.col(label_col).alias("_al")))
    cand = (emb.select(F.col(id_col).alias("neg_id"),
                       F.col(vec_col).cast("array<double>").alias("_nv"),
                       F.col(label_col).alias("_nl"))
            .crossJoin(F.broadcast(anchors))
            .where(F.col("neg_id") != F.col("anchor_id")))
    if exclude_same_label:
        cand = cand.where(F.col("_nl") != F.col("_al"))
    scored = (cand.withColumn(
                  "cosine", F.round(_cosine(F.col("_nv"), F.col("_av")), 6))
              .where(F.col("cosine") < float(dup_threshold)))
    w = Window.partitionBy("anchor_id").orderBy(
        F.col("cosine").desc(), F.col("neg_id").asc())
    return (scored.withColumn("rank", F.row_number().over(w).cast("int"))
            .where(F.col("rank") <= int(k))
            .select("anchor_id", "neg_id", "cosine", "rank")
            .orderBy("anchor_id", "rank"))
