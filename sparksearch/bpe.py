"""Distributed BPE tokenizer training over the corpus.

The training-data-pipeline counterpart of the engine's token-counting
ops (dataops.token_stats): LEARN the byte-pair-encoding merge table from
the corpus itself, the way Sennrich-style BPE trainers do, but as Spark
DataFrame algebra so the same job runs at 100 TB:

  1. word histogram: one groupBy over whitespace words — at web scale the
     distinct-word table is Zipf-bounded, orders of magnitude smaller than
     the corpus, and stays distributed;
  2. per merge step: count adjacent symbol pairs (explode of a JVM-side
     zip, weighted by word count, map-side combinable), pick the most
     frequent pair (count desc, then lexicographic — deterministic), and
     apply it greedily left-to-right to every word.

A word's symbol sequence is kept as ' '-joined text, and merging pair
(a, b) into ab is an exact greedy left-to-right fold (`aggregate`):
scan the symbols, merging whenever the previously-emitted symbol is `a`
and the current one is `b`; the merged symbol is never reconsidered
within the same step. That is Sennrich-trainer semantics, correct even
on self-overlapping runs ('a a a a a' -> 'aa aa a') where a
non-overlapping string `replace` would miss occurrences whose boundary
space the previous match consumed. The fold is a pure JVM higher-order
function (no Python, no UDF). Pair selection is one shuffle per merge
step; the merge itself is map-only over the cached word histogram.

K merge steps = K bounded driver round-trips (one 1-row collect each) —
training, not serving; the reference trainer is a single-node loop over
the same histogram.

Each symbol is a character or a previous merge's output; words come from
whitespace splitting, so symbols never contain spaces and the space-join
encoding is unambiguous.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F

__all__ = ["word_histogram", "bpe_train", "bpe_apply", "bpe_vocab",
           "bpe_encode"]


def word_histogram(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """(word, cnt) over whitespace tokens — the only corpus-sized pass."""
    return (docs
            .select(F.explode(F.split(F.col(text_col), " ")).alias("word"))
            .filter(F.col("word") != "")
            .groupBy("word").agg(F.count(F.lit(1)).alias("cnt")))


def _pair_counts(words: DataFrame) -> DataFrame:
    """Adjacent-symbol pair counts, weighted by word count. `syms` is the
    space-joined symbol string; the zip/explode is all JVM expressions."""
    arr = F.split(F.col("syms"), " ")
    pairs = F.expr(
        "transform(sequence(1, size(split(syms, ' ')) - 1), "
        "i -> struct(element_at(split(syms, ' '), i) AS a, "
        "element_at(split(syms, ' '), i + 1) AS b))")
    return (words
            .filter(F.size(arr) >= 2)
            .select("cnt", F.explode(pairs).alias("p"))
            .groupBy(F.col("p.a").alias("a"), F.col("p.b").alias("b"))
            .agg(F.sum("cnt").alias("pair_count")))


def _lit(s: str) -> str:
    return "'" + s.replace("\\", "\\\\").replace("'", "\\'") + "'"


def _merge_expr(inner: str, a: str, b: str) -> str:
    """Exact greedy left-to-right merge of pair (a, b) over a
    space-joined symbol string: fold the symbols, merging when the last
    emitted symbol equals `a` and the current equals `b`. Symbols are
    never empty, so '' serves as the fold's not-started sentinel.
    References `inner` exactly once so chained merge steps grow the
    expression tree linearly in K, not exponentially."""
    A, B, AB = _lit(a), _lit(b), _lit(a + b)
    return (
        f"aggregate(split({inner}, ' '), '', (acc, x) -> "
        f"CASE WHEN acc = '' THEN x "
        f"WHEN x = {B} AND element_at(split(acc, ' '), -1) = {A} "
        f"THEN concat(substring(acc, 1, length(acc) - {len(a)}), {AB}) "
        f"ELSE concat(acc, ' ', x) END)")


def bpe_train(docs: DataFrame, n_merges: int,
              text_col: str = "text") -> list[dict]:
    """Learn `n_merges` BPE merges; returns [{step, left, right, merged,
    pair_count}, ...] in learned order. Deterministic: ties broken by
    (left asc, right asc)."""
    words = (word_histogram(docs, text_col)
             .select("cnt",
                     F.concat_ws(" ", F.split(F.col("word"), "")).alias("syms")))
    words = words.persist()
    try:
        merges: list[dict] = []
        for step in range(1, n_merges + 1):
            top = (_pair_counts(words)
                   .orderBy(F.col("pair_count").desc(),
                            F.col("a").asc(), F.col("b").asc())
                   .limit(1).collect())
            if not top:
                break
            a, b, c = top[0]["a"], top[0]["b"], top[0]["pair_count"]
            merges.append({"step": step, "left": a, "right": b,
                           "merged": a + b, "pair_count": int(c)})
            # map-only greedy merge, re-persisted so each step's plan
            # stays O(1) deep instead of stacking K folds
            nxt = words.select(
                "cnt", F.expr(_merge_expr("syms", a, b)).alias("syms")
            ).persist()
            nxt.count()  # materialize before unpersisting the parent
            words.unpersist()
            words = nxt
        return merges
    finally:
        words.unpersist()


def bpe_apply(docs: DataFrame, merges: list[dict],
              text_col: str = "text") -> DataFrame:
    """Tokenize `text_col` with a learned merge table: char-split each
    word, then apply each merge in learned order — adds `bpe_tokens
    array<string>` and `bpe_len`. Pure JVM expressions; merges are a
    driver-side constant folded into the plan (the tokenizer users ship
    to the cluster). Per-word processing (BPE merges are strictly
    intra-word), so fold cost is bounded by word length, not doc length."""
    word = "concat_ws(' ', split(w, ''))"
    for m in merges:
        word = _merge_expr(word, m["left"], m["right"])
    toks = (f"flatten(transform(filter(split({text_col}, ' '), "
            f"w -> w <> ''), w -> split({word}, ' ')))")
    return (docs
            .withColumn("bpe_tokens", F.expr(toks))
            .withColumn("bpe_len", F.expr(f"size({toks})")))


def bpe_vocab(docs: DataFrame, merges: list[dict],
              text_col: str = "text") -> DataFrame:
    """The tokenizer's vocab table: (id, symbol, kind). Base symbols are
    the corpus's distinct characters (id by codepoint order — the
    byte-alphabet analogue), then one symbol per merge in learned order.
    One distinct-aggregation over the corpus; the merge rows are a
    driver-side constant."""
    spark = docs.sparkSession
    chars = (docs
             .select(F.explode(F.split(F.col(text_col), "")).alias("symbol"))
             .filter((F.col("symbol") != "") & (F.col("symbol") != " "))
             .distinct())
    # single-partition window is fine here: the distinct-character
    # alphabet is bounded (~charset size), nothing corpus-proportional
    base = (chars
            .withColumn("id",
                        F.row_number().over(Window.orderBy("symbol")) - 1)
            .select("id", "symbol", F.lit("char").alias("kind")))
    n_base = base.count()
    merged = spark.createDataFrame(
        [(n_base + i, m["merged"], "merge") for i, m in enumerate(merges)],
        "id int, symbol string, kind string")
    return base.unionByName(merged)


def bpe_encode(docs: DataFrame, merges: list[dict], vocab: DataFrame,
               text_col: str = "text", key_col: str = "url") -> DataFrame:
    """Tokenize and map to vocab ids: (key, bpe_ids array<int>). The
    vocab is broadcast-joined against the posexploded tokens and
    re-grouped in position order — the shape of an id-encoding pass
    feeding a training-data writer. Unknown symbols (never occurs when
    the vocab came from the same corpus) drop out like an UNK filter."""
    toks = bpe_apply(docs, merges, text_col)
    exploded = toks.select(
        key_col, F.posexplode("bpe_tokens").alias("_p", "_t"))
    joined = exploded.join(
        F.broadcast(vocab.select(F.col("symbol").alias("_t"),
                                 F.col("id").alias("_id"))), "_t")
    return (joined.groupBy(key_col)
            .agg(F.transform(
                F.array_sort(F.collect_list(F.struct("_p", "_id"))),
                lambda s: s["_id"].cast("int")).alias("bpe_ids")))
