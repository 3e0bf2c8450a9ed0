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


#: candidate pairs collected per batched-training round (bounded
#: driver traffic: 256 rows of two short symbols + a long)
_BPE_BATCH_CAND = 256


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


def _greedy_merge(syms: list, a: str, b: str, ab: str) -> list:
    """Python twin of `_merge_expr`: greedy left-to-right, the merged
    symbol is never reconsidered within the same step."""
    out: list = []
    for x in syms:
        if out and x == b and out[-1] == a:
            out[-1] = ab
        else:
            out.append(x)
    return out


def _train_local(hist: list, n_merges: int) -> list[dict]:
    """Driver-local merge loop over a collected (word, cnt) histogram —
    the shape every reference BPE trainer uses (Sennrich subword-nmt,
    HF trainers): incremental pair-count maintenance so each step only
    touches words that contain the picked pair, not the whole table.
    Selection order is identical to the distributed loop: pair_count
    desc, then (left asc, right asc) — and Python's str ordering equals
    Spark's UTF8 binary ordering because UTF-8 is code-point-order
    preserving."""
    words = [list(w) for w, _ in hist]
    cnts = [int(c) for _, c in hist]
    pair_counts: dict = {}
    pair_words: dict = {}
    for i, syms in enumerate(words):
        c = cnts[i]
        for p in zip(syms, syms[1:]):
            pair_counts[p] = pair_counts.get(p, 0) + c
            pair_words.setdefault(p, set()).add(i)
    merges: list[dict] = []
    for step in range(1, n_merges + 1):
        best = None
        for p, c in pair_counts.items():
            if c <= 0:
                continue
            k = (-c, p[0], p[1])
            if best is None or k < best[0]:
                best = (k, p, c)
        if best is None:
            break
        (_, (a, b), c) = best
        ab = a + b
        merges.append({"step": step, "left": a, "right": b,
                       "merged": ab, "pair_count": int(c)})
        for i in list(pair_words.get((a, b), ())):
            syms, wc = words[i], cnts[i]
            nxt = _greedy_merge(syms, a, b, ab)
            if nxt == syms:  # stale index: pair no longer in this word
                continue
            for p in zip(syms, syms[1:]):
                r = pair_counts[p] - wc
                if r:
                    pair_counts[p] = r
                else:
                    del pair_counts[p]
            for p in zip(nxt, nxt[1:]):
                pair_counts[p] = pair_counts.get(p, 0) + wc
                pair_words.setdefault(p, set()).add(i)
            words[i] = nxt
        pair_counts.pop((a, b), None)
        pair_words.pop((a, b), None)
    return merges


def bpe_train(docs: DataFrame, n_merges: int, text_col: str = "text",
              driver_max_words: int | None = 2_000_000) -> list[dict]:
    """Learn `n_merges` BPE merges; returns [{step, left, right, merged,
    pair_count}, ...] in learned order. Deterministic: ties broken by
    (left asc, right asc).

    Scale shape: the word histogram is Zipf-bounded, so when it fits the
    driver (≤ `driver_max_words` distinct words, the common case even at
    100 TB after a min-frequency cut) the merge loop runs driver-local —
    one corpus-sized groupBy, then zero further cluster jobs, vs one
    shuffle job per merge (32k sequential jobs at a real vocab). The
    distributed loop remains for histograms too large to collect
    (`driver_max_words=0`/None forces it) and both paths are
    pinned identical by `test_bpe_local_equals_distributed`."""
    hist_df = word_histogram(docs, text_col)
    if driver_max_words:
        # cheap upper bound first: number of histogram rows
        n_distinct = hist_df.count()
        if n_distinct <= driver_max_words:
            hist = [(r["word"], r["cnt"]) for r in hist_df.collect()]
            return _train_local(hist, n_merges)
    # localCheckpoint (not persist): truncates each step's lineage to a
    # flat LogicalRDD so the plan stays O(1)-deep across hundreds of
    # steps — chained InMemoryRelations nest the whole history into
    # every subsequent plan tree and blow up plan handling ~30 steps in
    words = hist_df.select(
        "cnt", F.concat_ws(" ", F.split(F.col("word"), "")).alias("syms")
    ).localCheckpoint()
    merges: list[dict] = []
    # Batched rounds: each round collects the top-`_BPE_BATCH_CAND`
    # pairs ONCE, then accepts the maximal prefix that provably equals
    # the sequential greedy result (pinned by
    # test_bpe_local_equals_distributed):
    #   - accepted pairs must be pairwise symbol-disjoint, counting the
    #     merged string as a symbol (disjointness ⇒ each accepted
    #     pair's count is unchanged by the earlier accepted merges, and
    #     any pair a merge CREATES, (x, ab) / (ab, y), is bounded by an
    #     existing pair overlapping {a, b} — which, had its count been
    #     ≥ the next accepted pair's, would appear earlier in the order
    #     and terminate the prefix);
    #   - when the collect was truncated (M rows returned), only pairs
    #     with count strictly above the horizon (row M's count) are
    #     accepted past the first, since unseen ties beyond the horizon
    #     could bound a created pair that ties the candidate.
    # A 32k-merge vocab thus needs ~vocab/accepted-per-round jobs
    # (hundreds), not 32k sequential jobs.
    while len(merges) < n_merges:
        top = (_pair_counts(words)
               .orderBy(F.col("pair_count").desc(),
                        F.col("a").asc(), F.col("b").asc())
               .limit(_BPE_BATCH_CAND).collect())
        if not top:
            break
        truncated = len(top) == _BPE_BATCH_CAND
        blocked: set[str] = set()
        batch: list[tuple[str, str, int]] = []
        # terminator = first candidate overlapping an accepted pair; its
        # count bounds every pair a batch merge can CREATE (a created
        # (x, ab) needs an original (x, a), which overlaps (a, b) and so
        # sorts at or after the terminator)
        c_term = int(top[-1]["pair_count"]) if truncated else -1
        for r in top:
            a, b, c = r["a"], r["b"], int(r["pair_count"])
            if a in blocked or b in blocked:
                c_term = max(c_term, c)
                break
            if len(merges) + len(batch) < n_merges:
                batch.append((a, b, c))
                blocked |= {a, b, a + b}
        # a created pair can TIE c_term and be lexicographically smaller
        # than an accepted candidate, so only counts strictly above
        # c_term are provably in sequential order; batch[0] is the exact
        # sequential pick either way
        batch = batch[:1] + [p for p in batch[1:] if p[2] > c_term]
        for a, b, c in batch:
            merges.append({"step": len(merges) + 1, "left": a,
                           "right": b, "merged": a + b, "pair_count": c})
        # ONE map-only job applies the whole batch (disjointness makes
        # the composed fold identical to sequential application); old
        # checkpoint blocks are freed by the ContextCleaner once the
        # previous frame is unreferenced
        expr = "syms"
        for a, b, _ in batch:
            expr = _merge_expr(expr, a, b)
        words = words.select(
            "cnt", F.expr(expr).alias("syms")).localCheckpoint()
    return merges


def _tokenize_word_ranked(w: str, ranks: dict, cache: dict) -> list:
    """Rank-based BPE tokenize of one word (the subword-nmt / GPT-2
    apply algorithm): repeatedly find the lowest-rank adjacent pair and
    merge all its occurrences greedily left-to-right. O(len² · lookups)
    per DISTINCT word — `cache` makes the Zipf tail free."""
    hit = cache.get(w)
    if hit is not None:
        return hit
    syms = list(w)
    while len(syms) > 1:
        best_rank, best_i = None, -1
        for i in range(len(syms) - 1):
            r = ranks.get((syms[i], syms[i + 1]))
            if r is not None and (best_rank is None or r < best_rank):
                best_rank, best_i = r, i
        if best_rank is None:
            break
        a, b = syms[best_i], syms[best_i + 1]
        syms = _greedy_merge(syms, a, b, a + b)
    cache[w] = syms
    return syms


def bpe_apply(docs: DataFrame, merges: list[dict], text_col: str = "text",
              expr_max_merges: int = 64) -> DataFrame:
    """Tokenize `text_col` with a learned merge table — adds `bpe_tokens
    array<string>` and `bpe_len`.

    Two physical plans for the same tokenizer:

    - K ≤ `expr_max_merges`: char-split each word, fold each merge in
      learned order as pure JVM expressions — merges are a driver-side
      constant folded into the plan (zero Python, zero shuffle). Bounded
      at `expr_max_merges` because the fold nests one `aggregate` per
      merge: at a real 32k-merge vocab the expression tree would blow up
      Catalyst analysis long before execution.
    - K > `expr_max_merges`: rank-based tokenizer (the subword-nmt /
      GPT-2 apply algorithm — O(len²) per distinct word instead of K
      passes) inside one Arrow-batched mapInPandas with a per-task word
      cache: Zipf repetition makes almost every word a dict hit. Still
      map-only — no shuffle, no join-back; the ranks dict rides the
      closure (~MBs at 32k merges). The two paths agree on any corpus
      where a merge's output string isn't re-created by a later
      different merge pair (`test_bpe_apply_ranked_equals_expr`).

    Per-word processing (BPE merges are strictly intra-word), so cost is
    bounded by word length, not doc length."""
    if len(merges) <= expr_max_merges:
        word = "concat_ws(' ', split(w, ''))"
        for m in merges:
            word = _merge_expr(word, m["left"], m["right"])
        toks = (f"flatten(transform(filter(split({text_col}, ' '), "
                f"w -> w <> ''), w -> split({word}, ' ')))")
        return (docs
                .withColumn("bpe_tokens", F.expr(toks))
                .withColumn("bpe_len", F.expr(f"size({toks})")))
    from pyspark.sql.types import (ArrayType, IntegerType, StringType,
                                   StructField, StructType)
    ranks = {(m["left"], m["right"]): i for i, m in enumerate(merges)}
    out_schema = StructType(
        [f for f in docs.schema.fields]
        + [StructField("bpe_tokens", ArrayType(StringType())),
           StructField("bpe_len", IntegerType())])

    def _tok(batches):
        cache: dict = {}
        for pdf in batches:
            toks_col, len_col = [], []
            for text in pdf[text_col]:
                toks: list = []
                for w in (text or "").split(" "):
                    if w:
                        toks.extend(_tokenize_word_ranked(w, ranks, cache))
                toks_col.append(toks)
                len_col.append(len(toks))
            pdf = pdf.copy()
            pdf["bpe_tokens"] = toks_col
            pdf["bpe_len"] = len_col
            yield pdf

    return docs.mapInPandas(_tok, out_schema)


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
