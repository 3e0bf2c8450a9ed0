"""Distributed BPE trainer (bpe.py) vs a pure-Python reference trainer."""

from __future__ import annotations

from collections import Counter

from sparksearch.bpe import bpe_apply, bpe_train


def _py_bpe_train(texts: list[str], k: int) -> list[tuple[str, str, int]]:
    """Reference trainer: Sennrich-style, greedy left-to-right merge,
    ties broken (count desc, pair asc)."""
    words = Counter(w for t in texts for w in t.split(" ") if w)
    syms = {w: list(w) for w in words}
    merges = []
    for _ in range(k):
        pairs: Counter = Counter()
        for w, c in words.items():
            s = syms[w]
            for i in range(len(s) - 1):
                pairs[(s[i], s[i + 1])] += c
        if not pairs:
            break
        (a, b), c = min(pairs.items(), key=lambda kv: (-kv[1], kv[0]))
        merges.append((a, b, c))
        for w in syms:
            s, out, i = syms[w], [], 0
            while i < len(s):
                if i + 1 < len(s) and s[i] == a and s[i + 1] == b:
                    out.append(a + b)
                    i += 2
                else:
                    out.append(s[i])
                    i += 1
            syms[w] = out
    return merges


def _py_bpe_apply(text: str, merges) -> list[str]:
    toks = []
    for w in text.split(" "):
        if not w:
            continue
        s = list(w)
        for a, b, _ in merges:
            out, i = [], 0
            while i < len(s):
                if i + 1 < len(s) and s[i] == a and s[i + 1] == b:
                    out.append(a + b)
                    i += 2
                else:
                    out.append(s[i])
                    i += 1
            s = out
        toks += s
    return toks


def test_bpe_train_matches_python_reference(spark):
    texts = [r[0] for r in spark.read.parquet(
        "/root/testdata/sf0.001/documents.parquet")
        .select("text").limit(120).collect()]
    docs = spark.createDataFrame([(t,) for t in texts], "text string")
    k = 6
    got = bpe_train(docs, k)
    want = _py_bpe_train(texts, k)
    assert [(m["left"], m["right"], m["pair_count"]) for m in got] == want
    # apply parity on a sample of docs
    out = {r["text"]: (r["bpe_tokens"], r["bpe_len"])
           for r in bpe_apply(docs.limit(15), got).collect()}
    for t, (toks, n) in out.items():
        ref = _py_bpe_apply(t, want)
        assert toks == ref and n == len(ref)
        assert "".join(toks) == t.replace(" ", "")  # lossless


def test_bpe_merge_never_spans_words(spark):
    # 'a b' adjacent ACROSS words must not merge even if ('a','b') is learned
    docs = spark.createDataFrame(
        [("ab ab ab a b",)], "text string")
    m = bpe_train(docs, 1)
    assert (m[0]["left"], m[0]["right"]) == ("a", "b")
    r = bpe_apply(docs, m).collect()[0]
    # three intra-word merges happen; the trailing standalone 'a b' stays
    assert r["bpe_tokens"] == ["ab", "ab", "ab", "a", "b"]


def test_bpe_overlapping_run_is_greedy(spark):
    docs = spark.createDataFrame([("aaaa aaa",)], "text string")
    m = bpe_train(docs, 1)
    assert (m[0]["left"], m[0]["right"], m[0]["pair_count"]) == ("a", "a", 5)
    r = {tuple(x["bpe_tokens"]) for x in bpe_apply(docs, m).collect()}
    assert r == {("aa", "aa", "aa", "a")}


def test_bpe_vocab_and_encode_roundtrip(spark):
    from sparksearch.bpe import bpe_encode, bpe_vocab
    docs = spark.createDataFrame(
        [("u1", "ab ab cd"), ("u2", "ba dc")], "url string, text string")
    m = bpe_train(docs.select("text"), 1)
    assert m[0]["merged"] == "ab"
    v = bpe_vocab(docs, m, "text").collect()
    by_sym = {r["symbol"]: (r["id"], r["kind"]) for r in v}
    assert set(by_sym) == {"a", "b", "c", "d", "ab"}
    assert [s for s, (i, k) in sorted(by_sym.items(), key=lambda x: x[1][0])
            ] == ["a", "b", "c", "d", "ab"]  # chars by order, then merges
    assert by_sym["ab"] == (4, "merge")
    enc = {r["url"]: r["bpe_ids"] for r in
           bpe_encode(docs, m, bpe_vocab(docs, m, "text")).collect()}
    assert enc["u1"] == [4, 4, 2, 3]   # ab ab c d
    assert enc["u2"] == [1, 0, 3, 2]   # b a d c


def test_bpe_local_equals_distributed(spark):
    """The driver-local incremental merge loop and the distributed
    one-shuffle-per-step loop must learn byte-identical merge tables —
    same selection order (count desc, pair asc) and greedy semantics."""
    docs = (spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
            .select("text"))
    local = bpe_train(docs, 30, driver_max_words=2_000_000)
    dist = bpe_train(docs, 30, driver_max_words=0)
    assert local == dist


def test_bpe_apply_ranked_equals_expr(spark):
    """The rank-based Arrow tokenizer (K > expr_max_merges) must produce
    the same tokens as the K-deep JVM expression fold on the real
    corpus (70 merges > the 64 default threshold)."""
    docs = (spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
            .select("doc_id", "text").orderBy("doc_id").limit(40))
    merges = bpe_train(docs, 70)
    assert len(merges) == 70
    ranked = {r["doc_id"]: (list(r["bpe_tokens"]), r["bpe_len"])
              for r in bpe_apply(docs, merges).collect()}        # UDF path
    expr = {r["doc_id"]: (list(r["bpe_tokens"]), r["bpe_len"])
            for r in bpe_apply(docs, merges,
                               expr_max_merges=1000).collect()}  # JVM fold
    assert ranked == expr


def test_bpe_apply_path_selection(spark):
    """<=64 merges stays on the zero-Python expression plan (no
    mapInPandas in the physical plan); >64 switches to the Arrow path."""
    docs = spark.createDataFrame([("a", "low lower lowest")],
                                 "url string, text string")
    m = [{"step": 1, "left": "l", "right": "o", "merged": "lo",
          "pair_count": 3}]
    small = bpe_apply(docs, m)._jdf.queryExecution().executedPlan().toString()
    assert "mapInPandas" not in small.lower()
    big = bpe_apply(docs, m * 65)._jdf.queryExecution().executedPlan().toString()
    assert "mapinpandas" in big.lower()
