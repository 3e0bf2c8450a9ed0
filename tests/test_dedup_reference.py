"""Randomized equivalence: paragraph_dedup and substring_dedup vs
independent pure-Python reference implementations of the same
semantics, over a seeded corpus with a tiny vocabulary (so cross-doc
collisions actually occur)."""

import random


def _corpus(seed=7, n_docs=40, vocab=("aa", "bb", "cc", "dd"),
            max_len=24):
    rng = random.Random(seed)
    rows = []
    for i in range(n_docs):
        n = rng.randint(0, max_len)
        rows.append((f"u{i:02d}", " ".join(rng.choice(vocab)
                                           for _ in range(n))))
    return rows


def _py_paragraph_dedup(rows, k):
    """Reference: global first occurrence per exact k-token window
    content, ordered by (key, window index)."""
    seen = {}
    occs = []
    for key, text in sorted(rows):
        ws = [w for w in text.split(" ") if w]
        paras = [" ".join(ws[i * k:(i + 1) * k])
                 for i in range((len(ws) + k - 1) // k)]
        for idx, p in enumerate(paras):
            occs.append((key, idx, p))
    for key, idx, p in sorted(occs):
        seen.setdefault(p, (key, idx))
    out = {}
    for key, text in rows:
        ws = [w for w in text.split(" ") if w]
        paras = [" ".join(ws[i * k:(i + 1) * k])
                 for i in range((len(ws) + k - 1) // k)]
        kept = [p for i, p in enumerate(paras)
                if seen[p] == (key, i)]
        out[key] = (len(paras), len(kept), " ".join(kept))
    return out


def _py_substring_dedup(rows, k):
    """Reference: every k-token window content owned by its global
    first (key, start); later occurrences mark [s, s+k) for deletion."""
    first = {}
    shingles = []
    for key, text in sorted(rows):
        ws = [w for w in text.split(" ") if w]
        for s in range(max(len(ws) - k + 1, 0)):
            content = " ".join(ws[s:s + k])
            shingles.append((key, s, content))
    for key, s, content in sorted(shingles):
        first.setdefault(content, (key, s))
    out = {}
    for key, text in rows:
        ws = [w for w in text.split(" ") if w]
        covered = set()
        for s in range(max(len(ws) - k + 1, 0)):
            content = " ".join(ws[s:s + k])
            if first[content] != (key, s):
                covered.update(range(s, s + k))
        kept = [w for p, w in enumerate(ws) if p not in covered]
        out[key] = (len(ws), len(ws) - len(kept), " ".join(kept))
    return out


def test_paragraph_dedup_matches_reference(spark):
    from sparksearch.dataops import paragraph_dedup
    for seed in (7, 11, 23):
        rows = _corpus(seed=seed)
        df = spark.createDataFrame(rows, "url string, text string")
        got = {r.url: (r.n_paras, r.n_kept, r.text) for r in
               paragraph_dedup(df, window=3,
                               drop_empty=False).collect()}
        want = _py_paragraph_dedup(rows, 3)
        assert got == want, seed


def test_substring_dedup_matches_reference(spark):
    from sparksearch.dataops import substring_dedup
    for seed in (7, 11, 23):
        rows = _corpus(seed=seed)
        df = spark.createDataFrame(rows, "url string, text string")
        got = {r.url: (r.n_tokens, r.n_removed, r.text) for r in
               substring_dedup(df, k=3).collect()}
        want = _py_substring_dedup(rows, 3)
        assert got == want, seed
