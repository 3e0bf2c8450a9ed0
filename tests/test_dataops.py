"""Training-data operators: algebraic invariants at sf0.001.

Exact cross-engine value parity is enforced by the driver contract
(contract_dataops oracle SQL); these tests pin the operator semantics.
"""

import pytest
from pyspark.sql import functions as F


@pytest.fixture(scope="module")
def docs(spark):
    return spark.read.parquet("/root/testdata/sf0.001/documents.parquet")


@pytest.fixture(scope="module")
def emb(spark):
    return spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")


def test_exact_dedup_partitions_corpus(spark, docs):
    from sparksearch.dataops import exact_dedup
    kept = exact_dedup(docs).agg(F.sum("n_copies")).collect()[0][0]
    assert kept == docs.count()


def test_minhash_pairs_subset_of_exact(spark, docs):
    """Banding may miss pairs (probabilistic recall) but every surviving
    pair is exactly verified — so minhash results ⊆ exact-jaccard results
    at the same threshold."""
    from sparksearch.dataops import minhash_lsh_pairs, ngram_jaccard_pairs
    mh = {(r["id_a"], r["id_b"], r["jaccard"]) for r in
          minhash_lsh_pairs(docs, k=3, num_hashes=16, bands=4,
                            threshold=0.5).collect()}
    ex = {(r["id_a"], r["id_b"], r["jaccard"]) for r in
          ngram_jaccard_pairs(docs, k=3, threshold=0.5).collect()}
    assert mh <= ex
    assert len(mh) > 0
    # near-duplicate synthetic corpus: high-jaccard dup pairs exist and are
    # all caught by banding at this signature size
    assert len(mh) / len(ex) >= 0.9


def test_simhash_symmetric_and_bounded(spark, docs):
    from sparksearch.dataops import simhash_fingerprints, simhash_pairs
    fps = simhash_fingerprints(docs).collect()
    assert all(len(r["simhash"]) == 16 for r in fps)
    pairs = simhash_pairs(docs, max_hamming=3).collect()
    assert all(0 <= r["hamming"] <= 3 for r in pairs)
    assert all(r["id_a"] < r["id_b"] for r in pairs)


def test_knn_lsh_cosines_exact_within_cell(spark, emb):
    """LSH may lose recall but must never report a wrong cosine: every
    (id, cosine) it returns appears identically in the brute-force scan."""
    from sparksearch.dataops import brute_force_knn, lsh_knn
    bf = {r["vec_id"]: r["cosine"] for r in
          brute_force_knn(emb, 0, k=500).collect()}
    lsh = lsh_knn(emb, 0, k=10, planes=4, multiprobe=1).collect()
    assert len(lsh) > 0
    for r in lsh:
        assert bf[r["vec_id"]] == pytest.approx(r["cosine"], abs=1e-6)


def test_quality_and_tokens_ranges(spark, docs):
    from sparksearch.dataops import quality_score, token_stats
    q = quality_score(docs).collect()
    assert all(0.0 <= r["quality"] <= 1.0 for r in q)
    t = {r["doc_id"]: r for r in token_stats(docs).collect()}
    raw = docs.select("doc_id", "text").collect()
    for r in raw[:50]:
        assert t[r["doc_id"]]["ws_tokens"] == len(r["text"].split())


def test_lang_id_majority_accuracy(spark, docs):
    """The synthetic corpus is English-word based; lang_id should call the
    overwhelming majority en (markers like 'the' appear in most docs)."""
    from sparksearch.dataops import language_id
    pred = language_id(docs).groupBy("lang_pred").count().collect()
    by = {r["lang_pred"]: r["count"] for r in pred}
    assert by.get("en", 0) > sum(by.values()) * 0.5


def test_winnow_fingerprints_detect_duplicates(spark, docs):
    """Exact duplicate docs must produce identical fingerprint sets."""
    from sparksearch.dataops import exact_dedup, winnow_fingerprints
    fps = winnow_fingerprints(docs, k=4, window=3)
    sets = (fps.groupBy("doc_id")
            .agg(F.sort_array(F.collect_list("fp")).alias("fpset")))
    dups = (docs.groupBy("text")
            .agg(F.collect_list("doc_id").alias("ids"), F.count("*").alias("n"))
            .where(F.col("n") >= 2).limit(5).collect())
    if dups:
        m = {r["doc_id"]: tuple(r["fpset"]) for r in sets.collect()}
        for d in dups:
            ids = d["ids"]
            assert len({m[i] for i in ids}) == 1


def test_canonical_url_steps(spark):
    from sparksearch.dataops import canonical_url
    from pyspark.sql import functions as F
    cases = [
        # fragment + tracking params stripped, real param kept
        ("https://a.example/p?utm_source=x&id=7&utm_b=2#frag",
         "https://a.example/p?id=7"),
        # scheme+host lowercased, default port dropped, trailing slash
        ("HTTPS://A.Example:443/Path/", "https://a.example/Path"),
        ("http://b.example:80/x?gclid=99", "http://b.example/x"),
        # only-tracking query vanishes entirely
        ("https://c.example/p?utm_source=feed&utm_medium=rss",
         "https://c.example/p"),
        # non-default port kept; path case preserved
        ("https://d.example:8443/CaseSensitive", 
         "https://d.example:8443/CaseSensitive"),
        ("https://e.example/", "https://e.example"),
    ]
    df = spark.createDataFrame([(u,) for u, _ in cases], "url string")
    got = [r.c for r in
           df.select(canonical_url(F.col("url")).alias("c")).collect()]
    assert got == [want for _, want in cases]


def test_url_dedup_keeps_earliest(spark):
    import datetime
    from sparksearch.dataops import url_dedup
    t0 = datetime.datetime(2025, 1, 1)
    t1 = datetime.datetime(2025, 1, 2)
    rows = [
        (1, "https://a.example/p?utm_source=x", t1),
        (2, "HTTPS://A.EXAMPLE:443/p", t0),     # earliest → keeper
        (3, "https://a.example/p#frag", t1),
        (4, "https://a.example/p?page=2", t0),  # distinct canonical
    ]
    df = spark.createDataFrame(rows, "docid long, url string, warc_ts timestamp")
    out = {r.canonical_url: (r.keeper_docid, r.n_variants)
           for r in url_dedup(df).collect()}
    assert out == {"https://a.example/p": (2, 3),
                   "https://a.example/p?page=2": (4, 1)}


def test_pii_redact(spark):
    from sparksearch.dataops import pii_redact
    rows = [
        (1, "write to bob.smith+x@corp.example today"),
        (2, "server at 192.168.1.254 and 10.0.0.1 rebooted"),
        (3, "call 555-123-4567 or +1 555 987 6543 now"),
        (4, "clean text with no pii at all"),
        (5, "mixed a@b.co 8.8.8.8 555-000-1111"),
    ]
    df = spark.createDataFrame(rows, "docid long, text string")
    out = {r.docid: r for r in pii_redact(df).collect()}
    assert out[1].text == "write to <EMAIL> today"
    assert (out[1].n_emails, out[1].n_ips, out[1].n_phones) == (1, 0, 0)
    assert out[2].text == "server at <IP> and <IP> rebooted"
    assert out[2].n_ips == 2
    assert out[3].n_phones == 2 and out[3].text.count("<PHONE>") == 2
    assert out[4].text == rows[3][1]
    assert (out[5].n_emails, out[5].n_ips, out[5].n_phones) == (1, 1, 1)
    assert out[5].text == "mixed <EMAIL> <IP> <PHONE>"


def test_domain_cap(spark):
    from sparksearch.dataops import domain_cap
    rows = [(i, f"https://{'big' if i % 4 else 'small'}.example/p/{i}")
            for i in range(40)]
    df = spark.createDataFrame(rows, "docid long, url string") \
        .repartition(8)  # exercise the two-stage (host, pid) pre-prune
    kept = domain_cap(df, cap=5).collect()
    by_host = {}
    for r in kept:
        by_host.setdefault(r.host, []).append(r)
    assert len(by_host["small.example"]) == 5
    assert len(by_host["big.example"]) == 5
    # first `cap` by docid survive, ranked densely
    big = sorted(by_host["big.example"], key=lambda r: r.host_rank)
    assert [r.docid for r in big] == [1, 2, 3, 5, 6]
    assert [r.host_rank for r in big] == [1, 2, 3, 4, 5]


def test_sq8_knn_vs_brute(spark):
    from sparksearch.dataops import brute_force_knn, sq8_encode, sq8_knn
    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    codes, lo, hi = sq8_encode(emb)
    row = codes.first()
    assert lo < hi
    assert all(0 <= c <= 255 for c in row.code)
    # max dequantization error is half a step
    step = (hi - lo) / 255.0
    deq = [lo + c * step for c in row.code]
    assert max(abs(a - b) for a, b in zip(deq, row.embedding)) <= step / 2 + 1e-9
    # quantized top-k closely tracks the exact top-k
    exact = [r.vec_id for r in brute_force_knn(emb, 0, k=10).collect()]
    approx = [r.vec_id for r in sq8_knn(emb, 0, k=10).collect()]
    assert len(set(exact) & set(approx)) >= 7
    assert approx[0] == exact[0]


def test_repeated_ngram_spans(spark):
    from sparksearch.dataops import repeated_ngram_spans
    boiler = "all rights reserved contact us today"
    rows = [
        (1, f"alpha beta {boiler} gamma"),
        (2, f"{boiler} delta epsilon zeta"),
        (3, f"unique words only here nothing shared {boiler}"),
        (4, "totally distinct text with no repeats anywhere at all"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = repeated_ngram_spans(df, k=3, min_df=3).collect()
    by_doc = {}
    for r in out:
        by_doc.setdefault(r.doc_id, []).append(r)
    assert 4 not in by_doc
    # the 6-token boilerplate yields 4 frequent 3-gram starts → one
    # merged span covering exactly the boilerplate tokens
    for d, start in ((1, 2), (2, 0), (3, 6)):
        spans = by_doc[d]
        assert len(spans) == 1
        s = spans[0]
        assert (s.span_start, s.span_end, s.n_grams) == (start, start + 5, 4)


def test_hashed_bow_score(spark):
    from sparksearch.dataops import hashed_bow_score
    rows = [(1, "same words same words"), (2, "same words same words"),
            (3, "different vocabulary entirely")]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r.doc_id: r.score for r in hashed_bow_score(df, dim=64).collect()}
    assert out[1] == out[2]            # deterministic per content
    assert -1.0 <= out[3] <= 1.0
    assert out[1] != out[3]


def test_lsh_planes_autosize_formula(spark):
    """planes = ceil(log2(n / target_bucket)), clamped to [1, 24] — the
    100 TB sizing rule: expected bucket stays ~target_bucket as n grows."""
    from sparksearch.dataops import lsh_planes_for
    assert lsh_planes_for(500, target_bucket=64) == 3
    assert lsh_planes_for(64, target_bucket=64) == 1       # n <= target
    assert lsh_planes_for(10, target_bucket=64) == 1
    assert lsh_planes_for(1 << 30, target_bucket=1024) == 20
    assert lsh_planes_for(1 << 60, target_bucket=1) == 24  # hi clamp


def test_lsh_knn_join_autosized_matches_explicit(spark, emb):
    """planes=None must produce exactly the explicit-planes result for the
    derived count (500 vectors, target 64 -> 3 planes)."""
    from sparksearch.dataops import lsh_knn_join
    auto = lsh_knn_join(emb, k=3, planes=None, target_bucket=64,
                        query_ids=[0, 1, 2]).collect()
    explicit = lsh_knn_join(emb, k=3, planes=3,
                            query_ids=[0, 1, 2]).collect()
    assert auto == explicit


def test_lsh_bucket_stats_histogram(spark, emb):
    from sparksearch.dataops import lsh_bucket_stats
    hist = lsh_bucket_stats(emb, planes=3).collect()
    assert sum(r.bucket_size * r.n_cells for r in hist) == emb.count()
    assert all(r.bucket_size >= 1 for r in hist)


def test_lsh_max_bucket_skew_guard(spark):
    """Pathological fixture: every vector identical -> one LSH cell of n.
    With max_bucket=8 the guard splits the cell so no joined bucket
    exceeds ~max_bucket, and each query still gets k neighbors (recall
    trade is within the oversized cell only)."""
    from sparksearch.dataops import lsh_knn_join
    n = 64
    rows = [(i, [1.0, 2.0, 3.0, 4.0]) for i in range(n)]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    out = lsh_knn_join(df, k=3, planes=2, max_bucket=8,
                       query_ids=[0, 1, 2, 3]).collect()
    by_q = {}
    for r in out:
        by_q.setdefault(r.query_id, []).append(r)
    # every query matched inside its own sub-cell: <= max_bucket
    # candidates, so k=3 neighbors exist (sub-cells hold ~n/8 = 8 ids)
    for q in (0, 1, 2, 3):
        assert 1 <= len(by_q[q]) <= 3
        for r in by_q[q]:
            assert r.cosine == pytest.approx(1.0, abs=1e-6)
