"""RFC 9309 robots filtering + deterministic epoch shuffle."""

from pyspark.sql import functions as F

from sparksearch.robots import parse_robots, robots_filter


def test_parse_robots_groups_and_precedence():
    c = ("# comment\nUser-agent: googlebot\nDisallow: /private\n\n"
         "User-agent: *\nDisallow: /p/000000\nAllow: /p/0000005\n"
         "Disallow: /p/*7$\n")
    assert parse_robots(c, "googlebot") == [("/private", False)]
    assert parse_robots(c, "anybot") == [
        ("/p/000000", False), ("/p/0000005", True), ("/p/*7$", False)]
    # stacked user-agent lines share one group; empty Disallow = no rule
    assert parse_robots("User-agent: a\nUser-agent: b\nDisallow: /x\n",
                        "b") == [("/x", False)]
    assert parse_robots("User-agent: *\nDisallow:\n", "*") == []


def test_robots_filter_rfc_precedence(spark):
    pages = spark.createDataFrame(
        [(f"https://h{i % 2}.example/p/{i:08d}",) for i in range(200)],
        "url string")
    robots = spark.createDataFrame(
        [("h0.example", "User-agent: *\nDisallow: /p/000000\n"
                        "Allow: /p/0000005\nDisallow: /p/*3$\n"),
         ("h1.example", "User-agent: *\nDisallow: /\n")],
        "host string, content string")
    kept = {r["url"] for r in
            robots_filter(pages, robots, agent="ccbot").collect()}
    # h1: everything disallowed
    assert not any("h1.example" in u for u in kept)
    for i in range(0, 200, 2):          # h0 pages
        u = f"https://h0.example/p/{i:08d}"
        if 50 <= i <= 59:
            want = True                 # longest match: Allow len 10
        elif i <= 99:
            want = False                # Disallow len 9
        elif i % 10 == 3:
            want = False                # anchored wildcard Disallow
        else:
            want = True                 # no matching rule
        assert (u in kept) == want, (i, u in kept, want)


def test_robots_unknown_host_allowed(spark):
    pages = spark.createDataFrame(
        [("https://nowhere.example/p/1",)], "url string")
    robots = spark.createDataFrame(
        [("h0.example", "User-agent: *\nDisallow: /\n")],
        "host string, content string")
    assert robots_filter(pages, robots).count() == 1


def test_epoch_shuffle_reproducible_and_distinct(spark):
    import hashlib
    from sparksearch.dataops import epoch_shuffle
    docs = spark.range(0, 300).select(F.col("id").alias("doc_id"))
    a = {r["doc_id"]: r["shuffle_rank"] for r in
         epoch_shuffle(docs, epoch=1, key_cols=["doc_id"]).collect()}
    b = {r["doc_id"]: r["shuffle_rank"] for r in
         epoch_shuffle(docs, epoch=1, key_cols=["doc_id"]).collect()}
    c = {r["doc_id"]: r["shuffle_rank"] for r in
         epoch_shuffle(docs, epoch=2, key_cols=["doc_id"]).collect()}
    assert a == b                      # reproducible
    assert a != c                      # epochs differ
    assert sorted(a.values()) == list(range(1, 301))   # true permutation
    # matches the reference md5 ordering exactly
    exp = sorted((hashlib.md5(f"{d}:1".encode()).hexdigest(), str(d), d)
                 for d in range(300))
    assert a == {d: i + 1 for i, (_, _, d) in enumerate(exp)}
