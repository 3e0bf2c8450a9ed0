"""Round-5 ADVICE.md regression tests: completion-regex alternation,
robots URL-case + '$' anchor handling, WARC UTC/microsecond stamping,
pages_to_warc archive-count scaling, _RECORD_FIRST dedup."""

from __future__ import annotations

import datetime

import pytest


# ---------------------------------------------------------------------------
# ADVICE #1 — completion regex: top-level alternation must not be pruned by
# the first branch's literal head
# ---------------------------------------------------------------------------

def test_regex_literal_head_alternation():
    from sparksearch.fetchops import _regex_literal_head
    assert _regex_literal_head("scan|term") == ""
    assert _regex_literal_head("scan") == "scan"
    assert _regex_literal_head("sc(an|x)") == "sc"   # group alternation OK
    assert _regex_literal_head("scan\\|x") == "scan"  # escaped '|' literal
    assert _regex_literal_head("a[b|c]d") == "a"      # class '|' literal
    assert _regex_literal_head("ab?|cd") == ""


def test_completion_regex_alternation(spark, index_sf0001):
    from sparksearch.fetchops import suggest_completion_regex
    ix = index_sf0001
    # pick two real terms with distinct first letters from the index
    terms = [r["term"] for r in
             ix.stats.orderBy("term").limit(500).collect()]
    a = next(t for t in terms if t[:1] == terms[0][:1])
    b = next(t for t in terms if t[:1] != a[:1])
    got = {r["term"] for r in
           suggest_completion_regex(ix, f"{a}|{b}", size=10).collect()}
    assert a in got and b in got


# ---------------------------------------------------------------------------
# ADVICE #2 — robots: case variations must not fail open; one '$' stripped
# ---------------------------------------------------------------------------

def test_robots_filter_case_insensitive(spark):
    from sparksearch.robots import robots_filter
    robots = spark.createDataFrame(
        [("host.example", "User-agent: *\nDisallow: /private/")],
        "host string, content string")
    pages = spark.createDataFrame(
        [("HTTPS://Host.Example/private/x",),
         ("https://host.example/private/y",),
         ("https://host.example/public/z",)], "url string")
    kept = {r["url"] for r in robots_filter(pages, robots).collect()}
    assert kept == {"https://host.example/public/z"}


def test_robots_dollar_anchor_single_strip(spark):
    from sparksearch.robots import robots_filter
    # '/a$' anchors; '/b$$' means path '/b$' then anchor — plen must count
    # the literal '$' so precedence vs '/b' is by true pattern length
    robots = spark.createDataFrame(
        [("h.example",
          "User-agent: *\nDisallow: /a$\nDisallow: /b$$\nAllow: /b$x")],
        "host string, content string")
    pages = spark.createDataFrame(
        [("https://h.example/a",), ("https://h.example/ab",),
         ("https://h.example/b$",), ("https://h.example/b$x",)],
        "url string")
    kept = {r["url"] for r in robots_filter(pages, robots).collect()}
    # /a blocked (anchored exact), /ab allowed (anchor), /b$ blocked,
    # /b$x allowed (longer Allow wins)
    assert kept == {"https://h.example/ab", "https://h.example/b$x"}


# ---------------------------------------------------------------------------
# ADVICE #3 — WARC dates: UTC regardless of session tz, micros preserved
# ---------------------------------------------------------------------------

def test_pages_to_warc_utc_and_micros(spark):
    from sparksearch.warc import pages_to_warc, warc_to_pages
    ts = datetime.datetime(2025, 3, 4, 5, 6, 7, 123456)
    pages = spark.createDataFrame(
        [("https://a.example/1", ts, b"<html><body>x</body></html>")],
        "url string, warc_ts timestamp, html binary")
    old = spark.conf.get("spark.sql.session.timeZone")
    try:
        spark.conf.set("spark.sql.session.timeZone",
                       "America/Los_Angeles")
        blob = bytes(pages_to_warc(pages, n_files=1).collect()[0]["data"])
    finally:
        spark.conf.set("spark.sql.session.timeZone", old)
    import gzip
    raw = gzip.decompress(blob)
    assert b"WARC-Date: 2025-03-04T05:06:07.123456Z" in raw
    back = warc_to_pages(
        spark.createDataFrame([(blob,)], "data binary")).collect()[0]
    assert back["warc_ts"] == ts


def test_pages_to_warc_archive_count_scales(spark):
    from sparksearch.warc import pages_to_warc
    rows = [(f"https://h.example/{i}",
             datetime.datetime(2025, 1, 1), b"<html>x</html>")
            for i in range(97)]
    pages = spark.createDataFrame(
        rows, "url string, warc_ts timestamp, html binary")
    # default n_files scales: ceil(97/10) = 10 archives
    n = pages_to_warc(pages, docs_per_archive=10).count()
    assert n == 10


# ---------------------------------------------------------------------------
# ADVICE #5 — gate rotation list stays auditable
# ---------------------------------------------------------------------------

def test_record_first_no_duplicates():
    import sys
    sys.path.insert(0, "/root/repo")
    import __spark_entry__ as E
    lst = E._RECORD_FIRST
    assert len(set(lst)) == len(lst), sorted(
        x for x in set(lst) if lst.count(x) > 1)
