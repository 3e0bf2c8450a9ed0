"""mapper-size, mapper-murmur3, annotated-text, geoip enrich."""

import pytest
from pyspark.sql import functions as F

from sparksearch.mappers_plugins import (annotated_analyze, geoip_enrich,
                                         murmur3_128_h1, parse_annotated,
                                         with_murmur3, with_size)


# ---------------------------------------------------------------------------
# murmur3 x64-128 h1 — public vectors (mmh3.hash64(x, signed=True)[0])
# ---------------------------------------------------------------------------

def test_murmur3_empty_is_zero():
    assert murmur3_128_h1(b"") == 0


def test_murmur3_hello_public_vector():
    # widely published mmh3 example: hash64("hello") h1
    assert murmur3_128_h1(b"hello") == -3758069500696749310


def test_murmur3_long_input_block_path():
    # >16 bytes exercises the block loop; determinism + spread
    a = murmur3_128_h1(b"the quick brown fox jumps over the lazy dog")
    b = murmur3_128_h1(b"the quick brown fox jumps over the lazy dog")
    c = murmur3_128_h1(b"the quick brown fox jumps over the lazy cog")
    assert a == b != c
    assert -(1 << 63) <= a < (1 << 63)


def test_murmur3_tail_lengths():
    # every tail length 0..16 hashes without error and distinctly
    vals = {murmur3_128_h1(b"x" * n) for n in range(17)}
    assert len(vals) == 17


def test_with_murmur3_column(spark):
    df = spark.createDataFrame(
        [("hello",), (None,), ("hello",), ("world",)], "v string")
    out = {r["v"]: r["v_hash"]
           for r in with_murmur3(df, "v").collect()}
    assert out["hello"] == -3758069500696749310
    assert out[None] is None
    assert out["world"] not in (None, out["hello"])


# ---------------------------------------------------------------------------
# mapper-size
# ---------------------------------------------------------------------------

def test_with_size_utf8_bytes(spark):
    df = spark.createDataFrame([("abc", "é"), (None, "x")], "a string, b string")
    rows = with_size(df, "a", "b").orderBy("b").collect()
    # binary order: 'x' < 'é'; é is 2 UTF-8 bytes; null column counts 0
    assert [r["_size"] for r in rows] == [0 + 1, 3 + 2]


# ---------------------------------------------------------------------------
# annotated-text
# ---------------------------------------------------------------------------

def test_parse_annotated_strip_and_offsets():
    plain, anns = parse_annotated(
        "visit [New York](City&Big%20Apple) soon")
    assert plain == "visit New York soon"
    assert anns == [(6, ["City", "Big Apple"])]


def test_annotated_tokens_position_stack():
    toks = annotated_analyze("visit [New York](NYC) soon")
    # surface tokens keep their stream positions
    assert ("visit", 0) in toks and ("new", 1) in toks
    assert ("york", 2) in toks and ("soon", 3) in toks
    # annotation lands on the FIRST surface token's position
    assert ("NYC", 1) in toks


def test_annotated_plain_text_unchanged():
    toks = annotated_analyze("no markup here")
    assert toks == [("no", 0), ("markup", 1), ("here", 2)]


def test_annotated_trailing_annotation_anchor():
    # annotation over the final token anchors at that token, not past it
    toks = annotated_analyze("made by [OpenAI](Org)")
    assert ("openai", 2) in toks and ("Org", 2) in toks


# ---------------------------------------------------------------------------
# geoip enrich
# ---------------------------------------------------------------------------

def test_geoip_enrich_match_and_miss(spark):
    ranges = spark.createDataFrame(
        [("10.0.0.0/15", "US", "NYC"),
         ("10.2.0.0/16", "DE", "Berlin")],
        "cidr string, country string, city string")
    df = spark.createDataFrame(
        [("10.0.5.9",), ("10.1.255.255",), ("10.2.3.4",), ("10.9.0.1",)],
        "ip string")
    out = {r["ip"]: (r["country"], r["city"])
           for r in geoip_enrich(df, "ip", ranges).collect()}
    assert out["10.0.5.9"] == ("US", "NYC")
    assert out["10.1.255.255"] == ("US", "NYC")   # /15 spans two /16s
    assert out["10.2.3.4"] == ("DE", "Berlin")
    assert out["10.9.0.1"] == (None, None)


def test_geoip_enrich_no_row_duplication(spark):
    # two ranges share a /16 bucket after explosion; probes must not dup
    ranges = spark.createDataFrame(
        [("10.0.0.0/24", "A"), ("10.0.1.0/24", "B")],
        "cidr string, tag string")
    df = spark.createDataFrame([("10.0.0.7",), ("10.0.1.7",), ("10.0.2.7",)],
                               "ip string")
    rows = geoip_enrich(df, "ip", ranges).collect()
    assert len(rows) == 3
    out = {r["ip"]: r["tag"] for r in rows}
    assert out == {"10.0.0.7": "A", "10.0.1.7": "B", "10.0.2.7": None}


def test_geoip_wide_cidr_guard(spark):
    ranges = spark.createDataFrame([("10.0.0.0/4", "X")],
                                   "cidr string, tag string")
    df = spark.createDataFrame([("10.0.0.1",)], "ip string")
    with pytest.raises(ValueError, match="buckets"):
        geoip_enrich(df, "ip", ranges)
