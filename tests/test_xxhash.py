"""Pure-Python xxhash64 must be bit-identical to Spark's expression —
the index bucket layout (pmod(xxhash64(term), B) directory keys) depends
on it, so a single mismatch would make query-side pruning read the wrong
bucket and silently drop hits."""

from pyspark.sql import functions as F

from sparksearch.xxhash import spark_bucket, xxhash64

CASES = [
    "", "a", "ab", "abc", "abcd", "abcde", "join", "hash", "the",
    "x" * 7, "x" * 8, "y" * 15, "z" * 16, "w" * 31, "v" * 32, "u" * 33,
    "t" * 100, "s" * 1000,
    "naïve", "日本語テキスト", "emoji 🎉 test", "tab\tnl\n", "café—dash",
    "\x00null\x00bytes",
]


def test_xxhash64_matches_spark(spark):
    df = (spark.createDataFrame([(c,) for c in CASES], "s string")
          .select("s", F.xxhash64("s").alias("h"),
                  F.pmod(F.xxhash64("s"), F.lit(8)).alias("b")))
    for r in df.collect():
        assert xxhash64(r["s"].encode("utf-8")) == r["h"], repr(r["s"])
        assert spark_bucket(r["s"], 8) == r["b"], repr(r["s"])


def test_bucket_of_agrees_with_layout(spark):
    """IndexReader.bucket_of must agree with the build's partitionBy keys."""
    from sparksearch.xxhash import spark_bucket
    terms = ["join", "hash", "table", "the", "fast", "slow", "error"]
    df = (spark.createDataFrame([(t,) for t in terms], "term string")
          .select("term", F.pmod(F.xxhash64("term"), F.lit(16)).alias("b")))
    jvm = {r["term"]: r["b"] for r in df.collect()}
    assert {t: spark_bucket(t, 16) for t in terms} == jvm
