"""Deterministic Common-Crawl-style pages corpus (FIXTURES.md §1).

The engine's input is an Iceberg/Parquet table of pages
``(url string, warc_ts timestamp, html binary, text string, lang string)``
(BASELINE.json input_hint). Two constructors:

- ``pages_from_documents``: derives pages 1:1 from the driver-provided
  ``documents.parquet`` (doc_id, text, lang, ...) with pure Spark-native
  expressions — no UDFs, no randomness — so the Spark build, the DuckDB
  oracle, and the Python oracle can all reconstruct the identical corpus.
- ``synthesize_pages``: standalone seeded generator at arbitrary scale for
  throughput/scaling benchmarks (Zipf-ish head-skewed vocabulary), fully
  distributed via ``spark.range`` + JVM expressions (no data motion, no
  driver-side generation).

Invariant (hard gate, BASELINE.md): ``extract.extract_text(html) == text``
byte-for-byte for every row. The html template below and extract.py are
frozen together.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

__all__ = ["pages_from_documents", "synthesize_pages", "html_template_sql"]

_HTML_PREFIX = "<html><head><title></title></head><body>"
_HTML_COMMENT = "<!-- c -->"
_HTML_MID = "<p>"
_HTML_SUFFIX = "</p><script>skip()</script></body></html>"


def _escape(col: Column) -> Column:
    """Minimal HTML escaping (&, <, >) — inverse of entity decoding."""
    c = F.regexp_replace(col, "&", "&amp;")
    c = F.regexp_replace(c, "<", "&lt;")
    return F.regexp_replace(c, ">", "&gt;")


def _url_expr(doc_id: Column) -> Column:
    return F.concat(
        F.lit("https://site"),
        (doc_id % 97).cast("string"),
        F.lit(".example/p/"),
        F.lpad(doc_id.cast("string"), 8, "0"),
    )


def pages_from_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    """documents.parquet → pages(url, warc_ts, html, text, lang).

    Deterministic expressions only; ~5% of rows (doc_id % 20 == 0) carry an
    HTML comment to exercise the extractor (FIXTURES.md §1).
    """
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    return pages_from_docs_frame(docs)


def pages_from_docs_frame(docs: DataFrame) -> DataFrame:
    """Same mapping over an already-loaded documents frame (doc_id, text
    [, lang]) — the CLI's auto-adapter for documents-shaped inputs."""
    d = F.col("doc_id")
    comment = F.when(d % 20 == 0, F.lit(_HTML_COMMENT)).otherwise(F.lit(""))
    html_str = F.concat(
        F.lit(_HTML_PREFIX), comment, F.lit(_HTML_MID),
        _escape(F.col("text")), F.lit(_HTML_SUFFIX),
    )
    lang = (F.col("lang") if "lang" in docs.columns
            else F.lit("en")).alias("lang")
    return docs.select(
        _url_expr(d).alias("url"),
        (F.to_timestamp(F.lit("2025-01-01 00:00:00"))
         + F.make_interval(secs=d.cast("double"))).alias("warc_ts"),
        F.encode(html_str, "UTF-8").alias("html"),
        F.col("text"),
        lang,
    )


def html_template_sql(text_sql: str, docid_sql: str) -> str:
    """The same html construction as ANSI SQL (for DuckDB oracle parity)."""
    esc = (f"replace(replace(replace({text_sql}, '&', '&amp;'), "
           f"'<', '&lt;'), '>', '&gt;')")
    return (
        f"'{_HTML_PREFIX}' || "
        f"(CASE WHEN ({docid_sql}) % 20 = 0 THEN '{_HTML_COMMENT}' ELSE '' END)"
        f" || '{_HTML_MID}' || {esc} || '{_HTML_SUFFIX}'"
    )


def synthesize_pages(spark: SparkSession, n_docs: int, seed: int = 42,
                     vocab: int = 10_000, min_len: int = 20,
                     max_len: int = 100, partitions: int | None = None) -> DataFrame:
    """Seeded synthetic corpus at arbitrary scale — bench/scaling input.

    Per-token word rank is log-uniform over the vocabulary (Zipf-ish: rank 1
    appears ~log(V)× more than rank V), forcing the head-term skew the index
    build must handle. Generation is pure JVM expressions over spark.range —
    scales linearly with executors, no Python in the loop.
    """
    rng = spark.range(0, n_docs, 1, partitions or spark.sparkContext.defaultParallelism)
    span = max_len - min_len + 1
    # token j of doc i: u ~ U[0,1) from xxhash64(i, j), rank = floor(V^u) in
    # 1..V (log-uniform ≈ Zipf); doc length from xxhash64(i) in [min, max]
    df = rng.select(
        F.col("id").alias("doc_id"),
        F.expr(
            f"array_join(transform(sequence(0, "
            f"int(pmod(xxhash64(id, {seed}), {span})) + {min_len} - 1, 1), "
            f"j -> concat('w', cast(floor(pow(cast({vocab} as double), "
            f"cast(pmod(xxhash64(id, j, {seed + 1}), {1 << 20}) as double)"
            f" / {float(1 << 20)})) as string))), ' ')"
        ).alias("text"),
    )
    d = F.col("doc_id")
    comment = F.when(d % 20 == 0, F.lit(_HTML_COMMENT)).otherwise(F.lit(""))
    html_str = F.concat(
        F.lit(_HTML_PREFIX), comment, F.lit(_HTML_MID),
        _escape(F.col("text")), F.lit(_HTML_SUFFIX),
    )
    return df.select(
        _url_expr(d).alias("url"),
        (F.to_timestamp(F.lit("2025-01-01 00:00:00"))
         + F.make_interval(secs=d.cast("double"))).alias("warc_ts"),
        F.encode(html_str, "UTF-8").alias("html"),
        F.col("text"),
        F.when(d % 20 < 19, F.lit("en")).otherwise(F.lit("de")).alias("lang"),
    )
