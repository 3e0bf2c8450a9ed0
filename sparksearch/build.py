"""Distributed inverted-index build: pages → docs + postings + stats.

Spark trace of the reference's indexing path (_bulk → DocumentParser →
InternalEngine.index → Lucene segments; SURVEY.md §3.2):

  pages
    → extract/verify text (Arrow UDF; byte-identical gate)
    → assign deterministic dense docids (global url order — the engine's
      tie-break contract, mirroring Lucene docID + TopDocs.merge order,
      sv/action/search/SearchPhaseController.java:246-249)
    → tokenize (Arrow-batched pandas UDF — the analyzer, SURVEY.md §1.3)
    → explode → groupBy(term, docid) [shuffle #1, high-cardinality key,
      map-side partial aggregation — no skew problem]
    → postings rows (term, docid, tf, positions, dl_q denormalized like a
      Lucene norm so the query path never joins the docs table)
    → stats: groupBy(term) [shuffle #2, Zipf-skewed key but map-side combine
      reduces each partition to ≤|vocab| rows before the exchange]
    → write parquet: postings hash-bucketed by term (directory partition
      `bucket=pmod(xxhash64(term), B)`) and sorted by (term, docid) within
      files → query-term lookups prune B-1/B of the data via partition
      pruning + row-group min/max on `term`.

Scale notes (100 TB / 10^12 docs):
  - docid assignment is the classic two-pass range-partition + per-partition
    offset scheme (one tiny P-row collect; no global window).
  - the only Python in the build is the analyzer UDF (Arrow batches) — all
    shuffles, aggregations and encodes stay JVM-side.
  - `bucket` count scales with cluster size; head-term salting applies to the
    packed segment encode (segments.py), not these row-postings, because
    groupBy(term, docid) keys are uniform.

Resume: each output (docs/postings/stats/meta) is a separate atomic parquet
write with a _SUCCESS marker; `build_index(..., resume=True)` skips completed
stages — the batch analogue of the reference's translog checkpoint replay
(sv/index/seqno/LocalCheckpointTracker.java:47-143).
"""

from __future__ import annotations

import json
import os
import time

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from sparksearch.analysis import analyze

__all__ = ["tokenize_udf", "assign_docids", "quantized_dl_col", "build_index"]

_TOKENS_SCHEMA = T.StructType([
    T.StructField("terms", T.ArrayType(T.StringType()), False),
    T.StructField("poss", T.ArrayType(T.IntegerType()), False),
])


def tokenize_udf(analyzer: str = "standard"):
    """Arrow-batched analyzer: text → struct(terms array, positions array)."""

    @F.pandas_udf(_TOKENS_SCHEMA)
    def _tok(texts: pd.Series) -> pd.DataFrame:
        terms_out, poss_out = [], []
        for t in texts:
            toks = analyze(t or "", analyzer)
            terms_out.append([x.term for x in toks])
            poss_out.append([x.pos for x in toks])
        return pd.DataFrame({"terms": terms_out, "poss": poss_out})

    return _tok


def assign_docids(df: DataFrame, order_col: str = "url",
                  partitions: int | None = None) -> DataFrame:
    """Add a deterministic dense ``docid`` ordered globally by `order_col`.

    Two-pass, no global window: range-partition + sort, persist, count rows
    per partition (collect of P longs), then add per-partition offsets in a
    mapInPandas that never crosses partitions. This is how you zipWithIndex
    a 10^12-row table without a single-partition sort.
    """
    p = partitions or df.sparkSession.sparkContext.defaultParallelism
    ranged = (df.repartitionByRange(p, F.col(order_col))
                .sortWithinPartitions(order_col)
                .withColumn("_pid", F.spark_partition_id())
                .persist())
    counts = {r["_pid"]: r["cnt"] for r in
              ranged.groupBy("_pid").agg(F.count("*").alias("cnt")).collect()}
    offsets, acc = {}, 0
    for pid in sorted(counts):
        offsets[pid] = acc
        acc += counts[pid]

    out_schema = T.StructType(
        [T.StructField("docid", T.LongType(), False)]
        + [f for f in df.schema.fields])

    def add_ids(iterator):
        import pandas as pd
        local = 0
        for batch in iterator:
            n = len(batch)
            if n == 0:
                continue
            base = offsets[int(batch["_pid"].iloc[0])] + local
            local += n
            out = batch.drop(columns=["_pid"])
            out.insert(0, "docid", range(base, base + n))
            yield out

    return ranged.mapInPandas(add_ids, schema=out_schema)


def quantized_dl_col(dl_col_name: str):
    """SmallFloat decode(encode(dl)) as a pure Catalyst expression
    (norms.quantized_dl_sql — JVM-side, no UDF)."""
    from sparksearch.norms import quantized_dl_sql
    return F.expr(quantized_dl_sql(dl_col_name)).cast("long")


def build_index(pages: DataFrame, out_dir: str, analyzer: str = "standard",
                n_buckets: int = 8, partitions: int | None = None,
                resume: bool = False, verify_extract: bool = False) -> dict:
    """Build the full index dataset under ``out_dir``.

    Layout:
      docs/      docid, url, warc_ts, lang, dl, dl_q        (sorted by docid)
      postings/  bucket=*/ term, docid, tf, positions, dl_q (sorted term,docid)
      stats/     term, df, cf
      meta.json  n_docs, total_tf, avgdl, analyzer, metrics

    Returns the meta dict.
    """
    spark = pages.sparkSession
    t0 = time.time()

    def done(stage: str) -> bool:
        return resume and os.path.exists(f"{out_dir}/{stage}/_SUCCESS")

    if verify_extract:
        from sparksearch.extract import extract_text

        @F.pandas_udf(T.BooleanType())
        def _ok(html: pd.Series, text: pd.Series) -> pd.Series:
            return pd.Series(
                [extract_text(h) == (t or "") for h, t in zip(html, text)])

        bad = pages.filter(~_ok(F.col("html"), F.col("text"))).count()
        if bad:
            raise ValueError(f"{bad} rows violate extract(html)==text")

    with_ids = assign_docids(
        pages.select("url", "warc_ts", "lang", "text"), "url", partitions)

    tok = with_ids.withColumn("_t", tokenize_udf(analyzer)(F.col("text")))
    tok = tok.select(
        "docid", "url", "warc_ts", "lang",
        F.col("_t.terms").alias("terms"), F.col("_t.poss").alias("poss"),
        F.size("_t.terms").cast("long").alias("dl"),
    ).withColumn("dl_q", quantized_dl_col("dl"))

    # docs table — the forward index / docid↔url dictionary
    if not done("docs"):
        (tok.select("docid", "url", "warc_ts", "lang", "dl", "dl_q")
            .repartitionByRange(max(1, (partitions or 8) // 2), "docid")
            .sortWithinPartitions("docid")
            .write.mode("overwrite").parquet(f"{out_dir}/docs"))

    docs = spark.read.parquet(f"{out_dir}/docs")
    n_docs = docs.count()
    total_tf = docs.agg(F.sum("dl")).collect()[0][0] or 0
    avgdl = (total_tf / n_docs) if n_docs else 1.0

    # postings — term-major transpose
    if not done("postings"):
        exploded = (tok
                    .select("docid", "dl_q",
                            F.explode(F.arrays_zip("terms", "poss")).alias("tp"))
                    .select("docid", "dl_q",
                            F.col("tp.terms").alias("term"),
                            F.col("tp.poss").alias("pos")))
        postings = (exploded
                    .groupBy("term", "docid")
                    .agg(F.count("*").cast("int").alias("tf"),
                         F.sort_array(F.collect_list("pos")).alias("positions"),
                         F.first("dl_q").alias("dl_q"))
                    .withColumn("bucket",
                                F.pmod(F.xxhash64("term"), F.lit(n_buckets))))
        (postings
         .repartition(partitions or n_buckets, "bucket", "term")
         .sortWithinPartitions("term", "docid")
         .write.mode("overwrite").partitionBy("bucket")
         .parquet(f"{out_dir}/postings"))

    # term statistics (global df/cf — DFS semantics by construction)
    if not done("stats"):
        (spark.read.parquet(f"{out_dir}/postings")
         .groupBy("term")
         .agg(F.count("*").cast("long").alias("df"),
              F.sum("tf").cast("long").alias("cf"))
         .coalesce(max(1, (partitions or 8) // 4))
         .write.mode("overwrite").parquet(f"{out_dir}/stats"))

    stats = spark.read.parquet(f"{out_dir}/stats")
    n_terms = stats.count()
    max_df = stats.agg(F.max("df")).collect()[0][0] or 0

    meta = {
        "version": 1,
        "analyzer": analyzer,
        "n_docs": int(n_docs),
        "total_tf": int(total_tf),
        "avgdl": float(avgdl),
        "n_terms": int(n_terms),
        "n_buckets": int(n_buckets),
        "metrics": {
            "build_sec": round(time.time() - t0, 3),
            "max_df": int(max_df),
            "skew_ratio_df": float(max_df) / max(1.0, total_tf / max(1, n_terms)),
        },
    }
    os.makedirs(out_dir, exist_ok=True)
    with open(f"{out_dir}/meta.json", "w") as f:
        json.dump(meta, f, indent=2)
    return meta
