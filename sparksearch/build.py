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


_DOC_POSTINGS_SCHEMA = T.StructType([
    T.StructField("dl", T.IntegerType(), False),
    T.StructField("entries", T.ArrayType(T.StructType([
        T.StructField("term", T.StringType(), False),
        T.StructField("tf", T.IntegerType(), False),
        T.StructField("positions", T.ArrayType(T.IntegerType()), False),
    ])), False),
])


def doc_postings_udf(analyzer: str = "standard"):
    """Arrow-batched analyzer emitting per-doc postings directly:
    text → struct(dl, entries: array<struct(term, tf, positions)>).

    This is the Lucene shape — the per-document term vector is aggregated
    map-side inside the writer (InternalEngine.index →
    indexWriter.addDocuments), so the build shuffle moves one compact row per
    (doc, distinct term) instead of one row per token occurrence, and no
    token-level groupBy/collect_list is needed downstream.
    """

    @F.pandas_udf(_DOC_POSTINGS_SCHEMA)
    def _tok(texts: pd.Series) -> pd.DataFrame:
        dls, entries = [], []
        for t in texts:
            toks = analyze(t or "", analyzer)
            by_term: dict[str, list[int]] = {}
            for term, pos in toks:
                by_term.setdefault(term, []).append(pos)
            dls.append(len(toks))
            entries.append([(term, len(ps), ps)
                            for term, ps in sorted(by_term.items())])
        return pd.DataFrame({"dl": dls, "entries": entries})

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

    out = ranged.mapInPandas(add_ids, schema=out_schema)
    out._sparksearch_cached = ranged  # for the caller to unpersist
    return out


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
    _timing = os.environ.get("SPARKSEARCH_TIMING") == "1"
    _last = [t0]

    def _mark(stage: str) -> None:
        if _timing:
            now = time.time()
            print(f"[build_index] {stage}: {now - _last[0]:.1f}s", flush=True)
            _last[0] = now

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

    # One fused Python pass: range-partition by url, then a single mapInPandas
    # assigns dense docids (per-partition offsets) AND runs the analyzer —
    # one Arrow round-trip of the text instead of two, one python worker pool.
    p = partitions or spark.sparkContext.defaultParallelism
    slim = pages.select("url", "warc_ts", "lang", "text")
    ranged = (slim.repartitionByRange(p, F.col("url"))
                  .sortWithinPartitions("url")
                  .withColumn("_pid", F.spark_partition_id())
                  .persist())
    counts = {r["_pid"]: r["cnt"] for r in
              ranged.groupBy("_pid").agg(F.count("*").alias("cnt")).collect()}
    offsets, acc = {}, 0
    for pid in sorted(counts):
        offsets[pid] = acc
        acc += counts[pid]

    tok_schema = T.StructType([
        T.StructField("docid", T.LongType(), False),
        T.StructField("url", T.StringType(), False),
        T.StructField("warc_ts", T.TimestampType(), True),
        T.StructField("lang", T.StringType(), True),
        T.StructField("dl", T.LongType(), False),
        T.StructField("entries", _DOC_POSTINGS_SCHEMA["entries"].dataType, False),
    ])

    def ids_and_analyze(iterator):
        local = 0
        for batch in iterator:
            n = len(batch)
            if n == 0:
                continue
            base = offsets[int(batch["_pid"].iloc[0])] + local
            local += n
            dls, entries = [], []
            for t in batch["text"]:
                toks = analyze(t or "", analyzer)
                by_term: dict[str, list[int]] = {}
                for term, pos in toks:
                    by_term.setdefault(term, []).append(pos)
                dls.append(len(toks))
                entries.append([(term, len(ps), ps)
                                for term, ps in sorted(by_term.items())])
            yield pd.DataFrame({
                "docid": range(base, base + n),
                "url": batch["url"].values,
                "warc_ts": batch["warc_ts"].values,
                "lang": batch["lang"].values,
                "dl": dls,
                "entries": entries,
            })

    tok = (ranged.mapInPandas(ids_and_analyze, schema=tok_schema)
                 .withColumn("dl_q", quantized_dl_col("dl")))
    # One materialization of the analyzer UDF feeds every downstream stage
    # (docs + postings + stats). MEMORY_AND_DISK: spills, never recomputes —
    # at cluster scale this is the standard "analyzed tokens" stage cache.
    from pyspark import StorageLevel
    tok = tok.persist(StorageLevel.MEMORY_AND_DISK)

    # docs table — the forward index / docid↔url dictionary
    if not done("docs"):
        (tok.select("docid", "url", "warc_ts", "lang", "dl", "dl_q")
            .repartitionByRange(max(1, (partitions or 8) // 2), "docid")
            .sortWithinPartitions("docid")
            .write.mode("overwrite").parquet(f"{out_dir}/docs"))

    _mark("docs_write")
    # n_docs is already known exactly from the docid-offset pass (acc);
    # total_tf comes from the stats aggregation below (sum cf) — no extra job.
    n_docs = acc

    # postings — term-major transpose. Per-doc term vectors were already
    # aggregated map-side inside the analyzer UDF, so this is a pure explode
    # of compact (term, tf, positions) rows: the only token-granular shuffle
    # in the build is the repartition below, keyed by (bucket, term).
    if not done("postings"):
        postings = (tok
                    .select("docid", "dl_q", F.explode("entries").alias("e"))
                    .select(F.col("e.term").alias("term"), "docid",
                            F.col("e.tf").alias("tf"),
                            F.col("e.positions").alias("positions"), "dl_q")
                    .withColumn("bucket",
                                F.pmod(F.xxhash64("term"), F.lit(n_buckets))))
        (postings
         .repartition(partitions or n_buckets, "bucket", "term")
         .sortWithinPartitions("term", "docid")
         .write.mode("overwrite").partitionBy("bucket")
         .parquet(f"{out_dir}/postings"))

    _mark("postings_write")
    # term statistics (global df/cf — DFS semantics by construction)
    if not done("stats"):
        (spark.read.parquet(f"{out_dir}/postings")
         .groupBy("term")
         .agg(F.count("*").cast("long").alias("df"),
              F.sum("tf").cast("long").alias("cf"))
         .coalesce(max(1, (partitions or 8) // 4))
         .write.mode("overwrite").parquet(f"{out_dir}/stats"))

    _mark("stats_write")
    stats = spark.read.parquet(f"{out_dir}/stats")
    srow = stats.agg(F.count("*").alias("n"), F.max("df").alias("m"),
                     F.sum("cf").alias("ttf")).collect()[0]
    n_terms, max_df = srow["n"], srow["m"] or 0
    total_tf = srow["ttf"] or 0
    avgdl = (total_tf / n_docs) if n_docs else 1.0

    _mark("stats_agg")
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
    tok.unpersist()
    ranged.unpersist()
    return meta
