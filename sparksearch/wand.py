"""Block-max WAND top-k over packed segments.

The reference's hot query path is Lucene's TopScoreDocCollector with
block-max WAND pruning, enabled because track_total_hits defaults to 10k
(/root/reference/server/src/main/java/org/opensearch/search/query/TopDocsCollectorContext.java:348-363,
/root/reference/server/src/main/java/org/opensearch/search/internal/SearchContext.java:92-94;
the WAND machinery itself is Lucene 9.4 public: impacts +
setMinCompetitiveScore). A batch engine can't do Lucene's doc-at-a-time
cursor dance, so this is the *set-oriented* equivalent with the same
guarantee (provably identical top-k):

  phase A (threshold seed): decode only the J highest-impact blocks per
      query term, aggregate partial scores, take the k-th best → θ.
      Partial sums under-estimate true scores, so θ is a valid lower
      bound of the true k-th score.
  phase B (prune + score): a block of term t can contain a top-k doc only
      if  ub(B) = w_t·idf_t·max_tfn(B) + Σ_{t'≠t} w_t'·idf_t'·gmax_t' ≥ θ.
      Every doc of a pruned block has true score ≤ ub(B) < θ ≤ true k-th
      score, so pruning is exact; and any true top-k doc (including k-th
      ties) sits only in surviving blocks, so its score and its
      minimum_should_match term count are computed exactly.

Both phases are DataFrame plans: parquet scans pruned by (bucket, term),
block filters on JVM-side metadata columns, one vectorized decode
mapInPandas, groupBy(docid) partial+final aggregation, and Spark's
TakeOrderedAndProject as the per-partition-top-k + merge
(= per-shard collector + SearchPhaseController.mergeTopDocs,
sv/action/search/SearchPhaseController.java:191-249).
"""

from __future__ import annotations

import math
from collections import Counter

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from sparksearch import bm25
from sparksearch.analysis import analyze
from sparksearch.codec import BLOCK_SIZE, delta_decode_docids, varint_decode
from sparksearch.norms import DECODE_LUT
from sparksearch.queries import Match, calculate_min_should_match

__all__ = ["wand_topk"]

_SCORE_SCHEMA = T.StructType([
    T.StructField("docid", T.LongType(), False),
    T.StructField("term", T.StringType(), False),
    T.StructField("score", T.DoubleType(), False),
])


def _decode_score(widf: dict[str, float], avgdl: float,
                  k1: float, b: float):
    """mapInPandas: packed blocks → (docid, term, w·idf·tfn) rows."""

    def dec(batches):
        for pdf in batches:
            outs = []
            for r in pdf.itertuples(index=False):
                docids = delta_decode_docids(r.docids)
                tfs = varint_decode(r.tfs).astype(np.float64)
                dl_q = DECODE_LUT[np.frombuffer(r.norms, dtype=np.uint8)] \
                    .astype(np.float64)
                tfn = tfs / (tfs + k1 * (1.0 - b + b * dl_q / avgdl))
                outs.append(pd.DataFrame({
                    "docid": docids, "term": r.term,
                    "score": widf[r.term] * tfn}))
            if outs:
                yield pd.concat(outs, ignore_index=True)

    return dec


def wand_topk(ix, q: Match, k: int = 10,
              k1: float | None = None,
              b: float | None = None) -> DataFrame:
    """Exact BM25 top-k for a match query via block-max pruning.

    Returns DataFrame(docid, score), score desc / docid asc, ≤ k rows.
    `ix` is an IndexReader with packed segments built.

    ``k1``/``b`` tune the BM25 parameters (default: the reference
    defaults 1.2/0.75). The stored impact pairs are raw per-block
    (max_tf, min_dlq) STATISTICS, not precomputed scores, and
    tf/(tf+k1·(1−b+b·dl/avgdl)) is monotone up in tf / down in dl for
    any k1>0, 0≤b≤1 — so the same pairs yield exact upper bounds under
    any parameterization and pruning stays rank-exact.
    """
    k1 = bm25.K1 if k1 is None else float(k1)
    b = bm25.B if b is None else float(b)
    toks = analyze(q.text, q.analyzer or ix.search_analyzer)
    terms = [t for t, _ in toks]
    if len({p for _, p in toks}) != len(toks):
        raise ValueError(
            "wand_topk scores exact terms independently; synonym-stacked "
            "token streams need the blended plan path "
            "(Executor.search mode='plan' falls back automatically)")
    if not terms:
        return ix.docs.select(
            "docid", F.lit(0.0).alias("score")).limit(0)
    cnt = Counter(terms)
    uniq = sorted(cnt)
    if q.operator == "and":
        msm = len(terms)
    else:
        msm = calculate_min_should_match(
            len(terms), q.minimum_should_match, has_required=False)

    # buckets are pure-Python xxhash64 (no job); blocks and their window
    # don't need stats, so the tiny stats collect and the phase-A seed
    # collect run as CONCURRENT jobs — the driver-side seed scoring below
    # waits on both
    buckets = ix._buckets_of(uniq)
    blocks = ix.segments.blocks_for(uniq, buckets)
    # block upper bound from the stored (max_tf, min_dlq) impact pair and the
    # CURRENT global avgdl — tfn is monotone up in tf, down in dl, so this
    # dominates every doc in the block even after avgdl drifted across
    # generations

    def _tfn_bound(max_tf: float, min_dlq: float) -> float:
        return max_tf / (max_tf + k1 * (1.0 - b + b * min_dlq / ix.avgdl))

    tfn_ub = (F.col("max_tf").cast("double")
              / (F.col("max_tf")
                 + F.lit(k1) * (1.0 - b
                                + b * F.col("min_dlq").cast("double")
                                / float(ix.avgdl))))
    blocks = blocks.withColumn("_tfn_ub", tfn_ub)

    # phase A seed: the j highest-impact blocks per term. The window-filter
    # runs distributed (JVM-only), but only the ≤ j·|terms| surviving
    # ENCODED block rows (~1.5 KB each, bounded at any corpus size) come
    # back to the driver, which decodes them with the same numpy codec and
    # derives θ locally — no python-worker dispatch, no shuffle.
    j = max(1, math.ceil(k / BLOCK_SIZE)) + 1
    from pyspark.sql import Window
    wnd = Window.partitionBy("term").orderBy(
        F.col("_tfn_ub").desc(), F.col("salt"), F.col("block_id"))
    seed_df = (blocks.withColumn("_rn", F.row_number().over(wnd))
               .filter(F.col("_rn") <= j)
               .select("term", "docids", "tfs", "norms"))

    from concurrent.futures import ThreadPoolExecutor
    with ThreadPoolExecutor(max_workers=2) as pool:
        fut_stats = pool.submit(lambda: ix.stats_for(uniq).collect())
        fut_seed = pool.submit(seed_df.collect)
        srows = fut_stats.result()
        seed_rows = fut_seed.result()

    idf = {r["term"]: bm25.idf(r["df"], ix.n_docs) for r in srows}
    # (k1+1) folded into the per-term weight: decode emits plain
    # tf/(tf+k1·norm), so score = w·idf·(k1+1)·tfn = LegacyBM25Similarity
    widf = {t: cnt[t] * idf.get(t, 0.0) * (k1 + 1.0) for t in uniq}
    present = [t for t in uniq if t in idf]
    if not present:
        return ix.docs.select("docid", F.lit(0.0).alias("score")).limit(0)

    # per-term global bound gmax: from the term-level (max_tf, min_dlq)
    # impact pair in the stats table — zero extra jobs.
    # tfn_ub(max over blocks max_tf, min over blocks min_dlq) ≥
    # max over blocks tfn_ub(block) ≥ any doc's tfn, so pruning stays
    # exact (marginally looser than the per-block max, which cost a
    # groupBy-collect job per query on legacy indexes without the columns).
    if srows and "max_tf" in srows[0].asDict() \
            and all(r["max_tf"] is not None for r in srows):
        gm = {r["term"]: _tfn_bound(float(r["max_tf"]), float(r["min_dlq"]))
              for r in srows}
    else:
        gm = {r["term"]: r["gmax"] for r in
              blocks.groupBy("term")
                    .agg(F.max("_tfn_ub").alias("gmax")).collect()}
    sum_all = sum(widf[t] * gm.get(t, 0.0) for t in present)

    dec = _decode_score(widf, ix.avgdl, k1, b)
    payload = ["term", "docids", "tfs", "norms"]
    # msm is counted over the analyzed token list INCLUDING duplicates (an
    # operator='and' query with a repeated term needs msm = len(terms)), so
    # clause-match counts must be weighted by the term's multiplicity cnt[t]
    # — mirroring exec._plan_match; countDistinct(term) caps at len(uniq)
    # and would make repeated-term AND queries unsatisfiable.
    cnt_map = F.create_map(*[x for t in present
                             for x in (F.lit(t), F.lit(int(cnt[t])))])

    def agg_scores(df: DataFrame) -> DataFrame:
        per = df.select(*payload).mapInPandas(dec, schema=_SCORE_SCHEMA)
        out = (per.groupBy("docid")
               .agg(F.sum("score").alias("score"),
                    F.sum(F.element_at(cnt_map, F.col("term")))
                     .alias("_nt")))
        if msm > 1:
            out = out.filter(F.col("_nt") >= msm)
        return out.select("docid", "score")

    # phase A scoring, driver-local over the collected seed rows
    acc_s: dict[int, float] = {}
    acc_n: dict[int, int] = {}
    for r in seed_rows:
        docids = delta_decode_docids(r["docids"])
        tfs = varint_decode(r["tfs"]).astype(np.float64)
        dl_q = DECODE_LUT[np.frombuffer(r["norms"], dtype=np.uint8)] \
            .astype(np.float64)
        tfn = tfs / (tfs + k1 * (1.0 - b + b * dl_q / ix.avgdl))
        sc = widf[r["term"]] * tfn
        w_nt = cnt[r["term"]]
        for d, s in zip(docids.tolist(), sc.tolist()):
            acc_s[d] = acc_s.get(d, 0.0) + s
            acc_n[d] = acc_n.get(d, 0) + w_nt
    cand = [(s, -d) for d, s in acc_s.items()
            if msm <= 1 or acc_n[d] >= msm]
    if cand and ix.deleted is not None:
        # θ must lower-bound the k-th LIVE score — a deleted doc in the
        # seed would over-prune. One bounded semi-join: seed docids
        # (driver-local, block-sized) against the tombstone set.
        seed_ids = ix.spark.createDataFrame(
            [(int(-d),) for _, d in cand], "docid bigint")
        gone = {r["docid"] for r in
                seed_ids.join(ix.deleted, "docid", "left_semi").collect()}
        cand = [(s, d) for s, d in cand if -d not in gone]
    cand.sort(reverse=True)
    theta = cand[k - 1][0] if len(cand) >= k else 0.0

    # phase B: prune blocks whose best-possible doc can't reach θ, then
    # score the survivors exactly
    gmax_other = {t: sum_all - widf[t] * gm.get(t, 0.0) for t in present}
    ub_other = F.create_map(*[x for t in present
                              for x in (F.lit(t), F.lit(gmax_other[t]))])
    ub_widf = F.create_map(*[x for t in present
                             for x in (F.lit(t), F.lit(widf[t]))])
    survivors = blocks.filter(
        F.element_at(ub_widf, F.col("term")) * F.col("_tfn_ub")
        + F.element_at(ub_other, F.col("term")) >= F.lit(theta))
    return (ix.live(agg_scores(survivors))
            .orderBy(F.col("score").desc(), F.col("docid").asc())
            .limit(k))
