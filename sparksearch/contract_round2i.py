"""Driver-contract entries, round-2i surface: the remaining metric /
pipeline aggregations — boxplot, top_metrics, t_test (Welch), rate,
normalize, string_stats (with character entropy).

Reference cites: the analytics-module registrations
BoxplotAggregationBuilder, TopMetricsAggregationBuilder,
TTestAggregationBuilder, RateAggregationBuilder,
StringStatsAggregationBuilder, and NormalizePipelineAggregationBuilder
(sv/search/SearchModule.java pipeline registry + the x-pack analytics
registrations the reference fork carries).

All run over the engine's docs table (C.get_engine) so doc lengths and
fields come from the same build the rest of the contract gates.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from sparksearch import contract as C


def _docs(spark, sf_dir):
    ix, _ = C.get_engine(spark, sf_dir)
    return ix.docs


def q_boxplot(spark, sf_dir):
    from sparksearch.aggs import boxplot_agg
    return boxplot_agg(_docs(spark, sf_dir), "dl")


def q_top_metrics(spark, sf_dir):
    from sparksearch.aggs import top_metrics_agg
    return top_metrics_agg(_docs(spark, sf_dir), "dl", ["url"], size=3)


def q_t_test(spark, sf_dir):
    from sparksearch.aggs import t_test_agg
    d = _docs(spark, sf_dir)
    return t_test_agg(d, "dl", F.col("lang") == "en")


def q_rate(spark, sf_dir):
    from sparksearch.aggs import rate_agg
    d = _docs(spark, sf_dir)
    buckets = (d.groupBy(F.floor(F.unix_timestamp("warc_ts") / 60)
                         .cast("long").alias("key"))
               .agg(F.count("*").cast("long").alias("doc_count")))
    return rate_agg(buckets, "doc_count", bucket_seconds=60.0,
                    unit_seconds=1.0)


def q_normalize(spark, sf_dir):
    from sparksearch.aggs import normalize_agg
    d = _docs(spark, sf_dir).filter(F.col("lang").isNotNull())
    buckets = (d.groupBy(F.col("lang").alias("key"))
               .agg(F.count("*").cast("long").alias("doc_count")))
    return normalize_agg(buckets, "doc_count")


def q_string_stats(spark, sf_dir):
    from sparksearch.aggs import string_stats_agg
    return string_stats_agg(_docs(spark, sf_dir), "url")


def sqls() -> dict[str, str]:
    P, TOK, DL = C._PAGES, C._TOK, C._DL

    return {
        "agg_boxplot": f"""
WITH {P}, {TOK}, {DL}
SELECT CAST(min(dl) AS DOUBLE) AS min,
       CAST(round(quantile_cont(CAST(dl AS DOUBLE), 0.25), 6) AS DOUBLE) AS q1,
       CAST(round(quantile_cont(CAST(dl AS DOUBLE), 0.5), 6) AS DOUBLE) AS q2,
       CAST(round(quantile_cont(CAST(dl AS DOUBLE), 0.75), 6) AS DOUBLE) AS q3,
       CAST(max(dl) AS DOUBLE) AS max
FROM dlq
""".strip(),
        "agg_top_metrics": f"""
WITH {P}, {TOK}, {DL}
SELECT CAST(dlq.dl AS BIGINT) AS dl, p.url
FROM dlq JOIN pages p USING (docid)
ORDER BY dlq.dl DESC, p.docid ASC LIMIT 3
""".strip(),
        "agg_t_test": f"""
WITH {P}, {TOK}, {DL},
j AS ( SELECT p.lang, CAST(dlq.dl AS DOUBLE) AS dl
       FROM dlq JOIN pages p USING (docid) ),
a AS ( SELECT avg(dl) AS m, var_samp(dl) AS s2,
              CAST(count(*) AS DOUBLE) AS n FROM j WHERE lang = 'en' ),
b AS ( SELECT avg(dl) AS m, var_samp(dl) AS s2,
              CAST(count(*) AS DOUBLE) AS n FROM j
       WHERE lang IS NOT NULL AND lang <> 'en' )
SELECT CAST(round((a.m - b.m) / sqrt(a.s2 / a.n + b.s2 / b.n), 6)
            AS DOUBLE) AS t
FROM a CROSS JOIN b
""".strip(),
        "agg_rate": f"""
WITH {P},
b AS ( SELECT CAST(floor(epoch(warc_ts) / 60) AS BIGINT) AS key,
              CAST(count(*) AS BIGINT) AS doc_count
       FROM pages GROUP BY 1 )
SELECT key, doc_count,
       CAST(round(doc_count / 60.0, 6) AS DOUBLE) AS rate
FROM b ORDER BY key
""".strip(),
        "agg_normalize": f"""
WITH {P},
b AS ( SELECT lang AS key, CAST(count(*) AS BIGINT) AS doc_count
       FROM pages WHERE lang IS NOT NULL GROUP BY lang )
SELECT key, doc_count,
       CAST(round(doc_count / sum(doc_count) OVER (), 6) AS DOUBLE)
         AS percent_of_sum,
       CAST(round((doc_count - min(doc_count) OVER ())
                  / CAST(max(doc_count) OVER () - min(doc_count) OVER ()
                         AS DOUBLE), 6) AS DOUBLE) AS rescale_0_1
FROM b ORDER BY key
""".strip(),
        "agg_string_stats": f"""
WITH {P},
lens AS ( SELECT url AS v, length(url) AS l FROM pages
          WHERE url IS NOT NULL ),
base AS ( SELECT CAST(count(*) AS BIGINT) AS count,
                 min(l) AS min_length, max(l) AS max_length,
                 CAST(round(avg(l), 6) AS DOUBLE) AS avg_length
          FROM lens ),
e AS ( SELECT CAST(round(entropy(c), 6) AS DOUBLE) AS entropy FROM (
         SELECT unnest(string_split(v, '')) AS c FROM lens ) )
SELECT base.*, e.entropy FROM base CROSS JOIN e
""".strip(),
    }


def oracle_sql() -> dict:
    return sqls()


def queries() -> dict:
    return {
        "agg_boxplot": q_boxplot,
        "agg_top_metrics": q_top_metrics,
        "agg_t_test": q_t_test,
        "agg_rate": q_rate,
        "agg_normalize": q_normalize,
        "agg_string_stats": q_string_stats,
    }
