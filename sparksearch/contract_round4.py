"""Driver-contract entries for round 4: the reference mov_avg model
registry (linear / ewma / holt / holt_winters — EwmaModel.java:52,
HoltLinearModel.java, HoltWintersModel.java:56, registered at
sv/search/SearchModule.java:1071), closing the last `partial` row in
SURVEY.md §2.4.

Spark side: `aggs.moving_avg_model` — Catalyst `aggregate` HOF folds over
the trailing `collect_list` window (no UDF). Oracle side: the identical
recursion unrolled with DuckDB `list_reduce` over the same window list,
all arithmetic in DOUBLE so the IEEE754 op sequence matches bit-for-bit
before the shared round(…, 6).
"""

from __future__ import annotations

from sparksearch import contract as C
from sparksearch.queries import Match

_M_JOIN = "m AS ( SELECT DISTINCT docid FROM tok WHERE term = 'join' )"

_BUCKETS = """
buckets AS (
  SELECT date_trunc('minute', p.warc_ts) AS key,
         CAST(count(*) AS BIGINT) AS doc_count
  FROM pages p JOIN m USING (docid) GROUP BY 1 )
""".strip()


def _ex(spark, sf_dir):
    return C.get_engine(spark, sf_dir)[1]


def _buckets(spark, sf_dir):
    from sparksearch.aggs import date_histogram, matched_docs
    return date_histogram(matched_docs(_ex(spark, sf_dir),
                                       Match("text", "join")),
                          "warc_ts", "minute")


def _q_mov(model, window, **kw):
    def run(spark, sf_dir):
        from sparksearch.aggs import moving_avg_model
        return moving_avg_model(_buckets(spark, sf_dir), model=model,
                                window=window, **kw)
    return run


# ---------------------------------------------------------------------------
# DuckDB mirrors of MovingFunctions.java — same fold, same quirks
# ---------------------------------------------------------------------------

def _duck_model_expr(model: str, alpha: float, beta: float, gamma: float,
                     period: int, multiplicative: bool) -> str:
    """DuckDB expression over a DOUBLE[] column `vals` (trailing window,
    oldest first) mirroring aggs._mov_model_expr exactly."""
    a, b, g, p = (f"CAST({float(alpha)!r} AS DOUBLE)",
                  f"CAST({float(beta)!r} AS DOUBLE)",
                  f"CAST({float(gamma)!r} AS DOUBLE)", int(period))
    if model == "linear":
        # weights 1..n, totalWeight = 1 + sum(1..n); list_reduce's 3-arg
        # lambda passes i = fold-step index (element k has i = k-1)
        fold = ("list_reduce(list_transform(vals, v -> "
                "{'sm': v, 'tw': CAST(2 AS DOUBLE)}), (acc, x, i) -> "
                "{'sm': acc.sm + x.sm * (i + 1), 'tw': acc.tw + (i + 1)})")
        return (f"CASE WHEN len(vals) > 0 THEN "
                f"({fold}).sm / ({fold}).tw END")
    if model == "ewma":
        return (f"CASE WHEN len(vals) > 0 THEN "
                f"list_reduce(vals, (acc, x) -> "
                f"x * {a} + acc * (CAST(1 AS DOUBLE) - {a})) END")
    # NOTE: struct-literal lambdas are avoided below — DuckDB 1.0's
    # list_reduce updates struct accumulator fields sequentially in place,
    # so a later field sees the already-updated earlier field.  List
    # accumulators are constructed atomically, so state is encoded as
    # DOUBLE[] instead: holt acc = [s, b]; holt_winters acc =
    # [s, b, seasonal...].
    if model == "holt":
        sn = f"({a} * x[1] + (CAST(1 AS DOUBLE) - {a}) * (acc[1] + acc[2]))"
        fold = (f"list_reduce(list_transform(vals,"
                f" v -> [v, CAST(0 AS DOUBLE)]),"
                f" (acc, x) -> [{sn}, {b} * ({sn} - acc[1])"
                f" + (CAST(1 AS DOUBLE) - {b}) * acc[2]])")
        return f"CASE WHEN len(vals) > 0 THEN ({fold})[1] END"
    if model == "holt_winters":
        pad = (" + CAST(0.0000000001 AS DOUBLE)" if multiplicative
               else "")
        vs = f"list_transform(vals, v -> v{pad})"
        s0 = (f"(list_aggregate(({vs})[1:{p}], 'sum')"
              f" / CAST({p} AS DOUBLE))")
        b0 = (f"(list_aggregate(list_transform("
              f"list_zip(({vs})[{p} + 1:2 * {p}], ({vs})[1:{p}]),"
              f" z -> (z[1] - z[2]) / CAST({p} AS DOUBLE)), 'sum')"
              f" / CAST({p} AS DOUBLE))")
        seas0 = (f"CASE WHEN {s0} = CAST(0 AS DOUBLE) THEN"
                 f" list_transform(({vs})[1:{p}], v -> CAST(0 AS DOUBLE))"
                 f" ELSE list_transform(({vs})[1:{p}], v -> v / {s0}) END")
        sp = f"acc[len(acc) - {p} + 1]"
        one = "CAST(1 AS DOUBLE)"
        if multiplicative:
            sn = f"({a} * (x[1] / {sp}) + ({one} - {a}) * (acc[1] + acc[2]))"
            se = f"({g} * (x[1] / (acc[1] + acc[2])) + ({one} - {g}) * {sp})"
        else:
            sn = f"({a} * (x[1] - {sp}) + ({one} - {a}) * (acc[1] + acc[2]))"
            se = f"({g} * (x[1] - (acc[1] - acc[2])) + ({one} - {g}) * {sp})"
        fold = (f"list_reduce(list_prepend("
                f"[{s0}, {b0}] || {seas0},"
                f" list_transform(({vs})[{p} + 1:], v -> [v])),"
                f" (acc, x) -> [{sn},"
                f" {b} * ({sn} - acc[1]) + ({one} - {b}) * acc[2]]"
                f" || acc[3:] || [{se}])")
        if multiplicative:
            fin = (f"(({fold})[1] + ({fold})[2])"
                   f" * ({fold})[len({fold}) - {p} + 1]")
        else:
            fin = (f"({fold})[1] + ({fold})[2]"
                   f" + ({fold})[len({fold}) - {p} + 1]")
        return f"CASE WHEN len(vals) >= 2 * {p} THEN {fin} END"
    raise ValueError(model)


def _mov_sql(model, window, alpha=0.3, beta=0.1, gamma=0.3, period=1,
             multiplicative=False):
    expr = _duck_model_expr(model, alpha, beta, gamma, period,
                            multiplicative)
    return f"""
WITH {C._PAGES}, {C._TOK},
{_M_JOIN},
{_BUCKETS},
wv AS (
  SELECT key, doc_count,
         list(CAST(doc_count AS DOUBLE)) OVER (ORDER BY key
           ROWS BETWEEN {window} PRECEDING AND 1 PRECEDING) AS vals
  FROM buckets )
SELECT key, doc_count,
       CAST(round({expr}, 6) AS DOUBLE) AS moving_avg
FROM wv ORDER BY key
""".strip()


def queries():
    return {
        "agg_mov_avg_linear": _q_mov("linear", 4),
        "agg_mov_avg_ewma": _q_mov("ewma", 4, alpha=0.3),
        "agg_mov_avg_holt": _q_mov("holt", 5, alpha=0.3, beta=0.1),
        "agg_mov_avg_holt_winters": _q_mov(
            "holt_winters", 6, alpha=0.3, beta=0.1, gamma=0.3, period=2),
        "agg_mov_avg_hw_mult": _q_mov(
            "holt_winters", 8, alpha=0.4, beta=0.2, gamma=0.3, period=2,
            multiplicative=True),
    }


def oracle_sql():
    return {
        "agg_mov_avg_linear": _mov_sql("linear", 4),
        "agg_mov_avg_ewma": _mov_sql("ewma", 4, alpha=0.3),
        "agg_mov_avg_holt": _mov_sql("holt", 5, alpha=0.3, beta=0.1),
        "agg_mov_avg_holt_winters": _mov_sql(
            "holt_winters", 6, alpha=0.3, beta=0.1, gamma=0.3, period=2),
        "agg_mov_avg_hw_mult": _mov_sql(
            "holt_winters", 8, alpha=0.4, beta=0.2, gamma=0.3, period=2,
            multiplicative=True),
    }
