"""mov_avg model registry vs the reference recursions.

Pins aggs.moving_avg_model (Catalyst HOF folds) against plain-Python
transcriptions of MovingFunctions.java:126-380 (linearWeightedAvg / ewma /
holtForecast / holtWintersForecast) under MovAvgPipelineAggregator.reduce
window semantics (trailing window EXCLUDING the current bucket,
hasValue >= 1 or >= 2*period).
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from sparksearch.aggs import moving_avg_model

SERIES = [3.0, 7.0, 4.0, 9.0, 11.0, 6.0, 13.0, 8.0, 15.0, 10.0, 17.0, 12.0]


def _ewma(vals, a):
    avg = None
    for v in vals:
        avg = v if avg is None else v * a + avg * (1 - a)
    return avg


def _linear(vals):
    avg, tw, cur = 0.0, 1, 1
    for v in vals:
        avg += v * cur
        tw += cur
        cur += 1
    return None if tw == 1 else avg / tw


def _holt(vals, a, be):
    s = b = last_s = last_b = 0.0
    c = 0
    for v in vals:
        if c == 0:
            s, b = v, 0.0
        else:
            s = a * v + (1 - a) * (last_s + last_b)
            b = be * (s - last_s) + (1 - be) * last_b
        c += 1
        last_s, last_b = s, b
    return None if c == 0 else s


def _hw(vals, a, be, g, p, mult):
    if len(vals) < 2 * p:
        return None
    pad = 1e-10 if mult else 0.0
    vs = [v + pad for v in vals]
    s = b = 0.0
    for i in range(p):
        s += vs[i]
        b += (vs[i + p] - vs[i]) / p
    s /= p
    b /= p
    last_s, last_b = s, b
    seas = [0.0] * len(vs)
    if s != 0.0:
        for i in range(p):
            seas[i] = vs[i] / s
    for i in range(p, len(vs)):
        if mult:
            s = a * (vs[i] / seas[i - p]) + (1 - a) * (last_s + last_b)
        else:
            s = a * (vs[i] - seas[i - p]) + (1 - a) * (last_s + last_b)
        b = be * (s - last_s) + (1 - be) * last_b
        if mult:
            seas[i] = g * (vs[i] / (last_s + last_b)) + (1 - g) * seas[i - p]
        else:
            # the reference's additive seasonal uses (last_s - last_b)
            seas[i] = g * (vs[i] - (last_s - last_b)) + (1 - g) * seas[i - p]
        last_s, last_b = s, b
    idx = len(vals) - p
    return (s + b) * seas[idx] if mult else s + b + seas[idx]


def _expected(model, window, **kw):
    out = []
    for i in range(len(SERIES)):
        w = SERIES[max(0, i - window):i]
        if not w:
            out.append(None)
            continue
        if model == "simple":
            r = sum(w) / len(w)
        elif model == "linear":
            r = _linear(w)
        elif model == "ewma":
            r = _ewma(w, kw["alpha"])
        elif model == "holt":
            r = _holt(w, kw["alpha"], kw["beta"])
        else:
            r = _hw(w, kw["alpha"], kw["beta"], kw["gamma"], kw["period"],
                    kw.get("multiplicative", False))
        out.append(r)
    return out


CASES = [
    ("simple", dict(window=4)),
    ("linear", dict(window=4)),
    ("ewma", dict(window=4, alpha=0.3)),
    ("ewma", dict(window=6, alpha=0.7)),
    ("holt", dict(window=5, alpha=0.3, beta=0.1)),
    ("holt", dict(window=7, alpha=0.5, beta=0.5)),
    ("holt_winters", dict(window=6, alpha=0.3, beta=0.1, gamma=0.3,
                          period=2)),
    ("holt_winters", dict(window=8, alpha=0.4, beta=0.2, gamma=0.3,
                          period=2, multiplicative=True)),
    ("holt_winters", dict(window=9, alpha=0.3, beta=0.1, gamma=0.2,
                          period=3)),
]


@pytest.mark.parametrize("model,kw", CASES)
def test_moving_avg_model_matches_reference(spark, model, kw):
    df = spark.createDataFrame(
        [(i, v) for i, v in enumerate(SERIES)], "key int, doc_count double")
    got = {r["key"]: r["moving_avg"]
           for r in moving_avg_model(df, model=model, **kw).collect()}
    want = _expected(model, **kw)
    for i, exp in enumerate(want):
        if exp is None:
            assert got[i] is None, (model, kw, i, got[i])
        else:
            assert got[i] == pytest.approx(exp, abs=1e-6), (model, kw, i)


def test_moving_avg_model_skips_null_buckets(spark):
    # gap_policy skip: null metric values are absent from the window
    rows = [(0, 3.0), (1, None), (2, 4.0), (3, 9.0), (4, None), (5, 6.0)]
    df = spark.createDataFrame(rows, "key int, doc_count double")
    got = {r["key"]: r["moving_avg"]
           for r in moving_avg_model(df, model="ewma", window=10,
                                     alpha=0.5).collect()}
    assert got[0] is None
    assert got[2] == pytest.approx(3.0)          # window [3]
    assert got[3] == pytest.approx(3.5)          # [3,4]
    assert got[5] == pytest.approx(6.25)         # [3,4,9]


def test_moving_avg_model_unknown_raises(spark):
    df = spark.createDataFrame([(0, 1.0)], "key int, doc_count double")
    with pytest.raises(ValueError):
        moving_avg_model(df, model="kalman").collect()
