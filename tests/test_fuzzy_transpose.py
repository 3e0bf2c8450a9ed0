"""Fuzzy matching: Damerau transpositions (reference default) and the
max_expansions df-ranked cap (FuzzyQuery.defaultMaxExpansions=50)."""

from __future__ import annotations

import random

import pytest
from pyspark.sql import functions as F

from sparksearch.exec import Executor
from sparksearch.fuzzydist import dl_distance
from sparksearch.queries import Fuzzy, Match


def test_dl_distance_matches_duckdb():
    """The engine's Lowrance-Wagner DP must agree with DuckDB's
    independently implemented damerau_levenshtein (the oracle's metric)."""
    import duckdb
    rng = random.Random(7)
    for _ in range(500):
        a = "".join(rng.choices("abcd", k=rng.randint(0, 8)))
        b = "".join(rng.choices("abcd", k=rng.randint(0, 8)))
        ref = duckdb.sql(
            f"select damerau_levenshtein('{a}','{b}')").fetchone()[0]
        assert dl_distance(a, b) == ref, (a, b)


def test_dl_unrestricted_cases():
    # unrestricted metric: a transposed pair may be edited afterwards
    assert dl_distance("ca", "abc") == 2   # OSA would give 3
    assert dl_distance("abcd", "abdc") == 1
    assert dl_distance("tbale", "table") == 1
    assert dl_distance("tbale", "tbale") == 0


def test_transposition_reaches_term(index_sf0001):
    """'tbale'~1 matches 'table' docs only under transpositions=True
    (DL=1); plain levenshtein distance is 2, so transpositions=False
    finds nothing."""
    ex = Executor(index_sf0001)
    on = ex.search(Match("text", "tbale", fuzziness=1),
                   k=10, fetch=False).collect()
    off = ex.search(Match("text", "tbale", fuzziness=1,
                          fuzzy_transpositions=False),
                    k=10, fetch=False).collect()
    want = ex.search(Match("text", "table"), k=10, fetch=False).collect()
    assert [(r["docid"], r["score"]) for r in on] \
        == [(r["docid"], r["score"]) for r in want]
    assert off == []


def test_max_expansions_caps_by_df(index_sf0001):
    """'part'~2 expands to {fast, part, sort, spark}; with
    max_expansions=1 only the highest-df expansion contributes, so the
    result equals a plain match on that term."""
    ex = Executor(index_sf0001)
    exp = {"fast", "part", "sort", "spark"}
    dfs = {r["term"]: r["df"] for r in
           index_sf0001.stats.filter(
               F.col("term").isin(list(exp))).collect()}
    assert set(dfs) == exp
    top = sorted(exp, key=lambda t: (-dfs[t], t))[0]
    capped = ex.search(Match("text", "part", fuzziness=2, max_expansions=1),
                       k=10, fetch=False).collect()
    want = ex.search(Match("text", top), k=10, fetch=False).collect()
    assert [(r["docid"], round(r["score"], 6)) for r in capped] \
        == [(r["docid"], round(r["score"], 6)) for r in want]


def test_standalone_fuzzy_transpositions(index_sf0001):
    """Constant-score `fuzzy` query follows the same default."""
    ex = Executor(index_sf0001)
    on = ex.search(Fuzzy("text", "tbale", fuzziness=1),
                   k=500, fetch=False).collect()
    off = ex.search(Fuzzy("text", "tbale", fuzziness=1,
                          transpositions=False),
                    k=500, fetch=False).collect()
    want = {r["docid"] for r in
            ex.search(Match("text", "table"), k=500, fetch=False).collect()}
    assert {r["docid"] for r in on} == want and want
    assert off == []


def test_fuzzy_max_expansions_limits_terms(index_sf0001):
    """Fuzzy cap keeps the highest-df expansions only."""
    ex = Executor(index_sf0001)
    full = {r["docid"] for r in
            ex.search(Fuzzy("text", "part", fuzziness=2),
                      k=500, fetch=False).collect()}
    capped = {r["docid"] for r in
              ex.search(Fuzzy("text", "part", fuzziness=2,
                              max_expansions=1),
                        k=500, fetch=False).collect()}
    assert capped <= full
    dfs = {r["term"]: r["df"] for r in
           index_sf0001.stats.filter(
               F.col("term").isin(
                   ["fast", "part", "sort", "spark"])).collect()}
    top = sorted(dfs, key=lambda t: (-dfs[t], t))[0]
    want = {r["docid"] for r in
            ex.search(Match("text", top), k=500, fetch=False).collect()}
    assert capped == want
