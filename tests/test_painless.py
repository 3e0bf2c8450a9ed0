"""Painless-subset compiler: expression semantics vs Python-evaluated
expectations, doc-field tracking, and the script query / script_fields /
script_score integration points."""

import math

import pytest
from pyspark.sql import functions as F

from sparksearch.painless import PainlessError, compile_script


def _eval(spark, src, params=None, row=None, score=None):
    """Evaluate one script against a single-row frame."""
    row = dict(row or {})
    if score is not None:
        row["score"] = score
    df = spark.createDataFrame([row]) if row else spark.range(1)
    out = df.select(compile_script(src, params).col.alias("v")).collect()
    return out[0]["v"]


def test_arithmetic_precedence(spark):
    assert _eval(spark, "1 + 2 * 3 - 4 / 2") == pytest.approx(5.0)
    assert _eval(spark, "(1 + 2) * 3") == 9
    assert _eval(spark, "7 % 3") == 1
    assert _eval(spark, "-2 * 3") == -6
    assert _eval(spark, "2.5e2 + 0.5") == pytest.approx(250.5)


def test_comparisons_and_boolean_logic(spark):
    assert _eval(spark, "1 < 2 && 2 <= 2") is True
    assert _eval(spark, "1 > 2 || 3 >= 4 || 5 == 5") is True
    assert _eval(spark, "1 != 1") is False
    assert _eval(spark, "!(1 == 2)") is True
    # && binds tighter than ||
    assert _eval(spark, "true || false && false") is True


def test_ternary_and_elvis(spark):
    assert _eval(spark, "1 < 2 ? 'yes' : 'no'") == "yes"
    # nested ternary is right-associative
    assert _eval(spark, "false ? 1 : true ? 2 : 3") == 2
    assert _eval(spark, "null ?: 42") == 42


def test_math_functions(spark):
    assert _eval(spark, "Math.log(Math.exp(2.0))") == pytest.approx(2.0)
    assert _eval(spark, "Math.pow(2, 10)") == pytest.approx(1024.0)
    assert _eval(spark, "Math.max(3, Math.min(7, 5))") == 5
    assert _eval(spark, "Math.round(2.5)") == 3
    assert _eval(spark, "Math.sqrt(16.0) + Math.abs(-1)") == pytest.approx(5.0)
    assert _eval(spark, "Math.log10(1000.0)") == pytest.approx(3.0)


def test_doc_values_and_params(spark):
    row = {"dl": 40, "lang": "en"}
    assert _eval(spark, "doc['dl'].value * params.f",
                 {"f": 0.5}, row) == pytest.approx(20.0)
    assert _eval(spark, "doc['lang'].value == 'en'", None, row) is True
    assert _eval(spark, "params['k'] + 1", {"k": 10}, row) == 11
    cs = compile_script("doc['dl'].value + doc['x'].value * f")
    assert cs.doc_fields == {"dl", "x", "f"}


def test_string_methods(spark):
    row = {"url": "https://site1.example/p/00000001"}
    assert _eval(spark, "doc['url'].value.length()", None, row) == 32
    assert _eval(spark, "doc['url'].value.contains('example')",
                 None, row) is True
    assert _eval(spark, "doc['url'].value.startsWith('https')",
                 None, row) is True
    assert _eval(spark, "doc['url'].value.substring(8, 13)",
                 None, row) == "site1"
    assert _eval(spark, "doc['url'].value.indexOf('site')", None, row) == 8
    assert _eval(spark, "'AbC'.toLowerCase()") == "abc"


def test_doc_accessors(spark):
    row = {"dl": 3}
    assert _eval(spark, "doc['dl'].size()", None, row) == 1
    assert _eval(spark, "doc['dl'].empty ? 1 : 0", None, row) == 0


def test_casts_and_score(spark):
    assert _eval(spark, "(int) 3.9") == 3
    assert _eval(spark, "(double) 3") == pytest.approx(3.0)
    assert _eval(spark, "_score * 2 + doc['dl'].value",
                 row={"dl": 4}, score=1.5) == pytest.approx(7.0)


def test_sigmoid_ranking_expression(spark):
    # the shape used by the script_score contract entry
    src = "_score / (1 + Math.exp(-doc['dl'].value / params.s))"
    got = _eval(spark, src, {"s": 40.0}, row={"dl": 40}, score=2.0)
    assert got == pytest.approx(2.0 / (1 + math.exp(-1.0)))


def test_compile_errors(spark):
    for bad in ["doc[dl].value", "Math.nope(1)", "1 +", "params.missing",
                "a ^^ b", "'unterminated"]:
        with pytest.raises(PainlessError):
            compile_script(bad, {"present": 1})


def test_script_query_and_fields_end_to_end(spark, index_sf0001):
    """Script filter + script_fields over the built test index."""
    from sparksearch.exec import Executor
    from sparksearch.fetchops import script_fields
    from sparksearch.queries import Bool, Match, Script

    ix, ex = index_sf0001, Executor(index_sf0001)
    q = Bool(must=[Match("text", "join")],
             filter=[Script("doc['lang'].value == 'en' && "
                            "doc['dl'].value > params.min", {"min": 20})])
    hits = ex.search(q, k=10, fetch=False)
    langs = (hits.join(ix.docs, "docid").select("lang", "dl").collect())
    assert langs and all(r["lang"] == "en" and r["dl"] > 20 for r in langs)

    out = script_fields(
        ix, hits,
        {"dl_sq": "doc['dl'].value * doc['dl'].value",
         "band": "doc['dl'].value > 40 ? 'long' : 'short'"})
    rows = out.join(ix.docs.select("docid", "dl"), "docid").collect()
    assert rows
    for r in rows:
        assert r["dl_sq"] == r["dl"] * r["dl"]
        assert r["band"] == ("long" if r["dl"] > 40 else "short")


def test_script_score_replace_mode(spark, index_sf0001):
    from sparksearch.exec import Executor
    from sparksearch.queries import FunctionScore, Match, ScriptScore

    ex = Executor(index_sf0001)
    base = ex._plan(Match("text", "join"), scored=True)
    q = FunctionScore(query=Match("text", "join"),
                      functions=[ScriptScore(
                          "_score + Math.sqrt(doc['dl'].value)")],
                      boost_mode="replace")
    got = ex.search(q, k=5, fetch=False)
    joined = (base.withColumnRenamed("score", "b")
              .join(got, "docid")
              .join(ex.ix.docs.select("docid", "dl"), "docid").collect())
    assert joined
    for r in joined:
        assert r["score"] == pytest.approx(r["b"] + math.sqrt(r["dl"]))


def test_dsl_script_types(spark):
    from sparksearch.dsl import from_dsl
    from sparksearch.queries import (Bool, FunctionScore, Script,
                                     ScriptScore)

    q = from_dsl({"bool": {"filter": [
        {"script": {"script": {"source": "doc['dl'].value > 10"}}}]}})
    assert isinstance(q, Bool) and isinstance(q.filter[0], Script)

    q2 = from_dsl({"script_score": {
        "query": {"match": {"text": "join"}},
        "script": {"source": "_score * 2"}}})
    assert isinstance(q2, FunctionScore) and q2.boost_mode == "replace"
    assert isinstance(q2.functions[0], ScriptScore)

    q3 = from_dsl({"function_score": {
        "query": {"match": {"text": "join"}},
        "functions": [
            {"weight": 1.5},
            {"field_value_factor": {"field": "dl", "factor": 0.1,
                                    "modifier": "ln1p"}},
            {"script_score": {"script": {"source": "_score"}}},
            {"gauss": {"warc_ts": {"origin": "2025-01-01 00:04:00",
                                   "scale": 120.0, "decay": 0.5}}}],
        "score_mode": "sum", "boost_mode": "multiply"}})
    assert isinstance(q3, FunctionScore) and len(q3.functions) == 4
    assert q3.score_mode == "sum"


def test_dsl_span_gap(spark):
    from sparksearch.dsl import from_dsl
    from sparksearch.queries import SpanGap, SpanNear

    q = from_dsl({"span_near": {"clauses": [
        {"span_term": {"text": "hash"}},
        {"span_gap": {"text": 1}},
        {"span_term": {"text": "table"}}], "slop": 0, "in_order": True}})
    assert isinstance(q, SpanNear)
    assert q.clauses[1] == SpanGap("text", 1)


# ---------------------------------------------------------------------------
# lang-expression (modules/lang-expression)
# ---------------------------------------------------------------------------

def test_expression_lowering_names():
    from sparksearch.painless import expression_to_painless
    assert (expression_to_painless("ln(doc['dl'].value) + sqrt(2)")
            == "Math.log(doc['dl'].value) + Math.sqrt(2)")
    # ln inside an identifier must NOT rewrite
    assert expression_to_painless("lnx + 1") == "lnx + 1"


def test_expression_haversin_rejected():
    import pytest

    from sparksearch.painless import PainlessError, expression_to_painless
    with pytest.raises(PainlessError, match="haversin"):
        expression_to_painless("haversin(1, 2, 3, 4)")


def test_expression_compiles_and_evaluates(spark):
    from sparksearch.painless import compile_expression
    c = compile_expression("min(abs(-3.0), pow(x, 2)) + ln(1)")
    df = spark.createDataFrame([(1.5,)], "x double")
    assert df.select(c.col.alias("v")).first()["v"] == 2.25
    assert c.doc_fields == frozenset({"x"})


def test_expression_lang_via_dsl(spark):
    from sparksearch.dsl import from_dsl
    from sparksearch.queries import FunctionScore
    q = from_dsl({"script_score": {
        "query": {"match_all": {}},
        "script": {"lang": "expression", "source": "ln(doc['dl'].value)"}}})
    assert isinstance(q, FunctionScore)
    assert "Math.log" in q.functions[0].source


def test_unknown_script_lang_rejected():
    import pytest

    from sparksearch.dsl import from_dsl
    with pytest.raises(ValueError, match="lang"):
        from_dsl({"script_score": {
            "query": {"match_all": {}},
            "script": {"lang": "mustache", "source": "1"}}})
