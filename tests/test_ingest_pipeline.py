"""Declarative ingest pipelines (modules/ingest-common processor
registry compiled to Catalyst; _ingest/pipeline CRUD + _simulate)."""
import pytest
from pyspark.sql import functions as F

from sparksearch import ingest as I


def _docs(spark, rows, schema):
    return spark.createDataFrame(rows, schema)


def _one(spark, pipeline, rows, schema):
    return [r.asDict(recursive=True) for r in
            I.run_pipeline(_docs(spark, rows, schema), pipeline).collect()]


# ---------------------------------------------------------------------------
# field manipulation
# ---------------------------------------------------------------------------

def test_set_remove_rename_append(spark):
    p = {"processors": [
        {"set": {"field": "env", "value": "prod"}},
        {"set": {"field": "msg", "value": "x", "override": False}},
        {"rename": {"field": "old", "target_field": "new"}},
        {"append": {"field": "tags", "value": ["b", "a"]}},
        {"remove": {"field": "junk"}},
    ]}
    out = _one(spark, p, [("hello", "v", "j", ["z"])],
               "msg string, old string, junk string, tags array<string>")
    assert out == [{"msg": "hello", "new": "v", "tags": ["z", "b", "a"],
                    "env": "prod"}]


def test_set_copy_from_and_override(spark):
    p = {"processors": [
        {"set": {"field": "b", "copy_from": "a"}},
        {"set": {"field": "c", "value": "filled", "override": False}},
    ]}
    out = _one(spark, p, [("x", None)], "a string, c string")
    assert out == [{"a": "x", "b": "x", "c": "filled"}]


def test_rename_target_exists_raises(spark):
    p = {"processors": [{"rename": {"field": "a", "target_field": "b"}}]}
    with pytest.raises(I.IngestError, match="already exists"):
        I.run_pipeline(_docs(spark, [("x", "y")], "a string, b string"), p)


def test_remove_missing(spark):
    p = {"processors": [{"remove": {"field": "nope"}}]}
    with pytest.raises(I.IngestError, match="not present"):
        I.run_pipeline(_docs(spark, [("x",)], "a string"), p)
    p2 = {"processors": [{"remove": {"field": "nope",
                                     "ignore_missing": True}}]}
    assert _one(spark, p2, [("x",)], "a string") == [{"a": "x"}]


def test_append_no_duplicates_and_scalar_promote(spark):
    p = {"processors": [
        {"append": {"field": "t", "value": ["a", "c"],
                    "allow_duplicates": False}}]}
    out = _one(spark, p, [(["a", "b"],)], "t array<string>")
    assert out == [{"t": ["a", "b", "c"]}]
    p2 = {"processors": [{"append": {"field": "s", "value": "y"}}]}
    out2 = _one(spark, p2, [("x",)], "s string")
    assert out2 == [{"s": ["x", "y"]}]


# ---------------------------------------------------------------------------
# value parsing / conversion
# ---------------------------------------------------------------------------

def test_bytes_convert(spark):
    p = {"processors": [
        {"bytes": {"field": "sz", "target_field": "sz_b"}},
        {"convert": {"field": "n", "type": "integer"}},
        {"convert": {"field": "flag", "type": "boolean"}},
    ]}
    out = _one(spark, p, [("1.5kb", "42", "TRUE")],
               "sz string, n string, flag string")
    assert out == [{"sz": "1.5kb", "sz_b": 1536, "n": 42, "flag": True}]


def test_bytes_failure_raises_unless_ignored(spark):
    p = {"processors": [{"bytes": {"field": "sz"}}]}
    with pytest.raises(Exception, match="failed to parse"):
        I.run_pipeline(_docs(spark, [("12 parsecs",)], "sz string"),
                       p).collect()
    p2 = {"processors": [{"bytes": {"field": "sz",
                                    "ignore_failure": True}}]}
    assert _one(spark, p2, [("12 parsecs",)],
                "sz string") == [{"sz": None}]


def test_convert_failure_raises_unless_ignored(spark):
    p = {"processors": [{"convert": {"field": "n", "type": "long"}}]}
    with pytest.raises(Exception, match="cannot convert"):
        I.run_pipeline(_docs(spark, [("abc",)], "n string"), p).collect()
    p2 = {"processors": [{"convert": {"field": "n", "type": "long",
                                      "ignore_failure": True}}]}
    assert _one(spark, p2, [("abc",)], "n string") == [{"n": None}]


def test_csv_date(spark):
    p = {"processors": [
        {"csv": {"field": "line", "target_fields": ["k", "v"],
                 "trim": True}},
        {"date": {"field": "when", "formats": ["yyyy/MM/dd HH:mm:ss"],
                  "target_field": "ts"}},
    ]}
    out = _one(spark, p, [('a,"x,y"', "2025/03/04 05:06:07")],
               "line string, when string")
    assert out[0]["k"] == "a" and out[0]["v"] == "x,y"
    assert str(out[0]["ts"]) == "2025-03-04 05:06:07"


def test_date_multi_format_and_unix(spark):
    p = {"processors": [{"date": {
        "field": "w", "formats": ["yyyy/MM/dd", "UNIX"],
        "target_field": "ts"}}]}
    out = _one(spark, p, [("2025/01/02",), ("1735776000",)], "w string")
    assert str(out[0]["ts"]).startswith("2025-01-02")
    assert out[1]["ts"] is not None


def test_date_unparseable_raises(spark):
    p = {"processors": [{"date": {"field": "w",
                                  "formats": ["yyyy/MM/dd"]}}]}
    with pytest.raises(Exception, match="unable to parse"):
        I.run_pipeline(_docs(spark, [("nope",)], "w string"), p).collect()


def test_date_index_name_expression(spark):
    p = {"processors": [{"date_index_name": {
        "field": "ts", "index_name_prefix": "web-",
        "date_rounding": "d"}}]}
    out = _one(spark, p, [("2025-03-04 10:00:00",)], "ts string")
    assert out[0]["_index"] == \
        "<web-{2025-03-04||/d{yyyy-MM-dd|UTC}}>"


# ---------------------------------------------------------------------------
# structured extraction
# ---------------------------------------------------------------------------

def test_grok_named_and_multi_pattern(spark):
    p = {"processors": [{"grok": {
        "field": "msg",
        "patterns": ["%{WORD:verb} %{NUMBER:code:int} %{GREEDYDATA:rest}",
                     "%{WORD:verb} %{GREEDYDATA:rest}"]}}]}
    out = _one(spark, p, [("GET 200 /index.html",), ("PING hello world",)],
               "msg string")
    assert out[0]["verb"] == "GET" and out[0]["code"] == 200 \
        and out[0]["rest"] == "/index.html"
    assert out[1]["verb"] == "PING" and out[1]["rest"] == "hello world"


def test_grok_pattern_definitions(spark):
    p = {"processors": [{"grok": {
        "field": "m", "patterns": ["%{KV:pair}"],
        "pattern_definitions": {"KV": r"\w+=\w+"}}}]}
    out = _one(spark, p, [("k=v",)], "m string")
    assert out[0]["pair"] == "k=v"


def test_grok_unknown_pattern_raises(spark):
    with pytest.raises(I.IngestError, match="unknown pattern"):
        I.compile_pipeline({"processors": [{"grok": {
            "field": "m", "patterns": ["%{NOPE:x}"]}}]})


def test_dissect(spark):
    p = {"processors": [{"dissect": {
        "field": "log",
        "pattern": "%{type} user=%{uid} %{?skip} k=%{k}"}}]}
    out = _one(spark, p, [("click user=42 zz k=a b c",)], "log string")
    assert out[0]["type"] == "click" and out[0]["uid"] == "42" \
        and out[0]["k"] == "a b c"


def test_dissect_modifier_unsupported(spark):
    with pytest.raises(I.IngestError, match="modifier"):
        I.compile_pipeline({"processors": [{"dissect": {
            "field": "l", "pattern": "%{+x} %{y}"}}]})


def test_kv_json_split_join_sort(spark):
    p = {"processors": [
        {"kv": {"field": "q", "field_split": "&", "value_split": "=",
                "target_field": "params"}},
        {"json": {"field": "blob", "target_field": "obj"}},
        {"split": {"field": "csvish", "separator": ","}},
        {"sort": {"field": "csvish", "order": "desc"}},
        {"join": {"field": "csvish", "separator": "|",
                  "target_field": "joined"}},
    ]}
    out = _one(spark, p, [("a=1&b=2", '{"k": 7}', "b,a,c")],
               "q string, blob string, csvish string")
    assert out[0]["params"] == {"a": "1", "b": "2"}
    assert out[0]["obj"] == {"k": "7"}
    assert out[0]["csvish"] == ["c", "b", "a"]
    assert out[0]["joined"] == "c|b|a"


def test_case_trim_urldecode_gsub(spark):
    p = {"processors": [
        {"lowercase": {"field": "a"}},
        {"uppercase": {"field": "b"}},
        {"trim": {"field": "c"}},
        {"urldecode": {"field": "d"}},
        {"gsub": {"field": "e", "pattern": "[0-9]+", "replacement": "N"}},
    ]}
    out = _one(spark, p, [("Ab", "cd", " x ", "a%20b", "v12w34")],
               "a string, b string, c string, d string, e string")
    assert out == [{"a": "ab", "b": "CD", "c": "x", "d": "a b",
                    "e": "vNwN"}]


def test_dot_expander(spark):
    p = {"processors": [{"dot_expander": {"field": "a.b"}}]}
    out = _one(spark, p, [("x",)], "`a.b` string")
    assert out == [{"a": {"b": "x"}}]


def test_foreach(spark):
    p = {"processors": [{"foreach": {
        "field": "vals", "processor": {"uppercase": {}}}}]}
    out = _one(spark, p, [(["a", "b"],)], "vals array<string>")
    assert out == [{"vals": ["A", "B"]}]
    with pytest.raises(I.IngestError, match="element-level"):
        I.compile_pipeline({"processors": [{"foreach": {
            "field": "v", "processor": {"rename": {"field": "x",
                                                   "target_field": "y"}}}}]})


def test_html_strip(spark):
    p = {"processors": [{"html_strip": {"field": "h"}}]}
    out = _one(spark, p, [("<p>hello <b>world</b></p>",)], "h string")
    assert "hello" in out[0]["h"] and "<" not in out[0]["h"]


# ---------------------------------------------------------------------------
# script / fail / if conditions
# ---------------------------------------------------------------------------

def test_script_assignments(spark):
    p = {"processors": [{"script": {
        "source": "ctx.total = ctx.a + ctx.b; ctx.big = ctx.a > 10"}}]}
    out = _one(spark, p, [(3, 4)], "a int, b int")
    assert out == [{"a": 3, "b": 4, "total": 7, "big": False}]


def test_script_non_assignment_raises(spark):
    with pytest.raises(I.IngestError, match="assignment"):
        I.compile_pipeline({"processors": [{"script": {
            "source": "ctx.a == 1"}}]})


def test_fail_unconditional(spark):
    p = {"processors": [{"fail": {"message": "boom"}}]}
    with pytest.raises(Exception, match="boom"):
        I.run_pipeline(_docs(spark, [("x",)], "a string"), p).collect()


def test_fail_and_set_with_if(spark):
    p = {"processors": [
        {"fail": {"message": "neg", "if": "ctx.n < 0"}},
        {"set": {"field": "kind", "value": "big", "if": "ctx.n > 10"}},
    ]}
    out = _one(spark, p, [(5,), (20,)], "n int")
    assert [r["kind"] for r in out] == [None, "big"]
    with pytest.raises(Exception, match="neg"):
        I.run_pipeline(_docs(spark, [(-1,)], "n int"), p).collect()


def test_if_on_structural_raises(spark):
    with pytest.raises(I.IngestError, match="not supported"):
        I.run_pipeline(_docs(spark, [("x",)], "a string"),
                       {"processors": [{"remove": {
                           "field": "a", "if": "ctx.a == 'x'"}}]})


# ---------------------------------------------------------------------------
# CRUD + simulate + stored sub-pipeline
# ---------------------------------------------------------------------------

def test_put_get_simulate_and_pipeline_processor(spark, tmp_path):
    reg = str(tmp_path / "pipelines.json")
    I.put_pipeline(reg, "clean", {"processors": [
        {"lowercase": {"field": "t"}}]})
    I.put_pipeline(reg, "main", {"processors": [
        {"pipeline": {"name": "clean"}},
        {"set": {"field": "tag", "value": "done"}}]})
    docs = I.simulate_pipeline(spark, I.get_pipeline(reg, "main"),
                               [{"t": "ABC"}], registry=reg)
    assert docs == [{"t": "abc", "tag": "done"}]
    I.delete_pipeline(reg, "clean")
    with pytest.raises(KeyError):
        I.get_pipeline(reg, "clean")


def test_put_validates_body(tmp_path):
    reg = str(tmp_path / "p.json")
    with pytest.raises(I.IngestError, match="unknown processor"):
        I.put_pipeline(reg, "bad", {"processors": [{"zap": {}}]})
    with pytest.raises(I.IngestError, match="on_failure"):
        I.put_pipeline(reg, "bad2", {"processors": [
            {"set": {"field": "a", "value": 1,
                     "on_failure": [{"set": {"field": "e",
                                             "value": 1}}]}}]})


# ---------------------------------------------------------------------------
# plugin-module processors: user_agent / geoip
# ---------------------------------------------------------------------------

def test_user_agent(spark):
    p = {"processors": [{"user_agent": {"field": "ua"}}]}
    rows = [
        ("Mozilla/5.0 (Windows NT 10.0; Win64) AppleWebKit/537.36 "
         "(KHTML, like Gecko) Chrome/120.0.0.0 Safari/537.36",),
        ("Mozilla/5.0 (X11; Linux x86_64; rv:109.0) Gecko/20100101 "
         "Firefox/115.0",),
        ("curl/8.0.1",),
    ]
    out = _one(spark, p, rows, "ua string")
    assert out[0]["user_agent"]["name"] == "Chrome"
    assert out[0]["user_agent"]["major"] == "120"
    assert out[0]["user_agent"]["os"] == "Windows NT 10.0; Win64"
    assert out[1]["user_agent"]["name"] == "Firefox"
    assert out[1]["user_agent"]["major"] == "115"
    assert out[2]["user_agent"]["name"] == "Other"
    assert out[2]["user_agent"]["major"] is None


def test_geoip(spark):
    p = {"processors": [{"geoip": {
        "field": "ip",
        "database": [
            {"cidr": "10.0.0.0/8", "country": "A", "city": "alpha"},
            {"cidr": "192.168.1.0/24", "country": "B", "city": "beta"},
        ]}}]}
    out = _one(spark, p, [("10.1.2.3",), ("192.168.1.77",)], "ip string")
    assert out[0]["geoip"] == {"country": "A", "city": "alpha"}
    assert out[1]["geoip"] == {"country": "B", "city": "beta"}


def test_geoip_requires_database(spark):
    with pytest.raises(I.IngestError, match="database"):
        I.compile_pipeline({"processors": [{"geoip": {"field": "ip"}}]})


# ---------------------------------------------------------------------------
# scale shape: compiled pipelines are pure Catalyst
# ---------------------------------------------------------------------------

def test_compiled_pipeline_is_jvm_only(spark):
    """Every processor except html_strip compiles to JVM expressions —
    the physical plan of a representative pipeline must contain no
    Python evaluation node (BatchEvalPython / ArrowEvalPython), so the
    whole ingest chain stays inside whole-stage codegen at 100 TB."""
    p = {"processors": [
        {"grok": {"field": "m",
                  "patterns": ["%{WORD:w} %{NUMBER:n:long}"]}},
        {"bytes": {"field": "sz", "ignore_failure": True}},
        {"convert": {"field": "n", "type": "long",
                     "ignore_failure": True}},
        {"kv": {"field": "q", "field_split": "&", "value_split": "="}},
        {"set": {"field": "tag", "value": "t", "if": "ctx.n > 1"}},
        {"gsub": {"field": "m", "pattern": "x", "replacement": "y"}},
        {"script": {"source": "ctx.d = ctx.n * 2"}},
    ]}
    df = spark.createDataFrame([("a 1", "1kb", "k=v")],
                               "m string, sz string, q string")
    out = I.run_pipeline(df, p)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "EvalPython" not in plan, plan
    assert out.count() == 1


def test_html_strip_is_the_only_python_kernel(spark):
    p = {"processors": [{"html_strip": {"field": "h"}}]}
    df = spark.createDataFrame([("<p>x</p>",)], "h string")
    plan = I.run_pipeline(df, p)._jdf.queryExecution() \
        .executedPlan().toString()
    assert "EvalPython" in plan  # the documented exception


def test_grok_unanchored_substring_match(spark):
    # Grok.captures uses find(): the pattern may match mid-string
    p = {"processors": [{"grok": {
        "field": "m", "patterns": ["code=%{INT:code:int}"]}}]}
    out = _one(spark, p, [("prefix code=7 suffix",)], "m string")
    assert out[0]["code"] == 7


def test_dissect_requires_whole_value(spark):
    p = {"processors": [{"dissect": {
        "field": "l", "pattern": "%{a}=%{b}"}}]}
    # trailing garbage past the last key is consumed by the greedy final
    # key, but a NON-matching head yields empty captures, not a partial
    # mid-string parse
    out = _one(spark, p, [("k=v",)], "l string")
    assert out[0]["a"] == "k" and out[0]["b"] == "v"


def test_split_keeps_interior_drops_trailing_empties(spark):
    p = {"processors": [{"split": {"field": "s", "separator": ","}}]}
    out = _one(spark, p, [("a,,b,,",)], "s string")
    assert out[0]["s"] == ["a", "", "b"]
    p2 = {"processors": [{"split": {"field": "s", "separator": ",",
                                    "preserve_trailing": True}}]}
    out2 = _one(spark, p2, [("a,,b,,",)], "s string")
    assert out2[0]["s"] == ["a", "", "b", "", ""]
