"""Dynamic mapping inference (dynmapping.py) vs DocumentParser rules.

String-typing goldens follow createBuilderFromDynamicValue
(sv/index/mapper/DocumentParser.java:695-810) with the RootObjectMapper
defaults (date_detection on, numeric_detection off, dynamic date
formats strict_date_optional_time + yyyy/MM/dd[ HH:mm:ss]).
"""

import json

import pytest

from sparksearch.dynmapping import (dynamic_type_of_string,
                                    infer_dynamic_mapping)


def test_string_typing_defaults():
    # numbers are refused by date detection and numeric_detection is off
    assert dynamic_type_of_string("123") == "text"
    assert dynamic_type_of_string("12.5") == "text"
    assert dynamic_type_of_string("2024") == "text"          # bare yyyy
    # ISO forms
    assert dynamic_type_of_string("2024-01") == "date"
    assert dynamic_type_of_string("2024-01-15") == "date"
    assert dynamic_type_of_string("2024-01-15T10:30:00Z") == "date"
    assert dynamic_type_of_string("2024-01-15T10:30:00.123+02:00") == "date"
    # the second default ladder
    assert dynamic_type_of_string("2024/01/15") == "date"
    assert dynamic_type_of_string("2024/01/15 10:30:00") == "date"
    # plain strings
    assert dynamic_type_of_string("hello") == "text"
    assert dynamic_type_of_string("2024-1-5") == "text"      # not strict


def test_string_typing_numeric_detection():
    assert dynamic_type_of_string("123", numeric_detection=True) == "long"
    assert dynamic_type_of_string("12.5", numeric_detection=True) == "float"
    assert dynamic_type_of_string("1e5", numeric_detection=True) == "float"
    # out-of-long-range integer falls to float (Double.parseDouble path)
    assert dynamic_type_of_string(str(2**70),
                                  numeric_detection=True) == "float"


def test_infer_first_occurrence_and_conflicts(spark):
    docs = [
        (1, json.dumps({"a": 5, "b": "x", "nest": {"flag": True},
                        "arr": [1, 2]})),
        (2, json.dumps({"a": "now text", "c": 1.5,
                        "when": "2024-06-01"})),
        (3, json.dumps({"b": 7, "arr": ["s"]})),
    ]
    df = spark.createDataFrame(docs, "id long, js string")
    rows = {r.path: r for r in
            infer_dynamic_mapping(df, "id", "js").collect()}
    # first occurrence wins
    assert rows["a"].dtype == "long" and rows["a"].first_id == 1
    assert rows["a"].n_types == 2                      # conflict visible
    assert rows["b"].dtype == "text" and rows["b"].n_types == 2
    assert rows["b.keyword"].dtype == "keyword"
    assert rows["c"].dtype == "float"
    assert rows["when"].dtype == "date"
    assert rows["nest"].dtype == "object"
    assert rows["nest.flag"].dtype == "boolean"
    # array elements type the field; doc 1's long wins over doc 3's text
    assert rows["arr"].dtype == "long" and rows["arr"].first_id == 1


def test_infer_null_and_empty(spark):
    docs = [(1, json.dumps({"x": None, "y": [], "z": "ok"}))]
    df = spark.createDataFrame(docs, "id long, js string")
    paths = {r.path for r in
             infer_dynamic_mapping(df, "id", "js").collect()}
    assert "x" not in paths and "y" not in paths
    assert {"z", "z.keyword"} <= paths
