"""Serialized-expression deserialization (SURVEY.md §2.8/§3.3): JSON
expression trees bind to the §2.7 expression layer with the reference's
build→bind error split."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from supersonic_spark.functions.serde import (
    expression_from_json,
    expressions_from_json,
)
from tests.conftest import rows


def _eval(spark, tree, data=((2, 3.0, "Hello"),), schema="a int, b double, s string"):
    df = spark.createDataFrame(list(data), schema)
    return df.select(expression_from_json(tree).alias("out")).collect()[0]["out"]


def test_arithmetic_tree(spark):
    tree = {
        "operation": {
            "operator": "PLUS",
            "arguments": [
                {"operation": {"operator": "MULTIPLY", "arguments": [
                    {"variable": "a"}, {"constant": {"type": "INT32", "value": 10}}]}},
                {"variable": "b"},
            ],
        }
    }
    assert _eval(spark, tree) == 23.0


def test_divide_nulling_and_case(spark):
    div0 = {
        "operation": {"operator": "DIVIDE_NULLING", "arguments": [
            {"variable": "b"}, {"constant": {"type": "DOUBLE", "value": 0.0}}]}
    }
    assert _eval(spark, div0) is None
    case = {
        "operation": {"operator": "CASE", "arguments": [
            {"variable": "a"},
            {"constant": {"type": "STRING", "value": "other"}},
            {"constant": {"type": "INT32", "value": 2}},
            {"constant": {"type": "STRING", "value": "two"}},
            {"constant": {"type": "INT32", "value": 3}},
            {"constant": {"type": "STRING", "value": "three"}},
        ]}
    }
    assert _eval(spark, case) == "two"
    import pytest as _pytest
    from supersonic_spark.functions.serde import expression_from_json
    with _pytest.raises(ValueError, match="even argument count"):
        expression_from_json(
            {"operation": {"operator": "CASE", "arguments": [
                {"variable": "a"},
                {"constant": {"type": "INT32", "value": 2}},
                {"constant": {"type": "STRING", "value": "two"}}]}})


def test_string_regexp_cast_in(spark):
    up = {"operation": {"operator": "TOUPPER", "arguments": [{"variable": "s"}]}}
    assert _eval(spark, up) == "HELLO"
    rx = {
        "operation": {"operator": "REGEXP_PARTIAL_MATCH", "arguments": [
            {"variable": "s"}, {"constant": {"type": "STRING", "value": "ell"}}]}
    }
    assert _eval(spark, rx) is True
    cast = {
        "operation": {"operator": "CAST_TO", "arguments": [
            {"constant": {"type": "STRING", "value": "DOUBLE"}}, {"variable": "a"}]}
    }
    assert _eval(spark, cast) == 2.0
    in_ = {
        "operation": {"operator": "IN", "arguments": [
            {"variable": "a"},
            {"constant": {"type": "INT32", "value": 1}},
            {"constant": {"type": "INT32", "value": 2}}]}
    }
    assert _eval(spark, in_) is True


def test_null_constant_and_ifnull(spark):
    tree = {
        "operation": {"operator": "IFNULL", "arguments": [
            {"constant": {"type": "DOUBLE", "value": None}},
            {"variable": "b"}]}
    }
    assert _eval(spark, tree) == 3.0


def test_binding_errors_raise_before_spark(spark):
    with pytest.raises(ValueError, match="unknown operator"):
        expression_from_json({"operation": {"operator": "NOPE", "arguments": []}})
    with pytest.raises(ValueError, match="takes 2 arguments"):
        expression_from_json(
            {"operation": {"operator": "PLUS", "arguments": [{"variable": "a"}]}}
        )
    with pytest.raises(ValueError, match="unknown constant type"):
        expression_from_json({"constant": {"type": "DECIMAL", "value": 1}})
    with pytest.raises(ValueError, match="one kind"):
        expression_from_json({"variable": "a", "constant": {}})


def test_named_map_matches_direct(spark, tables):
    li = tables["lineitem"].limit(200)
    named = expressions_from_json(
        {
            "okey": {"variable": "l_orderkey"},
            "revenue": {
                "operation": {"operator": "MULTIPLY", "arguments": [
                    {"variable": "l_extendedprice"},
                    {"operation": {"operator": "MINUS", "arguments": [
                        {"constant": {"type": "DOUBLE", "value": 1.0}},
                        {"variable": "l_discount"}]}}]}
            },
        }
    )
    got = li.select(*[c.alias(n) for n, c in named.items()])
    want = li.select(
        F.col("l_orderkey").alias("okey"),
        (F.col("l_extendedprice") * (F.lit(1.0) - F.col("l_discount"))).alias("revenue"),
    )
    assert rows(got) == rows(want)


def test_operation_tree_roundtrip(spark, tables):
    from supersonic_spark.plans.serde import operation_from_json

    plan = {
        "op": "sort",
        "order": [{"column": "n", "ascending": False}, {"column": "c_mktsegment"}],
        "limit": 3,
        "input": {
            "op": "group_aggregate",
            "keys": ["c_mktsegment"],
            "aggregations": [{"function": "COUNT", "output": "n"}],
            "input": {
                "op": "filter",
                "predicate": {"operation": {"operator": "GREATER", "arguments": [
                    {"variable": "c_custkey"},
                    {"constant": {"type": "INT64", "value": 5}}]}},
                "input": {"op": "scan", "table": "customer"},
            },
        },
    }
    got = operation_from_json(spark, plan, tables)
    want = (
        tables["customer"].filter(F.col("c_custkey") > 5)
        .groupBy("c_mktsegment").count().withColumnRenamed("count", "n")
        .orderBy(F.col("n").desc(), F.col("c_mktsegment")).limit(3)
    )
    assert [tuple(r) for r in got.collect()] == [tuple(r) for r in want.collect()]


def test_operation_tree_binding_errors(spark, tables):
    from supersonic_spark.plans.serde import operation_from_json

    with pytest.raises(ValueError, match="unknown operation"):
        operation_from_json(spark, {"op": "mystery"}, tables)
    with pytest.raises(ValueError, match="unknown table"):
        operation_from_json(spark, {"op": "scan", "table": "nope"}, tables)
    with pytest.raises(ValueError, match="unknown aggregation"):
        operation_from_json(
            spark,
            {"op": "group_aggregate", "keys": [], "aggregations": [
                {"function": "MEDIAN", "input": "x", "output": "m"}],
             "input": {"op": "scan", "table": "customer"}},
            tables,
        )
    with pytest.raises(ValueError, match="exactly 2 inputs"):
        operation_from_json(
            spark, {"op": "hash_join", "on": ["k"], "inputs": []}, tables
        )
