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


# --- protobuf text-format ingestion (wire parity, functions.textproto) ---

def _tp(spark, text, data=((2, 3.0, "Hello"),), schema="a int, b double, s string"):
    from supersonic_spark.functions.textproto import expression_from_textproto

    df = spark.createDataFrame(list(data), schema)
    return df.select(expression_from_textproto(text).alias("out")).collect()[0]["out"]


def test_textproto_matches_json(spark):
    """The text-format wire shape deserializes to the same answers as the
    JSON grammar for the same tree."""
    text = """
      type: OPERATION
      operation {
        type: ADD
        argument { type: OPERATION operation { type: MULTIPLY
            argument { type: VARIABLE variable { name: "a" } }
            argument { type: CONSTANT constant { type: INT32 int32_value: 10 } } } }
        argument { type: VARIABLE variable { name: "b" } }
      }"""
    assert _tp(spark, text) == 23.0


def test_textproto_case_layout(spark):
    """CASE arg0 WHEN arg2 THEN arg3 ELSE arg1 (expressions.proto:101-105)."""
    text = """
      type: OPERATION
      operation {
        type: CASE
        argument { type: VARIABLE variable { name: "s" } }
        argument { type: CONSTANT constant { type: STRING string_value: "other" } }
        argument { type: CONSTANT constant { type: STRING string_value: "Hello" } }
        argument { type: CONSTANT constant { type: STRING string_value: "greeting" } }
      }"""
    assert _tp(spark, text) == "greeting"


def test_textproto_null_date_datetime_constants(spark):
    # no *_value field set ⇒ NULL of the declared type
    assert _tp(spark, "type: CONSTANT constant { type: INT64 }") is None
    # date_value: days since epoch; datetime_value: µs since epoch
    import datetime as dt

    assert _tp(spark, "type: CONSTANT constant { type: DATE date_value: 19723 }") == dt.date(
        2024, 1, 1
    )
    got = _tp(
        spark,
        "type: CONSTANT constant { type: DATETIME datetime_value: 1704067200000001 }",
    )
    assert got == dt.datetime(2024, 1, 1, 0, 0, 0, 1)


def test_textproto_regexp_and_cast(spark):
    # REGEXP_PARTIAL alias + the data-at-0 / pattern-at-1 layout
    text = """
      type: OPERATION
      operation {
        type: REGEXP_PARTIAL
        argument { type: VARIABLE variable { name: "s" } }
        argument { type: CONSTANT constant { type: STRING string_value: "ell" } }
      }"""
    assert _tp(spark, text) is True
    # CAST with the data_type_value constant at argument 0 (bep.cc:474)
    text = """
      type: OPERATION
      operation {
        type: CAST
        argument { type: CONSTANT constant { type: DATA_TYPE data_type_value: DOUBLE } }
        argument { type: VARIABLE variable { name: "a" } }
      }"""
    assert _tp(spark, text) == 2.0


def test_textproto_string_escapes_and_angle_brackets(spark):
    text = r"""
      type: OPERATION
      operation <
        type: CONCATENATE
        argument < type: VARIABLE variable < name: "s" > >
        argument < type: CONSTANT constant < type: STRING string_value: "\x21\n" > >
      >"""
    assert _tp(spark, text) == "Hello!\n"


def test_textproto_errors():
    from supersonic_spark.functions.textproto import (
        expression_from_textproto,
        parse_text_format,
    )

    with pytest.raises(ValueError, match="syntax error"):
        parse_text_format("type: @bogus")
    with pytest.raises(ValueError, match="missing closing"):
        parse_text_format("operation { type: ADD")
    with pytest.raises(ValueError, match="SELECT LIST"):
        expression_from_textproto("type: TUPLE tuple { }")
    with pytest.raises(ValueError, match="unsupported"):
        expression_from_textproto("type: PATH path { }")
    with pytest.raises(ValueError, match="unknown operator"):
        expression_from_textproto(
            "type: OPERATION operation { type: FROBNICATE }"
        )
    with pytest.raises(ValueError, match="exactly once"):
        expression_from_textproto("type: VARIABLE")


# --- binary proto wire format ---

def _enc_varint(n: int) -> bytes:
    if n < 0:
        n += 1 << 64
    out = bytearray()
    while True:
        b = n & 0x7F
        n >>= 7
        if n:
            out.append(b | 0x80)
        else:
            out.append(b)
            return bytes(out)


def _enc_field(field: int, wtype: int, payload: bytes) -> bytes:
    return _enc_varint((field << 3) | wtype) + payload


def _enc_msg(field: int, body: bytes) -> bytes:
    return _enc_field(field, 2, _enc_varint(len(body)) + body)


def _bin_const(dtype_num: int, value_field: int | None = None,
               value: bytes = b"") -> bytes:
    body = _enc_field(1, 0, _enc_varint(dtype_num))
    if value_field is not None:
        body += value
    # ExpressionDescription{ type: CONSTANT, constant: {...} }
    return _enc_field(1, 0, _enc_varint(0)) + _enc_msg(2, body)


def _bin_var(name: str) -> bytes:
    var = _enc_msg(1, b"") if not name else _enc_field(1, 2, _enc_varint(len(name.encode())) + name.encode())
    return _enc_field(1, 0, _enc_varint(1)) + _enc_msg(3, var)


def _bin_op(op_num: int, *args: bytes) -> bytes:
    body = _enc_field(1, 0, _enc_varint(op_num))
    for a in args:
        body += _enc_msg(2, a)
    return _enc_field(1, 0, _enc_varint(2)) + _enc_msg(4, body)


def test_binaryproto_matches_json(spark):
    """Hand-encoded proto wire bytes for a*10+b deserialize and evaluate
    identically to the JSON/text paths (ADD=0, MULTIPLY=1, INT32 dtype=1
    with int32_value at field 2)."""
    from supersonic_spark.functions.textproto import expression_from_binaryproto

    ten = _bin_const(1, 2, _enc_field(2, 0, _enc_varint(10)))
    tree = _bin_op(0, _bin_op(1, _bin_var("a"), ten), _bin_var("b"))
    df = spark.createDataFrame([(2, 3.0, "Hello")], "a int, b double, s string")
    out = df.select(expression_from_binaryproto(tree).alias("out")).collect()[0]["out"]
    assert out == 23.0


def test_binaryproto_negative_int_and_double(spark):
    import struct

    from supersonic_spark.functions.textproto import expression_from_binaryproto

    neg = _bin_const(2, 3, _enc_field(3, 0, _enc_varint(-7)))  # INT64=-7
    df = spark.createDataFrame([(1,)], "a int")
    assert df.select(
        expression_from_binaryproto(neg).alias("o")).collect()[0]["o"] == -7
    dbl = _bin_const(5, 7, _enc_field(7, 1, struct.pack("<d", 2.5)))  # DOUBLE
    assert df.select(
        expression_from_binaryproto(dbl).alias("o")).collect()[0]["o"] == 2.5


def test_binaryproto_string_and_null(spark):
    from supersonic_spark.functions.textproto import expression_from_binaryproto

    s = "hi"
    sc = _bin_const(0, 12, _enc_field(12, 2, _enc_varint(len(s)) + s.encode()))
    df = spark.createDataFrame([(1,)], "a int")
    assert df.select(
        expression_from_binaryproto(sc).alias("o")).collect()[0]["o"] == "hi"
    # Constant with only a type ⇒ NULL of that type (INT64=2)
    null64 = _enc_field(1, 0, _enc_varint(0)) + _enc_msg(
        2, _enc_field(1, 0, _enc_varint(2)))
    assert df.select(
        expression_from_binaryproto(null64).alias("o")).collect()[0]["o"] is None


def test_binaryproto_errors():
    from supersonic_spark.functions.textproto import expression_from_binaryproto

    with pytest.raises(ValueError, match="truncated"):
        expression_from_binaryproto(b"\x08")  # key then missing varint
    with pytest.raises(ValueError, match="unknown enum"):
        expression_from_binaryproto(_enc_field(1, 0, _enc_varint(99)))
    # TUPLE is a select list, not a single expression
    tup = _enc_field(1, 0, _enc_varint(4)) + _enc_msg(6, b"")
    with pytest.raises(ValueError, match="SELECT LIST"):
        expression_from_binaryproto(tup)


def test_textproto_tuple_select_list(spark):
    """TUPLE → CompoundExpression parity (BuildTupleFromProto): a select
    list with aliases and positional default names."""
    from supersonic_spark.functions.textproto import select_list_from_textproto

    cols = select_list_from_textproto("""
      type: TUPLE
      tuple {
        expression {
          expression { type: VARIABLE variable { name: "a" } }
          alias: "a_out"
        }
        expression {
          expression { type: OPERATION operation { type: MULTIPLY
              argument { type: VARIABLE variable { name: "b" } }
              argument { type: CONSTANT constant { type: DOUBLE double_value: 2.0 } } } }
        }
      }""")
    assert list(cols) == ["a_out", "expr1"]
    df = spark.createDataFrame([(2, 3.0, "x")], "a int, b double, s string")
    row = df.select(*[c.alias(n) for n, c in cols.items()]).collect()[0]
    assert row["a_out"] == 2 and row["expr1"] == 6.0


def test_binaryproto_tuple_select_list(spark):
    from supersonic_spark.functions.textproto import select_list_from_binaryproto

    var_a = _bin_var("a")
    te1 = _enc_msg(1, var_a) + _enc_field(2, 2, _enc_varint(5) + b"a_out")
    te2 = _enc_msg(1, _bin_var("s"))
    tup = (_enc_field(1, 0, _enc_varint(4))  # type: TUPLE
           + _enc_msg(6, _enc_msg(1, te1) + _enc_msg(1, te2)))
    cols = select_list_from_binaryproto(tup)
    assert list(cols) == ["a_out", "expr1"]
    df = spark.createDataFrame([(7, 1.0, "hey")], "a int, b double, s string")
    row = df.select(*[c.alias(n) for n, c in cols.items()]).collect()[0]
    assert row["a_out"] == 7 and row["expr1"] == "hey"


def test_tuple_errors():
    from supersonic_spark.functions.textproto import tuple_to_select_list, parse_text_format

    with pytest.raises(ValueError, match="expected a TUPLE"):
        tuple_to_select_list(parse_text_format("type: VARIABLE variable { name: \"x\" }"))
    with pytest.raises(ValueError, match="multi-alias"):
        tuple_to_select_list(parse_text_format("""
          type: TUPLE tuple { expression {
            expression { type: VARIABLE variable { name: "x" } }
            alias: "p" alias: "q" } }"""))
    with pytest.raises(ValueError, match="duplicate"):
        tuple_to_select_list(parse_text_format("""
          type: TUPLE tuple {
            expression { expression { type: VARIABLE variable { name: "x" } } alias: "p" }
            expression { expression { type: VARIABLE variable { name: "y" } } alias: "p" } }"""))


def test_bare_name_default_policies(spark):
    """Bare proto names resolve to the reference's default policies
    (arithmetic_expressions.cc:100-113, math_expressions.cc:276): DIVIDE/
    MODULUS → SIGNALING (raise on /0), SQRT → QUIET (NaN on negative)."""
    import math as _math

    div = {"operation": {"operator": "DIVIDE", "arguments": [
        {"variable": "a"}, {"constant": {"type": "INT32", "value": 2}}]}}
    assert _eval(spark, div) == 1.0  # SQL semantics: 2/2 = 1.0 (double)
    div0 = {"operation": {"operator": "DIVIDE", "arguments": [
        {"variable": "a"}, {"constant": {"type": "INT32", "value": 0}}]}}
    with pytest.raises(Exception):  # signaling: /0 raises at evaluation
        _eval(spark, div0)
    sqrt_neg = {"operation": {"operator": "SQRT", "arguments": [
        {"constant": {"type": "DOUBLE", "value": -4.0}}]}}
    out = _eval(spark, sqrt_neg)
    assert out is not None and _math.isnan(out)  # quiet: NaN, not NULL


def test_add_overload_arity_dispatch(spark):
    """ADD_MINUTE/ADD_DAY/ADD_MONTH are arity-overloaded under one enum
    name (bep.cc:612-633): 1 arg adds one unit, 2 args add n units."""
    import datetime as dt

    base = {"constant": {"type": "DATETIME", "value": "2024-03-01T10:00:00"}}
    one = {"operation": {"operator": "ADD_DAY", "arguments": [base]}}
    assert _eval(spark, one) == dt.datetime(2024, 3, 2, 10, 0, 0)
    many = {"operation": {"operator": "ADD_DAY", "arguments": [
        base, {"constant": {"type": "INT32", "value": 10}}]}}
    assert _eval(spark, many) == dt.datetime(2024, 3, 11, 10, 0, 0)
    with pytest.raises(ValueError, match="1 or 2 arguments"):
        expression_from_json({"operation": {"operator": "ADD_MONTH", "arguments": [
            base, base, base]}})
