"""Golden expression tests — mirrors the reference's TestEvaluation pattern
(testing/expression_test_helper.h:70-96): input columns + expected output,
plus the NULL/error-policy matrix (SURVEY.md §5 item 4).
"""

from __future__ import annotations

import datetime as dtm
import math

import pandas as pd
import pytest
from pyspark.sql import functions as F

from supersonic_spark.functions import (
    arithmetic as ar,
    comparison as cmp_,
    datetime_fn as dt,
    hashing_fn,
    logic,
    math_fn as m,
    regexp_fn as re_,
    stateful,
    strings as st,
    terminal,
)
from supersonic_spark.functions.policy import is_signal_error
from supersonic_spark.operators import core


def one(spark, expr, schema="x int", row=(1,)):
    df = core.scan_view(spark, [row], schema)
    return df.select(expr.alias("out")).collect()[0]["out"]


def col_vals(spark, expr, schema, data):
    df = core.scan_view(spark, data, schema)
    return [r["out"] for r in df.select(expr.alias("out")).collect()]


# --- arithmetic policy triples (arithmetic_expressions.h:42-93) ---

def test_divide_triple(spark):
    data = [(10.0, 2.0), (1.0, 0.0), (None, 1.0)]
    quiet = col_vals(spark, ar.divide_quiet("a", "b"), "a double, b double", data)
    assert quiet[0] == 5.0 and quiet[1] == float("inf") and quiet[2] is None
    nulling = col_vals(spark, ar.divide_nulling("a", "b"), "a double, b double", data)
    assert nulling == [5.0, None, None]
    with pytest.raises(Exception) as ei:
        col_vals(spark, ar.divide_signaling("a", "b"), "a double, b double", data)
    assert is_signal_error(ei.value)


def test_divide_signaling_passes_when_no_bad_rows(spark):
    vals = col_vals(spark, ar.divide_signaling("a", "b"), "a double, b double", [(8.0, 4.0)])
    assert vals == [2.0]


def test_cpp_divide_truncates_toward_zero(spark):
    vals = col_vals(
        spark, ar.cpp_divide_nulling("a", "b"), "a int, b int", [(7, 2), (-7, 2), (1, 0)]
    )
    assert vals == [3, -3, None]


def test_modulus_and_parity(spark):
    vals = col_vals(spark, ar.modulus_nulling("a", "b"), "a int, b int", [(7, 3), (-7, 3), (1, 0)])
    assert vals == [1, -1, None]  # sign follows dividend (C++ %)
    assert col_vals(spark, ar.is_odd("a"), "a int, b int", [(3, 0), (4, 0)]) == [True, False]


# --- ternary logic / conditionals (elementary_expressions.h) ---

def test_ternary_logic(spark):
    schema = "a boolean, b boolean"
    data = [(True, None), (False, None), (None, None)]
    assert col_vals(spark, logic.and_("a", "b"), schema, data) == [None, False, None]
    assert col_vals(spark, logic.or_("a", "b"), schema, data) == [True, None, None]
    assert col_vals(spark, logic.xor("a", "b"), schema, data) == [None, None, None]


def test_if_vs_nulling_if(spark):
    schema = "c boolean, t string, f string"
    data = [(True, "t", "f"), (False, "t", "f"), (None, "t", "f")]
    # If: NULL condition ⇒ ELSE branch (elementary_expressions.h:48-55)
    assert col_vals(spark, logic.if_("c", "t", "f"), schema, data) == ["t", "f", "f"]
    # NullingIf: NULL condition ⇒ NULL (:57-61)
    assert col_vals(spark, logic.nulling_if("c", "t", "f"), schema, data) == ["t", "f", None]


def test_case_expression(spark):
    expr = logic.case("x", (F.lit(1), F.lit("one")), (F.lit(2), F.lit("two")), default=F.lit("?"))
    assert col_vals(spark, expr, "x int", [(1,), (2,), (9,), (None,)]) == [
        "one",
        "two",
        "?",
        "?",
    ]


def test_ifnull_isnull(spark):
    assert col_vals(spark, logic.ifnull("x", F.lit(0)), "x int", [(5,), (None,)]) == [5, 0]
    assert col_vals(spark, logic.is_null("x"), "x int", [(5,), (None,)]) == [False, True]


def test_parse_string_policies(spark):
    data = [("12",), ("abc",), (None,)]
    assert col_vals(spark, logic.parse_string_nulling("int", "s"), "s string", data) == [
        12,
        None,
        None,
    ]
    with pytest.raises(Exception) as ei:
        col_vals(spark, logic.parse_string_signaling("int", "s"), "s string", data)
    assert is_signal_error(ei.value)


# --- strings (string_expressions.h) ---

def test_substring_one_based_negative(spark):
    data = [("hello",)]
    assert col_vals(spark, st.substring("s", F.lit(2), F.lit(3)), "s string", data) == ["ell"]
    assert col_vals(spark, st.trailing_substring("s", F.lit(-3)), "s string", data) == ["llo"]


def test_string_offset_contains_replace(spark):
    data = [("banana",)]
    assert col_vals(spark, st.string_offset("s", F.lit("an")), "s string", data) == [2]
    assert col_vals(spark, st.string_offset("s", F.lit("zz")), "s string", data) == [0]
    assert col_vals(spark, st.string_contains_ci("s", F.lit("ANA")), "s string", data) == [True]
    assert col_vals(spark, st.string_replace("s", F.lit("an"), F.lit("*")), "s string", data) == [
        "b**a"
    ]


# --- math (math_expressions.h) ---

def test_math_policy_triples(spark):
    data = [(4.0,), (-1.0,), (None,)]
    nulling = col_vals(spark, m.sqrt_nulling("x"), "x double", data)
    assert nulling == [2.0, None, None]
    quiet = col_vals(spark, m.sqrt_quiet("x"), "x double", data)
    assert quiet[0] == 2.0 and math.isnan(quiet[1]) and quiet[2] is None
    with pytest.raises(Exception) as ei:
        col_vals(spark, m.sqrt_signaling("x"), "x double", data)
    assert is_signal_error(ei.value)
    assert col_vals(spark, m.ln_nulling("x"), "x double", [(math.e,), (0.0,), (-1.0,)]) == [
        1.0,
        None,
        None,
    ]


def test_rounding_family(spark):
    data = [(2.5,), (-2.5,), (2.4,)]
    assert col_vals(spark, m.round_(F.col("x")), "x double", data) == [3.0, -3.0, 2.0]
    assert col_vals(spark, m.trunc_("x"), "x double", data) == [2.0, -2.0, 2.0]
    assert col_vals(spark, m.floor_to_int("x"), "x double", data) == [2, -3, 2]
    assert col_vals(spark, m.ceil_to_int("x"), "x double", data) == [3, -2, 3]


def test_classification(spark):
    inf, nan = float("inf"), float("nan")
    data = [(1.0,), (inf,), (nan,), (0.0,)]
    assert col_vals(spark, m.is_finite("x"), "x double", data) == [True, False, False, True]
    assert col_vals(spark, m.is_inf("x"), "x double", data) == [False, True, False, False]
    assert col_vals(spark, m.is_nan("x"), "x double", data) == [False, False, True, False]
    assert col_vals(spark, m.is_normal("x"), "x double", data) == [True, False, False, False]


# --- datetime (date_expressions.h) — µs precision ---

def test_datetime_extractors_microseconds(spark):
    ts = dtm.datetime(2024, 3, 15, 10, 30, 45, 123456)
    schema = "t timestamp"
    data = [(ts,)]
    assert col_vals(spark, dt.year("t"), schema, data) == [2024]
    assert col_vals(spark, dt.quarter("t"), schema, data) == [1]
    assert col_vals(spark, dt.weekday("t"), schema, data) == [4]  # Friday=4 (Mon=0)
    assert col_vals(spark, dt.microsecond("t"), schema, data) == [123456]


def test_datetime_arithmetic_us_exact(spark):
    ts = dtm.datetime(2024, 1, 31, 23, 59, 59, 999999)
    schema = "t timestamp"
    out = col_vals(spark, dt.add_minutes("t", F.lit(1)), schema, [(ts,)])
    assert out == [dtm.datetime(2024, 2, 1, 0, 0, 59, 999999)]
    out = col_vals(spark, dt.add_months("t", F.lit(1)), schema, [(ts,)])
    # day clamped (Jan 31 + 1 month → Feb 29, 2024 is leap), µs preserved
    assert out == [dtm.datetime(2024, 2, 29, 23, 59, 59, 999999)]


def test_strftime_translation():
    assert dt.strftime_to_spark("%Y-%m-%d %H:%M:%S") == "yyyy-MM-dd HH:mm:ss"


def test_datetime_local_variants(spark):
    """*Local extractors (date_expressions.h:87-134,168-175): explicit-zone
    extraction is DST-aware and independent of the session timezone; the
    tz=None form reads the session timezone (the reference's process-local
    semantics).  2024-03-31 01:30 UTC is 30 min past the Warsaw spring
    jump (+1→+2), so Warsaw wall clock is 03:30."""
    from supersonic_spark.session import session_timezone

    ts = dtm.datetime(2024, 3, 31, 1, 30, 0)   # UTC instant
    schema = "t timestamp"
    data = [(ts,)]
    assert col_vals(spark, dt.hour_local("t", "Europe/Warsaw"), schema, data) == [3]
    assert col_vals(spark, dt.day_local("t", "Europe/Warsaw"), schema, data) == [31]
    # New York is still on the 30th (21:30 EDT)
    assert col_vals(spark, dt.day_local("t", "America/New_York"), schema, data) == [30]
    assert col_vals(spark, dt.hour_local("t", "America/New_York"), schema, data) == [21]
    assert col_vals(
        spark, dt.date_format_local("t", "%Y-%m-%d %H:%M", tz="Europe/Warsaw",
                                    strftime=True), schema, data
    ) == ["2024-03-31 03:30"]
    # tz=None == session timezone; UTC pin first, then a non-UTC session.
    # Build the DataFrame UNDER UTC (createDataFrame interprets naive
    # datetimes in the session zone) and only EVALUATE inside the block —
    # the instant must stay fixed while the session zone changes.
    assert col_vals(spark, dt.hour_local("t"), schema, data) == [1]
    df = core.scan_view(spark, data, schema)

    def ev(expr):
        return df.select(expr.alias("out")).collect()[0]["out"]

    with session_timezone(spark, "Europe/Warsaw"):
        assert ev(dt.hour_local("t")) == 3
        # explicit-tz extraction must NOT double-shift under a non-UTC
        # session: the answer is a property of (instant, zone) only
        assert ev(dt.hour_local("t", "Europe/Warsaw")) == 3
        assert ev(dt.hour_local("t", "America/New_York")) == 21
        assert ev(dt.hour_local("t", "UTC")) == 1
    assert spark.conf.get("spark.sql.session.timeZone") == "UTC"  # restored


# --- regexp (regexp_expressions.h) ---

def test_regexp_family(spark):
    data = [("abc123",), ("xyz",)]
    assert col_vals(spark, re_.regexp_partial_match("s", r"\d+"), "s string", data) == [
        True,
        False,
    ]
    assert col_vals(spark, re_.regexp_full_match("s", r"[a-z]+\d+"), "s string", data) == [
        True,
        False,
    ]
    assert col_vals(spark, re_.regexp_extract("s", r"(\d+)"), "s string", data) == ["123", None]
    assert col_vals(spark, re_.regexp_replace("s", r"\d", "#"), "s string", data) == [
        "abc###",
        "xyz",
    ]


# --- hashing (hashing_expressions.h) ---

def test_hashing_deterministic_seeded(spark):
    df = core.scan_view(spark, [("a",), ("a",), ("b",)], "s string")
    out = df.select(
        hashing_fn.fingerprint("s").alias("f"),
        hashing_fn.hash_with_seed("s", 1).alias("h1"),
        hashing_fn.hash_with_seed("s", 2).alias("h2"),
    ).collect()
    assert out[0]["f"] == out[1]["f"] != out[2]["f"]
    assert out[0]["h1"] != out[0]["h2"]  # seed matters


# --- stateful (stateful_expressions.h) ---

def test_stateful_family(spark):
    data = [
        (1, 1, 10.0, False),
        (2, 1, None, False),
        (3, 1, 30.0, True),
        (4, 1, 5.0, False),
        (5, 2, 1.0, False),
    ]
    df = core.scan_view(spark, data, "pos int, grp int, v double, flush boolean")
    out = df.select(
        "pos",
        stateful.changed("grp", order=["pos"], partition=stateful.GLOBAL).alias("chg"),
        stateful.running_sum("v", order=["pos"], partition=["grp"]).alias("rs"),
        stateful.smudge("v", order=["pos"], partition=["grp"]).alias("locf"),
        stateful.running_min_with_flush("v", "flush", order=["pos"], partition=["grp"]).alias(
            "rmin"
        ),
    ).collect()
    by_pos = {r["pos"]: r for r in out}
    assert [by_pos[i]["chg"] for i in range(1, 6)] == [True, False, False, False, True]
    assert [by_pos[i]["rs"] for i in range(1, 6)] == [10.0, 10.0, 40.0, 45.0, 1.0]
    assert [by_pos[i]["locf"] for i in range(1, 6)] == [10.0, 10.0, 30.0, 5.0, 1.0]
    # running min restarts AFTER the flush row (pos 3 flushes → pos 4 fresh)
    assert [by_pos[i]["rmin"] for i in range(1, 6)] == [10.0, 10.0, 10.0, 5.0, 1.0]


def test_smudge_if(spark):
    data = [(1, "a", False), (2, "b", True), (3, "c", True), (4, "d", False)]
    df = core.scan_view(spark, data, "pos int, v string, ov boolean")
    out = df.select(
        "pos", stateful.smudge_if("v", "ov", order=["pos"], partition=stateful.GLOBAL).alias("sv")
    ).collect()
    assert [r["sv"] for r in sorted(out, key=lambda r: r["pos"])] == ["a", "a", "a", "d"]


# --- terminal ---

def test_terminal_consts(spark):
    df = spark.range(1)
    row = df.select(
        terminal.const_int32(5).alias("i"),
        terminal.null("string").alias("n"),
        terminal.const_double(2.5).alias("d"),
    ).collect()[0]
    assert (row["i"], row["n"], row["d"]) == (5, None, 2.5)


def test_schema_layer_roundtrip(spark):
    from supersonic_spark.schema import Attribute, DataType, Nullability, TupleSchema

    ts = TupleSchema(
        [
            Attribute("k", DataType.INT64, Nullability.NOT_NULLABLE),
            Attribute("v", DataType.STRING),
        ]
    )
    st_ = ts.to_struct_type()
    back = TupleSchema.from_struct_type(st_)
    assert back.are_equal(ts)
    assert ts.lookup_attribute_position("v") == 1


def test_enum_definition(spark):
    from supersonic_spark.schema import EnumDefinition

    ed = EnumDefinition({1: "RED", 2: "BLUE"})
    assert ed.name(1) == "RED" and ed.number("BLUE") == 2
    df = core.scan_view(spark, [(1,), (2,), (3,)], "c int")
    vals = [r["n"] for r in df.select(ed.decode_column("c").alias("n")).collect()]
    assert vals == ["RED", "BLUE", None]


def test_udf_surface_vectorized_and_grouped(spark):
    """The engine's extensibility surface (SURVEY §2.7: reference has no
    runtime UDFs): Arrow-batched scalar and grouped-agg pandas UDFs.
    (pandas is imported at module scope: pyspark resolves the stringified
    type hints against the function's __globals__.)"""
    from supersonic_spark.functions import udf as udf_fn
    from supersonic_spark.operators import core

    @udf_fn.vectorized("double")
    def plus_one(v: pd.Series) -> pd.Series:
        return v + 1.0

    df = core.scan_view(
        spark, [("a", 2.0), ("a", 8.0), ("b", 5.0), ("b", None)], "k string, v double"
    )
    got = {r["k"]: r["p"] for r in
           df.select("k", plus_one("v").alias("p")).collect() if r["p"] is not None}
    assert got["b"] == 6.0

    gm = {r["k"]: r["g"] for r in
          df.groupBy("k").agg(udf_fn.geomean("v").alias("g")).collect()}
    assert gm["a"] == pytest.approx(4.0)  # sqrt(2*8)
    assert gm["b"] == pytest.approx(5.0)  # NULL ignored


def test_stateful_requires_explicit_partition(spark):
    """The global (single-task) window must be OPTED into via GLOBAL —
    omitting partition raises instead of silently planning one task."""
    df = core.scan_view(spark, [(1, 1.0)], "pos int, v double")
    with pytest.raises(ValueError, match="GLOBAL"):
        df.select(stateful.running_sum("v", order=["pos"]))
    with pytest.raises(ValueError, match="GLOBAL"):
        df.select(stateful.changed("v", order=["pos"], partition=[]))
