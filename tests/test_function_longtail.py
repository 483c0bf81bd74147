"""Golden tests for the long-tail expression/operator surface not covered
by the family matrices: constant builders, date constructors/formatters,
hyperbolic trig, conversion ops, the Signaling policy helper, and small
source/pipeline utilities."""

from __future__ import annotations

import datetime as _dtm
import math

import pytest
from pyspark.sql import functions as F

from supersonic_spark.functions import (
    datetime_fn as dt,
    hashing_fn,
    logic,
    math_fn as m,
    policy,
    strings as st,
    terminal,
)
from supersonic_spark.operators import core, setops
from supersonic_spark.pipeline import textstats


def _one(spark, col, **named):
    df = spark.range(1).select(col.alias("v"), *[c.alias(n) for n, c in named.items()])
    return df.collect()[0]


def test_constant_builders(spark):
    row = spark.range(1).select(
        terminal.const_int32(7).alias("i32"),
        terminal.const_int64(1 << 40).alias("i64"),
        terminal.const_float(1.5).alias("f"),
        terminal.const_double(2.5).alias("d"),
        terminal.const_bool(True).alias("b"),
        terminal.const_string("x").alias("s"),
        terminal.const_binary(b"\x01\x02").alias("bin"),
        terminal.const_date(_dtm.date(2024, 2, 29)).alias("dt"),
        terminal.const_datetime(_dtm.datetime(2024, 2, 29, 12, 34, 56, 789012)).alias("ts"),
        terminal.null("int").alias("n"),
    ).collect()[0]
    assert (row["i32"], row["i64"], row["f"], row["d"]) == (7, 1 << 40, 1.5, 2.5)
    assert row["b"] is True and row["s"] == "x" and bytes(row["bin"]) == b"\x01\x02"
    assert str(row["dt"]) == "2024-02-29"
    assert row["ts"].microsecond == 789012  # µs-exact DATETIME
    assert row["n"] is None


def test_sequence_and_rand_are_usable(spark):
    df = spark.range(5).select(terminal.sequence().alias("seq"), terminal.rand_int32().alias("r"))
    rows = df.collect()
    seqs = [r["seq"] for r in rows]
    # documented: unique ascending-per-partition, NON-contiguous
    # (the contiguous scalable form is operators.rowid.with_row_id)
    assert len(set(seqs)) == 5 and seqs == sorted(seqs)
    assert all(r["r"] is not None for r in rows)


def test_datetime_constructors_and_format(spark):
    row = spark.range(1).select(
        dt.make_date(F.lit(2024), F.lit(2), F.lit(29)).alias("d"),
        dt.make_datetime(F.lit(2024), F.lit(2), F.lit(29), F.lit(13), F.lit(14), F.lit(15)).alias("ts"),
        dt.const_datetime_from_seconds(86400).alias("ep"),
        dt.const_datetime_from_microseconds(1_500_000).alias("us"),
        dt.from_unix_time(F.lit(0)).alias("t0"),
        dt.unix_timestamp(F.lit("2024-01-01 00:00:00").cast("timestamp")).alias("ux"),
        dt.parse_datetime(
            F.lit("2024-02-29 13:14:15"), dt.strftime_to_spark("%Y-%m-%d %H:%M:%S")
        ).alias("p"),
        dt.date_format(
            F.lit("2024-02-29 13:14:15").cast("timestamp"), "%Y/%m/%d", strftime=True
        ).alias("fmt"),
    ).collect()[0]
    assert str(row["d"]) == "2024-02-29"
    assert row["ts"].hour == 13 and row["p"].minute == 14
    assert row["ep"].day == 2 and row["us"].microsecond == 500000
    assert row["ux"] == 1704067200 and row["fmt"] == "2024/02/29"


def test_now_is_timestamp(spark):
    assert _one(spark, dt.now())["v"].year >= 2024


def test_hyperbolic_and_extra_trig(spark):
    row = spark.range(1).select(
        m.sinh(F.lit(1.0)).alias("sh"), m.cosh(F.lit(1.0)).alias("ch"),
        m.asinh(F.lit(1.0)).alias("ash"), m.acosh(F.lit(2.0)).alias("ach"),
        m.atanh(F.lit(0.5)).alias("ath"), m.cot(F.lit(1.0)).alias("cot"),
        m.asin(F.lit(0.5)).alias("as_"), m.acos(F.lit(0.5)).alias("ac"),
        m.tan(F.lit(1.0)).alias("tn"), m.tanh(F.lit(1.0)).alias("th"),
        m.pi().alias("pi"),
    ).collect()[0]
    assert math.isclose(row["sh"], math.sinh(1.0))
    assert math.isclose(row["ch"], math.cosh(1.0))
    assert math.isclose(row["ash"], math.asinh(1.0))
    assert math.isclose(row["ach"], math.acosh(2.0))
    assert math.isclose(row["ath"], math.atanh(0.5))
    assert math.isclose(row["cot"], 1 / math.tan(1.0))
    assert math.isclose(row["tn"], math.tan(1.0)) and math.isclose(row["th"], math.tanh(1.0))
    assert math.isclose(row["as_"] + row["ac"], math.pi / 2) and math.isclose(row["pi"], math.pi)


def test_format_round_to_int_is_even(spark):
    row = spark.range(1).select(
        m.format_("%.2f-%d", F.lit(1.5), F.lit(7)).alias("f"),
        m.round_to_int(F.lit(2.5)).alias("r"),
        (F.lit(4) % 2 == 0).alias("even_raw"),
    ).collect()[0]
    assert row["f"] == "1.50-7" and row["r"] == 3 and row["even_raw"] is True
    from supersonic_spark.functions.arithmetic import is_even
    assert _one(spark, is_even(F.lit(4)))["v"] is True


def test_conversions_and_copy(spark):
    row = spark.range(1).select(
        logic.bool_to_numeric(F.lit(True)).alias("b2n"),
        logic.numeric_to_bool(F.lit(0)).alias("n2b"),
        logic.copy_(F.lit(5)).alias("cp"),
        st.to_string(F.lit(3.5)).alias("ts"),
        st.ltrim(F.lit("  x ")).alias("lt"),
        st.rtrim(F.lit(" x  ")).alias("rt"),
    ).collect()[0]
    assert (row["b2n"], row["n2b"], row["cp"]) == (1, False, 5)
    assert row["ts"] == "3.5" and row["lt"] == "x " and row["rt"] == " x"


def test_signal_if_raises_and_passes(spark):
    ok = spark.range(1).select(
        policy.signal_if(F.lit(False), "never", F.lit(1)).alias("v")
    ).collect()[0]["v"]
    assert ok == 1
    with pytest.raises(Exception, match="SIGNAL|never"):
        spark.range(1).select(
            policy.signal_if(F.lit(True), "never good", F.lit(1)).alias("v")
        ).collect()


def test_policy_signaling_variants_raise(spark):
    from supersonic_spark.functions.math_fn import ln_signaling, power_signaling

    with pytest.raises(Exception):
        spark.range(1).select(ln_signaling(F.lit(-1.0)).alias("v")).collect()
    # in-domain: fine
    v = spark.range(1).select(power_signaling(F.lit(2.0), F.lit(3.0)).alias("v")).collect()[0]["v"]
    assert math.isclose(v, 8.0)


def test_murmur32(spark):
    a = _one(spark, hashing_fn.murmur32(F.lit("abc")))["v"]
    b = _one(spark, hashing_fn.murmur32(F.lit("abc")))["v"]
    assert a == b and isinstance(a, int)


def test_quality_score_and_bpe_count(spark):
    df = core.scan_view(
        spark,
        [(1, "the cat sat on the mat, and it was good."), (2, "zzz")],
        "id long, text string",
    )
    rows = {r["id"]: (r["q"], r["bpe"]) for r in df.select(
        "id",
        textstats.quality_score("text").alias("q"),
        textstats.bpe_ish_token_count("text").alias("bpe"),
    ).collect()}
    assert 0.0 <= rows[2][0] < rows[1][0] <= 1.0  # real sentence scores higher
    assert rows[1][1] > 10 and rows[2][1] == 1


def test_splitter_branches_share_input(spark):
    df = core.scan_view(spark, [(i,) for i in range(10)], "x long")
    s = setops.splitter(df)
    a = s.filter(F.col("x") < 5).count()
    b = s.filter(F.col("x") >= 5).count()
    assert (a, b) == (5, 5)


def test_table_sink(spark):
    from supersonic_spark.sources.table import Table, table_sink

    t = Table(spark, "k long, v string")
    out = table_sink(t, core.scan_view(spark, [(1, "a"), (2, "b")], "k long, v string"))
    assert out.to_df().count() == 2
