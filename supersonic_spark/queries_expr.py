"""Expression-family queries (SURVEY.md §2.7) + stateful expressions (§2.7
'Stateful') — each family exercised over the test tables with a DuckDB
oracle.  Registered into supersonic_spark.queries.REGISTRY.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from supersonic_spark.functions import (
    arithmetic as ar,
    comparison as cmp_,
    datetime_fn as dt,
    logic,
    math_fn as m,
    regexp_fn as re_,
    stateful,
    strings as st,
)
from supersonic_spark.operators import core
from supersonic_spark.queries import _t, q


@q(
    "expr_arithmetic",
    """SELECT l_orderkey, l_linenumber,
              l_extendedprice / NULLIF(l_quantity, 0) AS unit_price,
              l_orderkey // 7 AS int_div,
              l_orderkey % 7 AS modulo,
              (l_linenumber % 2) <> 0 AS odd_line,
              -l_quantity AS neg_qty
       FROM lineitem""",
)
def q_expr_arithmetic(spark, sf_dir):
    """Arithmetic family (arithmetic_expressions.h): Divide-nulling,
    CppDivide (trunc toward zero), Modulus, IsOdd, Negate."""
    t = _t(spark, sf_dir)
    return core.compute(
        t["lineitem"],
        {
            "l_orderkey": F.col("l_orderkey"),
            "l_linenumber": F.col("l_linenumber"),
            "unit_price": ar.divide_nulling("l_extendedprice", "l_quantity"),
            "int_div": ar.cpp_divide_nulling("l_orderkey", F.lit(7)),
            "modulo": ar.modulus_nulling("l_orderkey", F.lit(7)),
            "odd_line": ar.is_odd("l_linenumber"),
            "neg_qty": ar.negate("l_quantity"),
        },
    )


@q(
    "expr_comparison_in",
    """SELECT l_orderkey, l_linenumber,
              l_quantity < 25 AS small_qty,
              l_discount >= 0.05 AND l_discount <= 0.07 AS mid_discount,
              l_returnflag IN ('A', 'N') AS flag_an,
              l_quantity <= l_extendedprice AS le_cmp,
              l_returnflag <> l_linestatus AS flag_ne
       FROM lineitem""",
)
def q_expr_comparison_in(spark, sf_dir):
    """Comparison family (comparison_expressions.h:28-91) incl. In with SQL
    NULL semantics."""
    t = _t(spark, sf_dir)
    return core.compute(
        t["lineitem"],
        {
            "l_orderkey": F.col("l_orderkey"),
            "l_linenumber": F.col("l_linenumber"),
            "small_qty": cmp_.less("l_quantity", F.lit(25.0)),
            "mid_discount": logic.and_(
                cmp_.greater_or_equal("l_discount", F.lit(0.05)),
                cmp_.less_or_equal("l_discount", F.lit(0.07)),
            ),
            "flag_an": cmp_.in_("l_returnflag", ["A", "N"]),
            "le_cmp": cmp_.less_or_equal("l_quantity", "l_extendedprice"),
            "flag_ne": cmp_.not_equal("l_returnflag", "l_linestatus"),
        },
    )


@q(
    "expr_logic_case",
    """SELECT o_orderkey,
              CASE o_orderstatus WHEN 'O' THEN 1 WHEN 'F' THEN 2 ELSE 0 END AS status_code,
              CASE WHEN COALESCE(o_totalprice > 100000, false) THEN 'big' ELSE 'small' END AS size_class,
              COALESCE(NULLIF(o_orderpriority, '1-URGENT'), 'was-urgent') AS prio_or_default,
              (o_orderstatus = 'O') <> (o_totalprice > 200000) AS xor_flag,
              NOT (o_orderstatus = 'P') AS not_pending
       FROM orders""",
)
def q_expr_logic_case(spark, sf_dir):
    """Logic/control family (elementary_expressions.h): Case, If
    (NULL⇒else), IfNull, ternary Xor/Not."""
    t = _t(spark, sf_dir)
    return core.compute(
        t["orders"],
        {
            "o_orderkey": F.col("o_orderkey"),
            "status_code": logic.case(
                "o_orderstatus", (F.lit("O"), F.lit(1)), (F.lit("F"), F.lit(2)), default=F.lit(0)
            ),
            "size_class": logic.if_(
                cmp_.greater("o_totalprice", F.lit(100000.0)), F.lit("big"), F.lit("small")
            ),
            "prio_or_default": logic.ifnull(
                F.nullif(F.col("o_orderpriority"), F.lit("1-URGENT")), F.lit("was-urgent")
            ),
            "xor_flag": logic.xor(
                cmp_.equal("o_orderstatus", F.lit("O")),
                cmp_.greater("o_totalprice", F.lit(200000.0)),
            ),
            "not_pending": logic.not_(cmp_.equal("o_orderstatus", F.lit("P"))),
        },
    )


@q(
    "expr_string",
    """SELECT p_partkey,
              upper(p_brand) AS brand_upper,
              lower(p_type) AS type_lower,
              substring(p_name, 1, 10) AS name_prefix,
              length(p_name)::INT AS name_len,
              instr(p_name, 'a')::INT AS first_a,
              replace(p_type, ' ', '_') AS type_snake,
              concat_ws('|', p_brand, p_type) AS brand_type,
              trim(concat('  ', p_brand, '  ')) AS trimmed,
              contains(p_name, 'red') AS has_red
       FROM part""",
)
def q_expr_string(spark, sf_dir):
    """String family (string_expressions.h): case, 1-based Substring,
    Length, StringOffset≈INSTR, Replace, ConcatWithSeparator, Trim,
    StringContains."""
    t = _t(spark, sf_dir)
    return core.compute(
        t["part"],
        {
            "p_partkey": F.col("p_partkey"),
            "brand_upper": st.to_upper("p_brand"),
            "type_lower": st.to_lower("p_type"),
            "name_prefix": st.substring("p_name", F.lit(1), F.lit(10)),
            "name_len": st.length("p_name"),
            "first_a": st.string_offset("p_name", F.lit("a")),
            "type_snake": st.string_replace("p_type", F.lit(" "), F.lit("_")),
            "brand_type": st.concat_with_separator("|", "p_brand", "p_type"),
            "trimmed": st.trim(st.concat(F.lit("  "), "p_brand", F.lit("  "))),
            "has_red": st.string_contains("p_name", F.lit("red")),
        },
    )


@q(
    "expr_math",
    """SELECT l_orderkey, l_linenumber,
              sqrt(l_quantity) AS sqrt_qty,
              round(ln(l_extendedprice), 6) AS ln_price,
              exp(l_discount) AS exp_disc,
              power(1 + l_discount, 2) AS pow_disc,
              abs(l_quantity - 25) AS abs_dev,
              floor(l_extendedprice) AS floor_price,
              ceil(l_extendedprice) AS ceil_price,
              round(l_tax * 100, 0) AS tax_pct,
              isnan(CASE WHEN l_linenumber % 2 <> 0 THEN 'NaN'::DOUBLE ELSE 0.0 END) AS nan_check
       FROM lineitem""",
)
def q_expr_math(spark, sf_dir):
    """Math family (math_expressions.h): Sqrt/Ln/Exp/Power (positive domain
    here — Quiet==Nulling), Abs/Floor/Ceil/Round, IsNaN."""
    t = _t(spark, sf_dir)
    return core.compute(
        t["lineitem"],
        {
            "l_orderkey": F.col("l_orderkey"),
            "l_linenumber": F.col("l_linenumber"),
            "sqrt_qty": m.sqrt_quiet("l_quantity"),
            # JVM vs DuckDB libm differ in the last ulp of ln — pin at 6dp
            "ln_price": m.round_with_precision(m.ln_quiet("l_extendedprice"), 6),
            "exp_disc": m.exp("l_discount"),
            "pow_disc": m.power_quiet(ar.plus(F.lit(1.0), "l_discount"), F.lit(2.0)),
            "abs_dev": m.abs_(ar.minus("l_quantity", F.lit(25.0))),
            "floor_price": m.floor_("l_extendedprice"),
            "ceil_price": m.ceil_("l_extendedprice"),
            "tax_pct": m.round_with_precision(ar.multiply("l_tax", F.lit(100.0)), 0),
            "nan_check": m.is_nan(
                logic.if_(ar.is_odd("l_linenumber"), F.lit(float("nan")), F.lit(0.0))
            ),
        },
    )


@q(
    "expr_datetime",
    """SELECT event_id,
              year(ts)::INT AS y, quarter(ts)::INT AS qtr, month(ts)::INT AS mon,
              dayofmonth(ts)::INT AS dom, dayofyear(ts)::INT AS doy,
              hour(ts)::INT AS h, minute(ts)::INT AS mi, second(ts)::INT AS s,
              (epoch_us(CAST(ts AS TIMESTAMP)) % 1000000)::INT AS micros,
              (epoch_us(CAST(ts AS TIMESTAMP)) // 1000000) AS unix_sec,
              strftime(CAST(ts AS TIMESTAMP) + INTERVAL 30 DAY, '%Y-%m-%d') AS plus30d,
              strftime(ts, '%Y-%m') AS ym
       FROM events""",
)
def q_expr_datetime(spark, sf_dir):
    """Date/time family (date_expressions.h): extractors (µs-exact),
    AddDays in µs space, DateFormat."""
    t = _t(spark, sf_dir)
    ts = F.col("ts").cast("timestamp")
    return core.compute(
        t["events"],
        {
            "event_id": F.col("event_id"),
            "y": dt.year("ts"),
            "qtr": dt.quarter("ts"),
            "mon": dt.month("ts"),
            "dom": dt.day("ts"),
            "doy": dt.yearday("ts"),
            "h": dt.hour("ts"),
            "mi": dt.minute("ts"),
            "s": dt.second("ts"),
            "micros": dt.microsecond(ts),
            # integer div — double division of epoch-µs can misround
            "unix_sec": F.expr("unix_micros(CAST(ts AS TIMESTAMP)) div 1000000"),
            "plus30d": dt.date_format(dt.add_days(ts, F.lit(30)), "yyyy-MM-dd"),
            "ym": dt.date_format("ts", "yyyy-MM"),
        },
    )


@q(
    "expr_datetime_local",
    """SELECT event_id,
              year(tsw)::INT AS y_local, quarter(tsw)::INT AS qtr_local,
              month(tsw)::INT AS mon_local, dayofmonth(tsw)::INT AS dom_local,
              (isodow(tsw) - 1)::INT AS wd_local,
              dayofyear(tsw)::INT AS doy_local,
              hour(tsw)::INT AS h_local, minute(tsw)::INT AS mi_local,
              second(tsw)::INT AS s_local,
              strftime(tsw, '%Y-%m-%d %H:%M') AS fmt_local,
              hour(CAST(ts AS TIMESTAMP))::INT AS h_session
       FROM (SELECT event_id, ts,
                    (CAST(ts AS TIMESTAMP) AT TIME ZONE 'UTC')
                      AT TIME ZONE 'Europe/Warsaw' AS tsw
             FROM events) t""",
)
def q_expr_datetime_local(spark, sf_dir):
    """*Local datetime variants (date_expressions.h:87-134 YearLocal…
    SecondLocal, :168-175 DateFormatLocal): extract the instant's wall
    clock in an explicit IANA zone — Europe/Warsaw here, which is
    DST-active (+1/+2) so hour/day/weekday genuinely shift vs the UTC
    extractors.  ``h_session`` pins the tz=None path (session timezone,
    UTC under the engine pin) against DuckDB's plain extractor."""
    t = _t(spark, sf_dir)
    tz = "Europe/Warsaw"
    return core.compute(
        t["events"],
        {
            "event_id": F.col("event_id"),
            "y_local": dt.year_local("ts", tz),
            "qtr_local": dt.quarter_local("ts", tz),
            "mon_local": dt.month_local("ts", tz),
            "dom_local": dt.day_local("ts", tz),
            "wd_local": dt.weekday_local("ts", tz),
            "doy_local": dt.yearday_local("ts", tz),
            "h_local": dt.hour_local("ts", tz),
            "mi_local": dt.minute_local("ts", tz),
            "s_local": dt.second_local("ts", tz),
            "fmt_local": dt.date_format_local("ts", "yyyy-MM-dd HH:mm", tz=tz),
            "h_session": dt.hour_local("ts"),
        },
    )


@q(
    "expr_parse_cast",
    """SELECT event_id,
              TRY_CAST(regexp_extract(props, '([0-9]+)', 1) AS INTEGER) AS k_value,
              TRY_CAST(event_type AS INTEGER) AS bad_parse,
              CAST(user_id AS VARCHAR) AS user_str,
              CAST(floor(value) AS BIGINT) AS value_int
       FROM events""",
)
def q_expr_parse_cast(spark, sf_dir):
    """Cast/Parse family (elementary_expressions.h:27-43): ParseStringNulling
    ⇒ try_cast (NULL on bad input); CastTo matrix.

    Note CAST(double AS BIGINT): DuckDB rounds half-even, Spark truncates —
    avoided by flooring value first (value has 2dp, always ≥0)."""
    t = _t(spark, sf_dir)
    return core.compute(
        t["events"],
        {
            "event_id": F.col("event_id"),
            "k_value": logic.parse_string_nulling(
                "int", re_.regexp_extract("props", r"([0-9]+)", 1)
            ),
            "bad_parse": logic.parse_string_nulling("int", "event_type"),
            "user_str": logic.cast_to("string", "user_id"),
            # double→int casts ROUND in DuckDB but TRUNCATE in Spark; floor
            # first for a well-defined common semantic
            "value_int": logic.cast_to("long", m.floor_("value")),
        },
    )


@q(
    "expr_regexp",
    """SELECT doc_id,
              regexp_matches(text, 'data') AS has_data,
              regexp_full_match(lang, '[a-z]{2}') AS lang_ok,
              regexp_replace(text, '[aeiou]', '*', 'g') AS devoweled,
              regexp_extract(text, '^([a-z]+)', 1) AS first_word
       FROM documents WHERE doc_id < 100""",
)
def q_expr_regexp(spark, sf_dir):
    """Regexp family (regexp_expressions.h, RE2): PartialMatch, FullMatch,
    Replace (global), Extract (first match).  Pattern corpus restricted to
    the RE2∩Java common dialect (SURVEY.md §7.4 item 4)."""
    t = _t(spark, sf_dir)
    docs = core.filter_op(t["documents"], F.col("doc_id") < 100)
    return core.compute(
        docs,
        {
            "doc_id": F.col("doc_id"),
            "has_data": re_.regexp_partial_match("text", "data"),
            "lang_ok": re_.regexp_full_match("lang", "[a-z]{2}"),
            "devoweled": re_.regexp_replace("text", "[aeiou]", "*"),
            "first_word": re_.regexp_extract("text", "^([a-z]+)", 1),
        },
    )


# =====================================================================
# stateful / order-dependent (stateful_expressions.h)
# =====================================================================

_W = "PARTITION BY user_id ORDER BY ts, event_id ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW"


@q(
    "stateful_running_sum",
    f"""SELECT event_id, user_id,
              CAST(SUM(CAST(value AS DECIMAL(12,2))) OVER ({_W}) AS DOUBLE) AS run_sum,
              LAG(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id)
                IS DISTINCT FROM event_type AS type_changed
       FROM events""",
)
def q_stateful_running_sum(spark, sf_dir):
    """RunningSum + Changed (stateful_expressions.h:30-45) over an explicit
    (partition, order) — DECIMAL accumulation for exact prefix sums."""
    t = _t(spark, sf_dir)
    ev = t["events"]
    return ev.select(
        "event_id",
        "user_id",
        stateful.running_sum(
            F.col("value").cast("decimal(12,2)"), order=["ts", "event_id"], partition=["user_id"]
        ).cast("double").alias("run_sum"),
        stateful.changed("event_type", order=["ts", "event_id"], partition=["user_id"]).alias(
            "type_changed"
        ),
    )


@q(
    "stateful_smudge",
    f"""SELECT event_id, user_id,
              last_value(CASE WHEN event_type = 'click' THEN value END IGNORE NULLS)
                OVER ({_W}) AS last_click_value
       FROM events""",
)
def q_stateful_smudge(spark, sf_dir):
    """Smudge/LOCF (stateful_expressions.h:47-52): fill-forward the last
    click's value."""
    t = _t(spark, sf_dir)
    anchored = F.when(F.col("event_type") == "click", F.col("value"))
    return t["events"].select(
        "event_id",
        "user_id",
        stateful.smudge(anchored, order=["ts", "event_id"], partition=["user_id"]).alias(
            "last_click_value"
        ),
    )


@q(
    "stateful_running_min_flush",
    """WITH seg AS (
         SELECT event_id, user_id, ts, value,
                COALESCE(SUM(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
                  OVER (PARTITION BY user_id ORDER BY ts, event_id
                        ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS segment
         FROM events
       )
       SELECT event_id, user_id,
              MIN(value) OVER (PARTITION BY user_id, segment ORDER BY ts, event_id
                               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS run_min
       FROM seg""",
)
def q_stateful_running_min_flush(spark, sf_dir):
    """RunningMinWithFlush (stateful_expressions.h:54-61): running min that
    restarts after each 'purchase' row."""
    t = _t(spark, sf_dir)
    flush = F.col("event_type") == "purchase"
    return t["events"].select(
        "event_id",
        "user_id",
        stateful.running_min_with_flush(
            "value", flush, order=["ts", "event_id"], partition=["user_id"]
        ).alias("run_min"),
    )


@q(
    "stateful_smudge_if",
    f"""SELECT event_id, user_id,
              last_value(CASE WHEN NOT COALESCE(event_type <> 'purchase', FALSE)
                              THEN value END IGNORE NULLS)
                OVER ({_W}) AS carried_value
       FROM events""",
)
def q_stateful_smudge_if(spark, sf_dir):
    """SmudgeIf (stateful_expressions.h:64-69): non-purchase rows inherit the
    last purchase row's value; purchase rows anchor their own."""
    t = _t(spark, sf_dir)
    cond = F.col("event_type") != "purchase"
    return t["events"].select(
        "event_id",
        "user_id",
        stateful.smudge_if(
            "value", cond, order=["ts", "event_id"], partition=["user_id"]
        ).alias("carried_value"),
    )


@q(
    "stateful_composed_stream",
    """WITH base AS (
         SELECT event_id, user_id, ts,
                CASE WHEN event_type = 'click' THEN value END AS cv,
                (event_type = 'purchase') AS fl
         FROM events),
       filled AS (
         SELECT event_id, user_id, ts, fl,
                last_value(cv IGNORE NULLS)
                  OVER (PARTITION BY user_id ORDER BY ts, event_id
                        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS filled
         FROM base),
       seg AS (
         SELECT *,
                COALESCE(SUM(CASE WHEN fl THEN 1 ELSE 0 END)
                  OVER (PARTITION BY user_id ORDER BY ts, event_id
                        ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS segid
         FROM filled)
       SELECT event_id, user_id, filled,
              MIN(filled) OVER (PARTITION BY user_id, segid ORDER BY ts, event_id
                                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                AS run_min,
              TRUE AS stream_matches_batch_ok
       FROM seg""",
)
def q_stateful_composed_stream(spark, sf_dir):
    """COMPOSED stateful pipeline, batch ≡ stream ≡ oracle: LOCF of click
    values feeding a running min that flushes after purchases
    (stateful_expressions.h:47-52 composed into :54-61; the sequential
    semantics of stateful_bound_expressions.cc:802-904).  The events table
    is drained as a STREAM through the fused keyed-state operator
    (stream_locf_running_min — LOCF carry and open-segment min both cross
    micro-batch boundaries), then compared row-for-row against the batch
    window composition; the oracle hash-checks the streamed VALUES and the
    equality bit.  This is where state-boundary bugs hide — per-operator
    twins can pass while the composition resets the wrong half of the
    state on flush."""
    from supersonic_spark.streaming.ops import events_stream, stream_locf_running_min

    t = _t(spark, sf_dir)
    stream = events_stream(spark, sf_dir).select(
        "event_id",
        "user_id",
        "ts",
        F.when(F.col("event_type") == "click", F.col("value")).alias("cv"),
        (F.col("event_type") == "purchase").alias("fl"),
    )
    out = stream_locf_running_min(
        stream, key_col="user_id", value_col="cv", flush_col="fl",
        ts_col="ts", id_col="event_id",
    )
    sink = "ss_stateful_composed"
    for q_ in spark.streams.active:
        if q_.name == sink:
            q_.stop()
    drain = (
        out.writeStream.format("memory")
        .queryName(sink)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    if not drain.awaitTermination(300):
        drain.stop()
        raise TimeoutError("stateful_composed_stream drain did not finish in 300s")
    streamed = spark.table(sink).select(
        F.col("key").cast("long").alias("user_id"),
        F.col("event_id"),
        "filled",
        "run_min",
    )
    # batch twin: the pure window composition over the same inputs
    ev = t["events"]
    cv = F.when(F.col("event_type") == "click", F.col("value"))
    fl = F.col("event_type") == "purchase"
    filled_b = stateful.smudge(cv, order=["ts", "event_id"], partition=["user_id"])
    batch = ev.select(
        "event_id",
        filled_b.alias("filled_b"),
        stateful.running_min_with_flush(
            filled_b, fl, order=["ts", "event_id"], partition=["user_id"]
        ).alias("run_min_b"),
    )
    return (
        streamed.join(batch, "event_id")
        .select(
            "event_id",
            "user_id",
            "filled",
            "run_min",
            (
                F.col("filled").eqNullSafe(F.col("filled_b"))
                & F.col("run_min").eqNullSafe(F.col("run_min_b"))
            ).alias("stream_matches_batch_ok"),
        )
    )


@q(
    "expr_bitwise",
    """SELECT l_orderkey, l_linenumber,
              (l_orderkey & 255)::BIGINT AS and_mask,
              (l_orderkey | 15)::BIGINT AS or_mask,
              xor(l_orderkey, l_partkey)::BIGINT AS xor_keys,
              (~l_orderkey)::BIGINT AS not_key,
              (l_linenumber::BIGINT << 3)::BIGINT AS shl3,
              (l_orderkey >> 2)::BIGINT AS shr2,
              ((~l_orderkey) & l_partkey)::BIGINT AS and_not
       FROM lineitem""",
)
def q_expr_bitwise(spark, sf_dir):
    """Bitwise family (elementary_expressions.h:96-119): And/Or/Xor/Not,
    AndNot, ShiftLeft/ShiftRight.  Everything widened to BIGINT on both
    sides (the reference's smallest-common-containing-type rule, :103-105,
    pinned at the widest type so the two engines agree)."""
    t = _t(spark, sf_dir)
    key = F.col("l_orderkey").cast("long")
    part = F.col("l_partkey").cast("long")
    return core.compute(
        t["lineitem"],
        {
            "l_orderkey": F.col("l_orderkey"),
            "l_linenumber": F.col("l_linenumber"),
            "and_mask": logic.bitwise_and(key, F.lit(255).cast("long")),
            "or_mask": logic.bitwise_or(key, F.lit(15).cast("long")),
            "xor_keys": logic.bitwise_xor(key, part),
            "not_key": logic.bitwise_not(key),
            "shl3": logic.shift_left(F.col("l_linenumber").cast("long"), 3),
            "shr2": logic.shift_right(key, 2),
            "and_not": logic.bitwise_and_not(key, part),
        },
    )


@q(
    "expr_trig",
    """SELECT l_orderkey, l_linenumber,
              round(sin(l_quantity), 9) AS sin_q,
              round(cos(l_quantity), 9) AS cos_q,
              round(atan2(l_quantity, l_linenumber), 9) AS atan2_ql,
              round(degrees(l_discount), 9) AS deg_disc,
              round(radians(l_quantity), 9) AS rad_q,
              round(atan(l_discount), 9) AS atan_disc
       FROM lineitem""",
)
def q_expr_trig(spark, sf_dir):
    """Trig family (math_expressions.h:55-76): Sin/Cos/Atan2/Atan/ToDegrees/
    ToRadians — rounded to 9 dp (libm implementations differ in the last
    ulp between JVM and DuckDB; DuckDB lacks hyperbolics, which stay pinned
    by unit tests instead)."""
    t = _t(spark, sf_dir)
    return core.compute(
        t["lineitem"],
        {
            "l_orderkey": F.col("l_orderkey"),
            "l_linenumber": F.col("l_linenumber"),
            "sin_q": F.round(m.sin("l_quantity"), 9),
            "cos_q": F.round(m.cos("l_quantity"), 9),
            "atan2_ql": F.round(m.atan2("l_quantity", "l_linenumber"), 9),
            "deg_disc": F.round(m.to_degrees("l_discount"), 9),
            "rad_q": F.round(m.to_radians("l_quantity"), 9),
            "atan_disc": F.round(m.atan("l_discount"), 9),
        },
    )
