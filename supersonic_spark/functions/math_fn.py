"""Math expressions — expression/core/math_expressions.h.

Exp/Ln/Log10/Log2/Log/Sqrt/Power with policy triples (:37-51,96-111); trig
(:55-76); Abs/Round/Ceil/Floor/Trunc/RoundToInt/CeilToInt/FloorToInt/
RoundWithPrecision (:79-92); Format (:115); IsFinite/IsNormal/IsNaN/IsInf
(:123-126).

Policy mapping: the *Quiet* variants are plain Spark builtins (C-library
semantics: sqrt(-1) → NaN, ln(0) → -inf on the JVM these yield NULL or NaN —
documented below per function); *Nulling* returns NULL outside the domain;
*Signaling* fails the query (policy.signal_if).
"""

from __future__ import annotations

import math

from pyspark.sql import Column
from pyspark.sql import functions as F

from supersonic_spark.functions.policy import signal_if


def _c(x) -> Column:
    return F.col(x) if isinstance(x, str) else x if isinstance(x, Column) else F.lit(x)


def exp(a) -> Column:
    return F.exp(_c(a))


# --- Ln / Log10 / Log2 / Log triples (math_expressions.h:43-51,96-111) ---

def _log_nulling(fn, a) -> Column:
    c = _c(a).cast("double")
    return F.when(c > 0, fn(c))


def ln_quiet(a) -> Column:
    return F.log(_c(a))  # Spark log already NULLs outside domain


def ln_nulling(a) -> Column:
    return _log_nulling(F.log, a)


def ln_signaling(a) -> Column:
    c = _c(a).cast("double")
    return signal_if(c <= 0, "ln of non-positive", F.log(c))


def log10_nulling(a) -> Column:
    return _log_nulling(F.log10, a)


def log2_nulling(a) -> Column:
    return _log_nulling(F.log2, a)


def log_nulling(base, a) -> Column:
    b, c = _c(base).cast("double"), _c(a).cast("double")
    return F.when((c > 0) & (b > 0) & (b != 1), F.log(b, c))


def sqrt_quiet(a) -> Column:
    return F.sqrt(_c(a))


def sqrt_nulling(a) -> Column:
    c = _c(a).cast("double")
    return F.when(c >= 0, F.sqrt(c))


def sqrt_signaling(a) -> Column:
    c = _c(a).cast("double")
    return signal_if(c < 0, "sqrt of negative", F.sqrt(c))


def power_quiet(a, b) -> Column:
    return F.pow(_c(a), _c(b))


def power_nulling(a, b) -> Column:
    base, ex = _c(a).cast("double"), _c(b).cast("double")
    out = F.pow(base, ex)
    return F.when(~F.isnan(out), out)


def power_signaling(a, b) -> Column:
    base, ex = _c(a).cast("double"), _c(b).cast("double")
    out = F.pow(base, ex)
    return signal_if(base.isNotNull() & ex.isNotNull() & F.isnan(out), "pow domain error", out)


# --- trig (math_expressions.h:55-76) ---

def sin(a) -> Column:
    return F.sin(_c(a))


def cos(a) -> Column:
    return F.cos(_c(a))


def tan(a) -> Column:
    return F.tan(_c(a))


def cot(a) -> Column:
    return F.cot(_c(a))


def asin(a) -> Column:
    return F.asin(_c(a))


def acos(a) -> Column:
    return F.acos(_c(a))


def atan(a) -> Column:
    return F.atan(_c(a))


def atan2(y, x) -> Column:
    return F.atan2(_c(y), _c(x))


def sinh(a) -> Column:
    return F.sinh(_c(a))


def cosh(a) -> Column:
    return F.cosh(_c(a))


def tanh(a) -> Column:
    return F.tanh(_c(a))


def asinh(a) -> Column:
    return F.asinh(_c(a))


def acosh(a) -> Column:
    return F.acosh(_c(a))


def atanh(a) -> Column:
    return F.atanh(_c(a))


def to_degrees(a) -> Column:
    return F.degrees(_c(a))


def to_radians(a) -> Column:
    return F.radians(_c(a))


def pi() -> Column:
    return F.lit(math.pi)


# --- rounding family (math_expressions.h:79-92) ---

def abs_(a) -> Column:
    return F.abs(_c(a))


def round_(a) -> Column:
    """Round — half away from zero on doubles (C round()); Spark `round`
    with 0 scale matches HALF_UP for positive, HALF_UP magnitude for
    negative (i.e. away from zero)."""
    return F.round(_c(a), 0)


def round_with_precision(a, precision) -> Column:
    return F.round(_c(a), precision)


def ceil_(a) -> Column:
    return F.ceil(_c(a)).cast("double")


def floor_(a) -> Column:
    return F.floor(_c(a)).cast("double")


def trunc_(a) -> Column:
    """Trunc toward zero (math_expressions.h:84)."""
    c = _c(a).cast("double")
    return F.when(c >= 0, F.floor(c).cast("double")).otherwise(F.ceil(c).cast("double"))


def round_to_int(a) -> Column:
    return F.round(_c(a), 0).cast("long")


def ceil_to_int(a) -> Column:
    return F.ceil(_c(a))


def floor_to_int(a) -> Column:
    return F.floor(_c(a))


# --- formatting / classification ---

def format_(fmt: str, *cols) -> Column:
    """Format — printf-style (math_expressions.h:115) → format_string."""
    return F.format_string(fmt, *[_c(c) for c in cols])


def is_nan(a) -> Column:
    return F.isnan(_c(a))


def is_inf(a) -> Column:
    c = _c(a)
    return (c == F.lit(float("inf"))) | (c == F.lit(float("-inf")))


def is_finite(a) -> Column:
    c = _c(a)
    return ~(F.isnan(c) | is_inf(c))


def is_normal(a) -> Column:
    """IsNormal — finite, non-zero, not subnormal (math_expressions.h:126)."""
    c = _c(a).cast("double")
    tiny = F.lit(2.2250738585072014e-308)  # DBL_MIN
    return is_finite(c) & (F.abs(c) >= tiny)
