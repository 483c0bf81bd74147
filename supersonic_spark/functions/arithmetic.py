"""Arithmetic expressions — expression/core/arithmetic_expressions.h.

Plus/Minus/Multiply/Negate (:31-41,79-80); Divide triple (:42-61) always
yields DOUBLE-style division; CppDivide (integer division, :64-77);
Modulus triple (:82-93); IsOdd/IsEven (:95-101).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

from supersonic_spark.functions.policy import signal_if


def _c(x) -> Column:
    return F.col(x) if isinstance(x, str) else x if isinstance(x, Column) else F.lit(x)


def plus(a, b) -> Column:
    return _c(a) + _c(b)


def minus(a, b) -> Column:
    return _c(a) - _c(b)


def multiply(a, b) -> Column:
    return _c(a) * _c(b)


def negate(a) -> Column:
    return -_c(a)


# --- Divide triple (arithmetic_expressions.h:42-61): result is floating ---

def divide_quiet(a, b) -> Column:
    """C++ float semantics: x/0 → ±inf, 0/0 → NaN (IEEE-754 per
    arithmetic_expressions.h:25-26)."""
    a, b = _c(a).cast("double"), _c(b).cast("double")
    return F.when(
        b == 0.0,
        F.when(a > 0, F.lit(float("inf")))
        .when(a < 0, F.lit(float("-inf")))
        .when(a.isNotNull(), F.lit(float("nan"))),
    ).otherwise(a / b)


def divide_nulling(a, b) -> Column:
    """NULL on division by zero — Spark's `/` already does this."""
    return _c(a).cast("double") / _c(b).cast("double")


def divide_signaling(a, b) -> Column:
    a, b = _c(a), _c(b)
    return signal_if(b == 0, "division by zero", a.cast("double") / b.cast("double"))


# --- CppDivide: integer division (arithmetic_expressions.h:64-77) ---

def _int_div(a: Column, b: Column) -> Column:
    # C++ integer division truncates toward zero; casting the double
    # quotient to long truncates toward zero too.
    return F.when(b != 0, (a.cast("double") / b.cast("double")).cast("long")).otherwise(
        F.lit(None).cast("long")
    )


def cpp_divide_nulling(a, b) -> Column:
    return _int_div(_c(a), _c(b))


def cpp_divide_signaling(a, b) -> Column:
    a, b = _c(a), _c(b)
    return signal_if(b == 0, "integer division by zero", _int_div(a, b))


# --- Modulus triple (arithmetic_expressions.h:82-93) ---

def modulus_nulling(a, b) -> Column:
    """C++ % semantics (sign follows dividend); NULL when b == 0.
    Spark's % matches both properties."""
    return _c(a) % _c(b)


def modulus_signaling(a, b) -> Column:
    a, b = _c(a), _c(b)
    return signal_if(b == 0, "modulus by zero", a % b)


def is_odd(a) -> Column:
    """arithmetic_expressions.h:95-101."""
    return (_c(a) % 2) != 0


def is_even(a) -> Column:
    return (_c(a) % 2) == 0
