"""Terminal expressions — expression/infrastructure/terminal_expressions.h.

Const* builders (:39-52), Null(type) (:36), Sequence() — consecutive int64s
(:60), RandInt32 (:69-71).
"""

from __future__ import annotations

import datetime as _dt

from pyspark.sql import Column
from pyspark.sql import functions as F


def const_int32(v: int) -> Column:
    return F.lit(v).cast("int")


def const_int64(v: int) -> Column:
    return F.lit(v).cast("long")


def const_float(v: float) -> Column:
    return F.lit(v).cast("float")


def const_double(v: float) -> Column:
    return F.lit(v).cast("double")


def const_bool(v: bool) -> Column:
    return F.lit(v)


def const_string(v: str) -> Column:
    return F.lit(v)


def const_binary(v: bytes) -> Column:
    return F.lit(v)


def const_date(v: _dt.date) -> Column:
    return F.lit(v)


def const_datetime(v: _dt.datetime) -> Column:
    return F.lit(v)


def null(spark_type) -> Column:
    """Null(type) — typed NULL (terminal_expressions.h:36)."""
    return F.lit(None).cast(spark_type)


def sequence() -> Column:
    """Sequence() — consecutive int64s 0,1,2,... over the stream
    (terminal_expressions.h:60).

    Order caveat (SURVEY.md §7.4): this is only well-defined given an
    explicit order; use operators.rowid.with_row_id for the contiguous
    scalable form.  As a bare column, monotonically_increasing_id gives
    unique ascending-per-partition int64s (non-contiguous)."""
    return F.monotonically_increasing_id()


def rand_int32(seed: int | None = None) -> Column:
    """RandInt32 (terminal_expressions.h:69-71) — uniform int32."""
    r = F.rand(seed) if seed is not None else F.rand()
    return (r * F.lit(2.0**32) - F.lit(2.0**31)).cast("int")
