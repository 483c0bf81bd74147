"""Error-policy machinery: the Quiet / Nulling / Signaling triples.

Reference: many partial functions ship in three variants (operators.proto:
10-14 — "tag%4 encodes the error policy"; e.g. Divide at
expression/core/arithmetic_expressions.h:48-77):

- QUIET     — C++ semantics, fastest, garbage on bad input (e.g. float
              division by zero → ±inf).
- NULLING   — NULL on bad input.  This is Spark's default behaviour for
              most functions (``try_divide``, ``try_cast``…).
- SIGNALING — the whole evaluation fails with ERROR_EVALUATION_ERROR
              (proto/supersonic.proto:40-82).  Spark mapping: a per-
              expression ``raise_error`` guard (ANSI mode is session-global,
              too coarse — SURVEY.md §7.4 item 2).

``signal_if(bad, msg, value)`` is the single building block: evaluates to
``value`` but raises at job time if ``bad`` is true for any row.  It stays
entirely JVM-side (when/raise_error are codegen'd builtins).
"""

from __future__ import annotations

import enum

from pyspark.sql import Column
from pyspark.sql import functions as F


class EvalPolicy(enum.Enum):
    QUIET = "quiet"
    NULLING = "nulling"
    SIGNALING = "signaling"


class EvaluationError(Exception):
    """Python-side marker mirroring ERROR_EVALUATION_ERROR
    (proto/supersonic.proto:59)."""


#: Prefix stamped into raise_error messages so callers/tests can recognise
#: a signaling-policy failure inside Spark's wrapped exception.
SIGNAL_PREFIX = "SUPERSONIC_EVALUATION_ERROR"


def signal_if(bad: Column, message: str, value: Column) -> Column:
    """Return ``value``, but fail the query when ``bad`` is true (non-null).

    NULL in ``bad`` does not signal (matches the reference: NULL inputs
    propagate NULL before the operation can fail — skip-vector semantics,
    expression/base/expression.h:45-60).
    """
    guard = F.coalesce(bad, F.lit(False))
    return F.when(
        guard,
        F.raise_error(F.lit(f"{SIGNAL_PREFIX}: {message}")),
    ).otherwise(value)


def is_signal_error(exc: BaseException) -> bool:
    return SIGNAL_PREFIX in str(exc)
