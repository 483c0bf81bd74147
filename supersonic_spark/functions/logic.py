"""Logic / control expressions — expression/core/elementary_expressions.h.

Ternary And/Or/Xor/Not/AndNot (:63-80); If (MySQL-style: NULL condition ⇒
false branch) vs NullingIf (:48-61); IsNull (:82-84); IfNull ≈ NVL (:86-89);
Case (:91-93, bound impl elementary_bound_expressions.cc:542,1297); bitwise
family (:96-119); CastTo (:27-31); ParseString{Quiet,Nulling} (:33-43).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

from supersonic_spark.functions.policy import signal_if


def _c(x) -> Column:
    return F.col(x) if isinstance(x, str) else x if isinstance(x, Column) else F.lit(x)


# --- ternary logic (SQL three-valued — Spark's &,|,~ already comply) ---

def and_(a, b) -> Column:
    return _c(a) & _c(b)


def or_(a, b) -> Column:
    return _c(a) | _c(b)


def xor(a, b) -> Column:
    # Boolean XOR with SQL NULL propagation: a != b is exactly ternary XOR.
    return _c(a) != _c(b)


def not_(a) -> Column:
    return ~_c(a)


def and_not(a, b) -> Column:
    """AndNot(a, b) == (NOT a) AND b (elementary_expressions.h:78-80)."""
    return (~_c(a)) & _c(b)


# --- conditionals ---

def if_(cond, then, otherwise) -> Column:
    """If — NULL condition selects the ELSE branch (MySQL-style,
    elementary_expressions.h:48-55)."""
    return F.when(F.coalesce(_c(cond), F.lit(False)), _c(then)).otherwise(_c(otherwise))


def nulling_if(cond, then, otherwise) -> Column:
    """NullingIf — NULL condition yields NULL (elementary_expressions.h:57-61)."""
    c = _c(cond)
    return F.when(c, _c(then)).when(~c, _c(otherwise))


def is_null(a) -> Column:
    return _c(a).isNull()


def ifnull(a, b) -> Column:
    """IfNull ≈ NVL (elementary_expressions.h:86-89)."""
    return F.coalesce(_c(a), _c(b))


def case(subject, *when_then, default=None) -> Column:
    """Case(expr, [default], v1, r1, v2, r2, ...) — CASE <expr> WHEN v THEN r
    (elementary_expressions.h:91-93).  Here: case(subject, (v1, r1), (v2, r2),
    default=...)."""
    s = _c(subject)
    expr = None
    for v, r in when_then:
        branch = (s == _c(v), _c(r))
        expr = F.when(*branch) if expr is None else expr.when(*branch)
    if expr is None:
        return _c(default)
    return expr.otherwise(_c(default)) if default is not None else expr


# --- bitwise (elementary_expressions.h:96-119) ---

def bitwise_not(a) -> Column:
    return F.bitwise_not(_c(a))


def bitwise_and(a, b) -> Column:
    return _c(a).bitwiseAND(_c(b))


def bitwise_and_not(a, b) -> Column:
    return F.bitwise_not(_c(a)).bitwiseAND(_c(b))


def bitwise_or(a, b) -> Column:
    return _c(a).bitwiseOR(_c(b))


def bitwise_xor(a, b) -> Column:
    return _c(a).bitwiseXOR(_c(b))


def shift_left(a, n) -> Column:
    return F.shiftleft(_c(a), n)


def shift_right(a, n) -> Column:
    return F.shiftright(_c(a), n)


# --- cast / parse (elementary_expressions.h:27-43) ---

def cast_to(spark_type, a) -> Column:
    """CastTo — the reference's cast matrix (templated/cast_bound_expression.cc)
    maps onto Spark `cast`."""
    return _c(a).cast(spark_type)


def parse_string_nulling(spark_type, a) -> Column:
    """ParseStringNulling — NULL on unparseable input (Spark try_cast)."""
    return _c(a).try_cast(spark_type)


def parse_string_quiet(spark_type, a) -> Column:
    """ParseStringQuiet — undefined on bad input in the reference; we give
    the NULLING behaviour (safest superset, still fastest Spark path)."""
    return _c(a).try_cast(spark_type)


def parse_string_signaling(spark_type, a) -> Column:
    c = _c(a)
    parsed = c.try_cast(spark_type)
    return signal_if(c.isNotNull() & parsed.isNull(), "unparseable string", parsed)


def bool_to_numeric(a) -> Column:
    """BoolToNumeric (operators.proto:78) — true→1, false→0."""
    return _c(a).cast("int")


def numeric_to_bool(a) -> Column:
    """NumericToBool (operators.proto:79) — 0→false, nonzero→true."""
    return _c(a) != 0


def copy_(a) -> Column:
    """Copy (operators.proto:72) — identity (forces a materialized column
    in the reference; a no-op projection here)."""
    return _c(a)
