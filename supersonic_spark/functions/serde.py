"""Serialized expression trees → Column (SURVEY.md §2.8 / §3.3 parity).

The reference's only "query language" is a serialized expression tree:
``BuildExpressionFromProto`` walks an ``ExpressionDescription`` proto of
CONSTANT | VARIABLE | OPERATION nodes and dispatches on ``OperatorId``
(serialization/build_expression_from_proto.cc:754; node kinds
utils/proto/expressions.proto:13-20,292-303; operator enum
expression/proto/operators.proto:15-195).  This module is that entry
point re-expressed for the engine: a JSON tree in the same three-node
shape deserializes into the §2.7 expression layer, so plans can be
shipped/stored as data and bound later — exactly the reference's
build→bind split (binding errors surface here as ValueError before any
Spark job; type errors surface at Catalyst analysis, the reference's
``Bind`` stage).

JSON grammar (field names follow expressions.proto):

    {"constant": {"type": "INT64", "value": 42}}
    {"variable": "l_quantity"}
    {"operation": {"operator": "PLUS", "arguments": [<expr>, <expr>]}}

``operator`` names are the reference's OperatorId spellings (PLUS,
DIVIDE_NULLING, CASE, CAST_TO, REGEXP_PARTIAL_MATCH, …).  Argument
layouts follow the reference deserializer exactly:

* CAST_TO / PARSE_STRING_*: (type-constant, expr) — the type rides as a
  leading DATA_TYPE constant (build_expression_from_proto.cc:458-482).
* REGEXP_PARTIAL_MATCH / REGEXP_FULL_MATCH / REGEXP_EXTRACT:
  (expr, pattern-constant) — data expression first, constant STRING
  pattern at index 1 (MakeRegexpOperation,
  build_expression_from_proto.cc:349-392).
* REGEXP_REPLACE: (expr, pattern-constant, replacement-expr) — the
  replacement is a full sub-expression, not necessarily constant
  (MakeRegexpReplaceOperation, build_expression_from_proto.cc:394-433).
* CASE: (selector, default, when1, then1, when2, then2, …) — EVEN
  argument count, selector at 0 and the default at 1, matching BoundCase
  (elementary_bound_expressions.cc:1297-1311: even indices share the
  selector type, odd indices the output type).
* CONCATENATE_WITH_SEPARATOR: (separator-constant, exprs…).
"""

from __future__ import annotations

import datetime as _dt
from typing import Any

from pyspark.sql import Column

from supersonic_spark.functions import (
    arithmetic as _ar,
    comparison as _cmp,
    datetime_fn as _dtf,
    hashing_fn as _hash,
    logic as _lg,
    math_fn as _m,
    regexp_fn as _re,
    strings as _st,
    terminal as _t,
)

# ---------------------------------------------------------------- constants

_CONST_BUILDERS = {
    "INT32": _t.const_int32,
    "INT64": _t.const_int64,
    "UINT32": _t.const_int64,   # unsigned widens (SURVEY.md §1.2)
    "UINT64": _t.const_int64,
    "FLOAT": _t.const_float,
    "DOUBLE": _t.const_double,
    "BOOL": _t.const_bool,
    "STRING": _t.const_string,
    "BINARY": lambda v: _t.const_binary(bytes(v)),
    "DATE": lambda v: _t.const_date(
        v if isinstance(v, _dt.date) else _dt.date.fromisoformat(v)
    ),
    "DATETIME": lambda v: _t.const_datetime(
        v if isinstance(v, _dt.datetime) else _dt.datetime.fromisoformat(v)
    ),
}

#: CAST_TO / PARSE_STRING target-type names → Spark DDL types
_TYPE_NAMES = {
    "INT32": "int",
    "INT64": "bigint",
    "UINT32": "bigint",
    "UINT64": "bigint",
    "FLOAT": "float",
    "DOUBLE": "double",
    "BOOL": "boolean",
    "STRING": "string",
    "BINARY": "binary",
    "DATE": "date",
    "DATETIME": "timestamp",
}

# ---------------------------------------------------------------- operators

#: OperatorId → (callable, arity); arity None = variadic (≥1)
_OPS: dict[str, tuple[Any, int | None]] = {
    # arithmetic (operators.proto ADD/SUBTRACT/... spellings + aliases)
    "PLUS": (_ar.plus, 2), "ADD": (_ar.plus, 2),
    "MINUS": (_ar.minus, 2), "SUBTRACT": (_ar.minus, 2),
    "MULTIPLY": (_ar.multiply, 2),
    "NEGATE": (_ar.negate, 1),
    # bare-name default policies follow arithmetic_expressions.cc:100-113 —
    # Divide/Modulus/CppDivide resolve to their SIGNALING forms
    "DIVIDE": (_ar.divide_signaling, 2),
    "DIVIDE_SIGNALING": (_ar.divide_signaling, 2),
    "DIVIDE_NULLING": (_ar.divide_nulling, 2),
    "DIVIDE_QUIET": (_ar.divide_quiet, 2),
    "CPP_DIVIDE": (_ar.cpp_divide_signaling, 2),
    "CPP_DIVIDE_NULLING": (_ar.cpp_divide_nulling, 2),
    "CPP_DIVIDE_SIGNALING": (_ar.cpp_divide_signaling, 2),
    "MODULUS": (_ar.modulus_signaling, 2),
    "MODULUS_NULLING": (_ar.modulus_nulling, 2),
    "MODULUS_SIGNALING": (_ar.modulus_signaling, 2),
    "IS_ODD": (_ar.is_odd, 1), "IS_EVEN": (_ar.is_even, 1),
    # comparison
    "EQUAL": (_cmp.equal, 2), "NOT_EQUAL": (_cmp.not_equal, 2),
    "LESS": (_cmp.less, 2), "LESS_OR_EQUAL": (_cmp.less_or_equal, 2),
    "GREATER": (_cmp.greater, 2),
    "GREATER_OR_EQUAL": (_cmp.greater_or_equal, 2),
    # logic / control
    "AND": (_lg.and_, 2), "OR": (_lg.or_, 2), "XOR": (_lg.xor, 2),
    "NOT": (_lg.not_, 1), "AND_NOT": (_lg.and_not, 2),
    "IF": (_lg.if_, 3), "NULLING_IF": (_lg.nulling_if, 3),
    "IS_NULL": (_lg.is_null, 1), "IFNULL": (_lg.ifnull, 2),
    # bitwise
    "BITWISE_NOT": (_lg.bitwise_not, 1),
    "BITWISE_AND": (_lg.bitwise_and, 2),
    "BITWISE_AND_NOT": (_lg.bitwise_and_not, 2),
    "BITWISE_OR": (_lg.bitwise_or, 2),
    "BITWISE_XOR": (_lg.bitwise_xor, 2),
    "SHIFT_LEFT": (_lg.shift_left, 2), "SHIFT_RIGHT": (_lg.shift_right, 2),
    "BOOL_TO_NUMERIC": (_lg.bool_to_numeric, 1),
    "NUMERIC_TO_BOOL": (_lg.numeric_to_bool, 1),
    "COPY": (_lg.copy_, 1),
    # math
    "EXP": (_m.exp, 1),
    "LN": (_m.ln_nulling, 1), "LN_NULLING": (_m.ln_nulling, 1),
    "LN_QUIET": (_m.ln_quiet, 1), "LN_SIGNALING": (_m.ln_signaling, 1),
    "LOG10": (_m.log10_nulling, 1), "LOG2": (_m.log2_nulling, 1),
    "LOG": (_m.log_nulling, 2),
    "SQRT": (_m.sqrt_quiet, 1),  # bare Sqrt → SqrtQuiet (math_expressions.cc:276)
    "SQRT_NULLING": (_m.sqrt_nulling, 1),
    "SQRT_QUIET": (_m.sqrt_quiet, 1), "SQRT_SIGNALING": (_m.sqrt_signaling, 1),
    "POWER": (_m.power_nulling, 2), "POWER_NULLING": (_m.power_nulling, 2),
    "POWER_QUIET": (_m.power_quiet, 2),
    "POWER_SIGNALING": (_m.power_signaling, 2),
    "SIN": (_m.sin, 1), "COS": (_m.cos, 1), "TAN": (_m.tan, 1),
    "COT": (_m.cot, 1), "ASIN": (_m.asin, 1), "ACOS": (_m.acos, 1),
    "ATAN": (_m.atan, 1), "ATAN2": (_m.atan2, 2),
    "SINH": (_m.sinh, 1), "COSH": (_m.cosh, 1), "TANH": (_m.tanh, 1),
    "ASINH": (_m.asinh, 1), "ACOSH": (_m.acosh, 1), "ATANH": (_m.atanh, 1),
    "TO_DEGREES": (_m.to_degrees, 1), "TO_RADIANS": (_m.to_radians, 1),
    "PI": (_m.pi, 0),
    "ABS": (_m.abs_, 1), "ROUND": (_m.round_, 1),
    "ROUND_WITH_PRECISION": (_m.round_with_precision, 2),
    "CEIL": (_m.ceil_, 1), "FLOOR": (_m.floor_, 1), "TRUNC": (_m.trunc_, 1),
    "ROUND_TO_INT": (_m.round_to_int, 1),
    "CEIL_TO_INT": (_m.ceil_to_int, 1),
    "FLOOR_TO_INT": (_m.floor_to_int, 1),
    "IS_NAN": (_m.is_nan, 1), "IS_INF": (_m.is_inf, 1),
    "IS_FINITE": (_m.is_finite, 1), "IS_NORMAL": (_m.is_normal, 1),
    # strings
    "TOSTRING": (_st.to_string, 1), "TO_STRING": (_st.to_string, 1),
    "CONCATENATE": (_st.concat, None), "CONCAT": (_st.concat, None),
    "LENGTH": (_st.length, 1),
    "LTRIM": (_st.ltrim, 1), "RTRIM": (_st.rtrim, 1), "TRIM": (_st.trim, 1),
    "TOUPPER": (_st.to_upper, 1), "TOLOWER": (_st.to_lower, 1),
    "SUBSTRING": (_st.substring, None),  # 2- or 3-arg
    "TRAILING_SUBSTRING": (_st.trailing_substring, 2),
    "STRING_OFFSET": (_st.string_offset, 2),
    "CONTAINS": (_st.string_contains, 2),
    "CONTAINS_CI": (_st.string_contains_ci, 2),
    "REPLACE": (_st.string_replace, 3),
    # date/time (µs semantics, datetime_fn)
    "UNIXTIMESTAMP": (_dtf.unix_timestamp, 1),
    "FROMUNIXTIME": (_dtf.from_unix_time, 1),
    "MAKEDATE": (_dtf.make_date, 3),
    "MAKEDATETIME": (_dtf.make_datetime, 6),
    "YEAR": (_dtf.year, 1), "QUARTER": (_dtf.quarter, 1),
    "MONTH": (_dtf.month, 1), "DAY": (_dtf.day, 1),
    "WEEKDAY": (_dtf.weekday, 1), "YEARDAY": (_dtf.yearday, 1),
    "HOUR": (_dtf.hour, 1), "MINUTE": (_dtf.minute, 1),
    "SECOND": (_dtf.second, 1), "MICROSECOND": (_dtf.microsecond, 1),
    "ADD_MINUTES": (_dtf.add_minutes, 2), "ADD_MINUTE": (_dtf.add_minute, 1),
    "ADD_DAYS": (_dtf.add_days, 2), "ADD_DAY": (_dtf.add_day, 1),
    "ADD_MONTHS": (_dtf.add_months, 2), "ADD_MONTH": (_dtf.add_month, 1),
    # hashing
    "FINGERPRINT": (_hash.fingerprint, None),
}


#: proto arity-overloaded date adders: 1 arg → add one unit, 2 → add n
_ADD_OVERLOADS = {
    "ADD_MINUTE": (_dtf.add_minute, _dtf.add_minutes),
    "ADD_DAY": (_dtf.add_day, _dtf.add_days),
    "ADD_MONTH": (_dtf.add_month, _dtf.add_months),
}


def _const_python(node: dict) -> Any:
    """A CONSTANT node's raw python value (for parameter positions like
    cast targets and regexp patterns)."""
    if not (isinstance(node, dict) and "constant" in node):
        raise ValueError(f"expected a constant parameter node, got {node!r}")
    return node["constant"]["value"]


def expression_from_json(node: dict) -> Column:
    """Deserialize one expression node (recursively) into a Column.

    Structural/arity errors raise ValueError here — the reference's
    binding-error stage (ERROR_ATTRIBUTE_* / bad proto,
    build_expression_from_proto.cc) — while type errors surface from
    Catalyst when the Column binds to a DataFrame."""
    if not isinstance(node, dict) or len(node) != 1:
        raise ValueError(f"expression node must have exactly one kind: {node!r}")
    kind, body = next(iter(node.items()))

    if kind == "variable":
        from pyspark.sql import functions as F

        if not isinstance(body, str):
            raise ValueError(f"variable needs an attribute name, got {body!r}")
        return F.col(body)

    if kind == "constant":
        t = str(body.get("type", "")).upper()
        if t not in _CONST_BUILDERS:
            raise ValueError(f"unknown constant type {t!r} (one of {sorted(_CONST_BUILDERS)})")
        if body.get("value") is None:
            return _t.null(_TYPE_NAMES[t])
        return _CONST_BUILDERS[t](body["value"])

    if kind == "operation":
        name = str(body.get("operator", "")).upper()
        args = body.get("arguments", [])
        # parameterized operators: leading CONSTANT args are parameters
        if name in ("CAST_TO", "CAST", "PARSE_STRING_NULLING", "PARSE_STRING_QUIET"):
            t = str(_const_python(args[0])).upper()
            # reference type names map via the table; anything else passes
            # through as a Spark DDL type (engine extension, e.g.
            # DECIMAL(12,2)) and is validated by Catalyst at bind
            target = _TYPE_NAMES.get(t, t.lower())
            fn = {"CAST_TO": _lg.cast_to, "CAST": _lg.cast_to,
                  "PARSE_STRING_NULLING": _lg.parse_string_nulling,
                  "PARSE_STRING_QUIET": _lg.parse_string_quiet}[name]
            return fn(target, expression_from_json(args[1]))
        if name in ("REGEXP_PARTIAL_MATCH", "REGEXP_FULL_MATCH",
                    "REGEXP_EXTRACT"):
            # reference layout: argument(0)=expr, argument(1)=constant
            # STRING pattern (MakeRegexpOperation)
            if len(args) != 2:
                raise ValueError(f"{name} takes 2 arguments, got {len(args)}")
            fn = {"REGEXP_PARTIAL_MATCH": _re.regexp_partial_match,
                  "REGEXP_FULL_MATCH": _re.regexp_full_match,
                  "REGEXP_EXTRACT": _re.regexp_extract}[name]
            return fn(expression_from_json(args[0]), str(_const_python(args[1])))
        if name == "REGEXP_REPLACE":
            # reference layout: (expr, pattern-constant, replacement-expr);
            # constant replacements pass as strings, anything else binds as
            # a Column (Spark regexp_replace accepts both)
            if len(args) != 3:
                raise ValueError(f"REGEXP_REPLACE takes 3 arguments, got {len(args)}")
            rep = args[2]
            replacement = (str(_const_python(rep))
                           if isinstance(rep, dict) and "constant" in rep
                           else expression_from_json(rep))
            return _re.regexp_replace(
                expression_from_json(args[0]),
                str(_const_python(args[1])), replacement,
            )
        if name == "CONCATENATE_WITH_SEPARATOR":
            return _st.concat_with_separator(
                str(_const_python(args[0])),
                *[expression_from_json(a) for a in args[1:]],
            )
        if name == "IN":
            return _cmp.in_(
                expression_from_json(args[0]),
                [_const_python(a) for a in args[1:]],
            )
        if name == "CASE":
            # reference layout: (selector, default, when1, then1, ...) —
            # BoundCase rejects odd argument counts
            # (elementary_bound_expressions.cc:1305-1311)
            if len(args) < 2 or len(args) % 2 != 0:
                raise ValueError(
                    f"CASE expects an even argument count ≥ 2 "
                    f"(selector, default, when/then pairs), got {len(args)}")
            cols = [expression_from_json(a) for a in args]
            subject, default = cols[0], cols[1]
            when_then = list(zip(cols[2::2], cols[3::2]))
            return _lg.case(subject, *when_then, default=default)
        if name == "HASH":
            return _hash.hash_with_seed(
                expression_from_json(args[1]), int(_const_python(args[0]))
            )
        if name in _ADD_OVERLOADS:
            # proto arity overloading: ADD_MINUTE/ADD_DAY/ADD_MONTH take 1
            # arg (add one unit) or 2 (add n units) under ONE enum name
            # (build_expression_from_proto.cc:612-633)
            one, many = _ADD_OVERLOADS[name]
            cols = [expression_from_json(a) for a in args]
            if len(cols) == 1:
                return one(cols[0])
            if len(cols) == 2:
                return many(*cols)
            raise ValueError(f"{name} takes 1 or 2 arguments, got {len(args)}")
        if name not in _OPS:
            raise ValueError(f"unknown operator {name!r}")
        fn, arity = _OPS[name]
        if arity is not None and len(args) != arity:
            raise ValueError(f"{name} takes {arity} arguments, got {len(args)}")
        return fn(*[expression_from_json(a) for a in args])

    raise ValueError(f"unknown node kind {kind!r} (constant|variable|operation)")


def expressions_from_json(named: dict[str, dict]) -> dict[str, Column]:
    """Deserialize a {output_name: expression_tree} map — the select-list
    form ``operators.core.compute`` takes."""
    return {name: expression_from_json(tree) for name, tree in named.items()}
