"""Protobuf *text-format* ingestion for §2.8 wire parity.

The reference serializes expression trees as ``common.ExpressionDescription``
protos (utils/proto/expressions.proto:292-303) and deserializes them with
``BuildExpressionFromProto`` (serialization/build_expression_from_proto.cc:754).
A user holding such a proto in protobuf *text format* (the human-readable
``type: OPERATION operation { ... }`` rendering) can feed it straight to
:func:`expression_from_textproto` — no protobuf runtime required.  The
parser below implements the subset of text-format syntax the message family
uses (scalar fields, enum identifiers, quoted strings with C escapes,
nested messages with ``{}`` or ``<>`` delimiters, repeated fields, ``#``
comments) and maps the parsed tree onto the JSON grammar of
:mod:`supersonic_spark.functions.serde`, so both wire shapes share one
semantic deserializer.

Value conventions follow the proto (expressions.proto:22-39 and
utils/proto/types.proto): ``date_value`` is int32 days since epoch,
``datetime_value`` int64 MICROSECONDS since epoch, a Constant with no
``*_value`` field set is NULL, and ``data_type_value`` carries the target
type of CAST/PARSE_STRING as a DataType enum riding in argument 0
(build_expression_from_proto.cc:474,505).
"""

from __future__ import annotations

import datetime as _dt
import re
from typing import Any

from pyspark.sql import Column

from supersonic_spark.functions.serde import expression_from_json

# ------------------------------------------------------------- tokenizer

_TOKEN_RE = re.compile(
    r"""
    \s+                                   # whitespace
  | \#[^\n]*                              # comment
  | (?P<str>"(?:\\.|[^"\\])*"|'(?:\\.|[^'\\])*')
  | (?P<punct>[{}<>:,;])
  | (?P<word>[A-Za-z_][A-Za-z0-9_]*)
  | (?P<num>-?(?:0x[0-9a-fA-F]+|\d+\.\d*(?:[eE][-+]?\d+)?|\.\d+(?:[eE][-+]?\d+)?|\d+(?:[eE][-+]?\d+)?|inf|nan))
    """,
    re.VERBOSE,
)

_ESCAPES = {
    "n": "\n", "t": "\t", "r": "\r", "a": "\a", "b": "\b", "f": "\f",
    "v": "\v", "\\": "\\", "'": "'", '"': '"', "?": "?",
}


def _unquote(tok: str) -> str:
    body = tok[1:-1]
    out, i = [], 0
    while i < len(body):
        ch = body[i]
        if ch != "\\":
            out.append(ch)
            i += 1
            continue
        nxt = body[i + 1]
        if nxt in _ESCAPES:
            out.append(_ESCAPES[nxt])
            i += 2
        elif nxt == "x":
            j = i + 2
            while j < len(body) and j < i + 4 and body[j] in "0123456789abcdefABCDEF":
                j += 1
            out.append(chr(int(body[i + 2 : j], 16)))
            i = j
        elif nxt.isdigit():  # octal, up to 3 digits
            j = i + 1
            while j < len(body) and j < i + 4 and body[j] in "01234567":
                j += 1
            out.append(chr(int(body[i + 1 : j], 8)))
            i = j
        else:
            raise ValueError(f"bad escape \\{nxt} in text-format string")
    return "".join(out)


def _tokenize(text: str) -> list[tuple[str, str]]:
    toks, pos = [], 0
    while pos < len(text):
        m = _TOKEN_RE.match(text, pos)
        if not m:
            raise ValueError(f"text-format syntax error at char {pos}: {text[pos:pos+20]!r}")
        pos = m.end()
        for kind in ("str", "punct", "word", "num"):
            if m.group(kind) is not None:
                toks.append((kind, m.group(kind)))
                break
    return toks


# ------------------------------------------------------------- parser

class _Parser:
    """Text format → dict with repeated fields accumulated into lists.

    Every field is stored as a list (proto3 text format gives no local
    arity information); consumers index [0] for singular fields."""

    def __init__(self, toks: list[tuple[str, str]]):
        self.toks = toks
        self.i = 0

    def _peek(self):
        return self.toks[self.i] if self.i < len(self.toks) else (None, None)

    def _next(self):
        tok = self._peek()
        if tok[0] is None:
            raise ValueError("unexpected end of text-format input")
        self.i += 1
        return tok

    def parse_message(self, closer: str | None = None) -> dict[str, list[Any]]:
        msg: dict[str, list[Any]] = {}
        while True:
            kind, val = self._peek()
            if kind is None:
                if closer is None:
                    return msg
                raise ValueError(f"missing closing {closer!r}")
            if kind == "punct" and val == closer:
                self._next()
                return msg
            if kind != "word":
                raise ValueError(f"expected field name, got {val!r}")
            self._next()
            field = val
            kind2, val2 = self._peek()
            if kind2 == "punct" and val2 == ":":
                self._next()
                kind3, val3 = self._peek()
                if kind3 == "punct" and val3 in "{<":
                    self._next()
                    value: Any = self.parse_message("}" if val3 == "{" else ">")
                else:
                    value = self._scalar()
            elif kind2 == "punct" and val2 in "{<":
                self._next()
                value = self.parse_message("}" if val2 == "{" else ">")
            else:
                raise ValueError(f"expected ':' or '{{' after field {field!r}")
            msg.setdefault(field, []).append(value)
            kind4, val4 = self._peek()
            if kind4 == "punct" and val4 in ",;":  # optional separators
                self._next()

    def _scalar(self) -> Any:
        kind, val = self._next()
        if kind == "str":
            out = _unquote(val)
            # adjacent string literals concatenate (C-style)
            while self._peek()[0] == "str":
                out += _unquote(self._next()[1])
            return out
        if kind == "word":
            if val in ("true", "True"):
                return True
            if val in ("false", "False"):
                return False
            return val  # enum identifier
        if kind == "num":
            if val.lower().startswith(("0x", "-0x")):
                return int(val, 16)
            if any(c in val for c in ".eE") or val in ("inf", "-inf", "nan"):
                return float(val)
            return int(val)
        raise ValueError(f"expected a scalar value, got {val!r}")


def parse_text_format(text: str) -> dict[str, list[Any]]:
    """Parse protobuf text format into a {field: [values...]} tree."""
    return _Parser(_tokenize(text)).parse_message()


# ------------------------------------------------------------- mapping

#: Constant ``*_value`` field → JSON constant type (expressions.proto:27-38)
_VALUE_FIELDS = {
    "int32_value": "INT32",
    "int64_value": "INT64",
    "uint32_value": "UINT32",
    "uint64_value": "UINT64",
    "float_value": "FLOAT",
    "double_value": "DOUBLE",
    "bool_value": "BOOL",
    "date_value": "DATE",
    "datetime_value": "DATETIME",
    "binary_value": "BINARY",
    "string_value": "STRING",
    "data_type_value": "DATA_TYPE",
}

#: OperationType spellings that differ from the serde layer's OperatorId.
#: The engine runs with a pinned UTC session timezone (session.py runtime
#: conf), so the proto's *_LOCAL and *_UTC extractor pairs resolve to the
#: same µs-exact implementations.
_OP_ALIASES = {
    "REGEXP_PARTIAL": "REGEXP_PARTIAL_MATCH",
    "REGEXP_FULL": "REGEXP_FULL_MATCH",
    "CONCATENATE_SEPARATED": "CONCATENATE_WITH_SEPARATOR",
    "PARSE_STRING": "PARSE_STRING_NULLING",  # reference default policy
    **{f"{base}_{tz}": base
       for base in ("YEAR", "MONTH", "DAY", "WEEKDAY", "YEARDAY",
                    "HOUR", "MINUTE", "QUARTER")
       for tz in ("LOCAL", "UTC")},
}

_EPOCH_DATE = _dt.date(1970, 1, 1)
_EPOCH_DT = _dt.datetime(1970, 1, 1)


def _one(msg: dict, field: str, ctx: str):
    vals = msg.get(field, [])
    if len(vals) != 1:
        raise ValueError(f"{ctx}: field {field!r} must appear exactly once, got {len(vals)}")
    return vals[0]


def _constant_to_json(c: dict) -> dict:
    ctype = str(_one(c, "type", "Constant"))
    set_fields = [f for f in _VALUE_FIELDS if f in c]
    if len(set_fields) > 1:
        raise ValueError(f"Constant sets multiple values: {set_fields}")
    if not set_fields:  # no *_value ⇒ NULL of the declared type
        return {"constant": {"type": ctype, "value": None}}
    field = set_fields[0]
    val = c[field][0]
    if field == "date_value":  # int32 days since epoch (types.proto:17)
        val = (_EPOCH_DATE + _dt.timedelta(days=int(val))).isoformat()
    elif field == "datetime_value":  # int64 µs since epoch (types.proto:18)
        val = (_EPOCH_DT + _dt.timedelta(microseconds=int(val))).isoformat()
    elif field == "binary_value":
        val = val.encode("latin-1") if isinstance(val, str) else bytes(val)
    elif field == "data_type_value":
        # the CAST/PARSE target type rides as a constant (bep.cc:474,505);
        # the serde layer reads it positionally via its raw value
        return {"constant": {"type": "DATA_TYPE", "value": str(val)}}
    return {"constant": {"type": _VALUE_FIELDS[field], "value": val}}


def description_to_json(desc: dict) -> dict:
    """ExpressionDescription message tree → the serde JSON grammar."""
    etype = str(_one(desc, "type", "ExpressionDescription"))
    if etype == "CONSTANT":
        return _constant_to_json(_one(desc, "constant", "CONSTANT node"))
    if etype == "VARIABLE":
        var = _one(desc, "variable", "VARIABLE node")
        return {"variable": str(_one(var, "name", "Variable"))}
    if etype == "OPERATION":
        op = _one(desc, "operation", "OPERATION node")
        name = str(_one(op, "type", "OperationDescription"))
        args = [description_to_json(a) for a in op.get("argument", [])]
        return {"operation": {"operator": _OP_ALIASES.get(name, name), "arguments": args}}
    if etype == "TUPLE":
        raise ValueError(
            "TUPLE deserializes to a SELECT LIST, not a single expression — "
            "use select_list_from_textproto / select_list_from_binaryproto "
            "(reference: BuildTupleFromProto → CompoundExpression, "
            "build_expression_from_proto.cc:737)"
        )
    raise ValueError(
        f"ExpressionDescription type {etype!r} unsupported "
        "(CONSTANT | VARIABLE | OPERATION | TUPLE; CUSTOM_FUNCTION_CALL is "
        "ERROR_NOT_IMPLEMENTED in the reference too "
        "(build_expression_from_proto.cc:731-735); PATH has no engine "
        "equivalent)"
    )


def tuple_to_select_list(desc: dict) -> dict[str, Any]:
    """TUPLE-typed ExpressionDescription → {output_name: json_tree} select
    list (the reference's CompoundExpression, BuildTupleFromProto,
    build_expression_from_proto.cc:737-752).  Unaliased entries get
    positional default names ``expr{i}``; the reference's AddAsMulti
    multi-alias form applies only to multi-output expressions, which every
    engine expression here is not — multiple aliases raise."""
    etype = str(_one(desc, "type", "ExpressionDescription"))
    if etype != "TUPLE":
        raise ValueError(f"expected a TUPLE ExpressionDescription, got {etype!r}")
    tup = _one(desc, "tuple", "TUPLE node")
    out: dict[str, Any] = {}
    for i, te in enumerate(tup.get("expression", [])):
        aliases = [str(a) for a in te.get("alias", [])]
        if len(aliases) > 1:
            raise ValueError(
                f"tuple expression {i}: multi-alias (AddAsMulti) needs a "
                "multi-output expression; scalar expressions take ≤1 alias"
            )
        name = aliases[0] if aliases else f"expr{i}"
        if name in out:
            raise ValueError(f"duplicate tuple output name {name!r}")
        out[name] = description_to_json(_one(te, "expression", f"tuple expr {i}"))
    return out


def select_list_from_textproto(text: str) -> "dict[str, Column]":
    """Text-format TUPLE ExpressionDescription → {name: Column} select list
    (feed to ``operators.core.compute``)."""
    from supersonic_spark.functions.serde import expressions_from_json

    return expressions_from_json(tuple_to_select_list(parse_text_format(text)))


def select_list_from_binaryproto(blob: bytes) -> "dict[str, Column]":
    """Binary-wire TUPLE ExpressionDescription → {name: Column} select list."""
    from supersonic_spark.functions.serde import expressions_from_json

    return expressions_from_json(
        tuple_to_select_list(_parse_wire_message(bytes(blob), _DESC_WIRE))
    )


def expression_from_textproto(text: str) -> Column:
    """Deserialize a text-format ``common.ExpressionDescription`` → Column.

    ``expression_from_textproto(t)`` ≡ ``expression_from_json(j)`` where j
    is the JSON rendering of the same tree — structural errors (unknown
    operator, wrong arity, malformed constant) surface as ValueError from
    the shared deserializer, text-format syntax errors from the parser."""
    return expression_from_json(description_to_json(parse_text_format(text)))


# ------------------------------------------------------------- binary wire

# Enum number → name tables, transcribed from the reference protos
# (utils/proto/expressions.proto ExpressionType/OperationType;
# utils/proto/types.proto DataType) — required to read the BINARY wire
# format, which carries enum NUMBERS.

_EXPRESSION_TYPE_NUM = {
    0: "CONSTANT", 1: "VARIABLE", 2: "OPERATION",
    3: "CUSTOM_FUNCTION_CALL", 4: "TUPLE", 5: "PATH",
}

_DATA_TYPE_NUM = {
    0: "STRING", 1: "INT32", 2: "INT64", 3: "UINT64", 4: "DATETIME",
    5: "DOUBLE", 6: "BOOL", 7: "BINARY", 8: "UINT32", 9: "FLOAT",
    10: "DATE", 11: "DATA_TYPE", 12: "NULL_TYPE", 13: "ENUM",
}

_OPERATION_TYPE_NUM = {
    0: "ADD", 1: "MULTIPLY", 2: "SUBTRACT", 36: "DIVIDE", 30: "CPP_DIVIDE",
    35: "DIVIDE_SIGNALING", 3: "DIVIDE_NULLING", 37: "DIVIDE_QUIET",
    4: "NEGATE", 5: "AND", 6: "OR", 7: "NOT", 8: "EQUAL", 9: "NOT_EQUAL",
    10: "GREATER", 11: "GREATER_OR_EQUAL", 12: "LESS", 13: "LESS_OR_EQUAL",
    14: "IS_NULL", 15: "REGEXP_PARTIAL", 25: "REGEXP_FULL",
    221: "REGEXP_EXTRACT", 222: "REGEXP_REPLACE", 16: "IN", 17: "CASE",
    18: "IF", 19: "CAST", 20: "IFNULL", 21: "MODULUS", 22: "IS_ODD",
    23: "IS_EVEN", 24: "AND_NOT", 26: "XOR", 50: "BITWISE_AND",
    51: "BITWISE_OR", 52: "BITWISE_NOT", 53: "BITWISE_XOR",
    54: "SHIFT_LEFT", 55: "SHIFT_RIGHT", 60: "COPY", 100: "ROUND_TO_INT",
    113: "ROUND", 101: "TRUNC", 102: "CEIL_TO_INT", 114: "CEIL",
    104: "FLOOR_TO_INT", 115: "FLOOR", 103: "EXP", 105: "LN", 108: "LOG",
    106: "LOG10", 120: "SQRT_SIGNALING", 121: "SQRT_NULLING",
    107: "SQRT_QUIET", 122: "SQRT", 109: "IS_FINITE", 110: "IS_INF",
    111: "IS_NAN", 112: "IS_NORMAL", 117: "SIN", 118: "COS", 119: "TAN",
    123: "PI", 124: "POWER_SIGNALING", 125: "POWER_NULLING",
    126: "POWER_QUIET", 150: "LENGTH", 151: "LTRIM", 152: "RTRIM",
    153: "TRIM", 154: "TOUPPER", 155: "TOLOWER", 156: "SUBSTRING",
    157: "CONCATENATE", 158: "TOSTRING", 159: "STRING_OFFSET",
    160: "REPLACE", 226: "PARSE_STRING", 170: "UNIXTIMESTAMP",
    171: "FROMUNIXTIME", 172: "MAKEDATE", 173: "YEAR_LOCAL",
    174: "MONTH_LOCAL", 175: "DAY_LOCAL", 176: "WEEKDAY_LOCAL",
    177: "YEARDAY_LOCAL", 178: "HOUR_LOCAL", 179: "MINUTE_LOCAL",
    180: "SECOND", 181: "MICROSECOND", 182: "QUARTER_LOCAL",
    228: "YEAR_UTC", 229: "MONTH_UTC", 230: "DAY_UTC", 231: "WEEKDAY_UTC",
    232: "YEARDAY_UTC", 233: "HOUR_UTC", 234: "MINUTE_UTC",
    235: "QUARTER_UTC", 183: "MAKEDATETIME", 184: "DATEDIFF",
    185: "DATETIMEDIFF", 223: "ADD_MINUTE", 201: "ADD_DAY",
    202: "ADD_WEEK", 203: "ADD_MONTH", 204: "ADD_YEAR",
    205: "TRUNC_TO_SECOND", 206: "TRUNC_TO_MINUTE", 207: "TRUNC_TO_HOUR",
    208: "TRUNC_TO_DAY", 209: "TRUNC_TO_MONTH", 210: "TRUNC_TO_QUARTER",
    211: "TRUNC_TO_YEAR", 189: "DATE_FORMAT_LOCAL", 227: "DATE_FORMAT_UTC",
    190: "FORMAT", 224: "RANDOM_INT32", 225: "SEQUENCE",
}

#: per-message wire schemas: field number → (name, kind).  Kinds: int
#: (signed varint), bool, f32, f64, str, bytes, enum:<table>, msg:<schema>
_CONSTANT_WIRE = {
    1: ("type", "enum:dt"), 2: ("int32_value", "int"), 3: ("int64_value", "int"),
    4: ("uint32_value", "int"), 5: ("uint64_value", "int"),
    6: ("float_value", "f32"), 7: ("double_value", "f64"),
    8: ("bool_value", "bool"), 9: ("date_value", "int"),
    10: ("datetime_value", "int"), 11: ("binary_value", "bytes"),
    12: ("string_value", "str"), 13: ("data_type_value", "enum:dt"),
}
_VARIABLE_WIRE = {1: ("name", "str")}
_OPERATION_WIRE = {1: ("type", "enum:op"), 2: ("argument", "msg:desc")}
_TUPLE_EXPR_WIRE = {1: ("expression", "msg:desc"), 2: ("alias", "str")}
_TUPLE_WIRE = {1: ("expression", "msg:tuple_expr")}
_DESC_WIRE = {
    1: ("type", "enum:expr"), 2: ("constant", "msg:const"),
    3: ("variable", "msg:var"), 4: ("operation", "msg:oper"),
    5: ("function_call", "bytes"), 6: ("tuple", "msg:tuple"),
    7: ("path", "bytes"),
}
_WIRE_SCHEMAS: dict[str, dict] = {
    "desc": _DESC_WIRE, "const": _CONSTANT_WIRE,
    "var": _VARIABLE_WIRE, "oper": _OPERATION_WIRE,
    "tuple": _TUPLE_WIRE, "tuple_expr": _TUPLE_EXPR_WIRE,
}
_ENUM_TABLES = {"dt": _DATA_TYPE_NUM, "op": _OPERATION_TYPE_NUM,
                "expr": _EXPRESSION_TYPE_NUM}


def _read_varint(buf: bytes, pos: int) -> tuple[int, int]:
    out = shift = 0
    while True:
        if pos >= len(buf):
            raise ValueError("truncated varint in binary proto")
        b = buf[pos]
        out |= (b & 0x7F) << shift
        pos += 1
        if not b & 0x80:
            return out, pos
        shift += 7
        if shift > 63:
            raise ValueError("varint longer than 64 bits")


def _parse_wire_message(buf: bytes, schema: dict) -> dict[str, list[Any]]:
    """Binary proto message → the same {field: [values]} tree the
    text-format parser produces (enum numbers resolved to names), so both
    wire shapes feed one mapping layer."""
    import struct as _struct

    msg: dict[str, list[Any]] = {}
    pos = 0
    while pos < len(buf):
        key, pos = _read_varint(buf, pos)
        field, wtype = key >> 3, key & 7
        if wtype == 0:
            raw, pos = _read_varint(buf, pos)
        elif wtype == 1:
            if pos + 8 > len(buf):
                raise ValueError("truncated fixed64")
            raw, pos = buf[pos : pos + 8], pos + 8
        elif wtype == 5:
            if pos + 4 > len(buf):
                raise ValueError("truncated fixed32")
            raw, pos = buf[pos : pos + 4], pos + 4
        elif wtype == 2:
            n, pos = _read_varint(buf, pos)
            if pos + n > len(buf):
                raise ValueError("truncated length-delimited field")
            raw, pos = buf[pos : pos + n], pos + n
        else:
            raise ValueError(f"unsupported wire type {wtype} (field {field})")
        if field not in schema:
            continue  # unknown fields skip, like any proto reader
        name, kind = schema[field]
        if kind == "int":
            val = raw - (1 << 64) if raw >= (1 << 63) else raw
        elif kind == "bool":
            val = bool(raw)
        elif kind == "f32":
            val = _struct.unpack("<f", raw)[0]
        elif kind == "f64":
            val = _struct.unpack("<d", raw)[0]
        elif kind == "str":
            val = raw.decode("utf-8")
        elif kind == "bytes":
            val = bytes(raw)
        elif kind.startswith("enum:"):
            table = _ENUM_TABLES[kind[5:]]
            if raw not in table:
                raise ValueError(f"unknown enum value {raw} for field {name!r}")
            val = table[raw]
        elif kind.startswith("msg:"):
            val = _parse_wire_message(raw, _WIRE_SCHEMAS[kind[4:]])
        else:  # pragma: no cover
            raise AssertionError(kind)
        msg.setdefault(name, []).append(val)
    return msg


def expression_from_binaryproto(blob: bytes) -> Column:
    """Deserialize a BINARY-serialized ``common.ExpressionDescription``
    (the actual proto wire bytes) → Column.  Same mapping layer as the
    text-format path; no protobuf runtime required."""
    return expression_from_json(
        description_to_json(_parse_wire_message(bytes(blob), _DESC_WIRE))
    )
