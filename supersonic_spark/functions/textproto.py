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

#: OperationType spellings that differ from the serde layer's OperatorId
_OP_ALIASES = {
    "REGEXP_PARTIAL": "REGEXP_PARTIAL_MATCH",
    "REGEXP_FULL": "REGEXP_FULL_MATCH",
    "CONCATENATE_SEPARATED": "CONCATENATE_WITH_SEPARATOR",
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
    raise ValueError(
        f"ExpressionDescription type {etype!r} unsupported "
        "(CONSTANT | VARIABLE | OPERATION; CUSTOM_FUNCTION_CALL/TUPLE/PATH "
        "have no engine equivalent — the reference deserializer rejects them too)"
    )


def expression_from_textproto(text: str) -> Column:
    """Deserialize a text-format ``common.ExpressionDescription`` → Column.

    ``expression_from_textproto(t)`` ≡ ``expression_from_json(j)`` where j
    is the JSON rendering of the same tree — structural errors (unknown
    operator, wrong arity, malformed constant) surface as ValueError from
    the shared deserializer, text-format syntax errors from the parser."""
    return expression_from_json(description_to_json(parse_text_format(text)))
