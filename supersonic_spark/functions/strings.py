"""String expressions — expression/core/string_expressions.h.

ToString (:29), Concat (:35), ConcatWithSeparator (:41), Length/Ltrim/Rtrim/
Trim/ToUpper/ToLower (:46-63), Substring/TrailingSubstring (1-based, negative
counts from the end, :70-81), StringOffset ≈ INSTR (:87),
StringContains{,CI} (:91-97), StringReplace (:102).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def _c(x) -> Column:
    return F.col(x) if isinstance(x, str) else x if isinstance(x, Column) else F.lit(x)


def to_string(a) -> Column:
    return _c(a).cast("string")


def concat(*cols) -> Column:
    return F.concat(*[_c(c) for c in cols])


def concat_with_separator(sep: str, *cols) -> Column:
    return F.concat_ws(sep, *[_c(c) for c in cols])


def length(a) -> Column:
    # Reference LENGTH counts bytes of the StringPiece; for ASCII test data
    # char-length == byte-length.  Spark `length` is char-based (documented
    # deviation for non-ASCII; use octet_length for byte parity).
    return F.length(_c(a))


def ltrim(a) -> Column:
    return F.ltrim(_c(a))


def rtrim(a) -> Column:
    return F.rtrim(_c(a))


def trim(a) -> Column:
    return F.trim(_c(a))


def to_upper(a) -> Column:
    return F.upper(_c(a))


def to_lower(a) -> Column:
    return F.lower(_c(a))


def substring(a, pos, length=None) -> Column:
    """1-based; negative ``pos`` counts from the end
    (string_expressions.h:70-81) — identical to Spark ``substr``."""
    c = _c(a)
    if length is None:
        return c.substr(_c(pos), F.length(c))
    return c.substr(_c(pos), _c(length))


def trailing_substring(a, pos) -> Column:
    """TrailingSubstring(s, pos) — suffix starting at (possibly negative)
    1-based pos (string_expressions.h:76-81)."""
    return substring(a, pos)


def string_offset(haystack, needle) -> Column:
    """StringOffset ≈ INSTR: 1-based position, 0 if absent
    (string_expressions.h:87)."""
    return F.instr(_c(haystack), _c(needle))


def string_contains(haystack, needle) -> Column:
    return _c(haystack).contains(_c(needle))


def string_contains_ci(haystack, needle) -> Column:
    return F.lower(_c(haystack)).contains(F.lower(_c(needle)))


def string_replace(haystack, needle, substitute) -> Column:
    """StringReplace — replaces all occurrences (string_expressions.h:102)."""
    return F.replace(_c(haystack), _c(needle), _c(substitute))
