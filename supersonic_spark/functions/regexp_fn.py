"""Regexp expressions — expression/core/regexp_expressions.h (RE2-backed).

RegexpPartialMatch (:28-35), RegexpFullMatch (:37-44), RegexpReplace — all
occurrences (:46-50), RegexpExtract — first match (:63-66).

Dialect note (SURVEY.md §7.4 item 4): the reference uses RE2, Spark uses
Java regex.  For the shared core (char classes, anchors, quantifiers,
alternation, capture groups) the dialects agree; RE2's lack of backreferences
is *more* restrictive, so any reference-legal pattern that avoids `\\C`-style
escapes behaves identically here.  Tests pin the common corpus.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def _c(x) -> Column:
    return F.col(x) if isinstance(x, str) else x if isinstance(x, Column) else F.lit(x)


def regexp_partial_match(s, pattern: str) -> Column:
    """True if the pattern matches anywhere (RE2 PartialMatch) — `rlike`."""
    return _c(s).rlike(pattern)


def regexp_full_match(s, pattern: str) -> Column:
    """True if the pattern matches the whole string (RE2 FullMatch)."""
    p = pattern
    if not p.startswith("^"):
        p = "^" + p
    if not p.endswith("$"):
        p = p + "$"
    return _c(s).rlike(p)


def regexp_replace(s, pattern: str, rewrite: str) -> Column:
    """Replaces ALL occurrences (regexp_expressions.h:46-50) — Spark
    regexp_replace is also global."""
    return F.regexp_replace(_c(s), pattern, rewrite)


def regexp_extract(s, pattern: str, group: int = 1) -> Column:
    """First match of capture group (regexp_expressions.h:63-66).

    Reference semantics: NULL when no match.  Spark returns '' on no match,
    so wrap to NULL for parity (empty-capture of a real match also becomes
    NULL — acceptable corner documented here)."""
    out = F.regexp_extract(_c(s), pattern, group)
    return F.when(out != "", out)
