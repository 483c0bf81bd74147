"""Comparison expressions — expression/core/comparison_expressions.h.

Equal/NotEqual/Less/LessOrEqual/Greater/GreaterOrEqual (:28-65) and In
(:75-91; bound impl with binary search on constant lists and SQL NULL
semantics, comparison_bound_expressions.cc:135-406).

Spark's operators already implement identical SQL ternary comparison
semantics; these wrappers exist so operator-layer code and user code can be
written against the reference vocabulary.  ``Column.isin`` matches the
reference's In NULL rules (NULL needle → NULL; no match but NULL in list →
NULL is *not* modelled by the reference — its list is a constant non-null
set, comparison_expressions.h:78-80).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def _c(x) -> Column:
    return F.col(x) if isinstance(x, str) else x if isinstance(x, Column) else F.lit(x)


def equal(a, b) -> Column:
    return _c(a) == _c(b)


def not_equal(a, b) -> Column:
    return _c(a) != _c(b)


def less(a, b) -> Column:
    return _c(a) < _c(b)


def less_or_equal(a, b) -> Column:
    return _c(a) <= _c(b)


def greater(a, b) -> Column:
    return _c(a) > _c(b)


def greater_or_equal(a, b) -> Column:
    return _c(a) >= _c(b)


def in_(needle, haystack) -> Column:
    """In (comparison_expressions.h:75-91).  ``haystack`` is a constant
    list (the reference requires constant expressions and pre-sorts them
    for binary search — Catalyst folds/optimizes `isin` the same way,
    using a hash set for long lists)."""
    return _c(needle).isin(list(haystack))
