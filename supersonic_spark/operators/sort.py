"""Sort / ExtendedSort / Limit-on-sort — SURVEY.md §2.5.

Sort (cursor/core/sort.h:89-98) with per-column ASC/DESC (ColumnOrder,
proto/supersonic.proto:102-105); NULL ordering: the reference partitions
NULLs to one end before comparing (sort.cc:44-46,72-77) — exposed here as
``nulls_first`` per key.  ExtendedSort (sort.h:103-106) adds per-key
case-insensitivity and a LIMIT (spec proto/specification.proto:12-30) —
sort+limit plans as TakeOrderedAndProject (true distributed top-k, no global
sort materialization).  SortPermutation (sort.h:39-67) returns the would-be
row ids without reordering payload data.

External/spilling sort (sort.h:69-92, Merger/Sorter) is Spark's
UnsafeExternalSorter — automatic, no surface needed (SURVEY.md §4.2).
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


@dataclass(frozen=True)
class SortKey:
    """One ColumnOrder entry (+ ExtendedSort's case_sensitivity,
    specification.proto:12-30)."""

    column: str
    ascending: bool = True
    nulls_first: bool = True
    case_insensitive: bool = False

    def to_column(self) -> Column:
        c = F.col(self.column)
        if self.case_insensitive:
            c = F.lower(c)
        if self.ascending:
            return c.asc_nulls_first() if self.nulls_first else c.asc_nulls_last()
        return c.desc_nulls_first() if self.nulls_first else c.desc_nulls_last()


def _keys(order) -> list[Column]:
    out = []
    for k in order:
        if isinstance(k, SortKey):
            out.append(k.to_column())
        elif isinstance(k, str):
            out.append(F.col(k).asc_nulls_first())
        else:
            out.append(k)
    return out


def sort(df: DataFrame, order: list) -> DataFrame:
    """Sort (sort.h:89-98).  Total sort ⇒ range-partitioned shuffle; at
    scale prefer extended_sort(limit=...) (top-k) or sortWithinPartitions
    when only per-partition order is needed."""
    return df.orderBy(*_keys(order))


def extended_sort(df: DataFrame, order: list, limit: int | None = None) -> DataFrame:
    """ExtendedSort (sort.h:103-106): per-key case-insensitivity + LIMIT.
    With a limit Spark plans TakeOrderedAndProject — each task keeps a
    k-heap, only k rows per partition cross the wire."""
    out = df.orderBy(*_keys(order))
    if limit is not None:
        out = out.limit(limit)
    return out


def sort_permutation(df: DataFrame, order: list, name: str = "permutation") -> DataFrame:
    """SortPermutation (sort.h:39-67) — attach the rank each row would take
    under ``order`` without reordering the data."""
    from supersonic_spark.operators.rowid import with_row_id

    return with_row_id(df, _keys(order), name)
