"""Data-quality operators (beyond-reference: supersonic's only integrity
check is RowidMergeJoin's referential-integrity error,
cursor/core/rowid_merge_join.h:24-49 — there is no profiling or
constraint-validation surface).  At 100 TB these run as pre-flight gates
before a pipeline trusts its inputs.

Scale notes:
- ``column_profile`` computes every per-column statistic in ONE scan (a
  single global aggregate with map-side partials), then unpivots the 1-row
  result driver-side — no per-column jobs, no shuffle of data rows;
- ``validate_constraints`` fuses all row-level checks (not_null / range /
  regex / custom predicate) into one conditional-sum scan; uniqueness adds
  one aggregation on its key; foreign keys add one semi-join profile per
  FK (broadcast when the parent is a dim).  The report is a handful of
  rows regardless of input size.
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def column_profile(df: DataFrame, cols: list[str] | None = None) -> DataFrame:
    """Per-column statistics in one scan: ``column_name``, ``n_rows``,
    ``n_null``, ``n_distinct`` (exact), ``min_val`` / ``max_val`` /
    ``avg_val`` (numeric columns; NULL otherwise — all DOUBLE so the
    report has one schema).

    Exact distincts make this a multi-count-distinct aggregate; Catalyst
    plans it with one Expand (same NULL-fanout trick as the reference's
    hybrid aggregation, SURVEY.md §4.1) so it stays a single scan.  For
    quick looks at petabyte inputs swap in approx_count_distinct upstream.
    """
    cols = cols or df.columns
    numeric = {
        f.name
        for f in df.schema.fields
        if f.dataType.typeName()
        in ("integer", "long", "short", "byte", "double", "float", "decimal")
    }
    aggs: list[Column] = [F.count(F.lit(1)).alias("__n")]
    for c in cols:
        aggs.append(F.sum(F.col(c).isNull().cast("long")).alias(f"__null_{c}"))
        aggs.append(F.count_distinct(F.col(c)).alias(f"__nd_{c}"))
        if c in numeric:
            aggs.append(F.min(F.col(c)).cast("double").alias(f"__min_{c}"))
            aggs.append(F.max(F.col(c)).cast("double").alias(f"__max_{c}"))
            aggs.append(F.avg(F.col(c)).cast("double").alias(f"__avg_{c}"))
    one = df.agg(*aggs)
    stack_parts = []
    for c in cols:
        mn = f"`__min_{c}`" if c in numeric else "CAST(NULL AS DOUBLE)"
        mx = f"`__max_{c}`" if c in numeric else "CAST(NULL AS DOUBLE)"
        av = f"`__avg_{c}`" if c in numeric else "CAST(NULL AS DOUBLE)"
        stack_parts.append(f"'{c}', `__n`, `__null_{c}`, `__nd_{c}`, {mn}, {mx}, {av}")
    stacked = one.selectExpr(
        f"stack({len(cols)}, {', '.join(stack_parts)}) AS "
        "(column_name, n_rows, n_null, n_distinct, min_val, max_val, avg_val)"
    )
    return stacked


@dataclass
class Constraint:
    """One validation rule.  ``kind`` ∈ not_null | range | regex |
    predicate | unique | foreign_key."""

    name: str
    kind: str
    column: str | None = None
    lo: float | None = None
    hi: float | None = None
    pattern: str | None = None
    predicate: Column | None = None
    keys: list[str] = field(default_factory=list)
    parent: DataFrame | None = None
    parent_keys: list[str] = field(default_factory=list)


def not_null(name: str, column: str) -> Constraint:
    return Constraint(name, "not_null", column=column)


def in_range(name: str, column: str, lo: float, hi: float) -> Constraint:
    return Constraint(name, "range", column=column, lo=lo, hi=hi)


def matches(name: str, column: str, pattern: str) -> Constraint:
    return Constraint(name, "regex", column=column, pattern=pattern)


def satisfies(name: str, predicate: Column) -> Constraint:
    return Constraint(name, "predicate", predicate=predicate)


def unique(name: str, keys: list[str]) -> Constraint:
    return Constraint(name, "unique", keys=keys)


def foreign_key(
    name: str, keys: list[str], parent: DataFrame, parent_keys: list[str]
) -> Constraint:
    return Constraint(name, "foreign_key", keys=keys, parent=parent, parent_keys=parent_keys)


def validate_constraints(df: DataFrame, constraints: list[Constraint]) -> DataFrame:
    """Violation report: one row per constraint — ``constraint_name``,
    ``n_violations`` (int64).  0 everywhere ⇒ the input passes.

    Row-level kinds (not_null/range/regex/predicate) fuse into a single
    conditional-sum scan.  ``unique`` counts rows beyond the first per key
    (n_rows − n_distinct keys — rides the same scan as a second aggregate
    on the key).  ``foreign_key`` counts child rows whose key misses the
    parent (left-anti count; NULL FKs are not violations, matching SQL FK
    semantics).
    """
    row_level: list[Column] = []
    extras: list[DataFrame] = []
    for c in constraints:
        if c.kind == "not_null":
            bad = F.col(c.column).isNull()
        elif c.kind == "range":
            bad = ~F.col(c.column).between(F.lit(c.lo), F.lit(c.hi)) | F.col(
                c.column
            ).isNull()
        elif c.kind == "regex":
            bad = ~F.col(c.column).rlike(c.pattern) | F.col(c.column).isNull()
        elif c.kind == "predicate":
            bad = ~F.coalesce(c.predicate, F.lit(False))
        elif c.kind == "unique":
            extras.append(
                df.groupBy(*[F.col(k) for k in c.keys])
                .agg(F.count(F.lit(1)).alias("__n"))
                .agg(
                    F.lit(c.name).alias("constraint_name"),
                    F.sum(F.col("__n") - F.lit(1)).cast("long").alias("n_violations"),
                )
                .select(
                    "constraint_name",
                    F.coalesce(F.col("n_violations"), F.lit(0)).alias("n_violations"),
                )
            )
            continue
        elif c.kind == "foreign_key":
            child = df.select(*[F.col(k) for k in c.keys]).na.drop()
            parent = c.parent.select(
                *[F.col(pk).alias(k) for pk, k in zip(c.parent_keys, c.keys)]
            ).dropDuplicates()
            extras.append(
                child.join(parent, on=c.keys, how="left_anti").agg(
                    F.lit(c.name).alias("constraint_name"),
                    F.count(F.lit(1)).cast("long").alias("n_violations"),
                )
            )
            continue
        else:
            raise ValueError(f"unknown constraint kind: {c.kind}")
        row_level.append(F.sum(bad.cast("long")).cast("long").alias(c.name))

    parts: list[DataFrame] = []
    if row_level:
        one = df.agg(*row_level)
        names = [c.name for c in constraints if c.kind in ("not_null", "range", "regex", "predicate")]
        stack = ", ".join(f"'{n}', coalesce(`{n}`, CAST(0 AS BIGINT))" for n in names)
        parts.append(
            one.selectExpr(
                f"stack({len(names)}, {stack}) AS (constraint_name, n_violations)"
            )
        )
    parts.extend(extras)
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out
