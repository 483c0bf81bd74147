"""Stream-combination operators — SURVEY.md §2.6.

MergeUnionAll (merge_union_all.h:30-45): k-way merge of same-schema inputs
sorted on a shared SortOrder.  The merge-of-sorted-streams is a single-node
implementation detail; the *semantic* result is UNION ALL + that order, and
Spark's union + range-partitioned sort reproduces it with distributed
parallelism (the reference is explicit that blockwise vs row-wise merging is
an internal tradeoff, merge_union_all.cc:33).

Coalesce (coalesce.h:17-40): HORIZONTAL zip — output schema is the
concatenation of all children's attributes, row i with row i (not SQL
COALESCE).  Needs row-id discipline on both sides.

BufferedSplitter/BarrierSplitter (splitter.h:44-99): DAG fan-out of one
cursor to N readers — Spark DataFrames are natively re-usable in N branches;
`.cache()` is the buffering knob.

Also exposed (absent in the reference, free in Spark — SURVEY.md §2.6):
intersect / except / distinct.
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from supersonic_spark.operators.sort import _keys


def merge_union_all(inputs: list[DataFrame], order: list) -> DataFrame:
    """MergeUnionAll — UNION ALL of same-schema inputs, result sorted on
    ``order`` (merge_union_all.h:30-45)."""
    if not inputs:
        raise ValueError("merge_union_all needs ≥1 input")
    unioned = reduce(lambda a, b: a.unionByName(b), inputs)
    return unioned.orderBy(*_keys(order))


def coalesce_zip(inputs: list[DataFrame], orders: list, row_id: str = "__ss_zip") -> DataFrame:
    """Coalesce (coalesce.h:17-40) — positional zip of equal-length streams.

    ``orders[i]`` defines input i's row order (the reference zips physical
    order; SURVEY.md §7.4 requires it explicit here).  Column names must be
    disjoint across inputs, like the reference (schema concat).
    """
    from supersonic_spark.operators.rowid import with_row_id

    if len(inputs) < 2:
        raise ValueError("coalesce_zip needs ≥2 inputs")
    indexed = [with_row_id(df, orders[i], row_id) for i, df in enumerate(inputs)]
    out = indexed[0]
    for nxt in indexed[1:]:
        out = out.join(nxt, on=row_id, how="inner")
    return out.drop(row_id)


def splitter(df: DataFrame) -> DataFrame:
    """BufferedSplitter (splitter.h:99) — fan one stream out to N consumers.
    Spark shares lineage natively; caching buffers it once like the
    reference's buffered variant."""
    return df.cache()


def distinct(df: DataFrame) -> DataFrame:
    return df.distinct()


def intersect(a: DataFrame, b: DataFrame) -> DataFrame:
    return a.intersect(b)


def except_all(a: DataFrame, b: DataFrame) -> DataFrame:
    return a.exceptAll(b)


def union_all(inputs: list[DataFrame]) -> DataFrame:
    """UNION ALL of same-schema inputs (by name).  The reference declares
    PARALLEL_UNION (cursors.proto:38) without an open-source implementation
    — in Spark a plain union IS parallel: each input's partitions scan
    concurrently with no interleaving guarantee (append MergeUnionAll's
    order contract when determinism is needed)."""
    out = inputs[0]
    for df in inputs[1:]:
        out = out.unionByName(df)
    return out


def upsert_latest(
    existing: DataFrame,
    updates: DataFrame,
    keys: list[str],
    order_col: str,
    tiebreak: str | None = None,
) -> DataFrame:
    """CDC-style upsert merge: one surviving row per key from
    ``existing ∪ updates`` — the one with the greatest ``order_col``
    (version/timestamp); on exact order ties the updates side wins, then
    ``tiebreak`` (give one whenever order_col can collide — it makes the
    merge fully deterministic).  Output schema = input schema.

    Scale shape: a single aggregation (max_by over a lexicographic
    (order, src, tiebreak) struct) — one shuffle on the merge key.  The
    struct buffer makes Spark plan it as a partial+final SortAggregate,
    but the partial pass still discards superseded versions map-side, so
    the exchange carries at most one candidate row per key per task —
    unlike a row_number() window, which shuffles every version.
    """
    cols = existing.columns
    a = existing.select(*cols).withColumn("__src", F.lit(0))
    b = updates.select(*cols).withColumn("__src", F.lit(1))
    u = a.unionByName(b)
    order = [F.col(order_col), F.col("__src")]
    if tiebreak is not None:
        order.append(F.col(tiebreak))
    payload = F.struct(*[F.col(c) for c in cols])
    merged = u.groupBy(*[F.col(x) for x in keys]).agg(
        F.max_by(payload, F.struct(*order)).alias("__row")
    )
    return merged.select(*[F.col(f"__row.{c}").alias(c) for c in cols])
