"""Join operators — SURVEY.md §2.3.

HashJoinOperation (cursor/core/hash_join.h:35-69): equi-join, INNER or
LEFT_OUTER (hash_join.h:37-38; RIGHT/FULL are declared in the proto but
unimplemented in the reference — we expose them anyway as a superset since
Spark gives them for free).  The reference materializes the ENTIRE right side
into a hash index (hash_join.cc:91-95,603) — the Spark analog of that
build-side choice is a broadcast hint; with ``unique_right`` (KeyUniqueness,
hash_join.h:44-45) or an explicit ``broadcast_right`` we hint broadcast,
otherwise Catalyst/AQE picks broadcast vs shuffled-hash vs sort-merge from
statistics, which is strictly better at 100 TB.

RowidMergeJoin (rowid_merge_join.h:24-49): positional inner join of a sorted
INT64 key against the right side's row id, with referential-integrity
enforcement.

ForeignFilter (foreign_filter.h:21-48): semi-join of an FK column against a
filtered key set, rewriting the FK to the filter's new row-id ordinals.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from supersonic_spark.operators.projector import as_projector


def hash_join(
    left: DataFrame,
    right: DataFrame,
    on,
    how: str = "inner",
    unique_right: bool = False,
    broadcast_right: bool | None = None,
    left_projector=None,
    right_projector=None,
) -> DataFrame:
    """HashJoinOperation.  ``on`` is a column name, list of names, or a join
    Column.  ``left_projector``/``right_projector`` mirror the reference's
    result projectors (hash_join.h:41-43) — column pruning *before* the join
    so the shuffle moves only what the result needs."""
    if left_projector is not None:
        keep = as_projector(left_projector)
        names = on if isinstance(on, list) else [on] if isinstance(on, str) else []
        left = left.select(*dedup_cols(keep.columns(left), names, left))
    if right_projector is not None:
        keep = as_projector(right_projector)
        names = on if isinstance(on, list) else [on] if isinstance(on, str) else []
        right = right.select(*dedup_cols(keep.columns(right), names, right))
    if broadcast_right is None:
        broadcast_right = unique_right
    if broadcast_right:
        right = F.broadcast(right)
    return left.join(right, on=on, how=how)


def dedup_cols(cols: list[Column], key_names, df: DataFrame) -> list[Column]:
    """Ensure join keys survive a projector that dropped them."""
    have = {df.select(c).columns[0] for c in cols}
    out = list(cols)
    for k in key_names or []:
        if k not in have and k in df.columns:
            out.append(F.col(k))
    return out


def lookup_join(
    probe: DataFrame,
    index: DataFrame,
    on,
    query_id_order=None,
    query_id_col: str = "query_id",
) -> DataFrame:
    """LookupIndex / MultiLookup (cursor/base/lookup_index.h:23-80): point
    lookups of a probe block against an index, carrying a ``query_ids``
    side-vector that says which probe row each match belongs to.

    Spark form: broadcast-hash inner join with an explicit probe row-id
    column (the query_ids vector).  ``query_id_order`` defines the probe
    row-id assignment (row-id discipline, SURVEY.md §7.4)."""
    from supersonic_spark.operators.rowid import with_row_id

    if query_id_order is not None:
        probe = with_row_id(probe, query_id_order, query_id_col)
    return probe.join(F.broadcast(index), on=on, how="inner")


def rowid_merge_join(
    left: DataFrame,
    left_key: str,
    right: DataFrame,
    right_order,
    check_integrity: bool = False,
) -> DataFrame:
    """RowidMergeJoin (rowid_merge_join.h:24-49): inner join of ``left_key``
    (INT64, the reference requires it sorted — irrelevant under hash join)
    against the ROW ID of ``right`` under ``right_order``.

    ``check_integrity=True`` reproduces the reference's referential-integrity
    error (dangling left key ⇒ failure) — costs one extra action.
    """
    from supersonic_spark.operators.rowid import with_row_id

    rid = "__ss_rid"
    indexed = with_row_id(right, right_order, rid)
    if check_integrity:
        dangling = left.join(indexed, left[left_key] == indexed[rid], "left_anti").count()
        if dangling:
            raise ValueError(
                f"rowid_merge_join: {dangling} left rows reference missing row ids "
                "(reference signals ERROR on broken referential integrity)"
            )
    out = left.join(indexed, left[left_key] == indexed[rid], "inner").drop(rid)
    return out


def foreign_filter(
    fact: DataFrame,
    fk: str,
    dim_filtered: DataFrame,
    key: str,
    renumber: bool = True,
) -> DataFrame:
    """ForeignFilter (foreign_filter.h:21-48): keep fact rows whose ``fk``
    survives in the filtered dimension key set; optionally rewrite ``fk`` to
    the filtered dimension's new 0-based ordinal (the reference always
    renumbers — example at foreign_filter.h:36-40).

    The keyset join is broadcast when small (Catalyst decides); renumbering
    uses the scalable row-id pass over the (small) dimension only.
    """
    from supersonic_spark.operators.rowid import with_row_id

    if not renumber:
        keys = dim_filtered.select(F.col(key)).distinct()
        return fact.join(keys, fact[fk] == keys[key], "left_semi")
    rid = "__ss_new_fk"
    numbered = with_row_id(dim_filtered.select(key).distinct(), [key], rid)
    out = (
        fact.join(numbered, fact[fk] == numbered[key], "inner")
        .drop(fk, key)
        .withColumnRenamed(rid, fk)
    )
    return out
