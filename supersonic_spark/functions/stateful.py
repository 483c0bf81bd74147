"""Stateful (order-dependent) expressions — expression/core/
stateful_expressions.h; bound impls stateful_bound_expressions.cc:802-904.

Changed (:30-39), RunningSum (:41-45), Smudge = fill-forward/LOCF (:47-52),
RunningMinWithFlush (:54-61), SmudgeIf (:64-69).

The reference evaluates these sequentially over the cursor's row order.
Spark has no implicit row order, so every function here takes an explicit
``order`` (list of Columns) and REQUIRED ``partition`` keys — the contract
SURVEY.md §7.4 item 1 requires.  With ``partition`` keys, state resets per
partition key and the computation scales horizontally.  The reference's
single-stream row-order semantics (one global window — the window stage
runs in ONE task) must be OPTED INTO by passing the ``GLOBAL`` sentinel:
a single-task plan over 100 TB is a stall, so it is never the default.

All implementations are pure window expressions (JVM-side, no UDFs).
"""

from __future__ import annotations

from pyspark.sql import Column, Window, WindowSpec
from pyspark.sql import functions as F

#: Opt-in sentinel for the reference's single-stream semantics: one global
#: ordered window, which plans as a SINGLE task.  Correct for small or
#: pre-aggregated data; a deliberate choice, never a default.
GLOBAL = object()


def _c(x) -> Column:
    return F.col(x) if isinstance(x, str) else x


def _cols(xs) -> list[Column]:
    if xs is None:
        return []
    if not isinstance(xs, (list, tuple)):
        xs = [xs]
    return [_c(x) for x in xs]


def _window(order, partition) -> WindowSpec:
    if partition is GLOBAL:
        return Window.partitionBy().orderBy(*_cols(order))
    if not partition:
        raise ValueError(
            "stateful expressions require explicit partition keys; pass "
            "partition=GLOBAL to opt into the reference's single-stream "
            "semantics (one global window = ONE task — not a scale plan)"
        )
    return Window.partitionBy(*_cols(partition)).orderBy(*_cols(order))


def changed(col, order, partition=None) -> Column:
    """Changed — true when the value differs from the previous row's value;
    the first row is always 'changed' (stateful_expressions.h:30-39).
    NULL-safe: NULL→NULL counts as unchanged, NULL→x as changed."""
    w = _window(order, partition)
    c = _c(col)
    prev = F.lag(c).over(w)
    first = F.row_number().over(w) == 1
    return first | ~prev.eqNullSafe(c)


def running_sum(col, order, partition=None) -> Column:
    """RunningSum — cumulative sum; NULL inputs contribute 0 but (unlike the
    reference's doc ambiguity) yield the running total, matching
    stateful_bound_expressions.cc behaviour of skipping NULLs."""
    w = _window(order, partition).rowsBetween(Window.unboundedPreceding, 0)
    return F.sum(_c(col)).over(w)


def smudge(col, order, partition=None) -> Column:
    """Smudge — fill-forward: each NULL takes the last non-NULL value before
    it (LOCF; stateful_expressions.h:47-52)."""
    w = _window(order, partition).rowsBetween(Window.unboundedPreceding, 0)
    return F.last(_c(col), ignorenulls=True).over(w)


def smudge_if(col, cond, order, partition=None) -> Column:
    """SmudgeIf — like Smudge but a row is overwritten by the previous row's
    (possibly smudged) value whenever ``cond`` holds (stateful_expressions.h:
    64-69).  Rows where cond holds inherit; rows where it doesn't anchor."""
    w = _window(order, partition).rowsBetween(Window.unboundedPreceding, 0)
    anchored = F.when(~F.coalesce(_c(cond), F.lit(False)), _c(col))
    return F.last(anchored, ignorenulls=True).over(w)


def running_min_with_flush(col, flush, order, partition=None) -> Column:
    """RunningMinWithFlush — running minimum that restarts after each row
    where ``flush`` is true (stateful_expressions.h:54-61).

    Segment id = cumulative count of prior flushes; min over the segment.
    """
    w = _window(order, partition)
    flush_int = F.coalesce(_c(flush).cast("int"), F.lit(0))
    # segment increments on the row AFTER a flush → sum of flushes over
    # rows strictly before the current row.
    seg = F.coalesce(
        F.sum(flush_int).over(w.rowsBetween(Window.unboundedPreceding, -1)),
        F.lit(0),
    )
    w_seg_order = _cols(order)
    part = ([] if partition is GLOBAL else _cols(partition)) + [seg]
    w2 = (
        Window.partitionBy(*part)
        .orderBy(*w_seg_order)
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    return F.min(_c(col)).over(w2)
