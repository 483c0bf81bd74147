"""Aggregation operators — SURVEY.md §2.4.

Aggregate functions (Aggregation enum, proto/supersonic.proto:91-99):
SUM MIN MAX COUNT CONCAT FIRST LAST, each with optional DISTINCT
(cursor/core/aggregate.h:118-123) and optional explicit output type
(:127-134; defaults: COUNT→UINT64 (here: long), else input type,
aggregate.h:107-109).  NULL handling: aggregations ignore NULL inputs except
COUNT(*); NULL is a valid grouping-key value (aggregate_groups.cc:516-519) —
both match Spark semantics exactly.

Operators:
- GroupAggregate (aggregate.h:224-228) → groupBy().agg()
- ScalarAggregate (aggregate.h:338-345) → global agg (1 row even on empty)
- BoundGroupAggregateWithLimit (aggregate.h:267-276) → key-cap + overflow row
- BestEffortGroupAggregate / AggregateClusters / HybridGroupAggregate
  (aggregate.h:233-336) are physical strategies Spark already performs
  (partial aggregation, sort-based agg, spilling, distinct rewrite —
  SURVEY.md §4.1); they intentionally share this one logical surface.

Order-dependent aggregations (CONCAT/FIRST/LAST) take an ``order_by``
argument per SURVEY.md §7.4 item 1: without it the reference's result would
depend on cursor order, which Spark doesn't have.
"""

from __future__ import annotations

import enum
from dataclasses import dataclass

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


class Aggregation(enum.Enum):
    """proto/supersonic.proto:91-99."""

    SUM = "SUM"
    MIN = "MIN"
    MAX = "MAX"
    COUNT = "COUNT"
    CONCAT = "CONCAT"
    FIRST = "FIRST"
    LAST = "LAST"


@dataclass(frozen=True)
class AggSpec:
    """One AggregationSpecification element (aggregate.h:118-134)."""

    function: Aggregation
    input: str | None  # None == COUNT(*) (aggregate.h: count w/o input)
    output: str
    distinct: bool = False
    separator: str = ","  # CONCAT separator (aggregation_operators.h:230-233)
    order_by: tuple = ()  # explicit order for CONCAT/FIRST/LAST
    output_type: str | None = None  # explicit output type (aggregate.h:127-134)


def _one_agg(s: AggSpec) -> Column:
    c = F.col(s.input) if s.input is not None else None
    fn = s.function
    if fn is Aggregation.COUNT:
        if c is None:
            out = F.count(F.lit(1))
        elif s.distinct:
            out = F.count_distinct(c)
        else:
            out = F.count(c)
    elif fn is Aggregation.SUM:
        out = F.sum_distinct(c) if s.distinct else F.sum(c)
    elif fn is Aggregation.MIN:
        out = F.min(c)
    elif fn is Aggregation.MAX:
        out = F.max(c)
    elif fn is Aggregation.CONCAT:
        out = _concat_agg(c, s)
    elif fn is Aggregation.FIRST:
        out = _first_last(c, s, first=True)
    elif fn is Aggregation.LAST:
        out = _first_last(c, s, first=False)
    else:  # pragma: no cover
        raise ValueError(fn)
    if s.output_type:
        out = out.cast(s.output_type)
    return out.alias(s.output)


def _concat_agg(c: Column, s: AggSpec) -> Column:
    """CONCAT — string-concat with separator (aggregation_operators.h:230-233).

    Deterministic only given ``order_by`` (sorts the collected structs by the
    order keys JVM-side); with DISTINCT the value set is sorted by value.
    """
    if s.distinct:
        arr = F.array_sort(F.collect_set(c.cast("string")))
        return F.array_join(arr, s.separator)
    if s.order_by:
        order_cols = [F.col(o) if isinstance(o, str) else o for o in s.order_by]
        packed = F.array_sort(F.collect_list(F.struct(*order_cols, c.cast("string").alias("__v"))))
        return F.array_join(F.transform(packed, lambda x: x["__v"]), s.separator)
    return F.array_join(F.collect_list(c.cast("string")), s.separator)


def _first_last(c: Column, s: AggSpec, first: bool) -> Column:
    """FIRST/LAST — order-defined given ``order_by`` via min_by/max_by over a
    packed order key (single shuffle, no window)."""
    if not s.order_by:
        return F.first(c) if first else F.last(c)
    order_cols = [F.col(o) if isinstance(o, str) else o for o in s.order_by]
    key = F.struct(*order_cols)
    return F.min_by(c, key) if first else F.max_by(c, key)


def group_aggregate(df: DataFrame, keys: list, specs: list[AggSpec]) -> DataFrame:
    """GroupAggregate (aggregate.h:224-228): empty input ⇒ empty output
    (aggregate.h:218-221 — matches Spark groupBy on empty input)."""
    key_cols = [F.col(k) if isinstance(k, str) else k for k in keys]
    return df.groupBy(*key_cols).agg(*[_one_agg(s) for s in specs])


def scalar_aggregate(df: DataFrame, specs: list[AggSpec]) -> DataFrame:
    """ScalarAggregate (aggregate.h:338-345): exactly one row even on empty
    input — matches Spark's global agg."""
    return df.agg(*[_one_agg(s) for s in specs])


# --- physical-strategy aliases -------------------------------------------
# The reference exposes four *physical* aggregation strategies with one
# logical meaning; Spark chooses the strategy itself (partial agg, sort-agg,
# spilling, distinct rewrite — SURVEY.md §4.1), so these are aliases kept so
# reference users can port call sites 1:1.

def best_effort_group_aggregate(df: DataFrame, keys: list, specs: list[AggSpec]) -> DataFrame:
    """BestEffortGroupAggregate (aggregate.h:233-250): map-side partial
    aggregation before a shuffle.  Spark's HashAggregate(partial→final)
    does exactly this automatically; semantics equal GroupAggregate."""
    return group_aggregate(df, keys, specs)


def aggregate_clusters(df: DataFrame, keys: list, specs: list[AggSpec]) -> DataFrame:
    """AggregateClusters (aggregate.h:278-295): streaming sort-based
    aggregation over key-clustered input.  Clustering is a physical
    precondition, not a semantic change — Catalyst picks SortAggregate
    when the child ordering allows."""
    return group_aggregate(df, keys, specs)


def hybrid_group_aggregate(df: DataFrame, keys: list, specs: list[AggSpec]) -> DataFrame:
    """HybridGroupAggregate (aggregate.h:320-336): out-of-core aggregation
    with the DISTINCT NULL-fanout rewrite (aggregate_groups.cc:492-533) —
    Catalyst's RewriteDistinctAggregates + automatic spilling."""
    return group_aggregate(df, keys, specs)


def group_aggregate_with_limit(
    df: DataFrame,
    keys: list[str],
    specs: list[AggSpec],
    limit: int,
    key_order=None,
) -> DataFrame:
    """BoundGroupAggregateWithLimit (aggregate.h:267-276; NEWS v0.9.4):
    aggregate only the first ``limit`` unique keys; every other row is lumped
    into a single overflow row (keys = NULL).

    'First' is cursor-order in the reference; here the kept keys are the
    ``limit`` smallest by ``key_order`` (default: the keys themselves) —
    the explicit-order contract.  Implementation: aggregate everything
    (one shuffle), pick winners with distributed top-k (TakeOrdered — no
    single-task global window even at billions of distinct keys), then
    split losers out with a broadcast null-safe anti-join (winners are
    ≤ ``limit`` rows, small by definition).
    """
    agged = group_aggregate(df, keys, specs)
    order_cols = [F.col(k) for k in (key_order or keys)]
    winners = agged.orderBy(*order_cols).limit(limit)
    # NULL is a valid grouping-key value (aggregate_groups.cc:516-519) —
    # the anti-join must match it, hence eqNullSafe instead of `on=keys`.
    cond = None
    for k in keys:
        c = agged[k].eqNullSafe(winners[k])
        cond = c if cond is None else (cond & c)
    losers = agged.join(F.broadcast(winners), on=cond, how="left_anti")
    # Re-aggregate the loser rows into one overflow row with NULL keys.
    # Only SUM/COUNT/MIN/MAX re-aggregate losslessly from partials; the
    # reference has the same composition because its overflow row is built
    # by continued aggregation into one accumulator row.
    refold = []
    for s in specs:
        if s.function in (Aggregation.SUM, Aggregation.MIN, Aggregation.MAX):
            refold.append(AggSpec(s.function, s.output, s.output))
        elif s.function is Aggregation.COUNT:
            refold.append(AggSpec(Aggregation.SUM, s.output, s.output, output_type="long"))
        elif s.function is Aggregation.CONCAT:
            refold.append(AggSpec(Aggregation.CONCAT, s.output, s.output, separator=s.separator))
        else:  # FIRST/LAST degrade to FIRST/LAST of partials
            refold.append(AggSpec(s.function, s.output, s.output))
    overflow = scalar_aggregate(losers, refold)
    for k in keys:
        overflow = overflow.withColumn(k, F.lit(None).cast(agged.schema[k].dataType))
    # refolded aggregates can widen (e.g. decimal precision growth on
    # re-SUM); align to the winners' schema for the union.
    overflow = overflow.select(
        *[F.col(c).cast(agged.schema[c].dataType).alias(c) for c in agged.columns]
    )
    # empty loser set would still produce one all-NULL row from the scalar
    # aggregate — drop it (COUNT>0 when available, else any-non-null).
    counts = [s.output for s in specs if s.function is Aggregation.COUNT]
    if counts:
        guard = F.col(counts[0]) > 0
    else:
        guard = F.lit(False)
        for s in specs:
            guard = guard | F.col(s.output).isNotNull()
    return winners.unionByName(overflow.filter(guard))


# --- skew handling (beyond-reference; 100 TB mandate) --------------------

#: per-function (partial, combine) decompositions for two-phase aggregation
_DECOMPOSABLE = {
    Aggregation.SUM: (Aggregation.SUM, Aggregation.SUM),
    Aggregation.COUNT: (Aggregation.COUNT, Aggregation.SUM),
    Aggregation.MIN: (Aggregation.MIN, Aggregation.MIN),
    Aggregation.MAX: (Aggregation.MAX, Aggregation.MAX),
}


def salted_group_aggregate(
    df: DataFrame, keys: list[str], specs: list[AggSpec], salt_buckets: int = 16
) -> DataFrame:
    """GroupAggregate for heavy-hitter key skew: aggregate on
    (keys, salt) first, then combine per key.

    One mega-key no longer lands on one reducer — its rows spread over
    ``salt_buckets`` partial groups.  Salt is deterministic (xxhash64 of the
    whole row), so results are stable across runs.  Only decomposable
    aggregations (SUM/COUNT/MIN/MAX, no DISTINCT) qualify; others raise.
    Note Spark's map-side partial aggregation already absorbs most skew for
    these functions — reach for this when partial agg is defeated (high
    per-partition key cardinality) or under AQE-less engines.
    """
    for s in specs:
        if s.function not in _DECOMPOSABLE or s.distinct:
            raise ValueError(
                f"{s.function.name}{' DISTINCT' if s.distinct else ''} is not "
                "decomposable for salted aggregation"
            )
    salt = F.pmod(F.xxhash64(F.struct(*[F.col(c) for c in df.columns])), F.lit(salt_buckets))
    phase1 = df.withColumn("__salt", salt).groupBy(
        *[F.col(k) for k in keys], F.col("__salt")
    )
    p1_specs, p2_aggs = [], []
    for s in specs:
        pfn, cfn = _DECOMPOSABLE[s.function]
        p1_specs.append(_one_agg(AggSpec(pfn, s.input, s.output)))
        combined = _one_agg(AggSpec(cfn, s.output, s.output, output_type=s.output_type))
        p2_aggs.append(combined)
    partial = phase1.agg(*p1_specs)
    return partial.groupBy(*[F.col(k) for k in keys]).agg(*p2_aggs)


def salted_join(
    left: DataFrame,
    right: DataFrame,
    on: list[str],
    salt_buckets: int = 16,
    how: str = "inner",
) -> DataFrame:
    """Equi-join under heavy left-side key skew: left rows get a
    deterministic salt, the right side is replicated ``salt_buckets``×, and
    the join key becomes (keys, salt) — splitting each hot key's rows
    across ``salt_buckets`` tasks.

    Right-side replication multiplies its shuffle volume — use when the
    right side is modest but too big to broadcast and the left has hot
    keys.  (With AQE on, prefer letting skew-join handle sort-merge skew;
    this is the explicit form.)
    """
    salt = F.pmod(F.xxhash64(F.struct(*[F.col(c) for c in left.columns])), F.lit(salt_buckets))
    l_salted = left.withColumn("__salt", salt)
    r_salted = right.withColumn(
        "__salt", F.explode(F.sequence(F.lit(0), F.lit(salt_buckets - 1)).cast("array<long>"))
    )
    return l_salted.join(r_salted, on=on + ["__salt"], how=how).drop("__salt")


def group_aggregate_rollup(df: DataFrame, keys: list, specs: list[AggSpec]) -> DataFrame:
    """ROLLUP superset (absent in the reference — SURVEY.md §2.4: Spark
    gives hierarchical subtotals for free; exposed for parity-plus)."""
    key_cols = [F.col(k) if isinstance(k, str) else k for k in keys]
    return df.rollup(*key_cols).agg(*[_one_agg(s) for s in specs])


def group_aggregate_cube(df: DataFrame, keys: list, specs: list[AggSpec]) -> DataFrame:
    """CUBE superset — all grouping-set combinations."""
    key_cols = [F.col(k) if isinstance(k, str) else k for k in keys]
    return df.cube(*key_cols).agg(*[_one_agg(s) for s in specs])


def group_aggregate_grouping_sets(
    df: DataFrame, sets: list[list[str]], keys: list[str], specs: list[AggSpec]
) -> DataFrame:
    """Explicit GROUPING SETS — the generic form of rollup/cube: aggregate
    once per listed key subset, absent keys NULL.  One pass over the data
    (Spark expands the sets map-side — same Expand trick as the reference's
    DISTINCT NULL-fanout, hybrid_group_utils.h:15-50)."""
    key_cols = [F.col(k) for k in keys]
    set_cols = [[F.col(k) for k in s] for s in sets]
    return df.groupingSets(set_cols, *key_cols).agg(*[_one_agg(s) for s in specs])


def approx_distinct_aggregate(
    df: DataFrame, keys: list, input_col: str, output: str, rsd: float = 0.05
) -> DataFrame:
    """Approximate COUNT DISTINCT (HyperLogLog++).  The reference's proto
    reserves an estimated-distinct knob but never implements estimation
    (proto/specification.proto:33-37) — this completes that intent; at
    100 TB an exact count-distinct is a full shuffle of the key domain,
    HLL is a constant-size sketch merge."""
    key_cols = [F.col(k) if isinstance(k, str) else k for k in keys]
    return df.groupBy(*key_cols).agg(F.approx_count_distinct(input_col, rsd).alias(output))


def heavy_hitters(
    df: DataFrame, col: str, min_share: float = 0.01, max_keys: int = 100
) -> DataFrame:
    """Keys whose row share is ≥ ``min_share``: (key, n, share), heaviest
    first, capped at ``max_keys``.

    The skew-diagnosis companion to :func:`salted_group_aggregate` /
    :func:`salted_join` — run it on a join/group key before committing a
    plan shape at scale.  Exact counts via one partial-aggregated shuffle
    (the candidate set is bounded because at most 1/min_share keys can
    exceed the share), then distributed top-k.  The corpus total rides the
    same plan as a broadcast scalar (1-row aggregate cross-join) — one
    lazy job end to end, no separate count() action.
    """
    counted = df.groupBy(F.col(col).alias("key")).agg(F.count(F.lit(1)).alias("n"))
    total = counted.agg(F.sum("n").alias("__total"))
    out = (
        counted.crossJoin(F.broadcast(total))
        .withColumn("share", F.col("n") / F.col("__total").cast("double"))
        .filter(F.col("share") >= min_share)
        .drop("__total")
    )
    return out.orderBy(F.col("n").desc(), F.col("key")).limit(max_keys)


#: aggregation functions whose partial states merge by re-aggregating
#: (COUNT merges via SUM of the partial counts)
_MERGEABLE = {
    Aggregation.SUM: F.sum,
    Aggregation.COUNT: F.sum,
    Aggregation.MIN: F.min,
    Aggregation.MAX: F.max,
}


def merge_agg_states(state: DataFrame, other: DataFrame, keys: list, specs: list[AggSpec]) -> DataFrame:
    """Merge two aggregate states produced by ``group_aggregate(…, keys,
    specs)`` into one (the algebraic-aggregate merge step the reference
    documents as the caller's job after BestEffortGroupAggregate,
    aggregate.h:237-241).  Only SUM/COUNT/MIN/MAX are mergeable —
    DISTINCT/CONCAT/FIRST/LAST states are not algebraic; raise upfront.
    """
    for s in specs:
        if s.function not in _MERGEABLE or s.distinct:
            raise ValueError(f"{s.function.value} state is not mergeable (col {s.output})")
    key_cols = [F.col(k) if isinstance(k, str) else k for k in keys]
    u = state.unionByName(other)
    return u.groupBy(*key_cols).agg(
        *[_MERGEABLE[s.function](F.col(s.output)).alias(s.output) for s in specs]
    )


def incremental_group_aggregate(
    state: DataFrame, delta: DataFrame, keys: list, specs: list[AggSpec]
) -> DataFrame:
    """Incremental aggregate refresh: fold a batch of NEW raw rows into an
    existing aggregate state without rescanning history — the maintenance
    loop of a 100 TB rollup table (state is per-key-sized; only the delta
    is scanned).

    ``state`` must be a prior ``group_aggregate(history, keys, specs)``
    result (or an empty DataFrame with that schema); mergeable specs only.
    Scale shape: one partial-agg shuffle over the delta + one merge
    shuffle keyed the same — AQE coalesces; history is never read.
    """
    d = group_aggregate(delta, keys, specs)
    return merge_agg_states(state, d, keys, specs)
