"""Analytics operators beyond the reference's surface (supersonic has no
window functions, pivot, or percentiles at all — SURVEY.md §2.7 notes the
stateful expressions are its only window-like capability).  These are the
standard OLAP shapes a user migrating from any engine expects, expressed
as thin operator-layer wrappers so they compose with the rest.

Scale notes:
- ranking windows shuffle once on the partition keys; a global (no-key)
  window funnels through one task — callers get a warning-by-docstring to
  pre-aggregate or add keys at corpus scale;
- pivot with an explicit value list avoids the extra distinct-scan pass
  Spark otherwise runs to discover column values;
- percentiles: ``exact=True`` uses percentile() (sort-based, exact — fine
  per group); ``exact=False`` uses approx_percentile (t-digest sketch,
  single pass, mergeable — the 100 TB default).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def _c(x) -> Column:
    return F.col(x) if isinstance(x, str) else x


def _cols(xs) -> list[Column]:
    if xs is None:
        return []
    if not isinstance(xs, (list, tuple)):
        xs = [xs]
    return [_c(x) for x in xs]


#: name -> zero-arg ranking function
_RANKERS = {
    "row_number": F.row_number,
    "rank": F.rank,
    "dense_rank": F.dense_rank,
    "percent_rank": F.percent_rank,
    "cume_dist": F.cume_dist,
}


def window_rank(
    df: DataFrame,
    partition,
    order,
    rankers: dict[str, str],
    ntile: dict[str, int] | None = None,
) -> DataFrame:
    """Append ranking columns over a (partition, order) window.

    ``rankers`` maps output column -> one of row_number | rank | dense_rank
    | percent_rank | cume_dist; ``ntile`` maps output column -> bucket
    count.  One shuffle on the partition keys; rows stay intact.
    """
    w = Window.partitionBy(*_cols(partition)).orderBy(*_cols(order))
    out = df
    for name, kind in rankers.items():
        try:
            fn = _RANKERS[kind]
        except KeyError:
            raise ValueError(f"unknown ranker {kind!r}; one of {sorted(_RANKERS)}")
        out = out.withColumn(name, fn().over(w))
    for name, n in (ntile or {}).items():
        out = out.withColumn(name, F.ntile(n).over(w))
    return out


def window_navigation(
    df: DataFrame,
    partition,
    order,
    exprs: dict[str, Column],
) -> DataFrame:
    """Append navigation/offset window columns (lead/lag/ntile/first/
    nth_value…) over a (partition, order) window.

    ``exprs`` maps output column -> an un-windowed Column like
    ``F.lag("value")`` — ``.over(w)`` is applied here so every listed
    expression shares ONE Window node (one shuffle on the partition keys,
    one sort, however many navigation outputs).  Offset functions
    (lead/lag) ignore frames; running functions (first/ntile) use the
    default growing frame — same default as ANSI engines."""
    w = Window.partitionBy(*_cols(partition)).orderBy(*_cols(order))
    out = df
    for name, col in exprs.items():
        out = out.withColumn(name, col.over(w))
    return out


def top_n_per_group(
    df: DataFrame, partition, order, n: int, rank_col: str = "rn"
) -> DataFrame:
    """Keep the first ``n`` rows of each group under ``order`` — the
    classic top-N-per-key.  Uses row_number (deterministic given a total
    order), filtered before anything downstream so only n×groups rows
    survive the window stage."""
    w = Window.partitionBy(*_cols(partition)).orderBy(*_cols(order))
    return df.withColumn(rank_col, F.row_number().over(w)).filter(
        F.col(rank_col) <= n
    )


def pivot_table(
    df: DataFrame,
    keys: list[str],
    pivot_col: str,
    values: list,
    agg: Column,
) -> DataFrame:
    """Pivot ``pivot_col``'s values into columns, aggregated by ``agg``.
    ``values`` is REQUIRED (the implicit-discovery form runs an extra
    distinct job over the corpus first — never acceptable at scale)."""
    return df.groupBy(*_cols(keys)).pivot(pivot_col, values).agg(agg)


def percentile_aggregate(
    df: DataFrame,
    keys: list[str],
    value_col: str,
    percentiles: list[float],
    exact: bool = False,
    accuracy: int = 10000,
    prefix: str = "p",
) -> DataFrame:
    """Grouped percentiles: one output column per requested percentile
    (``p50``, ``p95``, …).  ``exact`` trades a per-group sort for exact
    interpolated values; the default approx_percentile is a single-pass
    mergeable sketch (map-side combined) — the scale path."""
    v = _c(value_col)
    aggs = []
    for p in percentiles:
        name = f"{prefix}{int(p * 100) if (p * 100) == int(p * 100) else p}"
        if exact:
            aggs.append(F.percentile(v, F.lit(p)).alias(name))
        else:
            aggs.append(
                F.percentile_approx(v, F.lit(p), F.lit(accuracy)).alias(name)
            )
    return df.groupBy(*_cols(keys)).agg(*aggs)


def moving_window_agg(
    df: DataFrame,
    partition,
    order,
    aggs: dict[str, Column],
    frame: tuple[int | None, int | None] = (-6, 0),
    range_frame: bool = False,
) -> DataFrame:
    """Frame-spec window aggregation (moving sums/averages/extrema).

    ``aggs`` maps output column -> an aggregate Column (e.g. ``F.sum(x)``)
    evaluated over the (partition, order, frame) window.  ``frame`` is
    (start, end) offsets with None = unbounded; ``range_frame`` switches
    ROWS -> RANGE.  One shuffle on the partition keys; Spark evaluates all
    frames in a single Window node.

    Determinism: give ``order`` a total order (tie-break!) or equal-key
    frames are nondeterministic under ROWS.
    """
    lo = Window.unboundedPreceding if frame[0] is None else frame[0]
    hi = Window.unboundedFollowing if frame[1] is None else frame[1]
    w = Window.partitionBy(*_cols(partition)).orderBy(*_cols(order))
    w = w.rangeBetween(lo, hi) if range_frame else w.rowsBetween(lo, hi)
    out = df
    for name, a in aggs.items():
        out = out.withColumn(name, a.over(w))
    return out


def funnel(
    df: DataFrame,
    user_col,
    ts_col,
    step_col,
    steps: list,
) -> DataFrame:
    """Ordered-funnel analysis: per user, the earliest time of each step
    and how deep the user got through ``steps`` in strict time order
    (step i counts only if its first occurrence is strictly after step
    i-1's).

    Output: user_col, t_0..t_{n-1} (first-occurrence timestamps, NULL if
    the step never fired), depth (0..n).

    Scale shape: one conditional-MIN aggregation shuffled on the user key —
    no self-joins, no per-step scans; event order is resolved by MIN, not
    by sorting the raw stream.
    """
    u = _c(user_col)
    ts = _c(ts_col)
    step = _c(step_col)
    mins = [
        F.min(F.when(step == s, ts)).alias(f"t_{i}") for i, s in enumerate(steps)
    ]
    per_user = df.groupBy(u).agg(*mins)
    depth = F.lit(0)
    reached = F.lit(True)
    prev = None
    for i in range(len(steps)):
        t_i = F.col(f"t_{i}")
        ok = t_i.isNotNull() if prev is None else t_i.isNotNull() & (t_i > prev)
        reached = reached & ok
        depth = F.when(reached, i + 1).otherwise(depth)
        prev = t_i
    # build depth outermost-first: the expression above nests WHENs so the
    # deepest satisfied step wins
    return per_user.withColumn("depth", depth)


def cohort_retention(
    df: DataFrame,
    user_col,
    ts_col,
    granularity: str = "week",
) -> DataFrame:
    """Cohort retention: users bucketed by the period of their first event;
    for each (cohort, period offset) the number of distinct users active.

    Output: cohort (period-start timestamp), offset (int periods since the
    cohort period), n_users.

    Scale shape: two shuffles — per-user first-event MIN (user key), then
    the distinct (user, period) activity matrix grouped by (cohort,
    offset).  No window functions; everything is hash aggregation.
    """
    if granularity not in ("day", "week", "month"):
        raise ValueError(granularity)
    u = _c(user_col)
    ts = _c(ts_col)
    period = F.date_trunc(granularity, ts)
    firsts = df.groupBy(u.alias("__user")).agg(
        F.date_trunc(granularity, F.min(ts)).alias("cohort")
    )
    activity = df.select(u.alias("__user"), period.alias("__period")).dropDuplicates()
    # firsts has user-dimension cardinality — NOT broadcastable at scale;
    # both sides already hash on __user so this co-partitions with the
    # dedup above (AQE may still broadcast when stats say it's small).
    j = activity.join(firsts, on="__user")
    if granularity == "day":
        off = F.datediff(F.col("__period"), F.col("cohort"))
    elif granularity == "week":
        off = (F.datediff(F.col("__period"), F.col("cohort")) / 7).cast("int")
    else:
        off = F.months_between(F.col("__period"), F.col("cohort")).cast("int")
    j = j.withColumn("offset", off.cast("int"))
    return j.groupBy("cohort", "offset").agg(
        F.count_distinct(F.col("__user")).alias("n_users")
    )


def histogram(
    df: DataFrame,
    value_col,
    lo: float,
    hi: float,
    nbins: int,
    keys=None,
) -> DataFrame:
    """Fixed-width histogram over [lo, hi): bin index, bin edges, count.
    Out-of-range rows are dropped (callers wanting clamp semantics filter
    or clamp first).  Optional ``keys`` produce one histogram per group.

    Scale shape: pure arithmetic + hash aggregation on (keys, bin) — a
    few-hundred-key shuffle regardless of input size; never a sort.
    """
    v = _c(value_col).cast("double")
    width = (hi - lo) / nbins
    bin_ = F.floor((v - F.lit(lo)) / F.lit(width)).cast("int")
    key_cols = _cols(keys)
    out = (
        df.filter((v >= lo) & (v < hi))
        .withColumn("bin", bin_)
        .groupBy(*key_cols, "bin")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    return out.select(
        *key_cols,
        "bin",
        (F.lit(lo) + F.col("bin") * F.lit(width)).alias("bin_lo"),
        (F.lit(lo) + (F.col("bin") + 1) * F.lit(width)).alias("bin_hi"),
        "n",
    )


def key_profile(df: DataFrame, keys: list[str], k: int = 20) -> DataFrame:
    """Heavy-hitter / skew diagnostic for join & aggregation keys: the top
    ``k`` key values by row count with their share of all rows, plus
    corpus-wide ``n_distinct_keys`` and ``total_rows`` on every row.  Run it
    before sizing a 100 TB join — a key with share ≫ 1/partitions is the one
    that needs salting (operators.aggregate.salted_join) or AQE skew-split.

    Scale shape: one partial-aggregated shuffle on the key for counts; the
    totals are a 1-row broadcast over the (already vocabulary-sized) count
    table; top-k is TakeOrderedAndProject (k rows per partition, no global
    sort).
    """
    from supersonic_spark.operators.sort import SortKey, extended_sort

    counts = df.groupBy(*[_c(x) for x in keys]).agg(F.count(F.lit(1)).alias("n"))
    totals = counts.agg(
        F.sum("n").alias("__total"), F.count(F.lit(1)).alias("n_distinct_keys")
    )
    topk = extended_sort(
        counts, [SortKey("n", ascending=False)] + [SortKey(x) for x in keys], limit=k
    )
    return topk.crossJoin(F.broadcast(totals)).select(
        *keys,
        "n",
        F.round(F.col("n").cast("double") / F.col("__total").cast("double"), 6).alias(
            "share"
        ),
        "n_distinct_keys",
        F.col("__total").alias("total_rows"),
    )


def cms_build(
    df: DataFrame,
    key,
    depth: int = 5,
    width: int = 1024,
) -> DataFrame:
    """Count-min sketch build: a (depth × width)-bounded frequency
    summary of ``key``, as a (depth, bucket, cnt) DataFrame with at most
    ``depth * width`` rows.  This is the scale path past
    :func:`key_profile`'s exact ``groupBy(key)`` — when the key
    cardinality is billions (URLs, n-grams, user ids at 100 TB), the
    exact count table is itself a giant shuffle, while the sketch's
    aggregation cardinality is FIXED at depth×width, so the map-side
    partial aggregate caps per-task state and the shuffle moves at most
    depth×width rows per task regardless of data volume.

    Estimates (:func:`cms_estimate`) are deterministic overestimates:
    ``est(k) >= true(k)`` always, ``est(k) <= true(k) + εN`` with
    probability 1-δ for ``width = ⌈e/ε⌉``, ``depth = ⌈ln(1/δ)⌉``
    (Cormode & Muthukrishnan 2005).  Sketches over disjoint data merge
    EXACTLY by bucket-wise sum (:func:`cms_merge`) — the rollup-friendly
    property that lets per-partition / per-day sketches combine into a
    corpus sketch without rescanning.

    Hashing is ``xxhash64(key, depth_index)`` — deterministic across
    runs and engines, so build/estimate/merge agree by construction.
    NULL keys hash as one key class (xxhash64 skips null inputs).
    """
    buckets = F.array(
        *[F.pmod(F.xxhash64(_c(key), F.lit(i)), F.lit(width)) for i in range(depth)]
    )
    return (
        df.select(F.posexplode(buckets).alias("depth", "bucket"))
        .groupBy("depth", "bucket")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )


def cms_estimate(
    sketch: DataFrame,
    keys: DataFrame,
    key,
    depth: int = 5,
    width: int = 1024,
    out_col: str = "est",
) -> DataFrame:
    """Point-query a :func:`cms_build` sketch for each row of ``keys``:
    ``est = min over depths of cnt[depth][hash_d(key) % width]``.
    ``depth``/``width`` must match the build (they are the sketch's
    identity, like a codebook's).  Keys whose bucket was never touched
    estimate 0.

    Scale shape: the sketch is ≤ depth×width rows — always broadcast —
    so estimation is a map-side broadcast join + one partial-aggregated
    min per key: no shuffle of the key stream beyond its own grouping.
    """
    buckets = F.array(
        *[F.pmod(F.xxhash64(_c(key), F.lit(i)), F.lit(width)) for i in range(depth)]
    )
    probes = keys.select(
        _c(key).alias("__k"), F.posexplode(buckets).alias("depth", "bucket")
    )
    joined = probes.join(F.broadcast(sketch), ["depth", "bucket"], "left")
    return (
        joined.groupBy("__k")
        .agg(F.min(F.coalesce(F.col("cnt"), F.lit(0))).alias(out_col))
        .withColumnRenamed("__k", key if isinstance(key, str) else "key")
    )


def cms_merge(*sketches: DataFrame) -> DataFrame:
    """Merge count-min sketches built with the SAME depth/width by
    bucket-wise sum.  Exact: ``merge(build(A), build(B)) ==
    build(A ∪ B)`` row-for-row — the property that makes per-shard /
    per-day sketches roll up into a corpus sketch for free."""
    import functools

    u = functools.reduce(lambda a, b: a.unionByName(b), sketches)
    return u.groupBy("depth", "bucket").agg(F.sum("cnt").alias("cnt"))


def mg_heavy_hitters(df: DataFrame, key, k: int = 100) -> DataFrame:
    """Misra-Gries / SpaceSaving heavy hitters: the top keys by frequency
    WITHOUT an exact ``groupBy(key)`` — the dual of :func:`cms_build`.
    CMS answers "how often does THIS key occur" (overestimate, needs the
    probe keys up front); Misra-Gries answers "WHICH keys are hot"
    (underestimate, discovers them) with at most ``k`` counters per
    partition.  At 100 TB this is the pre-flight skew detector for join
    and aggregation keys when the key cardinality is itself too large for
    :func:`key_profile`'s exact count table: per-task state is bounded at
    ``k`` counters regardless of distinct-key count, and the shuffle
    moves at most ``(k+1) × partitions`` summary rows, never the corpus.

    Algorithm (batched Misra-Gries, per partition): merge each Arrow
    batch's exact ``value_counts`` into a running counter table; when it
    exceeds ``k`` entries, subtract the (k+1)-th largest count from every
    counter and drop the non-positive ones — the vectorized equivalent of
    ``cut`` classic decrement rounds.  Per-partition summaries merge by
    key-wise sum (counter addition; error bounds add), so the guarantees
    survive distribution (Agarwal et al., "Mergeable Summaries", PODS'12):

    - ``est(x) <= true(x)`` for every reported key (underestimate-only),
    - ``true(x) - est(x) <= err_bound`` (the summed decrement total ``D``,
      returned on every row),
    - every key with ``true(x) > err_bound`` IS in the summary,
    - with ``k >=`` per-partition distinct keys no decrement ever fires,
      ``err_bound == 0`` and the summary is exact.

    NULL keys are EXCLUDED (a NULL never matches in a join, so it cannot
    be a join-skew hitter; coalesce first to count them as a class).

    Returns at most ``k`` rows ``(key, est, err_bound)``, highest ``est``
    first.  One corpus scan, one (k+1)·P-row shuffle; the global window
    that stamps ``err_bound`` runs one task over that summary table —
    bounded by k × partitions, never by data volume.
    """
    from supersonic_spark.operators.sort import SortKey, extended_sort

    key_name = key if isinstance(key, str) else "key"
    key_t = df.select(_c(key).alias("__k")).schema["__k"].dataType.simpleString()
    part_schema = f"__k {key_t}, cnt bigint, is_dec boolean"

    def gen(batches):
        import pandas as pd

        counters = None
        dec = 0
        for pdf in batches:
            vc = pdf["__k"].value_counts(dropna=True)
            counters = vc if counters is None else counters.add(vc, fill_value=0)
            if len(counters) > k:
                counters = counters.sort_values(ascending=False, kind="stable")
                cut = int(counters.iloc[k])
                dec += cut
                counters = counters.iloc[:k] - cut
                counters = counters[counters > 0]
        if counters is not None and len(counters):
            yield pd.DataFrame(
                {
                    "__k": counters.index,
                    "cnt": counters.values.astype("int64"),
                    "is_dec": False,
                }
            )
        if dec:
            yield pd.DataFrame(
                {
                    "__k": pd.Series([None], dtype="object"),
                    "cnt": pd.Series([dec], dtype="int64"),
                    "is_dec": True,
                }
            )

    partial = df.select(_c(key).alias("__k")).mapInPandas(gen, part_schema)
    agg = partial.groupBy("__k", "is_dec").agg(F.sum("cnt").alias("est"))
    # one global window over the (<= (k+1)·P)-row summary stamps the
    # summed decrement total on every row without a second corpus scan
    err = F.coalesce(
        F.sum(F.when(F.col("is_dec"), F.col("est"))).over(Window.partitionBy()),
        F.lit(0),
    )
    summary = agg.withColumn("err_bound", err).filter(~F.col("is_dec"))
    topk = extended_sort(
        summary, [SortKey("est", ascending=False), SortKey("__k")], limit=k
    )
    return topk.select(F.col("__k").alias(key_name), "est", "err_bound")


def quantile_bucketize(
    df: DataFrame,
    value,
    n_buckets: int,
    tiebreak=None,
    bucket_col: str = "bucket",
) -> DataFrame:
    """Equal-frequency binning: append ``bucket_col`` (1..n_buckets) =
    the NTILE of ``value`` over the whole input — the discretization step
    before feature hashing / stratified sampling.  ``tiebreak`` (a unique
    column) pins the order of equal values so bucket assignment is
    deterministic.

    Scale shape: NTILE needs a global order; Spark plans one range
    exchange (sampled range partitioner, no single-task funnel) and the
    running bucket arithmetic is per-partition.  For corpus-scale inputs
    where an approximate cut is fine, compute approx_percentile fences
    and join them broadcast instead (see percentile_aggregate).
    """
    order = [_c(value)] + ([_c(tiebreak)] if tiebreak is not None else [])
    w = Window.orderBy(*order)
    return df.withColumn(bucket_col, F.ntile(n_buckets).over(w))


def bucket_stats(
    df: DataFrame,
    value,
    n_buckets: int,
    tiebreak=None,
) -> DataFrame:
    """quantile_bucketize then collapse: per bucket — ``n``, ``lo``,
    ``hi`` (the empirical quantile fences).  The collapsed table is
    n_buckets rows; use it to freeze bin edges for reuse on new data."""
    b = quantile_bucketize(df, value, n_buckets, tiebreak=tiebreak)
    return b.groupBy("bucket").agg(
        F.count(F.lit(1)).alias("n"),
        F.min(_c(value)).cast("double").alias("lo"),
        F.max(_c(value)).cast("double").alias("hi"),
    )
