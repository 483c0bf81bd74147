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


def cross_join(left: DataFrame, right: DataFrame) -> DataFrame:
    """Cartesian product (absent in the reference: no nested-loop join,
    SURVEY.md §2.3).  For a small ``right`` Spark plans BroadcastNestedLoop
    — each left partition pairs with the broadcast right locally, no
    shuffle.  Guard rails at 100 TB: only ever cross small dimensions, or
    the output row count |L|×|R| is the plan."""
    return left.crossJoin(right)


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


def asof_join(
    left: DataFrame,
    right: DataFrame,
    keys: list[str],
    left_ts: str,
    right_ts: str,
    right_cols: list[str] | None = None,
    direction: str = "backward",
    tolerance=None,
    how: str = "left",
    suffix: str = "_right",
) -> DataFrame:
    """As-of (nearest-event) join — beyond-reference time-series operator
    (the reference has no non-equi joins at all, SURVEY.md §2.3).

    Each left row matches at most ONE right row per ``keys``: the latest
    right row with ``right_ts <= left_ts`` (direction="backward") or the
    earliest with ``right_ts >= left_ts`` ("forward"); ties at equal ts
    match (inclusive, DuckDB/pandas semantics).  ``tolerance`` (numeric
    delta or SQL interval string like ``"6 hours"``) nulls out matches
    further than the bound; ``how="inner"`` drops unmatched left rows.

    Scale shape — the reason this isn't a range join: both sides union and
    shuffle ONCE on ``keys``, then a single ordered window pass carries the
    last-seen right payload forward (LOCF over the merged timeline — the
    same discipline as the Smudge family).  No interval explosion, no
    nested-loop, no per-row probe: O(n log n) in the partition, one
    exchange total.  Skewed keys salt the same way any window op does.
    """
    from pyspark.sql import Window

    if direction not in ("backward", "forward"):
        raise ValueError(f"direction must be 'backward' or 'forward', got {direction!r}")
    if right_cols is None:
        right_cols = [c for c in right.columns if c not in keys and c != right_ts]
    rv_fields = [right_ts] + right_cols

    lv = F.struct(*[F.col(c) for c in left.columns])
    rv = F.struct(*[F.col(c) for c in rv_fields])
    lv_type = left.select(lv.alias("s")).schema[0].dataType
    rv_type = right.select(rv.alias("s")).schema[0].dataType

    lt = left.select(
        *[F.col(k) for k in keys],
        F.col(left_ts).alias("__ts"),
        F.lit(1).alias("__side"),
        lv.alias("__lv"),
        F.lit(None).cast(rv_type).alias("__rv"),
    )
    rt = right.select(
        *[F.col(k) for k in keys],
        F.col(right_ts).alias("__ts"),
        F.lit(0).alias("__side"),
        F.lit(None).cast(lv_type).alias("__lv"),
        rv.alias("__rv"),
    )
    merged = lt.unionByName(rt)
    ts_ord = F.col("__ts").asc() if direction == "backward" else F.col("__ts").desc()
    w = (
        Window.partitionBy(*[F.col(k) for k in keys])
        .orderBy(ts_ord, F.col("__side").asc())
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    out = merged.withColumn("__m", F.last("__rv", ignorenulls=True).over(w)).filter(
        F.col("__side") == 1
    )
    if tolerance is not None:
        delta = (
            F.expr(f"INTERVAL {tolerance}")
            if isinstance(tolerance, str)
            else F.lit(tolerance)
        )
        m_ts = F.col(f"__m.{right_ts}")
        ok = (
            (m_ts >= F.col("__ts") - delta)
            if direction == "backward"
            else (m_ts <= F.col("__ts") + delta)
        )
        out = out.withColumn("__m", F.when(ok, F.col("__m")))
    if how == "inner":
        out = out.filter(F.col("__m").isNotNull())
    elif how != "left":
        raise ValueError(f"how must be 'left' or 'inner', got {how!r}")
    left_names = set(left.columns)
    return out.select(
        F.col("__lv.*"),
        *[
            F.col(f"__m.{c}").alias(c + suffix if c in left_names else c)
            for c in rv_fields
        ],
    )


def range_join(
    left: DataFrame,
    right: DataFrame,
    left_val: str,
    lower: str,
    upper: str,
    bin_width: float,
    keys: list[str] | None = None,
) -> DataFrame:
    """Point-in-interval range join — beyond-reference non-equi operator.
    Matches each left row to every right row whose ``[lower, upper]``
    interval contains ``left_val`` (plus optional equi ``keys``).

    Scale shape: Spark's native plan for a bare non-equi join is a
    broadcast-nested-loop (quadratic probes).  Here both sides discretize
    onto integer bins of ``bin_width`` — the right side explodes to one row
    per overlapped bin — so the match becomes an EQUI join on (bin, keys)
    followed by the exact BETWEEN filter.  Shuffle is linear in rows ×
    interval/bin_width; pick ``bin_width`` near the typical interval length
    so fan-out stays O(1) per interval.  A left point lies in exactly one
    bin, so no dedup pass is needed.
    """
    keys = keys or []
    lb = left.withColumn("__bin", F.floor(F.col(left_val) / F.lit(bin_width)))
    rb = right.withColumn(
        "__bin",
        F.explode(
            F.sequence(
                F.floor(F.col(lower) / F.lit(bin_width)),
                F.floor(F.col(upper) / F.lit(bin_width)),
            )
        ),
    )
    out = (
        lb.join(rb, on=["__bin", *keys], how="inner")
        .filter((F.col(left_val) >= F.col(lower)) & (F.col(left_val) <= F.col(upper)))
        .drop("__bin")
    )
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


def interval_overlap_join(
    left: DataFrame,
    right: DataFrame,
    left_bounds: tuple[str, str],
    right_bounds: tuple[str, str],
    bin_width: float,
    keys: list[str] | None = None,
) -> DataFrame:
    """Interval-overlap join — beyond-reference non-equi operator.
    Matches every (left, right) pair whose closed numeric intervals
    ``[left_lo, left_hi]`` and ``[right_lo, right_hi]`` overlap (plus
    optional equi ``keys``).  Bound column names must be distinct across
    the two sides (alias upstream).

    Scale shape: the naive plan is a broadcast-nested-loop.  Here BOTH
    sides explode onto integer bins of ``bin_width``; the match becomes an
    equi join on (bin, keys) + the exact overlap filter.  A pair that
    shares several bins would emit duplicates, so each pair is kept only
    in the canonical bin — the first bin of the overlap region,
    ``max(floor(lo/w))`` of the two sides — a filter, not a dedup shuffle.
    Pick ``bin_width`` near the typical interval length: fan-out stays
    O(interval/bin_width) per row and the shuffle stays linear.
    """
    keys = keys or []
    ll, lh = left_bounds
    rl, rh = right_bounds
    w = float(bin_width)
    lb = left.withColumn(
        "__bin",
        F.explode(F.sequence(F.floor(F.col(ll) / F.lit(w)), F.floor(F.col(lh) / F.lit(w)))),
    )
    rb = right.withColumn(
        "__bin",
        F.explode(F.sequence(F.floor(F.col(rl) / F.lit(w)), F.floor(F.col(rh) / F.lit(w)))),
    )
    return (
        lb.join(rb, on=["__bin", *keys], how="inner")
        .filter((F.col(ll) <= F.col(rh)) & (F.col(rl) <= F.col(lh)))
        .filter(
            F.col("__bin")
            == F.greatest(F.floor(F.col(ll) / F.lit(w)), F.floor(F.col(rl) / F.lit(w)))
        )
        .drop("__bin")
    )


def prefilter_join(
    fact: DataFrame,
    dim: DataFrame,
    on,
    how: str = "inner",
    max_keys: int = 10_000,
) -> DataFrame:
    """Runtime scan-pushdown join: when the dim side's distinct join-key set
    is small (≤ ``max_keys``), materialize it with one bounded driver job
    and push it into the fact side as an IN-list predicate BEFORE joining —
    the predicate reaches the parquet scan (``PushedFilters: In(...)``), so
    row groups whose min/max can't match are never read.  Falls back to a
    plain ``hash_join`` when the key set is too large (the IN list itself
    must stay broadcast-sized).

    This is the user-level twin of Spark's automatic runtime filtering
    (``spark.sql.optimizer.runtime.bloomFilter.enabled``, which prunes at
    the SHUFFLE): an explicit IN-list prunes at the SCAN, which at 100 TB
    is the difference between reading the fact table and reading a sliver.
    The reference's analog is the hash-join build side acting as the probe
    filter (hash_join.cc:91-95) — supersonic always scans the full probe
    input; this operator avoids even that.

    ``on``: a single key column name shared by both sides, or a
    ``(fact_col, dim_col)`` pair.  ``how``: inner / left_semi semantics of
    the final exact join (the prefilter never changes the result, only the
    bytes read).
    """
    fk, dk = (on, on) if isinstance(on, str) else on
    keys = [
        r[0] for r in dim.select(dk).where(F.col(dk).isNotNull()).distinct()
        .limit(max_keys + 1).collect()
    ]
    if len(keys) <= max_keys:
        fact = fact.where(F.col(fk).isin(keys))
    if how in ("semi", "left_semi", "leftsemi"):
        return fact.join(dim, on=fact[fk] == dim[dk], how="left_semi")
    if isinstance(on, str):
        return fact.join(dim, on=on, how=how)
    return fact.join(dim, on=fact[fk] == dim[dk], how=how)


def bloom_prefilter_join(
    fact: DataFrame,
    dim: DataFrame,
    on,
    how: str = "inner",
    num_bits: int = 1 << 20,
    num_hashes: int = 6,
) -> DataFrame:
    """Bloom-filter semi-join reduction: prune the fact side BEFORE its
    shuffle when the dim key set is too large for :func:`prefilter_join`'s
    exact IN-list but its Bloom sketch still fits comfortably on the driver
    (``num_bits`` bits ⇒ num_bits/8 bytes — 128 KiB at the 2²⁰ default,
    good for ~10⁵ keys at ~1% fpp with 6 hashes).

    Build: one aggregation over the dim keys — k = ``num_hashes`` seeded
    xxhash64 probes per key, positions folded into 64-bit words with a
    ``bit_or`` partial-aggregating groupBy (at most num_bits/64 rows ever
    reach the driver; the collect is bounded by construction, like the
    IN-list and k-means-state collects elsewhere in this package).
    Probe: the word array becomes a LITERAL array<long> in a codegen'd
    conjunction of ``element_at(...) & (1<<bit) != 0`` checks — the filter
    runs inside the fact table's scan stage, entirely JVM-side, so the
    shuffle (and with min/max-friendly keys, even the read) only sees
    surviving rows.  False positives are removed by the exact join that
    follows; the result is ALWAYS identical to the plain join.

    This is the engine-level twin of Spark's runtime bloom filter
    (``spark.sql.optimizer.runtime.bloomFilter.enabled``) with an explicit
    build point, and of the reference's build-side probe filtering
    (cursor/core/hash_join.cc — the lookup index is the filter); here the
    probe side never even shuffles the pruned rows.
    """
    fk, dk = (on, on) if isinstance(on, str) else on
    n_words = max(1, num_bits // 64)
    m = n_words * 64

    def probes(col):
        return [F.pmod(F.xxhash64(F.lit(i), col), F.lit(m)) for i in range(num_hashes)]

    pos = dim.where(F.col(dk).isNotNull()).select(
        F.explode(F.array(*probes(F.col(dk)))).alias("__pos")
    ).select(
        (F.col("__pos") / 64).cast("int").alias("__w"),
        (F.col("__pos") % 64).cast("int").alias("__b"),
    )
    words_rows = (
        pos.groupBy("__w")
        .agg(F.bit_or(F.expr("shiftleft(1L, __b)")).alias("__bits"))
        .collect()
    )
    words = [0] * n_words
    for r in words_rows:
        words[r["__w"]] = r["__bits"]

    arr = F.array(*[F.lit(w).cast("long") for w in words])
    key = F.col(fk)
    tmp, conds, aux = fact, [], []
    for i, p in enumerate(probes(key)):
        tmp = tmp.withColumn(f"__bw{i}", F.element_at(arr, (p / 64).cast("int") + 1))
        tmp = tmp.withColumn(f"__bb{i}", (p % 64).cast("int"))
        conds.append(F.expr(f"(__bw{i} & shiftleft(1L, __bb{i})) != 0"))
        aux += [f"__bw{i}", f"__bb{i}"]
    cond = key.isNotNull()
    for c in conds:
        cond = cond & c
    fact = tmp.where(cond).drop(*aux)
    if how in ("semi", "left_semi", "leftsemi"):
        return fact.join(dim, on=fact[fk] == dim[dk], how="left_semi")
    if isinstance(on, str):
        return fact.join(dim, on=on, how=how)
    return fact.join(dim, on=fact[fk] == dim[dk], how=how)
