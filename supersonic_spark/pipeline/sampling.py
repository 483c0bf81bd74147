"""Deterministic sampling / splitting / ordering for training-data
pipelines (beyond-reference mandate).

Everything here is HASH-deterministic, not RNG-based: the same row lands in
the same split/sample/position on every run, any cluster size, any
partitioning — the property training pipelines need for reproducible
train/val/test membership and for resumable jobs.  (Spark's ``sample``/
``sampleBy`` use per-partition RNG streams, so results change with
partitioning; that footgun is why these exist.)

All expressions are JVM-side (`xxhash64` + arithmetic) — no UDFs, no
shuffle except where ordering semantically requires one.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

_BUCKETS = 1_000_000


def _c(x) -> Column:
    return F.col(x) if isinstance(x, str) else x


def _bucket(col, salt: str) -> Column:
    """Uniform bucket in [0, _BUCKETS) from xxhash64(salt, col) — the
    split/sample coin flip, derived only from the row's identity."""
    return F.pmod(F.xxhash64(F.lit(salt), _c(col)), F.lit(_BUCKETS))


def split_by_hash(
    df: DataFrame,
    id_col: str,
    weights: dict[str, float],
    salt: str = "ss-split",
    out_col: str = "split",
) -> DataFrame:
    """Assign every row to exactly one named split (e.g. ``{"train": .98,
    "val": .01, "test": .01}``) by hashing ``id_col``.  Deterministic,
    disjoint, exhaustive; weights are normalized.  One narrow projection —
    no shuffle, no sampling pass."""
    if not weights:
        raise ValueError("weights must be a non-empty {name: weight} dict")
    total = float(sum(weights.values()))
    b = _bucket(id_col, salt)
    expr = None
    acc = 0.0
    names = list(weights)
    for name in names[:-1]:
        acc += weights[name] / total * _BUCKETS
        cond = b < F.lit(int(round(acc)))
        expr = F.when(cond, F.lit(name)) if expr is None else expr.when(cond, F.lit(name))
    last = F.lit(names[-1])
    expr = last if expr is None else expr.otherwise(last)
    return df.withColumn(out_col, expr)


def sample_by_hash(
    df: DataFrame, id_col: str, fraction: float, salt: str = "ss-sample"
) -> DataFrame:
    """Keep a deterministic ``fraction`` of rows by identity hash.  Unlike
    ``df.sample``, membership is a pure function of the row id — stable
    across runs, partitionings, and cluster sizes."""
    if not 0.0 <= fraction <= 1.0:
        raise ValueError(f"fraction must be in [0,1], got {fraction}")
    return df.filter(_bucket(id_col, salt) < F.lit(int(round(fraction * _BUCKETS))))


def stratified_sample_by_hash(
    df: DataFrame,
    strata_col: str,
    fractions: dict,
    id_col: str,
    default_fraction: float = 0.0,
    salt: str = "ss-strata",
) -> DataFrame:
    """Per-stratum deterministic sampling (the reproducible analog of
    ``sampleBy``): each stratum keeps its own fraction of rows, chosen by
    identity hash.  Strata absent from ``fractions`` keep
    ``default_fraction``.  Classic use: downsample over-represented
    languages/domains in a training corpus."""
    b = _bucket(id_col, salt)
    thresh = F.lit(int(round(default_fraction * _BUCKETS)))
    expr = None
    for k, frac in fractions.items():
        cond = _c(strata_col) == F.lit(k)
        t = F.lit(int(round(float(frac) * _BUCKETS)))
        expr = F.when(cond, t) if expr is None else expr.when(cond, t)
    thresh = thresh if expr is None else expr.otherwise(thresh)
    return df.filter(b < thresh)


def deterministic_shuffle(
    df: DataFrame, id_col: str, salt: str = "ss-shuffle"
) -> DataFrame:
    """Reproducible global shuffle: order rows by identity hash (ties broken
    by the id itself).  The exchange is a range partition on the hash —
    exactly one shuffle, balanced output.  Standard before sequential
    training reads so corpus order carries no signal."""
    return df.orderBy(F.xxhash64(F.lit(salt), _c(id_col)), _c(id_col))


def pack_sequences(
    df: DataFrame,
    id_col: str,
    tokens_col: str,
    budget: int,
    out_col: str = "batch_id",
) -> DataFrame:
    """Greedy sequence packing: assign each document a batch id such that
    every batch's total ``tokens_col`` stays ≤ ``budget`` (documents longer
    than the budget get a singleton batch).  Output: (id, n_tokens,
    batch_id), batch ids globally unique.

    Scale shape: packing is a sequential bin-fill, so it runs
    INDEPENDENTLY PER PARTITION — embarrassingly parallel, and batch ids
    are made global by offsetting with the partition id.  The
    per-partition greedy fill wastes at most one batch per partition versus
    a global fill — noise at corpus scale.

    Plan shape (round-8 optimization): the fill streams over each
    partition IN PLACE via ``mapInPandas`` after a ``sortWithinPartitions``
    (a local sort, no exchange), carrying the running (batch, tokens)
    state across Arrow batches.  The previous ``applyInPandas`` over a
    ``spark_partition_id()`` group hash-shuffled the corpus by its own
    partition id — a full exchange that moved every row exactly back to
    a same-sized grouping — and sorted per group on the Python side.
    Output is identical: the group key WAS the partition id, so the
    per-group row sets, their id-sorted order, and the partition-offset
    batch ids are unchanged.
    """
    from typing import Iterator

    import pandas as pd

    spark_part = F.spark_partition_id().alias("__part")
    base = df.select(
        _c(id_col).alias("id"), _c(tokens_col).cast("long").alias("n_tokens"), spark_part
    ).sortWithinPartitions("id")

    id_type = base.schema["id"].dataType.simpleString()
    schema = f"id {id_type}, n_tokens long, {out_col} long"

    def pack(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        part, cur_id, cur_tok = None, 0, 0
        for pdf in batches:
            if len(pdf) == 0:
                continue
            if part is None:
                part = int(pdf["__part"].iloc[0])
            batch_ids = []
            for n in pdf["n_tokens"]:
                n = int(n) if not pd.isna(n) else 0
                if cur_tok > 0 and cur_tok + n > budget:
                    cur_id += 1
                    cur_tok = 0
                batch_ids.append(cur_id)
                cur_tok += n
            out = pdf[["id", "n_tokens"]].copy()
            # partition-offset batch ids: globally unique without coordination
            out[out_col] = [part * (1 << 32) + b for b in batch_ids]
            yield out

    return base.mapInPandas(pack, schema=schema)


def weighted_sample_by_hash(
    df: DataFrame,
    id_col: str,
    weight,
    salt: str = "ss-wsample",
) -> DataFrame:
    """Deterministic per-row weighted sampling: keep a row with probability
    ``weight`` (a Column or column name in [0,1], e.g. a quality score or a
    per-source mixture rate) — membership is a pure function of the row's
    identity hash, so it is stable across runs, partitionings, and cluster
    sizes, and nests with sample_by_hash/split_by_hash via distinct salts.

    Scale shape: a zero-shuffle filter (hash + compare in codegen); weights
    above 1 clamp to always-keep, below 0 to always-drop.
    """
    w = _c(weight)
    thresh = F.least(F.lit(1.0), F.greatest(F.lit(0.0), w.cast("double")))
    return df.filter(
        _bucket(id_col, salt).cast("double") < thresh * F.lit(float(_BUCKETS))
    )


def mixture_weights(
    df: DataFrame,
    group_col: str,
    temperature: float = 1.0,
    target_rows: int | None = None,
) -> DataFrame:
    """Per-group sampling weights for temperature-flattened corpus mixtures
    (multilingual/multi-source pretraining): group g with n_g rows gets
    weight ∝ n_g^(temperature-1) — temperature 1 keeps natural proportions,
    0 equalizes groups, values between flatten the head.  Normalized so the
    LARGEST weight is 1.0; pass ``target_rows`` to rescale so the expected
    total sample size ≈ target_rows (capped at 1 per group).

    Join the result back on ``group_col`` (it is group-count-sized —
    broadcastable) and feed the weight to weighted_sample_by_hash.
    """
    counts = df.groupBy(_c(group_col)).agg(F.count(F.lit(1)).alias("n"))
    w = F.pow(F.col("n").cast("double"), F.lit(temperature - 1.0))
    out = counts.withColumn("__w", w)
    max_w = out.agg(F.max("__w").alias("__max")).collect()[0]["__max"]
    out = out.withColumn("weight", F.col("__w") / F.lit(float(max_w)))
    if target_rows is not None:
        expected = out.select(
            F.sum(F.col("weight") * F.col("n")).alias("e")
        ).collect()[0]["e"]
        out = out.withColumn(
            "weight",
            F.least(F.lit(1.0), F.col("weight") * F.lit(float(target_rows) / float(expected))),
        )
    return out.select(group_col, "n", "weight")


def cap_per_key(
    df: DataFrame,
    key_col: str,
    id_col: str,
    n: int,
    salt: str = "ss-cap",
    keep_rank: bool = False,
) -> DataFrame:
    """Deterministic per-key quota: keep at most ``n`` rows per ``key_col``
    (domain balancing — e.g. cap documents per source/host so no single
    domain dominates a training mix).  Which rows survive is a pure
    function of identity: rows rank by ``md5(salt || id)`` (ties by id)
    inside their key, and ranks ≤ n stay — stable across runs, cluster
    sizes, and partitionings, and a *uniform* choice per key rather than
    "whatever n rows arrived first".

    md5 (not xxhash64) on purpose: every engine has it, so the exact
    survivor set is reproducible outside Spark (and in the DuckDB oracle).

    Scale shape: one hash-partition exchange on the key + a per-key
    top-n (TakeOrdered inside the window, no global sort).  Skewed keys
    hold at most their own rows; for pathological single-key corpora,
    pre-filter with sample_by_hash to approx rate n/count first.
    """
    if n < 1:
        raise ValueError(f"n must be >= 1, got {n}")
    from pyspark.sql import Window

    order = F.md5(F.concat(F.lit(salt), _c(id_col).cast("string")))
    w = Window.partitionBy(_c(key_col)).orderBy(order, _c(id_col))
    ranked = df.withColumn("__rank", F.row_number().over(w))
    kept = ranked.filter(F.col("__rank") <= F.lit(n))
    if keep_rank:
        return kept.withColumnRenamed("__rank", "cap_rank")
    return kept.drop("__rank")


def weighted_reservoir_sample(
    df: DataFrame,
    k: int,
    id_col: str,
    weight,
    salt: str = "ss-wres",
    keep_key: bool = False,
) -> DataFrame:
    """Deterministic weighted fixed-SIZE sample without replacement
    (Efraimidis–Spirakis A-Res): every row draws u ∈ (0,1) from a PORTABLE
    hash of (salt, id) — the first 8 hex digits of md5, identical in every
    engine — and ranks by key = -ln(u)/weight; the k smallest keys are the
    sample.  Inclusion probability is proportional to ``weight`` (a Column
    or column name, e.g. a quality score), membership is a pure function
    of row identity — stable across runs, partitionings, and cluster
    sizes, and the selected SET replays in an external oracle (same md5,
    same formula).  Rows with NULL or non-positive weight are excluded
    (they can never win a proportional draw).

    Scale shape: rank-k selection is a TakeOrderedAndProject —
    per-partition top-k then a k-row merge; no global sort, no RNG state,
    nothing driver-side.  This is the fixed-budget cousin of
    :func:`weighted_sample_by_hash` (which keeps a *fraction* per row):
    use it when the output must be exactly k documents, weighted by
    quality, reproducibly.
    """
    if k < 1:
        raise ValueError(f"k must be >= 1, got {k}")
    w = _c(weight).cast("double")
    v = F.conv(
        F.substring(F.md5(F.concat(F.lit(salt), _c(id_col).cast("string"))), 1, 8),
        16, 10,
    ).cast("long")
    u = (v.cast("double") + F.lit(0.5)) / F.lit(4294967296.0)
    key = -F.log(u) / w
    # NaN compares GREATER than any number under Spark SQL semantics, so a
    # bare `w > 0` would let NaN weights through as NaN sort keys — exclude
    # them like NULL/non-positive (w is cast to double, so isnan is valid).
    out = (
        df.filter((w > 0.0) & ~F.isnan(w))
        .withColumn("__wres_key", key)
        .orderBy(F.col("__wres_key"), _c(id_col))
        .limit(k)
    )
    if keep_key:
        return out.withColumnRenamed("__wres_key", "wres_key")
    return out.drop("__wres_key")


def token_budget_sample(
    df: DataFrame,
    token_col: str,
    budget: int,
    order,
    out_col: str = "cum_tokens",
    num_partitions: int | None = None,
) -> DataFrame:
    """Fill a token budget in priority order: keep the maximal prefix of
    ``order`` (e.g. quality descending, id tiebreak) whose running total
    of ``token_col`` stays ≤ ``budget`` — how a pretraining mix is cut
    ("take the best documents until 10B tokens").  Emits ``out_col`` with
    each kept row's cumulative token count (integer-exact, so the
    selection replays bit-for-bit in an external oracle).

    Scale shape — a distributed prefix sum, NOT a global window (a
    partitionBy-less window funnels the corpus through ONE task): rows
    range-partition and sort on the order keys; a per-partition token
    subtotal (one row per partition) collects to the driver and resolves
    each partition's global offset; partitions whose offset already
    exceeds the budget are dropped WHOLESALE before the stamp; an
    Arrow-batched ``mapInPandas`` adds offset + local running sum and
    filters.  Same two-pass discipline as ``operators.rowid.with_row_id``
    (and the same persist-for-consistency cost: the arranged input is
    persisted so both passes see one partitioning).

    ``order`` must be a total order (include a unique tiebreak) for
    reproducible selection.  ``token_col`` must be integral and non-NULL.
    """
    if budget < 0:
        raise ValueError(f"budget must be >= 0, got {budget}")
    from typing import Iterator

    import pandas as pd
    from pyspark.sql import types as T

    cols = [F.col(o) if isinstance(o, str) else o for o in (
        order if isinstance(order, (list, tuple)) else [order]
    )]
    parts = num_partitions or df.sparkSession.sparkContext.defaultParallelism
    pid = "__ss_tb_pid"
    from supersonic_spark.session import track_persist

    arranged = track_persist(
        df.repartitionByRange(parts, *cols)
        .sortWithinPartitions(*cols)
        .withColumn(pid, F.spark_partition_id())
    )

    # Per-partition subtotals as a SHUFFLE-FREE map pass: one (pid, sum,
    # min) row per non-empty partition, collected directly.  The previous
    # groupBy(pid) was semantically the same sums but Catalyst cannot see
    # that pid IS the partitioning, so it paid a (tiny) aggregation
    # exchange — two extra AQE stage-materialization jobs of pure driver
    # latency per run at bench scale (profiled round 9).  int64 sums are
    # exact either way; NULL tokens are rejected by the same astype the
    # stamp pass already applies.
    sub_schema = T.StructType(
        [
            T.StructField(pid, T.LongType(), False),
            T.StructField("s", T.LongType(), False),
            T.StructField("mn", T.LongType(), False),
        ]
    )

    def subtotals(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        p, s, mn = None, 0, None
        for pdf in batches:
            if len(pdf) == 0:
                continue
            p = int(pdf[pid].iloc[0])
            col = pdf[token_col].astype("int64")
            s += int(col.sum())
            m = int(col.min())
            mn = m if mn is None else min(mn, m)
        if p is not None:
            yield pd.DataFrame({pid: [p], "s": [s], "mn": [mn]})

    agg = arranged.select(pid, token_col).mapInPandas(subtotals, sub_schema).collect()
    # the early-return in stamp() and the wholesale partition prune both
    # assume the running total is monotone — a negative token breaks that
    neg = [r for r in agg if r["mn"] is not None and r["mn"] < 0]
    if neg:
        raise ValueError(f"token_budget_sample: {token_col} must be >= 0")
    sums = {r[pid]: int(r["s"]) for r in agg}
    offsets: dict[int, int] = {}
    acc = 0
    for p in sorted(sums):
        offsets[p] = acc
        acc += sums[p]
    # <= not <: a partition whose global offset EQUALS the budget can still
    # contribute zero-token rows (cum == budget passes the stamp filter)
    keep_pids = [p for p in sorted(sums) if offsets[p] <= budget]

    out_schema = T.StructType(
        df.schema.fields + [T.StructField(out_col, T.LongType(), False)]
    )
    in_cols = df.columns

    def stamp(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        run = None
        for pdf in batches:
            if len(pdf) == 0:
                continue
            if run is None:
                run = offsets[int(pdf[pid].iloc[0])]
            cum = pdf[token_col].astype("int64").cumsum() + run
            run = int(cum.iloc[-1])
            keep = cum <= budget
            if not keep.any():
                return  # ordered: once over budget, every later row is too
            out = pdf.loc[keep, in_cols].copy()
            out[out_col] = cum[keep]
            yield out

    pruned = arranged.filter(F.col(pid).isin(keep_pids)) if keep_pids else arranged.limit(0)
    return pruned.mapInPandas(stamp, out_schema)


def fixed_size_sample(df: DataFrame, k: int, key_col: str, portable: bool = True) -> DataFrame:
    """Deterministic fixed-SIZE uniform sample (the distributed reservoir):
    rank every row by a hash of its key and keep the k smallest — exactly k
    rows (when the input has ≥ k), reproducible across runs, partitionings,
    and cluster sizes, with no RNG state.

    ``portable=True`` orders by md5 of the key's string form — a hash every
    engine computes identically, so the SELECTED SET itself is replayable
    by an external oracle (DuckDB md5 == Spark md5).  ``portable=False``
    uses xxhash64 (cheaper; Spark-only).

    Scale shape: rank-k selection is a TakeOrderedAndProject — per-partition
    top-k then a k-row merge on one reducer; no global sort of the corpus.
    """
    key = _c(key_col)
    order = (
        F.md5(key.cast("string")) if portable else F.xxhash64(key)
    )
    return (
        df.withColumn("__ord", order)
        .orderBy(F.col("__ord"), key)
        .limit(k)
        .drop("__ord")
    )
