"""Time-series operators (beyond-reference: supersonic has no event-time
notion at all — SURVEY.md §2.9 records that the only order-dependent
machinery is the stateful expression family, §2.7).  These are the shapes
an event pipeline needs before any windowed analytics can run: carving a
raw event stream into sessions, and regularizing an irregular series onto
a fixed-step grid with fill-forward.

Scale notes:
- ``sessionize`` is one shuffle on the entity key; the session id is a
  running sum of boundary flags inside each partition (no self-joins, no
  per-session materialization);
- ``resample_locf`` generates the per-key time spine with ``sequence()``
  + ``explode`` (codegen, no Python), so spine size is proportional to
  each key's own span — a key active for an hour does not pay for the
  corpus' full history.  The LOCF fill is a single last-ignorenulls
  window on the same partitioning as the spine join, so the whole
  operator is two shuffles (bucket agg, spine join) end to end.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def _c(x) -> Column:
    return F.col(x) if isinstance(x, str) else x


def sessionize(
    df: DataFrame,
    key,
    ts: str,
    gap_seconds: int,
    tiebreak: str | None = None,
    session_col: str = "session_id",
) -> DataFrame:
    """Assign gap-based session ids: within each ``key``, a new session
    starts whenever the time since the previous event exceeds
    ``gap_seconds``.  Appends ``session_col`` (int64, 0-based per key).

    Pass ``tiebreak`` (a unique column, e.g. the event id) whenever ``ts``
    can collide — it pins the event order, making session boundaries
    deterministic.

    Semantics match batch session windows: an event exactly
    ``gap_seconds`` after its predecessor continues the session; one
    second later starts a new one.  Scale shape: one shuffle on ``key``;
    the boundary flag is lag() and the id is a running SUM over the same
    window — a single Window node, no joins.
    """
    keys = key if isinstance(key, (list, tuple)) else [key]
    order = [_c(ts)] + ([_c(tiebreak)] if tiebreak is not None else [])
    w = Window.partitionBy(*[_c(k) for k in keys]).orderBy(*order)
    prev = F.lag(_c(ts)).over(w)
    new_session = (
        prev.isNull()
        | (F.unix_timestamp(_c(ts)) - F.unix_timestamp(prev) > F.lit(gap_seconds))
    ).cast("long")
    run = Window.partitionBy(*[_c(k) for k in keys]).orderBy(*order).rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    return df.withColumn(session_col, F.sum(new_session).over(run) - F.lit(1))


def session_stats(
    df: DataFrame,
    key,
    ts: str,
    gap_seconds: int,
    tiebreak: str | None = None,
) -> DataFrame:
    """Sessionize then collapse to one row per (key, session):
    ``session_start``, ``session_end``, ``n_events``, ``duration_sec``.

    Scale shape: the sessionize shuffle is on ``key`` and the collapsing
    groupBy keys on (key, session_id) — AQE coalesces the second exchange
    since session_id is a function of the first partitioning's order.
    """
    keys = key if isinstance(key, (list, tuple)) else [key]
    s = sessionize(df, keys, ts, gap_seconds, tiebreak=tiebreak)
    return s.groupBy(*[_c(k) for k in keys], F.col("session_id")).agg(
        F.min(_c(ts)).alias("session_start"),
        F.max(_c(ts)).alias("session_end"),
        F.count(F.lit(1)).alias("n_events"),
        (F.unix_timestamp(F.max(_c(ts))) - F.unix_timestamp(F.min(_c(ts))))
        .cast("long")
        .alias("duration_sec"),
    )


def resample_locf(
    df: DataFrame,
    key,
    ts: str,
    value: str,
    step_seconds: int,
) -> DataFrame:
    """Regularize an irregular series onto a fixed ``step_seconds`` grid
    with last-observation-carried-forward fill.

    For each key the output has one row per grid bucket from the key's
    first observation through its last: ``bucket`` (int64 =
    floor(epoch/step)), ``bucket_ts`` (timestamp of the bucket start),
    ``<value>`` (the bucket's last observed value, carried forward across
    empty buckets — never NULL past the first observed bucket).

    In-bucket reduction is MAX (deterministic regardless of event order);
    swap in a max_by on an explicit order upstream if "latest in bucket"
    semantics are needed.

    Scale shape: (1) bucket aggregation — one shuffle on (key, bucket),
    map-side combined; (2) per-key min/max span rides the same exchange
    via a two-level agg; (3) spine = sequence(min_bucket, max_bucket)
    exploded JVM-side, joined back on (key, bucket) — broadcast when the
    observed side is small, shuffled otherwise; (4) LOCF = one
    last-ignorenulls window partitioned by key.  Nothing leaves codegen.
    """
    keys = list(key) if isinstance(key, (list, tuple)) else [key]
    if not all(isinstance(k, str) for k in keys):
        raise TypeError("resample_locf keys must be column names")
    bucket = (F.unix_timestamp(_c(ts)) / F.lit(step_seconds)).cast("long")

    observed = (
        df.select(*[F.col(k) for k in keys], bucket.alias("bucket"), _c(value).alias("__v"))
        .groupBy(*[F.col(k) for k in keys], "bucket")
        .agg(F.max("__v").alias("__v"))
    )
    spans = observed.groupBy(*[F.col(k) for k in keys]).agg(
        F.min("bucket").alias("__b0"), F.max("bucket").alias("__b1")
    )
    spine = spans.select(
        *[F.col(k) for k in keys],
        F.explode(F.sequence(F.col("__b0"), F.col("__b1"))).alias("bucket"),
    )
    joined = spine.join(observed, on=[*keys, "bucket"], how="left")
    w = (
        Window.partitionBy(*[F.col(k) for k in keys])
        .orderBy("bucket")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return joined.select(
        *[F.col(k) for k in keys],
        F.col("bucket"),
        F.timestamp_seconds(F.col("bucket") * F.lit(step_seconds)).alias("bucket_ts"),
        F.last("__v", ignorenulls=True).over(w).alias(value),
    )
