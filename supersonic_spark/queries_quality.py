"""Time-series + data-quality query catalog (beyond-reference:
supersonic has no event-time, profiling, or constraint surface —
SURVEY.md §2.9; its only integrity check is RowidMergeJoin's
referential-integrity error).  All oracle-checked against DuckDB.

Determinism notes:
- epoch arithmetic uses floor semantics on both engines (Spark
  unix_timestamp floors; DuckDB ``epoch_us(ts) // 1000000`` integer
  division floors) — never double→int casts, which round in DuckDB but
  truncate in Spark (ROADMAP known constraints);
- session boundaries and NTILE buckets carry explicit tiebreaks so equal
  timestamps/values order identically on both engines;
- profile averages are rounded to 4 dp (double summation order differs
  across engines; everything else in the report is exact).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from supersonic_spark.operators import analytics, quality, timeseries
from supersonic_spark.queries import _t, q

_SESSIONIZE_ORACLE = """
WITH o AS (
  SELECT user_id, ts, event_id,
         CASE WHEN lag(ts) OVER w IS NULL
                OR (epoch_us(ts) // 1000000) - (epoch_us(lag(ts) OVER w) // 1000000) > 1800
              THEN 1 ELSE 0 END AS new_s
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
), s AS (
  SELECT user_id, ts,
         SUM(new_s) OVER (PARTITION BY user_id ORDER BY ts, event_id
                          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) - 1
           AS session_id
  FROM o
)
SELECT user_id, session_id,
       MIN(ts) AS session_start, MAX(ts) AS session_end,
       COUNT(*) AS n_events,
       (epoch_us(MAX(ts)) // 1000000) - (epoch_us(MIN(ts)) // 1000000) AS duration_sec
FROM s
GROUP BY user_id, session_id
"""


@q("sessionize_events", _SESSIONIZE_ORACLE)
def q_sessionize_events(spark, sf_dir):
    """Gap-based sessionization (30-min gap) collapsed to per-session
    stats.  Scale shape: one shuffle on user_id; session ids are a
    lag+running-sum window (no self-joins); the per-session collapse
    groups on (user_id, session_id) which AQE coalesces onto the same
    exchange."""
    t = _t(spark, sf_dir)
    return timeseries.session_stats(
        t["events"], "user_id", "ts", gap_seconds=1800, tiebreak="event_id"
    )


_RESAMPLE_ORACLE = """
WITH obs AS (
  SELECT event_type, (epoch_us(ts) // 1000000) // 86400 AS bucket,
         MAX(value) AS v
  FROM events GROUP BY 1, 2
), spans AS (
  SELECT event_type, MIN(bucket) AS b0, MAX(bucket) AS b1 FROM obs GROUP BY 1
), spine AS (
  SELECT event_type, unnest(generate_series(b0, b1)) AS bucket FROM spans
), j AS (
  SELECT s.event_type, s.bucket, o.v
  FROM spine s LEFT JOIN obs o USING (event_type, bucket)
)
SELECT event_type, bucket,
       make_timestamp(bucket * 86400 * 1000000) AS bucket_ts,
       last_value(v IGNORE NULLS) OVER (
         PARTITION BY event_type ORDER BY bucket
         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS value
FROM j
"""


@q("resample_locf_events", _RESAMPLE_ORACLE)
def q_resample_locf_events(spark, sf_dir):
    """Daily-grid resample of each event_type's value series with
    last-observation-carried-forward fill.  Scale shape: bucket agg is
    one map-side-combined shuffle; the spine explodes per key span (a key
    active one week doesn't pay for the corpus' history); LOCF is one
    last-ignorenulls window on the spine partitioning."""
    t = _t(spark, sf_dir)
    return timeseries.resample_locf(
        t["events"], "event_type", "ts", "value", step_seconds=86400
    )


_PROFILE_ORACLE = """
SELECT 'l_quantity' AS column_name, COUNT(*) AS n_rows,
       COUNT(*) - COUNT(l_quantity) AS n_null,
       COUNT(DISTINCT l_quantity) AS n_distinct,
       MIN(l_quantity) AS min_val, MAX(l_quantity) AS max_val,
       ROUND(AVG(l_quantity), 4) AS avg_val
FROM lineitem
UNION ALL
SELECT 'l_discount', COUNT(*), COUNT(*) - COUNT(l_discount),
       COUNT(DISTINCT l_discount), MIN(l_discount), MAX(l_discount),
       ROUND(AVG(l_discount), 4)
FROM lineitem
UNION ALL
SELECT 'l_returnflag', COUNT(*), COUNT(*) - COUNT(l_returnflag),
       COUNT(DISTINCT l_returnflag),
       CAST(NULL AS DOUBLE), CAST(NULL AS DOUBLE), CAST(NULL AS DOUBLE)
FROM lineitem
"""


@q("column_profile_lineitem", _PROFILE_ORACLE)
def q_column_profile_lineitem(spark, sf_dir):
    """One-scan column profile (rows / nulls / exact distincts / min /
    max / mean) over three lineitem columns.  Scale shape: a single
    global aggregate — multi-count-distinct plans through one Expand
    (the reference's own hybrid-agg NULL-fanout trick, SURVEY §4.1);
    the unpivot is on a 1-row result."""
    t = _t(spark, sf_dir)
    prof = quality.column_profile(
        t["lineitem"], ["l_quantity", "l_discount", "l_returnflag"]
    )
    return prof.select(
        "column_name", "n_rows", "n_null", "n_distinct",
        "min_val", "max_val", F.round("avg_val", 4).alias("avg_val"),
    )


_CONSTRAINTS_ORACLE = """
SELECT 'custkey_not_null' AS constraint_name,
       CAST(COUNT(*) FILTER (o_custkey IS NULL) AS BIGINT) AS n_violations
FROM orders
UNION ALL
SELECT 'totalprice_range',
       CAST(COUNT(*) FILTER (o_totalprice IS NULL OR o_totalprice < 0
                             OR o_totalprice > 10000000) AS BIGINT)
FROM orders
UNION ALL
SELECT 'status_format',
       CAST(COUNT(*) FILTER (o_orderstatus IS NULL
                             OR NOT regexp_matches(o_orderstatus, '^[A-Z]$')) AS BIGINT)
FROM orders
UNION ALL
SELECT 'orderkey_unique',
       CAST(COUNT(*) - COUNT(DISTINCT o_orderkey) AS BIGINT)
FROM orders
UNION ALL
SELECT 'custkey_fk', CAST(COUNT(*) AS BIGINT)
FROM orders o
WHERE o_custkey IS NOT NULL
  AND NOT EXISTS (SELECT 1 FROM customer c WHERE c.c_custkey = o.o_custkey)
"""


@q("validate_constraints_orders", _CONSTRAINTS_ORACLE)
def q_validate_constraints_orders(spark, sf_dir):
    """Constraint-validation report over orders: not-null, numeric range,
    regex format, key uniqueness, FK into customer.  Scale shape: the
    three row-level checks fuse into ONE conditional-sum scan; uniqueness
    is one aggregation on the key; the FK check is a left-anti join that
    broadcasts the (deduplicated) parent keys when small."""
    t = _t(spark, sf_dir)
    report = quality.validate_constraints(
        t["orders"],
        [
            quality.not_null("custkey_not_null", "o_custkey"),
            quality.in_range("totalprice_range", "o_totalprice", 0, 10_000_000),
            quality.matches("status_format", "o_orderstatus", "^[A-Z]$"),
            quality.unique("orderkey_unique", ["o_orderkey"]),
            quality.foreign_key(
                "custkey_fk", ["o_custkey"], t["customer"], ["c_custkey"]
            ),
        ],
    )
    return report


_BUCKETIZE_ORACLE = """
WITH b AS (
  SELECT o_totalprice,
         ntile(10) OVER (ORDER BY o_totalprice, o_orderkey) AS bucket
  FROM orders
)
SELECT bucket, COUNT(*) AS n,
       MIN(o_totalprice) AS lo, MAX(o_totalprice) AS hi
FROM b GROUP BY bucket
"""


@q("quantile_bucketize_orders", _BUCKETIZE_ORACLE)
def q_quantile_bucketize_orders(spark, sf_dir):
    """Equal-frequency decile binning of order totals, collapsed to the
    empirical fences per bucket.  Scale shape: NTILE's global order plans
    as a sampled range exchange (parallel, no single-task funnel); the
    fence collapse is a 10-key aggregation."""
    t = _t(spark, sf_dir)
    return analytics.bucket_stats(
        t["orders"], "o_totalprice", 10, tiebreak="o_orderkey"
    )


_INTERVAL_ORACLE = """
WITH iv AS (
  SELECT o_orderkey AS k, o_custkey AS custkey,
         (epoch_us(o_orderdate) // 1000000) // 86400 AS lo,
         (epoch_us(o_orderdate) // 1000000) // 86400 + 30 AS hi
  FROM orders
)
SELECT a.custkey AS custkey, a.k AS a_key, b.k AS b_key,
       LEAST(a.hi, b.hi) - GREATEST(a.lo, b.lo) AS overlap_days
FROM iv a JOIN iv b
  ON a.custkey = b.custkey AND a.lo <= b.hi AND b.lo <= a.hi AND a.k < b.k
"""


@q("interval_overlap_join_orders", _INTERVAL_ORACLE)
def q_interval_overlap_join_orders(spark, sf_dir):
    """Self overlap-join: pairs of a customer's orders whose 30-day
    windows overlap.  Scale shape: both sides bin onto 30-day cells so
    the non-equi overlap becomes an equi join on (bin, custkey) + exact
    filter — no nested-loop; pair dedup is the canonical-bin filter (no
    extra shuffle)."""
    from supersonic_spark.operators.join import interval_overlap_join

    t = _t(spark, sf_dir)
    day = F.floor(F.unix_timestamp(F.col("o_orderdate")) / F.lit(86400))
    a = t["orders"].select(
        F.col("o_orderkey").alias("a_key"), F.col("o_custkey").alias("custkey"),
        day.alias("a_lo"), (day + F.lit(30)).alias("a_hi"),
    )
    b = t["orders"].select(
        F.col("o_orderkey").alias("b_key"), F.col("o_custkey").alias("custkey"),
        day.alias("b_lo"), (day + F.lit(30)).alias("b_hi"),
    )
    pairs = interval_overlap_join(
        a, b, ("a_lo", "a_hi"), ("b_lo", "b_hi"), bin_width=30, keys=["custkey"]
    ).filter(F.col("a_key") < F.col("b_key"))
    return pairs.select(
        "custkey", "a_key", "b_key",
        (F.least("a_hi", "b_hi") - F.greatest("a_lo", "b_lo")).alias("overlap_days"),
    )


_INCR_AGG_ORACLE = """
SELECT o_custkey,
       COUNT(*) AS n_orders,
       CAST(SUM(CAST(o_totalprice AS DECIMAL(12,2))) AS DOUBLE) AS sum_total,
       MIN(o_orderdate) AS first_order,
       MAX(o_orderdate) AS last_order
FROM orders
GROUP BY o_custkey
"""


@q("incremental_agg_orders", _INCR_AGG_ORACLE)
def q_incremental_agg_orders(spark, sf_dir):
    """Incremental rollup maintenance: per-customer order stats built as
    state(history before 1997) merged with delta(1997+) — the refreshed
    state must equal the from-scratch aggregate (the oracle).  Scale
    shape: history is aggregated once into key-sized state; each refresh
    scans only the delta (one partial-agg shuffle + one merge shuffle on
    the same key — AQE coalesces)."""
    from supersonic_spark.operators import core
    from supersonic_spark.operators.aggregate import (
        AggSpec, Aggregation, group_aggregate, incremental_group_aggregate,
    )

    t = _t(spark, sf_dir)
    o = core.compute(
        t["orders"],
        {"o_custkey": F.col("o_custkey"), "o_orderdate": F.col("o_orderdate"),
         "price_d": F.col("o_totalprice").cast("decimal(12,2)")},
    )
    cutoff = F.lit("1997-01-01").cast("timestamp")
    specs = [
        AggSpec(Aggregation.COUNT, None, "n_orders"),
        AggSpec(Aggregation.SUM, "price_d", "sum_total"),
        AggSpec(Aggregation.MIN, "o_orderdate", "first_order"),
        AggSpec(Aggregation.MAX, "o_orderdate", "last_order"),
    ]
    state = group_aggregate(o.filter(F.col("o_orderdate") < cutoff), ["o_custkey"], specs)
    refreshed = incremental_group_aggregate(
        state, o.filter(F.col("o_orderdate") >= cutoff), ["o_custkey"], specs
    )
    return refreshed.select(
        "o_custkey", "n_orders",
        F.col("sum_total").cast("double").alias("sum_total"),
        "first_order", "last_order",
    )
