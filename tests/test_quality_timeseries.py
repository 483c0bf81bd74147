"""Golden tests for the time-series (sessionize / resample_locf) and
data-quality (column_profile / validate_constraints / quantile binning)
operators — reference-style golden views (SURVEY.md §5: input rows +
expected rows on tiny inline DataFrames)."""

from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F

from supersonic_spark.operators import analytics, quality, timeseries
from tests.conftest import rows


def _ts(s: str) -> dt.datetime:
    return dt.datetime.fromisoformat(s)


def test_sessionize_gap_boundary(spark):
    # 3 events for user 1: +1800s continues the session, +1801s breaks it.
    df = spark.createDataFrame(
        [
            (1, 10, _ts("2024-01-01 00:00:00")),
            (2, 10, _ts("2024-01-01 00:30:00")),  # exactly gap later -> same
            (3, 10, _ts("2024-01-01 01:00:01")),  # gap+1 -> new session
            (4, 20, _ts("2024-01-01 05:00:00")),
        ],
        "event_id long, user_id long, ts timestamp",
    )
    out = timeseries.sessionize(df, "user_id", "ts", 1800, tiebreak="event_id")
    got = rows(out, "event_id", "session_id")
    assert got == [(1, 0), (2, 0), (3, 1), (4, 0)]


def test_session_stats_duration_and_counts(spark):
    df = spark.createDataFrame(
        [
            (1, 10, _ts("2024-01-01 00:00:00")),
            (2, 10, _ts("2024-01-01 00:10:00")),
            (3, 10, _ts("2024-01-01 02:00:00")),
        ],
        "event_id long, user_id long, ts timestamp",
    )
    out = timeseries.session_stats(df, "user_id", "ts", 1800, tiebreak="event_id")
    got = rows(out, "user_id", "session_id", "n_events", "duration_sec")
    assert got == [(10, 0, 2, 600), (10, 1, 1, 0)]


def test_resample_locf_fills_gaps_and_carries_forward(spark):
    # key 'a': buckets 0 and 3 observed -> buckets 1,2 filled with 1.0
    df = spark.createDataFrame(
        [
            ("a", _ts("1970-01-01 00:00:10"), 1.0),
            ("a", _ts("1970-01-01 00:03:10"), 4.0),
            ("b", _ts("1970-01-01 00:01:30"), 9.0),
        ],
        "k string, ts timestamp, v double",
    )
    out = timeseries.resample_locf(df, "k", "ts", "v", step_seconds=60)
    got = rows(out, "k", "bucket", "v")
    assert got == [
        ("a", 0, 1.0),
        ("a", 1, 1.0),
        ("a", 2, 1.0),
        ("a", 3, 4.0),
        ("b", 1, 9.0),
    ]
    # bucket_ts is the bucket start on the fixed grid
    one = out.filter((F.col("k") == "a") & (F.col("bucket") == 2)).collect()[0]
    assert one["bucket_ts"] == _ts("1970-01-01 00:02:00")


def test_resample_locf_in_bucket_max(spark):
    df = spark.createDataFrame(
        [("a", _ts("1970-01-01 00:00:01"), 5.0), ("a", _ts("1970-01-01 00:00:59"), 2.0)],
        "k string, ts timestamp, v double",
    )
    out = timeseries.resample_locf(df, "k", "ts", "v", step_seconds=60)
    assert rows(out, "k", "bucket", "v") == [("a", 0, 5.0)]


def test_column_profile_nulls_distincts_numeric_stats(spark):
    df = spark.createDataFrame(
        [(1, 2.0, "x"), (2, None, "y"), (2, 6.0, None), (3, 4.0, "x")],
        "a long, b double, s string",
    )
    prof = quality.column_profile(df)
    got = {r["column_name"]: r.asDict() for r in prof.collect()}
    assert got["a"]["n_rows"] == 4 and got["a"]["n_null"] == 0
    assert got["a"]["n_distinct"] == 3
    assert got["a"]["min_val"] == 1.0 and got["a"]["max_val"] == 3.0
    assert abs(got["a"]["avg_val"] - 2.0) < 1e-12
    assert got["b"]["n_null"] == 1 and got["b"]["n_distinct"] == 3
    assert abs(got["b"]["avg_val"] - 4.0) < 1e-12
    assert got["s"]["n_null"] == 1 and got["s"]["n_distinct"] == 2
    assert got["s"]["min_val"] is None and got["s"]["avg_val"] is None


def test_validate_constraints_all_kinds(spark):
    child = spark.createDataFrame(
        [(1, 100, 5.0, "1-A"), (2, 100, -1.0, "bad"), (3, None, 2.0, "2-B"), (3, 999, 3.0, "3-C")],
        "id long, fk long, v double, tag string",
    )
    parent = spark.createDataFrame([(100,), (200,)], "pk long")
    report = quality.validate_constraints(
        child,
        [
            quality.not_null("fk_not_null", "fk"),
            quality.in_range("v_range", "v", 0, 10),
            quality.matches("tag_format", "tag", "^[0-9]-[A-Z]$"),
            quality.satisfies("v_lt_id", F.col("v") < F.col("id") + 10),
            quality.unique("id_unique", ["id"]),
            quality.foreign_key("fk_valid", ["fk"], parent, ["pk"]),
        ],
    )
    got = dict(rows(report, "constraint_name", "n_violations"))
    assert got == {
        "fk_not_null": 1,
        "v_range": 1,
        "tag_format": 1,
        "v_lt_id": 0,
        "id_unique": 1,  # id=3 appears twice -> one extra row
        "fk_valid": 1,  # fk=999 has no parent; NULL fk is not a violation
    }


def test_validate_constraints_empty_input_reports_zero(spark):
    df = spark.createDataFrame([], "a long")
    report = quality.validate_constraints(
        df, [quality.not_null("a_nn", "a"), quality.unique("a_uq", ["a"])]
    )
    got = dict(rows(report, "constraint_name", "n_violations"))
    assert got == {"a_nn": 0, "a_uq": 0}


def test_quantile_bucketize_deciles_and_stats(spark):
    df = spark.createDataFrame([(i, float(i)) for i in range(1, 11)], "id long, v double")
    out = analytics.bucket_stats(df, "v", 5, tiebreak="id")
    got = rows(out, "bucket", "n", "lo", "hi")
    assert got == [
        (1, 2, 1.0, 2.0),
        (2, 2, 3.0, 4.0),
        (3, 2, 5.0, 6.0),
        (4, 2, 7.0, 8.0),
        (5, 2, 9.0, 10.0),
    ]


def test_quantile_bucketize_tiebreak_deterministic(spark):
    # all-equal values: buckets assigned by tiebreak order
    df = spark.createDataFrame([(i, 1.0) for i in range(1, 5)], "id long, v double")
    out = analytics.quantile_bucketize(df, "v", 2, tiebreak="id")
    assert rows(out, "id", "bucket") == [(1, 1), (2, 1), (3, 2), (4, 2)]
