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


def test_interval_overlap_join_dedup_and_exactness(spark):
    from supersonic_spark.operators.join import interval_overlap_join

    # a1 [0,100] spans many bins; b1 [50,60] inside it; b2 [200,210] disjoint
    left = spark.createDataFrame([(1, 0.0, 100.0), (2, 150.0, 160.0)], "a_id long, a_lo double, a_hi double")
    right = spark.createDataFrame(
        [(10, 50.0, 60.0), (20, 200.0, 210.0), (30, 95.0, 155.0)],
        "b_id long, b_lo double, b_hi double",
    )
    out = interval_overlap_join(left, right, ("a_lo", "a_hi"), ("b_lo", "b_hi"), bin_width=10)
    got = rows(out, "a_id", "b_id")
    # each overlapping pair appears EXACTLY once despite sharing many bins
    assert got == [(1, 10), (1, 30), (2, 30)]


def test_interval_overlap_join_touching_endpoints(spark):
    from supersonic_spark.operators.join import interval_overlap_join

    left = spark.createDataFrame([(1, 0.0, 10.0)], "a_id long, a_lo double, a_hi double")
    right = spark.createDataFrame([(2, 10.0, 20.0)], "b_id long, b_lo double, b_hi double")
    out = interval_overlap_join(left, right, ("a_lo", "a_hi"), ("b_lo", "b_hi"), bin_width=100)
    assert rows(out, "a_id", "b_id") == [(1, 2)]  # closed intervals touch


def test_incremental_group_aggregate_matches_full(spark, tables):
    from supersonic_spark.operators.aggregate import (
        AggSpec, Aggregation, group_aggregate, incremental_group_aggregate,
    )

    o = tables["orders"].select(
        "o_custkey", "o_orderdate", F.col("o_totalprice").cast("decimal(12,2)").alias("p")
    )
    specs = [
        AggSpec(Aggregation.COUNT, None, "n"),
        AggSpec(Aggregation.SUM, "p", "s"),
        AggSpec(Aggregation.MIN, "o_orderdate", "mn"),
        AggSpec(Aggregation.MAX, "o_orderdate", "mx"),
    ]
    cutoff = F.lit("1997-01-01").cast("timestamp")
    state = group_aggregate(o.filter(F.col("o_orderdate") < cutoff), ["o_custkey"], specs)
    refreshed = incremental_group_aggregate(
        state, o.filter(F.col("o_orderdate") >= cutoff), ["o_custkey"], specs
    )
    full = group_aggregate(o, ["o_custkey"], specs)
    assert rows(refreshed) == rows(full)


def test_merge_agg_states_rejects_non_mergeable(spark):
    import pytest

    from supersonic_spark.operators.aggregate import AggSpec, Aggregation, merge_agg_states

    df = spark.createDataFrame([(1, 1)], "k long, v long")
    with pytest.raises(ValueError):
        merge_agg_states(df, df, ["k"], [AggSpec(Aggregation.CONCAT, "v", "v")])
    with pytest.raises(ValueError):
        merge_agg_states(df, df, ["k"], [AggSpec(Aggregation.SUM, "v", "v", distinct=True)])


def test_read_binary_and_text_files(spark, tmp_path):
    from supersonic_spark.sources.io import read_binary_files, read_text_files

    (tmp_path / "a.bin").write_bytes(b"\x00\x01payload")
    (tmp_path / "b.txt").write_text("line1\nline2\n")
    bins = read_binary_files(spark, str(tmp_path), glob="*.bin")
    got = bins.select("path", "length", "content").collect()
    assert len(got) == 1
    assert got[0]["path"].endswith("a.bin")
    assert got[0]["length"] == 9 and bytes(got[0]["content"]) == b"\x00\x01payload"

    lines = read_text_files(spark, str(tmp_path / "b.txt"))
    assert sorted(r["value"] for r in lines.collect()) == ["line1", "line2"]
    whole = read_text_files(spark, str(tmp_path / "b.txt"), whole_text=True)
    assert [r["value"] for r in whole.collect()] == ["line1\nline2\n"]
