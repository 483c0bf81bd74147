"""Golden unit tests per operator — mirrors the reference's OperationTest
pattern (testing/operation_testing.h:15-45): small inline inputs, exact
expected outputs.  The block-size sweep analog (operation_testing.h:43-45)
is the repartition sweep in test_chunking_robustness.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from supersonic_spark.operators import core, join as join_ops, setops
from supersonic_spark.operators import sort as sort_ops
from supersonic_spark.operators.aggregate import (
    AggSpec,
    Aggregation,
    group_aggregate,
    group_aggregate_with_limit,
    scalar_aggregate,
)
from supersonic_spark.operators.projector import (
    project_attribute_at,
    project_named_attribute,
    project_rename,
)
from supersonic_spark.operators.rowid import with_row_id, with_row_id_window
from supersonic_spark.operators.sort import SortKey

from tests.conftest import rows


@pytest.fixture(scope="module")
def df(spark):
    return core.scan_view(
        spark,
        [(1, "a", 10.0), (2, "b", 20.0), (3, None, 30.0), (4, "b", None)],
        "id int, tag string, val double",
    )


# --- scan / project / compute / filter / limit (cursor/core) ---

def test_project_named(df):
    out = core.project(df, project_named_attribute("tag", "id"))
    assert out.columns == ["tag", "id"]
    assert rows(out) == [("a", 1), ("b", 2), ("b", 4), (None, 3)]


def test_project_positional_and_rename(df):
    out = core.project(df, project_attribute_at(2, 0))
    assert out.columns == ["val", "id"]
    out2 = core.project(df, project_rename({"id": "key"}))
    assert out2.columns == ["key"]


def test_compute(df):
    out = core.compute(df, {"twice": F.col("id") * 2})
    assert rows(out) == [(2,), (4,), (6,), (8,)]


def test_filter_null_predicate_drops(df):
    # NULL predicate ⇒ drop (filter.h:44; SQL WHERE semantics)
    out = core.filter_op(df, F.col("val") > 15.0)
    assert rows(out, "id") == [(2,), (3,)]


def test_limit_offset(spark):
    df = spark.range(100)
    out = core.limit(df, 10, offset=5, order=[F.col("id")])
    assert rows(out) == [(i,) for i in range(5, 15)]


def test_generate(spark):
    assert core.generate(spark, 7).count() == 7


def test_scan_view_with_selection(spark):
    base = core.scan_view(spark, [(10, "x"), (20, "y"), (30, "z")], "k int, v string")
    # selection vector with repeats and skips (scan_view.h:43-49)
    out = core.scan_view_with_selection(base, [2, 0, 2], ["k"])
    assert sorted(r["v"] for r in out.collect()) == ["x", "z", "z"]


# --- aggregate (cursor/core/aggregate.h) ---

def test_group_aggregate_null_key_and_null_inputs(df):
    # NULL is a valid grouping key (aggregate_groups.cc:516-519);
    # aggregations ignore NULL inputs except COUNT(*)
    out = group_aggregate(
        df,
        ["tag"],
        [
            AggSpec(Aggregation.SUM, "val", "s"),
            AggSpec(Aggregation.COUNT, "val", "c_val"),
            AggSpec(Aggregation.COUNT, None, "c_star"),
        ],
    )
    assert rows(out) == [("a", 10.0, 1, 1), ("b", 20.0, 1, 2), (None, 30.0, 1, 1)]


def test_scalar_aggregate_empty_input_one_row(spark):
    empty = spark.range(0).select(F.col("id").cast("double").alias("x"))
    out = scalar_aggregate(
        empty, [AggSpec(Aggregation.COUNT, None, "c"), AggSpec(Aggregation.SUM, "x", "s")]
    )
    assert rows(out) == [(0, None)]  # exactly 1 row (aggregate.h:338-345)


def test_group_aggregate_empty_input_empty_output(spark):
    empty = spark.range(0).select(F.col("id").alias("k"), F.col("id").alias("x"))
    out = group_aggregate(empty, ["k"], [AggSpec(Aggregation.SUM, "x", "s")])
    assert out.count() == 0  # aggregate.h:218-221


def test_concat_first_last_with_order(spark):
    df = core.scan_view(
        spark,
        [(1, 3, "c"), (1, 1, "a"), (1, 2, "b"), (2, 1, "z")],
        "k int, pos int, v string",
    )
    out = group_aggregate(
        df,
        ["k"],
        [
            AggSpec(Aggregation.CONCAT, "v", "cc", separator=",", order_by=("pos",)),
            AggSpec(Aggregation.FIRST, "v", "f", order_by=("pos",)),
            AggSpec(Aggregation.LAST, "v", "l", order_by=("pos",)),
        ],
    )
    assert rows(out) == [(1, "a,b,c", "a", "c"), (2, "z", "z", "z")]


def test_concat_distinct_sorted(spark):
    df = core.scan_view(spark, [(1, "b"), (1, "a"), (1, "b")], "k int, v string")
    out = group_aggregate(
        df, ["k"], [AggSpec(Aggregation.CONCAT, "v", "cc", distinct=True)]
    )
    assert rows(out) == [(1, "a,b")]


def test_group_aggregate_with_limit_overflow_row(spark):
    df = core.scan_view(
        spark,
        [("a", 1), ("b", 2), ("c", 3), ("d", 4), ("e", 5)],
        "k string, x int",
    )
    out = group_aggregate_with_limit(
        df,
        ["k"],
        [AggSpec(Aggregation.SUM, "x", "s"), AggSpec(Aggregation.COUNT, None, "c")],
        limit=2,
    )
    # first 2 keys kept; c+d+e lumped into NULL-key overflow (aggregate.h:267-276)
    assert rows(out) == [("a", 1, 1), ("b", 2, 1), (None, 12, 3)]


def test_group_aggregate_with_limit_no_overflow(spark):
    df = core.scan_view(spark, [("a", 1), ("b", 2)], "k string, x int")
    out = group_aggregate_with_limit(
        df, ["k"], [AggSpec(Aggregation.SUM, "x", "s")], limit=5
    )
    assert rows(out) == [("a", 1), ("b", 2)]


# --- sort (cursor/core/sort.h) ---

def test_sort_nulls_and_direction(spark):
    df = core.scan_view(spark, [(None,), (3,), (1,), (2,)], "x int")
    asc_nf = [r["x"] for r in sort_ops.sort(df, [SortKey("x", nulls_first=True)]).collect()]
    assert asc_nf == [None, 1, 2, 3]
    desc_nl = [
        r["x"]
        for r in sort_ops.sort(df, [SortKey("x", ascending=False, nulls_first=False)]).collect()
    ]
    assert desc_nl == [3, 2, 1, None]


def test_extended_sort_case_insensitive_limit(spark):
    df = core.scan_view(spark, [("B", 1), ("a", 2), ("C", 3)], "s string, i int")
    out = sort_ops.extended_sort(df, [SortKey("s", case_insensitive=True)], limit=2)
    assert [r["s"] for r in out.collect()] == ["a", "B"]


def test_sort_permutation(spark):
    df = core.scan_view(spark, [(30,), (10,), (20,)], "x int")
    out = sort_ops.sort_permutation(df, [SortKey("x")])
    assert rows(out) == [(10, 0), (20, 1), (30, 2)]


# --- joins (cursor/core/hash_join.h etc.) ---

def test_hash_join_inner_and_left(spark):
    left = core.scan_view(spark, [(1, "l1"), (2, "l2"), (3, "l3")], "k int, lv string")
    right = core.scan_view(spark, [(1, "r1"), (3, "r3")], "k int, rv string")
    inner = join_ops.hash_join(left, right, on="k", how="inner")
    assert rows(inner) == [(1, "l1", "r1"), (3, "l3", "r3")]
    left_j = join_ops.hash_join(left, right, on="k", how="left", unique_right=True)
    assert rows(left_j) == [(1, "l1", "r1"), (2, "l2", None), (3, "l3", "r3")]


def test_rowid_merge_join(spark):
    left = core.scan_view(spark, [(0, "x"), (1, "y"), (1, "z")], "rid bigint, lv string")
    right = core.scan_view(spark, [("b",), ("a",)], "rv string")
    # right ordered by rv: a→0, b→1
    out = join_ops.rowid_merge_join(left, "rid", right, ["rv"])
    assert rows(out, "lv", "rv") == [("x", "a"), ("y", "b"), ("z", "b")]


def test_rowid_merge_join_integrity_error(spark):
    left = core.scan_view(spark, [(5, "x")], "rid bigint, lv string")
    right = core.scan_view(spark, [("a",)], "rv string")
    with pytest.raises(ValueError, match="referential integrity"):
        join_ops.rowid_merge_join(left, "rid", right, ["rv"], check_integrity=True)


def test_foreign_filter_renumbers(spark):
    fact = core.scan_view(spark, [(10, 1), (30, 2), (30, 3), (99, 4)], "fk int, payload int")
    dim = core.scan_view(spark, [(10,), (30,), (50,)], "key int")
    out = join_ops.foreign_filter(fact, "fk", dim, "key")
    # 10→0, 30→1, 50→2 (foreign_filter.h:36-40); fk=99 dropped (semi-join)
    assert rows(out, "payload", "fk") == [(1, 0), (2, 1), (3, 1)]


# --- set ops (cursor/core/merge_union_all.h, coalesce.h) ---

def test_merge_union_all(spark):
    a = core.scan_view(spark, [(1,), (3,)], "x int")
    b = core.scan_view(spark, [(2,), (4,)], "x int")
    out = setops.merge_union_all([a, b], [SortKey("x")])
    assert [r["x"] for r in out.collect()] == [1, 2, 3, 4]


def test_coalesce_zip(spark):
    a = core.scan_view(spark, [(2, "b"), (1, "a")], "ak int, av string")
    b = core.scan_view(spark, [(20, "B"), (10, "A")], "bk int, bv string")
    out = setops.coalesce_zip([a, b], [["ak"], ["bk"]])
    assert rows(out, "av", "bv") == [("a", "A"), ("b", "B")]


# --- row-id discipline ---

def test_with_row_id_matches_window(spark):
    df = spark.range(1000).select((F.col("id") * 37 % 1000).alias("x"))
    fast = rows(with_row_id(df, ["x"]))
    slow = rows(with_row_id_window(df, ["x"]))
    assert fast == slow


def test_chunking_robustness(spark):
    """Block-size sweep analog (operation_testing.h:43-45): results must be
    invariant to partitioning."""
    data = [(i % 7, float(i)) for i in range(500)]
    expected = None
    for parts in (1, 3, 13):
        df = core.scan_view(spark, data, "k int, v double").repartition(parts)
        out = rows(
            group_aggregate(
                df, ["k"], [AggSpec(Aggregation.SUM, "v", "s"), AggSpec(Aggregation.COUNT, None, "c")]
            )
        )
        if expected is None:
            expected = out
        assert out == expected


def test_salted_group_aggregate_matches_plain(spark):
    from supersonic_spark.operators import aggregate as agg
    from supersonic_spark.operators.aggregate import AggSpec, Aggregation

    rows = [(("hot" if i % 10 else f"k{i}"), float(i % 7), i) for i in range(200)]
    df = core.scan_view(spark, rows, "k string, v double, uid long")
    specs = [
        AggSpec(Aggregation.COUNT, None, "n"),
        AggSpec(Aggregation.SUM, "v", "total"),
        AggSpec(Aggregation.MIN, "uid", "lo"),
        AggSpec(Aggregation.MAX, "uid", "hi"),
    ]
    plain = {r["k"]: (r["n"], r["total"], r["lo"], r["hi"])
             for r in agg.group_aggregate(df, ["k"], specs).collect()}
    salted = {r["k"]: (r["n"], r["total"], r["lo"], r["hi"])
              for r in agg.salted_group_aggregate(df, ["k"], specs, salt_buckets=8).collect()}
    assert plain == salted

    import pytest as _pytest
    with _pytest.raises(ValueError, match="not\\s+decomposable"):
        agg.salted_group_aggregate(df, ["k"], [AggSpec(Aggregation.FIRST, "v", "f")])


def test_salted_join_matches_plain(spark):
    from supersonic_spark.operators import aggregate as agg

    left = core.scan_view(
        spark, [(("hot" if i % 5 else f"k{i}"), i) for i in range(100)], "k string, lv long"
    )
    right = core.scan_view(spark, [("hot", 1), ("k5", 2), ("zzz", 3)], "k string, rv long")
    plain = sorted((r["k"], r["lv"], r["rv"]) for r in left.join(right, "k").collect())
    salted = sorted(
        (r["k"], r["lv"], r["rv"]) for r in agg.salted_join(left, right, ["k"], 4).collect()
    )
    assert plain == salted


def test_rollup_cube_and_approx_distinct(spark):
    from supersonic_spark.operators import aggregate as agg
    from supersonic_spark.operators.aggregate import AggSpec, Aggregation

    df = core.scan_view(
        spark,
        [("a", "x", 1.0), ("a", "y", 2.0), ("b", "x", 4.0)],
        "g1 string, g2 string, v double",
    )
    roll = agg.group_aggregate_rollup(df, ["g1", "g2"], [AggSpec(Aggregation.SUM, "v", "s")])
    assert {(r["g1"], r["g2"], r["s"]) for r in roll.collect()} == {
        ("a", "x", 1.0), ("a", "y", 2.0), ("b", "x", 4.0),
        ("a", None, 3.0), ("b", None, 4.0), (None, None, 7.0),
    }
    cube = agg.group_aggregate_cube(df, ["g1", "g2"], [AggSpec(Aggregation.SUM, "v", "s")])
    assert (None, "x", 5.0) in {(r["g1"], r["g2"], r["s"]) for r in cube.collect()}

    ad = agg.approx_distinct_aggregate(df, ["g1"], "g2", "nd", rsd=0.01)
    assert {(r["g1"], r["nd"]) for r in ad.collect()} == {("a", 2), ("b", 1)}


def test_compute_accepts_sql_expression_strings(spark):
    df = core.scan_view(spark, [(1, 2), (3, 4)], "a int, b int")
    out = core.compute(df, {"s": "a + b", "p": F.col("a") * F.col("b")}, keep_input=True)
    rows = {(r["a"], r["s"], r["p"]) for r in out.collect()}
    assert rows == {(1, 3, 2), (3, 7, 12)}


def test_heavy_hitters(spark):
    from supersonic_spark.operators.aggregate import heavy_hitters

    rows = [("hot",)] * 60 + [("warm",)] * 25 + [(f"k{i}",) for i in range(15)]
    df = core.scan_view(spark, rows, "k string")
    got = [(r["key"], r["n"], round(r["share"], 2)) for r in
           heavy_hitters(df, "k", min_share=0.10).collect()]
    assert got == [("hot", 60, 0.6), ("warm", 25, 0.25)]
    assert heavy_hitters(df.limit(0), "k").count() == 0


def test_union_all(spark):
    from supersonic_spark.operators import setops

    a = core.scan_view(spark, [(1,)], "x int")
    b = core.scan_view(spark, [(2,)], "x int")
    c = core.scan_view(spark, [(3,)], "x int")
    assert sorted(r["x"] for r in setops.union_all([a, b, c]).collect()) == [1, 2, 3]


def test_oracle_queries_invariant_to_partitioning(spark):
    """Chunking-robustness on the query surface (SURVEY §5 adopted item 3):
    results must not depend on spark.sql.shuffle.partitions."""
    from __spark_entry__ import queries

    qs = queries()
    sf = "/root/testdata/sf0.001"
    prev = spark.conf.get("spark.sql.shuffle.partitions")
    try:
        baselines = {}
        for parts in ("1", "7", "32"):
            spark.conf.set("spark.sql.shuffle.partitions", parts)
            for name in ("tpch_q1", "dedup_exact", "stateful_running_sum", "merge_union_all"):
                rows = sorted(map(tuple, qs[name](spark, sf).collect()))
                if name in baselines:
                    assert rows == baselines[name], f"{name} varies with partitions={parts}"
                else:
                    baselines[name] = rows
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", prev)


def test_asof_join_directions_and_tolerance(spark):
    import datetime as dtm

    t0 = dtm.datetime(2024, 1, 1)

    def ts(m):
        return t0 + dtm.timedelta(minutes=m)

    trades = core.scan_view(
        spark,
        [("A", ts(10), 100.0), ("A", ts(30), 101.0), ("B", ts(5), 50.0)],
        "sym string, ts timestamp, px double",
    )
    quotes = core.scan_view(
        spark,
        [("A", ts(9), 99.5), ("A", ts(10), 99.9), ("A", ts(29), 100.9),
         ("B", ts(40), 49.9)],
        "sym string, ts timestamp, bid double",
    )
    # backward: latest quote at-or-before each trade (inclusive at equal ts)
    back = {
        (r["sym"], r["ts"].minute): (r["ts_right"].minute if r["ts_right"] else None,
                                     r["bid"])
        for r in join_ops.asof_join(
            trades, quotes, ["sym"], "ts", "ts", ["bid"]
        ).collect()
    }
    assert back == {("A", 10): (10, 99.9), ("A", 30): (29, 100.9), ("B", 5): (None, None)}

    # forward: earliest quote at-or-after
    fwd = {
        (r["sym"], r["ts"].minute): r["bid"]
        for r in join_ops.asof_join(
            trades, quotes, ["sym"], "ts", "ts", ["bid"], direction="forward"
        ).collect()
    }
    assert fwd == {("A", 10): 99.9, ("A", 30): None, ("B", 5): 49.9}

    # tolerance nulls far matches; inner drops unmatched rows
    tol = join_ops.asof_join(
        trades, quotes, ["sym"], "ts", "ts", ["bid"],
        tolerance="1 minutes", how="inner",
    )
    got = {(r["sym"], r["ts"].minute): r["bid"] for r in tol.collect()}
    assert got == {("A", 10): 99.9, ("A", 30): 100.9}


def test_range_join_overlapping_intervals(spark):
    pts = core.scan_view(spark, [(1, 5.0), (2, 15.0), (3, 45.0)], "id long, v double")
    ivals = core.scan_view(
        spark,
        [("a", 0.0, 10.0), ("b", 5.0, 20.0), ("c", 30.0, 40.0)],
        "name string, lo double, hi double",
    )
    out = join_ops.range_join(pts, ivals, "v", "lo", "hi", bin_width=10.0)
    got = sorted((r["id"], r["name"]) for r in out.collect())
    # 5.0 ∈ [0,10] and [5,20] (inclusive bounds); 15 ∈ [5,20]; 45 matches none
    assert got == [(1, "a"), (1, "b"), (2, "b")]


def test_analytics_percentile_approx_near_exact(spark, tables):
    from supersonic_spark.operators import analytics

    orders = tables["orders"]
    exact = analytics.percentile_aggregate(
        orders, ["o_orderstatus"], "o_totalprice", [0.5, 0.95], exact=True
    ).collect()
    approx = analytics.percentile_aggregate(
        orders, ["o_orderstatus"], "o_totalprice", [0.5, 0.95], exact=False
    ).collect()
    ex = {r["o_orderstatus"]: (r["p50"], r["p95"]) for r in exact}
    ap = {r["o_orderstatus"]: (r["p50"], r["p95"]) for r in approx}
    for k in ex:
        for e, a in zip(ex[k], ap[k]):
            assert abs(a - e) / max(abs(e), 1) < 0.05  # sketch within 5%


def test_window_rank_rejects_unknown_ranker(spark, tables):
    from supersonic_spark.operators import analytics

    with pytest.raises(ValueError, match="unknown ranker"):
        analytics.window_rank(
            tables["orders"], ["o_custkey"], ["o_orderkey"], {"x": "median_rank"}
        )


# ---------------------------------------------------------------------------
# Event analytics: funnel / cohort / moving window frames
# ---------------------------------------------------------------------------

def test_funnel_depths_strict_ordering(spark):
    """Depth counts a step only when its first occurrence is strictly after
    the previous step's — out-of-order and missing steps stop the funnel."""
    from datetime import datetime as dt

    from supersonic_spark.operators.analytics import funnel

    rows = [
        # u1: view < click < buy  -> depth 3
        (1, dt(2024, 1, 1), "view"), (1, dt(2024, 1, 2), "click"),
        (1, dt(2024, 1, 3), "buy"),
        # u2: click BEFORE view -> depth 1 (view exists, click not after it)
        (2, dt(2024, 1, 2), "view"), (2, dt(2024, 1, 1), "click"),
        # u3: view only -> depth 1
        (3, dt(2024, 1, 1), "view"),
        # u4: no funnel steps at all -> depth 0
        (4, dt(2024, 1, 1), "error"),
        # u5: view < click, no buy -> depth 2 (later re-views don't matter)
        (5, dt(2024, 1, 1), "view"), (5, dt(2024, 1, 2), "click"),
        (5, dt(2024, 1, 3), "view"),
    ]
    df = spark.createDataFrame(rows, ["user_id", "ts", "step"])
    out = funnel(df, "user_id", "ts", "step", ["view", "click", "buy"])
    got = {r["user_id"]: r["depth"] for r in out.collect()}
    assert got == {1: 3, 2: 1, 3: 1, 4: 0, 5: 2}


def test_cohort_retention_weekly_matrix(spark):
    from datetime import datetime as dt

    from supersonic_spark.operators.analytics import cohort_retention

    rows = [
        # u1 first in week of Jan 1 (Mon), active weeks 0, 1 and 3
        (1, dt(2024, 1, 2)), (1, dt(2024, 1, 9)), (1, dt(2024, 1, 24)),
        # u2 same cohort, active week 0 only (two events, one distinct week)
        (2, dt(2024, 1, 3)), (2, dt(2024, 1, 4)),
        # u3 cohort of Jan 8, active weeks 0 and 1
        (3, dt(2024, 1, 10)), (3, dt(2024, 1, 16)),
    ]
    df = spark.createDataFrame(rows, ["user_id", "ts"])
    out = cohort_retention(df, "user_id", "ts", granularity="week")
    got = {
        (r["cohort"].strftime("%Y-%m-%d"), r["offset"]): r["n_users"]
        for r in out.collect()
    }
    assert got == {
        ("2024-01-01", 0): 2, ("2024-01-01", 1): 1, ("2024-01-01", 3): 1,
        ("2024-01-08", 0): 1, ("2024-01-08", 1): 1,
    }


def test_moving_window_agg_matches_brute_force(spark):
    import random

    from pyspark.sql import functions as F

    from supersonic_spark.operators.analytics import moving_window_agg

    rng = random.Random(7)
    rows = [(i % 3, i, rng.randint(-50, 50)) for i in range(60)]
    df = spark.createDataFrame(rows, ["k", "seq", "v"])
    out = moving_window_agg(
        df, "k", "seq",
        {"mov_sum": F.sum("v"), "mov_min": F.min("v")},
        frame=(-2, 0),
    ).collect()
    by_key = {}
    for k, seq, v in rows:
        by_key.setdefault(k, []).append((seq, v))
    expect = {}
    for k, items in by_key.items():
        items.sort()
        for i, (seq, _) in enumerate(items):
            window = [v for _, v in items[max(0, i - 2): i + 1]]
            expect[(k, seq)] = (sum(window), min(window))
    got = {(r["k"], r["seq"]): (r["mov_sum"], r["mov_min"]) for r in out}
    assert got == expect


def test_moving_window_agg_unbounded_range(spark):
    from pyspark.sql import functions as F

    from supersonic_spark.operators.analytics import moving_window_agg

    df = spark.createDataFrame(
        [(1, 1, 10), (1, 2, 20), (1, 3, 30)], ["k", "seq", "v"]
    )
    out = moving_window_agg(
        df, "k", "seq", {"run": F.sum("v")}, frame=(None, 0)
    ).collect()
    assert {(r["seq"]): r["run"] for r in out} == {1: 10, 2: 30, 3: 60}


def test_histogram_bins_and_range_drop(spark):
    from supersonic_spark.operators.analytics import histogram

    df = spark.createDataFrame(
        [(x,) for x in [0.0, 0.5, 9.9, 10.0, 25.0, 99.9, 100.0, -1.0]], ["v"]
    )
    out = histogram(df, "v", 0.0, 100.0, 10).collect()
    got = {r["bin"]: (r["bin_lo"], r["bin_hi"], r["n"]) for r in out}
    # 100.0 and -1.0 are out of [0,100) and dropped
    assert got == {
        0: (0.0, 10.0, 3), 1: (10.0, 20.0, 1), 2: (20.0, 30.0, 1),
        9: (90.0, 100.0, 1),
    }


def test_histogram_grouped_keys(spark):
    from supersonic_spark.operators.analytics import histogram

    df = spark.createDataFrame(
        [("a", 1.0), ("a", 2.0), ("b", 1.0), ("b", 6.0)], ["k", "v"]
    )
    out = histogram(df, "v", 0.0, 10.0, 2, keys=["k"]).collect()
    got = {(r["k"], r["bin"]): r["n"] for r in out}
    assert got == {("a", 0): 2, ("b", 0): 1, ("b", 1): 1}


def test_key_profile_shares_and_totals(spark):
    from supersonic_spark.operators.analytics import key_profile

    df = spark.createDataFrame(
        [("a",)] * 5 + [("b",)] * 3 + [("c",)] * 2, ["k"]
    )
    out = key_profile(df, ["k"], k=2).collect()
    assert [(r["k"], r["n"], r["share"]) for r in out] == [("a", 5, 0.5), ("b", 3, 0.3)]
    assert all(r["total_rows"] == 10 and r["n_distinct_keys"] == 3 for r in out)


def test_upsert_latest_versions_ties_inserts(spark):
    from supersonic_spark.operators.setops import upsert_latest

    existing = spark.createDataFrame(
        [(1, "old", 1), (2, "keep", 5)], ["k", "v", "ver"]
    )
    updates = spark.createDataFrame(
        [(1, "new", 2), (2, "upd", 5), (3, "ins", 1)], ["k", "v", "ver"]
    )
    out = {r["k"]: r["v"] for r in upsert_latest(existing, updates, ["k"], "ver").collect()}
    # higher version wins; equal version -> updates side wins; new keys insert
    assert out == {1: "new", 2: "upd", 3: "ins"}
    # updates-empty degenerate: existing passes through
    empty = updates.limit(0)
    out2 = {r["k"]: r["v"] for r in upsert_latest(existing, empty, ["k"], "ver").collect()}
    assert out2 == {1: "old", 2: "keep"}


def test_prefilter_join_matches_plain_and_falls_back(spark):
    from supersonic_spark.operators.join import prefilter_join

    fact = spark.createDataFrame([(i, i % 10) for i in range(100)], "id long, k long")
    dim = spark.createDataFrame([(2, "a"), (7, "b")], "k long, name string")
    out = prefilter_join(fact, dim, on="k").select("id", "k", "name")
    plain = fact.join(dim, on="k").select("id", "k", "name")
    assert sorted(map(tuple, out.collect())) == sorted(map(tuple, plain.collect()))
    # semi flavor returns only fact columns
    semi = prefilter_join(fact, dim, on=("k", "k"), how="semi")
    assert semi.columns == ["id", "k"] and semi.count() == 20
    # key set over the cap -> identical result via plain join fallback
    fb = prefilter_join(fact, dim, on="k", max_keys=1).select("id", "k", "name")
    assert sorted(map(tuple, fb.collect())) == sorted(map(tuple, plain.collect()))
    # NULL dim keys never enter the IN list, NULL fact keys never match
    factn = spark.createDataFrame([(1, None), (2, 2)], "id long, k long")
    dimn = spark.createDataFrame([(None, "x"), (2, "y")], "k long, name string")
    got = prefilter_join(factn, dimn, on="k").select("id", "name").collect()
    assert [(r["id"], r["name"]) for r in got] == [(2, "y")]
