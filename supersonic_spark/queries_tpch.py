"""TPC-H query-shape catalog — the remaining classic shapes (Q2, Q4, Q7-Q9,
Q11-Q17, Q19-Q22), adapted to the driver's synthetic star schema.

The synthetic tables (TESTDATA.md) omit ``partsupp`` and several classic
columns (commit/receipt dates, shipmode, container, phone, comments), so each
query keeps the classic *shape* — the operator composition that makes it
interesting at 100 TB — with substitute predicates over the columns that do
exist:

- partsupp            -> DISTINCT (l_partkey, l_suppkey) projected off lineitem
- ps_supplycost       -> s_acctbal (Q2 correlated min) / p_retailprice (Q9)
- commit < receipt    -> l_returnflag = 'R' ("late/returned" marker: Q4, Q21)
- l_shipmode          -> l_linestatus (Q12 two-class split)
- comment regexes     -> priority / type equality predicates

Everything here follows the determinism rules of queries.py: DECIMAL
accumulation for money sums, division only between already-deterministic
values, explicit tie-breaking total orders under every LIMIT, identical
aliases on the Spark and oracle sides.

Scale notes are on each query: which side broadcasts, where the one big
shuffle lands, why correlated subqueries become broadcast joins instead of
per-row lookups.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from supersonic_spark.operators import aggregate as agg
from supersonic_spark.operators import core, join as join_ops
from supersonic_spark.operators import sort as sort_ops
from supersonic_spark.operators.aggregate import AggSpec, Aggregation
from supersonic_spark.operators.sort import SortKey
from supersonic_spark.queries import _dec, _t, q

_TS = "timestamp_ntz"


def _ts(s: str):
    return F.lit(s).cast(_TS)


def _part_supp(t):
    """The partsupp relation the schema lacks: observed (part, supplier)
    pairs projected off lineitem.  Two columns only — the dedup shuffles
    ~16 bytes/row and the result is dimension-sized (distinct pairs), so
    downstream joins can broadcast it."""
    return t["lineitem"].select("l_partkey", "l_suppkey").dropDuplicates()


# ---------------------------------------------------------------------------
# Q2 — min-cost supplier per part in a region (correlated MIN subquery)
# ---------------------------------------------------------------------------

@q(
    "tpch_q2_shape",
    """WITH ps AS (SELECT DISTINCT l_partkey, l_suppkey FROM lineitem),
       eu AS (SELECT s_suppkey, s_name, s_acctbal, n_name
              FROM supplier
              JOIN nation ON n_nationkey = s_nationkey
              JOIN region ON r_regionkey = n_regionkey
              WHERE r_name = 'EUROPE'),
       cand AS (SELECT p_partkey, p_name, s_suppkey, s_name, s_acctbal, n_name
                FROM part
                JOIN ps ON l_partkey = p_partkey
                JOIN eu ON s_suppkey = l_suppkey
                WHERE p_size = 15 AND p_type = 'STANDARD')
       SELECT s_acctbal, s_name, n_name, p_partkey, p_name
       FROM cand c
       WHERE s_acctbal = (SELECT MIN(s_acctbal) FROM cand c2
                          WHERE c2.p_partkey = c.p_partkey)
       ORDER BY s_acctbal DESC, n_name, s_name, p_partkey
       LIMIT 100""",
)
def q_tpch_q2_shape(spark, sf_dir):
    """TPC-H Q2 shape: correlated MIN subquery per part -> groupBy MIN +
    equi-join back on (part, min-value).  Scale shape: the candidate set is
    already part-filtered and region-filtered (small), so the per-part MIN
    and the join back are broadcast-sized; the only big work is the distinct
    (l_partkey, l_suppkey) projection, one shuffle on the pair."""
    t = _t(spark, sf_dir)
    eu_nation = join_ops.hash_join(
        t["nation"].select("n_nationkey", "n_name", "n_regionkey"),
        core.filter_op(t["region"], F.col("r_name") == "EUROPE", ["r_regionkey"])
        .withColumnRenamed("r_regionkey", "n_regionkey"),
        on="n_regionkey", unique_right=True,
    ).select("n_nationkey", "n_name")
    eu_supp = join_ops.hash_join(
        t["supplier"].select("s_suppkey", "s_name", "s_acctbal", "s_nationkey"),
        eu_nation.withColumnRenamed("n_nationkey", "s_nationkey"),
        on="s_nationkey", broadcast_right=True,
    ).select("s_suppkey", "s_name", "s_acctbal", "n_name")
    part = core.filter_op(
        t["part"],
        (F.col("p_size") == 15) & (F.col("p_type") == "STANDARD"),
        ["p_partkey", "p_name"],
    )
    cand = join_ops.hash_join(
        _part_supp(t),
        part.withColumnRenamed("p_partkey", "l_partkey"),
        on="l_partkey", broadcast_right=True, unique_right=True,
    )
    cand = join_ops.hash_join(
        cand,
        eu_supp.withColumnRenamed("s_suppkey", "l_suppkey"),
        on="l_suppkey", broadcast_right=True, unique_right=True,
    ).withColumnRenamed("l_partkey", "p_partkey")
    min_bal = agg.group_aggregate(
        cand, ["p_partkey"], [AggSpec(Aggregation.MIN, "s_acctbal", "s_acctbal")]
    )
    out = join_ops.hash_join(
        cand, min_bal, on=["p_partkey", "s_acctbal"], broadcast_right=True
    )
    return sort_ops.extended_sort(
        out,
        [
            SortKey("s_acctbal", ascending=False),
            SortKey("n_name"),
            SortKey("s_name"),
            SortKey("p_partkey"),
        ],
        limit=100,
    ).select("s_acctbal", "s_name", "n_name", "p_partkey", "p_name")


# ---------------------------------------------------------------------------
# Q4 — order-priority checking (EXISTS -> semi-join)
# ---------------------------------------------------------------------------

@q(
    "tpch_q4_shape",
    """SELECT o_orderpriority, COUNT(*) AS order_count
       FROM orders
       WHERE o_orderdate >= TIMESTAMP '1997-01-01'
         AND o_orderdate < TIMESTAMP '1997-07-01'
         AND EXISTS (SELECT 1 FROM lineitem
                     WHERE l_orderkey = o_orderkey AND l_returnflag = 'R')
       GROUP BY o_orderpriority
       ORDER BY o_orderpriority""",
)
def q_tpch_q4_shape(spark, sf_dir):
    """TPC-H Q4 shape: EXISTS correlated subquery == left-semi join (the
    'late' marker is l_returnflag='R'; the schema has no commit/receipt
    dates).  Scale shape: both sides filter before the semi-join; the join
    shuffles on orderkey once and the 5-key aggregation is map-side."""
    t = _t(spark, sf_dir)
    orders = core.filter_op(
        t["orders"],
        (F.col("o_orderdate") >= _ts("1997-01-01"))
        & (F.col("o_orderdate") < _ts("1997-07-01")),
        ["o_orderkey", "o_orderpriority"],
    )
    late = core.filter_op(
        t["lineitem"], F.col("l_returnflag") == "R", ["l_orderkey"]
    ).withColumnRenamed("l_orderkey", "o_orderkey")
    sel = join_ops.hash_join(orders, late, on="o_orderkey", how="left_semi")
    out = agg.group_aggregate(
        sel, ["o_orderpriority"], [AggSpec(Aggregation.COUNT, None, "order_count")]
    )
    return sort_ops.sort(out, [SortKey("o_orderpriority")]).select(
        "o_orderpriority", "order_count"
    )


# ---------------------------------------------------------------------------
# Q7 — volume shipping between two nations
# ---------------------------------------------------------------------------

@q(
    "tpch_q7_shape",
    """SELECT supp_nation, cust_nation, l_year,
              CAST(SUM(volume_d) AS DOUBLE) AS revenue
       FROM (SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
                    EXTRACT(YEAR FROM l_shipdate) AS l_year,
                    CAST(l_extendedprice AS DECIMAL(12,2))
                      * (1 - CAST(l_discount AS DECIMAL(4,2))) AS volume_d
             FROM supplier
             JOIN lineitem ON s_suppkey = l_suppkey
             JOIN orders ON o_orderkey = l_orderkey
             JOIN customer ON c_custkey = o_custkey
             JOIN nation n1 ON s_nationkey = n1.n_nationkey
             JOIN nation n2 ON c_nationkey = n2.n_nationkey
             WHERE ((n1.n_name = 'NATION_1' AND n2.n_name = 'NATION_2')
                 OR (n1.n_name = 'NATION_2' AND n2.n_name = 'NATION_1'))
               AND l_shipdate >= TIMESTAMP '1996-01-01'
               AND l_shipdate < TIMESTAMP '1998-01-01') shipping
       GROUP BY supp_nation, cust_nation, l_year
       ORDER BY supp_nation, cust_nation, l_year""",
)
def q_tpch_q7_shape(spark, sf_dir):
    """TPC-H Q7 shape: bidirectional nation-pair volume by year.  Scale
    shape: nation maps broadcast onto supplier and customer; the pair
    disjunction is applied after both small joins; lineitem⋈orders is the
    one big shuffle (orderkey)."""
    t = _t(spark, sf_dir)
    n = t["nation"].select("n_nationkey", "n_name")
    supp = join_ops.hash_join(
        t["supplier"].select("s_suppkey", "s_nationkey"),
        n.withColumnRenamed("n_nationkey", "s_nationkey")
        .withColumnRenamed("n_name", "supp_nation"),
        on="s_nationkey", broadcast_right=True,
    ).select("s_suppkey", "supp_nation")
    cust = join_ops.hash_join(
        t["customer"].select("c_custkey", "c_nationkey"),
        n.withColumnRenamed("n_nationkey", "c_nationkey")
        .withColumnRenamed("n_name", "cust_nation"),
        on="c_nationkey", broadcast_right=True,
    ).select("c_custkey", "cust_nation")
    cust = core.filter_op(cust, F.col("cust_nation").isin("NATION_1", "NATION_2"))
    supp = core.filter_op(supp, F.col("supp_nation").isin("NATION_1", "NATION_2"))
    li = core.filter_op(
        t["lineitem"],
        (F.col("l_shipdate") >= _ts("1996-01-01"))
        & (F.col("l_shipdate") < _ts("1998-01-01")),
        ["l_orderkey", "l_suppkey", "l_extendedprice", "l_discount", "l_shipdate"],
    )
    j = join_ops.hash_join(
        li, supp.withColumnRenamed("s_suppkey", "l_suppkey"),
        on="l_suppkey", broadcast_right=True,
    )
    ord_c = join_ops.hash_join(
        t["orders"].select("o_orderkey", "o_custkey"),
        cust.withColumnRenamed("c_custkey", "o_custkey"),
        on="o_custkey", broadcast_right=True,
    ).select("o_orderkey", "cust_nation")
    j = join_ops.hash_join(
        j, ord_c.withColumnRenamed("o_orderkey", "l_orderkey"), on="l_orderkey"
    )
    j = core.filter_op(
        j,
        ((F.col("supp_nation") == "NATION_1") & (F.col("cust_nation") == "NATION_2"))
        | ((F.col("supp_nation") == "NATION_2") & (F.col("cust_nation") == "NATION_1")),
    )
    one = F.lit(1).cast("decimal(3,0)")
    j = core.compute(
        j,
        {
            "l_year": F.year("l_shipdate"),
            "volume_d": _dec("l_extendedprice") * (one - _dec("l_discount", 4, 2)),
        },
        keep_input=True,
    )
    out = agg.group_aggregate(
        j,
        ["supp_nation", "cust_nation", "l_year"],
        [AggSpec(Aggregation.SUM, "volume_d", "revenue", output_type="double")],
    )
    return sort_ops.sort(
        out, [SortKey("supp_nation"), SortKey("cust_nation"), SortKey("l_year")]
    ).select("supp_nation", "cust_nation", "l_year", "revenue")


# ---------------------------------------------------------------------------
# Q8 — national market share
# ---------------------------------------------------------------------------

@q(
    "tpch_q8_shape",
    """SELECT o_year,
              CAST(SUM(CASE WHEN nation = 'NATION_3' THEN volume_d
                            ELSE CAST(0 AS DECIMAL(12,2)) END) AS DOUBLE)
              / CAST(SUM(volume_d) AS DOUBLE) AS mkt_share
       FROM (SELECT EXTRACT(YEAR FROM o_orderdate) AS o_year,
                    CAST(l_extendedprice AS DECIMAL(12,2))
                      * (1 - CAST(l_discount AS DECIMAL(4,2))) AS volume_d,
                    n2.n_name AS nation
             FROM part
             JOIN lineitem ON p_partkey = l_partkey
             JOIN supplier ON s_suppkey = l_suppkey
             JOIN orders ON o_orderkey = l_orderkey
             JOIN customer ON c_custkey = o_custkey
             JOIN nation n1 ON c_nationkey = n1.n_nationkey
             JOIN region ON n1.n_regionkey = r_regionkey
             JOIN nation n2 ON s_nationkey = n2.n_nationkey
             WHERE r_name = 'AMERICA' AND p_type = 'ECONOMY'
               AND o_orderdate >= TIMESTAMP '1996-01-01'
               AND o_orderdate < TIMESTAMP '1998-01-01') all_nations
       GROUP BY o_year
       ORDER BY o_year""",
)
def q_tpch_q8_shape(spark, sf_dir):
    """TPC-H Q8 shape: market share = conditional share of a decimal sum.
    Scale shape: part filter broadcasts into lineitem (partkey), supplier
    nation broadcasts; region-filtered customers broadcast into orders; the
    lineitem⋈orders orderkey shuffle is the only big exchange; both CASE
    sums ride one aggregation."""
    t = _t(spark, sf_dir)
    part = core.filter_op(t["part"], F.col("p_type") == "ECONOMY", ["p_partkey"])
    li = join_ops.hash_join(
        t["lineitem"].select("l_orderkey", "l_partkey", "l_suppkey",
                             "l_extendedprice", "l_discount"),
        part.withColumnRenamed("p_partkey", "l_partkey"),
        on="l_partkey", broadcast_right=True, unique_right=True,
    )
    supp_nation = join_ops.hash_join(
        t["supplier"].select("s_suppkey", "s_nationkey"),
        t["nation"].select(
            F.col("n_nationkey").alias("s_nationkey"), F.col("n_name").alias("nation")
        ),
        on="s_nationkey", broadcast_right=True,
    ).select("s_suppkey", "nation")
    li = join_ops.hash_join(
        li, supp_nation.withColumnRenamed("s_suppkey", "l_suppkey"),
        on="l_suppkey", broadcast_right=True,
    )
    am_nation = join_ops.hash_join(
        t["nation"].select("n_nationkey", "n_regionkey"),
        core.filter_op(t["region"], F.col("r_name") == "AMERICA", ["r_regionkey"])
        .withColumnRenamed("r_regionkey", "n_regionkey"),
        on="n_regionkey", unique_right=True,
    ).select("n_nationkey")
    cust = join_ops.hash_join(
        t["customer"].select("c_custkey", "c_nationkey"),
        am_nation.withColumnRenamed("n_nationkey", "c_nationkey"),
        on="c_nationkey", broadcast_right=True, unique_right=True,
    ).select("c_custkey")
    orders = core.filter_op(
        t["orders"],
        (F.col("o_orderdate") >= _ts("1996-01-01"))
        & (F.col("o_orderdate") < _ts("1998-01-01")),
        ["o_orderkey", "o_custkey", "o_orderdate"],
    )
    orders = join_ops.hash_join(
        orders, cust.withColumnRenamed("c_custkey", "o_custkey"),
        on="o_custkey", broadcast_right=True,
    ).select("o_orderkey", "o_orderdate")
    j = join_ops.hash_join(
        li, orders.withColumnRenamed("o_orderkey", "l_orderkey"), on="l_orderkey"
    )
    one = F.lit(1).cast("decimal(3,0)")
    zero = F.lit(0).cast("decimal(12,2)")
    j = core.compute(
        j,
        {
            "o_year": F.year("o_orderdate"),
            "volume_d": _dec("l_extendedprice") * (one - _dec("l_discount", 4, 2)),
        },
        keep_input=True,
    )
    j = core.compute(
        j,
        {"nation_volume_d": F.when(F.col("nation") == "NATION_3", F.col("volume_d"))
                             .otherwise(zero)},
        keep_input=True,
    )
    out = agg.group_aggregate(
        j,
        ["o_year"],
        [
            AggSpec(Aggregation.SUM, "nation_volume_d", "nat_sum", output_type="double"),
            AggSpec(Aggregation.SUM, "volume_d", "all_sum", output_type="double"),
        ],
    )
    out = core.compute(
        out,
        {
            "o_year": F.col("o_year"),
            "mkt_share": F.col("nat_sum") / F.col("all_sum"),
        },
    )
    return sort_ops.sort(out, [SortKey("o_year")]).select("o_year", "mkt_share")


# ---------------------------------------------------------------------------
# Q9 — product-type profit by nation and year
# ---------------------------------------------------------------------------

@q(
    "tpch_q9_shape",
    """SELECT nation, o_year, CAST(SUM(amount_d) AS DOUBLE) AS sum_profit
       FROM (SELECT n_name AS nation,
                    EXTRACT(YEAR FROM o_orderdate) AS o_year,
                    CAST(l_extendedprice AS DECIMAL(12,2))
                      * (1 - CAST(l_discount AS DECIMAL(4,2)))
                    - CAST(p_retailprice AS DECIMAL(12,2))
                      * CAST(0.10 AS DECIMAL(4,2))
                      * CAST(l_quantity AS DECIMAL(12,2)) AS amount_d
             FROM part
             JOIN lineitem ON p_partkey = l_partkey
             JOIN supplier ON s_suppkey = l_suppkey
             JOIN orders ON o_orderkey = l_orderkey
             JOIN nation ON s_nationkey = n_nationkey
             WHERE p_name LIKE '%red%') profit
       GROUP BY nation, o_year
       ORDER BY nation, o_year DESC""",
)
def q_tpch_q9_shape(spark, sf_dir):
    """TPC-H Q9 shape (profit uses p_retailprice*0.10 as carrying cost; the
    schema has no ps_supplycost).  Scale shape: the LIKE-filtered part set
    broadcasts into lineitem on partkey, supplier nation broadcasts on
    suppkey; orderkey join is the one big shuffle; decimal profit sums are
    exact and order-independent."""
    t = _t(spark, sf_dir)
    part = core.filter_op(
        t["part"], F.col("p_name").like("%red%"), ["p_partkey", "p_retailprice"]
    )
    li = join_ops.hash_join(
        t["lineitem"].select("l_orderkey", "l_partkey", "l_suppkey",
                             "l_quantity", "l_extendedprice", "l_discount"),
        part.withColumnRenamed("p_partkey", "l_partkey"),
        on="l_partkey", broadcast_right=True, unique_right=True,
    )
    supp_nation = join_ops.hash_join(
        t["supplier"].select("s_suppkey", "s_nationkey"),
        t["nation"].select(
            F.col("n_nationkey").alias("s_nationkey"), F.col("n_name").alias("nation")
        ),
        on="s_nationkey", broadcast_right=True,
    ).select("s_suppkey", "nation")
    li = join_ops.hash_join(
        li, supp_nation.withColumnRenamed("s_suppkey", "l_suppkey"),
        on="l_suppkey", broadcast_right=True,
    )
    j = join_ops.hash_join(
        li,
        t["orders"].select(
            F.col("o_orderkey").alias("l_orderkey"), "o_orderdate"
        ),
        on="l_orderkey",
    )
    one = F.lit(1).cast("decimal(3,0)")
    cost_rate = F.lit("0.10").cast("decimal(4,2)")
    j = core.compute(
        j,
        {
            "o_year": F.year("o_orderdate"),
            "amount_d": _dec("l_extendedprice") * (one - _dec("l_discount", 4, 2))
            - _dec("p_retailprice") * cost_rate * _dec("l_quantity"),
        },
        keep_input=True,
    )
    out = agg.group_aggregate(
        j,
        ["nation", "o_year"],
        [AggSpec(Aggregation.SUM, "amount_d", "sum_profit", output_type="double")],
    )
    return sort_ops.sort(
        out, [SortKey("nation"), SortKey("o_year", ascending=False)]
    ).select("nation", "o_year", "sum_profit")


# ---------------------------------------------------------------------------
# Q11 — important stock identification (scalar subquery in HAVING)
# ---------------------------------------------------------------------------

@q(
    "tpch_q11_shape",
    """WITH nat_value AS (
         SELECT l_partkey,
                SUM(CAST(l_extendedprice AS DECIMAL(12,2))) AS value_d
         FROM lineitem
         JOIN supplier ON s_suppkey = l_suppkey
         JOIN nation ON n_nationkey = s_nationkey
         WHERE n_name IN ('NATION_0', 'NATION_5', 'NATION_10')
         GROUP BY l_partkey)
       SELECT l_partkey, CAST(value_d AS DOUBLE) AS part_value
       FROM nat_value
       WHERE value_d > (SELECT SUM(value_d) * 0.001 FROM nat_value)
       ORDER BY part_value DESC, l_partkey""",
)
def q_tpch_q11_shape(spark, sf_dir):
    """TPC-H Q11 shape: grouped value with a scalar-subquery threshold.
    Scale shape: the nation-filtered supplier set broadcasts; per-part sums
    shuffle once on partkey; the grand total is a 1-row broadcast cross
    join, not a driver collect.  Threshold compares DECIMAL to DECIMAL —
    exact on both engines."""
    t = _t(spark, sf_dir)
    nat_supp = join_ops.hash_join(
        t["supplier"].select("s_suppkey", "s_nationkey"),
        core.filter_op(
            t["nation"], F.col("n_name").isin("NATION_0", "NATION_5", "NATION_10"),
            ["n_nationkey"],
        ).withColumnRenamed("n_nationkey", "s_nationkey"),
        on="s_nationkey", broadcast_right=True, unique_right=True,
    ).select("s_suppkey")
    li = join_ops.hash_join(
        t["lineitem"].select("l_partkey", "l_suppkey", "l_extendedprice"),
        nat_supp.withColumnRenamed("s_suppkey", "l_suppkey"),
        on="l_suppkey", broadcast_right=True,
    )
    li = core.compute(li, {"price_d": _dec("l_extendedprice")}, keep_input=True)
    per_part = agg.group_aggregate(
        li, ["l_partkey"], [AggSpec(Aggregation.SUM, "price_d", "value_d")]
    )
    total = agg.scalar_aggregate(
        per_part, [AggSpec(Aggregation.SUM, "value_d", "total_d")]
    ).select((F.col("total_d") * F.lit("0.001").cast("decimal(6,3)")).alias("threshold_d"))
    out = per_part.crossJoin(F.broadcast(total))
    out = core.filter_op(out, F.col("value_d") > F.col("threshold_d"))
    out = core.compute(
        out,
        {"l_partkey": F.col("l_partkey"),
         "part_value": F.col("value_d").cast("double")},
    )
    return sort_ops.sort(
        out, [SortKey("part_value", ascending=False), SortKey("l_partkey")]
    ).select("l_partkey", "part_value")


# ---------------------------------------------------------------------------
# Q12 — shipping classes (conditional two-way counts)
# ---------------------------------------------------------------------------

@q(
    "tpch_q12_shape",
    """SELECT l_linestatus,
              SUM(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                       THEN 1 ELSE 0 END) AS high_line_count,
              SUM(CASE WHEN o_orderpriority NOT IN ('1-URGENT', '2-HIGH')
                       THEN 1 ELSE 0 END) AS low_line_count
       FROM orders
       JOIN lineitem ON o_orderkey = l_orderkey
       WHERE l_shipdate >= TIMESTAMP '1998-01-01'
         AND l_shipdate < TIMESTAMP '1999-01-01'
       GROUP BY l_linestatus
       ORDER BY l_linestatus""",
)
def q_tpch_q12_shape(spark, sf_dir):
    """TPC-H Q12 shape (l_linestatus stands in for l_shipmode): conditional
    integer counts after the fact join.  Scale shape: date filter prunes
    lineitem at the scan; one orderkey shuffle; integer CASE sums are exact."""
    t = _t(spark, sf_dir)
    li = core.filter_op(
        t["lineitem"],
        (F.col("l_shipdate") >= _ts("1998-01-01"))
        & (F.col("l_shipdate") < _ts("1999-01-01")),
        ["l_orderkey", "l_linestatus"],
    )
    j = join_ops.hash_join(
        li,
        t["orders"].select(
            F.col("o_orderkey").alias("l_orderkey"), "o_orderpriority"
        ),
        on="l_orderkey",
    )
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    j = core.compute(
        j,
        {
            "l_linestatus": F.col("l_linestatus"),
            "is_high": F.when(high, 1).otherwise(0).cast("long"),
            "is_low": F.when(~high, 1).otherwise(0).cast("long"),
        },
    )
    out = agg.group_aggregate(
        j,
        ["l_linestatus"],
        [
            AggSpec(Aggregation.SUM, "is_high", "high_line_count"),
            AggSpec(Aggregation.SUM, "is_low", "low_line_count"),
        ],
    )
    return sort_ops.sort(out, [SortKey("l_linestatus")]).select(
        "l_linestatus", "high_line_count", "low_line_count"
    )


# ---------------------------------------------------------------------------
# Q13 — customer order-count distribution (outer join + double aggregation)
# ---------------------------------------------------------------------------

@q(
    "tpch_q13_shape",
    """WITH c_orders AS (
         SELECT c_custkey, COUNT(o_orderkey) AS c_count
         FROM customer
         LEFT OUTER JOIN orders
           ON c_custkey = o_custkey AND o_orderpriority <> '5-LOW'
         GROUP BY c_custkey)
       SELECT c_count, COUNT(*) AS custdist
       FROM c_orders
       GROUP BY c_count
       ORDER BY custdist DESC, c_count DESC""",
)
def q_tpch_q13_shape(spark, sf_dir):
    """TPC-H Q13 shape: left-outer join with an ON-clause residual predicate
    (customers with zero qualifying orders count as c_count=0), then a
    distribution over the counts.  Scale shape: one custkey shuffle for the
    outer join + count; the second aggregation groups on the count (tiny
    domain) and is map-side combined."""
    t = _t(spark, sf_dir)
    cust = t["customer"].select("c_custkey")
    orders = t["orders"].select("o_orderkey", "o_custkey", "o_orderpriority")
    cond = (cust["c_custkey"] == orders["o_custkey"]) & (
        orders["o_orderpriority"] != "5-LOW"
    )
    j = join_ops.hash_join(cust, orders, on=cond, how="left")
    per_cust = agg.group_aggregate(
        j, [cust["c_custkey"]], [AggSpec(Aggregation.COUNT, "o_orderkey", "c_count")]
    )
    out = agg.group_aggregate(
        per_cust, ["c_count"], [AggSpec(Aggregation.COUNT, None, "custdist")]
    )
    return sort_ops.sort(
        out, [SortKey("custdist", ascending=False), SortKey("c_count", ascending=False)]
    ).select("c_count", "custdist")


# ---------------------------------------------------------------------------
# Q14 — promotion effect (conditional revenue share, single row)
# ---------------------------------------------------------------------------

@q(
    "tpch_q14_shape",
    """SELECT 100.0 * CAST(SUM(CASE WHEN p_type = 'PROMO' THEN
                CAST(l_extendedprice AS DECIMAL(12,2))
                  * (1 - CAST(l_discount AS DECIMAL(4,2)))
              ELSE CAST(0 AS DECIMAL(12,2)) END) AS DOUBLE)
            / CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))
                  * (1 - CAST(l_discount AS DECIMAL(4,2)))) AS DOUBLE)
              AS promo_revenue
       FROM lineitem
       JOIN part ON l_partkey = p_partkey
       WHERE l_shipdate >= TIMESTAMP '1997-06-01'
         AND l_shipdate < TIMESTAMP '1997-08-01'""",
)
def q_tpch_q14_shape(spark, sf_dir):
    """TPC-H Q14 shape: promo revenue share over a 2-month window.  Scale
    shape: part (2 columns) broadcasts into the date-pruned lineitem scan;
    the global aggregate is one partial->final reduce, no full shuffle."""
    t = _t(spark, sf_dir)
    li = core.filter_op(
        t["lineitem"],
        (F.col("l_shipdate") >= _ts("1997-06-01"))
        & (F.col("l_shipdate") < _ts("1997-08-01")),
        ["l_partkey", "l_extendedprice", "l_discount"],
    )
    j = join_ops.hash_join(
        li,
        t["part"].select(F.col("p_partkey").alias("l_partkey"), "p_type"),
        on="l_partkey", broadcast_right=True, unique_right=True,
    )
    one = F.lit(1).cast("decimal(3,0)")
    zero = F.lit(0).cast("decimal(12,2)")
    j = core.compute(
        j,
        {"rev_d": _dec("l_extendedprice") * (one - _dec("l_discount", 4, 2))},
        keep_input=True,
    )
    j = core.compute(
        j,
        {"promo_d": F.when(F.col("p_type") == "PROMO", F.col("rev_d")).otherwise(zero)},
        keep_input=True,
    )
    out = agg.scalar_aggregate(
        j,
        [
            AggSpec(Aggregation.SUM, "promo_d", "promo_sum", output_type="double"),
            AggSpec(Aggregation.SUM, "rev_d", "rev_sum", output_type="double"),
        ],
    )
    return out.select(
        (F.lit(100.0) * F.col("promo_sum") / F.col("rev_sum")).alias("promo_revenue")
    )


# ---------------------------------------------------------------------------
# Q15 — top supplier (scalar MAX subquery over a grouped view)
# ---------------------------------------------------------------------------

@q(
    "tpch_q15_shape",
    """WITH revenue AS (
         SELECT l_suppkey AS supplier_no,
                SUM(CAST(l_extendedprice AS DECIMAL(12,2))
                    * (1 - CAST(l_discount AS DECIMAL(4,2)))) AS total_revenue_d
         FROM lineitem
         WHERE l_shipdate >= TIMESTAMP '1997-01-01'
           AND l_shipdate < TIMESTAMP '1997-07-01'
         GROUP BY l_suppkey)
       SELECT s_suppkey, s_name, CAST(total_revenue_d AS DOUBLE) AS total_revenue
       FROM supplier
       JOIN revenue ON s_suppkey = supplier_no
       WHERE total_revenue_d = (SELECT MAX(total_revenue_d) FROM revenue)
       ORDER BY s_suppkey""",
)
def q_tpch_q15_shape(spark, sf_dir):
    """TPC-H Q15 shape: the revenue view + scalar MAX subquery.  The
    equality filter compares DECIMAL totals (exact — double totals would be
    order-dependent and could disagree with the oracle on ties).  Scale
    shape: per-supplier sums shuffle once on suppkey; the max is a 1-row
    broadcast; supplier dim broadcasts onto the (tiny) winner set."""
    t = _t(spark, sf_dir)
    li = core.filter_op(
        t["lineitem"],
        (F.col("l_shipdate") >= _ts("1997-01-01"))
        & (F.col("l_shipdate") < _ts("1997-07-01")),
        ["l_suppkey", "l_extendedprice", "l_discount"],
    )
    one = F.lit(1).cast("decimal(3,0)")
    li = core.compute(
        li,
        {"rev_d": _dec("l_extendedprice") * (one - _dec("l_discount", 4, 2))},
        keep_input=True,
    )
    rev = agg.group_aggregate(
        li, ["l_suppkey"], [AggSpec(Aggregation.SUM, "rev_d", "total_revenue_d")]
    )
    mx = agg.scalar_aggregate(
        rev, [AggSpec(Aggregation.MAX, "total_revenue_d", "max_rev_d")]
    )
    win = core.filter_op(
        rev.crossJoin(F.broadcast(mx)),
        F.col("total_revenue_d") == F.col("max_rev_d"),
        ["l_suppkey", "total_revenue_d"],
    )
    out = join_ops.hash_join(
        t["supplier"].select(F.col("s_suppkey"), "s_name"),
        win.withColumnRenamed("l_suppkey", "s_suppkey"),
        on="s_suppkey", broadcast_right=True, unique_right=True,
    )
    out = core.compute(
        out,
        {
            "s_suppkey": F.col("s_suppkey"),
            "s_name": F.col("s_name"),
            "total_revenue": F.col("total_revenue_d").cast("double"),
        },
    )
    return sort_ops.sort(out, [SortKey("s_suppkey")]).select(
        "s_suppkey", "s_name", "total_revenue"
    )


# ---------------------------------------------------------------------------
# Q16 — supplier count by part attributes (anti-join + COUNT DISTINCT)
# ---------------------------------------------------------------------------

@q(
    "tpch_q16_shape",
    """WITH ps AS (SELECT DISTINCT l_partkey, l_suppkey FROM lineitem)
       SELECT p_brand, p_size, COUNT(DISTINCT l_suppkey) AS supplier_cnt
       FROM ps
       JOIN part ON p_partkey = l_partkey
       WHERE p_brand <> 'Brand#1' AND p_type <> 'PROMO'
         AND p_size IN (1, 4, 9, 14, 23, 36, 45, 49)
         AND l_suppkey NOT IN (SELECT s_suppkey FROM supplier
                               WHERE s_acctbal < 0)
       GROUP BY p_brand, p_size
       ORDER BY supplier_cnt DESC, p_brand, p_size""",
)
def q_tpch_q16_shape(spark, sf_dir):
    """TPC-H Q16 shape: NOT IN -> left-anti join (supplier keys are
    non-null, so NOT IN == anti-join), then COUNT DISTINCT per part
    attribute.  Scale shape: the excluded-supplier set broadcasts as an
    anti-join; distinct-pair projection is the one big shuffle; Catalyst's
    RewriteDistinctAggregates handles the count-distinct expand."""
    t = _t(spark, sf_dir)
    part = core.filter_op(
        t["part"],
        (F.col("p_brand") != "Brand#1")
        & (F.col("p_type") != "PROMO")
        & F.col("p_size").isin(1, 4, 9, 14, 23, 36, 45, 49),
        ["p_partkey", "p_brand", "p_size"],
    )
    ps = join_ops.hash_join(
        _part_supp(t),
        part.withColumnRenamed("p_partkey", "l_partkey"),
        on="l_partkey", broadcast_right=True, unique_right=True,
    )
    bad_supp = core.filter_op(
        t["supplier"], F.col("s_acctbal") < 0, ["s_suppkey"]
    ).withColumnRenamed("s_suppkey", "l_suppkey")
    ps = join_ops.hash_join(ps, F.broadcast(bad_supp), on="l_suppkey", how="left_anti")
    out = agg.group_aggregate(
        ps,
        ["p_brand", "p_size"],
        [AggSpec(Aggregation.COUNT, "l_suppkey", "supplier_cnt", distinct=True)],
    )
    return sort_ops.sort(
        out,
        [SortKey("supplier_cnt", ascending=False), SortKey("p_brand"), SortKey("p_size")],
    ).select("p_brand", "p_size", "supplier_cnt")


# ---------------------------------------------------------------------------
# Q17 — small-quantity-order revenue (correlated AVG subquery)
# ---------------------------------------------------------------------------

@q(
    "tpch_q17_shape",
    """WITH part_avg AS (
         SELECT l_partkey,
                CAST(SUM(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE)
                  / COUNT(*) AS avg_qty
         FROM lineitem GROUP BY l_partkey)
       SELECT CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))) AS DOUBLE)
                / 7.0 AS avg_yearly
       FROM lineitem
       JOIN part ON p_partkey = l_partkey
       JOIN part_avg USING (l_partkey)
       WHERE p_brand = 'Brand#3' AND p_size < 10
         AND l_quantity < 0.5 * avg_qty""",
)
def q_tpch_q17_shape(spark, sf_dir):
    """TPC-H Q17 shape: correlated per-part AVG -> grouped average joined
    back on partkey.  The average is decimal-sum/count (deterministic), the
    0.5*avg comparison is per-row IEEE double — identical on both engines.
    Scale shape: per-part averages shuffle lineitem once on partkey; the
    brand/size-filtered join back broadcasts the part filter."""
    t = _t(spark, sf_dir)
    li = t["lineitem"].select("l_partkey", "l_quantity", "l_extendedprice")
    li_d = core.compute(li, {"qty_d": _dec("l_quantity")}, keep_input=True)
    pa = agg.group_aggregate(
        li_d,
        ["l_partkey"],
        [
            AggSpec(Aggregation.SUM, "qty_d", "sum_qty", output_type="double"),
            AggSpec(Aggregation.COUNT, None, "n_qty"),
        ],
    )
    pa = core.compute(
        pa,
        {"l_partkey": F.col("l_partkey"),
         "avg_qty": F.col("sum_qty") / F.col("n_qty")},
    )
    part = core.filter_op(
        t["part"],
        (F.col("p_brand") == "Brand#3") & (F.col("p_size") < 10),
        ["p_partkey"],
    )
    j = join_ops.hash_join(
        li,
        part.withColumnRenamed("p_partkey", "l_partkey"),
        on="l_partkey", broadcast_right=True, unique_right=True,
    )
    j = join_ops.hash_join(j, pa, on="l_partkey")
    j = core.filter_op(j, F.col("l_quantity") < 0.5 * F.col("avg_qty"))
    j = core.compute(j, {"price_d": _dec("l_extendedprice")}, keep_input=True)
    out = agg.scalar_aggregate(
        j, [AggSpec(Aggregation.SUM, "price_d", "price_sum", output_type="double")]
    )
    return out.select((F.col("price_sum") / F.lit(7.0)).alias("avg_yearly"))


# ---------------------------------------------------------------------------
# Q19 — discounted revenue (disjunctive pushdown-hostile predicates)
# ---------------------------------------------------------------------------

@q(
    "tpch_q19_shape",
    """SELECT CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))
                   * (1 - CAST(l_discount AS DECIMAL(4,2)))) AS DOUBLE) AS revenue
       FROM lineitem
       JOIN part ON p_partkey = l_partkey
       WHERE (p_brand = 'Brand#12' AND p_size BETWEEN 1 AND 5
              AND l_quantity >= 1 AND l_quantity <= 11)
          OR (p_brand = 'Brand#23' AND p_size BETWEEN 1 AND 10
              AND l_quantity >= 10 AND l_quantity <= 20)
          OR (p_brand = 'Brand#34' AND p_size BETWEEN 1 AND 15
              AND l_quantity >= 20 AND l_quantity <= 30)""",
)
def q_tpch_q19_shape(spark, sf_dir):
    """TPC-H Q19 shape: three OR'd brand/size/quantity bands across the
    join.  Scale shape: the disjunction references both sides, so it stays
    a post-join residual — but the union of the part-side bands is pushed
    as a broadcast pre-filter so the probe only hashes candidate parts."""
    t = _t(spark, sf_dir)
    part_band = (
        ((F.col("p_brand") == "Brand#12") & F.col("p_size").between(1, 5))
        | ((F.col("p_brand") == "Brand#23") & F.col("p_size").between(1, 10))
        | ((F.col("p_brand") == "Brand#34") & F.col("p_size").between(1, 15))
    )
    part = core.filter_op(t["part"], part_band, ["p_partkey", "p_brand", "p_size"])
    j = join_ops.hash_join(
        t["lineitem"].select("l_partkey", "l_quantity", "l_extendedprice", "l_discount"),
        part.withColumnRenamed("p_partkey", "l_partkey"),
        on="l_partkey", broadcast_right=True, unique_right=True,
    )
    full_band = (
        ((F.col("p_brand") == "Brand#12") & F.col("p_size").between(1, 5)
         & (F.col("l_quantity") >= 1) & (F.col("l_quantity") <= 11))
        | ((F.col("p_brand") == "Brand#23") & F.col("p_size").between(1, 10)
           & (F.col("l_quantity") >= 10) & (F.col("l_quantity") <= 20))
        | ((F.col("p_brand") == "Brand#34") & F.col("p_size").between(1, 15)
           & (F.col("l_quantity") >= 20) & (F.col("l_quantity") <= 30))
    )
    j = core.filter_op(j, full_band)
    one = F.lit(1).cast("decimal(3,0)")
    j = core.compute(
        j,
        {"rev_d": _dec("l_extendedprice") * (one - _dec("l_discount", 4, 2))},
    )
    return agg.scalar_aggregate(
        j, [AggSpec(Aggregation.SUM, "rev_d", "revenue", output_type="double")]
    )


# ---------------------------------------------------------------------------
# Q20 — potential part promotion (nested IN subqueries -> semi-join chain)
# ---------------------------------------------------------------------------

@q(
    "tpch_q20_shape",
    """SELECT s_suppkey, s_name
       FROM supplier
       JOIN nation ON n_nationkey = s_nationkey
       WHERE n_name = 'NATION_7'
         AND s_suppkey IN (
           SELECT l_suppkey FROM lineitem
           WHERE l_partkey IN (SELECT p_partkey FROM part
                               WHERE p_name LIKE 'small%')
             AND l_shipdate >= TIMESTAMP '1997-01-01'
             AND l_shipdate < TIMESTAMP '1998-01-01'
           GROUP BY l_suppkey, l_partkey
           HAVING SUM(CAST(l_quantity AS DECIMAL(12,2))) > 50)
       ORDER BY s_suppkey""",
)
def q_tpch_q20_shape(spark, sf_dir):
    """TPC-H Q20 shape: nested IN subqueries as a semi-join chain — parts
    by name prefix, (supplier, part) shipped-quantity HAVING filter, then
    supplier ∈ qualifying-set.  Scale shape: part filter broadcasts into
    the date-pruned lineitem; the grouped HAVING shuffles on the composite
    key once; the final supplier semi-join broadcasts the qualifier set."""
    t = _t(spark, sf_dir)
    parts = core.filter_op(
        t["part"], F.col("p_name").like("small%"), ["p_partkey"]
    ).withColumnRenamed("p_partkey", "l_partkey")
    li = core.filter_op(
        t["lineitem"],
        (F.col("l_shipdate") >= _ts("1997-01-01"))
        & (F.col("l_shipdate") < _ts("1998-01-01")),
        ["l_suppkey", "l_partkey", "l_quantity"],
    )
    li = join_ops.hash_join(
        li, parts, on="l_partkey", broadcast_right=True, unique_right=True
    )
    li = core.compute(li, {"qty_d": _dec("l_quantity")}, keep_input=True)
    per_sp = agg.group_aggregate(
        li, ["l_suppkey", "l_partkey"], [AggSpec(Aggregation.SUM, "qty_d", "sum_qty")]
    )
    qual = core.filter_op(per_sp, F.col("sum_qty") > 50, ["l_suppkey"]).dropDuplicates()
    nat7 = core.filter_op(
        t["nation"], F.col("n_name") == "NATION_7", ["n_nationkey"]
    ).withColumnRenamed("n_nationkey", "s_nationkey")
    supp = join_ops.hash_join(
        t["supplier"].select("s_suppkey", "s_name", "s_nationkey"),
        nat7, on="s_nationkey", unique_right=True,
    )
    out = join_ops.hash_join(
        supp,
        F.broadcast(qual.withColumnRenamed("l_suppkey", "s_suppkey")),
        on="s_suppkey", how="left_semi",
    )
    return sort_ops.sort(out, [SortKey("s_suppkey")]).select("s_suppkey", "s_name")


# ---------------------------------------------------------------------------
# Q21 — suppliers who kept orders waiting (EXISTS + NOT EXISTS self-joins)
# ---------------------------------------------------------------------------

@q(
    "tpch_q21_shape",
    """SELECT s_name, COUNT(*) AS numwait
       FROM supplier
       JOIN lineitem l1 ON s_suppkey = l1.l_suppkey
       JOIN orders ON o_orderkey = l1.l_orderkey
       JOIN nation ON s_nationkey = n_nationkey
       WHERE o_orderstatus = 'F' AND n_name = 'NATION_1'
         AND l1.l_returnflag = 'R'
         AND EXISTS (SELECT 1 FROM lineitem l2
                     WHERE l2.l_orderkey = l1.l_orderkey
                       AND l2.l_suppkey <> l1.l_suppkey)
         AND NOT EXISTS (SELECT 1 FROM lineitem l3
                         WHERE l3.l_orderkey = l1.l_orderkey
                           AND l3.l_suppkey <> l1.l_suppkey
                           AND l3.l_returnflag = 'R')
       GROUP BY s_name
       ORDER BY numwait DESC, s_name
       LIMIT 100""",
)
def q_tpch_q21_shape(spark, sf_dir):
    """TPC-H Q21 shape: the classic EXISTS / NOT-EXISTS self-join pair over
    lineitem ('R' marks the late line; no receipt/commit dates in schema).
    Scale shape: both correlated subqueries collapse into one per-order
    profile (distinct-supplier count, distinct-late-supplier count) — the
    semantics of EXISTS(other supplier) ∧ NOT EXISTS(other late supplier)
    for an l1 row of supplier s are exactly n_supp >= 2 ∧
    late-supplier-set == {s}.  The profile is TWO-LEVEL: first collapse
    to distinct (order, supplier) pairs with a late flag, then plain
    counts per order.  A single aggregation with two COUNT DISTINCTs
    triggers Catalyst's Expand rewrite — 3× the lineitem rows through
    the orderkey exchange — which measured super-linear at a synthesized
    sf10 (exponent 1.15; two-level 11.9 s → 5.5 s, and its first
    exchange combines map-side on (order, supplier)).

    SINGLE-SCAN: the profile already names the only late supplier of a
    waiting order, and every one of that supplier's 'R' rows qualifies —
    so carrying SUM(late) per (order, supplier) through the same two
    exchanges makes the second lineitem scan (and its lineitem-sized
    join back to 'R' rows) unnecessary: numwait = Σ n_late_rows over
    waiting orders, joined only against order-level and dimension
    tables.  Measured at synthesized sf10: 7.17 s (two-scan) → 6.21 s
    single-scan; at 100 TB this removes an entire lineitem scan plus a
    shuffle of the 'R' slice.  The scaling exponent stays ≈0.85: what
    remains is ONE lineitem scan feeding ONE map-side-combined
    (orderkey, suppkey) exchange — both linear in data by necessity, so
    the exponent asymptotes toward 1 as fixed overhead amortizes; there
    is no further scan or lineitem-sized join to remove."""
    t = _t(spark, sf_dir)
    li = t["lineitem"].select("l_orderkey", "l_suppkey", "l_returnflag")
    per_supp = agg.group_aggregate(
        core.compute(
            li,
            {
                "l_orderkey": F.col("l_orderkey"),
                "l_suppkey": F.col("l_suppkey"),
                "__late": (F.col("l_returnflag") == "R").cast("int"),
            },
        ),
        ["l_orderkey", "l_suppkey"],
        [
            AggSpec(Aggregation.MAX, "__late", "__late"),
            AggSpec(Aggregation.SUM, "__late", "__n_late_rows"),
        ],
    )
    profile = per_supp.groupBy("l_orderkey").agg(
        F.count(F.lit(1)).alias("n_supp"),
        F.sum("__late").cast("long").alias("n_late_supp"),
        F.min(F.when(F.col("__late") == 1, F.col("l_suppkey"))).alias(
            "only_late_supp"
        ),
        F.sum("__n_late_rows").cast("long").alias("n_late_rows"),
    )
    waiting_orders = core.filter_op(
        profile,
        (F.col("n_supp") >= 2) & (F.col("n_late_supp") == 1),
        ["l_orderkey", "only_late_supp", "n_late_rows"],
    )
    f_orders = core.filter_op(
        t["orders"], F.col("o_orderstatus") == "F", ["o_orderkey"]
    ).withColumnRenamed("o_orderkey", "l_orderkey")
    waiting_orders = join_ops.hash_join(
        waiting_orders, f_orders, on="l_orderkey", how="left_semi"
    )
    nat = core.filter_op(
        t["nation"], F.col("n_name") == "NATION_1", ["n_nationkey"]
    ).withColumnRenamed("n_nationkey", "s_nationkey")
    supp = join_ops.hash_join(
        t["supplier"].select("s_suppkey", "s_name", "s_nationkey"),
        nat, on="s_nationkey", unique_right=True,
    ).select(F.col("s_suppkey").alias("only_late_supp"), "s_name")
    j = join_ops.hash_join(
        waiting_orders, supp, on="only_late_supp", broadcast_right=True
    )
    out = agg.group_aggregate(
        j, ["s_name"], [AggSpec(Aggregation.SUM, "n_late_rows", "numwait")]
    )
    return sort_ops.extended_sort(
        out, [SortKey("numwait", ascending=False), SortKey("s_name")], limit=100
    ).select("s_name", "numwait")


# ---------------------------------------------------------------------------
# Q22 — global sales opportunity (NOT EXISTS + scalar AVG subquery)
# ---------------------------------------------------------------------------

@q(
    "tpch_q22_shape",
    """WITH sel AS (
         SELECT c_custkey, c_acctbal, n_name
         FROM customer
         JOIN nation ON n_nationkey = c_nationkey
         WHERE n_name IN ('NATION_1', 'NATION_3', 'NATION_5', 'NATION_7')),
       cutoff AS (
         SELECT CAST(SUM(CAST(c_acctbal AS DECIMAL(12,2))) AS DOUBLE)
                  / COUNT(*) AS avg_bal
         FROM sel WHERE c_acctbal > 0.0)
       SELECT n_name, COUNT(*) AS numcust,
              CAST(SUM(CAST(c_acctbal AS DECIMAL(12,2))) AS DOUBLE) AS totacctbal
       FROM sel, cutoff
       WHERE c_acctbal > avg_bal
         AND NOT EXISTS (SELECT 1 FROM orders
                         WHERE o_custkey = c_custkey
                           AND o_orderdate >= TIMESTAMP '2000-01-01')
       GROUP BY n_name
       ORDER BY n_name""",
)
def q_tpch_q22_shape(spark, sf_dir):
    """TPC-H Q22 shape: above-average-balance customers with no *recent*
    orders (NOT EXISTS -> left-anti join; the average is a 1-row broadcast;
    the date makes the result non-empty on the synthetic data, where every
    customer has at least one all-time order).  Scale shape: the anti-join
    needs only the distinct recent-o_custkey projection of orders; the
    selected-nation customer set broadcasts everywhere."""
    t = _t(spark, sf_dir)
    nat = core.filter_op(
        t["nation"],
        F.col("n_name").isin("NATION_1", "NATION_3", "NATION_5", "NATION_7"),
        ["n_nationkey", "n_name"],
    ).withColumnRenamed("n_nationkey", "c_nationkey")
    sel = join_ops.hash_join(
        t["customer"].select("c_custkey", "c_acctbal", "c_nationkey"),
        nat, on="c_nationkey", broadcast_right=True, unique_right=True,
    ).select("c_custkey", "c_acctbal", "n_name")
    pos = core.filter_op(sel, F.col("c_acctbal") > 0.0)
    pos = core.compute(pos, {"bal_d": _dec("c_acctbal")}, keep_input=True)
    cutoff = agg.scalar_aggregate(
        pos,
        [
            AggSpec(Aggregation.SUM, "bal_d", "bal_sum", output_type="double"),
            AggSpec(Aggregation.COUNT, None, "bal_n"),
        ],
    ).select((F.col("bal_sum") / F.col("bal_n")).alias("avg_bal"))
    cand = core.filter_op(
        sel.crossJoin(F.broadcast(cutoff)),
        F.col("c_acctbal") > F.col("avg_bal"),
        ["c_custkey", "c_acctbal", "n_name"],
    )
    has_order = core.filter_op(
        t["orders"], F.col("o_orderdate") >= _ts("2000-01-01"), ["o_custkey"]
    ).withColumnRenamed("o_custkey", "c_custkey").dropDuplicates()
    cand = join_ops.hash_join(cand, has_order, on="c_custkey", how="left_anti")
    cand = core.compute(cand, {"bal_d": _dec("c_acctbal")}, keep_input=True)
    out = agg.group_aggregate(
        cand,
        ["n_name"],
        [
            AggSpec(Aggregation.COUNT, None, "numcust"),
            AggSpec(Aggregation.SUM, "bal_d", "totacctbal", output_type="double"),
        ],
    )
    return sort_ops.sort(out, [SortKey("n_name")]).select(
        "n_name", "numcust", "totacctbal"
    )
