"""Classic TPC-H-shaped multi-join workloads (Q3 / Q5 / Q18 shapes).

The fixtures are TPC-H-ish (FIXTURES.md) but not spec-complete, so
these are the canonical plan *shapes* adapted to the available
columns: selective dimension filters flowing into fact joins, small
sides broadcast, aggregation after the join tree, top-k at the end.
Catalyst ordering + AQE handle join strategy; the explicit
`broadcast` hints mark the dims that must never shuffle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from meta_iterative_mapreduce_spark.io import load_table
from meta_iterative_mapreduce_spark.registry import register


@register(
    "q_tpch_q3_shape",
    oracle="""
    SELECT l.l_orderkey,
           ROUND(SUM(l.l_extendedprice * (1 - l.l_discount)), 4) AS revenue,
           strftime(o.o_orderdate, '%Y-%m-%d') AS o_orderdate,
           o.o_orderpriority
    FROM customer c
    JOIN orders o ON c.c_custkey = o.o_custkey
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    WHERE c.c_mktsegment = 'BUILDING'
      AND o.o_orderdate < TIMESTAMP '1998-03-15'
      AND l.l_shipdate > TIMESTAMP '1998-03-15'
    GROUP BY l.l_orderkey, o.o_orderdate, o.o_orderpriority
    ORDER BY revenue DESC, l.l_orderkey
    LIMIT 10
    """,
)
def q_tpch_q3_shape(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q3 (shipping priority): segment-filtered customers → orders →
    lineitem, revenue per order, top-10. The customer side shrinks ~5×
    before the join, so it broadcasts; lineitem never shuffles twice."""
    c = (
        load_table(spark, sf_dir, "customer")
        .filter(F.col("c_mktsegment") == "BUILDING")
        .select("c_custkey")
    )
    o = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") < F.lit("1998-03-15").cast("timestamp")
    )
    li = load_table(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate") > F.lit("1998-03-15").cast("timestamp")
    )
    return (
        li.join(o.join(F.broadcast(c), o.o_custkey == c.c_custkey),
                li.l_orderkey == o.o_orderkey)
        .groupBy("l_orderkey", "o_orderdate", "o_orderpriority")
        .agg(
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 4
            ).alias("revenue")
        )
        .select(
            "l_orderkey",
            "revenue",
            F.date_format("o_orderdate", "yyyy-MM-dd").alias("o_orderdate"),
            "o_orderpriority",
        )
        .orderBy(F.col("revenue").desc(), "l_orderkey")
        .limit(10)
    )


@register(
    "q_tpch_q5_shape",
    oracle="""
    SELECT n.n_name,
           ROUND(SUM(l.l_extendedprice * (1 - l.l_discount)), 4) AS revenue
    FROM region r
    JOIN nation n ON n.n_regionkey = r.r_regionkey
    JOIN supplier s ON s.s_nationkey = n.n_nationkey
    JOIN lineitem l ON l.l_suppkey = s.s_suppkey
    JOIN orders o ON o.o_orderkey = l.l_orderkey
    WHERE r.r_name = 'ASIA'
      AND o.o_orderdate >= TIMESTAMP '1996-01-01'
    GROUP BY n.n_name
    """,
)
def q_tpch_q5_shape(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q5 (local supplier volume): region→nation→supplier dim chain
    (all broadcast — zero shuffles until the fact join), then
    lineitem⋈orders and a per-nation rollup."""
    r = load_table(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    n = load_table(spark, sf_dir, "nation")
    s = load_table(spark, sf_dir, "supplier")
    dims = s.join(
        F.broadcast(n.join(F.broadcast(r), n.n_regionkey == r.r_regionkey)),
        s.s_nationkey == n.n_nationkey,
    ).select("s_suppkey", "n_name")
    li = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp")
    )
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(F.broadcast(dims), li.l_suppkey == dims.s_suppkey)
        .groupBy("n_name")
        .agg(
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 4
            ).alias("revenue")
        )
    )


@register(
    "q_tpch_q18_shape",
    oracle="""
    WITH big AS (
        SELECT l_orderkey
        FROM lineitem
        GROUP BY l_orderkey
        HAVING SUM(l_quantity) > 150
    )
    SELECT c.c_custkey, o.o_orderkey,
           strftime(o.o_orderdate, '%Y-%m-%d') AS o_orderdate,
           o.o_totalprice,
           ROUND(SUM(l.l_quantity), 4) AS total_qty
    FROM big
    JOIN orders o ON o.o_orderkey = big.l_orderkey
    JOIN customer c ON c.c_custkey = o.o_custkey
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    GROUP BY c.c_custkey, o.o_orderkey, o.o_orderdate, o.o_totalprice
    ORDER BY o.o_totalprice DESC, o.o_orderkey
    LIMIT 20
    """,
)
def q_tpch_q18_shape(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q18 (large-volume customers): HAVING-filtered semi-join of big
    orders back onto the fact — the aggregate-then-rejoin shape; the
    filtered key set broadcasts."""
    li = load_table(spark, sf_dir, "lineitem")
    big = (
        li.groupBy("l_orderkey")
        .agg(F.sum("l_quantity").alias("q"))
        .filter(F.col("q") > 150)
        .select(F.col("l_orderkey").alias("big_orderkey"))
    )
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    return (
        li.join(F.broadcast(big), li.l_orderkey == F.col("big_orderkey"))
        .join(o, li.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .groupBy("c_custkey", "o_orderkey", "o_orderdate", "o_totalprice")
        .agg(F.round(F.sum("l_quantity"), 4).alias("total_qty"))
        .select(
            "c_custkey",
            "o_orderkey",
            F.date_format("o_orderdate", "yyyy-MM-dd").alias("o_orderdate"),
            "o_totalprice",
            "total_qty",
        )
        .orderBy(F.col("o_totalprice").desc(), "o_orderkey")
        .limit(20)
    )


@register(
    "q_tpch_q1_shape",
    oracle="""
    SELECT l_returnflag, l_linestatus,
           ROUND(SUM(l_quantity), 4) AS sum_qty,
           ROUND(SUM(l_extendedprice), 4) AS sum_base_price,
           ROUND(SUM(l_extendedprice * (1 - l_discount)), 4)
               AS sum_disc_price,
           ROUND(SUM(l_extendedprice * (1 - l_discount) * (1 + l_tax)), 4)
               AS sum_charge,
           ROUND(AVG(l_quantity), 4) AS avg_qty,
           ROUND(AVG(l_extendedprice), 4) AS avg_price,
           ROUND(AVG(l_discount), 4) AS avg_disc,
           COUNT(*) AS count_order
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '1998-09-02'
    GROUP BY l_returnflag, l_linestatus
    """,
)
def q_tpch_q1_shape(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q1 pricing summary: the canonical full-scan aggregate.
    The plan is exactly what 100 TB wants — a pruned 7-column scan
    with the shipdate predicate pushed to parquet, partial (map-side)
    aggregation of all eight measures, then ONE exchange on the tiny
    (returnflag, linestatus) key space."""
    li = load_table(spark, sf_dir, "lineitem")
    disc_price = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        li.filter(F.col("l_shipdate") <= F.lit("1998-09-02").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.round(F.sum("l_quantity"), 4).alias("sum_qty"),
            F.round(F.sum("l_extendedprice"), 4).alias("sum_base_price"),
            F.round(F.sum(disc_price), 4).alias("sum_disc_price"),
            F.round(F.sum(disc_price * (1 + F.col("l_tax"))), 4).alias(
                "sum_charge"
            ),
            F.round(F.avg("l_quantity"), 4).alias("avg_qty"),
            F.round(F.avg("l_extendedprice"), 4).alias("avg_price"),
            F.round(F.avg("l_discount"), 4).alias("avg_disc"),
            F.count(F.lit(1)).alias("count_order"),
        )
    )


@register(
    "q_tpch_q6_shape",
    oracle="""
    SELECT ROUND(SUM(l_extendedprice * l_discount), 4) AS revenue,
           COUNT(*) AS n_rows
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '1996-01-01'
      AND l_shipdate < TIMESTAMP '1997-01-01'
      AND l_discount BETWEEN 0.05 AND 0.07
      AND l_quantity < 24
    """,
)
def q_tpch_q6_shape(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q6 forecast-revenue: a pure filter-and-sum whose entire
    cost is the scan. All four predicates push down to the parquet
    reader (min/max row-group skipping on shipdate at scale) and the
    projection prunes to 4 columns; the global agg moves one partial
    row per task."""
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.filter(
            (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1997-01-01").cast("timestamp"))
            & F.col("l_discount").between(0.05, 0.07)
            & (F.col("l_quantity") < 24)
        )
        .agg(
            F.round(F.sum(F.col("l_extendedprice") * F.col("l_discount")), 4).alias(
                "revenue"
            ),
            F.count(F.lit(1)).alias("n_rows"),
        )
    )


@register(
    "q_tpch_q21_shape",
    oracle="""
    WITH lo AS (
        SELECT l.l_orderkey, l.l_suppkey,
               l.l_shipdate > o.o_orderdate + INTERVAL 90 DAY AS late
        FROM lineitem l
        JOIN orders o ON o.o_orderkey = l.l_orderkey
        WHERE o.o_orderstatus = 'F'
    )
    SELECT s.s_suppkey, s.s_name, COUNT(*) AS numwait
    FROM supplier s
    JOIN (SELECT * FROM lo WHERE late) l1 ON l1.l_suppkey = s.s_suppkey
    WHERE EXISTS (
        SELECT 1 FROM lo l2
        WHERE l2.l_orderkey = l1.l_orderkey
          AND l2.l_suppkey <> l1.l_suppkey
    )
    AND NOT EXISTS (
        SELECT 1 FROM lo l3
        WHERE l3.l_orderkey = l1.l_orderkey
          AND l3.l_suppkey <> l1.l_suppkey AND l3.late
    )
    GROUP BY s.s_suppkey, s.s_name
    ORDER BY numwait DESC, s.s_suppkey
    LIMIT 100
    """,
)
def q_tpch_q21_shape(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q21 shape (suppliers who kept finished orders waiting) —
    the canonical EXISTS + NOT EXISTS correlated pair, expressed as a
    left-semi and a left-anti join. "Late" adapts to the fixture's
    columns (no receipt/commit dates): shipped more than 90 days after
    the order date. The semi/anti sides carry only (orderkey, suppkey,
    late) projections, every pass shuffles on l_orderkey so AQE reuses
    one partitioning, and the final top-100 is TakeOrderedAndProject.
    This is the shape that punishes engines rewriting NOT EXISTS as a
    cartesian check — here both arms are hash joins."""
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_suppkey", "l_shipdate"
    )
    s = load_table(spark, sf_dir, "supplier").select("s_suppkey", "s_name")
    o = (
        load_table(spark, sf_dir, "orders")
        .filter(F.col("o_orderstatus") == "F")
        .select("o_orderkey", "o_orderdate")
    )
    lo = (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .select(
            "l_orderkey",
            "l_suppkey",
            # + INTERVAL (not date_add): keeps any time-of-day component,
            # exactly matching the oracle's o_orderdate + INTERVAL 90 DAY
            (
                F.col("l_shipdate")
                > F.col("o_orderdate") + F.expr("INTERVAL 90 DAYS")
            ).alias("late"),
        )
        .persist()  # feeds l1, the semi arm, and the anti arm
    )
    l1 = lo.filter(F.col("late")).select("l_orderkey", "l_suppkey")
    others = lo.select(
        F.col("l_orderkey").alias("o_k"), F.col("l_suppkey").alias("o_s")
    )
    l1_semi = l1.join(
        others,
        (F.col("l_orderkey") == F.col("o_k"))
        & (F.col("l_suppkey") != F.col("o_s")),
        "left_semi",
    )
    others_late = lo.filter(F.col("late")).select(
        F.col("l_orderkey").alias("a_k"), F.col("l_suppkey").alias("a_s")
    )
    l1_final = l1_semi.join(
        others_late,
        (F.col("l_orderkey") == F.col("a_k"))
        & (F.col("l_suppkey") != F.col("a_s")),
        "left_anti",
    )
    return (
        l1_final.join(s, l1_final.l_suppkey == s.s_suppkey)
        .groupBy("s_suppkey", "s_name")
        .agg(F.count(F.lit(1)).alias("numwait"))
        .orderBy(F.desc("numwait"), "s_suppkey")
        .limit(100)
    )


@register(
    "q_tpch_q2_shape",
    oracle="""
    WITH cost AS (
        SELECT l_partkey, l_suppkey,
               MIN(l_extendedprice / l_quantity) AS unit
        FROM lineitem GROUP BY l_partkey, l_suppkey
    ), best AS (
        SELECT l_partkey, MIN(unit) AS best_unit
        FROM cost GROUP BY l_partkey
    )
    SELECT p.p_partkey,
           CAST(MIN(c.l_suppkey) AS BIGINT) AS best_suppkey,
           CAST(FLOOR(b.best_unit * 10000 + 0.5) AS BIGINT) AS unit_e4
    FROM part p
    JOIN best b ON b.l_partkey = p.p_partkey
    JOIN cost c ON c.l_partkey = b.l_partkey AND c.unit = b.best_unit
    WHERE p.p_size % 7 = 0
    GROUP BY p.p_partkey, b.best_unit
    """,
)
def q_tpch_q2_shape(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q2's plan shape — MIN-per-group then JOIN-BACK to
    recover the row achieving the minimum (the schema has no
    partsupp, so 'supply cost' is the best observed unit price per
    (part, supplier) from lineitem). The per-part best and the
    (part, supplier) costs share ONE hash partitioning on partkey,
    so the join-back adds no exchange beyond the two aggregates;
    suppliers tying on the minimum collapse deterministically to
    MIN(suppkey). The double-equality join is safe cross-engine
    because both sides compute the identical IEEE quotient and MIN
    selects (not recombines) values; emission is floor-scaled e4 per
    the house float convention."""
    li = load_table(spark, sf_dir, "lineitem")
    cost = li.groupBy("l_partkey", "l_suppkey").agg(
        F.min(F.col("l_extendedprice") / F.col("l_quantity")).alias("unit")
    )
    best = cost.groupBy("l_partkey").agg(F.min("unit").alias("best_unit"))
    p = load_table(spark, sf_dir, "part").filter(
        F.col("p_size") % 7 == 0
    ).select("p_partkey")
    return (
        p.join(best, p.p_partkey == best.l_partkey)
        .join(
            cost,
            (cost.l_partkey == best.l_partkey)
            & (cost.unit == best.best_unit),
        )
        .groupBy("p_partkey", "best_unit")
        .agg(F.min("l_suppkey").cast("bigint").alias("best_suppkey"))
        .select(
            "p_partkey",
            "best_suppkey",
            F.floor(F.col("best_unit") * 10000 + F.lit(0.5))
            .cast("bigint")
            .alias("unit_e4"),
        )
    )


@register(
    "q_tpch_q4_shape",
    oracle="""
    SELECT o.o_orderpriority, COUNT(*) AS order_count
    FROM orders o
    WHERE o.o_orderdate >= TIMESTAMP '1996-07-01'
      AND o.o_orderdate < TIMESTAMP '1996-10-01'
      AND EXISTS (
          SELECT 1 FROM lineitem l
          WHERE l.l_orderkey = o.o_orderkey
            AND l.l_shipdate > o.o_orderdate + INTERVAL 60 DAY
      )
    GROUP BY o.o_orderpriority
    """,
)
def q_tpch_q4_shape(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q4 order-priority checking — the canonical EXISTS
    correlated subquery, rendered as a LEFT SEMI join whose condition
    spans both sides (late shipment: any line shipped >60 days after
    the order date). The semi join materializes no lineitem columns
    and deduplicates by construction — at 100 TB the probe side
    carries only (orderkey, shipdate) and the date filter prunes the
    orders scan to one quarter before the shuffle."""
    o = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-07-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1996-10-01").cast("timestamp"))
    )
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_shipdate"
    )
    late = o.join(
        li,
        (li.l_orderkey == o.o_orderkey)
        & (li.l_shipdate > F.col("o_orderdate") + F.expr("INTERVAL 60 DAYS")),
        "left_semi",
    )
    return late.groupBy("o_orderpriority").agg(
        F.count(F.lit(1)).alias("order_count")
    )


@register(
    "q_tpch_q13_shape",
    oracle="""
    SELECT c_count, COUNT(*) AS custdist
    FROM (
        SELECT c.c_custkey, COUNT(o.o_orderkey) AS c_count
        FROM customer c
        LEFT JOIN orders o
          ON o.o_custkey = c.c_custkey
         AND o.o_orderpriority <> '1-URGENT'
        GROUP BY c.c_custkey
    )
    GROUP BY c_count
    """,
)
def q_tpch_q13_shape(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q13 customer distribution — LEFT OUTER join with the
    filter INSIDE the join condition (a customer with only urgent
    orders must still appear with count 0, so the predicate cannot
    be pushed below the outer join as a WHERE), then a two-level
    aggregate: orders per customer, customers per order-count. The
    second aggregate's key space is tiny (~max orders per customer),
    so the plan is one big hash join + one big agg + one trivial
    agg."""
    c = load_table(spark, sf_dir, "customer").select("c_custkey")
    o = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderpriority") != "1-URGENT"
    ).select("o_custkey", "o_orderkey")
    per_cust = (
        c.join(o, o.o_custkey == c.c_custkey, "left_outer")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return per_cust.groupBy("c_count").agg(
        F.count(F.lit(1)).alias("custdist")
    )


@register(
    "q_tpch_q17_shape",
    oracle="""
    WITH pa AS (
        SELECT l_partkey, AVG(l_quantity) AS avg_qty
        FROM lineitem GROUP BY l_partkey
    )
    SELECT CAST(SUM(CAST(FLOOR(l.l_extendedprice * 100 + 0.5) AS BIGINT))
                AS BIGINT) AS revenue_c,
           COUNT(*) AS n_rows
    FROM lineitem l
    JOIN part p ON p.p_partkey = l.l_partkey AND p.p_brand = 'Brand#13'
    JOIN pa ON pa.l_partkey = l.l_partkey
    WHERE l.l_quantity < 0.2 * pa.avg_qty
    """,
)
def q_tpch_q17_shape(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q17 small-quantity-order revenue — the correlated
    per-group AVERAGE THRESHOLD: each lineitem compares against its
    part's average quantity. Both the per-part average and the probe
    share the partkey partitioning (one exchange), and the brand
    filter semi-prunes before the threshold join. Cross-engine float
    safety: l_quantity is integral, so AVG is an exact
    integer-sum/count on both engines and the 0.2x threshold compare
    is deterministic; revenue is summed in floor-scaled integer
    cents."""
    li = load_table(spark, sf_dir, "lineitem")
    pa = li.groupBy("l_partkey").agg(F.avg("l_quantity").alias("avg_qty"))
    p = load_table(spark, sf_dir, "part").filter(
        F.col("p_brand") == "Brand#13"
    ).select("p_partkey")
    probe = li.select("l_partkey", "l_quantity", "l_extendedprice")
    return (
        probe.join(p, probe.l_partkey == p.p_partkey)
        .join(pa, "l_partkey")
        .filter(F.col("l_quantity") < 0.2 * F.col("avg_qty"))
        .agg(
            F.sum(
                F.floor(F.col("l_extendedprice") * 100 + F.lit(0.5)).cast(
                    "bigint"
                )
            )
            .cast("bigint")
            .alias("revenue_c"),
            F.count(F.lit(1)).alias("n_rows"),
        )
    )


@register(
    "q_tpch_q22_shape",
    oracle="""
    WITH bal AS (
        SELECT c_custkey, c_nationkey,
               CAST(FLOOR(c_acctbal * 100 + 0.5) AS BIGINT) AS cents
        FROM customer
        WHERE c_nationkey IN (1, 3, 5, 7, 9, 11, 13)
    ), avg_bal AS (
        SELECT CAST(SUM(cents) AS BIGINT) AS total_c,
               COUNT(*) AS n_pos
        FROM bal WHERE cents > 0
    )
    SELECT b.c_nationkey,
           COUNT(*) AS numcust,
           CAST(SUM(b.cents) AS BIGINT) AS totacctbal_c
    FROM bal b, avg_bal a
    WHERE b.cents * a.n_pos > a.total_c
      AND NOT EXISTS (
          SELECT 1 FROM orders o
          WHERE o.o_custkey = b.c_custkey
            AND o.o_orderdate >= TIMESTAMP '1999-01-01'
      )
    GROUP BY b.c_nationkey
    """,
)
def q_tpch_q22_shape(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q22 global-sales-opportunity — scalar subquery threshold
    + ANTI join: above-average-balance customers in selected nations
    with NO recent orders (every synthetic customer has SOME order,
    so the dormancy window keeps the anti join non-vacuous). The
    average-balance comparison is exact cross-engine: balances become
    floor-scaled integer CENTS first, and 'cents > avg' is the
    cross-multiplied integer test cents*n > total — no float
    summation-order hazard (the repo's float-determinism rule). The
    1-row aggregate broadcasts; the anti join streams orders pruned
    to the dormancy window."""
    nations = [1, 3, 5, 7, 9, 11, 13]
    bal = (
        load_table(spark, sf_dir, "customer")
        .filter(F.col("c_nationkey").isin(nations))
        .select(
            "c_custkey",
            "c_nationkey",
            F.floor(F.col("c_acctbal") * 100 + F.lit(0.5))
            .cast("bigint")
            .alias("cents"),
        )
    )
    stats = bal.filter(F.col("cents") > 0).agg(
        F.sum("cents").cast("bigint").alias("total_c"),
        F.count(F.lit(1)).alias("n_pos"),
    )
    recent = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") >= F.lit("1999-01-01").cast("timestamp")
    ).select("o_custkey")
    rich = (
        bal.crossJoin(F.broadcast(stats))
        .filter(F.col("cents") * F.col("n_pos") > F.col("total_c"))
        .join(recent, bal.c_custkey == recent.o_custkey, "left_anti")
    )
    return rich.groupBy("c_nationkey").agg(
        F.count(F.lit(1)).alias("numcust"),
        F.sum("cents").cast("bigint").alias("totacctbal_c"),
    )
