"""Window functions (SURVEY.md §2.2 E).

Every ORDER BY inside a window carries a full tie-break key
((l_orderkey, l_linenumber) is unique) so row_number and frame
contents are deterministic across engines. Running sums are taken
over integral-valued columns (cast to BIGINT) so no float summation
order can bite; float frames (moving averages) stay on the exact
integer grid or are ROUND(...,4)-ed.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import Window as W
from pyspark.sql import functions as F

from meta_iterative_mapreduce_spark.io import load_table
from meta_iterative_mapreduce_spark.operators.distrank import (
    ntile_from_rank,
    with_distributed_row_number,
)
from meta_iterative_mapreduce_spark.registry import register


@register(
    "q_window_ranking",
    oracle="""
    SELECT * FROM (
        SELECT l_returnflag, l_orderkey, l_linenumber, l_quantity,
               ROW_NUMBER() OVER (PARTITION BY l_returnflag
                   ORDER BY l_quantity DESC, l_orderkey, l_linenumber) AS rn,
               RANK() OVER (PARTITION BY l_returnflag
                   ORDER BY l_quantity DESC) AS rnk,
               DENSE_RANK() OVER (PARTITION BY l_returnflag
                   ORDER BY l_quantity DESC) AS drnk
        FROM lineitem
    ) WHERE rn <= 1000
    """,
)
def q_window_ranking(spark: SparkSession, sf_dir: str) -> DataFrame:
    """row_number / rank / dense_rank per group (rank windows ordered by
    the tied value only; row_number fully tie-broken)."""
    li = load_table(spark, sf_dir, "lineitem")
    w_full = W.partitionBy("l_returnflag").orderBy(
        F.col("l_quantity").desc(), "l_orderkey", "l_linenumber"
    )
    w_qty = W.partitionBy("l_returnflag").orderBy(F.col("l_quantity").desc())
    return (
        li.select(
            "l_returnflag",
            "l_orderkey",
            "l_linenumber",
            "l_quantity",
            F.row_number().over(w_full).cast("long").alias("rn"),
            F.rank().over(w_qty).cast("long").alias("rnk"),
            F.dense_rank().over(w_qty).cast("long").alias("drnk"),
        )
        .filter(F.col("rn") <= 1000)
    )


@register(
    "q_window_analytic",
    oracle="""
    SELECT l_suppkey, l_orderkey, l_linenumber, l_quantity,
           LAG(l_quantity) OVER w AS prev_qty,
           LEAD(l_quantity) OVER w AS next_qty,
           FIRST_VALUE(l_quantity) OVER w AS first_qty,
           LAST_VALUE(l_quantity) OVER
               (PARTITION BY l_suppkey
                ORDER BY l_shipdate, l_orderkey, l_linenumber, l_quantity
                ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING) AS last_qty
    FROM lineitem
    WINDOW w AS (PARTITION BY l_suppkey
                 ORDER BY l_shipdate, l_orderkey, l_linenumber, l_quantity)
    """,
)
def q_window_analytic(spark: SparkSession, sf_dir: str) -> DataFrame:
    """lag / lead / first_value / last_value (explicit full frame for
    last_value — the default frame ends at CURRENT ROW)."""
    li = load_table(spark, sf_dir, "lineitem")
    # l_quantity tiebreak: the fixture generator emits occasional full
    # key collisions (same suppkey/shipdate/orderkey/linenumber, two
    # quantities), so the natural key alone is not a total order
    w = W.partitionBy("l_suppkey").orderBy(
        "l_shipdate", "l_orderkey", "l_linenumber", "l_quantity"
    )
    w_full = w.rowsBetween(W.unboundedPreceding, W.unboundedFollowing)
    return li.select(
        "l_suppkey",
        "l_orderkey",
        "l_linenumber",
        "l_quantity",
        F.lag("l_quantity").over(w).alias("prev_qty"),
        F.lead("l_quantity").over(w).alias("next_qty"),
        F.first("l_quantity").over(w).alias("first_qty"),
        F.last("l_quantity").over(w_full).alias("last_qty"),
    )


@register(
    "q_window_frame_rows",
    oracle="""
    SELECT l_suppkey, l_orderkey, l_linenumber,
           CAST(SUM(CAST(l_quantity AS BIGINT)) OVER
               (PARTITION BY l_suppkey
                ORDER BY l_shipdate, l_orderkey, l_linenumber, l_quantity
                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
               AS BIGINT) AS running_qty,
           AVG(l_quantity) OVER
               (PARTITION BY l_suppkey
                ORDER BY l_shipdate, l_orderkey, l_linenumber, l_quantity
                ROWS BETWEEN 2 PRECEDING AND CURRENT ROW) AS qty_ma3
    FROM lineitem
    """,
)
def q_window_frame_rows(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ROWS frames: running sum (exact BIGINT — quantities are integral)
    and a 3-row moving average (sums of ≤3 integral doubles are exact
    in fp, so no rounding is needed). l_quantity tiebreak: the fixture
    emits occasional full natural-key collisions, so ROWS frames need
    it for a total (engine-agreed) order."""
    li = load_table(spark, sf_dir, "lineitem")
    w = W.partitionBy("l_suppkey").orderBy(
        "l_shipdate", "l_orderkey", "l_linenumber", "l_quantity"
    )
    return li.select(
        "l_suppkey",
        "l_orderkey",
        "l_linenumber",
        F.sum(F.col("l_quantity").cast("bigint"))
        .over(w.rowsBetween(W.unboundedPreceding, W.currentRow))
        .alias("running_qty"),
        F.avg("l_quantity").over(w.rowsBetween(-2, W.currentRow)).alias("qty_ma3"),
    )


@register(
    "q_window_frame_range",
    oracle="""
    SELECT o_orderkey, o_orderpriority,
           ROUND(SUM(o_totalprice) OVER
               (PARTITION BY o_orderpriority
                ORDER BY CAST(datediff('day', TIMESTAMP '1995-01-01',
                                       o_orderdate) AS INT)
                RANGE BETWEEN 6 PRECEDING AND CURRENT ROW), 4) AS sum_7d,
           COUNT(*) OVER
               (PARTITION BY o_orderpriority
                ORDER BY CAST(datediff('day', TIMESTAMP '1995-01-01',
                                       o_orderdate) AS INT)
                RANGE BETWEEN 6 PRECEDING AND CURRENT ROW) AS n_7d
    FROM orders
    """,
)
def q_window_frame_range(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RANGE frame over day numbers: 7-day (6 days back, value-based)
    moving sum + count of order totals per priority.

    The range key is datediff from a fixed date — NOT unix_timestamp,
    which interprets NTZ timestamps in the session timezone and would
    shift frame membership under a DST-varying tz. A moving SUM of
    2-decimal values stays on the 2-decimal grid, so ROUND(...,4) is
    tie-free; a moving AVG would divide onto arbitrary grids where
    exact 5th-decimal ties round differently per engine.
    """
    o = load_table(spark, sf_dir, "orders")
    w = (
        W.partitionBy("o_orderpriority")
        .orderBy(F.datediff(F.col("o_orderdate"), F.lit("1995-01-01").cast("timestamp")))
        .rangeBetween(-6, W.currentRow)
    )
    return o.select(
        "o_orderkey",
        "o_orderpriority",
        F.round(F.sum("o_totalprice").over(w), 4).alias("sum_7d"),
        F.count(F.lit(1)).over(w).alias("n_7d"),
    )


@register(
    "q_topk_per_group",
    oracle="""
    SELECT * FROM (
        SELECT o_orderpriority, o_orderkey, o_totalprice,
               ROW_NUMBER() OVER (PARTITION BY o_orderpriority
                   ORDER BY o_totalprice DESC, o_orderkey) AS rn
        FROM orders
    ) WHERE rn <= 3
    """,
)
def q_topk_per_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-k per group via ranked-window filter (Spark pushes the rn<=k
    limit into the window sort as a group-limit at planning time)."""
    o = load_table(spark, sf_dir, "orders")
    w = W.partitionBy("o_orderpriority").orderBy(
        F.col("o_totalprice").desc(), "o_orderkey"
    )
    return (
        o.select(
            "o_orderpriority",
            "o_orderkey",
            "o_totalprice",
            F.row_number().over(w).cast("long").alias("rn"),
        )
        .filter(F.col("rn") <= 3)
    )


@register(
    "q_window_ntile",
    oracle="""
    SELECT o_orderkey,
           NTILE(4) OVER (ORDER BY o_totalprice, o_orderkey) AS price_quartile,
           CAST(FLOOR(PERCENT_RANK() OVER (ORDER BY o_totalprice)
                * 10000 + 0.5) AS BIGINT) AS pct_rank_e4,
           CAST(FLOOR(CUME_DIST() OVER (ORDER BY o_totalprice)
                * 10000 + 0.5) AS BIGINT) AS cume_e4,
           ROW_NUMBER() OVER (ORDER BY o_totalprice, o_orderkey) AS rn
    FROM orders
    """,
)
def q_window_ntile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distribution windows: ntile quartiles, percent_rank, cume_dist
    (ntile/row_number fully tie-broken; rank-based functions ordered by
    the value alone so ties are deterministic).

    Plan: NOT the naive global `Window.orderBy(...)` (which funnels the
    whole table through ONE task — the unpartitioned-WindowExec
    scale-killer); instead the two-pass distributed rank
    (operators/distrank.py): one range shuffle + per-partition
    histogram → broadcast prefix offsets → vectorized rank arithmetic.
    NTILE is then exact integer math on (rn, n); PERCENT_RANK =
    (min rn among value-ties − 1)/(n−1) and CUME_DIST = max rn among
    ties / n, via a window PARTITIONED by the tie value (range
    partitioning already co-locates ties, so the only exchanges are
    the range shuffle and one high-cardinality hash shuffle — both
    fully distributed at any scale)."""
    o = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_totalprice")
    ranked, n = with_distributed_row_number(
        o, ["o_totalprice", "o_orderkey"], out="rn"
    )
    w_val = W.partitionBy("o_totalprice")
    rank_min = F.min("rn").over(w_val)
    rank_max = F.max("rn").over(w_val)
    pct = (rank_min - 1) / F.lit(n - 1) if n > 1 else F.lit(0.0)
    # floor-scaled e4, never ROUND: (rank-1)/(n-1) produces e4
    # midpoints SYSTEMATICALLY for round denominators (1/20000 =
    # 0.00005) — the cross-engine ROUND hazard class, not measure-zero
    return ranked.select(
        "o_orderkey",
        ntile_from_rank(F.col("rn"), n, 4).alias("price_quartile"),
        F.floor(pct * 10000 + F.lit(0.5)).cast("long").alias("pct_rank_e4"),
        F.floor(rank_max / F.lit(n) * 10000 + F.lit(0.5))
        .cast("long")
        .alias("cume_e4"),
        F.col("rn"),
    )
