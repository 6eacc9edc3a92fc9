"""Additional relational surface: pivot/unpivot, subqueries, CTEs,
distinct, histogram, full regression-aggregate alias.

These round out SURVEY.md §2.2 (D/K and SQL-API coverage): the
subquery/CTE queries deliberately go through `spark.sql` to exercise
the SQL front-end → Catalyst path (identical plans to the DataFrame
API, including scalar-subquery decorrelation).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from meta_iterative_mapreduce_spark.io import load_table
from meta_iterative_mapreduce_spark.registry import register


@register(
    "q_agg_pivot",
    oracle="""
    SELECT l_returnflag,
           ROUND(SUM(CASE WHEN l_linestatus = 'O' THEN l_quantity END), 4) AS qty_O,
           ROUND(SUM(CASE WHEN l_linestatus = 'F' THEN l_quantity END), 4) AS qty_F,
           ROUND(AVG(CASE WHEN l_linestatus = 'O' THEN l_discount END), 4) AS disc_O,
           ROUND(AVG(CASE WHEN l_linestatus = 'F' THEN l_discount END), 4) AS disc_F
    FROM lineitem
    GROUP BY l_returnflag
    """,
)
def q_agg_pivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pivot with explicit value list (explicit values keep the plan a
    single pass — omitting them costs an extra distinct-scan job)."""
    li = load_table(spark, sf_dir, "lineitem")
    p = (
        li.groupBy("l_returnflag")
        .pivot("l_linestatus", ["O", "F"])
        .agg(
            F.round(F.sum("l_quantity"), 4).alias("qty"),
            F.round(F.avg("l_discount"), 4).alias("disc"),
        )
    )
    return p.select(
        "l_returnflag",
        F.col("O_qty").alias("qty_O"),
        F.col("F_qty").alias("qty_F"),
        F.col("O_disc").alias("disc_O"),
        F.col("F_disc").alias("disc_F"),
    )


@register(
    "q_unpivot",
    oracle="""
    SELECT measure, ROUND(SUM(value), 4) AS total, COUNT(*) AS n
    FROM (
        SELECT 'quantity' AS measure, l_quantity AS value FROM lineitem
        UNION ALL
        SELECT 'discount' AS measure, l_discount AS value FROM lineitem
        UNION ALL
        SELECT 'tax' AS measure, l_tax AS value FROM lineitem
    )
    GROUP BY measure
    """,
)
def q_unpivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Unpivot (wide → long) via stack(), then aggregate per measure."""
    li = load_table(spark, sf_dir, "lineitem")
    long = li.selectExpr(
        "stack(3, 'quantity', l_quantity, 'discount', l_discount, 'tax', l_tax)"
        " AS (measure, value)"
    )
    return long.groupBy("measure").agg(
        F.round(F.sum("value"), 4).alias("total"), F.count(F.lit(1)).alias("n")
    )


@register(
    "q_subquery_scalar",
    oracle="""
    SELECT c_custkey, c_acctbal
    FROM customer
    WHERE c_acctbal > (SELECT AVG(c_acctbal) FROM customer)
    """,
)
def q_subquery_scalar(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Uncorrelated scalar subquery (SQL front-end path)."""
    load_table(spark, sf_dir, "customer").createOrReplaceTempView("v_customer")
    return spark.sql(
        """
        SELECT c_custkey, c_acctbal
        FROM v_customer
        WHERE c_acctbal > (SELECT AVG(c_acctbal) FROM v_customer)
        """
    )


@register(
    "q_subquery_correlated",
    oracle="""
    SELECT o_orderkey, o_custkey, o_totalprice
    FROM orders o
    WHERE o_totalprice > 1.5 * (
        SELECT AVG(o2.o_totalprice) FROM orders o2
        WHERE o2.o_custkey = o.o_custkey
    )
    """,
)
def q_subquery_correlated(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Correlated scalar subquery — Catalyst decorrelates it into an
    aggregate + join (RewriteCorrelatedScalarSubquery), so the executed
    plan is one shuffle, not a per-row loop."""
    load_table(spark, sf_dir, "orders").createOrReplaceTempView("v_orders")
    return spark.sql(
        """
        SELECT o_orderkey, o_custkey, o_totalprice
        FROM v_orders o
        WHERE o_totalprice > 1.5 * (
            SELECT AVG(o2.o_totalprice) FROM v_orders o2
            WHERE o2.o_custkey = o.o_custkey
        )
        """
    )


@register(
    "q_cte_multi",
    oracle="""
    WITH cust_orders AS (
        SELECT o_custkey, COUNT(*) AS n_orders,
               ROUND(SUM(o_totalprice), 4) AS spend
        FROM orders GROUP BY o_custkey
    ), big AS (
        SELECT * FROM cust_orders WHERE n_orders >= 2
    )
    SELECT c.c_mktsegment,
           COUNT(*) AS n_cust,
           ROUND(SUM(b.spend), 4) AS segment_spend
    FROM big b JOIN customer c ON b.o_custkey = c.c_custkey
    GROUP BY c.c_mktsegment
    """,
)
def q_cte_multi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Chained CTEs + join + re-aggregation through the SQL front-end."""
    load_table(spark, sf_dir, "orders").createOrReplaceTempView("v_orders")
    load_table(spark, sf_dir, "customer").createOrReplaceTempView("v_customer")
    return spark.sql(
        """
        WITH cust_orders AS (
            SELECT o_custkey, COUNT(*) AS n_orders,
                   ROUND(SUM(o_totalprice), 4) AS spend
            FROM v_orders GROUP BY o_custkey
        ), big AS (
            SELECT * FROM cust_orders WHERE n_orders >= 2
        )
        SELECT c.c_mktsegment,
               COUNT(*) AS n_cust,
               ROUND(SUM(b.spend), 4) AS segment_spend
        FROM big b JOIN v_customer c ON b.o_custkey = c.c_custkey
        GROUP BY c.c_mktsegment
        """
    )


@register(
    "q_distinct_projection",
    oracle="""
    SELECT DISTINCT l_returnflag, l_linestatus FROM lineitem
    """,
)
def q_distinct_projection(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DISTINCT on a projection (hash aggregate without agg functions)."""
    li = load_table(spark, sf_dir, "lineitem")
    return li.select("l_returnflag", "l_linestatus").distinct()


@register(
    "q_agg_histogram",
    oracle="""
    SELECT CAST(FLOOR(l_extendedprice / 10000.0) AS BIGINT) AS bin,
           COUNT(*) AS n,
           ROUND(SUM(l_quantity), 4) AS qty
    FROM lineitem
    GROUP BY 1
    """,
)
def q_agg_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Histogram by arithmetic binning (engine-neutral floor-division
    bins; the distributed GROUP BY histogram pattern)."""
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.groupBy(
            F.floor(F.col("l_extendedprice") / 10000.0).alias("bin")
        )
        .agg(F.count(F.lit(1)).alias("n"), F.round(F.sum("l_quantity"), 4).alias("qty"))
    )


@register(
    "q_agg_regression_exact",
    oracle="""
    SELECT ROUND(regr_slope(l_extendedprice, l_quantity), 4) AS slope,
           ROUND(regr_intercept(l_extendedprice, l_quantity), 4) AS intercept,
           ROUND(POWER(corr(l_quantity, l_extendedprice), 2), 4) AS r2,
           CAST(regr_count(l_extendedprice, l_quantity) AS BIGINT) AS n
    FROM lineitem
    WHERE l_returnflag = 'N'
    """,
)
def q_agg_regression_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Regression aggregate family over a filtered slice: slope,
    intercept, r² (= corr²), count — R6+R7 as one fused aggregate."""
    li = load_table(spark, sf_dir, "lineitem").filter(F.col("l_returnflag") == "N")
    y, x = F.col("l_extendedprice"), F.col("l_quantity")
    return li.agg(
        F.round(F.regr_slope(y, x), 4).alias("slope"),
        F.round(F.regr_intercept(y, x), 4).alias("intercept"),
        F.round(F.pow(F.corr(x, y), 2), 4).alias("r2"),
        F.regr_count(y, x).alias("n"),
    )


@register(
    "q_agg_bitwise",
    oracle="""
    SELECT l_returnflag,
           BIT_AND(CAST(l_quantity AS BIGINT)) AS qty_and,
           BIT_OR(CAST(l_quantity AS BIGINT)) AS qty_or,
           BIT_XOR(CAST(l_quantity AS BIGINT)) AS qty_xor
    FROM lineitem
    GROUP BY l_returnflag
    """,
)
def q_agg_bitwise(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bitwise aggregates (order-insensitive by construction — no float
    hygiene needed)."""
    li = load_table(spark, sf_dir, "lineitem")
    q = F.col("l_quantity").cast("bigint")
    return li.groupBy("l_returnflag").agg(
        F.bit_and(q).alias("qty_and"),
        F.bit_or(q).alias("qty_or"),
        F.bit_xor(q).alias("qty_xor"),
    )


@register(
    "q_agg_arg_minmax",
    oracle="""
    SELECT o_orderpriority,
           arg_max(o_orderkey, o_totalprice) AS key_of_max,
           arg_min(o_orderkey, o_totalprice) AS key_of_min,
           MAX(o_totalprice) AS max_price,
           MIN(o_totalprice) AS min_price
    FROM orders
    GROUP BY o_orderpriority
    """,
)
def q_agg_arg_minmax(spark: SparkSession, sf_dir: str) -> DataFrame:
    """arg_max/arg_min (max_by/min_by): the key attaining the extreme
    value per group (o_totalprice is tie-free per priority group at the
    checked scale, so the selected key is deterministic)."""
    o = load_table(spark, sf_dir, "orders")
    return o.groupBy("o_orderpriority").agg(
        F.max_by("o_orderkey", "o_totalprice").alias("key_of_max"),
        F.min_by("o_orderkey", "o_totalprice").alias("key_of_min"),
        F.max("o_totalprice").alias("max_price"),
        F.min("o_totalprice").alias("min_price"),
    )


@register(
    "q_scalar_hash",
    oracle="""
    SELECT doc_id,
           md5(text) AS h_md5,
           sha256(text) AS h_sha256
    FROM documents
    WHERE doc_id < 100
    """,
)
def q_scalar_hash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cryptographic hash scalars — md5/sha256 hex digests are
    bit-identical across engines (unlike engine-native hash()), which
    is why they anchor the dedup fingerprints."""
    d = load_table(spark, sf_dir, "documents").filter(F.col("doc_id") < 100)
    return d.select(
        "doc_id",
        F.md5("text").alias("h_md5"),
        F.sha2("text", 256).alias("h_sha256"),
    )


@register(
    "q_join_cross",
    oracle="""
    SELECT r1.r_name AS name_a, r2.r_name AS name_b
    FROM region r1 CROSS JOIN region r2
    WHERE r1.r_regionkey < r2.r_regionkey
    """,
)
def q_join_cross(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Explicit (bounded) cross join — unordered pairs of regions.
    Cartesian products are only ever sane on O(1)-size inputs; the
    filter halves the 25 pairs to the 10 unordered ones."""
    r1 = load_table(spark, sf_dir, "region").select(
        F.col("r_regionkey").alias("k1"), F.col("r_name").alias("name_a")
    )
    r2 = load_table(spark, sf_dir, "region").select(
        F.col("r_regionkey").alias("k2"), F.col("r_name").alias("name_b")
    )
    return (
        r1.crossJoin(r2)
        .filter(F.col("k1") < F.col("k2"))
        .select("name_a", "name_b")
    )


@register(
    "q_agg_mode",
    oracle="""
    WITH counts AS (
        SELECT c_nationkey, c_mktsegment, COUNT(*) AS n
        FROM customer GROUP BY c_nationkey, c_mktsegment
    ), ranked AS (
        SELECT c_nationkey, c_mktsegment, n,
               ROW_NUMBER() OVER (
                   PARTITION BY c_nationkey ORDER BY n DESC, c_mktsegment
               ) AS rn
        FROM counts
    )
    SELECT c_nationkey, c_mktsegment AS mode_segment, n AS n_customers
    FROM ranked WHERE rn = 1
    """,
)
def q_agg_mode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-group mode with a deterministic tiebreak (highest count,
    then lexicographically smallest value): the most common market
    segment per nation. Shape: one data-sized partial-aggregated
    hash agg to the (nation, segment) count table, then a window +
    filter over that tiny table — the second exchange moves |groups|
    rows, never data."""
    cust = load_table(spark, sf_dir, "customer")
    counts = cust.groupBy("c_nationkey", "c_mktsegment").agg(
        F.count(F.lit(1)).alias("n")
    )
    from pyspark.sql import Window as W

    w = W.partitionBy("c_nationkey").orderBy(
        F.col("n").desc(), F.col("c_mktsegment")
    )
    return (
        counts.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select(
            "c_nationkey",
            F.col("c_mktsegment").alias("mode_segment"),
            F.col("n").alias("n_customers"),
        )
    )


@register(
    "q_window_distribution",
    oracle="""
    SELECT c_custkey, c_nationkey,
           CAST(FLOOR(PERCENT_RANK() OVER (
               PARTITION BY c_nationkey ORDER BY c_acctbal, c_custkey
           ) * 10000 + 0.5) AS BIGINT) AS pct_rank_e4,
           CAST(FLOOR(CUME_DIST() OVER (
               PARTITION BY c_nationkey ORDER BY c_acctbal, c_custkey
           ) * 10000 + 0.5) AS BIGINT) AS cume_e4
    FROM customer
    """,
)
def q_window_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distribution window functions (PERCENT_RANK, CUME_DIST) over
    account balance within each nation — completes the ranking-family
    coverage (row_number/rank/dense_rank/ntile already registered).
    The c_custkey ordering tiebreak makes both functions
    deterministic even under duplicate balances. One exchange on
    c_nationkey; both functions ride the same sort. Emitted as
    floor-scaled e4 integers: (rank-1)/(n-1) SYSTEMATICALLY produces
    e4 midpoints for round denominators (1/20000 = 0.00005), so a
    final ROUND(x,4) is the cross-engine midpoint hazard class, not a
    measure-zero one (q_ts_interpolate note)."""
    from pyspark.sql import Window as W

    cust = load_table(spark, sf_dir, "customer")
    w = W.partitionBy("c_nationkey").orderBy("c_acctbal", "c_custkey")
    return cust.select(
        "c_custkey",
        "c_nationkey",
        F.floor(F.percent_rank().over(w) * 10000 + F.lit(0.5))
        .cast("long")
        .alias("pct_rank_e4"),
        F.floor(F.cume_dist().over(w) * 10000 + F.lit(0.5))
        .cast("long")
        .alias("cume_e4"),
    )


@register(
    "q_table_checksum",
    oracle="""
    SELECT COUNT(*) AS n_rows,
           CAST(SUM(CAST(CONCAT('0x', SUBSTR(md5(CONCAT_WS('|',
               l_orderkey, l_partkey, l_suppkey, l_returnflag)), 1, 8))
               AS BIGINT)) AS BIGINT) AS checksum,
           COUNT(DISTINCT l_orderkey) AS n_orders
    FROM lineitem
    """,
)
def q_table_checksum(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Order-independent table checksum — the migration/replication
    validation primitive: per-row md5 over the stable key columns,
    folded with a commutative SUM so partitioning and row order can't
    change the digest. md5 is engine-portable (unlike xxhash64/crc32),
    so the oracle recomputes the identical checksum — at 100 TB this
    is ONE scan + a scalar aggregate per side of a migration, no data
    movement. Key columns only (bigints + a flag char): float-to-string
    rendering is NOT portable across engines and is deliberately
    excluded from the digest."""
    li = load_table(spark, sf_dir, "lineitem")
    row_hash = F.conv(
        F.substring(
            F.md5(
                F.concat_ws(
                    "|", "l_orderkey", "l_partkey", "l_suppkey", "l_returnflag"
                )
            ),
            1,
            8,
        ),
        16,
        10,
    ).cast("long")
    return li.agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.sum(row_hash).alias("checksum"),
        F.countDistinct("l_orderkey").alias("n_orders"),
    )


@register(
    "q_agg_decimal_exact",
    oracle="""
    SELECT l_returnflag,
           CAST(SUM(CAST(FLOOR(l_extendedprice * 100 + 0.5) AS BIGINT))
               AS BIGINT) AS revenue_cents,
           CAST(SUM(CAST(FLOOR(l_extendedprice * (1 - l_discount) * 100
               + 0.5) AS BIGINT)) AS BIGINT) AS discounted_cents,
           CAST(SUM(CAST(FLOOR(l_extendedprice * 100 + 0.5) AS BIGINT))
               AS BIGINT) / 100.0 AS revenue
    FROM lineitem GROUP BY l_returnflag
    """,
)
def q_agg_decimal_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact fixed-point money aggregation: prices quantized to integer
    cents at the scan (FLOOR(x*100 + 0.5) — zero rounding discretion,
    see q_ts_interpolate's determinism note), summed as BIGINTs.
    Unlike double sums, integer-cent sums are EXACT and
    order-independent — no ROUND hygiene, and 200-partition / AQE
    re-plans cannot move a cent; the display dollars column is one
    identical division. This is the decimal/money tier every warehouse
    keeps: the engine-native DecimalType path exists too, but
    cross-engine double->decimal casts round differently on midpoints,
    so the portable contract is integer cents."""
    li = load_table(spark, sf_dir, "lineitem")
    cents = F.floor(F.col("l_extendedprice") * 100 + F.lit(0.5)).cast("long")
    dcents = F.floor(
        F.col("l_extendedprice") * (1 - F.col("l_discount")) * 100 + F.lit(0.5)
    ).cast("long")
    return li.groupBy("l_returnflag").agg(
        F.sum(cents).alias("revenue_cents"),
        F.sum(dcents).alias("discounted_cents"),
        (F.sum(cents) / F.lit(100.0)).alias("revenue"),
    )


@register(
    "q_agg_benford",
    oracle="""
    WITH digits AS (
        SELECT CAST(SUBSTR(CAST(CAST(FLOOR(o_totalprice) AS BIGINT)
                   AS VARCHAR), 1, 1) AS INT) AS d
        FROM orders WHERE o_totalprice >= 1
    )
    SELECT d, COUNT(*) AS n,
           CAST(FLOOR(COUNT(*) * 10000.0
                / SUM(COUNT(*)) OVER () + 0.5) AS BIGINT) AS share_e4,
           CAST(FLOOR(LOG10(1.0 + 1.0 / d) * 10000 + 0.5) AS BIGINT)
               AS benford_e4
    FROM digits GROUP BY d
    """,
)
def q_agg_benford(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benford first-digit audit — the classic data-forensics check for
    fabricated or truncated numeric columns: observed first-digit
    shares of order totals next to the Benford expectation
    log10(1 + 1/d), both in floor-scaled basis points. ONE 9-bucket
    aggregate (map-side combined) + a single-row total — runs on a
    100 TB fact at scan cost. First digit comes from integer string
    math (floor then substr), not float formatting, so both engines
    derive identical digits."""
    o = load_table(spark, sf_dir, "orders").filter(F.col("o_totalprice") >= 1)
    d = F.substring(
        F.floor("o_totalprice").cast("long").cast("string"), 1, 1
    ).cast("int")
    counts = o.groupBy(d.alias("d")).agg(F.count(F.lit(1)).alias("n"))
    # single-row total as a broadcast-stat cross join (the house
    # pattern, e.g. BM25) rather than a Window.partitionBy() — same
    # answer, no empty-partition-spec WindowExec warning on a 9-row
    # aggregate
    total = counts.agg(F.sum("n").alias("total"))
    return counts.crossJoin(F.broadcast(total)).select(
        "d",
        "n",
        F.floor(F.col("n") * 10000.0 / F.col("total") + F.lit(0.5))
        .cast("long")
        .alias("share_e4"),
        F.floor(F.log10(1.0 + 1.0 / F.col("d")) * 10000 + F.lit(0.5))
        .cast("long")
        .alias("benford_e4"),
    )


@register(
    "q_profile_table",
    oracle="""
    SELECT 'o_orderkey' AS col_name, COUNT(*) AS n_rows,
           COUNT(*) - COUNT(o_orderkey) AS n_null,
           COUNT(DISTINCT o_orderkey) AS n_distinct,
           CAST(MIN(o_orderkey) AS VARCHAR) AS min_s,
           CAST(MAX(o_orderkey) AS VARCHAR) AS max_s
    FROM orders
    UNION ALL
    SELECT 'o_custkey', COUNT(*), COUNT(*) - COUNT(o_custkey),
           COUNT(DISTINCT o_custkey),
           CAST(MIN(o_custkey) AS VARCHAR), CAST(MAX(o_custkey) AS VARCHAR)
    FROM orders
    UNION ALL
    SELECT 'o_orderstatus', COUNT(*), COUNT(*) - COUNT(o_orderstatus),
           COUNT(DISTINCT o_orderstatus), MIN(o_orderstatus),
           MAX(o_orderstatus)
    FROM orders
    UNION ALL
    SELECT 'o_totalprice', COUNT(*), COUNT(*) - COUNT(o_totalprice),
           COUNT(DISTINCT o_totalprice),
           CAST(CAST(FLOOR(MIN(o_totalprice) * 100 + 0.5) AS BIGINT)
                AS VARCHAR),
           CAST(CAST(FLOOR(MAX(o_totalprice) * 100 + 0.5) AS BIGINT)
                AS VARCHAR)
    FROM orders
    UNION ALL
    SELECT 'o_orderdate', COUNT(*), COUNT(*) - COUNT(o_orderdate),
           COUNT(DISTINCT o_orderdate),
           strftime(MIN(o_orderdate), '%Y-%m-%d'),
           strftime(MAX(o_orderdate), '%Y-%m-%d')
    FROM orders
    UNION ALL
    SELECT 'o_orderpriority', COUNT(*), COUNT(*) - COUNT(o_orderpriority),
           COUNT(DISTINCT o_orderpriority), MIN(o_orderpriority),
           MAX(o_orderpriority)
    FROM orders
    """,
)
def q_profile_table(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Table profiling (the ANALYZE/data-quality primitive a pipeline
    runs before trusting an input drop): per column — row count, null
    count, EXACT distinct count, and deterministic min/max renderings
    (longs as decimal strings, doubles floor-scaled to cents,
    timestamps as dates — engine-neutral formats, never raw
    float-to-string).

    Plan: a UNION of six per-column aggregates, NOT one aggregate with
    six distincts. The multi-distinct form plans as a single Expand
    (7x row multiplication) whose shuffle carries every grouping
    column in one WIDE row; the union form reads the same bytes from
    columnar parquet (six 1-column scans = one 6-column scan at rest)
    but each distinct shuffles only its own narrow column — measured
    4x faster at sf0.1 (0.66 s vs 2.6 s warm) and strictly less
    shuffle volume at any scale. Each leg is a two-phase partial/final
    aggregate; the 6-row output unions driver-side metadata only."""
    o = load_table(spark, sf_dir, "orders")

    def leg(col: str, render) -> DataFrame:
        return o.agg(
            F.lit(col).alias("col_name"),
            F.count(F.lit(1)).alias("n_rows"),
            (F.count(F.lit(1)) - F.count(col)).alias("n_null"),
            F.count_distinct(col).alias("n_distinct"),
            render(F.min(col)).alias("min_s"),
            render(F.max(col)).alias("max_s"),
        )

    as_str = lambda c: c.cast("string")  # noqa: E731
    cents = (  # noqa: E731
        lambda c: F.floor(c * 100 + F.lit(0.5)).cast("long").cast("string")
    )
    day = lambda c: F.date_format(c, "yyyy-MM-dd")  # noqa: E731
    legs = [
        leg("o_orderkey", as_str),
        leg("o_custkey", as_str),
        leg("o_orderstatus", as_str),
        leg("o_totalprice", cents),
        leg("o_orderdate", day),
        leg("o_orderpriority", as_str),
    ]
    out = legs[0]
    for df in legs[1:]:
        out = out.unionByName(df)
    return out
