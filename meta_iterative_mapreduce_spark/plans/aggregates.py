"""Aggregations (SURVEY.md §2.2 D).

The reference's whole aggregate surface is a fused 4-sum pass
(kernel.cu:53-59) plus two averaging reduce levels. Spark's partial +
final HashAggregate computes arbitrarily many aggregate expressions in
one data pass with map-side combine — the generalization of that
pattern. Every float aggregate is ROUND(...,4)-ed on both engines
(summation-order hygiene, SURVEY.md §2.2 rule a).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import Window as W
from pyspark.sql import functions as F

from meta_iterative_mapreduce_spark.io import load_table
from meta_iterative_mapreduce_spark.registry import register


@register(
    "q_agg_global",
    oracle="""
    SELECT COUNT(*) AS n_rows,
           ROUND(SUM(l_quantity), 4) AS sum_qty,
           ROUND(AVG(l_extendedprice), 4) AS avg_price,
           MIN(l_extendedprice) AS min_price,
           MAX(l_extendedprice) AS max_price,
           COUNT(DISTINCT l_orderkey) AS n_orders
    FROM lineitem
    """,
)
def q_agg_global(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Global (no-key) multi-aggregate in one pass."""
    li = load_table(spark, sf_dir, "lineitem")
    return li.agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.round(F.sum("l_quantity"), 4).alias("sum_qty"),
        F.round(F.avg("l_extendedprice"), 4).alias("avg_price"),
        F.min("l_extendedprice").alias("min_price"),
        F.max("l_extendedprice").alias("max_price"),
        F.countDistinct("l_orderkey").alias("n_orders"),
    )


@register(
    "q_agg_groupby",
    oracle="""
    SELECT l_returnflag, l_linestatus,
           ROUND(SUM(l_quantity), 4) AS sum_qty,
           ROUND(SUM(l_extendedprice), 4) AS sum_base_price,
           ROUND(SUM(l_extendedprice * (1 - l_discount)), 4) AS sum_disc_price,
           ROUND(SUM(l_extendedprice * (1 - l_discount) * (1 + l_tax)), 4) AS sum_charge,
           ROUND(AVG(l_quantity), 4) AS avg_qty,
           ROUND(AVG(l_extendedprice), 4) AS avg_price,
           ROUND(AVG(l_discount), 4) AS avg_disc,
           COUNT(*) AS count_order
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '2000-12-01'
    GROUP BY l_returnflag, l_linestatus
    """,
)
def q_agg_groupby(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q1 shape: grouped hash aggregate with 8 aggregates.

    At 100 TB this is the canonical partial-agg + single shuffle on the
    (low-cardinality) group keys — 6 groups, so the final stage is tiny.
    """
    li = load_table(spark, sf_dir, "lineitem")
    disc_price = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        li.filter(F.col("l_shipdate") <= F.lit("2000-12-01").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.round(F.sum("l_quantity"), 4).alias("sum_qty"),
            F.round(F.sum("l_extendedprice"), 4).alias("sum_base_price"),
            F.round(F.sum(disc_price), 4).alias("sum_disc_price"),
            F.round(F.sum(disc_price * (1 + F.col("l_tax"))), 4).alias("sum_charge"),
            F.round(F.avg("l_quantity"), 4).alias("avg_qty"),
            F.round(F.avg("l_extendedprice"), 4).alias("avg_price"),
            F.round(F.avg("l_discount"), 4).alias("avg_disc"),
            F.count(F.lit(1)).alias("count_order"),
        )
    )


@register(
    "q_agg_count_distinct",
    oracle="""
    SELECT l_returnflag,
           COUNT(DISTINCT l_partkey) AS n_parts,
           COUNT(DISTINCT l_suppkey) AS n_supps,
           COUNT(DISTINCT l_orderkey) AS n_orders
    FROM lineitem
    GROUP BY l_returnflag
    """,
)
def q_agg_count_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact multi-column distinct counts (expand + two-phase agg)."""
    li = load_table(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.countDistinct("l_partkey").alias("n_parts"),
        F.countDistinct("l_suppkey").alias("n_supps"),
        F.countDistinct("l_orderkey").alias("n_orders"),
    )


@register(
    "q_agg_approx_distinct",
    oracle="""
    SELECT l_returnflag,
           COUNT(*) AS n_rows,
           TRUE AS parts_est_sane,
           TRUE AS orders_est_sane
    FROM lineitem GROUP BY l_returnflag
    """,
)
def q_agg_approx_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Approximate count-distinct (HyperLogLog++) — the scale path for
    high-cardinality distincts: O(1) memory per group, no expand.

    PRODUCTION plan (VERDICT r13 item 1): one partial-aggregating
    pass, HLL++ sketches only — no exact countDistinct arm (that
    lives in q_agg_approx_distinct_cert). The hash oracle pins the
    exact per-group row counts (free in the same pass) plus two
    sanity flags the estimates must satisfy against them: 1 ≤ est ≤
    9/8 · n_rows (the true distinct count is ≤ n_rows and the rsd =
    0.02 sketch cannot overshoot it by 12.5%; integer arithmetic so
    the flag is engine-exact)."""
    li = load_table(spark, sf_dir, "lineitem")
    sane = lambda approx: (  # noqa: E731
        (F.col(approx) >= 1)
        & (F.col(approx) * 8 <= F.col("n_rows") * 9)
    )
    return (
        li.groupBy("l_returnflag")
        .agg(
            F.approx_count_distinct("l_partkey", rsd=0.02).alias(
                "approx_parts"
            ),
            F.approx_count_distinct("l_orderkey", rsd=0.02).alias(
                "approx_orders"
            ),
            F.count(F.lit(1)).alias("n_rows"),
        )
        .select(
            "l_returnflag",
            "n_rows",
            sane("approx_parts").alias("parts_est_sane"),
            sane("approx_orders").alias("orders_est_sane"),
        )
    )


@register(
    "q_agg_approx_distinct_cert",
    oracle="""
    SELECT l_returnflag,
           COUNT(DISTINCT l_partkey) AS n_parts_exact,
           COUNT(DISTINCT l_orderkey) AS n_orders_exact,
           TRUE AS parts_est_ok,
           TRUE AS orders_est_ok
    FROM lineitem GROUP BY l_returnflag
    """,
)
def q_agg_approx_distinct_cert(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Certification twin of q_agg_approx_distinct (VERDICT r13
    item 1: the exact countDistinct arm is its own registered query
    so the benched production plan stays sketch-only). DuckDB
    recomputes the EXACT distinct counts per group, and the query
    pins flags asserting the HLL++ estimates land within 10% of them
    (rsd=0.02 makes that a 5σ bound — insensitive to fixture
    regeneration). HLL++ state depends only on the SET of hashed
    values, so the flags are order- and partitioning-deterministic; a
    silent sketch regression flips a flag and fails the hash gate."""
    li = load_table(spark, sf_dir, "lineitem")
    est_ok = lambda approx, exact: (  # noqa: E731
        F.abs(F.col(approx) - F.col(exact)) / F.col(exact) <= 0.10
    )
    # The sketch and exact arms run as SEPARATE aggregates joined on
    # the 3-row group key: one agg mixing approx_count_distinct with
    # two countDistinct's makes Catalyst expand every input row 3x and
    # key the partial HLL++ buffers by (flag, partkey/orderkey, gid) —
    # ~1.8M sketch allocations for 3 output rows (8.4 s at sf0.1; this
    # split is 1.3 s with identical output — guide §2.4/§3.1, the join
    # is a broadcast of 3 rows).
    est = li.groupBy("l_returnflag").agg(
        F.approx_count_distinct("l_partkey", rsd=0.02).alias(
            "approx_parts"
        ),
        F.approx_count_distinct("l_orderkey", rsd=0.02).alias(
            "approx_orders"
        ),
    )
    exact = li.groupBy("l_returnflag").agg(
        F.countDistinct("l_partkey").alias("n_parts_exact"),
        F.countDistinct("l_orderkey").alias("n_orders_exact"),
    )
    return (
        exact.join(F.broadcast(est), "l_returnflag")
        .select(
            "l_returnflag",
            "n_parts_exact",
            "n_orders_exact",
            est_ok("approx_parts", "n_parts_exact").alias("parts_est_ok"),
            est_ok("approx_orders", "n_orders_exact").alias(
                "orders_est_ok"
            ),
        )
    )


@register(
    "q_agg_grouping_sets",
    oracle="""
    SELECT COALESCE(l_returnflag, 'ALL') AS rf,
           COALESCE(l_linestatus, 'ALL') AS ls,
           ROUND(SUM(l_quantity), 4) AS sum_qty,
           COUNT(*) AS n
    FROM lineitem
    GROUP BY ROLLUP (l_returnflag, l_linestatus)
    """,
)
def q_agg_grouping_sets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ROLLUP hierarchy (detail → per-flag → grand total); rollup nulls
    made hash-stable via COALESCE sentinels."""
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.rollup("l_returnflag", "l_linestatus")
        .agg(F.round(F.sum("l_quantity"), 4).alias("sum_qty"), F.count(F.lit(1)).alias("n"))
        .select(
            F.coalesce("l_returnflag", F.lit("ALL")).alias("rf"),
            F.coalesce("l_linestatus", F.lit("ALL")).alias("ls"),
            "sum_qty",
            "n",
        )
    )


@register(
    "q_agg_cube",
    oracle="""
    SELECT COALESCE(l_returnflag, 'ALL') AS rf,
           COALESCE(l_linestatus, 'ALL') AS ls,
           ROUND(SUM(l_extendedprice), 4) AS sum_price,
           COUNT(*) AS n
    FROM lineitem
    GROUP BY CUBE (l_returnflag, l_linestatus)
    """,
)
def q_agg_cube(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUBE (all 2^k grouping combinations, incl. the per-linestatus
    margin ROLLUP omits); one Expand + one hash aggregate, cube nulls
    made hash-stable via COALESCE sentinels (the group columns are
    never null in the data)."""
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.cube("l_returnflag", "l_linestatus")
        .agg(
            F.round(F.sum("l_extendedprice"), 4).alias("sum_price"),
            F.count(F.lit(1)).alias("n"),
        )
        .select(
            F.coalesce("l_returnflag", F.lit("ALL")).alias("rf"),
            F.coalesce("l_linestatus", F.lit("ALL")).alias("ls"),
            "sum_price",
            "n",
        )
    )


@register(
    "q_sample_hash",
    oracle="""
    SELECT doc_id, lang, n_chars
    FROM documents
    WHERE SUBSTR(md5(text), 1, 1) IN ('0', '1', '2', '3')
    """,
)
def q_sample_hash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic ~25% sample by content hash (md5 prefix bucket) —
    the reproducible sampling pattern for experiments over a mutable
    100 TB corpus: membership depends only on row content, never on
    partitioning, row order, or a seed's engine-specific RNG (md5 is
    bit-identical across engines, unlike TABLESAMPLE)."""
    d = load_table(spark, sf_dir, "documents")
    return d.filter(
        F.substring(F.md5("text"), 1, 1).isin("0", "1", "2", "3")
    ).select("doc_id", "lang", "n_chars")


@register(
    "q_agg_stats",
    oracle="""
    SELECT ROUND(var_pop(l_quantity), 4) AS var_pop_qty,
           ROUND(var_samp(l_quantity), 4) AS var_samp_qty,
           ROUND(stddev_pop(l_extendedprice), 4) AS stddev_pop_price,
           ROUND(covar_pop(l_quantity, l_extendedprice), 4) AS covar_pop_qp,
           ROUND(covar_samp(l_quantity, l_extendedprice), 4) AS covar_samp_qp,
           ROUND(corr(l_quantity, l_extendedprice), 4) AS corr_qp
    FROM lineitem
    """,
)
def q_agg_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Statistical aggregates: variance / stddev / covariance / corr."""
    li = load_table(spark, sf_dir, "lineitem")
    return li.agg(
        F.round(F.var_pop("l_quantity"), 4).alias("var_pop_qty"),
        F.round(F.var_samp("l_quantity"), 4).alias("var_samp_qty"),
        F.round(F.stddev_pop("l_extendedprice"), 4).alias("stddev_pop_price"),
        F.round(F.covar_pop("l_quantity", "l_extendedprice"), 4).alias("covar_pop_qp"),
        F.round(F.covar_samp("l_quantity", "l_extendedprice"), 4).alias("covar_samp_qp"),
        F.round(F.corr("l_quantity", "l_extendedprice"), 4).alias("corr_qp"),
    )


@register(
    "q_agg_percentile",
    oracle="""
    SELECT l_returnflag,
           ROUND(quantile_cont(l_extendedprice, 0.5), 4) AS median_price,
           ROUND(quantile_cont(l_extendedprice, 0.9), 4) AS p90_price,
           ROUND(quantile_cont(l_quantity, 0.25), 4) AS p25_qty
    FROM lineitem
    GROUP BY l_returnflag
    """,
)
def q_agg_percentile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact interpolated percentiles per group (Spark `percentile` ==
    DuckDB `quantile_cont`: both interpolate at rank (n−1)·p)."""
    li = load_table(spark, sf_dir, "lineitem")
    # ONE percentile(array(...)) buffer per column: two separate
    # percentile aggregates over l_extendedprice would buffer every
    # group's values twice (the q_sketch_kll lesson applied here)
    return (
        li.groupBy("l_returnflag")
        .agg(
            F.percentile(
                "l_extendedprice", F.array(F.lit(0.5), F.lit(0.9))
            ).alias("pp"),
            F.round(F.percentile("l_quantity", 0.25), 4).alias("p25_qty"),
        )
        .select(
            "l_returnflag",
            F.round(F.element_at("pp", 1), 4).alias("median_price"),
            F.round(F.element_at("pp", 2), 4).alias("p90_price"),
            "p25_qty",
        )
    )


@register(
    "q_agg_string_agg",
    oracle="""
    SELECT n_regionkey,
           string_agg(n_name, ',' ORDER BY n_name) AS names,
           COUNT(*) AS n
    FROM nation
    GROUP BY n_regionkey
    """,
)
def q_agg_string_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered string aggregation (collect_list → sort_array →
    concat_ws: deterministic despite shuffle row order)."""
    n = load_table(spark, sf_dir, "nation")
    return n.groupBy("n_regionkey").agg(
        F.concat_ws(",", F.sort_array(F.collect_list("n_name"))).alias("names"),
        F.count(F.lit(1)).alias("n"),
    )


@register(
    "q_agg_bool",
    oracle="""
    SELECT o_orderpriority,
           bool_and(o_totalprice > 10000) AS all_over_10k,
           bool_or(o_totalprice > 450000) AS any_over_450k,
           COUNT(*) AS n
    FROM orders
    GROUP BY o_orderpriority
    """,
)
def q_agg_bool(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Boolean aggregates (every/any): grouped universally/existentially
    quantified predicates."""
    o = load_table(spark, sf_dir, "orders")
    return o.groupBy("o_orderpriority").agg(
        F.bool_and(F.col("o_totalprice") > 10000).alias("all_over_10k"),
        F.bool_or(F.col("o_totalprice") > 450000).alias("any_over_450k"),
        F.count(F.lit(1)).alias("n"),
    )


@register(
    "q_agg_rollup",
    oracle="""
    SELECT COALESCE(l_returnflag, 'ALL') AS rf,
           COALESCE(l_linestatus, 'ALL') AS ls,
           ROUND(SUM(l_extendedprice), 4) AS sum_price,
           COUNT(*) AS n
    FROM lineitem
    GROUP BY ROLLUP (l_returnflag, l_linestatus)
    """,
)
def q_agg_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ROLLUP (hierarchical margins only — completes the GROUPING
    SETS / CUBE / ROLLUP trio): one Expand + one hash aggregate, same
    COALESCE sentinel hygiene as q_agg_cube."""
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.rollup("l_returnflag", "l_linestatus")
        .agg(
            F.round(F.sum("l_extendedprice"), 4).alias("sum_price"),
            F.count(F.lit(1)).alias("n"),
        )
        .select(
            F.coalesce("l_returnflag", F.lit("ALL")).alias("rf"),
            F.coalesce("l_linestatus", F.lit("ALL")).alias("ls"),
            "sum_price",
            "n",
        )
    )


@register(
    "q_sample_stratified",
    oracle="""
    SELECT doc_id, lang, n_chars FROM (
        SELECT doc_id, lang, n_chars,
               ROW_NUMBER() OVER (PARTITION BY lang
                                  ORDER BY md5(text), doc_id) AS rn
        FROM documents
    ) WHERE rn <= 20
    """,
)
def q_sample_stratified(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stratified sampling: exactly min(20, |stratum|) documents per
    language, chosen by content-hash order (md5 is bit-identical
    across engines; doc_id breaks ties) — the equal-representation
    companion to q_sample_hash's uniform content-hash sample. One
    window over the stratum key; at 100 TB a rank-based stratified
    sample is a single shuffle on the stratum, with no RNG state to
    coordinate across executors and full reproducibility under
    re-partitioning and retries."""
    d = load_table(spark, sf_dir, "documents")
    w = W.partitionBy("lang").orderBy(F.md5("text"), "doc_id")
    return (
        d.select("doc_id", "lang", "n_chars", F.row_number().over(w).alias("rn"))
        .filter(F.col("rn") <= 20)
        .select("doc_id", "lang", "n_chars")
    )


@register(
    "q_agg_moments",
    oracle="""
    WITH m AS (
        SELECT l_returnflag,
               COUNT(*) AS n,
               AVG(l_quantity) AS mu,
               SUM(l_quantity) AS s1,
               SUM(l_quantity * l_quantity) AS s2,
               SUM(l_quantity * l_quantity * l_quantity) AS s3,
               SUM(l_quantity * l_quantity * l_quantity * l_quantity) AS s4
        FROM lineitem GROUP BY l_returnflag
    )
    SELECT l_returnflag, n,
           CAST(FLOOR((s2 / n - mu * mu) * 10000 + 0.5) AS BIGINT)
               AS var_pop_e4,
           CAST(FLOOR((s3 / n - 3 * mu * s2 / n + 2 * mu * mu * mu)
                 / POWER(s2 / n - mu * mu, 1.5) * 10000 + 0.5) AS BIGINT)
               AS skew_pop_e4,
           CAST(FLOOR(((s4 / n - 4 * mu * s3 / n + 6 * mu * mu * s2 / n
                  - 3 * mu * mu * mu * mu)
                 / POWER(s2 / n - mu * mu, 2) - 3) * 10000 + 0.5) AS BIGINT)
               AS kurt_excess_e4
    FROM m
    """,
)
def q_agg_moments(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Higher-moment statistics (population skewness + excess
    kurtosis) from explicit power sums — NOT the engines' built-in
    skewness()/kurtosis(), whose sample-vs-population definitions
    differ across engines; raw moments are mergeable partials (the
    same algebra as the flagship's sufficient statistics, one
    map-side-combined aggregate), so this is also the distributed /
    incremental form: partials merge by plain SUM. Both engines run
    the identical moment arithmetic, and the three statistics land as
    floor-scaled e4 integers rather than ROUND(x, 4): s2..s4 grow to
    ~1e13 so summation-order differences can flip ROUND's midpoint
    4th decimal across engines (q_ts_interpolate determinism note)."""
    li = load_table(spark, sf_dir, "lineitem")
    q = F.col("l_quantity")
    m = li.groupBy("l_returnflag").agg(
        F.count(F.lit(1)).alias("n"),
        F.avg(q).alias("mu"),
        F.sum(q).alias("s1"),
        F.sum(q * q).alias("s2"),
        F.sum(q * q * q).alias("s3"),
        F.sum(q * q * q * q).alias("s4"),
    )
    n, mu = F.col("n"), F.col("mu")
    var = F.col("s2") / n - mu * mu
    skew = (F.col("s3") / n - 3 * mu * F.col("s2") / n + 2 * mu * mu * mu) / F.pow(
        var, 1.5
    )
    kurt = (
        F.col("s4") / n
        - 4 * mu * F.col("s3") / n
        + 6 * mu * mu * F.col("s2") / n
        - 3 * mu * mu * mu * mu
    ) / F.pow(var, 2) - 3
    def _e4(c: Column, name: str) -> Column:
        return F.floor(c * 10000 + F.lit(0.5)).cast("long").alias(name)

    return m.select(
        "l_returnflag",
        "n",
        _e4(var, "var_pop_e4"),
        _e4(skew, "skew_pop_e4"),
        _e4(kurt, "kurt_excess_e4"),
    )
