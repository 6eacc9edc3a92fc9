"""Joins (SURVEY.md §2.2 C).

Strategy notes for 100 TB:
- dim⋈dim and fact⋈small-dim go broadcast (`F.broadcast` / AQE
  auto-broadcast) — zero shuffle.
- fact⋈fact equi joins shuffle on the join key; `shuffle_hash` avoids
  the sort when one side fits per-partition memory, `merge` is the
  robust spill-safe default.
- The range join avoids the O(n²) nested-loop by bucketizing the time
  axis and equi-joining on the bucket (each probe row explodes to the
  2 candidate buckets), keeping the quadratic work within ±1 bucket.
- The as-of join is join-then-window (row_number()=1 over event time
  descending) — per-key bounded state, the shape Spark plans well.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import Window as W
from pyspark.sql import functions as F

from meta_iterative_mapreduce_spark.io import load_table
from meta_iterative_mapreduce_spark.registry import register
from meta_iterative_mapreduce_spark.functions.time import ts_us


@register(
    "q_join_broadcast",
    oracle="""
    SELECT n.n_nationkey, n.n_name, r.r_name
    FROM nation n JOIN region r ON n.n_regionkey = r.r_regionkey
    """,
)
def q_join_broadcast(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Broadcast hash join: tiny dim broadcast to every task, no shuffle."""
    n = load_table(spark, sf_dir, "nation")
    r = load_table(spark, sf_dir, "region")
    return n.join(F.broadcast(r), n.n_regionkey == r.r_regionkey).select(
        "n_nationkey", "n_name", "r_name"
    )


@register(
    "q_join_shuffle_hash",
    oracle="""
    SELECT l.l_orderkey, l.l_linenumber, o.o_orderstatus, o.o_totalprice
    FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
    """,
)
def q_join_shuffle_hash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Large⋈medium equi join, hinted shuffle-hash (skips the sort;
    right side builds per-partition hash tables)."""
    li = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders").hint("shuffle_hash")
    return li.join(o, li.l_orderkey == o.o_orderkey).select(
        "l_orderkey", "l_linenumber", "o_orderstatus", "o_totalprice"
    )


@register(
    "q_join_sort_merge",
    oracle="""
    SELECT l.l_orderkey, l.l_linenumber, p.p_brand, p.p_retailprice
    FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
    WHERE p.p_size >= 25
    """,
)
def q_join_sort_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sort-merge equi join (spill-safe default for fact⋈fact at scale)."""
    li = load_table(spark, sf_dir, "lineitem")
    p = load_table(spark, sf_dir, "part").filter(F.col("p_size") >= 25).hint("merge")
    return li.join(p, li.l_partkey == p.p_partkey).select(
        "l_orderkey", "l_linenumber", "p_brand", "p_retailprice"
    )


@register(
    "q_join_outer",
    oracle="""
    SELECT c.c_custkey, c.c_acctbal, o.o_orderkey, o.o_totalprice
    FROM customer c
    LEFT JOIN orders o
      ON c.c_custkey = o.o_custkey AND o.o_totalprice > 400000
    """,
)
def q_join_outer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Left outer join with a compound join condition — customers whose
    orders all fall below the threshold surface with NULL order columns."""
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders")
    return c.join(
        o,
        (c.c_custkey == o.o_custkey) & (o.o_totalprice > 400000),
        "left",
    ).select("c_custkey", "c_acctbal", "o_orderkey", "o_totalprice")


@register(
    "q_join_outer_full",
    oracle="""
    SELECT COALESCE(c.custkey, o.o_custkey) AS custkey,
           c.c_acctbal, o.o_orderkey, o.o_totalprice
    FROM (SELECT c_custkey AS custkey, c_acctbal FROM customer WHERE c_acctbal < 0) c
    FULL OUTER JOIN
         (SELECT o_custkey, o_orderkey, o_totalprice FROM orders
          WHERE o_totalprice > 400000) o
      ON c.custkey = o.o_custkey
    """,
)
def q_join_outer_full(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full outer join of two filtered keysets (unmatched on both sides)."""
    c = (
        load_table(spark, sf_dir, "customer")
        .filter(F.col("c_acctbal") < 0)
        .select(F.col("c_custkey").alias("custkey"), "c_acctbal")
    )
    o = (
        load_table(spark, sf_dir, "orders")
        .filter(F.col("o_totalprice") > 400000)
        .select("o_custkey", "o_orderkey", "o_totalprice")
    )
    return c.join(o, c.custkey == o.o_custkey, "full").select(
        F.coalesce("custkey", "o_custkey").alias("custkey"),
        "c_acctbal",
        "o_orderkey",
        "o_totalprice",
    )


@register(
    "q_join_semi",
    oracle="""
    SELECT c_custkey, c_name
    FROM customer c
    WHERE EXISTS (SELECT 1 FROM orders o
                  WHERE o.o_custkey = c.c_custkey AND o.o_totalprice > 400000)
    """,
)
def q_join_semi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Left semi join (EXISTS): emits each matching left row once."""
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders").filter(F.col("o_totalprice") > 400000)
    return c.join(o, c.c_custkey == o.o_custkey, "left_semi").select(
        "c_custkey", "c_name"
    )


@register(
    "q_join_anti",
    oracle="""
    SELECT c_custkey, c_name
    FROM customer c
    WHERE NOT EXISTS (SELECT 1 FROM orders o
                      WHERE o.o_custkey = c.c_custkey AND o.o_totalprice > 400000)
    """,
)
def q_join_anti(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Left anti join (NOT EXISTS)."""
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders").filter(F.col("o_totalprice") > 400000)
    return c.join(o, c.c_custkey == o.o_custkey, "left_anti").select(
        "c_custkey", "c_name"
    )


@register(
    "q_join_theta_nl",
    oracle="""
    SELECT p.p_partkey, s.s_suppkey, p.p_retailprice, s.s_acctbal
    FROM part p JOIN supplier s ON p.p_retailprice > s.s_acctbal
    WHERE p.p_size = 50
    """,
)
def q_join_theta_nl(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Non-equi (theta) join — broadcast nested loop; the selective
    p_size filter bounds the quadratic work (the only safe shape for
    NL joins at scale)."""
    p = load_table(spark, sf_dir, "part").filter(F.col("p_size") == 50)
    s = load_table(spark, sf_dir, "supplier")
    return p.join(s, p.p_retailprice > s.s_acctbal).select(
        "p_partkey", "s_suppkey", "p_retailprice", "s_acctbal"
    )


@register(
    "q_join_range",
    oracle="""
    SELECT e1.event_id, COUNT(e2.event_id) AS n_next5m
    FROM events e1
    LEFT JOIN events e2
      ON epoch_us(e2.ts) > epoch_us(e1.ts)
     AND epoch_us(e2.ts) <= epoch_us(e1.ts) + 300000000
    GROUP BY e1.event_id
    """,
)
def q_join_range(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Interval/range self-join: events following within 5 minutes.

    Scale path: instead of the O(n²) nested loop a naive BETWEEN join
    plans, bucketize time into 5-minute cells and equi-join on the
    cell id — each left row explodes to its 2 candidate cells, so the
    join is hash-partitioned and the quadratic work is confined to
    adjacent cells. The oracle states the same semantics as a plain
    range join (DuckDB plans it as an IEJoin).
    """
    BUCKET_US = 300_000_000  # 5 minutes in microseconds
    e = load_table(spark, sf_dir, "events").select(
        "event_id", ts_us("ts").alias("us")
    )
    e1 = e.select(
        F.col("event_id"),
        F.col("us").alias("us1"),
        F.explode(
            F.array(
                (F.col("us") / BUCKET_US).cast("long"),
                (F.col("us") / BUCKET_US).cast("long") + 1,
            )
        ).alias("cell"),
    )
    e2 = e.select(
        F.col("event_id").alias("event_id2"),
        F.col("us").alias("us2"),
        (F.col("us") / BUCKET_US).cast("long").alias("cell"),
    )
    joined = e1.join(
        e2,
        (e1.cell == e2.cell)
        & (F.col("us2") > F.col("us1"))
        & (F.col("us2") <= F.col("us1") + BUCKET_US),
        "left",
    )
    return joined.groupBy("event_id").agg(F.count("event_id2").alias("n_next5m"))


@register(
    "q_join_asof",
    oracle="""
    WITH pairs AS (
        SELECT p.event_id, p.user_id,
               epoch_us(p.ts) AS purchase_us, epoch_us(s.ts) AS signup_us,
               ROW_NUMBER() OVER (PARTITION BY p.event_id
                                  ORDER BY epoch_us(s.ts) DESC, s.event_id DESC) AS rn
        FROM (SELECT * FROM events WHERE event_type = 'purchase') p
        LEFT JOIN (SELECT * FROM events WHERE event_type = 'signup') s
          ON s.user_id = p.user_id AND epoch_us(s.ts) <= epoch_us(p.ts)
    )
    SELECT event_id, user_id, purchase_us, signup_us
    FROM pairs WHERE rn = 1
    """,
)
def q_join_asof(spark: SparkSession, sf_dir: str) -> DataFrame:
    """As-of join: for each purchase, the latest signup by the same user
    at or before it (join + row_number()=1 — per-key bounded state)."""
    ev = load_table(spark, sf_dir, "events")
    p = ev.filter(F.col("event_type") == "purchase").select(
        "event_id", "user_id", F.col("ts").alias("p_ts")
    )
    s = ev.filter(F.col("event_type") == "signup").select(
        F.col("event_id").alias("s_event_id"),
        F.col("user_id").alias("s_user_id"),
        F.col("ts").alias("s_ts"),
    )
    joined = p.join(
        s, (s.s_user_id == p.user_id) & (s.s_ts <= p.p_ts), "left"
    )
    w = W.partitionBy("event_id").orderBy(
        F.col("s_ts").desc(), F.col("s_event_id").desc()
    )
    return (
        joined.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select(
            "event_id",
            "user_id",
            ts_us("p_ts").alias("purchase_us"),
            ts_us("s_ts").alias("signup_us"),
        )
    )


@register(
    "q_join_null_safe",
    oracle="""
    SELECT l.l_orderkey, l.l_linenumber, r.r_cnt
    FROM (SELECT l_orderkey, l_linenumber,
                 NULLIF(l_discount, 0.0) AS d FROM lineitem
          WHERE l_quantity < 3) l
    JOIN (SELECT NULLIF(l_discount, 0.0) AS d, COUNT(*) AS r_cnt
          FROM lineitem GROUP BY 1) r
      ON l.d IS NOT DISTINCT FROM r.d
    """,
)
def q_join_null_safe(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Null-safe equality join (<=> / IS NOT DISTINCT FROM): NULL keys
    match each other instead of vanishing — the semantics regular
    equi-joins silently drop."""
    li = load_table(spark, sf_dir, "lineitem")
    d = F.nullif(F.col("l_discount"), F.lit(0.0))
    left = li.filter(F.col("l_quantity") < 3).select(
        "l_orderkey", "l_linenumber", d.alias("d")
    )
    right = li.groupBy(d.alias("rd")).agg(F.count(F.lit(1)).alias("r_cnt"))
    return left.join(right, left.d.eqNullSafe(right.rd)).select(
        "l_orderkey", "l_linenumber", "r_cnt"
    )


@register(
    "q_join_asof_nearest",
    oracle="""
    WITH pairs AS (
        SELECT p.event_id, p.user_id,
               epoch_us(p.ts) AS purchase_us, epoch_us(s.ts) AS signup_us,
               ROW_NUMBER() OVER (
                   PARTITION BY p.event_id
                   ORDER BY ABS(epoch_us(s.ts) - epoch_us(p.ts)),
                            epoch_us(s.ts), s.event_id) AS rn
        FROM (SELECT * FROM events WHERE event_type = 'purchase') p
        LEFT JOIN (SELECT * FROM events WHERE event_type = 'signup') s
          ON s.user_id = p.user_id
    )
    SELECT event_id, user_id, purchase_us, signup_us
    FROM pairs WHERE rn = 1
    """,
)
def q_join_asof_nearest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """As-of join, NEAREST direction (pandas merge_asof
    direction='nearest'): for each purchase, the same user's signup
    closest in time on either side — ties break toward the earlier
    signup, then event_id, so the pick is total. Same bounded plan
    shape as q_join_asof (user-keyed join + per-purchase rank-1):
    candidate sets are per-user event counts, never data-sized."""
    ev = load_table(spark, sf_dir, "events")
    p = ev.filter(F.col("event_type") == "purchase").select(
        "event_id", "user_id", F.col("ts").alias("p_ts")
    )
    s = ev.filter(F.col("event_type") == "signup").select(
        F.col("event_id").alias("s_event_id"),
        F.col("user_id").alias("s_user_id"),
        F.col("ts").alias("s_ts"),
    )
    joined = p.join(s, s.s_user_id == p.user_id, "left")
    w = W.partitionBy("event_id").orderBy(
        F.abs(ts_us("s_ts") - ts_us("p_ts")).asc_nulls_last(),
        ts_us("s_ts"),
        "s_event_id",
    )
    return (
        joined.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select(
            "event_id",
            "user_id",
            ts_us("p_ts").alias("purchase_us"),
            ts_us("s_ts").alias("signup_us"),
        )
    )


# Interval-overlap join: bin width = 1 hour of microseconds. Each
# interval explodes to the hour bins it touches (bounded by max
# duration / 1 h + 1 ≈ 9 for this fixture); overlapping pairs are
# counted ONLY in the canonical bin containing the later start — a
# point both intervals contain, so blocking is exact with no
# dropDuplicates exchange.
_IV_BIN_US = 3_600_000_000


@register(
    "q_join_interval_overlap",
    oracle="""
    WITH iv AS (
        SELECT event_id, user_id, epoch_us(ts) AS s,
               epoch_us(ts) + CAST(ROUND(value * 60000000) AS BIGINT) AS e
        FROM events
    )
    SELECT a.user_id, a.event_id AS ev_a, b.event_id AS ev_b,
           LEAST(a.e, b.e) - GREATEST(a.s, b.s) AS overlap_us
    FROM iv a JOIN iv b
      ON a.user_id = b.user_id AND a.event_id < b.event_id
     AND a.s < b.e AND b.s < a.e
    """,
)
def q_join_interval_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Interval-overlap self join (both sides are spans — the
    genomics / time-span shape that q_join_range's point-in-range
    bucketing does not cover): events become intervals
    [ts, ts + value minutes]; find all same-user overlapping pairs
    and their overlap length. The oracle is the brute-force theta
    join; the Spark side explodes each interval to the hour bins it
    touches and equi-joins on (user_id, bin) — ONE shuffle whose
    fan-out is bounded by interval_length/bin + 1, never n² —
    with the exact canonical-bin dedup (bin of GREATEST(a.s, b.s),
    a point inside both intervals) so no pair is emitted twice.
    At 100 TB the bin width is tuned to the duration distribution;
    a long-tail interval cap or a two-level bin hierarchy bounds
    hub intervals."""
    ev = load_table(spark, sf_dir, "events")
    iv = ev.select(
        "event_id",
        "user_id",
        ts_us("ts").alias("s"),
        (ts_us("ts") + F.round(F.col("value") * 60_000_000).cast("long")).alias("e"),
    )
    return interval_overlap_pairs(iv)


def interval_overlap_pairs(
    iv: DataFrame, bin_us: int = _IV_BIN_US
) -> DataFrame:
    """Bin-blocked interval-overlap self join over (event_id, user_id,
    s, e) interval rows — see q_join_interval_overlap. Bin indices use
    integer `div` (not FP division) so boundary bins are exact at any
    epoch magnitude."""
    binned = iv.withColumn(
        "bin",
        F.explode(
            F.sequence(
                F.expr(f"s div {bin_us}"),
                F.expr(f"e div {bin_us}"),
            )
        ),
    )
    a, b = binned.alias("a"), binned.alias("b")
    canonical_bin = F.expr(f"greatest(a.s, b.s) div {bin_us}")
    return (
        a.join(
            b,
            (F.col("a.user_id") == F.col("b.user_id"))
            & (F.col("a.bin") == F.col("b.bin"))
            & (F.col("a.event_id") < F.col("b.event_id"))
            & (F.col("a.s") < F.col("b.e"))
            & (F.col("b.s") < F.col("a.e"))
            & (F.col("a.bin") == canonical_bin),
        )
        .select(
            F.col("a.user_id").alias("user_id"),
            F.col("a.event_id").alias("ev_a"),
            F.col("b.event_id").alias("ev_b"),
            (
                F.least(F.col("a.e"), F.col("b.e"))
                - F.greatest(F.col("a.s"), F.col("b.s"))
            ).alias("overlap_us"),
        )
    )
