"""Deterministic batch forms of the streaming operators (SURVEY.md §2.2 I).

Each windowed-aggregation semantics is implemented twice: the real
Structured Streaming jobs live in `streaming.jobs`; these batch twins
compute identical results on the same events table and are what the
DuckDB oracle checks. Window identities are epoch-microsecond bucket
starts (bigint) — engine-neutral, no timestamp hashing hazards.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import Window as W
from pyspark.sql import functions as F

from meta_iterative_mapreduce_spark.io import load_table
from meta_iterative_mapreduce_spark.registry import register
from meta_iterative_mapreduce_spark.functions.time import ts_us

_5M = 300_000_000  # 5 minutes in µs
_10M = 600_000_000
_30M = 1_800_000_000


@register(
    "q_stream_tumbling",
    oracle=f"""
    SELECT (epoch_us(ts) // {_5M}) * {_5M} AS win_start_us,
           event_type,
           COUNT(*) AS n,
           ROUND(SUM(value), 4) AS sum_value
    FROM events
    GROUP BY 1, 2
    """,
)
def q_stream_tumbling(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tumbling 5-minute window aggregate (batch twin of
    `F.window(ts, '5 minutes')` — same bucketing arithmetic)."""
    e = load_table(spark, sf_dir, "events")
    win = (ts_us("ts") / _5M).cast("long") * _5M
    return (
        e.groupBy(win.alias("win_start_us"), "event_type")
        .agg(F.count(F.lit(1)).alias("n"), F.round(F.sum("value"), 4).alias("sum_value"))
    )


@register(
    "q_stream_sliding",
    oracle=f"""
    WITH exploded AS (
        SELECT unnest([ (epoch_us(ts) // {_5M}) * {_5M} - {_5M},
                        (epoch_us(ts) // {_5M}) * {_5M} ]) AS win_start_us,
               event_type, value
        FROM events
    )
    SELECT win_start_us, event_type, COUNT(*) AS n,
           ROUND(SUM(value), 4) AS sum_value
    FROM exploded
    GROUP BY 1, 2
    """,
)
def q_stream_sliding(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sliding window (10-minute length, 5-minute slide): each event
    belongs to exactly 2 windows, materialized by exploding the two
    window starts (the same expansion `F.window(ts, '10m', '5m')`
    performs internally)."""
    e = load_table(spark, sf_dir, "events")
    base = (ts_us("ts") / _5M).cast("long") * _5M
    return (
        e.select(
            F.explode(F.array(base - _5M, base)).alias("win_start_us"),
            "event_type",
            "value",
        )
        .groupBy("win_start_us", "event_type")
        .agg(F.count(F.lit(1)).alias("n"), F.round(F.sum("value"), 4).alias("sum_value"))
    )


@register(
    "q_stream_session",
    oracle=f"""
    WITH ordered AS (
        SELECT user_id, event_id, value, epoch_us(ts) AS us,
               LAG(epoch_us(ts)) OVER
                   (PARTITION BY user_id ORDER BY epoch_us(ts), event_id)
                   AS prev_us
        FROM events
    ), flagged AS (
        SELECT *, CASE WHEN prev_us IS NULL
                         OR us - prev_us > {_30M} THEN 1 ELSE 0 END AS new_sess
        FROM ordered
    ), sessioned AS (
        SELECT *, CAST(SUM(new_sess) OVER
                   (PARTITION BY user_id ORDER BY us, event_id
                    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                   AS BIGINT) AS sess_idx
        FROM flagged
    )
    SELECT user_id, sess_idx,
           MIN(us) AS sess_start_us,
           MAX(us) AS sess_end_us,
           COUNT(*) AS n_events,
           ROUND(SUM(value), 4) AS sum_value
    FROM sessioned
    GROUP BY user_id, sess_idx
    """,
)
def q_stream_session(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Session windows (30-minute inactivity gap) per user — the
    gaps-and-islands form: lag → new-session flag → running sum as
    session index → per-session aggregate. Batch twin of
    `F.session_window(ts, '30 minutes')`. Gap semantics pinned as
    strictly-greater-than on both sides."""
    e = load_table(spark, sf_dir, "events")
    w = W.partitionBy("user_id").orderBy("us", "event_id")
    ordered = e.select(
        "user_id", "event_id", "value", ts_us("ts").alias("us")
    ).withColumn("prev_us", F.lag("us").over(w))
    flagged = ordered.withColumn(
        "new_sess",
        F.when(
            F.col("prev_us").isNull() | (F.col("us") - F.col("prev_us") > _30M), 1
        ).otherwise(0),
    )
    sessioned = flagged.withColumn(
        "sess_idx",
        F.sum("new_sess").over(w.rowsBetween(W.unboundedPreceding, W.currentRow)),
    )
    return sessioned.groupBy("user_id", "sess_idx").agg(
        F.min("us").alias("sess_start_us"),
        F.max("us").alias("sess_end_us"),
        F.count(F.lit(1)).alias("n_events"),
        F.round(F.sum("value"), 4).alias("sum_value"),
    )


@register(
    "q_stream_join",
    oracle=f"""
    WITH c AS (
        SELECT user_id, event_id AS click_id, epoch_us(ts) AS us_c
        FROM events WHERE event_type = 'click'
    ), p AS (
        SELECT user_id, event_id AS purchase_id, epoch_us(ts) AS us_p
        FROM events WHERE event_type = 'purchase'
    )
    SELECT c.user_id, c.click_id, p.purchase_id,
           p.us_p - c.us_c AS gap_us
    FROM c JOIN p ON c.user_id = p.user_id
       AND c.us_c >= p.us_p - {_30M} AND c.us_c <= p.us_p
    """,
)
def q_stream_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Batch twin of the stream-stream interval join
    (streaming.jobs.click_purchase_join): purchases attributed to the
    same user's clicks within the preceding 30 minutes. The range
    predicate rides on the user_id equi-join, so the shuffle is keyed
    and the interval filter is evaluated join-local."""
    e = load_table(spark, sf_dir, "events")
    c = e.filter(F.col("event_type") == "click").select(
        "user_id",
        F.col("event_id").alias("click_id"),
        ts_us("ts").alias("us_c"),
    )
    p = e.filter(F.col("event_type") == "purchase").select(
        F.col("user_id").alias("p_user"),
        F.col("event_id").alias("purchase_id"),
        ts_us("ts").alias("us_p"),
    )
    return (
        c.join(
            p,
            (F.col("user_id") == F.col("p_user"))
            & (F.col("us_c") >= F.col("us_p") - _30M)
            & (F.col("us_c") <= F.col("us_p")),
        )
        .select(
            "user_id",
            "click_id",
            "purchase_id",
            (F.col("us_p") - F.col("us_c")).alias("gap_us"),
        )
    )


@register(
    "q_stream_enrich",
    oracle="""
    SELECT e.event_id, e.user_id, c.c_mktsegment,
           COUNT(*) OVER (PARTITION BY c.c_mktsegment) AS n_in_segment
    FROM events e JOIN customer c ON e.user_id = c.c_custkey
    """,
)
def q_stream_enrich(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Batch twin of the stream-static dimension enrichment
    (streaming/jobs.py::enrich_with_dim, e2e-tested against this
    shape): every event joined to its customer dim row, plus a
    per-segment count. In the streaming plan the dim side is
    re-planned per micro-batch and auto-broadcast — no state store,
    the cheapest streaming join tier."""
    e = load_table(spark, sf_dir, "events").select("event_id", "user_id")
    c = load_table(spark, sf_dir, "customer").select(
        "c_custkey", "c_mktsegment"
    )
    joined = e.join(c, e.user_id == c.c_custkey).drop("c_custkey")
    from pyspark.sql import Window as W

    return joined.withColumn(
        "n_in_segment",
        F.count(F.lit(1)).over(W.partitionBy("c_mktsegment")),
    )


@register(
    "q_stream_join_outer",
    oracle=f"""
    WITH c AS (
        SELECT user_id, event_id AS click_id, epoch_us(ts) AS us_c
        FROM events WHERE event_type = 'click'
    ), p AS (
        SELECT user_id AS p_user, event_id AS purchase_id,
               epoch_us(ts) AS us_p
        FROM events WHERE event_type = 'purchase'
    ), wm AS (
        SELECT LEAST((SELECT MAX(us_c) FROM c),
                     (SELECT MAX(us_p) FROM p)) - {_10M} AS w
    )
    SELECT c.user_id, c.click_id, p.purchase_id,
           p.us_p - c.us_c AS gap_us
    FROM c LEFT JOIN p ON c.user_id = p.p_user
       AND c.us_c >= p.us_p - {_30M} AND c.us_c <= p.us_p, wm
    WHERE p.purchase_id IS NOT NULL OR c.us_c + {_30M} < wm.w
    """,
)
def q_stream_join_outer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Batch twin of the LEFT OUTER stream-stream interval join
    (streaming.jobs.click_purchase_join_outer, e2e-tested against this
    shape): matched click-purchase pairs inline, PLUS null-purchase
    rows for clicks the stream's state eviction proves unmatched —
    exactly those whose 30-minute match horizon closed before the
    terminal watermark min(max_click, max_purchase) - 10min; the open
    tail is withheld, because the stream would still be holding its
    state (the session-timer twin's terminal-watermark convention
    applied to outer joins). The watermark is a 1-row broadcast; the
    emission rule is an integer-µs comparison — no float hazards."""
    e = load_table(spark, sf_dir, "events")
    c = e.filter(F.col("event_type") == "click").select(
        "user_id",
        F.col("event_id").alias("click_id"),
        ts_us("ts").alias("us_c"),
    )
    p = e.filter(F.col("event_type") == "purchase").select(
        F.col("user_id").alias("p_user"),
        F.col("event_id").alias("purchase_id"),
        ts_us("ts").alias("us_p"),
    )
    wm = c.agg(F.max("us_c").alias("mc")).crossJoin(
        p.agg(F.max("us_p").alias("mp"))
    ).select((F.least("mc", "mp") - _10M).alias("w"))
    lj = c.join(
        p,
        (F.col("user_id") == F.col("p_user"))
        & (F.col("us_c") >= F.col("us_p") - _30M)
        & (F.col("us_c") <= F.col("us_p")),
        "left",
    ).crossJoin(F.broadcast(wm))
    return lj.filter(
        F.col("purchase_id").isNotNull()
        | (F.col("us_c") + _30M < F.col("w"))
    ).select(
        "user_id",
        "click_id",
        "purchase_id",
        (F.col("us_p") - F.col("us_c")).alias("gap_us"),
    )


@register(
    "q_stream_dedup",
    oracle="""
    SELECT event_type, COUNT(*) AS n,
           CAST(SUM(event_id) AS BIGINT) AS sum_id,
           CAST(SUM(CAST(FLOOR(value * 10000 + 0.5) AS BIGINT)) AS BIGINT)
               AS sum_value_e4
    FROM events GROUP BY event_type
    """,
)
def q_stream_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Batch twin of watermarked streaming deduplication
    (streaming.jobs.dedup_stream — dropDuplicatesWithinWatermark on
    event_id, the at-least-once-delivery repair every ingestion
    pipeline needs): the input is the event stream with a deliberately
    REDELIVERED subset (event_id % 7 = 0 arrives twice), the dedup
    keeps one copy per id, and the oracle recomputes per-type exact
    integer aggregates from the dup-free table — doubled rows break
    n, sum_id, and sum_value_e4 at once. State stays bounded in the
    stream because ids older than the watermark horizon expire."""
    e = load_table(spark, sf_dir, "events").select(
        "event_id", "event_type", "value"
    )
    redelivered = e.filter(F.col("event_id") % 7 == 0)
    doubled = e.unionByName(redelivered)
    deduped = doubled.dropDuplicates(["event_id"])
    return deduped.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("event_id").cast("bigint").alias("sum_id"),
        F.sum(
            F.floor(F.col("value") * 10000 + F.lit(0.5)).cast("bigint")
        )
        .cast("bigint")
        .alias("sum_value_e4"),
    )
