"""Time-series operators over the events stream: sessionization,
OHLC downsampling, and rolling-window anomaly detection.

These are the batch time-series workloads a training-data/event
pipeline runs daily. All three are single-exchange-per-key shapes:
every window partitions on `user_id` (or `user_id, bucket`), so one
hash exchange colocates a user's history and the windows + final
aggregates ride that partitioning. The reference's only notion of
time was iteration count (kernel.cu:135-217); these give the engine
real event-time semantics on the batch side, complementing the
streaming tumbling/sliding/session analogs.

Determinism hygiene (SURVEY.md §2.2): rows inside a user's series are
totally ordered by (epoch_us, event_id) — event_id breaks equal-µs
ties identically in both engines; floats that cross a multi-row
aggregate are ROUNDed at the final projection only.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import Window as W
from pyspark.sql import functions as F

from meta_iterative_mapreduce_spark.io import load_table
from meta_iterative_mapreduce_spark.registry import register
from meta_iterative_mapreduce_spark.functions.time import ts_us

_GAP_US = 30 * 60 * 1_000_000  # 30-minute session gap
_HOUR_US = 3_600_000_000


@register(
    "q_events_sessionize",
    oracle=f"""
    WITH ordered AS (
        SELECT user_id, event_id, epoch_us(ts) AS ts_us, value,
               LAG(epoch_us(ts)) OVER (
                   PARTITION BY user_id ORDER BY epoch_us(ts), event_id
               ) AS prev_us
        FROM events
    ), marked AS (
        SELECT *,
               CASE WHEN prev_us IS NULL
                         OR ts_us - prev_us > {_GAP_US}
                    THEN 1 ELSE 0 END AS is_new
        FROM ordered
    ), sessions AS (
        SELECT *,
               CAST(SUM(is_new) OVER (
                   PARTITION BY user_id ORDER BY ts_us, event_id
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
               ) AS BIGINT) AS session_idx
        FROM marked
    )
    SELECT user_id, session_idx,
           COUNT(*) AS n_events,
           MIN(ts_us) AS start_us,
           MAX(ts_us) AS end_us,
           MAX(ts_us) - MIN(ts_us) AS duration_us,
           ROUND(SUM(value), 4) AS session_value
    FROM sessions
    GROUP BY user_id, session_idx
    """,
)
def q_events_sessionize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Batch sessionization: split each user's event stream into
    sessions at >30-minute inactivity gaps (lag-gap mark + running sum
    of marks = session index), then aggregate per session. The batch
    twin of the streaming session_window analog (q_stream_session),
    expressed purely with windows so it scales as ONE exchange on
    user_id: lag, the running sum, and the final (user_id, session_idx)
    aggregate all reuse the same hash partitioning. Session count per
    user is bounded by event count; no state store, no driver loop."""
    ev = load_table(spark, sf_dir, "events").select(
        "user_id", "event_id", ts_us("ts").alias("ts_us"), "value"
    )
    order = W.partitionBy("user_id").orderBy("ts_us", "event_id")
    marked = ev.withColumn(
        "is_new",
        F.when(
            F.lag("ts_us").over(order).isNull()
            | (F.col("ts_us") - F.lag("ts_us").over(order) > _GAP_US),
            F.lit(1),
        ).otherwise(F.lit(0)),
    )
    sessions = marked.withColumn(
        "session_idx",
        F.sum("is_new").over(order.rowsBetween(W.unboundedPreceding, W.currentRow)),
    )
    return sessions.groupBy("user_id", "session_idx").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.min("ts_us").alias("start_us"),
        F.max("ts_us").alias("end_us"),
        (F.max("ts_us") - F.min("ts_us")).alias("duration_us"),
        F.round(F.sum("value"), 4).alias("session_value"),
    )


@register(
    "q_ts_downsample",
    oracle=f"""
    WITH pts AS (
        SELECT user_id, event_id, value,
               epoch_us(ts) AS ts_us,
               epoch_us(ts) // {_HOUR_US} AS hr
        FROM events
    ), rn AS (
        SELECT *,
               ROW_NUMBER() OVER (PARTITION BY user_id, hr
                                  ORDER BY ts_us, event_id) AS rn_a,
               ROW_NUMBER() OVER (PARTITION BY user_id, hr
                                  ORDER BY ts_us DESC, event_id DESC) AS rn_d
        FROM pts
    )
    SELECT user_id, hr,
           COUNT(*) AS n,
           MAX(CASE WHEN rn_a = 1 THEN value END) AS open,
           MAX(value) AS high,
           MIN(value) AS low,
           MAX(CASE WHEN rn_d = 1 THEN value END) AS close,
           ROUND(SUM(value), 4) AS volume
    FROM rn
    GROUP BY user_id, hr
    """,
)
def q_ts_downsample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """OHLC downsampling (hypertable rollup): resample each user's
    value series into hourly open/high/low/close/volume bars. First
    and last points are picked with row_number over the total order
    (ts_us, event_id) — identical tie-breaking in both engines —
    rather than engine-specific arg_min/arg_max. One exchange on
    (user_id, hr): both window specs share the partitioning (two
    sort-only WindowExecs, no second shuffle) and the bar aggregate
    rides it too. open/high/low/close are per-row doubles copied
    through exactly; only the SUM crosses rows and gets ROUNDed."""
    pts = load_table(spark, sf_dir, "events").select(
        "user_id",
        "event_id",
        "value",
        ts_us("ts").alias("ts_us"),
        (ts_us("ts") / _HOUR_US).cast("long").alias("hr"),
    )
    part = ["user_id", "hr"]
    rn = pts.withColumns(
        {
            "rn_a": F.row_number().over(
                W.partitionBy(*part).orderBy("ts_us", "event_id")
            ),
            "rn_d": F.row_number().over(
                W.partitionBy(*part).orderBy(
                    F.col("ts_us").desc(), F.col("event_id").desc()
                )
            ),
        }
    )
    return rn.groupBy(*part).agg(
        F.count(F.lit(1)).alias("n"),
        F.max(F.when(F.col("rn_a") == 1, F.col("value"))).alias("open"),
        F.max("value").alias("high"),
        F.min("value").alias("low"),
        F.max(F.when(F.col("rn_d") == 1, F.col("value"))).alias("close"),
        F.round(F.sum("value"), 4).alias("volume"),
    )


@register(
    "q_ts_anomaly",
    oracle="""
    WITH pts AS (
        SELECT user_id, event_id, value, epoch_us(ts) AS ts_us
        FROM events
    ), stats AS (
        SELECT *,
               AVG(value) OVER w AS mu,
               STDDEV_SAMP(value) OVER w AS sigma,
               COUNT(*) OVER w AS n_hist
        FROM pts
        WINDOW w AS (PARTITION BY user_id ORDER BY ts_us, event_id
                     ROWS BETWEEN 20 PRECEDING AND 1 PRECEDING)
    )
    SELECT user_id, event_id, ts_us, value,
           ROUND((value - mu) / sigma, 4) AS z
    FROM stats
    WHERE n_hist >= 10 AND sigma > 1e-9
      AND ABS((value - mu) / sigma) > 2.5
    """,
)
def q_ts_anomaly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rolling z-score anomaly detection: score each point against the
    trailing 20-point window of the SAME user (frame excludes the
    current row so the point can't mask itself), flag |z| > 2.5 with
    at least 10 points of history. One exchange on user_id; the frame
    is rows-based over the (ts_us, event_id) total order so both
    engines aggregate the exact same point set. Output is only the
    anomalies — bounded by the tail of the z distribution, not by the
    event count."""
    pts = load_table(spark, sf_dir, "events").select(
        "user_id", "event_id", ts_us("ts").alias("ts_us"), "value"
    )
    w = (
        W.partitionBy("user_id")
        .orderBy("ts_us", "event_id")
        .rowsBetween(-20, -1)
    )
    stats = pts.withColumns(
        {
            "mu": F.avg("value").over(w),
            "sigma": F.stddev_samp("value").over(w),
            "n_hist": F.count(F.lit(1)).over(w),
        }
    )
    z = (F.col("value") - F.col("mu")) / F.col("sigma")
    return (
        stats.where(
            (F.col("n_hist") >= 10)
            & (F.col("sigma") > 1e-9)
            & (F.abs(z) > 2.5)
        )
        .select(
            "user_id",
            "event_id",
            "ts_us",
            "value",
            F.round(z, 4).alias("z"),
        )
    )


@register(
    "q_ts_rollup_hier",
    oracle="""
    SELECT strftime(ts, '%Y-%m') AS month,
           strftime(ts, '%Y-%m-%d') AS day,
           strftime(ts, '%Y-%m-%d %H') AS hour,
           COUNT(*) AS n,
           ROUND(SUM(value), 4) AS sum_value
    FROM events
    GROUP BY ROLLUP (strftime(ts, '%Y-%m'),
                     strftime(ts, '%Y-%m-%d'),
                     strftime(ts, '%Y-%m-%d %H'))
    """,
)
def q_ts_rollup_hier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hierarchical time rollup (the continuous-aggregate /
    "hypertable rollup" shape): hour → day → month → grand total in
    ONE pass via ROLLUP on nested time buckets. At 100 TB this is one
    partial-aggregated exchange producing every granularity at once —
    vs 3 separate scans for 3 materialized rollup levels — and each
    coarser level is derivable from the finer one's partials (the
    mergeability continuous aggregates rely on for incremental
    refresh; see q_agg_incremental for the delta-refresh half)."""
    e = load_table(spark, sf_dir, "events")
    month = F.date_format("ts", "yyyy-MM").alias("month")
    day = F.date_format("ts", "yyyy-MM-dd").alias("day")
    hour = F.date_format("ts", "yyyy-MM-dd HH").alias("hour")
    return e.rollup(month, day, hour).agg(
        F.count(F.lit(1)).alias("n"),
        F.round(F.sum("value"), 4).alias("sum_value"),
    )


@register(
    "q_ts_interpolate",
    oracle="""
    WITH daily AS (
        SELECT user_id, CAST(date_trunc('day', ts) AS DATE) AS day,
               AVG(value) AS v
        FROM events GROUP BY 1, 2
    ), spans AS (
        SELECT user_id, MIN(day) AS d0, MAX(day) AS d1 FROM daily GROUP BY 1
    ), spine AS (
        SELECT user_id,
               CAST(unnest(generate_series(d0, d1, INTERVAL 1 DAY)) AS DATE)
                   AS day
        FROM spans
    ), joined AS (
        SELECT s.user_id, s.day,
               s.day - DATE '1970-01-01' AS di,
               d.v
        FROM spine s LEFT JOIN daily d USING (user_id, day)
    ), neigh AS (
        SELECT *,
               CAST(FLOOR(v * 10000 + 0.5) AS BIGINT) AS v4,
               last_value(CAST(FLOOR(v * 10000 + 0.5) AS BIGINT) IGNORE NULLS)
                   OVER wp AS pv4,
               last_value(CASE WHEN v IS NOT NULL THEN di END IGNORE NULLS)
                   OVER wp AS pdi,
               first_value(CAST(FLOOR(v * 10000 + 0.5) AS BIGINT) IGNORE NULLS)
                   OVER wn AS nv4,
               first_value(CASE WHEN v IS NOT NULL THEN di END IGNORE NULLS)
                   OVER wn AS ndi
        FROM joined
        WINDOW wp AS (PARTITION BY user_id ORDER BY di
                      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
               wn AS (PARTITION BY user_id ORDER BY di
                      ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING)
    )
    SELECT user_id, strftime(day, '%Y-%m-%d') AS day,
           CAST(CASE WHEN v4 IS NOT NULL THEN v4
                     ELSE CAST(FLOOR(
                          (pv4 * (ndi - di) + nv4 * (di - pdi)) * 1.0
                              / (ndi - pdi) + 0.5) AS BIGINT)
                END AS BIGINT) / 10000.0 AS value,
           (v IS NULL) AS interpolated
    FROM neigh
    """,
)
def q_ts_interpolate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Linear gap interpolation (the `interpolate()` half of a
    hypertable gapfill, vs q_ts_gapfill's LOCF): densify each user's
    daily mean-value series and fill interior gaps with the straight
    line between the previous and next observed days. Neighbor values
    come from ignore-nulls running last_value/first_value windows —
    both directions ride the SAME user_id exchange (two sort-only
    WindowExecs, one shuffle). The spine never has leading/trailing
    nulls (it spans each user's own [min_day, max_day]), so every gap
    has both neighbors.

    Determinism note: interpolation at gap fraction 1/2 systematically
    lands midpoints whose 5th decimal is exactly 5 — a rounding tie
    that Spark (exact-decimal HALF_UP on the binary expansion) and
    float-path ROUND implementations resolve differently, and that
    ROUND(AVG, 4) itself trips on midpoint-straddling doubles (seen at
    sf0.1). So no engine ROUND appears anywhere: daily means go
    straight to integer 1e-4 units via FLOOR(avg*10000 + 0.5) — floor
    of an identical IEEE double has zero implementation discretion —
    the lerp runs on exact BIGINTs with one identical division, and
    the display double is ONE identical division by 10000.0."""
    e = load_table(spark, sf_dir, "events")
    daily = e.groupBy(
        "user_id", F.to_date(F.date_trunc("day", "ts")).alias("day")
    ).agg(F.avg("value").alias("v"))
    spans = daily.groupBy("user_id").agg(
        F.min("day").alias("d0"), F.max("day").alias("d1")
    )
    spine = spans.select(
        "user_id", F.explode(F.sequence("d0", "d1")).alias("day")
    )
    joined = spine.join(daily, ["user_id", "day"], "left").withColumn(
        "di", F.datediff("day", F.lit("1970-01-01"))
    )
    wp = (
        W.partitionBy("user_id")
        .orderBy("di")
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    wn = (
        W.partitionBy("user_id")
        .orderBy("di")
        .rowsBetween(W.currentRow, W.unboundedFollowing)
    )
    obs_di = F.when(F.col("v").isNotNull(), F.col("di"))
    v4 = F.floor(F.col("v") * 10000 + F.lit(0.5)).cast("long")
    neigh = joined.withColumns(
        {
            "v4": v4,
            "pv4": F.last(v4, ignorenulls=True).over(wp),
            "pdi": F.last(obs_di, ignorenulls=True).over(wp),
            "nv4": F.first(v4, ignorenulls=True).over(wn),
            "ndi": F.first(obs_di, ignorenulls=True).over(wn),
        }
    )
    interp4 = F.floor(
        (
            F.col("pv4") * (F.col("ndi") - F.col("di"))
            + F.col("nv4") * (F.col("di") - F.col("pdi"))
        )
        * F.lit(1.0)
        / (F.col("ndi") - F.col("pdi"))
        + F.lit(0.5)
    ).cast("long")
    return neigh.select(
        "user_id",
        F.date_format("day", "yyyy-MM-dd").alias("day"),
        (
            F.when(F.col("v4").isNotNull(), F.col("v4")).otherwise(interp4)
            / F.lit(10000.0)
        ).alias("value"),
        F.col("v").isNull().alias("interpolated"),
    )


@register(
    "q_ts_seasonal",
    oracle="""
    WITH pts AS (
        SELECT event_type,
               CAST(EXTRACT(hour FROM ts) AS INT) AS hod,
               value
        FROM events
    )
    SELECT event_type, hod, COUNT(*) AS n,
           CAST(FLOOR(AVG(value) * 10000 + 0.5) AS BIGINT) AS mean_e4
    FROM pts GROUP BY event_type, hod
    """,
)
def q_ts_seasonal(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Seasonal (hour-of-day) decomposition profile: the per-type
    24-slot mean-value curve — the "seasonal" component of a
    classical decompose; residual = value - profile[hod] is a
    broadcast join away (the profile is |types|×24 rows at ANY data
    scale, the canonical map-side dimension). ONE partial-aggregated
    exchange on (event_type, hod); means emitted as floor-scaled e4
    integers (see q_ts_interpolate's determinism note). hour() on
    TIMESTAMP_NTZ is session-tz-independent by construction."""
    e = load_table(spark, sf_dir, "events")
    return e.groupBy(
        "event_type", F.hour("ts").cast("int").alias("hod")
    ).agg(
        F.count(F.lit(1)).alias("n"),
        F.floor(F.avg("value") * 10000 + F.lit(0.5))
        .cast("long")
        .alias("mean_e4"),
    )


@register(
    "q_ts_autocorr",
    oracle="""
    WITH pts AS (
        SELECT user_id, value,
               LAG(value) OVER (
                   PARTITION BY user_id
                   ORDER BY epoch_us(ts), event_id
               ) AS prev_value
        FROM events
    )
    SELECT user_id,
           COUNT(*) AS n_pairs,
           CAST(FLOOR(corr(value, prev_value) * 10000 + 0.5) AS BIGINT)
               AS lag1_autocorr_e4
    FROM pts
    WHERE prev_value IS NOT NULL
    GROUP BY user_id
    HAVING COUNT(*) >= 20
    """,
)
def q_ts_autocorr(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Lag-1 autocorrelation per user series — the stationarity /
    seasonality diagnostic a forecasting pipeline computes before
    model choice: self-join-free via a LAG window over the
    (epoch, event_id) total order, then Pearson corr of (value,
    prev_value). ONE user_id exchange shared by the window and the
    aggregate; users with <20 pairs are dropped (corr is noise
    there). The correlation is emitted as a floor-scaled e4 integer
    (see q_ts_interpolate's determinism note): Spark and DuckDB corr()
    use different accumulation paths and a final ROUND(x, 4) can flip
    on midpoint-straddling doubles, while FLOOR(x*1e4+0.5) is stable
    away from the (measure-zero) scaled-integer boundaries."""
    pts = load_table(spark, sf_dir, "events").select(
        "user_id",
        "value",
        F.lag("value")
        .over(W.partitionBy("user_id").orderBy(ts_us("ts"), "event_id"))
        .alias("prev_value"),
    )
    return (
        pts.filter(F.col("prev_value").isNotNull())
        .groupBy("user_id")
        .agg(
            F.count(F.lit(1)).alias("n_pairs"),
            F.floor(F.corr("value", "prev_value") * 10000 + F.lit(0.5))
            .cast("long")
            .alias("lag1_autocorr_e4"),
        )
        .filter(F.col("n_pairs") >= 20)
    )


@register(
    "q_ts_changepoint",
    oracle="""
    WITH pts AS (
        SELECT user_id,
               CAST(FLOOR(value * 10000 + 0.5) AS BIGINT) AS xi,
               ROW_NUMBER() OVER w AS k,
               CAST(SUM(CAST(FLOOR(value * 10000 + 0.5) AS BIGINT)) OVER (
                   PARTITION BY user_id ORDER BY epoch_us(ts), event_id
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
               ) AS BIGINT) AS pfx,
               COUNT(*) OVER (PARTITION BY user_id) AS n,
               CAST(SUM(CAST(FLOOR(value * 10000 + 0.5) AS BIGINT)) OVER (
                   PARTITION BY user_id
               ) AS BIGINT) AS total
        FROM events
        WINDOW w AS (PARTITION BY user_id ORDER BY epoch_us(ts), event_id)
    ), dev AS (
        SELECT user_id, n, k, n * pfx - k * total AS dev
        FROM pts WHERE n >= 20
    ), ranked AS (
        SELECT user_id, n, k AS cp_k, dev AS cp_dev,
               ROW_NUMBER() OVER (
                   PARTITION BY user_id ORDER BY ABS(dev) DESC, k
               ) AS rn
        FROM dev
    )
    SELECT user_id, n, cp_k, cp_dev FROM ranked WHERE rn = 1
    """,
)
def q_ts_changepoint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUSUM change-point detection per user series: the index k
    maximizing |mean-adjusted cumulative sum| — the classic offline
    single-changepoint statistic (where the series' level shifts).

    Determinism by construction: values are floor-scaled to e4
    integers FIRST, and the statistic is computed as
    n·prefix_k − k·total — all exact BIGINT arithmetic (the
    denominator-free form of prefix_k − k·mean), so the argmax can
    never flip on a float ulp across engines or partitionings, unlike
    a double CUSUM whose mean depends on summation order. ONE user_id
    exchange shared by both windows and the argmax; the argmax itself
    is a max-by-struct aggregate, not a second sort. Users with <20
    points are dropped (the statistic is noise there)."""
    xi = F.floor(F.col("value") * 10000 + F.lit(0.5)).cast("long")
    w_ord = W.partitionBy("user_id").orderBy(ts_us("ts"), "event_id")
    w_all = W.partitionBy("user_id")
    pts = load_table(spark, sf_dir, "events").select(
        "user_id",
        F.row_number().over(w_ord).cast("long").alias("k"),
        F.sum(xi)
        .over(w_ord.rowsBetween(W.unboundedPreceding, W.currentRow))
        .alias("pfx"),
        F.count(F.lit(1)).over(w_all).alias("n"),
        F.sum(xi).over(w_all).alias("total"),
    )
    dev = pts.filter(F.col("n") >= 20).select(
        "user_id",
        "n",
        "k",
        (F.col("n") * F.col("pfx") - F.col("k") * F.col("total")).alias("dev"),
    )
    best = dev.groupBy("user_id", "n").agg(
        F.max(
            F.struct(
                F.abs(F.col("dev")).alias("a"),
                (-F.col("k")).alias("nk"),
                F.col("k").alias("k"),
                F.col("dev").alias("dev"),
            )
        ).alias("b")
    )
    return best.select(
        "user_id",
        "n",
        F.col("b.k").alias("cp_k"),
        F.col("b.dev").alias("cp_dev"),
    )


@register(
    "q_ts_seasonal_ma",
    oracle="""
    WITH daily AS (
        SELECT CAST(ts AS DATE) AS d,
               ROUND(SUM(value), 6) AS v
        FROM events GROUP BY 1
    ), ma AS (
        SELECT d, v,
               AVG(v) OVER (ORDER BY d
                   ROWS BETWEEN 3 PRECEDING AND 3 FOLLOWING) AS trend,
               COUNT(*) OVER (ORDER BY d
                   ROWS BETWEEN 3 PRECEDING AND 3 FOLLOWING) AS wn
        FROM daily
    )
    SELECT CAST(dayofweek(d) AS INT) AS dow,
           COUNT(*) AS n_days,
           CAST(FLOOR(AVG(v - trend) * 10000 + 0.5) AS BIGINT)
               AS seasonal_e4
    FROM ma WHERE wn = 7
    GROUP BY 1
    """,
)
def q_ts_seasonal_ma(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Classical SEASONAL DECOMPOSITION by centered moving average
    (the moving-average step of STL): daily revenue -> centered 7-day
    trend (full windows only) -> detrended residual -> per-weekday
    seasonal index. One groupBy + one unpartitioned-but-tiny ordered
    window (the series is DAYS — thousands of rows at any data scale,
    so the single-partition window is over the AGGREGATE, never the
    raw events; the 100 TB cost is the first groupBy, a plain
    map-side-combined shuffle). Both engines floor-scale the index to
    1e-4 ints; the daily sums are pre-rounded at 1e-6 on BOTH sides
    so engine-order float drift cannot leak through the subtraction.
    """
    daily = (
        load_table(spark, sf_dir, "events")
        .groupBy(F.to_date("ts").alias("d"))
        .agg(F.round(F.sum("value"), 6).alias("v"))
    )
    w = W.orderBy("d").rowsBetween(-3, 3)
    ma = daily.select(
        "d",
        "v",
        F.avg("v").over(w).alias("trend"),
        F.count(F.lit(1)).over(w).alias("wn"),
    ).filter(F.col("wn") == 7)
    return ma.groupBy(
        (F.dayofweek("d") - 1).cast("int").alias("dow")
    ).agg(
        F.count(F.lit(1)).alias("n_days"),
        F.floor(
            F.avg(F.col("v") - F.col("trend")) * 10000 + F.lit(0.5)
        ).cast("bigint").alias("seasonal_e4"),
    )
