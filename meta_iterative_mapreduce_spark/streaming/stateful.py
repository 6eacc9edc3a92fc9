"""Custom stateful streaming operator: per-key EMA.

The reference's defining stateful computation is the EMA carried
across data batches on rank 0 (w_old = α·w_old + (1−α)·w_new,
kernel.cu:25, 214-215). As a streaming operator that state lives in
the state store, keyed per user: `applyInPandasWithState` holds
(ema, n_seen) per key across micro-batches — bounded state, arbitrary
keys, the Spark-native form of "model state that survives batches".

The batch twin (`q_stream_ema`, registered in batch_analogs-style with
a DuckDB oracle) computes the identical closed form
    ema_T = α^(T−1)·v_1 + (1−α)·Σ_{t≥2} α^(T−t)·v_t
per user over the same events, so the stateful operator is fully
correctness-checked despite streaming itself not being oracle-able.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import Window as W
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

from meta_iterative_mapreduce_spark.io import load_table
from meta_iterative_mapreduce_spark.registry import register
from meta_iterative_mapreduce_spark.functions.time import ts_us

ALPHA = 0.2  # kernel.cu:25

_OUT_SCHEMA = "user_id long, ema double, n_seen long"
_STATE_SCHEMA = "ema double, n_seen long"


def ema_stateful(events: DataFrame) -> DataFrame:
    """Per-user streaming EMA of `value` via applyInPandasWithState.

    Emits the running (user_id, ema, n_seen) after every micro-batch.
    Rows within a batch are folded in (ts, event_id) order so results
    are deterministic and match the batch closed form regardless of
    how the stream is chopped into micro-batches.
    """

    def update(
        key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        ema, n_seen = state.get if state.exists else (None, 0)
        rows = pd.concat(list(pdfs))
        rows = rows.sort_values(["us", "event_id"])
        for v in rows["value"]:
            ema = v if ema is None else ALPHA * ema + (1.0 - ALPHA) * v
            n_seen += 1
        state.update((float(ema), int(n_seen)))
        yield pd.DataFrame(
            {"user_id": [key[0]], "ema": [ema], "n_seen": [n_seen]}
        )

    prepared = events.select(
        "user_id", "event_id", "value", ts_us("ts").alias("us")
    )
    return prepared.groupBy("user_id").applyInPandasWithState(
        update,
        outputStructType=_OUT_SCHEMA,
        stateStructType=_STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


@register(
    "q_stream_ema",
    oracle=f"""
    WITH ranked AS (
        SELECT user_id, value,
               ROW_NUMBER() OVER
                   (PARTITION BY user_id ORDER BY epoch_us(ts), event_id) AS rn,
               COUNT(*) OVER (PARTITION BY user_id) AS t_total
        FROM events
    )
    SELECT user_id,
           ROUND(SUM(POWER({ALPHA}, t_total - rn)
                     * (CASE WHEN rn = 1 THEN 1.0 ELSE {1.0 - ALPHA} END)
                     * value), 4) AS ema,
           MAX(t_total) AS n_seen
    FROM ranked
    GROUP BY user_id
    """,
)
def q_stream_ema(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Batch twin of the stateful streaming EMA: the closed-form
    geometric expansion evaluated per user in one window + aggregate —
    the same algebra as the regression EMA (kernel.cu:214-215), applied
    to a value stream."""
    e = load_table(spark, sf_dir, "events")
    w = W.partitionBy("user_id").orderBy(ts_us("ts"), "event_id")
    ranked = e.select(
        "user_id",
        "value",
        F.row_number().over(w).alias("rn"),
        F.count(F.lit(1))
        .over(W.partitionBy("user_id"))
        .alias("t_total"),
    )
    weight = F.pow(F.lit(ALPHA), F.col("t_total") - F.col("rn")) * F.when(
        F.col("rn") == 1, F.lit(1.0)
    ).otherwise(F.lit(1.0 - ALPHA))
    return ranked.groupBy("user_id").agg(
        F.round(F.sum(weight * F.col("value")), 4).alias("ema"),
        F.max("t_total").alias("n_seen"),
    )


# ---------------------------------------------------------------------------
# transformWithStateInPandas — the Spark 4 arbitrary-state API
# ---------------------------------------------------------------------------
#
# applyInPandasWithState above is the legacy arbitrary-state operator;
# Spark 4's StatefulProcessor generalizes it (typed state variables,
# timers, TTL, unions of state types). Demonstrated here with per-user
# running totals held in a ValueState across micro-batches — the same
# "model state survives batches" shape as the EMA, on the modern API.

_TOTALS_OUT = "user_id long, n_events long, total_value double, max_value double"


def _totals_processor():
    """Build the StatefulProcessor lazily (class definition imports
    the Spark 4 stateful_processor module only when actually used)."""
    from pyspark.sql.streaming.stateful_processor import (
        StatefulProcessor,
        StatefulProcessorHandle,
    )
    from pyspark.sql import types as T

    class RunningTotals(StatefulProcessor):
        def init(self, handle: StatefulProcessorHandle) -> None:
            schema = T.StructType(
                [
                    T.StructField("n", T.LongType()),
                    T.StructField("total", T.DoubleType()),
                    T.StructField("vmax", T.DoubleType()),
                ]
            )
            self._state = handle.getValueState("totals", schema)

        def handleInputRows(self, key, rows, timerValues):
            if self._state.exists():
                n, total, vmax = self._state.get()
            else:
                n, total, vmax = 0, 0.0, None
            for pdf in rows:
                n += len(pdf)
                total += float(pdf["value"].sum())
                m = float(pdf["value"].max())
                vmax = m if vmax is None else max(vmax, m)
            self._state.update((n, total, vmax))
            yield pd.DataFrame(
                {
                    "user_id": [key[0]],
                    "n_events": [n],
                    "total_value": [total],
                    "max_value": [vmax],
                }
            )

        def close(self) -> None:
            pass

    return RunningTotals()


def running_totals_stateful(events: DataFrame) -> DataFrame:
    """Per-user running (count, sum, max) of `value` via
    transformWithStateInPandas; emits the updated totals for every key
    touched by each micro-batch. Requires the RocksDB state store
    provider (set by the caller/test); state per key is three scalars —
    bounded regardless of stream length.

    Runtime note: the StatefulProcessor wire protocol needs the
    `google.protobuf` runtime; tools/pbshim/sitecustomize.py provides
    it from the on-box SDK bundle where no real install exists, so the
    e2e test (tests/test_stateful.py) actually executes this path —
    and the hash-checked batch twin (q_stream_running_totals) verifies
    the same semantics through the oracle everywhere."""
    prepared = events.select("user_id", "value")
    return prepared.groupBy("user_id").transformWithStateInPandas(
        statefulProcessor=_totals_processor(),
        outputStructType=_TOTALS_OUT,
        outputMode="Update",
        timeMode="None",
    )


@register(
    "q_stream_running_totals",
    oracle="""
    SELECT user_id,
           COUNT(*) AS n_events,
           ROUND(SUM(value), 4) AS total_value,
           ROUND(MAX(value), 4) AS max_value
    FROM events
    GROUP BY user_id
    """,
)
def q_stream_running_totals(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Batch twin of the transformWithStateInPandas running totals: the
    final state after the whole stream is replayed equals the plain
    per-user aggregate (count/sum/max are order-free), so the modern
    stateful operator is hash-checked end to end despite streaming
    itself not being oracle-able (tests/test_stateful.py drives the
    real stream across chronological micro-batches and compares)."""
    e = load_table(spark, sf_dir, "events")
    return e.groupBy("user_id").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.round(F.sum("value"), 4).alias("total_value"),
        F.round(F.max("value"), 4).alias("max_value"),
    )


# ---------------------------------------------------------------------------
# Event-time TIMERS — the half of the Spark 4 StatefulProcessor API the
# running-totals demo doesn't touch: a session-timeout operator that
# emits a closed session when the WATERMARK (not an input row) passes
# last_event + gap. This is the canonical "emit on silence" shape —
# inexpressible with applyInPandasWithState's per-batch timeouts tied
# to processing time, and the reason the timer API exists.
# ---------------------------------------------------------------------------

_SESSION_GAP_US = 30 * 60 * 1_000_000  # 30-minute inactivity gap
_SESSION_OUT = (
    "user_id long, session_start_us long, session_end_us long, n_events long"
)


def _session_close_processor(gap_us: int):
    """StatefulProcessor closing per-user sessions on event-time
    timers: ValueState carries (n, start_us, last_us); every input
    batch re-arms ONE timer at last_event + gap; when the watermark
    passes it, handleExpiredTimer emits the closed session and clears
    state. Intra-batch gaps close inline (the timer only handles
    silence at the tail). Correctness rests on the watermark contract:
    if watermark > last + gap, any future event t >= watermark starts
    a new session anyway, so closing cannot be premature."""
    from pyspark.sql import types as T
    from pyspark.sql.streaming.stateful_processor import (
        StatefulProcessor,
        StatefulProcessorHandle,
    )

    gap_ms = gap_us // 1000

    class SessionClose(StatefulProcessor):
        def init(self, handle: StatefulProcessorHandle) -> None:
            schema = T.StructType(
                [
                    T.StructField("n", T.LongType()),
                    T.StructField("start_us", T.LongType()),
                    T.StructField("last_us", T.LongType()),
                ]
            )
            self._state = handle.getValueState("sess", schema)
            self._handle = handle

        def _closed_frame(self, key, sessions):
            return pd.DataFrame(
                {
                    "user_id": [key[0]] * len(sessions),
                    "session_start_us": [s[0] for s in sessions],
                    "session_end_us": [s[1] for s in sessions],
                    "n_events": [s[2] for s in sessions],
                }
            )

        def handleInputRows(self, key, rows, timerValues):
            ts = []
            for pdf in rows:
                ts.extend(int(v) for v in pdf["ts_us"])
            ts.sort()
            if self._state.exists():
                n, start, last = self._state.get()
            else:
                n, start, last = 0, None, None
            closed = []
            for t in ts:
                if last is not None and t - last > gap_us:
                    closed.append((start, last, n))
                    n, start, last = 0, None, None
                n += 1
                if start is None:
                    start = t
                last = t
            self._state.update((n, start, last))
            # exactly one armed timer per key: the tail-silence timeout
            for old in self._handle.listTimers():
                self._handle.deleteTimer(old)
            self._handle.registerTimer(last // 1000 + gap_ms)
            if closed:
                yield self._closed_frame(key, closed)

        def handleExpiredTimer(self, key, timerValues, expiredTimerInfo):
            if self._state.exists():
                n, start, last = self._state.get()
                self._state.clear()
                if n:
                    yield self._closed_frame(key, [(start, last, n)])

        def close(self) -> None:
            pass

    return SessionClose()


def session_close_stateful(
    events: DataFrame, gap_us: int = _SESSION_GAP_US
) -> DataFrame:
    """Per-user session close stream via event-time timers
    (timeMode='EventTime'): input must carry a watermarked `ts`
    timestamp column; output rows appear only when a session CLOSES —
    either an intra-batch gap or the watermark passing last + gap (the
    timer path). The batch twin is q_events_sessionize: every closed
    session here must equal one of its (user, start, end, n) rows
    exactly (tests/test_stateful.py asserts it)."""
    # watermarks require TIMESTAMP (ltz), not NTZ (the house event-time
    # type): cast wall-preserving for the watermark, and take epochs
    # with unix_micros on the SAME ltz column so state epochs, timers
    # and the watermark all live on ONE timeline (internally
    # consistent). Under a non-UTC session tz the wall-preserving cast
    # distorts gaps that straddle a DST transition by the offset jump,
    # so the batch-twin equivalence is asserted under UTC sessions
    # (the e2e test's configuration); a production deployment keeps
    # event time in UTC for exactly this reason.
    prepared = (
        events.withColumn("ts_ltz", F.col("ts").cast("timestamp"))
        .withWatermark("ts_ltz", "0 seconds")
        .select(
            "user_id",
            F.expr("unix_micros(ts_ltz)").alias("ts_us"),
            "ts_ltz",
        )
    )
    return prepared.groupBy("user_id").transformWithStateInPandas(
        statefulProcessor=_session_close_processor(gap_us),
        outputStructType=_SESSION_OUT,
        outputMode="Append",
        timeMode="EventTime",
    )


@register(
    "q_stream_session_timer",
    oracle=f"""
    WITH ordered AS (
        SELECT user_id, event_id, epoch_us(ts) AS ts_us,
               LAG(epoch_us(ts)) OVER (
                   PARTITION BY user_id ORDER BY epoch_us(ts), event_id
               ) AS prev_us
        FROM events
    ), marked AS (
        SELECT *,
               CASE WHEN prev_us IS NULL
                         OR ts_us - prev_us > {_SESSION_GAP_US}
                    THEN 1 ELSE 0 END AS is_new
        FROM ordered
    ), sessions AS (
        SELECT user_id,
               CAST(SUM(is_new) OVER (
                   PARTITION BY user_id ORDER BY ts_us, event_id
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
               ) AS BIGINT) AS session_idx,
               ts_us
        FROM marked
    ), agg AS (
        SELECT user_id, session_idx,
               MIN(ts_us) AS session_start_us,
               MAX(ts_us) AS session_end_us,
               COUNT(*) AS n_events,
               MAX(session_idx) OVER (PARTITION BY user_id)
                   AS final_idx
        FROM sessions
        GROUP BY user_id, session_idx
    ), wm AS (
        SELECT MAX(epoch_us(ts)) AS wm_us FROM events
    )
    SELECT user_id, session_start_us, session_end_us,
           CAST(n_events AS BIGINT) AS n_events,
           CASE WHEN session_idx = final_idx THEN 'timer' ELSE 'gap' END
               AS close_reason
    FROM agg, wm
    WHERE session_idx < final_idx
       OR session_end_us + {_SESSION_GAP_US} < wm.wm_us
    """,
)
def q_stream_session_timer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Batch-equality twin of the event-time TIMER sessionizer
    (session_close_stateful / transformWithStateInPandas,
    timeMode='EventTime'): emits exactly the sessions the stream
    CLOSES when the whole table has been consumed and the watermark
    rests at max(ts) — non-final sessions close inline on the >30 min
    gap ('gap'), the final session of a user closes only if the
    terminal watermark passed its last event + gap ('timer'); a user
    whose tail session is still inside the gap window emits NOTHING
    for it, exactly like the stream (tests/test_stateful.py pins the
    stream's closes to the q_events_sessionize rows; this query pins
    the SELECTION — which sessions may appear — plus the close path
    each takes, and gives the modern transformWithState surface its
    own driver-stamped hash oracle). Plan: the one exchange on
    user_id is shared by lag, the running sum, the session aggregate
    and the final-session window; the terminal watermark is an O(1)
    driver scalar folded in as a literal (the R2 broadcast pattern,
    kernel.cu:106)."""
    ev = load_table(spark, sf_dir, "events").select(
        "user_id", "event_id", ts_us("ts").alias("ts_us")
    )
    wm_us = ev.agg(F.max("ts_us")).collect()[0][0]
    order = W.partitionBy("user_id").orderBy("ts_us", "event_id")
    marked = ev.withColumn(
        "is_new",
        F.when(
            F.lag("ts_us").over(order).isNull()
            | (F.col("ts_us") - F.lag("ts_us").over(order) > _SESSION_GAP_US),
            F.lit(1),
        ).otherwise(F.lit(0)),
    )
    sessions = marked.withColumn(
        "session_idx",
        F.sum("is_new").over(
            order.rowsBetween(W.unboundedPreceding, W.currentRow)
        ),
    )
    agg = sessions.groupBy("user_id", "session_idx").agg(
        F.min("ts_us").alias("session_start_us"),
        F.max("ts_us").alias("session_end_us"),
        F.count(F.lit(1)).alias("n_events"),
    )
    agg = agg.withColumn(
        "final_idx",
        F.max("session_idx").over(W.partitionBy("user_id")),
    )
    return agg.filter(
        (F.col("session_idx") < F.col("final_idx"))
        | (F.col("session_end_us") + _SESSION_GAP_US < F.lit(wm_us))
    ).select(
        "user_id",
        "session_start_us",
        "session_end_us",
        F.col("n_events").cast("bigint").alias("n_events"),
        F.when(F.col("session_idx") == F.col("final_idx"), "timer")
        .otherwise("gap")
        .alias("close_reason"),
    )
