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
