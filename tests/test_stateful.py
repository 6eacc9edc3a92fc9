"""Stateful streaming EMA vs its closed-form batch twin.

The stream is deliberately chopped into many micro-batches
(maxFilesPerTrigger=1 over month-split files) so the test proves the
state store carries the EMA across batch boundaries — not just that a
single batch folds correctly.
"""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from meta_iterative_mapreduce_spark import registry
from meta_iterative_mapreduce_spark.io import load_table
from meta_iterative_mapreduce_spark.streaming import jobs, stateful


@pytest.fixture(scope="module")
def chopped_events_dir(spark, sf_dir, tmp_path_factory):
    """Events re-written as one parquet file per 6-hour chunk — a
    multi-file landing zone the file stream consumes one file per
    micro-batch (~3-4 micro-batches; enough to prove state carries
    across batches while keeping the test fast)."""
    out = str(tmp_path_factory.mktemp("events_by_hour"))
    ev = load_table(spark, sf_dir, "events")
    (
        ev.withColumn("hour", F.concat(F.date_format("ts", "yyyy-MM-dd"), F.lit("-"), F.floor(F.hour("ts") / 6)))
        .repartition("hour")
        .write.mode("overwrite")
        .partitionBy("hour")
        .parquet(out)
    )
    return out


def test_stateful_ema_across_microbatches(spark, sf_dir, chopped_events_dir, tmp_path):
    schema = spark.read.parquet(chopped_events_dir).schema
    src = (
        spark.readStream.option("maxFilesPerTrigger", "1")
        .schema(schema)
        .parquet(chopped_events_dir)
    )
    result = jobs.run_to_memory(
        stateful.ema_stateful(src), "t_ema", output_mode="update"
    ).toPandas()
    assert len(result) > 0
    # final state per user = the row with the max n_seen
    final = result.sort_values("n_seen").groupby("user_id").tail(1)

    batch = registry.queries()["q_stream_ema"](spark, sf_dir).toPandas()
    merged = final.merge(batch, on="user_id", suffixes=("_stream", "_batch"))
    assert len(merged) == len(batch)
    assert (merged["n_seen_stream"] == merged["n_seen_batch"]).all()
    assert (merged["ema_stream"] - merged["ema_batch"]).abs().max() < 1e-3


def test_stateful_ema_more_batches_than_one(spark, chopped_events_dir):
    n_files = sum(
        1
        for root, _, files in os.walk(chopped_events_dir)
        for f in files
        if f.endswith(".parquet")
    )
    assert n_files > 2  # the stream genuinely ran multiple micro-batches


def test_transform_with_state_builds_unbounded_plan(spark, chopped_events_dir):
    """The transformWithStateInPandas operator must at least construct
    its unbounded plan with the declared output schema everywhere —
    the e2e below needs protobuf (absent in this container)."""
    schema = spark.read.parquet(chopped_events_dir).schema
    src = spark.readStream.schema(schema).parquet(chopped_events_dir)
    df = stateful.running_totals_stateful(src)
    assert df.isStreaming
    assert [f.name for f in df.schema.fields] == [
        "user_id",
        "n_events",
        "total_value",
        "max_value",
    ]


def test_transform_with_state_running_totals(spark, sf_dir, chopped_events_dir):
    """transformWithStateInPandas (the Spark 4 StatefulProcessor API):
    per-user running totals carried in a ValueState across the chopped
    micro-batches must converge to the batch aggregate. The state wire
    protocol needs protobuf (pyspark[connect] extra) — skip where the
    environment lacks it; the batch twin stays hash-checked anywhere."""
    pytest.importorskip("google.protobuf")
    saved = spark.conf.get("spark.sql.streaming.stateStore.providerClass", None)
    spark.conf.set(
        "spark.sql.streaming.stateStore.providerClass",
        "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider",
    )
    try:
        schema = spark.read.parquet(chopped_events_dir).schema
        src = (
            spark.readStream.option("maxFilesPerTrigger", "1")
            .schema(schema)
            .parquet(chopped_events_dir)
        )
        result = jobs.run_to_memory(
            stateful.running_totals_stateful(src), "t_totals", output_mode="update"
        ).toPandas()
        final = result.sort_values("n_events").groupby("user_id").tail(1)
        batch = registry.queries()["q_stream_running_totals"](
            spark, sf_dir
        ).toPandas()
        merged = final.merge(batch, on="user_id", suffixes=("_s", "_b"))
        assert len(merged) == len(batch)
        assert (merged["n_events_s"] == merged["n_events_b"]).all()
        assert (merged["total_value_s"] - merged["total_value_b"]).abs().max() < 1e-3
        assert (merged["max_value_s"] - merged["max_value_b"]).abs().max() < 1e-9
    finally:
        if saved is None:
            spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
        else:
            spark.conf.set("spark.sql.streaming.stateStore.providerClass", saved)


def test_transform_with_state_event_time_timers(
    spark, sf_dir, chopped_events_dir
):
    """The TIMER half of the Spark-4 StatefulProcessor API: per-user
    sessions close when the WATERMARK passes last_event + 30 min (an
    event-time timer firing on silence, not on an input row). Every
    emitted closed session must equal one of the batch sessionizer's
    (user, start, end, n) rows exactly, and the stream must close a
    substantial share of the non-final sessions (final sessions per
    user may stay open — the watermark needs to advance past them)."""
    saved = spark.conf.get("spark.sql.streaming.stateStore.providerClass", None)
    spark.conf.set(
        "spark.sql.streaming.stateStore.providerClass",
        "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider",
    )
    try:
        schema = spark.read.parquet(chopped_events_dir).schema
        # 8 files per trigger: still ~15 micro-batches for the timers
        # to fire across, at an eighth of the per-batch overhead
        src = (
            spark.readStream.option("maxFilesPerTrigger", "8")
            .schema(schema)
            .parquet(chopped_events_dir)
        )
        closed = jobs.run_to_memory(
            stateful.session_close_stateful(src), "t_sess", output_mode="append"
        ).toPandas()
        batch = (
            registry.queries()["q_events_sessionize"](spark, sf_dir)
            .selectExpr(
                "user_id",
                "start_us AS session_start_us",
                "end_us AS session_end_us",
                "n_events",
            )
            .toPandas()
        )
        assert len(closed) > 0
        merged = closed.merge(
            batch,
            on=["user_id", "session_start_us", "session_end_us", "n_events"],
        )
        assert len(merged) == len(closed)  # every close matches a batch row
        n_users = batch["user_id"].nunique()
        nonfinal = len(batch) - n_users
        assert len(closed) >= nonfinal // 2, (len(closed), nonfinal)
    finally:
        if saved is None:
            spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
        else:
            spark.conf.set(
                "spark.sql.streaming.stateStore.providerClass", saved
            )
