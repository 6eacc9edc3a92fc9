"""Structured Streaming jobs vs their deterministic batch twins."""

from __future__ import annotations

import pandas as pd

from meta_iterative_mapreduce_spark import registry
from meta_iterative_mapreduce_spark.streaming import jobs


def _canon(pdf: pd.DataFrame) -> pd.DataFrame:
    pdf = pdf[sorted(pdf.columns)]
    return pdf.sort_values(by=list(pdf.columns), ignore_index=True)


def test_tumbling_stream_matches_batch(spark, sf_dir):
    ev = jobs.stream_events(spark, sf_dir)
    assert ev.isStreaming
    got = jobs.run_to_memory(jobs.tumbling_counts(ev), "t_tumbling").toPandas()
    want = (
        registry.queries()["q_stream_tumbling"](spark, sf_dir)
        .withColumnRenamed("sum_value", "sum_value")
        .toPandas()
    )
    pd.testing.assert_frame_equal(_canon(got), _canon(want), check_dtype=False)


def test_sliding_stream_matches_batch(spark, sf_dir):
    ev = jobs.stream_events(spark, sf_dir)
    got = jobs.run_to_memory(jobs.sliding_counts(ev), "t_sliding").toPandas()
    want = registry.queries()["q_stream_sliding"](spark, sf_dir).toPandas()
    pd.testing.assert_frame_equal(_canon(got), _canon(want), check_dtype=False)


def test_session_stream_matches_batch(spark, sf_dir):
    ev = jobs.stream_events(spark, sf_dir)
    got = jobs.run_to_memory(jobs.session_counts(ev), "t_session").toPandas()
    batch = registry.queries()["q_stream_session"](spark, sf_dir).toPandas()
    want = batch[["user_id", "sess_start_us", "n_events", "sum_value"]]
    pd.testing.assert_frame_equal(_canon(got), _canon(want), check_dtype=False)


def test_stream_stream_join_matches_batch(spark, sf_dir):
    ev = jobs.stream_events(spark, sf_dir)
    got = jobs.run_to_memory(
        jobs.click_purchase_join(ev), "t_ssjoin", output_mode="append"
    ).toPandas()
    want = registry.queries()["q_stream_join"](spark, sf_dir).toPandas()
    pd.testing.assert_frame_equal(_canon(got), _canon(want), check_dtype=False)


def test_foreach_batch_mor_upsert_keeps_latest(spark, sf_dir, tmp_path):
    path = str(tmp_path / "mor")
    ev = jobs.stream_events(spark, sf_dir)
    # replay the stream twice: every key arrives in two versions
    jobs.foreach_batch_mor_upsert(ev.union(ev), path)
    merged = jobs.read_mor_upserted(spark, path, key="event_id")
    n_events = spark.read.parquet(f"{sf_dir}/events.parquet").count()
    assert merged.count() == n_events
    raw = spark.read.parquet(path)
    assert raw.count() >= 2 * n_events  # sink appended, never rewrote
    assert merged.select("event_id").distinct().count() == n_events


def test_dedup_stream_drops_repeats(spark, sf_dir):
    ev = jobs.stream_events(spark, sf_dir)
    doubled = ev.union(ev)  # replay the stream twice
    got = jobs.run_to_memory(
        jobs.dedup_stream(doubled).select("event_id"), "t_dedup", output_mode="append"
    ).toPandas()
    n_events = spark.read.parquet(f"{sf_dir}/events.parquet").count()
    assert len(got) == n_events
    assert got["event_id"].is_unique


def test_stream_stream_join_across_microbatches(spark, sf_dir, tmp_path):
    """Replayed fixture: events split into 4 chronological files driven
    one file per trigger, so the watermark genuinely advances BETWEEN
    micro-batches and cross-batch join state is exercised (a click in
    batch 1 matching a purchase in batch 3) and expired (state for rows
    older than watermark + interval is dropped). The result must still
    equal the batch twin — the end-to-end guarantee of the
    watermark-bounded stream-stream interval join."""
    import os

    from pyspark.sql import functions as F

    from meta_iterative_mapreduce_spark.functions.time import ts_ltz, ts_us
    from meta_iterative_mapreduce_spark.io import load_table

    ev = load_table(spark, sf_dir, "events").withColumn("__t", ts_us("ts"))
    qs = [r[0] for r in ev.agg(
        F.expr("percentile(__t, array(0.25D, 0.5D, 0.75D))")
    ).collect()][0]
    landing = str(tmp_path / "landing")
    os.makedirs(landing)
    bounds = [None, *[int(q) for q in qs], None]
    for i in range(4):
        part = ev
        if bounds[i] is not None:
            part = part.filter(F.col("__t") >= bounds[i])
        if bounds[i + 1] is not None:
            part = part.filter(F.col("__t") < bounds[i + 1])
        staged = str(tmp_path / f"part{i}")
        part.drop("__t").coalesce(1).write.parquet(staged)
        for f in os.listdir(staged):
            if f.endswith(".parquet"):
                os.rename(
                    os.path.join(staged, f),
                    os.path.join(landing, f"{i}_chunk.parquet"),
                )
    schema = spark.read.parquet(landing).schema
    src = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", "1")
        .parquet(landing)
        .withColumn("ts", ts_ltz("ts"))
    )
    got = jobs.run_to_memory(
        jobs.click_purchase_join(src), "t_ssjoin_mb", output_mode="append"
    ).toPandas()
    want = registry.queries()["q_stream_join"](spark, sf_dir).toPandas()
    pd.testing.assert_frame_equal(_canon(got), _canon(want), check_dtype=False)


def test_stream_static_enrichment_matches_batch(spark, sf_dir):
    """Stream-static dim join: streamed events enriched with the
    static customer dim (user_id -> c_custkey) must equal the batch
    join — no state, no watermark, dim re-joined per micro-batch."""
    from meta_iterative_mapreduce_spark.streaming.jobs import (
        enrich_with_dim,
        run_to_memory,
        stream_events,
    )

    dim = spark.read.parquet(f"{sf_dir}/customer.parquet").select(
        "c_custkey", "c_mktsegment"
    )
    out = enrich_with_dim(
        stream_events(spark, sf_dir), dim, "user_id", "c_custkey"
    ).select("event_id", "user_id", "c_mktsegment")
    got = run_to_memory(out, "enrich_test", output_mode="append")
    from pyspark.sql import functions as F

    batch = (
        spark.read.parquet(f"{sf_dir}/events.parquet")
        .join(dim, F.col("user_id") == F.col("c_custkey"))
        .select("event_id", "user_id", "c_mktsegment")
    )
    assert sorted(map(tuple, got.collect())) == sorted(
        map(tuple, batch.collect())
    )


def test_outer_stream_stream_join_matches_batch_twin(spark, sf_dir):
    """LEFT OUTER stream-stream join: matched pairs inline plus
    null-purchase rows for every click whose match horizon closed
    before the terminal watermark — the availableNow run's final
    no-data micro-batch must flush exactly the set the batch twin
    (q_stream_join_outer) computes; the open tail stays withheld."""
    ev = jobs.stream_events(spark, sf_dir)
    got = jobs.run_to_memory(
        jobs.click_purchase_join_outer(ev), "t_ssjoin_o", output_mode="append"
    ).toPandas()
    want = registry.queries()["q_stream_join_outer"](spark, sf_dir).toPandas()
    assert got["purchase_id"].isna().sum() > 0  # nulls actually emitted
    pd.testing.assert_frame_equal(_canon(got), _canon(want), check_dtype=False)


def test_outer_join_across_microbatches_matches_twin(spark, sf_dir, tmp_path):
    """Chronological 4-file replay: null emission happens DURING the
    run as the watermark passes each click's horizon, not only at the
    terminal flush — the union of mid-run and final emissions must
    still equal the twin."""
    import os

    from pyspark.sql import functions as F

    from meta_iterative_mapreduce_spark.functions.time import ts_ltz, ts_us
    from meta_iterative_mapreduce_spark.io import load_table

    ev = load_table(spark, sf_dir, "events").withColumn("__t", ts_us("ts"))
    qs = [r[0] for r in ev.agg(
        F.expr("percentile(__t, array(0.25D, 0.5D, 0.75D))")
    ).collect()][0]
    landing = str(tmp_path / "landing_o")
    os.makedirs(landing)
    bounds = [None, *[int(q) for q in qs], None]
    for i in range(4):
        part = ev
        if bounds[i] is not None:
            part = part.filter(F.col("__t") >= bounds[i])
        if bounds[i + 1] is not None:
            part = part.filter(F.col("__t") < bounds[i + 1])
        staged = str(tmp_path / f"part_o{i}")
        part.drop("__t").coalesce(1).write.parquet(staged)
        for f in os.listdir(staged):
            if f.endswith(".parquet"):
                os.rename(
                    os.path.join(staged, f),
                    os.path.join(landing, f"{i}_chunk.parquet"),
                )
    schema = spark.read.parquet(landing).schema
    src = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", "1")
        .parquet(landing)
        .withColumn("ts", ts_ltz("ts"))
    )
    got = jobs.run_to_memory(
        jobs.click_purchase_join_outer(src), "t_ssjoin_o_mb", output_mode="append"
    ).toPandas()
    want = registry.queries()["q_stream_join_outer"](spark, sf_dir).toPandas()
    pd.testing.assert_frame_equal(_canon(got), _canon(want), check_dtype=False)


def test_dedup_stream_matches_batch_twin_aggregates(spark, sf_dir):
    """The streamed dedup of a redelivered stream must reproduce the
    batch twin's per-type aggregates (q_stream_dedup's contract) —
    not just row uniqueness."""
    from pyspark.sql import functions as F

    ev = jobs.stream_events(spark, sf_dir)
    redelivered = ev.filter(F.col("event_id") % 7 == 0)
    got = (
        jobs.run_to_memory(
            jobs.dedup_stream(ev.union(redelivered)),
            "t_dedup_twin",
            output_mode="append",
        )
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum("event_id").cast("bigint").alias("sum_id"),
            F.sum(
                F.floor(F.col("value") * 10000 + F.lit(0.5)).cast("bigint")
            ).cast("bigint").alias("sum_value_e4"),
        )
        .toPandas()
    )
    want = registry.queries()["q_stream_dedup"](spark, sf_dir).toPandas()
    pd.testing.assert_frame_equal(_canon(got), _canon(want), check_dtype=False)


def test_dedup_state_survives_across_microbatches(spark, sf_dir, tmp_path):
    """dropDuplicatesWithinWatermark must drop a redelivery that
    arrives in a LATER micro-batch (state-store dedup, not just
    within-batch distinct): file 2 replays file 1's first rows with
    identical ids and timestamps; driven one file per trigger, the
    replayed ids must come out exactly once."""
    import os

    from pyspark.sql import functions as F

    from meta_iterative_mapreduce_spark.functions.time import ts_ltz, ts_us
    from meta_iterative_mapreduce_spark.io import load_table

    ev = load_table(spark, sf_dir, "events").withColumn("__t", ts_us("ts"))
    mid = ev.agg(F.expr("percentile(__t, 0.5D)")).collect()[0][0]
    landing = str(tmp_path / "landing_d")
    os.makedirs(landing)
    first = ev.filter(F.col("__t") < mid).drop("__t")
    second = ev.filter(F.col("__t") >= mid).drop("__t")
    # the replay: early rows re-delivered inside the second batch
    replay = first.orderBy("event_id").limit(200)
    for i, part in enumerate([first, second.unionByName(replay)]):
        staged = str(tmp_path / f"dpart{i}")
        part.coalesce(1).write.parquet(staged)
        for f in os.listdir(staged):
            if f.endswith(".parquet"):
                os.rename(
                    os.path.join(staged, f),
                    os.path.join(landing, f"{i}_chunk.parquet"),
                )
    schema = spark.read.parquet(landing).schema
    src = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", "1")
        .parquet(landing)
        .withColumn("ts", ts_ltz("ts"))
    )
    got = jobs.run_to_memory(
        jobs.dedup_stream(src).select("event_id"),
        "t_dedup_xbatch",
        output_mode="append",
    ).toPandas()
    n_events = spark.read.parquet(f"{sf_dir}/events.parquet").count()
    assert len(got) == n_events  # replays dropped ACROSS the batch gap
    assert got["event_id"].is_unique
