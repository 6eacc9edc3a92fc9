"""Watermark semantics: late data beyond the watermark is dropped.

The canonical production shape: a checkpointed streaming aggregation
processes the on-time data and stops; the checkpoint persists the
advanced watermark; a LATE file lands; the restarted query must drop
the late rows (numRowsDroppedByWatermark > 0) and emit no late
windows. (Within a single un-checkpointed run the file-source
watermark lags differently — the checkpoint restart is the shape that
pins the guarantee.)
"""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from meta_iterative_mapreduce_spark.functions.time import ts_ltz, ts_us, ts_us_ltz
from meta_iterative_mapreduce_spark.io import load_table


@pytest.fixture()
def wm_env(spark, sf_dir, tmp_path):
    ev = load_table(spark, sf_dir, "events").withColumn("ts_us", ts_us("ts"))
    split = int(ev.agg(F.percentile("ts_us", 0.5)).collect()[0][0])
    landing = str(tmp_path / "landing")
    os.makedirs(landing)
    ev.filter(F.col("ts_us") >= split).drop("ts_us").coalesce(1).write.parquet(
        str(tmp_path / "a")
    )
    ev.filter(F.col("ts_us") < split).drop("ts_us").coalesce(1).write.parquet(
        str(tmp_path / "b")
    )
    for f in os.listdir(str(tmp_path / "a")):
        if f.endswith(".parquet"):
            os.rename(str(tmp_path / "a" / f), os.path.join(landing, "0_ontime.parquet"))
    return {
        "landing": landing,
        "late_src": str(tmp_path / "b"),
        "ckpt": str(tmp_path / "ckpt"),
        "out": str(tmp_path / "out"),
        "split": split,
    }


def _run(spark, env, schema):
    src = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", "1")
        .parquet(env["landing"])
        # watermarks demand TIMESTAMP: epoch-preserving NTZ->ltz ingest
        .withColumn("ts", ts_ltz("ts"))
    )
    agg = (
        src.withWatermark("ts", "10 minutes")
        .groupBy(F.window("ts", "5 minutes"))
        .agg(F.count(F.lit(1)).alias("n"))
        # window.start is ltz (post ts_ltz ingest): ltz-safe extractor
        .select(ts_us_ltz("window.start").alias("w"), "n")
    )
    q = (
        agg.writeStream.outputMode("append")
        .format("parquet")
        .option("path", env["out"])
        .option("checkpointLocation", env["ckpt"])
        .trigger(availableNow=True)
        .start()
    )
    q.processAllAvailable()
    dropped = sum(
        op["numRowsDroppedByWatermark"]
        for p in q.recentProgress
        for op in p["stateOperators"]
    )
    q.stop()
    return dropped


def test_watermark_drops_late_rows_across_restart(spark, wm_env):
    schema = spark.read.parquet(wm_env["landing"]).schema
    dropped1 = _run(spark, wm_env, schema)
    assert dropped1 == 0  # on-time batch: nothing late yet
    # the late file lands after the watermark advanced past it
    for f in os.listdir(wm_env["late_src"]):
        if f.endswith(".parquet"):
            os.rename(
                os.path.join(wm_env["late_src"], f),
                os.path.join(wm_env["landing"], "1_late.parquet"),
            )
    dropped2 = _run(spark, wm_env, schema)
    assert dropped2 > 0  # the restored watermark rejected late rows
    out = spark.read.parquet(wm_env["out"])
    # window starts are floored to the 5-minute grid, so a legitimate
    # on-time window containing the split instant starts up to one
    # window width BEFORE split — compare against the floored boundary,
    # not the raw split, or the assertion is off by up to one window
    split_floor = wm_env["split"] - (wm_env["split"] % 300_000_000)
    assert out.filter(F.col("w") < split_floor).count() == 0  # no late windows
    assert out.agg(F.sum("n")).collect()[0][0] > 0  # on-time windows emitted
