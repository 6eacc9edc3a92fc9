"""Invariants for incremental view maintenance and CDC snapshot diff."""

from __future__ import annotations

import pyspark.sql.functions as F
import pytest

from meta_iterative_mapreduce_spark.io import load_table
from meta_iterative_mapreduce_spark.operators.incremental import (
    q_agg_incremental,
    q_cdc_snapshot_diff,
)

def test_incremental_equals_full_recompute(spark, sf_dir):
    """The partial-merge refresh must be exactly the full recompute."""
    inc = q_agg_incremental(spark, sf_dir)
    full = (
        load_table(spark, sf_dir, "orders")
        .groupBy("o_custkey")
        .agg(
            F.round(F.sum("o_totalprice"), 4).alias("sum_price"),
            F.count(F.lit(1)).alias("n"),
        )
    )
    assert inc.exceptAll(full).count() == 0
    assert full.exceptAll(inc).count() == 0


def test_cdc_diff_classification(spark, sf_dir):
    """Every emitted op agrees with the snapshot-construction rules."""
    diff = q_cdc_snapshot_diff(spark, sf_dir).cache()
    rows = {r["o_orderkey"]: r for r in diff.collect()}
    assert rows, "diff must be non-empty"
    for k, r in rows.items():
        if r["op"] == "I":
            # in B only: key was dropped from A (div by 3) but kept in B
            assert k % 3 == 0 and k % 5 != 0
            assert r["old_price"] is None and r["new_price"] is not None
        elif r["op"] == "D":
            assert k % 5 == 0 and k % 3 != 0
            assert r["new_price"] is None and r["old_price"] is not None
        else:
            assert r["op"] == "U"
            # updates are exactly the re-priced keys present in both
            assert k % 7 == 0 and k % 3 != 0 and k % 5 != 0
            assert r["new_price"] == pytest.approx(round(r["old_price"] * 1.05, 4))
    # unchanged keys never appear
    o = load_table(spark, sf_dir, "orders")
    unchanged = o.filter(
        (F.col("o_orderkey") % 3 != 0)
        & (F.col("o_orderkey") % 5 != 0)
        & (F.col("o_orderkey") % 7 != 0)
    ).select("o_orderkey")
    assert diff.join(unchanged, "o_orderkey", "semi").count() == 0
    diff.unpersist()


def test_incremental_refresh_over_versioned_log(spark, sf_dir, tmp_path):
    """End-to-end cohesion of the storage + incremental tiers: commit
    orders v1, append a delta as v2, and refresh the per-customer
    aggregate by merging v1's materialized partials with partials of
    ONLY the delta (the version diff) — result equals a full
    recompute over v2, with no rescan of v1's rows."""
    from pyspark.sql import functions as F

    from meta_iterative_mapreduce_spark.operators.incremental import (
        merge_partials,
    )
    from meta_iterative_mapreduce_spark.sources.versioned import (
        append_version,
        read_version,
        write_version,
    )

    table = str(tmp_path / "orders_log")
    o = spark.read.parquet(f"{sf_dir}/orders.parquet").select(
        "o_custkey", "o_totalprice", "o_orderkey"
    )
    base = o.filter(F.col("o_orderkey") % 4 != 0)
    delta = o.filter(F.col("o_orderkey") % 4 == 0)
    write_version(base, table)
    append_version(delta, table)

    def partials(df):
        return df.groupBy("o_custkey").agg(
            F.sum("o_totalprice").alias("sum_price"),
            F.count(F.lit(1)).alias("n"),
        )

    refreshed = merge_partials(
        partials(read_version(spark, table, 1)).unionByName(partials(delta)),
        ["o_custkey"],
    )
    full = partials(read_version(spark, table, 2))
    a = {
        r["o_custkey"]: (round(r["sum_price"], 4), r["n"])
        for r in refreshed.collect()
    }
    b = {
        r["o_custkey"]: (round(r["sum_price"], 4), r["n"])
        for r in full.collect()
    }
    assert a == b and len(a) > 100


def test_scd2_intervals_chain_over_multiple_batches(spark):
    """Three replayed change batches must produce chained, gapless
    validity intervals per key with exactly one current row — the
    multi-batch contract the registered query (one batch) can't
    exercise."""
    from pyspark.sql import functions as F

    from meta_iterative_mapreduce_spark.operators.merge import scd2_apply

    base = spark.createDataFrame(
        [(1, 100, 0), (2, 200, 0)], "k long, v long, eff_ts long"
    )
    # three replayed change batches for key 1 (scd2_apply is pure over
    # the union, so replay = one union of all batches)
    changes = spark.createDataFrame(
        [(1, 110, 1), (1, 120, 2), (1, 130, 3)],
        "k long, v long, eff_ts long",
    )
    out = scd2_apply(base, changes, "k", "eff_ts")
    rows = sorted(
        ((r["k"], r["valid_from"], r["valid_to"], r["is_current"]))
        for r in out.collect()
    )
    assert rows == [
        (1, 0, 1, False),
        (1, 1, 2, False),
        (1, 2, 3, False),
        (1, 3, -1, True),
        (2, 0, -1, True),
    ]
