"""Cross-job sketch persistence e2e: partials written in job 1,
delta appended in job 2, merge-only job equals full recompute —
the rescan-free incremental contract of operators/sketch_persist.py."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from meta_iterative_mapreduce_spark.io import load_table
from meta_iterative_mapreduce_spark.operators.sketch_persist import (
    hll_partials,
    kll_partials,
    merged_hll_estimate,
    merged_kll_quantile,
)
from meta_iterative_mapreduce_spark.sources import versioned
from meta_iterative_mapreduce_spark import registry


def test_hll_persisted_merge_equals_full_recompute(spark, sf_dir, tmp_path):
    """The exactness claim: HLL state depends only on the hashed value
    SET, so merging persisted partials over disjoint batches yields
    the IDENTICAL estimate to one sketch over the full table."""
    table = os.path.join(str(tmp_path), "ev_log")
    ev = load_table(spark, sf_dir, "events").select(
        "event_id", "event_type", "user_id"
    )
    hist = ev.filter(F.col("event_id") % 4 != 0)
    delta = ev.filter(F.col("event_id") % 4 == 0)

    v1 = versioned.write_version(
        hll_partials(hist, ["event_type"], "user_id"), table
    )
    v2 = versioned.append_version(
        hll_partials(delta, ["event_type"], "user_id"), table
    )
    assert (v1, v2) == (1, 2)

    merged = {
        r["event_type"]: (r["n_est"], r["n_rows"])
        for r in merged_hll_estimate(
            spark, table, ["event_type"]
        ).collect()
    }
    full = {
        r["event_type"]: (r["n_est"], r["n_rows"])
        for r in ev.groupBy("event_type")
        .agg(
            F.hll_sketch_estimate(
                F.hll_sketch_agg("user_id", 14)
            ).alias("n_est"),
            F.count(F.lit(1)).alias("n_rows"),
        )
        .collect()
    }
    # bit-identical estimates AND exact batch-row accounting
    assert merged == full

    # time travel: v1 sees only the historical batch's partials
    v1_rows = dict(
        merged_hll_estimate(spark, table, ["event_type"], version=1)
        .select("event_type", "n_rows")
        .collect()
    )
    hist_counts = dict(hist.groupBy("event_type").count().collect())
    assert v1_rows == hist_counts


def test_kll_persisted_quantile_within_exact_window(spark, sf_dir, tmp_path):
    """KLL merge is rank-error-bounded, not bit-stable: the merged
    persisted median must land inside the exact (p40, p60) value
    window (>=10x the sketch's ~1% rank error)."""
    table = os.path.join(str(tmp_path), "kll_log")
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_returnflag", "l_extendedprice"
    )
    hist = li.filter(F.col("l_orderkey") % 3 != 0)
    delta = li.filter(F.col("l_orderkey") % 3 == 0)
    versioned.write_version(
        kll_partials(hist, ["l_returnflag"], "l_extendedprice"), table
    )
    versioned.append_version(
        kll_partials(delta, ["l_returnflag"], "l_extendedprice"), table
    )
    est = merged_kll_quantile(spark, table, 0.5).collect()[0]["q_est"]
    lo, hi = (
        li.agg(
            F.expr(
                "percentile(l_extendedprice, array(0.40D, 0.60D))"
            ).alias("ps")
        )
        .select(F.element_at("ps", 1), F.element_at("ps", 2))
        .collect()[0]
    )
    assert lo <= est <= hi


def test_append_writes_only_delta_files(spark, sf_dir, tmp_path):
    """Log-structured append: v2's manifest must reference v1's files
    UNCHANGED plus only the delta's new files — the O(delta) write
    cost that makes daily sketch jobs rescan-free."""
    import json

    table = os.path.join(str(tmp_path), "files_log")
    ev = load_table(spark, sf_dir, "events").select(
        "event_id", "event_type", "user_id"
    )
    versioned.write_version(
        hll_partials(
            ev.filter(F.col("event_id") % 4 != 0), ["event_type"], "user_id"
        ),
        table,
    )
    versioned.append_version(
        hll_partials(
            ev.filter(F.col("event_id") % 4 == 0), ["event_type"], "user_id"
        ),
        table,
    )
    m1 = json.load(open(versioned._manifest_path(table, 1)))
    m2 = json.load(open(versioned._manifest_path(table, 2)))
    assert set(m1["files"]) < set(m2["files"])
    assert all(f.startswith("data/v000002-") for f in
               set(m2["files"]) - set(m1["files"]))


def test_registered_query_flags_green_and_idempotent(spark, sf_dir):
    """q_sketch_hll_persisted: every est_ok TRUE, n_rows reconstructs
    the full table, and a second invocation reuses the committed log
    (no new versions)."""
    fn = registry.queries()["q_sketch_hll_persisted"]
    rows = fn(spark, sf_dir).collect()
    assert rows and all(r["est_ok"] for r in rows)
    total = sum(r["n_rows"] for r in rows)
    assert total == load_table(spark, sf_dir, "events").count()

    from meta_iterative_mapreduce_spark.operators.sketch_persist import (
        _log_path,
    )

    table = _log_path(sf_dir, "ev_user_hll")
    n_before = len(versioned.versions(table))
    fn(spark, sf_dir).collect()
    assert len(versioned.versions(table)) == n_before == 2


def test_kll_persisted_quantile_within_rank_window(spark, sf_dir, tmp_path):
    """KLL twin: partials persisted across two batches, merged
    quantile must land inside the exact (p40, p60) value window —
    rank-error-bounded (not bit-stable like HLL), so the contract is
    the window, plus exact batch-row accounting in the manifests."""
    table = os.path.join(str(tmp_path), "kll_log")
    ev = load_table(spark, sf_dir, "events").select(
        "event_id", "event_type", "value"
    )
    hist = ev.filter(F.col("event_id") % 4 != 0)
    delta = ev.filter(F.col("event_id") % 4 == 0)
    v1 = versioned.write_version(
        kll_partials(hist, ["event_type"], "value"), table
    )
    v2 = versioned.append_version(
        kll_partials(delta, ["event_type"], "value"), table
    )
    assert (v1, v2) == (1, 2)

    est = merged_kll_quantile(spark, table, 0.5).first()["q_est"]
    lo, hi = ev.select(
        F.expr("percentile(value, 0.40D)"), F.expr("percentile(value, 0.60D)")
    ).first()
    assert lo <= est <= hi

    # manifests' row accounting reconstructs the table exactly
    parts = versioned.read_version(spark, table)
    assert parts.agg(F.sum("n_batch_rows")).first()[0] == ev.count()


def test_kll_persisted_registered_query_contract(spark, sf_dir):
    """q_sketch_kll_persisted end-to-end at the fixture: one row, both
    flags TRUE, n_rows equals the raw table count."""
    from meta_iterative_mapreduce_spark.operators.sketch_persist import (
        q_sketch_kll_persisted,
    )

    row = q_sketch_kll_persisted(spark, sf_dir).first()
    n = load_table(spark, sf_dir, "events").count()
    assert (row["scope"], row["n_rows"]) == ("ALL", n)
    assert row["median_ok"] and row["p99_ok"]
