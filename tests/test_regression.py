"""Algorithmic property checks for the regression family
(SURVEY.md §5.2.4)."""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from meta_iterative_mapreduce_spark.io import load_table
from meta_iterative_mapreduce_spark.operators import regression as R


def _li(spark, sf_dir):
    return load_table(spark, sf_dir, "lineitem")


def test_sufficient_stats_equals_builtin(spark, sf_dir):
    """Explicit sufficient-statistics OLS == Spark's regr_* built-ins."""
    li = _li(spark, sf_dir)
    ours = R.ols_from_stats(
        R.sufficient_stats(li, "l_quantity", "l_extendedprice")
    ).collect()[0]
    builtin = R.fit_exact(li, "l_quantity", "l_extendedprice").collect()[0]
    assert math.isclose(ours["w0"], builtin["w0"], rel_tol=1e-9)
    assert math.isclose(ours["w1"], builtin["w1"], rel_tol=1e-9)
    assert ours["n_rows"] == builtin["n_rows"]


def test_averaged_fit_with_one_chunk_is_exact(spark, sf_dir):
    """Model averaging degenerates to exact OLS when chunks → 1."""
    li = _li(spark, sf_dir)
    avg1 = R.averaged_fit(
        li, "l_quantity", "l_extendedprice", F.lit(0)
    ).collect()[0]
    exact = R.fit_exact(li, "l_quantity", "l_extendedprice").collect()[0]
    assert math.isclose(avg1["w0"], exact["w0"], rel_tol=1e-9)
    assert math.isclose(avg1["w1"], exact["w1"], rel_tol=1e-9)


def test_meta_fit_collapses_to_chunked(spark, sf_dir):
    """Two-level averaging with a single super-chunk == one-level."""
    li = _li(spark, sf_dir)
    chunk = F.col("l_orderkey") % 8
    meta = R.meta_fit(li, "l_quantity", "l_extendedprice", chunk, F.lit(0)).collect()[0]
    one = (
        R.chunked_fit(li, "l_quantity", "l_extendedprice", chunk)
        .agg(F.avg("w0").alias("w0"), F.avg("w1").alias("w1"))
        .collect()[0]
    )
    assert math.isclose(meta["w0"], one["w0"], rel_tol=1e-9)
    assert math.isclose(meta["w1"], one["w1"], rel_tol=1e-9)


def test_ema_recursion_matches_closed_form(spark, sf_dir):
    """Driver-loop EMA == the closed-form geometric expansion used by
    q_regression_iterative_ema (α^(T−1)·f_1 + (1−α)·Σ α^(T−t)·f_t)."""
    li = _li(spark, sf_dir)
    batch = F.date_format("l_shipdate", "yyyy-MM")
    chunk = F.col("l_orderkey") % 8
    res = R.iterative_ema_fit(
        li, "l_quantity", "l_extendedprice", batch, chunk, eps=0.0
    )
    fits = (
        R.batch_fits(li, "l_quantity", "l_extendedprice", batch, chunk)
        .orderBy("batch")
        .collect()
    )
    a = R.DEFAULT_ALPHA
    T = len(fits)
    w1 = (a ** (T - 1)) * fits[0]["f1"] + sum(
        (1 - a) * (a ** (T - t)) * fits[t - 1]["f1"] for t in range(2, T + 1)
    )
    assert math.isclose(res.w1, w1, rel_tol=1e-9)
    assert res.n_batches == T


def test_iterative_loop_matches_single_pass(spark, sf_dir):
    """The reference-faithful per-batch driver loop and the single-pass
    batch_fits + driver EMA produce identical weights."""
    li = _li(spark, sf_dir).filter(F.col("l_shipdate") < F.lit("1995-07-01").cast("timestamp"))
    batch = F.date_format("l_shipdate", "yyyy-MM")
    chunk = F.col("l_orderkey") % 4
    fast = R.iterative_ema_fit(li, "l_quantity", "l_extendedprice", batch, chunk, eps=0.0)
    slow = R.iterative_fit_loop(li, "l_quantity", "l_extendedprice", batch, chunk, eps=0.0)
    assert math.isclose(fast.w0, slow.w0, rel_tol=1e-9)
    assert math.isclose(fast.w1, slow.w1, rel_tol=1e-9)


def test_flagship_entry_schema(spark):
    df = R.flagship(spark)
    rows = df.collect()
    assert len(rows) == 1
    r = rows[0]
    assert r["n_batches"] > 0 and r["n_iters"] >= 1
    assert not math.isnan(r["w0"]) and not math.isnan(r["w1"])
