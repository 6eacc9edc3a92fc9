"""Bucketed-table co-located join: the zero-shuffle fact⋈fact path.

At 100 TB the winning physical design for repeated joins on the same
key is bucketing both tables by that key at write time — then every
join on the key is Exchange-free (only per-bucket sorts remain, zero
here because sortBy persisted the order). These tests pin the plan of
the PRODUCTION query (plans/bucketed.py: q_join_bucketed) and keep a
shuffling unbucketed control.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from meta_iterative_mapreduce_spark.io import load_table
from meta_iterative_mapreduce_spark.plans.bucketed import (
    bucketed_join_frame,
    q_join_bucketed,
)


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def test_bucketed_join_has_no_shuffle(spark, sf_dir):
    joined = bucketed_join_frame(spark, sf_dir).select(
        "l_orderkey", "l_quantity", "o_totalprice"
    )
    plan = _plan(joined)
    assert "SortMergeJoin" in plan, plan
    assert "Exchange hashpartitioning" not in plan, plan
    # and it's still correct
    expected = (
        load_table(spark, sf_dir, "lineitem")
        .join(
            load_table(spark, sf_dir, "orders"),
            F.col("l_orderkey") == F.col("o_orderkey"),
        )
        .count()
    )
    assert joined.count() == expected


def test_registered_query_matches_plain_join(spark, sf_dir):
    """q_join_bucketed == the same aggregate over plain parquet (the
    in-repo twin of its DuckDB oracle)."""
    got = {
        r["o_orderstatus"]: (r["n_rows"], r["sum_qty_e2"], r["sum_price_e2"])
        for r in q_join_bucketed(spark, sf_dir).collect()
    }
    li = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders")
    plain = (
        li.join(o, F.col("l_orderkey") == F.col("o_orderkey"))
        .groupBy("o_orderstatus")
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.sum(F.floor(F.col("l_quantity") * 100 + 0.5).cast("long"))
            .cast("long")
            .alias("sum_qty_e2"),
            F.sum(F.floor(F.col("o_totalprice") * 100 + 0.5).cast("long"))
            .cast("long")
            .alias("sum_price_e2"),
        )
    )
    want = {
        r["o_orderstatus"]: (r["n_rows"], r["sum_qty_e2"], r["sum_price_e2"])
        for r in plain.collect()
    }
    assert got == want


def test_unbucketed_join_does_shuffle(spark, sf_dir):
    """Control: the same join over plain parquet shuffles both sides."""
    li = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders").hint("merge")
    joined = li.join(o, li.l_orderkey == o.o_orderkey)
    assert "Exchange hashpartitioning" in _plan(joined)
