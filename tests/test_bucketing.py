"""Bucketed-table co-located join: the zero-shuffle fact⋈fact path.

At 100 TB the winning physical design for repeated joins on the same
key is bucketing both tables by that key at write time — then every
join on the key is Exchange-free (only per-bucket sorts remain).
This test materializes bucketed copies of lineitem and orders and
asserts the join plan contains NO shuffle.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from meta_iterative_mapreduce_spark.io import load_table


@pytest.fixture(scope="module")
def bucketed_tables(spark, sf_dir):
    spark.sql("DROP TABLE IF EXISTS li_bucketed")
    spark.sql("DROP TABLE IF EXISTS o_bucketed")
    (
        load_table(spark, sf_dir, "lineitem")
        .select("l_orderkey", "l_quantity", "l_extendedprice")
        .write.mode("overwrite")
        .bucketBy(8, "l_orderkey")
        .sortBy("l_orderkey")
        .saveAsTable("li_bucketed")
    )
    (
        load_table(spark, sf_dir, "orders")
        .select("o_orderkey", "o_orderstatus", "o_totalprice")
        .write.mode("overwrite")
        .bucketBy(8, "o_orderkey")
        .sortBy("o_orderkey")
        .saveAsTable("o_bucketed")
    )
    yield
    spark.sql("DROP TABLE IF EXISTS li_bucketed")
    spark.sql("DROP TABLE IF EXISTS o_bucketed")


def test_bucketed_join_has_no_shuffle(spark, sf_dir, bucketed_tables):
    li = spark.table("li_bucketed")
    # hint the merge join: without it the planner broadcasts the small
    # side (fine too, but then bucketing is moot); the claim under test
    # is the SMJ-without-shuffle path both sides keep at fact⋈fact scale
    o = spark.table("o_bucketed").hint("merge")
    joined = li.join(o, li.l_orderkey == o.o_orderkey).select(
        "l_orderkey", "l_quantity", "o_totalprice"
    )
    plan = joined._jdf.queryExecution().executedPlan().toString()
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


def test_unbucketed_join_does_shuffle(spark, sf_dir):
    """Control: the same join over plain parquet shuffles both sides."""
    li = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders").hint("merge")
    joined = li.join(o, li.l_orderkey == o.o_orderkey)
    plan = joined._jdf.queryExecution().executedPlan().toString()
    assert "Exchange hashpartitioning" in plan
