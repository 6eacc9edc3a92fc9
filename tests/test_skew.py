"""Salted join / two-phase agg equivalence with their plain forms."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from meta_iterative_mapreduce_spark.io import load_table
from meta_iterative_mapreduce_spark.operators.skew import salted_join, two_phase_agg


def test_salted_join_matches_plain_join(spark, sf_dir):
    li = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_quantity")
    o = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_orderstatus")
    plain = (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .groupBy("o_orderstatus")
        .agg(F.count(F.lit(1)).alias("n"), F.sum("l_quantity").alias("q"))
    )
    salted = (
        salted_join(li, o, "l_orderkey", "o_orderkey", n_salts=4)
        .groupBy("o_orderstatus")
        .agg(F.count(F.lit(1)).alias("n"), F.sum("l_quantity").alias("q"))
    )
    assert sorted(map(tuple, plain.collect())) == sorted(map(tuple, salted.collect()))


def test_salted_join_left_keeps_unmatched_big_rows(spark, sf_dir):
    o = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    c = (
        load_table(spark, sf_dir, "customer")
        .select("c_custkey", "c_mktsegment")
        .filter(F.col("c_custkey") % 2 == 0)  # force unmatched big rows
    )
    plain = o.join(c, o.o_custkey == c.c_custkey, "left")
    salted = salted_join(o, c, "o_custkey", "c_custkey", n_salts=4, how="left")
    assert salted.count() == plain.count()
    assert (
        salted.filter(F.col("c_custkey").isNull()).count()
        == plain.filter(F.col("c_custkey").isNull()).count()
    )


def test_salted_join_rejects_outer_forms(spark, sf_dir):
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    for how in ("right", "full", "outer"):
        with pytest.raises(ValueError, match="salted_join supports"):
            salted_join(o, c, "o_custkey", "c_custkey", how=how)


def test_two_phase_agg_matches_plain_agg(spark, sf_dir):
    li = load_table(spark, sf_dir, "lineitem")
    plain = li.groupBy("l_returnflag").agg(
        F.sum("l_quantity").alias("sum_l_quantity"),
        F.min("l_extendedprice").alias("min_l_extendedprice"),
        F.max("l_extendedprice").alias("max_l_extendedprice"),
    )
    twop = two_phase_agg(
        li,
        "l_returnflag",
        [("l_quantity", "sum"), ("l_extendedprice", "min"), ("l_extendedprice", "max")],
        n_salts=4,
    )
    p = {r["l_returnflag"]: r for r in plain.collect()}
    t = {r["l_returnflag"]: r for r in twop.collect()}
    assert p.keys() == t.keys()
    for k in p:
        assert abs(p[k]["sum_l_quantity"] - t[k]["sum_l_quantity"]) < 1e-6
        assert p[k]["min_l_extendedprice"] == t[k]["min_l_extendedprice"]
        assert p[k]["max_l_extendedprice"] == t[k]["max_l_extendedprice"]


def test_tree_aggregate_fit_matches_exact(spark, sf_dir):
    from meta_iterative_mapreduce_spark.operators import regression as R

    li = load_table(spark, sf_dir, "lineitem")
    w0, w1, n = R.tree_aggregate_fit(li, "l_quantity", "l_extendedprice")
    exact = R.fit_exact(li, "l_quantity", "l_extendedprice").collect()[0]
    assert n == exact["n_rows"]
    assert abs(w0 - exact["w0"]) / abs(exact["w0"]) < 1e-9
    assert abs(w1 - exact["w1"]) / abs(exact["w1"]) < 1e-9


# ---------------------------------------------------------------------------
# Genuinely skewed fixture: one key owns 50% of the big side
# ---------------------------------------------------------------------------


def _hot_key_frames(spark, n_big: int = 400_000, n_keys: int = 100):
    """Big side where key 0 owns half the rows; small dim of n_keys."""
    big = spark.range(n_big).select(
        F.when(F.col("id") % 2 == 0, 0)
        .otherwise((F.col("id") % (n_keys - 1)) + 1)
        .cast("long")
        .alias("k"),
        (F.col("id") % 1000).cast("double").alias("v"),
    )
    small = spark.range(n_keys).select(
        F.col("id").alias("sk"), F.concat(F.lit("g"), F.col("id") % 7).alias("grp")
    )
    return big, small


def test_salted_join_correct_and_balanced_under_hot_key(spark):
    """On a 50%-hot-key fixture the salted join (a) matches the plain
    join's aggregate exactly and (b) spreads the hot key's rows across
    salt buckets: the max (key, salt) shuffle-group share drops from
    ~0.50 to ~0.50/n_salts. (b) is the deterministic, machine-
    independent form of 'salted beats plain' — shuffle-group balance is
    what bounds the straggler task at 100 TB."""
    big, small = _hot_key_frames(spark)
    plain = (
        big.join(small, big.k == small.sk)
        .groupBy("grp")
        .agg(F.count(F.lit(1)).alias("n"), F.round(F.sum("v"), 4).alias("s"))
    )
    n_salts = 8
    salted = (
        salted_join(big, small, "k", "sk", n_salts=n_salts)
        .groupBy("grp")
        .agg(F.count(F.lit(1)).alias("n"), F.round(F.sum("v"), 4).alias("s"))
    )
    assert sorted(map(tuple, plain.collect())) == sorted(map(tuple, salted.collect()))

    total = big.count()
    plain_max = (
        big.groupBy("k").count().agg(F.max("count")).collect()[0][0]
    )
    from meta_iterative_mapreduce_spark.operators.skew import _salt_col

    salted_max = (
        big.withColumn("__salt", _salt_col(big, n_salts, None))
        .groupBy("k", "__salt")
        .count()
        .agg(F.max("count"))
        .collect()[0][0]
    )
    assert plain_max / total >= 0.49  # fixture really is hot
    # hot key spread across n_salts buckets (allow 40% hash imbalance)
    assert salted_max / total <= 0.5 / n_salts * 1.4


def test_aqe_skew_join_split_fires_on_hot_key(spark):
    """With AQE thresholds scaled to the fixture, Spark's runtime
    skew-join split must trigger on the plain sort-merge join — the
    engine-native alternative to salting that q_join_skew_salted's
    docstring points to for ad-hoc joins."""
    big, small = _hot_key_frames(spark)
    conf = spark.conf
    saved = {
        k: conf.get(k, None)
        for k in (
            "spark.sql.autoBroadcastJoinThreshold",
            "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes",
            "spark.sql.adaptive.advisoryPartitionSizeInBytes",
            "spark.sql.adaptive.skewJoin.skewedPartitionFactor",
        )
    }
    try:
        conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")  # force SMJ
        conf.set(
            "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "64KB"
        )
        conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "64KB")
        conf.set("spark.sql.adaptive.skewJoin.skewedPartitionFactor", "2")
        # summarize join output inside the same Dataset so collect()
        # moves 1 row; the action must run on THIS Dataset's
        # QueryExecution for its AdaptiveSparkPlan to reach final state
        joined = (
            big.join(small, big.k == small.sk)
            .select(F.sum(F.col("v") + F.length("grp")).alias("s"))
        )
        joined.collect()
        final_plan = joined._jdf.queryExecution().executedPlan().toString()
        assert "isFinalPlan=true" in final_plan, final_plan[:500]
        assert "skew=true" in final_plan, final_plan[:3000]
    finally:
        for k, v in saved.items():
            if v is None:
                conf.unset(k)
            else:
                conf.set(k, v)
