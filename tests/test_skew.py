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
