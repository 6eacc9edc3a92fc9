"""Invariants: inverted index, time-series gap fill, co-order graph."""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import Window as W

from meta_iterative_mapreduce_spark.io import load_table
from meta_iterative_mapreduce_spark.operators.components import q_graph_degree
from meta_iterative_mapreduce_spark.operators.events_analytics import q_ts_gapfill
from meta_iterative_mapreduce_spark.operators.text import q_text_inverted_index


def test_inverted_index_df_consistency(spark, sf_dir):
    """sum(df) == |distinct (token, doc_id)|, and every materialized
    posting list has exactly df entries."""
    idx = q_text_inverted_index(spark, sf_dir).cache()
    d = load_table(spark, sf_dir, "documents")
    pairs = (
        d.select("doc_id", F.explode(F.split("text", " ")).alias("token"))
        .distinct()
        .count()
    )
    assert idx.agg(F.sum("df")).first()[0] == pairs
    bad = idx.filter(
        F.col("postings").isNotNull()
        & (F.size(F.split("postings", ",")) != F.col("df"))
    )
    assert bad.count() == 0
    # cutoff honored: postings present iff df <= 32
    assert idx.filter((F.col("df") > 32) & F.col("postings").isNotNull()).count() == 0
    assert idx.filter((F.col("df") <= 32) & F.col("postings").isNull()).count() == 0
    idx.unpersist()


def test_gapfill_dense_and_filled(spark, sf_dir):
    """Each user's series is dense over its span; gaps carry n=0 and a
    forward-filled value; the first row per user is never a gap."""
    out = q_ts_gapfill(spark, sf_dir).cache()
    spans = out.groupBy("user_id").agg(
        F.count(F.lit(1)).alias("rows"),
        F.datediff(F.max("day"), F.min("day")).alias("span"),
    )
    assert spans.filter(F.col("rows") != F.col("span") + 1).count() == 0
    assert out.filter(F.col("gap") & (F.col("n") != 0)).count() == 0
    assert out.filter(F.col("filled_sum").isNull()).count() == 0
    first = out.withColumn(
        "rn", F.row_number().over(W.partitionBy("user_id").orderBy("day"))
    ).filter(F.col("rn") == 1)
    assert first.filter(F.col("gap")).count() == 0
    out.unpersist()


def test_graph_degree_handshake(spark, sf_dir):
    """Sum of degree*n_parts equals 2x the distinct edge count
    (handshake lemma)."""
    dist = q_graph_degree(spark, sf_dir)
    total_deg = dist.agg(F.sum(F.col("degree") * F.col("n_parts"))).first()[0]
    items = (
        load_table(spark, sf_dir, "lineitem")
        .select("l_orderkey", "l_partkey")
        .distinct()
    )
    a, b = items.alias("a"), items.alias("b")
    n_edges = (
        a.join(
            b,
            (F.col("a.l_orderkey") == F.col("b.l_orderkey"))
            & (F.col("a.l_partkey") < F.col("b.l_partkey")),
        )
        .select("a.l_partkey", "b.l_partkey")
        .distinct()
        .count()
    )
    assert total_deg == 2 * n_edges
