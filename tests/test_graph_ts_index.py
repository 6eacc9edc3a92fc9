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


def test_changepoint_finds_planted_level_shift(spark, tmp_path):
    """A series with a clean level shift at index 15 of 30 must locate
    cp_k = 15 (the prefix deviation |n·prefix_k − k·total| peaks at
    the last point of the first regime)."""
    import datetime as dt

    from meta_iterative_mapreduce_spark import registry

    rows = []
    for k in range(30):
        rows.append(
            (
                k,
                dt.datetime(2024, 1, 1) + dt.timedelta(minutes=k),
                7,
                "tick",
                10.0 if k < 15 else 20.0,
                "{}",
            )
        )
    df = spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long, event_type string, "
        "value double, props string",
    )
    sf = str(tmp_path / "mini")
    df.write.mode("overwrite").parquet(sf + "/events.parquet")
    out = registry.queries()["q_ts_changepoint"](spark, sf).collect()
    assert len(out) == 1
    r = out[0]
    assert (r["n"], r["cp_k"]) == (30, 15)
    # dev at k=15: 30*(15*100000) - 15*(15*100000+15*200000) = -22.5e6
    assert r["cp_dev"] == 30 * 15 * 100000 - 15 * (15 * 100000 + 15 * 200000)
