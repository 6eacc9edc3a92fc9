"""Sorts / limits / top-k (SURVEY.md §2.2 F).

Global ORDER BY ... LIMIT k compiles to TakeOrderedAndProject — per-
partition top-k then a driver-side merge of k·P rows, never a full
sort of the table. Every LIMIT query carries a full tie-break key so
the selected row set is deterministic across engines.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from meta_iterative_mapreduce_spark.io import load_table
from meta_iterative_mapreduce_spark.registry import register


@register(
    "q_sort_limit",
    oracle="""
    SELECT o_orderkey, o_totalprice, o_orderpriority
    FROM orders
    ORDER BY o_totalprice DESC, o_orderkey
    LIMIT 100
    """,
)
def q_sort_limit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Global top-k by price (deterministic via o_orderkey tie-break)."""
    o = load_table(spark, sf_dir, "orders")
    return (
        o.orderBy(F.col("o_totalprice").desc(), F.col("o_orderkey"))
        .limit(100)
        .select("o_orderkey", "o_totalprice", "o_orderpriority")
    )


@register(
    "q_sort_multi_key",
    oracle="""
    SELECT l_orderkey, l_linenumber, l_returnflag,
           NULLIF(l_discount, 0.0) AS disc_n
    FROM lineitem
    ORDER BY l_returnflag DESC,
             NULLIF(l_discount, 0.0) ASC NULLS LAST,
             l_orderkey, l_linenumber
    LIMIT 200
    """,
)
def q_sort_multi_key(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-key sort with explicit asc/desc and NULLS LAST ordering
    (nulls synthesized via NULLIF — fixtures are null-free)."""
    li = load_table(spark, sf_dir, "lineitem")
    disc_n = F.nullif(F.col("l_discount"), F.lit(0.0))
    return (
        li.select(
            "l_orderkey", "l_linenumber", "l_returnflag", disc_n.alias("disc_n")
        )
        .orderBy(
            F.col("l_returnflag").desc(),
            F.col("disc_n").asc_nulls_last(),
            F.col("l_orderkey"),
            F.col("l_linenumber"),
        )
        .limit(200)
    )
