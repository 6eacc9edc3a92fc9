"""MERGE / upsert emulation (CDC apply without a table format).

Without Delta/Iceberg jars (not in this container), MERGE INTO is
emulated with the classic union + window-pick plan: concatenate base
and updates, then keep the highest-priority row per key. One shuffle
on the key; at scale this is exactly what a CoW table format executes
underneath, minus file-level skipping.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import Window as W
from pyspark.sql import functions as F

from meta_iterative_mapreduce_spark.io import load_table
from meta_iterative_mapreduce_spark.registry import register


def upsert(base: DataFrame, updates: DataFrame, key: str, version: Column) -> DataFrame:
    """Apply `updates` over `base` by `key`: for each key keep the row
    with the highest `version` (updates must carry a higher version
    than base rows). Schemas must match."""
    tagged = base.unionByName(updates)
    w = W.partitionBy(key).orderBy(version.desc())
    return (
        tagged.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .drop("__rn")
    )


@register(
    "q_merge_upsert",
    oracle="""
    WITH updates AS (
        SELECT o_orderkey, o_custkey, 'U' AS o_orderstatus,
               ROUND(o_totalprice * 1.1, 4) AS o_totalprice,
               1 AS version
        FROM orders WHERE o_orderkey % 10 = 0
    ), base AS (
        SELECT o_orderkey, o_custkey, o_orderstatus, o_totalprice,
               0 AS version
        FROM orders
    ), merged AS (
        SELECT *, ROW_NUMBER() OVER
                   (PARTITION BY o_orderkey ORDER BY version DESC) AS rn
        FROM (SELECT * FROM base UNION ALL SELECT * FROM updates)
    )
    SELECT o_orderkey, o_custkey, o_orderstatus, o_totalprice
    FROM merged WHERE rn = 1
    """,
)
def q_merge_upsert(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MERGE INTO emulation: a CDC batch (10% of orders re-priced and
    re-statused) upserted over the base snapshot — union + per-key
    latest-version pick. Row count equals the base; updated keys carry
    the new values."""
    o = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice"
    )
    base = o.withColumn("version", F.lit(0))
    updates = (
        o.filter(F.col("o_orderkey") % 10 == 0)
        .withColumn("o_orderstatus", F.lit("U"))
        .withColumn("o_totalprice", F.round(F.col("o_totalprice") * 1.1, 4))
        .withColumn("version", F.lit(1))
    )
    return upsert(base, updates, "o_orderkey", F.col("version")).drop("version")
