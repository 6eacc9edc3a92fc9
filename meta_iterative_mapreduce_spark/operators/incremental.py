"""Incremental view maintenance and CDC snapshot diff.

The reference recomputes its aggregate state from scratch every
iteration (kernel.cu:135-166 re-reduces the full scatter each round);
a 100 TB engine cannot.  These operators show the two standard
incremental patterns instead:

- `q_agg_incremental`: a materialized aggregate is kept as *mergeable
  partials* (SUM, COUNT) and refreshed by aggregating ONLY the delta
  batch and merging — the shuffle is O(|delta| + |groups|), never
  O(|base|).  The oracle is the full recompute, proving the merge
  algebra is exact.
- `q_cdc_snapshot_diff`: given two snapshots of a table, emit the
  change stream (insert / update / delete rows) via one full outer
  join on the key — the diff side of CDC, complementing the apply
  side in operators/merge.py (q_merge_upsert).

At scale both plans shuffle once on the key; neither touches Python.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from meta_iterative_mapreduce_spark.io import load_table
from meta_iterative_mapreduce_spark.registry import register

_CUTOFF = "1998-01-01"


def merge_partials(partials: DataFrame, keys: list[str]) -> DataFrame:
    """Merge mergeable aggregate partials (sum_price, n) by key.

    The same shape merges base+delta, hourly→daily rollups, or
    per-partition partial files: SUM is associative, COUNT merges as
    SUM — the map-side-combine algebra made explicit."""
    return partials.groupBy(*keys).agg(
        F.sum("sum_price").alias("sum_price"), F.sum("n").alias("n")
    )


@register(
    "q_agg_incremental",
    oracle="""
    SELECT o_custkey,
           ROUND(SUM(o_totalprice), 4) AS sum_price,
           COUNT(*) AS n
    FROM orders
    GROUP BY o_custkey
    """,
)
def q_agg_incremental(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incrementally maintained per-customer aggregate: the base
    partition (orders before the 1998-01-01 cutoff) is aggregated once
    into
    mergeable partials, the delta (orders on/after the cutoff) is
    aggregated separately, and the view is refreshed by merging the
    two partial sets — never by rescanning the base.  ROUND only at
    the final projection: rounding partials before the merge would
    break associativity."""
    o = load_table(spark, sf_dir, "orders").select(
        "o_custkey", "o_totalprice", "o_orderdate"
    )
    cutoff = F.to_timestamp(F.lit(_CUTOFF))

    def partials(df: DataFrame) -> DataFrame:
        return df.groupBy("o_custkey").agg(
            F.sum("o_totalprice").alias("sum_price"),
            F.count(F.lit(1)).alias("n"),
        )

    base = partials(o.filter(F.col("o_orderdate") < cutoff))
    delta = partials(o.filter(F.col("o_orderdate") >= cutoff))
    merged = merge_partials(base.unionByName(delta), ["o_custkey"])
    return merged.select(
        "o_custkey", F.round("sum_price", 4).alias("sum_price"), "n"
    )


@register(
    "q_cdc_snapshot_diff",
    oracle="""
    WITH snap_a AS (
        SELECT o_orderkey, o_orderstatus, o_totalprice
        FROM orders WHERE o_orderkey % 3 <> 0
    ), snap_b AS (
        SELECT o_orderkey, o_orderstatus,
               CASE WHEN o_orderkey % 7 = 0
                    THEN ROUND(o_totalprice * 1.05, 4)
                    ELSE o_totalprice END AS o_totalprice
        FROM orders WHERE o_orderkey % 5 <> 0
    )
    SELECT COALESCE(a.o_orderkey, b.o_orderkey) AS o_orderkey,
           CASE WHEN a.o_orderkey IS NULL THEN 'I'
                WHEN b.o_orderkey IS NULL THEN 'D'
                ELSE 'U' END AS op,
           a.o_totalprice AS old_price,
           b.o_totalprice AS new_price
    FROM snap_a a FULL OUTER JOIN snap_b b USING (o_orderkey)
    WHERE a.o_orderkey IS NULL OR b.o_orderkey IS NULL
       OR a.o_totalprice <> b.o_totalprice
       OR a.o_orderstatus <> b.o_orderstatus
    """,
)
def q_cdc_snapshot_diff(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CDC extraction: diff two table snapshots into a change stream.
    Snapshot A drops keys divisible by 3 (those become inserts), B
    drops keys divisible by 5 (deletes) and re-prices keys divisible
    by 7 (updates); one full outer join on the key classifies each row
    as I/U/D and drops unchanged rows.  At 100 TB this is a single
    co-partitioned shuffle join — and with both snapshots bucketed on
    the key (tests/test_bucketing.py pattern) it is shuffle-free."""
    o = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderstatus", "o_totalprice"
    )
    snap_a = o.filter(F.col("o_orderkey") % 3 != 0)
    snap_b = o.filter(F.col("o_orderkey") % 5 != 0).withColumn(
        "o_totalprice",
        F.when(
            F.col("o_orderkey") % 7 == 0, F.round(F.col("o_totalprice") * 1.05, 4)
        ).otherwise(F.col("o_totalprice")),
    )
    a, b = snap_a.alias("a"), snap_b.alias("b")
    joined = a.join(b, on=F.col("a.o_orderkey") == F.col("b.o_orderkey"), how="full")
    return joined.filter(
        F.col("a.o_orderkey").isNull()
        | F.col("b.o_orderkey").isNull()
        | (F.col("a.o_totalprice") != F.col("b.o_totalprice"))
        | (F.col("a.o_orderstatus") != F.col("b.o_orderstatus"))
    ).select(
        F.coalesce(F.col("a.o_orderkey"), F.col("b.o_orderkey")).alias("o_orderkey"),
        F.when(F.col("a.o_orderkey").isNull(), F.lit("I"))
        .when(F.col("b.o_orderkey").isNull(), F.lit("D"))
        .otherwise(F.lit("U"))
        .alias("op"),
        F.col("a.o_totalprice").alias("old_price"),
        F.col("b.o_totalprice").alias("new_price"),
    )
