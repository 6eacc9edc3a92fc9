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


def scd2_apply(
    base: DataFrame, changes: DataFrame, key: str, ts: str
) -> DataFrame:
    """Slowly-changing-dimension type-2 apply: build validity intervals
    from a union of dimension versions. Each key's versions are ordered
    by effective time `ts`; every row becomes an interval
    [valid_from = ts, valid_to = next version's ts) with the latest
    version open-ended (is_current). ONE shuffle on the key; the LEAD
    window rides the same partitioning. Works for any number of change
    batches — the interval construction is the same union + window
    whether one change arrives or a year of CDC history replays."""
    versions = base.unionByName(changes)
    w = W.partitionBy(key).orderBy(ts)
    nxt = F.lead(ts).over(w)
    return versions.select(
        "*",
        F.col(ts).alias("valid_from"),
        F.coalesce(nxt, F.lit(-1)).alias("valid_to"),
        nxt.isNull().alias("is_current"),
    ).drop(ts)


@register(
    "q_merge_scd2",
    oracle="""
    WITH base AS (
        SELECT c_custkey,
               CAST(FLOOR(c_acctbal * 100 + 0.5) AS BIGINT) AS acct_cents,
               CAST(0 AS BIGINT) AS eff_ts
        FROM customer
    ), changes AS (
        SELECT c_custkey, acct_cents + 12345 AS acct_cents,
               CAST(1 AS BIGINT) AS eff_ts
        FROM base WHERE c_custkey % 7 = 0
    ), versions AS (
        SELECT * FROM base UNION ALL SELECT * FROM changes
    )
    SELECT c_custkey, acct_cents,
           eff_ts AS valid_from,
           COALESCE(LEAD(eff_ts) OVER w, -1) AS valid_to,
           (LEAD(eff_ts) OVER w IS NULL) AS is_current
    FROM versions
    WINDOW w AS (PARTITION BY c_custkey ORDER BY eff_ts)
    """,
)
def q_merge_scd2(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SCD TYPE-2 dimension merge — the lakehouse pattern MERGE's
    overwrite semantics can't give you: applying a change batch closes
    the previous version's validity interval instead of destroying it,
    so every historical join can time-travel the dimension
    (`valid_from <= fact_ts < valid_to`). A deterministic CDC batch
    (every 7th customer re-balanced) is applied over the customer dim;
    changed keys end with two interval rows (the old one closed at
    eff_ts 1, the new one current), unchanged keys keep one open row.
    Money lives as exact integer cents end-to-end (q_agg_decimal_exact
    convention) so the change arithmetic is engine-identical. Plan:
    union + ONE key shuffle shared by the LEAD window — identical cost
    shape to q_merge_upsert, producing intervals instead of a
    latest-row pick."""
    c = load_table(spark, sf_dir, "customer")
    base = c.select(
        "c_custkey",
        F.floor(F.col("c_acctbal") * 100 + F.lit(0.5))
        .cast("long")
        .alias("acct_cents"),
        F.lit(0).cast("long").alias("eff_ts"),
    )
    changes = base.filter(F.col("c_custkey") % 7 == 0).select(
        "c_custkey",
        (F.col("acct_cents") + 12345).alias("acct_cents"),
        F.lit(1).cast("long").alias("eff_ts"),
    )
    return scd2_apply(base, changes, "c_custkey", "eff_ts")
