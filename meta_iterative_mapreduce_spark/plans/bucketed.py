"""Bucketed-table co-located join — the zero-Exchange fact⋈fact path.

At 100 TB the winning physical design for a star/fact schema that is
repeatedly joined on the same key is bucketing BOTH tables by that key
at write time (`bucketBy(N, key).sortBy(key)`): every subsequent join
on the key is Exchange-free — the scan itself reports the hash
partitioning, so the sort-merge join runs directly on co-located
buckets and the only remaining cost is a per-bucket sort (zero here,
because `sortBy` persisted the order too). This module registers that
at-rest layout lever as a driver-checked query: the oracle is the
plain (unbucketed) join, so a hash match proves the bucketed plan is
a pure physical rewrite with identical semantics.

Reference analog: none (kernel.cu reads a stdin stream once); this is
a north-star item for the 100 TB deployment posture (SURVEY.md §2.2
table M). The plan shape is pinned by tests/test_bucketing.py: the
join stage of `bucketed_join_frame` must contain a SortMergeJoin and
NO `Exchange hashpartitioning`.
"""

from __future__ import annotations

import os
import tempfile

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from meta_iterative_mapreduce_spark.io import fixture_fingerprint, load_table
from meta_iterative_mapreduce_spark.registry import register

# 8 buckets matches local[8] test parallelism; a 100 TB deployment
# sizes this to ~target-file-size (e.g. 1024 buckets for a 1 TB
# fact) — the plan shape (no Exchange) is invariant in N.
_N_BUCKETS = 8


def _tag(sf_dir: str) -> str:
    # content fingerprint, not just the path: a regenerated fixture at
    # the same sf_dir must invalidate the cached bucketed copies
    # instead of silently serving stale rows.
    return fixture_fingerprint(sf_dir, "lineitem", "orders")


def ensure_bucketed_tables(spark: SparkSession, sf_dir: str) -> tuple[str, str]:
    """Materialize bucketed external copies of lineitem and orders
    (projected to the join-relevant columns) keyed by sf_dir, reusing
    them when the catalog already has this fixture's copy. This is the
    one-time layout cost a warehouse pays at ingest; every later join
    on the bucket key amortizes it by skipping its Exchange."""
    tag = _tag(sf_dir)
    li_name, o_name = f"mimr_li_bkt_{tag}", f"mimr_o_bkt_{tag}"
    base = os.path.join(tempfile.gettempdir(), "mimr_bucketed")
    if not spark.catalog.tableExists(li_name):
        (
            load_table(spark, sf_dir, "lineitem")
            .select("l_orderkey", "l_quantity")
            .write.mode("overwrite")
            .option("path", os.path.join(base, li_name))
            .bucketBy(_N_BUCKETS, "l_orderkey")
            .sortBy("l_orderkey")
            .saveAsTable(li_name)
        )
    if not spark.catalog.tableExists(o_name):
        (
            load_table(spark, sf_dir, "orders")
            .select("o_orderkey", "o_orderstatus", "o_totalprice")
            .write.mode("overwrite")
            .option("path", os.path.join(base, o_name))
            .bucketBy(_N_BUCKETS, "o_orderkey")
            .sortBy("o_orderkey")
            .saveAsTable(o_name)
        )
    return li_name, o_name


def bucketed_join_frame(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The co-located fact⋈fact join itself (pre-aggregation), exposed
    so the plan-pin test can assert the join stage has NO Exchange.
    The merge hint forces SMJ: without it the planner may broadcast
    the small side (also shuffle-free, but then the bucketing layout
    is not what's being exercised — at real fact⋈fact scale neither
    side is broadcastable)."""
    li_name, o_name = ensure_bucketed_tables(spark, sf_dir)
    li = spark.table(li_name)
    o = spark.table(o_name).hint("merge")
    return li.join(o, li.l_orderkey == o.o_orderkey)


@register(
    "q_join_bucketed",
    oracle="""
    SELECT o.o_orderstatus,
           COUNT(*) AS n_rows,
           CAST(SUM(CAST(FLOOR(l.l_quantity * 100 + 0.5) AS BIGINT))
                AS BIGINT) AS sum_qty_e2,
           CAST(SUM(CAST(FLOOR(o.o_totalprice * 100 + 0.5) AS BIGINT))
                AS BIGINT) AS sum_price_e2
    FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
    GROUP BY o.o_orderstatus
    """,
)
def q_join_bucketed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fact⋈fact join over at-rest bucketed layout: lineitem and
    orders are written `bucketBy(8, orderkey).sortBy(orderkey)`, then
    joined WITHOUT any Exchange on the join key (pinned by
    tests/test_bucketing.py) and aggregated per order status. The
    oracle runs the identical join over the plain parquet, so the
    hash gate proves bucketing is a pure physical rewrite. Sums are
    floor-scaled e2 BIGINTs (exact integer totals, engine-neutral).
    The only shuffle in the whole query is the final 3-group
    aggregate exchange — at 100 TB the join, normally the dominant
    exchange of a star query, moves zero bytes."""
    j = bucketed_join_frame(spark, sf_dir)
    return (
        j.groupBy("o_orderstatus")
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
