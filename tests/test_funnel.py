"""Funnel operator equivalences, including the hub-key (skew) split.

The hybrid plan routes users above a per-key event threshold through
the chained-min aggregate path and the rest through the collect+fold
path; both compute the greedy earliest chain, so the split must be
invisible in the results — pinned here on a fixture with one planted
hub user (10^5 events, chain completing only near the end, so any
truncation heuristic would lose it).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from meta_iterative_mapreduce_spark.operators.events_analytics import (
    _fold_stage_expr,
    funnel_chain_stage,
    per_user_funnel_stage,
)

STAGES = ["view", "click", "purchase"]


def _skewed_events(spark, n_hub: int = 100_000, n_users: int = 200):
    """Normal users with short pseudo-random sequences + one hub user
    whose 3-stage chain completes only in the last 3 of n_hub events."""
    normal = spark.range(n_users * 20).select(
        (F.col("id") % n_users).alias("user_id"),
        (F.col("id") * 7919 % 100_003).alias("t"),
        F.element_at(
            F.array(F.lit("view"), F.lit("click"), F.lit("purchase")),
            ((F.xxhash64("id") % 3 + 3) % 3 + 1).cast("int"),
        ).alias("event_type"),
    )
    hub = spark.range(n_hub).select(
        F.lit(999_999).alias("user_id"),
        F.col("id").alias("t"),
        # bulk is stage-typed 'view' so the hub key keeps its 10^5
        # events past the type filter; the chain completes only at the
        # very end (click then purchase), so losing any tail loses it
        F.when(F.col("id") == n_hub - 2, "click")
        .when(F.col("id") == n_hub - 1, "purchase")
        .otherwise("view")
        .alias("event_type"),
    )
    return normal.unionAll(hub).filter(F.col("event_type").isin(STAGES))


def _stages_dict(df):
    return {r["user_id"]: r["stage"] for r in df.collect()}


def test_hybrid_split_is_invisible_on_hub_fixture(spark):
    ev = _skewed_events(spark)
    # threshold 1000 forces the hub user (and only it) onto the chain path
    hybrid = _stages_dict(per_user_funnel_stage(ev, STAGES, hub_threshold=1000))
    chain = _stages_dict(funnel_chain_stage(ev, STAGES))
    fold = _stages_dict(
        ev.groupBy("user_id").agg(F.expr(_fold_stage_expr(STAGES)).alias("stage"))
    )
    # chain path omits stage-0 users; the hybrid and fold paths keep them
    chain_full = {u: chain.get(u, 0) for u in fold}
    assert hybrid == fold
    assert {u: s for u, s in hybrid.items() if s > 0} == {
        u: s for u, s in chain.items() if s > 0
    }
    assert hybrid == chain_full
    # the hub user's late chain survives the skew split
    assert hybrid[999_999] == 3


def test_hub_user_routes_through_chain_path(spark):
    """With the threshold between hub and normal counts, the chain arm
    alone must produce exactly the hub user."""
    ev = _skewed_events(spark)
    counts = ev.groupBy("user_id").agg(F.count(F.lit(1)).alias("__n"))
    big = counts.filter(F.col("__n") > 1000).select("user_id").collect()
    assert [r["user_id"] for r in big] == [999_999]


def test_funnel_k_matches_staged_on_fixture(spark, sf_dir):
    """The parameterized chain API on the 3-stage list reproduces the
    registered staged funnel's counts on the real fixture."""
    from meta_iterative_mapreduce_spark import registry

    qs = registry.queries()
    staged = qs["q_events_funnel_staged"](spark, sf_dir).collect()[0]
    from meta_iterative_mapreduce_spark.functions.time import ts_us
    from meta_iterative_mapreduce_spark.io import load_table

    ev = (
        load_table(spark, sf_dir, "events")
        .filter(F.col("event_type").isin(STAGES))
        .select("user_id", ts_us("ts").alias("t"), "event_type")
    )
    per_user = funnel_chain_stage(ev, STAGES)
    got = per_user.agg(
        F.count(F.when(F.col("stage") >= 1, 1)).alias("n1"),
        F.count(F.when(F.col("stage") >= 2, 1)).alias("n2"),
        F.count(F.when(F.col("stage") >= 3, 1)).alias("n3"),
    ).collect()[0]
    assert (got["n1"], got["n2"], got["n3"]) == (
        staged["n_view"],
        staged["n_view_click"],
        staged["n_view_click_purchase"],
    )
