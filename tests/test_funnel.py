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


def test_windowed_funnel_equals_brute_force_with_hub(spark):
    """Bin-blocked windowed funnel == brute-force per-user evaluation
    on a synthetic stream with (a) a completing chain whose anchor is
    NOT the earliest (the greedy-shortcut trap), (b) boundary events
    exactly at ta + W (inclusive) and ta (exclusive), and (c) a hub
    user with 2000 stage events."""
    import random

    from meta_iterative_mapreduce_spark.operators.events_analytics import (
        windowed_funnel_depths,
    )

    W_US = 1000
    rows = []  # (user_id, event_type, t)
    # user 0: earliest anchor fails, later anchor completes
    rows += [
        (0, "signup", 100), (0, "view", 5000),  # first anchor: no view in window
        (0, "signup", 4500), (0, "purchase", 5400),  # chain 4500<5000<5400
    ]
    # user 1: boundary — view exactly at ta+W counts, purchase at ta+W too
    rows += [(1, "signup", 2000), (1, "view", 3000), (1, "purchase", 3000)]
    # (purchase at t2=3000 is NOT > t2 -> depth 2)
    # user 2: purchase strictly inside
    rows += [(2, "signup", 2000), (2, "view", 2500), (2, "purchase", 2999)]
    # user 3: view at ta (exclusive) -> depth 1
    rows += [(3, "signup", 7000), (3, "view", 7000)]
    # hub user 9: 2000 random stage events
    rng = random.Random(5)
    for _ in range(2000):
        rows.append(
            (9, rng.choice(["signup", "view", "purchase"]), rng.randrange(0, 50 * W_US))
        )
    # brute force
    by_user: dict[int, list[tuple[str, int]]] = {}
    for u, et, t in rows:
        by_user.setdefault(u, []).append((et, t))
    expect = {}
    for u, evs in by_user.items():
        anchors = sorted(t for et, t in evs if et == "signup")
        if not anchors:
            continue
        best = 1
        for ta in anchors:
            views = [t for et, t in evs if et == "view" and ta < t <= ta + W_US]
            if not views:
                continue
            t2 = min(views)
            best = max(best, 2)
            buys = [t for et, t in evs if et == "purchase" and t2 < t <= ta + W_US]
            if buys:
                best = 3
                break
        expect[u] = best
    ev = spark.createDataFrame(rows, "user_id long, event_type string, t long")
    got = {
        r["user_id"]: r["depth"]
        for r in windowed_funnel_depths(
            ev, ("signup", "view", "purchase"), W_US
        ).collect()
    }
    assert got == expect
    assert expect[0] == 3 and expect[1] == 2 and expect[2] == 3 and expect[3] == 1
