"""Count-Min Sketch guarantees vs exact counts."""

from __future__ import annotations

from pyspark.sql import functions as F

from meta_iterative_mapreduce_spark import registry
from meta_iterative_mapreduce_spark.io import load_table


def test_cms_never_underestimates_and_is_tight_for_heavy_hitters(spark, sf_dir):
    """The _cert twin RETURNS the per-token certification (exact
    count + theorem/bound flags, r13 oracle upgrade; split from the
    benched production query in r14); this test re-derives the raw
    estimates through cms_build/cms_estimate and checks the
    underlying guarantees directly, independent of the query's own
    flag computation — and asserts the production query's structural
    conservation flags."""
    from meta_iterative_mapreduce_spark.operators.sketches import (
        cms_build,
        cms_estimate,
    )

    out = registry.queries()["q_sketch_count_min_cert"](spark, sf_dir).toPandas()
    assert bool(out["cms_ge_exact"].all())
    assert bool(out["cms_within_eps_n"].all())
    prod = registry.queries()["q_sketch_count_min"](spark, sf_dir).collect()[0]
    assert prod["depths_conserve_total"] is True
    assert prod["buckets_within_width"] is True
    assert prod["est_sum_ge_exact_total"] is True
    assert prod["n_distinct"] == len(out)
    toks = load_table(spark, sf_dir, "documents").select(
        F.explode(F.split("text", " ")).alias("token")
    )
    exact = (
        toks.groupBy("token").agg(F.count(F.lit(1)).alias("cnt")).toPandas()
    )
    assert len(out) == len(exact)
    est = cms_estimate(cms_build(toks), toks.distinct()).toPandas()
    m = est.merge(exact, on="token")
    # one-sided error: CMS never underestimates
    assert (m["est_count"] >= m["cnt"]).all()
    # tightness: overshoot bounded by eps*N per collision theory
    n_total = int(exact["cnt"].sum())
    overshoot = (m["est_count"] - m["cnt"]).max()
    assert overshoot <= max(2, 2.0 * n_total / 256 * 2.718)  # e/width * N


def test_kll_merge_order_invariant(spark, sf_dir):
    """DataSketches KLL partials merged in ascending, descending, and
    rotated partition order yield identical quantile estimates — pins
    the set/merge-semantics argument q_sketch_kll's deterministic
    median_ok/p99_ok flags rest on (VERDICT r2 item 10)."""
    from meta_iterative_mapreduce_spark.io import load_table

    li = load_table(spark, sf_dir, "lineitem").select(
        (F.col("l_orderkey") % 32).alias("bucket"), "l_extendedprice"
    )
    per = li.groupBy("bucket").agg(
        F.kll_sketch_agg_double("l_extendedprice").alias("sk")
    )

    def quantiles(order_sql: str) -> tuple:
        merged = per.agg(
            F.expr(order_sql).alias("a")
        ).select(
            F.expr(
                "aggregate(slice(a, 2, size(a) - 1), a[0].sk,"
                " (acc, x) -> kll_sketch_merge_double(acc, x.sk))"
            ).alias("sk")
        ).select(
            F.kll_sketch_get_quantile_double("sk", F.lit(0.5)).alias("q50"),
            F.kll_sketch_get_quantile_double("sk", F.lit(0.99)).alias("q99"),
        )
        r = merged.collect()[0]
        return (r["q50"], r["q99"])

    # KLL merge is not byte-identical across orders (compaction level
    # structure differs) — the deterministic claim is that the rank
    # error stays bounded, so the FLAG windows hold under EVERY order
    bounds = li.agg(
        F.expr("percentile(l_extendedprice, array(0.40D, 0.60D, 0.97D))").alias(
            "ps"
        ),
        F.max("l_extendedprice").alias("hi"),
    ).collect()[0]
    lo50, hi50, lo99 = bounds["ps"]
    hi99 = bounds["hi"]
    for order_sql in (
        "sort_array(collect_list(struct(bucket, sk)), true)",
        "sort_array(collect_list(struct(bucket, sk)), false)",
        "concat(slice(sort_array(collect_list(struct(bucket, sk)), true), 12, 100),"
        " slice(sort_array(collect_list(struct(bucket, sk)), true), 1, 11))",
    ):
        q50, q99 = quantiles(order_sql)
        assert lo50 <= q50 <= hi50, (order_sql, q50)
        assert lo99 <= q99 <= hi99, (order_sql, q99)


def test_hll_partitioning_invariant(spark, sf_dir):
    """HLL union over partials is partitioning-independent: estimates
    from 1-partition, 16-partition, and per-bucket-unioned inputs are
    identical (HLL state depends only on the SET of hashed values)."""
    from meta_iterative_mapreduce_spark.io import load_table

    ev = load_table(spark, sf_dir, "events").select("user_id")

    def est(df) -> float:
        return df.agg(
            F.hll_sketch_estimate(F.hll_sketch_agg("user_id", 14)).alias("e")
        ).collect()[0]["e"]

    e1 = est(ev.repartition(1))
    e16 = est(ev.repartition(16, F.col("user_id")))
    via_union = (
        ev.groupBy((F.col("user_id") % 7).alias("b"))
        .agg(F.hll_sketch_agg("user_id", 14).alias("sk"))
        .agg(F.hll_sketch_estimate(F.hll_union_agg("sk")).alias("e"))
        .collect()[0]["e"]
    )
    assert e1 == e16 == via_union
