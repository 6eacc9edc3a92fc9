"""Count-Min Sketch guarantees vs exact counts."""

from __future__ import annotations

from pyspark.sql import functions as F

from meta_iterative_mapreduce_spark import registry
from meta_iterative_mapreduce_spark.io import load_table


def test_cms_never_underestimates_and_is_tight_for_heavy_hitters(spark, sf_dir):
    est = registry.queries()["q_sketch_count_min"](spark, sf_dir).toPandas()
    exact = (
        load_table(spark, sf_dir, "documents")
        .select(F.explode(F.split("text", " ")).alias("token"))
        .groupBy("token")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .toPandas()
    )
    m = est.merge(exact, on="token")
    assert len(m) == len(exact)
    # one-sided error: CMS never underestimates
    assert (m["est_count"] >= m["cnt"]).all()
    # tightness: total overshoot bounded by eps*N per collision theory
    n_total = int(exact["cnt"].sum())
    overshoot = (m["est_count"] - m["cnt"]).max()
    assert overshoot <= max(2, 2.0 * n_total / 256 * 2.718)  # e/width * N
