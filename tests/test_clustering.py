"""K-means property checks (iterative-loop workload #2)."""

from __future__ import annotations

from pyspark.sql import functions as F

from meta_iterative_mapreduce_spark.io import load_table
from meta_iterative_mapreduce_spark.operators import clustering as C


def _inertia(e, centers) -> float:
    assigned = C.assign_clusters(e, "embedding", centers)
    d = None
    for j, c in enumerate(centers):
        dj = C._dist_sq(F.col("embedding"), c)
        d = dj if j == 0 else F.when(F.col("cluster") == j, dj).otherwise(d)
    return assigned.withColumn("d", d).agg(F.sum("d")).collect()[0][0]


def test_lloyd_iterations_never_increase_inertia(spark, sf_dir):
    e = load_table(spark, sf_dir, "embeddings")
    init = C._init_centers(spark, sf_dir, 4)
    prev = _inertia(e, init)
    centers = init
    for _ in range(3):
        centers = C.kmeans(e, "embedding", centers, n_iters=1).centers
        cur = _inertia(e, centers)
        assert cur <= prev + 1e-9
        prev = cur


def test_assignment_covers_all_rows_once(spark, sf_dir):
    e = load_table(spark, sf_dir, "embeddings")
    init = C._init_centers(spark, sf_dir, 4)
    assigned = C.assign_clusters(e, "embedding", init)
    assert assigned.count() == e.count()
    clusters = {r["cluster"] for r in assigned.select("cluster").distinct().collect()}
    assert clusters.issubset(set(range(4)))
