"""Vector math over ArrayType(float) columns — all JVM-side.

Built on Spark's higher-order functions (zip_with / transform /
aggregate): no UDF, no Arrow transfer, fully inside codegen. These are
the primitives the similarity operators compose; Python falls back to
a pandas UDF only in `plans.udfs` where the UDF surface itself is the
point.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def dot_const(col: Column | str, const: list[float]) -> Column:
    """dot(vec, constant) — the constant folds into the codegen'd plan."""
    arr = F.array(*[F.lit(c) for c in const])
    return F.aggregate(
        F.zip_with(col, arr, lambda x, y: x.cast("double") * y),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def dot_pair(a: Column | str, b: Column | str) -> Column:
    """dot(vec_a, vec_b) for two array columns (e.g. across a join)."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def l2_norm(col: Column | str) -> Column:
    return F.sqrt(
        F.aggregate(
            F.transform(col, lambda x: x.cast("double") * x.cast("double")),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )
    )


def cosine(a: Column | str, b: Column | str) -> Column:
    return dot_pair(a, b) / (l2_norm(a) * l2_norm(b))


def sign_lsh_bucket(col: Column | str, planes: list[list[float]]) -> Column:
    """Random-hyperplane LSH bucket id: bit j set iff dot(v, plane_j)>0.
    Cosine-similar vectors land in the same bucket with probability
    (1 − θ/π)^n_planes — the standard ANN blocking key."""
    b = F.lit(0)
    for j, p in enumerate(planes):
        b = b + F.when(dot_const(col, p) > 0, F.lit(1 << j)).otherwise(F.lit(0))
    return b
