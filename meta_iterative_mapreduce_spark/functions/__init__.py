"""Reusable column-expression function library."""

from meta_iterative_mapreduce_spark.functions.vectors import (  # noqa: F401
    cosine,
    dot_const,
    dot_pair,
    l2_norm,
    sign_lsh_bucket,
)
