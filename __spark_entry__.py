"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs
each ``queries()[name]`` at sf=0.01 and compares it against the
matching ``oracle_sql()[name]`` via DuckDB (row-count + schema +
order-insensitive value-hash → CORRECTNESS_r{N}.json).

All real logic lives in the ``meta_iterative_mapreduce_spark``
package; this module is a thin view over its query registry.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from meta_iterative_mapreduce_spark import registry
from meta_iterative_mapreduce_spark.operators.regression import flagship


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0.

    Iterative meta-averaged linear regression of l_extendedprice on
    l_quantity (batches = l_shipdate months, chunks = l_orderkey % 8,
    EMA α=0.2, ε-convergence) — the reference's full computational
    loop (kernel.cu:135-217) Spark-first.
    """
    return flagship(spark)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2.2."""
    return registry.queries()


def oracle_sql() -> dict[str, str]:
    """DuckDB-equivalent ANSI SQL per query (omitted => rows-only check)."""
    return registry.oracle_sql()
