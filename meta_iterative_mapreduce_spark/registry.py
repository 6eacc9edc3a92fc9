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


# The external verification window records the FIRST 50 queries in the
# order queries() yields them. Rounds 1-11 certified all previously-
# registered queries at least once with zero failures; after round 11
# nothing in the ledger predates r06, and the debt is staleness only.
# The round-12 priority below = (a) the round-12 registrations
# (never-stamped: MERGE WHEN NOT MATCHED BY SOURCE dimension sync,
# zero-copy CLONE, partitions metadata table, iterative logistic
# regression, streaming Avro source, gaps-and-islands, seasonal MA
# decomposition, complex-Avro-type scan),
# then (b) ALL 21 remaining r06-stamped queries (set ops, sorts,
# TPC-H shapes, windows, parquet/orc/json/projection scans — VERDICT
# r11 next-round item 2: after this round nothing predates r07), then
# (c) 21 of the 45 r07-stamped queries (now the stalest cohort,
# alphabetical). Every query is additionally verified by the
# identical in-repo oracle harness (tools/check.py, tests/
# test_oracle.py) every round regardless of window membership, and
# every name below must be registered (phantom entries fail CI
# instead of being silently dropped by _ordered()).
WINDOW_PRIORITY: tuple[str, ...] = (
    # never-stamped round-12 registrations lead (test_registry_window
    # derives this requirement from CORRECTNESS_r*.json)
    "q_events_gaps_islands",
    "q_merge_dim_sync",
    "q_scan_avro_complex",
    "q_regression_logistic",
    "q_stream_avro_source",
    "q_ts_seasonal_ma",
    "q_table_clone",
    "q_table_partitions_meta",
    # all 21 remaining r06-stamped queries
    "q_scan_json",
    "q_scan_orc",
    "q_scan_parquet",
    "q_scan_projection_pushdown",
    "q_set_except",
    "q_set_except_all",
    "q_set_intersect",
    "q_set_union_all",
    "q_set_union_distinct",
    "q_sort_limit",
    "q_sort_multi_key",
    "q_topk_per_group",
    "q_tpch_q18_shape",
    "q_tpch_q1_shape",
    "q_tpch_q3_shape",
    "q_tpch_q5_shape",
    "q_tpch_q6_shape",
    "q_window_analytic",
    "q_window_frame_range",
    "q_window_frame_rows",
    "q_window_ranking",
    # 21 of the 45 r07-stamped queries (alphabetical)
    "q_agg_incremental",
    "q_cdc_snapshot_diff",
    "q_corpus_mix",
    "q_dedup_components",
    "q_embed_gram",
    "q_embed_quantize",
    "q_events_attribution",
    "q_events_funnel_k",
    "q_events_funnel_staged",
    "q_events_sessionize",
    "q_events_transition",
    "q_graph_degree",
    "q_graph_pagerank",
    "q_graph_triangles",
    "q_join_lateral",
    "q_join_skew_salted",
    "q_multimodal_audio_features",
    "q_multimodal_decode",
    "q_multimodal_decode_png",
    "q_multimodal_frame_sample",
    "q_multimodal_mp4_index",
)


def _ordered() -> dict[str, Query]:
    _ensure_loaded()
    pri = [n for n in WINDOW_PRIORITY if n in REGISTRY]
    rest = [n for n in REGISTRY if n not in set(pri)]
    return {n: REGISTRY[n] for n in [*pri, *rest]}


def queries() -> dict[str, QueryFn]:
    return {name: q.fn for name, q in _ordered().items()}


def oracle_sql() -> dict[str, str]:
    return {
        name: q.oracle for name, q in _ordered().items() if q.oracle is not None
    }


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
        bucketed,
        extras,
        layout,
        modern,
    )
    from meta_iterative_mapreduce_spark.operators import (  # noqa: F401
        avi,
        clustering,
        components,
        corpus,
        dedup,
        docx,
        events_analytics,
        gif,
        incremental,
        merge,
        mp4,
        multimodal,
        pdf,
        pipeline,
        regression,
        similarity,
        sketch_persist,
        sketches,
        skew,
        text,
        tiff,
        timeseries,
        warc,
        webp,
    )
    from meta_iterative_mapreduce_spark.sources import (  # noqa: F401
        avro_ocf,
    )

    _LOADED = True
