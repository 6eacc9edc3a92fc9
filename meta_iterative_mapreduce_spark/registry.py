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
# order queries() yields them; round 1 certified the operator families,
# round 2 the relational plan families. Round 3's explicit priority
# list below is exactly the set never yet externally certified
# (registered minus CORRECTNESS_r01 ∪ r02 keys, plus this round's new
# queries), riskiest families first per VERDICT.md r2 item 1: streams/
# stateful, UDF surface, Spark-4 surface, sketches, graph, events,
# timeseries, multimodal, corpus/text, incremental/CDC, skew, embed,
# layout. Nine plain-relational leftovers (cube/rollup/mode/cross/
# scalar_hash/window_distribution/samples/cte_recursive — all green in
# the identical in-repo harness) are deferred to round 4's window.
WINDOW_PRIORITY: tuple[str, ...] = (
    "q_stream_ema",
    "q_stream_tumbling",
    "q_stream_sliding",
    "q_stream_session",
    "q_stream_join",
    "q_udf_python",
    "q_udf_pandas",
    "q_udaf_grouped",
    "q_udf_grouped_map",
    "q_udtf_explode",
    "q_udtf_python",
    "q_source_python_ds",
    "q_scalar_variant",
    "q_sketch_hll",
    "q_sketch_kll",
    "q_dedup_components",
    "q_graph_degree",
    "q_graph_pagerank",
    "q_graph_triangles",
    "q_events_sessionize",
    "q_events_transition",
    "q_events_attribution",
    "q_events_funnel_staged",
    "q_events_funnel_k",
    "q_ts_gapfill",
    "q_ts_downsample",
    "q_ts_anomaly",
    "q_multimodal_decode",
    "q_multimodal_decode_png",
    "q_multimodal_resize",
    "q_multimodal_frame_sample",
    "q_text_decontaminate",
    "q_text_repetition",
    "q_corpus_mix",
    "q_text_chunk",
    "q_text_pack",
    "q_text_pii_redact",
    "q_text_html_strip",
    "q_text_inverted_index",
    "q_text_bm25",
    "q_pipeline_corpus_clean",
    "q_agg_incremental",
    "q_cdc_snapshot_diff",
    "q_join_skew_salted",
    "q_embed_quantize",
    "q_embed_gram",
    "q_embed_pca_power",
    "q_sim_recall_at_k",
    "q_zorder_layout",
    "q_join_lateral",
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
