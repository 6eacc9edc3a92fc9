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
# order queries() yields them. Rounds 1-13 certified every registered
# query at least once with zero failures; after round 13 nothing in
# the ledger predates r08, and the debt is staleness only. The
# round-14 priority below = (a) the 6 NEW q_*_cert certification
# twins (VERDICT r13 item 1: the exact/brute-force verification arms
# split out of the benched production queries — never-stamped, so
# they lead; test_registry_window derives this from
# CORRECTNESS_r*.json), then (b) the 7 queries whose CERTIFICATION
# or PLAN changed this round — q_dedup_simhash's new synthetic-
# mutation hash oracle (item 4) and the 6 production names returned
# to lean scale-path plans with new lean oracles — so the changed
# surfaces earn external stamps immediately; then (c) ALL 37
# remaining r08-stamped queries (item 3: after this round nothing
# predates r09). Every query is additionally verified by the
# identical in-repo oracle harness (tools/check.py, tests/
# test_oracle.py) every round regardless of window membership, and
# every name below must be registered (phantom entries fail CI
# instead of being silently dropped by _ordered()).
WINDOW_PRIORITY: tuple[str, ...] = (
    # (a) never-stamped round-14 registrations lead
    "q_agg_approx_distinct_cert",
    "q_agg_approx_quantile_cert",
    "q_sketch_count_min_cert",
    "q_dedup_incremental_cert",
    "q_dedup_near_minhash_cert",
    "q_dedup_simhash_pairs_cert",
    # (b) certification/plan changes this round
    "q_dedup_simhash",
    "q_agg_approx_distinct",
    "q_agg_approx_quantile",
    "q_sketch_count_min",
    "q_dedup_incremental",
    "q_dedup_near_minhash",
    "q_dedup_simhash_pairs",
    # (c) all 37 remaining r08-stamped queries (alphabetical)
    "q_embed_score_multiclass",
    "q_events_funnel_windowed",
    "q_events_paths",
    "q_events_rfm",
    "q_graph_bfs",
    "q_graph_link_predict",
    "q_join_asof_nearest",
    "q_join_cross",
    "q_join_interval_overlap",
    "q_merge_scd2",
    "q_multimodal_audio_wav",
    "q_multimodal_decode_gif",
    "q_multimodal_decode_jpeg",
    "q_multimodal_decode_jpeg_color",
    "q_multimodal_decode_tiff",
    "q_multimodal_frame_sample_gif",
    "q_multimodal_phash",
    "q_stream_session_timer",
    "q_table_column_mapping",
    "q_text_pdf_extract",
    "q_text_pii_redact",
    "q_text_repetition",
    "q_tpch_q13_shape",
    "q_tpch_q17_shape",
    "q_tpch_q22_shape",
    "q_tpch_q2_shape",
    "q_tpch_q4_shape",
    "q_ts_anomaly",
    "q_ts_downsample",
    "q_ts_gapfill",
    "q_udaf_grouped",
    "q_udf_grouped_map",
    "q_udf_pandas",
    "q_udf_python",
    "q_udtf_explode",
    "q_udtf_python",
    "q_zorder_layout",
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
    from meta_iterative_mapreduce_spark import sql  # noqa: F401
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
