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
# order queries() yields them; rounds 1-3 certified 146 of the 187
# registered queries (union of CORRECTNESS_r01/r02/r03 keys, zero
# failures). Round 4's priority list is exactly the 41 queries never
# yet externally certified (VERDICT.md r3 item 1 pins this list), which
# closes the BASELINE.json "every declared query hash-matches" metric
# completely, followed by this round's new queries in the ~9 spare
# slots. Every query is additionally verified by the identical in-repo
# oracle harness (tools/check.py, tests/test_oracle.py) every round
# regardless of window membership.
WINDOW_PRIORITY: tuple[str, ...] = (
    # -- the 41 never-driver-certified (registered minus r01∪r02∪r03) --
    "q_agg_benford",
    "q_agg_cube",
    "q_agg_decimal_exact",
    "q_agg_mode",
    "q_agg_moments",
    "q_agg_rollup",
    "q_cte_recursive",
    "q_dedup_fuzzy_names",
    "q_dedup_semantic",
    "q_embed_pq",
    "q_events_funnel_windowed",
    "q_events_paths",
    "q_events_rfm",
    "q_graph_bfs",
    "q_graph_link_predict",
    "q_join_asof_nearest",
    "q_join_cross",
    "q_join_interval_overlap",
    "q_multimodal_audio_wav",
    "q_multimodal_decode_jpeg",
    "q_multimodal_phash",
    "q_multimodal_phash_pairs",
    "q_regression_kfold",
    "q_sample_hash",
    "q_sample_stratified",
    "q_sample_weighted",
    "q_scalar_collation",
    "q_scalar_hash",
    "q_sim_pq_adc",
    "q_sketch_hll_intersect",
    "q_stream_enrich",
    "q_stream_running_totals",
    "q_table_checksum",
    "q_text_boilerplate",
    "q_text_bpe_learn",
    "q_tpch_q21_shape",
    "q_ts_autocorr",
    "q_ts_interpolate",
    "q_ts_rollup_hier",
    "q_ts_seasonal",
    "q_window_distribution",
    # -- round-4 additions (new queries fill the spare window slots) --
    "q_multimodal_decode_jpeg_color",
    "q_events_dau_stickiness",
    "q_ts_changepoint",
    "q_text_entropy",
    "q_dedup_containment",
    "q_corpus_domain_cap",
    "q_profile_table",
    "q_agg_bitmap_distinct",
    "q_merge_scd2",
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
