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
# order queries() yields them. Rounds 1-8 certified all 219 then-
# registered queries at least once with zero failures; the debt is
# staleness only. The round-9 priority below = (a) new round-9
# registrations (never-stamped — tests/test_registry_window.py derives
# that set from CORRECTNESS_r*.json and asserts they LEAD: the four
# versioned-log mutation queries + incremental dedup), then
# (b) q_embed_pca_power, whose oracle was upgraded rows-only→hash in
# r8 but missed the r8 window (VERDICT r8 item 1: never-hash-stamped
# leads), then (c) ALL 23 r04-stamped queries — after this round every
# declared query carries a ≤5-round-old stamp and nothing older than
# r05 remains, then (d) q_embed_pq, whose implementation moved to the
# persisted PQ index this round, then (e) the stalest r05-stamped
# queries filling the remaining slots. Every query is additionally
# verified by the identical in-repo oracle harness (tools/check.py,
# tests/test_oracle.py) every round regardless of window membership,
# and every name below must be registered (phantom entries fail CI
# instead of being silently dropped by _ordered()).
WINDOW_PRIORITY: tuple[str, ...] = (
    # never-stamped round-9 registrations lead
    "q_table_delete_dv",
    "q_stream_cdc_apply",
    "q_table_delete",
    "q_merge_versioned",
    "q_cdc_read_changes",
    "q_scan_file_skip",
    "q_scan_partition_prune",
    "q_stream_join_outer",
    "q_stream_dedup",
    "q_dedup_substring",
    "q_table_update",
    "q_sim_ivf_pq",
    "q_table_files_meta",
    "q_scan_bloom_skip",
    "q_scan_zorder_skip",
    "q_dedup_incremental",
    "q_tpch_q7_shape",
    "q_tpch_q8_shape",
    "q_tpch_q9_shape",
    "q_tpch_q10_shape",
    "q_tpch_q11_shape",
    "q_tpch_q12_shape",
    "q_tpch_q14_shape",
    "q_tpch_q15_shape",
    "q_tpch_q16_shape",
    "q_tpch_q19_shape",
    "q_tpch_q20_shape",
    # oracle upgraded r8, no driver hash stamp yet
    "q_embed_pca_power",
    # the 23 r04-stamped queries (VERDICT r8 item 1)
    "q_multimodal_phash_pairs",
    "q_profile_table",
    "q_regression_kfold",
    "q_sample_hash",
    "q_sample_stratified",
    "q_sample_weighted",
    "q_sim_pq_adc",
    "q_sketch_hll_intersect",
    "q_stream_enrich",
    "q_stream_running_totals",
    "q_table_checksum",
    "q_text_boilerplate",
    "q_text_bpe_learn",
    "q_text_entropy",
    "q_tpch_q21_shape",
    "q_ts_autocorr",
    "q_ts_changepoint",
    "q_ts_interpolate",
    "q_ts_rollup_hier",
    "q_ts_seasonal",
    "q_window_distribution",
    # implementation moved to the persisted PQ index this round
    "q_embed_pq",
    # stalest r05-stamped fill
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

    _LOADED = True
