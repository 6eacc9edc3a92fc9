"""Physical-plan assertions — the scale-posture gate.

Correctness says the DataFrame returns the right rows; these tests pin
the *plan*: filters and projections reach the parquet scan, small dims
broadcast, global top-k avoids a total sort, and relational hot paths
contain no Python evaluation.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from meta_iterative_mapreduce_spark import registry
from meta_iterative_mapreduce_spark.io import load_table


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def test_projection_and_filter_pushdown(spark, sf_dir):
    q = registry.queries()["q_scan_projection_pushdown"]
    plan = _plan(q(spark, sf_dir))
    assert "PushedFilters: [IsNotNull(l_shipdate), LessThan(l_shipdate" in plan
    # column pruning: the scan schema should carry only the 3 needed cols
    assert "l_extendedprice" not in plan


def test_broadcast_join_is_broadcast(spark, sf_dir):
    plan = _plan(registry.queries()["q_join_broadcast"](spark, sf_dir))
    assert "BroadcastHashJoin" in plan


def test_hinted_join_strategies(spark, sf_dir):
    assert "ShuffledHashJoin" in _plan(
        registry.queries()["q_join_shuffle_hash"](spark, sf_dir)
    )
    assert "SortMergeJoin" in _plan(
        registry.queries()["q_join_sort_merge"](spark, sf_dir)
    )


def test_sort_limit_is_top_k_not_global_sort(spark, sf_dir):
    plan = _plan(registry.queries()["q_sort_limit"](spark, sf_dir))
    assert "TakeOrderedAndProject" in plan


def test_relational_plans_stay_jvm_side(spark, sf_dir):
    """No Python evaluation in any relational/text/dedup plan — UDFs are
    quarantined to the q_udf_*/q_udaf_*/q_udtf_*/multimodal queries."""
    qs = registry.queries()
    offenders = []
    for name, fn in qs.items():
        if name.startswith(("q_udf", "q_udaf", "q_udtf", "q_multimodal_decode")):
            continue
        plan = _plan(fn(spark, sf_dir))
        if "BatchEvalPython" in plan or "ArrowEvalPython" in plan or "MapInPandas" in plan:
            offenders.append(name)
    assert not offenders, f"Python in hot path: {offenders}"


def test_agg_uses_partial_aggregation(spark, sf_dir):
    """Grouped agg must show two-phase (partial + final) hash
    aggregation — the map-side combine of the reference's reduce tree."""
    plan = _plan(registry.queries()["q_agg_groupby"](spark, sf_dir))
    assert plan.count("HashAggregate") >= 2


def test_events_ts_normalized(spark, sf_dir):
    ev = load_table(spark, sf_dir, "events")
    assert dict(ev.dtypes)["ts"] == "timestamp"
    # sanity: values are 2024-era, not 1970 (unit bug guard)
    row = ev.agg(F.min("ts").alias("lo"), F.max("ts").alias("hi")).collect()[0]
    assert row["lo"].year == 2024 and row["hi"].year == 2024
