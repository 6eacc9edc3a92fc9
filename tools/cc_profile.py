"""Connected-components scaling profile (VERDICT r4/r6 carry): the
star-round curve from 5M to 50M edges, with exact expected component
counts at every point.

Graph generator is scale_smoke.py's mixed-shape family (stars of 4
whose leaders chain in runs of 256 → components of 1024 nodes with
chain diameter ~256 — the long-chain case that kills naive label
propagation), so the numbers compose with the existing 5M BENCH rows.

Reports, per scale: wall-clock to fixpoint, number of star rounds,
and the per-round edge-set size (the quantity whose monotone shrink
is the 100 TB argument — each round's shuffle is the CURRENT edge
set, so the curve proves the rounds amortize instead of rescanning
the input graph).

Usage: python tools/cc_profile.py [max_edges] [scales...]
       (default 50_000_000 at 5M/12.5M/25M/50M)

At 50M edges the single local JVM needs more heap than the default
session's 16g (several live localCheckpoint copies of the edge set +
shuffle): run with MIMR_DRIVER_MEM=48g. On a real cluster this is
per-executor memory and a non-issue.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from meta_iterative_mapreduce_spark.operators.components import (  # noqa: E402
    connected_components,
)
from meta_iterative_mapreduce_spark.session import get_spark  # noqa: E402


def chain_star_edges(spark, n_edges: int):
    """scale_smoke.py's graph: stars of 4, leaders chained in runs of
    256 → exact component count = ceil(n_edges/4 / 256)."""
    stars = spark.range(n_edges).select(
        F.col("id").alias("u"), (F.col("id") - F.col("id") % 4).alias("v")
    )
    n_leaders = n_edges // 4
    leaders = spark.range(n_leaders).select(
        (F.col("id") * 4).alias("u"),
        F.when(F.col("id") % 256 == 0, F.col("id") * 4)
        .otherwise(F.col("id") * 4 - 4)
        .alias("v"),
    )
    return stars.union(leaders), (n_leaders + 255) // 256


def profile_cc(edges, max_iter: int = 30):
    """connected_components with per-round instrumentation via its
    on_round hook: returns (labels_df, [(round, edge_count, s)...])."""
    curve = []
    labels = connected_components(
        edges,
        max_iter=max_iter,
        on_round=lambda i, n, s: curve.append((i, n, s)),
    )
    return labels, curve


def main() -> None:
    max_edges = int(sys.argv[1]) if len(sys.argv) > 1 else 50_000_000
    scales = (
        [int(s) for s in sys.argv[2:]]
        if len(sys.argv) > 2
        else [s for s in (5_000_000, 12_500_000, 25_000_000, 50_000_000)
              if s <= max_edges]
    )
    spark = get_spark(
        "mimr-cc-profile",
        extra_conf={"spark.ui.showConsoleProgress": "false"},
    )
    for n_edges in scales:
        edges, expected = chain_star_edges(spark, n_edges)
        t0 = time.time()
        labels, curve = profile_cc(edges)
        n_comp = labels.select("component_id").distinct().count()
        wall = time.time() - t0
        ok = "OK" if n_comp == expected else "MISMATCH"
        print(
            f"edges={n_edges:>12,} wall={wall:7.1f}s rounds={len(curve):2d} "
            f"components={n_comp:,} (expected {expected:,}) {ok}"
        )
        print(
            "  round curve (round, |E|, s): "
            + " ".join(f"({r},{c:,},{s})" for r, c, s in curve)
        )
        assert n_comp == expected, (n_comp, expected)
        spark.catalog.clearCache()


if __name__ == "__main__":
    main()
