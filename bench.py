"""Benchmark harness: runs every registered query at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints
ONE JSON line: {"metric": ..., "value": total_sec, "unit": "sec",
"queries": {name: sec, ...}, "sf": ...}.

Each query is materialized with the no-op writer (full engine
execution, no driver-side row transfer) so timings measure the plan,
not pandas conversion. The flagship iterative fit is timed as
`entry_flagship`.
"""

from __future__ import annotations

import json
import os
import re
import sys
import time

from meta_iterative_mapreduce_spark import registry
from meta_iterative_mapreduce_spark.operators.regression import flagship
from meta_iterative_mapreduce_spark.session import get_spark


def materialize(df) -> None:
    df.write.mode("overwrite").format("noop").save()


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    m = re.search(r"sf([0-9.]+)", sf_dir)
    sf = float(m.group(1)) if m else -1.0
    spark = get_spark("mimr-bench")

    timings: dict[str, float] = {}
    # warm the JVM/codegen path and the input file index once so the
    # first timed query isn't charged for session bring-up
    spark.range(1000).count()
    spark.read.parquet(os.path.join(sf_dir, "lineitem.parquet")).count()

    trials_flagship = int(os.environ.get("MIMR_BENCH_TRIALS", "2"))
    best = None
    for _ in range(trials_flagship):
        t0 = time.time()
        flagship(spark, sf_dir).collect()
        dt = time.time() - t0
        best = dt if best is None else min(best, dt)
    timings["entry_flagship"] = round(best, 3)

    trials = int(os.environ.get("MIMR_BENCH_TRIALS", "2"))
    for name, fn in registry.queries().items():
        best = None
        try:
            for _ in range(trials):
                t0 = time.time()
                materialize(fn(spark, sf_dir))
                dt = time.time() - t0
                best = dt if best is None else min(best, dt)
            timings[name] = round(best, 3)
        except Exception as exc:  # noqa: BLE001
            timings[name] = -1.0
            print(f"bench error in {name}: {exc}", file=sys.stderr)

    total = round(sum(t for t in timings.values() if t >= 0), 3)
    print(
        json.dumps(
            {
                "metric": "total_query_wall_clock",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "sf": sf,
            }
        )
    )


if __name__ == "__main__":
    main()
