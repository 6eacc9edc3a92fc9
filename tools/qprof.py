"""Single-query profiler for the optimization rounds.

Usage: python tools/qprof.py <query> [<query> ...] [--plan OUT.txt]
       [--sf DIR] [--trials N]

Builds each named registry query at $SPARK_GRAFT_SF_DIR (default
sf0.1), materializes it with the noop sink (guide §1.4), prints
build/first/best-of-N timings, and optionally writes
.explain('formatted') to OUT.txt (one file per query when multiple).
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from meta_iterative_mapreduce_spark import registry
from meta_iterative_mapreduce_spark.session import get_spark


def main() -> None:
    args = sys.argv[1:]
    plan_out = None
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    trials = 3
    names = []
    i = 0
    while i < len(args):
        if args[i] == "--plan":
            plan_out = args[i + 1]
            i += 2
        elif args[i] == "--sf":
            sf_dir = args[i + 1]
            i += 2
        elif args[i] == "--trials":
            trials = int(args[i + 1])
            i += 2
        else:
            names.append(args[i])
            i += 1

    spark = get_spark(
        "mimr-qprof", extra_conf={"spark.ui.showConsoleProgress": "false"}
    )
    spark.range(1000).count()  # warm codegen path
    qs = registry.queries()
    for name in names:
        fn = qs[name]
        spark.sparkContext.setJobDescription(f"qprof:{name}")
        t0 = time.time()
        df = fn(spark, sf_dir)
        t_build = time.time() - t0
        times = []
        for _ in range(trials):
            t0 = time.time()
            df2 = fn(spark, sf_dir)
            df2.write.mode("overwrite").format("noop").save()
            times.append(round(time.time() - t0, 3))
        print(
            f"{name}: build={t_build:.3f}s trials={times} "
            f"best={min(times):.3f}s"
        )
        if plan_out:
            out = plan_out if len(names) == 1 else plan_out.replace(
                ".txt", f".{name}.txt"
            )
            with open(out, "w") as f:
                f.write(df._sc._jvm.PythonSQLUtils.explainString(
                    df._jdf.queryExecution(), "formatted"))
            print(f"  plan -> {out}")
        spark.sparkContext.setJobDescription(None)


if __name__ == "__main__":
    main()
