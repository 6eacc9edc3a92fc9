"""10x-scale spot-check fixture builder (VERDICT r14 item 7).

The sf0.1 bench became entirely fixed-cost-dominated (every 8-vs-32
core ratio ~1), so it can no longer distinguish a serial operator from
an overhead floor. This tool materializes a DETERMINISTIC 10x variant
of the two data-heavy tables into a temp fixture dir:

- documents: ten shifted copies (doc_id + k*1e8, k = 0..9); copies
  k >= 1 append a distinct ' zzcopyK' token so the corpus is not a
  wall of exact duplicates but contains realistic cross-copy
  near-dups (n_chars recomputed to stay consistent with text);
- lineitem: ten shifted copies (l_orderkey + k*1e9) over the SAME
  part universe — a 10x denser co-purchase graph;
- every other table is copied as-is.

Usage:
    python tools/scale_spot.py build [OUTDIR]     # default /tmp/mimr_sfx10
    # then time queries against it at each core count:
    SPARK_GRAFT_CPUS=32 python tools/qprof.py --sf OUTDIR --trials 2 q_...
    SPARK_GRAFT_CPUS=8  python tools/qprof.py --sf OUTDIR --trials 2 q_...

This is a measurement tool: nothing in the query paths reads the
generated directory unless the caller passes it explicitly, and
generation is one-shot (no caching of query RESULTS anywhere).
"""

from __future__ import annotations

import os
import shutil
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from meta_iterative_mapreduce_spark.session import get_spark  # noqa: E402

SRC = "/root/testdata/sf0.1"
DEFAULT_OUT = "/tmp/mimr_sfx10"
COPIES = 10
DOC_STRIDE = 100_000_000  # divisible by 4: preserves the %4 base/batch split
ORDER_STRIDE = 1_000_000_000


def build(out: str) -> None:
    spark = get_spark(
        "scale-spot-build",
        extra_conf={"spark.ui.showConsoleProgress": "false"},
    )
    if os.path.exists(out):
        shutil.rmtree(out)
    os.makedirs(out)
    docs = spark.read.parquet(os.path.join(SRC, "documents.parquet"))
    parts = []
    for k in range(COPIES):
        c = docs.select(
            (F.col("doc_id") + F.lit(k * DOC_STRIDE)).alias("doc_id"),
            (
                F.col("text")
                if k == 0
                else F.concat(F.col("text"), F.lit(f" zzcopy{k}"))
            ).alias("text"),
            "lang",
            "source",
        )
        parts.append(c.withColumn("n_chars", F.length("text").cast("long")))
    big_docs = parts[0]
    for p in parts[1:]:
        big_docs = big_docs.unionByName(p)
    big_docs.select("doc_id", "text", "lang", "source", "n_chars").repartition(
        32
    ).write.mode("overwrite").parquet(os.path.join(out, "documents.parquet"))

    li = spark.read.parquet(os.path.join(SRC, "lineitem.parquet"))
    big_li = None
    for k in range(COPIES):
        c = li.withColumn(
            "l_orderkey",
            (F.col("l_orderkey") + F.lit(k * ORDER_STRIDE)).cast("long"),
        )
        big_li = c if big_li is None else big_li.unionByName(c)
    big_li.repartition(64).write.mode("overwrite").parquet(
        os.path.join(out, "lineitem.parquet")
    )

    for name in os.listdir(SRC):
        if name in ("documents.parquet", "lineitem.parquet"):
            continue
        s, d = os.path.join(SRC, name), os.path.join(out, name)
        if os.path.isdir(s):
            shutil.copytree(s, d)
        else:
            shutil.copy2(s, d)
    n_docs = spark.read.parquet(
        os.path.join(out, "documents.parquet")
    ).count()
    n_li = spark.read.parquet(os.path.join(out, "lineitem.parquet")).count()
    print(f"built {out}: documents={n_docs} lineitem={n_li}")


if __name__ == "__main__":
    cmd = sys.argv[1] if len(sys.argv) > 1 else "build"
    if cmd != "build":
        raise SystemExit(__doc__)
    build(sys.argv[2] if len(sys.argv) > 2 else DEFAULT_OUT)
