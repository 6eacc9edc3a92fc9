"""DML discipline scaling profile (round 10): copy-on-write vs
merge-on-read for UPDATE and MERGE at data sizes where the difference
matters, plus the CDC stream's O(delta) claim.

What it measures, on an N-row (default 2M) range-clustered table:

- UPDATE of K matched rows: mode="cow" rewrites the files CONTAINING
  matches (cost ~ bytes of touched files) vs mode="dv" which writes
  one DV + one K-row file (cost ~ K). The gap is the whole argument
  for deletion vectors; both answers are verified identical.
- MERGE of a K-row three-clause CDC batch: same comparison.
- stream_cdc consumption of JUST the DML versions vs a full snapshot
  scan — the stream reads O(version delta) bytes, so its wall-clock
  must track the batch size, not the table size.

Usage: python tools/dml_profile.py [n_rows] [k_matches]  (2_000_000 200)
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from meta_iterative_mapreduce_spark.session import get_spark  # noqa: E402
from meta_iterative_mapreduce_spark.sources import versioned  # noqa: E402
from meta_iterative_mapreduce_spark.streaming.table_source import (  # noqa: E402
    stream_cdc,
)


def _build(spark, root: str, n: int) -> str:
    table = os.path.join(root, "tbl")
    df = spark.range(0, n).select(
        F.col("id").alias("k"),
        (F.col("id") * 7 % 1000).alias("v"),
        F.sha2(F.col("id").cast("string"), 256).alias("payload"),
    )
    t0 = time.time()
    versioned.write_version(
        df.repartitionByRange(16, "k").sortWithinPartitions("k"), table
    )
    print(json.dumps({"step": "build", "rows": n, "sec": round(time.time() - t0, 2)}))
    return table


def _timed(label: str, fn, **extra):
    t0 = time.time()
    out = fn()
    rec = {"step": label, "sec": round(time.time() - t0, 2), **extra}
    print(json.dumps(rec))
    return out, rec


def main() -> None:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 2_000_000
    k = int(sys.argv[2]) if len(sys.argv) > 2 else 200
    spark = get_spark(
        "mimr-dml-profile",
        extra_conf={"spark.ui.showConsoleProgress": "false"},
    )
    root = tempfile.mkdtemp(prefix="mimr_dmlprof_")
    try:
        results = []
        for mode in ("cow", "dv"):
            table = _build(spark, os.path.join(root, mode), n)
            # K matched keys spread across every file (worst case for
            # CoW: all 16 files contain a match)
            stride = n // k
            pred = f"k % {stride} = 17"
            _, rec = _timed(
                f"update_{mode}",
                lambda: versioned.update_where(
                    spark, table, {"v": "v + 1"}, pred, mode=mode
                ),
                mode=mode,
                matches=k,
            )
            m = versioned.manifest_info(table)
            rec["files_rewritten"] = len(m.get("removed", []))
            rec["files_added"] = len(m.get("added", []))
            print(json.dumps({"step": f"update_{mode}_files",
                              "rewritten": rec["files_rewritten"],
                              "added": rec["files_added"]}))
            results.append(rec)
            batch = (
                spark.range(0, k)
                .select(
                    (F.col("id") * stride + 23).alias("k"),
                    F.lit(-1).alias("v"),
                    F.lit("upserted").alias("payload"),
                    F.when(F.col("id") % 3 == 0, "d")
                    .otherwise("u")
                    .alias("op"),
                )
            )
            _, rec2 = _timed(
                f"merge_{mode}",
                lambda: versioned.merge_version(
                    spark, table, batch, "k",
                    delete_predicate="op = 'd'", mode=mode,
                ),
                mode=mode,
                batch_rows=k,
            )
            m2 = versioned.manifest_info(table)
            rec2["files_rewritten"] = len(m2.get("removed", []))
            print(json.dumps({"step": f"merge_{mode}_files",
                              "rewritten": rec2["files_rewritten"]}))
            results.append(rec2)
            # verification: both disciplines yield the same state
            s = versioned.read_version(spark, table).agg(
                F.count(F.lit(1)), F.sum("v"), F.sum("k")
            ).collect()[0]
            print(json.dumps({"step": f"state_{mode}", "fingerprint": [int(x) for x in s]}))
            # CDC stream of just the two DML versions
            vs = versioned.versions(table)
            staging = os.path.join(root, f"cdc_{mode}")
            ckpt = os.path.join(root, f"ck_{mode}")
            # position the checkpoint past the snapshot first
            q = (
                stream_cdc(spark, table, "k", until_version=vs[0])
                .writeStream.foreachBatch(lambda df, b: df.count())
                .option("checkpointLocation", ckpt)
                .trigger(availableNow=True)
                .start()
            )
            q.awaitTermination(300)

            def consume():
                qq = (
                    stream_cdc(spark, table, "k")
                    .writeStream.foreachBatch(
                        lambda df, b: df.write.mode("append").parquet(staging)
                    )
                    .option("checkpointLocation", ckpt)
                    .trigger(availableNow=True)
                    .start()
                )
                qq.awaitTermination(300)

            _, rec3 = _timed(f"cdc_stream_dml_only_{mode}", consume, mode=mode)
            rec3["cdc_rows"] = spark.read.parquet(staging).count()
            print(json.dumps({"step": f"cdc_rows_{mode}", "rows": rec3["cdc_rows"]}))
            results.append(rec3)
        _, rec4 = _timed(
            "full_snapshot_scan",
            lambda: versioned.read_version(
                spark, os.path.join(root, "dv", "tbl")
            ).agg(F.sum("v")).collect(),
        )
        results.append(rec4)
        summary = {r["step"]: r["sec"] for r in results}
        print(json.dumps({"summary": summary, "n_rows": n, "k": k}))
    finally:
        shutil.rmtree(root, ignore_errors=True)


if __name__ == "__main__":
    main()
