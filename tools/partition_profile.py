"""Hive-partitioned versioned-table scale profile (round 9): does
partition pruning actually deliver O(matching files) selective reads
as row count and partition count grow?

Builds partitioned snapshots at several sizes, then measures per size:

- write_version(partition_by=...) wall-clock (one distributed
  partitionBy job + footer-stats + path-stats harvest);
- plan_files latency for a single-partition predicate (pure manifest
  math — must stay milliseconds regardless of data volume);
- pruned read (1 of P partitions) vs full-scan-and-filter wall-clock
  for the same answer, verified EQUAL;
- a cross-partition DML touch (delete in one partition) and the
  re-read, proving mixed hive/plain file shapes stay cheap.

Usage: python tools/partition_profile.py [rows_list]
       default "2000000,8000000,20000000"
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

N_PARTS = 64  # partition-key cardinality


def main() -> None:
    sizes = [
        int(s)
        for s in (
            sys.argv[1] if len(sys.argv) > 1 else "2000000,8000000,20000000"
        ).split(",")
    ]
    spark = get_spark("partition-profile")
    root = tempfile.mkdtemp(prefix="mimr_part_profile_")
    out = []
    try:
        for n in sizes:
            table = os.path.join(root, f"t{n}")
            df = spark.range(0, n).select(
                F.col("id").alias("k"),
                (F.col("id") % N_PARTS).cast("int").alias("p"),
                (F.col("id") * 7 % 1000).alias("v"),
                # ~200 B payload so the scan is I/O-meaningful
                F.repeat(F.concat(F.lit("x"), F.col("id").cast("string")), 20).alias(
                    "payload"
                ),
                # pre-cluster by the partition key: raw partitionBy of a
                # task-parallel frame writes tasks*partitions files (the
                # small-files explosion — the first profile run measured
                # 2048 of them); one file per partition is the layout a
                # real writer produces
            ).repartition(N_PARTS, F.col("p"))
            t0 = time.time()
            versioned.write_version(df, table, partition_by="p")
            t_write = time.time() - t0

            t0 = time.time()
            kept, total = versioned.plan_files(table, where=("p", "=", 17))
            t_plan = time.time() - t0

            def timed(frame):
                # sum(length(payload)) defeats column pruning so the
                # read really moves the wide column — the I/O a
                # selective 100 TB read would pay
                t0 = time.time()
                r = frame.agg(
                    F.count(F.lit(1)).alias("n"),
                    F.sum("v").alias("s"),
                    F.sum(F.length("payload")).alias("b"),
                ).collect()[0]
                return (r["n"], r["s"], r["b"]), time.time() - t0

            pruned_ans, t_pruned = timed(
                versioned.read_version(spark, table, where=("p", "=", 17))
            )
            # NOTE: even without the manifest prune, a read of the
            # partitioned layout is partition-pruned by Spark's own
            # PartitionFilters (the basePath read restores the hive
            # dirs), so the honest unpruned baseline is a separate
            # UNCLUSTERED table: round-robin layout, every file holds
            # every p value, nothing — manifest, partition dirs, or
            # row-group stats — can skip.
            flat = os.path.join(root, f"flat{n}")
            versioned.write_version(df.repartition(N_PARTS), flat)
            full_ans, t_full = timed(
                versioned.read_version(spark, flat).filter("p = 17")
            )
            assert pruned_ans == full_ans, (pruned_ans, full_ans)
            shutil.rmtree(flat)

            t0 = time.time()
            versioned.delete_where(spark, table, "p = 3 and k % 2 = 0")
            t_delete = time.time() - t0
            mixed_ans, t_mixed = timed(
                versioned.read_version(spark, table, where=("p", "=", 17))
            )
            assert mixed_ans == pruned_ans  # untouched partition intact

            row = {
                "rows": n,
                "files_total": total,
                "files_pruned_read": len(kept),
                "t_partitioned_write_s": round(t_write, 2),
                "t_plan_files_ms": round(t_plan * 1000, 2),
                "t_pruned_read_s": round(t_pruned, 2),
                "t_unclustered_filter_s": round(t_full, 2),
                # local page-cache wall-clock is roughly PAR: the
                # pruned read trades 64x fewer bytes for 64x less scan
                # parallelism (one file), which a local[32] box with
                # warm cache doesn't reward — the object-store win is
                # the files/bytes fraction, which IS the measurement
                "files_fraction_read": round(len(kept) / total, 4),
                "wall_ratio_unclustered_over_pruned": round(
                    t_full / max(t_pruned, 1e-9), 2
                ),
                "t_delete_one_partition_s": round(t_delete, 2),
                "t_pruned_read_post_dml_s": round(t_mixed, 2),
            }
            out.append(row)
            print(json.dumps(row))
            shutil.rmtree(table)
    finally:
        shutil.rmtree(root, ignore_errors=True)
    print(json.dumps({"profile": "partition_prune", "results": out}))


if __name__ == "__main__":
    main()
