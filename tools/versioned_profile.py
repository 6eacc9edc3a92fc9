"""Versioned-table METADATA scaling profile (round 8): how do commit,
read-planning, rename/drop, and vacuum costs move as the log grows?

The r8 column-mapping work made renames/drops O(1) manifest commits;
this profile measures the remaining metadata costs a 100 TB
deployment would care about:

- append_version commit latency vs version count (each manifest
  lists the FULL live file list, so the manifest WRITE is O(files) —
  the question is the constant and when it starts to matter);
- rename_column / drop_column latency (should be flat — they write
  one manifest, no data);
- read_version plan+collect latency for v=1 / mid / head (the file
  list length grows with appends);
- vacuum wall-clock and its effect on subsequent commits.

Each appended batch is tiny (8 rows) so the numbers are
metadata-dominated, not data-dominated.

Usage: python tools/versioned_profile.py [n_versions]   (default 240)
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from meta_iterative_mapreduce_spark.session import get_spark  # noqa: E402
from meta_iterative_mapreduce_spark.sources import versioned  # noqa: E402


def main() -> None:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 240
    spark = get_spark(
        "mimr-versioned-profile",
        extra_conf={"spark.ui.showConsoleProgress": "false"},
    )
    table = os.path.join(tempfile.mkdtemp(prefix="mimr_vprof_"), "tbl")
    # v1 carries a dedicated `tag` column that later appends OMIT
    # (null-fills on read) so metadata-only renames of `tag` never
    # collide with the append schema
    first = spark.createDataFrame(
        [(i, f"v{i}", "t") for i in range(8)],
        "k int, payload string, tag string",
    )
    batch = spark.createDataFrame(
        [(i, f"v{i}") for i in range(8)], "k int, payload string"
    )
    commit_t: list[float] = []
    t0 = time.time()
    versioned.write_version(first, table)
    commit_t.append(time.time() - t0)
    quarts = {1, n // 4, n // 2, 3 * n // 4, n - 1}
    rename_t, read_t = [], {}
    tag = "tag"
    for v in range(1, n):
        t0 = time.time()
        versioned.append_version(batch, table)
        commit_t.append(time.time() - t0)
        if v in quarts:
            # metadata-only rename at this log depth
            new_tag = f"tag_{v}"
            t0 = time.time()
            versioned.rename_column(spark, table, tag, new_tag)
            rename_t.append(round(time.time() - t0, 4))
            tag = new_tag
            t0 = time.time()
            cnt = versioned.read_version(spark, table).count()
            read_t[versioned.versions(table)[-1]] = round(time.time() - t0, 3)
            assert cnt == 8 * (v + 1), (cnt, v)
    # window means of commit latency: does it grow with the log?
    def mean(xs):
        return round(sum(xs) / len(xs), 4)

    w = max(10, n // 8)
    head, mid, tail = commit_t[1 : 1 + w], commit_t[n // 2 : n // 2 + w], commit_t[-w:]
    t0 = time.time()
    gc = versioned.vacuum(table, keep_versions=4)
    vac_s = round(time.time() - t0, 3)
    t0 = time.time()
    versioned.append_version(batch, table)
    post_vac_commit = round(time.time() - t0, 4)
    # OPTIMIZE: the small-files fix — commit a compacted full
    # snapshot (a handful of right-sized files), then vacuum
    # everything the snapshot superseded, and re-measure the read
    t0 = time.time()
    versioned.write_version(
        versioned.read_version(spark, table).coalesce(4), table
    )
    optimize_s = round(time.time() - t0, 3)
    gc2 = versioned.vacuum(table, keep_versions=1)
    t0 = time.time()
    n_rows = versioned.read_version(spark, table).count()
    read_after_optimize = round(time.time() - t0, 3)
    assert n_rows == 8 * (n + 1), n_rows
    print(
        json.dumps(
            {
                "n_versions": n,
                "commit_mean_s": {
                    "first_window": mean(head),
                    "mid_window": mean(mid),
                    "last_window": mean(tail),
                },
                "rename_s": rename_t,
                "read_latest_s_by_version": read_t,
                "vacuum_s": vac_s,
                "vacuum_deleted_files": gc["deleted_files"],
                "post_vacuum_commit_s": post_vac_commit,
                "optimize_snapshot_s": optimize_s,
                "optimize_vacuum_deleted_files": gc2["deleted_files"],
                "read_latest_after_optimize_s": read_after_optimize,
            }
        )
    )
    shutil.rmtree(os.path.dirname(table), ignore_errors=True)
    spark.stop()


if __name__ == "__main__":
    main()
