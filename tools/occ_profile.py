"""Optimistic-concurrency contention profile (round 9): K writer
threads race append_version commits into ONE table; measure commit
retries, wall-clock, and verify exactly-once landing.

What it proves: the put-if-absent manifest publish + rebase loop
turns write-write races into retries, never lost updates — the
multi-writer contract a shared 100 TB table needs. The interesting
numbers are retries/commit (how hot is the version counter) and the
serialization overhead vs sequential appends of the same batches.

Usage: python tools/occ_profile.py [n_threads] [appends_per_thread]
       default 4 x 8
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import threading
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from meta_iterative_mapreduce_spark.session import get_spark  # noqa: E402
from meta_iterative_mapreduce_spark.sources import versioned  # noqa: E402


def main() -> None:
    k = int(sys.argv[1]) if len(sys.argv) > 1 else 4
    n = int(sys.argv[2]) if len(sys.argv) > 2 else 8
    spark = get_spark("occ-profile")
    root = tempfile.mkdtemp(prefix="mimr_occ_")

    # retry counter: every _commit ValueError is one lost race
    races = {"n": 0}
    real_commit = versioned._commit

    def counting_commit(*a, **kw):
        try:
            return real_commit(*a, **kw)
        except ValueError:
            races["n"] += 1
            raise

    versioned._commit = counting_commit

    def batch(tid: int, i: int):
        lo = (tid * n + i) * 1000
        return spark.range(lo, lo + 100).select(
            F.col("id").alias("k"), (F.col("id") * 2).alias("v")
        )

    try:
        # sequential baseline
        seq = os.path.join(root, "seq")
        t0 = time.time()
        for tid in range(k):
            for i in range(n):
                versioned.append_version(batch(tid, i), seq)
        t_seq = time.time() - t0
        races_seq = races["n"]

        # concurrent run
        races["n"] = 0
        con = os.path.join(root, "con")
        errs: list[Exception] = []

        def writer(tid: int):
            try:
                for i in range(n):
                    versioned.append_version(batch(tid, i), con)
            except Exception as e:  # noqa: BLE001
                errs.append(e)

        ts = [threading.Thread(target=writer, args=(tid,)) for tid in range(k)]
        t0 = time.time()
        for t in ts:
            t.start()
        for t in ts:
            t.join()
        t_con = time.time() - t0
        assert not errs, errs

        got = versioned.read_version(spark, con)
        n_commits = k * n
        result = {
            "profile": "occ_append",
            "threads": k,
            "appends_per_thread": n,
            "t_sequential_s": round(t_seq, 2),
            "t_concurrent_s": round(t_con, 2),
            "speedup": round(t_seq / max(t_con, 1e-9), 2),
            "commit_races_retried": races["n"],
            "races_per_commit": round(races["n"] / n_commits, 2),
            "versions_contiguous": versioned.versions(con)
            == list(range(1, n_commits + 1)),
            "rows_exactly_once": got.count() == n_commits * 100
            and got.select("k").distinct().count() == n_commits * 100,
            "sequential_races_sanity": races_seq,
        }
        print(json.dumps(result))
        assert result["versions_contiguous"] and result["rows_exactly_once"]

        # ---- phase 2 (round 10): DML contention — K threads each
        # deleting a DISJOINT key range of ONE shared table, with
        # prune hints, in both disciplines. The OCC disjointness proof
        # (_commit_rewrite / _commit_dv) must rebase every lost race:
        # all K deletes land, none lost, no conflict surfaces.
        for mode in ("cow", "dv"):
            races["n"] = 0
            tbl = os.path.join(root, f"dml_{mode}")
            rows = 100_000
            # 16 files with EXACT range boundaries (4 per thread
            # range): repartitionByRange samples its split points, so
            # a sampled file can straddle two threads' ranges — a
            # GENUINE write-write conflict, not what this phase
            # measures. (The conflict-recovery counter below still
            # exercises that path if layouts drift.)
            n_files = 16
            fw = rows // n_files
            base = spark.range(0, rows).select(
                F.col("id").alias("k"), (F.col("id") * 2).alias("v")
            )
            for i in range(n_files):
                sl = base.filter(
                    (F.col("k") >= i * fw) & (F.col("k") < (i + 1) * fw)
                ).coalesce(1)
                (versioned.write_version if i == 0 else versioned.append_version)(
                    sl, tbl
                )
            n_base = len(versioned.versions(tbl))
            width = rows // k
            derrs: list[Exception] = []
            conflicts = {"n": 0}

            def dml_writer(tid: int):
                lo, hi = tid * width, (tid + 1) * width
                for _attempt in range(4):
                    try:
                        versioned.delete_where(
                            spark,
                            tbl,
                            f"k >= {lo} AND k < {hi} AND k % 10 = 3",
                            mode=mode,
                            # bounded-range hint: the disjointness
                            # proof needs BOTH ends, else another
                            # writer's rewrites look like adds the
                            # probe should have read
                            prune=[("k", ">=", lo), ("k", "<", hi)],
                        )
                        return
                    except versioned.CommitConflict:
                        conflicts["n"] += 1  # documented recovery:
                        continue  # re-run against the new head
                    except Exception as e:  # noqa: BLE001
                        derrs.append(e)
                        return
                derrs.append(RuntimeError(f"writer {tid} gave up"))

            ts = [
                threading.Thread(target=dml_writer, args=(tid,))
                for tid in range(k)
            ]
            t0 = time.time()
            for t in ts:
                t.start()
            for t in ts:
                t.join()
            t_dml = time.time() - t0
            got = versioned.read_version(spark, tbl)
            n_deleted = rows - got.count()
            res2 = {
                "profile": f"occ_dml_{mode}",
                "threads": k,
                "wall_s": round(t_dml, 2),
                "true_conflicts_rerun": conflicts["n"],
                "commit_races_rebased": races["n"] - conflicts["n"],
                "n_versions": len(versioned.versions(tbl)) - n_base,
                "rows_deleted": n_deleted,
                "expected_deleted": rows // 10,
                "no_stragglers": got.filter("k % 10 = 3").count() == 0,
            }
            print(json.dumps(res2))
            assert not derrs, derrs[:1]
            assert res2["rows_deleted"] == res2["expected_deleted"]
            assert res2["no_stragglers"]
            assert res2["n_versions"] == k  # every delete committed
    finally:
        versioned._commit = real_commit
        shutil.rmtree(root, ignore_errors=True)


if __name__ == "__main__":
    main()
