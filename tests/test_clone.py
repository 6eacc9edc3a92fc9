"""CLONE (round 12): zero-copy hard-link fork of a versioned table.
The load-bearing claims: metadata carries verbatim (pruning, DVs,
constraints, batch ledger all work on the clone without recompute),
the two tables diverge independently after the clone, and — the
hard-link property symlink- or URI-based shallow clones lack —
VACUUM ON EITHER SIDE never breaks the other."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from meta_iterative_mapreduce_spark.sources import versioned as V


def _src_table(spark, tmp_path) -> str:
    table = str(tmp_path / "src")
    df = spark.range(0, 100).select(
        F.col("id").alias("k"), (F.col("id") * 2).alias("v")
    )
    for i in range(4):
        sl = df.filter(
            (F.col("k") >= i * 25) & (F.col("k") < (i + 1) * 25)
        ).coalesce(1)
        (V.write_version if i == 0 else V.append_version)(sl, table)
    return table


def test_clone_equals_source_and_diverges(spark, tmp_path):
    src = _src_table(spark, tmp_path)
    dst = str(tmp_path / "dst")
    assert V.clone_table(src, dst) == 1
    got = V.read_version(spark, dst)
    assert got.count() == 100
    assert got.agg(F.sum("v")).collect()[0][0] == sum(
        2 * k for k in range(100)
    )
    # zero-copy: every cloned data file shares its inode with the src
    m = V.manifest_info(dst)
    for f in m["files"]:
        assert os.path.samefile(
            os.path.join(src, f), os.path.join(dst, f)
        )
    # divergence: DML on the clone leaves the source untouched...
    V.delete_where(spark, dst, "k < 50")
    assert V.read_version(spark, dst).count() == 50
    assert V.read_version(spark, src).count() == 100
    # ...and vice versa
    V.append_version(
        spark.createDataFrame([(500, 1000)], "k long, v long"), src
    )
    assert V.read_version(spark, src).count() == 101
    assert V.read_version(spark, dst).count() == 50
    # the clone's history starts fresh at its snapshot
    assert V.read_version(spark, dst, 1).count() == 100


def test_clone_at_version_and_metadata_carry(spark, tmp_path):
    src = _src_table(spark, tmp_path)  # 4 versions, key-sliced files
    dst = str(tmp_path / "dst")
    V.clone_table(src, dst, version=2)  # first two slices only
    assert V.read_version(spark, dst).count() == 50
    # carried file stats prune on the CLONE without any recompute
    kept, total = V.plan_files(dst, where=("k", "<", 25))
    assert (len(kept), total) == (1, 2)
    m = V.manifest_info(dst)
    assert m["operation"] == "CLONE"
    assert m["clone_source_version"] == 2
    assert m["clone_source"] == os.path.abspath(src)


def test_clone_carries_dvs_constraints_and_ledger(spark, tmp_path):
    src = _src_table(spark, tmp_path)
    V.add_constraint(spark, src, "k_nonneg", "k >= 0")
    V.delete_where(spark, src, "k % 10 = 7", mode="dv")
    upd = spark.createDataFrame([(1, 999)], "k long, v long")
    V.merge_version(spark, src, upd, "k", batch_id=41)
    dst = str(tmp_path / "dst")
    V.clone_table(src, dst)
    got = V.read_version(spark, dst)
    assert got.count() == 90  # DV mask applies on the clone
    assert got.filter("k % 10 = 7").count() == 0
    assert got.filter("k = 1").collect()[0]["v"] == 999
    # constraint enforced on the clone
    with pytest.raises(ValueError, match="k_nonneg"):
        V.append_version(
            spark.createDataFrame([(-5, 0)], "k long, v long"), dst
        )
    # the exactly-once ledger carried: replaying batch 41 is a no-op
    head = V.versions(dst)[-1]
    V.merge_version(spark, dst, upd, "k", batch_id=41)
    assert V.versions(dst)[-1] == head


def test_vacuum_on_either_side_is_safe(spark, tmp_path):
    """The hard-link property: src vacuuming away the cloned snapshot's
    own references — or the clone vacuuming after divergence — never
    invalidates the other side's bytes (the inode survives until the
    LAST referencing table unlinks it)."""
    src = _src_table(spark, tmp_path)
    dst = str(tmp_path / "dst")
    V.clone_table(src, dst)
    # src rewrites everything, then vacuums aggressively: the old
    # files (shared with the clone) are unlinked on the src side
    V.compact_version(spark, src, sort_col="k", target_files=1)
    V.vacuum(src, keep_versions=1)
    assert V.read_version(spark, dst).count() == 100  # clone intact
    # clone rewrites + vacuums: src stays intact too
    V.delete_where(spark, dst, "k >= 0")  # full rewrite (CoW)
    V.vacuum(dst, keep_versions=1)
    assert V.read_version(spark, src).count() == 100
    assert V.read_version(spark, dst).count() == 0


def test_clone_guards(spark, tmp_path):
    src = _src_table(spark, tmp_path)
    dst = str(tmp_path / "dst")
    V.clone_table(src, dst)
    with pytest.raises(ValueError, match="already a table"):
        V.clone_table(src, dst)
    V.vacuum(src, keep_versions=1)
    # the vacuumed version's manifest is gone: version resolution
    # itself raises (the clone-side missing-file guard covers files
    # deleted out-of-band while the manifest survives)
    with pytest.raises(ValueError, match="not in"):
        V.clone_table(src, str(tmp_path / "dst2"), version=1)
