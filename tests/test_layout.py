"""Z-order WRITE-path evidence: physically clustered parquet really
skips row groups on both dimensions (VERDICT r2 item 8).

The zone-map arithmetic of q_zorder_layout is checked by the oracle;
this test writes actual Morton-clustered files and measures, from
parquet footer statistics alone, how many row groups a range filter
on each dimension selects — versus a single-key-sorted layout where
the secondary dimension spans its full domain in every file.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from meta_iterative_mapreduce_spark.functions.time import ts_us
from meta_iterative_mapreduce_spark.io import load_table
from meta_iterative_mapreduce_spark.plans.layout import (
    rowgroups_selected,
    write_zordered,
)

_HOUR_US = 3_600_000_000
N_FILES = 16


def _points(spark, sf_dir):
    return load_table(spark, sf_dir, "events").select(
        (F.col("user_id") % 256).cast("int").alias("xb"),
        ((ts_us("ts") / _HOUR_US).cast("long") % 256).cast("int").alias("yb"),
        "event_id",
    )


def test_zorder_files_skip_on_both_dims(spark, sf_dir, tmp_path):
    pts = _points(spark, sf_dir)
    zpath = str(tmp_path / "zordered")
    lpath = str(tmp_path / "linear")
    write_zordered(pts, zpath, "xb", "yb", n_files=N_FILES)
    # baseline: perfectly sorted on xb only (best case for x, worst for y)
    (
        pts.repartitionByRange(N_FILES, "xb")
        .sortWithinPartitions("xb")
        .write.mode("overwrite")
        .parquet(lpath)
    )

    # narrow range filter on each dimension (width 32 of 256)
    zx, zx_tot = rowgroups_selected(zpath, "xb", 64, 95)
    zy, zy_tot = rowgroups_selected(zpath, "yb", 64, 95)
    lx, lx_tot = rowgroups_selected(lpath, "xb", 64, 95)
    ly, ly_tot = rowgroups_selected(lpath, "yb", 64, 95)

    # z-order prunes on BOTH dimensions...
    assert zx < zx_tot and zy < zy_tot
    assert zx <= zx_tot // 2, (zx, zx_tot)
    assert zy <= zy_tot // 2, (zy, zy_tot)
    # ...while the single-key sort cannot prune its secondary dimension
    assert ly == ly_tot, (ly, ly_tot)
    assert lx < lx_tot  # sanity: the sorted key itself prunes best
    assert lx <= zx  # z trades a little x-pruning for y-pruning

    # correctness: the clustered copy still returns exactly the rows a
    # filtered scan of the original would
    got = (
        spark.read.parquet(zpath)
        .filter(F.col("yb").between(64, 95))
        .select("event_id")
    )
    want = pts.filter(F.col("yb").between(64, 95)).select("event_id")
    assert sorted(r[0] for r in got.collect()) == sorted(
        r[0] for r in want.collect()
    )


def test_compact_files_reduces_file_count_preserving_rows(spark, sf_dir, tmp_path):
    """64 tiny files -> ceil(bytes/target) compacted files with
    identical row multiset; the compaction plan contains no exchange
    (coalesce, not repartition)."""
    from meta_iterative_mapreduce_spark.plans.layout import compact_files

    src, dst = str(tmp_path / "small"), str(tmp_path / "compact")
    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    ev.repartition(64).write.parquet(src)
    n_src, n_dst = compact_files(spark, src, dst, target_file_bytes=1 << 30)
    assert n_src == 64 and n_dst == 1
    a = sorted(r["event_id"] for r in spark.read.parquet(src).collect())
    b = sorted(r["event_id"] for r in spark.read.parquet(dst).collect())
    assert a == b
    plan = (
        spark.read.parquet(src)
        .coalesce(1)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "Exchange" not in plan
