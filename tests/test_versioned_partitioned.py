"""Hive-partitioned versioned tables: partition values live in the
manifest as exact [v, v] file stats (Iceberg-style metadata
partitioning), readers restore partition columns from the path, and
the ordinary file-skipping machinery prunes whole partitions. Also
pins the row-position key contract: partition dirs REUSE part-file
basenames, so deletion vectors and rewrite probes must key rows by
table-relative path — the class of bug these tests exist to catch."""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from meta_iterative_mapreduce_spark.sources import versioned as V


def _pdf(spark, n=80):
    return spark.range(0, n).select(
        F.col("id").alias("k"),
        (F.col("id") % 4).cast("int").alias("p"),
        (F.col("id") * 3).alias("v"),
    )


def _ptable(spark, tmp_path, n=80) -> str:
    table = str(tmp_path / "pt")
    V.write_version(_pdf(spark, n), table, partition_by="p")
    return table


def test_partitioned_write_round_trips_content(spark, tmp_path):
    table = _ptable(spark, tmp_path)
    got = V.read_version(spark, table)
    assert got.columns == ["k", "p", "v"]
    assert dict(got.dtypes)["p"] == "int"  # restored TYPED from path
    rows = {(r["k"], r["p"], r["v"]) for r in got.collect()}
    want = {(i, i % 4, i * 3) for i in range(80)}
    assert rows == want
    m = V.manifest_info(table)
    assert m["partition_by"] == ["p"]
    # every file lives under a col=value dir and carries exact stats
    for f in m["files"]:
        assert "p=" in f
        assert m["file_stats"][f]["p"][0] == m["file_stats"][f]["p"][1]


def test_partition_pruning_opens_only_matching_files(spark, tmp_path):
    table = _ptable(spark, tmp_path)
    kept, total = V.plan_files(table, where=("p", "=", 2))
    assert total == len(V.manifest_info(table)["files"])
    assert 0 < len(kept) < total
    assert all("p=2" in f for f in kept)
    got = V.read_version(spark, table, where=("p", "=", 2))
    assert got.count() == 20
    assert got.filter("p <> 2").count() == 0


def test_append_inherits_partition_layout(spark, tmp_path):
    table = _ptable(spark, tmp_path)
    extra = spark.range(100, 120).select(
        F.col("id").alias("k"),
        (F.col("id") % 4).cast("int").alias("p"),
        (F.col("id") * 3).alias("v"),
    )
    V.append_version(extra, table)
    m = V.manifest_info(table)
    assert m["partition_by"] == ["p"]
    assert all("p=" in f for f in m["added"])
    assert V.read_version(spark, table).count() == 100
    kept, total = V.plan_files(table, where=("p", "=", 1))
    assert all("p=1" in f for f in kept)
    got = V.read_version(spark, table, where=("p", "=", 1))
    assert got.count() == 25  # 20 base + 5 appended


def test_partitioned_write_rejects_bad_columns(spark, tmp_path):
    import pytest

    df = _pdf(spark).withColumn("d", F.col("k") / 2.0)
    with pytest.raises(ValueError, match="not in schema"):
        V.write_version(df, str(tmp_path / "a"), partition_by="nope")
    with pytest.raises(ValueError, match="supported"):
        V.write_version(df, str(tmp_path / "b"), partition_by="d")


def test_cow_delete_on_partitioned_table(spark, tmp_path):
    """DML on a partitioned table: the rewrite materializes the
    partition column physically; reads union both file shapes."""
    table = _ptable(spark, tmp_path)
    pre = V.versions(table)[-1]
    V.delete_where(spark, table, "p = 3 and k < 40")
    got = V.read_version(spark, table)
    assert got.count() == 70
    assert got.filter("p = 3").count() == 10  # k in [40, 80)
    assert V.read_version(spark, table, pre).count() == 80
    m = V.manifest_info(table)
    # only p=3 files were touched
    assert all("p=3" in f for f in m["removed"])
    # rewritten plain file readable alongside hive files, column intact
    assert got.groupBy("p").count().count() == 4


def test_dv_delete_keys_by_relpath_not_basename(spark, tmp_path):
    """THE partition-dir hazard: part files in sibling partition dirs
    share basenames. A DV delete of one partition's rows must not mask
    same-basename/same-row_index rows in other partitions."""
    table = _ptable(spark, tmp_path)
    m = V.manifest_info(table)
    bases = [os.path.basename(f) for f in m["files"]]
    assert len(set(bases)) < len(bases), (
        "fixture did not produce colliding basenames; the test would "
        "prove nothing"
    )
    V.delete_where(spark, table, "p = 1", mode="dv")
    got = V.read_version(spark, table)
    assert got.filter("p = 1").count() == 0
    # sibling partitions keep ALL rows (over-masking would hit the
    # same row_index in every same-basename file)
    assert got.filter("p = 0").count() == 20
    assert got.filter("p = 2").count() == 20
    assert got.filter("p = 3").count() == 20
    assert got.count() == 60


def test_merge_on_partitioned_table(spark, tmp_path):
    table = _ptable(spark, tmp_path)
    updates = spark.createDataFrame(
        [(5, 1, 555), (200, 0, 600)], "k long, p int, v long"
    )
    V.merge_version(spark, table, updates, "k")
    got = V.read_version(spark, table)
    assert got.count() == 81
    assert got.filter("k = 5").collect()[0]["v"] == 555
    assert got.filter("k = 200").collect()[0]["v"] == 600
    # untouched partitions carried by reference
    m = V.manifest_info(table)
    assert any("p=0" in f for f in m["files"])


def test_vacuum_partitioned_table(spark, tmp_path):
    table = _ptable(spark, tmp_path)
    V.delete_where(spark, table, "p = 2")
    res = V.vacuum(table, keep_versions=1)
    assert res["deleted_files"] > 0
    got = V.read_version(spark, table)
    assert got.count() == 60
    for f in V.manifest_info(table)["files"]:
        assert os.path.exists(os.path.join(table, f))


def test_cdc_read_changes_on_partitioned_table(spark, tmp_path):
    table = _ptable(spark, tmp_path)
    v1 = V.versions(table)[-1]
    updates = spark.createDataFrame([(5, 1, 999)], "k long, p int, v long")
    v2 = V.merge_version(spark, table, updates, "k")
    ch = V.read_changes(spark, table, v1, v2, "k")
    got = {r["k"]: (r["op"], r["old_v"], r["new_v"]) for r in ch.collect()}
    assert got == {5: ("U", 15, 999)}


def test_string_partition_values_round_trip(spark, tmp_path):
    table = str(tmp_path / "s")
    df = spark.range(0, 30).select(
        F.col("id").alias("k"),
        F.when(F.col("id") % 3 == 0, "alpha")
        .when(F.col("id") % 3 == 1, "beta")
        .otherwise("gamma")
        .alias("cat"),
    )
    V.write_version(df, table, partition_by="cat")
    kept, total = V.plan_files(table, where=("cat", "=", "beta"))
    assert all("cat=beta" in f for f in kept)
    got = V.read_version(spark, table, where=("cat", "=", "beta"))
    assert got.count() == 10
    assert {r["cat"] for r in got.collect()} == {"beta"}


def test_append_rebases_after_losing_a_commit_race(spark, tmp_path):
    """Deterministic conflict injection: just before the append
    publishes its manifest, an interloper commits the version number
    it computed. The put-if-absent publish must fail the loser, who
    rebases onto the interloper's head and lands at the next version —
    with the interloper's files AND its own in the final file list."""
    table = str(tmp_path / "occ")
    base = spark.range(0, 10).select(
        F.col("id").alias("k"), (F.col("id") * 2).alias("v")
    )
    V.write_version(base, table)
    real_commit = V._commit
    fired = {"n": 0}

    def racing_commit(t, version, files, n_rows, **extra):
        if fired["n"] == 0 and version == 2:
            fired["n"] += 1
            m = V.manifest_info(t)  # interloper: no-op append at v2
            real_commit(
                t,
                2,
                m["files"],
                m["n_rows"],
                **{
                    k: m[k]
                    for k in (
                        "schema",
                        "column_mapping",
                        "retired_physical",
                        "max_column_id",
                        "file_stats",
                    )
                },
                added=[],
                removed=[],
            )
        return real_commit(t, version, files, n_rows, **extra)

    V._commit = racing_commit
    try:
        extra = spark.range(100, 105).select(
            F.col("id").alias("k"), (F.col("id") * 2).alias("v")
        )
        got_v = V.append_version(extra, table)
    finally:
        V._commit = real_commit
    assert got_v == 3  # rebased past the stolen v2
    assert V.versions(table) == [1, 2, 3]
    assert V.read_version(spark, table).count() == 15
    m3 = V.manifest_info(table, 3)
    assert set(V.manifest_info(table, 2)["files"]).issubset(set(m3["files"]))


def test_concurrent_appends_from_two_threads_all_land(spark, tmp_path):
    """Two writers appending concurrently: every batch must land in
    its own contiguous version and the final table holds every row
    exactly once (the rebase loop absorbs whatever races occur)."""
    import threading

    table = str(tmp_path / "mt")
    V.write_version(
        spark.range(0, 5).select(
            F.col("id").alias("k"), (F.col("id") * 2).alias("v")
        ),
        table,
    )
    errs: list[Exception] = []

    def writer(lo: int):
        try:
            for i in range(4):
                df = spark.range(lo + i * 10, lo + i * 10 + 10).select(
                    F.col("id").alias("k"), (F.col("id") * 2).alias("v")
                )
                V.append_version(df, table)
        except Exception as e:  # noqa: BLE001
            errs.append(e)

    ts = [
        threading.Thread(target=writer, args=(1000,)),
        threading.Thread(target=writer, args=(5000,)),
    ]
    for t in ts:
        t.start()
    for t in ts:
        t.join()
    assert not errs, errs
    assert V.versions(table) == list(range(1, 10))  # 1 base + 8 appends
    got = V.read_version(spark, table)
    assert got.count() == 85  # 5 + 8 * 10, nothing lost or doubled
    assert got.select("k").distinct().count() == 85


def test_rename_of_partition_column_keeps_layout_and_pruning(spark, tmp_path):
    """Renaming a PARTITION column is still metadata-only: the hive
    dirs keep the physical name, appends keep landing under it, and
    pruning on the NEW logical name maps through the column mapping to
    the physical stats."""
    table = str(tmp_path / "rp")
    df = spark.range(0, 40).select(
        F.col("id").alias("k"), (F.col("id") % 4).cast("int").alias("p")
    )
    V.write_version(df, table, partition_by="p")
    V.rename_column(spark, table, "p", "bucket")
    assert V.read_version(spark, table).columns == ["k", "bucket"]
    extra = spark.range(100, 120).select(
        F.col("id").alias("k"), (F.col("id") % 4).cast("int").alias("bucket")
    )
    V.append_version(extra, table)
    assert all("p=" in f for f in V.manifest_info(table)["added"])
    kept, total = V.plan_files(table, where=("bucket", "=", 2))
    assert 0 < len(kept) < total
    got = V.read_version(spark, table, where=("bucket", "=", 2))
    assert got.count() == 15  # 10 base + 5 appended
    assert {r["bucket"] for r in got.collect()} == {2}


def test_cannot_drop_partition_column(spark, tmp_path):
    import pytest

    table = _ptable(spark, tmp_path)
    with pytest.raises(ValueError, match="partition column"):
        V.drop_column(spark, table, "p")
    V.drop_column(spark, table, "v")  # non-partition drop still fine
    assert V.manifest_info(table)["partition_by"] == ["p"]


def test_bloom_index_prunes_point_lookups_on_hash_layout(spark, tmp_path):
    """Bloom-filter index: min/max stats cannot prune a hash layout
    (every file spans the full key range), but the per-file bloom
    proves absence for point equality — the Delta bloom index tier."""
    table = str(tmp_path / "bl")
    df = spark.range(0, 4000).select(
        F.col("id").alias("k"), (F.col("id") * 3).alias("v")
    ).repartition(8)  # round-robin: all files span [0, 4000)
    V.write_version(df, table, bloom_cols="k")
    m = V.manifest_info(table)
    assert m["bloom_cols"] == ["k"]
    assert len(m["file_blooms"]) == len(m["files"])
    kept, total = V.plan_files(table, where=("k", "=", 1234))
    assert total == 8
    assert len(kept) < total  # min/max alone would keep all 8
    got = V.read_version(spark, table, where=("k", "=", 1234))
    assert [(r["k"], r["v"]) for r in got.collect()] == [(1234, 3702)]
    # absent key: bloom may false-positive a file or two, never all
    kept_absent, _ = V.plan_files(table, where=("k", "=", 999_999))
    assert len(kept_absent) < total
    assert V.read_version(spark, table, where=("k", "=", 999_999)).count() == 0


def test_bloom_index_survives_append_and_rewrite(spark, tmp_path):
    """Appends inherit the bloom columns (new files get blooms, old
    ones carry); copy-on-write rewrites recompute blooms for the
    replacement files so point pruning keeps working."""
    table = str(tmp_path / "bl2")
    df = spark.range(0, 1000).select(
        F.col("id").alias("k"), (F.col("id") * 3).alias("v")
    ).repartition(4)
    V.write_version(df, table, bloom_cols="k")
    extra = spark.range(5000, 5100).select(
        F.col("id").alias("k"), (F.col("id") * 3).alias("v")
    ).coalesce(1)
    V.append_version(extra, table)
    m = V.manifest_info(table)
    assert len(m["file_blooms"]) == len(m["files"])
    kept, total = V.plan_files(table, where=("k", "=", 5050))
    assert len(kept) == 1  # range stats alone already isolate the append
    V.delete_where(spark, table, "k % 10 = 7")
    m2 = V.manifest_info(table)
    assert len(m2["file_blooms"]) == len(m2["files"])  # rewrites re-bloomed
    kept2, total2 = V.plan_files(table, where=("k", "=", 123))
    assert 0 < len(kept2) < total2
    got = V.read_version(spark, table, where=("k", "=", 123))
    assert got.count() == 1


def test_bloom_int_float_spellings_hash_identically(spark, tmp_path):
    """A bloom FALSE NEGATIVE loses rows: probing a long column with
    1234.0 must still find the file — integral float literals
    canonicalize to the int spelling before hashing. Float/decimal
    COLUMNS cannot canonicalize every probe spelling (ADVICE r9:
    repr('1.5') vs Decimal('1.50')), so indexing one is rejected at
    write time, before a wrong prune can ever drop rows."""
    import pytest

    table = str(tmp_path / "blf")
    df = spark.range(0, 400).select(
        F.col("id").cast("double").alias("k"), (F.col("id") * 3).alias("v")
    ).repartition(4)
    with pytest.raises(ValueError, match="bloom column .* has type"):
        V.write_version(df, table, bloom_cols="k")
    # the long-column table probed with a float literal
    table2 = str(tmp_path / "bli")
    V.write_version(
        spark.range(0, 400).select(
            F.col("id").alias("k"), (F.col("id") * 3).alias("v")
        ).repartition(4),
        table2,
        bloom_cols="k",
    )
    kept2, _ = V.plan_files(table2, where=("k", "=", 123.0))
    assert len(kept2) > 0
    assert V.read_version(spark, table2, where=("k", "=", 123.0)).count() == 1


def test_bloom_probe_type_mismatch_keeps_files(spark, tmp_path):
    """Probing an int bloom column with a string literal (or a
    non-integral float) hashes a different spelling than the written
    values — pruning on it would drop files whose rows Spark's own
    residual filter cast-matches (ADVICE r9). The probe guard keeps
    every stats-surviving file instead."""
    table = str(tmp_path / "blg")
    df = spark.range(0, 400).select(
        F.col("id").alias("k"), (F.col("id") * 3).alias("v")
    ).repartition(4)  # round-robin: stats can't prune, only the bloom
    V.write_version(df, table, bloom_cols="k")
    kept_str, total = V.plan_files(table, where=("k", "=", "123"))
    assert len(kept_str) == total  # mismatched family: bloom skipped
    # Spark cast-matches the residual filter — the row MUST come back
    assert V.read_version(spark, table, where=("k", "=", "123")).count() == 1
    kept_frac, _ = V.plan_files(table, where=("k", "=", 123.5))
    assert len(kept_frac) == total
    assert (
        V.read_version(spark, table, where=("k", "=", 123.5)).count() == 0
    )


def test_bloom_index_survives_metadata_only_commits(spark, tmp_path):
    """ADVICE r9 (medium): add/drop_constraint, rename_column,
    drop_column, and DV deletes are metadata-only commits — omitting
    the bloom carry silently erases the index AND stops every future
    append from building blooms. Pin the full carry chain, ending with
    an append that must still bloom its new files."""
    table = str(tmp_path / "blm")
    df = spark.range(0, 400).select(
        F.col("id").alias("k"),
        (F.col("id") * 3).alias("v"),
        (F.col("id") % 5).alias("w"),
    ).repartition(4)
    V.write_version(df, table, bloom_cols="k")

    def assert_bloomed():
        m = V.manifest_info(table)
        assert m["bloom_cols"] == ["k"]
        assert set(m["file_blooms"]) == set(m["files"])
        kept, total = V.plan_files(table, where=("k", "=", 999_999))
        assert len(kept) < total  # the bloom still prunes

    V.add_constraint(spark, table, "k_nonneg", "k >= 0")
    assert_bloomed()
    V.rename_column(spark, table, "v", "v2")  # non-bloom rename
    assert_bloomed()
    V.drop_column(spark, table, "w")
    assert_bloomed()
    V.drop_constraint(table, "k_nonneg")
    assert_bloomed()
    V.delete_where(spark, table, "k % 50 = 7", mode="dv")
    assert_bloomed()
    extra = spark.range(10_000, 10_050).select(
        F.col("id").alias("k"), (F.col("id") * 3).alias("v2")
    ).coalesce(1)
    V.append_version(extra, table)
    assert_bloomed()  # the append inherited bloom_cols and built blooms
    # renaming the BLOOM column follows the logical name; the physical
    # per-file keys never move, so pruning keeps working
    V.rename_column(spark, table, "k", "key")
    m = V.manifest_info(table)
    assert m["bloom_cols"] == ["key"]
    kept, total = V.plan_files(table, where=("key", "=", 999_999))
    assert len(kept) < total
    assert (
        V.read_version(spark, table, where=("key", "=", 123)).count() == 1
    )


def test_in_list_pruning_composes_stats_and_bloom(spark, tmp_path):
    """where=(col, "in", [...]): a file survives only if SOME listed
    value passes its range stats AND its bloom — point lookups over a
    key set in one pruned read."""
    table = str(tmp_path / "inl")
    df = spark.range(0, 400).select(
        F.col("id").alias("k"), (F.col("id") * 3).alias("v")
    ).repartition(4)
    V.write_version(df, table, bloom_cols="k")
    kept, total = V.plan_files(table, where=("k", "in", [7, 123, 999_999]))
    assert 0 < len(kept) < total or total == len(kept)  # bloom may FP
    got = V.read_version(spark, table, where=("k", "in", [7, 123, 999_999]))
    assert {r["k"] for r in got.collect()} == {7, 123}
    # range-clustered table: stats alone prune an IN probe
    t2 = str(tmp_path / "inl2")
    for i in range(4):
        sl = spark.range(i * 100, (i + 1) * 100).select(
            F.col("id").alias("k"), (F.col("id") * 3).alias("v")
        ).coalesce(1)
        (V.write_version if i == 0 else V.append_version)(sl, t2)
    kept2, total2 = V.plan_files(t2, where=("k", "in", [5, 105]))
    assert len(kept2) == 2 and total2 == 4
    got2 = V.read_version(spark, t2, where=("k", "in", [5, 105]))
    assert {r["k"] for r in got2.collect()} == {5, 105}


def test_multi_column_partitioning_round_trips_and_prunes(spark, tmp_path):
    """partition_by=["a", "b"]: nested hive dirs, both columns restored
    from the path, exact [v, v] stats for each level, pruning on
    either."""
    table = str(tmp_path / "mc")
    df = spark.range(0, 120).select(
        F.col("id").alias("k"),
        (F.col("id") % 3).cast("int").alias("a"),
        (F.col("id") % 2).cast("int").alias("b"),
    )
    V.write_version(df, table, partition_by=["a", "b"])
    m = V.manifest_info(table)
    assert m["partition_by"] == ["a", "b"]
    assert all("a=" in f and "b=" in f for f in m["files"])
    got = V.read_version(spark, table)
    assert got.count() == 120
    assert {(r["a"], r["b"]) for r in got.select("a", "b").distinct().collect()} == {
        (i, j) for i in range(3) for j in range(2)
    }
    kept_a, total = V.plan_files(table, where=("a", "=", 1))
    assert all("a=1" in f for f in kept_a) and 0 < len(kept_a) < total
    kept_b, _ = V.plan_files(table, where=("b", "=", 0))
    assert all("b=0" in f for f in kept_b) and 0 < len(kept_b) < total
    assert V.read_version(spark, table, where=("a", "=", 1)).count() == 40
    assert V.read_version(spark, table, where=("b", "=", 0)).count() == 60


def test_stream_sink_inherits_partition_layout(spark, tmp_path):
    """versioned_batch_sink appends into a partitioned table keep the
    hive layout and partition stats, exactly-once under replay."""
    table = str(tmp_path / "sp")
    base = spark.range(0, 40).select(
        F.col("id").alias("k"), (F.col("id") % 4).cast("int").alias("p")
    )
    V.write_version(base, table, partition_by="p")
    sink = V.versioned_batch_sink(table)
    b = spark.range(100, 120).select(
        F.col("id").alias("k"), (F.col("id") % 4).cast("int").alias("p")
    )
    sink(b, 0)
    sink(b, 0)  # replay: skipped
    m = V.manifest_info(table)
    assert len(V.versions(table)) == 2
    assert m["partition_by"] == ["p"]
    assert all("p=" in f for f in m["added"])
    kept, total = V.plan_files(table, where=("p", "=", 2))
    assert all("p=2" in f for f in kept)
    assert V.read_version(spark, table, where=("p", "=", 2)).count() == 15


def test_partition_spec_evolution_mixed_layouts(spark, tmp_path):
    """Iceberg-style spec evolution: a metadata-only commit re-keys
    FUTURE appends; old and new hive layouts coexist, every column
    reads correctly from either its file bytes or its own spec's
    path, pruning bites on both partition columns, and DML still
    works across the mixed layouts."""
    import pytest as _pytest

    from meta_iterative_mapreduce_spark.sources import versioned as V

    t = str(tmp_path / "t")
    df = spark.range(0, 1000).select(
        F.col("id").alias("k"),
        (F.col("id") % 4).alias("a"),
        (F.col("id") % 3).alias("b"),
        (F.col("id") * 2).alias("v"),
    )
    V.write_version(
        df.filter("k < 500").repartition(4, F.col("a")), t, partition_by="a"
    )
    n_files_v1 = len(V.manifest_info(t)["files"])
    v = V.set_partitioning(spark, t, ["b"])
    m = V.manifest_info(t, v)
    assert m["added"] == [] and m["removed"] == []  # metadata only
    assert m["partition_by"] == ["b"]
    assert V.history(t)[0]["operation"] == "SET PARTITIONING"
    V.append_version(df.filter("k >= 500").repartition(3, F.col("b")), t)
    got = {
        r["k"]: (r["a"], r["b"], r["v"])
        for r in V.read_version(spark, t).collect()
    }
    assert len(got) == 1000
    for k in (0, 250, 499, 500, 750, 999):
        assert got[k] == (k % 4, k % 3, 2 * k)
    # pruning spans both layouts: each spec's own files prune exactly,
    # the other's via footer stats (kept conservatively)
    kept_a, total = V.plan_files(t, where=("a", "=", 2))
    kept_b, _ = V.plan_files(t, where=("b", "=", 1))
    assert len(kept_a) < total and len(kept_b) < total
    pr = V.read_version(spark, t, where=("a", "=", 2)).filter("a = 2")
    assert pr.count() == 250
    # DML across mixed layouts: delete rows living in BOTH specs
    V.delete_where(spark, t, "k % 100 = 7")
    assert V.read_version(spark, t).count() == 990
    # evolving to the CURRENT spec is a no-op (no version minted)
    head = V.versions(t)[-1]
    assert V.set_partitioning(spark, t, ["b"]) == head
    # evolve back to unpartitioned: future appends write plain files
    V.set_partitioning(spark, t, None)
    V.append_version(
        spark.createDataFrame([(2000, 0, 0, 4000)], "k long, a long, b long, v long"),
        t,
    )
    assert V.read_version(spark, t).filter("k = 2000").count() == 1
    assert "partition_by" not in V.manifest_info(t) or not V.manifest_info(
        t
    ).get("partition_by")
    # guards
    with _pytest.raises(ValueError, match="not in schema"):
        V.set_partitioning(spark, t, ["nope"])


def test_bloom_bitsets_scale_with_file_size(spark, tmp_path):
    """Round-11 scale fix (caught by the sf0.1 robustness matrix): a
    FIXED 8192-bit bloom saturates around ~19k distinct keys per file
    (~100% false positives — an index that stops pruning exactly when
    files reach production size). Bitsets now size to ~10 bits per
    distinct value, so a 25k-key-per-file table still prunes point
    lookups; and the probe derives the modulus from the STORED bitset,
    so a legacy fixed-size bloom in the same manifest keeps working."""
    import base64

    from meta_iterative_mapreduce_spark.sources import versioned as V

    table = str(tmp_path / "t")
    n, n_files = 100_000, 4  # 25k distinct keys per file
    df = spark.range(n).select(
        F.col("id").alias("k"), (F.col("id") * 2).alias("v")
    ).repartition(n_files)  # hash layout: min/max never prunes
    V.write_version(df, table, bloom_cols="k")
    m = V.manifest_info(table)
    sizes = {
        len(base64.b64decode(b["k"])) * 8
        for b in m["file_blooms"].values()
    }
    assert all(s >= 10 * 20_000 for s in sizes), sizes  # scaled up
    # absent key: the adaptive bloom prunes (old fixed size kept all 4)
    kept, total = V.plan_files(table, where=("k", "=", n + 7))
    assert total == n_files and len(kept) < total
    # present key: NEVER a false negative
    for probe in (0, n // 2, n - 1):
        keptp, _ = V.plan_files(table, where=("k", "=", probe))
        got = V.read_version(spark, table, where=("k", "=", probe))
        assert got.filter(F.col("k") == probe).count() == 1
    # legacy coexistence: rewrite one file's bloom as a fixed-8192
    # bitset (the pre-L5 shape); probes must still be sound for it
    import json as _json
    import os as _os

    mp = _os.path.join(table, "_manifests", f"v{m['version']:06d}.json")
    raw = _json.load(open(mp))
    f0 = m["files"][0]
    legacy_bits = bytearray(8192 // 8)
    import pyarrow.parquet as pq

    ks = pq.read_table(
        _os.path.join(table, f0), columns=["k"]
    ).column("k").to_pylist()
    for v_ in ks:
        for h in V._bloom_hashes(v_, 8192):
            legacy_bits[h // 8] |= 1 << (h % 8)
    raw["file_blooms"][f0] = {
        "k": base64.b64encode(bytes(legacy_bits)).decode()
    }
    _json.dump(raw, open(mp, "w"))
    for probe in ks[:3]:
        got = V.read_version(spark, table, where=("k", "=", probe))
        assert got.filter(F.col("k") == probe).count() == 1
