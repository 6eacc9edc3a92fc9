"""Source/sink round-trips (csv, json, orc, plain + partitioned
parquet) and the JDBC wiring's pinned failure mode."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from meta_iterative_mapreduce_spark.io import load_table
from meta_iterative_mapreduce_spark.sources import (
    read_csv,
    read_jdbc,
    read_json,
    read_orc,
    write_orc,
    write_parquet,
    write_partitioned_parquet,
)


def _nation(spark, sf_dir):
    return load_table(spark, sf_dir, "nation")


def test_parquet_sink_roundtrip(spark, sf_dir, tmp_path):
    n = _nation(spark, sf_dir)
    out = str(tmp_path / "nation_pq")
    write_parquet(n, out)
    back = spark.read.parquet(out)
    assert sorted(back.collect()) == sorted(n.collect())


def test_partitioned_parquet_prunes(spark, sf_dir, tmp_path):
    n = _nation(spark, sf_dir)
    out = str(tmp_path / "nation_part")
    write_partitioned_parquet(n, out, ["n_regionkey"])
    back = spark.read.parquet(out).filter(F.col("n_regionkey") == 1)
    plan = back._jdf.queryExecution().executedPlan().toString()
    # partition filter prunes directories instead of scanning+filtering
    assert back.count() == n.filter(F.col("n_regionkey") == 1).count()
    assert "PartitionFilters: [isnotnull(n_regionkey" in plan


def test_csv_roundtrip(spark, sf_dir, tmp_path):
    n = _nation(spark, sf_dir)
    out = str(tmp_path / "nation_csv")
    n.write.mode("overwrite").option("header", True).csv(out)
    back = read_csv(spark, out, n.schema)
    assert sorted(back.collect()) == sorted(n.collect())


def test_json_roundtrip(spark, sf_dir, tmp_path):
    n = _nation(spark, sf_dir)
    out = str(tmp_path / "nation_json")
    n.write.mode("overwrite").json(out)
    back = read_json(spark, out, n.schema)
    assert sorted(back.collect()) == sorted(n.collect())


def test_orc_roundtrip_preserves_schema(spark, sf_dir, tmp_path):
    n = _nation(spark, sf_dir)
    out = str(tmp_path / "nation_orc")
    write_orc(n, out)
    back = read_orc(spark, out)
    assert back.schema == n.schema  # ORC footer carries the schema
    assert sorted(back.collect()) == sorted(n.collect())


def test_orc_scan_pushes_down_filters(spark, sf_dir, tmp_path):
    n = _nation(spark, sf_dir)
    out = str(tmp_path / "nation_orc_pd")
    write_orc(n, out)
    scan = read_orc(spark, out).filter(F.col("n_regionkey") == 2).select("n_name")
    plan = scan._jdf.queryExecution().executedPlan().toString()
    assert "PushedFilters: [IsNotNull(n_regionkey), EqualTo(n_regionkey,2)]" in plan


def test_jdbc_without_driver_fails_with_driver_error(spark):
    """No JDBC driver jar ships in this environment; the pinned failure
    proves read_jdbc's options reach Spark's JDBC relation (a config
    error would fail differently)."""
    with pytest.raises(Exception, match="(?i)driver|jdbc"):
        read_jdbc(spark, "jdbc:postgresql://localhost:1/none", "t")


def test_versioned_table_time_travel(spark, sf_dir, tmp_path):
    """Log-structured versioned table: v1 snapshot, v2 append — v1
    stays readable unchanged (time travel), v2 = union, and the append
    wrote NO new copy of v1's data (v1's files are referenced, not
    rewritten)."""
    import json
    import os

    from pyspark.sql import functions as F

    from meta_iterative_mapreduce_spark.sources.versioned import (
        append_version,
        read_version,
        versions,
        write_version,
    )

    table = str(tmp_path / "tbl")
    ev = spark.read.parquet(f"{sf_dir}/events.parquet").select(
        "event_id", "user_id"
    )
    half = ev.filter(F.col("event_id") % 2 == 0)
    rest = ev.filter(F.col("event_id") % 2 == 1)
    v1 = write_version(half, table)
    v2 = append_version(rest, table)
    assert (v1, v2) == (1, 2) and versions(table) == [1, 2]
    n_half, n_all = half.count(), ev.count()
    assert read_version(spark, table, 1).count() == n_half
    assert read_version(spark, table).count() == n_all
    got = sorted(
        r["event_id"] for r in read_version(spark, table, 2).collect()
    )
    assert got == sorted(r["event_id"] for r in ev.collect())
    # structural: v2's manifest reuses v1's files verbatim
    m1 = json.load(open(os.path.join(table, "_manifests", "v000001.json")))
    m2 = json.load(open(os.path.join(table, "_manifests", "v000002.json")))
    assert set(m1["files"]) < set(m2["files"])


def test_versioned_table_refuses_double_commit(spark, sf_dir, tmp_path):
    import pytest as _pytest

    from meta_iterative_mapreduce_spark.sources.versioned import (
        _commit,
        write_version,
    )

    table = str(tmp_path / "tbl2")
    df = spark.read.parquet(f"{sf_dir}/nation.parquet")
    write_version(df, table)
    with _pytest.raises(ValueError, match="already committed"):
        _commit(table, 1, [], 0)


def test_versioned_sink_is_exactly_once(spark, sf_dir, tmp_path):
    """Streamed events land in the versioned log exactly once, and a
    REPLAYED micro-batch (same batchId re-invoked, as Structured
    Streaming does after failure) is skipped — row count unchanged."""
    from meta_iterative_mapreduce_spark.sources.versioned import (
        committed_batch_ids,
        read_version,
        versioned_batch_sink,
    )
    from meta_iterative_mapreduce_spark.streaming.jobs import stream_events

    table = str(tmp_path / "sink_tbl")
    sink = versioned_batch_sink(table)
    q = (
        stream_events(spark, sf_dir)
        .select("event_id", "user_id")
        .writeStream.foreachBatch(sink)
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    n_expected = spark.read.parquet(f"{sf_dir}/events.parquet").count()
    assert read_version(spark, table).count() == n_expected
    ids = committed_batch_ids(table)
    assert ids
    # replay the last batch id with fresh (duplicate) data: must no-op
    dup = spark.read.parquet(f"{sf_dir}/events.parquet").select(
        "event_id", "user_id"
    )
    sink(dup, max(ids))
    assert read_version(spark, table).count() == n_expected


def test_versioned_schema_evolution_add_column(spark, sf_dir, tmp_path):
    """Append a batch with an ADDED column: old versions stay readable
    as written, the new version merges on read with nulls for the old
    files, projection order is manifest-pinned, and the evolved column
    survives a further no-column append."""
    from pyspark.sql import functions as F

    from meta_iterative_mapreduce_spark.sources.versioned import (
        append_version,
        read_version,
        write_version,
    )

    table = str(tmp_path / "evo_tbl")
    ev = spark.read.parquet(f"{sf_dir}/events.parquet").select(
        "event_id", "user_id"
    )
    b1 = ev.filter(F.col("event_id") % 3 == 0)
    b2 = ev.filter(F.col("event_id") % 3 == 1).withColumn(
        "score", (F.col("user_id") % 7).cast("double")
    )
    b3 = ev.filter(F.col("event_id") % 3 == 2)  # omits the new column
    write_version(b1, table)
    append_version(b2, table)
    append_version(b3, table)

    # v1 time travel: the pre-evolution projection, no phantom column
    v1 = read_version(spark, table, 1)
    assert v1.columns == ["event_id", "user_id"]
    assert v1.count() == b1.count()

    # latest: stable column order = original fields then additions
    v3 = read_version(spark, table)
    assert v3.columns == ["event_id", "user_id", "score"]
    assert v3.count() == ev.count()
    # merge-on-read nulls exactly where files predate/omit the column
    nulls = v3.filter(F.col("score").isNull()).count()
    assert nulls == b1.count() + b3.count()
    vals = v3.filter(F.col("score").isNotNull())
    assert vals.filter(F.col("score") != F.col("user_id") % 7).count() == 0


def test_versioned_schema_evolution_rejects_type_change(
    spark, sf_dir, tmp_path
):
    """Type drift must fail at COMMIT time, before a manifest
    references the incompatible files."""
    import pytest as _pytest
    from pyspark.sql import functions as F

    from meta_iterative_mapreduce_spark.sources.versioned import (
        append_version,
        versions,
        write_version,
    )

    table = str(tmp_path / "drift_tbl")
    ev = spark.read.parquet(f"{sf_dir}/events.parquet").select(
        "event_id", "user_id"
    )
    write_version(ev, table)
    drift = ev.withColumn("user_id", F.col("user_id").cast("string"))
    with _pytest.raises(ValueError, match="user_id"):
        append_version(drift, table)
    assert versions(table) == [1]


def test_versioned_schema_evolution_widens_types(spark, sf_dir, tmp_path):
    """int→long and float→double are SAFE widenings: the appended
    batch commits, the manifest adopts the wider type, old narrower
    files up-cast at scan time (no rewrite), and time travel still
    reads v1 with its original narrow types. Incompatible changes
    (long→int narrowing, int→string) still fail at commit."""
    import pytest as _pytest
    from pyspark.sql import functions as F

    from meta_iterative_mapreduce_spark.sources.versioned import (
        append_version,
        read_version,
        versions,
        write_version,
    )

    table = str(tmp_path / "widen_tbl")
    ev = spark.read.parquet(f"{sf_dir}/events.parquet").select(
        "event_id", "user_id"
    )
    b1 = ev.filter(F.col("event_id") % 2 == 0).select(
        F.col("event_id").cast("int").alias("event_id"),
        (F.col("user_id") % 100).cast("float").alias("w"),
    )
    b2 = ev.filter(F.col("event_id") % 2 == 1).select(
        F.col("event_id").cast("long").alias("event_id"),
        (F.col("user_id") % 100).cast("double").alias("w"),
    )
    write_version(b1, table)
    append_version(b2, table)

    latest = read_version(spark, table)
    assert dict(latest.dtypes) == {"event_id": "bigint", "w": "double"}
    assert latest.count() == ev.count()
    # the narrow files' values survive the up-cast exactly
    assert (
        latest.agg(F.sum("event_id")).first()[0]
        == ev.agg(F.sum("event_id")).first()[0]
    )
    # time travel: v1 still reads with its own (narrow) manifest schema
    v1 = read_version(spark, table, 1)
    assert dict(v1.dtypes) == {"event_id": "int", "w": "float"}

    # a later NARROW append is fine too — manifest keeps the widest
    b3 = b1.limit(0)
    append_version(b3, table)
    assert dict(read_version(spark, table).dtypes) == {
        "event_id": "bigint",
        "w": "double",
    }

    # incompatible drift still fails at commit
    with _pytest.raises(ValueError, match="only"):
        append_version(
            b1.select(F.col("event_id").cast("string"), "w"), table
        )
    assert versions(table) == [1, 2, 3]


def test_versioned_pre_evolution_manifest_append(spark, sf_dir, tmp_path):
    """Appending to a table whose manifest predates schema tracking
    must reconstruct the real prior schema from the parquet footers —
    NOT adopt the new batch's schema wholesale. A column the append
    omits stays in the projection (nulls for the new rows), and type
    drift against the reconstructed schema still fails at commit."""
    import json as _json
    import os as _os

    import pytest as _pytest
    from pyspark.sql import functions as F

    from meta_iterative_mapreduce_spark.sources.versioned import (
        _manifest_path,
        append_version,
        read_version,
        write_version,
    )

    table = str(tmp_path / "legacy_tbl")
    ev = spark.read.parquet(f"{sf_dir}/events.parquet").select(
        "event_id", "user_id"
    )
    b1 = ev.filter(F.col("event_id") % 2 == 0)
    write_version(b1, table)
    # simulate a manifest written before schema tracking existed
    mp = _manifest_path(table, 1)
    m = _json.load(open(mp))
    del m["schema"]
    _os.unlink(mp)
    with open(mp, "w") as fh:
        _json.dump(m, fh)

    # append that OMITS user_id: column must survive via footer
    # reconstruction, not vanish from the projection
    b2 = ev.filter(F.col("event_id") % 2 == 1).select("event_id")
    append_version(b2, table)
    latest = read_version(spark, table)
    assert latest.columns == ["event_id", "user_id"]
    assert latest.filter(F.col("user_id").isNull()).count() == b2.count()

    # drift against the reconstructed schema still fails
    with _pytest.raises(ValueError, match="user_id"):
        append_version(
            ev.select(
                "event_id", F.col("user_id").cast("string").alias("user_id")
            ),
            table,
        )


def test_versioned_vacuum_retention(spark, sf_dir, tmp_path):
    """VACUUM drops old manifests and deletes ONLY files no retained
    version references: files shared into newer versions by
    log-structured appends survive, retained versions stay readable
    byte-for-byte, vacuumed versions raise."""
    import os as _os

    import pytest as _pytest
    from pyspark.sql import functions as F

    from meta_iterative_mapreduce_spark.sources.versioned import (
        append_version,
        read_version,
        vacuum,
        versions,
        write_version,
    )

    table = str(tmp_path / "vac_tbl")
    ev = spark.read.parquet(f"{sf_dir}/events.parquet").select(
        "event_id", "user_id"
    )
    b = [ev.filter(F.col("event_id") % 3 == i) for i in range(3)]
    write_version(b[0], table)     # v1: files A
    append_version(b[1], table)    # v2: files A+B
    append_version(b[2], table)    # v3: files A+B+C
    n_all = ev.count()

    res = vacuum(table, keep_versions=2)
    assert res["dropped_versions"] == [1]
    # v1's files are all shared into v2/v3 (append never rewrites), so
    # NOTHING may be deleted — liveness is union-over-retained
    assert res["deleted_files"] == 0
    assert versions(table) == [2, 3]
    assert read_version(spark, table).count() == n_all
    assert read_version(spark, table, 2).count() == b[0].count() + b[1].count()
    with _pytest.raises(ValueError):
        read_version(spark, table, 1)

    # snapshot (write_version) makes v4 with FRESH files; vacuuming to
    # 1 version must now delete every v2/v3-only file
    write_version(ev, table)       # v4: files D (full snapshot)
    res2 = vacuum(table, keep_versions=1)
    assert res2["dropped_versions"] == [2, 3]
    assert res2["deleted_files"] > 0
    assert versions(table) == [4]
    assert read_version(spark, table).count() == n_all
    # no orphan parquet files left outside the live set
    live = set()
    import json as _json

    from meta_iterative_mapreduce_spark.sources.versioned import (
        _manifest_path,
    )

    live.update(_json.load(open(_manifest_path(table, 4)))["files"])
    on_disk = set()
    for root, _dirs, files in _os.walk(_os.path.join(table, "data")):
        for f in files:
            if f.endswith(".parquet"):
                on_disk.add(
                    _os.path.relpath(_os.path.join(root, f), table)
                )
    assert on_disk == live


def test_versioned_rename_column_is_metadata_only(spark, tmp_path):
    """Delta-style column mapping: rename touches ZERO data files —
    the new manifest carries the same file list, pre-rename files
    serve the renamed column, and time travel to the old version
    still shows the old name."""
    import json
    import os

    from meta_iterative_mapreduce_spark.sources.versioned import (
        append_version,
        read_version,
        rename_column,
        write_version,
    )

    table = str(tmp_path / "ren")
    df = spark.createDataFrame(
        [(1, "a"), (2, "b")], "k int, payload string"
    )
    write_version(df, table)
    v2 = rename_column(spark, table, "payload", "body")
    assert v2 == 2
    m1 = json.load(open(os.path.join(table, "_manifests", "v000001.json")))
    m2 = json.load(open(os.path.join(table, "_manifests", "v000002.json")))
    assert m1["files"] == m2["files"]  # metadata-only
    got = read_version(spark, table, 2)
    assert got.columns == ["k", "body"]
    assert {r["body"] for r in got.collect()} == {"a", "b"}
    # time travel: v1 still shows the pre-rename name
    assert read_version(spark, table, 1).columns == ["k", "payload"]
    # an append under the NEW logical name lands in the OLD physical
    # column: reading back unions both eras seamlessly
    append_version(
        spark.createDataFrame([(3, "c")], "k int, body string"), table
    )
    got3 = read_version(spark, table, 3)
    assert {r["body"] for r in got3.collect()} == {"a", "b", "c"}
    # physical name in the files never moved
    m3 = json.load(open(os.path.join(table, "_manifests", "v000003.json")))
    phys = {m["name"]: m["physical"] for m in m3["column_mapping"]}
    assert phys["body"] == "payload"


def test_versioned_drop_column_and_no_resurrection(spark, tmp_path):
    """Drop is metadata-only, and a LATER column re-using the dropped
    logical name gets a fresh physical name — old bytes can never
    resurrect under the new column."""
    import json
    import os

    import pytest as _pytest

    from meta_iterative_mapreduce_spark.sources.versioned import (
        append_version,
        drop_column,
        read_version,
        write_version,
    )

    table = str(tmp_path / "dropt")
    write_version(
        spark.createDataFrame([(1, 10), (2, 20)], "k int, score int"),
        table,
    )
    v2 = drop_column(spark, table, "score")
    assert read_version(spark, table, v2).columns == ["k"]
    assert read_version(spark, table, 1).columns == ["k", "score"]
    # re-add a column with the same name: fresh id, fresh physical
    append_version(
        spark.createDataFrame([(3, 99)], "k int, score int"), table
    )
    got = read_version(spark, table)
    rows = {r["k"]: r["score"] for r in got.collect()}
    # old rows must read NULL for the re-added column (not 10/20)
    assert rows == {1: None, 2: None, 3: 99}
    m3 = json.load(
        open(os.path.join(table, "_manifests", "v000003.json"))
    )
    phys = {m["name"]: m["physical"] for m in m3["column_mapping"]}
    assert phys["score"] != "score"  # retired name not reused
    assert "score" in m3["retired_physical"]
    drop_column(spark, table, "score")  # now only k remains
    with _pytest.raises(ValueError, match="only column"):
        drop_column(spark, table, "k")
    with _pytest.raises(ValueError, match="does not exist"):
        drop_column(spark, table, "nope")


def test_versioned_rename_guards_and_drift_still_fails(spark, tmp_path):
    """Rename validation, and the incompatible-type-drift commit
    check survives the mapping layer."""
    import pytest as _pytest

    from meta_iterative_mapreduce_spark.sources.versioned import (
        append_version,
        rename_column,
        write_version,
    )

    table = str(tmp_path / "guard")
    write_version(
        spark.createDataFrame([(1, "x")], "k int, v string"), table
    )
    with _pytest.raises(ValueError, match="does not exist"):
        rename_column(spark, table, "zzz", "w")
    with _pytest.raises(ValueError, match="already exists"):
        rename_column(spark, table, "v", "k")
    rename_column(spark, table, "v", "txt")
    with _pytest.raises(ValueError, match="schema evolution"):
        append_version(
            spark.createDataFrame([(2, 5)], "k int, txt int"), table
        )
