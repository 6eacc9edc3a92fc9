"""Hidden partitioning (Iceberg partition transforms, round 11):
partition_by entries days(d) / month(d) / bucket(N, c) / truncate(W, c)
lay files out by a DERIVED value while queries predicate only on the
SOURCE column — pruning maps the predicate into the partition domain
and hits the manifest's exact per-file stats. The soundness keystone
is Spark/Python transform parity: the write path derives values with
Spark expressions, the plan-time prune with their Python twins; any
divergence silently drops rows, so it is pinned value-by-value here."""

from __future__ import annotations

import datetime

import pytest
from pyspark.sql import functions as F

from meta_iterative_mapreduce_spark.sources import versioned as V


def _days_table(spark, tmp_path, n=90) -> str:
    """One row per day from 1995-01-01, partitioned by days(d) — the
    canonical event-table-by-day layout."""
    table = str(tmp_path / "t_days")
    df = spark.range(0, n).select(
        F.col("id").alias("k"),
        F.date_add(F.lit("1995-01-01"), F.col("id").cast("int")).alias("d"),
    )
    V.write_version(df.filter(f"k < {n // 2}"), table, partition_by="days(d)")
    V.append_version(df.filter(f"k >= {n // 2}"), table)
    return table


def test_days_transform_prunes_date_ranges(spark, tmp_path):
    table = _days_table(spark, tmp_path)
    kept, total = V.plan_files(table, where=("d", "=", "1995-02-14"))
    assert (len(kept), total) == (1, 90)
    kept, _ = V.plan_files(
        table, where=[("d", ">=", "1995-03-01"), ("d", "<", "1995-03-11")]
    )
    assert len(kept) == 11  # 10 days + one non-strict boundary file
    # datetime.date literals map identically to ISO strings
    kept2, _ = V.plan_files(
        table, where=("d", "=", datetime.date(1995, 2, 14))
    )
    assert kept2 == V.plan_files(table, where=("d", "=", "1995-02-14"))[0]
    got = V.read_version(
        spark, table, where=[("d", ">=", "1995-03-01"), ("d", "<", "1995-03-11")]
    ).filter("d >= '1995-03-01' AND d < '1995-03-11'")
    assert got.count() == 10
    # the derived __p_ column never leaks into the logical schema
    full = V.read_version(spark, table)
    assert full.columns == ["k", "d"] and full.count() == 90


def test_bucket_and_truncate_prune_and_read(spark, tmp_path):
    table = str(tmp_path / "t_bt")
    df = spark.range(0, 100).select(
        F.col("id").alias("k"),
        F.concat(F.lit("user_"), F.col("id")).alias("u"),
    )
    V.write_version(
        df, table, partition_by=["bucket(8, u)", "truncate(10, k)"]
    )
    kept, total = V.plan_files(table, where=("u", "=", "user_42"))
    assert len(kept) < total  # only user_42's bucket survives
    kept_r, total_r = V.plan_files(
        table, where=[("k", ">=", 30), ("k", "<", 40)]
    )
    assert len(kept_r) <= 10 and len(kept_r) * 5 <= total_r  # one k-decade
    # bucket is NOT order-preserving: a range on u maps through NO
    # bucket pruning (footer string stats may still prune) — the read
    # must stay exactly correct
    n_range = (
        V.read_version(spark, table, where=("u", ">=", "user_5"))
        .filter("u >= 'user_5'")
        .count()
    )
    assert n_range == V.read_version(spark, table).filter(
        "u >= 'user_5'"
    ).count()
    # IN-list maps per value through the bucket
    kept_in, _ = V.plan_files(
        table, where=("u", "in", ["user_42", "user_7"])
    )
    assert len(kept) <= len(kept_in) < total
    got = V.read_version(spark, table, where=("u", "=", "user_42")).filter(
        "u = 'user_42'"
    )
    assert [(r["k"], r["u"]) for r in got.collect()] == [(42, "user_42")]


def test_truncate_string_prefix_pruning(spark, tmp_path):
    table = str(tmp_path / "t_ts")
    rows = [("apple",), ("apricot",), ("banana",), ("berry",), ("cherry",)]
    V.write_version(
        spark.createDataFrame(rows, "w string"),
        table,
        partition_by="truncate(2, w)",
    )
    kept, total = V.plan_files(table, where=("w", "=", "banana"))
    assert len(kept) == 1 and total >= 4  # dirs: ap / ba / be / ch
    kept, _ = V.plan_files(table, where=("w", ">=", "berry"))
    assert len(kept) == 2  # be + ch (prefix order is monotone)


def test_spark_python_transform_parity(spark, tmp_path):
    """The plan-time Python twins (_pspec_literal) must agree with the
    write-path Spark expressions for every literal both can see —
    divergence would prune live partitions and DROP ROWS."""
    dates = [
        datetime.date(1970, 1, 1),
        datetime.date(1969, 12, 31),
        datetime.date(1995, 6, 17),
        datetime.date(2024, 2, 29),
    ]
    ddf = spark.createDataFrame([(d,) for d in dates], "d date")
    sdf, _ = V._with_pspec_cols(ddf, ["days(d)", "month(d)"], {}, {"d": "date"})
    for r in sdf.collect():
        assert r["__p_days_d"] == V._pspec_literal("days", None, r["d"])
        assert r["__p_month_d"] == V._pspec_literal("month", None, r["d"])
    ints = [0, 1, -1, 7, -7, 123456789, -987654321]
    idf = spark.createDataFrame([(i,) for i in ints], "k long")
    sdf, _ = V._with_pspec_cols(
        idf, ["bucket(16, k)", "truncate(10, k)"], {}, {"k": "long"}
    )
    for r in sdf.collect():
        assert r["__p_bucket16_k"] == V._pspec_literal("bucket", 16, r["k"], "long")
        assert r["__p_truncate10_k"] == V._pspec_literal(
            "truncate", 10, r["k"], "long"
        )
    strs = ["", "a", "user_42", "ümlaut", "x" * 40]
    tdf = spark.createDataFrame([(s,) for s in strs], "s string")
    sdf, _ = V._with_pspec_cols(
        tdf, ["bucket(8, s)", "truncate(3, s)"], {}, {"s": "string"}
    )
    for r in sdf.collect():
        assert r["__p_bucket8_s"] == V._pspec_literal("bucket", 8, r["s"], "string")
        assert r["__p_truncate3_s"] == V._pspec_literal("truncate", 3, r["s"], "string")


def test_transform_spec_guards(spark, tmp_path):
    df = spark.range(0, 5).select(
        F.col("id").alias("k"), (F.col("id") * 1.5).alias("x")
    )
    with pytest.raises(ValueError, match="DATE source"):
        V.write_version(df, str(tmp_path / "a"), partition_by="days(k)")
    with pytest.raises(ValueError, match="int-family or string"):
        V.write_version(df, str(tmp_path / "b"), partition_by="bucket(4, x)")
    with pytest.raises(ValueError, match="positive integer parameter"):
        V.write_version(df, str(tmp_path / "c"), partition_by="bucket(k)")
    with pytest.raises(ValueError, match="must be positive"):
        V.write_version(df, str(tmp_path / "d"), partition_by="truncate(0, k)")
    with pytest.raises(ValueError, match="takes no parameter"):
        V.write_version(df, str(tmp_path / "e"), partition_by="days(4, k)")
    with pytest.raises(ValueError, match="not in schema"):
        V.write_version(df, str(tmp_path / "f"), partition_by="bucket(4, zz)")
    # identity on a date column points the user at the transforms
    ddf = spark.range(0, 3).select(
        F.col("id").alias("k"),
        F.date_add(F.lit("2001-01-01"), F.col("id").cast("int")).alias("d"),
    )
    with pytest.raises(ValueError, match="days\\(\\)/month\\(\\)"):
        V.write_version(ddf, str(tmp_path / "g"), partition_by="d")


def test_rename_source_updates_spec_and_keeps_pruning(spark, tmp_path):
    table = _days_table(spark, tmp_path, n=30)
    V.rename_column(spark, table, "d", "event_date")
    assert V.manifest_info(table)["partition_by"] == ["days(event_date)"]
    kept, total = V.plan_files(table, where=("event_date", "=", "1995-01-10"))
    assert (len(kept), total) == (1, 30)  # old stats still keyed physical
    got = V.read_version(
        spark, table, where=("event_date", "=", "1995-01-10")
    ).filter("event_date = '1995-01-10'")
    assert got.count() == 1
    # appends under the renamed spec still derive from the new name
    extra = spark.createDataFrame(
        [(1000, datetime.date(1996, 1, 1))], "k long, event_date date"
    )
    V.append_version(extra, table)
    kept, _ = V.plan_files(table, where=("event_date", "=", "1996-01-01"))
    assert len(kept) == 1
    with pytest.raises(ValueError, match="partition column"):
        V.drop_column(spark, table, "event_date")


def test_dml_and_evolution_on_transformed_table(spark, tmp_path):
    """Copy-on-write DML rewrites transformed files without path
    segments (conservatively unprunable via the derived stats but
    still correct); set_partitioning can evolve INTO a transform spec
    and pruning spans both layouts."""
    table = str(tmp_path / "t")
    df = spark.range(0, 60).select(
        F.col("id").alias("k"),
        F.date_add(F.lit("1995-01-01"), (F.col("id") % 6).cast("int")).alias(
            "d"
        ),
    )
    V.write_version(df.filter("k < 30"), table)  # unpartitioned v1
    V.set_partitioning(spark, table, ["days(d)"])
    V.append_version(df.filter("k >= 30"), table)  # transformed layout
    kept, total = V.plan_files(table, where=("d", "=", "1995-01-03"))
    assert len(kept) < total  # new-layout files prune; v1 files kept
    V.delete_where(spark, table, "k % 10 = 7")
    got = V.read_version(spark, table)
    assert got.count() == 54
    # k%6==2 is even, k%10==7 odd: the delete touches none of this day
    assert got.filter("d = '1995-01-03'").count() == 10
    # reads after DML keep pruning correct (rewrites conservatively kept)
    sel = V.read_version(spark, table, where=("d", "=", "1995-01-03")).filter(
        "d = '1995-01-03'"
    )
    assert sel.count() == 10


def test_null_source_values_partition_and_read_safely(spark, tmp_path):
    table = str(tmp_path / "t")
    df = spark.createDataFrame(
        [(1, datetime.date(1995, 1, 1)), (2, None), (3, None)],
        "k long, d date",
    )
    V.write_version(df, table, partition_by="days(d)")
    full = V.read_version(spark, table)
    assert full.count() == 3
    assert full.filter("d IS NULL").count() == 2  # source stored in-file
    # the null partition's file records no derived stats, so it is
    # kept CONSERVATIVELY (pruning never drops a file it can't prove
    # empty for the predicate); the dated file still prunes exactly
    kept, total = V.plan_files(table, where=("d", "=", "1996-06-06"))
    assert total >= 2 and len(kept) == total - 1  # only dated file pruned


def test_bucket_literal_type_mismatch_keeps_files(spark, tmp_path):
    """ADVICE r11 (medium): a predicate literal of the wrong type
    family must NOT map into the bucket hash domain. A string column
    bucketed by crc32 probed with an INT literal previously mapped
    via `lit % N` — the wrong cell — and silently pruned the file
    holding the rows Spark's cast-based comparison matches. The guard
    keeps every file on family mismatch, so the read stays exact."""
    table = str(tmp_path / "t_mismatch")
    rows = [(str(i),) for i in range(20)]  # numeric STRINGS
    V.write_version(
        spark.createDataFrame(rows, "s string"),
        table,
        partition_by="bucket(8, s)",
    )
    # int literal on a string-bucketed column: no pruning allowed
    kept, total = V.plan_files(table, where=("s", "=", 5))
    assert len(kept) == total
    # ... and the cast-based read still finds the row
    got = V.read_version(spark, table, where=("s", "=", 5)).filter(
        F.col("s") == 5
    )
    assert [r["s"] for r in got.collect()] == ["5"]
    # matched family still prunes
    kept_s, _ = V.plan_files(table, where=("s", "=", "5"))
    assert len(kept_s) < total

    # converse: int-bucketed column probed with a numeric STRING
    # literal must also keep all files (old code crc32-hashed it)
    table2 = str(tmp_path / "t_mismatch_int")
    df = spark.range(0, 20).select(F.col("id").alias("k"))
    V.write_version(df, table2, partition_by="bucket(8, k)")
    kept2, total2 = V.plan_files(table2, where=("k", "=", "5"))
    assert len(kept2) == total2
    got2 = V.read_version(spark, table2, where=("k", "=", "5")).filter(
        F.col("k") == "5"
    )
    assert [r["k"] for r in got2.collect()] == [5]
