"""Source/sink round-trips (csv, json, plain + partitioned parquet)."""

from __future__ import annotations

from pyspark.sql import functions as F

from meta_iterative_mapreduce_spark.io import load_table
from meta_iterative_mapreduce_spark.sources import (
    read_csv,
    read_json,
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
