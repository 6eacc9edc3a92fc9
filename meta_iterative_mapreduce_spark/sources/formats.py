"""File-format sources and sinks.

The reference's one source is an interactive stdin scan
(kernel.cu:92-104) and it has no sink at all (results print to
stdout). The engine reads/writes the standard columnar + text formats
with explicit schemas (never inferSchema in production paths — a
schema scan is a full extra pass at 100 TB).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T


def read_csv(
    spark: SparkSession, path: str, schema: T.StructType, header: bool = True
) -> DataFrame:
    return spark.read.schema(schema).option("header", header).csv(path)


def read_json(spark: SparkSession, path: str, schema: T.StructType) -> DataFrame:
    return spark.read.schema(schema).json(path)


def read_orc(spark: SparkSession, path: str) -> DataFrame:
    """ORC source (schema comes from the ORC footer, like parquet)."""
    return spark.read.orc(path)


def write_orc(df: DataFrame, path: str, mode: str = "overwrite") -> None:
    df.write.mode(mode).orc(path)


def read_jdbc(spark: SparkSession, url: str, table: str, **options) -> DataFrame:
    """JDBC source — requires the database's driver jar on the
    classpath (none is present in this container, so calls here fail
    with the JVM's 'No suitable driver' error; tests pin that failure
    mode to prove the wiring reaches the JDBC code path)."""
    reader = spark.read.format("jdbc").option("url", url).option("dbtable", table)
    for k, v in options.items():
        reader = reader.option(k, v)
    return reader.load()


def write_parquet(df: DataFrame, path: str, mode: str = "overwrite") -> None:
    df.write.mode(mode).parquet(path)


def write_partitioned_parquet(
    df: DataFrame, path: str, partition_cols: list[str], mode: str = "overwrite"
) -> None:
    """Partitioned layout — the physical design that makes partition
    pruning work for downstream readers at scale."""
    df.write.mode(mode).partitionBy(*partition_cols).parquet(path)
