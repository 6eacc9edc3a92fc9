"""Sources & sinks beyond the fixture parquet (SURVEY.md §2.2 A)."""

from meta_iterative_mapreduce_spark.sources.formats import (  # noqa: F401
    read_csv,
    read_json,
    read_jdbc,
    read_orc,
    write_orc,
    write_parquet,
    write_partitioned_parquet,
)
