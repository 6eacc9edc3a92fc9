"""Physical-layout operators: Z-order (Morton curve) clustering.

Writing 100 TB sorted by a single key gives perfect skipping on that
key and none on any other. Interleaving the bits of two bucketed keys
(Morton / Z-order) bounds BOTH dimensions within every contiguous
z-range, so parquet row-group min/max stats prune scans filtered on
either key — the layout trick behind Delta/Iceberg Z-ORDER, built
here from plain column arithmetic (shift/mask/or), no UDFs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from meta_iterative_mapreduce_spark.functions.time import ts_us
from meta_iterative_mapreduce_spark.io import load_table
from meta_iterative_mapreduce_spark.registry import register

_BITS = 8  # 8 bits per dimension -> 16-bit z values
_HOUR_US = 3_600_000_000

# spark/duckdb share operator spellings for >>, &; only shiftleft
# differs, so build each side's interleave expression from the same
# template. z = sum_b (x_bit_b << 2b+1) | (y_bit_b << 2b).
_Z_SPARK = " + ".join(
    f"shiftleft((xb >> {b}) & 1, {2 * b + 1}) + shiftleft((yb >> {b}) & 1, {2 * b})"
    for b in range(_BITS)
)
_Z_DUCK = " + ".join(
    f"(((xb >> {b}) & 1) << {2 * b + 1}) + (((yb >> {b}) & 1) << {2 * b})"
    for b in range(_BITS)
)


@register(
    "q_zorder_layout",
    oracle=f"""
    WITH pts AS (
        SELECT CAST(user_id % 256 AS BIGINT) AS xb,
               CAST((epoch_us(ts) // {_HOUR_US}) % 256 AS BIGINT) AS yb
        FROM events
    ),
    z AS (
        SELECT xb, yb, ({_Z_DUCK}) AS zval FROM pts
    )
    SELECT CAST(zval // 1024 AS BIGINT) AS z_range,
           COUNT(*) AS n_rows,
           MIN(xb) AS x_min, MAX(xb) AS x_max,
           MIN(yb) AS y_min, MAX(yb) AS y_max
    FROM z
    GROUP BY CAST(zval // 1024 AS BIGINT)
    """,
)
def q_zorder_layout(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Z-order the events table on (user bucket, hour bucket) and
    emit per-z-range zone maps. Each output row is what a file-level
    min/max statistic would record if the table were written in
    z-order: BOTH x and y stay narrow within every range (vs a plain
    sort where the secondary key spans its full domain), which is the
    property that lets a scan filtered on either dimension skip most
    files. The interleave is pure integer shift/mask arithmetic in
    whole-stage codegen; the only exchange is the final zone-map agg
    on the z-range key."""
    pts = load_table(spark, sf_dir, "events").select(
        (F.col("user_id") % 256).cast("long").alias("xb"),
        ((ts_us("ts") / _HOUR_US).cast("long") % 256).alias("yb"),
    )
    z = pts.withColumn("zval", F.expr(_Z_SPARK))
    return (
        z.groupBy((F.col("zval") / 1024).cast("long").alias("z_range"))
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.min("xb").alias("x_min"),
            F.max("xb").alias("x_max"),
            F.min("yb").alias("y_min"),
            F.max("yb").alias("y_max"),
        )
    )


def zorder_expr(x_col: str, y_col: str) -> F.Column:
    """Morton interleave of two pre-bucketed [0, 255] int columns —
    plain shift/mask arithmetic, whole-stage-codegen friendly."""
    expr = " + ".join(
        f"shiftleft(({x_col} >> {b}) & 1, {2 * b + 1})"
        f" + shiftleft(({y_col} >> {b}) & 1, {2 * b})"
        for b in range(_BITS)
    )
    return F.expr(expr)


def write_zordered(
    df: DataFrame, path: str, x_col: str, y_col: str, n_files: int = 16
) -> None:
    """Write parquet physically clustered on the Morton curve of
    (x_col, y_col): repartitionByRange on the z-value gives contiguous
    z-ranges per file, sortWithinPartitions orders rows inside each, so
    every file's row-group min/max stats stay narrow on BOTH dimensions
    — the write path behind Delta/Iceberg Z-ORDER. At 100 TB this is
    one range-exchange over the data (same cost as any global sort);
    the payoff is that scans filtered on EITHER column skip most files
    via footer stats alone."""
    (
        df.withColumn("__z", zorder_expr(x_col, y_col))
        .repartitionByRange(n_files, "__z")
        .sortWithinPartitions("__z")
        .drop("__z")
        .write.mode("overwrite")
        .parquet(path)
    )


def rowgroups_selected(path: str, col: str, lo: int, hi: int) -> tuple[int, int]:
    """(selected, total) row groups whose [min, max] footer stats
    intersect [lo, hi] — exactly the pruning decision a parquet reader
    (Spark's or any other) makes from metadata alone, measured without
    reading data pages."""
    import os

    import pyarrow.parquet as pq

    selected = total = 0
    for fname in os.listdir(path):
        if not fname.endswith(".parquet"):
            continue
        md = pq.ParquetFile(os.path.join(path, fname)).metadata
        idx = md.schema.to_arrow_schema().get_field_index(col)
        for rg in range(md.num_row_groups):
            st = md.row_group(rg).column(idx).statistics
            total += 1
            if st is None or (st.min <= hi and st.max >= lo):
                selected += 1
    return selected, total


def compact_files(
    spark: SparkSession,
    src: str,
    dst: str,
    target_file_bytes: int = 128 * 1024 * 1024,
) -> tuple[int, int]:
    """Small-file compaction (the OPTIMIZE half of lakehouse table
    maintenance, next to write_zordered's clustering half): size the
    source directory from file metadata, coalesce to
    ceil(bytes / target) output files, and rewrite. Returns
    (n_src_files, n_dst_files). Uses coalesce(), not repartition() —
    compaction must not pay a shuffle; each output task concatenates
    whole input splits. At 100 TB this runs per-partition-directory
    with the same arithmetic, and target_file_bytes matches the scan
    split size so downstream jobs get full-split tasks instead of a
    small-file task per tiny file."""
    import math
    import os

    files = [
        os.path.join(src, f)
        for f in os.listdir(src)
        if f.endswith(".parquet")
    ]
    total_bytes = sum(os.path.getsize(f) for f in files)
    n_out = max(1, math.ceil(total_bytes / target_file_bytes))
    spark.read.parquet(src).coalesce(n_out).write.mode("overwrite").parquet(dst)
    n_dst = len(
        [f for f in os.listdir(dst) if f.endswith(".parquet")]
    )
    return len(files), n_dst
