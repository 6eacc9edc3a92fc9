"""Scans, projections, filters (SURVEY.md §2.2 A-B).

The reference's only scan was an interactive stdin read into column
arrays (kernel.cu:92-104). Here scans are columnar parquet reads where
Catalyst pushes predicates and prunes columns down to the file reader
— verified in tests via PushedFilters/ReadSchema in the physical plan.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from meta_iterative_mapreduce_spark.io import load_table
from meta_iterative_mapreduce_spark.registry import register


@register(
    "q_scan_parquet",
    oracle="""
    SELECT l_orderkey, l_partkey, l_suppkey, l_linenumber, l_quantity,
           l_extendedprice, l_discount, l_tax, l_returnflag, l_linestatus,
           strftime(l_shipdate, '%Y-%m-%d') AS l_shipdate
    FROM lineitem
    """,
)
def q_scan_parquet(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full-table parquet scan (timestamps projected as date strings for
    engine-neutral hashing)."""
    li = load_table(spark, sf_dir, "lineitem")
    return li.select(
        "l_orderkey",
        "l_partkey",
        "l_suppkey",
        "l_linenumber",
        "l_quantity",
        "l_extendedprice",
        "l_discount",
        "l_tax",
        "l_returnflag",
        "l_linestatus",
        F.date_format("l_shipdate", "yyyy-MM-dd").alias("l_shipdate"),
    )


@register(
    "q_scan_projection_pushdown",
    oracle="""
    SELECT l_orderkey, l_quantity
    FROM lineitem
    WHERE l_shipdate < TIMESTAMP '1998-01-01'
    """,
)
def q_scan_projection_pushdown(spark: SparkSession, sf_dir: str) -> DataFrame:
    """2-column projection + filter; Catalyst pushes both to the parquet
    reader (ReadSchema = 3 cols, PushedFilters = LessThan(l_shipdate))."""
    li = load_table(spark, sf_dir, "lineitem")
    return li.filter(
        F.col("l_shipdate") < F.lit("1998-01-01").cast("timestamp")
    ).select("l_orderkey", "l_quantity")


@register(
    "q_project_compute",
    oracle="""
    SELECT l_orderkey, l_linenumber,
           l_extendedprice * (1 - l_discount) AS revenue,
           l_extendedprice * (1 - l_discount) * (1 + l_tax) AS charge,
           CASE WHEN l_quantity >= 40 THEN 'bulk'
                WHEN l_quantity >= 15 THEN 'mid'
                ELSE 'small' END AS qty_class
    FROM lineitem
    """,
)
def q_project_compute(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Computed columns: arithmetic expressions + CASE WHEN.

    Per-row IEEE arithmetic with identical operation order is
    bit-deterministic across engines, so no ROUND is applied (ROUND
    itself is the hazard here: exact 5th-decimal ties round differently
    in Spark's BigDecimal HALF_UP vs DuckDB's double rounding).
    """
    li = load_table(spark, sf_dir, "lineitem")
    return li.select(
        "l_orderkey",
        "l_linenumber",
        (F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("revenue"),
        (
            F.col("l_extendedprice") * (1 - F.col("l_discount")) * (1 + F.col("l_tax"))
        ).alias("charge"),
        F.when(F.col("l_quantity") >= 40, F.lit("bulk"))
        .when(F.col("l_quantity") >= 15, F.lit("mid"))
        .otherwise(F.lit("small"))
        .alias("qty_class"),
    )


@register(
    "q_filter_comparison",
    oracle="""
    SELECT l_orderkey, l_linenumber, l_quantity, l_discount
    FROM lineitem
    WHERE (l_quantity <= 5 OR l_quantity > 45)
      AND l_discount >= 0.05
      AND NOT (l_returnflag = 'A')
    """,
)
def q_filter_comparison(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Comparison predicates composed with AND/OR/NOT."""
    li = load_table(spark, sf_dir, "lineitem")
    return li.filter(
        ((F.col("l_quantity") <= 5) | (F.col("l_quantity") > 45))
        & (F.col("l_discount") >= 0.05)
        & ~(F.col("l_returnflag") == "A")
    ).select("l_orderkey", "l_linenumber", "l_quantity", "l_discount")


@register(
    "q_filter_in_between_like",
    oracle="""
    SELECT o_orderkey, o_totalprice, o_orderpriority
    FROM orders
    WHERE o_orderpriority IN ('1-URGENT', '2-HIGH')
      AND o_totalprice BETWEEN 100000 AND 300000
      AND o_orderstatus LIKE 'F%'
    """,
)
def q_filter_in_between_like(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IN-list, BETWEEN, and LIKE predicates."""
    o = load_table(spark, sf_dir, "orders")
    return o.filter(
        F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
        & F.col("o_totalprice").between(100000, 300000)
        & F.col("o_orderstatus").like("F%")
    ).select("o_orderkey", "o_totalprice", "o_orderpriority")


@register(
    "q_filter_null",
    oracle="""
    SELECT l_orderkey, l_linenumber,
           (NULLIF(l_discount, 0.0) IS NULL) AS disc_is_null,
           COALESCE(NULLIF(l_discount, 0.0), -1.0) AS disc_or_sentinel
    FROM lineitem
    WHERE l_quantity < 3
    """,
)
def q_filter_null(spark: SparkSession, sf_dir: str) -> DataFrame:
    """NULL semantics: the fixtures are null-free, so nulls are
    synthesized with NULLIF, then tested with IS NULL / COALESCE."""
    li = load_table(spark, sf_dir, "lineitem")
    d = F.nullif(F.col("l_discount"), F.lit(0.0))
    return li.filter(F.col("l_quantity") < 3).select(
        "l_orderkey",
        "l_linenumber",
        d.isNull().alias("disc_is_null"),
        F.coalesce(d, F.lit(-1.0)).alias("disc_or_sentinel"),
    )


def _roundtrip_dir(spark: SparkSession, sf_dir: str, fmt: str) -> str:
    """Materialize nation in the given format once per (sf, fmt)."""
    import os
    import tempfile

    out = os.path.join(
        tempfile.gettempdir(),
        "mimr_fmt",
        f"{sf_dir.strip('/').replace('/', '_')}_{fmt}",
    )
    marker = os.path.join(out, "_SUCCESS")
    if not os.path.exists(marker):
        n = load_table(spark, sf_dir, "nation")
        if fmt == "csv":
            n.write.mode("overwrite").option("header", True).csv(out)
        elif fmt == "orc":
            n.write.mode("overwrite").orc(out)
        else:
            n.write.mode("overwrite").json(out)
    return out


@register(
    "q_scan_csv",
    oracle="SELECT n_nationkey, n_name, n_regionkey FROM nation",
)
def q_scan_csv(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CSV source with explicit schema (no inferSchema — that's an
    extra full pass at scale): write-once round-trip of nation, read
    back and checked against the parquet-backed oracle."""
    n = load_table(spark, sf_dir, "nation")
    path = _roundtrip_dir(spark, sf_dir, "csv")
    return (
        spark.read.schema(n.schema)
        .option("header", True)
        .csv(path)
        .select("n_nationkey", "n_name", "n_regionkey")
    )


@register(
    "q_scan_json",
    oracle="SELECT n_nationkey, n_name, n_regionkey FROM nation",
)
def q_scan_json(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JSON-lines source with explicit schema, same round-trip check."""
    n = load_table(spark, sf_dir, "nation")
    path = _roundtrip_dir(spark, sf_dir, "json")
    return (
        spark.read.schema(n.schema)
        .json(path)
        .select("n_nationkey", "n_name", "n_regionkey")
    )


@register(
    "q_scan_orc",
    oracle="SELECT n_nationkey, n_name, n_regionkey FROM nation",
)
def q_scan_orc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ORC source (the other columnar format Spark ships natively, with
    the same predicate-pushdown/column-pruning machinery as parquet):
    write-once round-trip of nation, read back against the
    parquet-backed oracle."""
    path = _roundtrip_dir(spark, sf_dir, "orc")
    return spark.read.orc(path).select("n_nationkey", "n_name", "n_regionkey")


def _binary_docs_dir(spark: SparkSession, sf_dir: str) -> str:
    """Materialize the first 100 documents (doc_id < 100) as one raw
    binary file each — the at-rest shape of a multimodal corpus
    (image/audio payloads as opaque files). Keyed by the fixture's
    content fingerprint so a regenerated fixture can't serve stale
    files; built once, driver-side (bounded: 100 small files)."""
    import os
    import tempfile

    from meta_iterative_mapreduce_spark.io import fixture_fingerprint

    out = os.path.join(
        tempfile.gettempdir(),
        "mimr_fmt",
        f"bin_{fixture_fingerprint(sf_dir, 'documents')}",
    )
    marker = os.path.join(out, "_SUCCESS")
    if not os.path.exists(marker):
        os.makedirs(out, exist_ok=True)
        rows = (
            load_table(spark, sf_dir, "documents")
            .filter(F.col("doc_id") < 100)
            .select("doc_id", "text")
            .collect()
        )
        for r in rows:
            with open(
                os.path.join(out, f"doc_{r['doc_id']:08d}.bin"), "wb"
            ) as fh:
                fh.write(r["text"].encode("utf-8"))
        with open(marker, "w"):
            pass
    return out


@register(
    "q_scan_binaryfile",
    oracle="""
    SELECT doc_id,
           MD5(text) AS content_md5,
           OCTET_LENGTH(ENCODE(text)) AS n_bytes
    FROM documents WHERE doc_id < 100
    """,
)
def q_scan_binaryfile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Spark's binaryFile source — the native ingest path for
    multimodal corpora (each image/audio/video payload an opaque file;
    the scan yields path/length/content without any Python loop, and
    partition planning splits the FILE LIST across executors, so a
    100 TB ingest parallelizes by file count). Round-trip check: the
    first 100 documents written as raw UTF-8 files, read back via
    binaryFile, doc_id parsed from the file name, and content verified
    byte-exactly against the parquet-backed oracle via md5 + byte
    length. pathGlobFilter prunes non-payload files (the _SUCCESS
    marker) at the listing, not with a post-filter."""
    path = _binary_docs_dir(spark, sf_dir)
    return (
        spark.read.format("binaryFile")
        .option("pathGlobFilter", "*.bin")
        .load(path)
        .select(
            F.regexp_extract(F.col("path"), r"doc_(\d+)\.bin$", 1)
            .cast("long")
            .alias("doc_id"),
            F.md5(F.col("content")).alias("content_md5"),
            F.col("length").alias("n_bytes"),
        )
    )


@register(
    "q_scan_xml",
    oracle="SELECT n_nationkey, n_name, n_regionkey FROM nation",
)
def q_scan_xml(spark: SparkSession, sf_dir: str) -> DataFrame:
    """XML source (native in Spark 4 — the spark-xml package folded
    into the engine): write-once round-trip of nation with explicit
    rowTag and schema (inference would cost an extra full pass at
    scale, same rule as q_scan_csv), checked against the
    parquet-backed oracle."""
    import os
    import tempfile

    from meta_iterative_mapreduce_spark.io import fixture_fingerprint

    n = load_table(spark, sf_dir, "nation")
    # content-fingerprint key: a regenerated fixture at the same path
    # must not serve a stale round-trip (same rule as _binary_docs_dir)
    out = os.path.join(
        tempfile.gettempdir(),
        "mimr_fmt",
        f"xml_{fixture_fingerprint(sf_dir, 'nation')}",
    )
    if not os.path.exists(os.path.join(out, "_SUCCESS")):
        (
            n.write.mode("overwrite")
            .option("rootTag", "nations")
            .option("rowTag", "nation")
            .format("xml")
            .save(out)
        )
    return (
        spark.read.schema(n.schema)
        .option("rowTag", "nation")
        .format("xml")
        .load(out)
        .select("n_nationkey", "n_name", "n_regionkey")
    )
