"""Scalar function families (SURVEY.md §2.2 H).

All expressions are built-in `pyspark.sql.functions` — JVM-side,
inside whole-stage codegen, never Python. Transcendentals (ln, log10,
pow) are ROUND(...,4)-ed since libm implementations may differ in the
last ulp across engines; structural functions (substr, concat, date
parts, array ops) are exact.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from meta_iterative_mapreduce_spark.io import load_table
from meta_iterative_mapreduce_spark.registry import register


@register(
    "q_scalar_string",
    oracle="""
    SELECT p_partkey,
           UPPER(p_name) AS name_upper,
           LOWER(p_brand) AS brand_lower,
           SUBSTR(p_name, 1, 5) AS name_pfx,
           CAST(LENGTH(p_name) AS INT) AS name_len,
           CONCAT(p_brand, '/', p_type) AS brand_type,
           TRIM(CONCAT('  ', p_name, '  ')) AS name_trim,
           string_split(p_name, ' ')[1] AS first_word,
           CAST(LENGTH(string_split(p_name, ' ')) AS INT) AS n_words,
           regexp_extract(p_brand, '#([0-9]+)', 1) AS brand_num,
           REPLACE(p_type, 'ECONOMY', 'ECON') AS type_short
    FROM part
    """,
)
def q_scalar_string(spark: SparkSession, sf_dir: str) -> DataFrame:
    """String functions: case, substring, length, concat, trim, split,
    regexp_extract, replace."""
    p = load_table(spark, sf_dir, "part")
    return p.select(
        "p_partkey",
        F.upper("p_name").alias("name_upper"),
        F.lower("p_brand").alias("brand_lower"),
        F.substring("p_name", 1, 5).alias("name_pfx"),
        F.length("p_name").alias("name_len"),
        F.concat(F.col("p_brand"), F.lit("/"), F.col("p_type")).alias("brand_type"),
        F.trim(F.concat(F.lit("  "), F.col("p_name"), F.lit("  "))).alias("name_trim"),
        F.split("p_name", " ").getItem(0).alias("first_word"),
        F.size(F.split("p_name", " ")).alias("n_words"),
        F.regexp_extract("p_brand", "#([0-9]+)", 1).alias("brand_num"),
        F.replace(F.col("p_type"), F.lit("ECONOMY"), F.lit("ECON")).alias("type_short"),
    )


@register(
    "q_scalar_date",
    oracle="""
    SELECT o_orderkey,
           CAST(year(o_orderdate) AS INT) AS yr,
           CAST(month(o_orderdate) AS INT) AS mo,
           CAST(day(o_orderdate) AS INT) AS dom,
           CAST(dayofweek(o_orderdate) AS INT) AS dow,
           strftime(date_trunc('month', o_orderdate), '%Y-%m-%d') AS month_start,
           CAST(datediff('day', TIMESTAMP '1995-01-01', o_orderdate) AS INT) AS days_since_95,
           strftime(o_orderdate + INTERVAL 30 DAY, '%Y-%m-%d') AS due_date,
           strftime(o_orderdate, '%Y-%m-%d') AS od
    FROM orders
    """,
)
def q_scalar_date(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Date/time functions: parts extraction, truncation, diff, add.

    DuckDB dayofweek is 0=Sunday..6; Spark dayofweek is 1=Sunday..7,
    so Spark subtracts 1 to align.
    """
    o = load_table(spark, sf_dir, "orders")
    return o.select(
        "o_orderkey",
        F.year("o_orderdate").alias("yr"),
        F.month("o_orderdate").alias("mo"),
        F.dayofmonth("o_orderdate").alias("dom"),
        (F.dayofweek("o_orderdate") - 1).alias("dow"),
        F.date_format(F.date_trunc("month", "o_orderdate"), "yyyy-MM-dd").alias(
            "month_start"
        ),
        F.datediff(
            F.col("o_orderdate"), F.lit("1995-01-01").cast("timestamp")
        ).alias("days_since_95"),
        F.date_format(F.date_add(F.col("o_orderdate"), 30), "yyyy-MM-dd").alias(
            "due_date"
        ),
        F.date_format("o_orderdate", "yyyy-MM-dd").alias("od"),
    )


@register(
    "q_scalar_math",
    oracle="""
    SELECT l_orderkey, l_linenumber,
           ABS(l_extendedprice - 50000.0) AS abs_dev,
           CAST(CEIL(l_extendedprice / 1000.0) AS BIGINT) AS price_kceil,
           CAST(FLOOR(l_extendedprice / 1000.0) AS BIGINT) AS price_kfloor,
           SQRT(l_quantity) AS qty_sqrt,
           ROUND(LN(l_extendedprice), 4) AS price_ln,
           ROUND(LOG10(l_extendedprice), 4) AS price_log10,
           ROUND(POWER(l_quantity, 1.5), 4) AS qty_pow,
           CAST(SIGN(l_extendedprice - 50000.0) AS DOUBLE) AS dev_sign,
           CAST(l_quantity AS BIGINT) % 7 AS qty_mod7
    FROM lineitem
    WHERE l_orderkey % 100 = 0
    """,
)
def q_scalar_math(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Math functions: abs/ceil/floor/sqrt/ln/log10/power/sign/mod.
    sqrt is IEEE-exact (no rounding); ln/log10/power are rounded."""
    li = load_table(spark, sf_dir, "lineitem")
    return li.filter(F.col("l_orderkey") % 100 == 0).select(
        "l_orderkey",
        "l_linenumber",
        F.abs(F.col("l_extendedprice") - 50000.0).alias("abs_dev"),
        F.ceil(F.col("l_extendedprice") / 1000.0).alias("price_kceil"),
        F.floor(F.col("l_extendedprice") / 1000.0).alias("price_kfloor"),
        F.sqrt("l_quantity").alias("qty_sqrt"),
        F.round(F.log(F.col("l_extendedprice")), 4).alias("price_ln"),
        F.round(F.log10("l_extendedprice"), 4).alias("price_log10"),
        F.round(F.pow("l_quantity", F.lit(1.5)), 4).alias("qty_pow"),
        F.signum(F.col("l_extendedprice") - 50000.0).alias("dev_sign"),
        (F.col("l_quantity").cast("bigint") % 7).alias("qty_mod7"),
    )


@register(
    "q_scalar_array",
    oracle="""
    SELECT vec_id,
           CAST(LENGTH(embedding) AS INT) AS dim,
           CAST(embedding[1] AS DOUBLE) AS e0,
           ROUND(list_sum(list_transform(embedding,
                 x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))), 4) AS l2sq,
           CAST(LENGTH(list_filter(embedding, x -> x > 0)) AS INT) AS n_pos,
           ROUND(CAST(list_max(embedding) AS DOUBLE), 4) AS emb_max
    FROM embeddings
    """,
)
def q_scalar_array(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Array functions: size, element access, higher-order transform +
    aggregate (squared L2 norm), filter, array_max — all JVM-side
    (no UDF) via Spark's higher-order functions."""
    e = load_table(spark, sf_dir, "embeddings")
    elem_sq = F.transform(
        "embedding", lambda x: x.cast("double") * x.cast("double")
    )
    return e.select(
        "vec_id",
        F.size("embedding").alias("dim"),
        F.col("embedding").getItem(0).cast("double").alias("e0"),
        F.round(
            F.aggregate(elem_sq, F.lit(0.0), lambda acc, x: acc + x), 4
        ).alias("l2sq"),
        F.size(F.filter("embedding", lambda x: x > 0)).alias("n_pos"),
        F.round(F.array_max("embedding").cast("double"), 4).alias("emb_max"),
    )


@register(
    "q_scalar_json",
    oracle="""
    SELECT event_id,
           CAST(json_extract_string(props, '$.k') AS INT) AS k_val,
           (CAST(json_extract_string(props, '$.k') AS INT) >= 50) AS k_high
    FROM events
    """,
)
def q_scalar_json(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JSON field extraction from the events.props string column."""
    ev = load_table(spark, sf_dir, "events")
    k = F.get_json_object("props", "$.k").cast("int")
    return ev.select(
        "event_id",
        k.alias("k_val"),
        (k >= 50).alias("k_high"),
    )


@register(
    "q_scalar_conditional",
    oracle="""
    SELECT l_orderkey, l_linenumber,
           GREATEST(l_quantity, l_discount * 100.0) AS g,
           LEAST(l_quantity, l_tax * 100.0) AS l,
           IFNULL(NULLIF(l_discount, 0.0), 0.99) AS dflt,
           CASE WHEN l_quantity > 25 THEN 'H' WHEN l_quantity > 10 THEN 'M'
                ELSE 'L' END AS bucket3
    FROM lineitem
    WHERE l_orderkey % 50 = 0
    """,
)
def q_scalar_conditional(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Conditional scalar functions: greatest/least/ifnull + 3-way CASE."""
    li = load_table(spark, sf_dir, "lineitem")
    return li.filter(F.col("l_orderkey") % 50 == 0).select(
        "l_orderkey",
        "l_linenumber",
        F.greatest(F.col("l_quantity"), F.col("l_discount") * 100.0).alias("g"),
        F.least(F.col("l_quantity"), F.col("l_tax") * 100.0).alias("l"),
        F.ifnull(F.nullif(F.col("l_discount"), F.lit(0.0)), F.lit(0.99)).alias("dflt"),
        F.when(F.col("l_quantity") > 25, "H")
        .when(F.col("l_quantity") > 10, "M")
        .otherwise("L")
        .alias("bucket3"),
    )


@register(
    "q_scalar_array_setops",
    oracle="""
    SELECT d1.doc_id AS doc_a, d2.doc_id AS doc_b,
           CAST(LENGTH(list_intersect(list_distinct(string_split(d1.text, ' ')),
                                      list_distinct(string_split(d2.text, ' '))))
                AS INT) AS n_common,
           CAST(LENGTH(list_distinct(string_split(d1.text, ' ')
                                     || string_split(d2.text, ' ')))
                AS INT) AS n_union
    FROM documents d1 JOIN documents d2 ON d2.doc_id = d1.doc_id + 1
    WHERE d1.doc_id < 50
    """,
)
def q_scalar_array_setops(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Array set operations (intersect / union cardinalities of token
    sets for adjacent doc pairs) — the JVM-side primitives under
    set-similarity measures."""
    d = load_table(spark, sf_dir, "documents")
    d1 = d.select(F.col("doc_id").alias("doc_a"), F.col("text").alias("t1"))
    d2 = d.select(F.col("doc_id").alias("doc_b"), F.col("text").alias("t2"))
    toks1 = F.array_distinct(F.split("t1", " "))
    toks2 = F.array_distinct(F.split("t2", " "))
    return (
        d1.filter(F.col("doc_a") < 50)
        .join(d2, F.col("doc_b") == F.col("doc_a") + 1)
        .select(
            "doc_a",
            "doc_b",
            F.size(F.array_intersect(toks1, toks2)).alias("n_common"),
            F.size(F.array_distinct(F.concat(F.split("t1", " "), F.split("t2", " ")))).alias("n_union"),
        )
    )


@register(
    "q_scalar_map",
    oracle="""
    SELECT event_id,
           CAST(json_extract_string(props, '$.k') AS INT) AS k_from_map,
           1 AS map_size
    FROM events
    WHERE event_id < 1000
    """,
)
def q_scalar_map(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MapType round-trip: parse the JSON props into a typed
    map<string,int>, then element access + cardinality. (The fixture
    maps all have exactly one key, which the oracle states literally.)"""
    ev = load_table(spark, sf_dir, "events").filter(F.col("event_id") < 1000)
    m = F.from_json("props", "map<string,int>")
    return ev.select(
        "event_id",
        F.element_at(m, "k").alias("k_from_map"),
        F.size(m).alias("map_size"),
    )
