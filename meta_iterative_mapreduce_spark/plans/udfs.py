"""UDF / UDAF / UDTF surface (SURVEY.md §2.2 J).

UDFs are the engine's slow path — everything that can be a built-in
is a built-in elsewhere in this package. This module demonstrates the
escape hatches, slow→fast: row-at-a-time Python UDF (serde per row,
kept off hot paths), Arrow-vectorized pandas UDF, grouped-agg pandas
UDF (UDAF), and a Python UDTF (one row → many).
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from meta_iterative_mapreduce_spark.io import load_table
from meta_iterative_mapreduce_spark.registry import register


@register(
    "q_udf_python",
    oracle="""
    SELECT doc_id,
           CAST(LENGTH(string_split(text, ' ')) AS INT) AS n_tokens_udf,
           UPPER(SUBSTR(text, 1, 10)) AS head_udf
    FROM documents
    """,
)
def q_udf_python(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scalar row-at-a-time Python UDFs (deterministic text ops whose
    semantics the oracle re-expresses in SQL)."""

    @F.udf(T.IntegerType())
    def n_tokens(text: str) -> int:
        return len(text.split(" "))

    @F.udf(T.StringType())
    def head10_upper(text: str) -> str:
        return text[:10].upper()

    d = load_table(spark, sf_dir, "documents")
    return d.select(
        "doc_id",
        n_tokens("text").alias("n_tokens_udf"),
        head10_upper("text").alias("head_udf"),
    )


# Fixed probe vector for cosine similarity: 1/8 in every dimension
# (unit L2 norm at dim=64). A plain constant, stated identically in the
# oracle SQL.
_PROBE = [0.125] * 64


@register(
    "q_udf_pandas",
    oracle="""
    SELECT vec_id,
           ROUND(
             list_sum(list_transform(embedding, x -> CAST(x AS DOUBLE) * 0.125))
             / sqrt(list_sum(list_transform(embedding,
                    x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)))),
             4) AS cos_probe
    FROM embeddings
    """,
)
def q_udf_pandas(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Arrow-vectorized pandas UDF: cosine similarity of each embedding
    to a fixed probe vector (numpy float64 per Arrow batch)."""
    import numpy as np

    probe = np.array(_PROBE, dtype=np.float64)

    @F.pandas_udf(T.DoubleType())
    def cos_probe(emb: pd.Series) -> pd.Series:
        m = np.stack(emb.to_numpy()).astype(np.float64)
        dots = m @ probe
        norms = np.sqrt((m * m).sum(axis=1))
        return pd.Series(dots / norms)

    e = load_table(spark, sf_dir, "embeddings")
    return e.select(
        "vec_id", F.round(cos_probe("embedding"), 4).alias("cos_probe")
    )


@register(
    "q_udaf_grouped",
    oracle="""
    SELECT label,
           ROUND(AVG(sqrt(list_sum(list_transform(embedding,
                 x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))))), 4) AS avg_norm,
           COUNT(*) AS n
    FROM embeddings
    GROUP BY label
    """,
)
def q_udaf_grouped(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UDAF via grouped-agg pandas UDF: average embedding L2 norm per
    label (partial aggregation happens per Arrow batch group)."""
    import numpy as np

    @F.pandas_udf(T.DoubleType())
    def avg_norm(emb: pd.Series) -> float:
        m = np.stack(emb.to_numpy()).astype(np.float64)
        return float(np.sqrt((m * m).sum(axis=1)).mean())

    # grouped-agg pandas UDFs cannot mix with JVM aggregates in one agg,
    # so the row count is a (cheap) pandas aggregate too
    @F.pandas_udf(T.LongType())
    def n_rows(emb: pd.Series) -> int:
        return len(emb)

    e = load_table(spark, sf_dir, "embeddings")
    return e.groupBy("label").agg(
        F.round(avg_norm("embedding"), 4).alias("avg_norm"),
        n_rows("embedding").alias("n"),
    )


@register(
    "q_udtf_explode",
    oracle="""
    WITH toks AS (
        SELECT doc_id, unnest(string_split(text, ' ')) AS token,
               generate_subscripts(string_split(text, ' '), 1) AS p
        FROM documents WHERE doc_id < 100
    )
    SELECT doc_id,
           CAST(p - 1 AS INT) AS pos,
           token || ' ' || LEAD(token) OVER
               (PARTITION BY doc_id ORDER BY p) AS bigram
    FROM toks QUALIFY bigram IS NOT NULL
    """,
)
def q_udtf_explode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UDTF (one row → many): word bigrams per document, via a UDF
    returning an array + posexplode (the classic lateral-view shape).
    The Python logic is deterministic, so despite being a UDF surface
    the output is fully oracle-checked against the SQL lead-window
    form."""

    @F.udf(T.ArrayType(T.StringType()))
    def bigrams(text: str) -> list[str]:
        toks = text.split(" ")
        return [f"{a} {b}" for a, b in zip(toks, toks[1:])]

    d = load_table(spark, sf_dir, "documents").filter(F.col("doc_id") < 100)
    return d.select(
        "doc_id", F.posexplode(bigrams("text")).alias("pos", "bigram")
    )


@register(
    "q_udf_grouped_map",
    oracle="""
    SELECT vec_id, label,
           CAST(ROW_NUMBER() OVER (PARTITION BY label
               ORDER BY list_sum(list_transform(embedding,
                   x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))) DESC,
               vec_id) AS INT) AS norm_rank
    FROM embeddings
    """,
)
def q_udf_grouped_map(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Grouped-map applyInPandas: each label's vectors arrive as one
    pandas DataFrame; python ranks them by squared norm (desc, vec_id
    tie-break) and returns a transformed frame — the per-group custom
    transform tier between scalar UDFs and full mapInPandas."""
    import numpy as np

    def rank_by_norm(pdf: pd.DataFrame) -> pd.DataFrame:
        m = np.stack(pdf["embedding"].to_numpy()).astype(np.float64)
        norms = (m * m).sum(axis=1)
        order = pd.DataFrame(
            {"vec_id": pdf["vec_id"], "label": pdf["label"], "norm": norms}
        ).sort_values(["norm", "vec_id"], ascending=[False, True])
        order["norm_rank"] = range(1, len(order) + 1)
        return order[["vec_id", "label", "norm_rank"]]

    e = load_table(spark, sf_dir, "embeddings")
    return e.groupBy("label").applyInPandas(
        rank_by_norm, schema="vec_id long, label int, norm_rank int"
    )
