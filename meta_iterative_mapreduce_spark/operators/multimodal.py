"""Multimodal-column operators (SURVEY.md §2.2 L).

Images/audio/video are modeled as opaque `binary` payload columns with
typed metadata, processed by Arrow-batched `mapInPandas` operators.
The decode step is STUBBED (no image/audio libraries in this
container): `decode_image_features` raises NotImplementedError unless
a real decoder is injected, and the registered query uses the
deterministic fake decoder so the Spark-side plumbing — schema,
batching, partitioning, UDF signatures — is real and tested.
"""

from __future__ import annotations

from collections.abc import Callable, Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from meta_iterative_mapreduce_spark.io import load_table
from meta_iterative_mapreduce_spark.registry import register


def binary_payloads(spark: SparkSession, sf_dir: str) -> DataFrame:
    """documents.text re-typed as an opaque binary payload + metadata —
    the stand-in for an image/audio bytes column."""
    d = load_table(spark, sf_dir, "documents")
    return d.select(
        "doc_id",
        F.encode("text", "UTF-8").alias("payload"),
        F.struct(
            F.lit("text/plain").alias("mime"),
            F.length(F.encode("text", "UTF-8")).alias("n_bytes"),
            F.col("source").alias("origin"),
        ).alias("meta"),
    )


def _fake_decode(payload: bytes) -> dict:
    """Deterministic stand-in for an image decoder: derives 'features'
    from raw bytes only (mean of the first 32 byte values, byte count).
    STUB — replace with a real decoder (PIL/libav/...) in deployment."""
    head = payload[:32]
    return {
        "n_bytes": len(payload),
        "mean32": sum(head) / float(len(head)) if head else 0.0,
    }


def decode_features(
    df: DataFrame, decoder: Callable[[bytes], dict] | None = None
) -> DataFrame:
    """mapInPandas feature extraction over binary payloads.

    Arrow-batched: each pandas batch maps payload bytes → feature
    columns. Pass a real `decoder` in deployment; default is the
    deterministic fake (the real image path would be
    `decoder=decode_image_features`, which raises until an imaging
    library is available).
    """
    decode = decoder or _fake_decode

    def op(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats = pdf["payload"].map(decode)
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "n_bytes": feats.map(lambda f: f["n_bytes"]).astype("int64"),
                    "mean32": feats.map(lambda f: f["mean32"]).astype("float64"),
                }
            )

    return df.mapInPandas(op, schema="doc_id long, n_bytes long, mean32 double")


def decode_image_features(payload: bytes) -> dict:
    """Real image decode — NOT AVAILABLE in this container (no imaging
    libraries are installed). Kept as the injection point."""
    try:
        import PIL.Image  # noqa: F401
    except ImportError as exc:  # pragma: no cover - environment-dependent
        raise NotImplementedError(
            "image decoding requires an imaging library (e.g. Pillow); "
            "inject a decoder via decode_features(df, decoder=...)"
        ) from exc
    raise NotImplementedError("wire a real decoder here when available")


@register(
    "q_multimodal_decode_stub",
    oracle="""
    SELECT d.doc_id,
           CAST(octet_length(encode(d.text)) AS BIGINT) AS n_bytes,
           SUM(ascii(SUBSTR(d.text, CAST(t.i AS INT), 1)))
               / 32.0 AS mean32
    FROM documents d,
         UNNEST(generate_series(1, 32)) AS t(i)
    GROUP BY d.doc_id, d.text
    """,
)
def q_multimodal_decode_stub(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Binary payload → mapInPandas feature extraction (deterministic
    fake decoder; the oracle recomputes the same bytes math in SQL —
    texts are ASCII so ascii(char) == byte value, and all are ≥32
    bytes so the head window is exactly 32)."""
    return decode_features(binary_payloads(spark, sf_dir))


@register(
    "q_multimodal_struct",
    oracle="""
    SELECT d.doc_id, d.lang, e.label,
           CAST(LENGTH(string_split(d.text, ' ')) AS INT) AS n_tokens,
           ROUND(sqrt(list_sum(list_transform(e.embedding,
                 x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)))), 4) AS emb_norm
    FROM documents d JOIN embeddings e ON d.doc_id = e.vec_id
    """,
)
def q_multimodal_struct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multimodal record assembly: text stats + embedding norm zipped
    into a struct per document (documents ⋈ embeddings on id), then
    flattened for engine-neutral hashing."""
    d = load_table(spark, sf_dir, "documents")
    e = load_table(spark, sf_dir, "embeddings")
    norm = F.sqrt(
        F.aggregate(
            F.transform("embedding", lambda x: x.cast("double") * x.cast("double")),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )
    )
    joined = d.join(e, d.doc_id == e.vec_id).select(
        "doc_id",
        F.struct(
            F.col("lang"),
            F.col("label"),
            F.size(F.split("text", " ")).alias("n_tokens"),
            F.round(norm, 4).alias("emb_norm"),
        ).alias("rec"),
    )
    return joined.select(
        "doc_id",
        F.col("rec.lang").alias("lang"),
        F.col("rec.label").alias("label"),
        F.col("rec.n_tokens").alias("n_tokens"),
        F.col("rec.emb_norm").alias("emb_norm"),
    )
