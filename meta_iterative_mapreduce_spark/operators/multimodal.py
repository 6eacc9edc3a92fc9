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


# ---------------------------------------------------------------------------
# Real decode path over a deterministic synthetic image format
# ---------------------------------------------------------------------------
#
# Wire format (big-endian): 4-byte magic "MIMG" | u16 width | u16 height
# | width*height pixel bytes. The encoder runs JVM-side (hex/unhex/
# concat — no Python in the encode hot path); the decoder is a REAL
# byte-level parser (struct.unpack + validation) running Arrow-batched
# in mapInPandas — exactly the shape a JPEG/PNG decode takes at 100 TB,
# with the codec swapped for a dependency-free format the oracle can
# recompute in SQL.

_MAGIC = b"MIMG"
_MAX_HEIGHT = 64


def synthetic_image_payloads(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(doc_id, payload binary) — documents packed into the synthetic
    image format. width = doc_id%13+4 (4..16), height = min(n_bytes
    div width, 64); pixel bytes are the leading width*height UTF-8
    bytes of the text. All header math is JVM-side: u16be(x) =
    unhex(lpad(hex(x), 4, '0'))."""
    d = load_table(spark, sf_dir, "documents")
    nb = F.length(F.encode("text", "UTF-8"))
    width = (F.col("doc_id") % 13 + 4).cast("int")
    height = F.least(F.floor(nb / width), F.lit(_MAX_HEIGHT)).cast("int")

    def u16be(c):
        return F.unhex(F.lpad(F.hex(c), 4, "0"))

    payload = F.concat(
        F.lit(_MAGIC),
        u16be(width),
        u16be(height),
        F.encode("text", "UTF-8"),
    )
    return d.select("doc_id", payload.alias("payload"))


def decode_synthetic_image(payload: bytes) -> dict:
    """Parse the MIMG wire format: validate magic, read u16be dims,
    slice the pixel plane, compute mean intensity. Raises on corrupt
    payloads (bad magic / truncated pixel plane) like a real codec."""
    import struct

    magic, w, h = struct.unpack(">4sHH", bytes(payload[:8]))
    if magic != _MAGIC:
        raise ValueError(f"bad magic {magic!r}")
    pix = bytes(payload[8 : 8 + w * h])
    if len(pix) != w * h:
        raise ValueError(f"truncated pixel plane: {len(pix)} < {w * h}")
    return {
        "width": w,
        "height": h,
        "n_pixels": len(pix),
        "mean_intensity": (sum(pix) / len(pix)) if pix else 0.0,
    }


def decode_synthetic_features(df: DataFrame) -> DataFrame:
    """Arrow-batched mapInPandas over (doc_id, payload) running the
    real byte-level decoder per payload."""

    def op(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats = [decode_synthetic_image(p) for p in pdf["payload"]]
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "width": pd.Series([f["width"] for f in feats], dtype="int32"),
                    "height": pd.Series([f["height"] for f in feats], dtype="int32"),
                    "n_pixels": pd.Series(
                        [f["n_pixels"] for f in feats], dtype="int64"
                    ),
                    "mean_intensity": pd.Series(
                        [f["mean_intensity"] for f in feats], dtype="float64"
                    ),
                }
            )

    return df.mapInPandas(
        op,
        schema="doc_id long, width int, height int, n_pixels long, "
        "mean_intensity double",
    )


@register(
    "q_multimodal_decode",
    oracle="""
    WITH dims AS (
        SELECT doc_id, text,
               CAST(doc_id % 13 + 4 AS INT) AS width,
               CAST(LEAST(octet_length(encode(text)) // (doc_id % 13 + 4),
                          64) AS INT) AS height
        FROM documents
    )
    SELECT d.doc_id, d.width, d.height,
           CAST(d.width * d.height AS BIGINT) AS n_pixels,
           SUM(ascii(SUBSTR(d.text, CAST(t.i AS INT), 1)))
               / CAST(d.width * d.height AS DOUBLE) AS mean_intensity
    FROM dims d,
         UNNEST(generate_series(1, d.width * d.height)) AS t(i)
    GROUP BY d.doc_id, d.width, d.height
    """,
)
def q_multimodal_decode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL decode path: JVM-side encode into the MIMG synthetic image
    format, then byte-level struct parse + pixel-plane stats in
    Arrow-batched mapInPandas. The oracle recomputes the identical
    features from the source text in SQL (texts are ASCII, so
    ascii(char) == pixel byte; the single sum/count division is
    engine-deterministic)."""
    return decode_synthetic_features(synthetic_image_payloads(spark, sf_dir))


def resize_2x2_pool(payload: bytes) -> dict:
    """2×2 mean-pool downsample of the MIMG pixel plane (odd edge rows/
    cols cropped) — the numpy reshape-pool every real thumbnailing
    pipeline runs, on the dependency-free codec."""
    import struct

    import numpy as np

    magic, w, h = struct.unpack(">4sHH", bytes(payload[:8]))
    if magic != _MAGIC:
        raise ValueError(f"bad magic {magic!r}")
    pix = np.frombuffer(bytes(payload[8 : 8 + w * h]), dtype=np.uint8)
    if pix.size != w * h:
        raise ValueError("truncated pixel plane")
    w2, h2 = w // 2, h // 2
    plane = pix.reshape(h, w)[: 2 * h2, : 2 * w2].astype(np.float64)
    pooled = plane.reshape(h2, 2, w2, 2).mean(axis=(1, 3))
    return {
        "new_w": w2,
        "new_h": h2,
        "pooled_sum": float(pooled.sum()),
    }


@register(
    "q_multimodal_resize",
    oracle="""
    WITH dims AS (
        SELECT doc_id, text,
               CAST(doc_id % 13 + 4 AS INT) AS w,
               CAST(LEAST(octet_length(encode(text)) // (doc_id % 13 + 4),
                          64) AS INT) AS h
        FROM documents
    )
    SELECT d.doc_id,
           CAST(d.w // 2 AS INT) AS new_w,
           CAST(d.h // 2 AS INT) AS new_h,
           ROUND(SUM(CASE WHEN ((t.i - 1) // d.w) < 2 * (d.h // 2)
                           AND ((t.i - 1) % d.w) < 2 * (d.w // 2)
                          THEN ascii(SUBSTR(d.text, CAST(t.i AS INT), 1))
                          ELSE 0 END) / 4.0, 4) AS pooled_sum
    FROM dims d,
         UNNEST(generate_series(1, d.w * d.h)) AS t(i)
    GROUP BY d.doc_id, d.w, d.h
    """,
)
def q_multimodal_resize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Image resize (2×2 mean pooling) over MIMG payloads in
    Arrow-batched mapInPandas. The oracle recomputes the pooled-plane
    sum from the source bytes: every kept pixel lands in exactly one
    2×2 block, so Σ pooled = Σ cropped-pixels / 4 (cropping is
    position arithmetic on the flat index)."""
    src = synthetic_image_payloads(spark, sf_dir)

    def op(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats = [resize_2x2_pool(p) for p in pdf["payload"]]
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "new_w": pd.Series([f["new_w"] for f in feats], dtype="int32"),
                    "new_h": pd.Series([f["new_h"] for f in feats], dtype="int32"),
                    "pooled_sum": pd.Series(
                        [round(f["pooled_sum"], 4) for f in feats],
                        dtype="float64",
                    ),
                }
            )

    return src.mapInPandas(
        op, schema="doc_id long, new_w int, new_h int, pooled_sum double"
    )


_FRAME_BYTES = 32  # bytes per "video frame" in the frame-sample op
_FRAME_STRIDE = 4  # keep every 4th frame


@register(
    "q_multimodal_frame_sample",
    oracle=f"""
    WITH framed AS (
        SELECT doc_id, text,
               octet_length(encode(text)) // {_FRAME_BYTES} AS n_frames
        FROM documents
    )
    SELECT d.doc_id,
           CAST(s.f AS INT) AS frame_idx,
           SUM(ascii(SUBSTR(d.text,
                     CAST(s.f * {_FRAME_BYTES} + t.i AS INT), 1)))
                 / {_FRAME_BYTES}.0 AS frame_mean
    FROM framed d,
         UNNEST(generate_series(0, d.n_frames - 1, {_FRAME_STRIDE})) AS s(f),
         UNNEST(generate_series(1, {_FRAME_BYTES})) AS t(i)
    WHERE d.n_frames > 0
    GROUP BY d.doc_id, s.f
    """,
)
def q_multimodal_frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Video frame sampling: treat each document's byte stream as
    fixed-size frames, keep every {stride}-th frame, and emit a
    per-frame mean intensity — one input row fanning out to its
    sampled frames inside mapInPandas (the decode-side shape of a
    frame-subsampling video pipeline)."""
    d = load_table(spark, sf_dir, "documents")
    src = d.select("doc_id", F.encode("text", "UTF-8").alias("payload"))

    def op(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out_doc, out_idx, out_mean = [], [], []
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                data = bytes(payload)
                n_frames = len(data) // _FRAME_BYTES
                for f in range(0, n_frames, _FRAME_STRIDE):
                    frame = data[f * _FRAME_BYTES : (f + 1) * _FRAME_BYTES]
                    out_doc.append(doc_id)
                    out_idx.append(f)
                    # int-sum / 32 is an exact dyadic rational — emit
                    # RAW (bit-identical across engines); rounding it
                    # would reintroduce banker's-vs-half-up tie skew
                    out_mean.append(sum(frame) / _FRAME_BYTES)
            yield pd.DataFrame(
                {
                    "doc_id": pd.Series(out_doc, dtype="int64"),
                    "frame_idx": pd.Series(out_idx, dtype="int32"),
                    "frame_mean": pd.Series(out_mean, dtype="float64"),
                }
            )

    return src.mapInPandas(
        op, schema="doc_id long, frame_idx int, frame_mean double"
    )


def decode_image_features(payload: bytes) -> dict:
    """Injection point for a real raster decoder (PIL/libav): absent in
    this container, so delegate to the synthetic-format parser when the
    payload carries the MIMG magic and fail loudly otherwise."""
    if bytes(payload[:4]) == _MAGIC:
        return decode_synthetic_image(payload)
    try:
        import PIL.Image  # noqa: F401
    except ImportError as exc:  # pragma: no cover - environment-dependent
        raise NotImplementedError(
            "non-MIMG image decoding requires an imaging library "
            "(e.g. Pillow); inject a decoder via decode_features(df, "
            "decoder=...)"
        ) from exc
    raise NotImplementedError("wire a real raster decoder here when available")


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
