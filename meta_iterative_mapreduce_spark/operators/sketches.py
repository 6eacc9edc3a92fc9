"""Count-Min Sketch over tokens — a mergeable sketch as pure
DataFrame composition.

CMS estimates per-item frequencies in O(depth × width) memory with a
one-sided error guarantee (estimate ≥ true count, overshoot ≤ εN with
probability 1−δ). Built here entirely from built-in expressions:
token → crc32 → depth hash rows (explode) → (d, bucket) counts — one
hash aggregate; the sketch "table" is itself a tiny DataFrame, and
merging sketches from different corpus shards is a UNION + SUM (the
mergeability that makes sketches the scale path for heavy-hitter
queries where exact counting would shuffle the raw corpus).

crc32-based hashing is engine-specific → rows-only check; the
overestimate guarantee is property-tested against exact counts in
tests/test_sketches.py.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from meta_iterative_mapreduce_spark.io import load_table
from meta_iterative_mapreduce_spark.registry import register

_P = (1 << 31) - 1
_DEPTH = 4
_WIDTH = 256
_A = [(d * 2654435761 + 17) % _P or 1 for d in range(1, _DEPTH + 1)]
_B = [(d * 98765431 + 3) % _P for d in range(1, _DEPTH + 1)]


def _bucket(h, d: int):
    return ((h % _P) * F.lit(_A[d]) + F.lit(_B[d])) % _P % _WIDTH


def cms_build(tokens: DataFrame, col: str = "token") -> DataFrame:
    """(d, bucket, cnt) sketch table from a token stream — one explode
    to depth rows + one hash aggregate with map-side combine."""
    h = F.crc32(F.col(col).cast("binary"))
    rows = tokens.select(
        F.posexplode(
            F.array(*[_bucket(h, d) for d in range(_DEPTH)])
        ).alias("d", "bucket")
    )
    return rows.groupBy("d", "bucket").agg(F.count(F.lit(1)).alias("cnt"))


def cms_estimate(sketch: DataFrame, probes: DataFrame, col: str = "token") -> DataFrame:
    """Estimated count per probe token = min over depths of the probed
    bucket's count (broadcast the tiny sketch to the probes)."""
    h = F.crc32(F.col(col).cast("binary"))
    probe_rows = probes.select(
        col,
        F.posexplode(
            F.array(*[_bucket(h, d) for d in range(_DEPTH)])
        ).alias("d", "bucket"),
    )
    joined = probe_rows.join(F.broadcast(sketch), ["d", "bucket"], "left").fillna(
        0, subset=["cnt"]
    )
    return joined.groupBy(col).agg(F.min("cnt").alias("est_count"))


@register("q_sketch_count_min")  # rows-only: crc32-based hashing
def q_sketch_count_min(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CMS heavy-hitter estimates: build a 4×256 sketch over all corpus
    tokens, then estimate every distinct token's frequency — returned
    alongside nothing else so the overestimate property is auditable
    against q_text_tokens."""
    d = load_table(spark, sf_dir, "documents")
    toks = d.select(F.explode(F.split("text", " ")).alias("token"))
    sketch = cms_build(toks)
    probes = toks.distinct()
    return cms_estimate(sketch, probes).orderBy("token")
