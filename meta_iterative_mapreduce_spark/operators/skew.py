"""Skew-mitigation utilities: salted joins and salted aggregation.

At 100 TB a single hot key (the null customer, the default partition,
the viral document) turns one reducer into the job's critical path.
Two standard remedies, as composable library functions:

- `salted_join`: explode the small side S ways, salt the big side's
  key — the hot key's rows spread over S reducers. AQE's skew-join
  split handles moderate skew automatically; salting is the
  deterministic heavy hammer for known-pathological keys.
- `two_phase_agg`: aggregate on (key, salt) first (spreads the hot
  key), then re-aggregate on key — works for any algebraic aggregate.

The salt is derived from a hash of the big side's row content — STABLE
across partitionings and task retries (monotonically_increasing_id is
not: a retried map task could re-salt rows differently and lose or
duplicate join output mid-shuffle). Rows with fully identical content
share a salt; pass `salt_cols` with a high-cardinality column set when
the hot key's payload is degenerate.

q_join_skew_salted pins result-equivalence against the plain join via
the DuckDB oracle (the salt is internal, so the oracle is just the
unsalted SQL join); the pytest equivalence tests cover the library
forms with other key/agg combinations.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from meta_iterative_mapreduce_spark.io import load_table
from meta_iterative_mapreduce_spark.registry import register


def _salt_col(df: DataFrame, n_salts: int, salt_cols: list[str] | None):
    cols = salt_cols or df.columns
    return F.pmod(F.hash(*[F.col(c) for c in cols]), F.lit(n_salts)).cast("int")


def salted_join(
    big: DataFrame,
    small: DataFrame,
    big_key: str,
    small_key: str,
    n_salts: int = 8,
    how: str = "inner",
    salt_cols: list[str] | None = None,
) -> DataFrame:
    """Equi-join robust to skew in `big[big_key]`.

    big gets salt = pmod(hash(row content), n_salts) — stable per row;
    small is exploded to all n_salts salt values so every (key, salt)
    bucket finds its match.

    Only 'inner' and 'left' are supported: in a right/full outer join
    every UNMATCHED copy of an exploded small-side row would survive as
    its own null-extended output row (n_salts duplicates).
    """
    if how not in ("inner", "left"):
        raise ValueError(
            f"salted_join supports how in ('inner', 'left'), got {how!r}: "
            "right/full would emit one null-extended row per unmatched "
            "small-side salt copy"
        )
    salted_big = big.withColumn("__salt", _salt_col(big, n_salts, salt_cols))
    exploded_small = small.withColumn(
        "__salt", F.explode(F.array(*[F.lit(i) for i in range(n_salts)]))
    )
    joined = salted_big.join(
        exploded_small,
        (salted_big[big_key] == exploded_small[small_key])
        & (salted_big["__salt"] == exploded_small["__salt"]),
        how,
    )
    return joined.drop("__salt")


def two_phase_agg(
    df: DataFrame,
    key: str,
    agg_exprs: list[tuple[str, str]],
    n_salts: int = 8,
    salt_cols: list[str] | None = None,
) -> DataFrame:
    """Salted two-phase aggregation for algebraic aggregates.

    agg_exprs: list of (column, fn) with fn in {'sum', 'count', 'min',
    'max'} — the merge of partials is the same fn (count merges by
    sum). avg is expressed by the caller as sum+count.
    """
    salted = df.withColumn("__salt", _salt_col(df, n_salts, salt_cols))
    partial = salted.groupBy(key, "__salt").agg(
        *[
            getattr(F, fn)(col).alias(f"__p_{fn}_{col}")
            for col, fn in agg_exprs
        ]
    )
    merge_fn = {"sum": "sum", "count": "sum", "min": "min", "max": "max"}
    final = partial.groupBy(key).agg(
        *[
            getattr(F, merge_fn[fn])(f"__p_{fn}_{col}").alias(f"{fn}_{col}")
            for col, fn in agg_exprs
        ]
    )
    return final


@register(
    "q_join_skew_salted",
    oracle="""
    SELECT c.c_mktsegment AS segment,
           COUNT(*) AS n_orders,
           ROUND(SUM(o.o_totalprice), 4) AS total_spend
    FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
    GROUP BY c.c_mktsegment
    """,
)
def q_join_skew_salted(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Salted skew join, result-equivalent to the plain join: orders
    (big, salted on stable row-hash) ⋈ customer (small, exploded to
    n_salts copies) on custkey, then the usual per-segment rollup. The
    oracle is the UNSALTED SQL join — identical output proves the salt
    is invisible to results while the shuffle key (custkey, salt)
    spreads any hot customer across 8 reducers."""
    o = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey", "o_totalprice"
    )
    c = load_table(spark, sf_dir, "customer").select("c_custkey", "c_mktsegment")
    j = salted_join(o, c, "o_custkey", "c_custkey", n_salts=8, how="inner")
    return j.groupBy(F.col("c_mktsegment").alias("segment")).agg(
        F.count(F.lit(1)).alias("n_orders"),
        F.round(F.sum("o_totalprice"), 4).alias("total_spend"),
    )
