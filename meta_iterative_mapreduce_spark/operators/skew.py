"""Skew-mitigation utilities: salted joins and salted aggregation.

At 100 TB a single hot key (the null customer, the default partition,
the viral document) turns one reducer into the job's critical path.
Two standard remedies, as composable library functions:

- `salted_join`: explode the small side S ways, salt the big side's
  key with hash%S — the hot key's rows spread over S reducers. AQE's
  skew-join split handles moderate skew automatically; salting is the
  deterministic heavy hammer for known-pathological keys.
- `two_phase_agg`: aggregate on (key, salt) first (spreads the hot
  key), then re-aggregate on key — works for any algebraic aggregate.

Engine-internal only (uses Spark's hash for salting), so exercised by
pytest equivalence tests rather than the DuckDB oracle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def salted_join(
    big: DataFrame,
    small: DataFrame,
    big_key: str,
    small_key: str,
    n_salts: int = 8,
    how: str = "inner",
) -> DataFrame:
    """Equi-join robust to skew in `big[big_key]`.

    big gets salt = pmod(hash(row-identity), n_salts) — deterministic
    per row; small is exploded to all n_salts salt values so every
    (key, salt) bucket finds its match.
    """
    # spread rows of the SAME key across salts round-robin by row id
    salted_big = big.withColumn(
        "__salt", F.pmod(F.monotonically_increasing_id(), n_salts).cast("int")
    )
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
) -> DataFrame:
    """Salted two-phase aggregation for algebraic aggregates.

    agg_exprs: list of (column, fn) with fn in {'sum', 'count', 'min',
    'max'} — the merge of partials is the same fn (count merges by
    sum). avg is expressed by the caller as sum+count.
    """
    salted = df.withColumn(
        "__salt", F.pmod(F.monotonically_increasing_id(), n_salts).cast("int")
    )
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
