"""Scale smoke: the flagship aggregation shape at 100M+ rows.

Generates synthetic (batch, chunk, x, y) data with spark.range —
purely in-memory, no files — and runs the same batch_fits plan the
flagship uses, plus the exact OLS aggregate. The point is evidence
that the partition strategy and single-shuffle plan hold far beyond
the sf0.1 fixtures: row count scales ~170× over sf0.1's lineitem
while the shuffle stays O(#batches × #chunks) rows.

Usage: python tools/scale_smoke.py [n_rows]   (default 100_000_000)
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from meta_iterative_mapreduce_spark.operators import regression as R  # noqa: E402
from meta_iterative_mapreduce_spark.session import get_spark  # noqa: E402


def main() -> None:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 100_000_000
    spark = get_spark("mimr-scale-smoke")
    df = (
        spark.range(n)
        .select(
            (F.col("id") % 84).alias("batch_id"),
            (F.col("id") % 8).alias("chunk_id"),
            (F.col("id") % 1000).cast("double").alias("x"),
        )
        .withColumn("y", F.col("x") * 2.5 + 100.0 + (F.col("batch_id") % 7))
    )

    t0 = time.time()
    res = R.iterative_ema_fit(
        df, "x", "y", batch=F.col("batch_id"), chunk=F.col("chunk_id"), eps=0.0
    )
    t_fit = time.time() - t0
    print(
        f"iterative_ema_fit over {n:,} rows: {t_fit:.1f}s -> "
        f"w0={res.w0:.4f} w1={res.w1:.4f} batches={res.n_batches}"
    )

    t0 = time.time()
    exact = R.fit_exact(df, "x", "y").collect()[0]
    t_exact = time.time() - t0
    print(
        f"fit_exact over {n:,} rows: {t_exact:.1f}s -> "
        f"w0={exact['w0']:.4f} w1={exact['w1']:.4f}"
    )
    # y is an exact linear function of x plus a batch offset; slope must
    # recover 2.5 to high precision
    assert abs(res.w1 - 2.5) < 1e-6, res.w1
    assert abs(exact["w1"] - 2.5) < 1e-6
    print("scale smoke OK")


if __name__ == "__main__":
    main()
