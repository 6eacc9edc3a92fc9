"""Structured Streaming throughput profile: sustained rows/second of
the engine's windowed-aggregation path under the rate source.

The streaming surface is correctness-tested against batch twins
(tests/test_streaming.py); this measures the other axis — sustained
micro-batch throughput of a REAL stateful plan (1-minute tumbling
event-time window + watermark, per-key sums), which is what decides
how many executors a production ingest needs. The rate source
generates rows in-JVM (no I/O floor), so the number is the engine's
aggregation ceiling on this box, not a disk benchmark.

Usage: python tools/stream_profile.py [rows_per_sec] [seconds]
       (default 2_000_000 rows/s offered for 20 s)
Prints offered vs processed rates from the query's own progress
metrics (the honest number — backpressure shows up as processed <
offered).
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from meta_iterative_mapreduce_spark.session import get_spark  # noqa: E402


def main() -> None:
    rate = int(sys.argv[1]) if len(sys.argv) > 1 else 2_000_000
    seconds = int(sys.argv[2]) if len(sys.argv) > 2 else 20
    spark = get_spark(
        "mimr-stream-profile",
        extra_conf={"spark.ui.showConsoleProgress": "false"},
    )
    src = (
        spark.readStream.format("rate")
        .option("rowsPerSecond", str(rate))
        .option("numPartitions", "16")
        .load()
    )
    agg = (
        src.withWatermark("timestamp", "10 seconds")
        .groupBy(
            F.window("timestamp", "1 minute"),
            (F.col("value") % 256).alias("k"),
        )
        .agg(F.count(F.lit(1)).alias("n"), F.sum("value").alias("s"))
    )
    q = (
        agg.writeStream.outputMode("update")
        .format("noop")
        .option("checkpointLocation", f"/tmp/mimr_stream_prof_{os.getpid()}")
        .start()
    )
    t0 = time.time()
    while time.time() - t0 < seconds:
        time.sleep(1)
    progress = q.recentProgress
    q.stop()
    spark.stop()
    rows = sum(p["numInputRows"] for p in progress)
    dur = sum(p["batchDuration"] for p in progress) / 1000.0
    # steady-state rate: drop the first (bring-up) batch
    steady = progress[1:] or progress
    s_rows = sum(p["numInputRows"] for p in steady)
    s_dur = sum(p["batchDuration"] for p in steady) / 1000.0
    print(
        f"offered={rate:,}/s for {seconds}s; {len(progress)} batches, "
        f"{rows:,} rows in {dur:.1f}s busy -> "
        f"overall {rows / max(dur, 1e-9):,.0f} rows/s, "
        f"steady {s_rows / max(s_dur, 1e-9):,.0f} rows/s"
    )


if __name__ == "__main__":
    main()
