"""Timestamp helpers that are safe for BOTH TIMESTAMP and
TIMESTAMP_NTZ columns.

The driver-generated parquet stores `ts` tz-naive (parquet
isAdjustedToUTC=false), which Spark 4 reads as TIMESTAMP_NTZ —
a type `unix_micros` rejects outright. DuckDB reads the same column
as a naive TIMESTAMP and `epoch_us` treats the wall clock as UTC.
`to_utc_timestamp(col, 'UTC')` reconciles the two worlds in one
expression:

- TIMESTAMP_NTZ input: the naive wall clock is interpreted as UTC —
  exactly DuckDB's `epoch_us` on a tz-naive parquet column;
- TIMESTAMP (ltz) input: converting "from UTC to UTC" is the
  identity, so already-zoned data passes through unchanged.

Either way the result is independent of `spark.sql.session.timeZone`
(pinned by the robustness matrix, tools/robustness.py, which runs the
whole suite under America/Los_Angeles).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# SQL fragment equivalent of ts_us("ts"), for F.expr(...) call sites.
TS_US_SQL = "unix_micros(to_utc_timestamp(ts, 'UTC'))"


def ts_us(col: Column | str) -> Column:
    """Epoch microseconds of a timestamp column, identical for
    TIMESTAMP and TIMESTAMP_NTZ inputs and independent of the session
    time zone. Mirrors DuckDB's `epoch_us(ts)` on the same parquet."""
    return F.unix_micros(F.to_utc_timestamp(col, "UTC"))
