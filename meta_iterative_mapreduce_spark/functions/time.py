"""Event-time helpers. House rule: event time is TIMESTAMP_NTZ
everywhere inside the engine.

The driver-generated parquet stores `ts` tz-naive (parquet
isAdjustedToUTC=false): Spark 4 reads it as TIMESTAMP_NTZ and DuckDB
as a naive TIMESTAMP. Keeping the naive type end-to-end makes every
wall-clock function (date_trunc, to_date, date_format, window
bucketing) byte-for-byte equal to the oracle REGARDLESS of
spark.sql.session.timeZone — the robustness matrix runs the suite
under America/Los_Angeles to pin exactly that.

What NTZ costs is `unix_micros`, which rejects the type. Worse, every
"convert then extract" detour (cast to TIMESTAMP, to_utc_timestamp)
routes through the SESSION time zone, shifting epochs by the zone
offset under a non-UTC session — measured 8h off under LA. The only
session-tz-independent extraction is pure NTZ arithmetic against the
NTZ epoch:

    timestampdiff(MICROSECOND, TIMESTAMP_NTZ'1970-01-01', ts)

which equals DuckDB's `epoch_us(ts)` on the same file under every
session zone.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

_NTZ_EPOCH = "TIMESTAMP_NTZ'1970-01-01 00:00:00'"


def ts_us(col: str) -> Column:
    """Epoch microseconds of a TIMESTAMP_NTZ column (by name —
    dotted struct paths like "window.start" work), independent of the
    session time zone. Mirrors DuckDB's `epoch_us(ts)`. Also accepts
    plain TIMESTAMP columns (coerced wall-preserving in session tz;
    only UTC sessions see those, per the load_table normalization)."""
    return F.expr(f"timestampdiff(MICROSECOND, {_NTZ_EPOCH}, {col})")


def ts_us_ltz(col: str) -> Column:
    """Epoch microseconds of a TIMESTAMP (ltz) column — the streaming
    surface's extractor. Streaming event time is ltz (watermarks reject
    NTZ), so `unix_micros` is the session-tz-independent extraction
    there; routing ltz through ts_us()'s NTZ arithmetic would coerce
    wall-preserving through the session tz and shift epochs by the
    zone offset under a non-UTC session."""
    return F.expr(f"unix_micros({col})")


def ts_ltz(col: str) -> Column:
    """TIMESTAMP (ltz) with the same epoch micros ts_us() extracts —
    naive walls read as UTC, under any session tz. Structured
    Streaming refuses TIMESTAMP_NTZ event time
    ([EVENT_TIME_IS_NOT_ON_TIMESTAMP_TYPE]), so streaming sources
    convert through this at ingest; the batch surface stays NTZ."""
    return F.timestamp_micros(ts_us(col))
