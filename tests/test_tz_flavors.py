"""Event-time normalization is session-tz-independent for EVERY
parquet ts flavor the fixture generator may emit.

The driver regenerates events.parquet between rounds in one of:
TIMESTAMP(NANOS) (Spark reads raw longs under nanosAsLong), tz-naive
micros (TIMESTAMP_NTZ), tz-aware micros, or tz-aware nanos. load_table
must normalize all of them to the SAME TIMESTAMP_NTZ walls (epoch as
UTC) regardless of spark.sql.session.timeZone — the round-2 ADVICE
found the nanos/ltz branches detoured through the session zone and
shifted 8h under America/Los_Angeles. This pins the fix.
"""

from __future__ import annotations

import datetime as dt

import pyarrow as pa
import pyarrow.parquet as pq
import pytest
from pyspark.sql import functions as F

from meta_iterative_mapreduce_spark.functions.time import ts_us
from meta_iterative_mapreduce_spark.io import load_table

# walls chosen to straddle a DST boundary in America/Los_Angeles
_WALLS = [
    dt.datetime(2024, 3, 10, 1, 30, 0),
    dt.datetime(2024, 3, 10, 9, 30, 0),
    dt.datetime(2024, 7, 1, 12, 0, 0),
]
_EPOCH_US = [int(w.replace(tzinfo=dt.timezone.utc).timestamp() * 1_000_000) for w in _WALLS]


def _write_events(path: str, ts_type: pa.DataType) -> None:
    n = len(_WALLS)
    if getattr(ts_type, "tz", None):
        ts = pa.array(
            [w.replace(tzinfo=dt.timezone.utc) for w in _WALLS], type=ts_type
        )
    else:
        ts = pa.array(_WALLS, type=ts_type)
    table = pa.table(
        {
            "event_id": pa.array(range(n), pa.int64()),
            "ts": ts,
            "user_id": pa.array([7] * n, pa.int64()),
            "event_type": pa.array(["view"] * n),
            "value": pa.array([1.0] * n, pa.float64()),
            "props": pa.array(["{}"] * n),
        }
    )
    pq.write_table(table, path)


FLAVORS = {
    "ntz_us": pa.timestamp("us"),
    "nanos": pa.timestamp("ns"),
    "ltz_us": pa.timestamp("us", tz="UTC"),
    "ltz_ns": pa.timestamp("ns", tz="UTC"),
}


@pytest.mark.parametrize("tz", ["UTC", "America/Los_Angeles", "Asia/Kolkata"])
def test_all_flavors_same_epochs_under_any_session_tz(spark, tmp_path, tz):
    saved = spark.conf.get("spark.sql.session.timeZone")
    try:
        spark.conf.set("spark.sql.session.timeZone", tz)
        for name, ts_type in FLAVORS.items():
            d = tmp_path / f"{name}_{tz.replace('/', '_')}"
            d.mkdir()
            _write_events(str(d / "events.parquet"), ts_type)
            ev = load_table(spark, str(d), "events")
            assert dict(ev.dtypes)["ts"] == "timestamp_ntz", name
            got = [
                r["us"]
                for r in ev.orderBy("event_id")
                .select(ts_us("ts").alias("us"))
                .collect()
            ]
            assert got == _EPOCH_US, (name, tz, got)
            # wall-clock functions see UTC walls for every flavor
            walls = [
                r["w"]
                for r in ev.orderBy("event_id")
                .select(F.date_format("ts", "yyyy-MM-dd HH:mm:ss").alias("w"))
                .collect()
            ]
            assert walls == [w.strftime("%Y-%m-%d %H:%M:%S") for w in _WALLS], (
                name,
                tz,
            )
    finally:
        spark.conf.set("spark.sql.session.timeZone", saved)
