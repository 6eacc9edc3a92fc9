"""Avro Object Container File reader/writer (VERDICT r10 Missing #2):
byte-exact round trips for both real codecs, framing guards (corrupt
sync, truncation, unknown codec), the zero-payload-I/O block index,
and the block-per-partition Spark data source."""

from __future__ import annotations

import os

import pytest

from meta_iterative_mapreduce_spark.sources.avro_ocf import (
    encode_avro,
    index_avro_blocks,
    read_avro,
    read_avro_block,
    register_avro_source,
    spark_schema_of,
)

SCHEMA = {
    "type": "record",
    "name": "r",
    "fields": [
        {"name": "id", "type": "long"},
        {"name": "name", "type": "string"},
        {"name": "note", "type": ["null", "string"]},
        {"name": "flag", "type": "boolean"},
        {"name": "score", "type": "double"},
        {"name": "blob", "type": "bytes"},
        {"name": "vec", "type": {"type": "array", "items": "double"}},
    ],
}


def _recs(n: int) -> list[dict]:
    return [
        {
            "id": i,
            "name": f"n{i}",
            "note": None if i % 3 == 0 else f"x{i}",
            "flag": i % 2 == 0,
            "score": i / 7.0,
            "blob": bytes([i % 256, 255, 0]),
            "vec": [i * 1.5, -i * 0.25],
        }
        for i in range(n)
    ]


@pytest.mark.parametrize("codec", ["null", "deflate"])
def test_roundtrip_exact_both_codecs(codec):
    recs = _recs(257)
    data = encode_avro(recs, SCHEMA, codec=codec, block_records=64)
    schema, got = read_avro(data)
    assert schema == SCHEMA
    assert got == recs  # byte-exact: varints, unions, arrays, IEEE


def test_empty_container_roundtrip():
    data = encode_avro([], SCHEMA)
    schema, got = read_avro(data)
    assert schema == SCHEMA and got == []


def test_corrupt_sync_marker_raises():
    data = bytearray(encode_avro(_recs(10), SCHEMA, block_records=4))
    data[-1] ^= 0xFF  # flip one byte of the final sync marker
    with pytest.raises(ValueError, match="sync marker mismatch"):
        read_avro(bytes(data))


def test_truncated_block_raises():
    data = encode_avro(_recs(10), SCHEMA, block_records=10)
    with pytest.raises(ValueError, match="truncated"):
        read_avro(data[: len(data) - 20])


def test_bad_magic_raises():
    with pytest.raises(ValueError, match="bad magic"):
        read_avro(b"PAR1" + b"\x00" * 64)


def test_unknown_codec_guard_both_sides():
    with pytest.raises(NotImplementedError, match="zstd"):
        encode_avro(_recs(1), SCHEMA, codec="zstd")
    # a file CLAIMING zstd must raise the scope guard, not garbage
    data = encode_avro(_recs(1), SCHEMA, codec="null")
    forged = data.replace(b"\x08null", b"\x08zstd", 1)
    assert forged != data  # the codec metadata entry was rewritten
    with pytest.raises(NotImplementedError, match="zstd"):
        read_avro(forged)


def test_block_index_is_metadata_only_and_seekable(tmp_path):
    recs = _recs(200)
    data = encode_avro(recs, SCHEMA, codec="deflate", block_records=32)
    p = str(tmp_path / "t.avro")
    open(p, "wb").write(data)
    idx = index_avro_blocks(p)
    assert len(idx["blocks"]) == 7  # ceil(200/32)
    assert sum(n for _, n, _ in idx["blocks"]) == 200
    # every block decodes independently by direct seek, and the
    # concatenation equals the sequential read — the splittability
    # contract sync markers exist for
    got = []
    for offset, _n, _size in idx["blocks"]:
        got.extend(
            read_avro_block(p, offset, idx["codec"], idx["schema"], idx["sync"])
        )
    assert got == recs


def test_spark_schema_mapping():
    assert spark_schema_of(SCHEMA) == (
        "id bigint, name string, note string, flag boolean, "
        "score double, blob binary, vec array<double>"
    )
    # complex types map through (round 12): map/enum/fixed
    assert spark_schema_of(
        {
            "type": "record",
            "name": "x",
            "fields": [
                {"name": "m", "type": {"type": "map", "values": "int"}},
                {
                    "name": "e",
                    "type": {
                        "type": "enum", "name": "E", "symbols": ["a"]
                    },
                },
                {
                    "name": "f",
                    "type": {"type": "fixed", "name": "F", "size": 4},
                },
            ],
        }
    ) == "m map<string,int>, e string, f binary"
    # general (multi-branch non-null) unions stay out of scope
    with pytest.raises(NotImplementedError):
        spark_schema_of(
            {
                "type": "record",
                "name": "x",
                "fields": [{"name": "u", "type": ["int", "string"]}],
            }
        )


def test_spark_datasource_block_per_partition(spark, tmp_path):
    """Small files plan byte-derived spans (r14: one span per file
    under the span byte target instead of one per block) while rows
    stay complete and exact — no loss/dup at block boundaries inside
    a span, nullable union -> SQL NULL."""
    root = str(tmp_path / "avro")
    os.makedirs(root)
    recs = _recs(120)
    for i, codec in enumerate(["null", "deflate"]):
        chunk = recs[i * 60 : (i + 1) * 60]
        data = encode_avro(
            chunk, SCHEMA, codec=codec, block_records=20,
            sync=bytes([i]) * 16,
        )
        open(os.path.join(root, f"p{i}.avro"), "wb").write(data)
    register_avro_source(spark)
    df = spark.read.format("mimr_avro").option("path", root).load()
    assert df.rdd.getNumPartitions() == 2  # 1 span per tiny file
    rows = df.orderBy("id").collect()
    assert len(rows) == 120
    assert [r["id"] for r in rows] == list(range(120))
    for r in rows:
        want = _recs(int(r["id"]) + 1)[-1]
        assert r["name"] == want["name"]
        assert r["note"] == want["note"]
        assert r["flag"] == want["flag"]
        assert abs(r["score"] - want["score"]) < 1e-12
        assert bytes(r["blob"]) == want["blob"]
        assert list(r["vec"]) == want["vec"]


def test_write_avro_sink_roundtrip(spark, tmp_path):
    """Distributed sink → mimr_avro source round trip: N partitions →
    N container files written executor-side, every value (nullable
    union, binary, array, double) byte-exact back through the scan."""
    from pyspark.sql import functions as F

    from meta_iterative_mapreduce_spark.sources.avro_ocf import write_avro

    out = str(tmp_path / "sink")
    df = (
        spark.range(500)
        .repartition(4)
        .select(
            F.col("id"),
            F.concat(F.lit("n"), F.col("id")).alias("name"),
            F.when(F.col("id") % 3 == 0, None)
            .otherwise(F.concat(F.lit("x"), F.col("id")))
            .alias("note"),
            (F.col("id") % 2 == 0).alias("flag"),
            (F.col("id") / 7.0).alias("score"),
            F.encode(F.concat(F.lit("b"), F.col("id")), "utf-8").alias(
                "blob"
            ),
            F.array((F.col("id") * 1.5), (-F.col("id") * 0.25)).alias("vec"),
        )
    )
    n = write_avro(df, out, codec="deflate", block_records=64)
    assert n == 500
    files = [f for f in os.listdir(out) if f.endswith(".avro")]
    assert len(files) == 4  # one container per input partition
    register_avro_source(spark)
    back = spark.read.format("mimr_avro").option("path", out).load()
    got = {r["id"]: r for r in back.collect()}
    assert len(got) == 500
    for i in (0, 3, 7, 499):
        r = got[i]
        assert r["name"] == f"n{i}"
        assert r["note"] == (None if i % 3 == 0 else f"x{i}")
        assert r["flag"] == (i % 2 == 0)
        assert abs(r["score"] - i / 7.0) < 1e-12
        assert bytes(r["blob"]) == f"b{i}".encode()
        assert list(r["vec"]) == [i * 1.5, -i * 0.25]


# ---------------------------------------------------------- property tests

from hypothesis import given, settings  # noqa: E402
from hypothesis import strategies as st  # noqa: E402

_REC = st.fixed_dictionaries(
    {
        "id": st.integers(min_value=-(2**63), max_value=2**63 - 1),
        "name": st.text(max_size=40),  # full unicode, incl. surrogates-free
        "note": st.one_of(st.none(), st.text(max_size=20)),
        "flag": st.booleans(),
        "score": st.floats(allow_nan=False, width=64),
        "blob": st.binary(max_size=64),
        "vec": st.lists(
            st.floats(allow_nan=False, width=64), max_size=8
        ),
    }
)


@settings(max_examples=150, deadline=None)
@given(
    recs=st.lists(_REC, max_size=40),
    codec=st.sampled_from(["null", "deflate"]),
    block=st.integers(min_value=1, max_value=7),
)
def test_property_roundtrip_arbitrary_records(recs, codec, block):
    """Hypothesis hunts the varint/union/array/IEEE edge cases a
    hand-picked fixture misses: extreme int64s, empty and unicode
    strings, empty blobs, signed zero / subnormal doubles, empty
    arrays, null unions, 1-record blocks — encode->decode must be
    EXACT for every generated corpus under both codecs."""
    data = encode_avro(recs, SCHEMA, codec=codec, block_records=block)
    schema, got = read_avro(data)
    assert schema == SCHEMA
    assert len(got) == len(recs)
    for g, w in zip(got, recs):
        for k in ("id", "name", "note", "flag", "blob"):
            assert g[k] == w[k], k
        # IEEE doubles round-trip bit-exactly; compare via repr to
        # keep -0.0 vs 0.0 distinct
        assert repr(g["score"]) == repr(w["score"])
        assert [repr(x) for x in g["vec"]] == [repr(x) for x in w["vec"]]


@settings(max_examples=80, deadline=None)
@given(
    n=st.integers(min_value=0, max_value=120),
    block=st.integers(min_value=1, max_value=50),
)
def test_property_block_index_partitions_exactly(n, block, tmp_path_factory):
    """For any corpus size x block size, the block index covers every
    record exactly once and every block decodes independently to the
    sequential read — the splittability invariant the Spark source
    relies on."""
    recs = _recs(n)
    p = str(tmp_path_factory.mktemp("avro") / "t.avro")
    open(p, "wb").write(
        encode_avro(recs, SCHEMA, codec="deflate", block_records=block)
    )
    idx = index_avro_blocks(p)
    assert len(idx["blocks"]) == -(-n // block) if n else not idx["blocks"]
    assert sum(b[1] for b in idx["blocks"]) == n
    got = []
    for offset, _n, _size in idx["blocks"]:
        got.extend(
            read_avro_block(p, offset, idx["codec"], idx["schema"], idx["sync"])
        )
    assert got == recs


def test_reader_schema_resolution_skip_default_promote():
    """Spec §Schema Resolution: dropped writer fields are skipped,
    reader-only fields take their defaults, int->long promotion
    applies, and a missing default or an illegal narrowing raises."""
    from meta_iterative_mapreduce_spark.sources.avro_ocf import (
        _resolve_schemas,
    )

    writer = {
        "type": "record",
        "name": "r",
        "fields": [
            {"name": "a", "type": "int"},
            {"name": "big", "type": "string"},
            {"name": "u", "type": ["null", "string"]},
        ],
    }
    recs = [
        {"a": i, "big": "x" * 100, "u": None if i % 2 else f"u{i}"}
        for i in range(25)
    ]
    data = encode_avro(recs, writer, codec="deflate", block_records=10)
    reader = {
        "type": "record",
        "name": "r",
        "fields": [
            {"name": "a", "type": "long"},       # int -> long promotion
            {"name": "u", "type": ["null", "string"]},
            {"name": "extra", "type": "string", "default": "dflt"},
        ],
    }
    schema, got = read_avro(data, reader_schema=reader)
    assert schema == reader
    assert got == [
        {"a": i, "u": None if i % 2 else f"u{i}", "extra": "dflt"}
        for i in range(25)
    ]
    # reader-only field without a default: per spec, an error
    bad = {
        "type": "record",
        "name": "r",
        "fields": [{"name": "nope", "type": "string"}],
    }
    with pytest.raises(ValueError, match="declares no default"):
        read_avro(data, reader_schema=bad)
    # illegal narrowing (string -> long) is rejected
    narrow = {
        "type": "record",
        "name": "r",
        "fields": [{"name": "big", "type": "long"}],
    }
    with pytest.raises(ValueError, match="cannot resolve"):
        read_avro(data, reader_schema=narrow)


def test_reader_schema_through_spark_source(spark, tmp_path):
    """readerSchema option: the scan's declared schema IS the reader
    schema; projection skip-decodes dropped fields across blocks and
    files; unresolvable pairs fail at plan time."""
    import json as _json

    from pyspark.sql import functions as F  # noqa: F401

    root = str(tmp_path / "avro")
    os.makedirs(root)
    recs = _recs(90)
    for i in range(3):
        open(os.path.join(root, f"p{i}.avro"), "wb").write(
            encode_avro(
                recs[i * 30 : (i + 1) * 30], SCHEMA,
                codec="deflate" if i % 2 else "null",
                block_records=10, sync=bytes([i]) * 16,
            )
        )
    reader = {
        "type": "record",
        "name": "r",
        "fields": [
            {"name": "id", "type": "long"},
            {"name": "note", "type": ["null", "string"]},
            {"name": "tag", "type": "string", "default": "T"},
        ],
    }
    register_avro_source(spark)
    df = (
        spark.read.format("mimr_avro")
        .option("path", root)
        .option("readerSchema", _json.dumps(reader))
        .load()
    )
    assert df.columns == ["id", "note", "tag"]
    # byte-derived spans (r14): tiny files plan one span each
    assert df.rdd.getNumPartitions() == 3
    rows = df.orderBy("id").collect()
    assert [r["id"] for r in rows] == list(range(90))
    assert all(r["tag"] == "T" for r in rows)
    assert rows[3]["note"] is None and rows[4]["note"] == "x4"
    # plan-time failure on an unresolvable reader
    bad = {
        "type": "record",
        "name": "r",
        "fields": [{"name": "name", "type": "long"}],
    }
    with pytest.raises(Exception, match="cannot resolve"):
        (
            spark.read.format("mimr_avro")
            .option("path", root)
            .option("readerSchema", _json.dumps(bad))
            .load()
            .collect()
        )


# ------------------------------------------------------ logical types

_LOGICAL_SCHEMA = {
    "type": "record",
    "name": "ev",
    "fields": [
        {"name": "k", "type": "long"},
        {"name": "d", "type": {"type": "int", "logicalType": "date"}},
        {
            "name": "ts",
            "type": ["null", {"type": "long", "logicalType": "timestamp-micros"}],
        },
        {
            "name": "ts_ms",
            "type": {"type": "long", "logicalType": "timestamp-millis"},
        },
        {
            "name": "amt",
            "type": {
                "type": "bytes",
                "logicalType": "decimal",
                "precision": 12,
                "scale": 2,
            },
        },
        {"name": "u", "type": {"type": "string", "logicalType": "uuid"}},
    ],
}


def _logical_rows():
    import datetime
    from decimal import Decimal

    return [
        {
            "k": 1,
            "d": datetime.date(1995, 6, 17),
            "ts": datetime.datetime(2001, 2, 3, 4, 5, 6, 789012),
            "ts_ms": datetime.datetime(1999, 12, 31, 23, 59, 59, 125000),
            "amt": Decimal("12345.67"),
            "u": "0f8fad5b-d9cb-469f-a165-70867728950e",
        },
        {
            "k": 2,
            "d": datetime.date(1969, 12, 31),  # pre-epoch: negative days
            "ts": None,
            "ts_ms": datetime.datetime(1970, 1, 1, 0, 0, 0, 1000),
            "amt": Decimal("-0.03"),  # negative two's-complement bytes
            "u": "00000000-0000-0000-0000-000000000000",
        },
    ]


@pytest.mark.parametrize("codec", ["null", "deflate"])
def test_logical_types_roundtrip(codec):
    data = encode_avro(_logical_rows(), _LOGICAL_SCHEMA, codec=codec)
    schema, got = read_avro(data)
    assert got == _logical_rows()
    assert schema == _LOGICAL_SCHEMA


def test_logical_spark_schema_and_scan(spark, tmp_path):
    from meta_iterative_mapreduce_spark.sources.avro_ocf import (
        register_avro_source,
        spark_schema_of,
    )

    ddl = spark_schema_of(_LOGICAL_SCHEMA)
    assert "d date" in ddl and "ts timestamp_ntz" in ddl
    assert "amt decimal(12,2)" in ddl and "u string" in ddl
    p = tmp_path / "ev.avro"
    p.write_bytes(encode_avro(_logical_rows(), _LOGICAL_SCHEMA))
    register_avro_source(spark)
    df = (
        spark.read.format("mimr_avro")
        .option("path", str(p))
        .load()
        .orderBy("k")
    )
    rows = df.collect()
    import datetime
    from decimal import Decimal

    assert rows[0]["d"] == datetime.date(1995, 6, 17)
    assert rows[0]["ts"] == datetime.datetime(2001, 2, 3, 4, 5, 6, 789012)
    assert rows[0]["amt"] == Decimal("12345.67")
    assert rows[1]["d"] == datetime.date(1969, 12, 31)
    assert rows[1]["ts"] is None
    assert rows[1]["amt"] == Decimal("-0.03")


def test_logical_sink_roundtrip(spark, tmp_path):
    from pyspark.sql import functions as F

    from meta_iterative_mapreduce_spark.sources.avro_ocf import (
        register_avro_source,
        write_avro,
    )

    df = spark.range(0, 20).select(
        F.col("id").alias("k"),
        F.date_add(F.lit("1995-01-01"), F.col("id").cast("int")).alias("d"),
        F.to_timestamp_ntz(F.lit("2001-02-03 04:05:06.789")).alias("ts"),
        (F.col("id") * 1.5).cast("decimal(10,2)").alias("amt"),
    )
    out = str(tmp_path / "sink")
    assert write_avro(df, out) == 20
    register_avro_source(spark)
    back = spark.read.format("mimr_avro").option("path", out).load()
    assert dict(back.dtypes)["d"] == "date"
    assert dict(back.dtypes)["ts"] == "timestamp_ntz"
    assert dict(back.dtypes)["amt"] == "decimal(10,2)"
    a = sorted(map(tuple, df.collect()))
    b = sorted(map(tuple, back.collect()))
    assert a == b


def test_logical_resolution_skip_and_mismatch():
    data = encode_avro(_logical_rows(), _LOGICAL_SCHEMA)
    reader = {
        "type": "record",
        "name": "ev",
        "fields": [  # drops d/ts_ms/amt/u -> logical values SKIPPED
            {"name": "k", "type": "long"},
            {
                "name": "ts",
                "type": [
                    "null",
                    {"type": "long", "logicalType": "timestamp-micros"},
                ],
            },
        ],
    }
    _, got = read_avro(data, reader)
    assert [r["k"] for r in got] == [1, 2]
    assert got[0]["ts"] is not None and got[1]["ts"] is None
    # a logical field read as its raw base type must FAIL, not decode
    bad = {
        "type": "record",
        "name": "ev",
        "fields": [
            {"name": "k", "type": "long"},
            {"name": "d", "type": "int"},
        ],
    }
    with pytest.raises(ValueError, match="logical types must match"):
        read_avro(data, bad)


def test_unknown_logical_type_falls_back_to_base():
    schema = {
        "type": "record",
        "name": "r",
        "fields": [
            {
                "name": "x",
                "type": {"type": "string", "logicalType": "made-up-thing"},
            }
        ],
    }
    data = encode_avro([{"x": "hello"}], schema)
    _, got = read_avro(data)
    assert got == [{"x": "hello"}]  # spec: unknown logicals = base type


def test_timestamp_micros_encodes_utc_instant_not_wall_clock():
    """ADVICE r11: the spec defines timestamp-millis/micros as UTC
    INSTANTS — a tz-AWARE datetime must convert to UTC before the
    epoch delta, so the same instant encodes identically regardless
    of the writer's zone; naive datetimes stay the NTZ wall-clock
    path."""
    import datetime

    from meta_iterative_mapreduce_spark.sources.avro_ocf import (
        _logical_decode,
        _logical_encode,
    )

    t_micros = {"type": "long", "logicalType": "timestamp-micros"}
    t_millis = {"type": "long", "logicalType": "timestamp-millis"}
    utc = datetime.timezone.utc
    instant = datetime.datetime(2024, 6, 1, 12, 0, 0, 500, tzinfo=utc)
    east = instant.astimezone(datetime.timezone(datetime.timedelta(hours=9)))
    west = instant.astimezone(datetime.timezone(datetime.timedelta(hours=-7)))
    want = int(
        (
            instant.replace(tzinfo=None) - datetime.datetime(1970, 1, 1)
        ).total_seconds()
        * 1_000_000
    ) + 0  # microsecond field folded in below
    got_utc = _logical_encode(t_micros, instant)
    assert _logical_encode(t_micros, east) == got_utc
    assert _logical_encode(t_micros, west) == got_utc
    assert got_utc % 1_000_000 == 500  # the .000500s survived
    assert abs(got_utc - want) < 1_000_000
    assert _logical_encode(t_millis, east) == _logical_encode(
        t_millis, west
    ) == got_utc // 1000
    # naive datetime: wall clock as-is (the TimestampNTZ contract)
    naive = datetime.datetime(2024, 6, 1, 12, 0, 0, 500)
    assert _logical_encode(t_micros, naive) == got_utc
    # decode round-trips to the naive UTC wall clock
    assert _logical_decode(t_micros, got_utc) == naive


def test_map_enum_fixed_roundtrip_all_codecs():
    """Complex-type codec (round 12): map<string,long> as
    count-prefixed key+value blocks, enum as a varint symbol index,
    fixed as raw declared-size bytes — round-tripping under every
    codec, with reader-schema projection SKIPPING the complex fields
    without decoding them."""
    import io as _io

    from meta_iterative_mapreduce_spark.sources import avro_ocf as A

    schema = {
        "type": "record",
        "name": "r",
        "fields": [
            {"name": "k", "type": "long"},
            {"name": "m", "type": {"type": "map", "values": "long"}},
            {
                "name": "e",
                "type": {
                    "type": "enum",
                    "name": "E",
                    "symbols": ["a", "b", "c"],
                },
            },
            {
                "name": "fx",
                "type": {"type": "fixed", "name": "F8", "size": 8},
            },
        ],
    }
    recs = [
        {
            "k": i,
            "m": {} if i % 10 == 0 else {"x": i, "y": 2 * i},
            "e": ["a", "b", "c"][i % 3],
            "fx": i.to_bytes(8, "big"),
        }
        for i in range(200)
    ]
    for codec in ("null", "deflate", "snappy"):
        data = A.encode_avro(recs, schema, codec=codec, block_records=32)
        _, got = A.read_avro(data)
        assert got == recs
    reader = {
        "type": "record",
        "name": "r",
        "fields": [
            {"name": "k", "type": "long"},
            {
                "name": "e",
                "type": {
                    "type": "enum",
                    "name": "E",
                    "symbols": ["a", "b", "c"],
                },
            },
        ],
    }
    _, got2 = A.read_avro(
        A.encode_avro(recs, schema, codec="deflate"), reader_schema=reader
    )
    assert got2 == [{"k": r["k"], "e": r["e"]} for r in recs]
    # guards: out-of-range enum index, wrong fixed size, unknown symbol
    import pytest as _pytest

    with _pytest.raises(ValueError, match="symbols"):
        A.encode_avro(
            [{"k": 1, "m": {}, "e": "zzz", "fx": b"\0" * 8}], schema
        )
    with _pytest.raises(ValueError, match="fixed"):
        A.encode_avro(
            [{"k": 1, "m": {}, "e": "a", "fx": b"\0" * 3}], schema
        )
    # complex reader/writer mismatch fails at PLAN time
    bad_reader = {
        "type": "record",
        "name": "r",
        "fields": [
            {"name": "m", "type": {"type": "map", "values": "string"}}
        ],
    }
    with _pytest.raises(ValueError, match="cannot resolve"):
        A._resolve_schemas(schema, bad_reader)
    # map entries survive a negative-count block (spec: size follows)
    buf = bytearray()
    A._write_long(buf, -2)  # 2 entries, size-prefixed form
    entries = bytearray()
    A._write_value(entries, "string", "a")
    A._write_value(entries, "long", 7)
    A._write_value(entries, "string", "b")
    A._write_value(entries, "long", 9)
    A._write_long(buf, len(entries))
    buf += entries
    A._write_long(buf, 0)
    got3 = A._read_value(
        _io.BytesIO(bytes(buf)), {"type": "map", "values": "long"}
    )
    assert got3 == {"a": 7, "b": 9}


def test_modern_codecs_roundtrip():
    """zstandard / bzip2 / xz blocks roundtrip (VERDICT r12 item 5 —
    zstd is the codec real Kafka OCF replays hit first). zstd rides
    pyarrow's bundled libzstd; the frame header's Frame_Content_Size
    feeds the one-shot decompressor."""
    import meta_iterative_mapreduce_spark.sources.avro_ocf as A

    schema = {
        "type": "record",
        "name": "R",
        "fields": [
            {"name": "a", "type": "long"},
            {"name": "s", "type": "string"},
        ],
    }
    recs = [{"a": i, "s": f"zstd-row-{i}" * 3} for i in range(257)]
    for codec in ("zstandard", "bzip2", "xz"):
        blob = A.encode_avro(recs, schema, codec=codec, block_records=64)
        got_schema, got = A.read_avro(blob)
        assert got == recs, codec
        assert got_schema == schema
    # corrupt zstd magic fails loudly, not silently
    blob = A.encode_avro(recs[:4], schema, codec="zstandard")
    with pytest.raises(ValueError, match="zstd"):
        A._zstd_frame_content_size(b"\x00\x00\x00\x00\x00\x00")


def test_recursive_resolution_promotions_and_unions():
    """Spec schema resolution beyond flat records (VERDICT r12 item
    5): within-array and within-map numeric promotion, string↔bytes
    promotion, multi-branch writer unions resolved per branch against
    multi-branch reader unions, enum default substitution for a
    reader-absent symbol, nested-record field skip + default, and the
    spec's LAZY union-branch error (only the value that takes an
    unresolvable branch raises)."""
    import meta_iterative_mapreduce_spark.sources.avro_ocf as A

    w = {
        "type": "record",
        "name": "R",
        "fields": [
            {"name": "id", "type": "int"},
            {"name": "tags", "type": {"type": "array", "items": "int"}},
            {"name": "props", "type": {"type": "map", "values": "long"}},
            {"name": "u", "type": ["null", "int", "string"]},
            {
                "name": "e",
                "type": {
                    "type": "enum",
                    "name": "E",
                    "symbols": ["A", "B", "C"],
                },
            },
            {
                "name": "nest",
                "type": {
                    "type": "record",
                    "name": "N",
                    "fields": [
                        {"name": "x", "type": "int"},
                        {"name": "drop", "type": "string"},
                    ],
                },
            },
            {"name": "raw", "type": "bytes"},
        ],
    }
    r = {
        "type": "record",
        "name": "R",
        "fields": [
            {"name": "id", "type": "long"},
            {
                "name": "tags",
                "type": {"type": "array", "items": "double"},
            },
            {"name": "props", "type": {"type": "map", "values": "double"}},
            {"name": "u", "type": ["null", "long", "bytes"]},
            {
                "name": "e",
                "type": {
                    "type": "enum",
                    "name": "E",
                    "symbols": ["A", "B"],
                    "default": "A",
                },
            },
            {
                "name": "nest",
                "type": {
                    "type": "record",
                    "name": "N",
                    "fields": [
                        {"name": "x", "type": "double"},
                        {"name": "y", "type": "long", "default": 9},
                    ],
                },
            },
            {"name": "raw", "type": "string"},
            {"name": "extra", "type": "string", "default": "dflt"},
        ],
    }
    recs = [
        {"id": 1, "tags": [1, 2], "props": {"k": 10}, "u": None,
         "e": "A", "nest": {"x": 5, "drop": "zz"}, "raw": b"hi"},
        {"id": 2, "tags": [], "props": {}, "u": 7,
         "e": "C", "nest": {"x": 6, "drop": "q"}, "raw": b"yo"},
        {"id": 3, "tags": [3], "props": {"m": 1, "n": 2}, "u": "s",
         "e": "B", "nest": {"x": 7, "drop": "w"}, "raw": b"ok"},
    ]
    blob = A.encode_avro(recs, w, codec="zstandard")
    _, out = A.read_avro(blob, reader_schema=r)
    assert out[0]["tags"] == [1.0, 2.0]
    assert all(isinstance(x, float) for x in out[0]["tags"])
    assert out[2]["props"] == {"m": 1.0, "n": 2.0}
    assert out[1]["e"] == "A"          # C -> reader enum default
    assert out[1]["u"] == 7            # int branch -> long branch
    assert out[2]["u"] == b"s"         # string branch -> bytes branch
    assert out[0]["nest"] == {"x": 5.0, "y": 9}  # skip + default
    assert out[0]["raw"] == "hi"       # bytes -> string promotion
    assert out[0]["extra"] == "dflt"
    # identity read unchanged by the writer-union upgrade
    _, same = A.read_avro(blob)
    assert same == recs
    # lazy union error: only a value TAKING the dead branch raises
    r_narrow = {
        "type": "record",
        "name": "R",
        "fields": [{"name": "u", "type": ["null", "long"]}],
    }
    ok_blob = A.encode_avro(
        [{"id": 1, "tags": [], "props": {}, "u": 5, "e": "A",
          "nest": {"x": 1, "drop": "d"}, "raw": b"x"}], w
    )
    _, got = A.read_avro(ok_blob, reader_schema=r_narrow)
    assert got == [{"u": 5}]
    with pytest.raises(ValueError, match="unresolvable union branch"):
        A.read_avro(blob, reader_schema=r_narrow)  # rec 3 takes string


def test_span_partitioning_groups_blocks(spark, tmp_path):
    """Span planning is byte-derived (r14): span count per file =
    clamp(ceil(file_bytes / MIMR_AVRO_SPAN_BYTES), 1, 64), each span a
    group of consecutive blocks (one seek + sequential decode), and
    rows stay complete and exact across span seams — per-block tasks
    at 100-record block sizes drowned the sf0.1 scan in scheduler
    overhead (r13), and block-count-derived spans kept ~18 KB tasks
    (r14)."""
    import math
    import os as _os

    import meta_iterative_mapreduce_spark.sources.avro_ocf as A

    schema = {
        "type": "record",
        "name": "R",
        "fields": [
            {"name": "a", "type": "long"},
            {"name": "pad", "type": "string"},
        ],
    }
    # ~200-byte padded records so the file spans several 128 KiB span
    # targets and the byte-derived planner splits it
    recs = [{"a": i, "pad": "x" * 200} for i in range(5000)]
    root = tmp_path / "spans"
    root.mkdir()
    path = root / "part-0.avro"
    path.write_bytes(
        A.encode_avro(recs, schema, codec="null", block_records=10)
    )
    A.register_avro_source(spark)
    df = spark.read.format("mimr_avro").option("path", str(root)).load()
    nparts = df.rdd.getNumPartitions()
    span_bytes = int(_os.environ.get("MIMR_AVRO_SPAN_BYTES", 128 * 1024))
    n_spans = min(64, max(1, math.ceil(_os.path.getsize(path) / span_bytes)))
    assert 1 < n_spans <= 64, n_spans  # the fixture really is multi-span
    n_blocks = 500  # 5000 records / block_records=10
    per = math.ceil(n_blocks / n_spans)
    expect = math.ceil(n_blocks / per)  # realized spans after block rounding
    assert nparts == expect, (nparts, expect)
    got = sorted(r["a"] for r in df.collect())
    assert got == list(range(5000))  # nothing lost at span seams
