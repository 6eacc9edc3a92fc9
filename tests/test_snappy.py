"""Pure-stdlib snappy raw-block codec (sources/snappy_codec.py) and
its Avro OCF integration (codec 'snappy' = compressed block + 4-byte
big-endian CRC32 of the uncompressed data, per the Avro spec)."""

from __future__ import annotations

import io
import os
import random
import struct
import zlib

import pytest

from meta_iterative_mapreduce_spark.sources.snappy_codec import (
    snappy_compress,
    snappy_decompress,
)


def test_roundtrip_matrix():
    random.seed(42)
    cases = [
        b"",
        b"x",
        b"abcd",
        b"ab" * 50_000,  # overlapping-run territory
        b"The quick brown fox jumps over the lazy dog. " * 2_000,
        os.urandom(70_000),  # incompressible
        bytes(random.choices(range(4), k=120_000)),  # highly repetitive
        bytes(range(256)) * 300,
        b"\x00" * 100_000,  # degenerate single-byte run
    ]
    for c in cases:
        z = snappy_compress(c)
        assert snappy_decompress(z) == c


def test_compression_actually_compresses():
    data = b"session=abc123;path=/api/v1/items;status=200\n" * 5_000
    z = snappy_compress(data)
    assert len(z) < len(data) // 5


def test_decodes_hand_written_elements():
    """Decoder correctness independent of OUR compressor: streams
    hand-assembled from the public format description, covering
    copy1 / copy2 / copy4, an overlapping run, and a multi-byte
    literal length."""
    # literal "snap" then copy1(offset=4, len=4) => "snapsnap"
    s = bytearray()
    s.append(8)  # uvarint 8 = uncompressed length
    s.append((4 - 1) << 2)  # literal, len 4
    s += b"snap"
    s.append(1 | ((4 - 4) << 2) | ((4 >> 8) << 5))  # copy1 len4 off4
    s.append(4 & 0xFF)
    assert snappy_decompress(bytes(s)) == b"snapsnap"
    # copy2 form of the same thing
    s = bytearray([8, (4 - 1) << 2]) + b"snap"
    s.append(2 | ((4 - 1) << 2))
    s += struct.pack("<H", 4)
    assert snappy_decompress(bytes(s)) == b"snapsnap"
    # copy4 form
    s = bytearray([8, (4 - 1) << 2]) + b"snap"
    s.append(3 | ((4 - 1) << 2))
    s += struct.pack("<I", 4)
    assert snappy_decompress(bytes(s)) == b"snapsnap"
    # overlapping run: literal "ab" + copy(offset=2, len=6) => "abababab"
    s = bytearray([8, (2 - 1) << 2]) + b"ab"
    s.append(2 | ((6 - 1) << 2))
    s += struct.pack("<H", 2)
    assert snappy_decompress(bytes(s)) == b"abababab"
    # 61-tag literal: length-1 in ONE extra byte
    body = bytes(range(256)) * 4  # 1024 bytes -> needs 2-byte form
    s = bytearray()
    s.append(0x80)  # uvarint 1024 low byte
    s.append(0x08)
    s.append(61 << 2)
    s += struct.pack("<H", len(body) - 1)
    s += body
    assert snappy_decompress(bytes(s)) == body


def test_corrupt_streams_raise():
    good = snappy_compress(b"hello world " * 100)
    # truncation fails either mid-element ("truncated") or, when the
    # cut lands on an element boundary, at the final length check
    with pytest.raises(ValueError):
        snappy_decompress(good[: len(good) // 2])
    # declared length disagreeing with the elements
    z = bytearray(good)
    z[0] ^= 0x01
    with pytest.raises(ValueError):
        snappy_decompress(bytes(z))
    # copy reaching before the start of output
    bad = bytearray([4, (1 - 1) << 2]) + b"a"
    bad.append(2 | ((3 - 1) << 2))
    bad += struct.pack("<H", 9)  # offset 9 > 1 byte produced
    with pytest.raises(ValueError, match="offset"):
        snappy_decompress(bytes(bad))


def _first_block_payload(tmp_path, data: bytes) -> tuple[int, int]:
    """(payload_offset, payload_size) of the first data block, via
    index_avro_blocks (whose offsets address the count varint) plus a
    re-read of the two header varints."""
    from meta_iterative_mapreduce_spark.sources import avro_ocf as A

    path = os.path.join(str(tmp_path), "probe.avro")
    with open(path, "wb") as f:
        f.write(data)
    idx = A.index_avro_blocks(path)
    boff, _n, size = idx["blocks"][0]
    buf = io.BytesIO(data)
    buf.seek(boff)
    A._read_long(buf)
    A._read_long(buf)
    return buf.tell(), size


def test_avro_snappy_block_roundtrip_and_crc(tmp_path):
    from meta_iterative_mapreduce_spark.sources import avro_ocf as A

    schema = {
        "type": "record",
        "name": "r",
        "fields": [
            {"name": "k", "type": "long"},
            {"name": "s", "type": ["null", "string"]},
        ],
    }
    recs = [
        {"k": i, "s": None if i % 7 == 0 else f"value-{i % 13}"}
        for i in range(500)
    ]
    data = A.encode_avro(recs, schema, codec="snappy", block_records=64)
    _, got = A.read_avro(data)
    assert got == recs
    # snappy genuinely engaged: smaller than the null-codec encoding
    plain = A.encode_avro(recs, schema, codec="null", block_records=64)
    assert len(data) < len(plain)

    # corrupt one payload byte INSIDE the first block: CRC must catch
    # it (locate the first block via the zero-payload-I/O index)
    off, size = _first_block_payload(tmp_path, data)
    bad = bytearray(data)
    bad[off + 5] ^= 0xFF
    with pytest.raises(ValueError):
        A.read_avro(bytes(bad))

    # flip only the stored CRC: decompression succeeds, CRC check fires
    bad2 = bytearray(data)
    bad2[off + size - 1] ^= 0xFF
    with pytest.raises(ValueError, match="CRC"):
        A.read_avro(bytes(bad2))

    # truncated final block
    with pytest.raises(ValueError):
        A.read_avro(data[: len(data) - 8])


def test_avro_crc_is_big_endian_of_uncompressed(tmp_path):
    """Pin the framing itself: last 4 bytes of a snappy block = CRC32
    (big-endian) of the UNCOMPRESSED record bytes — the cross-reader
    compatibility contract."""
    from meta_iterative_mapreduce_spark.sources import avro_ocf as A

    schema = {
        "type": "record",
        "name": "r",
        "fields": [{"name": "k", "type": "long"}],
    }
    recs = [{"k": i} for i in range(10)]
    data = A.encode_avro(recs, schema, codec="snappy", block_records=100)
    off, size = _first_block_payload(tmp_path, data)
    payload = data[off : off + size]
    body, crc = payload[:-4], struct.unpack(">I", payload[-4:])[0]
    raw = snappy_decompress(body)
    assert zlib.crc32(raw) & 0xFFFFFFFF == crc
    # and the raw bytes are the varint-encoded records
    out = bytearray()
    for r in recs:
        A._write_value(out, schema, r)
    assert raw == bytes(out)


def test_roundtrip_property_hypothesis():
    """Property: decompress(compress(x)) == x for arbitrary bytes —
    including pathological repetition the example matrix can't
    enumerate."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    @settings(max_examples=300, deadline=None)
    @given(st.binary(max_size=4096))
    def prop(data):
        assert snappy_decompress(snappy_compress(data)) == data

    prop()


def test_roundtrip_property_structured_repetition():
    """Repetitive structures: short alphabets and tiled blocks drive
    the copy-emitting paths (copy1 vs copy2, chunked long matches,
    overlapping runs)."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    @settings(max_examples=150, deadline=None)
    @given(
        st.binary(min_size=1, max_size=64),
        st.integers(min_value=1, max_value=2000),
        st.binary(max_size=32),
    )
    def prop(tile, reps, tail):
        data = tile * reps + tail
        assert snappy_decompress(snappy_compress(data)) == data

    prop()
