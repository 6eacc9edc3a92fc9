"""ISO BMFF indexer spec-level guarantees: stsc run expansion, chunk
offset arithmetic, co64, corrupt-table detection, honest guards."""

from __future__ import annotations

import struct

import pytest

from meta_iterative_mapreduce_spark.operators.mp4 import (
    _box,
    encode_mp4_samples,
    parse_mp4_index,
    sample_mp4_payloads,
)


def _mux(sizes, spc=3):
    samples = [bytes([i % 251] * s) for i, s in enumerate(sizes)]
    return samples, encode_mp4_samples(samples, samples_per_chunk=spc)


def test_index_round_trip_ragged_chunks():
    # 7 samples at 3 per chunk: chunks of 3,3,1 → stsc carries TWO runs
    samples, mp4 = _mux([5, 9, 1, 4, 4, 4, 30])
    idx = parse_mp4_index(mp4)
    assert [s["size"] for s in idx] == [5, 9, 1, 4, 4, 4, 30]
    got = [mp4[s["offset"] : s["offset"] + s["size"]] for s in idx]
    assert got == samples


def test_sampling_extracts_every_kth():
    samples, mp4 = _mux(list(range(1, 12)))
    assert sample_mp4_payloads(mp4, 2) == samples[::2]
    assert sample_mp4_payloads(mp4, 5) == samples[::5]


def test_single_sample_and_one_per_chunk():
    for spc in (1, 3):
        samples, mp4 = _mux([17], spc=spc)
        idx = parse_mp4_index(mp4)
        assert len(idx) == 1 and idx[0]["size"] == 17


def test_corrupt_stsz_count_detected():
    _, mp4 = _mux([4, 4, 4, 4])
    # bump stsz's declared sample count: tables now disagree
    at = mp4.find(b"stsz") + 4 + 4 + 4  # kind + fullbox header + uniform
    bad = bytearray(mp4)
    (n,) = struct.unpack(">I", bad[at : at + 4])
    struct.pack_into(">I", bad, at, n + 1)
    with pytest.raises(ValueError):
        parse_mp4_index(bytes(bad))


def test_offset_beyond_file_detected():
    _, mp4 = _mux([4, 4, 4])
    at = mp4.find(b"stco") + 4 + 4 + 4  # kind + fullbox + entry count
    bad = bytearray(mp4)
    struct.pack_into(">I", bad, at, len(mp4) + 100)
    with pytest.raises(ValueError, match="beyond"):
        parse_mp4_index(bytes(bad))


def test_truncated_guards():
    with pytest.raises(ValueError):
        parse_mp4_index(_box(b"ftyp", b"isom"))
    _, mp4 = _mux([4, 4])
    with pytest.raises(ValueError):
        parse_mp4_index(mp4[:-6])


def test_fragmented_round_trip_and_defaults():
    from meta_iterative_mapreduce_spark.operators.mp4 import (
        encode_mp4_fragments,
    )

    frags = [[b"aaa", b"bb"], [b"cccc"], [b"d", b"ee", b"fff"]]
    mp4 = encode_mp4_fragments(frags)
    idx = parse_mp4_index(mp4)
    flat = [s for f in frags for s in f]
    assert [s["size"] for s in idx] == [len(s) for s in flat]
    got = [mp4[s["offset"] : s["offset"] + s["size"]] for s in idx]
    assert got == flat
    # durations inherit from the trex default (no per-sample, no tfhd)
    assert all(s["duration"] == 1 for s in idx)
    assert sample_mp4_payloads(mp4, 2) == flat[::2]


def test_fragmented_offset_beyond_file_detected():
    from meta_iterative_mapreduce_spark.operators.mp4 import (
        encode_mp4_fragments,
    )

    mp4 = bytearray(encode_mp4_fragments([[b"aaaa", b"bbbb"]]))
    at = mp4.find(b"trun") + 4 + 4 + 4  # kind + fullbox + count
    struct.pack_into(">i", mp4, at, len(mp4) + 99)
    with pytest.raises(ValueError, match="beyond"):
        parse_mp4_index(bytes(mp4))


def test_struct_error_normalized_to_value_error():
    """A box tree that is SIZE-consistent but whose stsz body ends
    mid-field at EOF makes the fixed-header unpack see a short
    buffer — struct.error must surface as the documented ValueError."""
    stsz_short = _box(b"stsz", b"\x00\x00\x00\x00" + b"\x00" * 5)
    mp4 = _box(b"ftyp", b"isom") + _box(
        b"moov",
        _box(
            b"trak",
            _box(b"mdia", _box(b"minf", _box(b"stbl", stsz_short))),
        ),
    )
    with pytest.raises(ValueError, match="truncated MP4 table"):
        parse_mp4_index(mp4)
