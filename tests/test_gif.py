"""GIF codec spec-level guarantees the SQL oracle can't see: LZW
variable-width growth, dictionary reset, KwKwK, sub-block framing,
extension skipping, and honest scope guards."""

from __future__ import annotations

import struct

import numpy as np
import pytest

from meta_iterative_mapreduce_spark.operators.gif import (
    _lzw_decode,
    _lzw_encode,
    decode_gif_gray8,
    encode_gif_gray8,
)
from meta_iterative_mapreduce_spark.operators.multimodal import (
    decode_image_features,
)


def test_lzw_round_trip_shapes():
    import random

    rng = random.Random(11)
    for n in (1, 2, 255, 256, 4096, 20000):
        for kind in ("rand", "rep", "const"):
            if kind == "rand":
                data = bytes(rng.randrange(256) for _ in range(n))
            elif kind == "rep":
                data = (b"abcabcd" * (n // 7 + 1))[:n]
            else:
                data = b"\x42" * n
            enc = _lzw_encode(np.frombuffer(data, np.uint8), 8)
            assert _lzw_decode(enc, 8, n) == data


def test_lzw_kwkwk_case():
    # 'aaaa...' forces code == next free code immediately (KwKwK)
    data = b"\x01" * 50
    enc = _lzw_encode(np.frombuffer(data, np.uint8), 2)
    assert _lzw_decode(enc, 2, 50) == data
    # indices beyond the root table must be rejected, not mis-encoded
    with pytest.raises(ValueError, match="roots"):
        _lzw_encode(np.frombuffer(b"\x05", np.uint8), 2)


def test_lzw_dictionary_reset_at_4096():
    # enough distinct material to overflow the 12-bit table: encoder
    # must emit CLEAR and the decoder must follow the reset
    px = bytes((i * 7 + i // 300) % 256 for i in range(300 * 200))
    f = decode_gif_gray8(encode_gif_gray8(300, 200, px))
    assert f["pixels"].tobytes() == px


def test_gif_round_trip_and_mean():
    px = bytes([10, 20, 30, 40, 50, 60])
    f = decode_gif_gray8(encode_gif_gray8(3, 2, px))
    assert (f["width"], f["height"], f["n_pixels"]) == (3, 2, 6)
    assert f["mean_intensity"] == 35.0


def test_gif_extension_blocks_are_skipped():
    # splice a Graphic Control Extension between LSD+GCT and the image
    gif = bytearray(encode_gif_gray8(2, 2, bytes([1, 2, 3, 4])))
    insert_at = 13 + 3 * 256  # after header+LSD+GCT
    gce = b"\x21\xF9\x04\x00\x00\x00\x00\x00"
    gif[insert_at:insert_at] = gce
    f = decode_gif_gray8(bytes(gif))
    assert f["pixels"].tobytes() == bytes([1, 2, 3, 4])


def test_gif_corrupt_raises_valueerror():
    with pytest.raises(ValueError):
        decode_gif_gray8(b"GIF89a" + b"\x00" * 4)
    # truncated sub-blocks
    good = encode_gif_gray8(4, 4, bytes(range(16)))
    with pytest.raises(ValueError):
        decode_gif_gray8(good[:-5])


def test_gif_interlace_and_lct_guards():
    gif = bytearray(encode_gif_gray8(2, 2, bytes([1, 2, 3, 4])))
    desc_at = 13 + 3 * 256  # image separator 0x2C
    assert gif[desc_at] == 0x2C
    packed_at = desc_at + 9
    g2 = bytearray(gif)
    g2[packed_at] |= 0x40  # interlace flag
    with pytest.raises(NotImplementedError, match="interlaced"):
        decode_gif_gray8(bytes(g2))
    g3 = bytearray(gif)
    g3[packed_at] |= 0x80  # local color table flag
    with pytest.raises(NotImplementedError, match="local color"):
        decode_gif_gray8(bytes(g3))


def test_gif_pixel_count_mismatch_detected():
    # declare a 3x3 image but ship 2x2 worth of LZW data
    gif = bytearray(encode_gif_gray8(2, 2, bytes([1, 2, 3, 4])))
    desc_at = 13 + 3 * 256
    w_at = desc_at + 5
    struct.pack_into("<HH", gif, w_at, 3, 3)
    # widen screen too so dims stay consistent
    struct.pack_into("<HH", gif, 6, 3, 3)
    with pytest.raises(ValueError, match="declares"):
        decode_gif_gray8(bytes(gif))


def test_dispatcher_routes_gif():
    f = decode_image_features(encode_gif_gray8(3, 2, bytes([0] * 6)))
    assert (f["width"], f["height"], f["mean_intensity"]) == (3, 2, 0.0)
