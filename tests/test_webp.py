"""Bit-level guarantees of the VP8L lossless WebP codec that the SQL
oracle can't express: exact pixel round-trips through every encoder
branch (cache/LZ77/subtract-green toggles), corrupt-stream rejection,
and loud scope guards for out-of-scope container variants."""

from __future__ import annotations

import struct

import numpy as np
import pytest

from meta_iterative_mapreduce_spark.operators.webp import (
    decode_webp_lossless,
    encode_webp_lossless,
    limited_code_lengths,
)


def _img(w: int, h: int, seed: int = 0) -> np.ndarray:
    rng = np.random.default_rng(seed)
    rgba = rng.integers(0, 256, size=(h, w, 4), dtype=np.uint8)
    rgba[..., 3] = 255
    return rgba


@pytest.mark.parametrize("w,h", [(1, 1), (7, 1), (1, 9), (4, 3), (13, 64), (40, 25)])
def test_round_trip_random(w, h):
    rgba = _img(w, h, seed=w * 100 + h)
    f = decode_webp_lossless(encode_webp_lossless(w, h, rgba))
    assert (f["width"], f["height"], f["n_pixels"]) == (w, h, w * h)
    assert np.array_equal(f["pixels"], rgba)
    assert f["sum_r"] == int(rgba[..., 0].astype(np.int64).sum())
    assert f["sum_g"] == int(rgba[..., 1].astype(np.int64).sum())
    assert f["sum_b"] == int(rgba[..., 2].astype(np.int64).sum())


@pytest.mark.parametrize("cache_bits", [0, 1, 4, 8, 11])
@pytest.mark.parametrize("subtract_green", [False, True])
@pytest.mark.parametrize("use_lz77", [False, True])
def test_round_trip_encoder_branches(cache_bits, subtract_green, use_lz77):
    # Low-entropy image: long runs (LZ77), repeated colors (cache),
    # and a gradient band so subtract-green actually changes bytes.
    rgba = np.zeros((16, 24, 4), dtype=np.uint8)
    rgba[..., 3] = 255
    rgba[:8, :, 0] = 200
    rgba[:, :12, 1] = np.arange(12, dtype=np.uint8) * 3
    blob = encode_webp_lossless(
        24, 16, rgba,
        cache_bits=cache_bits,
        subtract_green=subtract_green,
        use_lz77=use_lz77,
    )
    f = decode_webp_lossless(blob)
    assert np.array_equal(f["pixels"], rgba)


def test_constant_image_compresses():
    rgba = np.full((64, 64, 4), 17, dtype=np.uint8)
    blob = encode_webp_lossless(64, 64, rgba)
    assert np.array_equal(decode_webp_lossless(blob)["pixels"], rgba)
    # 16384 pixels of one color must land far below raw size.
    assert len(blob) < 64 * 64 * 4 / 20


def test_alpha_channel_preserved():
    rgba = _img(9, 5, seed=3)
    rgba[..., 3] = (np.arange(45, dtype=np.uint8) * 5 % 256).reshape(5, 9)
    f = decode_webp_lossless(encode_webp_lossless(9, 5, rgba))
    assert np.array_equal(f["pixels"], rgba)


def test_bad_riff_header():
    with pytest.raises(ValueError, match="RIFF"):
        decode_webp_lossless(b"JUNK" + b"\x00" * 20)


def test_riff_length_mismatch():
    blob = bytearray(encode_webp_lossless(2, 2, _img(2, 2)))
    struct.pack_into("<I", blob, 4, 999)
    with pytest.raises(ValueError, match="length mismatch"):
        decode_webp_lossless(bytes(blob))


def test_truncated_chunk():
    blob = encode_webp_lossless(4, 4, _img(4, 4))
    cut = blob[:-3]
    patched = cut[:4] + struct.pack("<I", len(cut) - 8) + cut[8:]
    with pytest.raises(ValueError, match="truncated"):
        decode_webp_lossless(patched)


def test_lossy_vp8_scope_guard():
    body = b"\x00" * 10
    blob = (
        b"RIFF"
        + struct.pack("<I", 4 + 8 + len(body))
        + b"WEBP"
        + b"VP8 "
        + struct.pack("<I", len(body))
        + body
    )
    with pytest.raises(NotImplementedError, match="lossy"):
        decode_webp_lossless(blob)


def test_bad_vp8l_signature():
    blob = bytearray(encode_webp_lossless(2, 2, _img(2, 2)))
    assert blob[20] == 0x2F  # VP8L signature byte
    blob[20] = 0x30
    with pytest.raises(ValueError, match="signature"):
        decode_webp_lossless(bytes(blob))


def test_limited_code_lengths_kraft():
    # Heavily skewed frequencies would produce a depth > 15 without
    # limiting; the limited lengths must still satisfy Kraft equality.
    freqs = [1 << max(0, 30 - i) for i in range(40)]
    lengths = limited_code_lengths(freqs, 15)
    assert max(lengths) <= 15
    assert sum(2 ** (15 - l) for l in lengths if l) == 2**15
