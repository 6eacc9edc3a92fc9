"""Byte-level guarantees of the synthetic image codec that the SQL
oracle can't express: corrupt-payload rejection and round-trip."""

from __future__ import annotations

import struct

import pytest

from meta_iterative_mapreduce_spark.operators.multimodal import (
    _MAGIC,
    decode_image_features,
    decode_synthetic_image,
)


def _pack(w: int, h: int, pixels: bytes) -> bytes:
    return struct.pack(">4sHH", _MAGIC, w, h) + pixels


def test_decode_round_trip():
    pix = bytes(range(12))
    out = decode_synthetic_image(_pack(4, 3, pix))
    assert out == {
        "width": 4,
        "height": 3,
        "n_pixels": 12,
        "mean_intensity": sum(pix) / 12,
    }


def test_decode_rejects_bad_magic():
    with pytest.raises(ValueError, match="bad magic"):
        decode_synthetic_image(b"JUNK" + b"\x00" * 16)


def test_decode_rejects_truncated_pixel_plane():
    with pytest.raises(ValueError, match="truncated"):
        decode_synthetic_image(_pack(4, 3, b"\x01\x02"))


def test_decode_zero_area_image():
    assert decode_synthetic_image(_pack(0, 5, b""))["mean_intensity"] == 0.0


def test_injection_point_routes_mimg_to_synthetic_parser():
    assert decode_image_features(_pack(2, 2, b"abcd"))["n_pixels"] == 4
    with pytest.raises(NotImplementedError):
        decode_image_features(b"\x89PNG\r\n\x1a\n" + b"\x00" * 8)
