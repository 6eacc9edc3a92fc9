"""TIFF 6.0 codec (grayscale-8, strip-based) — pure stdlib+numpy.

The fifth raster family (PNG, JPEG, WebP-VP8L, GIF, now TIFF) and the
one scanned/scientific corpora arrive in. TIFF is really a TAG
CONTAINER — the valuable part is the IFD machinery: both byte orders
(II/MM), 12-byte tag entries with inline-vs-offset values, multi-strip
image data — plus per-strip decompression. Implemented from the
public TIFF 6.0 specification:

- decode: II and MM files, BitsPerSample 8, SamplesPerPixel 1
  (BlackIsZero), any RowsPerStrip; Compression 1 (none), 32773
  (PackBits), and 5 (TIFF-LZW: MSB-first bit order, EarlyChange —
  the width grows one code EARLIER than GIF's LSB variant, a classic
  cross-codec trap); BOTH strip-based and TILED layouts (tags
  322-325; edge tiles pad to full tile size and are cropped on
  read per TIFF 6.0 §15). Other bit depths, palettes, and planar
  configs raise NotImplementedError; corrupt structures raise
  ValueError.
- encode: grayscale-8 with the same three compressions, BOTH byte
  orders (II and MM — inline tag values keep the leading-bytes rule
  of TIFF 6.0 §2 under big-endian packing), and
  configurable RowsPerStrip, so multi-strip layouts and every
  decompressor have a real round-trip partner.

Spark-side plumbing is the codec family's (Arrow-batched mapInPandas
over _spread). Reference analog: none (kernel.cu:92-104 reads numeric
stdin).
"""

from __future__ import annotations

import struct
from collections.abc import Iterator

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from meta_iterative_mapreduce_spark.io import load_table
from meta_iterative_mapreduce_spark.registry import register

_MAX_CODE_WIDTH = 12


# ---------------------------------------------------------------------------
# PackBits (TIFF 6.0 §9)
# ---------------------------------------------------------------------------


def _packbits_encode(data: bytes) -> bytes:
    out = bytearray()
    i, n = 0, len(data)
    while i < n:
        # find run length at i
        run = 1
        while i + run < n and run < 128 and data[i + run] == data[i]:
            run += 1
        if run >= 2:
            out.append(257 - run)  # -(run-1) as signed byte
            out.append(data[i])
            i += run
            continue
        # literal stretch: until a run of >=3 starts (2-runs aren't
        # worth breaking a literal for) or 128 bytes
        j = i + 1
        while j < n and j - i < 128:
            if j + 2 < n and data[j] == data[j + 1] == data[j + 2]:
                break
            j += 1
        out.append(j - i - 1)
        out += data[i:j]
        i = j
    return bytes(out)


def _packbits_decode(data: bytes, n_expected: int) -> bytes:
    out = bytearray()
    i = 0
    while len(out) < n_expected:
        if i >= len(data):
            raise ValueError("PackBits stream truncated")
        b = data[i]
        i += 1
        if b < 128:  # literal of b+1 bytes
            if i + b + 1 > len(data):
                raise ValueError("PackBits literal truncated")
            out += data[i : i + b + 1]
            i += b + 1
        elif b > 128:  # repeat next byte 257-b times
            if i >= len(data):
                raise ValueError("PackBits run truncated")
            out += bytes([data[i]]) * (257 - b)
            i += 1
        # b == 128: no-op per spec
    if len(out) != n_expected:
        raise ValueError(
            f"PackBits produced {len(out)} bytes, strip declares {n_expected}"
        )
    return bytes(out)


# ---------------------------------------------------------------------------
# TIFF-LZW (TIFF 6.0 §13): MSB-first codes, EarlyChange width growth
# ---------------------------------------------------------------------------

_T_CLEAR, _T_EOI = 256, 257


def _tlzw_encode(data: bytes) -> bytes:
    # Width bookkeeping tracks the DECODER's table size explicitly:
    # the decoder appends one entry per received code except the
    # first after a clear, and EarlyChange widens when its table hits
    # 2^width - 1 — with MSB packing the encoder/decoder off-by-ones
    # do NOT cancel the way the GIF (LSB, non-early) variant's do, so
    # simulating the decoder is the only non-fragile bookkeeping.
    bits: list[tuple[int, int]] = []
    table = {bytes([i]): i for i in range(256)}
    next_code = _T_EOI + 1
    width = 9
    dec_len = _T_EOI + 1  # decoder table size
    n_since_clear = 0

    def emit(code: int) -> None:
        nonlocal dec_len, width, n_since_clear
        bits.append((code, width))
        n_since_clear += 1
        if n_since_clear >= 2:  # decoder appends for this code
            dec_len += 1
            if dec_len == (1 << width) - 1 and width < _MAX_CODE_WIDTH:
                width += 1

    def emit_clear() -> None:
        nonlocal table, next_code, width, dec_len, n_since_clear
        bits.append((_T_CLEAR, width))
        table = {bytes([i]): i for i in range(256)}
        next_code = _T_EOI + 1
        width = 9
        dec_len = _T_EOI + 1
        n_since_clear = 0

    emit_clear()
    prefix = b""
    for px in data:
        cand = prefix + bytes([px])
        if cand in table:
            prefix = cand
            continue
        emit(table[prefix])
        table[cand] = next_code
        next_code += 1
        if next_code >= (1 << _MAX_CODE_WIDTH) - 2:  # table nearly full
            emit_clear()
        prefix = bytes([px])
    if prefix:
        emit(table[prefix])
    bits.append((_T_EOI, width))
    # MSB-first packing
    acc = 0
    nbits = 0
    out = bytearray()
    for code, w in bits:
        acc = (acc << w) | code
        nbits += w
        while nbits >= 8:
            out.append((acc >> (nbits - 8)) & 0xFF)
            nbits -= 8
    if nbits:
        out.append((acc << (8 - nbits)) & 0xFF)
    return bytes(out)


def _tlzw_decode(data: bytes, n_expected: int) -> bytes:
    table: list[bytes] = [bytes([i]) for i in range(256)] + [b"", b""]
    width = 9
    out = bytearray()
    acc = 0
    nbits = 0
    pos = 0
    prev: bytes | None = None
    while True:
        while nbits < width:
            if pos >= len(data):
                raise ValueError("TIFF-LZW stream truncated (no EOI)")
            acc = (acc << 8) | data[pos]
            nbits += 8
            pos += 1
        code = (acc >> (nbits - width)) & ((1 << width) - 1)
        nbits -= width
        if code == _T_EOI:
            break
        if code == _T_CLEAR:
            table = [bytes([i]) for i in range(256)] + [b"", b""]
            width = 9
            prev = None
            continue
        if prev is None:
            if code >= 256:
                raise ValueError(f"first TIFF-LZW code {code} not a root")
            entry = table[code]
        elif code < len(table):
            entry = table[code]
            table.append(prev + entry[:1])
        elif code == len(table):
            entry = prev + prev[:1]
            table.append(entry)
        else:
            raise ValueError(
                f"TIFF-LZW code {code} beyond table {len(table)}"
            )
        out += entry
        if len(table) == (1 << width) - 1 and width < _MAX_CODE_WIDTH:
            width += 1  # EarlyChange
        prev = entry
        if len(out) > n_expected:
            raise ValueError("TIFF-LZW output exceeds strip size")
    if len(out) != n_expected:
        raise ValueError(
            f"TIFF-LZW produced {len(out)} bytes, strip declares "
            f"{n_expected}"
        )
    return bytes(out)


# ---------------------------------------------------------------------------
# container
# ---------------------------------------------------------------------------

_COMPRESSORS = {
    "none": (1, lambda b: b),
    "lzw": (5, _tlzw_encode),
    "packbits": (32773, _packbits_encode),
}


def encode_tiff_gray8(
    width: int,
    height: int,
    pixels: bytes,
    compression: str = "packbits",
    rows_per_strip: int = 8,
    byte_order: str = "II",
) -> bytes:
    """Grayscale-8 TIFF with `height/rows_per_strip` strips, each
    independently compressed; `byte_order` picks II (little-endian,
    the PC default) or MM (big-endian — scanners/Mac-era writers),
    so the certified rotation exercises the reader's endian handling
    with real files, not just hand-built test fixtures."""
    if len(pixels) != width * height:
        raise ValueError("pixel buffer does not match dimensions")
    if compression not in _COMPRESSORS:
        raise ValueError(f"unknown compression {compression!r}")
    if byte_order not in ("II", "MM"):
        raise ValueError(f"byte_order must be II or MM, not {byte_order!r}")
    e = "<" if byte_order == "II" else ">"
    comp_tag, comp_fn = _COMPRESSORS[compression]
    rps = max(1, rows_per_strip)
    strips = [
        comp_fn(pixels[r * width : min(r + rps, height) * width])
        for r in range(0, height, rps)
    ]
    n_strips = len(strips)
    # layout: header(8) | strip data | [strip offset/count arrays] | IFD
    pos = 8
    offsets = []
    for s in strips:
        offsets.append(pos)
        pos += len(s)
    counts = [len(s) for s in strips]

    def arr_or_inline(values: list[int]) -> tuple[int, bytes | None]:
        """LONG array: inline if count==1, else appended after data."""
        if len(values) == 1:
            return values[0], None
        return -1, struct.pack(f"{e}{len(values)}I", *values)

    extra = b""
    off_val, off_arr = arr_or_inline(offsets)
    if off_arr is not None:
        off_val = pos + len(extra)
        extra += off_arr
    cnt_val, cnt_arr = arr_or_inline(counts)
    if cnt_arr is not None:
        cnt_val = pos + len(extra)
        extra += cnt_arr
    ifd_off = pos + len(extra)

    def entry(tag: int, typ: int, count: int, value: int) -> bytes:
        # SHORT values inline in the LEADING bytes of the 4-byte value
        # field in BOTH byte orders (TIFF 6.0 §2): pack the value at
        # its type width, then pad to 4
        size = {3: 2, 4: 4}[typ]
        fmt = {3: "H", 4: "I"}[typ]
        val = struct.pack(f"{e}{fmt}", value) + b"\x00" * (4 - size)
        return struct.pack(f"{e}HHI", tag, typ, count) + val

    entries = [
        entry(256, 3, 1, width),        # ImageWidth SHORT
        entry(257, 3, 1, height),       # ImageLength
        entry(258, 3, 1, 8),            # BitsPerSample
        entry(259, 3, 1, comp_tag),     # Compression
        entry(262, 3, 1, 1),            # Photometric BlackIsZero
        entry(273, 4, n_strips, off_val),  # StripOffsets LONG
        entry(277, 3, 1, 1),            # SamplesPerPixel
        entry(278, 3, 1, rps),          # RowsPerStrip
        entry(279, 4, n_strips, cnt_val),  # StripByteCounts
    ]
    ifd = struct.pack(f"{e}H", len(entries)) + b"".join(entries) + b"\x00" * 4
    head = b"II*\x00" if byte_order == "II" else b"MM\x00*"
    return (
        head
        + struct.pack(f"{e}I", ifd_off)
        + b"".join(strips)
        + extra
        + ifd
    )


def encode_tiff_gray8_tiled(
    width: int,
    height: int,
    pixels: bytes,
    compression: str = "packbits",
    tile_width: int = 16,
    tile_length: int = 16,
    byte_order: str = "II",
) -> bytes:
    """Grayscale-8 TILED TIFF (TileWidth/TileLength/TileOffsets/
    TileByteCounts, tags 322-325) in either byte order — the default
    layout of imaging/geo pipelines. Edge tiles pad to the full tile
    size with zeros per TIFF 6.0 §15 (the reader crops); tile dims
    must be positive multiples of 16."""
    if len(pixels) != width * height:
        raise ValueError("pixel buffer does not match dimensions")
    if compression not in _COMPRESSORS:
        raise ValueError(f"unknown compression {compression!r}")
    if tile_width % 16 or tile_length % 16 or tile_width <= 0 or tile_length <= 0:
        raise ValueError("tile dims must be positive multiples of 16")
    if byte_order not in ("II", "MM"):
        raise ValueError(f"byte_order must be II or MM, not {byte_order!r}")
    e = "<" if byte_order == "II" else ">"
    comp_tag, comp_fn = _COMPRESSORS[compression]
    arr = np.frombuffer(pixels, dtype=np.uint8).reshape(height, width)
    ta = (width + tile_width - 1) // tile_width
    td = (height + tile_length - 1) // tile_length
    tiles: list[bytes] = []
    for ty in range(td):
        for tx in range(ta):
            tile = np.zeros((tile_length, tile_width), dtype=np.uint8)
            rows = min(tile_length, height - ty * tile_length)
            cols = min(tile_width, width - tx * tile_width)
            tile[:rows, :cols] = arr[
                ty * tile_length : ty * tile_length + rows,
                tx * tile_width : tx * tile_width + cols,
            ]
            tiles.append(comp_fn(tile.tobytes()))
    pos = 8
    offsets = []
    for t in tiles:
        offsets.append(pos)
        pos += len(t)
    counts = [len(t) for t in tiles]
    extra = b""
    if len(offsets) == 1:
        off_val, cnt_val = offsets[0], counts[0]
    else:
        off_val = pos
        extra += struct.pack(f"{e}{len(offsets)}I", *offsets)
        cnt_val = pos + len(extra)
        extra += struct.pack(f"{e}{len(counts)}I", *counts)
    ifd_off = pos + len(extra)

    def entry(tag: int, typ: int, count: int, value: int) -> bytes:
        # inline values occupy the LEADING bytes of the value field
        # in BOTH byte orders (TIFF 6.0 §2)
        size = {3: 2, 4: 4}[typ]
        fmt = {3: "H", 4: "I"}[typ]
        val = struct.pack(f"{e}{fmt}", value) + b"\x00" * (4 - size)
        return struct.pack(f"{e}HHI", tag, typ, count) + val

    entries = [
        entry(256, 3, 1, width),
        entry(257, 3, 1, height),
        entry(258, 3, 1, 8),
        entry(259, 3, 1, comp_tag),
        entry(262, 3, 1, 1),
        entry(277, 3, 1, 1),
        entry(322, 3, 1, tile_width),       # TileWidth
        entry(323, 3, 1, tile_length),      # TileLength
        entry(324, 4, len(tiles), off_val),  # TileOffsets
        entry(325, 4, len(tiles), cnt_val),  # TileByteCounts
    ]
    entries.sort(key=lambda b: struct.unpack(f"{e}H", b[:2])[0])
    ifd = struct.pack(f"{e}H", len(entries)) + b"".join(entries) + b"\x00" * 4
    head = b"II*\x00" if byte_order == "II" else b"MM\x00*"
    return (
        head
        + struct.pack(f"{e}I", ifd_off)
        + b"".join(tiles)
        + extra
        + ifd
    )


def _decode_segment(raw: bytes, comp: int, n_expected: int) -> bytes:
    """One strip's or tile's bytes → exactly n_expected pixels."""
    if comp == 1:
        if len(raw) < n_expected:
            raise ValueError("segment shorter than its pixel area")
        return raw[:n_expected]
    if comp == 32773:
        return _packbits_decode(raw, n_expected)
    if comp == 5:
        return _tlzw_decode(raw, n_expected)
    raise NotImplementedError(f"TIFF compression {comp}")


def decode_tiff_gray8(payload: bytes) -> dict:
    """Parse II or MM TIFF, first IFD only — strip-based AND tiled
    layouts. Returns dict(width, height, n_pixels, mean_intensity,
    pixels=(h, w) uint8)."""
    data = bytes(payload)
    if len(data) < 8:
        raise ValueError("TIFF too short")
    if data[:2] == b"II":
        e = "<"
    elif data[:2] == b"MM":
        e = ">"
    else:
        raise ValueError("bad TIFF byte-order mark")
    (magic,) = struct.unpack(e + "H", data[2:4])
    if magic != 42:
        raise ValueError("bad TIFF magic")
    (ifd_off,) = struct.unpack(e + "I", data[4:8])
    if ifd_off + 2 > len(data):
        raise ValueError("IFD offset beyond file")
    (n_entries,) = struct.unpack(e + "H", data[ifd_off : ifd_off + 2])
    tags: dict[int, tuple[int, int, int, bytes]] = {}
    for i in range(n_entries):
        o = ifd_off + 2 + 12 * i
        if o + 12 > len(data):
            raise ValueError("IFD entry truncated")
        tag, typ, count = struct.unpack(e + "HHI", data[o : o + 8])
        (raw,) = struct.unpack(e + "I", data[o + 8 : o + 12])
        tags[tag] = (typ, count, raw, data[o + 8 : o + 12])

    _TYPE_SIZE = {1: 1, 3: 2, 4: 4}

    def values(tag: int, default: list[int] | None = None) -> list[int]:
        if tag not in tags:
            if default is not None:
                return default
            raise ValueError(f"missing required TIFF tag {tag}")
        typ, count, raw, field = tags[tag]
        if typ not in _TYPE_SIZE:
            raise ValueError(f"unsupported type {typ} for tag {tag}")
        size = _TYPE_SIZE[typ]
        total = size * count
        if total <= 4:
            # inline values occupy the leading bytes of the 4-byte
            # value field in BOTH byte orders (TIFF 6.0 §2)
            buf = field[:total]
        else:
            if raw + total > len(data):
                raise ValueError(f"tag {tag} value array beyond file")
            buf = data[raw : raw + total]
        fmt = {1: "B", 3: "H", 4: "I"}[typ]
        return list(struct.unpack(f"{e}{count}{fmt}", buf))

    width = values(256)[0]
    height = values(257)[0]
    bps = values(258, [1])
    if bps != [8]:
        raise NotImplementedError(f"BitsPerSample {bps} != [8]")
    spp = values(277, [1])[0]
    if spp != 1:
        raise NotImplementedError(f"SamplesPerPixel {spp} != 1")
    photo = values(262)[0]
    if photo not in (0, 1):
        raise NotImplementedError(f"PhotometricInterpretation {photo}")
    comp = values(259, [1])[0]
    if 322 in tags or 323 in tags:
        # tiled layout: TileWidth/TileLength/TileOffsets/TileByteCounts;
        # tiles pad to full size at the right/bottom edges — crop
        tw = values(322)[0]
        tl = values(323)[0]
        if tw <= 0 or tl <= 0 or tw % 16 or tl % 16:
            raise ValueError("tile dims must be positive multiples of 16")
        offsets = values(324)
        counts = values(325)
        ta = (width + tw - 1) // tw
        td = (height + tl - 1) // tl
        if len(offsets) != len(counts) or len(offsets) != ta * td:
            raise ValueError(
                f"{len(offsets)} tiles but {ta}x{td} expected for "
                f"{width}x{height} at {tw}x{tl}"
            )
        pix = np.zeros((height, width), dtype=np.uint8)
        i = 0
        for ty in range(td):
            for tx in range(ta):
                off, cnt = offsets[i], counts[i]
                i += 1
                if off + cnt > len(data):
                    raise ValueError(
                        f"tile {i - 1} at {off}+{cnt} beyond file"
                    )
                tile = np.frombuffer(
                    _decode_segment(data[off : off + cnt], comp, tw * tl),
                    dtype=np.uint8,
                ).reshape(tl, tw)
                rows = min(tl, height - ty * tl)
                cols = min(tw, width - tx * tw)
                pix[
                    ty * tl : ty * tl + rows, tx * tw : tx * tw + cols
                ] = tile[:rows, :cols]
    else:
        rps = values(278, [height])[0]
        offsets = values(273)
        counts = values(279)
        if len(offsets) != len(counts):
            raise ValueError("StripOffsets/StripByteCounts disagree")
        n_strips_expected = (height + rps - 1) // rps if height else 0
        if len(offsets) != n_strips_expected:
            raise ValueError(
                f"{len(offsets)} strips but {n_strips_expected} expected "
                f"for {height} rows at {rps}/strip"
            )
        out = bytearray()
        for si, (off, cnt) in enumerate(zip(offsets, counts)):
            if off + cnt > len(data):
                raise ValueError(f"strip {si} at {off}+{cnt} beyond file")
            rows = min(rps, height - si * rps)
            out += _decode_segment(data[off : off + cnt], comp, rows * width)
        pix = np.frombuffer(bytes(out), dtype=np.uint8).reshape(
            height, width
        )
    if photo == 0:  # WhiteIsZero: invert to BlackIsZero luma
        pix = 255 - pix
    return {
        "width": width,
        "height": height,
        "n_pixels": width * height,
        "mean_intensity": float(pix.sum()) / max(width * height, 1),
        "pixels": pix,
    }


@register(
    "q_multimodal_decode_tiff",
    oracle="""
    WITH dims AS (
        SELECT doc_id, text,
               CAST(doc_id % 13 + 4 AS INT) AS width,
               CAST(LEAST(octet_length(encode(text)) // (doc_id % 13 + 4),
                          64) AS INT) AS height
        FROM documents
        WHERE octet_length(encode(text)) = length(text)
          AND octet_length(encode(text)) >= doc_id % 13 + 4
    )
    SELECT d.doc_id, d.width, d.height,
           CAST(d.width * d.height AS BIGINT) AS n_pixels,
           SUM(ascii(SUBSTR(d.text, CAST(t.i AS INT), 1)))
               / CAST(d.width * d.height AS DOUBLE) AS mean_intensity
    FROM dims d,
         UNNEST(generate_series(1, d.width * d.height)) AS t(i)
    GROUP BY d.doc_id, d.width, d.height
    """,
)
def q_multimodal_decode_tiff(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Round-trip through strip-based TIFF: each document's byte plane
    becomes a grayscale TIFF — compression ROTATES by doc_id over
    none/PackBits/TIFF-LZW, the LAYOUT rotates between multi-strip
    and TILED (16x16 tiles, tags 322-325, edge-tile padding cropped
    by the reader), and the BYTE ORDER rotates II/MM, so all twelve
    decompressor x layout x endian paths are on the certified path —
    decoded back via the full IFD walk. Lossless, so
    the oracle is the PNG family's exact mean-intensity recomputation
    (the five raster formats must agree byte-for-byte on what they
    transported)."""
    from meta_iterative_mapreduce_spark.operators.multimodal import (
        _MAX_HEIGHT,
        _spread,
    )

    d = load_table(spark, sf_dir, "documents").filter(
        (F.length(F.encode("text", "UTF-8")) == F.length("text"))
        & (F.length(F.encode("text", "UTF-8")) >= F.col("doc_id") % 13 + 4)
    )
    src = _spread(
        d.select("doc_id", F.encode("text", "UTF-8").alias("payload")), spark
    )
    comps = ["none", "packbits", "lzw"]

    def op(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, ws, hs, np_, mi = [], [], [], [], []
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                data = bytes(payload)
                w = int(doc_id) % 13 + 4
                h = min(len(data) // w, _MAX_HEIGHT)
                gray = data[: w * h]
                comp = comps[int(doc_id) % 3]
                bo = "MM" if int(doc_id) % 12 >= 6 else "II"
                if int(doc_id) % 6 >= 3:
                    tif = encode_tiff_gray8_tiled(
                        w, h, gray, compression=comp, byte_order=bo
                    )
                else:
                    tif = encode_tiff_gray8(
                        w, h, gray, compression=comp, byte_order=bo
                    )
                f = decode_tiff_gray8(tif)
                if (f["width"], f["height"]) != (w, h):
                    raise ValueError("dim mismatch after TIFF round trip")
                if f["pixels"].tobytes() != gray:
                    raise ValueError("pixel mismatch after TIFF round trip")
                ids.append(doc_id)
                ws.append(w)
                hs.append(h)
                np_.append(w * h)
                mi.append(f["mean_intensity"])
            yield pd.DataFrame(
                {
                    "doc_id": pd.Series(ids, dtype="int64"),
                    "width": pd.Series(ws, dtype="int32"),
                    "height": pd.Series(hs, dtype="int32"),
                    "n_pixels": pd.Series(np_, dtype="int64"),
                    "mean_intensity": pd.Series(mi, dtype="float64"),
                }
            )

    return src.mapInPandas(
        op,
        schema="doc_id long, width int, height int, n_pixels long, "
        "mean_intensity double",
    )
