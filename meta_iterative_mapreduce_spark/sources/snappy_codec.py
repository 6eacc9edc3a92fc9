"""Pure-stdlib Snappy raw-block codec (VERDICT r11 Missing #3).

Real Kafka Avro OCF dumps overwhelmingly use the `snappy` codec; the
python-snappy library is absent from this environment, so — the
warc.py/pdf.py precedent — the RAW SNAPPY FORMAT is implemented here
from the public format description
(https://github.com/google/snappy/blob/main/format_description.txt):

- preamble: the uncompressed length as a PLAIN little-endian base-128
  varint (not Avro's zigzag);
- then a sequence of elements, each a tag byte whose low 2 bits pick
  the type:
  - 00 LITERAL: upper 6 bits = length-1 for lengths <= 60; values
    60..63 mean the length-1 follows in the next 1..4 little-endian
    bytes;
  - 01 COPY with 1-byte offset: length = ((tag>>2) & 0x7) + 4
    (4..11), offset = 11 bits — (tag>>5) << 8 | next byte;
  - 10 COPY with 2-byte offset: length = (tag>>2) + 1 (1..64),
    offset = next 2 bytes little-endian;
  - 11 COPY with 4-byte offset: same lengths, 4-byte offset.
  Copies may OVERLAP their own output (offset < length) — the classic
  LZ77 run encoding — so expansion is byte-serial within a copy.

The compressor is a greedy single-pass LZ77 with a 4-byte-prefix hash
table, emitting copy2/copy1 elements for matches >= 4 bytes within
the 64 KiB offset window — the same shape as the reference C
implementation's fast path, sized for OCF blocks (a block is tens of
KiB; the table resets per call). Output is always a VALID snappy
stream; the decompressor accepts any conforming stream regardless of
which element types the producing compressor favored.

Scale posture: Avro blocks are decompressed executor-side, one block
span per InputPartition (sources/avro_ocf.py); the codec never runs
on the driver for payload data.

Reference analog: none — kernel.cu:1-220 reads whitespace-separated
text from stdin; at-rest codecs are engine surface the north star
adds.
"""

from __future__ import annotations

import struct

_MAX_OFFSET = 65536  # copy2's reach; the compressor's window


def _write_uvarint(out: bytearray, n: int) -> None:
    while n >= 0x80:
        out.append((n & 0x7F) | 0x80)
        n >>= 7
    out.append(n)


def _read_uvarint(data: bytes, pos: int) -> tuple[int, int]:
    n = shift = 0
    while True:
        if pos >= len(data):
            raise ValueError("snappy: truncated length preamble")
        b = data[pos]
        pos += 1
        n |= (b & 0x7F) << shift
        if not b & 0x80:
            return n, pos
        shift += 7
        if shift > 35:
            raise ValueError("snappy: length varint too long")


def _emit_literal(out: bytearray, chunk) -> None:
    lm1 = len(chunk) - 1
    if lm1 < 60:
        out.append(lm1 << 2)
    elif lm1 < 1 << 8:
        out.append(60 << 2)
        out.append(lm1)
    elif lm1 < 1 << 16:
        out.append(61 << 2)
        out += struct.pack("<H", lm1)
    elif lm1 < 1 << 24:
        out.append(62 << 2)
        out += lm1.to_bytes(3, "little")
    else:
        out.append(63 << 2)
        out += struct.pack("<I", lm1)
    out += chunk


def _emit_copy(out: bytearray, offset: int, length: int) -> None:
    """One or more copy elements covering `length` bytes at `offset`
    back. Prefers the 2-byte copy1 form when it fits."""
    while length > 0:
        m = min(length, 64)
        # never leave a sub-4-byte tail (copy1 needs >= 4; keeping
        # every emitted chunk >= 4 sidesteps it entirely)
        if length - m in (1, 2, 3):
            m = length - 4
        if 4 <= m <= 11 and offset < 2048:
            out.append(1 | ((m - 4) << 2) | ((offset >> 8) << 5))
            out.append(offset & 0xFF)
        else:
            out.append(2 | ((m - 1) << 2))
            out += struct.pack("<H", offset)
        length -= m


def snappy_compress(data: bytes) -> bytes:
    """Greedy hash-match LZ77 over the raw snappy element grammar."""
    out = bytearray()
    _write_uvarint(out, len(data))
    n = len(data)
    i = lit = 0
    table: dict[bytes, int] = {}
    while i + 4 <= n:
        key = data[i : i + 4]
        j = table.get(key)
        table[key] = i
        if j is not None and i - j < _MAX_OFFSET:
            m = 4
            while i + m < n and data[j + m] == data[i + m]:
                m += 1
            if lit < i:
                _emit_literal(out, data[lit:i])
            _emit_copy(out, i - j, m)
            i += m
            lit = i
        else:
            i += 1
    if lit < n:
        _emit_literal(out, data[lit:n])
    return bytes(out)


def snappy_decompress(data: bytes) -> bytes:
    expected, pos = _read_uvarint(data, 0)
    out = bytearray()
    n = len(data)
    while pos < n:
        tag = data[pos]
        pos += 1
        t = tag & 3
        if t == 0:
            length = tag >> 2
            if length >= 60:
                nb = length - 59
                if pos + nb > n:
                    raise ValueError("snappy: truncated literal length")
                length = int.from_bytes(data[pos : pos + nb], "little")
                pos += nb
            length += 1
            if pos + length > n:
                raise ValueError("snappy: truncated literal body")
            out += data[pos : pos + length]
            pos += length
            continue
        if t == 1:
            if pos >= n:
                raise ValueError("snappy: truncated copy1")
            length = ((tag >> 2) & 0x7) + 4
            offset = ((tag >> 5) << 8) | data[pos]
            pos += 1
        elif t == 2:
            if pos + 2 > n:
                raise ValueError("snappy: truncated copy2")
            length = (tag >> 2) + 1
            offset = int.from_bytes(data[pos : pos + 2], "little")
            pos += 2
        else:
            if pos + 4 > n:
                raise ValueError("snappy: truncated copy4")
            length = (tag >> 2) + 1
            offset = int.from_bytes(data[pos : pos + 4], "little")
            pos += 4
        if offset == 0 or offset > len(out):
            raise ValueError("snappy: copy offset outside output")
        start = len(out) - offset
        if offset >= length:
            out += out[start : start + length]
        else:  # overlapping run: byte-serial, per the format
            for k in range(length):
                out.append(out[start + k])
    if len(out) != expected:
        raise ValueError(
            f"snappy: declared {expected} bytes, produced {len(out)}"
        )
    return bytes(out)


__all__ = ["snappy_compress", "snappy_decompress"]
