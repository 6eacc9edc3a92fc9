"""PDF writer/extractor spec-level guarantees: escape set, balanced
parens, kerned TJ arrays, hex strings, Flate framing by /Length,
honest guards."""

from __future__ import annotations

import re
import zlib

import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from meta_iterative_mapreduce_spark.operators.pdf import (
    _decode_pdf_string,
    _escape_pdf_string,
    encode_simple_pdf,
    extract_pdf_pages,
    extract_pdf_text,
)


def _round_trip(text: str) -> str:
    lines = text.split("\n")
    pages = ["\n".join(lines[i : i + 40]) for i in range(0, len(lines), 40)]
    back = extract_pdf_pages(encode_simple_pdf(pages or [""]))
    return "\n".join(p[:-1] if p.endswith("\n") else p for p in back)


def test_escapes_and_parens_round_trip():
    t = "a(b)c\\d\n(((nested? not shown)))\nends with backslash \\"
    assert _round_trip(t) == t


def test_nonascii_octal_escapes():
    t = "héllo — ß π\ntab\there"
    assert _round_trip(t) == t


@given(
    text=st.text(
        alphabet=st.sampled_from(list("ab()\\\n\t 01Zé")), max_size=400
    )
)
@settings(max_examples=120, deadline=None)
def test_pdf_round_trip_property(text):
    assert _round_trip(text) == text


@given(data=st.binary(max_size=200))
@settings(max_examples=100, deadline=None)
def test_string_escape_round_trip_property(data):
    assert _decode_pdf_string(_escape_pdf_string(data)) == data


def test_hex_strings_extracted():
    # hand-build a content stream using a hex show
    content = b"BT <48656c6c6f> Tj ET"
    flate = zlib.compress(content)
    pdf = (
        b"%PDF-1.7\n1 0 obj\n<< /Length "
        + str(len(flate)).encode()
        + b" /Filter /FlateDecode >>\nstream\n"
        + flate
        + b"\nendstream\nendobj\n%%EOF"
    )
    assert extract_pdf_text(pdf) == "Hello"


def test_non_shown_strings_ignored():
    # a string followed by a non-show operator must not leak into text
    content = b"BT (shown) Tj (annotation-not-shown) Tz ET"
    flate = zlib.compress(content)
    pdf = (
        b"%PDF-1.7\n1 0 obj\n<< /Length "
        + str(len(flate)).encode()
        + b" /Filter /FlateDecode >>\nstream\n"
        + flate
        + b"\nendstream\nendobj\n%%EOF"
    )
    assert extract_pdf_text(pdf) == "shown"


def test_flate_bytes_ending_in_newline_not_truncated():
    # direct /Length framing must NOT rstrip the compressed bytes —
    # synthesize a stream whose deflate output ends with 0x0a
    for filler in range(2000):
        content = b"BT (" + bytes([65 + filler % 26]) * (filler % 97) + b") Tj ET"
        flate = zlib.compress(content)
        if flate.endswith((b"\n", b"\r")):
            break
    else:
        pytest.skip("no newline-tailed deflate found")
    pdf = (
        b"%PDF-1.7\n1 0 obj\n<< /Length "
        + str(len(flate)).encode()
        + b" /Filter /FlateDecode >>\nstream\n"
        + flate
        + b"\nendstream\nendobj\n%%EOF"
    )
    assert extract_pdf_text(pdf)  # decodes, no truncation error


def test_guards():
    with pytest.raises(ValueError):
        extract_pdf_text(b"not a pdf")
    pdf = encode_simple_pdf(["x"])
    with pytest.raises(NotImplementedError, match="encrypted"):
        extract_pdf_text(pdf + b"/Encrypt")
    bad = re.sub(rb"endstream", b"endstrXam", pdf)
    with pytest.raises(ValueError):
        extract_pdf_text(bad)


def test_xref_table_is_valid():
    """The writer's xref offsets must actually point at 'N 0 obj'."""
    pdf = encode_simple_pdf(["hello\nworld", "page 2"])
    m = re.search(rb"xref\n0 (\d+)\n", pdf)
    n = int(m.group(1))
    table = pdf[m.end() :]
    rows = [table[i * 20 : (i + 1) * 20] for i in range(n)]
    for i, row in enumerate(rows[1:], start=1):
        off = int(row[:10])
        assert pdf[off:].startswith(f"{i} 0 obj".encode())


def test_indirect_length_multidigit_object_number():
    """'/Length 12 0 R' must take the indirect-length branch: the
    negative lookahead needs a digit guard or backtracking shrinks
    the capture to '1' and the lookahead spuriously passes."""
    content = b"BT (indirect) Tj ET"
    flate = zlib.compress(content)
    pdf = (
        b"%PDF-1.7\n1 0 obj\n<< /Length 12 0 R /Filter /FlateDecode "
        b">>\nstream\n" + flate + b"\nendstream\nendobj\n"
        b"12 0 obj\n" + str(len(flate)).encode() + b"\nendobj\n%%EOF"
    )
    assert extract_pdf_text(pdf) == "indirect"


def test_form_feed_in_document_text_keeps_page_boundaries():
    """A document containing \\f must round-trip: pages are returned
    as a list, not re-split on the join character."""
    text = "before\x0cafter\nsecond line"
    assert _round_trip(text) == text


def test_extract_pdf_pages_returns_one_entry_per_stream():
    from meta_iterative_mapreduce_spark.operators.pdf import (
        extract_pdf_pages,
    )

    pages = extract_pdf_pages(encode_simple_pdf(["a", "b", "c"]))
    assert len(pages) == 3
    assert [p.rstrip("\n") for p in pages] == ["a", "b", "c"]
