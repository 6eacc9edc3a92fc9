"""DOCX (OOXML) codec: OPC container round trips, run/paragraph
reassembly, spec-boundary error contracts, and the extraction query's
layout rotation (operators/docx.py)."""

from __future__ import annotations

import io
import zipfile

import pytest

from meta_iterative_mapreduce_spark.operators.docx import (
    _doc_layout,
    encode_docx,
    parse_docx,
)


def test_round_trip_paragraphs_and_styled_runs():
    paras = [
        ["Hello ", "world", "!"],      # 3 runs, odd ones styled bold
        ["single run paragraph"],
        ["a & b < c > d", " trailing  "],  # XML escapes + whitespace
    ]
    for deflate in (True, False):
        blob = encode_docx(paras, deflate=deflate)
        got = parse_docx(blob)
        assert got == ["".join(p) for p in paras]


def test_zip_member_compression_rotates():
    blob_d = encode_docx([["x" * 200]], deflate=True)
    blob_s = encode_docx([["x" * 200]], deflate=False)
    zd = zipfile.ZipFile(io.BytesIO(blob_d))
    zs = zipfile.ZipFile(io.BytesIO(blob_s))
    assert zd.getinfo("word/document.xml").compress_type == (
        zipfile.ZIP_DEFLATED
    )
    assert zs.getinfo("word/document.xml").compress_type == (
        zipfile.ZIP_STORED
    )
    assert parse_docx(blob_d) == parse_docx(blob_s)


def test_tab_and_break_elements():
    doc = (
        '<?xml version="1.0"?>'
        '<w:document xmlns:w="http://schemas.openxmlformats.org/'
        'wordprocessingml/2006/main"><w:body>'
        "<w:p><w:r><w:t>a</w:t><w:tab/><w:t>b</w:t><w:br/>"
        "<w:t>c</w:t></w:r></w:p>"
        "<w:p><w:r><w:cr/><w:t>d</w:t></w:r></w:p>"
        "</w:body></w:document>"
    )
    buf = io.BytesIO()
    with zipfile.ZipFile(buf, "w") as z:
        z.writestr("word/document.xml", doc)
    assert parse_docx(buf.getvalue()) == ["a\tb\nc", "\nd"]


def test_main_part_resolved_via_package_rels():
    """The document part's NAME comes from _rels/.rels, not a
    hardcoded path — Word tolerates relocated main parts."""
    doc = (
        '<w:document xmlns:w="http://schemas.openxmlformats.org/'
        'wordprocessingml/2006/main"><w:body>'
        "<w:p><w:r><w:t>moved</w:t></w:r></w:p></w:body></w:document>"
    )
    rels = (
        '<Relationships xmlns="http://schemas.openxmlformats.org/'
        'package/2006/relationships">'
        '<Relationship Id="rId1" Type="http://schemas.openxmlformats'
        '.org/officeDocument/2006/relationships/officeDocument" '
        'Target="/word/doc2.xml"/></Relationships>'
    )
    buf = io.BytesIO()
    with zipfile.ZipFile(buf, "w") as z:
        z.writestr("_rels/.rels", rels)
        z.writestr("word/doc2.xml", doc)
    assert parse_docx(buf.getvalue()) == ["moved"]


def test_error_contracts():
    with pytest.raises(ValueError, match="not a zip"):
        parse_docx(b"plain text, no container")
    with pytest.raises(NotImplementedError, match="OLE"):
        parse_docx(b"\xd0\xcf\x11\xe0\xa1\xb1\x1a\xe1" + b"\x00" * 64)
    with pytest.raises(ValueError, match="corrupt zip"):
        parse_docx(b"PK\x03\x04" + b"\x00" * 32)
    buf = io.BytesIO()
    with zipfile.ZipFile(buf, "w") as z:
        z.writestr("word/styles.xml", "<x/>")
    with pytest.raises(ValueError, match="no main part"):
        parse_docx(buf.getvalue())
    no_body = io.BytesIO()
    with zipfile.ZipFile(no_body, "w") as z:
        z.writestr(
            "word/document.xml",
            '<w:document xmlns:w="http://schemas.openxmlformats.org/'
            'wordprocessingml/2006/main"/>',
        )
    with pytest.raises(ValueError, match="no w:body"):
        parse_docx(no_body.getvalue())


def test_layout_rotation_is_lossless_and_varied():
    text = "The quick brown fox jumps over the lazy dog 0123456789"
    shapes = set()
    for doc_id in range(12):
        layout = _doc_layout(doc_id, text)
        assert "".join(r for p in layout for r in p) == text
        shapes.add((len(layout), tuple(len(p) for p in layout)))
        got = parse_docx(encode_docx(layout, deflate=(doc_id % 2 == 0)))
        assert "".join(got) == text
        assert len(got) == len(layout)
    assert len(shapes) >= 4  # the rotation really varies


def test_empty_runs_and_unicode():
    paras = [["", "héllo – ünïcode ✓", ""]]
    got = parse_docx(encode_docx(paras))
    assert got == ["héllo – ünïcode ✓"]
