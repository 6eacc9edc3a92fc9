"""DOCX (OOXML WordprocessingML, ECMA-376 / ISO 29500) text
extraction — the office-document format every real enterprise corpus
contains (VERDICT r9 item 7).

A .docx file is a ZIP container (OPC packaging) whose main part,
`word/document.xml`, nests paragraphs (`w:p`) of runs (`w:r`) holding
text nodes (`w:t`), tabs (`w:tab`), and line breaks (`w:br`). Styling
splits a visually continuous sentence across MANY runs — the classic
extraction hazard this module's fixtures rotate deliberately.
Implemented from the public spec with stdlib only:

- `encode_docx`: writes a real OPC container — `[Content_Types].xml`,
  the package relationship part `_rels/.rels`, and
  `word/document.xml` — rotating STORED vs DEFLATED zip members (both
  legal; zipfile emits either) and `xml:space="preserve"` on text
  nodes so run boundaries inside whitespace survive.
- `parse_docx`: opens the zip (ValueError on a non-zip / missing main
  part), locates the document part via the package rels, parses the
  XML with the stdlib ElementTree under the WordprocessingML
  namespace, and walks every paragraph's runs in document order:
  `w:t` text verbatim, `w:tab` → TAB, `w:br`/`w:cr` → NEWLINE.
  Unsupported encrypted packages (OLE magic instead of zip) raise
  NotImplementedError — the spec-boundary error contract of the codec
  family.

Spark side: Arrow-batched mapInPandas over _spread, like pdf.py /
warc.py. Reference analog: none (kernel.cu reads numeric stdin).
"""

from __future__ import annotations

import io
import zipfile
from collections.abc import Iterator
from xml.etree import ElementTree as ET
from xml.sax.saxutils import escape

import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from meta_iterative_mapreduce_spark.io import load_table
from meta_iterative_mapreduce_spark.registry import register

_W_NS = (
    "http://schemas.openxmlformats.org/wordprocessingml/2006/main"
)
_REL_NS = (
    "http://schemas.openxmlformats.org/package/2006/relationships"
)
_DOC_REL_TYPE = (
    "http://schemas.openxmlformats.org/officeDocument/2006/"
    "relationships/officeDocument"
)

_CONTENT_TYPES = (
    '<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
    '<Types xmlns="http://schemas.openxmlformats.org/package/2006/'
    'content-types">'
    '<Default Extension="rels" ContentType="application/vnd.'
    'openxmlformats-package.relationships+xml"/>'
    '<Default Extension="xml" ContentType="application/xml"/>'
    '<Override PartName="/word/document.xml" ContentType="application/'
    'vnd.openxmlformats-officedocument.wordprocessingml.document.main'
    '+xml"/>'
    "</Types>"
)

_PACKAGE_RELS = (
    '<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
    f'<Relationships xmlns="{_REL_NS}">'
    f'<Relationship Id="rId1" Type="{_DOC_REL_TYPE}" '
    'Target="word/document.xml"/>'
    "</Relationships>"
)


def encode_docx(
    paragraphs: list[list[str]], deflate: bool = True
) -> bytes:
    """A real minimal .docx: `paragraphs` is a list of paragraphs,
    each a list of RUN texts (styled runs split text nodes — every
    odd run gets a bold rPr so the splitting is structural, not
    cosmetic). `deflate` rotates the zip member compression."""
    runs_xml = []
    for para in paragraphs:
        body = []
        for i, run in enumerate(para):
            rpr = "<w:rPr><w:b/></w:rPr>" if i % 2 else ""
            body.append(
                f"<w:r>{rpr}<w:t xml:space=\"preserve\">"
                f"{escape(run)}</w:t></w:r>"
            )
        runs_xml.append(f"<w:p>{''.join(body)}</w:p>")
    doc = (
        '<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
        f'<w:document xmlns:w="{_W_NS}"><w:body>'
        f"{''.join(runs_xml)}"
        "<w:sectPr/></w:body></w:document>"
    )
    buf = io.BytesIO()
    comp = zipfile.ZIP_DEFLATED if deflate else zipfile.ZIP_STORED
    with zipfile.ZipFile(buf, "w", compression=comp) as z:
        z.writestr("[Content_Types].xml", _CONTENT_TYPES)
        z.writestr("_rels/.rels", _PACKAGE_RELS)
        z.writestr("word/document.xml", doc.encode("utf-8"))
    return buf.getvalue()


def parse_docx(payload: bytes) -> list[str]:
    """Paragraph texts in document order. Runs concatenate; w:tab
    yields TAB, w:br / w:cr yield NEWLINE. ValueError on corrupt
    containers, NotImplementedError on encrypted (OLE/CFB) packages."""
    data = bytes(payload)
    if data[:8] == b"\xd0\xcf\x11\xe0\xa1\xb1\x1a\xe1":
        raise NotImplementedError(
            "encrypted/legacy OLE compound document; only OPC zip "
            "packages are supported"
        )
    if data[:2] != b"PK":
        raise ValueError("not a zip (OPC) package")
    try:
        z = zipfile.ZipFile(io.BytesIO(data))
    except zipfile.BadZipFile as exc:
        raise ValueError(f"corrupt zip container: {exc}") from exc
    with z:
        names = set(z.namelist())
        target = "word/document.xml"
        if "_rels/.rels" in names:  # resolve the main part properly
            rels = ET.fromstring(z.read("_rels/.rels"))
            for rel in rels.findall(f"{{{_REL_NS}}}Relationship"):
                if rel.get("Type") == _DOC_REL_TYPE:
                    target = rel.get("Target", target).lstrip("/")
        if target not in names:
            raise ValueError(f"package has no main part {target!r}")
        root = ET.fromstring(z.read(target))
    body = root.find(f"{{{_W_NS}}}body")
    if body is None:
        raise ValueError("document.xml has no w:body")
    out: list[str] = []
    for p in body.iter(f"{{{_W_NS}}}p"):
        parts: list[str] = []
        for el in p.iter():
            tag = el.tag.rsplit("}", 1)[-1]
            if tag == "t":
                parts.append(el.text or "")
            elif tag == "tab":
                parts.append("\t")
            elif tag in ("br", "cr"):
                parts.append("\n")
        out.append("".join(parts))
    return out


def _doc_layout(doc_id: int, text: str) -> list[list[str]]:
    """Deterministic layout rotation: slice the text into 1-4
    paragraphs at character offsets, each paragraph into 1-3 runs —
    boundaries derived from doc_id so every shape (single run, many
    styled runs, whitespace-straddling splits) occurs in the corpus.
    Lossless: concatenating all runs reproduces the text exactly."""
    n_para = 1 + doc_id % 4
    n = len(text)
    para_cuts = [n * i // n_para for i in range(n_para + 1)]
    paragraphs: list[list[str]] = []
    for pi in range(n_para):
        seg = text[para_cuts[pi] : para_cuts[pi + 1]]
        n_runs = 1 + (doc_id + pi) % 3
        cuts = [len(seg) * i // n_runs for i in range(n_runs + 1)]
        paragraphs.append(
            [seg[cuts[i] : cuts[i + 1]] for i in range(n_runs)]
        )
    return paragraphs


@register(
    "q_text_docx_extract",
    oracle="""
    SELECT doc_id,
           MD5(text) AS text_md5,
           CAST(1 + doc_id % 4 AS INT) AS n_paragraphs,
           OCTET_LENGTH(ENCODE(text)) AS n_bytes
    FROM documents
    WHERE length(text) >= 1
    """,
)
def q_text_docx_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DOCX round trip, byte-exact: every document becomes a REAL OPC
    zip package (deflated members for even doc_ids, stored for odd)
    whose WordprocessingML body rotates 1-4 paragraphs × 1-3 styled
    runs — splits land mid-word and inside whitespace, the places
    naive extractors lose characters — then parse_docx recovers the
    paragraphs, the md5 of their concatenation must equal the source
    text's (oracle-pinned), and the paragraph COUNT must match the
    layout formula. The office-ingestion stage of a corpus pipeline,
    same codec discipline as pdf.py/warc.py (operators/docx.py)."""
    from meta_iterative_mapreduce_spark.operators.multimodal import _spread

    d = load_table(spark, sf_dir, "documents").filter(F.length("text") >= 1)
    src = _spread(d.select("doc_id", "text"), spark)

    def op(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import hashlib

        for pdf in batches:
            ids, md5s, nps, nbs = [], [], [], []
            for doc_id, text in zip(pdf["doc_id"], pdf["text"]):
                doc_id = int(doc_id)
                layout = _doc_layout(doc_id, text)
                blob = encode_docx(layout, deflate=(doc_id % 2 == 0))
                paras = parse_docx(blob)
                joined = "".join(paras)
                if joined != text:
                    raise ValueError(f"extraction drift for doc {doc_id}")
                ids.append(doc_id)
                md5s.append(hashlib.md5(joined.encode()).hexdigest())
                nps.append(len(paras))
                nbs.append(len(joined.encode()))
            yield pd.DataFrame(
                {
                    "doc_id": pd.Series(ids, dtype="int64"),
                    "text_md5": pd.Series(md5s, dtype="object"),
                    "n_paragraphs": pd.Series(nps, dtype="int32"),
                    "n_bytes": pd.Series(nbs, dtype="int64"),
                }
            )

    return src.mapInPandas(
        op,
        schema="doc_id long, text_md5 string, n_paragraphs int, "
        "n_bytes long",
    )
