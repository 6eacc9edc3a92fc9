"""PDF text extraction — the document container of real LLM corpora.

A text-corpus pipeline's PDF stage does not render pages; it walks
the object graph to content streams, inflates them (FlateDecode is
stdlib zlib), and pulls the text-show operators. Both halves here,
pure stdlib, from the public PDF 1.7 (ISO 32000-1) specification:

- `encode_simple_pdf`: a minimal spec-valid writer — catalog → pages
  → page(s) with one FlateDecode content stream each, literal strings
  with the full escape set (backslash, parens, octal), a real xref
  table + trailer. The fixture generator, and honest enough that the
  extractor cannot cheat on framing.
- `extract_pdf_text`: object scan for `stream` objects, FlateDecode
  (via /Filter detection) or raw, then a content-stream tokenizer for
  `Tj` (show string) and `TJ` (show array with kerning) collecting
  literal strings with escape decoding (\\\\, \\(, \\), \\n, \\r,
  \\t, \\b, \\f, octal \\ddd, line continuations). Pages concatenate
  in object order; ValueError on corrupt framing (bad header,
  stream without endstream, undecodable Flate).

Scope guards (honest): encrypted PDFs, cross-reference STREAMS
(compressed xref), and non-Flate filters raise NotImplementedError.
Hex strings <...> are supported; CID/Type0 composite-font text (ToUnicode
remapping) is out of scope and surfaces as raw bytes, documented.

Spark side: Arrow-batched mapInPandas over _spread, as the whole
codec family. Reference analog: none (kernel.cu reads numeric stdin).
"""

from __future__ import annotations

import re
import zlib
from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from meta_iterative_mapreduce_spark.io import load_table
from meta_iterative_mapreduce_spark.registry import register


def _escape_pdf_string(s: bytes) -> bytes:
    out = bytearray()
    for b in s:
        if b in (0x5C, 0x28, 0x29):  # \ ( )
            out += b"\\" + bytes([b])
        elif 32 <= b < 127:
            out.append(b)
        else:
            out += f"\\{b:03o}".encode()
    return bytes(out)


def encode_simple_pdf(page_texts: list[str]) -> bytes:
    """One-column text PDF: each entry of `page_texts` becomes a page
    whose FlateDecode content stream shows the text as one Tj per
    line (plus a TJ on the first line to exercise array shows)."""
    if not page_texts:
        raise ValueError("need at least one page")
    objects: list[bytes] = []  # 1-indexed object bodies

    n_pages = len(page_texts)
    page_obj_ids = [4 + 2 * i for i in range(n_pages)]
    kids = " ".join(f"{i} 0 R" for i in page_obj_ids)
    objects.append(b"<< /Type /Catalog /Pages 2 0 R >>")  # obj 1
    objects.append(
        f"<< /Type /Pages /Kids [{kids}] /Count {n_pages} >>".encode()
    )  # obj 2
    objects.append(
        b"<< /Type /Font /Subtype /Type1 /BaseFont /Helvetica >>"
    )  # obj 3
    for i, text in enumerate(page_texts):
        content = bytearray(b"BT /F1 11 Tf 36 720 Td 13 TL\n")
        for j, line in enumerate(text.split("\n")):
            raw = line.encode("utf-8")
            esc = _escape_pdf_string(raw)
            if j == 0:
                # TJ array show with a kerning number between halves
                mid = len(raw) // 2
                a = _escape_pdf_string(raw[:mid])
                b_ = _escape_pdf_string(raw[mid:])
                content += b"[(" + a + b") -250 (" + b_ + b")] TJ T*\n"
            else:
                content += b"(" + esc + b") Tj T*\n"
        content += b"ET"
        flate = zlib.compress(bytes(content))
        objects.append(
            f"<< /Type /Page /Parent 2 0 R /MediaBox [0 0 612 792] "
            f"/Resources << /Font << /F1 3 0 R >> >> "
            f"/Contents {page_obj_ids[i] + 1} 0 R >>".encode()
        )
        objects.append(
            (
                f"<< /Length {len(flate)} /Filter /FlateDecode >>\n"
                "stream\n"
            ).encode()
            + flate
            + b"\nendstream"
        )

    out = bytearray(b"%PDF-1.7\n%\xe2\xe3\xcf\xd3\n")
    offsets = [0]  # object 0 is the free head
    for i, body in enumerate(objects, start=1):
        offsets.append(len(out))
        out += f"{i} 0 obj\n".encode() + body + b"\nendobj\n"
    xref_at = len(out)
    out += f"xref\n0 {len(objects) + 1}\n".encode()
    out += b"0000000000 65535 f \n"
    for off in offsets[1:]:
        out += f"{off:010d} 00000 n \n".encode()
    out += (
        f"trailer\n<< /Size {len(objects) + 1} /Root 1 0 R >>\n"
        f"startxref\n{xref_at}\n%%EOF"
    ).encode()
    return bytes(out)


_ESCAPES = {
    0x6E: b"\n", 0x72: b"\r", 0x74: b"\t",
    0x62: b"\x08", 0x66: b"\x0c",
    0x28: b"(", 0x29: b")", 0x5C: b"\\",
}


def _decode_pdf_string(body: bytes) -> bytes:
    """Literal string body (between the balanced parens) → bytes."""
    out = bytearray()
    i = 0
    while i < len(body):
        b = body[i]
        if b != 0x5C:
            out.append(b)
            i += 1
            continue
        if i + 1 >= len(body):
            break
        nxt = body[i + 1]
        if nxt in _ESCAPES:
            out += _ESCAPES[nxt]
            i += 2
        elif 0x30 <= nxt <= 0x37:  # octal, up to 3 digits
            j = i + 1
            oct_digits = b""
            while j < len(body) and len(oct_digits) < 3 and 0x30 <= body[j] <= 0x37:
                oct_digits += bytes([body[j]])
                j += 1
            out.append(int(oct_digits, 8) & 0xFF)
            i = j
        elif nxt in (0x0A, 0x0D):  # line continuation
            i += 2
            if nxt == 0x0D and i < len(body) and body[i] == 0x0A:
                i += 1
        else:  # unknown escape: spec says drop the backslash
            out.append(nxt)
            i += 2
    return bytes(out)


def _iter_literal_strings(content: bytes):
    """Yield (string_bytes, end_pos) for each balanced literal string."""
    i = 0
    n = len(content)
    while i < n:
        if content[i] != 0x28:  # (
            i += 1
            continue
        depth = 1
        j = i + 1
        body = bytearray()
        while j < n and depth:
            b = content[j]
            if b == 0x5C and j + 1 < n:
                body += content[j : j + 2]
                j += 2
                continue
            if b == 0x28:
                depth += 1
            elif b == 0x29:
                depth -= 1
                if depth == 0:
                    break
            body.append(b)
            j += 1
        if depth:
            raise ValueError("unbalanced literal string")
        yield bytes(body), j + 1
        i = j + 1


def _extract_stream_text(content: bytes) -> bytes:
    """Collect the strings shown by Tj / TJ / ' / " operators, in
    order. Strategy: scan literal and hex strings; after each string
    (or TJ array), peek at the next operator token to decide whether
    it is SHOWN text or something else (e.g. a /Name or dict value)."""
    out = bytearray()
    pos = 0
    n = len(content)
    pending: list[bytes] = []  # strings inside a [ ... ] TJ array
    in_array = False
    while pos < n:
        c = content[pos]
        if c == 0x5B:  # [
            in_array = True
            pending = []
            pos += 1
            continue
        if c == 0x5D and in_array:  # ] — expect TJ
            m = re.match(rb"\s*(TJ)", content[pos + 1 :])
            if m:
                out += b"".join(pending)
                pos += 1 + m.end()
            else:
                pos += 1
            in_array = False
            pending = []
            continue
        if c == 0x28:  # literal string
            for s, end in _iter_literal_strings(content[pos:]):
                string = _decode_pdf_string(s)
                pos += end
                break
            if in_array:
                pending.append(string)
                continue
            m = re.match(rb"\s*(Tj|')", content[pos:])
            if m:
                out += string
                pos += m.end()
            continue
        if c == 0x3C and pos + 1 < n and content[pos + 1] != 0x3C:  # <hex>
            close = content.find(b">", pos)
            if close == -1:
                raise ValueError("unterminated hex string")
            hexbody = re.sub(rb"\s", b"", content[pos + 1 : close])
            if len(hexbody) % 2:
                hexbody += b"0"
            string = bytes.fromhex(hexbody.decode("ascii"))
            pos = close + 1
            if in_array:
                pending.append(string)
                continue
            m = re.match(rb"\s*(Tj|')", content[pos:])
            if m:
                out += string
                pos += m.end()
            continue
        if c == 0x54 and pos + 1 < n and content[pos + 1] == 0x2A:  # T*
            out += b"\n"
            pos += 2
            continue
        pos += 1
    return bytes(out)


def extract_pdf_text(payload: bytes) -> str:
    """Concatenated shown text of every content stream, pages joined
    by form feed. NOTE: shown text may itself contain form feeds
    (\\f is a legal PDF string escape); use `extract_pdf_pages` when
    page boundaries must survive arbitrary content."""
    return "\x0c".join(extract_pdf_pages(payload))


def extract_pdf_pages(payload: bytes) -> list[str]:
    """Shown text of every content stream, one entry per stream, in
    object order. See module docstring for scope."""
    data = bytes(payload)
    if not data.startswith(b"%PDF-"):
        raise ValueError("bad PDF header")
    if b"/Encrypt" in data:
        raise NotImplementedError("encrypted PDFs not supported")
    pages: list[bytes] = []
    for m in re.finditer(rb"<<(.{0,512}?)>>\s*stream\r?\n", data, re.S):
        d = m.group(1)
        if b"/Type /XRef" in d or b"/Type/XRef" in d:
            raise NotImplementedError("cross-reference streams")
        start = m.end()
        # (?!\d) stops backtracking from shrinking the capture (e.g.
        # '/Length 12 0 R' would otherwise match '1' and defeat the
        # indirect-reference lookahead)
        lm = re.search(rb"/Length\s+(\d+)(?!\d)(?!\s+\d+\s+R)", d)
        if lm:  # direct /Length: slice exactly — NEVER rstrip, the
            # compressed bytes may legitimately end in 0x0a/0x0d
            end = start + int(lm.group(1))
            if data[end : end + 32].lstrip(b"\r\n")[:9] != b"endstream":
                raise ValueError("stream /Length disagrees with endstream")
            raw = data[start:end]
        else:  # indirect /Length: scan, strip at most ONE EOL
            end = data.find(b"endstream", start)
            if end == -1:
                raise ValueError("stream without endstream")
            raw = data[start:end]
            if raw.endswith(b"\r\n"):
                raw = raw[:-2]
            elif raw.endswith((b"\n", b"\r")):
                raw = raw[:-1]
        if b"FlateDecode" in d:
            try:
                raw = zlib.decompress(raw)
            except zlib.error as exc:
                raise ValueError(f"bad FlateDecode stream: {exc}") from exc
        elif b"/Filter" in d:
            raise NotImplementedError(
                f"unsupported stream filter in {d[:80]!r}"
            )
        pages.append(_extract_stream_text(raw))
    return [p.decode("utf-8", errors="replace") for p in pages]


@register(
    "q_text_pdf_extract",
    oracle="""
    SELECT doc_id,
           MD5(text) AS text_md5,
           OCTET_LENGTH(ENCODE(text)) AS n_bytes
    FROM documents
    WHERE octet_length(encode(text)) = length(text)
      AND length(text) >= 1
    """,
)
def q_text_pdf_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PDF → text, byte-exact: each document is typeset into a real
    multi-page PDF (FlateDecode content streams, Tj + kerned-TJ shows,
    full escape set, xref + trailer) and the extractor must recover
    the EXACT original text — md5-compared against the source by the
    oracle. Pages split on line boundaries every 40 lines; T* line
    advances reconstruct the newlines, so framing errors anywhere in
    writer or extractor break the hash."""
    from meta_iterative_mapreduce_spark.operators.multimodal import _spread

    d = load_table(spark, sf_dir, "documents").filter(
        (F.length(F.encode("text", "UTF-8")) == F.length("text"))
        & (F.length("text") >= 1)
    )
    src = _spread(d.select("doc_id", "text"), spark)

    def op(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import hashlib

        for pdf_batch in batches:
            ids, md5s, nb = [], [], []
            for doc_id, text in zip(pdf_batch["doc_id"], pdf_batch["text"]):
                lines = text.split("\n")
                page_texts = [
                    "\n".join(lines[i : i + 40])
                    for i in range(0, len(lines), 40)
                ] or [""]
                pdf = encode_simple_pdf(page_texts)
                # page list, not the \x0c join — shown text may
                # itself contain form feeds
                back = extract_pdf_pages(pdf)
                # T* emits a trailing newline per line incl. the last;
                # pages re-join on the 40-line boundaries
                got_pages = [
                    p[:-1] if p.endswith("\n") else p for p in back
                ]
                got = "\n".join(got_pages)
                if got != text:
                    raise ValueError(
                        f"PDF round trip altered doc {doc_id}"
                    )
                ids.append(doc_id)
                md5s.append(hashlib.md5(text.encode("utf-8")).hexdigest())
                nb.append(len(text.encode("utf-8")))
            yield pd.DataFrame(
                {
                    "doc_id": pd.Series(ids, dtype="int64"),
                    "text_md5": pd.Series(md5s, dtype="object"),
                    "n_bytes": pd.Series(nb, dtype="int64"),
                }
            )

    return src.mapInPandas(
        op, schema="doc_id long, text_md5 string, n_bytes long"
    )
