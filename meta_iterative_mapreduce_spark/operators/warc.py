"""WARC (Web ARChive, ISO 28500) ingestion — the format web-scale
text corpora actually ship in.

A Common-Crawl-style pipeline's first stage splits WARC files into
records and pulls response payloads; everything downstream (language
ID, quality, dedup — all elsewhere in this engine) consumes those
payloads. Implemented from the public WARC 1.1 specification:

- `encode_warc`: writer for warcinfo + response records — version
  line, named headers (WARC-Type, WARC-Record-ID, Content-Length,
  WARC-Target-URI), exact Content-Length payload framing, CRLF CRLF
  record terminator. Two at-rest layouts, both real: PLAIN
  concatenated records, and PER-RECORD GZIP MEMBERS (`gzipped=True`)
  — the `.warc.gz` convention that makes a petabyte archive
  record-seekable (each record is an independent gzip member, so a
  reader can start inflating at any member boundary without touching
  prior bytes).
- `parse_warc`: detects gzip members (splits concatenated members by
  inflating with tail detection — stdlib zlib exposes unused_data
  exactly for this) or walks plain records; parses the version line
  and headers, slices payloads by Content-Length EXACTLY (payloads
  are binary and may contain things that look like record
  boundaries), validates the CRLF CRLF terminator. ValueError on
  corrupt framing; unknown WARC versions raise NotImplementedError.

Spark side: Arrow-batched mapInPandas over _spread, as the codec
family. Reference analog: none (kernel.cu reads numeric stdin).
"""

from __future__ import annotations

import gzip
import zlib
from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from meta_iterative_mapreduce_spark.io import load_table
from meta_iterative_mapreduce_spark.registry import register

_CRLF = b"\r\n"


def _record_bytes(rec_type: str, rec_id: str, payload: bytes,
                  extra: dict[str, str] | None = None) -> bytes:
    headers = {
        "WARC-Type": rec_type,
        "WARC-Record-ID": f"<urn:uuid:{rec_id}>",
        "WARC-Date": "2024-01-01T00:00:00Z",
        "Content-Length": str(len(payload)),
        **(extra or {}),
    }
    out = bytearray(b"WARC/1.1\r\n")
    for k, v in headers.items():
        out += f"{k}: {v}\r\n".encode()
    out += _CRLF + payload + _CRLF + _CRLF
    return bytes(out)


def encode_warc(
    records: list[tuple[str, bytes]], gzipped: bool = False
) -> bytes:
    """`records` is [(target_uri, payload_bytes)] — each becomes a
    response record after a leading warcinfo record. `gzipped` emits
    one INDEPENDENT gzip member per record (the .warc.gz layout)."""
    raw = [
        _record_bytes("warcinfo", "info-0", b"software: mimr-spark\r\n")
    ]
    for i, (uri, payload) in enumerate(records):
        raw.append(
            _record_bytes(
                "response", f"rec-{i}", payload,
                {"WARC-Target-URI": uri},
            )
        )
    if not gzipped:
        return b"".join(raw)
    return b"".join(gzip.compress(r, mtime=0) for r in raw)


def _split_gzip_members(data: bytes) -> list[bytes]:
    """Inflate concatenated gzip members into separate byte strings —
    zlib's unused_data yields each member boundary exactly."""
    out = []
    rest = data
    while rest:
        d = zlib.decompressobj(wbits=31)
        try:
            body = d.decompress(rest)
        except zlib.error as exc:
            raise ValueError(f"bad gzip member: {exc}") from exc
        body += d.flush()
        if not d.eof:
            raise ValueError("truncated gzip member")
        out.append(body)
        rest = d.unused_data
    return out


def parse_warc(payload: bytes) -> list[dict]:
    """All records as [{type, record_id, target_uri, payload}]. Plain
    and per-record-gzip layouts are auto-detected."""
    data = bytes(payload)
    if data[:2] == b"\x1f\x8b":
        chunks = _split_gzip_members(data)
    else:
        chunks = [data]
    records: list[dict] = []
    for chunk in chunks:
        pos = 0
        while pos < len(chunk):
            if chunk[pos : pos + 5] != b"WARC/":
                raise ValueError(
                    f"expected WARC version line at {pos}, got "
                    f"{chunk[pos : pos + 12]!r}"
                )
            line_end = chunk.find(_CRLF, pos)
            version = chunk[pos + 5 : line_end].decode("ascii")
            if not version.startswith(("1.", "0.")):
                raise NotImplementedError(f"WARC version {version}")
            pos = line_end + 2
            headers: dict[str, str] = {}
            while True:
                line_end = chunk.find(_CRLF, pos)
                if line_end == -1:
                    raise ValueError("unterminated WARC header block")
                line = chunk[pos:line_end]
                pos = line_end + 2
                if not line:
                    break
                if b":" not in line:
                    raise ValueError(f"malformed WARC header {line!r}")
                k, v = line.split(b":", 1)
                headers[k.decode("ascii").strip()] = v.decode(
                    "utf-8"
                ).strip()
            if "Content-Length" not in headers:
                raise ValueError("record missing Content-Length")
            n = int(headers["Content-Length"])
            body = chunk[pos : pos + n]
            if len(body) != n:
                raise ValueError(
                    f"payload truncated: {len(body)} of {n} bytes"
                )
            pos += n
            if chunk[pos : pos + 4] != _CRLF + _CRLF:
                raise ValueError("record missing CRLF CRLF terminator")
            pos += 4
            records.append(
                {
                    "type": headers.get("WARC-Type", ""),
                    "record_id": headers.get("WARC-Record-ID", ""),
                    "target_uri": headers.get("WARC-Target-URI"),
                    "payload": body,
                }
            )
    return records


@register(
    "q_text_warc_extract",
    oracle="""
    SELECT doc_id,
           MD5(text) AS payload_md5,
           OCTET_LENGTH(ENCODE(text)) AS n_bytes,
           CONCAT('https://corpus.example/doc/', CAST(doc_id AS VARCHAR))
               AS target_uri
    FROM documents
    WHERE length(text) >= 1
    """,
)
def q_text_warc_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """WARC round trip, byte-exact: every document becomes a response
    record (with a synthetic target URI) in a WARC file that rotates
    the two real at-rest layouts — PLAIN concatenated records for
    even doc_ids, PER-RECORD GZIP MEMBERS (.warc.gz, Common Crawl's
    record-seekable convention) for odd — then the parser recovers
    type, URI, and payload, md5-verified against the source text by
    the oracle. Payloads are arbitrary bytes (no ASCII guard: WARC
    frames by Content-Length, so framing must survive payloads
    containing CRLFs and 'WARC/' look-alikes — the writer includes
    multi-doc batching per file so records truly concatenate)."""
    from meta_iterative_mapreduce_spark.operators.multimodal import _spread

    d = load_table(spark, sf_dir, "documents").filter(F.length("text") >= 1)
    src = _spread(d.select("doc_id", "text"), spark)

    def op(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import hashlib

        for pdf in batches:
            rows = list(zip(pdf["doc_id"], pdf["text"]))
            ids, md5s, nb, uris = [], [], [], []
            # batch 4 docs per WARC file so records genuinely
            # concatenate (framing bugs cannot hide in 1-record files)
            for i in range(0, len(rows), 4):
                group = rows[i : i + 4]
                recs = [
                    (
                        f"https://corpus.example/doc/{int(doc_id)}",
                        text.encode("utf-8"),
                    )
                    for doc_id, text in group
                ]
                gz = bool(int(group[0][0]) % 2)
                warc = encode_warc(recs, gzipped=gz)
                parsed = [
                    r for r in parse_warc(warc) if r["type"] == "response"
                ]
                if len(parsed) != len(group):
                    raise ValueError("record count mismatch")
                for (doc_id, text), rec in zip(group, parsed):
                    if rec["payload"] != text.encode("utf-8"):
                        raise ValueError(
                            f"payload mismatch for doc {doc_id}"
                        )
                    ids.append(doc_id)
                    md5s.append(hashlib.md5(rec["payload"]).hexdigest())
                    nb.append(len(rec["payload"]))
                    uris.append(rec["target_uri"])
            yield pd.DataFrame(
                {
                    "doc_id": pd.Series(ids, dtype="int64"),
                    "payload_md5": pd.Series(md5s, dtype="object"),
                    "n_bytes": pd.Series(nb, dtype="int64"),
                    "target_uri": pd.Series(uris, dtype="object"),
                }
            )

    return src.mapInPandas(
        op,
        schema="doc_id long, payload_md5 string, n_bytes long, "
        "target_uri string",
    )
