"""ISO BMFF (MP4/MOV) container indexing — sample tables without a
codec.

The AVI path (operators/avi.py) proved container-level frame sampling
for the RIFF world; this is its ISO base-media sibling, the container
modern video corpora actually arrive in. A 100 TB video pipeline's
first pass is NOT decoding — it is walking `moov` sample tables to
index frames (offset/size/duration per sample), then reading only the
1/k samples it wants from `mdat` by byte range. Both halves are here,
pure stdlib:

- `encode_mp4_samples`: a minimal spec-valid ISO BMFF writer (ftyp +
  mdat + moov/trak/mdia/minf/stbl with stsd/stts/stsc/stsz/stco) used
  as the deterministic test-fixture generator; chunks samples in
  GROUPS so the stsc chunk-run logic is exercised, not degenerate.
- `parse_mp4_index`: top-level box walk to `moov`, recursive descent
  to `stbl`, full sample-table reconstruction: stsc runs expanded to
  per-chunk sample counts, stsz (uniform or per-sample), stco/co64
  chunk offsets, stts run-length durations → per-sample
  (offset, size, duration) — and, for FRAGMENTED files (the DASH/HLS
  segment layout), the moof path: trex defaults from mvex, tfhd
  base-data-offset / default-base-is-moof addressing, trun per-sample
  tables with default inheritance. Every offset/size is validated
  against the file; corrupt tables raise ValueError; encrypted tracks
  and unsupported layouts raise NotImplementedError honestly.
- `sample_mp4_payloads`: byte-range extraction of every k-th sample —
  the container-level 1/k sampling that never touches a codec.

Spark-side plumbing is the codec family's: Arrow-batched mapInPandas
over `_spread` partitions (operators/multimodal.py), never a driver
loop. Reference analog: none (kernel.cu:92-104 reads numeric stdin).
Box layout is from the public ISO/IEC 14496-12 specification.
"""

from __future__ import annotations

import struct
from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from meta_iterative_mapreduce_spark.io import load_table
from meta_iterative_mapreduce_spark.registry import register


def _box(kind: bytes, payload: bytes) -> bytes:
    return struct.pack(">I", 8 + len(payload)) + kind + payload


def _full(kind: bytes, version: int, flags: int, payload: bytes) -> bytes:
    return _box(kind, struct.pack(">B", version) + flags.to_bytes(3, "big") + payload)


def encode_mp4_samples(
    samples: list[bytes], samples_per_chunk: int = 3
) -> bytes:
    """Minimal ISO BMFF file holding `samples` as one track. Samples
    are grouped `samples_per_chunk` per chunk (last chunk ragged), so
    stsc carries a real run map and stco one offset per chunk — the
    general layout a parser must handle, not one-sample-per-chunk."""
    if not samples:
        raise ValueError("need at least one sample")
    ftyp = _box(b"ftyp", b"isom" + struct.pack(">I", 0x200) + b"isomiso2")
    mdat_payload = b"".join(samples)
    mdat = _box(b"mdat", mdat_payload)
    mdat_data_start = len(ftyp) + 8  # first sample byte's file offset

    n = len(samples)
    spc = max(1, samples_per_chunk)
    chunk_sizes: list[int] = []  # bytes per chunk
    chunk_counts: list[int] = []  # samples per chunk
    i = 0
    while i < n:
        group = samples[i : i + spc]
        chunk_sizes.append(sum(len(s) for s in group))
        chunk_counts.append(len(group))
        i += spc
    offsets = []
    pos = mdat_data_start
    for csize in chunk_sizes:
        offsets.append(pos)
        pos += csize

    # stsc runs: (first_chunk, samples_per_chunk, sample_desc_index)
    runs: list[tuple[int, int]] = []
    for idx, c in enumerate(chunk_counts, start=1):
        if not runs or runs[-1][1] != c:
            runs.append((idx, c))
    stsc = _full(
        b"stsc",
        0,
        0,
        struct.pack(">I", len(runs))
        + b"".join(struct.pack(">III", fc, c, 1) for fc, c in runs),
    )
    stsz = _full(
        b"stsz",
        0,
        0,
        struct.pack(">II", 0, n)
        + b"".join(struct.pack(">I", len(s)) for s in samples),
    )
    stco = _full(
        b"stco",
        0,
        0,
        struct.pack(">I", len(offsets))
        + b"".join(struct.pack(">I", o) for o in offsets),
    )
    stts = _full(b"stts", 0, 0, struct.pack(">III", 1, n, 1))
    # generic sample entry: 'raw ' fourcc, 6 reserved + data_ref_index
    entry = _box(b"raw ", b"\x00" * 6 + struct.pack(">H", 1))
    stsd = _full(b"stsd", 0, 0, struct.pack(">I", 1) + entry)
    stbl = _box(b"stbl", stsd + stts + stsc + stsz + stco)
    dref = _full(
        b"dref", 0, 0, struct.pack(">I", 1) + _full(b"url ", 0, 1, b"")
    )
    dinf = _box(b"dinf", dref)
    minf = _box(b"minf", dinf + stbl)
    mdhd = _full(
        b"mdhd", 0, 0, struct.pack(">IIIIHH", 0, 0, 1000, n, 0x55C4, 0)
    )
    hdlr = _full(
        b"hdlr", 0, 0, struct.pack(">I", 0) + b"vide" + b"\x00" * 12 + b"\x00"
    )
    mdia = _box(b"mdia", mdhd + hdlr + minf)
    tkhd = _full(
        b"tkhd", 0, 7, struct.pack(">IIII", 0, 0, 1, 0) + b"\x00" * 64
    )
    trak = _box(b"trak", tkhd + mdia)
    mvhd = _full(
        b"mvhd",
        0,
        0,
        struct.pack(">IIII", 0, 0, 1000, n) + b"\x00" * 80,
    )
    moov = _box(b"moov", mvhd + trak)
    return ftyp + mdat + moov


def encode_mp4_fragments(fragments: list[list[bytes]]) -> bytes:
    """Fragmented ISO BMFF (the DASH/HLS segment layout): ftyp +
    moov(mvex/trex with track defaults, empty sample tables) + one
    moof/mdat pair per fragment. Each trun carries per-sample sizes
    and a data offset relative to its moof (tfhd sets
    default-base-is-moof); durations come from the trex default, so
    the parser's default-inheritance path is exercised."""
    if not fragments or any(not f for f in fragments):
        raise ValueError("need at least one fragment, none empty")
    ftyp = _box(b"ftyp", b"isom" + struct.pack(">I", 0x200) + b"cmfciso6")
    # movie box with EMPTY sample tables; trex supplies defaults
    entry = _box(b"raw ", b"\x00" * 6 + struct.pack(">H", 1))
    stsd = _full(b"stsd", 0, 0, struct.pack(">I", 1) + entry)
    stbl = _box(
        b"stbl",
        stsd
        + _full(b"stts", 0, 0, struct.pack(">I", 0))
        + _full(b"stsc", 0, 0, struct.pack(">I", 0))
        + _full(b"stsz", 0, 0, struct.pack(">II", 0, 0))
        + _full(b"stco", 0, 0, struct.pack(">I", 0)),
    )
    dref = _full(
        b"dref", 0, 0, struct.pack(">I", 1) + _full(b"url ", 0, 1, b"")
    )
    minf = _box(b"minf", _box(b"dinf", dref) + stbl)
    mdhd = _full(
        b"mdhd", 0, 0, struct.pack(">IIIIHH", 0, 0, 1000, 0, 0x55C4, 0)
    )
    hdlr = _full(
        b"hdlr", 0, 0, struct.pack(">I", 0) + b"vide" + b"\x00" * 12 + b"\x00"
    )
    mdia = _box(b"mdia", mdhd + hdlr + minf)
    tkhd = _full(
        b"tkhd", 0, 7, struct.pack(">IIII", 0, 0, 1, 0) + b"\x00" * 64
    )
    trak = _box(b"trak", tkhd + mdia)
    # trex: track 1, sample-desc 1, default duration 1, size 0, flags 0
    trex = _full(b"trex", 0, 0, struct.pack(">IIIII", 1, 1, 1, 0, 0))
    mvhd = _full(
        b"mvhd", 0, 0, struct.pack(">IIII", 0, 0, 1000, 0) + b"\x00" * 80
    )
    moov = _box(b"moov", mvhd + _box(b"mvex", trex) + trak)

    out = bytearray(ftyp + moov)
    for seq, samples in enumerate(fragments, start=1):
        mfhd = _full(b"mfhd", 0, 0, struct.pack(">I", seq))
        # tfhd: track 1, flags = default-base-is-moof (0x20000)
        tfhd = _full(b"tfhd", 0, 0x020000, struct.pack(">I", 1))
        # trun: data-offset (0x01) + sample-size (0x200)
        trun_payload = struct.pack(">I", len(samples))
        trun_payload += struct.pack(">i", 0)  # patched below
        trun_payload += b"".join(
            struct.pack(">I", len(s)) for s in samples
        )
        trun = _full(b"trun", 0, 0x000201, trun_payload)
        traf = _box(b"traf", tfhd + trun)
        moof = _box(b"moof", mfhd + traf)
        # data offset: from moof start to first mdat payload byte
        data_offset = len(moof) + 8
        moof = bytearray(moof)
        off_at = moof.find(b"trun") + 4 + 4 + 4  # kind+fullbox+count
        struct.pack_into(">i", moof, off_at, data_offset)
        out += bytes(moof) + _box(b"mdat", b"".join(samples))
    return bytes(out)


def _walk_children(data: bytes, start: int, end: int):
    """Yield (kind, payload_start, payload_end) for each child box."""
    pos = start
    while pos < end:
        if pos + 8 > end:
            raise ValueError("truncated box header")
        (size,) = struct.unpack(">I", data[pos : pos + 4])
        kind = data[pos + 4 : pos + 8]
        body = pos + 8
        if size == 1:  # 64-bit largesize
            if pos + 16 > end:
                raise ValueError("truncated largesize box")
            (size,) = struct.unpack(">Q", data[pos + 8 : pos + 16])
            body = pos + 16
        elif size == 0:  # box extends to end of enclosing scope
            size = end - pos
        if size < body - pos or pos + size > end:
            raise ValueError(f"box {kind!r} size {size} out of bounds")
        yield kind, body, pos + size
        pos += size


def _find_box(data: bytes, start: int, end: int, path: list[bytes]):
    """Descend a box path; returns (payload_start, payload_end)."""
    kind, rest = path[0], path[1:]
    for k, s, e in _walk_children(data, start, end):
        if k == kind:
            if not rest:
                return s, e
            return _find_box(data, s, e, rest)
    raise ValueError(f"missing box {kind!r}")


def parse_mp4_index(payload: bytes) -> list[dict]:
    """Reconstruct the sample index of the FIRST track: a list of
    {sample, offset, size, duration} in presentation order. For
    progressive files: stsc (chunk runs) + stsz (sizes) + stco/co64
    (chunk offsets) + stts (duration runs). For fragmented files
    (any moof present): per-fragment tfhd/trun tables with
    tfhd→trex default inheritance (_parse_fragmented). Raises
    ValueError on corrupt tables (counts disagreeing, offsets beyond
    the file) — struct.error from a table truncated mid-field is
    normalized to ValueError so callers need one except clause."""
    try:
        return _parse_index(payload)
    except struct.error as exc:
        raise ValueError(f"truncated MP4 table: {exc}") from exc


def _parse_index(payload: bytes) -> list[dict]:
    data = bytes(payload)
    tops = list(_walk_children(data, 0, len(data)))
    kinds = [k for k, _, _ in tops]
    if b"moov" not in kinds:
        raise ValueError("no moov box")
    if b"moof" in kinds:
        return _parse_fragmented(data, tops)
    moov_s, moov_e = next((s, e) for k, s, e in tops if k == b"moov")
    stbl_s, stbl_e = _find_box(
        data, moov_s, moov_e, [b"trak", b"mdia", b"minf", b"stbl"]
    )
    boxes = {k: (s, e) for k, s, e in _walk_children(data, stbl_s, stbl_e)}

    def full_payload(kind: bytes, alt: bytes | None = None):
        key = kind if kind in boxes else alt
        if key is None or key not in boxes:
            raise ValueError(f"missing {kind!r} in stbl")
        s, e = boxes[key]
        if e - s < 4:
            raise ValueError(f"truncated {key!r}")
        version = data[s]
        return key, version, s + 4, e

    # stsz: uniform size or per-sample table
    _, _, s, e = full_payload(b"stsz")
    uniform, n_samples = struct.unpack(">II", data[s : s + 8])
    if uniform:
        sizes = [uniform] * n_samples
    else:
        if e - (s + 8) < 4 * n_samples:
            raise ValueError("stsz table shorter than sample count")
        sizes = list(
            struct.unpack(f">{n_samples}I", data[s + 8 : s + 8 + 4 * n_samples])
        )

    # stco/co64: chunk offsets
    key, _, s, e = full_payload(b"stco", b"co64")
    (n_chunks,) = struct.unpack(">I", data[s : s + 4])
    width, fmt = (4, "I") if key == b"stco" else (8, "Q")
    if e - (s + 4) < width * n_chunks:
        raise ValueError(f"{key!r} table shorter than chunk count")
    chunk_offsets = list(
        struct.unpack(f">{n_chunks}{fmt}", data[s + 4 : s + 4 + width * n_chunks])
    )

    # stsc: (first_chunk, samples_per_chunk) runs → per-chunk counts
    _, _, s, e = full_payload(b"stsc")
    (n_runs,) = struct.unpack(">I", data[s : s + 4])
    runs = [
        struct.unpack(">III", data[s + 4 + 12 * i : s + 16 + 12 * i])
        for i in range(n_runs)
    ]
    counts: list[int] = []
    for i, (first, spc, _desc) in enumerate(runs):
        last = runs[i + 1][0] - 1 if i + 1 < n_runs else n_chunks
        if first < 1 or last < first - 1:
            raise ValueError("stsc chunk runs not increasing")
        counts.extend([spc] * (last - first + 1))
    if len(counts) != n_chunks or sum(counts) != n_samples:
        raise ValueError(
            f"stsc maps {sum(counts)} samples over {len(counts)} chunks; "
            f"stsz declares {n_samples}, stco {n_chunks}"
        )

    # stts: duration runs
    _, _, s, e = full_payload(b"stts")
    (n_druns,) = struct.unpack(">I", data[s : s + 4])
    durations: list[int] = []
    for i in range(n_druns):
        cnt, delta = struct.unpack(">II", data[s + 4 + 8 * i : s + 12 + 8 * i])
        durations.extend([delta] * cnt)
    if len(durations) != n_samples:
        raise ValueError("stts durations disagree with sample count")

    index = []
    si = 0
    for ci, (coff, ccount) in enumerate(zip(chunk_offsets, counts)):
        pos = coff
        for _ in range(ccount):
            size = sizes[si]
            if pos + size > len(data):
                raise ValueError(
                    f"sample {si} at {pos}+{size} beyond file end"
                )
            index.append(
                {
                    "sample": si,
                    "offset": pos,
                    "size": size,
                    "duration": durations[si],
                }
            )
            pos += size
            si += 1
    return index


def _parse_fragmented(data: bytes, tops) -> list[dict]:
    """Fragmented-file index: trex defaults from moov/mvex, then one
    tfhd+trun per moof. Supported addressing: explicit
    base-data-offset, or default-base-is-moof, or the spec's implicit
    first-traf default (offsets relative to moof start); per-sample
    sizes/durations fall back tfhd default → trex default."""
    moov_s, moov_e = next((s, e) for k, s, e in tops if k == b"moov")
    trex_dur, trex_size = None, None
    try:
        trex_s, trex_e = _find_box(data, moov_s, moov_e, [b"mvex", b"trex"])
        _tid, _desc, trex_dur, trex_size, _flags = struct.unpack(
            ">IIIII", data[trex_s + 4 : trex_s + 24]
        )
    except ValueError:
        pass

    index: list[dict] = []
    si = 0
    for kind, moof_body, moof_end in tops:
        if kind != b"moof":
            continue
        moof_start = moof_body - 8
        traf_s, traf_e = _find_box(data, moof_body, moof_end, [b"traf"])
        boxes = list(_walk_children(data, traf_s, traf_e))
        tfhds = [(s, e) for k, s, e in boxes if k == b"tfhd"]
        truns = [(s, e) for k, s, e in boxes if k == b"trun"]
        if len(tfhds) != 1 or not truns:
            raise ValueError("traf needs one tfhd and at least one trun")
        ts, te = tfhds[0]
        tf_flags = int.from_bytes(data[ts + 1 : ts + 4], "big")
        pos = ts + 4 + 4  # fullbox header + track id
        base = moof_start  # default + default-base-is-moof both land here
        if tf_flags & 0x01:  # base-data-offset-present (u64)
            (base,) = struct.unpack(">Q", data[pos : pos + 8])
            pos += 8
        if tf_flags & 0x02:
            pos += 4  # sample-description-index
        def_dur = def_size = None
        if tf_flags & 0x08:
            (def_dur,) = struct.unpack(">I", data[pos : pos + 4])
            pos += 4
        if tf_flags & 0x10:
            (def_size,) = struct.unpack(">I", data[pos : pos + 4])
            pos += 4
        if def_dur is None:
            def_dur = trex_dur
        if def_size is None:
            def_size = trex_size

        for rs, re_ in truns:
            tr_flags = int.from_bytes(data[rs + 1 : rs + 4], "big")
            p = rs + 4
            (n_samples,) = struct.unpack(">I", data[p : p + 4])
            p += 4
            run_pos = base
            if tr_flags & 0x01:  # data-offset-present (signed)
                (doff,) = struct.unpack(">i", data[p : p + 4])
                p += 4
                run_pos = base + doff
            if tr_flags & 0x04:
                p += 4  # first-sample-flags
            per_dur = bool(tr_flags & 0x100)
            per_size = bool(tr_flags & 0x200)
            per_flags = bool(tr_flags & 0x400)
            per_cts = bool(tr_flags & 0x800)
            for _ in range(n_samples):
                dur, size = def_dur, def_size
                if per_dur:
                    (dur,) = struct.unpack(">I", data[p : p + 4])
                    p += 4
                if per_size:
                    (size,) = struct.unpack(">I", data[p : p + 4])
                    p += 4
                if per_flags:
                    p += 4
                if per_cts:
                    p += 4
                if p > re_:
                    raise ValueError("trun table truncated")
                if size is None or dur is None:
                    raise ValueError(
                        "sample size/duration has no per-sample, tfhd, "
                        "or trex value"
                    )
                if run_pos + size > len(data):
                    raise ValueError(
                        f"fragment sample {si} at {run_pos}+{size} "
                        "beyond file end"
                    )
                index.append(
                    {
                        "sample": si,
                        "offset": run_pos,
                        "size": size,
                        "duration": dur,
                    }
                )
                run_pos += size
                si += 1
    if not index:
        raise ValueError("fragmented file contains no trun samples")
    return index


def sample_mp4_payloads(payload: bytes, every_k: int = 2) -> list[bytes]:
    """Container-level 1/k sampling: extract every k-th sample's bytes
    by offset/size — no codec, no read of the skipped samples (on an
    object store these are ranged GETs)."""
    data = bytes(payload)
    return [
        data[s["offset"] : s["offset"] + s["size"]]
        for s in parse_mp4_index(data)[::every_k]
    ]


@register(
    "q_multimodal_mp4_index",
    oracle="""
    WITH dims AS (
        SELECT doc_id, text,
               CAST(doc_id % 7 + 3 AS INT) AS cs,
               CAST(LEAST(octet_length(encode(text)) // (doc_id % 7 + 3),
                          32) AS INT) AS n
        FROM documents
        WHERE octet_length(encode(text)) = length(text)
          AND octet_length(encode(text)) >= doc_id % 7 + 3
    )
    SELECT d.doc_id,
           CAST(d.n AS BIGINT) AS n_samples,
           CAST(d.n * d.cs AS BIGINT) AS total_bytes,
           CAST(SUM(CASE WHEN ((t.i - 1) // d.cs) % 2 = 0
                         THEN ascii(SUBSTR(d.text, CAST(t.i AS INT), 1))
                         ELSE 0 END) AS BIGINT) AS sampled_byte_sum
    FROM dims d,
         UNNEST(generate_series(1, d.n * d.cs)) AS t(i)
    GROUP BY d.doc_id, d.n, d.cs
    """,
)
def q_multimodal_mp4_index(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MP4 round trip at the CONTAINER level: each ASCII document's
    byte plane becomes the sample stream of a muxed ISO BMFF file
    (sample size doc_id%7+3, ≤32 samples, 3-sample chunks so stsc
    carries real runs), the parser reconstructs the sample index from
    the tables alone, and every 2nd sample is extracted by byte range
    — the oracle recomputes the sampled byte sum straight from the
    source text, so any indexing defect (stsc expansion, chunk offset
    arithmetic, size table) breaks the hash. No codec involved: this
    certifies the index/sampling layer a video pipeline runs FIRST."""
    from meta_iterative_mapreduce_spark.operators.multimodal import _spread

    d = load_table(spark, sf_dir, "documents").filter(
        (F.length(F.encode("text", "UTF-8")) == F.length("text"))
        & (F.length(F.encode("text", "UTF-8")) >= F.col("doc_id") % 7 + 3)
    )
    src = _spread(
        d.select("doc_id", F.encode("text", "UTF-8").alias("payload")), spark
    )

    def op(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, ns, tb, sbs = [], [], [], []
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                data = bytes(payload)
                cs = int(doc_id) % 7 + 3
                n = min(len(data) // cs, 32)
                samples = [data[i * cs : (i + 1) * cs] for i in range(n)]
                if int(doc_id) % 2:  # fragmented (DASH-style) layout
                    frags = [samples[i : i + 4] for i in range(0, n, 4)]
                    mp4 = encode_mp4_fragments(frags)
                else:  # progressive layout
                    mp4 = encode_mp4_samples(samples, samples_per_chunk=3)
                idx = parse_mp4_index(mp4)
                if [s["size"] for s in idx] != [cs] * n:
                    raise ValueError("index sizes disagree after mux")
                picked = sample_mp4_payloads(mp4, every_k=2)
                if picked != samples[::2]:
                    raise ValueError("sampled payloads disagree")
                ids.append(doc_id)
                ns.append(n)
                tb.append(n * cs)
                sbs.append(sum(sum(s) for s in picked))
            yield pd.DataFrame(
                {
                    "doc_id": pd.Series(ids, dtype="int64"),
                    "n_samples": pd.Series(ns, dtype="int64"),
                    "total_bytes": pd.Series(tb, dtype="int64"),
                    "sampled_byte_sum": pd.Series(sbs, dtype="int64"),
                }
            )

    return src.mapInPandas(
        op,
        schema="doc_id long, n_samples long, total_bytes long, "
        "sampled_byte_sum long",
    )
