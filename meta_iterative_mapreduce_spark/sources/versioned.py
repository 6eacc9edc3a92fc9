"""Versioned table log with time travel — the minimal log-structured
lakehouse mechanism (manifest-per-version listing immutable parquet
files), built on nothing but Spark + a filesystem.

Like Delta/Iceberg's core trick, a version is a MANIFEST, not a data
copy: `append_version` writes only the new rows' files and its
manifest references the previous version's files unchanged, so
appending N rows costs O(N) I/O regardless of table size, old
versions stay readable forever (time travel), and readers see an
atomic file list (the manifest is written last, via temp + rename).
The reference has no storage layer at all (kernel.cu reads stdin);
this is the engine-side table format a 100 TB pipeline checkpoints
into. Compaction (plans/layout.py::compact_files) and MERGE
(operators/merge.py) compose with it: compact rewrites files and
publishes a new manifest; merge writes a new snapshot version.

Schema evolution: each manifest records the table schema; appends may
add or omit columns (merge-on-read fills nulls, the manifest pins
projection order) but a type change fails at commit time — see
_merged_schema.
"""

from __future__ import annotations

import json
import os
import uuid

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import StructType

_MANIFEST_DIR = "_manifests"
_DATA_DIR = "data"


def _merged_schema(prev: dict | None, new: dict) -> dict:
    """Schema evolution contract: a later batch may ADD columns (old
    files read back with nulls there — merge-on-read) and may OMIT
    columns (its rows read back with nulls), but may never CHANGE a
    column's type — silent type drift is the classic lakehouse
    corruption, so it fails the commit, not the eventual reader.
    Column order is prev's fields then additions in arrival order, so
    the table's projection is stable across versions."""
    if prev is None:
        return new
    by_name = {f["name"]: f for f in prev["fields"]}
    out = list(prev["fields"])
    for f in new["fields"]:
        old = by_name.get(f["name"])
        if old is None:
            out.append(f)
        elif old["type"] != f["type"]:
            raise ValueError(
                f"schema evolution cannot change column {f['name']!r} "
                f"from {old['type']!r} to {f['type']!r}; add a new "
                "column instead"
            )
    return {"type": "struct", "fields": out}


def _manifest_path(table: str, version: int) -> str:
    return os.path.join(table, _MANIFEST_DIR, f"v{version:06d}.json")


def versions(table: str) -> list[int]:
    """Sorted committed versions (manifest files present)."""
    mdir = os.path.join(table, _MANIFEST_DIR)
    if not os.path.isdir(mdir):
        return []
    out = []
    for f in os.listdir(mdir):
        if f.startswith("v") and f.endswith(".json"):
            out.append(int(f[1:-5]))
    return sorted(out)


def _commit(
    table: str, version: int, files: list[str], n_rows: int, **extra
) -> None:
    """Publish the manifest atomically with put-if-absent semantics:
    write a temp file, then `os.link(tmp, final)` — link(2) fails with
    EEXIST if the path exists, unlike rename(2) which silently replaces
    it (a check-then-rename guard would be TOCTOU-racy: two concurrent
    committers of the same version could both pass the exists check and
    the loser's manifest would be clobbered). Readers never observe a
    partial manifest, and of two racing committers exactly one wins;
    the loser raises and must retry at the next version number. On
    object stores without hard links the equivalent primitive is a
    conditional put (e.g. HTTP If-None-Match) — single-writer-per-table
    is the documented contract where neither exists."""
    mdir = os.path.join(table, _MANIFEST_DIR)
    os.makedirs(mdir, exist_ok=True)
    final = _manifest_path(table, version)
    tmp = final + f".tmp-{uuid.uuid4().hex}"
    with open(tmp, "w") as fh:
        json.dump(
            {"version": version, "files": files, "n_rows": n_rows, **extra},
            fh,
        )
    try:
        os.link(tmp, final)  # atomic put-if-absent: EEXIST if committed
    except FileExistsError:
        raise ValueError(f"version {version} already committed") from None
    except OSError as exc:  # pragma: no cover - filesystem-dependent
        raise OSError(
            f"versioned table at {table!r} needs a filesystem with hard "
            "links for atomic put-if-absent manifest publishes "
            "(exFAT/some NFS mounts lack them); move the table or use "
            "a conditional-put object store"
        ) from exc
    finally:
        os.unlink(tmp)


def _write_data_files(df: DataFrame, table: str, version: int) -> list[str]:
    """Materialize df as immutable parquet files under a
    version-scoped directory; returns table-relative file paths."""
    sub = os.path.join(_DATA_DIR, f"v{version:06d}-{uuid.uuid4().hex[:8]}")
    df.write.mode("error").parquet(os.path.join(table, sub))
    out = [
        os.path.join(sub, f)
        for f in os.listdir(os.path.join(table, sub))
        if f.endswith(".parquet")
    ]
    return sorted(out)


def write_version(df: DataFrame, table: str) -> int:
    """Commit df as a full snapshot (next version). Returns version."""
    vs = versions(table)
    v = (vs[-1] + 1) if vs else 1
    files = _write_data_files(df, table, v)
    _commit(table, v, files, df.count(), schema=df.schema.jsonValue())
    return v


def append_version(df: DataFrame, table: str) -> int:
    """Commit df's rows APPENDED to the latest version: writes only the
    new files; the manifest references the previous files unchanged
    (log-structured append — no rewrite of existing data). The batch's
    schema may evolve vs the table's (see _merged_schema): additions
    and omissions merge on read as nulls, type changes fail HERE, at
    commit time, before any file is referenced by a manifest."""
    vs = versions(table)
    if not vs:
        return write_version(df, table)
    prev = json.load(open(_manifest_path(table, vs[-1])))
    schema = _merged_schema(prev.get("schema"), df.schema.jsonValue())
    v = vs[-1] + 1
    new_files = _write_data_files(df, table, v)
    _commit(
        table,
        v,
        prev["files"] + new_files,
        prev["n_rows"] + df.count(),
        schema=schema,
    )
    return v


def read_version(
    spark: SparkSession, table: str, version: int | None = None
) -> DataFrame:
    """Time-travel read: the exact immutable file list of `version`
    (latest if None)."""
    vs = versions(table)
    if not vs:
        raise FileNotFoundError(f"no committed versions in {table}")
    v = vs[-1] if version is None else version
    if v not in vs:
        raise ValueError(f"version {v} not in {vs}")
    m = json.load(open(_manifest_path(table, v)))
    paths = [os.path.join(table, f) for f in m["files"]]
    if "schema" not in m:  # pre-evolution manifest: plain read
        return spark.read.parquet(*paths)
    # merge-on-read: files written before a column was added simply
    # lack it; mergeSchema unions the file footers and fills nulls.
    # The manifest schema then pins projection ORDER (footer-union
    # order depends on file listing order) and supplies any column
    # every file of this version happens to omit.
    want = StructType.fromJson(m["schema"])
    df = spark.read.option("mergeSchema", "true").parquet(*paths)
    have = set(df.columns)
    return df.select(
        *[
            F.col(f.name)
            if f.name in have
            else F.lit(None).cast(f.dataType).alias(f.name)
            for f in want.fields
        ]
    )


def committed_batch_ids(table: str) -> set[int]:
    """Stream batch ids already committed to this table (recorded in
    each manifest written by versioned_batch_sink)."""
    out = set()
    for v in versions(table):
        m = json.load(open(_manifest_path(table, v)))
        if "batch_id" in m:
            out.add(m["batch_id"])
    return out


def versioned_batch_sink(table: str):
    """foreachBatch function giving EXACTLY-ONCE appends into the
    versioned log: Structured Streaming replays a micro-batch with the
    SAME batchId after a failure, and the sink skips batchIds whose
    manifest already committed — the standard idempotent-sink contract
    (transaction log + batch id), on the same manifests time travel
    reads. Usage:
        df.writeStream.foreachBatch(versioned_batch_sink(path))...
    """

    def apply_batch(batch_df: DataFrame, batch_id: int) -> None:
        if batch_id in committed_batch_ids(table):
            return  # replayed batch: already durable, skip
        vs = versions(table)
        if not vs:
            v, prev_files, prev_rows = 1, [], 0
            schema = batch_df.schema.jsonValue()
        else:
            prev = json.load(open(_manifest_path(table, vs[-1])))
            v, prev_files, prev_rows = vs[-1] + 1, prev["files"], prev["n_rows"]
            schema = _merged_schema(
                prev.get("schema"), batch_df.schema.jsonValue()
            )
        files = _write_data_files(batch_df, table, v)
        _commit(
            table,
            v,
            prev_files + files,
            prev_rows + batch_df.count(),
            batch_id=batch_id,
            schema=schema,
        )

    return apply_batch
