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
projection order) and may SAFELY WIDEN a column's type along the
byte→short→int→long and float→double chains (the manifest adopts the
wider type; Spark 4's parquet reader up-casts narrower files at scan
time when given an explicit read schema, verified in
tests/test_versioned.py) — any other type change fails at commit
time. See _merged_schema.

Column mapping (Delta's id-based mapping, the piece that makes
RENAME and DROP metadata-only): every column carries a stable id and
a PHYSICAL name — the name actually stored in parquet files, fixed
at column creation. `rename_column` changes only the LOGICAL name in
the manifest (zero data files touched; old files keep serving under
the new name because the physical name never moved); `drop_column`
removes the field from the manifest and retires its physical name
(the bytes stay in old files but no reader selects them — and a
LATER column re-using the dropped logical name gets a fresh id and a
fresh physical name, so it can never resurrect the dropped data).
Readers translate physical→logical per the manifest of the version
being read, so time travel shows each version under its own names.
"""

from __future__ import annotations

import json
import os
import uuid

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import StructField, StructType

_MANIFEST_DIR = "_manifests"
_DATA_DIR = "data"


# Safe type-widening chains (Delta/Iceberg's "type widening"): a later
# batch may promote a column along a chain; the manifest adopts the
# wider type and older, narrower files are up-cast at scan time by the
# parquet reader (explicit read schema — Spark 4 supports INT32→LONG
# and FLOAT→DOUBLE promotion natively, no per-file rewrite).
_WIDENING_CHAINS: tuple[tuple[str, ...], ...] = (
    ("byte", "short", "integer", "long"),
    ("float", "double"),
)


def _widened_type(old: str, new: str) -> str | None:
    """The wider of two types if they sit on one widening chain, else
    None (incompatible)."""
    if old == new:
        return old
    for chain in _WIDENING_CHAINS:
        if old in chain and new in chain:
            return chain[max(chain.index(old), chain.index(new))]
    return None


def _merged_schema(prev: dict | None, new: dict) -> dict:
    """Schema evolution contract: a later batch may ADD columns (old
    files read back with nulls there — merge-on-read), may OMIT
    columns (its rows read back with nulls), and may WIDEN a column
    along byte→short→int→long or float→double (the manifest keeps the
    widest type ever committed, so every file up-casts losslessly at
    read) — but any other type change is silent-drift corruption and
    fails the commit, not the eventual reader. Column order is prev's
    fields then additions in arrival order, so the table's projection
    is stable across versions."""
    if prev is None:
        return new
    by_name = {f["name"]: f for f in prev["fields"]}
    out = {f["name"]: dict(f) for f in prev["fields"]}
    order = [f["name"] for f in prev["fields"]]
    for f in new["fields"]:
        old = by_name.get(f["name"])
        if old is None:
            out[f["name"]] = dict(f)
            order.append(f["name"])
            continue
        if old["type"] == f["type"]:
            continue
        wide = (
            _widened_type(old["type"], f["type"])
            if isinstance(old["type"], str) and isinstance(f["type"], str)
            else None
        )
        if wide is None:
            raise ValueError(
                f"schema evolution cannot change column {f['name']!r} "
                f"from {old['type']!r} to {f['type']!r}; only "
                "byte→short→int→long / float→double widenings are "
                "safe — add a new column instead"
            )
        out[f["name"]]["type"] = wide
    return {"type": "struct", "fields": [out[n] for n in order]}


def _mapping_state(
    prev_manifest: dict | None, prev_schema: dict | None
) -> tuple[list[dict], list[str], int]:
    """Active column mapping of the previous version →
    (mapping, retired_physical, max_column_id). Pre-mapping manifests
    synthesize the identity mapping (physical = logical, ids in field
    order) — exactly what their files physically contain."""
    if prev_manifest is not None and "column_mapping" in prev_manifest:
        return (
            [dict(m) for m in prev_manifest["column_mapping"]],
            list(prev_manifest.get("retired_physical", [])),
            prev_manifest.get(
                "max_column_id",
                max(
                    (m["id"] for m in prev_manifest["column_mapping"]),
                    default=0,
                ),
            ),
        )
    fields = prev_schema["fields"] if prev_schema else []
    mapping = [
        {"id": i + 1, "name": f["name"], "physical": f["name"]}
        for i, f in enumerate(fields)
    ]
    return mapping, [], len(fields)


def _assign_new_columns(
    schema: dict, mapping: list[dict], retired: list[str], max_id: int
) -> int:
    """Give every schema field absent from the mapping a fresh id and
    a collision-free physical name (a re-added name whose physical is
    already taken — live or retired — gets a suffixed one, so dropped
    data can never resurrect). Mutates mapping; returns new max_id."""
    have = {m["name"] for m in mapping}
    used = {m["physical"] for m in mapping} | set(retired)
    for f in schema["fields"]:
        if f["name"] in have:
            continue
        max_id += 1
        phys = (
            f["name"]
            if f["name"] not in used
            else f"{f['name']}_c{max_id}"
        )
        mapping.append({"id": max_id, "name": f["name"], "physical": phys})
        used.add(phys)
        have.add(f["name"])
    return max_id


def _to_physical(df: DataFrame, mapping: list[dict]) -> DataFrame:
    """Rename the batch's LOGICAL columns to their PHYSICAL names
    before any file is written."""
    phys = {m["name"]: m["physical"] for m in mapping}
    return df.select(
        *[F.col(c).alias(phys.get(c, c)) for c in df.columns]
    )


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


def _prev_schema(
    spark: SparkSession, table: str, prev_manifest: dict
) -> dict:
    """The previous version's schema for evolution checks. Manifests
    written before schema tracking lack the field; treating them as
    None would let the first post-upgrade append adopt ITS schema
    wholesale — silently dropping columns it omits and bypassing the
    type-drift check — so reconstruct the real schema from the prior
    version's parquet footers instead (one-time cost; the new manifest
    then records it forever)."""
    if "schema" in prev_manifest:
        return prev_manifest["schema"]
    paths = [os.path.join(table, f) for f in prev_manifest["files"]]
    return spark.read.parquet(*paths).schema.jsonValue()


def write_version(df: DataFrame, table: str) -> int:
    """Commit df as a full snapshot (next version). Returns version.
    A snapshot references ONLY its own files, so the column mapping
    resets to the identity (fresh ids, physical = logical) — earlier
    versions keep their own manifests' mappings for time travel."""
    vs = versions(table)
    v = (vs[-1] + 1) if vs else 1
    schema = df.schema.jsonValue()
    mapping, retired, max_id = _mapping_state(None, schema)
    files = _write_data_files(df, table, v)
    _commit(
        table,
        v,
        files,
        df.count(),
        schema=schema,
        column_mapping=mapping,
        retired_physical=retired,
        max_column_id=max_id,
    )
    return v


def append_version(df: DataFrame, table: str) -> int:
    """Commit df's rows APPENDED to the latest version: writes only the
    new files; the manifest references the previous files unchanged
    (log-structured append — no rewrite of existing data). The batch's
    schema may evolve vs the table's (see _merged_schema): additions
    and omissions merge on read as nulls, type changes fail HERE, at
    commit time, before any file is referenced by a manifest. New
    columns get fresh mapping ids; files are written under PHYSICAL
    names so later renames stay metadata-only."""
    vs = versions(table)
    if not vs:
        return write_version(df, table)
    prev = json.load(open(_manifest_path(table, vs[-1])))
    prev_schema = _prev_schema(df.sparkSession, table, prev)
    schema = _merged_schema(prev_schema, df.schema.jsonValue())
    mapping, retired, max_id = _mapping_state(prev, prev_schema)
    max_id = _assign_new_columns(schema, mapping, retired, max_id)
    v = vs[-1] + 1
    new_files = _write_data_files(_to_physical(df, mapping), table, v)
    _commit(
        table,
        v,
        prev["files"] + new_files,
        prev["n_rows"] + df.count(),
        schema=schema,
        column_mapping=mapping,
        retired_physical=retired,
        max_column_id=max_id,
    )
    return v


def rename_column(
    spark: SparkSession, table: str, old: str, new: str
) -> int:
    """METADATA-ONLY rename (Delta column-mapping semantics): commits
    a new version with the identical file list whose manifest carries
    the new logical name; the physical name — what every parquet file
    actually stores — never changes, so zero data is rewritten and
    every pre-rename file serves the renamed column. Time travel to
    older versions still shows the old name (each manifest maps for
    itself). Returns the new version."""
    vs = versions(table)
    if not vs:
        raise FileNotFoundError(f"no committed versions in {table}")
    prev = json.load(open(_manifest_path(table, vs[-1])))
    prev_schema = _prev_schema(spark, table, prev)
    names = [f["name"] for f in prev_schema["fields"]]
    if old not in names:
        raise ValueError(f"column {old!r} does not exist (have {names})")
    if new in names:
        raise ValueError(f"column {new!r} already exists")
    mapping, retired, max_id = _mapping_state(prev, prev_schema)
    schema = {
        "type": "struct",
        "fields": [
            {**f, "name": new} if f["name"] == old else f
            for f in prev_schema["fields"]
        ],
    }
    for m in mapping:
        if m["name"] == old:
            m["name"] = new
    v = vs[-1] + 1
    _commit(
        table,
        v,
        prev["files"],
        prev["n_rows"],
        schema=schema,
        column_mapping=mapping,
        retired_physical=retired,
        max_column_id=max_id,
    )
    return v


def drop_column(spark: SparkSession, table: str, name: str) -> int:
    """METADATA-ONLY drop: commits a new version with the identical
    file list whose manifest no longer carries the column; the bytes
    stay in old files but no reader selects them, and the RETIRED
    physical name is recorded so a later column re-using the logical
    name gets a fresh physical name instead of resurrecting the
    dropped data. Returns the new version."""
    vs = versions(table)
    if not vs:
        raise FileNotFoundError(f"no committed versions in {table}")
    prev = json.load(open(_manifest_path(table, vs[-1])))
    prev_schema = _prev_schema(spark, table, prev)
    names = [f["name"] for f in prev_schema["fields"]]
    if name not in names:
        raise ValueError(f"column {name!r} does not exist (have {names})")
    if len(names) == 1:
        raise ValueError("cannot drop the only column")
    mapping, retired, max_id = _mapping_state(prev, prev_schema)
    schema = {
        "type": "struct",
        "fields": [f for f in prev_schema["fields"] if f["name"] != name],
    }
    retired = retired + [m["physical"] for m in mapping if m["name"] == name]
    mapping = [m for m in mapping if m["name"] != name]
    v = vs[-1] + 1
    _commit(
        table,
        v,
        prev["files"],
        prev["n_rows"],
        schema=schema,
        column_mapping=mapping,
        retired_physical=retired,
        max_column_id=max_id,
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
    # Merge-on-read via an EXPLICIT read schema (the manifest's):
    # files written before a column was added read it back as null,
    # files written with a narrower type up-cast at scan time
    # (int→long / float→double — Spark 4 parquet reader promotion),
    # and projection order is pinned by the manifest, not by file
    # listing order. This deliberately avoids mergeSchema: the
    # footer-union pass reads every file's footer up front (a driver
    # bottleneck at 100 TB file counts) and CANNOT reconcile widened
    # types at all (CANNOT_MERGE_SCHEMAS).
    want = StructType.fromJson(m["schema"])
    # force nullability: merge-on-read legitimately yields nulls for
    # columns some files omit, even if the writing batch's schema
    # declared them non-null.
    want = StructType(
        [StructField(f.name, f.dataType, True, f.metadata) for f in want]
    )
    # column mapping: scan under PHYSICAL names (what the files
    # store), then alias back to THIS manifest's logical names — the
    # projection that makes rename/drop metadata-only. Pre-mapping
    # manifests synthesize the identity, so this is a no-op select.
    mapping, _, _ = _mapping_state(m, m["schema"])
    phys_of = {mp["name"]: mp["physical"] for mp in mapping}
    phys_schema = StructType(
        [
            StructField(phys_of.get(f.name, f.name), f.dataType, True, f.metadata)
            for f in want
        ]
    )
    df = spark.read.schema(phys_schema).parquet(*paths)
    return df.select(
        *[
            F.col(phys_of.get(f.name, f.name)).alias(f.name)
            for f in want
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
            mapping, retired, max_id = _mapping_state(None, schema)
        else:
            prev = json.load(open(_manifest_path(table, vs[-1])))
            v, prev_files, prev_rows = vs[-1] + 1, prev["files"], prev["n_rows"]
            prev_schema = _prev_schema(batch_df.sparkSession, table, prev)
            schema = _merged_schema(prev_schema, batch_df.schema.jsonValue())
            mapping, retired, max_id = _mapping_state(prev, prev_schema)
            max_id = _assign_new_columns(schema, mapping, retired, max_id)
        files = _write_data_files(_to_physical(batch_df, mapping), table, v)
        _commit(
            table,
            v,
            prev_files + files,
            prev_rows + batch_df.count(),
            batch_id=batch_id,
            schema=schema,
            column_mapping=mapping,
            retired_physical=retired,
            max_column_id=max_id,
        )

    return apply_batch


def vacuum(table: str, keep_versions: int = 2) -> dict:
    """Retention GC, the Delta VACUUM analog: drop all but the newest
    `keep_versions` manifests, then delete every data file no longer
    referenced by a RETAINED manifest. Log-structured appends share
    files across versions, so liveness is computed over the retained
    manifests' union — a file referenced by both v1 and v5 survives a
    vacuum that drops v1. Ordering is crash-safe for readers of
    retained versions: manifests are deleted before the files they
    uniquely referenced, so at no point does a live manifest reference
    a missing file (a reader of a DROPPED version can race the delete
    — that is the documented retention contract, same as any
    lakehouse). Returns {"dropped_versions": [...],
    "deleted_files": n, "kept_files": n}."""
    if keep_versions < 1:
        raise ValueError("keep_versions must be >= 1")
    vs = versions(table)
    drop, keep = vs[:-keep_versions], vs[-keep_versions:]
    live: set[str] = set()
    for v in keep:
        live.update(json.load(open(_manifest_path(table, v)))["files"])
    dead: set[str] = set()
    for v in drop:
        dead.update(json.load(open(_manifest_path(table, v)))["files"])
    dead -= live
    for v in drop:  # manifests first: nothing references dead files now
        os.unlink(_manifest_path(table, v))
    deleted = 0
    for f in sorted(dead):
        p = os.path.join(table, f)
        if os.path.exists(p):
            os.unlink(p)
            deleted += 1
    return {
        "dropped_versions": drop,
        "deleted_files": deleted,
        "kept_files": len(live),
    }
