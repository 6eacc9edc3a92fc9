"""Versioned table as a Structured Streaming SOURCE (VERDICT r9
item 4 — Delta's readStream-on-table): a Spark 4 Python streaming
data source whose OFFSETS are manifest version numbers. Each
micro-batch plans exactly the files ADDED by the versions between the
start and end offset — one InputPartition per added file, read in
parallel on executors via pyarrow — so consuming a 100 TB table's new
commits costs O(new files), never a snapshot rescan, and Spark's own
offset checkpointing gives exactly-once resume across restarts with
zero source-side state.

Contracts (mirroring Delta's readStream):
- APPEND-ONLY by default: a version that removed files (copy-on-write
  DML, compaction) or added deletion vectors fails the stream with a
  clear error; option("ignoreChanges", "true") streams the added
  files anyway (rewritten rows may re-emit — Delta's documented
  ignoreChanges semantics).
- The declared schema is the table head's at stream start. PHYSICAL
  column names are immutable per column id (column mapping), so files
  from any version read correctly under the head mapping: later-added
  columns surface as nulls in older files, renamed columns follow the
  head's logical names.
- Versions vacuumed past the replay horizon raise (the retention
  contract): the stream must restart from a fresh checkpoint.
- Hive-partitioned files restore partition values from their path
  segments, exactly like the batch reader.

The reference has no streaming surface at all (kernel.cu consumes
stdin batches interactively, 190-196); this is the engine-side
composition of that iterative-batch pattern with the versioned log:
commits in, micro-batches out, closing the CDC loop whose apply side
is versioned_merge_sink.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

from meta_iterative_mapreduce_spark.sources.versioned import (
    _mapping_state,
    manifest_info,
    versions,
)

_INT_TYPES = {"byte", "short", "integer", "long"}


def _plan_version_files(
    table: str,
    v_from: int,
    v_to: int,
    ignore_changes: bool,
    fields: list[tuple],
) -> list[dict]:
    """Driver-side batch planning: the per-file read specs for every
    version in (v_from, v_to], projecting each file to `fields` — the
    (logical, physical, type) triples of the STREAM's declared schema,
    fixed at stream start. Raises on vacuumed gaps and (unless
    ignore_changes) on non-append versions."""
    if v_from >= v_to:  # engine replay of an empty/committed range
        return []
    have = set(versions(table))
    missing = [v for v in range(v_from + 1, v_to + 1) if v not in have]
    if missing:
        raise ValueError(
            f"versions {missing} of {table!r} were vacuumed past this "
            "stream's replay horizon; restart from a fresh checkpoint"
        )
    specs: list[dict] = []
    for v in range(v_from + 1, v_to + 1):
        m = manifest_info(table, v)
        prev_dv: list[str] = []
        if v - 1 in have:
            prev_dv = manifest_info(table, v - 1).get("dv_files", [])
        dv_delta = [f for f in m.get("dv_files", []) if f not in set(prev_dv)]
        if (m.get("removed") or dv_delta) and not ignore_changes:
            raise ValueError(
                f"version {v} of {table!r} is not append-only "
                f"({len(m.get('removed', []))} files removed, "
                f"{len(dv_delta)} deletion vectors added); streaming a "
                "table under DML needs option('ignoreChanges', 'true') "
                "(rewritten rows may re-emit, per Delta semantics)"
            )
        added = m.get("added")
        if added is None:  # pre-delta manifest: treat v1 as snapshot
            added = m["files"] if v == 1 else []
        for rel in added:
            part_vals: dict[str, object] = {}
            for seg in rel.split(os.sep):
                if "=" not in seg:
                    continue
                from urllib.parse import unquote

                name, _, raw = seg.partition("=")
                val = unquote(raw)
                part_vals[name] = (
                    None if val == "__HIVE_DEFAULT_PARTITION__" else val
                )
            specs.append(
                {
                    "path": os.path.join(table, rel),
                    "fields": fields,
                    "part_vals": part_vals,
                }
            )
    return specs


def _read_spec(spec: dict):
    """Executor-side file read: yield tuples in the declared field
    order — parquet columns under their physical names, hive
    partition values from the path, nulls for columns the file
    predates."""
    import pyarrow.parquet as pq

    tbl = pq.read_table(spec["path"])
    names = set(tbl.schema.names)
    n = tbl.num_rows
    cols = []
    for _logical, phys, typ in spec["fields"]:
        if phys in names:
            vals = tbl.column(phys).to_pylist()
        elif phys in spec["part_vals"]:
            raw = spec["part_vals"][phys]
            v = (
                None
                if raw is None
                else int(raw)
                if typ in _INT_TYPES
                else raw
            )
            vals = [v] * n
        else:
            vals = [None] * n
        cols.append(vals)
    yield from zip(*cols)


def make_versioned_table_source():
    """Build (and return) the DataSource class. Deferred import so the
    module stays importable on Spark versions without the Python data
    source API."""
    from pyspark.sql.datasource import (
        DataSource,
        DataSourceStreamReader,
        InputPartition,
    )

    class VersionedTableStreamReader(DataSourceStreamReader):
        def __init__(self, options, schema):
            self.table = options.get("path") or options.get("table")
            if not self.table:
                raise ValueError(
                    "versioned table stream needs .option('path', <table>)"
                )
            self.ignore_changes = (
                str(options.get("ignorechanges", "false")).lower() == "true"
            )
            until = options.get("untilversion")
            self.until = int(until) if until is not None else None
            # (logical, physical, type) per declared field, FIXED at
            # stream start: physical names are immutable per column id,
            # so this projection is valid for files of every version
            m = manifest_info(self.table)
            mapping, _, _ = _mapping_state(m, m.get("schema"))
            phys_of = {mp["name"]: mp["physical"] for mp in mapping}
            self.fields = [
                (f.name, phys_of.get(f.name, f.name), f.dataType.typeName())
                for f in schema.fields
            ]

        def initialOffset(self) -> dict:
            return {"version": 0}

        def latestOffset(self) -> dict:
            vs = versions(self.table)
            head = vs[-1] if vs else 0
            if self.until is not None:
                head = min(head, self.until)
            return {"version": head}

        def partitions(self, start: dict, end: dict):
            specs = _plan_version_files(
                self.table,
                start["version"],
                end["version"],
                self.ignore_changes,
                self.fields,
            )
            # metadata-only ranges still need ONE (empty) partition:
            # the engine plans a batch for any offset advance
            return [InputPartition(s) for s in specs] or [
                InputPartition(None)
            ]

        def read(self, partition):
            if partition.value is None:
                return iter(())
            return _read_spec(partition.value)

        def commit(self, end: dict) -> None:
            pass  # offsets live in Spark's checkpoint, nothing to GC

    class VersionedTableSource(DataSource):
        @classmethod
        def name(cls):
            return "mimr_versioned_table"

        def schema(self):
            from pyspark.sql.types import StructField, StructType

            table = self.options.get("path") or self.options.get("table")
            m = manifest_info(table)
            if "schema" not in m:
                raise ValueError(
                    "streaming a versioned table needs schema-tracking "
                    "manifests (write_version first)"
                )
            # every field nullable: files predating a column null-fill
            # it (the same merge-on-read rule as _read_files_logical)
            want = StructType.fromJson(m["schema"])
            return StructType(
                [
                    StructField(f.name, f.dataType, True, f.metadata)
                    for f in want
                ]
            )

        def streamReader(self, schema):
            return VersionedTableStreamReader(self.options, schema)

    return VersionedTableSource


def register_stream_source(spark: SparkSession) -> None:
    """Register the source under format 'mimr_versioned_table'
    (idempotent per session)."""
    try:
        spark.dataSource.register(make_versioned_table_source())
    except Exception as exc:  # already registered in this session
        if "already" not in str(exc).lower():
            raise


def stream_changes(
    spark: SparkSession,
    table: str,
    ignore_changes: bool = False,
    until_version: int | None = None,
) -> DataFrame:
    """readStream over a versioned table: an unbounded DataFrame whose
    micro-batches are the rows APPENDED by each committed version
    range past the checkpointed offset (the extract side of streaming
    CDC; `until_version` caps the offset for deterministic tests /
    catch-up-to-here runs)."""
    register_stream_source(spark)
    r = (
        spark.readStream.format("mimr_versioned_table")
        .option("path", table)
        .option("ignorechanges", str(ignore_changes).lower())
    )
    if until_version is not None:
        r = r.option("untilversion", until_version)
    return r.load()


__all__ = [
    "make_versioned_table_source",
    "register_stream_source",
    "stream_changes",
]
