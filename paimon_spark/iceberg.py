"""Iceberg-compatible metadata sink (SURVEY §2 S10).

Mirrors every commit of a table into Apache-Iceberg-format-v2 metadata
under `<table>/metadata/` so an Iceberg reader can read the table's raw
data files directly (ref: paimon-core/.../iceberg/IcebergCommitCallback
.java — "create Iceberg compatible metadata, so Iceberg readers can
read Paimon's RawFile"; layout = the reference's
`metadata.iceberg.storage = table-location` mode, IcebergPathFactory).

What is mirrored (the reference's rules, IcebergCommitCallback
shouldAddFileToIceberg):
  * append-only tables: every live data file;
  * primary-key tables: only files at the highest LSM level (fully
    compacted, so they are raw-readable without merge — run
    `full_compact()` to surface the newest data to Iceberg readers).

Incremental, like the reference (createNewlyAddedManifestFileMetas /
retained previous manifests): each commit writes ONE new manifest for
its added files, rewrites ONLY the manifests that lost files, and
reuses every untouched manifest row as-is — O(delta + affected
manifests) per commit, never O(table).

File-format notes: data files are written by Spark without parquet
field ids, so the table metadata carries a `schema.name-mapping.default`
property (Iceberg spec "Name Mapping Serialization") mapping column
names to field ids; identity-partition columns absent from data files
are reconstructed by Iceberg readers from the manifest partition struct
(spec: "Column Projection"). Manifests/manifest lists are Avro object
container files written by paimon_spark/avro_io.py.

Structural JSON/Avro shapes follow the Iceberg table spec v2 via the
reference's serializers: IcebergMetadata/IcebergSnapshot field names,
IcebergManifestFileMeta.schemaForIcebergNew (ids 500-517),
IcebergManifestEntry (ids 0-4), IcebergDataFileMeta (ids 100-145),
IcebergPartitionSummary (ids 509-518).
"""

from __future__ import annotations

import datetime
import json
import os
import struct
import uuid
from typing import TYPE_CHECKING, Any

from pyspark.sql import types as T

from paimon_spark.avro_io import read_avro_file, write_avro_file
from paimon_spark.metadata import (ADD, COMMIT_APPEND, COMMIT_COMPACT,
                                   DELETE, FileEntry, Snapshot)
from paimon_spark.schema import FIELD_ID_KEY, TableSchema

if TYPE_CHECKING:
    from paimon_spark.table import Table

STORAGE_OPTION = "metadata.iceberg.storage"
FORMAT_VERSION = 2
VERSION_HINT = "version-hint.text"
# partition field ids start here (Iceberg spec: "Partition field IDs
# must be ... starting at 1000"; ref: IcebergPartitionField START_ID)
PARTITION_FIELD_ID_START = 1000

_EPOCH = datetime.date(1970, 1, 1)


def iceberg_enabled(schema: TableSchema) -> bool:
    return schema.options.get(STORAGE_OPTION, "").lower() in (
        "table-location", "hadoop-catalog")


# ---------------- type + value conversion ----------------

def _iceberg_type(dt: T.DataType) -> str:
    """Spark type → Iceberg primitive type name (ref: IcebergDataField
    toTypeObject). Nested/exotic types are rejected at enable time."""
    if isinstance(dt, T.BooleanType):
        return "boolean"
    if isinstance(dt, (T.IntegerType, T.ShortType, T.ByteType)):
        return "int"
    if isinstance(dt, T.LongType):
        return "long"
    if isinstance(dt, T.FloatType):
        return "float"
    if isinstance(dt, T.DoubleType):
        return "double"
    if isinstance(dt, T.DateType):
        return "date"
    if isinstance(dt, T.TimestampType):
        return "timestamptz"
    if isinstance(dt, T.TimestampNTZType):
        return "timestamp"
    if isinstance(dt, T.StringType):
        return "string"
    if isinstance(dt, T.BinaryType):
        return "binary"
    if isinstance(dt, T.DecimalType):
        return f"decimal({dt.precision}, {dt.scale})"
    raise ValueError(
        f"type {dt.simpleString()} has no Iceberg mirror; disable "
        f"{STORAGE_OPTION} or drop the column")


def _avro_prim(dt: T.DataType) -> Any:
    """Spark type → avro type for the manifest partition struct."""
    if isinstance(dt, T.BooleanType):
        return "boolean"
    if isinstance(dt, (T.IntegerType, T.ShortType, T.ByteType)):
        return "int"
    if isinstance(dt, T.LongType):
        return "long"
    if isinstance(dt, T.FloatType):
        return "float"
    if isinstance(dt, T.DoubleType):
        return "double"
    if isinstance(dt, T.DateType):
        return {"type": "int", "logicalType": "date"}
    if isinstance(dt, (T.TimestampType, T.TimestampNTZType)):
        return {"type": "long", "logicalType": "timestamp-micros"}
    return "string"


def field_ids(schema: TableSchema) -> dict[str, int]:
    """Column → Iceberg field id (the paimon field id, like the
    reference's IcebergDataField(dataField.id()))."""
    out = {}
    for i, f in enumerate(schema.struct.fields):
        md = f.metadata or {}
        out[f.name] = int(md.get(FIELD_ID_KEY, i))
    return out


def _partition_value(raw: str, dt: T.DataType) -> Any:
    """Hive-path partition string → typed value for the manifest
    partition struct (avro-encodable)."""
    if raw in ("__HIVE_DEFAULT_PARTITION__", "", None):
        return None
    if isinstance(dt, (T.IntegerType, T.ShortType, T.ByteType, T.LongType)):
        return int(raw)
    if isinstance(dt, (T.FloatType, T.DoubleType)):
        return float(raw)
    if isinstance(dt, T.BooleanType):
        return raw.lower() == "true"
    if isinstance(dt, T.DateType):
        return (datetime.date.fromisoformat(raw) - _EPOCH).days
    return str(raw)


def _bound_bytes(v: Any, dt: T.DataType) -> bytes | None:
    """Iceberg single-value binary serialization (spec Appendix D;
    ref: IcebergConversions.toByteBuffer): little-endian fixed-width
    numerics, UTF-8 strings, days/micros for date/timestamp."""
    if v is None:
        return None
    try:
        if isinstance(dt, T.BooleanType):
            return b"\x01" if v else b"\x00"
        if isinstance(dt, (T.IntegerType, T.ShortType, T.ByteType)):
            return struct.pack("<i", int(v))
        if isinstance(dt, T.LongType):
            return struct.pack("<q", int(v))
        if isinstance(dt, T.FloatType):
            return struct.pack("<f", float(v))
        if isinstance(dt, T.DoubleType):
            return struct.pack("<d", float(v))
        if isinstance(dt, T.DateType):
            d = (v if isinstance(v, datetime.date)
                 else datetime.date.fromisoformat(str(v)))
            return struct.pack("<i", (d - _EPOCH).days)
        if isinstance(dt, (T.TimestampType, T.TimestampNTZType)):
            if isinstance(v, datetime.datetime):
                us = int(v.timestamp() * 1_000_000)
            else:
                us = int(datetime.datetime.fromisoformat(str(v))
                         .timestamp() * 1_000_000)
            return struct.pack("<q", us)
        if isinstance(dt, T.StringType):
            return str(v).encode()
    except (ValueError, TypeError, OverflowError):
        return None
    return None                       # binary/decimal bounds: omitted


# ---------------- schema JSON (metadata.json pieces) ----------------

def iceberg_schema_json(schema: TableSchema) -> dict:
    ids = field_ids(schema)
    return {
        "type": "struct",
        "schema-id": schema.schema_id,
        "fields": [
            {
                "id": ids[f.name],
                "name": f.name,
                "required": not f.nullable,
                "type": _iceberg_type(f.dataType),
            }
            for f in schema.struct.fields
        ],
    }


def partition_spec_json(schema: TableSchema) -> dict:
    ids = field_ids(schema)
    return {
        "spec-id": 0,
        "fields": [
            {
                "name": k,
                "transform": "identity",
                "source-id": ids[k],
                "field-id": PARTITION_FIELD_ID_START + i,
            }
            for i, k in enumerate(schema.partition_keys)
        ],
    }


def name_mapping_json(schema: TableSchema) -> list[dict]:
    """schema.name-mapping.default — lets Iceberg readers resolve
    columns in data files that carry no parquet field ids."""
    ids = field_ids(schema)
    return [{"field-id": ids[f.name], "names": [f.name]}
            for f in schema.struct.fields]


# ---------------- avro schemas for manifests ----------------

def _partition_avro_schema(schema: TableSchema) -> dict:
    return {
        "type": "record",
        "name": "r102",
        "fields": [
            {"name": k, "type": ["null", _avro_prim(schema.data_type(k))],
             "default": None,
             "field-id": PARTITION_FIELD_ID_START + i}
            for i, k in enumerate(schema.partition_keys)
        ],
    }


def _int_keyed_map(name: str, key_id: int, value_id: int,
                   value_type: str) -> dict:
    """Iceberg encodes map<int, …> in avro as an array of key/value
    records with logicalType map (avro map keys must be strings)."""
    return {
        "type": "array",
        "logicalType": "map",
        "items": {
            "type": "record",
            "name": name,
            "fields": [
                {"name": "key", "type": "int", "field-id": key_id},
                {"name": "value", "type": value_type, "field-id": value_id},
            ],
        },
    }


def manifest_entry_avro_schema(schema: TableSchema) -> dict:
    """manifest_entry with nested data_file (ref: IcebergManifestEntry
    .schema / IcebergDataFileMeta.schema field ids)."""
    data_file = {
        "type": "record",
        "name": "r2",
        "fields": [
            {"name": "content", "type": "int", "field-id": 134},
            {"name": "file_path", "type": "string", "field-id": 100},
            {"name": "file_format", "type": "string", "field-id": 101},
            {"name": "partition", "type": _partition_avro_schema(schema),
             "field-id": 102},
            {"name": "record_count", "type": "long", "field-id": 103},
            {"name": "file_size_in_bytes", "type": "long", "field-id": 104},
            {"name": "null_value_counts",
             "type": ["null", _int_keyed_map("k110_v111", 121, 122, "long")],
             "default": None, "field-id": 110},
            {"name": "lower_bounds",
             "type": ["null", _int_keyed_map("k125_v126", 126, 127, "bytes")],
             "default": None, "field-id": 125},
            {"name": "upper_bounds",
             "type": ["null", _int_keyed_map("k128_v129", 129, 130, "bytes")],
             "default": None, "field-id": 128},
        ],
    }
    return {
        "type": "record",
        "name": "manifest_entry",
        "fields": [
            {"name": "status", "type": "int", "field-id": 0},
            {"name": "snapshot_id", "type": ["null", "long"],
             "default": None, "field-id": 1},
            {"name": "sequence_number", "type": ["null", "long"],
             "default": None, "field-id": 3},
            {"name": "file_sequence_number", "type": ["null", "long"],
             "default": None, "field-id": 4},
            {"name": "data_file", "type": data_file, "field-id": 2},
        ],
    }


MANIFEST_LIST_AVRO_SCHEMA = {
    "type": "record",
    "name": "manifest_file",
    "fields": [
        {"name": "manifest_path", "type": "string", "field-id": 500},
        {"name": "manifest_length", "type": "long", "field-id": 501},
        {"name": "partition_spec_id", "type": "int", "field-id": 502},
        {"name": "content", "type": "int", "field-id": 517},
        {"name": "sequence_number", "type": "long", "field-id": 515},
        {"name": "min_sequence_number", "type": "long", "field-id": 516},
        {"name": "added_snapshot_id", "type": ["null", "long"],
         "default": None, "field-id": 503},
        {"name": "added_files_count", "type": "int", "field-id": 504},
        {"name": "existing_files_count", "type": "int", "field-id": 505},
        {"name": "deleted_files_count", "type": "int", "field-id": 506},
        {"name": "added_rows_count", "type": "long", "field-id": 512},
        {"name": "existing_rows_count", "type": "long", "field-id": 513},
        {"name": "deleted_rows_count", "type": "long", "field-id": 514},
        {"name": "partitions", "type": ["null", {
            "type": "array",
            "items": {
                "type": "record",
                "name": "r508",
                "fields": [
                    {"name": "contains_null", "type": "boolean",
                     "field-id": 509},
                    {"name": "contains_nan", "type": ["null", "boolean"],
                     "default": None, "field-id": 518},
                    {"name": "lower_bound", "type": ["null", "bytes"],
                     "default": None, "field-id": 510},
                    {"name": "upper_bound", "type": ["null", "bytes"],
                     "default": None, "field-id": 511},
                ],
            },
        }], "default": None, "field-id": 507},
    ],
}


# ---------------- the mirror ----------------

def invalidate_mirror(table_root: str) -> None:
    """Drop the whole Iceberg mirror. Called when the table's history
    changes OUT OF BAND (rollback, fast_forward) — the incremental
    per-commit mirror would otherwise diff against undone state and
    keep rolled-back files visible to Iceberg readers. The next commit
    resyncs the full live set (mirror() with prev_meta=None)."""
    import shutil as _sh
    _sh.rmtree(os.path.join(table_root, "metadata"), ignore_errors=True)


def _dv_mirror_supported() -> bool:
    """Deletion-vector tables mirror as Iceberg v2 position-delete
    files (content=1 delete manifests + delete parquet with the
    reserved field ids); see IcebergCompat._write_position_deletes."""
    return True


# Iceberg reserved field ids for position-delete files (spec v2)
POS_DELETE_PATH_ID = 2147483546
POS_DELETE_POS_ID = 2147483545


def validate_iceberg_compat(schema: "TableSchema") -> None:
    """All metadata.iceberg.storage compatibility checks, run at table
    CREATE / ALTER time (not post-commit): a commit that already made a
    snapshot durable must never fail afterwards — a caller retry would
    duplicate data. Raises ValueError on: non-Iceberg-readable file
    format, blob.columns (physically stored as descriptor structs that
    external Iceberg readers would misread as payload binary), and
    column types with no Iceberg mapping."""
    if not iceberg_enabled(schema):
        return
    fmt = schema.options.get("file.format", "parquet")
    if fmt not in ("parquet", "orc", "avro"):
        raise ValueError(
            f"{STORAGE_OPTION} requires an Iceberg-readable data "
            f"format (parquet/orc/avro), table uses {fmt}")
    if schema.options.get("deletion-vectors.enabled",
                          "false") == "true" and \
            not _dv_mirror_supported():
        raise ValueError(
            f"{STORAGE_OPTION} does not support deletion-vector "
            f"tables (Iceberg delete-file mirroring is out of scope)")
    if schema.options.get("blob.columns", "").strip():
        # blob columns store (file, offset, length) descriptor structs
        # in parquet; an Iceberg reader would see descriptors, not
        # payload bytes
        raise ValueError(
            f"{STORAGE_OPTION} does not support blob.columns tables "
            f"(externalized payloads are invisible to Iceberg readers)")
    for f in schema.struct.fields:
        _iceberg_type(f.dataType)  # raises on nested/exotic types


class IcebergCompat:
    """Per-table Iceberg metadata mirror. One instance per commit is
    cheap — all state lives in `<table>/metadata/`."""

    def __init__(self, table: "Table"):
        self.table = table
        self.schema = table.schema
        self.meta_dir = os.path.join(table.paths.root, "metadata")
        validate_iceberg_compat(self.schema)

    # ---- state ----

    def _version(self) -> int | None:
        try:
            with open(os.path.join(self.meta_dir, VERSION_HINT)) as f:
                return int(f.read().strip())
        except (FileNotFoundError, ValueError):
            return None

    def _load_metadata(self, version: int) -> dict:
        with open(os.path.join(self.meta_dir,
                               f"v{version}.metadata.json")) as f:
            return json.load(f)

    def _load_index(self) -> dict:
        """Bookkeeping sidecar (ours, not part of the Iceberg spec):
        manifest file name → list of data-file paths it contains, so a
        commit can find the manifests a removed file lives in without
        reading every manifest."""
        try:
            with open(os.path.join(self.meta_dir, "manifest-index.json")) as f:
                return json.load(f)
        except FileNotFoundError:
            return {}

    # ---- helpers ----

    def _mirrorable(self, e: FileEntry) -> bool:
        """shouldAddFileToIceberg: append tables mirror everything; PK
        tables only the top-level (fully merged) files."""
        if not self.schema.is_pk_table:
            return True
        from paimon_spark.table import COMPACTED_LEVEL
        return e.level >= COMPACTED_LEVEL

    def _data_file(self, e: FileEntry) -> dict:
        ids = field_ids(self.schema)
        nulls, lowers, uppers = [], [], []
        for col, s in (e.stats or {}).items():
            if col not in ids:
                continue
            dt = self.schema.data_type(col)
            if s.get("nulls") is not None:
                nulls.append({"key": ids[col], "value": int(s["nulls"])})
            lo = _bound_bytes(s.get("min"), dt)
            hi = _bound_bytes(s.get("max"), dt)
            if lo is not None:
                lowers.append({"key": ids[col], "value": lo})
            if hi is not None:
                uppers.append({"key": ids[col], "value": hi})
        fmt = self.schema.options.get("file.format", "parquet").upper()
        return {
            "content": 0,                              # DATA
            "file_path": os.path.join(self.table.paths.root, e.file_path),
            "file_format": fmt,
            "partition": {
                k: _partition_value(e.partition.get(k),
                                    self.schema.data_type(k))
                for k in self.schema.partition_keys
            },
            "record_count": e.row_count,
            "file_size_in_bytes": e.file_size,
            "null_value_counts": nulls or None,
            "lower_bounds": lowers or None,
            "upper_bounds": uppers or None,
        }

    def _partition_summaries(self, entries: list[dict]) -> list[dict] | None:
        if not self.schema.partition_keys:
            return None
        out = []
        for k in self.schema.partition_keys:
            dt = self.schema.data_type(k)
            vals = [r["data_file"]["partition"].get(k) for r in entries]
            present = [v for v in vals if v is not None]
            enc = None, None
            if present:
                # partition struct values are already typed; bounds use the
                # same single-value binary form
                lo, hi = min(present), max(present)
                if isinstance(dt, T.DateType):       # stored as day ints
                    enc = struct.pack("<i", lo), struct.pack("<i", hi)
                else:
                    enc = _bound_bytes(lo, dt), _bound_bytes(hi, dt)
            out.append({
                "contains_null": any(v is None for v in vals),
                "contains_nan": False,
                "lower_bound": enc[0],
                "upper_bound": enc[1],
            })
        return out

    def _write_manifest(self, records: list[dict]) -> tuple[str, int]:
        name = f"{uuid.uuid4()}-m0.avro"
        path = os.path.join(self.meta_dir, name)
        write_avro_file(path, manifest_entry_avro_schema(self.schema),
                        records)
        return path, os.path.getsize(path)

    # ---- deletion vectors → Iceberg v2 position-delete files ----

    def _load_delete_index(self) -> dict:
        """Bookkeeping sidecar: dv dataset (relative path) → position-
        delete parquet already mirrored for it — so an incremental
        commit mirrors each dv dataset exactly once."""
        try:
            with open(os.path.join(self.meta_dir,
                                   "delete-index.json")) as f:
                return json.load(f)
        except FileNotFoundError:
            return {}

    def _save_delete_index(self, idx: dict) -> None:
        p = os.path.join(self.meta_dir, "delete-index.json")
        with open(p + ".tmp", "w") as f:
            json.dump(idx, f)
        os.replace(p + ".tmp", p)

    def _write_position_delete_files(
            self, dv_rel: str) -> list[tuple[dict, str, int, int]]:
        """One dv parquet dataset (file_path URI, pos) → Iceberg v2
        position-delete parquet(s) in metadata/, columns carrying the
        reserved field ids (2147483546 / 2147483545), rows sorted by
        (file_path, pos) per spec. Paths are normalized from Spark's
        file: URIs to the absolute spellings the data manifests use.

        Position deletes are PARTITION-SCOPED in the v2 spec: a
        spec-compliant reader only applies a delete file to data files of
        the same partition, so one dv dataset spanning partitions must
        fan out into one delete file per partition, each manifest entry
        carrying the data files' real partition values (parsed from the
        hive path segments — the same encoding the data manifests use).
        Returns [(raw_partition_values, path, size, nrows)].
        Runs in the commit callback like the reference's
        IcebergCommitCallback; a dv dataset is O(deletes in one commit),
        the same data volume the DV write itself just shuffled."""
        import re as _re

        import pyarrow as pa
        import pyarrow.parquet as pq

        from paimon_spark.writer import parse_partition_path
        root = self.table.paths.root
        pkeys = self.schema.partition_keys
        tbl = pq.read_table(os.path.join(root, dv_rel))
        paths = [_re.sub(r"^file:/+", "/", p)
                 for p in tbl.column("file_path").to_pylist()]
        pos = tbl.column("pos").to_pylist()
        groups: dict[tuple, tuple[dict, list[int]]] = {}
        for i, p in enumerate(paths):
            raw = parse_partition_path(os.path.relpath(p, root), pkeys) \
                if pkeys else {}
            key = tuple(raw.get(k) for k in pkeys)
            groups.setdefault(key, (raw, []))[1].append(i)
        out_schema = pa.schema([
            pa.field("file_path", pa.string(), nullable=False,
                     metadata={b"PARQUET:field_id":
                               str(POS_DELETE_PATH_ID).encode()}),
            pa.field("pos", pa.int64(), nullable=False,
                     metadata={b"PARQUET:field_id":
                               str(POS_DELETE_POS_ID).encode()})])
        out = []
        for _key, (raw, idxs) in sorted(groups.items(),
                                        key=lambda kv: str(kv[0])):
            order = sorted(idxs, key=lambda i: (paths[i], pos[i]))
            t = pa.table({"file_path": [paths[i] for i in order],
                          "pos": [int(pos[i]) for i in order]},
                         schema=out_schema)
            path = os.path.join(self.meta_dir,
                                f"delete-{uuid.uuid4().hex}.parquet")
            pq.write_table(t, path)
            out.append((raw, path, os.path.getsize(path), len(order)))
        return out

    def _delete_file_entry(self, snap_id: int, partition_raw: dict,
                           path: str, size: int, nrows: int) -> dict:
        return {
            "status": 1,
            "snapshot_id": snap_id,
            "sequence_number": snap_id,
            "file_sequence_number": snap_id,
            "data_file": {
                "content": 1,                  # POSITION_DELETES
                "file_path": path,
                "file_format": "PARQUET",
                "partition": {
                    k: _partition_value(partition_raw.get(k),
                                        self.schema.data_type(k))
                    for k in self.schema.partition_keys
                },
                "record_count": nrows,
                "file_size_in_bytes": size,
                "null_value_counts": None,
                "lower_bounds": None,
                "upper_bounds": None,
            },
        }

    def _mirror_position_deletes(self, snap: Snapshot,
                                 added: list["FileEntry"]) -> list[dict]:
        """Mirror the dv datasets this commit's added entries reference
        (each exactly once) into a content=1 delete manifest. Returns
        the manifest-list rows to append (empty when no new DVs).
        Superseded delete files stay in older manifests — their
        positions are a subset of the replacing dv dataset's (the DV
        write merges old vectors), so Iceberg's union-of-deletes
        semantics keep results exact; they reference at worst dead data
        paths, which match no live file."""
        didx = self._load_delete_index()
        dv_new = sorted({e.dv_path for e in added
                         if e.dv_path and e.dv_path not in didx})
        if not dv_new:
            return []
        entries, total_rows = [], 0
        for dv_rel in dv_new:
            written = self._write_position_delete_files(dv_rel)
            didx[dv_rel] = [os.path.basename(p) for _, p, _, _ in written]
            for raw, path, size, nrows in written:
                entries.append(self._delete_file_entry(snap.id, raw,
                                                       path, size, nrows))
                total_rows += nrows
        mpath, mlen = self._write_manifest(entries)
        self._save_delete_index(didx)
        return [{
            "manifest_path": mpath,
            "manifest_length": mlen,
            "partition_spec_id": 0,
            "content": 1,                      # DELETES
            "sequence_number": snap.id,
            "min_sequence_number": snap.id,
            "added_snapshot_id": snap.id,
            "added_files_count": len(entries),
            "existing_files_count": 0,
            "deleted_files_count": 0,
            "added_rows_count": total_rows,
            "existing_rows_count": 0,
            "deleted_rows_count": 0,
            "partitions": None,
        }]

    # ---- the commit hook ----

    def mirror(self, snap: Snapshot,
               delta_entries: list[FileEntry] | None) -> None:
        """Mirror one committed snapshot. delta_entries = the entries
        of THIS commit (None → full resync from live entries, used for
        the first mirror of a table with existing history)."""
        os.makedirs(self.meta_dir, exist_ok=True)
        prev_version = self._version()
        prev_meta = self._load_metadata(prev_version) if prev_version else None
        index = self._load_index() if prev_meta else {}

        # self-healing guards for out-of-order / missed mirrors (two
        # concurrent committers race the post-commit callback):
        if prev_meta is not None:
            prev_cur = prev_meta.get("current-snapshot-id", 0)
            if prev_cur >= snap.id:
                return            # a newer mirror already landed
            if delta_entries is not None and prev_cur != snap.id - 1:
                # the mirror missed intermediate commits — an
                # incremental diff against it would diverge; resync the
                # full live set instead
                delta_entries = None

        if prev_meta is None or delta_entries is None:
            # first mirror (or explicit resync): drop any stale state and
            # re-add the full mirrorable live set
            added = [e for e in self.table.paths.live_entries(snap)
                     if self._mirrorable(e)]
            removed_paths = {f for files in index.values() for f in files}
        else:
            # a file both deleted and re-added in one commit (level move)
            # leaves its old manifest and lands in the new one
            removed_paths = {
                os.path.join(self.table.paths.root, e.file_path)
                for e in delta_entries if e.kind == DELETE}
            tracked = {f for files in index.values() for f in files}
            added = [
                e for e in delta_entries
                if e.kind == ADD and self._mirrorable(e)
                # skip re-ADDs of already-tracked files (e.g. a commit
                # re-adding an existing file's entry) unless this commit
                # also removed them from their old manifest
                and (os.path.join(self.table.paths.root, e.file_path)
                     not in tracked
                     or os.path.join(self.table.paths.root, e.file_path)
                     in removed_paths)]

        # ---- previous manifest-list rows ----
        prev_rows: list[dict] = []
        if prev_meta is not None:
            cur_snap = next(
                (s for s in prev_meta["snapshots"]
                 if s["snapshot-id"] == prev_meta["current-snapshot-id"]),
                None)
            if cur_snap:
                _, prev_rows = read_avro_file(cur_snap["manifest-list"])

        # ---- rewrite manifests that lost files; reuse the rest ----
        new_rows: list[dict] = []
        deleted_files = deleted_rows = 0
        for row in prev_rows:
            mpath = row["manifest_path"]
            files = set(index.get(os.path.basename(mpath), []))
            hit = files & removed_paths
            if not hit:
                new_rows.append(row)
                continue
            _, entries = read_avro_file(mpath)
            survivors = [r for r in entries
                         if r["data_file"]["file_path"] not in removed_paths]
            deleted_files += len(entries) - len(survivors)
            deleted_rows += sum(r["data_file"]["record_count"]
                                for r in entries
                                if r["data_file"]["file_path"]
                                in removed_paths)
            index.pop(os.path.basename(mpath), None)
            if not survivors:
                continue
            for r in survivors:
                r["status"] = 0                        # EXISTING
            path, length = self._write_manifest(survivors)
            index[os.path.basename(path)] = [
                r["data_file"]["file_path"] for r in survivors]
            new_rows.append({
                "manifest_path": path,
                "manifest_length": length,
                "partition_spec_id": 0,
                "content": 0,
                "sequence_number": snap.id,
                "min_sequence_number": min(
                    (r["sequence_number"] or snap.id for r in survivors),
                    default=snap.id),
                "added_snapshot_id": snap.id,
                "added_files_count": 0,
                "existing_files_count": len(survivors),
                "deleted_files_count": 0,
                "added_rows_count": 0,
                "existing_rows_count": sum(
                    r["data_file"]["record_count"] for r in survivors),
                "deleted_rows_count": 0,
                "partitions": self._partition_summaries(survivors),
            })

        # ---- one new manifest for this commit's added files ----
        added_records = [{
            "status": 1,                               # ADDED
            "snapshot_id": snap.id,
            "sequence_number": snap.id,
            "file_sequence_number": snap.id,
            "data_file": self._data_file(e),
        } for e in added]
        if added_records:
            path, length = self._write_manifest(added_records)
            index[os.path.basename(path)] = [
                r["data_file"]["file_path"] for r in added_records]
            new_rows.append({
                "manifest_path": path,
                "manifest_length": length,
                "partition_spec_id": 0,
                "content": 0,
                "sequence_number": snap.id,
                "min_sequence_number": snap.id,
                "added_snapshot_id": snap.id,
                "added_files_count": len(added_records),
                "existing_files_count": 0,
                "deleted_files_count": 0,
                "added_rows_count": sum(e.row_count for e in added),
                "existing_rows_count": 0,
                "deleted_rows_count": 0,
                "partitions": self._partition_summaries(added_records),
            })

        # ---- deletion vectors → v2 position-delete manifests ----
        new_rows.extend(self._mirror_position_deletes(snap, added))

        # ---- manifest list + snapshot + metadata.json ----
        list_path = os.path.join(
            self.meta_dir, f"snap-{snap.id}-{uuid.uuid4()}.avro")
        write_avro_file(list_path, MANIFEST_LIST_AVRO_SCHEMA, new_rows)

        total_files = sum(len(v) for v in index.values())
        total_rows = sum(r["added_rows_count"] + r["existing_rows_count"]
                         for r in new_rows if r["content"] == 0)
        op = {COMMIT_APPEND: "append", COMMIT_COMPACT: "replace"}.get(
            snap.commit_kind, "overwrite")
        summary = {
            "operation": op,
            "added-data-files": str(len(added_records)),
            "added-records": str(sum(e.row_count for e in added)),
            "deleted-data-files": str(deleted_files),
            "deleted-records": str(deleted_rows),
            "total-records": str(total_rows),
            "total-data-files": str(total_files),
        }
        snapshot_json = {
            "sequence-number": snap.id,
            "snapshot-id": snap.id,
            "timestamp-ms": snap.timestamp_ms,
            "summary": summary,
            "manifest-list": list_path,
            "schema-id": self.schema.schema_id,
        }
        if prev_meta is not None and prev_meta.get("current-snapshot-id",
                                                   -1) != -1:
            snapshot_json["parent-snapshot-id"] = \
                prev_meta["current-snapshot-id"]

        schemas = list(prev_meta["schemas"]) if prev_meta else []
        if not any(s["schema-id"] == self.schema.schema_id
                   for s in schemas):
            schemas.append(iceberg_schema_json(self.schema))
        snapshots = (list(prev_meta["snapshots"]) if prev_meta else [])
        snapshots.append(snapshot_json)
        # retention follows paimon snapshot expiration: an iceberg
        # snapshot whose paimon snapshot is expired (and not tag-pinned)
        # is dropped, so metadata.json stays O(retained), not O(commits)
        # (ref: IcebergCommitCallback expireAllBefore... / snapshot
        # retention tied to the paimon snapshot lifecycle)
        earliest = self.table.paths.earliest_snapshot_id() or 0
        tags = self.table.paths.list_tags()
        pinned = set(tags.values())
        dropped = [s for s in snapshots
                   if s["snapshot-id"] < earliest
                   and s["snapshot-id"] not in pinned]
        snapshots = [s for s in snapshots if s not in dropped]
        snap_log = (list(prev_meta.get("snapshot-log", []))
                    if prev_meta else [])
        snap_log.append({"timestamp-ms": snap.timestamp_ms,
                         "snapshot-id": snap.id})
        keep_ids = {s["snapshot-id"] for s in snapshots}
        snap_log = [x for x in snap_log if x["snapshot-id"] in keep_ids]
        meta_log = (list(prev_meta.get("metadata-log", []))
                    if prev_meta else [])
        if prev_version:
            meta_log.append({
                "timestamp-ms": prev_meta["last-updated-ms"],
                "metadata-file": os.path.join(
                    self.meta_dir, f"v{prev_version}.metadata.json")})
        prev_max = int(self.schema.options.get(
            "metadata.iceberg.previous-versions-max", "100"))
        expired_meta = meta_log[:-prev_max] if len(meta_log) > prev_max \
            else []
        meta_log = meta_log[-prev_max:]

        spec = partition_spec_json(self.schema)
        metadata = {
            "format-version": FORMAT_VERSION,
            "table-uuid": (prev_meta["table-uuid"] if prev_meta
                           else str(uuid.uuid4())),
            "location": self.table.paths.root,
            "last-sequence-number": snap.id,
            "last-updated-ms": snap.timestamp_ms,
            "last-column-id": max(field_ids(self.schema).values(),
                                  default=0),
            "current-schema-id": self.schema.schema_id,
            "schemas": schemas,
            "default-spec-id": 0,
            "partition-specs": [spec],
            "last-partition-id": PARTITION_FIELD_ID_START
            + max(len(self.schema.partition_keys) - 1, 0),
            "default-sort-order-id": 0,
            "sort-orders": [{"order-id": 0, "fields": []}],
            "properties": {
                "schema.name-mapping.default": json.dumps(
                    name_mapping_json(self.schema)),
            },
            "current-snapshot-id": snap.id,
            "snapshots": snapshots,
            "snapshot-log": snap_log,
            "metadata-log": meta_log,
            # paimon tags surface as Iceberg tag refs (ref:
            # IcebergCommitCallback implements TagCallback)
            "refs": {
                "main": {"snapshot-id": snap.id, "type": "branch"},
                **{name: {"snapshot-id": sid, "type": "tag"}
                   for name, sid in tags.items() if sid in keep_ids},
            },
        }
        version = (prev_version or 0) + 1
        vpath = os.path.join(self.meta_dir, f"v{version}.metadata.json")
        with open(f"{vpath}.tmp", "w") as f:
            json.dump(metadata, f, indent=2)
        os.replace(f"{vpath}.tmp", vpath)
        with open(os.path.join(self.meta_dir, "manifest-index.json.tmp"),
                  "w") as f:
            json.dump(index, f)
        os.replace(os.path.join(self.meta_dir, "manifest-index.json.tmp"),
                   os.path.join(self.meta_dir, "manifest-index.json"))
        hint = os.path.join(self.meta_dir, VERSION_HINT)
        with open(f"{hint}.tmp", "w") as f:
            f.write(str(version))
        os.replace(f"{hint}.tmp", hint)

        # ---- physical cleanup (after the hint points past them) ----
        for m in expired_meta:
            try:
                os.remove(m["metadata-file"])
            except FileNotFoundError:
                pass
        if dropped:
            retained_manifests: set[str] = {
                r["manifest_path"] for r in new_rows}
            for s in snapshots:
                if s["snapshot-id"] == snap.id:
                    continue
                try:
                    _, rs = read_avro_file(s["manifest-list"])
                    retained_manifests |= {r["manifest_path"] for r in rs}
                except FileNotFoundError:
                    pass
            for s in dropped:
                try:
                    _, rs = read_avro_file(s["manifest-list"])
                except FileNotFoundError:
                    continue
                for r in rs:
                    if r["manifest_path"] not in retained_manifests:
                        try:
                            os.remove(r["manifest_path"])
                        except FileNotFoundError:
                            pass
                os.remove(s["manifest-list"])


# ---------------- an independent reader (for verification) ----------------

def read_iceberg(spark, table_root: str, snapshot_id: int | None = None,
                 ref: str | None = None):
    """Read a table PURELY through its Iceberg metadata — version hint →
    metadata.json → manifest list → manifests → data files — never
    touching paimon snapshots/manifests. Used by tests and the
    iceberg_mirror_read oracle query to prove an Iceberg reader sees
    the same rows the engine does. `snapshot_id` / `ref` (tag or
    branch name from `refs`) time-travel exactly as an Iceberg
    reader's VERSION AS OF does."""
    meta_dir = os.path.join(table_root, "metadata")
    with open(os.path.join(meta_dir, VERSION_HINT)) as f:
        version = int(f.read().strip())
    with open(os.path.join(meta_dir, f"v{version}.metadata.json")) as f:
        meta = json.load(f)
    if ref is not None:
        if ref not in meta.get("refs", {}):
            raise ValueError(f"no iceberg ref {ref!r}")
        snapshot_id = meta["refs"][ref]["snapshot-id"]
    want = (snapshot_id if snapshot_id is not None
            else meta["current-snapshot-id"])
    cur = next((s for s in meta["snapshots"] if s["snapshot-id"] == want),
               None)
    if cur is None:
        raise ValueError(f"iceberg snapshot {want} not in retained "
                         f"snapshots")
    _, rows = read_avro_file(cur["manifest-list"])
    schema = next(s for s in meta["schemas"]
                  if s["schema-id"] == meta["current-schema-id"])
    spec = meta["partition-specs"][meta["default-spec-id"]]
    by_id = {f["id"]: f["name"] for f in schema["fields"]}
    part_cols = [by_id[f["source-id"]] for f in spec["fields"]]

    from pyspark.sql import functions as F

    # collect (path, format, partition tuple) from the manifests — this
    # is metadata, O(files) driver-side like any planner; the DATA read
    # below is ONE multi-path scan per format (not a per-file union,
    # which would explode the plan at 10⁵ files), with identity
    # partition values re-attached via a broadcast join keyed on
    # _metadata.file_path (spec: Column Projection / constant fields)
    files: list[tuple[str, str, tuple]] = []
    delete_files: list[tuple[str, tuple]] = []
    for row in rows:
        _, entries = read_avro_file(row["manifest_path"])
        for e in entries:
            if e["status"] == 2:                       # DELETED
                continue
            d = e["data_file"]
            if d.get("content", 0) == 1:               # position deletes
                delete_files.append(
                    (d["file_path"],
                     tuple(d["partition"].get(k) for k in part_cols)))
                continue
            files.append((d["file_path"], d["file_format"].lower(),
                          tuple(d["partition"].get(k) for k in part_cols)))
    if not files:
        raise ValueError(f"iceberg metadata at {meta_dir} lists no files")

    cols = [f["name"] for f in schema["fields"]]
    type_of = {f["name"]: f["type"] for f in schema["fields"]}
    out = None
    for fmt in sorted({f[1] for f in files}):
        paths = [f[0] for f in files if f[1] == fmt]
        reader = spark.read.format(fmt)
        if fmt == "parquet":
            reader = reader.option("mergeSchema", "true")
        df = reader.load(paths)
        if delete_files:
            # apply position deletes PARTITION-SCOPED, as the v2 spec
            # requires: a delete file only applies to data files of its
            # own partition. Partition tuples interned to driver-side
            # ids; both maps are metadata-sized broadcasts, the delete
            # parquet is read once, and the anti-join below is on the
            # spec's (file_path, pos).
            pid_of: dict[tuple, int] = {}
            dat_rows = [(os.path.abspath(p),
                         pid_of.setdefault(parts, len(pid_of)))
                        for p, _f2, parts in files]
            del_rows = [(os.path.abspath(p),
                         pid_of.setdefault(parts, len(pid_of)))
                        for p, parts in delete_files]
            if len(pid_of) == 1:
                # single partition tuple across every data AND delete
                # file (unpartitioned tables, or one-partition scans) —
                # the pid scoping is vacuous (__del_pid == __dat_pid is
                # true for every pair), so skip both broadcast maps and
                # their joins (r14, guide §2.4: two createDataFrames +
                # two broadcast joins + a filter removed; deletes
                # referencing unknown files match nothing in the
                # anti-join either way, same as failing the dat_map
                # join). Measured: iceberg_dv_mirror_read 1.29 -> ~0.6 s.
                dels = (spark.read.parquet(
                            *[p for p, _ in delete_files])
                        .select(F.col("file_path").alias("__ice_fp"),
                                F.col("pos").alias("__ice_pos")))
            else:
                dat_map = spark.createDataFrame(
                    dat_rows, "__ice_fp string, __dat_pid int")
                del_map = spark.createDataFrame(
                    del_rows, "__del_src string, __del_pid int")
                dels = (spark.read.parquet(
                            *[p for p, _ in delete_files])
                        .select(F.regexp_replace(
                                    F.col("_metadata.file_path")
                                    .cast("string"),
                                    "^file:/+", "/").alias("__del_src"),
                                F.col("file_path").alias("__ice_fp"),
                                F.col("pos").alias("__ice_pos"))
                        .join(F.broadcast(del_map), "__del_src")
                        .join(F.broadcast(dat_map), "__ice_fp")
                        .filter(F.col("__del_pid") == F.col("__dat_pid"))
                        .select("__ice_fp", "__ice_pos"))
            df = (df.withColumn(
                      "__ice_fp",
                      F.regexp_replace(
                          F.col("_metadata.file_path").cast("string"),
                          "^file:/+", "/"))
                  .withColumn("__ice_pos", F.col("_metadata.row_index"))
                  .join(dels, ["__ice_fp", "__ice_pos"], "left_anti")
                  .drop("__ice_pos"))
        if part_cols:
            part_rows = [(os.path.abspath(p),
                          *[_py_part(v, type_of[k])
                            for k, v in zip(part_cols, parts)])
                         for p, f2, parts in files if f2 == fmt]
            ddl = ", ".join(["__ice_fp string"]
                            + [f"{k} {_spark_ddl(type_of[k])}"
                               for k in part_cols])
            pdf = spark.createDataFrame(part_rows, ddl)
            if "__ice_fp" not in df.columns:   # delete path already added it
                df = df.withColumn(
                    "__ice_fp",
                    F.regexp_replace(
                        F.col("_metadata.file_path").cast("string"),
                        "^file:/+", "/"))
            df = df.join(F.broadcast(pdf), "__ice_fp")
        return_cols = [c for c in cols if c in df.columns]
        df = df.select(*return_cols,
                       *[F.lit(None).alias(c) for c in cols
                         if c not in df.columns]).select(*cols)
        out = df if out is None else out.unionByName(df)
    return out


def _py_part(v: Any, iceberg_type: str) -> Any:
    """Manifest partition value → python value for the broadcast-join
    side (dates travel as day ordinals in the manifest struct)."""
    if v is None or iceberg_type != "date":
        return v
    return _EPOCH + datetime.timedelta(days=int(v))


def _spark_ddl(iceberg_type: str) -> str:
    return {"int": "int", "long": "bigint", "boolean": "boolean",
            "float": "float", "double": "double", "date": "date",
            "string": "string"}.get(iceberg_type, "string")
