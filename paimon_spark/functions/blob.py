"""BLOB columns: large binary values stored OUTSIDE the columnar files
(ref: paimon-api/.../types/BlobType.java since 1.4 + paimon-core blob/
ManagedBlobReferenceFile — "blob fields … are treated as blob-file
fields", descriptors travel inline).

Why: a 2 MB image inside a parquet row group destroys scan performance
for every query that never touches it — row groups bloat, min/max pages
interleave with megabytes of payload, and column pruning still pays the
I/O fragmentation. Externalizing moves the bytes to append-only
`blob/*.blob` files and stores a (file, offset, length) descriptor
struct in the data file; scans that skip the blob column read ONLY
descriptors, and compaction rewrites descriptors without copying blob
bytes.

Spark-first shape: both directions are Arrow-batched `mapInPandas`
passes — the write side streams each task's blob bytes into ONE
task-local .blob file (sequential append, no small files), the read
side range-reads with per-file handle reuse. Declared via table option
`blob.columns` (Spark has no BLOB SQL type; the declared column type
stays BINARY, the physical parquet stores the descriptor struct)."""

from __future__ import annotations

import os
from typing import Iterator

from pyspark.sql import DataFrame, types as T

BLOB_DIR = "blob"

BLOB_STRUCT = T.StructType([
    T.StructField("file", T.StringType()),
    T.StructField("offset", T.LongType()),
    T.StructField("length", T.LongType()),
])


def blob_columns(schema) -> list[str]:
    """Validated `blob.columns` option → column list."""
    raw = schema.options.get("blob.columns", "")
    cols = [c.strip() for c in raw.split(",") if c.strip()]
    for c in cols:
        if c not in schema.field_names:
            raise ValueError(f"blob.columns: no column {c}")
        if not isinstance(schema.data_type(c), T.BinaryType):
            raise ValueError(
                f"blob.columns: {c} must be BINARY, is "
                f"{schema.data_type(c).simpleString()}")
        if c in schema.partition_keys or c in schema.primary_keys:
            raise ValueError(f"blob.columns: {c} cannot be a partition "
                             f"or primary key column")
    return cols


def is_descriptor_type(dt: T.DataType) -> bool:
    return (isinstance(dt, T.StructType)
            and [f.name for f in dt.fields] == ["file", "offset", "length"])


def _swap_fields(schema: T.StructType, cols: list[str],
                 new_type: T.DataType) -> T.StructType:
    return T.StructType([
        T.StructField(f.name, new_type if f.name in cols else f.dataType,
                      True)
        for f in schema.fields
    ])


def externalize_blobs(df: DataFrame, cols: list[str],
                      table_root: str) -> DataFrame:
    """BINARY columns → descriptor structs; bytes appended to one
    `blob/blob-<uuid>.blob` file per write task."""
    out_schema = _swap_fields(df.schema, cols, BLOB_STRUCT)
    blob_dir = os.path.join(table_root, BLOB_DIR)

    def fn(batches: Iterator) -> Iterator:
        import uuid as _uuid
        fh = None
        fname = None
        offset = 0
        for pdf in batches:
            for c in cols:
                descs = []
                for v in pdf[c]:
                    if v is None:
                        descs.append(None)
                        continue
                    if fh is None:
                        os.makedirs(blob_dir, exist_ok=True)
                        fname = f"blob-{_uuid.uuid4().hex}.blob"
                        fh = open(os.path.join(blob_dir, fname), "wb")
                    b = bytes(v)
                    fh.write(b)
                    descs.append({"file": fname, "offset": offset,
                                  "length": len(b)})
                    offset += len(b)
                pdf[c] = descs
            yield pdf
        if fh is not None:
            fh.close()

    return df.mapInPandas(fn, out_schema)


def materialize_blobs(df: DataFrame, cols: list[str],
                      table_root: str) -> DataFrame:
    """Descriptor structs → BINARY via range reads (handles cached per
    blob file within the task)."""
    present = [c for c in cols
               if c in df.columns and is_descriptor_type(df.schema[c].dataType)]
    if not present:
        return df
    out_schema = _swap_fields(df.schema, present, T.BinaryType())
    blob_dir = os.path.join(table_root, BLOB_DIR)

    def fn(batches: Iterator) -> Iterator:
        handles: dict[str, object] = {}
        try:
            for pdf in batches:
                for c in present:
                    vals = []
                    for d in pdf[c]:
                        if d is None or d.get("file") is None:
                            vals.append(None)
                            continue
                        fh = handles.get(d["file"])
                        if fh is None:
                            fh = open(os.path.join(blob_dir, d["file"]),
                                      "rb")
                            handles[d["file"]] = fh
                        fh.seek(int(d["offset"]))
                        vals.append(fh.read(int(d["length"])))
                    pdf[c] = vals
                yield pdf
        finally:
            for fh in handles.values():
                fh.close()

    return df.mapInPandas(fn, out_schema)


def live_blob_files(table) -> set[str]:
    """Blob files referenced by the CURRENT snapshot — a distributed
    scan over descriptor columns only (column-pruned: blob bytes never
    move). Used by remove_orphan_blobs."""
    cols = blob_columns(table.schema)
    if not cols:
        return set()
    from pyspark.sql import functions as F
    df = table.read(blob_as_descriptor=True)
    names = None
    for c in cols:
        part = df.select(F.col(f"{c}.file").alias("f")).where(
            F.col(f"{c}.file").isNotNull()).distinct()
        names = part if names is None else names.union(part).distinct()
    return {r.f for r in names.collect()}


def remove_orphan_blobs(table) -> int:
    """Delete blob files no retained snapshot references. Separate from
    remove_orphan_files because references live INSIDE data files (the
    reference tracks them via blob reference files); the scan here is
    descriptor-column-only."""
    blob_dir = os.path.join(table.paths.root, BLOB_DIR)
    if not os.path.isdir(blob_dir):
        return 0
    live: set[str] = set()
    latest = table.paths.latest_snapshot_id() or 0
    earliest = table.paths.earliest_snapshot_id() or latest
    pinned = set(table.paths.list_tags().values())
    for sid in sorted(set(range(earliest, latest + 1)) | pinned):
        try:
            df = table.read(snapshot_id=sid, blob_as_descriptor=True)
        except Exception:
            continue
        from pyspark.sql import functions as F
        for c in blob_columns(table.schema):
            if c not in df.columns:
                continue
            live |= {r.f for r in df.select(
                F.col(f"{c}.file").alias("f"))
                .where(F.col(f"{c}.file").isNotNull())
                .distinct().collect()}
    removed = 0
    for fn in os.listdir(blob_dir):
        if fn not in live:
            os.remove(os.path.join(blob_dir, fn))
            removed += 1
    return removed
