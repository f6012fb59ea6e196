"""Table schema: fields with ids, partition/primary keys, options.

Mirrors the reference's TableSchema
(ref: paimon-api/src/main/java/org/apache/paimon/schema/TableSchema.java:46-76
— version, id, fields, highestFieldId, partitionKeys, primaryKeys, options)
and SchemaChange surface
(ref: paimon-api/src/main/java/org/apache/paimon/schema/SchemaChange.java:87-166).

Fields carry stable ids in StructField metadata ("paimon.field.id") so old
data files can be read after rename/drop/add (read-time projection by id).
Serialization reuses Spark's own StructType JSON format (pure-Python,
no active session needed).
"""

from __future__ import annotations

import json
from dataclasses import dataclass, field
from typing import Any

from pyspark.sql import types as T

FIELD_ID_KEY = "paimon.field.id"

# hidden columns on primary-key tables (ref: paimon-api/.../table/SpecialFields.java:79-94)
SEQ_COL = "_sequence_number"
KIND_COL = "_row_kind"
BUCKET_COL = "__bucket"
ROW_ID_COL = "_ROW_ID"   # row-tracking lineage id (ref: special row-id cols)
HIDDEN_COLS = (SEQ_COL, KIND_COL)
# merge tie-break for equal sequence numbers (concurrent writers both
# take max_sequence+1): (file mtime, file path), mirroring the
# reference's Levels.java:62-81 L0 comparator (maxSeq, then
# creationTime, then fileName) — deterministic, last-created wins
TIE_COL = "_SEQ_TIE"

ROW_KINDS = ("+I", "-U", "+U", "-D")  # ref: paimon-api/.../types/RowKind.java:35-56


@dataclass
class TableSchema:
    schema_id: int
    struct: T.StructType                 # logical fields only (no hidden cols)
    partition_keys: list[str]
    primary_keys: list[str]
    options: dict[str, str]
    highest_field_id: int = -1

    # ---------------- construction ----------------

    @staticmethod
    def create(
        struct: T.StructType,
        partition_keys: list[str] | None = None,
        primary_keys: list[str] | None = None,
        options: dict[str, str] | None = None,
    ) -> "TableSchema":
        partition_keys = list(partition_keys or [])
        primary_keys = list(primary_keys or [])
        options = dict(options or {})
        fields = []
        for i, f in enumerate(struct.fields):
            md = dict(f.metadata or {})
            md[FIELD_ID_KEY] = i
            nullable = f.nullable and f.name not in primary_keys and f.name not in partition_keys
            fields.append(T.StructField(f.name, f.dataType, nullable, md))
        for pk in primary_keys:
            if pk not in struct.fieldNames():
                raise ValueError(f"primary key {pk} not in schema")
        for p in partition_keys:
            if p not in struct.fieldNames():
                raise ValueError(f"partition key {p} not in schema")
        if (primary_keys and partition_keys
                and not set(partition_keys) <= set(primary_keys)):
            # cross-partition update mode (ref: paimon-core/.../schema/
            # SchemaValidation.java — primary keys must contain all
            # partition keys unless the cross-partition global index is
            # active, which requires dynamic bucket and forbids
            # sequence.field; GlobalIndexAssigner.java:447)
            if int(options.get("bucket", "-1")) != -1:
                raise ValueError(
                    "primary keys must contain all partition keys unless "
                    "bucket=-1 (cross-partition update mode): partition "
                    f"{partition_keys} ⊄ primary {primary_keys}")
            if options.get("sequence.field"):
                raise ValueError(
                    "sequence.field is not supported with cross-partition "
                    "update (retractions rely on commit order)")
            if options.get("merge-engine", "deduplicate") != "deduplicate":
                raise ValueError(
                    "cross-partition update supports merge-engine="
                    "deduplicate only")
        fmt = options.get("file.format", "parquet")
        if fmt == "csv":
            bad = [f.name for f in struct.fields
                   if isinstance(f.dataType, (T.ArrayType, T.MapType,
                                              T.StructType, T.BinaryType))
                   or type(f.dataType).__name__ == "VariantType"]
            if bad:
                raise ValueError(
                    f"file.format=csv supports flat atomic schemas only; "
                    f"complex/binary fields: {bad}")
        if fmt == "json":
            bad = [f.name for f in struct.fields
                   if type(f.dataType).__name__ == "VariantType"]
            if bad:
                raise ValueError(
                    f"file.format=json cannot store VARIANT fields: {bad}")
        if fmt not in ("parquet", "orc"):
            # deletion vectors / row lineage address rows by the file-source
            # _metadata.row_index, which Spark generates for parquet/orc only
            for opt in ("deletion-vectors.enabled", "row-tracking.enabled"):
                if options.get(opt, "false") == "true":
                    raise ValueError(
                        f"{opt} requires file.format parquet or orc "
                        f"(positional row addressing), got {fmt}")
            if (options.get("file-index.bloom-filter.columns", "").strip()
                    or options.get("file-index.bitmap.columns", "").strip()):
                # sidecars are mined from the written file with pyarrow,
                # which reads parquet/orc only
                raise ValueError(
                    "file-index sidecars require file.format parquet or "
                    f"orc, got {fmt}")
        bucketed = primary_keys or (
            int(options.get("bucket", "-1")) > 0 and options.get("bucket-key"))
        if bucketed and "bucket.hash-function" not in options:
            # new tables bucket with Spark's own murmur3 (exactly
            # HashPartitioning.partitionIdExpression), which lets reads
            # report the files' bucketing to Catalyst and skip the merge
            # exchange; absence of the option means a pre-r7 table
            # bucketed with xxhash64 (read-compat default in bucket_hash)
            options["bucket.hash-function"] = "murmur3"
        if options.get("bucket.hash-function", "xxhash64") not in (
                "murmur3", "xxhash64"):
            raise ValueError("bucket.hash-function must be murmur3 or "
                             "xxhash64")
        if (options.get("chain-table.enabled") == "true" and primary_keys
                and options.get("merge-engine", "deduplicate") != "deduplicate"):
            # chain reconstruction merges across branches with last-writer-
            # wins; partial-update/aggregation field merging across branches
            # is not implemented (ref: ChainTableUtils.validateChainTable*
            # restricts the shapes chain reads support)
            raise ValueError(
                "chain-table.enabled supports merge-engine=deduplicate only")
        return TableSchema(
            schema_id=0,
            struct=T.StructType(fields),
            partition_keys=partition_keys,
            primary_keys=primary_keys,
            options=options,
            highest_field_id=len(fields) - 1,
        )

    # ---------------- derived ----------------

    @property
    def field_names(self) -> list[str]:
        return self.struct.fieldNames()

    @property
    def is_pk_table(self) -> bool:
        return bool(self.primary_keys)

    @property
    def bucket_hash(self) -> str:
        """Bucket hash function: murmur3 (Spark HashPartitioning parity,
        new-table default) or xxhash64 (pre-r7 tables — option absent)."""
        return self.options.get("bucket.hash-function", "xxhash64")

    @property
    def num_buckets(self) -> int:
        return int(self.options.get("bucket", "-1"))

    @property
    def bucket_keys(self) -> list[str]:
        """Bucket key = explicit option, else PK minus partition keys.
        (ref: paimon-api/.../schema/TableSchema.java trimmedPrimaryKeys semantics)"""
        bk = self.options.get("bucket-key")
        if bk:
            return [c.strip() for c in bk.split(",")]
        if self.primary_keys:
            return [k for k in self.primary_keys if k not in self.partition_keys] or list(self.primary_keys)
        return []

    @property
    def trimmed_primary_keys(self) -> list[str]:
        return [k for k in self.primary_keys if k not in self.partition_keys] or list(self.primary_keys)

    @property
    def cross_partition_update(self) -> bool:
        """Partition keys ⊄ primary keys: keys may move between partitions;
        writes go through the global index (operators/cross_partition.py)."""
        return bool(self.primary_keys and self.partition_keys
                    and not set(self.partition_keys) <= set(self.primary_keys))

    @property
    def merge_engine(self) -> str:
        # ref: CoreOptions.java:707-710 (deduplicate | partial-update | aggregation | first-row)
        return self.options.get("merge-engine", "deduplicate")

    @property
    def sequence_field(self) -> list[str]:
        sf = self.options.get("sequence.field")
        return [c.strip() for c in sf.split(",")] if sf else []

    @property
    def rowkind_field(self) -> str | None:
        return self.options.get("rowkind.field")  # ref: CoreOptions.java:1172

    def field_agg_functions(self) -> dict[str, str]:
        """fields.<f>.aggregate-function options for the aggregation engine."""
        out = {}
        for k, v in self.options.items():
            if k.startswith("fields.") and k.endswith(".aggregate-function"):
                out[k[len("fields."):-len(".aggregate-function")]] = v
        return out

    def sequence_groups(self) -> dict[str, list[str]]:
        """fields.<seq>.sequence-group = c1,c2 → {seq_col: [c1, c2]}.
        (ref: paimon-core/.../compact/PartialUpdateMergeFunction.java:81-102)"""
        out: dict[str, list[str]] = {}
        for k, v in self.options.items():
            if k.startswith("fields.") and k.endswith(".sequence-group"):
                seq_col = k[len("fields."):-len(".sequence-group")]
                out[seq_col] = [c.strip() for c in v.split(",")]
        return out

    def data_type(self, name: str) -> T.DataType:
        return self.struct[name].dataType

    def spark_read_struct(self) -> T.StructType:
        """Physical file schema: logical fields minus partition cols, plus
        hidden cols on PK tables (partition values live in directory paths).
        blob.columns store a (file, offset, length) descriptor struct in
        place of the declared BINARY (paimon_spark/functions/blob.py)."""
        from paimon_spark.functions.blob import BLOB_STRUCT, blob_columns
        bcols = set(blob_columns(self))
        fields = [f if f.name not in bcols
                  else T.StructField(f.name, BLOB_STRUCT, True)
                  for f in self.struct.fields
                  if f.name not in self.partition_keys]
        if self.is_pk_table:
            fields = fields + [
                T.StructField(SEQ_COL, T.LongType(), False),
                T.StructField(KIND_COL, T.StringType(), False),
            ]
        return T.StructType(fields)

    # ---------------- schema evolution ----------------
    # (ref: paimon-api/.../schema/SchemaChange.java:87-166)

    def _bump(self) -> "TableSchema":
        return TableSchema(self.schema_id + 1, self.struct, list(self.partition_keys),
                           list(self.primary_keys), dict(self.options), self.highest_field_id)

    def add_column(self, name: str, dtype: T.DataType, nullable: bool = True) -> "TableSchema":
        if name in self.field_names:
            raise ValueError(f"column {name} exists")
        s = self._bump()
        s.highest_field_id += 1
        md = {FIELD_ID_KEY: s.highest_field_id}
        s.struct = T.StructType(list(self.struct.fields) + [T.StructField(name, dtype, nullable, md)])
        return s

    def rename_column(self, old: str, new: str) -> "TableSchema":
        if old in self.partition_keys or old in self.primary_keys:
            raise ValueError("cannot rename partition/primary key column")
        s = self._bump()
        s.struct = T.StructType([
            T.StructField(new if f.name == old else f.name, f.dataType, f.nullable, f.metadata)
            for f in self.struct.fields
        ])
        return s

    def drop_column(self, name: str) -> "TableSchema":
        if name in self.partition_keys or name in self.primary_keys:
            raise ValueError("cannot drop partition/primary key column")
        s = self._bump()
        s.struct = T.StructType([f for f in self.struct.fields if f.name != name])
        return s

    def update_column_type(self, name: str, dtype: T.DataType) -> "TableSchema":
        s = self._bump()
        s.struct = T.StructType([
            T.StructField(f.name, dtype if f.name == name else f.dataType, f.nullable, f.metadata)
            for f in self.struct.fields
        ])
        return s

    def set_option(self, key: str, value: str) -> "TableSchema":
        s = self._bump()
        s.options[key] = value
        return s

    def remove_option(self, key: str) -> "TableSchema":
        """(ref: SchemaChange.java removeOption)"""
        s = self._bump()
        s.options.pop(key, None)
        return s

    def update_column_nullability(self, name: str, nullable: bool) -> "TableSchema":
        """(ref: SchemaChange.java updateColumnNullability). Tightening to
        NOT NULL is a declaration for new writes — like the reference, old
        files are not re-validated."""
        if not nullable and name in self.primary_keys:
            pass  # PK columns are implicitly non-null already
        s = self._bump()
        s.struct = T.StructType([
            T.StructField(f.name, f.dataType,
                          nullable if f.name == name else f.nullable, f.metadata)
            for f in self.struct.fields])
        return s

    def update_column_comment(self, name: str, comment: str) -> "TableSchema":
        """(ref: SchemaChange.java updateColumnComment)"""
        s = self._bump()
        fields = []
        for f in self.struct.fields:
            md = dict(f.metadata)
            if f.name == name:
                md["comment"] = comment
            fields.append(T.StructField(f.name, f.dataType, f.nullable, md))
        s.struct = T.StructType(fields)
        return s

    def move_column(self, name: str, position: str = "first",
                    after: str | None = None) -> "TableSchema":
        """Reorder a column: position='first' or 'after' another column —
        purely logical; files are untouched and reads keep resolving by
        field id. (ref: SchemaChange.java Move FIRST/AFTER)"""
        fields = [f for f in self.struct.fields if f.name != name]
        target = next(f for f in self.struct.fields if f.name == name)
        if position == "first":
            fields.insert(0, target)
        elif position == "after":
            idx = next(i for i, f in enumerate(fields) if f.name == after)
            fields.insert(idx + 1, target)
        else:
            raise ValueError("position must be 'first' or 'after'")
        s = self._bump()
        s.struct = T.StructType(fields)
        return s

    # ---------------- (de)serialization ----------------

    def to_json(self) -> str:
        return json.dumps({
            "version": 1,
            "id": self.schema_id,
            "fields": self.struct.jsonValue()["fields"],
            "highestFieldId": self.highest_field_id,
            "partitionKeys": self.partition_keys,
            "primaryKeys": self.primary_keys,
            "options": self.options,
        }, indent=2)

    @staticmethod
    def from_json(s: str) -> "TableSchema":
        d = json.loads(s)
        struct = T.StructType.fromJson({"type": "struct", "fields": d["fields"]})
        return TableSchema(
            schema_id=d["id"],
            struct=struct,
            partition_keys=d["partitionKeys"],
            primary_keys=d["primaryKeys"],
            options=d.get("options", {}),
            highest_field_id=d.get("highestFieldId", len(struct.fields) - 1),
        )
