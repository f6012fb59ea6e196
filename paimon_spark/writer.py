"""Batch write path: repartition → staged parquet write → footer-stat
collection → atomic snapshot commit.

Mirrors the reference's Spark writer flow
(ref: paimon-spark/.../commands/PaimonSparkWriter.scala:126,187-233,583-584 —
repartition by (partition, bucket), per-task writers, driver-side commit)
and the commit protocol
(ref: paimon-core/.../operation/FileStoreCommitImpl.java:132-136,359-397 —
optimistic retry + conflict detection).

Scale notes:
- The data write is a single declarative `df.write.partitionBy(...)` —
  Catalyst/Tungsten handle layout; nothing per-row in Python.
- Stats come from parquet FOOTERS (pyarrow metadata only) — no second scan.
- Bucketing = `pmod(xxhash64(bucket keys), n)` computed JVM-side; on a real
  cluster the same expression co-locates writes with `repartition`.
"""

from __future__ import annotations

import logging
import os
import shutil
import time
import urllib.parse
import uuid
from typing import TYPE_CHECKING, Any

import pyarrow.parquet as pq
from pyspark.sql import DataFrame, SparkSession, functions as F
from pyspark.sql import types as T

from paimon_spark.metadata import (
    ADD, COMMIT_APPEND, COMMIT_COMPACT, COMMIT_OVERWRITE, DELETE,
    FileEntry, Snapshot, TablePaths, stat_from_json, stat_to_json,
)
from paimon_spark.schema import (BUCKET_COL, KIND_COL, ROW_ID_COL, SEQ_COL,
                                 TableSchema)

if TYPE_CHECKING:
    from paimon_spark.table import Table

HIVE_NULL = "__HIVE_DEFAULT_PARTITION__"

# data-file formats (ref: CoreOptions.java:337 `file.format` — parquet/orc
# are the columnar scale path; avro/csv/json are row formats the reference
# also writes). avro needs the external spark-avro module — gated below.
DATA_FORMATS = ("parquet", "orc", "avro", "csv", "json", "text")


def format_extension(fmt: str) -> str:
    """File extension a format's writer produces (Spark's text source
    writes .txt)."""
    return "txt" if fmt == "text" else fmt

# csv cannot distinguish null from "" without a sentinel; use the classic
# Hive \N marker on BOTH write and read so round-trips are lossless
_FORMAT_OPTS = {"csv": {"nullValue": "\\N", "header": "false"}}

# Spark 4.1's orc/csv/json/avro datasources reject TimeType outright
# (UNSUPPORTED_DATA_TYPE_FOR_DATASOURCE; probed r7 — only parquet writes
# it natively). The table schema is the source of truth, so these formats
# store TIME columns as canonical ISO-8601 strings and reads restore the
# declared type (Table._freader). ISO HH:MM:SS[.ffffff] compares
# lexicographically == chronologically, so staged string min/max map 1:1
# onto time stats (converted back to times in _adopt_staged).
TIME_AS_STRING_FORMATS = frozenset({"orc", "csv", "json", "avro"})


def time_shim_cols(struct: T.StructType) -> list[str]:
    """Top-level TIME columns of `struct` (nested TIME is rejected at
    stage time — the shim would need a deep rewrite to round-trip it)."""
    return [f.name for f in struct.fields
            if isinstance(f.dataType, T.TimeType)]


def format_options(fmt: str) -> dict:
    return dict(_FORMAT_OPTS.get(fmt, {}))


_AVRO_OK: bool | None = None

# the 'avro' short name is registered only by the external spark-avro
# module, but the classes themselves ship inside spark-sql — address the
# file format by class name so avro works on a bare pyspark install
AVRO_CLASS = "org.apache.spark.sql.avro.AvroFileFormat"


def spark_format_name(fmt: str) -> str:
    return AVRO_CLASS if fmt == "avro" else fmt


def require_avro(spark) -> None:
    """Probe the classpath once; fail with a deployment hint instead of a
    lookup error mid-query when the avro classes are truly absent."""
    global _AVRO_OK
    if _AVRO_OK is None:
        try:
            spark._jvm.java.lang.Class.forName(AVRO_CLASS)
            _AVRO_OK = True
        except Exception:
            _AVRO_OK = False
    if not _AVRO_OK:
        raise RuntimeError(
            "file.format=avro requires the spark-avro classes on the "
            "classpath (e.g. --packages org.apache.spark:spark-avro_2.13); "
            "they are not deployed in this session")


_INT_CHAIN = (T.ByteType, T.ShortType, T.IntegerType, T.LongType)


def _wider(a: T.DataType, b: T.DataType) -> bool:
    """True iff `a` strictly widens `b` losslessly (integral chain,
    float→double, decimal precision growth at the same scale)."""
    if type(a) is type(b) and not isinstance(a, T.DecimalType):
        return False
    if isinstance(a, _INT_CHAIN) and isinstance(b, _INT_CHAIN):
        return _INT_CHAIN.index(type(a)) > _INT_CHAIN.index(type(b))
    if isinstance(a, T.DoubleType) and isinstance(b, T.FloatType):
        return True
    if isinstance(a, T.DecimalType) and isinstance(b, T.DecimalType):
        return a.scale == b.scale and a.precision > b.precision
    return False


def bucket_expr(schema: TableSchema, n: int | None = None):
    """Bucket assignment (ref: table/sink/FixedBucketRowKeyExtractor.java).
    murmur3 (F.hash) = Spark's HashPartitioning.partitionIdExpression, so
    bucketed files can report their partitioning to Catalyst at read time
    and join/agg against Spark-shuffled sides without an Exchange;
    xxhash64 keeps pre-r7 tables readable. Both JVM-evaluated; we own
    both write & read sides."""
    n = schema.num_buckets if n is None else n
    keys = schema.bucket_keys
    if schema.bucket_hash == "murmur3":
        return F.pmod(F.hash(*[F.col(k) for k in keys]),
                      F.lit(n)).cast("int")
    return F.pmod(F.xxhash64(*[F.col(k) for k in keys]), F.lit(n)).cast("int")


def collect_footer_stats(path: str, columns: list[str]) -> tuple[int, int, dict]:
    """Aggregate per-row-group parquet stats into per-file {col: min/max/nulls}.
    Footer-only read — O(KB) per file regardless of file size."""
    pf = pq.ParquetFile(path)
    md = pf.metadata
    names = md.schema.names
    want = {c: names.index(c) for c in columns if c in names}
    # arrow-level types for decimals: pyarrow can't decode logical-decimal
    # min/max from INT32/INT64 physical stats — min_raw/max_raw + scale can
    arrow_types = {f.name: f.type for f in pf.schema_arrow}
    stats: dict[str, dict] = {}
    for rg in range(md.num_row_groups):
        g = md.row_group(rg)
        for col, idx in want.items():
            try:
                st = g.column(idx).statistics
            except Exception:
                st = None  # e.g. INT96 or other statless physical types
            s = stats.setdefault(col, {"min": None, "max": None, "nulls": 0})
            if st is None:
                s["nulls"] = None
                continue
            if st.null_count is None or s["nulls"] is None:
                s["nulls"] = None
            else:
                s["nulls"] += st.null_count
            try:
                if st.has_min_max:
                    try:
                        mn, mx = st.min, st.max
                    except Exception:
                        import decimal as _dec
                        import pyarrow as _pa
                        at = arrow_types.get(col)
                        if at is not None and _pa.types.is_decimal(at):
                            mn = _dec.Decimal(st.min_raw).scaleb(-at.scale)
                            mx = _dec.Decimal(st.max_raw).scaleb(-at.scale)
                        else:
                            raise
                    if s["min"] is None or mn < s["min"]:
                        s["min"] = mn
                    if s["max"] is None or mx > s["max"]:
                        s["max"] = mx
            except Exception:                          # noqa: BLE001
                pass  # statless physical type (e.g. INT96)
    return md.num_rows, os.path.getsize(path), stats


def parse_partition_path(relpath: str, partition_keys: list[str]) -> dict[str, str]:
    """`dt=20260801/hr=3/part-0.parquet` → {'dt': '20260801', 'hr': '3'} (raw strings)."""
    vals: dict[str, str] = {}
    for seg in relpath.split(os.sep):
        if "=" in seg and not seg.endswith(".parquet"):
            k, v = seg.split("=", 1)
            if k in partition_keys or k == BUCKET_COL:
                vals[k] = urllib.parse.unquote(v)
    return {k: vals[k] for k in partition_keys if k in vals}


def adopt_one_file(src: str, rel_dir: str, root: str, fmt: str, level: int,
                   stat_cols: list[str], index_spec: dict | None,
                   index_fpp: float = 0.01, spark_stats: dict | None = None,
                   mode: str = "rename") -> dict | None:
    """Adopt ONE staged file into the table tree: rename, mine footer
    stats, build the bloom sidecar. Pure function of its arguments and the
    filesystem — safe to run on an executor. Returns a JSON-safe dict
    (stats encoded with stat_to_json) or None for empty files; rows=-1
    means the footer was unreadable (e.g. VARIANT) and the caller must
    count via Spark."""
    final_name = f"data-L{level}-{uuid.uuid4().hex}.{format_extension(fmt)}"
    dest_dir = os.path.join(root, rel_dir)
    os.makedirs(dest_dir, exist_ok=True)
    dest = os.path.join(dest_dir, final_name)
    if mode == "link":               # migrate: no data copy on same fs
        try:
            os.link(src, dest)
        except OSError:
            shutil.copy2(src, dest)
    else:
        os.rename(src, dest)
    if spark_stats is not None:      # pre-aggregated (ORC path), keyed by src
        rows, stats = spark_stats.get(os.path.normpath(src), (0, {}))
        size = os.path.getsize(dest)
    else:
        try:
            rows, size, stats = collect_footer_stats(dest, stat_cols)
        except OSError:
            rows, size, stats = -1, os.path.getsize(dest), {}
    if rows == 0:
        os.remove(dest)
        return None
    index_path = None
    if index_spec and rows != 0:
        from paimon_spark.fileindex import write_file_index
        index_path = write_file_index(root, dest, index_spec, index_fpp)
    return {
        "file_path": os.path.relpath(dest, root), "rows": rows, "size": size,
        "stats": {c: {"min": stat_to_json(s.get("min")),
                      "max": stat_to_json(s.get("max")),
                      "nulls": s.get("nulls")} for c, s in stats.items()},
        "index_path": index_path,
    }


def _adopt_files_distributed(spark, staged: list[tuple[str, str]], root: str,
                             fmt: str, level: int, stat_cols: list[str],
                             index_spec: dict | None, index_fpp: float = 0.01,
                             mode: str = "rename") -> list[dict | None]:
    """Run adopt_one_file for every staged file as one Spark job; only the
    per-file metadata dicts come back to the driver. Footer reads are
    O(KB) each, so tasks are tiny — cap partitions so scheduler overhead
    doesn't dominate."""
    import json

    n_parts = max(1, min(len(staged) // 8 + 1, 64))
    rdd = spark.sparkContext.parallelize(staged, n_parts)

    def _task(pairs):
        for src, rel_dir in pairs:
            r = adopt_one_file(src, rel_dir, root, fmt, level,
                               stat_cols, index_spec, index_fpp, mode=mode)
            yield json.dumps(r)

    return [json.loads(s) for s in rdd.mapPartitions(_task).collect()]


class BatchWriter:
    """Stages a DataFrame into the table layout and commits a snapshot.

    Single logical writer with optimistic-retry commit; concurrent writers
    are safe for APPEND (disjoint files), conflict-checked for OVERWRITE /
    COMPACT (deleted files must still be live), matching
    FileStoreCommitImpl.java's file-level conflict rule.
    """

    def __init__(self, table: "Table", commit_user: str = "paimon-spark"):
        self.table = table
        self.paths: TablePaths = table.paths
        self.schema: TableSchema = table.schema
        self.commit_user = commit_user

    # ---------------- staging ----------------

    def stage(self, df: DataFrame, level: int = 0, seq: int | None = None) -> list[FileEntry]:
        """Write df into final table layout, return uncommitted ADD entries."""
        schema = self.schema
        # unknown input columns: evolve the schema when
        # write.merge-schema=true (ref: SparkWriteOptions MERGE_SCHEMA /
        # paimon docs spark write merge-schema), else raise — a silently
        # dropped column is lost data
        internal = {SEQ_COL, KIND_COL, BUCKET_COL, ROW_ID_COL}
        if schema.rowkind_field:
            internal.add(schema.rowkind_field)
        unknown = [c for c in df.columns
                   if c not in schema.field_names and c not in internal
                   and not c.startswith("__")]
        merge_schema = schema.options.get("write.merge-schema",
                                          "false") == "true"
        if unknown:
            if merge_schema:
                for c in unknown:
                    schema = schema.add_column(
                        c, df.schema[c].dataType)
            else:
                raise ValueError(
                    f"input columns {unknown} not in table schema "
                    f"{schema.field_names}; set write.merge-schema=true "
                    f"to evolve the schema on write")
        if merge_schema:
            # widen declared types toward the input (int→long, float→
            # double, decimal precision growth) instead of a narrowing
            # cast that would null data out (ref: merge-schema write
            # option type merging)
            for f in list(schema.struct.fields):
                if f.name in df.columns and _wider(
                        df.schema[f.name].dataType, f.dataType):
                    schema = schema.update_column_type(
                        f.name, df.schema[f.name].dataType)
        if schema is not self.schema:
            self.table._save_schema(schema)
            self.schema = schema
        pkeys = list(schema.partition_keys)
        part_cols = list(pkeys)

        if schema.is_pk_table:
            if SEQ_COL not in df.columns:
                if seq is None:
                    latest = self.paths.latest_snapshot()
                    seq = (latest.max_sequence + 1) if latest else 1
                df = df.withColumn(SEQ_COL, F.lit(seq).cast("long"))
            if KIND_COL not in df.columns:
                rk = schema.rowkind_field
                if rk and rk in df.columns:
                    df = df.withColumn(KIND_COL, F.col(rk))
                else:
                    df = df.withColumn(KIND_COL, F.lit("+I"))
            if schema.num_buckets > 0 and BUCKET_COL not in df.columns:
                df = df.withColumn(BUCKET_COL, bucket_expr(schema))
                part_cols = pkeys + [BUCKET_COL]
            elif schema.num_buckets == -2 and BUCKET_COL not in df.columns:
                # postpone mode: writes land unbucketed in the -2 pseudo
                # bucket; compaction assigns real buckets later
                # (ref: BucketMode.java:64-73 POSTPONE_MODE)
                df = df.withColumn(BUCKET_COL, F.lit(-2))
                part_cols = pkeys + [BUCKET_COL]
            elif (schema.num_buckets == -1 and BUCKET_COL not in df.columns
                  and "dynamic-bucket.target-row-count" in schema.options):
                # HASH_DYNAMIC mode (ref: index/HashBucketAssigner.java)
                from paimon_spark.operators.dynamic_bucket import assign_buckets
                df = assign_buckets(df.sparkSession, self.paths.root, schema, df)
                part_cols = pkeys + [BUCKET_COL]
            elif BUCKET_COL in df.columns:
                part_cols = pkeys + [BUCKET_COL]
            if BUCKET_COL in df.columns:
                # co-locate each (partition, bucket) in one task → one file
                # per sorted run (ref: PaimonSparkWriter.scala:583-584)
                df = df.repartition(*part_cols)
            # cluster within files by key for locality (LSM sorted-run flavor,
            # ref: mergetree/MergeTreeWriter.java:139-145)
            df = df.sortWithinPartitions(*[c for c in schema.trimmed_primary_keys if c in df.columns]) \
                if schema.trimmed_primary_keys else df
        elif (schema.num_buckets > 0 and schema.bucket_keys
              and BUCKET_COL not in df.columns):
            # BUCKETED APPEND table (ref: CoreOptions bucket + bucket-key
            # on an append-only table — BucketedAppendFileStoreTable):
            # rows route by hash(bucket-key) exactly like PK tables, so
            # bucketed reads/joins and per-bucket streaming order work
            # without primary keys
            df = df.withColumn(BUCKET_COL, bucket_expr(schema))
            part_cols = pkeys + [BUCKET_COL]
            df = df.repartition(*part_cols) \
                   .sortWithinPartitions(*schema.bucket_keys)

        # order columns & enforce declared types (merges/aggregations may
        # have widened them, e.g. sum(decimal(18,6)) -> decimal(28,6)).
        # blob.columns: a descriptor struct (compaction/COW rewrite of
        # already-externalized rows) passes through uncast — casting it
        # to the declared BINARY would corrupt it
        from paimon_spark.functions.blob import (blob_columns,
                                                 externalize_blobs,
                                                 is_descriptor_type)
        bcols = set(blob_columns(schema))

        def _sel(f):
            if f.name in bcols and is_descriptor_type(
                    df.schema[f.name].dataType):
                return F.col(f.name)
            return F.col(f.name).cast(f.dataType).alias(f.name)

        phys = [f for f in schema.struct.fields if f.name not in pkeys]
        extra = [c for c in (SEQ_COL, KIND_COL, ROW_ID_COL) if c in df.columns]
        df = df.select(*part_cols,
                       *[_sel(f) for f in phys if f.name in df.columns],
                       *extra)
        raw_blob = [c for c in bcols if c in df.columns
                    and isinstance(df.schema[c].dataType, T.BinaryType)]
        if raw_blob:
            # fresh binary payloads → blob files + inline descriptors
            df = externalize_blobs(df, raw_blob, self.paths.root)

        # write-time clustering for append tables (ref: CoreOptions
        # CLUSTERING_COLUMNS/_STRATEGY + PaimonSparkWriter.scala:348 —
        # auto: 1 col → order, <5 → zorder, else hilbert): range-
        # partition on the cluster value so files get disjoint ranges
        # (file skipping on the clustered columns), then sort within
        persisted = None
        ccols = [c.strip() for c in
                 schema.options.get("clustering.columns", "").split(",")
                 if c.strip()]
        if ccols and not schema.is_pk_table:
            strategy = schema.options.get("clustering.strategy", "auto")
            if strategy == "auto":
                strategy = ("order" if len(ccols) == 1
                            else "zorder" if len(ccols) < 5 else "hilbert")
            if strategy == "hilbert" and len(ccols) > 4:
                strategy = "zorder"      # our hilbert codec is ≤4-D
            # explicit partition count: AQE would otherwise coalesce the
            # range exchange into one task and defeat the clustering
            n_out = int(schema.options.get(
                "clustering.partitions",
                df.sparkSession.conf.get("spark.sql.shuffle.partitions",
                                         "8")))
            if strategy == "order":
                df = (df.repartitionByRange(n_out, *ccols)
                      .sortWithinPartitions(*ccols))
            else:
                from paimon_spark.operators.sort_compact import (
                    hilbert_value, zvalue)
                # normalization bounds from the INPUT batch — manifest
                # stats don't exist for the rows being written (one
                # small agg job, like the range partitioner's sample).
                # Persist first: without it the agg executes the full
                # input plan a second time — with blob.columns that
                # would re-run externalize_blobs (payloads written
                # twice, first pass orphaned), and non-deterministic
                # inputs could yield bounds inconsistent with the
                # written batch
                df = df.persist()
                persisted = df
                row = df.agg(*[f for c in ccols for f in
                               (F.min(c).alias(f"__lo_{c}"),
                                F.max(c).alias(f"__hi_{c}"))]).first()
                bounds = {c: (row[f"__lo_{c}"], row[f"__hi_{c}"])
                          for c in ccols}
                val = (zvalue(self.table, ccols, bounds)
                       if strategy == "zorder"
                       else hilbert_value(self.table, ccols, bounds))
                df = (df.withColumn("__cluster", val)
                      .repartitionByRange(n_out, "__cluster")
                      .sortWithinPartitions("__cluster")
                      .drop("__cluster"))

        fmt = self.file_format
        if fmt in TIME_AS_STRING_FORMATS:
            for fld in df.schema.fields:
                if isinstance(fld.dataType, T.TimeType):
                    df = df.withColumn(fld.name,
                                       F.col(fld.name).cast("string"))
                elif "time(" in fld.dataType.simpleString():
                    raise ValueError(
                        f"file.format={fmt} cannot store TIME nested "
                        f"inside column {fld.name!r} "
                        f"({fld.dataType.simpleString()}); use parquet "
                        f"or a top-level TIME column")
        staging = os.path.join(self.paths.staging_dir, uuid.uuid4().hex)
        writer = df.write.mode("append")
        if part_cols:
            writer = writer.partitionBy(*part_cols)
        try:
            writer.format(spark_format_name(fmt)) \
                  .options(**format_options(fmt)).save(staging)
        finally:
            if persisted is not None:
                persisted.unpersist()

        staged_struct = T.StructType(
            [f for f in df.schema.fields if f.name not in part_cols])
        entries = self._adopt_staged(staging, level, staged_struct)
        if ROW_ID_COL in extra:
            # rows carried their lineage ids physically into the new files —
            # mark so commit doesn't burn fresh id ranges on them
            for e in entries:
                e.first_row_id = -1
        shutil.rmtree(staging, ignore_errors=True)
        return entries

    @property
    def file_format(self) -> str:
        """Data-file format: parquet (default), orc, avro, csv, or json.
        (ref: CoreOptions.java:337 `file.format`.) Columnar formats are
        the scale path; row formats serve write-heavy/changelog tables.
        Stats for non-parquet formats come from one Spark aggregation over
        the staged files (parquet mines footers)."""
        fmt = self.schema.options.get("file.format", "parquet")
        if fmt not in DATA_FORMATS:
            raise ValueError(f"unsupported file.format {fmt} "
                             f"(supported: {', '.join(DATA_FORMATS)})")
        if fmt == "avro":
            require_avro(self.table.spark or SparkSession.getActiveSession())
        if fmt == "text":
            # reference parity: TextFileFormat.validateDataFields — one
            # string column only (partition keys live in the path). PK /
            # row-tracking tables add system columns to the files.
            phys = [f for f in self.schema.struct.fields
                    if f.name not in self.schema.partition_keys]
            if (len(phys) != 1
                    or not isinstance(phys[0].dataType, T.StringType)
                    or self.schema.is_pk_table
                    or self.schema.options.get("row-tracking.enabled",
                                               "false") == "true"):
                raise ValueError(
                    "file.format=text supports append-only tables with a "
                    "single STRING data column (ref: text/TextFileFormat "
                    "validateDataFields)")
        return fmt

    def _staged_stats_spark(self, staging: str, stat_cols: list[str],
                            staged_struct: T.StructType | None = None) -> dict:
        """Per-file rows + min/max/null stats via ONE Spark aggregation over
        the staged directory — the stats path for formats whose footers
        pyarrow can't mine (ORC stripe stats aren't exposed; avro/csv/json
        have no footers at all). One extra pass over just-written files;
        parquet avoids it entirely via footers. csv/json NEED the explicit
        staged_struct (csv is positional and untyped on disk)."""
        if not any(fn.endswith(f".{format_extension(self.file_format)}")
                   for _, _, fns in os.walk(staging) for fn in fns):
            return {}                        # empty stage (e.g. no-op batch)
        spark = self.table.spark or SparkSession.getActiveSession()
        reader = (spark.read.format(spark_format_name(self.file_format))
                  .options(**format_options(self.file_format))
                  .option("recursiveFileLookup", "true"))
        if staged_struct is not None:
            reader = reader.schema(staged_struct)
        df = reader.load(staging)
        cols = [c for c in stat_cols if c in df.columns]
        aggs = [F.count(F.lit(1)).alias("__rows")]
        for c in cols:
            aggs += [F.min(c).alias(f"__mn_{c}"), F.max(c).alias(f"__mx_{c}"),
                     F.sum(F.col(c).isNull().cast("long")).alias(f"__nl_{c}")]
        out = {}
        for r in (df.groupBy(F.input_file_name().alias("__f"))
                  .agg(*aggs).collect()):
            path = urllib.parse.unquote(r["__f"])
            if path.startswith("file:"):
                path = path[len("file:"):]
                while path.startswith("//"):
                    path = path[1:]
            stats = {c: {"min": r[f"__mn_{c}"], "max": r[f"__mx_{c}"],
                         "nulls": r[f"__nl_{c}"]} for c in cols}
            out[os.path.normpath(path)] = (r["__rows"], stats)
        return out

    def _adopt_staged(self, staging: str, level: int,
                      staged_struct: T.StructType | None = None
                      ) -> list[FileEntry]:
        """Move staged files into the table tree; collect footer stats.

        Large commits (≥ commit.distributed-adopt-threshold files, default
        256) run the per-file work — rename + footer-stat mining + bloom
        sidecar build — as ONE Spark job over the file list, collecting
        metadata only: at 100-TB write fan-out (10^4-10^5 files/commit) a
        driver-serial loop would spend minutes in footer reads, while the
        manifest+snapshot writes that MUST stay on the driver are O(ms).
        (ref: the reference collects per-file DataFileMeta in the write
        tasks and ships CommitMessages — PaimonSparkWriter.scala:187-233)
        """
        schema = self.schema
        fmt = self.file_format
        from paimon_spark.functions.blob import blob_columns as _bcols
        skip_stats = set(schema.partition_keys) | set(_bcols(schema))
        stat_cols = [f.name for f in schema.struct.fields
                     if f.name not in skip_stats] + [SEQ_COL]
        spark_stats = (self._staged_stats_spark(staging, stat_cols,
                                                staged_struct)
                       if fmt != "parquet" else None)
        # standalone sidecar indexes (ref: CoreOptions
        # file-index.bloom-filter.columns / file-index.bitmap.columns)
        from paimon_spark.fileindex import index_spec as _ispec
        index_spec = _ispec(schema.options)

        staged: list[tuple[str, str]] = []          # (src, rel_dir)
        ext = format_extension(fmt)
        for dirpath, _dirs, files in os.walk(staging):
            for fn in files:
                if fn.endswith(f".{ext}"):
                    rel_dir = os.path.relpath(dirpath, staging)
                    staged.append((os.path.join(dirpath, fn),
                                   "" if rel_dir == "." else rel_dir))

        threshold = int(schema.options.get(
            "commit.distributed-adopt-threshold", "256"))
        spark = self.table.spark or SparkSession.getActiveSession()
        has_variant = any("variant" in f.dataType.simpleString()
                          for f in schema.struct.fields)
        root = self.paths.root
        if (spark_stats is None and spark is not None and not has_variant
                and len(staged) >= threshold):
            results = _adopt_files_distributed(
                spark, staged, root, fmt, level, stat_cols, index_spec)
        else:
            results = [adopt_one_file(src, rel_dir, root, fmt, level,
                                      stat_cols, index_spec,
                                      spark_stats=spark_stats)
                       for src, rel_dir in staged]

        entries: list[FileEntry] = []
        for r in results:
            if r is None:
                continue
            rows = r["rows"]
            if rows < 0:   # footer unreadable (e.g. VARIANT): count via Spark
                rows = self._spark_row_count(os.path.join(root, r["file_path"]))
                if rows == 0:
                    os.remove(os.path.join(root, r["file_path"]))
                    continue
            stats = {c: {"min": stat_from_json(s.get("min")),
                         "max": stat_from_json(s.get("max")),
                         "nulls": s.get("nulls")}
                     for c, s in r["stats"].items()}
            if fmt in TIME_AS_STRING_FORMATS:
                # TIME columns staged as ISO strings: store typed stats
                # so scan-time skipping compares time-to-time
                import datetime as _dt
                for c in time_shim_cols(schema.struct):
                    s = stats.get(c)
                    if s:
                        for k in ("min", "max"):
                            if isinstance(s[k], str):
                                s[k] = _dt.time.fromisoformat(s[k])
            rel_dir = os.path.dirname(r["file_path"])
            partition = parse_partition_path(r["file_path"],
                                             schema.partition_keys)
            bucket = -1
            if BUCKET_COL + "=" in rel_dir:
                for seg in rel_dir.split(os.sep):
                    if seg.startswith(BUCKET_COL + "="):
                        bucket = int(seg.split("=", 1)[1])
            seq_stats = stats.pop(SEQ_COL, None) or {}
            entries.append(FileEntry(
                kind=ADD, partition=partition, bucket=bucket, level=level,
                file_path=r["file_path"], row_count=rows,
                file_size=r["size"],
                min_seq=seq_stats.get("min") or 0,
                max_seq=seq_stats.get("max") or 0,
                schema_id=schema.schema_id, stats=stats,
                index_path=r["index_path"],
            ))
        return entries

    def _spark_row_count(self, path: str) -> int:
        spark = self.table.spark or SparkSession.getActiveSession()
        return spark.read.parquet(path).count()

    def _watermark_from_stats(self, entries: list[FileEntry]) -> int | None:
        """Watermark = max(event-time field) - delay, read from the footer
        stats already collected per file — no extra data pass.
        (ref: Snapshot.java:172 watermark; scan.watermark CoreOptions:1203)"""
        import datetime as dt

        field = self.schema.options.get("watermark.field")
        if not field:
            return None
        delay_ms = int(self.schema.options.get("watermark.delay-ms", "0"))
        vals = []
        for e in entries:
            if e.kind != ADD:
                continue
            v = e.stats.get(field, {}).get("max")
            if isinstance(v, dt.datetime):
                v = int(v.timestamp() * 1000)
            if isinstance(v, (int, float)):
                vals.append(int(v))
        return (max(vals) - delay_ms) if vals else None

    # ---------------- commit ----------------

    def commit(self, entries: list[FileEntry], kind: str = COMMIT_APPEND,
               max_retries: int = 20,
               commit_identifier: int | None = None) -> Snapshot:
        """Optimistic commit: write manifest once, retry snapshot id on race.
        (ref: FileStoreCommitImpl.java:359-397)"""
        if not entries:
            latest = self.paths.latest_snapshot()
            if latest:
                return latest
        # parquet (columnar, splittable, Spark-readable) is the scale default,
        # mirroring the reference's avro manifests; json is the debug option
        mfmt = self.schema.options.get("manifest.format", "parquet")

        # row tracking: assign contiguous _ROW_ID ranges to new files at
        # commit time (ref: row-tracking / Iceberg-v3-style first_row_id —
        # files rewritten by compaction carry ids physically and ignore the
        # metadata assignment, see Table.read_with_lineage)
        track = (self.schema.options.get("row-tracking.enabled", "false")
                 == "true" and not self.schema.is_pk_table)

        # assignable = fresh ADD entries only: first_row_id None. -1 means
        # ids are embedded in the file (rewrite); >=0 means already assigned
        # (e.g. a DV commit re-adding an existing file) — never reassign.
        assignable = sorted((x for x in entries
                             if x.kind == ADD and x.first_row_id is None),
                            key=lambda x: x.file_path)

        def _assign(base: int) -> int:
            nxt = base
            for e in assignable:
                e.first_row_id = nxt
                nxt += e.row_count
            return nxt

        assigned_base = next_row_id_val = None
        if track:
            latest0 = self.paths.latest_snapshot()
            assigned_base = (latest0.next_row_id or 0) if latest0 else 0
            next_row_id_val = _assign(assigned_base)
        manifest = self.paths.write_manifest(entries, fmt=mfmt)
        added = sum(e.row_count for e in entries if e.kind == ADD)
        deleted = sum(e.row_count for e in entries if e.kind == DELETE)
        max_seq_new = max((e.max_seq for e in entries if e.kind == ADD), default=0)
        watermark = self._watermark_from_stats(entries)

        for _ in range(max_retries):
            latest = self.paths.latest_snapshot()
            if track:
                base = (latest.next_row_id or 0) if latest else 0
                if base != assigned_base:      # lost a race: re-base ids
                    assigned_base = base
                    next_row_id_val = _assign(base)
                    manifest = self.paths.write_manifest(entries, fmt=mfmt)
            if latest is None:
                sid, manifests, total, max_seq = 1, [], 0, 0
            else:
                sid = latest.id + 1
                manifests = list(latest.manifests)
                total, max_seq = latest.total_record_count, latest.max_sequence
            if kind in (COMMIT_COMPACT, COMMIT_OVERWRITE) and latest is not None:
                live = {e.dedup_key() for e in self.paths.live_entries(latest)}
                for e in entries:
                    if e.kind == DELETE and e.dedup_key() not in live:
                        raise RuntimeError(
                            f"commit conflict: {e.file_path} no longer live")
            new_manifests = manifests + [manifest]
            # manifest-list compaction: when the cumulative list grows past
            # the threshold, fold it into ONE consolidated manifest of the
            # live entries — snapshot replay stays O(live files), not
            # O(historical commits). (ref: compact_manifest procedure /
            # full manifest compaction in FileStoreCommitImpl)
            if len(new_manifests) > int(self.schema.options.get(
                    "manifest.compaction-trigger", "50")):
                live: dict[tuple, FileEntry] = {}
                for m in new_manifests:
                    for e in self.paths.read_manifest(m):
                        if e.kind == ADD:
                            live[e.dedup_key()] = e
                        else:
                            live.pop(e.dedup_key(), None)
                new_manifests = [self.paths.write_manifest(live.values(),
                                                           fmt=mfmt)]
            snap = Snapshot(
                id=sid, schema_id=self.schema.schema_id, commit_kind=kind,
                commit_user=self.commit_user,
                commit_identifier=(commit_identifier
                                   if commit_identifier is not None else sid),
                timestamp_ms=int(time.time() * 1000),
                manifests=new_manifests,
                total_record_count=total + added - deleted,
                delta_record_count=added - deleted,
                max_sequence=max(max_seq, max_seq_new),
                watermark=max(filter(None, (watermark,
                                            latest.watermark if latest else None)),
                              default=None),
                next_row_id=(next_row_id_val if track
                             else (latest.next_row_id if latest else None)),
            )
            if self.paths.try_commit_snapshot(snap):
                # The snapshot is durable from here on: post-commit
                # callbacks (Iceberg mirror, retention, auto-compact)
                # must never turn a successful write into a raised
                # error — a caller retry would duplicate data. All
                # compat validation happens at create/alter time
                # (iceberg.validate_iceberg_compat); anything left is
                # logged and the mirror self-heals on the next commit.
                try:
                    if commit_identifier is not None:
                        # Keep the streaming replay check O(1). Safe to
                        # swallow: the hint is a pure cache — the snapshot
                        # just committed already carries (commit_user,
                        # commit_identifier) atomically, and
                        # latest_commit_identifier reconciles snapshots
                        # newer than the hint, so a failed record can
                        # never let a replayed batch re-commit.
                        self.paths.record_commit_identifier(
                            self.commit_user, commit_identifier,
                            snapshot_id=snap.id)
                    if self.paths.branch is None:
                        from paimon_spark.iceberg import (IcebergCompat,
                                                          iceberg_enabled)
                        if iceberg_enabled(self.schema):
                            # mirror the commit into Iceberg metadata (ref:
                            # IcebergCommitCallback.call — commit callback)
                            IcebergCompat(self.table).mirror(snap, entries)
                    # the changelog sidecar write runs a full Spark
                    # derivation job for lookup tables — isolate its
                    # failures so retention/maintenance in _post_commit
                    # still runs (ADVICE r11)
                    try:
                        self._maybe_write_changelog_keys(
                            snap, entries, kind)
                    except Exception:                  # noqa: BLE001
                        logging.getLogger(__name__).exception(
                            "changelog sidecar write failed for "
                            "snapshot %s (commit is durable; reads "
                            "fall back to replay)", snap.id)
                    self._post_commit(snap, kind)
                except Exception:                      # noqa: BLE001
                    logging.getLogger(__name__).exception(
                        "post-commit callback failed for snapshot %s "
                        "(commit is durable; mirror/maintenance will "
                        "self-heal on the next commit)", snap.id)
                return snap
        raise RuntimeError("commit failed after retries (too many concurrent writers)")

    def _maybe_write_changelog_keys(self, snap: Snapshot, entries,
                                    kind: str) -> None:
        """changelog-producer=lookup/full-compaction: precompute the
        commit's delta-key sidecar so derived-changelog reads pay zero
        planning (ref produces changelog commit-side,
        mergetree/compact/LookupChangelogMergeFunctionWrapper.java:54).
        COMPACT commits never change merged state — no sidecar, exactly
        like _delta_key_df skips them at read time. Cost: one
        map-side-combined distinct over the batch just written."""
        producer = self.schema.options.get("changelog-producer", "none")
        if (not self.schema.is_pk_table or not entries
                or kind == COMMIT_COMPACT
                # write-only writers defer changelog production to the
                # dedicated compact job (ref: CoreOptions.WRITE_ONLY;
                # Table.produce_changelog catches up) — reads fall back
                # to the replay tiers until then
                or self.schema.options.get("write-only",
                                           "false") == "true"
                # postpone tables (bucket=-2): pending writes are not
                # merged-readable until rescale assigns buckets, so
                # commit-time changelog derivation would be wrong-by-
                # construction — the rescale commit is the state change
                or self.schema.num_buckets == -2
                or producer not in ("lookup", "full-compaction")):
            return
        from paimon_spark.operators.changelog import (write_changelog_keys,
                                                      write_changelog_rows)
        write_changelog_keys(self.table, snap, entries)
        if producer == "lookup":
            # the reference's lookup producer writes the changelog ROWS
            # at commit (LookupChangelogMergeFunctionWrapper.java:54);
            # full-compaction keeps commits cheap and derives from the
            # key sidecars at read time instead
            write_changelog_rows(self.table, snap)

    def _post_commit(self, snap: Snapshot, kind: str) -> None:
        """Auto-maintenance the reference performs inside its committer:
        snapshot retention (snapshot.num-retained.min/max +
        snapshot.time-retained → SnapshotDeletion) on every commit, and
        a full compaction every `full-compaction.delta-commits` data
        commits (ref: CoreOptions FULL_COMPACTION_DELTA_COMMITS;
        changelog-producer=full-compaction and Iceberg mirroring of PK
        tables both rely on it)."""
        if self.table.has_stream_view():
            # keep the continuous JVM stream view current (O(new files)
            # link ops); a non-append commit poisons the view via its
            # marker — swallow here so the COMMIT itself never fails,
            # readers raise on next use (Table._sync_live_view)
            try:
                self.table._sync_live_view()
            except ValueError:
                pass
        if self.schema.options.get("tag.automatic-creation",
                                   "none") != "none":
            # period tags on commit (ref: TagAutoManager invoked by the
            # committer; idempotent — existing period tags left alone)
            from paimon_spark.procedures import \
                trigger_tag_automatic_creation
            trigger_tag_automatic_creation(self.table.spark, self.table)
        if self.schema.options.get("write-only", "false") == "true":
            # ref: CoreOptions.WRITE_ONLY — 'compactions and snapshot
            # expiration will be skipped'; dedicated jobs do both
            return
        self.table.expire_snapshots_policy()
        # self-expiring tags (RETAIN n DAYS): O(tags) metadata sweep
        # (ref: TagTimeExpire run by the committer's TagAutoManager)
        self.table.expire_tags()
        self._maybe_expire_partitions(kind)
        delta = self.schema.options.get("full-compaction.delta-commits")
        if not delta or kind != COMMIT_APPEND:
            return
        n = int(delta)
        # COMPACT within the last n-1 snapshots → not due yet. Bounded
        # descending walk (≤ n-1 metadata reads), no full history scan.
        for sid in range(snap.id - 1, max(snap.id - n, 0), -1):
            try:
                if self.paths.read_snapshot(sid).commit_kind == COMMIT_COMPACT:
                    return
            except FileNotFoundError:
                break
        if snap.id >= n:
            self.table.compact(full=True)

    def _maybe_expire_partitions(self, kind: str) -> None:
        """Auto partition expiration (ref: PartitionExpire invoked by
        the committer, throttled by
        partition.expiration-check-interval, default 1 h — the live-file
        walk is O(files), so it must NOT run on every commit)."""
        import re as _re

        opts = self.schema.options
        exp = opts.get("partition.expiration-time")
        if not exp or not self.schema.partition_keys \
                or kind == COMMIT_OVERWRITE:
            # expired partitions drop via an OVERWRITE commit — the
            # kind guard breaks the recursion
            return
        interval = opts.get("partition.expiration-check-interval", "1 h")
        m = _re.fullmatch(r"(\d+)\s*(s|m|min|h|d)", interval.strip())
        secs = int(m.group(1)) * {"s": 1, "m": 60, "min": 60, "h": 3600,
                                  "d": 86400}[m.group(2)] if m else 3600
        marker = os.path.join(self.paths.meta_root,
                              "partition-expire-check")
        try:
            last = os.path.getmtime(marker)
        except OSError:
            last = 0.0
        if time.time() - last < secs:
            return
        with open(marker, "w") as f:        # stamp BEFORE running
            f.write(str(int(time.time())))
        from paimon_spark.procedures import expire_partitions
        expire_partitions(
            self.table.spark, self.table, exp,
            timestamp_formatter=opts.get("partition.timestamp-formatter",
                                         "%Y-%m-%d"),
            timestamp_pattern=opts.get("partition.timestamp-pattern"))

    # ---------------- public ops ----------------

    def append(self, df: DataFrame) -> Snapshot:
        if self.schema.cross_partition_update:
            # global index: retract moved keys from their old partition
            # (ref: crosspartition/GlobalIndexAssigner.java:447)
            from paimon_spark.operators.cross_partition import \
                cross_partition_stage
            entries, persist = cross_partition_stage(self, df)
            snap = self.commit(entries, COMMIT_APPEND)
            persist()
            return snap
        return self.commit(self.stage(df), COMMIT_APPEND)

    def overwrite(self, df: DataFrame, dynamic: bool = True,
                  static_partition: dict[str, Any] | None = None) -> Snapshot:
        """INSERT OVERWRITE: replace touched partitions (dynamic), the whole
        table (static, no spec), or exactly the partitions matched by a
        static PARTITION (k=v, …) spec — possibly a prefix of the partition
        keys. (ref: PaimonDynamicPartitionOverwriteCommand.scala; static
        spec semantics per Spark's INSERT OVERWRITE ... PARTITION)"""
        if self.schema.cross_partition_update:
            if dynamic or static_partition:
                # a partial partition replacement could break the tombstone
                # invariant the global index maintains (a key's stale row
                # must always be covered by a -D in its own partition)
                raise NotImplementedError(
                    "partial INSERT OVERWRITE is not supported on "
                    "cross-partition update tables; use full static overwrite")
            from paimon_spark.operators.cross_partition import \
                invalidate_global_index
            invalidate_global_index(self.paths.meta_root)
        new_entries = self.stage(df)
        latest = self.paths.latest_snapshot()
        deletes: list[FileEntry] = []
        if latest is not None:
            if static_partition:
                # delete exactly the live entries matching the spec (typed
                # compare: entry partitions are raw hive-path strings)
                from paimon_spark.scanner import cast_partition_value
                spec = {k: cast_partition_value(
                            None if v is None else str(v),
                            self.schema.data_type(k))
                        for k, v in static_partition.items()}
                for e in self.paths.live_entries(latest):
                    if all(cast_partition_value(e.partition.get(k),
                                                self.schema.data_type(k)) == v
                           for k, v in spec.items()):
                        deletes.append(
                            FileEntry(**{**e.__dict__, "kind": DELETE}))
            else:
                touched = {tuple(sorted(e.partition.items()))
                           for e in new_entries}
                for e in self.paths.live_entries(latest):
                    if (not dynamic
                            or tuple(sorted(e.partition.items())) in touched):
                        deletes.append(
                            FileEntry(**{**e.__dict__, "kind": DELETE}))
        return self.commit(new_entries + deletes, COMMIT_OVERWRITE)
