"""Cross-partition update: global pk→partition index emitting -D retractions.

When a primary-key table's partition keys are NOT a subset of its primary
keys, the same key may be written into different partitions over time. The
reference forbids this table shape outright (ref: paimon-core/.../schema/
SchemaValidation.java — primary keys must contain all partition keys)
unless cross-partition update mode is active: dynamic bucket (bucket=-1),
where a global index maps each key to the partition that currently owns it
and every key move emits a retraction to the old partition
(ref: paimon-core/.../crosspartition/GlobalIndexAssigner.java:447,
 IndexBootstrap.java:60).

Spark-first shape — instead of a per-task RocksDB index, the index is an
append-only parquet dataset under <table>/index/global/ with columns
(pk..., partition..., __g_seq); the current mapping is
`max_by(partition_struct, __g_seq)` per key. On append:

  1. bootstrap from the table's merged state if the index is absent —
     one projected scan of pk+partition columns (ref: IndexBootstrap);
  2. ONE shuffled left join of the incoming batch against the index on
     the primary key (no broadcast: at 10^8-10^9 keys both sides are
     large; AQE may still choose broadcast when the index is small);
  3. upsert rows whose key moved partition produce a -D tombstone row in
     the OLD partition at sequence s, while the batch itself commits at
     s+1 — so the global merge, and crucially any PARTITION-PRUNED read
     of the old partition, orders the retraction strictly between the
     old and the new row. Without the tombstone a `WHERE pt = old` read
     would resurrect the stale row;
  4. delete rows (-D/-U via rowkind.field) are routed to the partition
     the index knows for the key (GlobalIndexAssigner delete handling);
  5. new mappings are appended to the index only after the data commit
     succeeds.

Scale: the index holds one row per live key, partitioned implicitly by
parquet file layout; loading it is a single scan + partial-agg groupBy
(map-side combine makes the shuffle one row per key per task). The join
in (2) shuffles on the pk — the same key distribution the dynamic-bucket
assigner already uses.
"""

from __future__ import annotations

import os
import uuid

from pyspark.sql import DataFrame, functions as F

from paimon_spark.schema import KIND_COL, SEQ_COL, TableSchema

ADD_KINDS = ("+I", "+U")


def global_index_dir(table_path: str) -> str:
    return os.path.join(table_path, "index", "global")


def load_global_index(spark, table_path: str,
                      schema: TableSchema) -> DataFrame | None:
    """Current pk→partition mapping, or None if no index exists yet.

    Columns: pk..., __old_<p> for each partition key, __idx_hit=true
    (explicit membership marker — a key's partition value may
    legitimately be NULL, so partition-value nullness cannot signal
    index membership).
    """
    d = global_index_dir(table_path)
    if not os.path.isdir(d) or not any(
            f.endswith(".parquet") for f in os.listdir(d)):
        return None
    idx = spark.read.parquet(d)
    pks = schema.primary_keys
    parts = schema.partition_keys
    top = F.max_by(F.struct(*[F.col(k) for k in parts]),
                   F.col("__g_seq")).alias("__p")
    cur = idx.groupBy(*pks).agg(top)
    return cur.select(*pks,
                      *[F.col(f"__p.{k}").alias(f"__old_{k}") for k in parts],
                      F.lit(True).alias("__idx_hit"))


def _persist_mappings(df: DataFrame, schema: TableSchema, table_path: str,
                      seq: int) -> None:
    """Append (pk..., partition..., __g_seq) rows to the index dataset;
    consolidate when the append-only file set grows past ~64 files so
    index loads stay one bounded scan (single-logical-writer assumption,
    same as BatchWriter's)."""
    pks = schema.primary_keys
    parts = schema.partition_keys
    # one mapping per key: deterministic max over partition struct when a
    # batch carries a key twice (same-commit order is undefined anyway)
    top = F.max(F.struct(*[F.col(k) for k in parts])).alias("__p")
    out = (df.groupBy(*pks).agg(top)
           .select(*pks, *[F.col(f"__p.{k}").alias(k) for k in parts],
                   F.lit(seq).cast("long").alias("__g_seq")))
    d = global_index_dir(table_path)
    os.makedirs(d, exist_ok=True)
    out.write.mode("append").parquet(d)
    old = [f for f in os.listdir(d) if f.endswith(".parquet")]
    if len(old) > 64:
        spark = df.sparkSession
        idx = spark.read.parquet(d)
        cur = (idx.groupBy(*pks)
               .agg(F.max_by(F.struct(*[F.col(k) for k in parts]),
                             F.col("__g_seq")).alias("__p"),
                    F.max("__g_seq").alias("__g_seq"))
               .select(*pks, *[F.col(f"__p.{k}").alias(k) for k in parts],
                       "__g_seq"))
        tmp = d + f".compact-{uuid.uuid4().hex}"
        cur.write.parquet(tmp)
        for f in old:
            os.remove(os.path.join(d, f))
        for f in os.listdir(tmp):
            if f.endswith(".parquet"):
                os.rename(os.path.join(tmp, f), os.path.join(d, f))
        import shutil
        shutil.rmtree(tmp, ignore_errors=True)


def invalidate_global_index(table_path: str) -> None:
    """Drop the index (e.g. after a full overwrite); it re-bootstraps from
    the table's merged state on the next append."""
    import shutil
    shutil.rmtree(global_index_dir(table_path), ignore_errors=True)


def cross_partition_stage(writer, df: DataFrame):
    """Stage a batch for a cross-partition-update table.

    Returns (entries, persist_fn): file entries ready to commit, and a
    callback that appends the new key→partition mappings to the index —
    call it only AFTER the data commit succeeds.
    """
    schema: TableSchema = writer.schema
    spark = df.sparkSession
    # index scoped to the BRANCH metadata root: branch histories
    # diverge, so they must not share key->partition mappings
    root = writer.paths.meta_root
    pks = schema.primary_keys
    parts = schema.partition_keys
    key_parts = [p for p in parts if p in pks]       # move with the key
    free_parts = [p for p in parts if p not in pks]  # may change per key

    latest = writer.paths.latest_snapshot()
    s = (latest.max_sequence + 1) if latest else 1

    idx = load_global_index(spark, root, schema)
    if idx is None and latest is not None:
        # bootstrap: merged state, pk+partition projection only
        boot = writer.table.read(projection=list(dict.fromkeys(pks + parts)))
        _persist_mappings(boot, schema, root, seq=0)
        idx = load_global_index(spark, root, schema)

    # resolve row kind exactly like BatchWriter.stage would
    if KIND_COL not in df.columns:
        rk = schema.rowkind_field
        kind = F.col(rk) if (rk and rk in df.columns) else F.lit("+I")
        df = df.withColumn(KIND_COL, kind)

    if idx is not None:
        j = df.join(idx, pks, "left")
    else:
        j = df
        for k in parts:
            j = j.withColumn(f"__old_{k}",
                             F.lit(None).cast(schema.data_type(k)))
        j = j.withColumn("__idx_hit", F.lit(None).cast("boolean"))

    # explicit membership marker, NOT partition-value nullness: a key
    # whose current partition value is NULL must still be retracted
    # when it moves to another partition
    has_old = F.col("__idx_hit").isNotNull()
    old_free = F.struct(*[F.col(f"__old_{k}") for k in free_parts])
    new_free = F.struct(*[F.col(k) for k in free_parts])
    moved = has_old & ~old_free.eqNullSafe(new_free)

    is_add = F.col(KIND_COL).isin(*ADD_KINDS)
    upserts = j.filter(is_add)
    deletes = j.filter(~is_add)

    if free_parts:
        # same-batch duplicate-key routing (GlobalIndexAssigner routes
        # rows sequentially; declaratively we keep only rows in the
        # partition the index will record for the key — the same
        # max(partition_struct) _persist_mappings resolves to — so a
        # partition-pruned read never sees the key live in two
        # partitions after one batch)
        from pyspark.sql import Window
        wspec = Window.partitionBy(*pks)
        keep = F.max(F.struct(*[F.col(k) for k in free_parts])) \
                .over(wspec).alias("__p_keep")
        cur = F.struct(*[F.col(k) for k in free_parts])
        upserts = (upserts.withColumn("__p_keep", keep)
                   .filter(cur.eqNullSafe(F.col("__p_keep")))
                   .drop("__p_keep"))

    def _retraction_cols():
        cols = []
        for f in schema.field_names:
            if f in free_parts:
                cols.append(F.col(f"__old_{f}").alias(f))
            elif f in pks or f in key_parts:
                cols.append(F.col(f))
            else:
                cols.append(F.lit(None).cast(schema.data_type(f)).alias(f))
        return cols

    retr = (upserts.filter(moved)
            .select(*_retraction_cols(),
                    F.lit(s).cast("long").alias(SEQ_COL),
                    F.lit("-D").alias(KIND_COL)))

    def _routed_cols(route: bool):
        cols = []
        for f in schema.field_names:
            if route and f in free_parts:
                cols.append(F.coalesce(F.col(f"__old_{f}"),
                                       F.col(f)).alias(f))
            else:
                cols.append(F.col(f))
        return cols

    ins = upserts.select(*_routed_cols(False),
                         F.lit(s + 1).cast("long").alias(SEQ_COL),
                         F.col(KIND_COL))
    dels = deletes.select(*_routed_cols(True),
                          F.lit(s + 1).cast("long").alias(SEQ_COL),
                          F.col(KIND_COL))

    out = retr.unionByName(ins).unionByName(dels)
    entries = writer.stage(out)

    new_map = upserts.select(*pks, *parts)

    def persist():
        if key_parts == parts:
            return  # nothing free to track (degenerate, validated away)
        _persist_mappings(new_map, schema, root, seq=s + 1)

    return entries, persist
