"""Dynamic bucket assignment: keys keep their bucket via a persistent
pk→bucket index; new keys are assigned as the table grows.

(ref: paimon-core/.../index/HashBucketAssigner.java (179),
 DynamicBucketIndexMaintainer.java, sink/DynamicBucketRowKeyExtractor.java;
 option 'dynamic-bucket.target-row-count' CoreOptions)

Spark-first shape: the index is itself a parquet table under
<table>/index/; assignment is one left join shuffled on the key — the
index has one row per KEY, so at 10^8-10^9 keys it must NOT be forced
into a broadcast (AQE still picks broadcast-hash when the index is
actually small). New keys get `pmod(xxhash64(pk), n)` where n grows with
total_keys/target — existing keys never move (the index pins them),
matching the reference's invariant. Divergence (documented): the
reference fills buckets sequentially per assigner; we hash into the
current bucket count — same invariants (sticky keys, bounded bucket
size in expectation), better distribution for parallel writers.
"""

from __future__ import annotations

import os
import shutil
import uuid

from pyspark.sql import DataFrame, functions as F

from paimon_spark.schema import BUCKET_COL, TableSchema

DEFAULT_TARGET_ROWS = 2_000_000
CONSOLIDATE_FILES = 64


def index_dir(table_path: str) -> str:
    return os.path.join(table_path, "index")


def _count_file(table_path: str) -> str:
    return os.path.join(index_dir(table_path), ".key-count")


def _load_count(table_path: str) -> int | None:
    try:
        with open(_count_file(table_path)) as f:
            return int(f.read().strip())
    except (OSError, ValueError):
        return None


def _save_count(table_path: str, n: int) -> None:
    tmp = _count_file(table_path) + f".tmp.{os.getpid()}"
    with open(tmp, "w") as f:
        f.write(str(n))
    os.replace(tmp, _count_file(table_path))


def _footer_rows(directory: str) -> int:
    """Sum parquet row counts from footers — driver-side metadata reads,
    no Spark job."""
    import pyarrow.parquet as pq
    total = 0
    for fn in os.listdir(directory):
        if fn.endswith(".parquet"):
            total += pq.ParquetFile(os.path.join(directory, fn)) \
                       .metadata.num_rows
    return total


def load_index(spark, table_path: str, schema: TableSchema) -> DataFrame | None:
    d = index_dir(table_path)
    if not os.path.isdir(d) or not any(
            f.endswith(".parquet") for f in os.listdir(d)):
        return None
    return spark.read.parquet(d)


def assign_buckets(spark, table_path: str, schema: TableSchema,
                   df: DataFrame) -> DataFrame:
    """Return df + __bucket column; persists new-key assignments.

    Maintenance (r3 verdict #4): the key count lives in a .key-count
    sidecar (no full index count job per write), and the append-only
    index dataset consolidates past CONSOLIDATE_FILES files — same
    policy as the cross-partition global index — so after 10^4 commits
    the index read is a bounded scan, not 10^4 small files."""
    keys = schema.trimmed_primary_keys
    target = int(schema.options.get("dynamic-bucket.target-row-count",
                                    str(DEFAULT_TARGET_ROWS)))
    d = index_dir(table_path)
    # consolidate BEFORE loading: the DataFrame this call returns stays
    # lazy in the caller (stage/commit executes it later), so deleting
    # index files after load_index would break that pending plan
    _maybe_consolidate(spark, table_path)
    idx = load_index(spark, table_path, schema)
    if idx is None:
        existing = 0
        joined = df.withColumn(BUCKET_COL, F.lit(None).cast("int"))
    else:
        existing = _load_count(table_path)
        if existing is None:          # pre-sidecar index: count once
            existing = idx.count()
        joined = df.join(idx, keys, "left")
    n_buckets = max(1, (existing + 1) // target + 1)
    assigned = joined.withColumn(
        BUCKET_COL,
        F.coalesce(F.col(BUCKET_COL),
                   F.pmod(F.xxhash64(*[F.col(k) for k in keys]),
                          F.lit(n_buckets)).cast("int")))
    # persist assignments for keys not yet in the index: write to a tmp
    # dataset first so the new-key count comes from parquet footers
    # (driver metadata only), then adopt the files
    new_keys = assigned.select(*keys, BUCKET_COL).distinct()
    if idx is not None:
        new_keys = new_keys.join(idx.select(*keys), keys, "left_anti")
    os.makedirs(d, exist_ok=True)
    staging = os.path.join(d, f".tmp-{uuid.uuid4().hex}")
    new_keys.write.parquet(staging)
    added = _footer_rows(staging)
    for fn in os.listdir(staging):
        if fn.endswith(".parquet"):
            os.rename(os.path.join(staging, fn),
                      os.path.join(d, f"idx-{uuid.uuid4().hex}.parquet"))
    shutil.rmtree(staging, ignore_errors=True)
    _save_count(table_path, existing + added)
    return assigned


def _maybe_consolidate(spark, table_path: str) -> None:
    """Rewrite the index dataset into a bounded file set once the
    append-only tail grows past CONSOLIDATE_FILES (single-logical-writer
    assumption, same as the cross-partition index consolidation at
    cross_partition.py)."""
    d = index_dir(table_path)
    if not os.path.isdir(d):
        return
    old = [f for f in os.listdir(d) if f.endswith(".parquet")]
    if len(old) <= CONSOLIDATE_FILES:
        return
    cur = spark.read.parquet(*[os.path.join(d, f) for f in old])
    tmp = d + f".compact-{uuid.uuid4().hex}"
    cur.write.parquet(tmp)
    for f in old:
        os.remove(os.path.join(d, f))
    for f in os.listdir(tmp):
        if f.endswith(".parquet"):
            os.rename(os.path.join(tmp, f), os.path.join(d, f))
    shutil.rmtree(tmp, ignore_errors=True)
    _save_count(table_path, _footer_rows(d))
