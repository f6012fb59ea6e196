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
import uuid

from pyspark.sql import DataFrame, functions as F

from paimon_spark.schema import BUCKET_COL, TableSchema

DEFAULT_TARGET_ROWS = 2_000_000


def index_dir(table_path: str) -> str:
    return os.path.join(table_path, "index")


def load_index(spark, table_path: str, schema: TableSchema) -> DataFrame | None:
    d = index_dir(table_path)
    if not os.path.isdir(d) or not any(
            f.endswith(".parquet") for f in os.listdir(d)):
        return None
    return spark.read.parquet(d)


def assign_buckets(spark, table_path: str, schema: TableSchema,
                   df: DataFrame) -> DataFrame:
    """Return df + __bucket column; persists new-key assignments."""
    keys = schema.trimmed_primary_keys
    target = int(schema.options.get("dynamic-bucket.target-row-count",
                                    str(DEFAULT_TARGET_ROWS)))
    idx = load_index(spark, table_path, schema)
    if idx is None:
        existing = 0
        joined = df.withColumn(BUCKET_COL, F.lit(None).cast("int"))
    else:
        existing = idx.count()
        joined = df.join(idx, keys, "left")
    n_buckets = max(1, (existing + 1) // target + 1)
    assigned = joined.withColumn(
        BUCKET_COL,
        F.coalesce(F.col(BUCKET_COL),
                   F.pmod(F.xxhash64(*[F.col(k) for k in keys]),
                          F.lit(n_buckets)).cast("int")))
    # persist assignments for keys not yet in the index
    new_keys = assigned.select(*keys, BUCKET_COL).distinct()
    if idx is not None:
        new_keys = new_keys.join(idx.select(*keys), keys, "left_anti")
    os.makedirs(index_dir(table_path), exist_ok=True)
    new_keys.write.mode("append").parquet(index_dir(table_path))
    return assigned
