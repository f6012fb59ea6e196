"""Maintenance procedures — the `CALL sys.<proc>(...)` surface.

(ref: paimon-spark/paimon-spark-common/src/main/java/org/apache/paimon/
 spark/procedure/ — CompactProcedure.java:113, ExpireSnapshotsProcedure,
 CreateTagProcedure, RollbackProcedure, RemoveOrphanFilesProcedure,
 MigrateTableProcedure)

Python surface: `call(spark, "compact", table=..., ...)`.
"""

from __future__ import annotations

import os
import shutil
import urllib.parse
import uuid

from pyspark.sql import SparkSession

from paimon_spark.metadata import ADD, COMMIT_APPEND, FileEntry
from paimon_spark.table import Table
from paimon_spark.writer import collect_footer_stats, parse_partition_path


def _t(table) -> Table:
    return table if isinstance(table, Table) else Table.load(table)


def compact(spark, table, order_strategy: str | None = None,
            order_by: str | None = None, **_):
    t = _t(table).with_spark(spark)
    if order_strategy:
        from paimon_spark.operators.sort_compact import sort_compact
        return sort_compact(t, [c.strip() for c in (order_by or "").split(",") if c],
                            strategy=order_strategy)
    return t.compact()


def expire_snapshots(spark, table, retain_last: int = 1, **_):
    return _t(table).with_spark(spark).expire_snapshots(retain_last)


def create_tag(spark, table, tag: str, snapshot: int | None = None, **_):
    _t(table).with_spark(spark).create_tag(tag, snapshot)


def delete_tag(spark, table, tag: str, **_):
    _t(table).with_spark(spark).delete_tag(tag)


def rollback(spark, table, snapshot: int, **_):
    _t(table).with_spark(spark).rollback_to(snapshot)


def remove_orphan_files(spark, table, **_):
    return _t(table).with_spark(spark).remove_orphan_files()


def migrate_table(spark: SparkSession, source_dir: str, target_path: str,
                  partition_keys: list[str] | None = None,
                  primary_keys: list[str] | None = None,
                  options: dict | None = None, **_) -> Table:
    """Import an existing parquet directory (hive-partitioned or flat) as a
    paimon_spark table WITHOUT rewriting data: files are hard-linked into
    the table layout and committed as ADD entries.
    (ref: procedure/MigrateTableProcedure.java)"""
    src_df = spark.read.option("basePath", source_dir).parquet(source_dir)
    table = Table.create(target_path, src_df.schema,
                         partition_keys=partition_keys,
                         primary_keys=primary_keys, options=options,
                         spark=spark)
    if primary_keys:
        raise NotImplementedError(
            "migrate into PK tables requires a rewrite; create the table and "
            "INSERT instead")
    w = table.writer()
    schema = table.schema
    stat_cols = [f.name for f in schema.struct.fields
                 if f.name not in schema.partition_keys]
    entries = []
    for dirpath, _dirs, files in os.walk(source_dir):
        for fn in files:
            if not fn.endswith(".parquet"):
                continue
            src = os.path.join(dirpath, fn)
            rel_dir = os.path.relpath(dirpath, source_dir)
            rel_dir = "" if rel_dir == "." else rel_dir
            partition = parse_partition_path(
                os.path.join(rel_dir, fn), schema.partition_keys)
            dest_dir = os.path.join(target_path, rel_dir)
            os.makedirs(dest_dir, exist_ok=True)
            dest = os.path.join(dest_dir, f"data-L0-{uuid.uuid4().hex}.parquet")
            try:
                os.link(src, dest)          # no data copy on same fs
            except OSError:
                shutil.copy2(src, dest)
            rows, size, stats = collect_footer_stats(dest, stat_cols)
            entries.append(FileEntry(
                kind=ADD, partition=partition, bucket=-1, level=0,
                file_path=os.path.relpath(dest, target_path),
                row_count=rows, file_size=size, min_seq=0, max_seq=0,
                schema_id=0, stats=stats))
    w.commit(entries, COMMIT_APPEND)
    return table


PROCEDURES = {
    "compact": compact,
    "expire_snapshots": expire_snapshots,
    "create_tag": create_tag,
    "delete_tag": delete_tag,
    "rollback": rollback,
    "remove_orphan_files": remove_orphan_files,
    "migrate_table": migrate_table,
}


def call(spark: SparkSession, procedure: str, **kwargs):
    """CALL sys.<procedure>(...) equivalent."""
    fn = PROCEDURES.get(procedure)
    if fn is None:
        raise ValueError(f"unknown procedure {procedure}; "
                         f"available: {sorted(PROCEDURES)}")
    return fn(spark, **kwargs)
