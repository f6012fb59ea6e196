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


def create_branch(spark, table, branch: str, snapshot: int | None = None,
                  tag: str | None = None, **_):
    return _t(table).with_spark(spark).create_branch(branch, snapshot, tag)


def delete_branch(spark, table, branch: str, **_):
    _t(table).with_spark(spark).delete_branch(branch)


def fast_forward(spark, table, branch: str, **_):
    _t(table).with_spark(spark).fast_forward(branch)


def expire_partitions(spark, table, expiration_time: str,
                      timestamp_formatter: str = "%Y-%m-%d",
                      timestamp_pattern: str | None = None, **_):
    """Drop whole partitions whose time value is older than now-expiration.
    Metadata-only: emits DELETE entries for every live file in an expired
    partition (ref: procedure/ExpirePartitionsProcedure.java; partition
    value parsed per partition.timestamp-formatter like
    PartitionValuesTimeExpireStrategy)."""
    import datetime as _dt
    import re as _re

    t = _t(table).with_spark(spark)
    m = _re.fullmatch(r"(\d+)\s*([smhd])", expiration_time.strip())
    if not m:
        raise ValueError("expiration_time like '7 d', '12 h', '30 m'")
    secs = int(m.group(1)) * {"s": 1, "m": 60, "h": 3600, "d": 86400}[m.group(2)]
    cutoff = _dt.datetime.now() - _dt.timedelta(seconds=secs)
    pkeys = t.schema.partition_keys
    if not pkeys:
        raise ValueError("table is not partitioned")
    field = (timestamp_pattern or "$" + pkeys[0]).lstrip("$")

    latest = t.paths.latest_snapshot()
    if latest is None:
        return []
    expired_parts, deletes = set(), []
    from paimon_spark.metadata import COMMIT_OVERWRITE, DELETE
    import dataclasses
    for e in t.paths.live_entries(latest):
        raw = e.partition.get(field)
        try:
            val = _dt.datetime.strptime(raw, timestamp_formatter)
        except (TypeError, ValueError):
            continue
        if val < cutoff:
            expired_parts.add(tuple(sorted(e.partition.items())))
            deletes.append(dataclasses.replace(e, kind=DELETE))
    if deletes:
        t.writer().commit(deletes, COMMIT_OVERWRITE)
    return sorted(dict(p) [field] for p in expired_parts)


def mark_partition_done(spark, table, partitions: list[dict] | dict, **_):
    """Write a partition-done marker (_SUCCESS file) so downstream schedulers
    can poll readiness (ref: procedure/MarkPartitionDoneProcedure.java,
    SuccessFileMarkDoneAction)."""
    import json as _json
    import time as _time

    t = _t(table).with_spark(spark)
    if isinstance(partitions, dict):
        partitions = [partitions]
    marked = []
    for part in partitions:
        rel = "/".join(f"{k}={urllib.parse.quote(str(part[k]), safe='')}"
                       for k in t.schema.partition_keys)
        d = os.path.join(t.path, rel)
        os.makedirs(d, exist_ok=True)
        with open(os.path.join(d, "_SUCCESS"), "w") as f:
            _json.dump({"creationTime": int(_time.time() * 1000)}, f)
        marked.append(rel)
    return marked


def compact_manifest(spark, table, **_):
    """Fold the manifest list into one consolidated manifest
    (ref: procedure/CompactManifestProcedure.java)."""
    return _t(table).with_spark(spark).compact_manifests()


def rewrite_file_index(spark, table, **_):
    """Build missing file-index sidecars for live data files
    (ref: procedure/RewriteFileIndexProcedure.java)."""
    return _t(table).with_spark(spark).rewrite_file_index()


def expire_tags(spark, table, older_than: str, **_):
    """Delete tags created before `older_than` ('YYYY-mm-dd HH:MM:SS')
    (ref: procedure/ExpireTagsProcedure.java)."""
    import datetime as _dt

    cutoff = int(_dt.datetime.strptime(
        older_than, "%Y-%m-%d %H:%M:%S").timestamp() * 1000)
    return _t(table).with_spark(spark).expire_tags(cutoff)


def clear_consumers(spark, table, consumer_id: str | None = None, **_):
    """Drop durable consumer progress files (all, or one id)
    (ref: procedure/ClearConsumersProcedure.java)."""
    t = _t(table)
    d = os.path.join(t.path, "consumer")
    removed = []
    try:
        names = os.listdir(d)
    except FileNotFoundError:
        return removed
    for n in names:
        cid = n[len("consumer-"):-len(".json")]
        if consumer_id is None or cid == consumer_id:
            os.remove(os.path.join(d, n))
            removed.append(cid)
    return sorted(removed)


def rescale(spark, table, bucket: int, **_):
    """Rewrite the table under a new fixed bucket count
    (ref: procedure/RescaleProcedure.java)."""
    return _t(table).with_spark(spark).rescale(bucket)


def copy_into(spark, table, source: str, file_format: str = "parquet",
              options: dict | None = None, **_):
    """Idempotent bulk file load (ref: paimon-spark copyinto/)."""
    return _t(table).with_spark(spark).copy_into(source, file_format, options)


PROCEDURES = {
    "compact": compact,
    "compact_manifest": compact_manifest,
    "rewrite_file_index": rewrite_file_index,
    "expire_tags": expire_tags,
    "copy_into": copy_into,
    "rescale": rescale,
    "clear_consumers": clear_consumers,
    "create_branch": create_branch,
    "delete_branch": delete_branch,
    "fast_forward": fast_forward,
    "expire_partitions": expire_partitions,
    "mark_partition_done": mark_partition_done,
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
