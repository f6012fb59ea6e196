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
from paimon_spark.writer import parse_partition_path


def _t(table) -> Table:
    return table if isinstance(table, Table) else Table.load(table)


def _partition_spec_predicate(spec: str, schema):
    """Reference partition-spec string → predicate:
    'dt=a,hr=1;dt=b' = (dt=a AND hr=1) OR (dt=b)
    (ref: CompactProcedure partitions parameter)."""
    from paimon_spark.predicates import P
    from paimon_spark.scanner import cast_partition_value
    ors = []
    for group in spec.split(";"):
        ands = []
        for kv in group.split(","):
            k, _, v = kv.partition("=")
            k = k.strip()
            ands.append(P.eq(k, cast_partition_value(
                v.strip().strip("'\""), schema.data_type(k))))
        ors.append(ands[0] if len(ands) == 1 else P.and_(*ands))
    return ors[0] if len(ors) == 1 else P.or_(*ors)


def compact(spark, table, order_strategy: str | None = None,
            order_by: str | None = None, partitions: str | None = None,
            **_):
    t = _t(table).with_spark(spark)
    pf = _partition_spec_predicate(partitions, t.schema) \
        if partitions else None
    if order_strategy:
        from paimon_spark.operators.sort_compact import sort_compact
        return sort_compact(t, [c.strip() for c in (order_by or "").split(",") if c],
                            strategy=order_strategy)
    return t.compact(partition_filter=pf)


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


def create_bucketed_mirror(spark, table, name: str | None = None,
                           snapshot: int | None = None,
                           sorted_by: str | None = None, **_):
    """Spark-native bucketed mirror of the merged state — the
    object-store zero-exchange co-located-join recovery
    (Table.create_bucketed_mirror). `sorted_by` is a comma-separated
    column list."""
    cols = [c.strip() for c in sorted_by.split(",")] if sorted_by else None
    return _t(table).with_spark(spark).create_bucketed_mirror(
        name=name, snapshot_id=snapshot, sorted_by=cols)


def migrate_table(spark: SparkSession, source_dir: str, target_path: str,
                  partition_keys: list[str] | None = None,
                  primary_keys: list[str] | None = None,
                  options: dict | None = None,
                  file_format: str = "parquet", **_) -> Table:
    """Import an existing parquet/orc directory (hive-partitioned or flat)
    as a paimon_spark table WITHOUT rewriting data: files are hard-linked
    into the table layout and committed as ADD entries.
    (ref: procedure/MigrateTableProcedure.java — the reference migrates
    Hive tables in orc too)"""
    src_df = (spark.read.option("basePath", source_dir)
              .format(file_format).load(source_dir))
    options = dict(options or {})
    if file_format != "parquet":
        options.setdefault("file.format", file_format)
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
    staged: list[tuple[str, str]] = []
    for dirpath, _dirs, files in os.walk(source_dir):
        for fn in files:
            if fn.endswith(f".{file_format}"):
                rel_dir = os.path.relpath(dirpath, source_dir)
                staged.append((os.path.join(dirpath, fn),
                               "" if rel_dir == "." else rel_dir))

    entries = []
    if file_format == "parquet":
        # hard-link + footer-stat mining distributed past the same commit
        # threshold the writer uses — a 10^5-file Hive table migrates in
        # one metadata-only Spark job, not a driver-serial walk
        from paimon_spark.writer import (_adopt_files_distributed,
                                         adopt_one_file)
        threshold = int(schema.options.get(
            "commit.distributed-adopt-threshold", "256"))
        if len(staged) >= threshold:
            results = _adopt_files_distributed(
                spark, staged, target_path, file_format, 0, stat_cols,
                None, mode="link")
        else:
            results = [adopt_one_file(src, rel_dir, target_path,
                                      file_format, 0, stat_cols, None,
                                      mode="link")
                       for src, rel_dir in staged]
        from paimon_spark.metadata import stat_from_json
        for r in results:
            if r is None:
                continue
            entries.append(FileEntry(
                kind=ADD,
                partition=parse_partition_path(r["file_path"],
                                               schema.partition_keys),
                bucket=-1, level=0, file_path=r["file_path"],
                row_count=r["rows"], file_size=r["size"], min_seq=0,
                max_seq=0, schema_id=0,
                stats={c: {"min": stat_from_json(s.get("min")),
                           "max": stat_from_json(s.get("max")),
                           "nulls": s.get("nulls")}
                       for c, s in r["stats"].items()}))
    else:
        for src, rel_dir in staged:
            partition = parse_partition_path(
                os.path.join(rel_dir, os.path.basename(src)),
                schema.partition_keys)
            dest_dir = os.path.join(target_path, rel_dir)
            os.makedirs(dest_dir, exist_ok=True)
            dest = os.path.join(dest_dir,
                                f"data-L0-{uuid.uuid4().hex}.{file_format}")
            try:
                os.link(src, dest)          # no data copy on same fs
            except OSError:
                shutil.copy2(src, dest)
            # no pyarrow footer stats for orc: exact row count via one
            # tiny count job, no min/max (sound — never skipped)
            rows = spark.read.format(file_format).load(dest).count()
            entries.append(FileEntry(
                kind=ADD, partition=partition, bucket=-1, level=0,
                file_path=os.path.relpath(dest, target_path),
                row_count=rows, file_size=os.path.getsize(dest),
                min_seq=0, max_seq=0, schema_id=0, stats={}))
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


def _snapshots_sorted(t: Table):
    out = []
    try:
        names = os.listdir(t.paths.snapshot_dir)
    except FileNotFoundError:
        return []
    for n in names:
        if n.startswith("snapshot-") and n.endswith(".json"):
            out.append(t.paths.read_snapshot(int(n[len("snapshot-"):-len(".json")])))
    return sorted(out, key=lambda s: s.id)


def rollback_to_timestamp(spark, table, timestamp: int, **_):
    """Rollback to the latest snapshot committed at or before `timestamp`
    (epoch ms). (ref: RollbackToTimestampProcedure.java)"""
    t = _t(table).with_spark(spark)
    s = t.paths.snapshot_earlier_or_equal_ts(timestamp)
    if s is None:
        raise ValueError(f"no snapshot committed at or before {timestamp}")
    t.rollback_to(s.id)
    return s.id


def rollback_to_watermark(spark, table, watermark: int, **_):
    """Rollback to the latest snapshot whose commit watermark ≤ `watermark`.
    (ref: RollbackToWatermarkProcedure.java)"""
    t = _t(table).with_spark(spark)
    s = t.paths.snapshot_earlier_or_equal_watermark(watermark)
    if s is None:
        raise ValueError(f"no snapshot with watermark <= {watermark}")
    t.rollback_to(s.id)
    return s.id


def create_tag_from_timestamp(spark, table, tag: str, timestamp: int, **_):
    """Tag the earliest snapshot committed at or after `timestamp` (the
    reference's SnapshotManager.laterOrEqualTimeMills pick).
    (ref: CreateTagFromTimestampProcedure.java:89)"""
    t = _t(table).with_spark(spark)
    s = t.paths.snapshot_later_or_equal_ts(timestamp)
    if s is None:
        raise ValueError(f"no snapshot committed at or after {timestamp}")
    t.create_tag(tag, s.id)
    return s.id


def replace_tag(spark, table, tag: str, snapshot: int | None = None, **_):
    """Re-point an EXISTING tag (errors if absent — create_tag is the
    create path). (ref: TagManager.java:143 replaceTag)"""
    t = _t(table).with_spark(spark)
    if tag not in t.paths.list_tags():
        raise ValueError(f"tag {tag} doesn't exist")
    sid = snapshot if snapshot is not None else t.paths.latest_snapshot_id()
    t.paths.write_tag(tag, sid)
    return sid


def rename_tag(spark, table, tag: str, target_tag: str, **_):
    """(ref: TagManager.java:195 renameTag)"""
    t = _t(table).with_spark(spark)
    tags = t.paths.list_tags()
    if tag not in tags:
        raise ValueError(f"tag {tag} doesn't exist")
    if target_tag in tags:
        raise ValueError(f"tag {target_tag} already exists")
    t.paths.write_tag(target_tag, tags[tag])
    os.remove(t.paths.tag_file(tag))


def rename_branch(spark, table, branch: str, target_branch: str, **_):
    """(ref: FileSystemBranchManager renameBranch)"""
    import json as _json
    t = _t(table).with_spark(spark)
    if branch not in t.paths.list_branches():
        raise ValueError(f"branch {branch} doesn't exist")
    if target_branch in t.paths.list_branches():
        raise ValueError(f"branch {target_branch} already exists")
    src = os.path.join(t.paths.branch_root, f"branch-{branch}")
    dst = os.path.join(t.paths.branch_root, f"branch-{target_branch}")
    os.rename(src, dst)
    from paimon_spark.metadata import TablePaths
    bp = TablePaths(t.path, target_branch)
    try:
        with open(bp.branch_meta_file()) as f:
            meta = _json.load(f)
        meta["name"] = target_branch
        with open(bp.branch_meta_file(), "w") as f:
            _json.dump(meta, f)
    except FileNotFoundError:
        pass


def merge_branch(spark, table, branch: str, **_):
    """Merge a branch into main for APPEND tables: commit the branch's live
    data files that main doesn't already reference (file-identity diff, no
    data rewrite). The reference restricts merge to append-only tables
    (PK-table merges would need key-range conflict resolution) — so do we.
    (ref: FileSystemBranchManager.java:230 mergeBranch / :401 computeMergeDiff)"""
    t = _t(table).with_spark(spark)
    if t.schema.primary_keys:
        raise ValueError("merge_branch supports append-only tables "
                         "(ref validateAppendOnly)")
    bt = t.branch(branch).with_spark(spark)
    b_latest = bt.paths.latest_snapshot()
    if b_latest is None:
        raise ValueError(f"branch {branch} has no snapshot")
    main_latest = t.paths.latest_snapshot()
    have = set()
    if main_latest is not None:
        have = {(tuple(sorted(e.partition.items())), e.bucket, e.file_path)
                for e in t.paths.live_entries(main_latest)}
    diff = [e for e in bt.paths.live_entries(b_latest)
            if (tuple(sorted(e.partition.items())), e.bucket, e.file_path)
            not in have]
    if not diff:
        return 0
    adds = [FileEntry(**{**e.__dict__, "kind": ADD}) for e in diff]
    t.writer().commit(adds, COMMIT_APPEND)
    return len(adds)


def purge_files(spark, table, **_):
    """Reset the table to empty: drop branches, tags, consumers, then
    truncate (an OVERWRITE commit deleting every live file — history stays
    rewindable until expiration, matching our snapshot model).
    (ref: PurgeFilesProcedure.java → FileStoreTable.java:168 purgeFiles)"""
    t = _t(table).with_spark(spark)
    for b in list(t.paths.list_branches()):
        t.delete_branch(b)
    for tag in list(t.paths.list_tags()):
        t.delete_tag(tag)
    shutil.rmtree(os.path.join(t.path, "consumer"), ignore_errors=True)
    t.truncate()
    return "Success"


def reset_consumer(spark, table, consumer_id: str, next_snapshot_id: int | None = None, **_):
    """Set a consumer's next snapshot (or delete the consumer when no id is
    given). (ref: ResetConsumerProcedure.java)"""
    import json as _json
    import time as _time
    t = _t(table)
    cpath = os.path.join(t.path, "consumer", f"consumer-{consumer_id}.json")
    if next_snapshot_id is None:
        if os.path.exists(cpath):
            os.remove(cpath)
        return None
    os.makedirs(os.path.dirname(cpath), exist_ok=True)
    tmp = cpath + ".tmp"
    with open(tmp, "w") as f:
        _json.dump({"next_snapshot": int(next_snapshot_id),
                    "updated_ms": int(_time.time() * 1000)}, f)
    os.replace(tmp, cpath)
    return int(next_snapshot_id)


def migrate_database(spark, source_dir: str, target_dir: str,
                     file_format: str = "parquet", **_):
    """migrate_table for every table-like subdirectory of `source_dir`.
    (ref: MigrateDatabaseProcedure.java)"""
    migrated = []
    for name in sorted(os.listdir(source_dir)):
        sub = os.path.join(source_dir, name)
        if not os.path.isdir(sub):
            continue
        has_files = any(fn.endswith(f".{file_format}")
                        for _, _, fns in os.walk(sub) for fn in fns)
        if not has_files:
            continue
        migrate_table(spark, sub, os.path.join(target_dir, name))
        migrated.append(name)
    return migrated


def compact_database(spark, warehouse: str, **_):
    """Compact every paimon table under `warehouse`.
    (ref: CompactDatabaseProcedure.java)"""
    done = []
    for name in sorted(os.listdir(warehouse)):
        sub = os.path.join(warehouse, name)
        if os.path.isdir(os.path.join(sub, "snapshot")):
            Table.load(sub, spark).compact()
            done.append(name)
    return done


def remove_unexisting_files(spark, table, dry_run: bool = False, **_):
    """Repair: drop manifest entries whose data files are physically gone
    (e.g. deleted by hand). Commits DELETE entries for the missing files.
    (ref: RemoveUnexistingFilesProcedure.java)"""
    t = _t(table).with_spark(spark)
    latest = t.paths.latest_snapshot()
    if latest is None:
        return []
    missing = [e for e in t.paths.live_entries(latest)
               if not os.path.exists(os.path.join(t.path, e.file_path))]
    if missing and not dry_run:
        from paimon_spark.metadata import DELETE
        dels = [FileEntry(**{**e.__dict__, "kind": DELETE}) for e in missing]
        t.writer().commit(dels, COMMIT_APPEND)
    return [e.file_path for e in missing]


def trigger_tag_automatic_creation(spark, table, **_):
    """Create the period tag for the latest snapshot per the table's
    `tag.automatic-creation` options (process-time mode; daily/hourly
    periods via `tag.creation-period`). Idempotent — existing period tags
    are left alone. (ref: TriggerTagAutomaticCreationProcedure.java,
    CoreOptions tag.automatic-creation)"""
    import datetime as _dt
    t = _t(table).with_spark(spark)
    opts = t.schema.options or {}
    mode = opts.get("tag.automatic-creation", "none")
    if mode == "none":
        return None
    latest = t.paths.latest_snapshot()
    if latest is None:
        return None
    if mode == "watermark" and latest.watermark is not None:
        base_ms = latest.watermark // 1_000_000 if latest.watermark > 10**14 \
            else latest.watermark
    else:
        base_ms = latest.timestamp_ms
    stamp = _dt.datetime.fromtimestamp(base_ms / 1000, _dt.timezone.utc)
    period = opts.get("tag.creation-period", "daily")
    if period == "hourly":
        name = stamp.strftime("%Y-%m-%d %H")
    elif period == "two-hours":
        name = stamp.replace(hour=stamp.hour - stamp.hour % 2).strftime("%Y-%m-%d %H")
    else:
        name = stamp.strftime("%Y-%m-%d")
    if name in t.paths.list_tags():
        return name
    t.create_tag(name, latest.id)
    return name


def compact_chain_table(spark, table, partition: str,
                        overwrite: bool = False, **_) -> bool:
    """Materialize one reconstructed chain partition into the snapshot
    branch so future reads serve it directly instead of re-merging the
    chain every query (ref: CompactChainTableProcedure.java:63 — single
    partition only; skip when it already exists unless overwrite)."""
    t = _t(table).with_spark(spark)
    opts = t.schema.options
    if opts.get("chain-table.enabled") != "true":
        raise ValueError("compact_chain_table only supports chain tables")
    sb = opts.get("scan.fallback-snapshot-branch")
    if not sb or sb not in t.paths.list_branches():
        raise ValueError("chain table needs an existing "
                         "scan.fallback-snapshot-branch")
    if ";" in partition:
        raise ValueError("compact_chain_table only supports a single "
                         "partition, got: " + partition)
    pred = _partition_spec_predicate(partition, t.schema)
    st = Table.load(t.path, spark, branch=sb)
    from paimon_spark.scanner import cast_partition_value
    spec = dict(kv.split("=", 1) for kv in partition.split(","))
    exists = any(
        all(str(e.partition.get(k)) == v for k, v in spec.items())
        for e in st.new_scan().plan().entries)
    if exists and not overwrite:
        return False
    # the chain read path reconstructs the partition (anchor + deltas)
    df = t.read(pred)
    if not df.take(1):
        return False
    st.overwrite(df.select(*t.schema.field_names), dynamic=True)
    return True


def repair(spark, table, **_):
    """Re-sync table metadata with the filesystem: recreate missing
    metadata dirs and fix the LATEST hint if it drifted from the actual
    newest snapshot file. (ref: RepairProcedure.java → Catalog.repairTable
    — ours is a filesystem catalog, so repair = hint/dir consistency.)"""
    t = _t(table)
    t.paths.ensure()
    snaps = _snapshots_sorted(t)
    if snaps:
        t.paths.write_latest_hint(snaps[-1].id)
    return True


def repair_earliest_snapshot(spark, table, snapshot: int, **_):
    """Make `snapshot` the earliest retained snapshot by deleting all
    earlier snapshot files; returns the previous earliest.
    (ref: RepairEarliestSnapshotProcedure.java →
    SnapshotManager.repairEarliestSnapshot:279)"""
    t = _t(table)
    snaps = _snapshots_sorted(t)
    if not snaps:
        raise ValueError("cannot repair earliest snapshot for an empty table")
    previous, latest = snaps[0].id, snaps[-1].id
    if not previous <= snapshot <= latest:
        raise ValueError(f"snapshot {snapshot} must be within "
                         f"[{previous}, {latest}]")
    for s in snaps:
        if s.id < snapshot:
            os.remove(t.paths.snapshot_file(s.id))
    return previous


def copy_files(spark, source_table, target_table: str,
               where: str | None = None, **_):
    """Clone a table: copy schema and commit the source's live data files
    (optionally filtered by a partition predicate) into a fresh table at
    `target_table` — hard links where possible, no data rewrite.
    (ref: CopyFilesProcedure.java)"""
    src = _t(source_table).with_spark(spark)
    latest = src.paths.latest_snapshot()
    tgt = Table.create(target_table, src.schema.struct,
                       partition_keys=list(src.schema.partition_keys),
                       primary_keys=list(src.schema.primary_keys),
                       options=dict(src.schema.options), spark=spark)
    if latest is None:
        return 0
    entries = src.paths.live_entries(latest)
    if where is not None and src.schema.partition_keys:
        # evaluate the partition predicate with Spark over the distinct
        # partition values (stored as raw strings)
        parts = sorted({tuple(sorted(e.partition.items())) for e in entries})
        pdf = spark.createDataFrame([dict(p) for p in parts])
        keep = {tuple(sorted(r.asDict().items()))
                for r in pdf.filter(where).collect()}
        entries = [e for e in entries
                   if tuple(sorted(e.partition.items())) in keep]
    src_abs = os.path.abspath(src.path)
    dst_abs = os.path.abspath(target_table)
    adds = []
    for e in entries:
        # data file + DV / index sidecars all travel with the clone
        # (dropping a DV would resurrect deleted rows)
        for rel in filter(None, (e.file_path, e.dv_path, e.index_path)):
            dest = os.path.join(target_table, rel)
            os.makedirs(os.path.dirname(dest), exist_ok=True)
            if os.path.exists(dest):
                continue
            srcf = os.path.join(src.path, rel)
            if rel == e.dv_path:
                # DV rows reference ABSOLUTE data-file URIs of the source
                # table — rewrite them to the clone's root
                import pyarrow as pa
                import pyarrow.parquet as _pq
                tbl = _pq.read_table(srcf)
                fp = pa.compute.replace_substring(
                    tbl.column("file_path"), src_abs, dst_abs)
                _pq.write_table(tbl.set_column(
                    tbl.schema.get_field_index("file_path"), "file_path", fp),
                    dest)
                continue
            try:
                os.link(srcf, dest)
            except OSError:
                shutil.copy2(srcf, dest)
        adds.append(FileEntry(**{**e.__dict__, "kind": ADD}))
    tgt.writer().commit(adds, COMMIT_APPEND)
    return len(adds)


def create_function(spark, warehouse: str, name: str,
                    input_params: list, return_type: str,
                    definition: str, replace: bool = False, **_):
    """(ref: CreateFunctionProcedure.java — SQL-definition kind)"""
    from paimon_spark.catalog import Catalog
    Catalog(warehouse, spark).create_function(
        name, [tuple(p) for p in input_params], return_type, definition,
        replace=replace)


def alter_function(spark, warehouse: str, name: str, definition: str, **_):
    from paimon_spark.catalog import Catalog
    Catalog(warehouse, spark).alter_function(name, definition)


def drop_function(spark, warehouse: str, name: str, **_):
    from paimon_spark.catalog import Catalog
    Catalog(warehouse, spark).drop_function(name)


PROCEDURES = {
    "compact": compact,
    "create_bucketed_mirror": create_bucketed_mirror,
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
    "remove_orphan_blobs": lambda spark, table, **_:
        __import__("paimon_spark.functions.blob", fromlist=["x"])
        .remove_orphan_blobs(_t(table).with_spark(spark)),
    "migrate_table": migrate_table,
    "rollback_to_timestamp": rollback_to_timestamp,
    "rollback_to_watermark": rollback_to_watermark,
    "create_tag_from_timestamp": create_tag_from_timestamp,
    "replace_tag": replace_tag,
    "rename_tag": rename_tag,
    "rename_branch": rename_branch,
    "merge_branch": merge_branch,
    "purge_files": purge_files,
    "reset_consumer": reset_consumer,
    "migrate_database": migrate_database,
    "compact_database": compact_database,
    "remove_unexisting_files": remove_unexisting_files,
    "trigger_tag_automatic_creation": trigger_tag_automatic_creation,
    "copy_files": copy_files,
    "repair": repair,
    "compact_chain_table": compact_chain_table,
    "alter_view_dialect": lambda spark, warehouse, name, dialect, query, **_:
        __import__("paimon_spark.catalog", fromlist=["Catalog"])
        .Catalog(warehouse, spark).alter_view_dialect(name, dialect, query),
    "repair_earliest_snapshot": repair_earliest_snapshot,
    "create_global_index": lambda spark, table, vec_col="embedding", id_col=None, n_centroids=None, spill=None, pq_m=None, **_:
        _t(table).with_spark(spark).create_vector_index(
            vec_col, id_col, n_centroids, spill=spill, pq_m=pq_m),
    "drop_global_index": lambda spark, table, vec_col="embedding", **_:
        _t(table).with_spark(spark).drop_vector_index(vec_col),
    "create_function": create_function,
    "alter_function": alter_function,
    "drop_function": drop_function,
    "create_text_index": lambda spark, table, text_col="text", id_col=None, n_buckets=64, **_:
        _t(table).with_spark(spark).create_text_index(text_col, id_col, n_buckets),
    "drop_text_index": lambda spark, table, text_col="text", **_:
        _t(table).with_spark(spark).drop_text_index(text_col),
    "refresh_text_index": lambda spark, table, text_col="text", **_:
        _t(table).with_spark(spark).refresh_text_index(text_col),
    "refresh_global_index": lambda spark, table, vec_col="embedding", **_:
        _t(table).with_spark(spark).refresh_vector_index(vec_col),
}


def call(spark: SparkSession, procedure: str, **kwargs):
    """CALL sys.<procedure>(...) equivalent."""
    fn = PROCEDURES.get(procedure)
    if fn is None:
        raise ValueError(f"unknown procedure {procedure}; "
                         f"available: {sorted(PROCEDURES)}")
    return fn(spark, **kwargs)
