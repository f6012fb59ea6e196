"""Snapshot / manifest metadata model + atomic commit primitives.

Mirrors the reference's metadata chain
(ref: paimon-api/src/main/java/org/apache/paimon/Snapshot.java:78-196,
 paimon-core/src/main/java/org/apache/paimon/manifest/ManifestEntry.java:42,
 paimon-core/src/main/java/org/apache/paimon/io/DataFileMeta.java:61-112):

snapshot/snapshot-<id>.json  -> commit kind, schema id, manifest list, counters
manifest/manifest-<uuid>.jsonl -> one ADD/DELETE entry per data file with
                                  partition, bucket, level, row count and
                                  per-column min/max/null-count stats
data files                   -> <table>/<hive partition dirs>/[__bucket=N/]*.parquet

Commit atomicity = put-if-absent creation of snapshot-<id> (O_EXCL open),
same constraint as the reference's rename-based commit
(ref: paimon-core/.../operation/FileStoreCommitImpl.java:359-397).
"""

from __future__ import annotations

import base64
import datetime as dt
import decimal
import json
import os
import time
import uuid
from dataclasses import dataclass, field as dc_field
from typing import Any, Iterable

from pyspark.sql import types as T

ADD = "ADD"
DELETE = "DELETE"  # ref: ManifestEntry.java FileKind ADD :91 / DELETE :98

COMMIT_APPEND = "APPEND"
COMMIT_COMPACT = "COMPACT"
COMMIT_OVERWRITE = "OVERWRITE"  # ref: Snapshot.java CommitKind :491-506


# ---------------- stats (JSON-safe encoding) ----------------

def stat_to_json(v: Any) -> Any:
    """Encode a parquet-footer min/max value as JSON-safe."""
    if v is None or isinstance(v, (int, float, str, bool)):
        return v
    if isinstance(v, dt.datetime):
        return {"$ts": v.isoformat()}
    if isinstance(v, dt.date):
        return {"$date": v.isoformat()}
    if isinstance(v, dt.time):
        return {"$time": v.isoformat()}
    if isinstance(v, decimal.Decimal):
        return {"$dec": str(v)}
    if isinstance(v, bytes):
        return {"$bin": base64.b64encode(v).decode()}
    return None  # unknown type: no stats (never skip on it)


def stat_from_json(v: Any) -> Any:
    if isinstance(v, dict):
        if "$ts" in v:
            return dt.datetime.fromisoformat(v["$ts"])
        if "$date" in v:
            return dt.date.fromisoformat(v["$date"])
        if "$time" in v:
            return dt.time.fromisoformat(v["$time"])
        if "$dec" in v:
            return decimal.Decimal(v["$dec"])
        if "$bin" in v:
            return base64.b64decode(v["$bin"])
        return None
    return v


# ---------------- manifest entries ----------------

@dataclass
class FileEntry:
    """One data file tracked by a manifest (≈ ManifestEntry + DataFileMeta).

    dv_path/dv_count: optional deletion vector — a parquet sidecar of
    (file_path, pos) rows masking deleted positions without rewriting the
    data file (ref: paimon-core/.../deletionvectors/DeletionVector.java,
    DataFileMeta deleteRowCount)."""
    kind: str                      # ADD | DELETE
    partition: dict[str, str]      # raw hive-path string values, in partition-key order
    bucket: int                    # -1 = unaware (append table)
    level: int                     # LSM level (0 = fresh sorted run)
    file_path: str                 # relative to table root
    row_count: int
    file_size: int
    min_seq: int
    max_seq: int
    schema_id: int
    stats: dict[str, dict[str, Any]]  # col -> {min,max,nulls} (JSON-decoded values)
    dv_path: str | None = None
    dv_count: int = 0
    index_path: str | None = None  # standalone file index sidecar (bloom)
    first_row_id: int | None = None  # row-tracking: _ROW_ID of this file's row 0

    def to_json(self) -> dict:
        out = {
            "kind": self.kind,
            "partition": self.partition,
            "bucket": self.bucket,
            "level": self.level,
            "file_path": self.file_path,
            "row_count": self.row_count,
            "file_size": self.file_size,
            "min_seq": self.min_seq,
            "max_seq": self.max_seq,
            "schema_id": self.schema_id,
            "stats": {
                c: {"min": stat_to_json(s.get("min")), "max": stat_to_json(s.get("max")),
                    "nulls": s.get("nulls")}
                for c, s in self.stats.items()
            },
        }
        if self.dv_path:
            out["dv_path"] = self.dv_path
            out["dv_count"] = self.dv_count
        if self.index_path:
            out["index_path"] = self.index_path
        if self.first_row_id is not None:
            out["first_row_id"] = self.first_row_id
        return out

    @staticmethod
    def from_json(d: dict) -> "FileEntry":
        return FileEntry(
            kind=d["kind"], partition=d["partition"], bucket=d["bucket"], level=d["level"],
            file_path=d["file_path"], row_count=d["row_count"], file_size=d["file_size"],
            min_seq=d["min_seq"], max_seq=d["max_seq"], schema_id=d.get("schema_id", 0),
            stats={c: {"min": stat_from_json(s.get("min")), "max": stat_from_json(s.get("max")),
                       "nulls": s.get("nulls")}
                   for c, s in d.get("stats", {}).items()},
            dv_path=d.get("dv_path"), dv_count=d.get("dv_count", 0),
            index_path=d.get("index_path"),
            first_row_id=d.get("first_row_id"),
        )

    def dedup_key(self) -> tuple:
        return (tuple(sorted(self.partition.items())), self.bucket, self.file_path)


# ---------------- snapshot ----------------

@dataclass
class Snapshot:
    id: int
    schema_id: int
    commit_kind: str
    commit_user: str
    commit_identifier: int
    timestamp_ms: int
    manifests: list[str]           # cumulative manifest-file names (ordered)
    total_record_count: int
    delta_record_count: int
    max_sequence: int              # highest _sequence_number committed so far
    watermark: int | None = None
    tag: str | None = None
    next_row_id: int | None = None  # row-tracking: first unassigned _ROW_ID

    def to_json(self) -> str:
        return json.dumps(self.__dict__, indent=2)

    @staticmethod
    def from_json(s: str) -> "Snapshot":
        d = json.loads(s)
        d.setdefault("watermark", None)
        d.setdefault("tag", None)
        d.setdefault("next_row_id", None)
        return Snapshot(**d)


def manifest_row_to_entry(kind, partition_json, bucket, level, file_path,
                          row_count, file_size, min_seq, max_seq, schema_id,
                          stats_json, dv_path, dv_count, index_path,
                          first_row_id=None) -> "FileEntry":
    """Decode one columnar-manifest row (shared by pyarrow + Spark readers)."""
    return FileEntry.from_json({
        "kind": kind, "partition": json.loads(partition_json),
        "bucket": int(bucket), "level": int(level), "file_path": file_path,
        "row_count": int(row_count), "file_size": int(file_size),
        "min_seq": int(min_seq), "max_seq": int(max_seq),
        "schema_id": int(schema_id), "stats": json.loads(stats_json),
        "dv_path": dv_path, "dv_count": int(dv_count or 0),
        "index_path": index_path,
        "first_row_id": None if first_row_id is None else int(first_row_id),
    })


def _read_manifest_parquet(path: str) -> list["FileEntry"]:
    import pyarrow.parquet as pq

    cols = pq.read_table(path).to_pydict()
    n = len(cols["kind"])
    none = [None] * n
    return [manifest_row_to_entry(*(cols.get(c, none)[i] for c in (
        "kind", "partition_json", "bucket", "level", "file_path", "row_count",
        "file_size", "min_seq", "max_seq", "schema_id", "stats_json",
        "dv_path", "dv_count", "index_path", "first_row_id"))) for i in range(n)]


# ---------------- on-disk layout helpers ----------------

class TablePaths:
    """Filesystem layout. With `branch` set, snapshot/schema/tag metadata
    lives under branch/branch-<name>/ while manifests and data files stay
    shared at the table root — a branch is a metadata fork, data is never
    copied (ref: paimon-core/.../utils/BranchManager.java:55-66 branch
    directory layout)."""

    def __init__(self, table_path: str, branch: str | None = None):
        self.root = table_path
        self.branch = branch
        self.meta_root = (table_path if branch is None
                          else os.path.join(table_path, "branch", f"branch-{branch}"))

    @property
    def schema_dir(self): return os.path.join(self.meta_root, "schema")
    @property
    def snapshot_dir(self): return os.path.join(self.meta_root, "snapshot")
    @property
    def manifest_dir(self): return os.path.join(self.root, "manifest")
    @property
    def tag_dir(self): return os.path.join(self.meta_root, "tag")
    @property
    def staging_dir(self): return os.path.join(self.root, ".staging")
    @property
    def branch_root(self): return os.path.join(self.root, "branch")

    def branch_meta_file(self):
        return os.path.join(self.meta_root, "BRANCH.json")

    def list_branches(self) -> list[str]:
        try:
            names = os.listdir(self.branch_root)
        except FileNotFoundError:
            return []
        return sorted(n[len("branch-"):] for n in names if n.startswith("branch-"))

    def schema_file(self, sid: int): return os.path.join(self.schema_dir, f"schema-{sid}.json")
    def snapshot_file(self, sid: int): return os.path.join(self.snapshot_dir, f"snapshot-{sid}.json")
    def manifest_file(self, name: str): return os.path.join(self.manifest_dir, name)
    def tag_file(self, name: str): return os.path.join(self.tag_dir, f"tag-{name}.json")

    def ensure(self):
        for d in (self.schema_dir, self.snapshot_dir, self.manifest_dir, self.tag_dir):
            os.makedirs(d, exist_ok=True)

    # -------- snapshot resolution --------

    def latest_snapshot_id(self) -> int | None:
        """Resolve latest via LATEST hint, verified against directory listing
        (hint update is non-atomic; listing is the source of truth)."""
        hint = os.path.join(self.snapshot_dir, "LATEST")
        best = None
        try:
            with open(hint) as f:
                best = int(f.read().strip())
        except (OSError, ValueError):
            best = None
        try:
            ids = [int(n[len("snapshot-"):-len(".json")])
                   for n in os.listdir(self.snapshot_dir)
                   if n.startswith("snapshot-") and n.endswith(".json")]
        except FileNotFoundError:
            return None
        if not ids:
            return None
        top = max(ids)
        return top if best is None or top > best else best

    def read_snapshot(self, sid: int) -> Snapshot:
        with open(self.snapshot_file(sid)) as f:
            s = f.read()
        if not s.strip():
            # In-flight commit on a filesystem without hard links
            # (try_commit_snapshot's O_EXCL fallback creates the file
            # before the content lands): the file's existence proves
            # the id is claimed — wait briefly for the content.
            for _ in range(50):
                time.sleep(0.01)
                with open(self.snapshot_file(sid)) as f:
                    s = f.read()
                if s.strip():
                    break
        return Snapshot.from_json(s)

    def earliest_snapshot_id(self) -> int | None:
        """Smallest retained snapshot id (one directory listing)."""
        try:
            ids = [int(n[len("snapshot-"):-len(".json")])
                   for n in os.listdir(self.snapshot_dir)
                   if n.startswith("snapshot-") and n.endswith(".json")]
        except FileNotFoundError:
            return None
        return min(ids) if ids else None

    def _bsearch_snapshots(self, pred) -> Snapshot | None:
        """Largest-id snapshot satisfying a MONOTONE-DECREASING predicate
        (true for a prefix of ids, false after) — O(log n) snapshot file
        reads instead of a linear scan over 10^5 retained snapshots
        (ref: SnapshotManager earlierOrEqual* binary searches)."""
        lo, hi = self.earliest_snapshot_id(), self.latest_snapshot_id()
        if lo is None or hi is None:
            return None
        best = None
        while lo <= hi:
            mid = (lo + hi) // 2
            try:
                s = self.read_snapshot(mid)
            except FileNotFoundError:   # concurrently expired prefix
                lo = mid + 1
                continue
            if pred(s):
                best, lo = s, mid + 1
            else:
                hi = mid - 1
        return best

    def snapshot_earlier_or_equal_ts(self, ts_ms: int) -> Snapshot | None:
        """Latest snapshot with timestamp_ms <= ts_ms (timestamps are
        monotone in id)."""
        return self._bsearch_snapshots(lambda s: s.timestamp_ms <= ts_ms)

    def snapshot_later_or_equal_ts(self, ts_ms: int) -> Snapshot | None:
        """Earliest snapshot with timestamp_ms >= ts_ms."""
        before = self._bsearch_snapshots(lambda s: s.timestamp_ms < ts_ms)
        latest = self.latest_snapshot_id()
        if latest is None:
            return None
        sid = (before.id + 1) if before is not None else \
            self.earliest_snapshot_id()
        if sid is None or sid > latest:
            return None
        try:
            return self.read_snapshot(sid)
        except FileNotFoundError:
            return None

    def snapshot_for_watermark(self, watermark: int) -> Snapshot | None:
        """Earliest snapshot whose watermark has passed `watermark`.
        Watermarks are monotone once set (commit folds max with the
        previous snapshot), with a possible None prefix."""
        below = self._bsearch_snapshots(
            lambda s: s.watermark is None or s.watermark < watermark)
        latest = self.latest_snapshot_id()
        if latest is None:
            return None
        sid = (below.id + 1) if below is not None else \
            self.earliest_snapshot_id()
        if sid is None or sid > latest:
            return None
        try:
            s = self.read_snapshot(sid)
        except FileNotFoundError:
            return None
        return s if (s.watermark is not None
                     and s.watermark >= watermark) else None

    def snapshot_earlier_or_equal_watermark(self, watermark: int
                                            ) -> Snapshot | None:
        """Latest snapshot with a watermark <= `watermark` (rollback)."""
        s = self._bsearch_snapshots(
            lambda x: x.watermark is None or x.watermark <= watermark)
        return None if (s is None or s.watermark is None) else s

    def latest_snapshot(self) -> Snapshot | None:
        sid = self.latest_snapshot_id()
        return self.read_snapshot(sid) if sid is not None else None

    def write_latest_hint(self, sid: int):
        tmp = os.path.join(self.snapshot_dir, f".LATEST.{uuid.uuid4().hex}.tmp")
        with open(tmp, "w") as f:
            f.write(str(sid))
        os.replace(tmp, os.path.join(self.snapshot_dir, "LATEST"))

    def try_commit_snapshot(self, snap: Snapshot) -> bool:
        """Put-if-absent creation of snapshot-<id>.json.

        Primary path: write the FULL content to a tmp file, then
        `os.link(tmp, target)` — link(2) fails with EEXIST when the id
        is taken AND publishes complete content atomically, so a racing
        reader can never observe an empty/partial snapshot (the r9
        concurrent-writer model test caught exactly that with the old
        create-empty-then-write shape). Fallback without hard links
        (object stores): O_EXCL create + write; readers tolerate the
        transient empty file (read_snapshot retry loop)."""
        path = self.snapshot_file(snap.id)
        body = snap.to_json()
        tmp = path + f".tmp-{os.getpid()}-{id(snap) & 0xffffff:x}"
        try:
            with open(tmp, "w") as f:
                f.write(body)
            try:
                os.link(tmp, path)
            except FileExistsError:
                return False
            finally:
                os.unlink(tmp)
        except OSError:
            try:
                os.unlink(tmp)
            except OSError:
                pass
            try:
                fd = os.open(path,
                             os.O_WRONLY | os.O_CREAT | os.O_EXCL, 0o644)
            except FileExistsError:
                return False
            with os.fdopen(fd, "w") as f:
                f.write(body)
        self.write_latest_hint(snap.id)
        return True

    # -------- per-user commit identifiers (streaming exactly-once) --------

    def _identifier_hint_file(self, commit_user: str) -> str:
        safe = "".join(ch if ch.isalnum() or ch in "-_." else "_"
                       for ch in commit_user)
        return os.path.join(self.snapshot_dir, f".latest-identifier-{safe}")

    def record_commit_identifier(self, commit_user: str, identifier: int,
                                 snapshot_id: int | None = None):
        """Persist the largest committed identifier for a commit user
        (one-line ``snapshot_id:identifier`` sidecar, monotone advance).
        Makes the streaming replay check O(1) instead of O(#snapshots)
        (ref: FileStoreCommitImpl filterCommitted reads descending — the
        hint is a cache of that scan's answer).

        The hint is a CACHE, never the source of truth: the committed
        snapshot itself carries (commit_user, commit_identifier)
        atomically, and `latest_commit_identifier` reconciles the hint
        against any snapshots committed after `snapshot_id`. A failed or
        skipped record therefore cannot cause a replayed batch to
        re-commit — it only makes the next check walk the (tiny) gap."""
        path = self._identifier_hint_file(commit_user)
        prev = self._read_identifier_hint(path)
        if prev is not None and prev[1] >= identifier:
            return
        tmp = f"{path}.tmp.{os.getpid()}"
        with open(tmp, "w") as f:
            f.write(f"{snapshot_id if snapshot_id is not None else 0}"
                    f":{identifier}")
        os.replace(tmp, path)

    @staticmethod
    def _read_identifier_hint(path: str) -> tuple[int, int] | None:
        """(snapshot_id, identifier) from the hint file; legacy plain-int
        files parse as snapshot_id=0 (→ full reconcile scan once, then
        the next record rewrites the new format)."""
        try:
            with open(path) as f:
                raw = f.read().strip()
        except OSError:
            return None
        try:
            if ":" in raw:
                sid, ident = raw.split(":", 1)
                return int(sid), int(ident)
            return 0, int(raw)
        except ValueError:
            return None

    def latest_commit_identifier(self, commit_user: str) -> int | None:
        """Largest commitIdentifier committed by `commit_user`. Source of
        truth is the snapshot chain (each snapshot atomically records its
        commit_user + commit_identifier); the sidecar hint only bounds the
        scan: snapshots ≤ hint.snapshot_id are summarized by the hint, so
        only the (normally empty) gap above it is walked DESCENDING with
        early exit at this user's first match — identifiers are monotone
        per user, so the most recent snapshot by the user carries the
        largest one (ref: FileStoreCommitImpl filterCommitted). A stale
        hint (post-commit record failed) is thereby reconciled, never
        trusted into a duplicate re-commit."""
        hint = self._read_identifier_hint(
            self._identifier_hint_file(commit_user))
        latest = self.latest_snapshot_id()
        if latest is None:
            return hint[1] if hint else None
        floor = hint[0] if hint else (self.earliest_snapshot_id() or 1) - 1
        for sid in range(latest, floor, -1):
            try:
                s = self.read_snapshot(sid)
            except FileNotFoundError:
                continue
            if s.commit_user == commit_user:
                return max(s.commit_identifier, hint[1]) if hint \
                    else s.commit_identifier
        return hint[1] if hint else None

    # -------- manifests --------

    def write_manifest(self, entries: Iterable[FileEntry],
                       fmt: str = "json") -> str:
        """fmt='json' → JSONL (debuggable); fmt='parquet' → columnar manifest
        (≈ the reference's avro manifests, ManifestFile.java): ~10× smaller,
        splittable, and readable by Spark itself for distributed planning of
        million-file tables."""
        os.makedirs(self.manifest_dir, exist_ok=True)
        if fmt == "parquet":
            return self._write_manifest_parquet(entries)
        name = f"manifest-{uuid.uuid4().hex}.jsonl"
        tmp = self.manifest_file(name + ".tmp")
        with open(tmp, "w") as f:
            for e in entries:
                f.write(json.dumps(e.to_json(), separators=(",", ":")) + "\n")
        os.replace(tmp, self.manifest_file(name))
        return name

    def _write_manifest_parquet(self, entries: Iterable[FileEntry]) -> str:
        import pyarrow as pa
        import pyarrow.parquet as pq

        name = f"manifest-{uuid.uuid4().hex}.parquet"
        rows = [e.to_json() for e in entries]
        table = pa.table({
            "kind": pa.array([r["kind"] for r in rows], pa.string()),
            "partition_json": pa.array(
                [json.dumps(r["partition"], sort_keys=True) for r in rows],
                pa.string()),
            "bucket": pa.array([r["bucket"] for r in rows], pa.int64()),
            "level": pa.array([r["level"] for r in rows], pa.int64()),
            "file_path": pa.array([r["file_path"] for r in rows], pa.string()),
            "row_count": pa.array([r["row_count"] for r in rows], pa.int64()),
            "file_size": pa.array([r["file_size"] for r in rows], pa.int64()),
            "min_seq": pa.array([r["min_seq"] for r in rows], pa.int64()),
            "max_seq": pa.array([r["max_seq"] for r in rows], pa.int64()),
            "schema_id": pa.array([r["schema_id"] for r in rows], pa.int64()),
            "stats_json": pa.array(
                [json.dumps(r["stats"], separators=(",", ":")) for r in rows],
                pa.string()),
            "dv_path": pa.array([r.get("dv_path") for r in rows], pa.string()),
            "dv_count": pa.array([r.get("dv_count", 0) for r in rows], pa.int64()),
            "index_path": pa.array([r.get("index_path") for r in rows], pa.string()),
            "first_row_id": pa.array([r.get("first_row_id") for r in rows],
                                     pa.int64()),
        })
        tmp = self.manifest_file(name + ".tmp")
        pq.write_table(table, tmp, compression="zstd")
        os.replace(tmp, self.manifest_file(name))
        return name

    _manifest_cache: dict[str, list["FileEntry"]] = {}
    _MANIFEST_CACHE_MAX = 4096

    def read_manifest(self, name: str) -> list[FileEntry]:
        """Manifest files are immutable once written → process-wide cache.
        (ref: SegmentsCache — WriteRestoreScanBenchmark.java:257-284 shows
        ~30x on repeated scan planning)"""
        key = self.manifest_file(name)
        hit = TablePaths._manifest_cache.get(key)
        if hit is not None:
            return hit
        if name.endswith(".parquet"):
            entries = _read_manifest_parquet(key)
        else:
            with open(key) as f:
                entries = [FileEntry.from_json(json.loads(line))
                           for line in f if line.strip()]
        if len(TablePaths._manifest_cache) < TablePaths._MANIFEST_CACHE_MAX:
            TablePaths._manifest_cache[key] = entries
        return entries

    def live_entries(self, snap: Snapshot) -> list[FileEntry]:
        """Replay ADD/DELETE across the snapshot's manifest list → live files."""
        live: dict[tuple, FileEntry] = {}
        for m in snap.manifests:
            for e in self.read_manifest(m):
                if e.kind == ADD:
                    live[e.dedup_key()] = e
                else:
                    live.pop(e.dedup_key(), None)
        return list(live.values())

    # -------- tags (ref: Table.java:127 createTag) --------

    def write_tag(self, name: str, snapshot_id: int,
                  time_retained_ms: int | None = None):
        os.makedirs(self.tag_dir, exist_ok=True)
        meta = {"name": name, "snapshot_id": snapshot_id,
                "created_ms": int(time.time() * 1000)}
        if time_retained_ms is not None:
            # per-tag retention (ref: Tag.java timeRetained — the tag
            # auto-expires during maintenance once created+retained < now)
            meta["time_retained_ms"] = int(time_retained_ms)
        with open(self.tag_file(name), "w") as f:
            json.dump(meta, f)

    def read_tag(self, name: str) -> int:
        with open(self.tag_file(name)) as f:
            return json.load(f)["snapshot_id"]

    def list_tags(self) -> dict[str, int]:
        try:
            names = os.listdir(self.tag_dir)
        except FileNotFoundError:
            return {}
        out = {}
        for n in names:
            if n.startswith("tag-") and n.endswith(".json"):
                with open(os.path.join(self.tag_dir, n)) as f:
                    d = json.load(f)
                out[d["name"]] = d["snapshot_id"]
        return out
