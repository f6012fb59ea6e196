"""Streaming reads: snapshot-incremental micro-batches over a table.

Mirrors the reference's streaming scan
(ref: paimon-core/.../table/source/DataTableStreamScan.java:56,143,264 —
StartingScanner modes + DeltaFollowUpScanner per snapshot;
paimon-spark/.../sources/PaimonMicroBatchStream.scala:33,67-90 — offsets =
snapshot ids, ReadLimit maxFiles/maxRows).

Two surfaces:
- `StreamScanner`: a pull-based micro-batch iterator (offset = snapshot id,
  durable via a consumer file) — the engine-level primitive. Drive it in a
  loop or from any scheduler; each batch is a DataFrame of the delta rows.
- `stream_to` / `stream_forever`: convenience pumps that feed each batch to
  a sink callback (the `writeStream.foreachBatch` shape).

Startup modes (ref: CoreOptions.java:4823-4895 scan.mode):
latest-full (default: full current state then deltas), latest (deltas
only), from-snapshot(id), from-timestamp(ms).

Exactly-once: the consumer file (ref: paimon-core/.../consumer/) records
the last consumed snapshot; restarts resume after it. Combined with an
idempotent sink (or paimon sink commit identity) this is the reference's
model: Spark checkpoint + consumer id.
"""

from __future__ import annotations

import json
import os
import time
from collections.abc import Callable

from pyspark.sql import DataFrame, functions as F

from paimon_spark.schema import KIND_COL, SEQ_COL
from paimon_spark.table import Table


class StreamScanner:
    def __init__(self, table: Table, mode: str = "latest-full",
                 from_snapshot: int | None = None,
                 from_timestamp_ms: int | None = None,
                 to_snapshot: int | None = None,
                 consumer_id: str | None = None,
                 max_snapshots_per_batch: int | None = None):
        self.table = table
        self.mode = mode
        self.from_snapshot = from_snapshot
        self.from_timestamp_ms = from_timestamp_ms
        self.to_snapshot = to_snapshot
        self.consumer_id = consumer_id
        self.max_snapshots = max_snapshots_per_batch
        self._next: int | None = None          # next snapshot id to consume
        self._did_initial = False
        if mode == "incremental" and (from_snapshot is None
                                      or to_snapshot is None):
            raise ValueError("scan.mode=incremental needs from_snapshot "
                             "and to_snapshot")

    # ------------- consumer persistence (ref: consumer/Consumer.java) ------

    def _consumer_path(self) -> str:
        return os.path.join(self.table.path, "consumer",
                            f"consumer-{self.consumer_id}.json")

    def _load_consumer(self) -> int | None:
        try:
            with open(self._consumer_path()) as f:
                return json.load(f)["next_snapshot"]
        except (OSError, KeyError, ValueError):
            return None

    def _save_consumer(self):
        if self.consumer_id is None or self._next is None:
            return
        os.makedirs(os.path.dirname(self._consumer_path()), exist_ok=True)
        tmp = self._consumer_path() + ".tmp"
        with open(tmp, "w") as f:
            json.dump({"next_snapshot": self._next,
                       "updated_ms": int(time.time() * 1000)}, f)
        os.replace(tmp, self._consumer_path())

    # ------------- offset resolution (StartingScanner modes) ---------------

    def _resolve_start(self) -> tuple[int | None, bool]:
        """→ (next snapshot id, emit_initial_full_state)."""
        if self.consumer_id is not None:
            saved = self._load_consumer()
            if saved is not None:
                return saved, False
        latest = self.table.paths.latest_snapshot_id()
        if self.mode == "latest-full":
            return (latest + 1 if latest else 1), latest is not None
        if self.mode == "latest":
            return (latest + 1 if latest else 1), False
        if self.mode == "from-snapshot":
            return (self.from_snapshot or 1), False
        if self.mode == "from-snapshot-full":
            # full state AT from_snapshot, then deltas after it
            # (ref: StaticFromSnapshotStartingScanner "-full" variants)
            s = self.from_snapshot or latest or 1
            return s + 1, latest is not None
        if self.mode == "compacted-full":
            # full state at the latest COMPACT snapshot (compaction output
            # reads merge-free), then deltas (ref: CompactedStartingScanner).
            # Bounded: stop at the earliest retained snapshot and cap the
            # descending reads — with no recent COMPACT the answer is the
            # same as latest-full, so a long scan buys nothing.
            start = latest
            earliest = self.table.paths.earliest_snapshot_id() or 1
            max_reads = 128
            for sid in range((latest or 0), earliest - 1, -1):
                if max_reads <= 0:
                    break
                max_reads -= 1
                try:
                    if self.table.paths.read_snapshot(sid).commit_kind == "COMPACT":
                        start = sid
                        break
                except FileNotFoundError:
                    continue
            return ((start or 0) + 1 if start else 1), latest is not None
        if self.mode in ("from-timestamp", "from-creation-timestamp"):
            sc = self.table.new_scan()
            snap = sc.resolve_snapshot(as_of_timestamp_ms=self.from_timestamp_ms)
            return ((snap.id + 1) if snap else 1), False
        raise ValueError(f"unknown scan mode {self.mode}")

    # ------------- micro-batch pull ---------------------------------------

    def next_batch(self) -> DataFrame | None:
        """Next micro-batch of changelog rows (with `_row_kind`), or None if
        caught up. First batch under latest-full is the full current state."""
        if self.mode == "incremental":
            # bounded replay of (from, to] as ONE batch, then caught up —
            # the streaming face of the incremental TVF
            # (ref: CoreOptions.java INCREMENTAL scan mode)
            if self._did_initial:
                return None
            self._did_initial = True
            df = self.table.read_incremental(self.from_snapshot,
                                             self.to_snapshot, with_kind=True)
            if not self.table.schema.is_pk_table and KIND_COL not in df.columns:
                df = df.withColumn(KIND_COL, F.lit("+I"))
            if SEQ_COL in df.columns:
                df = df.drop(SEQ_COL)
            return df
        if self._next is None and self.mode == "from-file-creation-time":
            # initial state = live data files CREATED at/after the cutoff,
            # then deltas (ref: FileCreationTimeStartingScanner /
            # CoreOptions scan.file-creation-time-millis). The reference
            # reads DataFileMeta.creationTime; we use filesystem mtime —
            # same signal for immutable, written-once data files.
            latest = self.table.paths.latest_snapshot()
            self._next = (latest.id + 1) if latest else 1
            self._did_initial = True
            self._save_consumer()
            if latest is not None:
                cutoff = (self.from_timestamp_ms or 0) / 1000.0
                ents = [e for e in self.table.paths.live_entries(latest)
                        if os.path.getmtime(os.path.join(
                            self.table.path, e.file_path)) >= cutoff]
                if ents:
                    df = self.table._read_files(ents)
                    if self.table.schema.is_pk_table:
                        from paimon_spark.operators.merge import apply_merge
                        df = apply_merge(df, self.table.schema)
                    df = df.select(*self.table.schema.field_names)
                    return df.withColumn(KIND_COL, F.lit("+I"))
            return None
        if self._next is None:
            self._next, emit_full = self._resolve_start()
            if emit_full and not self._did_initial:
                self._did_initial = True
                snap_id = self._next - 1
                df = self.table.read(snapshot_id=snap_id)
                df = df.withColumn(KIND_COL, F.lit("+I"))
                self._save_consumer()
                return df
        latest = self.table.paths.latest_snapshot_id() or 0
        if self._next > latest:
            return None
        end = latest
        if self.max_snapshots is not None:
            end = min(latest, self._next + self.max_snapshots - 1)
        df = self.table.read_incremental(self._next - 1, end, with_kind=True)
        if not self.table.schema.is_pk_table:
            df = df.withColumn(KIND_COL, F.lit("+I"))
        elif SEQ_COL in df.columns:
            df = df.drop(SEQ_COL)
        self._next = end + 1
        self._save_consumer()
        return df


def stream_to(table: Table, sink: Callable[[DataFrame, int], None],
              poll_interval_s: float = 0.5, max_batches: int | None = None,
              idle_timeout_s: float | None = 5.0, **scanner_kw) -> int:
    """Pump micro-batches to `sink(batch_df, batch_id)` until idle.
    The foreachBatch shape (ref: sources/PaimonSink.scala:31)."""
    sc = StreamScanner(table, **scanner_kw)
    batch_id, idle_since = 0, time.monotonic()
    while True:
        df = sc.next_batch()
        if df is not None:
            sink(df, batch_id)
            batch_id += 1
            idle_since = time.monotonic()
            if max_batches is not None and batch_id >= max_batches:
                return batch_id
        else:
            if idle_timeout_s is not None and \
                    time.monotonic() - idle_since > idle_timeout_s:
                return batch_id
            time.sleep(poll_interval_s)


def write_stream_to_table(batch_df: DataFrame, table: Table,
                          batch_id: int | None = None,
                          commit_user: str = "stream"):
    """Streaming sink body for foreachBatch. With `batch_id`, the commit is
    EXACTLY-ONCE: the (commit_user, batch_id) pair is stored as the
    snapshot's commitIdentifier and a replayed batch (restart between a
    successful commit and the checkpoint write) is skipped.
    (ref: PaimonSink.scala:31 + FileStoreCommitImpl filterCommitted —
    recovery drops already-committed identifiers)"""
    from paimon_spark.writer import BatchWriter
    if batch_id is not None:
        # O(1) replay check: identifiers are monotone per commit user
        # (sidecar hint, else descending early-exit scan —
        #  ref: FileStoreCommitImpl filterCommitted)
        last = table.paths.latest_commit_identifier(commit_user)
        if last is not None and batch_id <= last:
            return None          # replay of an already-committed batch
        w = BatchWriter(table, commit_user=commit_user)
        if table.schema.cross_partition_update:
            from paimon_spark.operators.cross_partition import \
                cross_partition_stage
            entries, persist = cross_partition_stage(w, batch_df)
            snap = w.commit(entries, commit_identifier=batch_id)
            persist()
            return snap
        return w.commit(w.stage(batch_df), commit_identifier=batch_id)
    return table.append(batch_df)
