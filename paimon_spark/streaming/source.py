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
                 max_snapshots_per_batch: int | None = None,
                 bounded_watermark: int | None = None):
        self.table = table
        self.mode = mode
        self.from_snapshot = from_snapshot
        self.from_timestamp_ms = from_timestamp_ms
        self.to_snapshot = to_snapshot
        self.consumer_id = consumer_id
        self.max_snapshots = max_snapshots_per_batch
        # scan.bounded.watermark (ref: CoreOptions.java:1251 +
        # BoundedChecker.watermark): the stream ENDS once a snapshot's
        # watermark passes the bound — that snapshot is not consumed
        self.bounded_watermark = bounded_watermark
        self._bounded_done = False
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
        if self._bounded_done or self._next > latest:
            return None
        end = latest
        if self.max_snapshots is not None:
            end = min(latest, self._next + self.max_snapshots - 1)
        if self.bounded_watermark is not None:
            # end the stream BEFORE the first snapshot whose watermark
            # passed the bound (ref: BoundedChecker.watermark — strict >)
            stop = None
            for sid in range(self._next, end + 1):
                wm = self.table.paths.read_snapshot(sid).watermark
                if wm is not None and wm > self.bounded_watermark:
                    stop = sid
                    break
            if stop is not None:
                self._bounded_done = True
                if stop == self._next:
                    return None
                end = stop - 1
        df = self.table.read_incremental(self._next - 1, end, with_kind=True)
        if not self.table.schema.is_pk_table:
            df = df.withColumn(KIND_COL, F.lit("+I"))
        elif SEQ_COL in df.columns:
            df = df.drop(SEQ_COL)
        self._next = end + 1
        self._save_consumer()
        return df


class ChainStreamScanner:
    """Streaming scan for chain tables — the two-phase design of the
    reference (ref: ChainTableStreamScan.java:77,183 planStarting):

    - Phase 1 (starting): the latest snapshot-branch partition per chain
      GROUP, plus delta-branch partitions whose chain key is strictly
      greater than that group's snapshot chain key. Older snapshot
      partitions are excluded; each key appears once under its natural
      partition (no anchor merge — lightweight default). With
      `chain-table.streaming.merge-snapshot=true` the snapshot partition
      is PK-MERGED with those delta partitions and projected to the
      greatest chain partition, so cross-branch deletions/updates are
      visible (ref: buildMergedStartingSplits).
    - Phase 2 (incremental): new snapshots from the DELTA BRANCH only,
      from where phase 1 pinned its position. Checkpoint state is a
      single int — the delta branch's next snapshot id (consumer file /
      `next_delta_snapshot`); a stateful restart skips phase 1.
    """

    def __init__(self, table: Table,
                 consumer_id: str | None = None,
                 next_delta_snapshot: int | None = None,
                 max_snapshots_per_batch: int | None = None):
        opts = table.schema.options
        if opts.get("chain-table.enabled") != "true":
            raise ValueError("ChainStreamScanner requires "
                             "chain-table.enabled=true")
        db = opts.get("scan.fallback-delta-branch")
        if not db:
            raise ValueError("chain streaming needs "
                             "scan.fallback-delta-branch")
        sb = opts.get("scan.fallback-snapshot-branch")
        existing = set(table.paths.list_branches())
        self.table = table
        self.st = (Table.load(table.path, table.spark, branch=sb)
                   if sb and sb in existing else None)
        if db not in existing:
            raise ValueError(f"delta branch '{db}' does not exist")
        self.dt = Table.load(table.path, table.spark, branch=db)
        self.merge_snapshot = opts.get(
            "chain-table.streaming.merge-snapshot", "false") == "true"
        self.consumer_id = consumer_id
        self.max_snapshots = max_snapshots_per_batch
        self._next: int | None = next_delta_snapshot
        if self._next is None and consumer_id is not None:
            saved = self._load_consumer()
            if saved is not None:
                self._next = saved          # stateful restart: no phase 1

    # -- consumer persistence (checkpoint state = one int, like the ref) --

    def _consumer_path(self) -> str:
        return os.path.join(self.table.path, "consumer",
                            f"chain-consumer-{self.consumer_id}.json")

    def _load_consumer(self) -> int | None:
        try:
            with open(self._consumer_path()) as f:
                return json.load(f)["next_delta_snapshot"]
        except (OSError, KeyError, ValueError):
            return None

    def _save_consumer(self):
        if self.consumer_id is None or self._next is None:
            return
        os.makedirs(os.path.dirname(self._consumer_path()), exist_ok=True)
        tmp = self._consumer_path() + ".tmp"
        with open(tmp, "w") as f:
            json.dump({"next_delta_snapshot": self._next,
                       "updated_ms": int(time.time() * 1000)}, f)
        os.replace(tmp, self._consumer_path())

    # -- phase 1 ----------------------------------------------------------

    def _phase1(self) -> DataFrame:
        from paimon_spark.operators.merge import order_struct
        from paimon_spark.predicates import P
        from paimon_spark.scanner import cast_partition_value
        t = self.table
        opts, pkeys = t.schema.options, t.schema.partition_keys
        chain = [k.strip() for k in
                 opts.get("chain-table.chain-partition-keys", "").split(",")
                 if k.strip()] or pkeys
        prefix = [k for k in pkeys if k not in chain]

        def cast_part(part):
            return {k: cast_partition_value(part.get(k),
                                            t.schema.data_type(k))
                    for k in pkeys}

        def ckey(p): return tuple(p[k] for k in chain)
        def gkey(p): return tuple(p[k] for k in prefix)
        def part_eq(p):
            return P.and_(*[P.eq(k, p[k]) for k in pkeys])

        # pin both branch positions; re-read the snapshot head to detect
        # a commit racing the capture (ref: MAX_RACE_RETRIES loop)
        for _attempt in range(3):
            snap_sid = (self.st.paths.latest_snapshot_id()
                        if self.st else None)
            delta_sid = self.dt.paths.latest_snapshot_id()
            if (self.st.paths.latest_snapshot_id()
                    if self.st else None) == snap_sid:
                break
        self._next = (delta_sid or 0) + 1

        snap_parts: dict[tuple, dict] = {}
        if self.st is not None and snap_sid is not None:
            for e in self.st.new_scan().plan(snapshot_id=snap_sid).entries:
                p = cast_part(e.partition)
                snap_parts[tuple(p[k] for k in pkeys)] = p
        delta_parts: dict[tuple, dict] = {}
        if delta_sid is not None:
            for e in self.dt.new_scan().plan(snapshot_id=delta_sid).entries:
                p = cast_part(e.partition)
                delta_parts[tuple(p[k] for k in pkeys)] = p
        latest_per_group: dict[tuple, dict] = {}
        for p in snap_parts.values():
            g = gkey(p)
            if g not in latest_per_group or ckey(p) > ckey(latest_per_group[g]):
                latest_per_group[g] = p
        d_targets = [p for p in delta_parts.values()
                     if gkey(p) not in latest_per_group
                     or ckey(p) > ckey(latest_per_group[gkey(p)])]

        cols = list(t.schema.field_names)
        parts_df: list[DataFrame] = []
        if not self.merge_snapshot:
            # lightweight: both sides as-is under their natural partition
            if latest_per_group:
                parts_df.append(self.st.read(
                    P.or_(*[part_eq(p) for p in latest_per_group.values()]),
                    snapshot_id=snap_sid).select(*cols))
            if d_targets:
                parts_df.append(self.dt.read(
                    P.or_(*[part_eq(p) for p in d_targets]),
                    snapshot_id=delta_sid).select(*cols))
        else:
            # merge mode: per group, PK-merge the snapshot partition with
            # its greater-chain-key delta partitions; chain rank outranks
            # branch-local sequences; project to the greatest partition
            pks = t.schema.primary_keys
            vals = [c for c in cols if c not in pks]
            groups = sorted({gkey(p) for p in
                             list(latest_per_group.values()) + d_targets})
            for g in groups:
                anchor = latest_per_group.get(g)
                deltas = sorted((p for p in d_targets if gkey(p) == g),
                                key=ckey)
                target = max([p for p in [anchor] + deltas if p], key=ckey)
                srcs: list[DataFrame] = []
                if anchor is not None:
                    srcs.append(self.st.read(
                        part_eq(anchor), snapshot_id=snap_sid,
                        with_hidden=True).withColumn("__cr", F.lit(0)))
                for i, d in enumerate(deltas):
                    srcs.append(self.dt.read(
                        part_eq(d), snapshot_id=delta_sid,
                        with_hidden=True).withColumn("__cr", F.lit(i + 1)))
                u = srcs[0]
                for s in srcs[1:]:
                    u = u.unionByName(s)
                for k in pkeys:
                    u = u.withColumn(k, F.lit(target[k]).cast(
                        t.schema.data_type(k)))
                order = F.struct(F.col("__cr"), order_struct(t.schema))
                top = F.max_by(
                    F.struct(*[F.col(c) for c in vals], F.col(KIND_COL)),
                    order).alias("__top")
                m = (u.groupBy(*pks).agg(top)
                     .filter(~F.col(f"__top.{KIND_COL}").isin("-D", "-U"))
                     .select(*pks, *[F.col(f"__top.{c}").alias(c)
                                     for c in vals])
                     .select(*cols))
                parts_df.append(m)
        if not parts_df:
            return t._empty_df().withColumn(KIND_COL, F.lit("+I"))
        df = parts_df[0]
        for p in parts_df[1:]:
            df = df.unionByName(p)
        return df.withColumn(KIND_COL, F.lit("+I"))

    # -- micro-batch pull -------------------------------------------------

    def next_batch(self) -> DataFrame | None:
        if self._next is None:
            df = self._phase1()
            self._save_consumer()
            return df
        latest = self.dt.paths.latest_snapshot_id() or 0
        if self._next > latest:
            return None
        end = latest
        if self.max_snapshots is not None:
            end = min(latest, self._next + self.max_snapshots - 1)
        df = self.dt.read_incremental(self._next - 1, end, with_kind=True)
        if not self.dt.schema.is_pk_table and KIND_COL not in df.columns:
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
