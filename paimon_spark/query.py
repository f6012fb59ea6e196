"""In-process point-lookup query: millisecond key→row reads without a
Spark job.

≈ the reference's LocalTableQuery + LookupLevels caches (ref:
paimon-core/.../table/query/LocalTableQuery.java:69,226 — the engine
behind its remote lookup service workers). The reference materializes a
bucket's sorted runs into local lookup files and serves gets from a
cache; the Python analog materializes the MERGED key→row dict per
(partition, bucket) with one pyarrow read (no JVM, no job) and serves
dict-gets until the table's snapshot advances, then lazily refreshes.

Scale posture: a lookup touches exactly one bucket's files — the same
pruning the bucket-pruned scan does — and the cache holds only the
buckets actually queried. This is the single-node serving path; the
reference ships the identical logic to dedicated service workers
(paimon-service/), which stay out of scope as an external deployment.
"""

from __future__ import annotations

from typing import Any

import pyarrow as pa

from paimon_spark.schema import KIND_COL, SEQ_COL, TableSchema

RETRACT_KINDS = ("-U", "-D")

# cache sentinel: bucket exceeds max_bucket_rows, serve via per-lookup
# filtered reads instead of materializing (bounded memory)
_TOO_BIG = object()


class LocalTableQuery:
    """`LocalTableQuery(table).lookup({"id": 5})` → row dict or None.

    Requirements: primary-key table, fixed bucket (>0), no
    cross-partition update (a key's partition must be derivable from the
    key), merge engine deduplicate or first-row (the engines whose
    merged row is ONE input row — partial-update/aggregation need field
    merge and go through the Spark read path)."""

    def __init__(self, table, max_cached_buckets: int = 64,
                 max_bucket_rows: int = 2_000_000):
        schema: TableSchema = table.schema
        if not schema.is_pk_table:
            raise ValueError("LocalTableQuery needs a primary-key table")
        if schema.num_buckets <= 0:
            raise ValueError("LocalTableQuery needs a fixed bucket count")
        if schema.cross_partition_update:
            raise ValueError("cross-partition tables route lookups "
                             "through the global index, not a bucket")
        if schema.merge_engine not in ("deduplicate", "first-row"):
            raise ValueError(f"merge engine {schema.merge_engine} needs "
                             f"field merging; use table.read()")
        self.table = table
        self.schema = schema
        self._snapshot_id: int | None = None
        # Bounded memory (the reference bounds this with disk-backed
        # LookupLevels + caches, LocalTableQuery.java:226):
        # - at most `max_cached_buckets` materialized buckets, LRU-evicted
        # - a bucket whose manifests say > `max_bucket_rows` rows is never
        #   materialized; its lookups go through a per-lookup pyarrow
        #   predicate-pushdown read instead (row-group stats pruning)
        self.max_cached_buckets = max_cached_buckets
        self.max_bucket_rows = max_bucket_rows
        from collections import OrderedDict
        # (partition tuple, bucket) → {key tuple: row dict} | _TOO_BIG
        self._buckets: OrderedDict[tuple, Any] = OrderedDict()

    # ---- key routing (write-path parity) ----

    def _bucket_of(self, key: dict[str, Any]) -> int:
        from paimon_spark.functions.sparkhash import bucket_of
        fields = [self.schema.struct[k] for k in self.schema.bucket_keys]
        tbl = pa.table({k: [key[k]] for k in self.schema.bucket_keys})
        return int(bucket_of(tbl, fields, self.schema.bucket_keys,
                             self.schema.num_buckets,
                             self.schema.bucket_hash)[0])

    def _partition_of(self, key: dict[str, Any]) -> tuple:
        # partition ⊆ PK here (cross-partition rejected in __init__)
        return tuple(str(key[k]) for k in self.schema.partition_keys)

    # ---- cache build ----

    def _refresh_if_stale(self) -> None:
        latest = self.table.paths.latest_snapshot_id()
        if latest != self._snapshot_id:
            self._buckets.clear()          # lazy rebuild per queried bucket
            self._snapshot_id = latest

    def _bucket_entries(self, part: tuple, bucket: int) -> list:
        snap = (self.table.paths.read_snapshot(self._snapshot_id)
                if self._snapshot_id else None)
        if snap is None:
            return []
        pkeys = self.schema.partition_keys
        return [e for e in self.table.paths.live_entries(snap)
                if e.bucket == bucket
                and tuple(str(e.partition.get(k)) for k in pkeys) == part]

    def _merge_best(self, entries, key_filter: dict | None) -> dict[tuple, dict]:
        """Merge the entries' rows (optionally pyarrow-filtered down to
        one key) to latest-per-key, honoring first-row and retractions."""
        import os

        import pyarrow.parquet as pq

        from paimon_spark.scanner import cast_partition_value
        pkeys = self.schema.partition_keys
        pk = self.schema.primary_keys
        first_row = self.schema.merge_engine == "first-row"
        filters = None
        if key_filter is not None:
            # trimmed pks are physically in every data file; partition
            # cols are already fixed by the bucket routing
            filters = [(c, "==", key_filter[c])
                       for c in self.schema.trimmed_primary_keys]
        best: dict[tuple, tuple] = {}      # key → (order, kind, row)
        for e in entries:
            t = pq.read_table(os.path.join(self.table.path, e.file_path),
                              filters=filters)
            cols = set(t.column_names)
            # partition columns live in the path/manifest, not the file
            pvals = {k: cast_partition_value(e.partition.get(k),
                                             self.schema.data_type(k))
                     for k in pkeys if k not in cols}
            rows = t.to_pylist()
            for r in rows:
                if pvals:
                    r.update(pvals)
                k = tuple(r.get(c) for c in pk)
                order = (r.get(SEQ_COL, 0),)
                kind = r.get(KIND_COL, "+I")
                cur = best.get(k)
                if cur is None:
                    best[k] = (order, kind, r)
                elif first_row:
                    if order < cur[0]:
                        best[k] = (order, kind, r)
                elif order >= cur[0]:
                    best[k] = (order, kind, r)
        out: dict[tuple, dict] = {}
        fields = self.schema.field_names
        for k, (_o, kind, r) in best.items():
            if kind in RETRACT_KINDS:
                continue
            out[k] = {c: r.get(c) for c in fields}
        return out

    def _load_bucket(self, part: tuple, bucket: int):
        """Merge one bucket's sorted runs into a key→row dict (pyarrow,
        driver-local — the LookupLevels materialization analog); returns
        the _TOO_BIG sentinel instead when the manifests say the bucket
        exceeds `max_bucket_rows` (never materialized)."""
        entries = self._bucket_entries(part, bucket)
        if sum(e.row_count for e in entries) > self.max_bucket_rows:
            return _TOO_BIG
        return self._merge_best(entries, None)

    # ---- the point read ----

    def lookup(self, key: dict[str, Any]) -> dict | None:
        """Latest merged row for `key` (all primary-key columns), or
        None if absent/deleted. First hit per bucket pays one pyarrow
        read; subsequent hits are dict-gets until the snapshot moves."""
        missing = [k for k in self.schema.primary_keys if k not in key]
        if missing:
            raise ValueError(f"lookup needs all primary keys; missing "
                             f"{missing}")
        self._refresh_if_stale()
        part = self._partition_of(key)
        bucket = self._bucket_of(key)
        ck = (part, bucket)
        if ck not in self._buckets:
            self._buckets[ck] = self._load_bucket(part, bucket)
            while len(self._buckets) > self.max_cached_buckets:
                self._buckets.popitem(last=False)      # LRU evict
        else:
            self._buckets.move_to_end(ck)
        cached = self._buckets[ck]
        kt = tuple(key[c] for c in self.schema.primary_keys)
        if cached is _TOO_BIG:
            # fat bucket: per-lookup predicate-pushdown read (bounded
            # RSS — only rows matching the key cross into Python)
            hit = self._merge_best(self._bucket_entries(part, bucket), key)
            return hit.get(kt)
        return cached.get(kt)
