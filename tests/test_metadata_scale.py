"""Metadata-layer scale features: manifest-list compaction, manifest cache,
ANALYZE statistics, read-optimized view."""

from pyspark.sql import types as T

from paimon_spark import Table
from paimon_spark.metadata import TablePaths

KV = T.StructType([T.StructField("k", T.LongType()),
                   T.StructField("v", T.StringType())])


def test_manifest_list_compaction_and_incremental_fallback(spark, wh):
    t = Table.create(f"{wh}/m", KV, primary_keys=["k"],
                     options={"bucket": "1",
                              "manifest.compaction-trigger": "3"}, spark=spark)
    for i in range(6):
        t.append(spark.createDataFrame([(i, f"v{i}")], KV))
    snap = t.paths.latest_snapshot()
    # the list folded at least once → far fewer than 6 manifests
    assert len(snap.manifests) < 6
    assert sorted(r["k"] for r in t.read().collect()) == list(range(6))
    # incremental across a consolidation boundary uses the live-diff path
    inc = t.read_incremental(1, 6)
    assert sorted(r["k"] for r in inc.collect()) == [1, 2, 3, 4, 5]


def test_manifest_cache_hits(spark, wh):
    t = Table.create(f"{wh}/c", KV, primary_keys=["k"],
                     options={"bucket": "1"}, spark=spark)
    t.append(spark.createDataFrame([(1, "a")], KV))
    name = t.paths.latest_snapshot().manifests[0]
    first = t.paths.read_manifest(name)
    assert t.paths.read_manifest(name) is first  # cached object identity


def test_analyze_and_statistics_table(spark, wh):
    t = Table.create(f"{wh}/a", KV, spark=spark)
    t.append(spark.createDataFrame(
        [(i % 10, None if i % 5 == 0 else "x") for i in range(100)], KV))
    stats = t.analyze()
    assert stats["row_count"] == 100
    assert stats["columns"]["v"]["null_count"] == 20
    assert 8 <= stats["columns"]["k"]["distinct_count"] <= 12  # approx ndv
    sdf = {r["column"]: r for r in t.statistics_df().collect()}
    assert sdf["v"]["null_count"] == 20


def test_read_optimized_lags_until_compact(spark, wh):
    t = Table.create(f"{wh}/ro", KV, primary_keys=["k"],
                     options={"bucket": "1"}, spark=spark)
    t.append(spark.createDataFrame([(1, "a")], KV))
    assert t.read_optimized().count() == 0       # nothing compacted yet
    t.compact()
    assert [tuple(r) for r in t.read_optimized().collect()] == [(1, "a")]
    t.append(spark.createDataFrame([(1, "b")], KV))
    # read-optimized still serves the compacted state; full read merges
    assert [tuple(r) for r in t.read_optimized().collect()] == [(1, "a")]
    assert [tuple(r) for r in t.read().collect()] == [(1, "b")]


def test_snapshot_resolution_is_logarithmic(spark, wh, monkeypatch):
    """Timestamp/watermark time travel binary-searches the snapshot range:
    with 1000 retained snapshots the resolver may open O(log n) snapshot
    files, never the full range (ref: SnapshotManager earlierOrEqual*)."""
    import json
    import os

    from paimon_spark.metadata import Snapshot, TablePaths
    from paimon_spark.table import Table
    from pyspark.sql import types as T

    sch = T.StructType([T.StructField("k", T.LongType())])
    t = Table.create(f"{wh}/logn", sch, spark=spark)
    t.append(spark.createDataFrame([(1,)], sch))
    base = t.paths.read_snapshot(1)
    # fabricate 999 more snapshots with monotone timestamps/watermarks
    # (metadata-only — they all reuse snapshot 1's manifests)
    for sid in range(2, 1001):
        s = Snapshot(**{**base.__dict__, "id": sid,
                        "timestamp_ms": base.timestamp_ms + sid * 1000,
                        "watermark": sid * 10})
        with open(t.paths.snapshot_file(sid), "w") as f:
            f.write(s.to_json())
    t.paths.write_latest_hint(1000)

    opens = {"n": 0}
    real = TablePaths.read_snapshot

    def counting(self, sid):
        opens["n"] += 1
        return real(self, sid)

    monkeypatch.setattr(TablePaths, "read_snapshot", counting)

    opens["n"] = 0
    s = t.paths.snapshot_earlier_or_equal_ts(base.timestamp_ms + 500 * 1000)
    assert s.id == 500
    assert opens["n"] <= 14          # ~log2(1000) + slack

    opens["n"] = 0
    s = t.paths.snapshot_for_watermark(7770)
    assert s.id == 777
    assert opens["n"] <= 14

    opens["n"] = 0
    s = t.paths.snapshot_later_or_equal_ts(base.timestamp_ms + 999 * 1000 + 1)
    assert s.id == 1000
    assert opens["n"] <= 15


def test_rollback_purges_stats_of_dropped_snapshots(spark, wh):
    """ANALYZE stats are snapshot-keyed; rollback must drop the stats
    of removed snapshots so a re-committed (id-reused) snapshot never
    inherits the rolled-back one's row in $statistics."""
    from pyspark.sql import types as T

    from paimon_spark import Table
    sch = T.StructType([T.StructField("k", T.LongType()),
                        T.StructField("v", T.StringType())])
    t = Table.create(f"{wh}/strb", sch, spark=spark)
    t.append(spark.createDataFrame([(1, "a")], sch))
    t.analyze()
    t.append(spark.createDataFrame([(2, "b"), (3, "c")], sch))
    t.analyze()
    assert {r.snapshot_id for r in t.statistics_df().collect()} == {1, 2}
    t.rollback_to(1)
    assert {r.snapshot_id for r in t.statistics_df().collect()} == {1}
    # re-commit re-uses id 2; fresh ANALYZE describes the NEW snapshot
    t.append(spark.createDataFrame([(9, "z")], sch))
    t.analyze()
    rows = {r.snapshot_id: r.row_count for r in t.statistics_df().collect()}
    assert rows == {1: 1, 2: 2}, rows
