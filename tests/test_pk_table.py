"""Primary-key table: LSM semantics, merge-on-read, row-level ops,
compaction, time travel, incremental reads."""

import pytest
from pyspark.sql import functions as F, types as T

from paimon_spark import P, Table

KV = T.StructType([T.StructField("k", T.LongType()),
                   T.StructField("name", T.StringType()),
                   T.StructField("v", T.LongType())])


def _kv(spark, wh, **opts):
    options = {"bucket": "4"}
    options.update({k.replace("_", "-"): v for k, v in opts.items()})
    return Table.create(f"{wh}/kv", KV, primary_keys=["k"],
                        options=options, spark=spark)


def rows(t, **kw):
    return sorted(tuple(r) for r in t.read(**kw).collect())


def test_upsert_last_wins(spark, wh):
    t = _kv(spark, wh)
    t.append(spark.createDataFrame([(1, "a", 1), (2, "b", 2)], KV))
    t.append(spark.createDataFrame([(1, "a2", 11), (3, "c", 3)], KV))
    t.append(spark.createDataFrame([(1, "a3", 111)], KV))
    assert rows(t) == [(1, "a3", 111), (2, "b", 2), (3, "c", 3)]


def test_sequence_field_out_of_order(spark, wh):
    t = _kv(spark, wh, **{"sequence.field": "v"})
    t.append(spark.createDataFrame([(1, "new", 100)], KV))
    t.append(spark.createDataFrame([(1, "stale", 50)], KV))  # lower seq → loses
    assert rows(t) == [(1, "new", 100)]


def test_delete_and_update(spark, wh):
    t = _kv(spark, wh)
    t.append(spark.createDataFrame([(i, f"n{i}", i * 10) for i in range(10)], KV))
    t.delete_where(P.lt("k", 3))
    assert [r[0] for r in rows(t)] == list(range(3, 10))
    t.update_where(P.eq("k", 5), {"v": 999})
    assert (5, "n5", 999) in rows(t)


def test_merge_into_all_actions(spark, wh):
    t = _kv(spark, wh)
    t.append(spark.createDataFrame([(1, "a", 1), (2, "b", 2), (3, "c", 3)], KV))
    src = spark.createDataFrame([(2, "B", 20), (4, "d", 4)], KV)
    t.merge_into(src, ["k"], matched_update="all", not_matched_insert=True)
    assert rows(t) == [(1, "a", 1), (2, "B", 20), (3, "c", 3), (4, "d", 4)]
    # matched_delete
    t.merge_into(spark.createDataFrame([(1, "", 0)], KV), ["k"],
                 matched_delete=True, not_matched_insert=False)
    assert [r[0] for r in rows(t)] == [2, 3, 4]


def test_compaction_and_raw_convertible(spark, wh):
    t = _kv(spark, wh)
    for i in range(3):
        t.append(spark.createDataFrame([(j, f"v{i}", i) for j in range(8)], KV))
    before = rows(t)
    plan = t.new_scan().plan()
    assert plan.merge_groups  # multi-run buckets need merge
    t.compact()
    plan = t.new_scan().plan()
    assert not plan.merge_groups  # all buckets single-run now
    assert rows(t) == before
    # further upserts after compaction still merge correctly
    t.append(spark.createDataFrame([(0, "post", 99)], KV))
    assert (0, "post", 99) in rows(t)


def test_time_travel_and_tags(spark, wh):
    t = _kv(spark, wh)
    t.append(spark.createDataFrame([(1, "v1", 1)], KV))
    t.append(spark.createDataFrame([(1, "v2", 2)], KV))
    t.create_tag("first", 1)
    assert rows(t, snapshot_id=1) == [(1, "v1", 1)]
    assert rows(t, tag="first") == [(1, "v1", 1)]
    assert rows(t) == [(1, "v2", 2)]
    t.rollback_to(1)
    assert rows(t) == [(1, "v1", 1)]


def test_as_of_timestamp(spark, wh):
    t = _kv(spark, wh)
    t.append(spark.createDataFrame([(1, "v1", 1)], KV))
    s1 = t.paths.latest_snapshot()
    t.append(spark.createDataFrame([(1, "v2", 2)], KV))
    assert rows(t, as_of_timestamp_ms=s1.timestamp_ms) == [(1, "v1", 1)]


def test_incremental_and_audit(spark, wh):
    t = _kv(spark, wh)
    t.append(spark.createDataFrame([(1, "a", 1), (2, "b", 2)], KV))
    t.append(spark.createDataFrame([(1, "a2", 11)], KV))
    inc = t.read_incremental(1, 2).collect()
    assert len(inc) == 1 and inc[0]["k"] == 1 and inc[0]["_row_kind"] == "+I"
    t.delete_where(P.eq("k", 2))
    kinds = dict(t.read_audit_log().groupBy("rowkind").count().collect())
    assert kinds == {"+I": 3, "-D": 1}


def test_expire_and_orphan_gc(spark, wh):
    t = _kv(spark, wh)
    for i in range(4):
        t.append(spark.createDataFrame([(1, f"v{i}", i)], KV))
    t.compact()
    removed = t.expire_snapshots(retain_last=1)
    assert removed >= 3
    orphans = t.remove_orphan_files()
    assert orphans >= 1
    assert rows(t) == [(1, "v3", 3)]
    with pytest.raises(FileNotFoundError):
        t.read(snapshot_id=1).collect()


def test_point_lookup_bucket_pruning(spark, wh):
    t = _kv(spark, wh)
    t.append(spark.createDataFrame([(i, f"n{i}", i) for i in range(100)], KV))
    full = t.new_scan().plan()
    point = t.new_scan().plan(P.eq("k", 42))
    assert len(point.entries) < len(full.entries)
    assert rows(t, predicate=P.eq("k", 42)) == [(42, "n42", 42)]


def test_partitioned_pk_table(spark, wh):
    schema = T.StructType([T.StructField("dt", T.StringType()),
                           T.StructField("k", T.LongType()),
                           T.StructField("v", T.LongType())])
    t = Table.create(f"{wh}/pkp", schema, partition_keys=["dt"],
                     primary_keys=["dt", "k"], options={"bucket": "2"}, spark=spark)
    t.append(spark.createDataFrame([("d1", 1, 1), ("d2", 1, 2)], schema))
    t.append(spark.createDataFrame([("d1", 1, 10)], schema))
    got = sorted(tuple(r) for r in t.read().collect())
    assert got == [("d1", 1, 10), ("d2", 1, 2)]
    plan = t.new_scan().plan(P.eq("dt", "d1"))
    assert all(e.partition["dt"] == "d1" for e in plan.entries)


def test_concurrent_commit_conflict(spark, wh):
    t = _kv(spark, wh)
    t.append(spark.createDataFrame([(1, "a", 1)], KV))
    w1, w2 = t.writer(), t.writer()
    e1 = w1.stage(spark.createDataFrame([(2, "b", 2)], KV))
    e2 = w2.stage(spark.createDataFrame([(3, "c", 3)], KV))
    s1 = w1.commit(e1)
    s2 = w2.commit(e2)
    assert {s1.id, s2.id} == {2, 3}
    assert len(rows(t)) == 3


def test_postpone_table_bucket_minus_2(spark, wh):
    from pyspark.sql import types as T
    schema = T.StructType([T.StructField("k", T.LongType()),
                           T.StructField("v", T.StringType())])
    t = Table.create(f"{wh}/postpone", schema, primary_keys=["k"],
                     options={"bucket": "-2",
                              "postpone.default-bucket-num": "4"},
                     spark=spark)
    t.append(spark.createDataFrame([(1, "a"), (2, "b")], schema))
    t.append(spark.createDataFrame([(1, "a2")], schema))
    # postpone writes are invisible until compaction assigns buckets
    assert t.read().count() == 0
    t.compact()
    got = {(r.k, r.v) for r in t.read().collect()}
    assert got == {(1, "a2"), (2, "b")}
    buckets = {e.bucket for e in t.paths.live_entries(t.paths.latest_snapshot())}
    assert -2 not in buckets and buckets <= set(range(4))
    # new writes land postponed again; merge picks them up on next compact
    t.append(spark.createDataFrame([(2, "b2"), (3, "c")], schema))
    assert {(r.k, r.v) for r in t.read().collect()} == {(1, "a2"), (2, "b")}
    t.compact()
    assert {(r.k, r.v) for r in t.read().collect()} == \
        {(1, "a2"), (2, "b2"), (3, "c")}


def test_value_predicate_cannot_resurrect_stale_version(spark, wh):
    """Soundness (found in r4): min/max stats or file indexes on a VALUE
    column must never skip the newest version of a key while an older
    file still matches — per-file skipping is restricted to
    key/partition conjuncts; value conjuncts prune whole merge groups
    (ref: KeyValueFileStoreScan key/value filter split)."""
    sch = T.StructType([T.StructField("k", T.LongType()),
                        T.StructField("status", T.StringType())])
    t = Table.create(f"{wh}/vp", sch, primary_keys=["k"],
                     options={"bucket": "1"}, spark=spark)
    t.append(spark.createDataFrame(
        [(i, "active") for i in range(100)], sch))
    # newer file flips half the keys to 'deleted' — its stats ("deleted")
    # don't overlap the predicate literal ("active")
    t.append(spark.createDataFrame(
        [(i, "archived") for i in range(50)], sch))
    got = {r.k for r in t.read(P.eq("status", "active")).collect()}
    assert got == set(range(50, 100)), \
        "stale 'active' versions resurrected by value-column skipping"
    # key-column predicates still skip files
    plan = t.new_scan().plan(P.eq("k", 5))
    assert {r.k for r in t.read(P.eq("k", 5)).collect()} == {5}


def test_value_predicate_group_skip_still_prunes(spark, wh):
    """The group-level value skip still prunes: a bucket whose every
    file fails the predicate drops out of the plan."""
    sch = T.StructType([T.StructField("k", T.LongType()),
                        T.StructField("status", T.StringType())])
    t = Table.create(f"{wh}/vp2", sch, primary_keys=["k"],
                     options={"bucket": "4"}, spark=spark)
    t.append(spark.createDataFrame(
        [(i, "odd" if i % 2 else "even") for i in range(4000)], sch))
    t.compact()
    plan_all = t.new_scan().plan()
    plan = t.new_scan().plan(P.eq("status", "zzz"))
    assert len(plan.entries) < len(plan_all.entries)
    assert t.read(P.eq("status", "zzz")).count() == 0


def test_read_cache_freshness_and_rollback_guard(spark, wh):
    """Warm read cache: repeat reads of the same snapshot reuse the
    plan; a new commit is visible immediately; rollback's snapshot-id
    REUSE must not serve the stale cached plan (timestamp in the key)."""
    from pyspark.sql import types as T
    sch = T.StructType([T.StructField("id", T.IntegerType()),
                        T.StructField("s", T.StringType())])
    t = Table.create(f"{wh}/rc", sch, primary_keys=["id"],
                     options={"bucket": "2"}, spark=spark)
    t.append(spark.createDataFrame([(1, "old"), (2, "x")], sch))
    df1 = t.read(P.eq("id", 1))
    assert t.read(P.eq("id", 1)) is df1          # cache hit, same object
    t.append(spark.createDataFrame([(1, "new")], sch))
    assert {r.s for r in t.read(P.eq("id", 1)).collect()} == {"new"}
    # time travel gets its own cache cell
    assert {r.s for r in t.read(P.eq("id", 1),
                                snapshot_id=1).collect()} == {"old"}
    # rollback then recommit reuses snapshot id 2 with NEW content
    t.read()                                      # warm at snapshot 2
    t.rollback_to(1)
    t.append(spark.createDataFrame([(9, "z")], sch))
    got = {r.id: r.s for r in t.read().collect()}
    assert got == {1: "old", 2: "x", 9: "z"}


def test_bucketed_merge_read_no_exchange(spark, wh):
    """Merge-on-read over an un-compacted PK table must NOT shuffle: the
    snapshot-scoped bucketed view exposes the files' murmur3 bucketing
    to Catalyst (Bucketed: true) so the merge groupBy/window runs on the
    scan's own HashPartitioning — the pure-Python analog of the
    reference reporting KeyGroupedPartitioning
    (ref: PaimonScan.scala:52,115-117)."""
    sch = T.StructType([T.StructField("k", T.LongType()),
                        T.StructField("v", T.StringType())])
    t = Table.create(f"{wh}/bktm", sch, primary_keys=["k"],
                     options={"bucket": "4"}, spark=spark)
    assert t.schema.bucket_hash == "murmur3"     # new-table default
    t.append(spark.createDataFrame([(i, f"a{i}") for i in range(300)], sch))
    t.append(spark.createDataFrame([(i, f"b{i}") for i in range(150)], sch))
    df = t.read()
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "Bucketed: true" in plan
    assert "Exchange" not in plan
    got = {r.k: r.v for r in df.collect()}
    assert len(got) == 300 and got[0] == "b0" and got[200] == "a200"
    # partitioned: partition dirs recovered, still exchange-free
    sch2 = T.StructType([T.StructField("pt", T.StringType()),
                         T.StructField("k", T.LongType()),
                         T.StructField("v", T.StringType())])
    t2 = Table.create(f"{wh}/bktm2", sch2, primary_keys=["pt", "k"],
                      partition_keys=["pt"], options={"bucket": "2"},
                      spark=spark)
    t2.append(spark.createDataFrame(
        [("x" if i % 2 else "y", i, f"a{i}") for i in range(100)], sch2))
    t2.append(spark.createDataFrame(
        [("x" if i % 2 else "y", i, f"b{i}") for i in range(40)], sch2))
    df2 = t2.read()
    p2 = df2._jdf.queryExecution().executedPlan().toString()
    assert "Bucketed: true" in p2 and "Exchange" not in p2
    got2 = {r.k: r.v for r in df2.collect()}
    assert len(got2) == 100 and got2[0] == "b0" and got2[77] == "a77"


def test_legacy_xxhash64_bucket_tables_still_work(spark, wh):
    """bucket.hash-function=xxhash64 (pre-r7 layout) keeps the plain
    merge path: reads are correct and point-lookup bucket pruning uses
    the right hash; the bucketed-view fast path simply doesn't engage."""
    sch = T.StructType([T.StructField("k", T.LongType()),
                        T.StructField("v", T.StringType())])
    t = Table.create(f"{wh}/bktleg", sch, primary_keys=["k"],
                     options={"bucket": "4",
                              "bucket.hash-function": "xxhash64"},
                     spark=spark)
    assert t.schema.bucket_hash == "xxhash64"
    t.append(spark.createDataFrame([(i, f"a{i}") for i in range(100)], sch))
    t.append(spark.createDataFrame([(0, "b0"), (7, "b7")], sch))
    got = {r.k: r.v for r in t.read().collect()}
    assert len(got) == 100 and got[0] == "b0" and got[7] == "b7" \
        and got[50] == "a50"
    # point lookup prunes to one bucket under the legacy hash too
    plan = t.new_scan().plan(P.eq("k", 7))
    buckets = {e.bucket for e in plan.entries}
    assert len(buckets) == 1
    assert {r.v for r in t.read(P.eq("k", 7)).collect()} == {"b7"}


def test_view_cache_gc_and_rebuild(spark, wh):
    """remove_orphan_files purges .bucketed-view hardlink caches WHOLE
    (file-by-file pruning would leave a partial view that silently
    drops rows); the next read rebuilds an identical view at the
    identical path and refreshes Spark's cached file listing."""
    import os
    sch = T.StructType([T.StructField("k", T.LongType()),
                        T.StructField("v", T.StringType())])
    t = Table.create(f"{wh}/gcv", sch, primary_keys=["k"],
                     options={"bucket": "2"}, spark=spark)
    t.append(spark.createDataFrame([(i, f"a{i}") for i in range(50)], sch))
    t.append(spark.createDataFrame([(0, "b0")], sch))
    assert t.read().count() == 50               # builds the view
    assert os.listdir(f"{wh}/gcv/.bucketed-view")
    t.remove_orphan_files()
    assert not os.listdir(f"{wh}/gcv/.bucketed-view")
    got = {r.k: r.v for r in t.read().collect()}  # rebuild, still merged
    assert len(got) == 50 and got[0] == "b0"


def test_colocated_join_no_exchange(spark, wh):
    """Two tables bucketed on the join key (same murmur3 hash, same n)
    join with ZERO exchange once compacted — the raw-convertible read
    also rides the bucketed view, so Catalyst sees matching
    HashPartitioning on both sides (the reference's bucketed-scan
    co-location, DisableUnnecessaryPaimonBucketedScanSuite)."""
    ksch = T.StructType([T.StructField("k", T.LongType()),
                         T.StructField("v", T.StringType())])
    osch = T.StructType([T.StructField("k", T.LongType()),
                         T.StructField("amt", T.DoubleType())])
    t1 = Table.create(f"{wh}/codim", ksch, primary_keys=["k"],
                      options={"bucket": "4"}, spark=spark)
    t2 = Table.create(f"{wh}/cofact", osch, primary_keys=["k"],
                      options={"bucket": "4"}, spark=spark)
    t1.append(spark.createDataFrame([(i, f"v{i}") for i in range(300)],
                                    ksch))
    t1.compact()
    t2.append(spark.createDataFrame([(i, float(i)) for i in range(300)],
                                    osch))
    t2.compact()
    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        j = t1.read().join(t2.read(), "k")
        plan = j._jdf.queryExecution().executedPlan().toString()
        assert plan.count("Bucketed: true") == 2
        assert "Exchange" not in plan
        assert j.count() == 300
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)


def test_window_over_bucketed_append_no_exchange(spark, wh):
    """r13: an append table bucketed by a key serves a groupBy on a
    SUPERSET of that key AND a window partitioned by it with ZERO
    exchanges — HashPartitioning(user) satisfies clustering for both.
    Raw parquet pays two shuffles for the same query; this pins the
    engine's window advantage (bench `window` ratio)."""
    from pyspark.sql import Window
    sch = T.StructType([T.StructField("u", T.LongType()),
                        T.StructField("et", T.StringType())])
    t = Table.create(f"{wh}/evbk", sch,
                     options={"bucket": "4", "bucket-key": "u"},
                     spark=spark)
    rows = [(i % 37, f"e{(i * 7) % 5}") for i in range(1500)]
    t.append(spark.createDataFrame(rows, sch))
    counts = (t.read().groupBy("u", "et")
              .agg(F.count("*").alias("cnt")))
    w = Window.partitionBy("u").orderBy(F.desc("cnt"), F.asc("et"))
    q = (counts.withColumn("rnk", F.row_number().over(w))
         .filter(F.col("rnk") <= 2))
    plan = q._jdf.queryExecution().executedPlan().toString()
    assert "Bucketed: true" in plan
    assert "Exchange" not in plan, plan
    # and values match a plain-read computation
    counts2 = (spark.createDataFrame(rows, sch).groupBy("u", "et")
               .agg(F.count("*").alias("cnt")))
    q2 = (counts2.withColumn("rnk", F.row_number().over(w))
          .filter(F.col("rnk") <= 2))
    assert sorted(map(tuple, q.collect())) == \
        sorted(map(tuple, q2.collect()))


def test_rescale_keeps_fast_path_and_time_travel_safe(spark, wh):
    """rescale rewrites every bucket under the new count and bumps the
    schema id: post-rescale reads ride the bucketed view with the new
    spec, while time-travel reads of PRE-rescale snapshots must NOT
    claim the new bucket partitioning (schema-id guard) — a false
    HashPartitioning claim would silently mis-co-locate joins."""
    t = Table.create(f"{wh}/rsc",
                     T.StructType([T.StructField("k", T.LongType()),
                                   T.StructField("v", T.StringType())]),
                     primary_keys=["k"], options={"bucket": "2"},
                     spark=spark)
    t.append(spark.createDataFrame([(i, f"a{i}") for i in range(200)],
                                   t.schema.struct))
    t.append(spark.createDataFrame([(i, f"b{i}") for i in range(50)],
                                   t.schema.struct))
    t.rescale(8)
    t = Table.load(f"{wh}/rsc", spark=spark)
    assert t.schema.num_buckets == 8
    t.append(spark.createDataFrame([(0, "c0")], t.schema.struct))
    df = t.read()
    plan = df._jdf.queryExecution().executedPlan().toString()
    got = {r.k: r.v for r in df.collect()}
    assert "Bucketed: true" in plan and "Exchange" not in plan
    assert len(got) == 200 and got[0] == "c0" and got[49] == "b49" \
        and got[50] == "a50"
    # pre-rescale snapshot: plain path, correct rows
    old = t.read(snapshot_id=2)
    p2 = old._jdf.queryExecution().executedPlan().toString()
    assert "Bucketed: true" not in p2
    got2 = {r.k: r.v for r in old.collect()}
    assert len(got2) == 200 and got2[0] == "b0" and got2[50] == "a50"


def test_special_character_paths(spark, wh):
    """Table paths with spaces, %, #, + and non-ASCII work end-to-end
    (ref suite: SpecialCharacterPathTest — naive file-URI handling
    would eat '#' as a fragment and '%' as an escape)."""
    import os
    sch = T.StructType([T.StructField("k", T.LongType()),
                        T.StructField("v", T.StringType())])
    for nm in ["with space", "pct%25", "hash#tag", "plus+x", "uni_é"]:
        p = os.path.join(wh, nm, "t")
        t = Table.create(p, sch, primary_keys=["k"],
                         options={"bucket": "2"}, spark=spark)
        t.append(spark.createDataFrame([(1, "a"), (2, "b")], sch))
        t.append(spark.createDataFrame([(2, "B")], sch))
        assert {r.k: r.v for r in t.read().collect()} == {1: "a", 2: "B"}


def test_no_hardlink_fs_downgrades(spark, wh, monkeypatch):
    """Object-store simulation (os.link raises EPERM): the capability
    probe turns the zero-exchange fast paths off EXPLICITLY — merge
    reads fall back to the plain path (+1 Exchange, same rows),
    read_stream never builds a .stream-view dir (Python DataSource
    serves it), and create_stream_view raises with a pointer to the
    fallback. COVERAGE.md 'Object-store scale caveats'."""
    import errno
    import os
    from paimon_spark import fs as pfs

    sch = T.StructType([T.StructField("k", T.LongType()),
                        T.StructField("v", T.StringType())])
    t = Table.create(f"{wh}/nolink", sch, primary_keys=["k"],
                     options={"bucket": "4"}, spark=spark)
    t.append(spark.createDataFrame([(i, f"a{i}") for i in range(100)], sch))
    t.append(spark.createDataFrame([(i, f"b{i}") for i in range(50)], sch))

    def deny_link(src, dst, **kw):
        raise OSError(errno.EPERM, "hard links not supported", src)

    monkeypatch.setattr(os, "link", deny_link)
    pfs.reset_probe_cache()
    try:
        assert pfs.supports_hardlinks(t.path) is False
        df = t.read()
        plan = df._jdf.queryExecution().executedPlan().toString()
        assert "Bucketed: true" not in plan      # fast path off...
        got = {r.k: r.v for r in df.collect()}   # ...but rows correct
        assert len(got) == 100 and got[0] == "b0" and got[99] == "a99"
        # availableNow drain: Python DataSource path, no view dir built
        sdf = t.read_stream()
        assert sdf.isStreaming
        assert not os.path.isdir(os.path.join(t.path, ".stream-view"))
        with pytest.raises(ValueError, match="hard-link"):
            ta = Table.create(f"{wh}/nolink_app", sch, spark=spark)
            ta.create_stream_view()
    finally:
        monkeypatch.undo()                       # restore os.link
        pfs.reset_probe_cache()                  # same st_dev as other tmpdirs
    # links work again: a new snapshot (the no-link read is cached for
    # the old one) re-probes and re-engages the bucketed fast path
    t.append(spark.createDataFrame([(0, "c0")], sch))
    p2 = t.read()._jdf.queryExecution().executedPlan().toString()
    assert "Bucketed: true" in p2 and "Exchange" not in p2
