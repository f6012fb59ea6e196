"""Append-table path: write/read, pruning, overwrite, row-level ops,
metadata-only aggregates, schema evolution read, compaction."""

import datetime as dt

from pyspark.sql import functions as F, types as T

from paimon_spark import P, Table


def test_roundtrip_and_pruning(spark, wh, lineitem):
    t = Table.create(f"{wh}/li", lineitem.schema,
                     partition_keys=["l_returnflag"], spark=spark)
    t.append(lineitem)
    assert t.read().count() == lineitem.count()

    # partition pruning
    plan = t.new_scan().plan(P.eq("l_returnflag", "A"))
    assert plan.files_skipped >= 2
    got = t.read(P.eq("l_returnflag", "A")).count()
    exp = lineitem.filter(F.col("l_returnflag") == "A").count()
    assert got == exp

    # stats pruning on non-partition column
    plan = t.new_scan().plan(P.gt("l_shipdate", dt.datetime(2030, 1, 1)))
    assert len(plan.entries) == 0


def test_metadata_aggregates(spark, wh, lineitem):
    t = Table.create(f"{wh}/li", lineitem.schema,
                     partition_keys=["l_returnflag"], spark=spark)
    t.append(lineitem)
    sc = t.new_scan()
    assert sc.metadata_count() == lineitem.count()
    assert sc.metadata_count(P.eq("l_returnflag", "N")) == \
        lineitem.filter(F.col("l_returnflag") == "N").count()
    mn, mx = sc.metadata_min_max("l_quantity")
    row = lineitem.agg(F.min("l_quantity"), F.max("l_quantity")).collect()[0]
    assert (mn, mx) == (row[0], row[1])


def test_overwrite_and_truncate(spark, wh):
    schema = T.StructType([T.StructField("p", T.StringType()),
                           T.StructField("v", T.LongType())])
    t = Table.create(f"{wh}/t", schema, partition_keys=["p"], spark=spark)
    t.append(spark.createDataFrame([("a", 1), ("b", 2)], schema))
    t.overwrite(spark.createDataFrame([("a", 10)], schema))  # dynamic
    assert sorted(tuple(r) for r in t.read().collect()) == [("a", 10), ("b", 2)]
    t.overwrite(spark.createDataFrame([("c", 3)], schema), dynamic=False)
    assert sorted(tuple(r) for r in t.read().collect()) == [("c", 3)]
    t.truncate()
    assert t.read().count() == 0


def test_delete_metadata_only_vs_cow(spark, wh):
    schema = T.StructType([T.StructField("p", T.StringType()),
                           T.StructField("v", T.LongType())])
    t = Table.create(f"{wh}/t", schema, partition_keys=["p"], spark=spark)
    t.append(spark.createDataFrame([("a", i) for i in range(10)]
                                   + [("b", i) for i in range(10)], schema))
    # partition-aligned → metadata-only (no new data files)
    files_before = {e.file_path for e in t.new_scan().plan().entries}
    t.delete_where(P.eq("p", "a"))
    files_after = {e.file_path for e in t.new_scan().plan().entries}
    assert files_after < files_before
    assert t.read().count() == 10
    # non-aligned → copy-on-write rewrite
    t.delete_where(P.lt("v", 5))
    assert sorted(r["v"] for r in t.read().collect()) == [5, 6, 7, 8, 9]


def test_update_append_table(spark, wh):
    schema = T.StructType([T.StructField("k", T.LongType()),
                           T.StructField("v", T.LongType())])
    t = Table.create(f"{wh}/t", schema, spark=spark)
    t.append(spark.createDataFrame([(1, 10), (2, 20), (3, 30)], schema))
    t.update_where(P.ge("k", 2), {"v": F.col("v") + 1})
    assert sorted(tuple(r) for r in t.read().collect()) == [(1, 10), (2, 21), (3, 31)]


def test_append_compaction_binpack(spark, wh):
    schema = T.StructType([T.StructField("v", T.LongType())])
    t = Table.create(f"{wh}/t", schema, spark=spark)
    for i in range(4):
        t.append(spark.createDataFrame([(i,)], schema))
    assert len(t.new_scan().plan().entries) >= 4
    t.compact()
    assert len(t.new_scan().plan().entries) < 4
    assert sorted(r["v"] for r in t.read().collect()) == [0, 1, 2, 3]


def test_schema_evolution_read(spark, wh):
    schema = T.StructType([T.StructField("c1", T.IntegerType()),
                           T.StructField("c2", T.StringType())])
    t = Table.create(f"{wh}/t", schema, spark=spark)
    t.append(spark.createDataFrame([(1, "x")], schema))
    t.alter(lambda s: s.add_column("c3", T.DoubleType()))
    t.append(spark.createDataFrame([(2, "y", 2.5)], t.schema.struct))
    rows = sorted(tuple(r) for r in t.read().collect())
    assert rows == [(1, "x", None), (2, "y", 2.5)]


def test_snapshots_and_system_tables(spark, wh):
    schema = T.StructType([T.StructField("v", T.LongType())])
    t = Table.create(f"{wh}/t", schema, spark=spark)
    t.append(spark.createDataFrame([(1,)], schema))
    t.append(spark.createDataFrame([(2,)], schema))
    snaps = t.snapshots_df().collect()
    assert [s["snapshot_id"] for s in snaps] == [1, 2]
    assert snaps[-1]["total_record_count"] == 2
    assert t.files_df().count() == 2


def test_threaded_commit_race(spark, wh):
    """Six writers stage and commit simultaneously: the put-if-absent
    protocol must serialize them into distinct snapshots with no lost
    entries (ref: FileStoreCommitImpl optimistic retry)."""
    import threading
    from pyspark.sql import types as T
    schema = T.StructType([T.StructField("k", T.LongType())])
    t = Table.create(f"{wh}/race", schema, spark=spark)
    snaps, errs = [], []

    def work(i):
        try:
            w = t.writer()
            entries = w.stage(spark.createDataFrame([(i,)], schema))
            snaps.append(w.commit(entries))
        except Exception as ex:     # pragma: no cover
            errs.append(ex)

    threads = [threading.Thread(target=work, args=(i,)) for i in range(6)]
    for th in threads:
        th.start()
    for th in threads:
        th.join()
    assert not errs
    assert sorted(s.id for s in snaps) == [1, 2, 3, 4, 5, 6]
    assert sorted(r.k for r in t.read().collect()) == [0, 1, 2, 3, 4, 5]


def test_distributed_file_adoption(spark, wh):
    """Commits past commit.distributed-adopt-threshold files run rename +
    footer-stat mining as one Spark job (metadata-only collect) instead of
    a driver-serial loop — stats and reads must be identical."""
    from pyspark.sql import functions as F, types as T
    sch = T.StructType([T.StructField("p", T.StringType()),
                        T.StructField("k", T.LongType())])
    t = Table.create(f"{wh}/da", sch, partition_keys=["p"],
                     options={"commit.distributed-adopt-threshold": "1"},
                     spark=spark)
    df = spark.range(500).select((F.col("id") % 4).cast("string").alias("p"),
                                 F.col("id").alias("k"))
    t.append(df.repartition(6))
    assert t.read().count() == 500
    plan = t.new_scan().plan()
    assert len(plan.entries) >= 4
    assert min(e.stats["k"]["min"] for e in plan.entries) == 0
    assert max(e.stats["k"]["max"] for e in plan.entries) == 499
    # bloom sidecars are built executor-side too
    t2 = Table.create(f"{wh}/da_idx", sch, partition_keys=["p"],
                      options={"commit.distributed-adopt-threshold": "1",
                               "file-index.bloom-filter.columns": "k"},
                      spark=spark)
    t2.append(df.repartition(6))
    assert all(e.index_path for e in t2.new_scan().plan().entries)


def test_merge_into_append_table(spark, wh):
    """COW MERGE INTO on a non-PK table: update + delete + insert, with
    untouched files left physically intact
    (ref: MergeIntoPaimonTable.scala non-PK touched-file rewrite)."""
    from pyspark.sql import functions as F, types as T
    sch = T.StructType([T.StructField("k", T.LongType()),
                        T.StructField("v", T.StringType()),
                        T.StructField("amt", T.DoubleType())])
    t = Table.create(f"{wh}/ma", sch, spark=spark)
    t.append(spark.createDataFrame([(1, "a", 1.0), (2, "b", 2.0)], sch))
    t.append(spark.createDataFrame([(3, "c", 3.0), (4, "d", 4.0)], sch))
    before = {e.file_path for e in t.new_scan().plan().entries}

    src = spark.createDataFrame([(2, "B", 20.0), (9, "i", 9.0)], sch)
    t.merge_into(src, on=["k"], matched_update="all")
    got = {r.k: (r.v, r.amt) for r in t.read().collect()}
    assert got == {1: ("a", 1.0), 2: ("B", 20.0), 3: ("c", 3.0),
                   4: ("d", 4.0), 9: ("i", 9.0)}
    after = {e.file_path for e in t.new_scan().plan().entries}
    # the (3,4) file was untouched: still present under its old name
    assert any(p in after for p in before)

    # matched_delete + expression update on a fresh table
    t2 = Table.create(f"{wh}/ma2", sch, spark=spark)
    t2.append(spark.createDataFrame(
        [(1, "a", 1.0), (2, "b", 2.0), (3, "c", 3.0)], sch))
    t2.merge_into(spark.createDataFrame([(2, "x", 0.0)], sch), on=["k"],
                  matched_delete=True, not_matched_insert=False)
    assert sorted(r.k for r in t2.read().collect()) == [1, 3]
    t2.merge_into(spark.createDataFrame([(1, "z", 100.0)], sch), on=["k"],
                  matched_update={"amt": F.col("s.amt") + F.col("t.amt")},
                  not_matched_insert=False)
    assert t2.read().filter("k = 1").collect()[0].amt == 101.0


def test_incremental_over_expired_bound_clear_error(spark, wh):
    from pyspark.sql import types as T
    import pytest
    t = Table.create(f"{wh}/exp",
                     T.StructType([T.StructField("k", T.LongType())]),
                     spark=spark)
    for i in range(5):
        t.append(spark.createDataFrame([(i,)], t.schema.struct))
    t.expire_snapshots(retain_last=2)
    with pytest.raises(ValueError, match="expired"):
        t.read_incremental(1, 5)
    assert t.read_incremental(4, 5).count() == 1   # retained range works


def test_unknown_column_raises_or_merges_schema(spark, wh):
    """A write with columns the table doesn't declare must not silently
    drop them: raise by default, evolve with write.merge-schema=true
    (ref: paimon spark write merge-schema option)."""
    import pytest as _p
    from pyspark.sql import types as T
    sch = T.StructType([T.StructField("k", T.LongType()),
                        T.StructField("v", T.StringType())])
    t = Table.create(f"{wh}/ms", sch, spark=spark)
    t.append(spark.createDataFrame([(1, "a")], sch))
    wide = spark.createDataFrame([(2, "b", 9.5)],
                                 "k long, v string, score double")
    with _p.raises(ValueError, match="merge-schema"):
        t.append(wide)
    t2 = Table.create(f"{wh}/ms2", sch,
                      options={"write.merge-schema": "true"}, spark=spark)
    t2.append(spark.createDataFrame([(1, "a")], sch))
    t2.append(wide)
    got = {r.k: (r.v, r.score) for r in t2.read().collect()}
    assert got == {1: ("a", None), 2: ("b", 9.5)}
    assert "score" in Table.load(t2.path, spark).schema.field_names


def test_merge_schema_widens_types(spark, wh):
    """merge-schema also WIDENS declared types toward the input (int→
    long etc.) instead of narrowing-casting new data to null; old files
    keep their schema id and read through evolution."""
    from pyspark.sql import types as T
    sch = T.StructType([T.StructField("k", T.IntegerType()),
                        T.StructField("v", T.StringType())])
    t = Table.create(f"{wh}/mw", sch,
                     options={"write.merge-schema": "true"}, spark=spark)
    t.append(spark.createDataFrame([(1, "a")], sch))
    t.append(spark.createDataFrame([(2**40, "b")], "k long, v string"))
    t = Table.load(t.path, spark)
    assert isinstance(t.schema.struct["k"].dataType, T.LongType)
    got = sorted((r.k, r.v) for r in t.read().collect())
    assert got == [(1, "a"), (2**40, "b")]


def test_write_time_clustering(spark, wh):
    """clustering.columns on append tables (ref: CoreOptions
    CLUSTERING_COLUMNS + PaimonSparkWriter clustering): writes range-
    partition + sort so per-file stats become disjoint and predicates
    skip files at plan time."""
    import random
    rng = random.Random(7)
    rows = [(rng.randrange(10000), rng.randrange(10000), i)
            for i in range(20000)]
    df = spark.createDataFrame(rows, "x int, y int, payload long")

    # single column → auto picks total order → disjoint file ranges
    t = Table.create(f"{wh}/clus1", df.schema,
                     options={"clustering.columns": "x"}, spark=spark)
    t.append(df.repartition(8))
    plan = t.new_scan().plan()
    spans = sorted((e.stats["x"]["min"], e.stats["x"]["max"])
                   for e in plan.entries)
    assert len(spans) > 1
    for (a_lo, a_hi), (b_lo, b_hi) in zip(spans, spans[1:]):
        assert a_hi <= b_lo            # non-overlapping
    skipped = t.new_scan().plan(P.eq("x", 5)).files_skipped
    assert skipped >= len(spans) - 1

    # two columns → auto picks zorder → an eq predicate on either
    # column prunes a majority of files
    t2 = Table.create(f"{wh}/clus2", df.schema,
                      options={"clustering.columns": "x,y"}, spark=spark)
    t2.append(df.repartition(8))
    total = len(t2.new_scan().plan().entries)
    assert total > 2
    for col in ("x", "y"):
        hit = len(t2.new_scan().plan(P.eq(col, 5)).entries)
        assert hit < total, f"no pruning on {col}"
    assert t2.read().count() == 20000


def test_incremental_cluster_compaction(spark, wh):
    """Compaction on a clustered table merges ONLY overlapping sorted
    runs — disjoint (already clustered) files are untouched (ref:
    clustering.incremental; a full re-sort at 100 TB is a once-job,
    not a maintenance cycle)."""
    import random
    rng = random.Random(3)
    t = Table.create(f"{wh}/iclus", spark.createDataFrame(
        [], "x int, payload long").schema,
        options={"clustering.columns": "x",
                 "clustering.partitions": "4"}, spark=spark)
    # two appends: each internally clustered, ranges overlap ACROSS them
    for _ in range(2):
        t.append(spark.createDataFrame(
            [(rng.randrange(1000), i) for i in range(4000)],
            "x int, payload long"))
    before = {e.file_path for e in t.new_scan().plan().entries}
    t.compact(full=True)
    plan = t.new_scan().plan()
    spans = sorted((e.stats["x"]["min"], e.stats["x"]["max"])
                   for e in plan.entries)
    for (a_lo, a_hi), (b_lo, b_hi) in zip(spans, spans[1:]):
        assert a_hi <= b_lo          # fully clustered again
    assert t.read().count() == 8000
    # now append ONE small run and compact again: only the overlap
    # rewrites — files outside the new run's range survive untouched
    t.append(spark.createDataFrame([(5, 0), (6, 1)], "x int, payload long"))
    keep_before = {e.file_path for e in t.new_scan().plan().entries
                   if e.stats["x"]["min"] > 300}
    t.compact(full=True)
    after = {e.file_path for e in t.new_scan().plan().entries}
    assert keep_before <= after      # disjoint files not rewritten
    assert t.read().count() == 8002


def test_bucketed_append_table(spark, wh):
    """bucket + bucket-key on an APPEND table (ref: CoreOptions
    bucket-key, BucketedAppend*): rows route by murmur3(bucket-key),
    reads expose the bucketing (exchange-free groupBy / co-located
    join), point lookups prune to one bucket, and compaction re-derives
    buckets so the layout survives bin-packing."""
    sch = T.StructType([T.StructField("k", T.LongType()),
                        T.StructField("v", T.DoubleType())])
    t = Table.create(f"{wh}/bapp", sch,
                     options={"bucket": "4", "bucket-key": "k"},
                     spark=spark)
    assert t.schema.bucket_hash == "murmur3"
    t.append(spark.createDataFrame(
        [(i % 50, float(i)) for i in range(400)], sch))
    t.append(spark.createDataFrame(
        [(i % 50, float(i)) for i in range(200)], sch))
    df = t.read()
    assert df.count() == 600                     # duplicates kept
    total = sum(float(i) for i in range(400)) + sum(float(i)
                                                    for i in range(200))
    assert df.agg(F.sum("v")).collect()[0][0] == total
    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        g = df.groupBy("k").agg(F.sum("v"))
        p = g._jdf.queryExecution().executedPlan().toString()
        assert "Bucketed: true" in p and "Exchange" not in p
        # co-located join against a PK dim bucketed the same way
        dim = Table.create(f"{wh}/bapp_dim", sch, primary_keys=["k"],
                           options={"bucket": "4"}, spark=spark)
        dim.append(spark.createDataFrame([(i, float(i))
                                          for i in range(50)], sch))
        dim.compact()
        j = df.join(dim.read().withColumnRenamed("v", "dv"), "k")
        pj = j._jdf.queryExecution().executedPlan().toString()
        assert pj.count("Bucketed: true") == 2
        assert "Exchange hashpartitioning" not in pj
        assert j.count() == 600
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)
    # point lookup prunes to one bucket
    plan = t.new_scan().plan(P.eq("k", 7))
    assert len({e.bucket for e in plan.entries}) == 1
    # compaction preserves totals and the bucketed layout
    t.compact()
    df2 = t.read()
    assert df2.count() == 600
    assert df2.agg(F.sum("v")).collect()[0][0] == total
    assert all(e.bucket >= 0 for e in t.new_scan().plan().entries)
