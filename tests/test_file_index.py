"""Standalone bloom file index: plan-time skipping beyond min/max stats.

(ref: paimon-common/.../fileindex/bloomfilter/BloomFilterFileIndex.java;
 option file-index.bloom-filter.columns)
"""

import pytest
from pyspark.sql import types as T

from paimon_spark import P, Table
from paimon_spark.fileindex import BloomFilter

SCHEMA = T.StructType([T.StructField("k", T.LongType()),
                       T.StructField("s", T.StringType())])


def test_bloom_unit_no_false_negatives():
    vals = [f"key-{i}" for i in range(0, 1000, 2)]
    bf = BloomFilter.build(vals, fpp=0.01)
    assert all(bf.may_contain(v) for v in vals)
    absent = [f"key-{i}" for i in range(1, 1000, 2)]
    fp = sum(bf.may_contain(v) for v in absent) / len(absent)
    assert fp < 0.05
    rt = BloomFilter.from_json(bf.to_json())
    assert all(rt.may_contain(v) for v in vals)


def test_bloom_int_float_equivalence():
    bf = BloomFilter.build([1, 2, 3])
    assert bf.may_contain(2.0)       # literal 2.0 must find int-written 2


def _interleaved(spark, wh):
    """Two files whose [min,max] k-ranges fully overlap: stats can't skip,
    bloom can — file A holds even keys, file B odd keys."""
    t = Table.create(f"{wh}/t", SCHEMA,
                     options={"file-index.bloom-filter.columns": "k,s"},
                     spark=spark)
    even = [(i, f"s{i}") for i in range(0, 2000, 2)]
    odd = [(i, f"s{i}") for i in range(1, 2000, 2)]
    t.append(spark.createDataFrame(even, SCHEMA).coalesce(1))
    t.append(spark.createDataFrame(odd, SCHEMA).coalesce(1))
    return t


def test_bloom_skips_where_stats_cannot(spark, wh):
    t = _interleaved(spark, wh)
    entries = t.new_scan().plan().entries
    assert len(entries) == 2 and all(e.index_path for e in entries)
    # k=100 is even → only file A may match
    plan = t.new_scan().plan(P.eq("k", 100))
    assert len(plan.entries) == 1
    assert plan.files_skipped == 1
    # value in neither file → all files skipped
    plan = t.new_scan().plan(P.eq("s", "nope"))
    assert len(plan.entries) == 0
    # correctness: reads still right
    assert t.read(P.eq("k", 100)).count() == 1
    assert t.read(P.eq("s", "nope")).count() == 0


def test_bloom_in_and_or_predicates(spark, wh):
    t = _interleaved(spark, wh)
    plan = t.new_scan().plan(P.isin("k", [100, 102]))   # both even
    assert len(plan.entries) == 1
    plan = t.new_scan().plan(P.eq("k", 100) | P.eq("k", 101))
    assert len(plan.entries) == 2
    assert t.read(P.isin("k", [100, 101])).count() == 2


def test_index_survives_compaction_and_orphans(spark, wh):
    t = _interleaved(spark, wh)
    t.compact()
    entries = t.new_scan().plan().entries
    assert entries and all(e.index_path for e in entries)
    t.expire_snapshots(retain_last=1)
    removed = t.remove_orphan_files()
    assert removed >= 2   # pre-compaction data files + their index sidecars
    assert t.read().count() == 2000
    assert t.new_scan().plan(P.eq("k", 100)).entries  # index still loadable


def test_bitmap_index_exact_and_negative_pruning(spark, wh):
    """file-index.bitmap.columns stores the EXACT per-file value set:
    eq/in prune without false positives AND ne/NOT IN prune — which bloom
    (membership-only) can never do (ref: fileindex/bitmap/BitmapFileIndex)."""
    sch = T.StructType([T.StructField("k", T.LongType()),
                        T.StructField("cat", T.StringType())])
    t = Table.create(f"{wh}/bm", sch,
                     options={"file-index.bitmap.columns": "cat"},
                     spark=spark)
    # 3 files, each a distinct slice of a 6-value category column
    for cats in (("a", "b"), ("c", "d"), ("e", "f")):
        t.append(spark.createDataFrame(
            [(i, c) for i, c in enumerate(cats * 5)], sch).coalesce(1))
    plan_all = t.new_scan().plan()
    assert len(plan_all.entries) == 3
    assert all(e.index_path for e in plan_all.entries)

    # IN over low-card values: only the file containing them survives
    p_in = t.new_scan().plan(P.isin("cat", ["c", "d"]))
    assert len(p_in.entries) == 1 and p_in.files_skipped >= 2
    # eq: exact single-file pin
    p_eq = t.new_scan().plan(P.eq("cat", "e"))
    assert len(p_eq.entries) == 1
    # NOT IN rejecting a file's whole value set skips it — stats/bloom
    # cannot (min/max spans, membership can't refute a negation)
    p_not = t.new_scan().plan(P.not_in("cat", ["a", "b"]))
    assert len(p_not.entries) == 2 and p_not.files_skipped >= 1
    p_ne = t.new_scan().plan(P.not_in("cat", ["e", "f"]))
    assert len(p_ne.entries) == 2
    # results still correct through the residual filter
    assert sorted({r.cat for r in t.read(P.not_in("cat", ["a", "b"])).collect()}) \
        == ["c", "d", "e", "f"]


def test_bitmap_over_cardinality_falls_back(spark, wh):
    sch = T.StructType([T.StructField("k", T.LongType()),
                        T.StructField("u", T.StringType())])
    t = Table.create(f"{wh}/bm_wide", sch,
                     options={"file-index.bitmap.columns": "u",
                              "file-index.bitmap.max-cardinality": "10"},
                     spark=spark)
    t.append(spark.createDataFrame(
        [(i, f"u{i}") for i in range(100)], sch).coalesce(1))  # 100 > 10
    # over-cardinality: column unindexed (sound: never skipped)
    p = t.new_scan().plan(P.ne("u", "u5"))
    assert len(p.entries) == 1
    assert t.read(P.ne("u", "u5")).count() == 99


def test_bitmap_and_bloom_coexist(spark, wh):
    sch = T.StructType([T.StructField("k", T.LongType()),
                        T.StructField("cat", T.StringType()),
                        T.StructField("uid", T.LongType())])
    t = Table.create(f"{wh}/bm_mix", sch,
                     options={"file-index.bitmap.columns": "cat",
                              "file-index.bloom-filter.columns": "uid"},
                     spark=spark)
    t.append(spark.createDataFrame(
        [(i, "x", 1000 + i) for i in range(50)], sch).coalesce(1))
    t.append(spark.createDataFrame(
        [(i, "y", 2000 + i) for i in range(50)], sch).coalesce(1))
    assert len(t.new_scan().plan(P.eq("cat", "y")).entries) == 1
    assert len(t.new_scan().plan(P.eq("uid", 1004)).entries) == 1
    got = t.read(P.and_(P.eq("cat", "x"), P.eq("uid", 1004))).collect()
    assert len(got) == 1 and got[0].k == 4


def test_rewrite_file_index_builds_bitmap(spark, wh):
    sch = T.StructType([T.StructField("k", T.LongType()),
                        T.StructField("cat", T.StringType())])
    t = Table.create(f"{wh}/bm_rw", sch, spark=spark)
    t.append(spark.createDataFrame([(1, "a"), (2, "b")], sch))
    assert all(e.index_path is None for e in t.new_scan().plan().entries)
    t.schema.options["file-index.bitmap.columns"] = "cat"
    t.rewrite_file_index()
    assert all(e.index_path for e in t.new_scan().plan().entries)
    assert t.new_scan().plan(P.not_in("cat", ["a", "b"])).entries == []


def test_bitmap_range_refutation_beyond_stats(spark, wh):
    """Exact value sets refute RANGE predicates min/max stats cannot:
    a file holding {1, 1000000} overlaps BETWEEN 10 AND 20 by stats but
    contains no value in the window (file-level range-bitmap/BSI analog,
    ref: fileindex/rangebitmap/RangeBitmapFileIndex.java)."""
    sch = T.StructType([T.StructField("k", T.LongType()),
                        T.StructField("g", T.LongType())])
    t = Table.create(f"{wh}/bm_rng", sch,
                     options={"file-index.bitmap.columns": "g"},
                     spark=spark)
    t.append(spark.createDataFrame(
        [(1, 1), (2, 1000000)], sch).coalesce(1))        # gap in the middle
    t.append(spark.createDataFrame(
        [(3, 15), (4, 16)], sch).coalesce(1))            # inside the window
    from paimon_spark.predicates import Leaf
    p = t.new_scan().plan(Leaf("between", "g", (10, 20)))
    assert len(p.entries) == 1 and p.files_skipped == 1
    assert sorted(r.k for r in t.read(
        Leaf("between", "g", (10, 20))).collect()) == [3, 4]
    # string ops are exact too
    sch2 = T.StructType([T.StructField("k", T.LongType()),
                         T.StructField("s", T.StringType())])
    t2 = Table.create(f"{wh}/bm_str", sch2,
                      options={"file-index.bitmap.columns": "s"},
                      spark=spark)
    t2.append(spark.createDataFrame([(1, "apple"), (2, "avocado")], sch2)
              .coalesce(1))
    t2.append(spark.createDataFrame([(3, "banana")], sch2).coalesce(1))
    assert len(t2.new_scan().plan(P.starts_with("s", "a")).entries) == 1


def test_bitmap_typed_values_roundtrip(spark, wh):
    """Dates/decimals survive the sidecar's JSON encoding and compare
    correctly against typed predicate literals."""
    import datetime as dt
    import decimal
    sch = T.StructType([T.StructField("k", T.LongType()),
                        T.StructField("d", T.DateType()),
                        T.StructField("m", T.DecimalType(10, 2))])
    t = Table.create(f"{wh}/bm_typed", sch,
                     options={"file-index.bitmap.columns": "d,m"},
                     spark=spark)
    t.append(spark.createDataFrame(
        [(1, dt.date(2026, 1, 1), decimal.Decimal("1.50")),
         (2, dt.date(2026, 1, 2), decimal.Decimal("2.50"))], sch).coalesce(1))
    t.append(spark.createDataFrame(
        [(3, dt.date(2026, 6, 1), decimal.Decimal("9.99"))], sch).coalesce(1))
    assert len(t.new_scan().plan(P.eq("d", dt.date(2026, 6, 1))).entries) == 1
    assert len(t.new_scan().plan(
        P.eq("m", decimal.Decimal("2.50"))).entries) == 1
    assert len(t.new_scan().plan(
        P.not_in("d", [dt.date(2026, 1, 1), dt.date(2026, 1, 2)])).entries) == 1
    assert sorted(r.k for r in
                  t.read(P.eq("d", dt.date(2026, 6, 1))).collect()) == [3]


def test_bitmap_position_runs_unit():
    from paimon_spark.fileindex import BitmapIndex
    # clustered: runs compress
    raw = ["a"] * 10 + ["b"] * 5 + ["a"] * 5 + [None, "c"]
    bm = BitmapIndex.build(raw)
    assert bm.positions is not None
    assert bm.ranges_for(["a"]) == [(0, 10), (15, 20)]
    assert bm.ranges_for(["b", "c"]) == [(10, 15), (21, 22)]
    assert bm.ranges_for(["zzz"]) == []
    # adjacent ranges merge
    assert bm.ranges_for(["a", "b"]) == [(0, 20)]
    # json round-trip preserves positions
    rt = BitmapIndex.from_json(bm.to_json())
    assert rt.ranges_for(["a"]) == [(0, 10), (15, 20)]
    # scattered beyond max_runs: positions dropped, value set kept
    scattered = ["x", "y"] * 50
    bm2 = BitmapIndex.build(scattered, max_runs=10)
    assert bm2.positions is None and bm2.may_contain("x")
    assert bm2.ranges_for(["x"]) is None


def test_bitmap_row_range_pruning_end_to_end(spark, wh):
    """r3 verdict #10: low-cardinality eq on a huge UNSORTED file —
    min/max stats can't skip the file, but the bitmap position index
    turns the eq into _metadata.row_index range filters so only the
    matching runs flow into the query."""
    sch = T.StructType([T.StructField("cat", T.StringType()),
                        T.StructField("v", T.LongType())])
    t = Table.create(f"{wh}/bmpos", sch,
                     options={"file-index.bitmap.columns": "cat"},
                     spark=spark)
    # one file: 3 clustered category blocks (like time-ordered logs)
    rows = ([("alpha", i) for i in range(3000)]
            + [("beta", i) for i in range(3000, 9000)]
            + [("gamma", i) for i in range(9000, 10000)])
    t.append(spark.createDataFrame(rows, sch).coalesce(1))
    plan = t.new_scan().plan(P.eq("cat", "alpha"))
    assert plan.row_ranges, "expected sub-file row ranges"
    rngs = next(iter(plan.row_ranges.values()))
    assert sum(e - s for s, e in rngs) == 3000       # exact run coverage
    got = t.read(P.eq("cat", "alpha"))
    assert got.count() == 3000
    assert {r.cat for r in got.collect()} == {"alpha"}
    # IN over two categories
    plan2 = t.new_scan().plan(P.isin("cat", ["alpha", "gamma"]))
    assert plan2.row_ranges
    assert t.read(P.isin("cat", ["alpha", "gamma"])).count() == 4000
    # predicate covering everything → no ranges recorded (no benefit)
    plan3 = t.new_scan().plan(
        P.isin("cat", ["alpha", "beta", "gamma"]))
    assert not plan3.row_ranges
    # non-indexed column predicates unaffected
    assert t.read(P.lt("v", 100)).count() == 100


def test_bitmap_positions_skip_pk_tables(spark, wh):
    """PK merge groups must see every version of a key — no sub-file
    range pruning on PK tables."""
    sch = T.StructType([T.StructField("k", T.LongType()),
                        T.StructField("cat", T.StringType())])
    t = Table.create(f"{wh}/bmpk", sch, primary_keys=["k"],
                     options={"bucket": "1",
                              "file-index.bitmap.columns": "cat"},
                     spark=spark)
    t.append(spark.createDataFrame([(i, "a") for i in range(100)], sch))
    t.append(spark.createDataFrame([(i, "b") for i in range(50)], sch))
    plan = t.new_scan().plan(P.eq("cat", "a"))
    assert not plan.row_ranges
    got = {r.k for r in t.read(P.eq("cat", "a")).collect()}
    assert got == set(range(50, 100))
