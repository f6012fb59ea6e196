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
