"""Columnar (parquet) manifests + Spark-distributed scan planning.

(ref: ManifestFile.java avro manifests; AbstractFileStoreScan parallel
 manifest reading — here the executors read the manifests themselves.)
"""

import pytest
from pyspark.sql import types as T

from paimon_spark import P, Table

SCHEMA = T.StructType([T.StructField("pt", T.StringType()),
                       T.StructField("k", T.LongType()),
                       T.StructField("v", T.DoubleType())])


def _fill(spark, path, options):
    t = Table.create(path, SCHEMA, partition_keys=["pt"], options=options,
                     spark=spark)
    for batch in range(4):
        rows = [(f"p{i % 3}", batch * 100 + i, float(i)) for i in range(30)]
        t.append(spark.createDataFrame(rows, SCHEMA))
    t.delete_where(P.eq("pt", "p2"))
    return t


def test_parquet_manifest_roundtrip_matches_json(spark, wh):
    tj = _fill(spark, f"{wh}/j", {"manifest.format": "json"})
    tp = _fill(spark, f"{wh}/p", {"manifest.format": "parquet"})
    assert all(m.endswith(".parquet")
               for m in tp.paths.latest_snapshot().manifests)
    ej = {(e.file_path.split("/")[-1][:0], tuple(sorted(e.partition.items())),
           e.row_count) for e in tj.new_scan().plan().entries}
    ep = {(e.file_path.split("/")[-1][:0], tuple(sorted(e.partition.items())),
           e.row_count) for e in tp.new_scan().plan().entries}
    assert sorted((r.pt, r.k, r.v) for r in tj.read().collect()) \
        == sorted((r.pt, r.k, r.v) for r in tp.read().collect())
    assert len(ej) == len(ep)


def test_distributed_planning_equals_serial(spark, wh):
    t = _fill(spark, f"{wh}/d", {"manifest.format": "parquet",
                                 "scan.manifest.distributed-threshold": "2"})
    snap = t.paths.latest_snapshot()
    assert len(snap.manifests) >= 2
    sc = t.new_scan()
    dist, skipped = sc._live_entries_spark(spark, snap, None)
    serial = t.paths.live_entries(snap)
    key = lambda e: (tuple(sorted(e.partition.items())), e.bucket, e.file_path)
    assert sorted(map(key, dist)) == sorted(map(key, serial))
    # stats survive the spark round-trip (needed for later skipping)
    d0 = {key(e): e for e in dist}
    for e in serial:
        assert d0[key(e)].stats == e.stats
        assert d0[key(e)].row_count == e.row_count


def test_distributed_partition_pruning(spark, wh):
    t = _fill(spark, f"{wh}/pp", {"manifest.format": "parquet",
                                  "scan.manifest.distributed-threshold": "2"})
    plan = t.new_scan().plan(P.eq("pt", "p1"))
    assert plan.entries and all(e.partition["pt"] == "p1" for e in plan.entries)
    assert plan.files_skipped > 0
    assert t.read(P.eq("pt", "p1")).count() == 40
    # full read still correct through the distributed path
    assert t.read().count() == 80


def test_distributed_path_pk_table(spark, wh):
    s = T.StructType([T.StructField("k", T.LongType()),
                      T.StructField("v", T.StringType())])
    t = Table.create(f"{wh}/pk", s, primary_keys=["k"],
                     options={"bucket": "2", "manifest.format": "parquet",
                              "scan.manifest.distributed-threshold": "2"},
                     spark=spark)
    t.append(spark.createDataFrame([(i, "old") for i in range(50)], s))
    t.append(spark.createDataFrame([(i, "new") for i in range(0, 50, 2)], s))
    got = {r.k: r.v for r in t.read().collect()}
    assert len(got) == 50
    assert got[0] == "new" and got[1] == "old"
