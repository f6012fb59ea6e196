"""Procedures surface, z-order sort-compact, dynamic bucket, migrate."""

import os

import pytest
from pyspark.sql import functions as F, types as T

from paimon_spark import P, Table
from paimon_spark.procedures import call


def test_zorder_sort_compact_improves_skipping(spark, wh):
    schema = T.StructType([T.StructField("x", T.LongType()),
                           T.StructField("y", T.LongType()),
                           T.StructField("v", T.DoubleType())])
    t = Table.create(f"{wh}/z", schema, options={"target-file-size": "8192"},
                     spark=spark)
    rows = [(i % 100, (i * 37) % 100, float(i)) for i in range(5000)]
    t.append(spark.createDataFrame(rows, schema).repartition(8))
    before = t.new_scan().plan(P.eq("x", 5) & P.eq("y", 5))
    call(spark, "compact", table=t, order_strategy="zorder", order_by="x,y")
    after = t.new_scan().plan(P.eq("x", 5) & P.eq("y", 5))
    # clustered layout must skip a larger fraction of files
    assert after.files_skipped > 0
    assert t.read().count() == 5000
    # data intact
    got = t.read(P.eq("x", 5) & P.eq("y", 5)).count()
    exp = sum(1 for x, y, _v in rows if x == 5 and y == 5)
    assert got == exp


def test_order_sort_compact(spark, wh):
    schema = T.StructType([T.StructField("k", T.LongType()),
                           T.StructField("v", T.LongType())])
    t = Table.create(f"{wh}/o", schema, options={"target-file-size": "4096"},
                     spark=spark)
    t.append(spark.createDataFrame([(i % 50, i) for i in range(2000)], schema)
             .repartition(8))
    call(spark, "compact", table=t, order_strategy="order", order_by="k")
    plan = t.new_scan().plan(P.eq("k", 10))
    assert plan.files_skipped > 0
    assert t.read().count() == 2000


def test_dynamic_bucket_sticky_assignment(spark, wh):
    schema = T.StructType([T.StructField("k", T.LongType()),
                           T.StructField("v", T.StringType())])
    t = Table.create(f"{wh}/dyn", schema, primary_keys=["k"],
                     options={"bucket": "-1",
                              "dynamic-bucket.target-row-count": "100"},
                     spark=spark)
    t.append(spark.createDataFrame([(i, "a") for i in range(300)], schema))
    # upsert the same keys: they must land in their original buckets so the
    # merge sees both versions
    t.append(spark.createDataFrame([(i, "b") for i in range(300)], schema))
    got = {r["k"]: r["v"] for r in t.read().collect()}
    assert len(got) == 300 and all(v == "b" for v in got.values())
    # index exists
    assert os.path.isdir(f"{wh}/dyn/index")


def test_procedures_tags_rollback_expire(spark, wh):
    schema = T.StructType([T.StructField("v", T.LongType())])
    t = Table.create(f"{wh}/p", schema, spark=spark)
    t.append(spark.createDataFrame([(1,)], schema))
    t.append(spark.createDataFrame([(2,)], schema))
    call(spark, "create_tag", table=t, tag="v1", snapshot=1)
    assert t.read(tag="v1").count() == 1
    call(spark, "rollback", table=t, snapshot=1)
    assert t.read().count() == 1
    with pytest.raises(ValueError):
        call(spark, "nope", table=t)


def test_migrate_table_hardlinks(spark, wh, tmp_path):
    src = str(tmp_path / "legacy")
    df = spark.createDataFrame([("a", i) for i in range(100)], "p string, v long")
    df.write.partitionBy("p").parquet(src)
    t = call(spark, "migrate_table", source_dir=src,
             target_path=f"{wh}/migrated", partition_keys=["p"])
    assert t.read().count() == 100
    assert t.new_scan().metadata_count() == 100
    got = t.read(P.eq("p", "a")).agg(F.sum("v")).collect()[0][0]
    assert got == sum(range(100))
